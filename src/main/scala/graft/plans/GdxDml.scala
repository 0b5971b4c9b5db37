package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias,
  UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** SQL DML FRONT DOOR for the GDX table format — `DELETE FROM` /
  * `UPDATE` / `MERGE INTO` statements over a catalog table whose
  * provider is GdxSource, routed to the engine's transactional row-level
  * operations ([[graft.sources.GdxSource.delete]] — deletion vectors,
  * [[graft.sources.GdxSource.update]] — DV + rewrite in one commit,
  * [[graft.sources.GdxSource.merge]] — CAS'd LWW upsert).
  *
  * Spark's parser already produces the standard resolved plans
  * (`DeleteFromTable`/`UpdateTable`/`MergeIntoTable`); this post-hoc
  * resolution rule (injected by GraftExtensions) recognizes the GDX
  * target and replaces the plan with a runnable command BEFORE the
  * planner would reject the table for not implementing the (heavy)
  * DSv2 `SupportsRowLevelOperations` machinery — the same extension
  * seam Delta used for years. Non-GDX targets pass through untouched.
  *
  * Supported MERGE shape — the engine's merge contract, stated loudly:
  * `ON t.k = s.k WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
  * INSERT *` (key-equality LWW upsert). Conditional/partial-assignment
  * merges raise a clear error instead of silently diverging from the
  * transactional semantics the format actually provides. */
object GdxDmlRule extends Rule[LogicalPlan] {

  private def gdxPath(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => gdxPath(child)
    case r: DataSourceV2Relation => r.table match {
      case g: graft.sources.GdxTable => Some(g.tablePath)
      case _ => None
    }
    case _ => None
  }

  /** Resolved condition → SQL text: the engine re-reads the table in
    * its own frame, so the statement's expression is carried by NAME
    * (its generated SQL) and re-parsed there — carrying the resolved
    * Catalyst tree (or an UnresolvedAttribute rewrite of it) inside the
    * command would trip checkAnalysis, which walks command expressions
    * too. */
  private def bySql(e: Expression): String = e.transform {
    // drop catalog/table qualifiers: the engine's frame has bare names
    case a: AttributeReference => a.withQualifier(Seq.empty)
  }.sql

  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "_LEGACY_ERROR_USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(tbl, cond) if d.resolved =>
      gdxPath(tbl) match {
        case Some(p) => GdxDeleteCommand(p, bySql(cond))
        case None    => plan
      }
    case u @ UpdateTable(tbl, assignments, cond) if u.resolved =>
      gdxPath(tbl) match {
        case Some(p) =>
          val set = assignments.map {
            case Assignment(k: AttributeReference, v) => k.name -> bySql(v)
            case other => fail(s"gdx UPDATE: unsupported assignment $other")
          }
          GdxUpdateCommand(p, set, cond.map(bySql).getOrElse("true"))
        case None => plan
      }
    case m: MergeIntoTable if m.childrenResolved =>
      gdxPath(m.targetTable) match {
        case Some(p) => rewriteMerge(p, m)
        case None    => plan
      }
    case _ => plan
  }

  /** Only the LWW-upsert shape the engine's merge implements. */
  private def rewriteMerge(path: String, m: MergeIntoTable): LogicalPlan = {
    if (m.withSchemaEvolution)
      fail("gdx MERGE: WITH SCHEMA EVOLUTION is not supported")
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("gdx MERGE: WHEN NOT MATCHED BY SOURCE is not supported")
    // ON t.k = s.k (either side order): key-equality on the table key;
    // analysis inserts widening Casts when the source key is narrower
    def keyAttr(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference => Some(a)
      case c: org.apache.spark.sql.catalyst.expressions.Cast =>
        keyAttr(c.child)
      case _ => None
    }
    // one side must come from the TARGET and the other from the SOURCE
    // (checked by attribute identity, not name — `ON t.k = t.k` is a
    // degenerate always-true-per-row condition, NOT a key join, and
    // must be refused rather than silently run as a keyed upsert)
    val keyOk = m.mergeCondition match {
      case EqualTo(l, r) =>
        (keyAttr(l), keyAttr(r)) match {
          case (Some(a), Some(b)) if a.name == "k" && b.name == "k" =>
            val tids = m.targetTable.outputSet
            val sids = m.sourceTable.outputSet
            (tids.contains(a) && sids.contains(b)) ||
              (tids.contains(b) && sids.contains(a))
          case _ => false
        }
      case _ => false
    }
    if (!keyOk)
      fail("gdx MERGE: only ON <target>.k = <source>.k is supported " +
        s"(got ${m.mergeCondition.sql})")
    // WHEN MATCHED THEN UPDATE SET * — every target column assigned its
    // same-named SOURCE column, unconditionally. The value must be
    // checked by attribute identity, not name alone: `SET v = t.v`
    // (target self-assignment, i.e. "keep the target's value") matches
    // by name but the engine's merge is source-wins LWW — accepting it
    // would silently overwrite the kept values, so it is refused
    // loudly like every other diverging shape
    def starAssignments(as: Seq[Assignment]): Boolean = as.forall {
      case Assignment(k: AttributeReference, v) =>
        keyAttr(v).exists(a =>
          a.name == k.name && m.sourceTable.outputSet.contains(a))
      case _ => false
    }
    m.matchedActions match {
      case Seq(UpdateAction(None, as, _)) if starAssignments(as) => ()
      case other => fail("gdx MERGE: exactly one unconditional WHEN " +
        s"MATCHED THEN UPDATE SET * is required (got $other)")
    }
    m.notMatchedActions match {
      case Seq(InsertAction(None, as)) if starAssignments(as) => ()
      case other => fail("gdx MERGE: exactly one unconditional WHEN NOT " +
        s"MATCHED THEN INSERT * is required (got $other)")
    }
    GdxMergeCommand(path, m.sourceTable)
  }
}

/** `DELETE FROM <gdx table> WHERE ...` → deletion-vector commit.
  * Returns (version, rows_deleted). */
case class GdxDeleteCommand(path: String, condSql: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GdxDml.versionRowsOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val (v, n) = graft.sources.GdxSource.delete(spark, path,
      org.apache.spark.sql.functions.expr(condSql))
    Seq(Row(v.toLong, n))
  }
}

/** `UPDATE <gdx table> SET ... WHERE ...` → DV + rewrite in one commit.
  * Returns (version, rows_updated). */
case class GdxUpdateCommand(path: String, set: Seq[(String, String)],
                            condSql: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GdxDml.versionRowsOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val (v, n) = graft.sources.GdxSource.update(spark, path,
      org.apache.spark.sql.functions.expr(condSql),
      set.map { case (k, e) =>
        k -> org.apache.spark.sql.functions.expr(e) }.toMap)
    Seq(Row(v.toLong, n))
  }
}

/** `MERGE INTO <gdx table> USING <source> ON t.k = s.k ...` → CAS'd
  * LWW upsert of the source frame. Returns (version). */
case class GdxMergeCommand(path: String, source: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override val output: Seq[Attribute] = GdxDml.versionOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val src = ColumnBridge.ofRows(spark, source)
    val v = graft.sources.GdxSource.merge(spark, path, src)
    Seq(Row(v.toLong))
  }
}

private[plans] object GdxDml {
  def versionRowsOutput: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(StructField("version", LongType, nullable = false),
        StructField("n_rows", LongType, nullable = false))))
  def versionOutput: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(StructField("version", LongType, nullable = false))))
}
