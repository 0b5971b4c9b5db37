package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel,
  UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan,
  SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** SQL TIME TRAVEL for the GDX table format — Spark's relation syntax
  *
  *   `SELECT … FROM t VERSION AS OF n`
  *   `SELECT … FROM t FOR TIMESTAMP AS OF ts`
  *
  * routed to the format's snapshot pinning (the `version` / `asOf`
  * read options, [[graft.sources.GdxSource.resolveVersion]]). Spark
  * parses these into [[RelationTimeTravel]], but the session catalog
  * unconditionally fails them (`V2SessionCatalog.loadTable(ident,
  * version)` → failTimeTravel — verified against the linked 4.1.2
  * bytecode), so the built-in ResolveRelations would throw before any
  * extension rule could claim the node. The wrapper parser therefore
  * swaps each RelationTimeTravel for an inert placeholder at parse
  * time, and [[GdxTimeTravelRule]] (injectResolutionRule) resolves it:
  * a GDX-backed identifier becomes the PINNED DSv2 relation; anything
  * else gets its ORIGINAL node back so Spark's native error surfaces
  * untouched. The pinned relation carries the `version`/`asOf` read
  * option, which is exactly what [[MvRewrite.relationIdentity]] keys
  * on to refuse summary rewrites for historical reads. */
case class GdxTimeTravelPlaceholder(original: RelationTimeTravel)
    extends LeafNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
}

object GdxTimeTravel {
  /** Parse-time swap (called by GraftSqlParser on every parsed plan):
    * one cheap transform; statements without time travel pass through
    * structurally unchanged. */
  def stash(plan: LogicalPlan): LogicalPlan = plan transform {
    case tt: RelationTimeTravel => GdxTimeTravelPlaceholder(tt)
  }

  /** AS-OF option value from the parsed timestamp expression: a
    * literal string passes through (the reader parses ISO-8601 or
    * epoch millis); a timestamp literal converts micros → millis. */
  private[plans] def asOfValue(e: org.apache.spark.sql.catalyst
      .expressions.Expression): String = {
    if (!e.resolved || !e.foldable)
      throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_USER_RAISED_EXCEPTION", Map("errorMessage" ->
          ("gdx TIMESTAMP AS OF: the timestamp must be a literal " +
            s"(got ${e.sql})")))
    (e.eval(), e.dataType) match {
      // string literal: the reader parses ISO-8601 or epoch millis
      case (s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
      // TIMESTAMP'…' literal: Catalyst stores epoch MICROS
      case (micros: java.lang.Long,
            org.apache.spark.sql.types.TimestampType) =>
        (micros / 1000L).toString
      // bare integer literal: epoch millis, passed through
      case (n: java.lang.Long, _) => n.toString
      case (n: java.lang.Integer, _) => n.toString
      case (other, t) => throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_USER_RAISED_EXCEPTION", Map("errorMessage" ->
          s"gdx TIMESTAMP AS OF: unsupported literal $other ($t)"))
    }
  }
}

class GdxTimeTravelRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The GDX directory of `id` ONLY when the identifier names the
    * table DIRECTLY. A view (temp or catalog) over a GDX table must
    * NOT resolve here: `v VERSION AS OF 1` would silently become a
    * pinned scan of the whole base, discarding the view's
    * filter/projection — Spark's native "time travel on view" error
    * is the correct outcome, so such identifiers get their original
    * node back. */
  private def directGdxPath(id: Seq[String]): Option[String] =
    try {
      def strip(p: LogicalPlan): LogicalPlan = p match {
        case SubqueryAlias(_, c) => strip(c)
        case r => r
      }
      strip(spark.table(id.map(part => s"`$part`").mkString("."))
        .queryExecution.analyzed) match {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation => r.table match {
          case g: graft.sources.GdxTable => Some(g.tablePath)
          case _ => None
        }
        case _ => None // a View or any other shape: not a direct table
      }
    } catch { case _: org.apache.spark.sql.AnalysisException => None }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case GdxTimeTravelPlaceholder(orig) =>
      val identOpt = orig.relation match {
        case u: UnresolvedRelation => Some(u.multipartIdentifier)
        case _ => None
      }
      identOpt.flatMap(id => directGdxPath(id).map((id, _))) match {
        case Some((id, path)) =>
          val r = spark.read.format("graft.sources.GdxSource")
            .option("path", path)
          val pinned = orig.version match {
            // a non-numeric ref may name a BRANCH HEAD: `SELECT ...
            // FROM t VERSION AS OF 'audit'` reads the branch's own
            // latest snapshot — the WAP audit query without leaving
            // SQL. Tags keep priority (they are the established
            // VERSION AS OF semantic; a name that is BOTH is refused
            // loudly by the reader's tag resolution being tried
            // first), and numbers stay main-history versions.
            case Some(v) if v.trim.toIntOption.isEmpty &&
                !graft.sources.GdxSource.listTags(path,
                  graft.sources.GdxSource.driverConf()).contains(v.trim) &&
                graft.sources.GdxSource.listBranches(path,
                  graft.sources.GdxSource.driverConf()).contains(v.trim) =>
              r.option("branch", v.trim)
            case Some(v) => r.option("version", v)
            case None => r.option("asOf",
              GdxTimeTravel.asOfValue(orig.timestamp.getOrElse(
                throw new IllegalStateException(
                  "time travel with neither version nor timestamp"))))
          }
          // alias keeps `t.col` qualifications resolving as they would
          // against the original relation
          SubqueryAlias(id.last, pinned.load().queryExecution.analyzed)
        // not GDX (or not a table at all): hand the ORIGINAL node back —
        // Spark's own resolution produces the native error/behavior
        case None => orig
      }
  }
}
