package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

/** SQL FRONT DOOR for GDX table MAINTENANCE — the statements Spark's
  * grammar does not have:
  *
  *   `OPTIMIZE <table> [ZORDER BY (col, col, …)]`
  *   `VACUUM <table> [RETAIN n VERSIONS]`
  *   `DESCRIBE HISTORY <table>`
  *   `ALTER TABLE <table> ADD CONSTRAINT <name> CHECK (<expr>)`
  *   `ALTER TABLE <table> DROP CONSTRAINT <name>`
  *
  * routed to [[graft.sources.GdxSource.compact]] (bin-pack the current
  * snapshot), [[graft.sources.GdxSource.optimizeZOrder]] (Morton-
  * curve clustering so the manifest's multi-column zone maps prune on
  * every listed dimension), [[graft.sources.GdxSource.vacuum]]
  * (retention), and [[graft.sources.GdxSource.history]] (the audit
  * log) — the Delta maintenance surface on the engine's own format.
  * Parsed by [[GraftSqlParser]], a delegating `ParserInterface`
  * injected via `SparkSessionExtensions.injectParser` (the canonical
  * extension seam for grammar Spark lacks): anything that is not one
  * of these statements goes to Spark's parser byte-for-byte — plain
  * `DESCRIBE TABLE` included — so the wrapper is invisible to every
  * other statement (a cheap prefix check guards the regexes). OPTIMIZE
  * publishes ONE truncate commit; snapshot isolation, time travel, and
  * retention behave exactly as for any other commit. */
object GdxMaintenanceSql {

  private val Optimize =
    """(?is)^\s*OPTIMIZE\s+([\w.`]+)\s*(?:WHERE\s+(.+?)\s*)??(?:ZORDER\s+BY\s*\(\s*([^)]+?)\s*\))?\s*(?:BINPACK\s+(\d+)\s*)?\s*;?\s*$""".r
  private val Vacuum =
    """(?is)^\s*VACUUM\s+([\w.`]+)\s*(?:RETAIN\s+(\d+)\s+(VERSIONS|HOURS))?\s*(?:SWEEP\s+ORPHANS\s+OLDER\s+THAN\s+(\d+)\s+HOURS)?\s*(DRY\s+RUN)?\s*;?\s*$""".r
  private val History =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+([\w.`]+)\s*;?\s*$""".r
  private val Detail =
    """(?is)^\s*DESCRIBE\s+DETAIL\s+([\w.`]+)\s*;?\s*$""".r
  private val Analyze =
    """(?is)^\s*ANALYZE\s+TABLE\s+([\w.`]+)\s+COMPUTE\s+STATISTICS(\s+FOR\s+ALL\s+COLUMNS)?\s*;?\s*$""".r
  private val Restore =
    """(?is)^\s*RESTORE\s+TABLE\s+([\w.`]+)\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+|'[^';]+')\s*;?\s*$""".r
  private val ShowChanges =
    """(?is)^\s*SHOW\s+CHANGES\s+([\w.`]+)\s+FROM\s+(?:VERSION\s+)?(\d+|'[^';]+')(?:\s+TO\s+(?:VERSION\s+)?(\d+|'[^';]+'))?\s*;?\s*$""".r
  private val CloneTable =
    """(?is)^\s*CREATE\s+TABLE\s+([\w.`]+)\s+SHALLOW\s+CLONE\s+([\w.`]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+|'[^';]+'))?(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*$""".r
  private val AddCheck =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*$""".r
  private val DropCheck =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*$""".r
  private val RenameCol =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*$""".r
  private val DropCol =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*$""".r
  private val SetPartSpec =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+SET\s+PARTITION\s+SPEC\s*\(\s*([^;]+?)\s*\)\s*;?\s*$""".r
  private val ClusterBy =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+CLUSTER\s+BY\s*(?:\(\s*([^)]+?)\s*\)|(NONE))\s*;?\s*$""".r
  private val CreateTag =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+CREATE\s+TAG\s+([\w.\-]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+|'[^';]+'))?\s*;?\s*$""".r
  private val DropTag =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+TAG\s+([\w.\-]+)\s*;?\s*$""".r
  private val CreateBranch =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+CREATE\s+BRANCH\s+([\w.\-]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+|'[^';]+'))?\s*;?\s*$""".r
  private val DropBranch =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+BRANCH\s+([\w.\-]+)\s*;?\s*$""".r
  private val PublishBranch =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+PUBLISH\s+BRANCH\s+([\w.\-]+)\s*;?\s*$""".r
  // materialized views — OSS Spark has no MATERIALIZED keyword, so
  // these statement shapes are free grammar (plans/MvSql)
  private val CreateMv =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s*(?:LOCATION\s+'([^']+)'\s*)?AS\s+(.+?)\s*;?\s*$""".r
  private val RefreshMv =
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\w+)\s*;?\s*$""".r
  private val DropMv =
    """(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*;?\s*$""".r
  // multi-table transactions (free grammar — Spark has none); the
  // INSERT interception is runtime-inert outside an open transaction
  private val BeginTxn =
    """(?is)^\s*(?:BEGIN|START)\s+TRANSACTION\s*;?\s*$""".r
  private val CommitTxn =
    """(?is)^\s*COMMIT(?:\s+TRANSACTION)?\s*;?\s*$""".r
  private val RollbackTxn =
    """(?is)^\s*ROLLBACK(?:\s+TRANSACTION)?\s*;?\s*$""".r
  private val SavepointTxn =
    """(?is)^\s*SAVEPOINT\s+(\w+)\s*;?\s*$""".r
  private val RollbackToTxn =
    """(?is)^\s*ROLLBACK\s+TO\s+(?:SAVEPOINT\s+)?(\w+)\s*;?\s*$""".r
  private val ReleaseTxn =
    """(?is)^\s*RELEASE\s+(?:SAVEPOINT\s+)?(\w+)\s*;?\s*$""".r
  private val InsertInto =
    """(?is)^\s*INSERT\s+INTO\s+(?:TABLE\s+)?([\w.`]+)\s*(?:\(([^)]*)\)\s*)?((?:SELECT|VALUES|WITH|TABLE|FROM)\b.*?)\s*;?\s*$""".r

  /** Some(command) when `sqlText` is one of the engine's maintenance
    * statements (OPTIMIZE / VACUUM / DESCRIBE HISTORY). Plain
    * DESCRIBE (TABLE/QUERY/…) never matches — only the HISTORY form
    * Spark's grammar lacks. */
  def parseMaintenance(sqlText: String,
                       delegate: ParserInterface): Option[LogicalPlan] = {
    // fast path: only statements that can possibly match pay a regex.
    // Keyword TOKENS, not a fixed-width prefix — `DESCRIBE  HISTORY`
    // with a double space (or tab/newline between keywords) must reach
    // the regex that accepts it, not fall through to Spark's grammar
    val toks = sqlText.trim.split("\\s+", 3)
    def kw(i: Int): String =
      if (toks.length > i) toks(i).toUpperCase(java.util.Locale.ROOT)
      else ""
    val (k1, k2) = (kw(0), kw(1))
    def ident(tbl: String): Seq[String] =
      delegate.parseMultipartIdentifier(tbl)
    // every VERSION AS OF surface accepts a number or a 'quoted' tag
    // name; refs resolve against the table's tag store at run time
    def unquote(ref: String): String =
      ref.stripPrefix("'").stripSuffix("'")
    if (k1 == "OPTIMIZE") sqlText match {
      case Optimize(tbl, where, cols, smallBytes) =>
        val zorder = Option(cols).toSeq.flatMap(_.split(',').toSeq)
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
        Some(GdxOptimizeCommand(ident(tbl), zorder,
          Option(where).map(_.trim),
          Option(smallBytes).map(_.toLong)))
      case _ => None
    } else if (k1 == "VACUUM") sqlText match {
      case Vacuum(tbl, retain, unit, sweep, dry) =>
        // default retention without an explicit RETAIN clause is TWO
        // versions, not one: a bare `VACUUM t` must not destroy every
        // historical manifest (and with it time travel + RESTORE) in
        // one statement — the same conservative-default stance as
        // Delta's retention check, and the keepLast=2 used by the
        // engine's own maintenance flows. `RETAIN n HOURS` is
        // age-based (keepLast stays at the 1-floor); `SWEEP ORPHANS
        // OLDER THAN n HOURS` opts into the crash-orphan reap.
        val hours = Option(unit)
          .exists(_.equalsIgnoreCase("HOURS"))
        Some(GdxVacuumCommand(ident(tbl),
          if (hours) 1
          else Option(retain).map(_.toInt).getOrElse(2),
          if (hours) Option(retain).map(_.toDouble) else None,
          Option(sweep).map(_.toDouble),
          dry != null))
      case _ => None
    } else if (k1 == "DESCRIBE" && k2 == "HISTORY") sqlText match {
      case History(tbl) => Some(GdxHistoryCommand(ident(tbl)))
      case _ => None
    } else if (k1 == "DESCRIBE" && k2 == "DETAIL") sqlText match {
      // the Delta operator-console surface; Spark's grammar has no
      // DETAIL form, so this is free grammar like DESCRIBE HISTORY
      case Detail(tbl) => Some(GdxDescribeDetailCommand(ident(tbl)))
      case _ => None
    } else if (k1 == "ANALYZE" && k2 == "TABLE") sqlText match {
      // ANALYZE TABLE ... COMPUTE STATISTICS [FOR ALL COLUMNS] — on a
      // GDX table this is one distributed aggregate pass landing the
      // `_colstats` sidecar every scan then serves to the CBO. The
      // statement EXISTS in Spark's grammar (v1 tables), so a non-GDX
      // target re-dispatches verbatim, like the constraint DDL. Only
      // the plain COMPUTE STATISTICS shapes are intercepted — the
      // FOR COLUMNS c1, c2 / PARTITION forms fall through untouched.
      case Analyze(tbl, _) =>
        Some(GdxAnalyzeCommand(ident(tbl))(sqlText, delegate))
      case _ => None
    } else if (k1 == "RESTORE") sqlText match {
      // Delta's RESTORE TABLE statement shape (Spark's grammar has no
      // RESTORE keyword, so this is free grammar like DESCRIBE HISTORY)
      // the ref is a version number or a 'quoted' tag name — resolved
      // at run time against the table's tag store, like FOR VERSION
      // AS OF
      case Restore(tbl, v) => Some(GdxRestoreCommand(ident(tbl), unquote(v)))
      case _ => None
    } else if (k1 == "SHOW" && k2 == "CHANGES") sqlText match {
      // the CDF front door: `SHOW CHANGES t FROM [VERSION] a [TO
      // [VERSION] b]` resolves to the DISTRIBUTED changefeed plan
      // ([[graft.sources.GdxSource.tableChanges]]) — the result is
      // data-sized (every inserted/deleted row in the window), so it
      // must be a real scan the caller can aggregate/write, never a
      // driver-collected command row set. Parsing only builds an inert
      // placeholder; [[GdxShowChangesRule]] resolves it at ANALYSIS
      // time on the analyzing session (no filesystem I/O or catalog
      // lookups inside the parser — parse-only consumers stay pure,
      // and the implicit upper version bound pins when the statement
      // is analyzed, not when its text was parsed).
      case ShowChanges(tbl, from, to) =>
        Some(GdxShowChangesPlaceholder(ident(tbl), unquote(from),
          Option(to).map(unquote)))
      case _ => None
    } else if (k1 == "ALTER" && k2 == "TABLE") sqlText match {
      // only the CONSTRAINT forms — every other ALTER TABLE statement
      // (add columns, properties, …) delegates to Spark's grammar.
      // These two DO exist in Spark 4.1's native grammar (ANSI
      // constraint DDL for DSv2 connectors), so the command re-parses
      // through the delegate at run time when the target turns out not
      // to be a GDX table — the wrapper must not break constraint DDL
      // for every other provider in the session
      case AddCheck(tbl, name, expr) =>
        Some(GdxAddConstraintCommand(ident(tbl), name, expr.trim)(
          sqlText, delegate))
      case DropCheck(tbl, name) =>
        Some(GdxDropConstraintCommand(ident(tbl), name)(sqlText, delegate))
      // column mapping: RENAME/DROP COLUMN are metadata-only commits
      // on GDX tables; non-GDX targets re-dispatch to Spark's native
      // ALTER grammar at run time (same pattern as the constraints)
      case RenameCol(tbl, from, to) =>
        Some(GdxRenameColumnCommand(ident(tbl), from, to)(
          sqlText, delegate))
      case DropCol(tbl, colName) =>
        Some(GdxDropColumnCommand(ident(tbl), colName)(sqlText, delegate))
      // partition-spec evolution (no Spark-grammar equivalent — like
      // OPTIMIZE, a non-GDX target is a loud error, not a re-dispatch)
      case SetPartSpec(tbl, spec) =>
        Some(GdxSetPartitionSpecCommand(ident(tbl), spec.trim))
      // declared clustering columns (the Delta CLUSTER BY shape); a
      // non-GDX target re-dispatches to Spark's own ALTER grammar —
      // other v2 providers keep their native CLUSTER BY
      case ClusterBy(tbl, cols, none) =>
        Some(GdxClusterByCommand(ident(tbl),
          if (none != null) Seq.empty
          else cols.split(',').toSeq
            .map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty))(sqlText, delegate))
      // snapshot tags (Iceberg-style named refs; free grammar)
      case CreateTag(tbl, name, v) =>
        Some(GdxCreateTagCommand(ident(tbl), name, Option(v).map(unquote)))
      case DropTag(tbl, name) =>
        Some(GdxDropTagCommand(ident(tbl), name))
      // branches + write-audit-publish (free grammar like tags)
      case CreateBranch(tbl, name, v) =>
        Some(GdxBranchCommand(ident(tbl), name, "create",
          Option(v).map(unquote)))
      case DropBranch(tbl, name) =>
        Some(GdxBranchCommand(ident(tbl), name, "drop", None))
      case PublishBranch(tbl, name) =>
        Some(GdxBranchCommand(ident(tbl), name, "publish", None))
      case _ => None
    } else if (k1 == "CREATE" && k2 == "TABLE") sqlText match {
      // only the SHALLOW CLONE form (not in Spark's grammar — it would
      // reject the statement anyway); every ordinary CREATE TABLE
      // falls through to Spark untouched
      case CloneTable(dst, src, v, loc) =>
        Some(GdxCloneCommand(ident(dst), ident(src),
          Option(v).map(unquote), Option(loc)))
      case _ => None
    } else if (k1 == "CREATE" && k2 == "MATERIALIZED") sqlText match {
      case CreateMv(name, loc, select) =>
        Some(CreateMvCommand(name, Option(loc), select))
      case _ => None
    } else if (k1 == "REFRESH" && k2 == "MATERIALIZED") sqlText match {
      case RefreshMv(name) => Some(RefreshMvCommand(name))
      case _ => None
    } else if (k1 == "DROP" && k2 == "MATERIALIZED") sqlText match {
      case DropMv(ifExists, name) =>
        Some(DropMvCommand(name, ifExists != null))
      case _ => None
    } else if ((k1 == "BEGIN" || k1 == "START") && k2 == "TRANSACTION")
      sqlText match {
        case BeginTxn() => Some(GdxBeginTxnCommand())
        case _ => None
    } else if (k1 == "COMMIT") sqlText match {
      case CommitTxn() => Some(GdxCommitTxnCommand())
      case _ => None
    } else if (k1 == "ROLLBACK") sqlText match {
      // ROLLBACK TO <savepoint> first — the bare form would never
      // match a TO suffix, but order documents the precedence
      case RollbackToTxn(name) => Some(GdxRollbackToSavepointCommand(name))
      case RollbackTxn() => Some(GdxRollbackTxnCommand())
      case _ => None
    } else if (k1 == "SAVEPOINT") sqlText match {
      case SavepointTxn(name) => Some(GdxSavepointCommand(name))
      case _ => None
    } else if (k1 == "RELEASE") sqlText match {
      case ReleaseTxn(name) => Some(GdxReleaseSavepointCommand(name))
      case _ => None
    } else if (k1 == "INSERT" && k2 == "INTO") sqlText match {
      // plain INSERT INTO only (OVERWRITE/REPLACE/partition forms fall
      // through untouched); the command re-dispatches the original
      // text verbatim unless a transaction is open on the session
      case InsertInto(tbl, cols, src) =>
        Some(GdxTxnInsertCommand(ident(tbl),
          Option(cols).map(_.trim).filter(_.nonEmpty), src)(
          sqlText, delegate))
      case _ => None
    } else None
  }

  /** Directory of a catalog-named GDX table, resolved through the
    * ordinary read path — the same identity the DML front door uses,
    * immune to where the catalog stores the path option. */
  private[plans] def gdxPathOf(spark: SparkSession, table: Seq[String],
                               stmt: String): String =
    spark.table(table.map(p => s"`$p`").mkString("."))
      .queryExecution.analyzed.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation if r.table.isInstanceOf[
              graft.sources.GdxTable] =>
          r.table.asInstanceOf[graft.sources.GdxTable].tablePath
      }.getOrElse(throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_USER_RAISED_EXCEPTION", Map("errorMessage" ->
          s"$stmt: ${table.mkString(".")} is not a GDX table")))

  /** Some(path) when the named table resolves to a GDX relation; None
    * when it resolves to anything else OR does not resolve at all —
    * both cases belong to Spark's own grammar/analyzer (which produces
    * the proper native error for a missing table). */
  private[plans] def tryGdxPathOf(spark: SparkSession,
                                  table: Seq[String]): Option[String] =
    try Some(gdxPathOf(spark, table, ""))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** After a GDX schema change, sync the CATALOG entry's stored schema
    * to the manifest's current logical schema — the catalog is a cache
    * of the manifest truth here, and a stale cached schema would make
    * the next catalog load fail the schema/mapping arity check.
    * Best-effort: a path-registered or foreign-catalog table has no
    * entry to sync (reads via path always resolve manifest-first). */
  private[plans] def syncCatalogSchema(spark: SparkSession,
                                       table: Seq[String],
                                       path: String): Unit =
    try {
      val ident = table match {
        case Seq(t) => org.apache.spark.sql.catalyst.TableIdentifier(t)
        case Seq(db, t) =>
          org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db))
        case Seq(cat, db, t) => org.apache.spark.sql.catalyst
          .TableIdentifier(t, Some(db), Some(cat))
        case _ => return
      }
      val cat = spark.sessionState.catalog
      val meta = cat.getTableMetadata(ident)
      val fresh = graft.sources.GdxSource.committedSchema(path,
        graft.sources.GdxSource.driverConf())
      // alterTable (not alterTableDataSchema) — the latter refuses
      // column removal, which is exactly what a DROP COLUMN sync needs
      cat.alterTable(meta.copy(schema = fresh))
      cat.refreshTable(ident) // drop the cached relation
    } catch { case _: Exception => () }

  /** Re-dispatch a statement the wrapper intercepted but does not own
    * (non-GDX target) through the DELEGATE parser — going back through
    * the session parser would re-enter the wrapper and loop. */
  private[plans] def runDelegate(spark: SparkSession,
                                 delegate: ParserInterface,
                                 sqlText: String): Unit = {
    org.apache.spark.sql.graft.ColumnBridge
      .ofRows(spark, delegate.parsePlan(sqlText)).collect()
    ()
  }
}

/** `OPTIMIZE <gdx table> [ZORDER BY (…)]` → one clustering/compaction
  * truncate commit. The table resolves through the session catalog at
  * run time (provider must be the GDX source; the path comes from its
  * declared OPTIONS). */
case class GdxOptimizeCommand(table: Seq[String], zorderBy: Seq[String],
                              where: Option[String] = None,
                              binpackBytes: Option[Long] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("files_before", LongType, nullable = false),
        StructField("files_after", LongType, nullable = false))))

  override def run(spark: SparkSession): Seq[Row] = {
    val path = GdxMaintenanceSql.gdxPathOf(spark, table, "OPTIMIZE")
    // BINPACK is its own maintenance mode: rewrite only the small-file
    // tail — combining it with WHERE/ZORDER would blur which files the
    // statement promises to (not) touch
    if (binpackBytes.isDefined && (where.isDefined || zorderBy.nonEmpty))
      throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_USER_RAISED_EXCEPTION", Map("errorMessage" ->
          "OPTIMIZE: BINPACK cannot be combined with WHERE or ZORDER BY"))
    // validated HERE so every malformed OPTIMIZE surfaces on the same
    // AnalysisException error class, never a raw require failure
    if (binpackBytes.exists(_ <= 0))
      throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_USER_RAISED_EXCEPTION", Map("errorMessage" ->
          "OPTIMIZE: BINPACK wants a positive byte threshold"))
    val (before, after) = (where, zorderBy) match {
      case _ if binpackBytes.isDefined =>
        graft.sources.GdxSource.compactSmall(spark, path,
          binpackBytes.get)
      // WHERE + ZORDER in one statement would re-cluster a slice with
      // no whole-table curve — refuse rather than publish a layout the
      // zone maps can't honor
      case (Some(_), zs) if zs.nonEmpty =>
        throw new org.apache.spark.sql.AnalysisException(
          "_LEGACY_ERROR_USER_RAISED_EXCEPTION", Map("errorMessage" ->
            ("OPTIMIZE: WHERE and ZORDER BY cannot be combined - " +
              "Z-order the whole table, or compact the slice without " +
              "ZORDER")))
      case (Some(pred), _) =>
        // partial compaction: rewrite ONLY the predicate's partitions
        // (one file per slice), carry the rest by reference
        graft.sources.GdxSource.compactWhere(spark, path, pred, target = 1)
      case (None, zs) if zs.nonEmpty =>
        graft.sources.GdxSource.optimizeZOrder(spark, path, zs,
          target = GdxOptimizeCommand.TargetFiles)
      case (None, _) =>
        // a declared CLUSTER BY makes the bare OPTIMIZE re-cluster
        // history on those columns (the Delta liquid-clustering
        // contract); otherwise plain bin-merge compaction. The
        // VALIDATED accessor so a stale registry (dropped/renamed
        // column, later partition spec) degrades to compaction.
        graft.sources.GdxSource.effectiveClusterBy(path,
          graft.sources.GdxSource.driverConf()) match {
          case cs if cs.nonEmpty =>
            graft.sources.GdxSource.optimizeClustered(spark, path, cs,
              target = GdxOptimizeCommand.TargetFiles)
          case _ =>
            graft.sources.GdxSource.compact(spark, path,
              target = GdxOptimizeCommand.TargetFiles)
        }
    }
    Seq(Row(before.toLong, after.toLong))
  }
}

object GdxOptimizeCommand {
  /** SQL-path rewrite width: enough output files to keep the rewrite
    * and subsequent scans parallel at harness scale; a real deployment
    * sizes this by target file bytes, not count. */
  val TargetFiles = 8
}

/** `VACUUM <gdx table> [RETAIN n VERSIONS]` → drop manifests older
  * than the retained window and delete every data file no retained
  * snapshot references ([[graft.sources.GdxSource.vacuum]]). Returns
  * (files_removed). */
case class GdxVacuumCommand(table: Seq[String], retainVersions: Int,
                            retainHours: Option[Double] = None,
                            sweepOrphanHours: Option[Double] = None,
                            dryRun: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("files_removed", LongType, nullable = false))))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GdxMaintenanceSql.gdxPathOf(spark, table, "VACUUM")
    val removed = graft.sources.GdxSource.vacuum(path,
      graft.sources.GdxSource.driverConf(), keepLast = retainVersions,
      retainHours = retainHours, sweepOrphanHours = sweepOrphanHours,
      dryRun = dryRun)
    Seq(Row(removed.toLong))
  }
}

/** `DESCRIBE DETAIL <gdx table>` → one metadata-only row of
  * table-level facts ([[graft.sources.GdxSource.describeDetail]]). */
case class GdxDescribeDetailCommand(table: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("format", org.apache.spark.sql.types.StringType,
          nullable = false),
        StructField("location", org.apache.spark.sql.types.StringType,
          nullable = false),
        StructField("version", LongType, nullable = false),
        StructField("n_files", LongType, nullable = false),
        StructField("n_dvs", LongType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("size_bytes", LongType, nullable = false),
        StructField("schema", org.apache.spark.sql.types.StringType,
          nullable = false),
        StructField("partition_spec",
          org.apache.spark.sql.types.StringType, nullable = false),
        StructField("cluster_by", org.apache.spark.sql.types.StringType,
          nullable = false),
        StructField("cluster_interleaved_files", LongType,
          nullable = false),
        StructField("n_constraints", LongType, nullable = false),
        StructField("n_tags", LongType, nullable = false),
        StructField("n_branches", LongType, nullable = false),
        StructField("analyzed_version", LongType, nullable = false))))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GdxMaintenanceSql.gdxPathOf(spark, table,
      "DESCRIBE DETAIL")
    graft.sources.GdxSource.describeDetail(spark, path).collect().toSeq
  }
}

/** `DESCRIBE HISTORY <gdx table>` → the snapshot audit log, from
  * manifest metadata alone ([[graft.sources.GdxSource.history]]). */
case class GdxHistoryCommand(table: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("version", org.apache.spark.sql.types.IntegerType,
          nullable = false),
        StructField("commit_ts", LongType, nullable = false),
        StructField("manifest_kind", org.apache.spark.sql.types.StringType,
          nullable = false),
        StructField("n_files", LongType, nullable = false),
        StructField("n_dvs", LongType, nullable = false),
        StructField("n_rows_physical", LongType, nullable = false),
        StructField("schema", org.apache.spark.sql.types.StringType,
          nullable = false))))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GdxMaintenanceSql.gdxPathOf(spark, table, "DESCRIBE HISTORY")
    graft.sources.GdxSource.history(spark, path)
      .orderBy("version").collect().toSeq
  }
}

/** `ANALYZE TABLE <gdx> COMPUTE STATISTICS [FOR ALL COLUMNS]` → one
  * distributed aggregate pass writes the `_colstats` sidecar
  * ([[graft.sources.GdxSource.analyzeTable]]); every later scan serves
  * it to the cost-based optimizer as DSv2 column statistics. Returns
  * one row per analyzed column (NDV, null count, lengths) plus the
  * analyzed version and exact row count. Non-GDX targets re-dispatch
  * to Spark's own ANALYZE grammar untouched. */
case class GdxAnalyzeCommand(table: Seq[String])(
    origSql: String, delegate: ParserInterface)
    extends LeafRunnableCommand {
  override protected def otherCopyArgs: Seq[AnyRef] = Seq(origSql, delegate)
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("column", org.apache.spark.sql.types.StringType,
          nullable = false),
        StructField("ndv", LongType, nullable = false),
        StructField("null_count", LongType, nullable = false),
        StructField("avg_len", LongType, nullable = false),
        StructField("max_len", LongType, nullable = false),
        StructField("row_count", LongType, nullable = false),
        StructField("analyzed_version", LongType, nullable = false))))
  override def run(spark: SparkSession): Seq[Row] =
    GdxMaintenanceSql.tryGdxPathOf(spark, table) match {
      case Some(path) =>
        val ts = graft.sources.GdxSource.analyzeTable(spark, path)
        ts.cols.toSeq.sortBy(_._1).map { case (name, cs) =>
          Row(name, cs.ndv, cs.nullCount, cs.avgLen, cs.maxLen,
            ts.rowCount, ts.version.toLong)
        }
      case None =>
        GdxMaintenanceSql.runDelegate(spark, delegate, origSql)
        Seq.empty
    }
}

/** `ALTER TABLE <gdx> CLUSTER BY (c1, c2, ...)` / `CLUSTER BY NONE` —
  * declare (or clear) the table's clustering columns
  * ([[graft.sources.GdxSource.setClusterBy]]): every later INSERT-path
  * write asks the planner for a range exchange + sort on them, and a
  * bare `OPTIMIZE` re-clusters history. Returns the declared list. */
case class GdxClusterByCommand(table: Seq[String], cols: Seq[String])(
    origSql: String, delegate: ParserInterface)
    extends LeafRunnableCommand {
  override protected def otherCopyArgs: Seq[AnyRef] = Seq(origSql, delegate)
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("cluster_by", org.apache.spark.sql.types.StringType,
          nullable = false))))
  override def run(spark: SparkSession): Seq[Row] =
    GdxMaintenanceSql.tryGdxPathOf(spark, table) match {
      case Some(path) =>
        if (cols.isEmpty) graft.sources.GdxSource.clearClusterBy(path)
        else graft.sources.GdxSource.setClusterBy(path, cols)
        Seq(Row(cols.mkString(",")))
      case None =>
        // not a GDX table: other providers keep their native grammar
        GdxMaintenanceSql.runDelegate(spark, delegate, origSql)
        Seq.empty
    }
}

/** `RESTORE TABLE <gdx> [TO] VERSION AS OF <n>` → re-publish snapshot
  * n's manifest (entries, schema, constraints, column mapping,
  * partition spec) as the NEW current version — history is never
  * rewritten, the restore is itself a commit, and a later RESTORE can
  * undo it; the ref is a version number or a 'quoted' tag name
  * (the Delta RESTORE contract;
  * [[graft.sources.GdxSource.restoreSnapshot]]). Returns
  * (restored_from, version). */
case class GdxRestoreCommand(table: Seq[String], fromRef: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("restored_from", LongType, nullable = false),
        StructField("version", LongType, nullable = false))))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GdxMaintenanceSql.gdxPathOf(spark, table, "RESTORE TABLE")
    val from = graft.sources.GdxSource.resolveVersionRef(path,
      graft.sources.GdxSource.driverConf(), fromRef)
    val v = graft.sources.GdxSource.restoreSnapshot(path, from)
    GdxMaintenanceSql.syncCatalogSchema(spark, table, path)
    Seq(Row(from.toLong, v.toLong))
  }
}

/** `ALTER TABLE <gdx table> SET PARTITION SPEC (<spec>)` → partition-
  * spec evolution: one metadata commit re-points the layout for future
  * writes while former specs keep pruning their own eras
  * ([[graft.sources.GdxSource.evolvePartitionSpec]] — the Iceberg
  * `ALTER TABLE ... PARTITION FIELD` capability in this format's
  * single-spec shape). Returns the committed version. */
case class GdxSetPartitionSpecCommand(table: Seq[String], spec: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("version", LongType, nullable = false))))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GdxMaintenanceSql.gdxPathOf(spark, table,
      "ALTER TABLE ... SET PARTITION SPEC")
    val v = graft.sources.GdxSource.evolvePartitionSpec(path, spec)
    Seq(Row(v.toLong))
  }
}

/** `ALTER TABLE <gdx table> CREATE TAG <name> [VERSION AS OF n]` →
  * an immutable named ref to a snapshot
  * ([[graft.sources.GdxSource.createTag]]; default = the latest
  * version). Tagged snapshots survive VACUUM and read back by name
  * through `FOR VERSION AS OF '<name>'`. Returns the pinned
  * version. */
case class GdxCreateTagCommand(table: Seq[String], tag: String,
                               versionRef: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("version", LongType, nullable = false))))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GdxMaintenanceSql.gdxPathOf(spark, table, "CREATE TAG")
    val version = versionRef.map(graft.sources.GdxSource
      .resolveVersionRef(path, graft.sources.GdxSource.driverConf(), _))
      .getOrElse(-1)
    Seq(Row(graft.sources.GdxSource.createTag(path, tag, version).toLong))
  }
}

/** `ALTER TABLE <gdx table> DROP TAG <name>` → release the ref; the
  * snapshot it pinned becomes ordinary history (next VACUUM may
  * reclaim it). Returns whether the tag existed. */
case class GdxDropTagCommand(table: Seq[String], tag: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("existed", BooleanType, nullable = false))))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GdxMaintenanceSql.gdxPathOf(spark, table, "DROP TAG")
    Seq(Row(graft.sources.GdxSource.dropTag(path, tag)))
  }
}

/** `ALTER TABLE <gdx> CREATE BRANCH <name> [VERSION AS OF ref]` /
  * `DROP BRANCH <name>` / `PUBLISH BRANCH <name>` — the write-audit-
  * publish surface ([[graft.sources.GdxSource.createBranch]] /
  * `dropBranch` / `publishBranch`): branch invisibly, write/audit via
  * `option("branch", name)`, fast-forward main in one CAS'd metadata
  * commit. Returns the relevant version (create: base; publish: the
  * new main version; drop: 1/0 existed). */
case class GdxBranchCommand(table: Seq[String], branch: String,
                            action: String, versionRef: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("version", LongType, nullable = false))))
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GdxMaintenanceSql.gdxPathOf(spark, table,
      s"${action.toUpperCase(java.util.Locale.ROOT)} BRANCH")
    val gdx = graft.sources.GdxSource
    val v: Long = action match {
      case "create" =>
        val base = versionRef.map(gdx.resolveVersionRef(path,
          gdx.driverConf(), _)).getOrElse(-1)
        gdx.createBranch(path, branch, base).toLong
      case "drop"    => if (gdx.dropBranch(path, branch)) 1L else 0L
      case "publish" => gdx.publishBranch(path, branch).toLong
      case other => throw new IllegalArgumentException(
        s"gdx: unknown branch action $other")
    }
    Seq(Row(v))
  }
}

/** Inert parse product of `SHOW CHANGES` — carries only what the text
  * said; [[GdxShowChangesRule]] resolves it. */
case class GdxShowChangesPlaceholder(table: Seq[String], fromRef: String,
                                     toRef: Option[String])
    extends org.apache.spark.sql.catalyst.plans.logical.LeafNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
}

/** Analysis-time resolution of `SHOW CHANGES`: the placeholder becomes
  * the distributed changefeed plan, with the open upper bound pinned
  * to the CURRENT version at analysis. Same injectResolutionRule seam
  * as time travel. */
class GdxShowChangesRule(spark: SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case GdxShowChangesPlaceholder(tbl, fromRef, toRef) =>
      val path = GdxMaintenanceSql.gdxPathOf(spark, tbl, "SHOW CHANGES")
      val conf = graft.sources.GdxSource.driverConf()
      val fromV = graft.sources.GdxSource
        .resolveVersionRef(path, conf, fromRef)
      val to = toRef
        .map(graft.sources.GdxSource.resolveVersionRef(path, conf, _))
        .getOrElse {
          val vs = graft.sources.GdxSource.listVersions(path, conf)
          require(vs.nonEmpty,
            s"gdx SHOW CHANGES: no committed snapshot under $path")
          vs.max
        }
      graft.sources.GdxSource.tableChanges(spark, path, fromV, to)
        .queryExecution.analyzed
  }
}

/** `CREATE TABLE <dst> SHALLOW CLONE <src> [VERSION AS OF n]
  * [LOCATION '<dir>']` → one manifest commit referencing the source's
  * data files by absolute path, ZERO bytes copied
  * ([[graft.sources.GdxSource.cloneShallow]]) — the dev-branch
  * workflow: fork a 100 TB production table for the cost of a
  * manifest, mutate the fork freely (clone-local files/DVs), never
  * touch the source. The destination is either a GdxCatalog
  * identifier (lands in the catalog's warehouse, instantly loadable)
  * or any name with an explicit LOCATION (registered in the session
  * catalog after the clone). Returns (version, n_files, location). */
case class GdxCloneCommand(dst: Seq[String], src: Seq[String],
                           versionRef: Option[String],
                           location: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("n_files", LongType, nullable = false),
        StructField("location", org.apache.spark.sql.types.StringType,
          nullable = false))))
  override def run(spark: SparkSession): Seq[Row] = {
    val srcPath = GdxMaintenanceSql.gdxPathOf(spark, src, "SHALLOW CLONE")
    def needsLocation: Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_USER_RAISED_EXCEPTION", Map("errorMessage" ->
          ("SHALLOW CLONE: a session-catalog destination needs an " +
            "explicit LOCATION '<dir>'")))
    val dstDir = location.getOrElse {
      dst match {
        case Seq(cat, rest @ _*) if rest.nonEmpty =>
          // `mydb.fork` is a legitimate session-catalog name, not a
          // catalog reference — an unresolvable first segment routes to
          // the needs-LOCATION guidance, never CatalogNotFoundException
          val resolved = try Some(
            spark.sessionState.catalogManager.catalog(cat))
          catch { case _: Exception => None }
          resolved match {
            case Some(g: graft.sources.GdxCatalog) =>
              g.locationFor(org.apache.spark.sql.connector.catalog
                .Identifier.of(rest.init.toArray, rest.last))
            case Some(other) => throw new org.apache.spark.sql
              .AnalysisException("_LEGACY_ERROR_USER_RAISED_EXCEPTION",
                Map("errorMessage" -> ("SHALLOW CLONE: destination " +
                  s"catalog ${other.name} is not a GDX catalog - give " +
                  "an explicit LOCATION")))
            case None => needsLocation
          }
        case _ => needsLocation
      }
    }
    val version = versionRef.map(graft.sources.GdxSource
      .resolveVersionRef(srcPath, graft.sources.GdxSource.driverConf(), _))
      .getOrElse(-1)
    val v = graft.sources.GdxSource.cloneShallow(srcPath, dstDir, version)
    // LOCATION form: register the clone in the session catalog so it
    // is queryable by name (plain CREATE TABLE USING delegates through
    // the wrapper untouched — no re-entry into the CLONE grammar)
    // quote-escape both sides of the registration statement: an
    // identifier part containing a backtick doubles it, and the
    // location string escapes backslash-then-quote (Spark's default
    // string-literal escaping) — a path with a quote must register
    // the committed clone, not produce a malformed/injectable SQL
    if (location.isDefined) {
      val ident = dst.map(p => s"`${p.replace("`", "``")}`").mkString(".")
      val loc = dstDir.replace("\\", "\\\\").replace("'", "\\'")
      spark.sql(s"CREATE TABLE $ident " +
        s"USING graft.sources.GdxSource OPTIONS (path '$loc')")
    }
    val n = graft.sources.GdxSource.committedEntries(dstDir,
      graft.sources.GdxSource.driverConf()).size
    Seq(Row(v.toLong, n.toLong, dstDir))
  }
}

/** `ALTER TABLE <gdx> ADD CONSTRAINT <name> CHECK (<expr>)` →
  * validate existing rows, then one metadata commit; future writes
  * enforce row-level ([[graft.sources.GdxSource.addConstraint]]).
  * Returns (version). */
case class GdxAddConstraintCommand(table: Seq[String], name: String,
                                   exprSql: String)(
    origSql: String, delegate: ParserInterface)
    extends LeafRunnableCommand {
  // second-param-list fields must ride TreeNode.makeCopy explicitly
  override protected def otherCopyArgs: Seq[AnyRef] = Seq(origSql, delegate)
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(StructField("version", LongType, nullable = false))))
  override def run(spark: SparkSession): Seq[Row] =
    GdxMaintenanceSql.tryGdxPathOf(spark, table) match {
      case Some(path) =>
        // the manifest stores a ONE-line header, so line breaks in the
        // expression collapse to spaces. That is safe only OUTSIDE
        // string literals — rather than silently rewriting a literal's
        // bytes (changing which values the constraint accepts), a
        // multi-line expression containing any quote is refused. GDX
        // arm only: a non-GDX target's expression is delegated verbatim
        if (exprSql.exists(c => c == '\n' || c == '\r') &&
            exprSql.exists(c => c == '\'' || c == '"'))
          throw new org.apache.spark.sql.AnalysisException(
            "_LEGACY_ERROR_USER_RAISED_EXCEPTION", Map("errorMessage" ->
              ("ADD CONSTRAINT: a CHECK expression containing string " +
                "literals must be written on one line (the manifest " +
                "header is line-oriented and a line break inside a " +
                "literal cannot be preserved)")))
        Seq(Row(graft.sources.GdxSource.addConstraint(spark, path, name,
          exprSql.replaceAll("[\\r\\n]+", " ")).toLong))
      case None =>
        // not a GDX table: Spark 4.1's native grammar owns ANSI
        // constraint DDL for other providers — re-dispatch untouched
        GdxMaintenanceSql.runDelegate(spark, delegate, origSql)
        Seq.empty
    }
}

/** `ALTER TABLE <gdx> DROP CONSTRAINT <name>` → one metadata commit.
  * Returns (version). */
case class GdxDropConstraintCommand(table: Seq[String], name: String)(
    origSql: String, delegate: ParserInterface)
    extends LeafRunnableCommand {
  // second-param-list fields must ride TreeNode.makeCopy explicitly
  override protected def otherCopyArgs: Seq[AnyRef] = Seq(origSql, delegate)
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(StructField("version", LongType, nullable = false))))
  override def run(spark: SparkSession): Seq[Row] =
    GdxMaintenanceSql.tryGdxPathOf(spark, table) match {
      case Some(path) =>
        Seq(Row(graft.sources.GdxSource.dropConstraint(path, name).toLong))
      case None =>
        GdxMaintenanceSql.runDelegate(spark, delegate, origSql)
        Seq.empty
    }
}

/** `ALTER TABLE <gdx> RENAME COLUMN a TO b` → one metadata commit
  * ([[graft.sources.GdxSource.renameColumn]]); the catalog entry's
  * stored schema is synced so future catalog loads present the new
  * name. Returns (version). */
case class GdxRenameColumnCommand(table: Seq[String], from: String,
                                  to: String)(
    origSql: String, delegate: ParserInterface)
    extends LeafRunnableCommand {
  override protected def otherCopyArgs: Seq[AnyRef] = Seq(origSql, delegate)
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(StructField("version", LongType, nullable = false))))
  override def run(spark: SparkSession): Seq[Row] =
    GdxMaintenanceSql.tryGdxPathOf(spark, table) match {
      case Some(path) =>
        val v = graft.sources.GdxSource.renameColumn(spark, path, from, to)
        GdxMaintenanceSql.syncCatalogSchema(spark, table, path)
        Seq(Row(v.toLong))
      case None =>
        GdxMaintenanceSql.runDelegate(spark, delegate, origSql)
        Seq.empty
    }
}

/** `ALTER TABLE <gdx> DROP COLUMN a` → one metadata commit
  * ([[graft.sources.GdxSource.dropColumn]]); catalog schema synced.
  * Returns (version). */
case class GdxDropColumnCommand(table: Seq[String], colName: String)(
    origSql: String, delegate: ParserInterface)
    extends LeafRunnableCommand {
  override protected def otherCopyArgs: Seq[AnyRef] = Seq(origSql, delegate)
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(StructField("version", LongType, nullable = false))))
  override def run(spark: SparkSession): Seq[Row] =
    GdxMaintenanceSql.tryGdxPathOf(spark, table) match {
      case Some(path) =>
        val v = graft.sources.GdxSource.dropColumn(spark, path, colName)
        GdxMaintenanceSql.syncCatalogSchema(spark, table, path)
        Seq(Row(v.toLong))
      case None =>
        GdxMaintenanceSql.runDelegate(spark, delegate, origSql)
        Seq.empty
    }
}

/** Delegating parser: the maintenance statements parse here,
  * everything else goes to Spark's parser untouched. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  @throws[ParseException]
  override def parsePlan(sqlText: String): LogicalPlan =
    GdxMaintenanceSql.parseMaintenance(sqlText, delegate)
      // VERSION/TIMESTAMP AS OF nodes swap for placeholders here so the
      // session catalog's unconditional failTimeTravel never fires;
      // GdxTimeTravelRule resolves them (plans/GdxTimeTravel.scala)
      .getOrElse(GdxTimeTravel.stash(delegate.parsePlan(sqlText)))
  @throws[ParseException]
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  @throws[ParseException]
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  @throws[ParseException]
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  @throws[ParseException]
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  @throws[ParseException]
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  @throws[ParseException]
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  @throws[ParseException]
  override def parseDataType(sqlText: String): org.apache.spark.sql.types
      .DataType = delegate.parseDataType(sqlText)
  @throws[ParseException]
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
