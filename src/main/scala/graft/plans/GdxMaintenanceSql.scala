package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** SQL FRONT DOOR for GDX table MAINTENANCE — the statement Spark's
  * grammar does not have:
  *
  *   `OPTIMIZE <table> [ZORDER BY (col, col, …)]`
  *
  * routed to [[graft.sources.GdxSource.compact]] (bin-pack the current
  * snapshot) or [[graft.sources.GdxSource.optimizeZOrder]] (Morton-
  * curve clustering so the manifest's multi-column zone maps prune on
  * every listed dimension) — the Delta `OPTIMIZE … ZORDER BY` surface
  * on the engine's own format. Parsed by [[GraftSqlParser]], a
  * delegating `ParserInterface` injected via
  * `SparkSessionExtensions.injectParser` (the canonical extension seam
  * for grammar Spark lacks): anything that is not an OPTIMIZE
  * statement goes to Spark's parser byte-for-byte, so the wrapper is
  * invisible to every other statement (a cheap prefix check guards the
  * regex). Both paths publish ONE truncate commit — snapshot
  * isolation, time travel, and vacuum behave exactly as for any other
  * commit. Returns (files_before, files_after). */
object GdxMaintenanceSql {

  private val Optimize =
    """(?is)^\s*OPTIMIZE\s+([\w.`]+)\s*(?:ZORDER\s+BY\s*\(\s*([^)]+?)\s*\))?\s*;?\s*$""".r

  /** Some(command) when `sqlText` is an OPTIMIZE statement. */
  def parseOptimize(sqlText: String,
                    delegate: ParserInterface): Option[LogicalPlan] = {
    // fast path: only statements that can possibly match pay the regex
    val t = sqlText.dropWhile(_.isWhitespace)
    if (t.length < 8 || !t.substring(0, 8).equalsIgnoreCase("OPTIMIZE"))
      return None
    sqlText match {
      case Optimize(tbl, cols) =>
        val ident = delegate.parseMultipartIdentifier(tbl)
        val zorder = Option(cols).toSeq.flatMap(_.split(',').toSeq)
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
        Some(GdxOptimizeCommand(ident, zorder))
      case _ => None
    }
  }
}

/** `OPTIMIZE <gdx table> [ZORDER BY (…)]` → one clustering/compaction
  * truncate commit. The table resolves through the session catalog at
  * run time (provider must be the GDX source; the path comes from its
  * declared OPTIONS). */
case class GdxOptimizeCommand(table: Seq[String], zorderBy: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("files_before", LongType, nullable = false),
        StructField("files_after", LongType, nullable = false))))

  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "_LEGACY_ERROR_USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))

  override def run(spark: SparkSession): Seq[Row] = {
    // resolve through the ordinary read path and take the GDX table's
    // directory from the relation itself — the same identity the DML
    // front door uses, immune to where the catalog stores the option
    val rel = spark.table(table.map(p => s"`$p`").mkString("."))
      .queryExecution.analyzed
    val path = rel.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation if r.table.isInstanceOf[
            graft.sources.GdxTable] =>
        r.table.asInstanceOf[graft.sources.GdxTable].tablePath
    }.getOrElse(fail(s"OPTIMIZE: ${table.mkString(".")} is not a GDX table"))
    val (before, after) =
      if (zorderBy.nonEmpty)
        graft.sources.GdxSource.optimizeZOrder(spark, path, zorderBy,
          target = GdxOptimizeCommand.TargetFiles)
      else
        graft.sources.GdxSource.compact(spark, path,
          target = GdxOptimizeCommand.TargetFiles)
    Seq(Row(before.toLong, after.toLong))
  }
}

object GdxOptimizeCommand {
  /** SQL-path rewrite width: enough output files to keep the rewrite
    * and subsequent scans parallel at harness scale; a real deployment
    * sizes this by target file bytes, not count. */
  val TargetFiles = 8
}

/** Delegating parser: OPTIMIZE statements parse here, everything else
  * goes to Spark's parser untouched. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  @throws[ParseException]
  override def parsePlan(sqlText: String): LogicalPlan =
    GdxMaintenanceSql.parseOptimize(sqlText, delegate)
      .getOrElse(delegate.parsePlan(sqlText))
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
