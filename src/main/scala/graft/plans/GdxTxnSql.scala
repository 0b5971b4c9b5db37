package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** SQL FRONT DOOR for MULTI-TABLE TRANSACTIONS — the warehouse
  * `BEGIN TRANSACTION / COMMIT / ROLLBACK` shape over the format's
  * single-PUT atomic decision ([[graft.sources.GdxSource
  * .prepareTransaction]], the c36 machinery):
  *
  *   `BEGIN TRANSACTION`   (or `START TRANSACTION`)
  *   `INSERT INTO <gdx table> SELECT ... | VALUES ...`   (staged)
  *   `COMMIT`              (one decision: all tables or none)
  *   `ROLLBACK`            (nothing surfaces anywhere)
  *
  * Spark's grammar has no transaction statements, so BEGIN/COMMIT/
  * ROLLBACK are free grammar like OPTIMIZE. INSERT INTO *is* Spark
  * grammar — the wrapper intercepts only its plain `INSERT INTO t
  * <query>` shape and the interception is RUNTIME-inert: with no open
  * transaction on the session the original statement re-dispatches
  * through the delegate byte-for-byte (every non-transactional INSERT
  * in the engine behaves exactly as before), and parse-only consumers
  * see an inert command either way. With an open transaction the
  * INSERT's source query is evaluated into a STAGED write — rows
  * land as uncommitted claim files on each table; nothing is visible
  * on ANY table until COMMIT publishes the one decision file. Multiple
  * INSERTs into the same table union into one staged write (the
  * decision substrate takes one write per table).
  *
  * Scope discipline: the open-transaction registry is PER SESSION
  * (weak-keyed — a dropped session leaks nothing). Statements the
  * wrapper does not stage (DML, DDL, non-GDX inserts) are refused
  * loudly while a transaction is open rather than silently executed
  * outside it where the wrapper can see them (INSERT forms); forms
  * that bypass the wrapper entirely are documented non-transactional.
  * At 100 TB this is the warehouse loading contract: a nightly fact +
  * dim + audit-row load becomes visible as ONE event or not at all,
  * for the cost of one tiny PUT — no distributed 2PC, no table locks.
  */
object GdxSqlTxn {
  private final case class Staged(dir: String, table: String,
                                  rows: DataFrame)
  private val open = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.ArrayBuffer[Staged]]())

  def begin(s: SparkSession): Unit = {
    require(!open.containsKey(s),
      "gdx txn: a transaction is already open on this session")
    open.put(s, scala.collection.mutable.ArrayBuffer.empty)
    ()
  }

  def isOpen(s: SparkSession): Boolean = open.containsKey(s)

  private[plans] def stage(s: SparkSession, dir: String, table: String,
                           rows: DataFrame): Unit = {
    val buf = open.get(s)
    require(buf != null, "gdx txn: no open transaction")
    buf += Staged(dir, table, rows)
    ()
  }

  /** Close the scope and return one (dir, table, unioned rows) per
    * distinct target, in first-staged order. */
  private[plans] def take(s: SparkSession)
      : Seq[(String, String, DataFrame)] = {
    val buf = open.remove(s)
    require(buf != null, "gdx txn: no open transaction")
    buf.toSeq.groupBy(_.dir).toSeq
      .sortBy { case (dir, _) => buf.indexWhere(_.dir == dir) }
      .map { case (dir, ws) =>
        (dir, ws.head.table, ws.map(_.rows).reduce(_ unionByName _)) }
  }

  def rollback(s: SparkSession): Unit = {
    require(open.remove(s) != null, "gdx txn: no open transaction")
    ()
  }

  /** Loud refusal for statements that would silently execute OUTSIDE
    * an open transaction's atomicity (DELETE/UPDATE/MERGE commit their
    * own snapshots immediately) — running them mid-transaction would
    * hand the user a partially-visible "transaction". */
  def refuseIfOpen(s: SparkSession, stmt: String): Unit =
    require(!isOpen(s),
      s"gdx txn: $stmt is not transactional - only INSERT INTO stages " +
        "inside BEGIN TRANSACTION; COMMIT or ROLLBACK first")
}

/** `BEGIN TRANSACTION` — open the session's staging scope. */
case class GdxBeginTxnCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq.empty
  override def run(spark: SparkSession): Seq[Row] = {
    GdxSqlTxn.begin(spark)
    Seq.empty
  }
}

/** `COMMIT` — stage every buffered INSERT's rows as claim files, then
  * publish the ONE decision that makes all of them real at once
  * ([[graft.sources.GdxSource.prepareTransaction]]). An empty
  * transaction commits as a no-op. Returns (table, version) rows. */
case class GdxCommitTxnCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        StructField("table", StringType, nullable = false),
        StructField("version", LongType, nullable = false))))
  override def run(spark: SparkSession): Seq[Row] = {
    val staged = GdxSqlTxn.take(spark)
    if (staged.isEmpty) return Seq.empty
    val gdx = graft.sources.GdxSource
    val names = staged.map(s => s._1 -> s._2).toMap
    val versions = gdx.prepareTransaction(spark,
      staged.map { case (dir, _, rows) => gdx.GdxTxnWrite(dir, rows) })
      .commit()
    versions.map { case (dir, v) => Row(names(dir), v.toLong) }
  }
}

/** `ROLLBACK` — drop the staging scope; nothing was ever visible. */
case class GdxRollbackTxnCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq.empty
  override def run(spark: SparkSession): Seq[Row] = {
    GdxSqlTxn.rollback(spark)
    Seq.empty
  }
}

/** Every plain `INSERT INTO <tbl> <query>` routes here; the
  * transaction decision is RUNTIME state, never parse state. Outside
  * a transaction the original text re-dispatches through the delegate
  * unchanged; inside one, the source query stages against the GDX
  * target (positional column alignment + INSERT-style store casts —
  * the same assignment semantics the native INSERT applies). */
case class GdxTxnInsertCommand(table: Seq[String], colList: Option[String],
                               sourceSql: String)(
    val sqlText: String, val delegate: ParserInterface)
    extends LeafRunnableCommand {
  override protected def otherCopyArgs: Seq[AnyRef] = Seq(sqlText, delegate)
  override val output: Seq[Attribute] = Seq.empty
  override def run(spark: SparkSession): Seq[Row] = {
    if (!GdxSqlTxn.isOpen(spark)) {
      // re-dispatch the original text with the SAME post-parse pass
      // the wrapper applies to non-maintenance statements (a source
      // query may carry FOR VERSION AS OF)
      org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
        GdxTimeTravel.stash(delegate.parsePlan(sqlText))).collect()
      return Seq.empty
    }
    require(colList.isEmpty,
      "gdx txn: INSERT with an explicit column list is not supported " +
        "inside a transaction - list all columns in the query instead")
    val gdx = graft.sources.GdxSource
    val path = GdxMaintenanceSql.gdxPathOf(spark, table,
      "transactional INSERT (only GDX tables can participate in a " +
        "multi-table transaction)")
    val src = org.apache.spark.sql.graft.ColumnBridge
      .ofRows(spark, GdxTimeTravel.stash(delegate.parsePlan(sourceSql)))
    val tblSchema = gdx.committedSchema(path, gdx.driverConf())
    require(src.columns.length == tblSchema.length,
      s"gdx txn: INSERT provides ${src.columns.length} columns, " +
        s"${table.mkString(".")} has ${tblSchema.length}")
    import org.apache.spark.sql.functions.col
    val aligned = src.toDF(tblSchema.fieldNames.toIndexedSeq: _*)
      .select(tblSchema.fields.map(f =>
        col(s"`${f.name}`").cast(f.dataType).as(f.name)).toSeq: _*)
    GdxSqlTxn.stage(spark, path, table.mkString("."), aligned)
    Seq.empty
  }
}
