package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-pinned readers for the driver testdata star schema
  * (see /root/repo/TESTDATA.md, /root/repo/FIXTURES.md §B).
  *
  * Scale note: every reader is a plain parquet scan, so Catalyst pushes
  * filters/projections into the scan (`PushedFilters`/`ReadSchema`) — at
  * 100 TB these tables would be partitioned (e.g. orders by month of
  * o_orderdate) and the same code picks up partition pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet schema per dataset path, inferred once per JVM.
    *
    * `spark.read.parquet(path)` with no declared schema runs a footer
    * -reading Spark JOB on every call (ParquetFileFormat.inferSchema) —
    * measured 30-40 ms per call plus its driver gap, paid by nearly
    * every query since all ten base tables route through here. A real
    * deployment reads these tables through a catalog, where the schema
    * is declared metadata and no inference ever runs; this cache gives
    * the path-based readers the same property. METADATA only (a
    * StructType keyed by the immutable testdata path) — file listing,
    * scan, and every downstream computation still run per query, so no
    * result or data is ever reused across bench invocations. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    spark.read.schema(schemaOf(spark, dir, name)).parquet(path)
  }

  /** The dataset's parquet schema, inferred once per JVM (see
    * [[schemaCache]]) — for callers that need only the schema (e.g.
    * streaming readers, which require a declared schema anyway). */
  def schemaOf(spark: SparkSession, dir: String, name: String): StructType = {
    val path = s"$dir/$name.parquet"
    schemaCache.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")

  /** events.parquet has shipped with `ts` in two physical encodings across
    * testdata generations: TIMESTAMP(NANOS) (which Spark reads as a raw
    * long under the SPARK-36825 legacy flag) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (which Spark infers as TIMESTAMP_NTZ). Branch
    * on the type the scan actually produced instead of hard-coding either
    * convention; both normalize to a session-TZ TimestampType — a pure
    * wall-clock relabel under the UTC session zone every entrypoint pins,
    * so the DuckDB oracle (naive TIMESTAMP) sees identical values. */
  def events(s: SparkSession, d: String): DataFrame = {
    // Concurrency note: this is a MONOTONE idempotent set — the engine
    // only ever writes "true" and nothing ever restores or unsets it
    // (GraftSession-built sessions already carry it from construction;
    // this covers foreign sessions). After the first call the value is
    // stable for the session's lifetime, so no concurrently planning
    // query can observe a flip — unlike set-then-restore windows, which
    // Sessions.pinned exists to eliminate.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(apply(s, d, "events"))
  }

  /** Normalize an `events`-shaped frame's `ts` column to TimestampType,
    * whatever the scan inferred (long nanos / NTZ micros / already µs). */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Fan a CPU-heavy narrow kernel out to every core when the upstream
    * scan produced fewer partitions than the session's parallelism.
    * Small inputs arrive as one file ⇒ one partition ⇒ a single-threaded
    * kernel no matter how many cores the session has (measured: the
    * whole MinHash signature pass ran on 1 of 32 cores at sf0.1). At
    * 100 TB the file count already provides parallelism and this is a
    * no-op — the guard keeps the extra exchange out of the plan when
    * it buys nothing. */
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // Estimate scan parallelism from the file listing (metadata-only) —
    // probing df.rdd would force a full analysis+planning pass at plan
    // time and bypass AQE. A many-file input already fans out on its own
    // (the 100 TB case: thousands of splits ≫ cores ⇒ no extra exchange);
    // only the few-file local case pays the one round-robin shuffle, and
    // there it buys a 32× kernel speedup.
    val files = df.inputFiles
    // no file listing (views, local relations, post-shuffle frames):
    // parallelism is unknowable from metadata — don't guess a shuffle in
    if (files.isEmpty || files.length >= p) return df
    // few files may still SPLIT into >= p scan partitions when large
    // (splittable formats divide at maxPartitionBytes); estimate splits
    // from file sizes — at most p-1 getFileStatus calls, metadata-only
    val maxSplit = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(df.sparkSession.conf
        .get("spark.sql.files.maxPartitionBytes", "128MB"))
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val estSplits = files.map { f =>
      val path = new org.apache.hadoop.fs.Path(f)
      val len =
        try path.getFileSystem(hconf).getFileStatus(path).getLen
        catch { case _: Exception => 0L }
      math.max(1L, (len + maxSplit - 1) / maxSplit)
    }.sum
    if (estSplits < p) df.repartition(p) else df
  }
}
