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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")

  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects. Read nanos as long (SPARK-36825 legacy flag) and
    * convert to a microsecond TimestampType; the testdata has zero sub-µs
    * remainder, so the conversion is lossless (verified). DuckDB-oracle
    * queries mirror this with CAST(ts AS TIMESTAMP). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Explicit schema for the events table — needed by the Structured
    * Streaming file source (readStream requires a user schema). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))
}
