package graft.streaming

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming surface — SURVEY.md §2.10. The reference is daily
  * micro-batch (Airflow cron, dags/currency_etl.py:117); the faithful
  * Spark analog is a file-source stream with Trigger.AvailableNow: same
  * code as batch, incremental file discovery, exactly-once per file.
  *
  * `stream_tumbling_daily` runs a REAL streaming query (file source →
  * event-time tumbling window agg → memory sink, complete mode) and
  * returns its result; the oracle is the equivalent batch SQL — streaming
  * and batch agree because event-time windows are deterministic.
  *
  * Scale notes: at 100 TB/day the same topology runs with a watermark +
  * append mode into a partitioned sink; state is bounded by
  * (windows × event_types), not input size. Late/duplicate handling for
  * the upsert path is `dropDuplicatesWithinWatermark` on the natural key
  * (SURVEY §2.10) — demonstrated in StreamingSpec.
  */
object StreamingOps extends QueryModule {

  /** events schema as stored (ts is TIMESTAMP(NANOS) → read as long). */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over the events table (nanos → µs timestamp). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file source requires a directory: point it at the sf dir and
    // glob-select the events file
    spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }

  /** Run a streaming DataFrame to completion into a memory sink and
    * return the materialized result. */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
                  mode: String = "complete"): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val q = streamed.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling_daily" -> ((s, d) => {
      val agg = eventsStream(s, d)
        .groupBy(window(col("ts"), "1 day").getField("start").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          graft.Sql.dsum(col("value")).as("sum_value"))
      runToMemory(s, agg, "graft_stream_daily")
        .orderBy("day", "event_type")
    }))

  def oracles: Map[String, String] = Map(
    "stream_tumbling_daily" ->
      s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
         |  count(*) AS n_events, ${graft.Sql.oSum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin)
}
