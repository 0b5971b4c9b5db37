package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Canary for the driver-regenerated testdata's physical conventions.
  *
  * Round 5 post-mortem: the driver regenerated `events.parquet` with `ts`
  * stored as TIMESTAMP(MICROS) where it used to be TIMESTAMP(NANOS); the
  * hard-coded nanos path silently broke 94 queries at VERIFY time, after
  * the builder's last commit. This spec fails the same breakage at TEST
  * time instead: whatever the physical encoding, the normalized reader
  * must produce a session-TZ timestamp in the 2024 event-date range, in
  * both batch and streaming guise.
  */
class TestdataContractSpec extends SparkSuite {

  test("batch events reader yields 2024-range TimestampType ts") {
    val ev = Tables.events(spark, sf())
    assert(ev.schema("ts").dataType == TimestampType)
    val r = ev.agg(
      min(year(col("ts"))).as("y0"), max(year(col("ts"))).as("y1"),
      count(lit(1)).as("n")).head()
    assert(r.getAs[Long]("n") > 0)
    assert(r.getAs[Int]("y0") == 2024,
      s"events.ts min year ${r.getAs[Int]("y0")} — testdata encoding changed again?")
    assert(r.getAs[Int]("y1") == 2024)
  }

  test("streaming events source agrees with the batch reader on time span") {
    import graft.streaming.StreamingOps
    val batchSpan = Tables.events(spark, sf())
      .agg(min("ts").as("lo"), max("ts").as("hi")).head()
    val streamed = StreamingOps.runToMemory(
      spark,
      StreamingOps.eventsStream(spark, sf())
        .groupBy().agg(min("ts").as("lo"), max("ts").as("hi")),
      "contract_span")
    val s = streamed.head()
    assert(s.getAs[java.sql.Timestamp]("lo") == batchSpan.getAs[java.sql.Timestamp]("lo"))
    assert(s.getAs[java.sql.Timestamp]("hi") == batchSpan.getAs[java.sql.Timestamp]("hi"))
  }
}
