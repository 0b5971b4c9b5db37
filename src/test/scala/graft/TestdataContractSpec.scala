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

  test("documents/embeddings/lineitem physical contracts hold") {
    import org.apache.spark.sql.types._
    val docs = Tables.documents(spark, sf())
    val dt = docs.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(dt("doc_id") == LongType)
    assert(dt("text") == StringType)
    assert(dt("n_chars") == LongType || dt("n_chars") == IntegerType,
      s"n_chars became ${dt("n_chars")}")
    val emb = Tables.embeddings(spark, sf())
    val et = emb.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(et("vec_id") == LongType)
    assert(et("embedding").isInstanceOf[ArrayType],
      s"embedding became ${et("embedding")}")
    assert(emb.select(size(col("embedding"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(64),
      "embedding dimensionality changed from 64")
    val li = Tables.lineitem(spark, sf())
    val lt = li.schema("l_shipdate").dataType
    assert(lt == TimestampType || lt == TimestampNTZType || lt == DateType,
      s"l_shipdate became $lt — date-literal comparisons in the SQL " +
        "front door would silently change meaning")
  }

  test("legacy TIMESTAMP(NANOS) encoding still reads through the same branch") {
    // the round-4 testdata stored ts as TIMESTAMP(NANOS); the committed
    // fixture (pyarrow timestamp[ns], 50 rows of real sf0.001 events)
    // keeps the legacy LongType-under-nanosAsLong branch of
    // Tables.normalizeTs alive in CI — if the driver ever regenerates
    // back to nanos, this branch must still produce 2024-range
    // timestamps, not a silent 1000x compression
    val dir = getClass.getResource("/nanos/events.parquet").getPath
      .stripSuffix("/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val r = ev.agg(min(year(col("ts"))).as("y0"),
      max(year(col("ts"))).as("y1"), count(lit(1)).as("n")).head()
    assert(r.getAs[Long]("n") == 50L)
    assert(r.getAs[Int]("y0") == 2024 && r.getAs[Int]("y1") == 2024)
    // and it must agree row-for-row with the micros encoding of the
    // same events
    val micros = Tables.events(spark, sf()).filter(col("event_id") <=
      ev.agg(max("event_id")).head.getLong(0))
      .select("event_id", "ts").collect()
      .map(r2 => r2.getLong(0) -> r2.getTimestamp(1)).toMap
    ev.select("event_id", "ts").collect().foreach { r2 =>
      assert(r2.getTimestamp(1) == micros(r2.getLong(0)),
        s"event ${r2.getLong(0)}: nanos path disagrees with micros path")
    }
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
