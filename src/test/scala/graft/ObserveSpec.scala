package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline observability via `Dataset.observe` — data-quality metrics
  * collected ON the production pass, not by a second scan. The
  * Observation node rides the plan where it is placed: metrics cost one
  * accumulator update per row inside the existing job (the 100 TB
  * contract — a separate metrics query would double the read). */
class ObserveSpec extends SparkSuite {

  test("observe() yields ingest metrics from the same single pass") {
    val obs = Observation("ingest_metrics")
    val out = java.nio.file.Files
      .createTempDirectory("graft_observe").toString
    // metrics observed BEFORE the filter: they describe the raw feed
    // even though the sink only receives the filtered half
    spark.range(0, 1000).toDF("id")
      .withColumn("value", col("id") % 7)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum("value").as("sum_value"),
        count(when(col("value") === 0, 1)).as("n_zero"))
      .filter(col("id") % 2 === 0)
      .write.mode("overwrite").parquet(out)
    val m = obs.get
    assert(m("n_rows") === 1000L)
    assert(m("sum_value") === (0L until 1000L).map(_ % 7).sum)
    assert(m("n_zero") === (0L until 1000L).count(_ % 7 == 0).toLong)
    // the sink got only the filtered rows — the metrics did not
    assert(spark.read.parquet(out).count() === 500L)
  }

  test("observed metrics match a planted violation count (dq gate)") {
    val obs = Observation("dq")
    import spark.implicits._
    val rows = Seq((1L, "ok"), (2L, null), (3L, "ok"), (4L, null))
    val n = rows.toDF("k", "v")
      .observe(obs, count(when(col("v").isNull, 1)).as("null_v"))
      .count()
    assert(n === 4L)
    assert(obs.get("null_v") === 2L,
      "the gate reads violations off the main pass")
  }
}
