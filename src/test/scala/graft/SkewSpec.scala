package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation equals the direct aggregation. */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("saltedAgg matches direct groupBy on a skewed key") {
    // 90% of rows share one key — the classic hot-key shape
    val df = (1 to 10000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy(col("k").as("key"))
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Skew.saltedAgg(df, col("k"), col("v"), buckets = 16,
      partials = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      combine = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .as[(String, Long, Long)].collect().toSet
    assert(salted === direct)
  }
}
