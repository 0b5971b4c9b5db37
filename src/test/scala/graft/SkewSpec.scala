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

  test("saltedJoin matches the plain join on a skewed key") {
    val left = (1 to 5000).map(i =>
      (if (i % 20 == 0) s"k${i % 5}" else "HOT", i.toLong)).toDF("k", "v")
    val right = Seq(("HOT", 100L), ("k0", 0L), ("k1", 1L), ("k4", 4L),
      ("MISS", -1L)).toDF("rk", "w")
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "v", "w").as[(String, Long, Long)].collect().sorted
    val salted = Skew.saltedJoin(left, right, col("k"), col("rk"),
        saltSource = col("v"), buckets = 8)
      .select("k", "v", "w").as[(String, Long, Long)].collect().sorted
    assert(salted === plain, "salting must not change join cardinality")
  }
}
