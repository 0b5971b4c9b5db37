package graft

import graft.functions.SketchFunctions._
import org.apache.spark.sql.functions._

/** Sketch error-bound guarantees on the real testdata: bloom has no
  * false negatives and bounded false positives; count-min never
  * undercounts and overcounts within eps·N. */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  test("bloom filter: zero false negatives, bounded false positives") {
    val orders = Tables.orders(spark, sf())
    val big = orders.filter(col("o_totalprice") > 300000)
    val bloom = buildBloom(big, col("o_orderkey"),
      expectedItems = 2048L, numBits = 32768L)
    val keys = big.select("o_orderkey").as[Long].collect().toSet
    // no false negatives: every inserted key must probe true
    val misses = orders.filter(col("o_orderkey").isin(keys.toSeq: _*))
      .filter(!mightContain(bloom, col("o_orderkey"))).count()
    assert(misses === 0L, "bloom false negative — impossible by contract")
    // false positives bounded: probe keys far outside the inserted set
    val fp = spark.range(10_000_000, 10_050_000)
      .filter(mightContain(bloom, col("id"))).count()
    assert(fp < 2500, s"false-positive rate ${fp / 50000.0} too high")
  }

  test("count-min sketch: never undercounts, overshoot within eps*N") {
    val li = Tables.lineitem(spark, sf())
    val exact = li.groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val n = exact.values.sum
    val cms = buildCms(li, col("l_partkey"), eps = 0.005, conf = 0.99)
    assert(cms.totalCount() === n)
    val overshootBound = math.ceil(0.005 * n).toLong
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS undercounted key $k: $est < $c")
      assert(est <= c + overshootBound,
        s"CMS overshoot for $k: $est vs $c + $overshootBound")
    }
  }
}
