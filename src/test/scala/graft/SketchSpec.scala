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

  test("partitioned HLL sketches merge to a near-exact distinct count") {
    val est = SparkEntry.queries("a12_hll_partitioned")(spark, sf())
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sf())
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("nd"))
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (t, n) =>
      assert(math.abs(est(t) - n).toDouble / n < 0.05,
        s"$t: merged-HLL estimate ${est(t)} too far from exact $n")
    }
  }

  test("native CmsEstimate probe == driver-side estimateCount, key for key") {
    val li = Tables.lineitem(spark, sf())
    val bytes = buildCmsBytes(li, col("l_partkey"), eps = 0.005, conf = 0.99)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    // probe the executor-side expression over the part dictionary and
    // compare every estimate against the driver handle
    val probed = Tables.part(spark, sf())
      .select(col("p_partkey"), cmsEstimate(bytes, col("p_partkey")).as("est"))
      .as[(Long, Long)].collect()
    assert(probed.nonEmpty)
    probed.foreach { case (k, est) =>
      assert(est === cms.estimateCount(k),
        s"executor probe diverged from driver estimate for key $k")
    }
  }

  test("sketch-driven heavy hitters: candidate over-fetch covers the " +
    "exact top-10") {
    // the a11 contract requires estimate-ranked top-200 ⊇ exact top-10;
    // verify directly on the real data so a regression shows up here
    // before the oracle gate
    val li = Tables.lineitem(spark, sf())
    val bytes = buildCmsBytes(li, col("l_partkey"), eps = 0.00002, conf = 0.99)
    val candidates = Tables.part(spark, sf())
      .select(col("p_partkey"), cmsEstimate(bytes, col("p_partkey")).as("est"))
      .orderBy(col("est").desc, col("p_partkey")).limit(200)
      .select("p_partkey").as[Long].collect().toSet
    val top10 = li.groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("l_partkey")).limit(10)
      .select("l_partkey").as[Long].collect()
    val missed = top10.filterNot(candidates.contains)
    assert(missed.isEmpty,
      s"true heavy hitters missing from sketch candidates: ${missed.toSeq}")
  }
}
