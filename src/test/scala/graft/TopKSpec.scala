package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The TopKPerKey whole-operator extension: equivalence with the window
  * formulation, deterministic tie-breaks, NULL exclusion, and the plan
  * shape that justifies its existence (partial before the exchange,
  * no sort, no window). */
class TopKSpec extends SparkSuite {
  import spark.implicits._

  test("matches the window row_number formulation on real data") {
    val o = Tables.orders(spark, sf())
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val got = TopK.topKPerKey(o, Seq("o_custkey"), "o_totalprice",
        "o_orderkey", k = 3)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val want = o.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    assert(got === want)
  }

  test("ties rank by ascending tie column; NULL values rank last") {
    val df = Seq(
      ("a", 1L, Some(5.0)), ("a", 2L, Some(5.0)), ("a", 3L, Some(5.0)),
      ("a", 4L, None), ("b", 5L, Some(1.0)), ("b", 6L, None),
      ("c", 7L, None)
    ).toDF("key", "id", "v")
    val got = TopK.topKPerKey(df, Seq("key"), "v", "id", k = 2)
      .select("key", "id").as[(String, Long)].collect().toSet
    // key a: three tied 5.0s -> ids 1,2 win, the NULL is outranked;
    // key b: only one non-null, so the NULL fills the second slot;
    // key c: all-null group still yields its rows (row_number semantics)
    assert(got === Set(("a", 1L), ("a", 2L), ("b", 5L), ("b", 6L), ("c", 7L)))
  }

  test("optimizer rule rewrites the rank-filter idiom onto the heap plan") {
    import graft.plans.{TopKRewrite, TopKStrategy}
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
    try {
      // ties AND nulls, rank column dropped afterwards — the QUALIFY shape
      val df = Seq(
        ("a", 1, Some(5.0)), ("a", 2, Some(5.0)), ("a", 3, Some(7.0)),
        ("a", 4, None), ("b", 5, Some(1.0)), ("b", 6, None), ("c", 7, None)
      ).toDF("key", "id", "v")
      val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
      val q = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).select("key", "id")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("FinalTopKPerKey"), s"no heap operator in:\n$plan")
      assert(!plan.contains("Window"), s"window machinery survived:\n$plan")
      assert(!plan.contains("Sort "), s"sort survived the rewrite:\n$plan")
      // same rows as the (unrewritten) rank-projecting formulation
      val want = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).select("key", "id", "rn").drop("rn")
        .as[(String, Int)].collect().toSet
      assert(q.as[(String, Int)].collect().toSet === want)
      // guard: projecting the rank column disables the rewrite
      val keepRn = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).select("key", "id", "rn")
      assert(!keepRn.queryExecution.executedPlan.toString
        .contains("TopKPerKey"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKRewrite)
    }
  }

  test("exact across partitionings (partial merge is lossless)") {
    val df = (1L to 1000L).map(i => (i % 7, i, (i % 13).toDouble))
      .toDF("key", "id", "v")
    val expected = TopK.topKPerKey(df.coalesce(1), Seq("key"), "v", "id", 4)
      .select("id").as[Long].collect().toSet
    val sharded = TopK.topKPerKey(df.repartition(16), Seq("key"), "v", "id", 4)
      .select("id").as[Long].collect().toSet
    assert(sharded === expected)
  }

  test("plan: partial before the exchange, no Sort/Window in the operator") {
    val o = Tables.orders(spark, sf())
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val plan = TopK.topKPerKey(o, Seq("o_custkey"), "o_totalprice",
      "o_orderkey", k = 2).queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopKPerKey"))
    assert(plan.contains("FinalTopKPerKey"))
    assert(plan.indexOf("PartialTopKPerKey") > plan.indexOf("FinalTopKPerKey"),
      "partial must sit below final (map side of the exchange)")
    // executedPlan.toString strips the Exec suffix — match the node
    // names as printed ("Window [", "Sort ["), not the class names
    assert(!plan.contains("Window ") && !plan.contains("Sort ["),
      s"bounded-heap operator must not plan a sort/window:\n$plan")
  }

  test("NaN ranks greatest, matching the window DESC ordering") {
    val df = Seq(
      ("a", 1L, Double.NaN), ("a", 2L, 99.0), ("a", 3L, 1.0)
    ).toDF("key", "id", "v")
    val got = TopK.topKPerKey(df, Seq("key"), "v", "id", k = 2)
      .select("id").as[Long].collect().toSet
    val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .select("id").as[Long].collect().toSet
    assert(got === want && got === Set(1L, 2L))
  }
}
