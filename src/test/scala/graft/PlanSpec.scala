package graft

/** Plan-shape regression guards: the scale-critical plan properties the
  * README/PLANS.md claims must keep holding as queries evolve. */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.01"))
      .queryExecution.executedPlan.toString()

  test("filters and pruning reach the parquet scan") {
    val p = plan("p4_in_filter")
    assert(p.contains("PushedFilters: [In(l_returnflag"), p.take(2000))
    assert(!p.contains("l_shipdate"), "pruned column must not be read")
  }

  test("AQE coalesces over-provisioned shuffle partitions at runtime") {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      // a tiny aggregate declared at 64 shuffle partitions: AQE must
      // shrink the exchange read to a handful of coalesced partitions
      // (the knob-forgiveness that lets one conf serve mixed sizes;
      // at 100 TB the SAME mechanism right-sizes each stage off real
      // map-output statistics instead of a static guess)
      val df = Tables.nation(spark, sf("sf0.01"))
        .groupBy("n_regionkey").agg(count(lit(1)).as("n"))
      df.collect() // AQE finalizes the plan only on execution
      val p = df.queryExecution.executedPlan.toString()
      assert(p.contains("AQEShuffleRead") && p.contains("coalesced"),
        s"expected a coalesced AQEShuffleRead in:\n${p.take(2000)}")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("star join broadcasts every dimension") {
    val p = plan("join_star_region")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts")
    assert(!p.contains("BroadcastNestedLoopJoin"), "no cartesian fallback")
  }

  test("simhash signatures plan shuffle-free") {
    val p = graft.operators.Dedup
      .simhashSignatures(Tables.documents(spark, sf("sf0.01")))
      .queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), s"signature stage must be a map:\n$p")
  }

  test("top-1-by-date plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("o1_top1_latest")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("semi/anti joins never materialize probe payload") {
    assert(plan("join_semi").contains("LeftSemi"))
    assert(plan("join_anti").contains("LeftAnti"))
  }

  test("minhash signatures plan shuffle-free (native MinHash64 map)") {
    val p = graft.operators.Dedup
      .minhashSignatures(Tables.documents(spark, sf("sf0.01")))
      .queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), s"signature stage must be a map:\n$p")
    assert(p.contains("minhash64"), p.take(2000))
  }

  test("interval join plans as hash join + residual, never a nested loop") {
    val p = plan("join_range")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the bucketed rewrite must not fall back to a theta join")
  }

  test("bloom semi-join probes map-side before the exact join") {
    val p = plan("join_bloom_semi")
    assert(p.contains("might_contain"), p.take(2000))
    assert(p.contains("LeftSemi"), p.take(2000))
  }

  test("nested struct scan prunes to the one leaf read") {
    val df = SparkEntry.queries("s14_nested_prune")(spark, sf("sf0.01"))
    assert(df.count() > 0)
    val p = df.queryExecution.executedPlan.toString()
    val read = "ReadSchema: ([^\n]*)".r.findAllMatchIn(p)
      .map(_.group(1)).mkString("\n")
    assert(read.contains("totalprice"), read)
    assert(!read.contains("custkey") && !read.contains("status"),
      s"unread struct leaves must be pruned from the scan:\n$read")
  }

  test("join strategy hints override the planner's choice") {
    // the engine surface for when statistics mislead the optimizer:
    // nation is broadcast-sized (planner picks BroadcastHashJoin), but
    // a MERGE / SHUFFLE_HASH hint must flip the physical strategy
    val d = sf("sf0.01")
    Tables.supplier(spark, d).createOrReplaceTempView("hint_sup")
    Tables.nation(spark, d).createOrReplaceTempView("hint_nat")
    def planFor(hint: String): String = spark.sql(
      s"""SELECT /*+ $hint(hint_nat) */ n_name, count(*) AS n
         |FROM hint_sup JOIN hint_nat ON s_nationkey = n_nationkey
         |GROUP BY n_name""".stripMargin)
      .queryExecution.executedPlan.toString()
    assert(planFor("BROADCAST").contains("BroadcastHashJoin"))
    assert(planFor("MERGE").contains("SortMergeJoin"), planFor("MERGE").take(1500))
    assert(planFor("SHUFFLE_HASH").contains("ShuffledHashJoin"),
      planFor("SHUFFLE_HASH").take(1500))
  }

  test("dim-attribute filter dynamically prunes fact partitions") {
    // force the query once so the partitioned layout exists, then
    // re-derive the plan: the fact scan's PartitionFilters must carry a
    // dynamicpruning subquery on o_year (not scan-all-then-filter)
    val df = SparkEntry.queries("join_dpp_pruned")(spark, sf("sf0.01"))
    assert(df.count() > 0)
    val p = df.queryExecution.executedPlan.toString()
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the fact scan in:\n${p.take(4000)}")
  }
}
