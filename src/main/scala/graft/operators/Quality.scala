package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality constraint audit — the pre-flight gate every production
  * table load runs before results are served (the reference trusts its
  * source blindly; a 100 TB pipeline cannot).
  *
  * Design: the whole single-table battery (row count, key completeness,
  * key uniqueness, numeric range, accepted value set) is ONE aggregate
  * over ONE scan — adding a constraint adds an aggregate slot, never a
  * pass. Referential integrity is the only check that needs a second
  * table; it is a broadcast LEFT ANTI count (the dim key set is small
  * relative to the fact at scale — the fact never shuffles). The per-check
  * report rows are unpivoted from the single aggregate row with `stack`,
  * so the check battery costs exactly: one scan + one broadcast anti-join
  * over the key column only.
  *
  * Output contract: (check, observed, passed) — `observed` is the
  * fraction/count the check measured (round 6), `passed` is 0/1 BIGINT.
  * Every check here passes on the clean synthetic tables; QualitySpec
  * proves each check FAILS on a planted violation (a gate that cannot
  * fail is not a gate).
  */
object Quality extends QueryModule {

  /** The one-pass audit over `orders`, RI-checked against `customer`. */
  def auditOrders(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val cust = Tables.customer(s, d).select(col("c_custkey"))
    // single-row aggregate: every intra-table constraint in one pass
    val agg = o.agg(
      count(lit(1)).as("n"),
      count(col("o_orderkey")).as("n_key"),
      count_distinct(col("o_orderkey")).as("ndv_key"),
      sum(when(col("o_totalprice") > 0 &&
               col("o_totalprice") <= 1000000, 1L).otherwise(0L))
        .as("n_price_ok"),
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("n_status_ok"))
    // referential integrity: fact keys with no dim row (broadcast anti)
    val orphans = o.join(broadcast(cust),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    agg.crossJoin(orphans)
      .select(expr(
        """stack(6,
          |  'row_count',        CAST(n AS DOUBLE),           CAST(n > 0 AS INT),
          |  'key_completeness', n_key / n,                   CAST(n_key = n AS INT),
          |  'key_uniqueness',   ndv_key / n,                 CAST(ndv_key = n AS INT),
          |  'price_in_range',   n_price_ok / n,              CAST(n_price_ok = n AS INT),
          |  'status_in_set',    n_status_ok / n,             CAST(n_status_ok = n AS INT),
          |  'custkey_ri',       CAST(n_orphans AS DOUBLE),   CAST(n_orphans = 0 AS INT)
          |) AS (check_name, observed, passed)""".stripMargin))
      .select(col("check_name"), round(col("observed"), 6).as("observed"),
        col("passed").cast("long").as("passed"))
      .orderBy("check_name")
  }

  /** Skew DETECTION — the diagnostic that decides whether a join key
    * needs `Skew.saltedJoin`: the per-key count distribution (ndv-sized
    * after one map-side-combined groupBy), its median/p99 via the
    * distributed-selection quantiles (never a value map — the count
    * table is ndv-sized, which at 100 TB is exactly where `percentile`
    * OOMs), and the max/median skew factor. Run it BEFORE the join;
    * a21_join_size prices the output, this prices the imbalance. */
  def skewReport(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.lineitem(s, d)
      .groupBy("l_orderkey").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val Seq(p50, p99) = Quantiles.exactQuantilesRounded6(
      counts, "c", Seq(0.5, 0.99))
    counts.agg(
      count(lit(1)).as("n_keys"),
      sum("c").as("n_rows"),
      max("c").as("max_per_key"))
      .select(col("n_keys"), col("n_rows"), col("max_per_key"),
        lit(p50).as("p50_per_key"), lit(p99).as("p99_per_key"),
        round(col("max_per_key") / lit(p50), 6).as("skew_factor"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_audit" -> ((s, d) => auditOrders(s, d)),
    "dq_skew_report" -> ((s, d) => skewReport(s, d)))

  def oracles: Map[String, String] = Map(
    "dq_skew_report" ->
      """WITH c AS (SELECT l_orderkey, count(*) AS c FROM lineitem
        |  GROUP BY 1),
        |q AS (SELECT round(quantile_cont(c, 0.5), 6) AS p50,
        |    round(quantile_cont(c, 0.99), 6) AS p99 FROM c)
        |SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
        |  max(c) AS max_per_key, p50 AS p50_per_key, p99 AS p99_per_key,
        |  round(max(c) / p50, 6) AS skew_factor
        |FROM c, q GROUP BY p50, p99""".stripMargin,
    "dq_audit" ->
      """WITH a AS (SELECT count(*) AS n, count(o_orderkey) AS n_key,
        |    count(DISTINCT o_orderkey) AS ndv_key,
        |    sum(CASE WHEN o_totalprice > 0 AND o_totalprice <= 1000000
        |        THEN 1 ELSE 0 END) AS n_price_ok,
        |    sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
        |      AS n_status_ok
        |  FROM orders),
        |r AS (SELECT count(*) AS n_orphans FROM orders
        |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |checks AS (
        |  SELECT 'row_count' AS check_name, CAST(n AS DOUBLE) AS observed,
        |    CASE WHEN n > 0 THEN 1 ELSE 0 END AS passed FROM a
        |  UNION ALL SELECT 'key_completeness', CAST(n_key AS DOUBLE) / n,
        |    CASE WHEN n_key = n THEN 1 ELSE 0 END FROM a
        |  UNION ALL SELECT 'key_uniqueness', CAST(ndv_key AS DOUBLE) / n,
        |    CASE WHEN ndv_key = n THEN 1 ELSE 0 END FROM a
        |  UNION ALL SELECT 'price_in_range', CAST(n_price_ok AS DOUBLE) / n,
        |    CASE WHEN n_price_ok = n THEN 1 ELSE 0 END FROM a
        |  UNION ALL SELECT 'status_in_set', CAST(n_status_ok AS DOUBLE) / n,
        |    CASE WHEN n_status_ok = n THEN 1 ELSE 0 END FROM a
        |  UNION ALL SELECT 'custkey_ri', CAST(n_orphans AS DOUBLE),
        |    CASE WHEN n_orphans = 0 THEN 1 ELSE 0 END FROM r)
        |SELECT check_name, round(observed, 6) AS observed,
        |  CAST(passed AS BIGINT) AS passed
        |FROM checks ORDER BY check_name""".stripMargin)
}
