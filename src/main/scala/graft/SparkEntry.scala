package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate the per-family QueryModules; every
  * operator from SURVEY.md §2 (plus the LLM-pipeline extensions) is a named
  * entry here, and names present in `oracleSql` are hash-verified against
  * DuckDB by the driver.
  */
object SparkEntry {
  private val modules: Seq[QueryModule] =
    Seq(RelationalOps, WindowOps, JoinOps, ExtendedOps, SqlOps, TextAnalysis,
      Dedup, Similarity, Multimodal, Graph, Quality,
      graft.streaming.StreamingOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join (facts ⋈ broadcast dims) → filtered revenue per region ×
    * return flag → top-k. Exercises scan, pushdown, broadcast join,
    * big-big shuffle join, hash agg, and TakeOrderedAndProject in one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.lineitem(spark, d)
      .filter(col("l_quantity") > 5)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, d)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "l_returnflag")
      .agg(Sql.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
             .as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc)
      .limit(20)
  }

  /** One per implemented operator from SURVEY.md §2.
    *
    * Concurrency contract: entries are safe to build and run
    * concurrently against ONE shared session. Queries that need a conf
    * pinned for their lifetime (iterative loop widths, streaming state
    * partitions, dynamic partition overwrite) pin it on a private
    * session clone via [[graft.Sessions]] — never set-then-restore on
    * the caller's session — and the one shared-session conf write the
    * engine performs (the legacy parquet NANOS flag, Tables.events) is
    * monotone and idempotent. ConcurrencySpec exercises the overlap. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver's rows-only check. */
  def oracleSql: Map[String, String] =
    modules.map(_.oracles).reduce(_ ++ _)
}
