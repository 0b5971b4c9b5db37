package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL front door: each query here is ONE portable ANSI SQL string,
  * executed verbatim by `spark.sql` over temp views AND by the DuckDB
  * oracle — front-door parser/semantics parity, the strongest form of the
  * differential test (identical text, independent engines).
  *
  * Covers the query shapes the reference shipped as raw SQL to Postgres
  * (src/analyze.py:20-109): scalar subqueries, IN/EXISTS subqueries,
  * HAVING, GROUPING SETS, and the reference's own CTE + ROW_NUMBER +
  * LEAST-clamp 30-back delta chain (src/analyze.py:64-84) in its original
  * multi-CTE form (the collapsed single-pass form is j1_delta_30back).
  *
  * Portability rules: explicit NULLS FIRST/LAST (Spark and DuckDB
  * default differently), exact-decimal aggregation for double sums,
  * CAST(ts AS TIMESTAMP) no-ops on Spark but normalizes DuckDB's
  * TIMESTAMP_NS.
  */
object SqlOps extends QueryModule {

  private val sqlTexts: Map[String, String] = Map(
    "sql_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "sql_in_subquery" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |ORDER BY o_orderkey""".stripMargin,
    "sql_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin,
    "sql_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    // the reference's 30-back delta in its original CTE shape
    // (/root/reference/src/analyze.py:64-84), generalized per key
    "sql_cte_delta" ->
      """WITH days_info AS (
        |  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
        |ordered AS (
        |  SELECT user_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |latest AS (SELECT user_id, value AS last_value FROM ordered WHERE rn = 1),
        |ago AS (
        |  SELECT o.user_id, o.value AS ago_value
        |  FROM ordered o, days_info d
        |  WHERE o.user_id = d.user_id AND o.rn = LEAST(d.cnt, 31))
        |SELECT l.user_id AS user_id, l.last_value - a.ago_value AS delta
        |FROM latest l, ago a
        |WHERE l.user_id = a.user_id
        |ORDER BY l.user_id""".stripMargin)

  private def run(s: SparkSession, d: String, name: String): DataFrame = {
    Seq("orders", "lineitem", "customer")
      .foreach(t => Tables(s, d, t).createOrReplaceTempView(t))
    Tables.events(s, d).createOrReplaceTempView("events")
    s.sql(sqlTexts(name))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sqlTexts.keys.map(n => n -> ((s: SparkSession, d: String) => run(s, d, n)))
      .toMap

  def oracles: Map[String, String] = sqlTexts
}
