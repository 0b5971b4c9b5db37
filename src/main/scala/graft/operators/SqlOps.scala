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
    // TPC-H Q1 (pricing summary report) — the canonical wide-aggregate
    // scan, verbatim on both engines; every money sum rides the exact
    // DECIMAL discipline so the grouped report is hash-identical.
    // One pushed-filter scan + one 4-group hash aggregate.
    // The cast scale must cover the EXACT product scale (price 2dp ×
    // discount 2dp × tax 2dp = 6dp): a narrower DECIMAL(18,4) forces a
    // round at the exact .xxxx50 half-way point, where Spark (HALF_UP)
    // and DuckDB (half-even) disagree — the r4 sum_charge hash miss.
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_base_price,
        |  round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_disc_price,
        |  round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) *
        |    (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_charge,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / COUNT(*), 6) AS avg_qty,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) / COUNT(*), 6) AS avg_price,
        |  round(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
        |    / COUNT(*), 6) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // TPC-H Q3 shape (shipping-priority top-10) — segment dim filter,
    // two date windows, revenue ranking with explicit tiebreaks
    // (o_shippriority isn't in the fixture schema; o_orderpriority
    // stands in). Plans as two broadcast-dim joins + TakeOrdered.
    "tpch_q3" ->
      """SELECT l_orderkey,
        |  round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,
    // TPC-H Q5 (local supplier volume) — the 6-table star/snowflake
    // join with the customer-nation = supplier-nation locality
    // predicate; dims broadcast, the fact side never re-shuffles.
    "tpch_q5" ->
      """SELECT n_name,
        |  round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    // TPC-H Q6 (forecast revenue change) — the pure pushed-predicate
    // single-aggregate scan; the whole WHERE reaches the parquet reader
    "tpch_q6" ->
      """SELECT round(CAST(SUM(CAST(l_extendedprice * l_discount
        |    AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    // TPC-H Q4 shape (order priority checking) — the classic CORRELATED
    // EXISTS against the fact table. The fixture schema has no
    // commit/receipt dates, so "late line" is l_shipdate more than 60
    // days after the order date — a correlation on BOTH tables' columns
    // (equi key + non-equi date), which Spark must decorrelate into ONE
    // left-semi join (never a per-order re-scan of lineitem); the
    // orders date window is pushed to the scan.
    "tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |      WHERE l.l_orderkey = o.o_orderkey
        |        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // TPC-H Q18 shape (large-volume customer) — the big-group HAVING
    // filter: an aggregate subquery keeps only orders whose total
    // quantity clears a high bar, then the three-table join re-groups
    // the survivors. The IN-subquery plans as a semi join against a
    // map-side-combined aggregate of the fact table; the outer join
    // tree only ever sees the surviving orderkeys. Exact-decimal
    // quantity sums on BOTH the HAVING bar and the output column.
    "tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6)
        |    AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,
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
    // correlated EXISTS + NOT EXISTS in one predicate — Spark
    // decorrelates both into semi/anti joins (never a per-row
    // re-execution), which is the plan shape that survives scale
    "sql_exists_subquery" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |        WHERE o.o_custkey = c.c_custkey
        |          AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |        WHERE o2.o_custkey = c.c_custkey
        |          AND o2.o_totalprice < 2000)
        |ORDER BY c_custkey""".stripMargin,
    // bag-semantics set op: EXCEPT ALL keeps multiplicity (a customer
    // with 5 big orders and 2 late ones survives 3 times) — the
    // row-accounting semantics DISTINCT-based set_except can't express
    "sql_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |EXCEPT ALL
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,
    "sql_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin,
    "sql_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    // recursive CTE (Spark 4 WITH RECURSIVE): a month calendar SPINE —
    // the gap-filling pattern every reporting pipeline needs (a month
    // with no orders must still appear, at 0). The recursion generates
    // 12 driver-side rows; the fact side is one pushed-down grouped
    // scan — recursion never touches data volume.
    "sql_recursive_spine" ->
      """WITH RECURSIVE months(m) AS (
        |  SELECT TIMESTAMP '1995-01-01 00:00:00'
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH FROM months
        |  WHERE m < TIMESTAMP '1995-12-01 00:00:00')
        |SELECT m AS month,
        |  COALESCE(r.revenue, 0.0) AS revenue,
        |  COALESCE(r.n_orders, 0) AS n_orders
        |FROM months LEFT JOIN (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mo,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |    COUNT(*) AS n_orders
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |  GROUP BY 1) r ON r.mo = months.m
        |ORDER BY month""".stripMargin,
    // correlated LATERAL subquery: per-customer top-3 orders — the
    // per-entity top-N idiom as SQL text (the DataFrame twin is the
    // window-rank path, w1/o2). Spark decorrelates the LIMIT subquery
    // into a ranked join, not a per-row re-execution.
    "sql_lateral_topn" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 3) o ON true
        |WHERE c.c_custkey <= 50
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
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
    Seq("orders", "lineitem", "customer", "supplier", "nation", "region")
      .foreach(t => Tables(s, d, t).createOrReplaceTempView(t))
    Tables.events(s, d).createOrReplaceTempView("events")
    s.sql(sqlTexts(name))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sqlTexts.keys.map(n => n -> ((s: SparkSession, d: String) => run(s, d, n)))
      .toMap

  def oracles: Map[String, String] = sqlTexts
}
