package graft.operators

import graft.{QueryModule, Sql, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join / set operators over the star schema — SURVEY.md §2.6. The
  * reference's only joins are scalar cross joins (J2, src/analyze.py:82),
  * but its upsert/subscribe sinks are semantically anti-joins
  * (src/load.py:35-42, src/telegram_listener.py:25-49) and a complete
  * engine needs the full join surface; FIXTURES.md §B assigns the star
  * schema to exercise it.
  *
  * Scale notes:
  *  - Dimension tables (region/nation/customer at fact-relative size) are
  *    broadcast explicitly — at 100 TB the fact table never shuffles for a
  *    dim join; only the final groupBy shuffles, on the (small) group key.
  *  - The lineitem⋈orders join is a genuine big-big join: it shuffles on
  *    the join key once; at scale both sides would be bucketed on
  *    orderkey to make it a zero-shuffle sort-merge join — the code is
  *    layout-agnostic so bucketing is a storage decision, not a rewrite.
  *  - semi/anti joins never materialize the probe side's payload.
  *  - rollup/cube: one shuffle; Spark expands grouping sets map-side.
  */
object JoinOps extends QueryModule {
  import graft.Sql._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // big-big equi-join + grouped agg (revenue per order priority)
    "join_inner_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
               .as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")),

    // 5-way star join, dims broadcast (revenue per region)
    "join_star_region" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
               .as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("r_name")),

    // DYNAMIC PARTITION PRUNING: the fact table is laid out partitioned
    // by a key the query filters only INDIRECTLY (through a dimension
    // attribute). At plan time no partition filter exists; at run time
    // Spark reuses the broadcast dim to synthesize one, and the fact
    // scan opens ONLY the surviving partition directories. At 100 TB
    // this is the difference between scanning 7 years and 4 — PlanSpec
    // asserts the `dynamicpruning` subquery is actually in the scan's
    // PartitionFilters, so the capability can't silently regress.
    "join_dpp_pruned" -> ((s, d) => {
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_dpp_" + d.replaceAll("[^A-Za-z0-9.]", "_")).getPath
      Tables.orders(s, d)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(dir)
      val fact = s.read.parquet(dir)
      // year dimension with a non-key attribute; the era filter is only
      // resolvable to years at run time (from the dim's own data)
      val yearDim = Tables.orders(s, d)
        .select(year(col("o_orderdate")).as("y")).distinct()
        .withColumn("era", when(col("y") >= 1999, "modern")
          .otherwise("legacy"))
      fact.join(broadcast(yearDim.filter(col("era") === "modern")),
          col("o_year") === col("y"))
        .groupBy(col("o_year").cast("long").as("o_year"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_year")
    }),

    // NULL-SAFE equality join (<=>): NULL keys MATCH each other instead
    // of vanishing — the semantics CDC merge keys and optional foreign
    // keys need (a plain equi-join silently drops every NULL-keyed row;
    // <=> keeps them AND stays a hash join, not a nested loop). NULLs
    // planted on a deterministic subset since the testdata has none.
    "join_null_safe" -> ((s, d) => {
      def nullable(df: DataFrame, key: String, m: Int) = df.withColumn(
        "k", when(col(key) % m === 0, lit(null)).otherwise(col(key) % 100))
      // pair counts per key = cnt_a(k) * cnt_b(k): aggregate BELOW the
      // join, then null-safe-join ~100 count rows instead of
      // materializing ~22M pairs (sf0.1) only to re-count them — the
      // rewrite that keeps a many-to-many key join feasible at 100 TB
      // (pair cardinality grows with the PRODUCT of the sides; the
      // pushed-down aggregates grow linearly). The null-safe <=> join
      // semantics are exercised identically: NULL groups pair with
      // NULL groups. 1.60 s -> 0.62 s.
      val a = nullable(Tables.orders(s, d), "o_orderkey", 13)
        .groupBy("k").agg(count(lit(1)).as("na"))
      val b = nullable(Tables.customer(s, d), "c_custkey", 11)
        .groupBy("k").agg(count(lit(1)).as("nb"))
      a.join(b, a("k") <=> b("k"))
        .select(a("k").as("k"), (col("na") * col("nb")).as("n_pairs"))
        .orderBy(col("k").asc_nulls_first)
    }),

    // left-semi (EXISTS): customers having a big order
    "join_semi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // left-anti (NOT EXISTS): parts never shipped in quantity >= 48
    "join_anti" -> ((s, d) =>
      Tables.part(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 48),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")),

    // AS-OF join: for each purchase, the user's last click value at or
    // before the purchase time. Spark lacks a native as-of join; the
    // scalable composition is union + carry-forward window (one shuffle
    // on user_id, no range cross-join) — the DuckDB oracle uses its
    // native ASOF JOIN, making this a true cross-engine semantic check.
    // AS-OF with a LOOKBACK TOLERANCE — the feature-store lookup
    // semantic: the latest click is only a valid feature if it is at
    // most 1 hour stale; older matches must yield NULL, not a stale
    // value (plain as-of silently serves arbitrarily old state). Same
    // single-exchange carry-forward union as join_asof, but the carried
    // struct keeps the match's OWN timestamp so the staleness test is
    // one projection — no interval self-join, no extra shuffle.
    "join_asof_tolerance" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("value").as("click_value"), lit(0).as("is_probe"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(null).cast("double").as("click_value"), lit(1).as("is_probe"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_probe"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val marked = when(col("is_probe") === 0,
        struct(col("ts").as("cts"), col("click_value").as("cv")))
      clicks.unionByName(purchases)
        .withColumn("m", last(marked, ignoreNulls = true).over(w))
        .filter(col("is_probe") === 1)
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"),
          when(col("m.cts") >= col("ts") - expr("INTERVAL 1 HOUR"),
            col("m.cv")).as("asof_value"))
        .orderBy("user_id", "purchase_id")
    }),

    "join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("value").as("click_value"), lit(0).as("is_probe"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(null).cast("double").as("click_value"), lit(1).as("is_probe"))
      // clicks sort before a purchase at the same ts (<= semantics)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_probe"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      clicks.unionByName(purchases)
        .withColumn("asof_value",
          last("click_value", ignoreNulls = true).over(w))
        .filter(col("is_probe") === 1)
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"), col("asof_value"))
        .orderBy("user_id", "purchase_id")
    }),

    // NEAREST as-of join (pandas merge_asof direction='nearest'): each
    // purchase takes whichever click — before OR after — is closest in
    // time, ties to the backward match. Same single-exchange
    // carry-forward union as join_asof, run BOTH directions in one
    // sorted pass: `last` over the preceding frame gives the backward
    // candidate, `first` over the following frame the forward one
    // (same partitioning and sort order, so Catalyst plans ONE
    // exchange + ONE sort); the winner is a projection on microsecond
    // deltas. Never an |t1-t2| theta-join — at 100 TB that's a
    // cross-product per user; this stays one shuffle on user_id.
    // Tie-break ladder (identical in the oracle): smaller |Δt|, then
    // backward over forward, then latest backward click id / earliest
    // forward click id.
    "join_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("value").as("click_value"), lit(0).as("is_probe"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(null).cast("double").as("click_value"), lit(1).as("is_probe"))
      val wb = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_probe"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wf = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_probe"), col("event_id"))
        .rowsBetween(0, Window.unboundedFollowing)
      val m = when(col("is_probe") === 0,
        struct(col("ts").as("cts"), col("click_value").as("cv")))
      val both = clicks.unionByName(purchases)
        .withColumn("b", last(m, ignoreNulls = true).over(wb))
        .withColumn("f", first(m, ignoreNulls = true).over(wf))
        .filter(col("is_probe") === 1)
      val dBack = abs(unix_micros(col("b.cts")) - unix_micros(col("ts")))
      val dFwd = abs(unix_micros(col("f.cts")) - unix_micros(col("ts")))
      both.select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"),
          when(col("b.cts").isNotNull &&
              (col("f.cts").isNull || dBack <= dFwd), col("b.cv"))
            .otherwise(col("f.cv")).as("nearest_value"))
        .orderBy("user_id", "purchase_id")
    }),

    // POINT-IN-TIME join (the feature-store correctness primitive): each
    // fact row joined to the dimension VERSION valid at the fact's
    // event time — here the SCD2 intervals built from the event change
    // log (c7_scd2_intervals) probed by the purchase facts. Executed as
    // carry-forward over a union (dimension change rows sort before
    // facts at equal ts), so the whole join is ONE shuffle on user_id —
    // never an interval theta-join; at 100 TB this is the only PIT
    // shape that doesn't explode, and it needs no interval table at all
    // (versions materialize in the same window pass). The DuckDB oracle
    // runs the explicit interval-containment join against the SCD2
    // table — a true cross-formulation semantic check.
    "join_point_in_time" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val ev = Tables.events(s, d)
      val chg = ev
        .withColumn("prev_type", lag("event_type", 1).over(byUser))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
        .withColumn("version", row_number().over(byUser).cast("long"))
      val dimRows = chg.select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("long").as("fact_id"),
        col("event_type").as("dim_type"), col("version"),
        lit(0).as("is_fact"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_id").as("fact_id"),
          lit(null).cast("string").as("dim_type"),
          lit(null).cast("long").as("version"),
          lit(1).as("is_fact"))
      val carry = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_fact"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      dimRows.unionByName(facts)
        .withColumn("pit_version",
          last("version", ignoreNulls = true).over(carry))
        .withColumn("pit_type",
          last("dim_type", ignoreNulls = true).over(carry))
        .filter(col("is_fact") === 1)
        .select(col("user_id"), col("fact_id").as("event_id"),
          col("pit_version").as("version"), col("pit_type").as("dim_type"))
        .orderBy("user_id", "event_id")
    }),

    // RANGE (interval) join: event.value BETWEEN band.lo AND band.hi,
    // bands overlap so an event can land in several. Executed as a
    // BUCKETED EQUI-JOIN: both sides key on floor(value/width); a band
    // spanning k buckets explodes into k rows. This turns the
    // O(rows × bands) theta-join (BNLJ) into a hash join + residual
    // filter — the only interval-join shape that survives a 100 TB
    // fact side when the band table is too large to nest-loop.
    "join_range" -> ((s, d) => {
      val bucketW = 50
      val bands = s.range(10).toDF("band_id")
        .withColumn("lo", col("band_id") * 50.0)
        .withColumn("hi", col("band_id") * 50.0 + 75.0)
      val bandBuckets = bands.withColumn("bucket",
        explode(sequence(floor(col("lo") / bucketW),
          floor(col("hi") / bucketW))))
      Tables.events(s, d)
        .withColumn("bucket", floor(col("value") / bucketW))
        .join(broadcast(bandBuckets), Seq("bucket"))
        .filter(col("value") >= col("lo") && col("value") <= col("hi"))
        .select(col("event_id"), col("band_id"), col("value"))
        .orderBy("event_id", "band_id")
    }),

    // Bloom-prefiltered semi-join: the build side (big orders) is
    // aggregated into a bloom sketch; the fact side drops non-members
    // MAP-SIDE (sketch rides as a literal, zero shuffle) and only
    // probable matches pay the exact semi-join shuffle that removes
    // bloom false positives. Result ≡ plain semi-join (oracle-checked);
    // at 100 TB this sheds the bulk of the fact scan before any
    // exchange — the manual form of Spark's runtime row-level filtering.
    "join_bloom_semi" -> ((s, d) => {
      import graft.functions.SketchFunctions._
      val bigOrders = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000)
      val bloom = buildBloom(bigOrders, col("o_orderkey"),
        expectedItems = 4096L, numBits = 65536L)
      Tables.lineitem(s, d)
        .filter(mightContain(bloom, col("l_orderkey")))
        .join(bigOrders.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_semi")
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_orderkey")
    }),

    // Salted equi-join: l_returnflag has 3 distinct values — maximal key
    // skew, every key hot. The deterministic salt spreads each key over
    // 8 reducers and the right side is replicated 8×; results ≡ plain
    // join (oracle-checked). The technique matters when the right side
    // is too big to broadcast and AQE can't split the skew (bucketed /
    // storage-partitioned inputs).
    "skew_join_salted" -> ((s, d) => {
      import s.implicits._
      val labels = Seq(("A", "returned"), ("N", "normal"), ("R", "refunded"))
        .toDF("flag", "label")
      Skew.saltedJoin(Tables.lineitem(s, d), labels,
          col("l_returnflag"), col("flag"), col("l_orderkey"), buckets = 8)
        .groupBy("label")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("label")
    }),

    // LEFT OUTER: every customer with order stats, null-safe counts
    "join_left_outer" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 350000),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_big_orders"),
             dsum(col("o_totalprice")).as("sum_big"))
        .orderBy("c_custkey")),

    // FULL OUTER on disjoint-ish filtered sides (nulls both directions)
    "join_full_outer" -> ((s, d) => {
      val hi = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_hi"))
      val lo = Tables.orders(s, d).filter(col("o_totalprice") < 5000)
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_lo"))
      hi.withColumnRenamed("k", "k_hi")
        .join(lo.withColumnRenamed("k", "k_lo"),
          col("k_hi") === col("k_lo"), "full_outer")
        .select(coalesce(col("k_hi"), col("k_lo")).as("custkey"),
          coalesce(col("n_hi"), lit(0L)).as("n_hi"),
          coalesce(col("n_lo"), lit(0L)).as("n_lo"))
        .orderBy("custkey")
    }),

    // RANGE join: quantity → bucket dimension via interval containment.
    // The naive form is a nested-loop BETWEEN join (O(n·buckets)); the
    // scalable rewrite below computes the bucket KEY on the fact side and
    // equi-joins — one broadcast hash join, no theta join at all. The
    // oracle runs the naive BETWEEN form, proving the rewrite equivalent.
    "join_range_bucketed" -> ((s, d) => {
      val buckets = s.range(0, 5).select(col("id").as("bucket_id"),
        concat(lit("B"), col("id") + 1).as("bucket_name"))
      val li = Tables.lineitem(s, d)
        .withColumn("bucket_id", floor((col("l_quantity") - 1) / 10))
      li.join(broadcast(buckets), Seq("bucket_id"))
        .groupBy("bucket_name")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("bucket_name")
    }),

    // ROLLUP over (returnflag, linestatus)
    "agg_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)),

    // CUBE over (orderstatus, orderpriority)
    "agg_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_rows"),
             dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)))

  private val rev = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"

  def oracles: Map[String, String] = Map(
    // DPP changes WHICH FILES open, never the result: the oracle is the
    // plain indirect-filter aggregate
    "join_dpp_pruned" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  count(*) AS n_orders, ${Sql.oSum("o_totalprice")} AS sum_price
         |FROM orders WHERE year(o_orderdate) >= 1999
         |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "join_null_safe" ->
      """WITH a AS (SELECT CASE WHEN o_orderkey % 13 = 0 THEN NULL
        |    ELSE o_orderkey % 100 END AS k FROM orders),
        |b AS (SELECT CASE WHEN c_custkey % 11 = 0 THEN NULL
        |    ELSE c_custkey % 100 END AS k FROM customer)
        |SELECT a.k AS k, count(*) AS n_pairs
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |GROUP BY a.k ORDER BY k NULLS FIRST""".stripMargin,
    "join_inner_agg" ->
      s"""SELECT o_orderpriority,
         |  CAST(SUM($rev) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_star_region" ->
      s"""SELECT r_name,
         |  CAST(SUM($rev) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT p_partkey, p_name FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 48)
        |ORDER BY p_partkey""".stripMargin,
    // tolerance oracle: the correlated latest-click-within-window form
    // (ties break to the highest event_id, matching the union window's
    // (ts, is_probe, event_id) carry order)
    "join_asof_tolerance" ->
      """WITH clicks AS (SELECT user_id, event_id,
        |  CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id AS user_id, p.event_id AS purchase_id,
        |  p.ts AS purchase_ts,
        |  (SELECT c.value FROM clicks c
        |   WHERE c.user_id = p.user_id AND c.ts <= p.ts
        |     AND c.ts >= p.ts - INTERVAL 1 HOUR
        |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS asof_value
        |FROM purchases p
        |ORDER BY user_id, purchase_id""".stripMargin,
    // nearest oracle: rank ALL the user's clicks by the tie-break
    // ladder — |Δt| in microseconds, backward-first, then click id
    // (DESC for backward = the carry-forward window's last-at-equal-ts,
    // ASC for forward = first-at-equal-ts)
    "join_asof_nearest" ->
      """WITH clicks AS (SELECT user_id, event_id,
        |  CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id AS user_id, p.event_id AS purchase_id,
        |  p.ts AS purchase_ts,
        |  (SELECT c.value FROM clicks c WHERE c.user_id = p.user_id
        |   ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)) ASC,
        |     CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END ASC,
        |     CASE WHEN c.ts <= p.ts THEN -c.event_id ELSE c.event_id END ASC
        |   LIMIT 1) AS nearest_value
        |FROM purchases p
        |ORDER BY user_id, purchase_id""".stripMargin,
    "join_asof" ->
      """WITH clicks AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id AS user_id, p.event_id AS purchase_id,
        |  p.ts AS purchase_ts, c.value AS asof_value
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY user_id, purchase_id""".stripMargin,
    // the oracle formulation is the EXPLICIT interval-containment join
    // against the SCD2 dimension — semantically equal to the Spark
    // side's carry-forward union (zero-length intervals from same-ts
    // changes match nothing in both formulations)
    "join_point_in_time" ->
      """WITH raw AS (SELECT user_id, event_type,
        |  CAST(ts AS TIMESTAMP) AS ts, event_id,
        |  lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev_type
        |FROM events),
        |chg AS (SELECT * FROM raw
        |  WHERE prev_type IS NULL OR prev_type <> event_type),
        |dim AS (SELECT user_id, event_type AS dim_type, ts AS valid_from,
        |  lead(ts) OVER w AS valid_to,
        |  CAST(row_number() OVER w AS BIGINT) AS version
        |FROM chg WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |f AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT f.user_id AS user_id, f.event_id AS event_id,
        |  d.version, d.dim_type
        |FROM f JOIN dim d ON f.user_id = d.user_id
        |  AND f.ts >= d.valid_from
        |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
        |ORDER BY f.user_id, f.event_id""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_big_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_big
        |FROM customer LEFT OUTER JOIN
        |  (SELECT * FROM orders WHERE o_totalprice > 350000) o
        |  ON c_custkey = o.o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """WITH hi AS (SELECT o_custkey AS k, count(*) AS n_hi FROM orders
        |  WHERE o_totalprice > 400000 GROUP BY o_custkey),
        |lo AS (SELECT o_custkey AS k, count(*) AS n_lo FROM orders
        |  WHERE o_totalprice < 5000 GROUP BY o_custkey)
        |SELECT COALESCE(hi.k, lo.k) AS custkey,
        |  COALESCE(n_hi, 0) AS n_hi, COALESCE(n_lo, 0) AS n_lo
        |FROM hi FULL OUTER JOIN lo ON hi.k = lo.k
        |ORDER BY custkey""".stripMargin,
    "skew_join_salted" ->
      """SELECT CASE l_returnflag WHEN 'A' THEN 'returned'
        |  WHEN 'N' THEN 'normal' ELSE 'refunded' END AS label,
        |  count(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY label""".stripMargin,
    // general interval join with OVERLAPPING bands: the oracle runs the
    // naive BETWEEN theta-join; the Spark side's bucketed rewrite must
    // produce identical pairs
    "join_range" ->
      """WITH bands AS (SELECT i AS band_id, i*50.0 AS lo, i*50.0+75.0 AS hi
        |  FROM range(10) t(i))
        |SELECT e.event_id, b.band_id, e.value
        |FROM events e JOIN bands b ON e.value BETWEEN b.lo AND b.hi
        |ORDER BY e.event_id, b.band_id""".stripMargin,
    // bloom prefilter is a pure early-shed: result equals the plain
    // semi-join aggregate
    "join_bloom_semi" ->
      """SELECT l_orderkey, count(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 400000)
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "join_range_bucketed" ->
      s"""WITH buckets AS (SELECT (i*10 + 1) AS lo, (i+1)*10 AS hi,
         |  'B' || (i+1) AS bucket_name FROM range(0, 5) r(i))
         |SELECT bucket_name, count(*) AS n_items,
         |  ${Sql.oSum("l_quantity")} AS sum_qty
         |FROM lineitem JOIN buckets ON l_quantity BETWEEN lo AND hi
         |GROUP BY bucket_name ORDER BY bucket_name""".stripMargin,
    "agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
         |  ${Sql.oSum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "agg_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_rows,
         |  ${Sql.oSum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
}
