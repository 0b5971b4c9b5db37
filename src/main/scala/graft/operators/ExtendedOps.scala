package graft.operators

import graft.{QueryModule, Sql, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface beyond the reference's own queries — set operations,
  * pivot, percentiles, lag/lead/rank/ntile, sessionization, generators,
  * string/date batteries, JSON-path extraction, sliding event-time
  * windows. The reference delegates all querying to Postgres; a complete
  * replacement engine must cover the standard surface its warehouse
  * offered, so these round out SURVEY.md §2's "engine gets real joins /
  * functions from Catalyst for free" claim with verified queries.
  *
  * Scale notes: set ops and distinct are hash shuffles on the projected
  * key only; sessionization is one window shuffle per user (the classic
  * gap-island formulation — no self-join); posexplode is a generator
  * (no shuffle); sliding windows fan each row into windowSize/slide
  * rows map-side.
  */
object ExtendedOps extends QueryModule {
  import graft.Sql._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // UNION ALL + de-dup union (DISTINCT) of two projections
    "set_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val hi = o.filter(col("o_totalprice") > 350000).select("o_custkey")
      val lo = o.filter(col("o_totalprice") < 10000).select("o_custkey")
      hi.union(lo).distinct()
        .select(col("o_custkey")).orderBy("o_custkey")
    }),

    // INTERSECT: customers appearing in both halves of the date range
    "set_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val early = o.filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .select("o_custkey")
      val late = o.filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01 00:00:00")))
        .select("o_custkey")
      early.intersect(late).orderBy("o_custkey")
    }),

    // EXCEPT: customers only ever in the early half
    "set_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val early = o.filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .select("o_custkey")
      val late = o.filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01 00:00:00")))
        .select("o_custkey")
      early.except(late).orderBy("o_custkey")
    }),

    // INTERSECT ALL (bag semantics — multiplicity = min of the sides;
    // Spark plans it as a counted left-semi aggregate, one shuffle)
    "set_intersect_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val early = o.filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .select("o_custkey")
      val late = o.filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01 00:00:00")))
        .select("o_custkey")
      early.intersectAll(late).orderBy("o_custkey")
    }),

    // EXCEPT ALL (bag semantics — multiplicity = max(0, left − right);
    // the counted anti-aggregate sibling of set_intersect_all, closing
    // the set-operator family: union/intersect/except × distinct/all)
    "set_except_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val early = o.filter(col("o_orderdate") <
          to_timestamp(lit("1998-01-01 00:00:00")))
        .select("o_custkey")
      val late = o.filter(col("o_orderdate") >=
          to_timestamp(lit("1998-01-01 00:00:00")))
        .select("o_custkey")
      early.exceptAll(late).orderBy("o_custkey")
    }),

    // SELECT DISTINCT on a composite key
    "distinct_pairs" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // PIVOT: avg quantity per linestatus × returnflag
    "pivot_returnflag" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(davg(col("l_quantity")))
        .orderBy("l_linestatus")),

    // exact percentiles (median / p90) per group
    "agg_percentiles" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
             round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
        .orderBy("l_returnflag")),

    // lag / lead / rank / dense_rank / ntile / running sum in one window
    "w4_lag_lead_rank" -> ((s, d) => {
      val byTs = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val byValue = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, d)
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), col("value"),
          lag("value", 1).over(byTs).as("prev_value"),
          lead("value", 1).over(byTs).as("next_value"),
          rank().over(byValue).cast("long").as("value_rank"),
          dense_rank().over(byValue).cast("long").as("value_dense_rank"),
          ntile(4).over(byValue).cast("long").as("value_quartile"),
          dsumOver(col("value"), byTs.rowsBetween(Window.unboundedPreceding, 0))
            .as("running_sum"))
        .orderBy("user_id", "event_id")
    }),

    // sessionization: gap > 30 min starts a new session (gap-island via
    // lag + running conditional sum — no self-join, one shuffle)
    "w5_sessionize" -> ((s, d) => {
      val byTs = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = byTs.rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .withColumn("prev_ts", lag("ts", 1).over(byTs))
        // gap test in exact microseconds: second-truncating casts would
        // disagree with the oracle on fractional-second gaps near 30 min
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum("new_sess").over(run))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("session_start"), max("ts").as("session_end"))
        .orderBy("user_id", "session_id")
    }),

    // percent_rank / cume_dist distribution windows
    "w7_percent_rank" -> ((s, d) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "pct_rank")
    }),

    // first_value / last_value / nth_value navigation windows
    "w8_value_windows" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          first("value").over(w).as("first_val"),
          last("value").over(w).as("last_val"),
          nth_value(col("value"), 3).over(w).as("third_val"))
        .orderBy("user_id", "event_id")
    }),

    // day-N retention: users with a signup who are active again exactly
    // 7+ days later (cohort retention, the analytics staple)
    // SESSION PATH MINING — the behavior-sequence primitive funnels
    // (e_funnel) can't see: which ordered event-type sequences actually
    // occur, and how often. Sessions are w5's exact-microsecond gap
    // islands; each session's path is assembled ORDER-DETERMINISTICALLY
    // by sort_array over (ts, event_id, type) structs — collect_list
    // alone has no ordering contract under retries/AQE, so the sort is
    // what makes the result reproducible on any cluster. Two shuffles
    // (session regroup, path count) + a TakeOrdered top-20; per-session
    // state is the session's own events, never a user's full history.
    "e_top_paths" -> ((s, d) => {
      val byTs = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = byTs.rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .withColumn("prev_ts", lag("ts", 1).over(byTs))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum("new_sess").over(run))
        .groupBy("user_id", "session_id")
        .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))).as("evs"))
        .select(concat_ws(">",
          transform(col("evs"), e => e.getField("event_type"))).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(20)
        .orderBy(col("n_sessions").desc, col("path"))
    }),

    "e_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val first = ev.groupBy("user_id")
        .agg(to_date(min("ts")).as("cohort_day"))
      val active = ev.select(col("user_id").as("a_user"),
        to_date(col("ts")).as("a_day")).distinct()
      first.join(active,
          col("a_user") === col("user_id") &&
            col("a_day") >= date_add(col("cohort_day"), 7), "left_semi")
        .select(col("user_id"), col("cohort_day"))
        .orderBy("user_id")
    }),

    // fixed-width histogram (10 × 50k buckets over order totals)
    "agg_histogram" -> ((s, d) =>
      Tables.orders(s, d)
        .select(least(floor(col("o_totalprice") / 50000), lit(9L)).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

    // deterministic MODE (most frequent value, ties broken by value)
    "agg_mode" -> ((s, d) => {
      val counts = Tables.orders(s, d)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
      counts.withColumn("rk", row_number().over(
          Window.partitionBy("o_orderstatus")
            .orderBy(col("n").desc, col("o_orderpriority"))))
        .filter(col("rk") === 1)
        .select(col("o_orderstatus"),
          col("o_orderpriority").as("mode_priority"), col("n"))
        .orderBy("o_orderstatus")
    }),

    // ordered collect: array/string aggregation made deterministic by
    // sorting inside the aggregate (collect_list alone is partition-
    // order-dependent and would never match an oracle); the set is
    // serialized to JSON so the output schema is all-scalar
    "agg_collect" -> ((s, d) =>
      Tables.nation(s, d)
        .groupBy("n_regionkey")
        .agg(concat_ws(",", sort_array(collect_list(col("n_name"))))
               .as("nations_csv"),
             to_json(sort_array(collect_set(col("n_name"))))
               .as("nations_json"))
        .orderBy("n_regionkey")),

    // corpus vocabulary with frequency ranks (tokenizer-vocab building).
    // A Window.orderBy with no partitionBy would funnel the whole
    // vocabulary through ONE partition for the global row_number — fatal
    // on a 100 TB corpus. Instead: distributed range-partitioned sort,
    // then zipWithIndex, which assigns contiguous global indices from
    // per-partition offsets (one extra count job, no data movement).
    // (freq desc, word) is a total order, so index+1 == row_number.
    "t_vocab" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("word"))
        .as[(String, Long)]
        .rdd.zipWithIndex()
        .map { case ((w, f), i) => (w, f, i + 1L) }
        .toDF("word", "freq", "rank")
        .orderBy("rank")
    }),

    // event funnel: per-user first signup → first click after signup →
    // first purchase after that; stage conversion flags
    "e_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def firstOf(t: String) = ev.filter(col("event_type") === t)
        .groupBy("user_id").agg(min("ts").as(s"first_$t"))
      firstOf("signup")
        .join(firstOf("click"), Seq("user_id"), "left")
        .join(firstOf("purchase"), Seq("user_id"), "left")
        .select(col("user_id"),
          col("first_signup"),
          (col("first_click") > col("first_signup")).as("clicked_after"),
          (col("first_purchase") > col("first_click") &&
            col("first_click") > col("first_signup")).as("full_funnel"))
        .orderBy("user_id")
    }),

    // CUMULATIVE DISTINCT USERS ("users to date") — the naive form is a
    // distinct count over an expanding window, quadratic at scale; the
    // scale shape is first-seen-day per user (one groupBy over the
    // events), daily new-user counts, then a running sum over the DAYS
    // frame — which is report-sized, so its single-partition window is
    // free. Every day's cumulative distinct falls out of one pass.
    "e_cumulative_users" -> ((s, d) => {
      val firstDay = Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(date_trunc("day", col("ts"))).as("day"))
      val wCum = org.apache.spark.sql.expressions.Window.orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      firstDay.groupBy("day").agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users", sum("new_users").over(wCum))
        .orderBy("day")
    }),

    // COHORT RETENTION MATRIX — cohort (first-seen day) × weeks-since,
    // distinct active users: the full grid behind every retention
    // dashboard (e_retention is its day-7 column). One groupBy for
    // cohorts, one fact-side join back (broadcast: cohorts table is
    // user-count-sized… which at true scale shuffles instead — the join
    // key is user_id either way), one distinct-count exchange.
    "e_cohort_matrix" -> ((s, d) => {
      val f = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"))
      val cohorts = f.groupBy("user_id").agg(min("day").as("cohort"))
      f.join(cohorts, "user_id")
        .withColumn("week",
          floor(datediff(col("day"), col("cohort")) / 7).cast("long"))
        .groupBy("cohort", "week")
        .agg(count_distinct(col("user_id")).as("active_users"))
        .select(col("cohort").cast("timestamp").as("cohort"), col("week"),
          col("active_users"))
        .orderBy("cohort", "week")
    }),

    // EVENT TRANSITION COUNTS (first-order Markov) — per-user
    // consecutive event pairs via ONE lead() window on the user_id
    // exchange, then a count shuffle on the (from, to) pair. The
    // behavioral-model fit step; t_cooccur is its unordered cousin.
    "e_transitions" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")
    }),

    // TIME-WINDOWED conversion funnel — e_funnel counts lifetime stage
    // order; real attribution is windowed: a purchase converts only if
    // the SAME user clicked within the preceding hour. The carry-forward
    // union (the join_asof shape — ONE user_id exchange, no interval
    // self-join) tags each purchase with its latest click timestamp;
    // conversion is then a projection, and the daily rate one groupBy.
    "e_funnel_windowed" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(0).as("is_probe"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(1).as("is_probe"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts"), col("is_probe"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val lastClick = when(col("is_probe") === 0, col("ts"))
      clicks.unionByName(purchases)
        .withColumn("c_ts", last(lastClick, ignoreNulls = true).over(w))
        .filter(col("is_probe") === 1)
        .withColumn("converted",
          col("c_ts") >= col("ts") - expr("INTERVAL 1 HOUR"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"))
        .withColumn("conv_rate",
          round(col("n_converted").cast("double") / col("n_purchases"), 6))
        .orderBy("day")
    }),

    // RFM SEGMENTATION — recency/frequency/monetary quintile scores per
    // customer, the classic CRM cut. One purchase aggregate builds the
    // user frame; the three quintile boundary sets come from
    // Quantiles.exactQuantiles' distributed selection (the a13
    // discipline — NEVER a global ntile window, which would funnel a
    // billion-user frame through one partition) and broadcast back as
    // literals, so scoring is a narrow map. Boundary ties take the
    // lower bucket (strict >) on both engines.
    "e_rfm_segmentation" -> ((s, d) => {
      val p = Tables.events(s, d).filter(col("event_type") === "purchase")
      val maxd = p.agg(max(date_trunc("day", col("ts"))).as("max_day"))
      val users = p.groupBy("user_id")
        .agg(max(date_trunc("day", col("ts"))).as("last_day"),
          count(lit(1)).as("frequency"),
          graft.Sql.dsum(col("value"), 4).as("monetary"))
        .crossJoin(broadcast(maxd))
        .withColumn("recency_days",
          datediff(col("max_day"), col("last_day")).cast("long"))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary"))
        .localCheckpoint() // three selection jobs + the output read it
      val probs = Seq(0.2, 0.4, 0.6, 0.8)
      val rb = Quantiles.exactQuantilesRounded6(users, "recency_days", probs)
      val fb = Quantiles.exactQuantilesRounded6(users, "frequency", probs)
      val mb = Quantiles.exactQuantilesRounded6(users, "monetary", probs)
      def sc(c: Column, bs: Seq[Double]) =
        bs.map(b => when(c.cast("double") > b, 1).otherwise(0))
          .reduce(_ + _) + lit(1)
      users
        .withColumn("r_score", sc(col("recency_days"), rb).cast("long"))
        .withColumn("f_score", sc(col("frequency"), fb).cast("long"))
        .withColumn("m_score", sc(col("monetary"), mb).cast("long"))
        .withColumn("segment", concat_ws("-", col("r_score"),
          col("f_score"), col("m_score")))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          round(col("monetary"), 6).as("monetary"), col("r_score"),
          col("f_score"), col("m_score"), col("segment"))
        .orderBy("user_id")
    }),

    // LAST-TOUCH ATTRIBUTION — every purchase credited to the user's
    // most recent click/view (the marketing channel-credit primitive;
    // e_funnel_windowed answers "did they convert", this answers "what
    // gets the credit"). Same carry-forward-union shape: touches and
    // purchases union once, ONE user_id exchange, the latest touch
    // STRUCT (ts, id, type) rides a running IGNORE-NULLS window —
    // never an interval self-join. Credit goes to the touch only while
    // it is ≤ 1 h stale (the attribution window); older or absent →
    // 'direct'. Tie order (ts, is_probe, event_id) makes a same-instant
    // touch count and the winner deterministic. At 100 TB: state is one
    // struct per row inside each user's sorted partition.
    "e_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), lit(0).as("is_probe"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), lit(1).as("is_probe"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts"), col("is_probe"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val touchStruct = when(col("is_probe") === 0,
        struct(col("ts").as("t_ts"), col("event_id").as("t_id"),
          col("event_type").as("t_type")))
      val within = col("t").isNotNull &&
        col("t.t_ts") >= col("ts") - expr("INTERVAL 1 HOUR")
      touches.unionByName(purchases)
        .withColumn("t", last(touchStruct, ignoreNulls = true).over(w))
        .filter(col("is_probe") === 1)
        .select(col("user_id"), col("event_id").as("purchase_id"),
          when(within, col("t.t_type")).otherwise(lit("direct"))
            .as("channel"),
          when(within, col("t.t_id")).as("touch_id"))
        .orderBy("purchase_id")
    }),

    // string-function battery
    "f_strings" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          regexp_replace(col("text"), "the", "THE").as("subst"),
          lpad(col("lang"), 5, "_").as("lang_pad"),
          rpad(col("source"), 8, ".").as("src_pad"),
          reverse(col("lang")).as("lang_rev"),
          trim(lit("  x  ")).as("trimmed"),
          element_at(split(col("text"), " "), 3).as("third_token"),
          substring(col("text"), 1, 10).as("prefix10"),
          (length(col("text")) - length(regexp_replace(col("text"), "a", "")))
            .cast("long").as("n_a"))
        .orderBy("doc_id")),

    // date/time-function battery
    "f_dates" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          (dayofweek(col("o_orderdate"))).cast("long").as("dow_sun1"),
          unix_timestamp(col("o_orderdate")).as("epoch_sec"),
          date_add(to_date(col("o_orderdate")), 90).as("plus_90d"),
          last_day(to_date(col("o_orderdate"))).as("month_end"))
        .orderBy("o_orderkey")),

    // array-function battery over the token arrays
    "f_arrays" -> ((s, d) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          size(toks).cast("long").as("n"),
          array_contains(toks, "spark").as("has_spark"),
          element_at(sort_array(toks), 1).as("first_sorted"),
          element_at(sort_array(toks, asc = false), 1).as("last_sorted"),
          size(array_distinct(toks)).cast("long").as("n_distinct"),
          to_json(slice(sort_array(array_distinct(toks)), 1, 3))
            .as("top3_json"))
        .orderBy("doc_id")
    }),

    // null-handling battery (nullif/coalesce/ifnull/CASE over derived nulls)
    "f_nulls" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          nullif(col("l_returnflag"), lit("A")).as("flag_or_null"),
          coalesce(nullif(col("l_returnflag"), lit("A")), lit("WAS_A"))
            .as("flag_defaulted"),
          expr("ifnull(nullif(l_linestatus, 'F'), 'WAS_F')").as("status_defaulted"),
          when(col("l_quantity") > 25, col("l_quantity")).as("qty_if_big"),
          (nullif(col("l_returnflag"), lit("A")).isNull).as("was_a"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("status_defaulted"), col("qty_if_big").asc_nulls_first)),

    // regex battery: extract-all counts + match predicate
    "f_regex" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          size(expr("regexp_extract_all(text, 's\\\\w+', 0)")).cast("long")
            .as("n_s_words"),
          col("text").rlike("spark").as("has_spark"),
          regexp_extract(col("text"), "(s\\w+)", 1).as("first_s_word"))
        .orderBy("doc_id")),

    // JSON-path extraction (real JSON parser, not regex)
    "e_json_path" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // generator: posexplode of the token array
    "gen_posexplode" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos0", "w")))
        .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("w"))
        .orderBy("doc_id", "pos")),

    // UNPIVOT/melt: the wide single-row report reshaped to (metric, value)
    // rows — the inverse of C3's pivot-style assembly
    "unpivot_report" -> ((s, d) => {
      val wide = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).cast("double").as("n_rows"))
      wide.unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("n_rows")),
          "metric", "value")
        .orderBy("l_returnflag", "metric")
    }),

    // map-type functions (scalar extraction keeps the output portable)
    "f_maps" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          element_at(map_from_arrays(
            array(lit("status"), lit("priority")),
            array(col("o_orderstatus"), col("o_orderpriority"))),
            "priority").as("prio_via_map"),
          size(map_from_arrays(array(lit("a"), lit("b")),
            array(lit(1), lit(2)))).cast("long").as("map_size"))
        .orderBy("o_orderkey")),

    // sliding event-time windows (2-day window, 1-day slide) — batch
    // analog of the streaming sliding agg
    "w6_sliding_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "2 days", "1 day").getField("start").as("w_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy("w_start", "event_type")))

  def oracles: Map[String, String] = Map(
    "set_union" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 350000
        |UNION
        |SELECT o_custkey FROM orders WHERE o_totalprice < 10000
        |ORDER BY o_custkey""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT o_custkey FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,
    "set_except" ->
      """SELECT o_custkey FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,
    "set_except_all" ->
      """SELECT o_custkey FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,
    "distinct_pairs" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "pivot_returnflag" ->
      s"""SELECT l_linestatus,
         |  ${cond("A")} AS "A", ${cond("N")} AS "N", ${cond("R")} AS "R"
         |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "agg_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "w4_lag_lead_rank" ->
      s"""SELECT user_id, event_id, value,
         |  lag(value, 1) OVER w_ts AS prev_value,
         |  lead(value, 1) OVER w_ts AS next_value,
         |  CAST(rank() OVER w_val AS BIGINT) AS value_rank,
         |  CAST(dense_rank() OVER w_val AS BIGINT) AS value_dense_rank,
         |  CAST(ntile(4) OVER w_val AS BIGINT) AS value_quartile,
         |  ${Sql.oSumOver("value",
             "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")}
         |    AS running_sum
         |FROM events WHERE user_id < 20
         |WINDOW
         |  w_ts AS (PARTITION BY user_id ORDER BY ts, event_id),
         |  w_val AS (PARTITION BY user_id ORDER BY value DESC, event_id)
         |ORDER BY user_id, event_id""".stripMargin,
    "w5_sessionize" ->
      """WITH g AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |FROM events),
        |m AS (SELECT user_id, event_id, ts,
        |  CASE WHEN prev_ts IS NULL
        |         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |FROM g),
        |sess AS (SELECT user_id, event_id, ts,
        |  CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |FROM m)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "w7_percent_rank" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM lineitem WHERE l_orderkey < 500
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, pct_rank""".stripMargin,
    "w8_value_windows" ->
      """SELECT user_id, event_id,
        |  first_value(value) OVER w AS first_val,
        |  last_value(value) OVER w AS last_val,
        |  nth_value(value, 3) OVER w AS third_val
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,
    "e_top_paths" ->
      """WITH g AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events),
        |m AS (SELECT *, CASE WHEN prev_ts IS NULL
        |    OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |    THEN 1 ELSE 0 END AS new_sess FROM g),
        |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m),
        |p AS (SELECT user_id, sid,
        |    array_to_string(list(event_type ORDER BY ts, event_id), '>')
        |      AS path
        |  FROM s GROUP BY user_id, sid)
        |SELECT path, count(*) AS n_sessions FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    "e_retention" ->
      """WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |  FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id AS a_user, CAST(ts AS DATE) AS a_day
        |  FROM events)
        |SELECT user_id, cohort_day FROM f
        |WHERE EXISTS (SELECT 1 FROM a
        |  WHERE a.a_user = f.user_id AND a.a_day >= f.cohort_day + 7)
        |ORDER BY user_id""".stripMargin,
    "agg_histogram" ->
      """SELECT least(CAST(floor(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "agg_mode" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |  ORDER BY n DESC, o_orderpriority) AS rk FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, n
        |FROM r WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,
    "agg_collect" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
        |  to_json(list_sort(list(DISTINCT n_name))) AS nations_json
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "t_vocab" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |f AS (SELECT word, count(*) AS freq FROM w GROUP BY word)
        |SELECT word, freq, CAST(ROW_NUMBER() OVER
        |  (ORDER BY freq DESC, word) AS BIGINT) AS rank
        |FROM f ORDER BY rank""".stripMargin,
    "e_cumulative_users" ->
      """WITH f AS (SELECT user_id,
        |    CAST(min(date_trunc('day', CAST(ts AS TIMESTAMP)))
        |      AS TIMESTAMP) AS day
        |  FROM events GROUP BY user_id),
        |n AS (SELECT day, count(*) AS new_users FROM f GROUP BY day)
        |SELECT day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM n ORDER BY day""".stripMargin,
    "e_cohort_matrix" ->
      """WITH f AS (SELECT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        |  FROM events),
        |c AS (SELECT user_id, min(day) AS cohort FROM f GROUP BY user_id)
        |SELECT CAST(cohort AS TIMESTAMP) AS cohort,
        |  CAST(date_diff('day', cohort, day) // 7 AS BIGINT) AS week,
        |  CAST(count(DISTINCT f.user_id) AS BIGINT) AS active_users
        |FROM f JOIN c ON f.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort, week""".stripMargin,
    "e_transitions" ->
      """WITH x AS (SELECT user_id, event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |SELECT event_type AS from_type, next_type AS to_type,
        |  count(*) AS n
        |FROM x WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,
    // windowed conversion via EXISTS-within-interval — the correlated
    // form the carry-forward union computes in one exchange
    "e_funnel_windowed" ->
      """WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS cts
        |  FROM events WHERE event_type = 'click'),
        |m AS (SELECT p.user_id, pts, EXISTS (
        |    SELECT 1 FROM c WHERE c.user_id = p.user_id
        |      AND c.cts BETWEEN p.pts - INTERVAL 1 HOUR AND p.pts)
        |    AS converted FROM p)
        |SELECT CAST(date_trunc('day', pts) AS TIMESTAMP) AS day,
        |  count(*) AS n_purchases,
        |  CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_converted,
        |  round(CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS conv_rate
        |FROM m GROUP BY 1 ORDER BY day""".stripMargin,
    // same quintile boundaries (rounded 6) and strict-> bucket ties
    "e_rfm_segmentation" ->
      """WITH p AS (SELECT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
        |      AS day, value
        |  FROM events WHERE event_type = 'purchase'),
        |u AS (SELECT user_id, max(day) AS last_day, count(*) AS frequency,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS monetary
        |  FROM p GROUP BY 1),
        |mx AS (SELECT max(last_day) AS max_day FROM u),
        |r AS (SELECT user_id,
        |    CAST(date_diff('day', last_day, max_day) AS BIGINT)
        |      AS recency_days, frequency, monetary
        |  FROM u, mx),
        |b AS (SELECT
        |    round(quantile_cont(CAST(recency_days AS DOUBLE), 0.2), 6) AS r1,
        |    round(quantile_cont(CAST(recency_days AS DOUBLE), 0.4), 6) AS r2,
        |    round(quantile_cont(CAST(recency_days AS DOUBLE), 0.6), 6) AS r3,
        |    round(quantile_cont(CAST(recency_days AS DOUBLE), 0.8), 6) AS r4,
        |    round(quantile_cont(CAST(frequency AS DOUBLE), 0.2), 6) AS f1,
        |    round(quantile_cont(CAST(frequency AS DOUBLE), 0.4), 6) AS f2,
        |    round(quantile_cont(CAST(frequency AS DOUBLE), 0.6), 6) AS f3,
        |    round(quantile_cont(CAST(frequency AS DOUBLE), 0.8), 6) AS f4,
        |    round(quantile_cont(monetary, 0.2), 6) AS m1,
        |    round(quantile_cont(monetary, 0.4), 6) AS m2,
        |    round(quantile_cont(monetary, 0.6), 6) AS m3,
        |    round(quantile_cont(monetary, 0.8), 6) AS m4
        |  FROM r),
        |s AS (SELECT user_id, recency_days, frequency, monetary,
        |    CAST((CASE WHEN CAST(recency_days AS DOUBLE) > r1 THEN 1
        |        ELSE 0 END) +
        |      (CASE WHEN CAST(recency_days AS DOUBLE) > r2 THEN 1
        |        ELSE 0 END) +
        |      (CASE WHEN CAST(recency_days AS DOUBLE) > r3 THEN 1
        |        ELSE 0 END) +
        |      (CASE WHEN CAST(recency_days AS DOUBLE) > r4 THEN 1
        |        ELSE 0 END) + 1 AS BIGINT) AS r_score,
        |    CAST((CASE WHEN CAST(frequency AS DOUBLE) > f1 THEN 1
        |        ELSE 0 END) +
        |      (CASE WHEN CAST(frequency AS DOUBLE) > f2 THEN 1
        |        ELSE 0 END) +
        |      (CASE WHEN CAST(frequency AS DOUBLE) > f3 THEN 1
        |        ELSE 0 END) +
        |      (CASE WHEN CAST(frequency AS DOUBLE) > f4 THEN 1
        |        ELSE 0 END) + 1 AS BIGINT) AS f_score,
        |    CAST((CASE WHEN monetary > m1 THEN 1 ELSE 0 END) +
        |      (CASE WHEN monetary > m2 THEN 1 ELSE 0 END) +
        |      (CASE WHEN monetary > m3 THEN 1 ELSE 0 END) +
        |      (CASE WHEN monetary > m4 THEN 1 ELSE 0 END) + 1 AS BIGINT)
        |      AS m_score
        |  FROM r, b)
        |SELECT user_id, recency_days, frequency,
        |  round(monetary, 6) AS monetary, r_score, f_score, m_score,
        |  r_score || '-' || f_score || '-' || m_score AS segment
        |FROM s ORDER BY user_id""".stripMargin,
    // explicit form: latest preceding touch per purchase by
    // (ts, event_id) DESC, credited only within the 1-hour window
    "e_attribution" ->
      """WITH t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tts,
        |    event_id AS tid, event_type AS ttype
        |  FROM events WHERE event_type IN ('click', 'view')),
        |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts,
        |    event_id AS purchase_id
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT p.user_id, purchase_id, pts, tts, tid, ttype,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY tts DESC, tid DESC) AS rn
        |  FROM p LEFT JOIN t ON p.user_id = t.user_id AND tts <= pts)
        |SELECT user_id, purchase_id,
        |  CASE WHEN tts IS NOT NULL AND tts >= pts - INTERVAL 1 HOUR
        |    THEN ttype ELSE 'direct' END AS channel,
        |  CASE WHEN tts IS NOT NULL AND tts >= pts - INTERVAL 1 HOUR
        |    THEN tid END AS touch_id
        |FROM r WHERE rn = 1 ORDER BY purchase_id""".stripMargin,
    "e_funnel" ->
      """WITH s AS (SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS first_signup
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS first_click
        |  FROM events WHERE event_type = 'click' GROUP BY user_id),
        |p AS (SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS first_purchase
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT s.user_id AS user_id, s.first_signup,
        |  c.first_click > s.first_signup AS clicked_after,
        |  p.first_purchase > c.first_click
        |    AND c.first_click > s.first_signup AS full_funnel
        |FROM s LEFT JOIN c ON s.user_id = c.user_id
        |       LEFT JOIN p ON s.user_id = p.user_id
        |ORDER BY s.user_id""".stripMargin,
    "f_strings" ->
      """SELECT doc_id,
        |  regexp_replace(text, 'the', 'THE', 'g') AS subst,
        |  lpad(lang, 5, '_') AS lang_pad,
        |  rpad(source, 8, '.') AS src_pad,
        |  reverse(lang) AS lang_rev,
        |  trim('  x  ') AS trimmed,
        |  string_split(text, ' ')[3] AS third_token,
        |  substr(text, 1, 10) AS prefix10,
        |  CAST(length(text) - length(regexp_replace(text, 'a', '', 'g')) AS BIGINT) AS n_a
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "f_dates" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow_sun1,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec,
        |  CAST(o_orderdate AS DATE) + 90 AS plus_90d,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin,
    "f_arrays" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n,
        |  list_contains(toks, 'spark') AS has_spark,
        |  list_sort(toks)[1] AS first_sorted,
        |  list_reverse_sort(toks)[1] AS last_sorted,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |  to_json(list_sort(list_distinct(toks))[1:3]) AS top3_json
        |FROM t ORDER BY doc_id""".stripMargin,
    "f_nulls" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  nullif(l_returnflag, 'A') AS flag_or_null,
        |  coalesce(nullif(l_returnflag, 'A'), 'WAS_A') AS flag_defaulted,
        |  ifnull(nullif(l_linestatus, 'F'), 'WAS_F') AS status_defaulted,
        |  CASE WHEN l_quantity > 25 THEN l_quantity END AS qty_if_big,
        |  nullif(l_returnflag, 'A') IS NULL AS was_a
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber, l_returnflag,
        |  status_defaulted, qty_if_big ASC NULLS FIRST""".stripMargin,
    "f_regex" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, 's\w+')) AS BIGINT) AS n_s_words,
        |  regexp_matches(text, 'spark') AS has_spark,
        |  regexp_extract(text, '(s\w+)', 1) AS first_s_word
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "e_json_path" ->
      """SELECT event_id,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "gen_posexplode" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 50)
        |SELECT doc_id, CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
        |  unnest(toks) AS w
        |FROM t ORDER BY doc_id, pos""".stripMargin,
    "unpivot_report" ->
      s"""WITH wide AS (SELECT l_returnflag,
         |  ${Sql.oSum("l_quantity")} AS sum_qty,
         |  ${Sql.oSum("l_extendedprice")} AS sum_price,
         |  CAST(count(*) AS DOUBLE) AS n_rows
         |FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
         |UNION ALL
         |SELECT l_returnflag, 'sum_price', sum_price FROM wide
         |UNION ALL
         |SELECT l_returnflag, 'n_rows', n_rows FROM wide
         |ORDER BY l_returnflag, metric""".stripMargin,
    "f_maps" ->
      """SELECT o_orderkey,
        |  map(['status', 'priority'],
        |      [o_orderstatus, o_orderpriority])['priority'][1] AS prio_via_map,
        |  CAST(cardinality(map(['a','b'], [1,2])) AS BIGINT) AS map_size
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin,
    "w6_sliding_window" ->
      s"""WITH ws AS (SELECT event_type, value,
         |  unnest([date_trunc('day', ts) - INTERVAL 1 DAY,
         |          date_trunc('day', ts)]) AS w_start
         |FROM events)
         |SELECT CAST(w_start AS TIMESTAMP) AS w_start, event_type,
         |  count(*) AS n_events, ${Sql.oSum("value")} AS sum_value
         |FROM ws GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin)

  private def cond(f: String): String =
    s"CAST(SUM(CASE WHEN l_returnflag='$f' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)" +
      s" / COUNT(CASE WHEN l_returnflag='$f' THEN 1 END)"
}
