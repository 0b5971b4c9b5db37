package graft.operators

import graft.{QueryModule, Sql, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window / time-series operators — SURVEY.md §2.5, §2.6, §2.9, transposed
  * onto the `events` table (user_id ≙ currency code, ts ≙ exchangedate,
  * value ≙ rate).
  *
  * Reference semantics (cited in /root/reference):
  *  - W1 ROW_NUMBER newest-first          src/analyze.py:68-73
  *  - W2 rolling 7-ROW mean, shrinking    dags/currency_etl.py:35-41
  *       frame at series start (pandas min_periods=1) — rowsBetween(-6,0),
  *       NOT rangeBetween (SURVEY §7.3)
  *  - W3 last-value extraction            dags/currency_etl.py:43-48
  *  - J1 30-back delta with LEAST clamp   src/analyze.py:64-84 (clamp :80)
  *  - C1 moving-average forecast          dags/currency_etl.py:34-52
  *  - C2 last-write-wins keyed upsert     src/load.py:35-42
  *
  * Scale notes: all windows partition by user_id — one hash shuffle, then
  * per-partition sort; no global sort anywhere. J1's reference formulation
  * (two CTE scans + cross join) is collapsed into ONE pass: a single
  * window + conditional aggregation, which is the shape that survives a
  * 100× scale-up (the reference shape re-scans the fact table 4×).
  * C2's dedup-by-recency window is the standard Spark MERGE substitute;
  * on a real cluster the same plan runs per key-range partition and never
  * materializes the union on one node.
  */
object WindowOps extends QueryModule {
  import graft.Sql._

  private def newestFirst = Window.partitionBy("user_id")
    .orderBy(col("ts").desc, col("event_id").desc)
  private def oldestFirst = Window.partitionBy("user_id")
    .orderBy(col("ts").asc, col("event_id").asc)

  /** Merge overlapping [start, fin] intervals per key into disjoint
    * spans (w12's core, reusable over any orderable type): an interval
    * extends the current island while its start is ≤ the running max of
    * all previous ends; a running sum of new-island flags numbers the
    * islands; one groupBy emits the merged spans. All state per-key and
    * single-pass — the two windows share one exchange on `key`.
    * Returns (key, island, merge_start, merge_end, n_events). */
  def mergeIntervals(df: org.apache.spark.sql.DataFrame, key: String,
                     start: String, fin: String,
                     tiebreak: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val ord = Window.partitionBy(key)
      .orderBy((col(start) +: tiebreak.map(col)): _*)
    val prevMax =
      max(col(fin)).over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val island = sum(
      when(prevMax.isNull || col(start) > prevMax, 1L).otherwise(0L))
      .over(ord.rowsBetween(Window.unboundedPreceding, 0))
    df.withColumn("island", island)
      .groupBy(col(key), col("island"))
      .agg(min(start).as("merge_start"), max(fin).as("merge_end"),
        count(lit(1)).as("n_events"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W1 — latest row per key via row_number (one window, all keys at once)
    "w1_latest_per_key" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("rn", row_number().over(newestFirst))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts").as("last_ts"),
          col("value").as("last_value"), col("event_id").as("last_event_id"))
        .orderBy("user_id")),

    // W2 — trailing 7-ROW rolling mean with shrinking frame
    "w2_rolling_avg7" -> ((s, d) => {
      val w = oldestFirst.rowsBetween(-6, 0)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          davgOver(col("value"), w).as("roll_avg"))
        .orderBy("user_id", "ts", "event_id")
    }),

    // W3 — last value per key via max_by/arg_max ((user_id, ts) is unique
    // in the testdata; verified — so ts alone is a sound arg)
    "w3_last_value" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(max_by(col("value"), col("ts")).as("last_value"),
             max("ts").as("last_ts"))
        .orderBy("user_id")),

    // J1 — delta between newest row and the row 30 back, clamped to the
    // oldest row on short history (LEAST(cnt, 31), src/analyze.py:80).
    // Single-pass: window rn + per-key count + conditional agg.
    "j1_delta_30back" -> ((s, d) => {
      val byKey = Window.partitionBy("user_id")
      Tables.events(s, d)
        .withColumn("rn", row_number().over(newestFirst))
        .withColumn("cnt", count(lit(1)).over(byKey))
        .groupBy("user_id")
        .agg(max(when(col("rn") === 1, col("value"))).as("last_value"),
             max(when(col("rn") === least(col("cnt"), lit(31)), col("value")))
               .as("ago_value"))
        .withColumn("delta", col("last_value") - col("ago_value"))
        .orderBy("user_id")
    }),

    // C1 — moving-average forecast: per key take the final 7-row rolling
    // mean, then emit 5 future daily rows flat at that value.
    "c1_forecast" -> ((s, d) => {
      val roll = oldestFirst.rowsBetween(-6, 0)
      Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("last_day"),
          davgOver(col("value"), roll).as("roll_avg"),
          row_number().over(newestFirst).as("rn"))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("last_day"), col("roll_avg"),
          explode(sequence(lit(1), lit(5))).as("i"))
        .select(col("user_id"),
          date_add(col("last_day"), col("i")).as("day"),
          col("roll_avg").as("forecast"))
        .orderBy("user_id", "day")
    }),

    // W9 — time-series resampling with LOCF gap fill: a per-key daily
    // spine (sequence + explode — never a driver loop) left-joined to
    // the observations, missing days carried forward by
    // last(ignoreNulls) over a keyed running frame. Spine size is
    // keys × days (bounded), observations join co-partitioned by key —
    // both sides scale. Leading days before a key's first observation
    // stay NULL by design.
    "w9_locf_resample" -> ((s, d) => {
      val obs = Tables.events(s, d)
        .filter(col("user_id") < 20 && col("event_type") === "purchase")
      val daily = obs
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(max("value").as("v"))
      val days = obs.sparkSession.range(1).select(explode(sequence(
        to_timestamp(lit("2024-01-01 00:00:00")),
        to_timestamp(lit("2024-01-30 00:00:00")),
        expr("INTERVAL 1 DAY"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      obs.select("user_id").distinct().crossJoin(days)
        .join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          last("v", ignoreNulls = true).over(w).as("v_filled"))
        .orderBy("user_id", "day")
    }),

    // W10 — time-RANGE window frame: per-user trailing-7-day totals
    // ordered by event time, frame bounded by VALUE distance (micros),
    // not row count — the frame w2's row-frame can't express when event
    // density varies. Partitioned by user, so state per key is the 7-day
    // span; decimal window sum keeps both engines bit-identical.
    "w10_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-7L * 86400L * 1000000L, 0)
      Tables.events(s, d)
        .filter(col("user_id") < 50 && col("event_type") === "purchase")
        .withColumn("us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"), col("ts"),
          count(lit(1)).over(w).as("n_7d"),
          graft.Sql.dsumOver(col("value"), w).as("sum_7d"))
        .orderBy("user_id", "event_id")
    }),

    // W11 — exponentially-weighted moving average (the smoothing the
    // reference's pandas ewm() would give): per-key trailing-20-row
    // kernel, weight (1-α)^age with α=0.3, normalized by the kernel's
    // own weight sum (pandas adjust=True). The kernel rides ONE
    // collect_list window per key — the truncated-kernel formulation is
    // the distributed shape: an exact infinite-history EWMA is a serial
    // recurrence (y_i needs y_{i-1}), but (0.7)^20 ≈ 8e-4 bounds the
    // truncation error below the 1e-6 output rounding, so the windowed
    // kernel is exact at the emitted precision and each row computes
    // independently. Weights are exact double powers; both engines fold
    // the ≤20-element list left-to-right; round(6) absorbs the last-ulp.
    "w11_ewma" -> ((s, d) => {
      val w = oldestFirst.rowsBetween(-19, 0)
      val xs = col("xs")
      val wSum = aggregate(
        transform(xs, (_, i) => pow(lit(0.7), size(xs).cast("double") - 1 - i)),
        lit(0.0), _ + _)
      val wxSum = aggregate(
        transform(xs, (x, i) => x * pow(lit(0.7), size(xs).cast("double") - 1 - i)),
        lit(0.0), _ + _)
      Tables.events(s, d)
        .withColumn("xs", collect_list("value").over(w))
        .select(col("user_id"), col("event_id"), col("ts"),
          round(wxSum / wSum, 6).as("ewma"))
        .orderBy("user_id", "ts", "event_id")
    }),

    // W13 — linear-interpolation gap fill over the daily spine: w9's
    // LOCF holds the last value flat; interpolation draws the line
    // between the surrounding observations — the resampling mode for
    // continuous signals (sensor series, prices) where a step function
    // biases downstream features. Bracketing observations come from two
    // IGNORE-NULLS struct windows over ONE spine exchange (carry-back +
    // carry-forward of (day, v)); edges degrade to nearest-observation.
    // All per-key window state, no self-join, no loop.
    // ROLLING MEDIAN over the trailing-7-day frame — the robust
    // smoother for spiky daily series (w16's mean/std flags anomalies;
    // the median RIDES THROUGH them). The window frame is a bounded 7
    // values per row, so collecting it in-row and selecting the middle
    // is O(frame), not a per-group value map; interpolation for even
    // frames matches quantile_cont(0.5) exactly.
    // LAG-7 AUTOCORRELATION — is each metric's daily series weekly-
    // periodic? Pearson r between (vₜ, vₜ₋₇) per metric: one lag()
    // window on the event_type exchange forms the pairs, then ONE
    // grouped conditional-moment aggregate (the a26 discipline — exact
    // decimal moments, canonical double chain, clamp, round). The
    // hypothesis-forming companion to w20's seasonal index; both read
    // the same day-grain frame shape.
    "w19_autocorr7" -> ((s, d) => {
      val wL = Window.partitionBy("event_type").orderBy("day")
      val daily = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(graft.Sql.dsum(col("value"), 4).as("x"))
        .withColumn("y", lag("x", 7).over(wL))
        .filter(col("y").isNotNull)
      def m(c: Column) =
        sum(c.cast(DecimalType(30, 2))).cast("double")
      val g = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), m(col("x")).as("sx"),
          m(col("y")).as("sy"), m(col("x") * col("y")).as("sxy"),
          m(col("x") * col("x")).as("sxx"),
          m(col("y") * col("y")).as("syy"))
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      g.select(col("event_type"), col("n").as("n_pairs"),
        round(when(col("n") > 1 && vx > 0 && vy > 0,
          greatest(lit(-1.0), least(lit(1.0),
            (col("n") * col("sxy") - col("sx") * col("sy")) /
              sqrt(vx * vy)))), 6).as("acf7"))
        .orderBy("event_type")
    }),

    // DAY-OF-WEEK SEASONAL INDEX — each metric's weekday profile: mean
    // daily volume per (metric, weekday) over its all-days mean (index
    // 1.0 = no seasonality; the capacity-planning / anomaly-baseline
    // readout that w16's rolling z-score implicitly assumes away). Two
    // exchanges on day-grain frames (daily agg, then the 7-row dow
    // frame); the all-days mean rides an unframed window over the SAME
    // dow frame — no second scan (the w18 discipline). Exact decimal
    // sums end to end; Spark's dayofweek (1=Sun) mirrored as
    // DuckDB dayofweek()+1.
    "w20_seasonal_index" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(graft.Sql.dsum(col("value"), 4).as("v"))
      val wT = Window.partitionBy("event_type")
      daily
        .groupBy(col("event_type"), dayofweek(col("day")).cast("long")
          .as("dow"))
        .agg(sum(col("v").cast(graft.Sql.dec(4))).cast("double").as("sv"),
          count(lit(1)).as("n_days"))
        .withColumn("tot",
          sum(col("sv").cast(graft.Sql.dec(4))).over(wT).cast("double"))
        .withColumn("ntot", sum(col("n_days")).over(wT))
        .select(col("event_type"), col("dow"), col("n_days"),
          round(col("sv") / col("n_days"), 6).as("dow_mean"),
          round((col("sv") / col("n_days")) /
            (col("tot") / col("ntot")), 6).as("seasonal_index"))
        .orderBy("event_type", "dow")
    }),

    // ROLLING CORRELATION — trailing-7-day Pearson correlation of each
    // metric's daily series against total daily traffic (the "which
    // metric tracks overall load" monitoring diagnostic; a decorrelating
    // metric is drifting). All six moments (n, Σx, Σy, Σxy, Σx², Σy²)
    // come from ONE window over the event_type exchange — no self-join,
    // no second pass; day totals are a day-count-sized frame, broadcast
    // back onto the per-type series. Moment sums go through DECIMAL(30,2)
    // so the windowed accumulation is order-free and engine-exact (the
    // w16 discipline; products of identical doubles round identically);
    // warm-up (n ≤ 1) and zero-variance frames emit NULL, not IEEE
    // infinities. Series are day-grained, so per-key window state is
    // bounded by days × metrics regardless of corpus size.
    "w18_rolling_corr" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(graft.Sql.dsum(col("value"), 4).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-6, 0)
      def wsum(c: Column) =
        sum(c.cast(DecimalType(30, 2))).over(w).cast("double")
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      daily
        // day totals as an unframed window over the SAME daily frame —
        // one scan of events total; a groupBy-totals + join-back would
        // re-expand the lineage into a second full scan
        .withColumn("y", sum(col("x").cast(graft.Sql.dec(4)))
          .over(Window.partitionBy("day")).cast("double"))
        .withColumn("n", count(lit(1)).over(w).cast("double"))
        .withColumn("sx", wsum(col("x")))
        .withColumn("sy", wsum(col("y")))
        .withColumn("sxy", wsum(col("x") * col("y")))
        .withColumn("sxx", wsum(col("x") * col("x")))
        .withColumn("syy", wsum(col("y") * col("y")))
        .select(col("day"), col("event_type"),
          round(col("x"), 6).as("x"), round(col("y"), 6).as("y"),
          // moments rounded to DECIMAL(30,2) can land a hair outside
          // [-1,1] on a near-collinear frame (PropertySpec caught
          // +1.000001 at sf0.001) — clamp before the final rounding
          round(when(col("n") > 1 && vx > 0 && vy > 0,
            greatest(lit(-1.0), least(lit(1.0),
              (col("n") * col("sxy") - col("sx") * col("sy")) /
                sqrt(vx * vy)))), 6).as("corr7"))
        .orderBy("day", "event_type")
    }),

    "w17_rolling_median" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-6, 0)
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(graft.Sql.dsum(col("value"), 4).as("v"))
        .withColumn("win", sort_array(collect_list(col("v")).over(w)))
        .withColumn("n", size(col("win")))
        .withColumn("med7", round(
          when(col("n") % 2 === 1,
            element_at(col("win"), ((col("n") + 1) / 2).cast("int")))
            .otherwise((element_at(col("win"), (col("n") / 2).cast("int")) +
              element_at(col("win"), (col("n") / 2 + 1).cast("int"))) / 2.0),
          6))
        .select(col("day"), col("event_type"), round(col("v"), 6).as("v"),
          col("med7"))
        .orderBy("day", "event_type")
    }),

    // ROLLING z-score anomaly detection on the daily series — the
    // monitoring-alert shape: trailing-7-day mean/std per event type
    // from exact decimal moment windows (one exchange on event_type),
    // flag |z| > 2. Std comes from the same (sum, sumsq, n) frame as
    // w2's rolling mean — no second pass; warm-up rows (n <= 1) and
    // flat windows emit NULL z rather than IEEE infinities, which
    // differ across engines.
    "w16_rolling_anomaly" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-6, 0)
      val daily = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(graft.Sql.dsum(col("value"), 4).as("v"))
      val vvar = (col("s2") - col("s") * col("s") / col("n")) /
        (col("n") - 1)
      daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s", graft.Sql.dsumOver(col("v"), w, 4))
        .withColumn("s2", sum((col("v") * col("v"))
          .cast(graft.Sql.dec(4))).over(w).cast("double"))
        .withColumn("z", when(col("n") > 1 && vvar > 0,
          round((col("v") - col("s") / col("n")) / sqrt(vvar), 6)))
        .select(col("day"), col("event_type"), round(col("v"), 6).as("v"),
          round(col("s") / col("n"), 6).as("mean_7d"), col("z"),
          (abs(col("z")) > 2).as("flagged"))
        .orderBy("day", "event_type")
    }),

    // Ratio-to-report: each event's share of its day's total — the
    // percent-of-total idiom every BI layer compiles to an unframed
    // window aggregate (one exchange on the report key, no self-join
    // against a totals subquery). Denominator via the exact-decimal
    // windowed sum so shares are engine-portable.
    "w15_share_of_day" -> ((s, d) => {
      val wDay = Window.partitionBy("day")
      Tables.events(s, d).filter(col("user_id") < 50)
        .select(col("event_id"), date_trunc("day", col("ts")).as("day"),
          col("value"))
        .withColumn("day_total",
          round(graft.Sql.dsumOver(col("value"), wDay, 4), 6))
        .withColumn("share", round(col("value") / col("day_total"), 6))
        .orderBy("event_id")
    }),

    // Per-day percentile bands (P50/P95) — the latency-dashboard /
    // SLO-report shape. EXACT interpolated percentiles per day: group
    // sizes are time-bounded (one day of one metric), so the per-group
    // value list is inherently capped and `percentile` is safe here —
    // unlike a global percentile over an unbounded column, which goes
    // through Quantiles.exactQuantiles' distributed selection (a13).
    // One shuffle on day; final doubles rounded for engine portability.
    "w14_daily_p95" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"),
          round(expr("percentile(value, 0.5D)"), 6).as("p50"),
          round(expr("percentile(value, 0.95D)"), 6).as("p95"),
          round(max(col("value")), 6).as("p100"))
        .orderBy("day")),

    "w13_interp_resample" -> ((s, d) => {
      val obs = Tables.events(s, d)
        .filter(col("user_id") < 20 && col("event_type") === "purchase")
      val daily = obs
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(max("value").as("v"))
      val days = obs.sparkSession.range(1).select(explode(sequence(
        to_timestamp(lit("2024-01-01 00:00:00")),
        to_timestamp(lit("2024-01-30 00:00:00")),
        expr("INTERVAL 1 DAY"))).as("day"))
      val wB = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wF = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
      val marked = when(col("v").isNotNull,
        struct(col("day").as("d"), col("v").as("vv")))
      obs.select("user_id").distinct().crossJoin(days)
        .join(daily, Seq("user_id", "day"), "left")
        .withColumn("pv", last(marked, ignoreNulls = true).over(wB))
        .withColumn("nx", first(marked, ignoreNulls = true).over(wF))
        .select(col("user_id"), col("day"),
          round(
            when(col("pv").isNull, col("nx.vv"))
              .when(col("nx").isNull, col("pv.vv"))
              .when(col("pv.d") === col("nx.d"), col("pv.vv"))
              .otherwise(col("pv.vv") + (col("nx.vv") - col("pv.vv")) *
                (datediff(col("day"), col("pv.d")).cast("double") /
                 datediff(col("nx.d"), col("pv.d")).cast("double"))), 6)
            .as("v_interp"))
        .orderBy("user_id", "day")
    }),

    // W12 — overlapping-interval coalescing (merge [start, end) ranges
    // per key): the span-algebra primitive behind redaction-span
    // merging, dedup-span consolidation and availability-window
    // stitching. Differs from gap-based sessionization (w5): an
    // interval EXTENDS the current island only while its start is ≤ the
    // RUNNING MAX of all previous ends — intervals here are ranges, not
    // points, and an early-starting long interval can swallow many
    // later ones. Classic two-window islands plan: running-max(end)
    // over preceding rows flags island starts, a running sum of flags
    // numbers islands, then ONE groupBy(key, island) emits merged
    // spans. All state is per-key and single-pass — at 100 TB each key's
    // windows evaluate inside its partition, no self-join, no loop.
    "w12_interval_merge" -> ((s, d) => {
      WindowOps.mergeIntervals(
          Tables.events(s, d)
            .filter(col("user_id") < 30)
            .withColumn("fin", col("ts") + expr("INTERVAL 15 MINUTES")),
          key = "user_id", start = "ts", fin = "fin",
          tiebreak = Seq("event_id"))
        .orderBy("user_id", "island")
    }),

    // C2 — last-write-wins keyed upsert: newest row per (user_id,
    // event_type) survives; replay-order-safe because recency is taken
    // from the data (ts), not arrival order.
    "c2_upsert_lww" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "ts", "value", "event_id")
        .orderBy("user_id", "event_type")
    }))

  private val rollOver =
    "(PARTITION BY user_id ORDER BY ts ASC, event_id ASC ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"

  def oracles: Map[String, String] = Map(
    // same lag pairs, decimal moments, clamp, and double chain
    "w19_autocorr7" ->
      """WITH daily AS (SELECT
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
        |      AS day, event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, x,
        |    lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS y
        |  FROM daily),
        |q AS (SELECT * FROM p WHERE y IS NOT NULL),
        |g AS (SELECT event_type, count(*) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(30,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(30,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x*y AS DECIMAL(30,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x*x AS DECIMAL(30,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y*y AS DECIMAL(30,2))) AS DOUBLE) AS syy
        |  FROM q GROUP BY 1)
        |SELECT event_type, n AS n_pairs,
        |  round(CASE WHEN n > 1 AND (n*sxx - sx*sx) > 0
        |      AND (n*syy - sy*sy) > 0
        |    THEN greatest(-1.0, least(1.0, (n*sxy - sx*sy) /
        |      sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)))) END, 6) AS acf7
        |FROM g ORDER BY event_type""".stripMargin,
    // same two-level decimal means; dow aligned to Spark's 1=Sunday
    "w20_seasonal_index" ->
      """WITH daily AS (SELECT
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
        |      AS day, event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |dw AS (SELECT event_type,
        |    CAST(dayofweek(day) + 1 AS BIGINT) AS dow,
        |    CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS sv,
        |    count(*) AS n_days
        |  FROM daily GROUP BY 1, 2),
        |t AS (SELECT event_type, dow, n_days, sv,
        |    CAST(SUM(CAST(sv AS DECIMAL(18,4))) OVER
        |      (PARTITION BY event_type) AS DOUBLE) AS tot,
        |    sum(n_days) OVER (PARTITION BY event_type) AS ntot
        |  FROM dw)
        |SELECT event_type, dow, n_days,
        |  round(sv / n_days, 6) AS dow_mean,
        |  round((sv / n_days) / (tot / ntot), 6) AS seasonal_index
        |FROM t ORDER BY event_type, dow""".stripMargin,
    // same six DECIMAL(30,2) moments over the same 7-row frame; the
    // final double chain is written in the identical operation order
    "w18_rolling_corr" ->
      """WITH daily AS (SELECT
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
        |      AS day, event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT day, CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
        |    AS y FROM daily GROUP BY 1),
        |j AS (SELECT daily.day, event_type, x, y
        |  FROM daily JOIN tot USING (day)),
        |m AS (SELECT day, event_type, x, y,
        |    CAST(count(*) OVER w AS DOUBLE) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(30,2))) OVER w AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(30,2))) OVER w AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x*y AS DECIMAL(30,2))) OVER w AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x*x AS DECIMAL(30,2))) OVER w AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y*y AS DECIMAL(30,2))) OVER w AS DOUBLE) AS syy
        |  FROM j WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, event_type, round(x, 6) AS x, round(y, 6) AS y,
        |  round(CASE WHEN n > 1 AND (n*sxx - sx*sx) > 0
        |      AND (n*syy - sy*sy) > 0
        |    THEN greatest(-1.0, least(1.0, (n*sxy - sx*sy) /
        |      sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)))) END, 6) AS corr7
        |FROM m ORDER BY day, event_type""".stripMargin,
    "w17_rolling_median" ->
      s"""WITH daily AS (SELECT
         |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
         |      AS day, event_type,
         |    ${graft.Sql.oSum("value", 4)} AS v
         |  FROM events GROUP BY 1, 2)
         |SELECT day, event_type, round(v, 6) AS v,
         |  round(quantile_cont(v, 0.5) OVER (PARTITION BY event_type
         |    ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
         |    AS med7
         |FROM daily ORDER BY day, event_type""".stripMargin,
    "w16_rolling_anomaly" ->
      s"""WITH daily AS (SELECT
         |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
         |      AS day, event_type,
         |    ${graft.Sql.oSum("value", 4)} AS v
         |  FROM events GROUP BY 1, 2),
         |r AS (SELECT day, event_type, v,
         |    COUNT(*) OVER w AS n,
         |    ${graft.Sql.oSumOver("v", "w", 4)} AS s,
         |    CAST(SUM(CAST(v * v AS DECIMAL(18,4))) OVER w AS DOUBLE) AS s2
         |  FROM daily
         |  WINDOW w AS (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
         |z AS (SELECT day, event_type, v, n, s,
         |    CASE WHEN n > 1 AND (s2 - s * s / n) / (n - 1) > 0 THEN
         |      round((v - s / n) / sqrt((s2 - s * s / n) / (n - 1)), 6)
         |    END AS z
         |  FROM r)
         |SELECT day, event_type, round(v, 6) AS v,
         |  round(s / n, 6) AS mean_7d, z, abs(z) > 2 AS flagged
         |FROM z ORDER BY day, event_type""".stripMargin,
    "w15_share_of_day" ->
      s"""WITH e AS (SELECT event_id,
         |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
         |      AS day, value
         |  FROM events WHERE user_id < 50),
         |t AS (SELECT event_id, day, value,
         |    round(${graft.Sql.oSumOver("value", "(PARTITION BY day)", 4)},
         |      6) AS day_total
         |  FROM e)
         |SELECT event_id, day, value, day_total,
         |  round(value / day_total, 6) AS share
         |FROM t ORDER BY event_id""".stripMargin,
    "w14_daily_p95" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
        |    AS day,
        |  count(*) AS n_events,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95,
        |  round(max(value), 6) AS p100
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "w13_interp_resample" ->
      """WITH obs AS (SELECT * FROM events
        |  WHERE user_id < 20 AND event_type = 'purchase'),
        |daily AS (SELECT user_id,
        |  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |  max(value) AS v FROM obs GROUP BY 1, 2),
        |days AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
        |  TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS day),
        |sp AS (SELECT user_id, day
        |  FROM (SELECT DISTINCT user_id FROM obs) u CROSS JOIN days),
        |j AS (SELECT sp.user_id, sp.day, d.v
        |  FROM sp LEFT JOIN daily d ON d.user_id = sp.user_id
        |    AND d.day = sp.day),
        |m AS (SELECT *,
        |  last_value(CASE WHEN v IS NOT NULL
        |      THEN {'d': day, 'vv': v} END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |  first_value(CASE WHEN v IS NOT NULL
        |      THEN {'d': day, 'vv': v} END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
        |  FROM j)
        |SELECT user_id, day, round(CASE
        |  WHEN pv IS NULL THEN (nx).vv
        |  WHEN nx IS NULL THEN (pv).vv
        |  WHEN (pv).d = (nx).d THEN (pv).vv
        |  ELSE (pv).vv + ((nx).vv - (pv).vv) *
        |    (CAST(date_diff('day', (pv).d, day) AS DOUBLE) /
        |     CAST(date_diff('day', (pv).d, (nx).d) AS DOUBLE)) END, 6)
        |  AS v_interp
        |FROM m ORDER BY user_id, day""".stripMargin,
    "w12_interval_merge" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    ts + INTERVAL 15 MINUTE AS fin
        |  FROM events WHERE user_id < 30),
        |m AS (SELECT *, max(fin) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM e),
        |f AS (SELECT *, CASE WHEN prev_max IS NULL OR ts > prev_max
        |    THEN 1 ELSE 0 END AS flag FROM m),
        |i AS (SELECT *, CAST(sum(flag) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS island FROM f)
        |SELECT user_id, island, min(ts) AS merge_start,
        |  max(fin) AS merge_end, count(*) AS n_events
        |FROM i GROUP BY user_id, island
        |ORDER BY user_id, island""".stripMargin,
    "w1_latest_per_key" ->
      """WITH r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
        |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |FROM events)
        |SELECT user_id, ts AS last_ts, value AS last_value,
        |  event_id AS last_event_id
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "w2_rolling_avg7" ->
      s"""SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         |  ${Sql.oAvgOver("value", rollOver)} AS roll_avg
         |FROM events ORDER BY user_id, ts, event_id""".stripMargin,
    "w3_last_value" ->
      """SELECT user_id, arg_max(value, ts) AS last_value,
        |  CAST(max(ts) AS TIMESTAMP) AS last_ts
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "w9_locf_resample" ->
      """WITH obs AS (SELECT * FROM events
        |  WHERE user_id < 20 AND event_type = 'purchase'),
        |daily AS (SELECT user_id,
        |  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |  max(value) AS v FROM obs GROUP BY 1, 2),
        |days AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
        |  TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS day),
        |sp AS (SELECT user_id, day
        |  FROM (SELECT DISTINCT user_id FROM obs) u CROSS JOIN days)
        |SELECT sp.user_id, sp.day,
        |  last_value(d.v IGNORE NULLS) OVER (PARTITION BY sp.user_id
        |    ORDER BY sp.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM sp LEFT JOIN daily d ON d.user_id = sp.user_id AND d.day = sp.day
        |ORDER BY sp.user_id, sp.day""".stripMargin,
    "w10_range_frame" ->
      s"""SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         |  count(*) OVER w AS n_7d,
         |  ${graft.Sql.oSumOver("value", "w")} AS sum_7d
         |FROM events
         |WHERE user_id < 50 AND event_type = 'purchase'
         |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
         |  RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, event_id""".stripMargin,
    "j1_delta_30back" ->
      """WITH cnts AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
        |ordered AS (SELECT user_id, value,
        |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |FROM events),
        |latest AS (SELECT user_id, value AS last_value FROM ordered WHERE rn = 1),
        |ago AS (SELECT o.user_id, o.value AS ago_value
        |  FROM ordered o JOIN cnts c ON o.user_id = c.user_id
        |  WHERE o.rn = LEAST(c.cnt, 31))
        |SELECT l.user_id AS user_id, l.last_value, a.ago_value,
        |  l.last_value - a.ago_value AS delta
        |FROM latest l JOIN ago a ON l.user_id = a.user_id
        |ORDER BY l.user_id""".stripMargin,
    "c1_forecast" ->
      s"""WITH rolled AS (SELECT user_id, CAST(ts AS DATE) AS last_day,
         |  ${Sql.oAvgOver("value", rollOver)} AS roll_avg,
         |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |FROM events),
         |latest AS (SELECT user_id, last_day, roll_avg FROM rolled WHERE rn = 1)
         |SELECT l.user_id, l.last_day + CAST(g.i AS INT) AS day,
         |  l.roll_avg AS forecast
         |FROM latest l CROSS JOIN generate_series(1, 5) AS g(i)
         |ORDER BY user_id, day""".stripMargin,
    "w11_ewma" ->
      """WITH l AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |  list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
        |FROM events)
        |SELECT user_id, event_id, ts,
        |  round(
        |    list_sum(list_transform(xs, (x, i) -> x * pow(0.7, len(xs) - i)))
        |    / list_sum(list_transform(xs, (x, i) -> pow(0.7, len(xs) - i))),
        |  6) AS ewma
        |FROM l ORDER BY user_id, ts, event_id""".stripMargin,
    "c2_upsert_lww" ->
      """WITH r AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
        |  ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                     ORDER BY ts DESC, event_id DESC) AS rn
        |FROM events)
        |SELECT user_id, event_type, ts, value, event_id
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)
}
