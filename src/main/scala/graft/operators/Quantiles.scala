package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles by DISTRIBUTED SELECTION — the shape that
  * replaces `percentile()`'s value-count map wherever the column is
  * distinct-heavy.
  *
  * Spark's exact `percentile` aggregate builds a per-partition
  * OpenHashMap of every distinct value, serializes the maps through a
  * single-partition exchange, merges them on one task, and sorts the
  * merged map to answer. On a distinct-heavy column the "map" IS the
  * column (583k entries for 600k lineitem rows at sf0.1 — measured
  * ~2.4 s, all of it in the one-task merge+sort), and at 100 TB it is an
  * executor OOM, not a slowdown. Selection does what a global sort does:
  * ONE range exchange (sampled bounds, same machinery as `orderBy`),
  * per-partition in-memory sort of ~1/P of the data, then two O(P)
  * driver round-trips — per-partition counts down, the ≤2·|probs| target
  * order statistics back. Driver state is P longs + 2k doubles, bounded
  * regardless of data size; nothing single-task ever holds the column.
  *
  * Interpolation matches both `percentile` and DuckDB `quantile_cont`:
  * pos = (n-1)·q, v = v⌊pos⌋ + (pos-⌊pos⌋)·(v⌈pos⌉ - v⌊pos⌋). NULLs are
  * dropped (aggregate semantics); NaN would sort last like both engines'
  * orderings. Exactness does not depend on where the sampled range
  * bounds land — global ranks are recomputed from the actual counts.
  */
object Quantiles {

  /** Exact interpolated quantiles of `valueCol` (cast to double, nulls
    * dropped) at each probability in `probs`. One range shuffle + two
    * bounded driver exchanges; never a value map. */
  def exactQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
                     parts: Int = 32): Seq[Double] = {
    require(probs.forall(p => p >= 0.0 && p <= 1.0), s"probs out of range")
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .repartitionByRange(parts, col("v"))
      .sortWithinPartitions("v")
      // two jobs read the sorted layout (counts, then selection): pin it
      // once; localCheckpoint is per-invocation so benches stay honest
      .localCheckpoint()
    val rdd = vals.rdd.map(_.getDouble(0))
    val counts = rdd.mapPartitionsWithIndex((i, it) =>
      Iterator((i, it.size.toLong)), preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val n = counts.sum
    require(n > 0, s"exactQuantiles($valueCol): empty input")
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = global rank of partition i's first row
    // ranks of the order statistics each quantile interpolates between
    val positions = probs.map(q => (n - 1) * q)
    val ranks = positions.flatMap(pos =>
      Seq(math.floor(pos).toLong, math.ceil(pos).toLong)).distinct.sorted
    val byPart: Map[Int, Seq[Long]] = ranks.groupBy { r =>
      // partition whose [offset, offset+count) range holds global rank r
      val i = java.util.Arrays.binarySearch(offsets, r)
      if (i >= 0) {
        // r on a boundary: first partition starting at r that is non-empty
        var j = i; while (j < counts.length && counts(j) == 0) j += 1; j
      } else -i - 2
    }
    val found = rdd.mapPartitionsWithIndex { (i, it) =>
      byPart.get(i) match {
        case None => Iterator.empty
        case Some(rs) =>
          val local = rs.map(r => r - offsets(i)).sorted.iterator
          var want = if (local.hasNext) local.next() else -1L
          var idx = 0L
          val out = Seq.newBuilder[(Long, Double)]
          while (want >= 0 && it.hasNext) {
            val v = it.next()
            if (idx == want) {
              out += ((idx + offsets(i), v))
              want = if (local.hasNext) local.next() else -1L
            }
            idx += 1
          }
          out.result().iterator
      }
    }.collect().toMap
    positions.map { pos =>
      val (lo, hi) = (found(math.floor(pos).toLong), found(math.ceil(pos).toLong))
      lo + (pos - math.floor(pos)) * (hi - lo)
    }
  }

  /** `exactQuantiles` rounded like `round(x, 6)` on both engines
    * (HALF_UP decimal rounding — what Spark's `round` and DuckDB's
    * `round` agree on). */
  def exactQuantilesRounded6(df: DataFrame, valueCol: String,
                             probs: Seq[Double]): Seq[Double] =
    exactQuantiles(df, valueCol, probs).map(v =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** Per-group exact trimmed core by DISTRIBUTED RANK — the selection
    * analog of `exactQuantiles` for "drop the bottom/top `frac` of rows
    * per group under a deterministic total order". A per-group
    * `row_number` window parallelizes by GROUP COUNT (3 tasks sort
    * everything when there are 3 groups — the window shape dies first
    * at 100 TB); here the range exchange on the FULL sort key spreads
    * every group across all partitions, per-(partition, group) counts
    * make one bounded driver round-trip (P·G longs), and global
    * per-group ranks are then just local position + offset — each
    * partition keeps only its slice of every group's core and emits
    * one partial (count, exact scaled-long sum) per group it touched.
    *
    * Input columns (by name): `g` STRING group, `cents` LONG scaled
    * value (also the leading sort dimension after `g`), `k1`/`k2` LONG
    * tie-breakers completing the total order. Keeps 0-based ranks in
    * [floor(n·frac), n - floor(n·frac)) per group — identical membership
    * to the 1-based `rn > floor(n·frac) AND rn <= n - floor(n·frac)`
    * window filter. Returns (g, n_core LONG, sum_cents LONG) with one
    * row per group, exact. */
  def trimmedCorePerGroup(df: DataFrame, frac: Double,
                          parts: Int = 32): Seq[(String, Long, Long)] = {
    // no checkpoint: both driver round-trips re-read the SAME shuffle
    // stage output (Spark caches map-stage shuffle files across jobs in
    // a session), so only the cheap post-shuffle sort re-runs
    val laid = df
      .repartitionByRange(parts, col("g"), col("cents"), col("k1"),
        col("k2"))
      .sortWithinPartitions("g", "cents", "k1", "k2")
    val rdd = laid.select("g", "cents").rdd
      .map(r => (r.getString(0), r.getLong(1)))
    // (partition, group) -> rows, in partition-then-encounter order
    val counts = rdd.mapPartitionsWithIndex((i, it) => {
      val m = scala.collection.mutable.LinkedHashMap[String, Long]()
      it.foreach { case (g, _) => m.update(g, m.getOrElse(g, 0L) + 1) }
      Iterator((i, m.toList))
    }, preservesPartitioning = true).collect().sortBy(_._1)
    val totals = scala.collection.mutable.Map[String, Long]()
    val offsets = scala.collection.mutable.Map[(Int, String), Long]()
    for ((pid, gs) <- counts; (g, c) <- gs) {
      offsets((pid, g)) = totals.getOrElse(g, 0L)
      totals(g) = totals.getOrElse(g, 0L) + c
    }
    val bounds: Map[String, (Long, Long)] = totals.map { case (g, n) =>
      val lo = math.floor(n * frac).toLong
      g -> (lo, n - lo)
    }.toMap
    val off = offsets.toMap
    val partials = rdd.mapPartitionsWithIndex { (i, it) =>
      val pos = scala.collection.mutable.Map[String, Long]()
      val cnt = scala.collection.mutable.Map[String, Long]()
      val sums = scala.collection.mutable.Map[String, Long]()
      it.foreach { case (g, cents) =>
        val r = pos.getOrElse(g, off.getOrElse((i, g), 0L))
        pos(g) = r + 1
        val (lo, hi) = bounds(g)
        if (r >= lo && r < hi) {
          cnt(g) = cnt.getOrElse(g, 0L) + 1
          sums(g) = sums.getOrElse(g, 0L) + cents
        }
      }
      cnt.keysIterator.map(g => (g, cnt(g), sums(g)))
    }.collect()
    partials.groupBy(_._1).toSeq.map { case (g, ps) =>
      (g, ps.map(_._2).sum, ps.map(_._3).sum)
    }.sortBy(_._1)
  }
}
