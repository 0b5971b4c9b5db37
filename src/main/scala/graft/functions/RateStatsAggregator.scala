package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator[IN, BUF, OUT] (SURVEY.md §2.11): min/max/mean of a
  * rate series in one pass — the user-facing typed form of the engine's
  * partial-aggregation machinery. The buffer is a constant-size case
  * class, so map-side combine and merge work at any scale; `merge` is
  * associative and commutative, the property that lets Spark apply it
  * across arbitrary partitionings. */
case class RateStats(min: Double, max: Double, sum: Double, n: Long)

object RateStatsAggregator extends Aggregator[Double, RateStats, RateStats] {
  def zero: RateStats =
    RateStats(Double.PositiveInfinity, Double.NegativeInfinity, 0.0, 0L)
  def reduce(b: RateStats, x: Double): RateStats =
    RateStats(math.min(b.min, x), math.max(b.max, x), b.sum + x, b.n + 1)
  def merge(a: RateStats, b: RateStats): RateStats =
    RateStats(math.min(a.min, b.min), math.max(a.max, b.max),
      a.sum + b.sum, a.n + b.n)
  def finish(r: RateStats): RateStats = r
  def bufferEncoder: Encoder[RateStats] = Encoders.product[RateStats]
  def outputEncoder: Encoder[RateStats] = Encoders.product[RateStats]
}
