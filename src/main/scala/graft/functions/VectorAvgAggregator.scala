package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-group vector centroid as a typed Aggregator[IN, BUF, OUT]
  * (SURVEY.md §2.11) — the embedding-pipeline op behind class
  * prototypes / IVF re-centering, shaped for scale:
  *
  *  - the buffer is one fixed-width (dim longs + count) record per
  *    group, so map-side combine applies and the shuffle carries
  *    |groups| × dim values — NOT the |rows| × dim explosion the
  *    posexplode + groupBy(dim) formulation pays;
  *  - elements accumulate as fixed-point longs (floor(x·1e9)): long
  *    addition is exact and order-independent, so the centroid is
  *    bit-reproducible under any partitioning AND matches the DuckDB
  *    oracle (double summation would differ in the low bits per
  *    partition order — the same property `Sql.dsum` provides for
  *    scalar sums). Precision 1e-9 of unit-normed inputs, far below
  *    any downstream cosine's sensitivity.
  */
case class VecSum(sums: Array[Long], n: Long)

object VectorAvgAggregator
    extends Aggregator[Array[Double], VecSum, Array[Double]] {

  def zero: VecSum = VecSum(Array.emptyLongArray, 0L)

  private def scaled(x: Double): Long = math.floor(x * 1e9).toLong

  def reduce(b: VecSum, a: Array[Double]): VecSum = {
    val s = if (b.sums.isEmpty) new Array[Long](a.length) else b.sums
    var i = 0
    while (i < a.length) { s(i) += scaled(a(i)); i += 1 }
    VecSum(s, b.n + 1)
  }

  def merge(x: VecSum, y: VecSum): VecSum =
    if (x.sums.isEmpty) y
    else if (y.sums.isEmpty) x
    else {
      val s = new Array[Long](x.sums.length)
      var i = 0
      while (i < s.length) { s(i) = x.sums(i) + y.sums(i); i += 1 }
      VecSum(s, x.n + y.n)
    }

  def finish(b: VecSum): Array[Double] =
    b.sums.map(_ / (1e9 * b.n))

  def bufferEncoder: Encoder[VecSum] = Encoders.product[VecSum]
  def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
