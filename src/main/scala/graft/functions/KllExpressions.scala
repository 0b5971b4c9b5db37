package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType,
  NumericType}

/** MERGEABLE QUANTILE SKETCHES (DataSketches KLL) as first-class
  * aggregate state — the quantile analogue of Spark's own
  * `hll_sketch_agg`/`hll_union_agg` pair, which Spark does not ship
  * for percentiles: `approx_percentile`'s digest is an internal
  * buffer, not a storable/unionable column.
  *
  * Why it matters at 100 TB: quantiles do NOT decompose through sums,
  * so a classic summary table cannot answer "median latency per
  * region" at any grain other than the one it was built at. A KLL
  * sketch per summary cell restores the self-maintainable-view
  * algebra — cell sketches UNION into coarser grains and into refresh
  * deltas with mathematically bounded rank error (~1.65% at k=200),
  * exactly like the HLL distinct-count partials in
  * [[graft.plans.MvRewrite]]. One scan of the fact table, then every
  * quantile dashboard reads |groups| rows forever.
  *
  * KLL compaction flips coins, so two runs produce slightly different
  * (equally valid) estimates — callers must pin CLAIMS to the
  * published rank-error bound, never to estimate equality (the same
  * contract as the HLL union-vs-direct estimator note in the round
  * workflow). */
case class KllSketchAgg(
    child: Expression,
    k: Int = KllSketchAgg.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg needs a numeric column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(b: KllDoublesSketch, input: InternalRow)
      : KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) b.update(KllSketchAgg.toDouble(v))
    b
  }

  override def merge(b: KllDoublesSketch, o: KllDoublesSketch)
      : KllDoublesSketch = { b.merge(o); b }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray

  // heapify of a compact image is read-only in DataSketches 6.x; merge
  // into a fresh updatable instance so every buffer this aggregate
  // holds accepts further update()/merge() calls
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val s = KllDoublesSketch.newHeapInstance(k)
    s.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    s
  }

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

object KllSketchAgg {
  /** DataSketches default: normalized rank error ≈ 1.65% (99% conf). */
  val DefaultK = 200

  private[functions] def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(
      s"kll: unsupported numeric $other (${other.getClass})")
  }
}

/** Union of serialized KLL sketches — the rollup/refresh side: cell
  * sketches merge into coarser-grain sketches with the SAME state a
  * direct build over the union of rows would reach (merge is the
  * sketch's native operation, not an approximation of one). */
case class KllMergeAgg(
    child: Expression,
    k: Int = KllSketchAgg.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def prettyName: String = "kll_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg needs a binary sketch column, got " +
        other.catalogString)
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(b: KllDoublesSketch, input: InternalRow)
      : KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      b.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(b: KllDoublesSketch, o: KllDoublesSketch)
      : KllDoublesSketch = { b.merge(o); b }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray
  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val s = KllDoublesSketch.newHeapInstance(k)
    s.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    s
  }

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** Quantile estimate from a serialized KLL sketch (INCLUSIVE search —
  * the DataSketches default). NULL for an empty sketch. Scalar over
  * |groups| rows (post-aggregate), so CodegenFallback costs nothing
  * measurable — the hot path is the sketch AGGREGATION, which runs
  * inside the hash-aggregate operator. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback
    with BinaryLike[Expression] {

  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile needs (binary sketch, double rank), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(sketch: Any, q: Any): Any = {
    val s = KllDoublesSketch.heapify(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null
    else s.getQuantile(q.asInstanceOf[Double],
      QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantile = copy(left = l, right = r)
}

/** Column-API surface for the KLL family. */
object KllFunctions {
  def kllSketchAgg(c: Column, k: Int = KllSketchAgg.DefaultK): Column =
    column(KllSketchAgg(expression(c), k).toAggregateExpression())

  def kllMergeAgg(c: Column, k: Int = KllSketchAgg.DefaultK): Column =
    column(KllMergeAgg(expression(c), k).toAggregateExpression())

  def kllQuantile(sketch: Column, q: Double): Column =
    column(KllQuantile(expression(sketch),
      org.apache.spark.sql.catalyst.expressions.Literal(q)))
}
