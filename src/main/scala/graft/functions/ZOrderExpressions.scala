package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Z-ORDER (Morton) clustering key — the multi-dimensional locality
  * transform behind Delta `OPTIMIZE ZORDER BY` / Iceberg
  * `rewrite_data_files(strategy => 'sort', z-order)`: each input column
  * is rank-bucketized against PRE-COMPUTED equi-depth boundaries (the
  * sampled-quantile normalization those engines use — raw bit
  * interleaving over skewed domains wastes most of the curve), and the
  * 8-bit bucket indices are bit-interleaved round-robin into one LONG.
  * Sorting rows by this value gives every listed column locality in
  * the file layout simultaneously, which is what makes min/max zone
  * maps selective on EVERY listed column rather than only the leading
  * sort key ([[graft.sources.GdxSource.optimizeZOrder]] measures
  * exactly that).
  *
  * Boundary arrays are a plan constant (one driver-side
  * `approxQuantile` per column at OPTIMIZE time); 255 boundaries = 256
  * buckets per column, 8 interleaved bits per column — ample for FILE
  * level clustering, where bucket count only needs to exceed the
  * target file count by a comfortable factor.
  *
  * NULL semantics: a NULL input clusters at bucket 0 (the curve's
  * origin) — clustering placement only, never row content, so the
  * choice is free. Long inputs pass through double normalization
  * (exact to 2⁵³ — and beyond that only the CLUSTERING could coarsen,
  * never any query answer: zone-map bounds are computed from the
  * written rows themselves, not from this key).
  *
  * Codegen: children evaluate inline inside whole-stage codegen; the
  * bucketize+interleave kernel is invoked on the expression instance
  * (the [[PqEncode]] payload-expression idiom — the per-row cost IS
  * the fused kernel loop; inlining its source would buy nothing).
  */
case class ZValue(children: Seq[Expression], bounds: Array[Array[Double]])
    extends Expression {
  require(children.nonEmpty && children.length == bounds.length,
    "zvalue: one boundary array per input column")
  require(children.length <= 8,
    "zvalue: at most 8 interleaved columns (64-bit key)")

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"
  // the boundary payload participates in semantic equality via the
  // case-class fields; arrays compare by identity which is exactly the
  // plan-constant contract (one instance per OPTIMIZE call)
  override lazy val deterministic: Boolean = children.forall(_.deterministic)

  private val nDims = children.length

  /** Bucketize each (possibly NaN-for-NULL) value against its
    * boundaries and interleave the 8-bit indices, dimension j at bit
    * positions j, j+n, j+2n, … */
  def kernel(vals: Array[Double]): Long = {
    var z = 0L
    var j = 0
    while (j < nDims) {
      val v = vals(j)
      val b = bounds(j)
      var bucket =
        if (java.lang.Double.isNaN(v)) 0
        else {
          val i = java.util.Arrays.binarySearch(b, v)
          if (i >= 0) i + 1 else -i - 1
        }
      if (bucket > 255) bucket = 255
      var bit = 0
      while (bit < 8) {
        z |= ((bucket >> bit) & 1L) << (bit * nDims + j)
        bit += 1
      }
      j += 1
    }
    z
  }

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Double](nDims)
    var j = 0
    while (j < nDims) {
      val v = children(j).eval(input)
      vals(j) = v match {
        case null      => Double.NaN
        case l: Long   => l.toDouble
        case d: Double => d
        case i: Int    => i.toDouble
        case n: Number => n.doubleValue()
      }
      j += 1
    }
    kernel(vals)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("zvalue", this, classOf[ZValue].getName)
    val vals = ctx.freshName("zvals")
    val childGen = children.map(_.genCode(ctx))
    val fill = childGen.zipWithIndex.map { case (g, j) =>
      s"""${g.code}
         |$vals[$j] = ${g.isNull} ? Double.NaN : (double) ${g.value};
         |""".stripMargin
    }.mkString
    ev.copy(
      code = code"""
        |double[] $vals = new double[$nDims];
        |$fill
        |long ${ev.value} = $self.kernel($vals);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZValue {
  /** Input columns must be numeric (bucketized through double). */
  def supportedType(dt: DataType): Boolean = dt match {
    case LongType | DoubleType | org.apache.spark.sql.types.IntegerType |
        org.apache.spark.sql.types.FloatType |
        org.apache.spark.sql.types.ShortType => true
    case _ => false
  }
}
