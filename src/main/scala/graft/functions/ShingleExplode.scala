package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating function (Catalyst `Generator` — the UDTF
  * tier of the extension surface, alongside the scalar Expressions, the
  * typed Aggregators, the TopK planner strategy + optimizer rule, and
  * the DataSourceV2 source): one input document row → (pos, shingle)
  * rows for every word k-shingle, in a single fused pass.
  *
  * The builtin composition (`TextFunctions.shinglesStrict` =
  * transform(sequence…) + posexplode) materializes the WHOLE shingle
  * array per row before the generate — for a 100k-token document that
  * is n_tok strings of k tokens each (~k× the document bytes) held in
  * memory per row. The generator streams: each shingle is built and
  * emitted on demand from one tokens array, so per-row transient state
  * is O(document), not O(k × document). Same shuffle story as any
  * generate (none); row order within a document is position order.
  *
  * Strict semantics match `shinglesStrict`: a document with fewer than
  * k tokens yields no rows (never a degenerate whole-text shingle);
  * NULL input yields no rows (outer-generate callers get the NULL row
  * back from GenerateExec's `outer=true`, not from here).
  */
case class ShingleExplode(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(k >= 1, s"shingle_explode: k must be >= 1, got $k")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_explode expects a STRING document, got ${child.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val doc = child.eval(input)
    if (doc == null) Nil
    else {
      // limit -1 keeps trailing empty tokens — parity with Spark's
      // split() (shinglesStrict) and DuckDB string_split, which both
      // keep them; Java's default split would drop them
      val toks = doc.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < k) Nil
      else new Iterator[InternalRow] {
        private var i = 0
        private val last = toks.length - k
        private val sb = new java.lang.StringBuilder
        def hasNext: Boolean = i <= last
        def next(): InternalRow = {
          sb.setLength(0)
          var j = i
          while (j < i + k) {
            if (j > i) sb.append(' ')
            sb.append(toks(j))
            j += 1
          }
          val row = InternalRow(i, UTF8String.fromString(sb.toString))
          i += 1
          row
        }
      }
    }
  }

  override def prettyName: String = "shingle_explode"
  override protected def withNewChildInternal(c: Expression): ShingleExplode =
    copy(child = c)
}
