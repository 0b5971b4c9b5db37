package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** TopKPerKey — a whole-operator Catalyst extension (logical node +
  * planner strategy + physical operator), the tier below custom
  * expressions when composition genuinely loses at scale.
  *
  * Per-group top-k via `Window(row_number) <= k` plans as a FULL SORT of
  * every group (exchange + sort + window walk): at 100 TB that sorts the
  * whole fact table to keep k rows per key. This operator instead keeps a
  * BOUNDED per-key buffer (≤ k rows), in two phases mirroring partial/
  * final aggregation:
  *
  *   PartialTopKExec — map-side: every partition reduces to ≤ k rows per
  *     key it has seen, before any shuffle (the combiner that makes the
  *     exchange carry O(keys·k), not O(rows)).
  *   FinalTopKExec — requires ClusteredDistribution(keys) (Catalyst
  *     inserts the hash exchange), merges the partials to the exact
  *     per-key top-k.
  *
  * State per partition is (#distinct keys present) × k row copies —
  * bounded and spill-free where the window plan's sort buffers the whole
  * partition. Selection is deterministic: rank by (value DESC NULLS
  * LAST, tie ASC) — null values order below every non-null, exactly the
  * default window ordering, which keeps [[TopKRewrite]] semantics-
  * preserving.
  *
  * Registered via SparkSessionExtensions.injectPlannerStrategy
  * (GraftExtensions) and, for plain sessions, lazily through
  * `experimental.extraStrategies` in [[graft.operators.JoinOps]]'s
  * helper — both the blessed extension routes.
  */
case class TopKPerKey(keys: Seq[Expression], value: Expression,
                      tie: Expression, k: Int, child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, s"TopKPerKey: k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, value, tie, k, child) =>
      TopKPerKeyExec(keys, value, tie, k,
        TopKPerKeyExec(keys, value, tie, k, planLater(child),
          partial = true),
        partial = false) :: Nil
    case _ => Nil
  }
}

/** Optimizer rewrite (SparkSessionExtensions.injectOptimizerRule): the
  * QUALIFY-style rank-limit idiom
  *
  *   Project([cols not referencing rn],
  *     Filter(rn <= k,                       -- also rn < k, rn = 1
  *       Window([rn := row_number() OVER (PARTITION BY keys
  *                ORDER BY value DESC, tie ASC)], ...)))
  *
  * is replanned onto the bounded-heap TopKPerKey operator — users write
  * the idiomatic window query and get the partial/final heap plan (no
  * per-group sort, exchange carries ≤ k rows per key per partition)
  * whenever the rank column itself is dropped afterwards. Guards keep
  * the rewrite exactly semantics-preserving:
  *  - single row_number window expression, default DESC NULLS LAST /
  *    ASC NULLS FIRST orderings (what the heap implements);
  *  - value is a non-decimal numeric ≤ 32-bit or floating (its Double
  *    cast is order-isomorphic; BIGINT/DECIMAL could collide past 2^53);
  *  - tie is integral (exact in a Long);
  *  - the surviving projection references only child columns, so the
  *    dropped rank attribute is provably unused.
  * Rows with NULL value order below all non-nulls in both formulations
  * (TopKPerKeyExec ranks them last rather than excluding them). */
object TopKRewrite
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window}
  import org.apache.spark.sql.types._

  private def rankLimit(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) && k == 1 => Some(1)
      case _ => None
    }

  private def doubleSafe(t: DataType): Boolean = t match {
    case DoubleType | FloatType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projList,
        Filter(cond,
          Window(Seq(al @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(part, Seq(
                SortOrder(value, Descending, NullsLast, _),
                SortOrder(tie, Ascending, NullsFirst, _)), _)), _)),
            _, _, child, _)))
      if rankLimit(cond, al.toAttribute).exists(_ > 0) &&
        projList.forall(_.references.subsetOf(child.outputSet)) &&
        doubleSafe(value.dataType) &&
        Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(tie.dataType) &&
        part.nonEmpty =>
      val k = rankLimit(cond, al.toAttribute).get
      // InferWindowGroupLimit (which runs before user rules) may already
      // have planted its per-partition rank prefilter under the Window;
      // the heap subsumes it, and keeping it would re-introduce the
      // per-partition Sorts the rewrite exists to avoid
      val base = child match {
        case org.apache.spark.sql.catalyst.plans.logical
          .WindowGroupLimit(_, _, _, limit, grandchild) if limit >= k =>
          grandchild
        case other => other
      }
      Project(projList,
        TopKPerKey(part, Cast(value, DoubleType), Cast(tie, LongType),
          k, base))
  }
}

/** Column-name front door: resolves attributes against the analyzed
  * child, registers the strategy on plain sessions (idempotent), and
  * wraps the custom node back into a DataFrame. */
object TopK {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.graft.ColumnBridge
  import org.apache.spark.sql.types.{DoubleType, LongType}

  def topKPerKey(df: DataFrame, keyCols: Seq[String], valueCol: String,
                 tieCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val child = ColumnBridge.analyzed(df)
    def attr(n: String) = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"topKPerKey: no column '$n' in ${child.output.map(_.name)}"))
    ColumnBridge.ofRows(spark, TopKPerKey(keyCols.map(attr),
      Cast(attr(valueCol), DoubleType), Cast(attr(tieCol), LongType),
      k, child))
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], value: Expression,
                          tie: Expression, k: Int, child: SparkPlan,
                          partial: Boolean)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))
  override def nodeName: String =
    if (partial) "PartialTopKPerKey" else "FinalTopKPerKey"

  protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keys, child.output)
      val ordProj = UnsafeProjection.create(Seq(value, tie), child.output)
      val rowProj = UnsafeProjection.create(child.output, child.output)
      // per-key bounded buffers, each kept sorted by (value desc NULLS
      // LAST, tie asc); linear insertion — k is small by contract.
      // Null values rank BELOW every non-null (Spark's DESC NULLS LAST),
      // so they survive only in groups with fewer than k better rows —
      // exactly row_number semantics, which the TopKRewrite rule relies
      // on for equivalence.
      val state = new scala.collection.mutable.HashMap[
        UnsafeRow, scala.collection.mutable.ArrayBuffer[(Boolean, Double, Long, UnsafeRow)]]()
      while (iter.hasNext) {
        val row = iter.next()
        val ord = ordProj(row)
        val vNull = ord.isNullAt(0)
        val v = if (vNull) 0.0 else ord.getDouble(0)
        // null tie -> MinValue: Spark's ASC window ordering puts NULLs
        // first, so a null-tie row outranks equal-valued peers here too
        // (among several null ties the pick is arbitrary, exactly as
        // row_number over a non-total order is)
        val t = if (ord.isNullAt(1)) Long.MinValue else ord.getLong(1)
        val buf = state.getOrElseUpdate(keyProj(row).copy(),
          new scala.collection.mutable.ArrayBuffer[(Boolean, Double, Long, UnsafeRow)](k + 1))
        // Double.compare, not >: NaN must rank GREATEST (Spark's DESC
        // ordering yields NaN first), and a plain > is false for every
        // NaN comparison, which would also break the buffer invariant
        def ranksBefore(a: (Boolean, Double, Long), b: (Boolean, Double, Long)): Boolean =
          if (a._1 != b._1) b._1 // non-null before null
          else {
            val c = java.lang.Double.compare(a._2, b._2)
            c > 0 || (c == 0 && a._3 < b._3)
          }
        if (buf.length < k ||
            ranksBefore((vNull, v, t), (buf.last._1, buf.last._2, buf.last._3))) {
          var i = buf.length
          while (i > 0 &&
              ranksBefore((vNull, v, t), (buf(i - 1)._1, buf(i - 1)._2, buf(i - 1)._3))) i -= 1
          buf.insert(i, (vNull, v, t, rowProj(row).copy()))
          if (buf.length > k) buf.remove(k)
        }
      }
      state.valuesIterator.flatMap(_.iterator.map(_._4))
    }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}
