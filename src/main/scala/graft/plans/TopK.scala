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
  * partition. Selection is deterministic: rank by (value DESC, tie ASC);
  * null values are excluded (a NULL can never be in a "largest k").
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
      // per-key bounded buffers, each kept sorted by (value desc, tie
      // asc); linear insertion — k is small by contract
      val state = new scala.collection.mutable.HashMap[
        UnsafeRow, scala.collection.mutable.ArrayBuffer[(Double, Long, UnsafeRow)]]()
      while (iter.hasNext) {
        val row = iter.next()
        val ord = ordProj(row)
        if (!ord.isNullAt(0)) {
          val v = ord.getDouble(0)
          // null tie -> MinValue: Spark's ASC window ordering puts NULLs
          // first, so a null-tie row outranks equal-valued peers here too
          // (among several null ties the pick is arbitrary, exactly as
          // row_number over a non-total order is)
          val t = if (ord.isNullAt(1)) Long.MinValue else ord.getLong(1)
          val buf = state.getOrElseUpdate(keyProj(row).copy(),
            new scala.collection.mutable.ArrayBuffer[(Double, Long, UnsafeRow)](k + 1))
          // Double.compare, not >: NaN must rank GREATEST (Spark's DESC
          // ordering yields NaN first), and a plain > is false for every
          // NaN comparison, which would also break the buffer invariant
          def ranksBefore(a: (Double, Long), b: (Double, Long)): Boolean = {
            val c = java.lang.Double.compare(a._1, b._1)
            c > 0 || (c == 0 && a._2 < b._2)
          }
          if (buf.length < k || ranksBefore((v, t), (buf.last._1, buf.last._2))) {
            var i = buf.length
            while (i > 0 && ranksBefore((v, t), (buf(i - 1)._1, buf(i - 1)._2))) i -= 1
            buf.insert(i, (v, t, rowProj(row).copy()))
            if (buf.length > k) buf.remove(k)
          }
        }
      }
      state.valuesIterator.flatMap(_.iterator.map(_._3))
    }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}
