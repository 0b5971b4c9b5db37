package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Cast, Divide, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** MATERIALIZED-VIEW AUTO-REWRITE — an optimizer `Rule[LogicalPlan]`
  * that transparently answers aggregates over a base table from a
  * pre-computed summary, the classic OLAP MV-rewrite (Oracle query
  * rewrite / BigQuery BI Engine / Databricks materialized views). The
  * user keeps writing queries against the BASE table; when a registered
  * summary can answer one, the plan is rewritten to scan the summary
  * instead — at 100 TB that turns a full fact-table aggregate into a
  * scan of a few thousand pre-aggregated rows.
  *
  * Two rewrite shapes:
  *  - **exact**: the query groups by exactly the MV's grouping columns
  *    → a pure column remap (Project over the MV scan), zero
  *    aggregation at query time.
  *  - **rollup**: the query groups by a SUBSET of the MV's grouping
  *    columns → re-aggregate the summary (sum-of-sums, sum-of-counts,
  *    min-of-mins, max-of-maxes; avg recomposed as Σsum/Σn), the
  *    standard partial-aggregate compensation. Cost: an aggregate over
  *    |MV| rows instead of |base| rows.
  *
  * Matching is RELATION-level: the rule recognizes the base table by
  * its file-source root paths (robust to column pruning and projection
  * reordering), requires every grouping expression to be a bare base
  * column ⊆ the MV's grouping set, and every aggregate to be one of
  * count(*) / sum / min / max / avg over a covered measure, undistinct
  * and unfiltered. Anything else — an extra Filter, an uncovered
  * measure, count(DISTINCT) — leaves the plan untouched: the rewrite
  * is an optimization, never a semantics change.
  *
  * STALENESS CONTRACT: a registration answers for the base table AS OF
  * materialization; [[MvRewrite.materialize]] recomputes the summary
  * and re-registers atomically (keyed by summary path), so refreshing
  * the MV is one call. A production deployment would pin base-snapshot
  * versions (the GDX manifest version is exactly the right token) and
  * invalidate on base commit; session-lifetime registration is the
  * harness-scale reduction of that.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * (GraftExtensions) and, for foreign sessions, through
  * `spark.experimental.extraOptimizations` — both end-of-optimizer
  * batches, so the rule sees the settled Aggregate-over-Project-over-
  * Relation shape and its output (fresh scan + compensating aggregate)
  * needs no further analysis.
  */
object MvRewrite {

  /** One registered summary: base-table identity (file root paths),
    * grouping set, covered measures, and the summary's analyzed scan
    * plan with its column attributes. */
  case class MvDef(basePaths: Set[String], groupCols: Seq[String],
                   measureCols: Set[String], mvPlan: LogicalPlan,
                   mvAttr: Map[String, Attribute])

  /** Keyed by summary path: re-materializing the same MV REPLACES its
    * registration (fresh file listing), so bench warmup + timed passes
    * never plan against a deleted summary directory. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  private[graft] def clear(): Unit = registry.clear()

  /** Build the summary for `base` grouped by `groupCols` — columns
    * `n` (count), and `sum_m`/`min_m`/`max_m` per measure — write it
    * to `path` (parquet, overwritten), register it for rewrite, and
    * return the summary scan. The summary column set is exactly what
    * [[MvRewriteRule]]'s compensation algebra needs: any
    * count/sum/min/max/avg over a measure, at the MV grain or any
    * coarser rollup of it, derives from these partials. */
  /** Ensure the rewrite rule runs on `spark` even when the session was
    * not built with GraftExtensions (foreign driver sessions):
    * experimental.extraOptimizations is the runtime-injection arm of
    * the same extension point. Idempotent. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(MvRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewriteRule

  /** True while a summary is being (re)built on this thread: the
    * rewrite rule stands down so the build always reads the BASE —
    * otherwise a refresh of an already-registered MV would rewrite its
    * own build query to scan the summary it is overwriting. */
  private val building = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }
  private[plans] def isBuilding: Boolean = building.get()

  def materialize(spark: SparkSession, base: DataFrame,
                  groupCols: Seq[String], measureCols: Seq[String],
                  path: String): DataFrame = {
    install(spark)
    val aggs = count(lit(1)).as("n") +: measureCols.flatMap(m => Seq(
      sum(col(m)).as(s"sum_$m"), min(col(m)).as(s"min_$m"),
      max(col(m)).as(s"max_$m")))
    building.set(true)
    try base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(path)
    finally building.set(false)
    val mv = spark.read.parquet(path)
    val mvPlan = mv.queryExecution.analyzed
    val attrs = mvPlan.output.map(a => a.name -> a).toMap
    registry.put(path, MvDef(rootPaths(base), groupCols,
      measureCols.toSet, mvPlan, attrs))
    mv
  }

  /** INCREMENTAL REFRESH — fold a DELTA of newly-appended base rows
    * into the summary without rescanning the base: aggregate the delta
    * at MV grain, then merge partials (n and sums add; min/max take
    * min/max — valid because appends only ADD rows; a delete-bearing
    * refresh must re-materialize). This is the self-maintainable-view
    * algebra every summary column was chosen to satisfy, and the
    * reason a 100 TB base never needs a second full scan: refresh cost
    * is O(delta + |MV|). Pairs naturally with the GDX changefeed — each
    * micro-batch IS the delta (c16_mv_incremental_refresh runs exactly
    * that topology). The registration must already exist (refresh
    * refreshes; it does not define); it is re-pointed at the new
    * summary files atomically at the end. */
  def refreshIncremental(spark: SparkSession, delta: DataFrame,
                         path: String): DataFrame = {
    val d = Option(registry.get(path)).getOrElse(throw
      new IllegalStateException(s"mv refresh: $path is not registered"))
    install(spark)
    building.set(true)
    try {
      val deltaAggs = count(lit(1)).as("n") +: d.measureCols.toSeq.sorted
        .flatMap(m => Seq(sum(col(m)).as(s"sum_$m"),
          min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m")))
      val deltaSum = delta.groupBy(d.groupCols.map(col): _*)
        .agg(deltaAggs.head, deltaAggs.tail: _*)
      val mergeAggs = sum(col("n")).as("n") +: d.measureCols.toSeq.sorted
        .flatMap(m => Seq(sum(col(s"sum_$m")).as(s"sum_$m"),
          min(col(s"min_$m")).as(s"min_$m"),
          max(col(s"max_$m")).as(s"max_$m")))
      val merged = spark.read.parquet(path).unionByName(deltaSum)
        .groupBy(d.groupCols.map(col): _*)
        .agg(mergeAggs.head, mergeAggs.tail: _*)
        // pin rows BEFORE overwriting the files they were read from
        .localCheckpoint()
      merged.write.mode("overwrite").parquet(path)
    } finally building.set(false)
    val mv = spark.read.parquet(path)
    val mvPlan = mv.queryExecution.analyzed
    registry.put(path, d.copy(mvPlan = mvPlan,
      mvAttr = mvPlan.output.map(a => a.name -> a).toMap))
    mv
  }

  /** Identity of a relation for base-table matching: file-source root
    * paths (v1), or the table name for DSv2 relations — GDX tables
    * embed their directory in `name()`, so a GDX base is matched the
    * same way a parquet one is. Empty for anything else (never
    * matches). */
  private[graft] def relationIdentity(plan: LogicalPlan): Set[String] =
    plan match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString).toSet
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation => Set(r.table.name)
      case s: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => Set(s.relation.table.name)
      case _ => Set.empty
    }

  private def rootPaths(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collectLeaves()
      .flatMap(relationIdentity).toSet

  private[plans] def defs: Seq[MvDef] = {
    import scala.jdk.CollectionConverters._
    registry.values.asScala.toSeq
  }
}

object MvRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val defs = MvRewrite.defs
    if (defs.isEmpty || MvRewrite.isBuilding) plan
    else plan.transformDown {
      case agg: Aggregate =>
        // among matching summaries prefer the COARSEST (fewest grouping
        // columns = fewest rows to scan); tie-break on grouping names
        // so plan choice is deterministic under concurrent registration
        defs.sortBy(d => (d.groupCols.size, d.groupCols.mkString(",")))
          .view.flatMap(d => tryRewrite(agg, d))
          .headOption.getOrElse(agg)
    }
  }

  /** The relation a candidate Aggregate reads — looking through a pure
    * column-selection Project (what column pruning leaves behind) and
    * at most one deterministic Filter, whose condition is returned for
    * dimension-level compensation. */
  private def baseRelation(child: LogicalPlan)
      : Option[(Set[String], Option[Expression])] = {
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case Project(pl, r) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        strip(r)
      case r => r
    }
    val (inner, cond) = strip(child) match {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.deterministic =>
        (strip(f.child), Some(f.condition))
      case r => (r, None)
    }
    val id = MvRewrite.relationIdentity(inner)
    if (id.isEmpty) None else Some((id, cond))
  }

  private def tryRewrite(agg: Aggregate,
                         d: MvRewrite.MvDef): Option[LogicalPlan] = {
    val (paths, filterCond) = baseRelation(agg.child).getOrElse(return None)
    if (paths != d.basePaths || paths.isEmpty) return None
    // a filter commutes with the MV's grouping ONLY when it touches
    // nothing but grouping columns (then every base row of an MV cell
    // passes or fails together) — anything else leaves the plan alone
    if (filterCond.exists(_.references.exists(a =>
        !d.groupCols.contains(a.name)))) return None
    // grouping: bare base columns, all covered by the MV's grain
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference if d.groupCols.contains(a.name) => a.name
      case _ => return None
    }
    val exact = groupNames.toSet == d.groupCols.toSet

    // per output expression, the MV-side replacement (exact grain) or
    // compensating aggregate (rollup grain)
    def mv(c: String): Attribute = d.mvAttr(c)
    def aggExpr(f: org.apache.spark.sql.catalyst.expressions.aggregate
        .AggregateFunction): Expression =
      AggregateExpression(f, Complete, isDistinct = false)
    def fnRepl(fn: org.apache.spark.sql.catalyst.expressions.aggregate
        .AggregateFunction): Option[Expression] = fn match {
      case Count(Seq(Literal(1, _))) =>
        Some(if (exact) mv("n") else aggExpr(Sum(mv("n"))))
      case Sum(a: AttributeReference, _)
          if d.measureCols.contains(a.name) =>
        Some(if (exact) mv(s"sum_${a.name}")
             else aggExpr(Sum(mv(s"sum_${a.name}"))))
      case Min(a: AttributeReference)
          if d.measureCols.contains(a.name) =>
        Some(if (exact) mv(s"min_${a.name}")
             else aggExpr(Min(mv(s"min_${a.name}"))))
      case Max(a: AttributeReference)
          if d.measureCols.contains(a.name) =>
        Some(if (exact) mv(s"max_${a.name}")
             else aggExpr(Max(mv(s"max_${a.name}"))))
      case Average(a: AttributeReference, _)
          if d.measureCols.contains(a.name) =>
        // avg decomposes: Σsum / Σn (exact grain: sum/n) — the
        // partial-aggregate recomposition sum-of-sums over
        // sum-of-counts, NOT avg-of-avgs
        val (s, n) =
          if (exact) (mv(s"sum_${a.name}"): Expression,
            mv("n"): Expression)
          else (aggExpr(Sum(mv(s"sum_${a.name}"))),
            aggExpr(Sum(mv("n"))))
        Some(Divide(Cast(s, DoubleType), Cast(n, DoubleType)))
      case _ => None
    }
    // The optimizer collapses later projections INTO the aggregate
    // list (CollapseProject), so real-world shapes are expression
    // TREES over aggregates — round(avg(x), 6), sum(x)/count, literal
    // claim columns. Rewrite recursively: every AggregateExpression
    // node maps through the compensation algebra, every bare grouping
    // attribute re-anchors onto the summary, everything else (round,
    // arithmetic, literals) carries over node-for-node; any leaf the
    // algebra cannot express aborts the whole rewrite.
    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case AggregateExpression(fn, Complete, false, None, _) => fnRepl(fn)
      // count(DISTINCT dim) over a GROUPING column: each distinct
      // (grain, dim) pair is exactly one MV row, so at a coarser grain
      // the distinct count is a plain count of the summary's non-null
      // dim cells — the one DISTINCT the summary CAN answer
      case AggregateExpression(Count(Seq(a: AttributeReference)),
          Complete, true, None, _)
          if !exact && d.groupCols.contains(a.name) &&
            !groupNames.contains(a.name) =>
        Some(aggExpr(Count(Seq(mv(a.name)))))
      case _: AggregateExpression => None // other DISTINCT / FILTER
      case a: AttributeReference =>
        if (groupNames.contains(a.name)) Some(mv(a.name)) else None
      case other =>
        val cs = other.children.map(rewriteExpr)
        if (cs.exists(_.isEmpty)) None
        else Some(other.withNewChildren(cs.map(_.get)))
    }
    val rewritten: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case al @ Alias(childE, name) =>
        rewriteExpr(childE) match {
          case Some(e) => Alias(e, name)(exprId = al.exprId)
          case None    => return None
        }
      case a: AttributeReference =>
        rewriteExpr(a) match {
          case Some(e) => Alias(e, a.name)(exprId = a.exprId)
          case None    => return None
        }
      case _ => return None
    }

    // dimension filter compensation: re-anchor the condition's
    // attributes onto the summary's grouping columns and filter the MV
    // rows before (re-)projection — same cells survive as base-side
    val child: LogicalPlan = filterCond match {
      case Some(c) =>
        org.apache.spark.sql.catalyst.plans.logical.Filter(
          c.transform { case a: AttributeReference => mv(a.name) },
          d.mvPlan)
      case None => d.mvPlan
    }
    if (exact) Some(Project(rewritten, child))
    else Some(Aggregate(groupNames.map(mv), rewritten, child))
  }
}
