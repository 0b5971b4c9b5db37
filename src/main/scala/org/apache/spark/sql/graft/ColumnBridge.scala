package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters — the
  * standard extension-library pattern for exposing custom Catalyst
  * expressions through the public Column API (Spark 4 moved these behind
  * ExpressionUtils in org.apache.spark.sql.classic). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register an expression constructor as a SQL temp function. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Wrap a (resolved) custom logical plan as a DataFrame, and the
    * analyzed plan behind a DataFrame — the `private[sql]` halves of
    * building whole-operator extensions (custom LogicalPlan + Strategy). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** A sibling session on `base`'s SparkContext + SharedState with its
    * own extensions — the only way to activate ANALYZER extension
    * points (post-hoc resolution rules have no runtime-injection arm
    * like experimental.extraOptimizations) when the primary session was
    * built without them: extensions bind at session construction.
    * Catalog/temp-view state is shared via SharedState; conf starts
    * from the context defaults. */
  def sessionWithExtensions(base: SparkSession,
      f: org.apache.spark.sql.SparkSessionExtensions => Unit)
      : SparkSession =
    org.apache.spark.sql.classic.GraftSessionBridge.withExtensions(base, f)
}
