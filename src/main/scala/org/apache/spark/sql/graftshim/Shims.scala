package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Accessor shim for `private[sql]` Column↔Expression conversion in
  * Spark 4 (the public constructor went away with the sql-api split).
  * Lives in a nested package of org.apache.spark.sql so the qualifier
  * admits it; the one sanctioned hole between the engine's package and
  * Spark internals. */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an analyzed [[LogicalPlan]] back into a DataFrame —
    * `Dataset.ofRows` went `private[sql]` with the classic/connect split. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Drain the async listener bus (`private[spark]`) — lets tests make
    * exact "this launched N Spark jobs" assertions without sleeps. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
