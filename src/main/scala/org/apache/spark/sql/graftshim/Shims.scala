package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Accessor shim for `private[sql]` Column↔Expression conversion in
  * Spark 4 (the public constructor went away with the sql-api split).
  * Lives in a nested package of org.apache.spark.sql so the qualifier
  * admits it; the one sanctioned hole between the engine's package and
  * Spark internals. */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
