package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils). Needed because the engine
  * builds custom Catalyst expressions (StaticInvoke bindings, SURVEY §7.3) and
  * Spark 4 removed the public `new Column(expr)` constructor.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
