package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column↔Expression converters —
  * the standard technique for third-party Catalyst expressions (the
  * public API intentionally hides Expression since Spark 4's ColumnNode
  * split). Nothing else from the private surface is touched. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
