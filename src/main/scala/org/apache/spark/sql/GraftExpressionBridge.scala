package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge to the Column <-> catalyst Expression converters, which are
 * `private[sql]` in Spark 4 (Column wraps a ColumnNode, not an
 * Expression, since the connect/classic split). Libraries that ship
 * custom catalyst expressions need exactly these two hooks; placing the
 * accessor inside `org.apache.spark.sql` is the established pattern for
 * that.
 */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
