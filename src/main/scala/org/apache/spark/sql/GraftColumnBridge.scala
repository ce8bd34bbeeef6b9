package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column <-> Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils, Spark 4 columnNodeSupport).
  * Required to expose custom Catalyst expressions as user-facing Columns —
  * the standard extension-library technique since Spark 4 hid Column.expr.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
