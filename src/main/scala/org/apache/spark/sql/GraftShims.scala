package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the package-private Column <-> Expression converters so graft
  * can expose custom Catalyst expressions as ordinary Columns (the classic
  * pre-4.x `new Column(expr)` constructor is no longer public).
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
