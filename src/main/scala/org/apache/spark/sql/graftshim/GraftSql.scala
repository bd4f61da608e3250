package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface: wrapping a custom Catalyst
  * `Expression` into a public `Column` (and back) has no public API in
  * Spark 4's classic frontend — `ExpressionUtils.column` is the blessed
  * internal route (the built-in `functions` object uses the same path).
  * Nothing else internal leaks through here.
  */
object GraftSql {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
