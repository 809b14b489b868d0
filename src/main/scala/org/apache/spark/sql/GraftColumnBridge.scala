package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters so graft's
  * custom Catalyst expressions (e.g. KmerGenerator) can surface as public
  * `Column`s — the standard pattern for libraries extending Spark SQL with
  * native expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
