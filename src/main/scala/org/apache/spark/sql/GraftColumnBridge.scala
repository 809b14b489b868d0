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

  /** Wrap a custom logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — how graft surfaces whole custom operators (e.g.
    * the native as-of join, plans.AsOfJoinPlan) through the public API. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
