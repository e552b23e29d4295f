package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` constructors for the graft library's
  * custom logical plans (standard extension-library technique — the
  * public API offers no way to build a DataFrame from a custom
  * LogicalPlan node).
  */
object GraftSqlApi {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → catalyst Expression (Spark 4 removed the public `.expr`). */
  def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Expression → Column (inverse bridge, same rationale). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
