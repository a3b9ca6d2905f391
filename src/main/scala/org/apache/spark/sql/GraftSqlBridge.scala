package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so
  * graft can wrap native Catalyst expressions (e.g.
  * `graft.functions.DotProduct`) as public `Column`s. Spark 4 hid the
  * old `Column(expr)`/`col.expr` behind the classic module; this is
  * the supported in-package access pattern for libraries extending
  * Catalyst.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (for testing logical Rules
    * outside a SparkSessionExtensions-built session).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
