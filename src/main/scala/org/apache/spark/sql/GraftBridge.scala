package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's `private[sql]` internals
  * (org.apache.spark.sql.classic): Column↔Expression converters — Spark 4
  * wraps Column around ColumnNode, so building a Column from a custom
  * Catalyst Expression requires them — and plan→DataFrame rebinding
  * (`Dataset.ofRows`), which lets a frame built against one session (the
  * scan-conf clone) be registered on another (the user's). Kept to
  * one-liners so the engine's only internal-API surface is this file.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
