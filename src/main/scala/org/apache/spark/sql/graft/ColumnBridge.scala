package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the sql-package-private Column↔Expression converters, for
  * exposing custom Catalyst expressions as user-facing Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column  = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a logical plan — the sql-package-private
    * `classic.Dataset.ofRows`, needed by the change-feed source to hand
    * the streaming engine a LogicalRelation MARKED isStreaming=true
    * (the FileStreamSource idiom; no public API constructs one). */
  def ofRows(s: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
