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
}
