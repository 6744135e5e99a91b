package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column<->Expression conversion behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this bridge exposes
  * the two conversions needed to register custom Catalyst expressions as
  * Columns (the documented extension pattern pre-4.0).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
