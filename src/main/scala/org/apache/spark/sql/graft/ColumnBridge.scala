package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard pattern for libraries contributing native Catalyst expressions
  * (Spark offers no public constructor for a Column over a custom
  * Expression; the alternative, FunctionRegistry via
  * SparkSessionExtensions, requires owning session construction, which a
  * library embedded under a driver-owned SparkSession.builder cannot do).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
