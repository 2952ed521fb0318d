package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed `new Column(expr)` / `Column.expr` from the public API;
  * the sanctioned converters live in the `private[sql]`
  * `org.apache.spark.sql.classic.ExpressionUtils`. This shim (compiled inside
  * the org.apache.spark.sql package, the standard pattern for Spark
  * extensions) re-exports just the two converters the engine needs.
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
}
