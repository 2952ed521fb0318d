package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.ColumnBridge

/** Bridging helpers between the public `Column` API and Catalyst
  * `Expression`s (Spark 4 removed `Column.expr` / `new Column(expr)` from the
  * public surface; see [[org.apache.spark.sql.graft.ColumnBridge]]).
  */
package object functions {
  def toColumn(e: Expression): Column = ColumnBridge.toColumn(e)
  def toExpr(c: Column): Expression = ColumnBridge.toExpr(c)
}
