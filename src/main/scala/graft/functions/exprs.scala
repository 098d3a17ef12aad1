package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.bridge

/** Spark 4 bridge between `Column` and Catalyst `Expression` (the
  * pre-4.0 `new Column(expr)` / `col.expr` shortcuts moved behind
  * `private[sql]` utilities — see org.apache.spark.sql.graftbridge).
  */
private[graft] object exprs {
  def toColumn(e: Expression): Column = bridge.toColumn(e)
  def toExpr(c: Column): Expression = bridge.toExpr(c)
}
