package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge.
  *
  * Spark 4 decoupled the public Column API from catalyst;
  * `classic.ExpressionUtils` does exactly this conversion but is
  * `private[sql]`, so this one-file shim lives under the sql package to
  * re-export the two calls. It is the ONLY code in the repo outside the
  * `graft` namespace, exists solely so [[graft.functions]]' native
  * expressions can surface as Columns, and contains no logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
