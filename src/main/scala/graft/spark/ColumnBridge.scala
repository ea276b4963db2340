package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column ↔ catalyst-Expression
  * conversion (Spark 4 wraps Columns in ColumnNodes; `classic.
  * ExpressionUtils` is the supported internal converter). Lets the engine
  * use its native expressions ([[graft.functions.H60]] etc.) as plain
  * `Column`s without registering SQL functions first.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
