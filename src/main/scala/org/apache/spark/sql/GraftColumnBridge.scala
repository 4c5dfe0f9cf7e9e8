package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst Expression bridge for graft's native expressions.
  * `classic.ExpressionUtils` is private[sql], so the conversion lives in
  * this package — the standard pattern Spark extension libraries use to
  * wrap custom codegen expressions as Columns without a function
  * registry round-trip.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
