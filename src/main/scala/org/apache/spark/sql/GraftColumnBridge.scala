package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4's Column no longer wraps a Catalyst Expression directly; the
  * conversion helpers live in `classic.ExpressionUtils`, which is
  * private[sql]. This bridge re-exports just the two conversions the
  * engine's custom expressions need (public Spark API surface otherwise).
  */
object GraftColumnBridge {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
