package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made `classic.ExpressionUtils`
  * private[sql]; extension libraries conventionally expose the two
  * conversions from inside the package (public Spark jars only, no
  * behavior added). Used by graft's native expressions
  * (e.g. [[graft.expr.catalyst.NormalizeTs]]).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
