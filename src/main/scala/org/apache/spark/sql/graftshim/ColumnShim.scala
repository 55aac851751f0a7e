package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters (Spark 4
  * moved `Column` onto ColumnNode; custom Catalyst expressions need this
  * hop). Lives under `org.apache.spark.sql` solely for access — the usual
  * pattern for Spark extension libraries.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
