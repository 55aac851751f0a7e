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

/** Bridge to `classic.Dataset.ofRows` for building a DataFrame from a
  * custom logical plan node.
  */
object DatasetShim {
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Bridge to `private[sql] SparkSession.internalCreateDataFrame` for
  * operators that produce an `RDD[InternalRow]` directly (the
  * `mapPartitions`-as-last-resort tier, SURVEY §4.3 — e.g. the positional
  * merge gather, whose per-partition pointer state no Catalyst expression
  * can carry).
  */
object RddShim {
  def internalCreateDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
