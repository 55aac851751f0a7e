package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the value columns of
  * the LATEST right row with `rightTs <= leftTs` in the same key group;
  * left-join semantics (nulls when no prior right row exists).
  *
  * Spark has no as-of operator; this is the scalable composition
  * (preference (a) of the custom-operator ladder): tag and union both
  * sides, then one `last(..., ignoreNulls)` running window per key —
  * a single shuffle + sort on (key, time), no per-row range probing, no
  * broadcast requirement. At 100 TB this is one exchange over the
  * combined stream, the same cost shape as any keyed window.
  *
  * Requirement: the right side must be unique per (keys, rightTs) —
  * pre-aggregate it otherwise (ties would be resolved arbitrarily).
  */
object AsOfJoin {

  def asOfJoinLatest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    val leftOther = left.columns.filterNot(keys.contains).toSeq
    // Common layout: keys ++ __ts ++ __src ++ left payload ++ right values
    val lSide = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__src")) ++
        leftOther.map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rSide = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__src")) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col): _*)
    // Right rows sort BEFORE left rows at equal timestamps, so an exact-ts
    // match is visible to the left row (ASOF's inclusive `<=`).
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = valueCols.foldLeft(lSide.unionAll(rSide)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("__src") === 1)
      .drop("__ts", "__src")
  }
}
