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
      valueCols: Seq[String]): DataFrame =
    directional(left, right, keys, leftTs, rightTs, valueCols,
      forward = false)

  /** Forward as-of — for each left row, the value columns of the EARLIEST
    * right row with `rightTs >= leftTs` in the same key group (the
    * "next event after" probe: recovery after an error, next restock
    * after a stockout). Identical single-shuffle shape to
    * [[asOfJoinLatest]] — the running pick just scans time DESCENDING, so
    * the `last(ignoreNulls)` seen at a left row is the nearest FUTURE
    * right row; inclusive at equal timestamps.
    */
  def asOfJoinNext(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame =
    directional(left, right, keys, leftTs, rightTs, valueCols,
      forward = true)

  private def directional(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      forward: Boolean): DataFrame = {
    val leftOther = left.columns.filterNot(keys.contains).toSeq
    // fail fast on ambiguity the output could not represent anyway
    val collisions = valueCols.toSet.intersect(leftOther.toSet ++ keys)
    require(collisions.isEmpty,
      s"AsOfJoin: value column(s) ${collisions.mkString(", ")} collide " +
        "with left-side columns; rename one side before joining")
    val internal = Set("__ts", "__src", "__vals")
    require(!(left.columns ++ right.columns).exists(internal.contains),
      "AsOfJoin: inputs must not carry reserved columns __ts/__src/__vals")
    // The right row's value columns travel as ONE nullable struct: the
    // running `last(ignoreNulls)` then picks the latest right ROW
    // atomically — a right-side value that is GENUINELY null stays null
    // (per-column ignoreNulls would back-fill it from an older row, and
    // with several value columns could even stitch together a row state
    // that never existed).
    val valStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)))
    val lSide = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__src")) ++
        leftOther.map(col) :+
        lit(null).cast(valStructType).as("__vals"): _*)
    val rSide = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__src")) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col): _*).as("__vals"): _*)
    // Right rows sort BEFORE left rows at equal timestamps (in the chosen
    // scan direction), so an exact-ts match is visible to the left row
    // (ASOF's inclusive bound in either direction).
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(if (forward) col("__ts").desc else col("__ts").asc,
        col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    lSide.unionAll(rSide)
      .withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(
        keys.map(col) ++ leftOther.map(col) ++
          valueCols.map(c => col("__vals").getField(c).as(c)): _*)
  }
}
