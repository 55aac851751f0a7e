package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — left points against right `[lo, hi]` intervals —
  * without a cross join: both sides are mapped onto fixed-width buckets
  * (the right side exploded over every bucket its interval covers), the
  * bucket index becomes an equi-join key, and the exact predicate filters
  * the bucket-collision candidates.
  *
  * Scale shape: one hash shuffle on the bucket index; candidate count is
  * |pairs sharing a bucket|, linear in data for bounded interval widths
  * (choose `bucketWidth` ≈ the typical interval width). The naive
  * formulation — a theta-join — degenerates to BroadcastNestedLoopJoin
  * and O(n·m) work; this stays an equi-join Catalyst can hash-partition.
  */
object RangeJoin {

  def pointInIntervalJoin(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    // same fail-fast as SkewJoin's __salt: never overwrite user data with
    // the internal bucket column
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "pointInIntervalJoin: inputs must not carry a reserved __bucket column")
    val lB = left.withColumn("__bucket", floor(col(pointCol) / bucketWidth).cast("long"))
    val rB = right.withColumn(
      "__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    lB.join(rB, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
