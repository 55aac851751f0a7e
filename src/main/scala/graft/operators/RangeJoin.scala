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

  /** Symmetric interval-OVERLAP join — pairs of left/right rows whose
    * `[start, end]` integer intervals overlap (touching counts), with an
    * optional equi-key restriction (`keys`) — the co-presence join behind
    * concurrency billing, contention analysis, and contact tracing, and
    * the symmetric sibling of [[pointInIntervalJoin]].
    *
    * Mechanics: each side explodes onto the fixed-width buckets its
    * interval covers, candidates meet on `keys :+ bucket` (a hash
    * equi-join — never a per-key cross product), the exact overlap
    * predicate filters bucket collisions, and a pair is kept ONLY in the
    * bucket holding its overlap start (`greatest(lStart, rStart) div
    * width` — the standard dedup that avoids a distinct shuffle over
    * multi-bucket pairs; floor commutes with max, so that bucket is
    * shared by both sides by construction). Column names must be
    * disjoint across sides apart from `keys`.
    *
    * Scale shape: map-side expansion is interval_len/bucketWidth per row
    * (choose `bucketWidth` ≈ the typical interval length); one hash
    * shuffle; the `keys` columns partition-prune both sides.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "overlapJoin: bucketWidth must be positive")
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "overlapJoin: inputs must not carry a reserved __bucket column")
    def banded(df: DataFrame, s: String, e: String) =
      df.withColumn("__bucket",
        explode(sequence(expr(s"$s div ${bucketWidth}L"),
          expr(s"$e div ${bucketWidth}L"))))
    banded(left, lStart, lEnd)
      .join(banded(right, rStart, rEnd), keys :+ "__bucket")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bucket") ===
          expr(s"greatest($lStart, $rStart) div ${bucketWidth}L"))
      .drop("__bucket")
  }
}
