package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin

/** Completeness/soundness of the grid-bucketed within-distance join: the
  * 3×3-neighbor equi-join must reproduce the brute-force quadratic result
  * EXACTLY — any miss means the cell decomposition dropped a boundary
  * pair, any extra means double emission across cells.
  */
class SpatialJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteForce(pts: Seq[(Long, Long, Long)], r: Long) =
    (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).sorted

  test("grid join == brute force on random non-negative points") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(5000).toLong, rnd.nextInt(5000).toLong))
    val got = SpatialJoin
      .withinDistance(pts.toDF("id", "x", "y"), "id", "x", "y", 700L)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == bruteForce(pts, 700L))
    assert(got.nonEmpty) // the check must not pass vacuously
  }

  test("grid join == brute force with negative coordinates (floor-div cells)") {
    // negative coordinates are where a truncating cell division (toward
    // zero) silently merges cells -1 and 0 and drops cross-origin pairs
    val rnd = new scala.util.Random(11)
    val pts = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(5000) - 2500L, rnd.nextInt(5000) - 2500L))
    val got = SpatialJoin
      .withinDistance(pts.toDF("id", "x", "y"), "id", "x", "y", 700L)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == bruteForce(pts, 700L))
    assert(got.exists { case (_, _, d2) => d2 <= 700L * 700L })
  }

  test("boundary pairs at exactly distance r survive the cell cut") {
    // two points r apart on an axis land in non-adjacent... no: cells at
    // indices k and k+1 — adjacent — and the pair sits exactly on the
    // inclusive threshold; a `< r*r` or 2×2-neighbor bug drops it
    val pts = Seq((1L, 0L, 0L), (2L, 700L, 0L), (3L, 0L, 701L))
    val got = SpatialJoin
      .withinDistance(pts.toDF("id", "x", "y"), "id", "x", "y", 700L)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 2L, 490000L)))
  }
}
