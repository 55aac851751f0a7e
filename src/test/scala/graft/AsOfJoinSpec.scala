package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

/** As-of join semantics on literal data: latest-prior match, inclusive
  * equality, null when no prior right row, per-key isolation.
  */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks latest prior value, inclusive at equal ts") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")), // before any right -> null
      (2L, 100L, ts("2024-01-01 12:00:00")), // exact match at 12:00
      (3L, 100L, ts("2024-01-01 13:30:00")), // latest prior is 13:00
      (4L, 200L, ts("2024-01-01 23:00:00"))  // other key, own timeline
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, ts("2024-01-01 11:00:00"), 1.0),
      (100L, ts("2024-01-01 12:00:00"), 2.0),
      (100L, ts("2024-01-01 13:00:00"), 3.0),
      (200L, ts("2024-01-01 01:00:00"), 9.0)
    ).toDF("k", "rt", "v")
    val out = AsOfJoin
      .asOfJoinLatest(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(2.0))
    assert(out(3L).contains(3.0))
    assert(out(4L).contains(9.0))
  }

  test("forward as-of picks earliest at-or-after value, inclusive at equal ts") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")), // next is 11:00
      (2L, 100L, ts("2024-01-01 12:00:00")), // exact match at 12:00
      (3L, 100L, ts("2024-01-01 13:30:00")), // after all rights -> null
      (4L, 200L, ts("2024-01-01 00:30:00"))  // other key, own timeline
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, ts("2024-01-01 11:00:00"), 1.0),
      (100L, ts("2024-01-01 12:00:00"), 2.0),
      (100L, ts("2024-01-01 13:00:00"), 3.0),
      (200L, ts("2024-01-01 01:00:00"), 9.0)
    ).toDF("k", "rt", "v")
    val out = AsOfJoin
      .asOfJoinNext(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(1.0))
    assert(out(2L).contains(2.0))
    assert(out(3L).isEmpty)
    assert(out(4L).contains(9.0))
  }

  test("range join equals the naive theta-join on literal intervals") {
    import graft.operators.RangeJoin
    val points = Seq((1L, 5.0), (2L, 15.0), (3L, 25.0), (4L, -3.0))
      .toDF("id", "p")
    val intervals = Seq((10L, 0.0, 10.0), (20L, 14.0, 16.0), (30L, -100.0, 100.0))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin
      .pointInIntervalJoin(points, intervals, "p", "lo", "hi", bucketWidth = 7.0)
      .select($"id", $"iid").as[(Long, Long)].collect().toSet
    val want = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
      .select($"id", $"iid").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want == Set((1L, 10L), (1L, 30L), (2L, 20L), (2L, 30L),
      (3L, 30L), (4L, 30L)))
  }

  test("overlap join equals the naive theta-join, each pair exactly once") {
    import graft.operators.RangeJoin
    // intervals spanning multiple buckets (width 10) force the
    // overlap-start dedup to matter; key 'g' restricts the pairing
    val l = Seq((1L, "a", 0L, 25L), (2L, "a", 30L, 31L), (3L, "b", 0L, 100L))
      .toDF("lid", "g", "ls", "le")
    val r = Seq((10L, "a", 5L, 6L), (20L, "a", 24L, 40L), (30L, "b", 99L, 250L),
        (40L, "a", 26L, 29L))
      .toDF("rid", "g", "rs", "re")
    val got = RangeJoin
      .overlapJoin(l, r, Seq("g"), "ls", "le", "rs", "re", bucketWidth = 10L)
      .select($"lid", $"rid").as[(Long, Long)].collect().toList
    // a LIST, not a set: multi-bucket pairs must not be emitted twice
    assert(got.sorted == List((1L, 10L), (1L, 20L), (2L, 20L), (3L, 30L)))
    val naive = l.as("l").join(r.as("r"),
        $"l.g" === $"r.g" && $"ls" <= $"re" && $"rs" <= $"le")
      .select($"lid", $"rid").as[(Long, Long)].collect().toList
    assert(got.sorted == naive.sorted)
  }

  test("left rows are preserved 1:1") {
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:00"))).toDF("id", "k", "t")
    val right = Seq.empty[(Long, Timestamp, Double)].toDF("k", "rt", "v")
    val out = AsOfJoin.asOfJoinLatest(left, right, Seq("k"), "t", "rt", Seq("v"))
    assert(out.count() == 1)
    assert(out.select($"v").as[Option[Double]].head().isEmpty)
  }

  test("a genuinely-null right value is NOT back-filled from an older row") {
    // right rows for k=1: (t=1, v=10, w=1), (t=2, v=null, w=2); the left
    // row at t=3 must see the LATEST right row atomically — v=null, w=2 —
    // never v=10 stitched beside w=2 (a row state that never existed)
    val left = Seq((1L, ts("2024-01-01 00:03:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 00:01:00"), Some(10.0), 1L),
      (1L, ts("2024-01-01 00:02:00"), None, 2L)).toDF("k", "rt", "v", "w")
    val out = AsOfJoin
      .asOfJoinLatest(left, right, Seq("k"), "t", "rt", Seq("v", "w"))
      .select($"v", $"w").as[(Option[Double], Long)].head()
    assert(out == ((None, 2L)), s"stitched/back-filled row: $out")
  }

  test("value-column name collisions fail fast instead of erroring mid-plan") {
    val left = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 2.0)).toDF("k", "rt", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoinLatest(left, right, Seq("k"), "t", "rt", Seq("v"))
    }
  }
}
