package graft

import org.apache.spark.sql.functions._

import graft.operators.{PositionalTake, Relational}

/** Golden micro-cases ported from the reference's unit tests (SURVEY §5.1):
  * literal inputs, exact expected outputs.
  */
class GoldenSpec extends SparkTestBase {
  import spark.implicits._

  // `{0,2,3,8,9}` — host/filter/filter_test.cc:25, host/aggr/aggr_test.cc:25-28
  private def fiveValues = Seq(0L, 2L, 3L, 8L, 9L).toDF("v")

  test("filter keeps all five golden values under v < 2^30") {
    val out = Relational
      .filterCompact(fiveValues, col("v") < (1L << 30), Seq("v"))
      .as[Long].collect().sorted
    assert(out.toSeq == Seq(0L, 2L, 3L, 8L, 9L))
  }

  test("filter drops values at/above the threshold, preserving the rest") {
    // crafted batch in the spirit of filter_test.cc:33-48: survivors at
    // known positions
    val big = (1L << 30)
    val df = Seq(big + 1, 5L, big, 7L, big + 9, 11L).toDF("v")
    val out = Relational.filterCompact(df, col("v") < big, Seq("v"))
      .as[Long].collect().sorted
    assert(out.toSeq == Seq(5L, 7L, 11L))
  }

  test("sum of golden values is 22") {
    // host/aggr/aggr_test.cc:25-28
    val out = Relational.sumAgg(fiveValues, "v").as[Long].head()
    assert(out == 22L)
  }

  test("take values {0,2,3,8,9} at indices {0,1,4} yields {0,2,9}") {
    // host/take/take_test.cc:24-49; global-index semantics (FIXTURES §F2)
    val values = Seq((0L, 0L), (1L, 2L), (2L, 3L), (3L, 8L), (4L, 9L))
      .toDF("ord", "v")
    val indices = Seq(0L, 1L, 4L).toDF("idx")
    val out = PositionalTake
      .takeByPosition(values, Seq("ord"), Seq("v"), indices)
      .select("v").as[Long].collect().sorted
    assert(out.toSeq == Seq(0L, 2L, 9L))
  }

  test("pk-fk join: all left rows matched, right key dropped") {
    // 2x5-row golden join in the spirit of join_test.cc:44-64
    val right = Seq((0L, 100L), (1L, 101L), (2L, 102L), (3L, 103L), (4L, 104L))
      .toDF("pk", "x")
    val left = Seq((2L, 20L), (0L, 21L), (4L, 22L), (2L, 23L), (3L, 24L))
      .toDF("fk", "y")
    val out = Relational.pkFkJoin(left, right, "fk", "pk", broadcastRight = true)
    assert(out.columns.toSeq == Seq("fk", "y", "x"))
    assert(out.count() == left.count()) // PK-FK integrity: every fk matches
    val rows = out.as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((2L, 20L, 102L), (0L, 21L, 100L), (4L, 22L, 104L),
      (2L, 23L, 102L), (3L, 24L, 103L)))
  }

  test("driver smoke contract: entry() returns rows on a vanilla session") {
    // the driver calls entry(spark) with its own session (no extensions)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("global index is dense, 0-based, and follows the key order") {
    val df = Seq(30L, 10L, 50L, 20L, 40L).toDF("k")
    val out = PositionalTake.withGlobalIndex(df, Seq("k"))
      .select("idx", "k").orderBy("idx").as[(Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.map(_._2).toSeq == Seq(10L, 20L, 30L, 40L, 50L))
  }
}
