package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey
import graft.sources.Tables

/** The custom bounded-heap per-key top-k operator (tier-(c) Catalyst
  * integration: logical node + strategy + physical exec).
  */
class TopKPerKeySpec extends SparkTestBase {
  import spark.implicits._

  test("topKPerKey matches the window row_number formulation") {
    val li = Tables.lineitem(spark, sf0001)
    val ord = struct($"l_extendedprice", $"l_orderkey", $"l_partkey",
      $"l_suppkey", $"l_quantity", $"l_linenumber")
    val got = TopKPerKey
      .topKPerKey(li, Seq("l_returnflag"), ord, k = 5)
      .select($"l_returnflag", $"l_extendedprice", $"l_orderkey")
      .as[(String, Double, Long)].collect().toSet
    val w = Window.partitionBy($"l_returnflag").orderBy(
      $"l_extendedprice".desc, $"l_orderkey".desc, $"l_partkey".desc,
      $"l_suppkey".desc, $"l_quantity".desc, $"l_linenumber".desc)
    val want = li.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"l_returnflag", $"l_extendedprice", $"l_orderkey")
      .as[(String, Double, Long)].collect().toSet
    assert(got == want)
    assert(got.size == 15) // 3 flags x 5
  }

  test("smallest-k variant and k larger than group size") {
    val df = Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L)).toDF("k", "v")
    val bottom2 = TopKPerKey.topKPerKey(df, Seq("k"), $"v", 2, largest = false)
      .as[(String, Long)].collect().toSet
    assert(bottom2 == Set(("a", 1L), ("a", 2L), ("b", 9L)))
  }

  test("physical plan: partial heap before the exchange, final after, no sort") {
    val li = Tables.lineitem(spark, sf0001)
    val plan = TopKPerKey
      .topKPerKey(li, Seq("l_returnflag"), $"l_extendedprice", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan)
    // map-side combine: the shuffle reads the partial's output, so at most
    // k rows per key per input partition cross the exchange
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    val iExchange = plan.indexOf("Exchange")
    val iFinal = plan.indexOf("TopKPerKey ")
    assert(iFinal >= 0 && iExchange >= 0 && iPartial >= 0)
    assert(iFinal < iExchange && iExchange < iPartial,
      s"expected Final above Exchange above Partial:\n$plan")
    assert(!plan.contains("Sort"), s"unexpected sort:\n$plan")
  }

  test("null order values follow default SQL null ordering, no NPE") {
    val df = Seq(
      (1L, Some(5.0)), (1L, None), (1L, Some(3.0)), (1L, Some(9.0)),
      (2L, None), (2L, None), (2L, Some(1.0))).toDF("k", "v")
    // largest-k with DESC/NULLS LAST semantics: nulls never preferred
    val top = TopKPerKey.topKPerKey(df, Seq("k"), $"v", k = 2)
      .as[(Long, Option[Double])].collect().groupBy(_._1)
    assert(top(1L).map(_._2).toSet == Set(Some(9.0), Some(5.0)))
    // group 2 has one non-null: the second slot falls to a null
    assert(top(2L).map(_._2).toSet == Set(Some(1.0), None))
    // smallest-k (ASC/NULLS FIRST): nulls rank first and are kept
    val bottom = TopKPerKey.topKPerKey(df, Seq("k"), $"v", k = 2, largest = false)
      .as[(Long, Option[Double])].collect().groupBy(_._1)
    assert(bottom(1L).map(_._2).toSet == Set(None, Some(3.0)))
    assert(bottom(2L).map(_._2).count(_.isEmpty) == 2)
    // the window formulation agrees (same defaults)
    val w = Window.partitionBy($"k").orderBy($"v".desc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2).drop("rn")
      .as[(Long, Option[Double])].collect().groupBy(_._1)
    assert(viaWindow(1L).map(_._2).toSet == top(1L).map(_._2).toSet)
    assert(viaWindow(2L).map(_._2).toSet == top(2L).map(_._2).toSet)
  }

  test("nondeterministic order: exec initializes, rule declines the rewrite") {
    // direct API: rand() order must execute (per-partition initialize),
    // returning exactly k rows per key
    val df = spark.range(100).select((col("id") % 5).as("k"), col("id"))
    val out = TopKPerKey.topKPerKey(df, Seq("k"), rand(7), k = 3)
    assert(out.count() == 15)
    // the optimizer rule must NOT rewrite a rand() window (row_number over
    // a nondeterministic order re-evaluates it; leave stock semantics)
    val w = Window.partitionBy($"k").orderBy(rand(7))
    val plan = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("TopKPerKeyNode"), plan)
  }

  test("key columns resolve case-insensitively like every built-in API") {
    val df = Seq((1L, 2.0), (1L, 3.0), (2L, 4.0)).toDF("kk", "v")
    val out = TopKPerKey.topKPerKey(df, Seq("KK"), $"v", k = 1)
      .as[(Long, Double)].collect().toSet
    assert(out == Set((1L, 3.0), (2L, 4.0)))
  }

  test("STRING ordering values survive the heap: stored keys must not alias the scan buffer") {
    // regression: a UTF8String read off a reused UnsafeRow buffer and
    // stored in the heap un-copied mutates under later rows — every stored
    // key collapses to the same bytes and the heap silently orders by the
    // numeric tiebreaker instead (caught by q_balanced_sample's md5-order
    // window vs its DuckDB oracle; all-numeric orderings never hit it).
    // Exercised over a real parquet scan because an in-memory localRelation
    // does not reuse row buffers the way the columnar reader does.
    val docs = Tables.documents(spark, sf0001)
    val ord = struct(
      md5(concat(lit("bal|"), $"doc_id".cast("string"))).as("h"), $"doc_id")
    val got = TopKPerKey
      .topKPerKey(docs.select($"lang", $"doc_id"), Seq("lang"), ord,
        k = 60, largest = false)
      .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
    val w = Window.partitionBy($"lang")
      .orderBy(md5(concat(lit("bal|"), $"doc_id".cast("string"))), $"doc_id")
    val want = docs.select($"lang", $"doc_id")
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 60)
      .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
    assert(got == want)
  }
}
