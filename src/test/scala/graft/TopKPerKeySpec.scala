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
}
