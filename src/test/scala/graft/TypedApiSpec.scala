package graft

import org.apache.spark.sql.functions._

import graft.api.Typed
import graft.sources.Tables

/** Typed Dataset tier: case-class bindings load every table, and the typed
  * Aggregator path agrees with the untyped column-expression twin.
  */
class TypedApiSpec extends SparkTestBase {
  import spark.implicits._

  test("typed bindings load all six tables with full row counts") {
    assert(Typed.lineitem(spark, sf0001).count() ==
      Tables.lineitem(spark, sf0001).count())
    assert(Typed.orders(spark, sf0001).count() ==
      Tables.orders(spark, sf0001).count())
    assert(Typed.customer(spark, sf0001).count() ==
      Tables.customer(spark, sf0001).count())
    assert(Typed.documents(spark, sf0001).count() ==
      Tables.documents(spark, sf0001).count())
    assert(Typed.embeddings(spark, sf0001).count() ==
      Tables.embeddings(spark, sf0001).count())
    assert(Typed.events(spark, sf0001).count() ==
      Tables.events(spark, sf0001).count())
  }

  test("typed fields survive the encoder roundtrip") {
    val first = Typed.lineitem(spark, sf0001)
      .filter(col("l_orderkey") === 1L)  // Column filter: still pushed down
      .collect()
    assert(first.nonEmpty)
    assert(first.forall(_.l_orderkey == 1L))
    assert(first.forall(li => li.l_quantity > 0 && li.l_returnflag.nonEmpty))
  }

  test("typed Revenue aggregator equals untyped sum(price * (1 - discount))") {
    // compare UNROUNDED values with a relative tolerance: the typed
    // aggregator and the SQL sum fold in different orders (last-ulp
    // drift), and rounding each side with a different algorithm
    // (math.round vs Spark's decimal-string HALF_UP) turns that drift
    // into a spurious exact-equality failure at .xx5 boundaries
    val typed = Typed.revenueByFlag(Typed.lineitem(spark, sf0001))
      .collect().toMap
    val untyped = Tables.lineitem(spark, sf0001)
      .groupBy($"l_returnflag")
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("r"))
      .as[(String, Double)].collect().toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - untyped(k)) <= 1e-9 * math.max(1.0, math.abs(v)),
        s"flag $k: typed $v vs untyped ${untyped(k)}")
    }
    assert(typed.size == 3)
  }

  test("cogroup reconciliation: streamed fold, empty orders, ORPHAN lines") {
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    def order(k: Long, st: String) =
      Typed.Order(k, 1L, st, 100.0, ts, "1-URGENT")
    def line(k: Long, price: Double) =
      Typed.Lineitem(k, 1L, 1L, 1, 1.0, price, 0.0, 0.0, "N", "O", ts)
    val orders = Seq(order(1L, "O"), order(2L, "F")).toDS()
    // order 1: two lines; order 2: EMPTY; key 9: orphan lines, no order
    val lines = Seq(line(1L, 10.10), line(1L, 0.05), line(9L, 7.00)).toDS()
    val got = Typed.reconcileOrders(orders, lines).collect().toSet
    assert(got == Set(
      ("O", 2L, 1015L, 0L),      // 10.10 + 0.05 → 1015 cents
      ("F", 0L, 0L, 1L),         // empty order flagged
      ("ORPHAN", 1L, 700L, 0L)), // lines with no parent order surface
      s"unexpected reconciliation: $got")
  }
}
