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
    val typed = Typed.revenueByFlag(Typed.lineitem(spark, sf0001))
      .collect().map { case (k, v) => k -> math.round(v * 100) / 100.0 }.toMap
    val untyped = Tables.lineitem(spark, sf0001)
      .groupBy($"l_returnflag")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("r"))
      .as[(String, Double)].collect().toMap
    assert(typed == untyped)
    assert(typed.size == 3)
  }
}
