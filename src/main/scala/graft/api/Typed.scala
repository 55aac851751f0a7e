package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

import graft.sources.Tables

/** Typed `Dataset[T]` bindings for the testdata star schema — the
  * type-safe entry tier of the library (SURVEY §4.3: DataFrame for dynamic
  * schemas, `Dataset[T]` where compile-time row types help).
  *
  * Encoders are derived from the case classes; plans are identical to the
  * DataFrame tier (same Catalyst logical plans, same pushdown/pruning), so
  * choosing the typed API costs nothing at execution time as long as
  * transformations stay in Column expressions. Typed lambdas
  * (`map`/`filter` on objects) are the exception — they opaque-box the
  * row and defeat pushdown, which is why the helpers below stay
  * expression-based and only the aggregation seam (`Aggregator`) crosses
  * into JVM objects, exactly like the reference's `aggregator_fn_t`
  * callback (`dpu/shared/kernels/aggr.h`).
  */
object Typed {

  final case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: Timestamp)

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  final case class Customer(
      c_custkey: Long, c_name: String, c_nationkey: Int, c_acctbal: Double,
      c_mktsegment: String)

  final case class Document(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
      value: Double, props: String)

  def lineitem(spark: SparkSession, sfDir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir).as[Lineitem]
  }

  def orders(spark: SparkSession, sfDir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, sfDir).as[Order]
  }

  def customer(spark: SparkSession, sfDir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables.customer(spark, sfDir).as[Customer]
  }

  def documents(spark: SparkSession, sfDir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).as[Document]
  }

  def embeddings(spark: SparkSession, sfDir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir).as[Embedding]
  }

  def events(spark: SparkSession, sfDir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, sfDir).as[Event]
  }

  /** Typed revenue aggregator — sums `extendedprice · (1 − discount)` over
    * line items; buffer and merge semantics identical to partial/final SUM.
    */
  object Revenue extends Aggregator[Lineitem, Double, Double] {
    override def zero: Double = 0.0
    override def reduce(acc: Double, li: Lineitem): Double =
      acc + li.l_extendedprice * (1.0 - li.l_discount)
    override def merge(a: Double, b: Double): Double = a + b
    override def finish(acc: Double): Double = acc
    override def bufferEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
    override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  /** Typed per-flag revenue: `groupByKey` on a field accessor +
    * the [[Revenue]] aggregator — shuffle and partial aggregation behave
    * exactly as the untyped `groupBy(col).agg(sum(...))` twin.
    */
  def revenueByFlag(li: Dataset[Lineitem]): Dataset[(String, Double)] = {
    import li.sparkSession.implicits._
    li.groupByKey(_.l_returnflag).agg(Revenue.toColumn.name("revenue"))
  }

  /** Typed COGROUP reconciliation (the `KeyValueGroupedDataset` batch
    * seam): per order key, fold the lineitem iterator in one streaming
    * pass (count + integer-cents total; per-key memory O(1) — only the
    * ≤1 order row is buffered) and emit
    * `(status, n_lines, line_cents, empty_flag)`. Line groups with NO
    * parent order emit an `ORPHAN` marker — the case a relational LEFT
    * JOIN from orders silently drops (it needs a second anti-join pass);
    * the fixture's FK guarantees none, so the catalog row's oracle stays
    * exact, and the orphan branch is pinned by `TypedApiSpec` on a
    * synthetic feed instead. Scale: one co-partitioned shuffle per side,
    * the same exchanges a join would pay; the lambda opaque-boxes rows
    * (no codegen/pushdown past the scan), which is why cogroup is
    * reserved for per-key logic SQL cannot state.
    */
  def reconcileOrders(
      orders: Dataset[Order],
      lines: Dataset[Lineitem]): Dataset[(String, Long, Long, Long)] = {
    import orders.sparkSession.implicits._
    orders.groupByKey(_.o_orderkey)
      .cogroup(lines.groupByKey(_.l_orderkey)) { (_, os, ls) =>
        var n = 0L
        var cents = 0L
        ls.foreach { l =>
          n += 1L
          cents += math.round(l.l_extendedprice * 100.0)
        }
        val ords = os.toList // ≤ 1 per PK
        if (ords.isEmpty) Iterator(("ORPHAN", n, cents, 0L))
        else ords.iterator.map(o =>
          (o.o_orderstatus, n, cents, if (n == 0L) 1L else 0L))
      }
  }
}
