package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates — the Spark seam corresponding to the
  * reference's pluggable `aggregator_fn_t` callback + opaque state
  * (`dpu/shared/kernels/aggr.c:16`, `dpu/aggr/main.c:44-52`): `reduce` is
  * the per-tasklet accumulation, `merge` the cross-tasklet/cross-DPU
  * combine, `finish` the host-side finalization. Spark runs these
  * partial→final automatically at any partition count.
  */
object TypedAggregates {

  /** SUM over Long — the reference's only aggregator (`AggrSum`,
    * `shared/umq/kernels.h:22-25`), expressed through the generic seam to
    * prove the extension point (the built-in `sum` is preferred in plans).
    */
  object SumLong extends Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = b + a
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Numerically-stable mean+variance (Welford/Chan parallel merge) — a
    * new aggregate the reference cannot express, showing the seam carries
    * nontrivial state.
    */
  case class MomentsBuf(n: Long, mean: Double, m2: Double)

  object Moments extends Aggregator[Double, MomentsBuf, (Double, Double)] {
    def zero: MomentsBuf = MomentsBuf(0L, 0.0, 0.0)
    def reduce(b: MomentsBuf, x: Double): MomentsBuf = {
      val n = b.n + 1
      val d = x - b.mean
      val mean = b.mean + d / n
      MomentsBuf(n, mean, b.m2 + d * (x - mean))
    }
    def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        MomentsBuf(
          n,
          a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }
    def finish(r: MomentsBuf): (Double, Double) =
      (r.mean, if (r.n > 1) r.m2 / (r.n - 1) else 0.0)
    def bufferEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
    def outputEncoder: Encoder[(Double, Double)] = Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaDouble)
  }

  /** Misra–Gries heavy hitters: a bounded `k`-counter summary whose merge
    * is the standard pairwise-decrement combine. GUARANTEE (the property
    * tests assert): every item with true frequency > n/(k+1) is in the
    * output, and each reported count is an under-estimate by at most the
    * total decrement — the right tool for "which keys need salting"
    * diagnostics over 100 TB, where an exact group-by is itself the
    * problem being diagnosed.
    *
    * Estimated counts depend on partitioning (bounded error, not a fixed
    * value), so this surface is spec-verified rather than DuckDB-oracled.
    */
  class HeavyHitters(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0)
    def zero: Map[String, Long] = Map.empty

    private def offer(b: Map[String, Long], item: String, w: Long): Map[String, Long] =
      b.get(item) match {
        case Some(c) => b.updated(item, c + w)
        case None if b.size < k => b.updated(item, w)
        case None =>
          // decrement all by the smaller of w and the min counter; drop zeros
          val dec = math.min(w, b.values.min)
          val kept = b.collect { case (i, c) if c > dec => i -> (c - dec) }
          if (w > dec) kept.updated(item, w - dec) else kept
      }

    def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      offer(b, item, 1L)

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (acc, (item, w)) => offer(acc, item, w) }

    def finish(r: Map[String, Long]): Map[String, Long] = r
    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
  }
}
