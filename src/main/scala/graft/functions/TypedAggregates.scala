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

  /** A Greenwald–Khanna quantile summary as a FIRST-CLASS mergeable
    * STATE (completing the store-partials/merge-later family beside the
    * HLL daily roll-up and the incremental sum-merge): [[GkBuild]]
    * aggregates raw values into a serializable `GkState` — the
    * (value, g, delta) tuple array + count that IS the GK summary,
    * column-encoded so it can be WRITTEN TO PARQUET as a standing
    * artifact — and [[GkMergeQuery]] re-aggregates stored states by
    * GK-merging them and answering quantile queries. The engine is
    * Spark's own `QuantileSummaries` (what `percentile_approx` runs
    * internally), driven through the public insert/compress/merge/query
    * surface — the point of the row is the mergeability CONTRACT at the
    * storage boundary, not a new sketch.
    */
  case class GkState(
      values: Array[Double], gs: Array[Long], deltas: Array[Long],
      count: Long, relativeError: Double)

  object GkState {
    import org.apache.spark.sql.catalyst.util.QuantileSummaries

    def from(qs0: QuantileSummaries): GkState = {
      val qs = if (qs0.compressed) qs0 else qs0.compress()
      GkState(qs.sampled.map(_.value), qs.sampled.map(_.g),
        qs.sampled.map(_.delta), qs.count, qs.relativeError)
    }
    def toSummaries(s: GkState): QuantileSummaries = {
      val stats = Array.tabulate(s.values.length)(i =>
        QuantileSummaries.Stats(s.values(i), s.gs(i), s.deltas(i)))
      new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
        s.relativeError, stats, s.count, true)
    }
  }

  class GkBuild(relativeError: Double)
      extends Aggregator[Double,
        org.apache.spark.sql.catalyst.util.QuantileSummaries, GkState] {
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    private def comp(q: QuantileSummaries): QuantileSummaries =
      if (q.compressed) q else q.compress()
    def zero: QuantileSummaries = new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError)
    def reduce(b: QuantileSummaries, x: Double): QuantileSummaries =
      b.insert(x)
    def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      comp(a).merge(comp(b))
    def finish(r: QuantileSummaries): GkState = GkState.from(r)
    def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.kryo[QuantileSummaries]
    def outputEncoder: Encoder[GkState] = Encoders.product[GkState]
  }

  /** Re-aggregates STORED [[GkState]]s: GK-merge of the summaries, then
    * the quantile picks at `quantiles` — the roll-up leg that never
    * rescans raw data.
    */
  class GkMergeQuery(quantiles: Seq[Double])
      extends Aggregator[GkState,
        org.apache.spark.sql.catalyst.util.QuantileSummaries, Array[Double]] {
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    private def comp(q: QuantileSummaries): QuantileSummaries =
      if (q.compressed) q else q.compress()
    def zero: QuantileSummaries = new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold,
      QuantileSummaries.defaultRelativeError)
    def reduce(b: QuantileSummaries, s: GkState): QuantileSummaries =
      comp(b).merge(GkState.toSummaries(s))
    def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      comp(a).merge(comp(b))
    def finish(r: QuantileSummaries): Array[Double] =
      r.query(quantiles).map(_.toArray).getOrElse(Array.empty)
    def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.kryo[QuantileSummaries]
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }
}
