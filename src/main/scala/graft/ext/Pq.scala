package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Product quantization (PQ) — the memory-bound ANN scale path: vectors
  * compress to `m` sub-space centroid codes (here m·log2(k) bits each),
  * and a query scans codes with an asymmetric-distance (ADC) lookup table
  * instead of touching raw floats.
  *
  * Scale shape: the codebook is METADATA (m·k·dsub doubles, trained on a
  * driver-side sample — the same discipline as [[IvfIndex]]'s coarse
  * quantizer) and ships to executors inside the task closure; encoding and
  * the ADC scan are one `mapPartitions` pass each, no shuffle anywhere
  * except the final top-k (`orderBy.limit` → per-partition heaps). At
  * 100 TB the 8-byte codes replace 256-byte vectors — a 32× scan-volume
  * reduction, which is the entire point of PQ.
  *
  * Training is deterministic: init = first k sample sub-vectors, fixed
  * Lloyd iterations, ties to the lower centroid index.
  */
object Pq {

  /** centroids(sub)(code) = centroid sub-vector of length dsub. */
  final case class Codebook(m: Int, dsub: Int, k: Int,
      centroids: Array[Array[Array[Double]]]) {
    def encode(v: Seq[Double]): Array[Byte] = {
      val code = new Array[Byte](m)
      var s = 0
      while (s < m) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var j = 0
          while (j < dsub) {
            val diff = v(s * dsub + j) - centroids(s)(c)(j)
            d += diff * diff
            j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        code(s) = best.toByte
        s += 1
      }
      code
    }

    /** ADC lookup table for `query`: table(sub)(code) = partial squared
      * distance from the query's sub-vector to that centroid.
      */
    def adcTable(query: Seq[Double]): Array[Array[Double]] =
      Array.tabulate(m, k) { (s, c) =>
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val diff = query(s * dsub + j) - centroids(s)(c)(j)
          d += diff * diff
          j += 1
        }
        d
      }
  }

  /** Deterministic per-subspace Lloyd's on a driver-side sample. */
  def train(
      df: DataFrame,
      vecCol: String,
      m: Int = 16,
      k: Int = 16,
      sampleN: Int = 2000,
      iters: Int = 10): Codebook = {
    val spark = df.sparkSession
    import spark.implicits._
    // deterministic sample: a bare limit() takes rows from whichever
    // partitions answer first (varies with layout/AQE), which would make
    // the codebook — and every downstream code — run-dependent. Hash-order
    // by vector content like IvfIndex.build hash-orders by id; duplicate
    // vectors tie, but identical content makes the choice immaterial.
    val sample = df.select(toDoubleArray(col(vecCol)).as("__v"))
      .orderBy(xxhash64(col("__v")), col("__v"))
      .limit(sampleN)
      .select("__v").as[Seq[Double]].collect()
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val centroids = Array.tabulate(m) { s =>
      val subs = sample.map(v => v.slice(s * dsub, (s + 1) * dsub).toArray)
      // content distinct (Array equality is by reference — a bare
      // subs.distinct is a no-op): duplicate seed centroids would freeze
      // (ties go to the lower index, the twin never receives points) and
      // silently shrink the effective codebook
      var cents = subs.map(_.toSeq).distinct.map(_.toArray).take(k)
      // pad degenerate samples by repeating (k-means still converges)
      while (cents.length < k) cents = cents ++ cents.take(k - cents.length)
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Int](k)
        subs.foreach { x =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0; var j = 0
            while (j < dsub) { val t = x(j) - cents(c)(j); d += t * t; j += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < dsub) { sums(best)(j) += x(j); j += 1 }
        }
        cents = Array.tabulate(k) { c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(dsub)(j => sums(c)(j) / counts(c))
        }
        it += 1
      }
      cents
    }
    Codebook(m, dsub, k, centroids)
  }

  /** One-pass encode: (id, code) — the compressed index a real deployment
    * would persist. A native expression scan ([[graft.functions
    * .NativeExpressions.PqEncode]]): the nearest-centroid loops read the
    * columnar `ArrayData` in place, with none of the per-row
    * encoder/decoder round-trips a `Dataset.map` pays.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String, cb: Codebook): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      graft.functions.NativeExpressions
        .pq_encode(toDoubleArray(col(vecCol)), cb.centroids).as("code"))

  /** ADC top-k: approximate squared-distance scan over the codes — a
    * table-lookup expression per row feeding `TakeOrderedAndProject`
    * (per-partition heaps, never a global sort).
    */
  def topK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      cb: Codebook): DataFrame =
    encode(df, idCol, vecCol, cb)
      .select(
        col("id"),
        graft.functions.NativeExpressions
          .pq_adc_dist(col("code"), cb.adcTable(query)).as("adc_dist"))
      .orderBy(col("adc_dist"), col("id"))
      .limit(k)
}
