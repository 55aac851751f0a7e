package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions

/** Multi-dimensional data CLUSTERING at write time — the layout lever that
  * makes 100 TB scans cheap on MORE than one predicate column. A plain
  * `sortBy(a)` write gives parquet tight min/max stats on `a` only: a
  * range predicate on `b` decodes every file. Z-ordering sorts by the
  * bit-interleaved (Morton) value of all clustering columns, so every
  * dimension stays locally clustered and the reader's row-group stats
  * prune range predicates on ANY of them. (The reference generates data in
  * memory and has no layout tier at all — SURVEY §2.3 "file formats:
  * none"; this is part of the Spark-native storage discipline, alongside
  * the bucketed join tables and the date-partitioned events.)
  *
  * Scale shape: the only non-scan work is one tiny min/max aggregate per
  * clustering column (layout-time METADATA, same host-side discipline as
  * the IVF centroids) and one range exchange on the z-value; the write
  * itself is the same parquet write the data was paying anyway —
  * clustering is paid ONCE at write, every later scan collects the rent.
  */
object Layout {

  /** `df` plus a `__z` column: the Morton interleave of each clustering
    * column rank-scaled into `bits` bits by its own [min, max] (computed
    * here — one metadata-sized aggregate). Constant columns scale to 0.
    * `bits` is clamped so the interleave fits a long for any supported
    * column count (2–4): the default 16 bits would otherwise overflow at
    * 4 columns (16·4 = 64 > 63) and fail at plan construction; clustering
    * resolution degrades gracefully instead (15 bits/dim at 4 columns).
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    val effBits = math.min(bits, 63 / math.max(1, cols.size))
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"min_$c"),
      max(col(c).cast("double")).as(s"max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val maxV = (1L << effBits) - 1
    val scaled = cols.map { c =>
      val lo = stats.getAs[Double](s"min_$c")
      val hi = stats.getAs[Double](s"max_$c")
      if (hi == lo) lit(0L)
      else ((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(maxV.toDouble))
        .cast("long")
    }
    df.withColumn("__z", NativeExpressions.interleave_bits(scaled, effBits))
  }

  /** Write `df` parquet at `path`, clustered on `cols` via the z-value:
    * range-partitioned into `files` output files and sorted within each,
    * so every file's min/max stats are tight on EVERY clustering column.
    */
  def writeZOrdered(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      files: Int = 16,
      bits: Int = 16): Unit =
    withZValue(df, cols, bits)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
