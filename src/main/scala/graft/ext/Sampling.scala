package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split operators for training-data pipelines:
  * reproducible across runs and engines (no RNG state), stable under
  * repartitioning — the property `df.sample()` lacks — because membership
  * is a pure function of the row's key.
  */
object Sampling {

  /** Keep rows whose key ≡ residue (mod m) — the simplest cross-engine-
    * reproducible sample (any SQL engine can replicate it).
    */
  def modSample(df: DataFrame, keyCol: String, m: Int, residue: Int = 0): DataFrame =
    df.filter(pmod(col(keyCol), lit(m)) === residue)

  /** Keep a `fraction` of rows by seeded key hash — uniform, deterministic,
    * and independent of partitioning; the standard held-out-split primitive.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double, seed: Int = 42): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    val buckets = 1000000L
    df.filter(pmod(xxhash64(col(keyCol), lit(seed)), lit(buckets)) <
      lit((fraction * buckets).toLong))
  }

  /** Per-stratum hash sample: an independent `fraction` within every value
    * of `stratumCol` (e.g. balance languages in a training mix).
    */
  def stratifiedHashSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      fraction: Double,
      seed: Int = 42): DataFrame = {
    val buckets = 1000000L
    df.filter(pmod(xxhash64(col(keyCol), col(stratumCol), lit(seed)), lit(buckets)) <
      lit((fraction * buckets).toLong))
  }

  /** [[stratifiedHashSample]] on the engine-portable md5 hash. The hash
    * input is LENGTH-PREFIX framed — `len(s) ':' s '|' len(k) ':' k` — so
    * no (stratum, key) pair can collide with another by sliding content
    * across a separator (a bare "s:k" concat makes ("a:b","c") and
    * ("a","b:c") identical). Null stratum or key null-propagates through
    * `concat` and is EXCLUDED from the sample in every engine alike (the
    * old `concat_ws` silently dropped the null field on the Spark side
    * only, diverging from a `||`-based oracle). Any SQL engine reproduces
    * the per-stratum sample bit-for-bit — the property that lets a DuckDB
    * oracle check the sampled SET itself, and lets a training mix survive
    * an engine migration.
    */
  def stratifiedPortableSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    val s = col(stratumCol).cast("string")
    val k = col(keyCol).cast("string")
    val framed = concat(
      length(s).cast("string"), lit(":"), s, lit("|"),
      length(k).cast("string"), lit(":"), k)
    val h = pmod(
      conv(substring(md5(framed), 1, 12), 16, 10).cast("long"),
      lit(SplitBuckets))
    df.filter(h < (fraction * SplitBuckets).toLong)
  }

  /** Disjoint train/validation/test assignment by key hash; returns the
    * input plus a `split` column ("train" | "val" | "test").
    */
  def assignSplits(
      df: DataFrame,
      keyCol: String,
      valFraction: Double,
      testFraction: Double,
      seed: Int = 42): DataFrame =
    splitFromBucket(df, pmod(xxhash64(col(keyCol), lit(seed)), lit(SplitBuckets)),
      valFraction, testFraction)

  /** [[assignSplits]] on an engine-portable hash: the first 12 hex chars of
    * `md5(cast(key as string))` as an integer. Any SQL engine (DuckDB,
    * Trino, Postgres) reproduces the assignment bit-for-bit, so held-out
    * splits survive an engine migration — xxhash64 is Spark-only.
    */
  def assignSplitsPortable(
      df: DataFrame,
      keyCol: String,
      valFraction: Double,
      testFraction: Double): DataFrame = {
    val h = pmod(
      conv(substring(md5(col(keyCol).cast("string")), 1, 12), 16, 10).cast("long"),
      lit(SplitBuckets))
    splitFromBucket(df, h, valFraction, testFraction)
  }

  private val SplitBuckets = 1000000L

  private def splitFromBucket(
      df: DataFrame,
      h: Column,
      valFraction: Double,
      testFraction: Double): DataFrame =
    df.withColumn(
      "split",
      when(h < (valFraction * SplitBuckets).toLong, lit("val"))
        .when(h < ((valFraction + testFraction) * SplitBuckets).toLong, lit("test"))
        .otherwise(lit("train")))
}
