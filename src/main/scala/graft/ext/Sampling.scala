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
    df.filter(portableBucket(md5(framed)) < (fraction * SplitBuckets).toLong)
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
      testFraction: Double): DataFrame =
    splitFromBucket(df, portableBucket(md5(col(keyCol).cast("string"))),
      valFraction, testFraction)

  /** Per-row acceptance by WEIGHT: keep a row with probability
    * `clamp(weight, 0, 1)`, decided by the portable per-key hash — the
    * importance-sampling primitive of a training mix (upweight curated /
    * high-quality sources, downweight boilerplate) that stays
    * deterministic, repartition-stable, and bit-reproducible in any SQL
    * engine. A null weight null-propagates through the comparison and the
    * row is dropped (consistent across engines).
    */
  def weightedPortableSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String): DataFrame = {
    val w = least(greatest(col(weightCol).cast("double"), lit(0.0)), lit(1.0))
    // per-operator salt: an UNsalted md5(key) would make this sampler's
    // low-bucket selection identical to every other key-hash sampler's, so
    // composing two (weighted sample → split assignment) would correlate
    // perfectly — e.g. all survivors of a low acceptance rate landing in
    // the val/test buckets and none in train
    df.filter(
      portableBucket(md5(concat(lit("w|"), col(keyCol).cast("string"))))
        .cast("double") < w * SplitBuckets)
  }

  /** Sample a corpus DOWN to a target source mix — the data-mixing step of
    * a training pipeline ("2 parts curated : 1 part web", uniform across
    * languages, …). Feasibility: the achievable total is
    * `T = min_i(n_i / target_i)` (the scarcest source binds); each source
    * then keeps `target_i · T / n_i` of its rows via the portable hash, so
    * expected sampled counts sit in exactly the target ratio and the
    * scarcest source is kept whole. Source counts ride as a
    * group-cardinality-sized table joined back in-plan (AQE broadcasts
    * it); targets are a literal map — no driver-side collect of data rows.
    * Sources absent from `target` are dropped (target weight 0).
    */
  def sampleToMix(
      df: DataFrame,
      keyCol: String,
      sourceCol: String,
      target: Map[String, Double]): DataFrame = {
    require(target.nonEmpty && target.values.forall(_ > 0),
      "target mix must be non-empty with positive weights")
    val tgt = typedlit(target)
    val withT = df
      .withColumn("__tw", element_at(tgt, col(sourceCol).cast("string")))
      .filter(col("__tw").isNotNull)
    // feasible total: min over sources of n_i / t_i, computed with one
    // window over the (tiny) per-source count table. NB: column names here
    // must differ by more than letter case — Spark resolves names
    // case-insensitively by default, so a `__t`/`__T` pair silently
    // collapses into one column.
    val rates = withT.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__tw", element_at(tgt, col("__src").cast("string")))
      .withColumn("__feas",
        min(col("__n") / col("__tw")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("__accept", col("__tw") * col("__feas") / col("__n"))
      .select(col("__src"), col("__accept"))
    withT.drop("__tw")
      .join(rates, col(sourceCol) === col("__src"))
      // "mix|" salt: see weightedPortableSample — distinct salts keep the
      // portable samplers independent under composition
      .filter(
        portableBucket(md5(concat(lit("mix|"), col(keyCol).cast("string"))))
          .cast("double") < col("__accept") * SplitBuckets)
      .drop("__src", "__accept")
  }

  private val SplitBuckets = 1000000L

  /** The shared portable bucket: first 12 hex chars of an md5 digest as an
    * integer mod 1e6 — one definition for every portable sampler so the
    * hash-to-bucket mapping can never drift between operators (or their
    * oracles).
    */
  private def portableBucket(digest: Column): Column =
    pmod(conv(substring(digest, 1, 12), 16, 10).cast("long"), lit(SplitBuckets))

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
