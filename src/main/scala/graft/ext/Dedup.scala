package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Document deduplication — exact and near-dup — for training-data
  * pipelines (north-star extension, SURVEY §7.6; beyond the reference
  * surface, SURVEY §2.3).
  *
  * Scale notes (100 TB): every variant is a hash-shuffle on a compact key
  * (digest / band hash), never on the document text itself; candidate
  * generation is LSH-bucketed so the pairwise verification join touches
  * only same-bucket pairs, not the O(n²) cross product. No driver-side
  * state, no collect.
  */
object Dedup {

  /** Exact dedup: one survivor (min `idCol`) per distinct `textCol`, plus
    * the duplicate count. GroupBy on a 64-bit digest first so the shuffle
    * key is 8 bytes, not the document; the full text is carried once per
    * group via `min_by`-style first semantics (digest collisions are
    * guarded by grouping on (digest, text)).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("text_digest"), col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop("text_digest")

  /** Exact dedup on a normalized form (lowercase, punctuation stripped,
    * whitespace collapsed) — catches trivially-mutated copies with an
    * exact, SQL-checkable rule.
    */
  def normalized(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""), " +", " "))
    df.groupBy(norm.as("norm_text"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** MinHash + LSH near-dup candidate pairs with exact-Jaccard verification.
    *
    * shingle → minhash signature (numHashes) → `bands` band-hashes →
    * explode → self-join per (band, bandHash) bucket → distinct candidate
    * pair → verify exact shingle Jaccard ≥ threshold.
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val rows = numHashes / bands
    val sh = df.select(
      col(idCol).as("id"),
      charShingles(col(textCol), shingleK).as("shingles"))
    val sig = sh.withColumn("sig", minhashSignature(col("shingles"), numHashes))
    val banded = sig
      .select(col("id"), col("shingles"),
        explode(lshBandKeys(col("sig"), bands, rows)).as("band_key"))
    val a = banded.select(col("band_key"), col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = banded.select(col("band_key"), col("id").as("id_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit sign signature over word tokens,
    * chunk-bucketed candidates, hamming-distance verification.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      chunks: Int = 4): DataFrame = {
    val sig = df.select(
      col(idCol).as("id"),
      simhashBits(tokens(lower(col(textCol)))).as("bits"))
    val bucketed = sig.select(
      col("id"), col("bits"),
      explode(simhashChunkKeys(col("bits"), chunks)).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("bits").as("bits_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("bits").as("bits_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hammingDistance(col("bits_a"), col("bits_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Word n-gram Jaccard pairs via shared-shingle inverted index (exact,
    * no LSH approximation): docs sharing at least one n-gram are candidates;
    * exact Jaccard filters. For corpora where stop-shingles would blow up
    * candidate counts, raise `n` or switch to [[minhashPairs]].
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sh = df.select(
      col(idCol).as("id"),
      wordShingles(col(textCol), n).as("shingles"))
    val inverted = sh.select(col("id"), col("shingles"), explode(col("shingles")).as("gram"))
    val a = inverted.select(col("gram"), col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = inverted.select(col("gram"), col("id").as("id_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding near-dup pairs: cosine ≥ threshold via hyperplane-LSH
    * bucketing (see [[Similarity]]) + exact cosine verification.
    */
  def embeddingPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 16,
      chunks: Int = 4): DataFrame = {
    val v = df.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .withColumn("bits", hyperplaneSignBits(col("v"), planes))
    val chunkLen = planes / chunks
    val bucketed = v.select(
      col("id"), col("v"),
      explode(transform(
        sequence(lit(0), lit(chunks - 1)),
        c => xxhash64(slice(col("bits"), c * lit(chunkLen) + 1, lit(chunkLen)), c))).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
