package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Similarity search over an embedding column (`Array[Float]`) — brute-force
  * cosine top-k as the exact baseline, LSH-bucketed as the scale path
  * (north-star extension, SURVEY §7.6).
  *
  * Scale notes: the query vector is a literal folded into the plan (no
  * join, no shuffle — a 100 TB scan stays a scan); top-k is Spark's
  * `TakeOrderedAndProject` (per-partition heap + driver merge of k rows,
  * never a global sort). The LSH variant prunes the scan to matching
  * buckets, which predicate-pushes on a small int column.
  */
object Similarity {

  /** Exact brute-force cosine top-k of `df`'s `vecCol` against a literal
    * query vector. Output: (id, cos) sorted desc, ties broken by id.
    */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(
        col(idCol).as("id"),
        round(cosineSimilarity(toDoubleArray(col(vecCol)), q), 6).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** LSH-accelerated approximate top-k: random-hyperplane signature buckets
    * both the corpus and the query; only vectors sharing at least one
    * signature chunk with the query are scored. Recall is tunable via
    * (planes, chunks); exactness is NOT guaranteed — use
    * [[bruteForceTopK]] as the oracle.
    */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      planes: Int = 16,
      chunks: Int = 4): DataFrame = {
    val q = array(query.map(lit): _*)
    val chunkLen = planes / chunks
    val corpus = df
      .select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .withColumn("bits", hyperplaneSignBits(col("v"), planes))
    // Query chunk keys are plan-time constants (same expression over a
    // literal), so the bucket membership test folds to a scan filter.
    val qKeys = transform(
      sequence(lit(0), lit(chunks - 1)),
      c => xxhash64(slice(hyperplaneSignBits(q, planes), c * lit(chunkLen) + 1, lit(chunkLen)), c))
    val cKeys = transform(
      sequence(lit(0), lit(chunks - 1)),
      c => xxhash64(slice(col("bits"), c * lit(chunkLen) + 1, lit(chunkLen)), c))
    corpus
      .filter(arrays_overlap(cKeys, qKeys))
      .select(col("id"), round(cosineSimilarity(col("v"), q), 6).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** All-pairs cosine ≥ threshold — delegates to [[Dedup.embeddingPairs]]. */
  def similarPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame =
    Dedup.embeddingPairs(df, idCol, vecCol, threshold)
}
