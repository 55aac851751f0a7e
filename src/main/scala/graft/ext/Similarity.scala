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
  * never a global sort). The dot product is a native expression, so the
  * scan is one tight loop per row.
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

  /** LSH-accelerated approximate top-k: packed random-hyperplane signatures
    * bucket both corpus and query; only vectors sharing at least one
    * signature chunk with the query are scored. Recall tunable via
    * (planes, chunks); use [[bruteForceTopK]] as the exactness oracle.
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
    // Both chunk-key arrays are expressions over this row's signature / a
    // literal, so the bucket test is a pure scan filter — no join, no
    // shuffle, and the query side constant-folds.
    val corpusKeys = chunkKeys(hyperplaneBits(toDoubleArray(col(vecCol)), planes), planes, chunks)
    val queryKeys = chunkKeys(hyperplaneBits(q, planes), planes, chunks)
    df.filter(arrays_overlap(corpusKeys, queryKeys))
      .select(
        col(idCol).as("id"),
        round(cosineSimilarity(toDoubleArray(col(vecCol)), q), 6).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** All-pairs cosine ≥ threshold — delegates to [[Dedup.embeddingPairs]]. */
  def similarPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame =
    Dedup.embeddingPairs(df, idCol, vecCol, threshold)
}
