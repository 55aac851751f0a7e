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

  /** Linear-cost production form of the quadratic recall oracle
    * ([[bruteForcePairs]]): restrict both the LSH pair finder and the exact
    * scan to a deterministic id-hash sample of `frac` of the corpus and
    * report achieved recall as one row (n_lsh, n_exact, recall). Because
    * every LSH pair is exact-cosine-verified, LSH ⊆ exact and recall is a
    * plain count ratio. The exact side costs O((frac·n)²) — at 100 TB pick
    * frac so frac·n is a few thousand vectors and the audit stays a
    * negligible fraction of the pair query it monitors, while the id-hash
    * keeps the sample identical run to run (regressions are comparable).
    */
  def sampledRecallAudit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      frac: Double,
      planes: Int = 16,
      chunks: Int = 4): DataFrame = {
    val m = 1L << 20
    val sample =
      if (frac >= 1.0) df
      else df.filter(pmod(xxhash64(col(idCol)), lit(m)) < lit((frac * m).toLong))
    // corpusSize = the FULL corpus count, not the sample's: the LSH side
    // auto-scales its key space from corpus size, and the audit must run
    // the same planes the production pair query would — sizing off the
    // sample would measure a different (easier) configuration.
    val lsh = Dedup.embeddingPairs(sample, idCol, vecCol, threshold, planes, chunks,
        corpusSize = Some(df.count()))
      .agg(count(lit(1)).as("n_lsh"))
    val exact = bruteForcePairs(sample, idCol, vecCol, threshold)
      .agg(count(lit(1)).as("n_exact"))
    // n_exact = 0 means NO SIGNAL (sample too small, or a pair-free slice),
    // not perfect recall — report null so monitoring can tell "nothing to
    // measure" apart from "measured 1.0" and widen the sample instead of
    // green-lighting it.
    lsh.crossJoin(exact).select(
      col("n_lsh"), col("n_exact"),
      when(col("n_exact") === 0, lit(null).cast("double"))
        .otherwise(col("n_lsh").cast("double") / col("n_exact")).as("recall"))
  }

  /** EXACT all-pairs cosine ≥ threshold — deliberately quadratic (a
    * nested-loop join over the full cross product). This is the recall
    * oracle for [[Dedup.embeddingPairs]]; at corpus scale use the LSH
    * variant and sample-audit against this one.
    */
  def bruteForcePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    // Norms are per-ROW, computed once before the quadratic join — the
    // naive cosineSimilarity(a, b) would re-derive both norms per PAIR
    // (3 dot products instead of 1). The product na·nb is bit-identical
    // to computing the norms inside the pair loop, so exactness holds.
    val v = df.select(
      col(idCol).as("id"),
      toDoubleArray(col(vecCol)).as("v"))
      .withColumn("norm", l2Norm(col("v")))
    // repartition the STREAM side: a small corpus reads as one partition,
    // and the nested-loop join inherits its parallelism — without this the
    // whole quadratic scan grinds through a single task. An EXPLICIT count
    // (not repartition(col)): AQE would coalesce a tiny corpus's shuffle
    // back to one partition by bytes, re-serializing the scan
    v.repartition(df.sparkSession.sparkContext.defaultParallelism).as("a")
      .join(v.as("b"), col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        // zero-norm guard: 0/0 = NaN, and Spark orders NaN ABOVE every
        // value, so an unguarded NaN >= threshold is TRUE — a zero vector
        // would be reported similar to the whole corpus (and inflate the
        // recall audit's exact denominator). Define cos = 0 like
        // cosineSimilarity / embeddingPairs do.
        when(col("a.norm") === 0 || col("b.norm") === 0, lit(0.0))
          .otherwise(
            dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")))
          .as("cos_raw"))
      .filter(col("cos_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_raw"), 6).as("cos"))
  }

  /** Engine-portable sparse TF document vectors as an `(id, dim, w)`
    * posting list: distinct word n-grams hashed into `dims` buckets with
    * the portable md5-prefix recipe (`conv(substr(md5(·),1,12),16,10) mod
    * dims` — reproducible bit-for-bit in any SQL engine, unlike the
    * xxhash-based [[graft.ext.TextAnalysis.hashingTfEmbedding]]). Weights
    * are gram counts (integer-valued doubles), so every downstream dot
    * product and norm is an EXACT integer sum — cross-engine float drift
    * is structurally impossible until the final division.
    */
  def portableTfPosting(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int,
      ngram: Int): DataFrame =
    df.select(col(idCol).as("id"), explode(wordShingles(col(textCol), ngram)).as("gram"))
      .select(col("id"),
        pmod(conv(substring(md5(col("gram")), 1, 12), 16, 10).cast("long"),
          lit(dims.toLong)).as("dim"))
      .groupBy("id", "dim")
      .agg(count(lit(1)).cast("double").as("w"))

  /** Exact cosine pairs over a sparse `(id, dim, w)` posting list by
    * COUNTING — dot(a,b) = Σ_shared-dims w_a·w_b from the dim-joined
    * posting, norms from a per-id sum — the sparse-vector counterpart of
    * [[graft.ext.Dedup.ngramJaccardPairs]]' inverted-index construction:
    * no array crosses a shuffle. Documents with no posting rows (no grams)
    * are absent by construction, so no zero-norm guard is needed.
    *
    * Audit-side caveat: with a SMALL fixed `dims`, every dimension is
    * shared by many documents and the dim-join degenerates toward the
    * quadratic pair space — this is the exact-audit shape (quarantined to
    * verdict rows), not a production near-dup path (that is
    * [[graft.ext.Dedup.embeddingPairs]]' LSH bucketing).
    */
  def sparseCosinePairs(posting: DataFrame, threshold: Double): DataFrame = {
    val norms = posting.groupBy("id").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val dots = posting.as("a")
      .join(posting.as("b").hint("MERGE"),
        col("a.dim") === col("b.dim") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    dots
      .join(norms.select(col("id").as("id_a"), col("nrm").as("na")), "id_a")
      .join(norms.select(col("id").as("id_b"), col("nrm").as("nb")), "id_b")
      .withColumn("cos_raw", col("dot") / (col("na") * col("nb")))
      .filter(col("cos_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_raw"), 6).as("cos"))
  }

  /** Dense engine-portable TF vectors in ONE native pass per document
    * ([[graft.functions.NativeExpressions.PortableHashingTf]]): same
    * md5-prefix bucketing and count weights as [[portableTfPosting]]
    * (`CrossCheckSpec` pins the two routes equal), but as a narrow per-row
    * expression — self-joins that reference the vector subtree repeatedly
    * re-run a digest loop, not an explode→group-by→densify pipeline.
    */
  def portableTfVecs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int,
      ngram: Int): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.NativeExpressions
        .portable_tf(wordShingles(col(textCol), ngram), dims).as("vec"))

  /** Densify an `(id, dim, w)` posting list into `(id, vec)` with a
    * `dims`-element double array — the adapter that feeds the sparse
    * portable vectors into the dense-vector LSH machinery
    * ([[graft.ext.Dedup.embeddingPairs]]). The map lookup runs over an
    * already-aggregated attribute, so the transform is one pass per row.
    */
  def postingToVec(posting: DataFrame, dims: Int): DataFrame =
    posting
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("dim").cast("int").as("k"), col("w").as("v"))))
        .as("m"))
      .select(col("id"), expr(
        s"transform(sequence(0, ${dims - 1}), d -> coalesce(element_at(m, d), CAST(0.0 AS DOUBLE)))")
        .as("vec"))
}
