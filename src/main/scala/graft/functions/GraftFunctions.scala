package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Scalar building blocks for the text / dedup / similarity operators.
  *
  * Everything here is composed from `org.apache.spark.sql.functions._`
  * (codegen'd, whole-stage-compatible) — no Scala UDFs, so plans stay inside
  * Tungsten. The reference's only scalar seam is a function-pointer
  * aggregator (`dpu/shared/kernels/aggr.c:16`); these are its Spark-idiom
  * descendants for the north-star pipeline operators.
  */
object GraftFunctions {

  /** Register the graft_* SQL functions on an existing session (for
    * sessions not built with [[graft.engine.GraftExtensions]]).
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    import NativeExpressions._
    val r = spark.sessionState.functionRegistry
    // literal extraction delegates to the SHARED helpers in
    // NativeExpressions so this temp-function path and GraftExtensions'
    // injectFunction path fail identically and informatively (a
    // non-literal or NULL argument raises a descriptive
    // IllegalArgumentException naming the function, never an opaque
    // ClassCastException/NPE) — one definition, no drift between paths
    import NativeExpressions.{literalInt, literalString}
    r.createOrReplaceTempFunction("graft_tokenize", a => Tokenize(a.head), "scala_udf")
    r.createOrReplaceTempFunction("graft_simhash64", a => SimHash64(a.head), "scala_udf")
    r.createOrReplaceTempFunction("graft_vec_dot", a => VecDot(a(0), a(1)), "scala_udf")
    r.createOrReplaceTempFunction(
      "graft_minhash_sig",
      a => MinHashSig(a(0), literalInt(a(1), "graft_minhash_sig")), "scala_udf")
    r.createOrReplaceTempFunction(
      "graft_hyperplane_bits",
      a => HyperplaneBits(a(0), literalInt(a(1), "graft_hyperplane_bits")), "scala_udf")
    r.createOrReplaceTempFunction(
      "graft_chunk_keys",
      a => ChunkKeys(a(0), literalInt(a(1), "graft_chunk_keys"),
        literalInt(a(2), "graft_chunk_keys")), "scala_udf")
    r.createOrReplaceTempFunction(
      "graft_char_shingles",
      a => CharShingles(a(0), literalInt(a(1), "graft_char_shingles")), "scala_udf")
    r.createOrReplaceTempFunction(
      "graft_word_shingles",
      a => WordShingles(a(0), literalInt(a(1), "graft_word_shingles")), "scala_udf")
    r.createOrReplaceTempFunction(
      "graft_bounded_levenshtein",
      a => BoundedLevenshtein(a(0), a(1),
        literalInt(a(2), "graft_bounded_levenshtein")), "scala_udf")
    r.createOrReplaceTempFunction(
      "graft_deletion_hashes",
      a => DeletionHashes(a(0), literalInt(a(1), "graft_deletion_hashes")), "scala_udf")
    r.createOrReplaceTempFunction(
      "graft_array_count_eq",
      a => ArrayCountEq(a(0), literalString(a(1), "graft_array_count_eq")), "scala_udf")
  }

  // ---------------------------------------------------------------- tokens

  /** Whitespace tokens; empty input → empty array (never `[""]`).
    * Native single-pass expression.
    */
  def tokens(text: Column): Column = NativeExpressions.tokenize(text)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: count of letter-runs + digit-runs + single
    * punctuation marks — a deterministic stand-in for a real tokenizer's
    * piece count, replicable in any regex-bearing engine.
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+")) +
      regexp_count(text, lit("[^A-Za-z0-9\\s]"))

  // ---------------------------------------------------------------- sketch

  /** Distributed build + serialize of a bloom filter over a long key
    * column — the build half of the
    * [[NativeExpressions.BloomMightContain]] probe. One metadata-sized
    * count job sizes the filter (capacity floor 1), then `stat.bloomFilter`
    * runs the treeAggregate build; the returned bytes are KB-scale host
    * metadata. Single definition so sizing/serialization can never drift
    * between the operator and the specs that audit it.
    */
  def buildBloom(
      df: org.apache.spark.sql.DataFrame,
      keyCol: String,
      fpp: Double = 0.01): Array[Byte] = {
    val n = math.max(df.count(), 1L)
    val bf = df.stat.bloomFilter(keyCol, n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  // --------------------------------------------------------------- hashing

  /** Seeded 64-bit stable hash (xxhash64). */
  def stableHash(c: Column, seed: Int): Column = xxhash64(c, lit(seed))

  /** Deterministic polynomial rolling fingerprint over the whole string:
    * fold(acc = acc*131 + codepoint) mod 1e9+7 — reproducible in any engine
    * (used by the DuckDB oracle), overflow-safe under ANSI arithmetic.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => pmod(acc * lit(131L) + ascii(ch), lit(1000000007L)))

  // -------------------------------------------------------------- shingles

  /** Distinct character k-shingles of `lower(trim(text))`; shorter-than-k
    * text yields a single shingle (the text itself) so no doc is dropped.
    * Native single-pass expression (the HOF formulation re-evaluates its
    * captured subtree per element — ~ms/row on real documents).
    */
  def charShingles(text: Column, k: Int): Column =
    NativeExpressions.char_shingles(text, k)

  /** Distinct word n-grams (space-joined) of the whitespace tokens of
    * `lower(text)`. Native single-pass expression.
    */
  def wordShingles(text: Column, n: Int): Column =
    NativeExpressions.word_shingles(text, n)

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  // --------------------------------------------------------------- minhash

  /** MinHash signature — delegates to the native single-pass expression
    * (two hash evaluations per shingle for the whole signature; see
    * [[NativeExpressions.MinHashSig]]).
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    NativeExpressions.minhash_sig(shingles, numHashes)

  /** LSH band keys: hash of each r-row band of the signature, tagged with
    * the band id so buckets from different bands never collide.
    */
  def lshBandKeys(signature: Column, bands: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(signature, b * lit(rows) + 1, lit(rows)), b))

  // --------------------------------------------------------------- simhash

  /** 64-bit SimHash packed into one long (native single-pass expression). */
  def simhash64(tokenArr: Column): Column = NativeExpressions.simhash64(tokenArr)

  /** Hamming distance between two packed 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Bucket keys for packed-signature candidate generation: `chunks`
    * contiguous bit-chunks, each tagged with its chunk index so buckets
    * from different chunks never collide. Two signatures within hamming
    * distance < `chunks` agree on at least one chunk (pigeonhole).
    */
  def chunkKeys(sig: Column, totalBits: Int, chunks: Int): Column =
    // chunk index folded in by HASHING, not by an additive tag: the old
    // `c·2^32 + bits` spacing collides across chunks once a chunk is
    // wider than 32 bits. Native single-pass expression: the sig child
    // appears once in the tree (the Column-formula version inlined it per
    // chunk — a collapsed projection recomputed an upstream signature
    // `chunks` times per row) and the key values are bit-compatible with
    // the xxhash64 formula it replaces, so candidate sets, bucket caps,
    // and all verified outputs are unchanged.
    NativeExpressions.chunk_keys(sig, totalBits, chunks)

  // -------------------------------------------------------------- vectors

  /** Elementwise cast to double (Float arrays → exact double math). A
    * plain array cast, NOT `transform(v, _.cast("double"))`: higher-order
    * functions are CodegenFallback, and a `transform` wrapping every
    * vector ejected each similarity scan from whole-stage codegen. `Cast`
    * generates the same per-element widening loop, bit-identical values.
    */
  def toDoubleArray(v: Column): Column =
    v.cast(ArrayType(DoubleType, containsNull = true))

  /** Dot product (native loop; sums in element order, so results bit-match
    * any engine folding sequentially).
    */
  def dot(a: Column, b: Column): Column = NativeExpressions.vec_dot(a, b)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two double arrays; 0 when either norm is 0. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0 || nb === 0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** Random-hyperplane cosine-LSH signature packed into a long (native
    * expression; deterministic pseudo-random ±1 hyperplanes, no model).
    */
  def hyperplaneBits(v: Column, planes: Int): Column =
    NativeExpressions.hyperplane_bits(v, planes)
}
