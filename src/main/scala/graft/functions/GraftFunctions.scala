package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar building blocks for the text / dedup / similarity operators.
  *
  * Everything here is composed from `org.apache.spark.sql.functions._`
  * (codegen'd, whole-stage-compatible) — no Scala UDFs, so plans stay inside
  * Tungsten. The reference's only scalar seam is a function-pointer
  * aggregator (`dpu/shared/kernels/aggr.c:16`); these are its Spark-idiom
  * descendants for the north-star pipeline operators.
  */
object GraftFunctions {

  // ---------------------------------------------------------------- tokens

  /** Whitespace tokens; empty input → empty array (never `[""]`). */
  def tokens(text: Column): Column = {
    val t = split(trim(text), "\\s+")
    filter(t, x => length(x) > lit(0))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: count of letter-runs + digit-runs + single
    * punctuation marks — a deterministic stand-in for a real tokenizer's
    * piece count, replicable in any regex-bearing engine.
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+")) +
      regexp_count(text, lit("[^A-Za-z0-9\\s]"))

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

  /** Distinct character k-shingles of `lower(text)`; shorter-than-k text
    * yields a single shingle (the text itself) so no doc is dropped.
    */
  def charShingles(text: Column, k: Int): Column = {
    val t = lower(trim(text))
    array_distinct(
      when(length(t) >= k,
        transform(sequence(lit(0), length(t) - k), i => t.substr(i + 1, lit(k))))
        .otherwise(array(t)))
  }

  /** Distinct word n-grams (space-joined) of the whitespace tokens. */
  def wordShingles(text: Column, n: Int): Column = {
    val ts = tokens(lower(text))
    array_distinct(
      when(size(ts) >= n,
        transform(
          sequence(lit(0), size(ts) - n),
          i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", ts))))
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  // --------------------------------------------------------------- minhash

  /** MinHash signature: element `s` = min over shingles of xxhash64(g, s).
    * Empty shingle set → all-zero signature (still joinable, never null).
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    when(size(shingles) === 0, array_repeat(lit(0L), numHashes))
      .otherwise(
        transform(
          sequence(lit(0), lit(numHashes - 1)),
          s => array_min(transform(shingles, g => xxhash64(g, s)))))

  /** LSH band keys: hash of each r-row band of the signature, tagged with
    * the band id so buckets from different bands never collide.
    */
  def lshBandKeys(signature: Column, bands: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(signature, b * lit(rows) + 1, lit(rows)), b))

  // --------------------------------------------------------------- simhash

  /** 64-bit SimHash as an array of 64 sign bits (0/1). Per token-hash, each
    * bit position accumulates +1/-1; the sign of the total is the bit.
    */
  def simhashBits(tokenArr: Column): Column = {
    val counts = aggregate(
      tokenArr,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(
          acc,
          sequence(lit(0), lit(63)),
          (a, i) => a + when(call_function("shiftrightunsigned", h, i).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      })
    transform(counts, c => when(c > 0, lit(1)).otherwise(lit(0)))
  }

  /** Hamming distance between two equal-length bit arrays. */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0), (acc, v) => acc + v)

  /** Bucket keys for SimHash candidate generation: hash each of `chunks`
    * contiguous chunks of the bit array (two near-identical docs agree on
    * at least one chunk when their hamming distance < chunks).
    */
  def simhashChunkKeys(bits: Column, chunks: Int): Column = {
    val chunkLen = 64 / chunks
    transform(
      sequence(lit(0), lit(chunks - 1)),
      c => xxhash64(slice(bits, c * lit(chunkLen) + 1, lit(chunkLen)), c))
  }

  // -------------------------------------------------------------- vectors

  /** Elementwise cast to double (Float arrays → exact double math). */
  def toDoubleArray(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product via zip_with + left-fold (sequential sum: deterministic,
    * bit-matches any engine folding in element order).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two double arrays; 0 when either norm is 0. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0 || nb === 0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** Random-hyperplane LSH signature for cosine similarity: bit `p` =
    * sign of dot(v, r_p) where hyperplane r_p components are pseudo-random
    * ±1 derived from xxhash64(p, dim-index) — fully deterministic, no
    * stored model. Returns an array of `planes` 0/1 ints.
    */
  def hyperplaneSignBits(v: Column, planes: Int): Column =
    transform(
      sequence(lit(0), lit(planes - 1)),
      p => {
        val proj = aggregate(
          zip_with(
            v,
            sequence(lit(0), size(v) - 1),
            (x, i) => x * when(xxhash64(i, p).bitwiseAND(lit(1L)) === 1L, lit(1.0)).otherwise(lit(-1.0))),
          lit(0.0),
          (acc, x) => acc + x)
        when(proj >= 0, lit(1)).otherwise(lit(0))
      })
}
