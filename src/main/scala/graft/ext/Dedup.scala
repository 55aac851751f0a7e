package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Document deduplication — exact and near-dup — for training-data
  * pipelines (north-star extension, SURVEY §7.6; beyond the reference
  * surface, SURVEY §2.3).
  *
  * Scale discipline (100 TB):
  *  - Candidate generation shuffles ONLY (bucket_key, id) pairs — never
  *    shingle arrays or vectors. Payloads are re-attached to the (much
  *    smaller) candidate set by a keyed join afterwards, which AQE turns
  *    into a broadcast when the payload side is small. The attach side
  *    re-derives signatures per query here; a STANDING pipeline writes the
  *    compact (id, signature) projection once as a table (the same
  *    pay-at-write discipline as the bucketed join) so derivation happens
  *    once per corpus, not once per query. SimHash instead carries its
  *    8-byte signature through the self-join — cheaper than any re-attach.
  *  - Exact n-gram Jaccard is computed by counting — |A∩B| from an
  *    inverted-index group-by, |A|,|B| from a per-doc size table — so no
  *    array ever crosses a shuffle boundary.
  *  - Signatures (minhash/simhash/hyperplane) are native single-pass
  *    Catalyst expressions (see [[graft.functions.NativeExpressions]]).
  */
object Dedup {

  /** Exact dedup: one survivor (min `idCol`) per distinct `textCol`, plus
    * the duplicate count. Grouping on (digest, text) keeps the shuffle key
    * compact while guarding against digest collisions.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("text_digest"), col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop("text_digest")

  /** Exact dedup on a normalized form (lowercase, punctuation stripped,
    * whitespace collapsed) — catches trivially-mutated copies with an
    * exact, SQL-checkable rule.
    *
    * The strip class is UNICODE-aware (`[^\p{L}\p{N} ]`, letters and
    * digits of any script): the old ASCII-only `[^a-z0-9 ]` class mapped
    * every non-Latin document to the empty string — a multilingual corpus
    * would collapse into one giant false duplicate group and a
    * keep-the-survivor pipeline would delete essentially all non-Latin
    * data. `\p{L}`/`\p{N}` mean the same thing in Java regex and RE2, so
    * the rule stays engine-portable (DuckDB oracle included).
    */
  def normalized(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^\\p{L}\\p{N} ]", ""), " +", " "))
    df.groupBy(norm.as("norm_text"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Re-attach a payload column to candidate (id_a, id_b) pairs. */
  private def attach(cand: DataFrame, payload: DataFrame, valueCol: String): DataFrame =
    cand
      .join(payload.select(col("id").as("id_a"), col(valueCol).as(s"${valueCol}_a")), "id_a")
      .join(payload.select(col("id").as("id_b"), col(valueCol).as(s"${valueCol}_b")), "id_b")

  /** Bucket-size ceiling for LSH candidate self-joins. A bucket with m
    * members yields m² candidate rows, so one degenerate hot bucket (a
    * boilerplate band, an all-zeros hyperplane chunk) turns the join
    * quadratic at scale. Buckets larger than `maxBucket` are dropped — an
    * explicit recall-for-survival trade, standard inverted-index practice —
    * and singleton buckets are dropped too (a bucket of one can produce no
    * pair, and in a real corpus MOST buckets are singletons).
    *
    * The size is a window `count(*)` over the bucket key, NOT a
    * `groupBy` + join-back: the window sizes rows in the same exchange the
    * candidate self-join consumes, so the (possibly expensive) signature
    * subtree below it is planned and evaluated ONCE — a groupBy would
    * re-evaluate it as the join's probe side. Window buffering is per
    * bucket and spillable, i.e. linear even on a degenerate hot bucket.
    *
    * Dropped mass is auditable via [[bucketStats]]; additionally an
    * `observe`d metric `graft_cap_<key>` (total vs dropped bucket rows)
    * rides every capped query, which
    * [[graft.engine.GraftSession]]'s listener turns into a stderr warning
    * when the ceiling silently swallows a large fraction of the corpus —
    * the failure mode of an under-sized key space at scale. Setting the
    * session conf `graft.capAudit.failFraction` promotes that warning to
    * an eager hard failure (one audit job per capped query).
    */
  /** Per-invocation disambiguator for `observe` metric names: two capped
    * pair queries UNIONED into one plan (e.g. a combined simhash + edit
    * pair list feeding duplicate clustering) would otherwise carry two
    * CollectMetrics nodes with the same name and fail analysis with
    * DUPLICATED_METRICS_NAME. The session listener matches on the
    * `graft_cap_` prefix, so the suffix costs nothing.
    */
  private val capSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Opt-in HARD failure for the under-sized-key-space mode: with
    * `graft.capAudit.failFraction` set (e.g. 0.5), the drop fraction is
    * checked EAGERLY — one extra aggregation job over the bucketed frame
    * per capped query — and a breach throws at query-build time instead of
    * only warning after the fact. (The observe-based stderr warning in
    * [[capBuckets]] is free and always on, but a QueryExecutionListener
    * cannot fail a query that already succeeded; pipelines that must not
    * silently lose candidate mass pay the audit job for the guarantee.)
    * Shared by the window-shaped [[capBuckets]] and the aggregate-shaped
    * ceiling inside [[editDistancePairs]].
    */
  private def capAuditEager(
      bucketed: DataFrame, keyCol: String, maxBucket: Int): Unit = {
    bucketed.sparkSession.conf.getOption("graft.capAudit.failFraction")
      .map { raw =>
        // fail at the conf, not three jobs later with a bare
        // NumberFormatException (or, worse, a negative fraction silently
        // disabling the guard)
        val frac =
          try raw.toDouble
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"graft.capAudit.failFraction must be a number in (0, 1], got '$raw'")
          }
        require(frac > 0 && frac <= 1,
          s"graft.capAudit.failFraction must be in (0, 1], got '$raw'")
        frac
      }.foreach { frac =>
      val r = bucketed.groupBy(col(keyCol)).agg(count(lit(1)).as("bsz"))
        .agg(
          coalesce(sum(when(col("bsz") >= 2, col("bsz"))), lit(0L)).as("n"),
          coalesce(sum(when(col("bsz") > maxBucket, col("bsz"))), lit(0L)).as("dropped"))
        .head()
      val (n, dropped) = (r.getLong(0), r.getLong(1))
      if (n > 0 && dropped > frac * n)
        throw new IllegalStateException(
          s"bucket ceiling on '$keyCol' would drop $dropped of $n candidate rows " +
            f"(> ${frac * 100}%.0f%% — graft.capAudit.failFraction): the key space is " +
            "under-sized for this corpus; raise planes/bands or maxBucket " +
            "(see Dedup.bucketStats for the full audit)")
    }
  }

  private def capBuckets(bucketed: DataFrame, keyCol: String, maxBucket: Int): DataFrame = {
    capAuditEager(bucketed, keyCol, maxBucket)
    val sized = bucketed
      .withColumn("__bsz", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      // denominator = CANDIDATE rows (bucket size ≥ 2): in a real corpus
      // most buckets are singletons (zero pairable mass), and counting
      // them would mute the warning exactly when the ceiling swallowed
      // all of the actual candidates
      .observe(
        s"graft_cap_${keyCol}_${capSeq.incrementAndGet()}",
        coalesce(sum(when(col("__bsz") >= 2, lit(1L))), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("__bsz") > maxBucket, lit(1L))), lit(0L))
          .as("n_dropped_rows"))
    sized.filter(col("__bsz") >= 2 && col("__bsz") <= maxBucket).drop("__bsz")
  }

  /** Audit query for [[capBuckets]]: one row with the number of buckets and
    * candidate-pair mass removed by a `maxBucket` ceiling. Run (or `observe`)
    * this alongside a capped pair query to LOG what the ceiling dropped.
    */
  def bucketStats(bucketed: DataFrame, keyCol: String, maxBucket: Int): DataFrame =
    bucketed
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("bsz"))
      .agg(
        count(lit(1)).as("n_buckets"),
        count(when(col("bsz") > maxBucket, lit(1))).as("n_dropped_buckets"),
        coalesce(sum(when(col("bsz") > maxBucket, col("bsz"))), lit(0L))
          .as("n_dropped_rows"),
        // bsz*(bsz-1) is a product of consecutive longs, hence even:
        // shiftright(·, 1) is exact integral /2 (the `/` operator would go
        // through double division and lose exactness past 2^53).
        coalesce(sum(when(col("bsz") > maxBucket,
            shiftright(col("bsz") * (col("bsz") - 1), 1))),
          lit(0L)).as("n_dropped_pairs"))

  /** MinHash + LSH near-dup candidate pairs with exact-Jaccard verification.
    *
    * shingles → native minhash signature → band keys → id-only self-join
    * per band bucket → distinct candidate pairs → re-attach shingles →
    * exact Jaccard ≥ threshold. Output: (id_a, id_b, jaccard), id_a < id_b.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucket: Int = 10000): DataFrame = {
    val sh = df.select(
      col(idCol).as("id"),
      charShingles(col(textCol), shingleK).as("shingles"))
    minhashPairsFromSigs(
      sh,
      sh.select(col("id"), minhashSignature(col("shingles"), numHashes).as("sig")),
      numHashes, bands, threshold, maxBucket)
  }

  /** [[minhashPairs]] over PRECOMPUTED inputs — the staged-signature entry
    * point the Dedup scale note promises: a standing pipeline writes the
    * compact (id, sig) projection once per corpus (the pay-at-write
    * discipline of the bucketed join) and every dedup query reads the
    * KB-per-row artifact instead of re-deriving signatures from full text.
    * The signature subtree is consumed THREE times per query (banding plus
    * both attach sides), so staging turns three text passes into three
    * compact parquet reads. `sh` (id, shingles) is still needed for the
    * exact-Jaccard verify of the few candidate pairs; shingle sets are
    * corpus-sized, so they stay derived-on-demand rather than staged.
    */
  def minhashPairsFromSigs(
      sh: DataFrame,
      sig: DataFrame,
      numHashes: Int,
      bands: Int,
      threshold: Double,
      maxBucket: Int = 10000): DataFrame = {
    val rows = numHashes / bands
    val banded = capBuckets(
      sig.select(col("id"), explode(lshBandKeys(col("sig"), bands, rows)).as("band_key")),
      "band_key", maxBucket)
    // MERGE hint: same single-evaluation rationale as [[editDistancePairs]]
    // — an AQE broadcast of one side would re-run the (expensive) shingle+
    // signature subtree for the build, while the merge join reuses the
    // window's exchange and sort on both sides.
    val cand = banded.as("a")
      .join(banded.as("b").hint("MERGE"), "band_key")
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
    // Cheap prefilter: signature agreement is an unbiased Jaccard estimate;
    // only pairs plausibly at/above threshold pay for the exact set math.
    val estMatches = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    val plausible = attach(cand, sig, "sig")
      .filter(estMatches >= lit(math.max(0.0, threshold - 0.15) * numHashes))
      .select("id_a", "id_b")
    attach(plausible, sh, "shingles")
      .withColumn("jaccard", jaccard(col("shingles_a"), col("shingles_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash near-dup pairs: packed 64-bit signature, chunk-bucketed
    * candidates (pigeonhole-complete for hamming < chunks), `bit_count`
    * hamming verification.
    *
    * Exactness caveat: pigeonhole completeness holds only while no chunk
    * bucket exceeds `maxBucket` — a capped bucket drops its pairs (audit
    * with [[bucketStats]] / the `graft_cap_bucket` observed metric). With
    * 16-bit chunk keys (~262k buckets) the default cap starts biting at
    * corpora of a few hundred million docs; raise `maxBucket` or accept
    * the recall trade there.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      chunks: Int = 4,
      maxBucket: Int = 10000): DataFrame =
    simhashPairsFromSigs(
      df.select(
        col(idCol).as("id"),
        simhash64(tokens(lower(col(textCol)))).as("sig")),
      totalBits = 64, maxHamming = maxHamming, chunks = chunks,
      maxBucket = maxBucket)

  /** The bucketed pair core shared by [[simhashPairs]] (native 64-bit
    * signatures) and the portable-signature catalog row: chunk-bucketed
    * candidates over an `(id, sig)` input, hamming verification. Keeping
    * ONE core means the pigeonhole-completeness argument and the bucket-cap
    * audit hold identically for every signature family.
    */
  def simhashPairsFromSigs(
      sigs: DataFrame,
      totalBits: Int,
      maxHamming: Int,
      chunks: Int,
      maxBucket: Int = 10000): DataFrame = {
    // The signature is ONE long, so it rides through the explode and the
    // self-join (8 bytes per shuffle row) instead of being re-derived and
    // join-attached afterwards — two fewer joins and no second pass over
    // the corpus. (minhashPairs/embeddingPairs attach instead: their
    // payloads are 64-long arrays / full vectors, where carrying would
    // multiply shuffle volume by the fan-out.)
    val bucketed = capBuckets(
      sigs.select(col("id"), col("sig"),
        explode(chunkKeys(col("sig"), totalBits, chunks)).as("bucket")),
      "bucket", maxBucket)
    // MERGE hint: single-evaluation rationale, see [[editDistancePairs]]
    bucketed.as("a")
      .join(bucketed.as("b").hint("MERGE"), "bucket")
      .filter(col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.sig"), col("b.sig")).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Engine-portable simhash signatures: per-token 60-bit md5-prefix
    * fingerprints (the same `conv(substr(md5(·),1,15),16,10)` recipe as the
    * portable samplers — any SQL engine reproduces it bit-for-bit, unlike
    * the seeded xxhash the native [[graft.functions.NativeExpressions.SimHash64]]
    * uses), folded into a packed 60-bit signature: bit b is set iff
    * `Σ_tokens (±1 by bit b of the token hash) >= 0`.
    *
    * Shape (r19): ONE native pass per document
    * ([[graft.functions.NativeExpressions.PortableSimhash]]) — the
    * signature is computed where the document row already sits, so
    * nothing shuffles at all. The previous fold (explode + 60
    * map-side-combinable conditional sums + a doc-keyed exchange carrying
    * one 60-long row per document) produced bit-identical values — pinned
    * by the PropertyCheckSpec twin — but paid a full per-document
    * exchange and 60 columns of aggregate state for arithmetic a single
    * tight loop does in-row. Documents with zero tokens carry no
    * signature (dropped — same contract as the tokenizer-based native
    * path, where an empty token array hashes to the empty signature).
    */
  def portableSimhashSigs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 60): DataFrame =
    df.select(
        col(idCol).as("id"),
        graft.functions.NativeExpressions
          .portable_simhash(tokens(lower(col(textCol))), bits).as("sig"))
      .filter(col("sig").isNotNull)

  /** EXACT character-k-shingle Jaccard pairs at a high threshold — the
    * audit side for [[minhashPairs]]' recall verdict. Exactness at
    * sub-quadratic cost comes from a size-ratio band: J(A,B) ≥ t implies
    * |A∩B| ≥ t·max(|A|,|B|) and |A∩B| ≤ min(|A|,|B|), hence
    * max ≤ min/t — so candidates outside a log-bucketed size window of
    * width ln(1/t) cannot reach the threshold and are never compared. The
    * probe side explodes into ±2 adjacent buckets (mathematically ±1
    * suffices; the extra bucket absorbs floating-point wobble at bucket
    * boundaries so the candidate set is a PROVABLE superset of the true
    * pair set — the final exact-jaccard filter makes the output identical
    * regardless of each engine's banding). This is the audit discipline of
    * [[graft.ext.Similarity.bruteForcePairs]]: quadratic-within-band work,
    * quarantined to the verdict row, never the production dedup path.
    */
  def charJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      threshold: Double = 0.8): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0)
    val width = math.log(1.0 / threshold)
    // Shingles are hashed to LONGS and SORTED once per document before the
    // banded self-join: the millions-of-candidates × ~300-element
    // intersects then run the codegen'd two-pointer merge
    // ([[graft.functions.NativeExpressions.SortedIntersectCount]], ~0.5 µs)
    // instead of `array_intersect`'s boxed per-pair hash set (~15 µs), and
    // the join shuffles 2.4 KB long-arrays, not string payloads. Same
    // collision discipline as [[ngramJaccardPairs]]' gram_h counting: an
    // xxhash64 collision is ~1e-9 per corpus — the exactness bar every
    // counting family in this file already accepts. |A∪B| = |A|+|B|−|A∩B|
    // from the ORIGINAL distinct-shingle sizes, so no union array is ever
    // materialized.
    val sh = df.select(col(idCol).as("id"), charShingles(col(textCol), k).as("g"))
      .select(col("id"),
        array_sort(transform(col("g"), x => xxhash64(x))).as("h"),
        size(col("g")).as("n"))
      .withColumn("bkt",
        if (width == 0.0) lit(0L)
        else floor(log(col("n").cast("double")) / lit(width)).cast("long"))
    // Join shape, measured at sf0.1 (5000 docs, ~6M banded candidates):
    //  - the HOME side (one row per doc) is explicitly broadcast — the
    //    5-key exploded probe side exceeds the auto-broadcast threshold,
    //    and the SMJ Spark picks instead buffers ~MB-sized duplicate-key
    //    groups per merge step (measured 6 s vs 1.3 s);
    //  - the probe STREAM side is repartitioned by an EXPLICIT count (the
    //    [[graft.ext.Similarity.bruteForcePairs]] discipline): a small
    //    corpus reads as one parquet partition, and the broadcast join
    //    inherits the stream side's parallelism — without it every banded
    //    intersect runs in a single task (measured >600 s single-threaded).
    val probe = sh.withColumn("key", explode(sequence(col("bkt") - 2, col("bkt") + 2)))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    broadcast(sh.withColumn("key", col("bkt"))).as("a")
      .join(probe.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      // the threshold arms the merge's early-exit gate: provably
      // below-threshold pairs return the −1 sentinel partway through the
      // scan; any count that survives is exact (see SortedIntersectCount)
      .withColumn("ni",
        graft.functions.NativeExpressions
          .sorted_intersect_count(col("a.h"), col("b.h"), threshold).cast("double"))
      .filter(col("ni") >= 0)
      .withColumn("jac", col("ni") / (col("a.n") + col("b.n") - col("ni")))
      .filter(col("jac") >= threshold)
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("jac"), 6).as("jaccard"))
  }

  /** Word n-gram Jaccard pairs via shared-shingle inverted index — exact,
    * computed entirely by counting: |A∩B| = rows per pair in the
    * gram-joined posting list (shingle sets are distinct), |A∪B| =
    * |A|+|B|-|A∩B|. No arrays cross any shuffle.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      maxDf: Int = 10000): DataFrame = {
    val sh = df.select(
      col(idCol).as("id"),
      wordShingles(col(textCol), n).as("shingles"))
    val sizes = sh.select(col("id"), size(col("shingles")).as("n_sh"))
    // Inverted-index prefilter: a gram in exactly one document can't
    // contribute to any pair, and in a real corpus MOST grams are unique —
    // dropping them before the self-join removes the bulk of the join
    // input. The document frequency is a window count over the gram hash
    // (same single-shuffle shape as [[capBuckets]], same rationale: the
    // shingling subtree is evaluated once, and the windowed exchange is the
    // one the self-join consumes).
    //
    // Document-frequency CEILING: a gram shared by m documents still yields
    // m² join rows, so one stop-phrase-like gram ("of the and"-class) makes
    // a bucket quadratic at scale. Grams with df > maxDf are dropped — they
    // carry near-zero Jaccard signal (a gram in everything distinguishes
    // nothing) while carrying almost all of the join cost. Dropped mass is
    // auditable via [[ngramDfStats]].
    val pruned = posting(df, idCol, textCol, n)
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("gram_h"))))
      // denominator = shared grams only, same rationale as [[capBuckets]]
      .observe(
        s"graft_cap_gram_h_${capSeq.incrementAndGet()}",
        coalesce(sum(when(col("__df") > 1, lit(1L))), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("__df") > maxDf, lit(1L))), lit(0L))
          .as("n_dropped_rows"))
      .filter(col("__df") > 1 && col("__df") <= maxDf)
      .drop("__df")
    // MERGE hint: single-evaluation rationale, see [[editDistancePairs]]
    val inter = pruned.as("a")
      .join(pruned.as("b").hint("MERGE"), "gram_h")
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn(
        "jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact n-gram CONTAINMENT pairs: C(A,B) = |A∩B| / min(|A|,|B|) ≥
    * `threshold`, with the contained side identified. Containment is the
    * dedup family's asymmetric member — a short quote, excerpt, or
    * boilerplate block fully inside a long document scores C ≈ 1 while its
    * Jaccard is near zero (the union is dominated by the long side), so a
    * Jaccard-thresholded pass structurally cannot find subset
    * relationships between documents of very different sizes. Same
    * counting construction as [[ngramJaccardPairs]] — the shared
    * [[posting]] inverted index with the df>1 prefilter and the df ceiling,
    * |A∩B| from a gram-keyed count, sizes re-attached — only the final
    * metric differs, so the scale contract (8-byte gram hashes across the
    * shuffle, never shingle arrays) is inherited unchanged.
    */
  def ngramContainmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      maxDf: Int = 10000): DataFrame = {
    val sh = df.select(
      col(idCol).as("id"),
      wordShingles(col(textCol), n).as("shingles"))
    val sizes = sh.select(col("id"), size(col("shingles")).as("n_sh"))
    val pruned = posting(df, idCol, textCol, n)
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("gram_h"))))
      .observe(
        s"graft_cap_gram_h_${capSeq.incrementAndGet()}",
        coalesce(sum(when(col("__df") > 1, lit(1L))), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("__df") > maxDf, lit(1L))), lit(0L))
          .as("n_dropped_rows"))
      .filter(col("__df") > 1 && col("__df") <= maxDf)
      .drop("__df")
    // MERGE hint: single-evaluation rationale, see [[editDistancePairs]]
    val inter = pruned.as("a")
      .join(pruned.as("b").hint("MERGE"), "gram_h")
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn(
        "containment",
        col("n_inter").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= threshold)
      .select(
        col("id_a"), col("id_b"),
        round(col("containment"), 6).as("containment"),
        // ties (equal sizes) resolve to id_a — pinned so both engines agree
        when(col("n_a") <= col("n_b"), col("id_a")).otherwise(col("id_b"))
          .as("contained_id"))
  }

  /** CROSS-corpus exact n-gram Jaccard — the INCREMENTAL ingest shape: find
    * near-duplicates of a NEW batch against the EXISTING corpus, emitting
    * only (new, old) pairs — never corpus×corpus. This is what a standing
    * pipeline runs per ingest: the self-join families answer "dedup this
    * corpus once"; this answers "does today's batch duplicate anything we
    * already have". Same counting construction as [[ngramJaccardPairs]]
    * (|A∩B| from the gram-joined posting list, sizes re-attached), with the
    * document-frequency ceiling computed over the UNION — a gram's cost in
    * the cross join is its combined frequency, so that is the honest cap
    * key. Caller contract: the two inputs' id spaces must be disjoint.
    * Output: (id_new, id_old, jaccard).
    */
  def ngramJaccardAcross(
      newDf: DataFrame,
      oldDf: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      maxDf: Int = 10000): DataFrame = {
    val tagged = newDf
      .select(col(idCol).as("id"), col(textCol).as("text"), lit(1).as("side"))
      .unionByName(oldDf
        .select(col(idCol).as("id"), col(textCol).as("text"), lit(0).as("side")))
    val sh = tagged.select(col("id"), col("side"),
      wordShingles(col("text"), n).as("shingles"))
    val sizes = sh.select(col("side"), col("id"), size(col("shingles")).as("n_sh"))
    val pruned = posting(tagged, "id", "text", n, carry = Seq("side"))
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("gram_h"))))
      .observe(
        s"graft_cap_gram_across_${capSeq.incrementAndGet()}",
        coalesce(sum(when(col("__df") > 1, lit(1L))), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("__df") > maxDf, lit(1L))), lit(0L))
          .as("n_dropped_rows"))
      .filter(col("__df") > 1 && col("__df") <= maxDf)
      .drop("__df")
    // MERGE hint: single-evaluation rationale, see [[editDistancePairs]]
    val inter = pruned.as("a")
      .join(pruned.as("b").hint("MERGE"), "gram_h")
      .filter(col("a.side") === 1 && col("b.side") === 0)
      .groupBy(col("a.id").as("id_new"), col("b.id").as("id_old"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.filter(col("side") === 1)
        .select(col("id").as("id_new"), col("n_sh").as("n_a")), "id_new")
      .join(sizes.filter(col("side") === 0)
        .select(col("id").as("id_old"), col("n_sh").as("n_b")), "id_old")
      .withColumn(
        "jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_new"), col("id_old"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** The (id, gram_h) posting list [[ngramJaccardPairs]], [[ngramDfStats]]
    * and [[ngramJaccardAcross]] are all built from — ONE definition so the
    * audit and the incremental variant can never drift from what the pair
    * query's ceiling actually drops. `carry` columns (e.g. the across
    * variant's `side` tag) ride through unchanged. The 8-byte gram hash,
    * not the string, is what crosses the shuffle.
    */
  private def posting(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      carry: Seq[String] = Nil): DataFrame =
    df.select(col(idCol).as("id") +: carry.map(col) :+
        explode(wordShingles(col(textCol), n)).as("gram"): _*)
      .select(col("id") +: carry.map(col) :+
        xxhash64(col("gram")).as("gram_h"): _*)

  /** Audit query for the [[ngramJaccardPairs]] df ceiling: one row with the
    * gram/posting/pair mass a given `maxDf` drops. Run it alongside the pair
    * query to LOG the recall trade the ceiling makes.
    */
  def ngramDfStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxDf: Int = 10000): DataFrame =
    bucketStats(posting(df, idCol, textCol, n), "gram_h", maxDf)
      .withColumnsRenamed(Map(
        "n_buckets" -> "n_grams",
        "n_dropped_buckets" -> "n_dropped_grams",
        "n_dropped_rows" -> "n_dropped_postings"))

  /** Bounded-edit-distance near-dup pairs via SYMMETRIC-DELETE blocking
    * (SymSpell's candidate scheme): every row emits the 64-bit hashes of
    * all ≤`maxDist`-deletion variants of `strCol`
    * ([[graft.functions.NativeExpressions.DeletionHashes]] — complete for
    * lev ≤ maxDist by the alignment argument in its doc), each (group,
    * variant) bucket is gathered by ONE aggregation, pairs are enumerated
    * inside the bucket, and every candidate is verified with the exact
    * banded levenshtein. Output: (id_a, id_b, dist), id_a < id_b,
    * restricted to pairs agreeing on `groupCols`.
    *
    * Plan shape (r14 verdict: this row's old self-join pipeline was the
    * bench's one perf-weak row): the posting table crosses exactly ONE
    * exchange — the `groupBy(bucket)` shuffle that gathers each bucket's
    * members into an array — and pair enumeration + verify run as two
    * stacked `explode`s and a codegen'd filter over that aggregate's
    * output, all in one whole-stage-codegen span. The old shape paid the
    * same posting shuffle and then sorted + windowed the full posting
    * table TWICE (once per self-join side above the reused exchange)
    * before a sort-merge join re-enumerated the same per-bucket cross
    * product; the aggregate does strictly less work for the same pairs.
    * Total exchanges: posting groupBy + the final pair `distinct` (tiny:
    * surviving pairs only) = 2 (a caller's orderBy adds the third).
    *
    * Scale contract — the reason this replaces coarse attribute blocking
    * (e.g. a 25-value nation key): the block key space GROWS with the
    * corpus (distinct variant hashes ~ distinct strings × neighborhood
    * size), so block sizes stay bounded and the quadratic verify
    * parallelizes over as many buckets as there are near-duplicate
    * families, not over a fixed attribute cardinality. Degenerate hot
    * buckets (mass-duplicated strings) hit the same `maxBucket` ceiling
    * + `graft_cap_bucket` drop audit as the LSH families.
    *
    * PRECONDITION at scale — run EXACT dedup first ([[exact]] /
    * [[normalized]]): a corpus dense in verbatim duplicates densifies
    * every deletion-hash bucket quadratically (measured on the r14 ×10
    * fixture: verbatim-replicated names inflated the wall slope from
    * 3.5× to 12.8×), and here the hot bucket's member array is built by
    * `collect_list`, whose per-group state — unlike the old window's
    * spillable buffer — must fit in executor memory. With exact dups
    * removed, bucket mass is bounded by true near-dup family sizes, the
    * `maxBucket` ceiling (post-aggregation recall trade) stays a recall
    * knob rather than a memory guard, and the eager
    * `graft.capAudit.failFraction` audit catches violations loudly.
    *
    * `groupCols` equality is enforced at verify time on the ACTUAL group
    * columns (the group hash is folded into the bucket key only as a
    * discriminator, so a 64-bit collision can never leak a cross-group
    * pair into the output — it merely adds candidates the verify drops).
    */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int = 2,
      groupCols: Seq[String] = Nil,
      maxBucket: Int = 10000): DataFrame = {
    import graft.functions.NativeExpressions
    val grpKey =
      if (groupCols.isEmpty) lit(0L) else xxhash64(groupCols.map(col): _*)
    val grpStruct =
      if (groupCols.isEmpty) struct(lit(0L).as("g0"))
      else struct(groupCols.map(col): _*)
    val base = df.select(
      col(idCol).as("id"), col(strCol).as("s"),
      grpKey.as("g"), grpStruct.as("grp"))
    // The string and group columns ride THROUGH the posting shuffle (the
    // simhash family's precedent: a small fixed payload beside the id), so
    // the verify runs inline on the aggregate's own output with no keyed
    // joins to re-attach payloads afterwards.
    val keyed = base
      .select(col("id"), col("s"), col("grp"), col("g"),
        explode(NativeExpressions.deletion_hashes(col("s"), maxDist)).as("del_h"))
      .select(col("id"), col("s"), col("grp"),
        xxhash64(col("g"), col("del_h")).as("bucket"))
    capAuditEager(keyed, "bucket", maxBucket)
    // ONE pass over the posting table: gather each bucket's members. The
    // observed cap metrics keep [[capBuckets]]' exact semantics (candidate
    // rows = members of buckets with ≥2 rows; dropped rows = members of
    // over-ceiling buckets) so the GraftSession listener's drop warning
    // fires identically.
    val grouped = keyed
      .groupBy(col("bucket"))
      .agg(collect_list(struct(col("id"), col("s"), col("grp"))).as("items"))
      .withColumn("__bsz", size(col("items")).cast("long"))
      .observe(
        s"graft_cap_bucket_${capSeq.incrementAndGet()}",
        coalesce(sum(when(col("__bsz") >= 2, col("__bsz"))), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("__bsz") > maxBucket, col("__bsz"))), lit(0L))
          .as("n_dropped_rows"))
      .filter(col("__bsz") >= 2 && col("__bsz") <= maxBucket)
    // Pair enumeration: two stacked explodes emit each bucket's ordered
    // cross product; `id_a < id_b` keeps each unordered pair once. Both
    // Generates and the verify filter fuse into one codegen stage — the
    // member array is never materialized per intermediate row.
    // The cross-group guard (null-safe equality on the ACTUAL group
    // columns) hides INSIDE the levenshtein's argument: a mismatched group
    // nulls the input, nulls the distance, and the `<= maxDist` conjunct
    // drops the pair. Comparing the grp struct's FIELDS pairwise (not the
    // structs) stays in generated code — complex-type equality falls back
    // to an interpreted ordering call per candidate pair, measured ~4×
    // slower on the old shape.
    val fieldNames = if (groupCols.isEmpty) Seq("g0") else groupCols
    val sameGrp = fieldNames
      .map(f => col("a.grp").getField(f) <=> col("b.grp").getField(f))
      .reduce(_ && _)
    def dist = NativeExpressions
      .bounded_levenshtein(when(sameGrp, col("a.s")), col("b.s"), maxDist)
    // Dedup AFTER the verify, not before: near-dup pairs share several
    // variant buckets (measured dup factor ~1.8 at sf0.1), but the banded
    // levenshtein is ~100 ns/pair while a pre-verify dedup would shuffle
    // the larger candidate set — deduplicating the (much smaller)
    // surviving pair set is strictly less shuffle for the same answer.
    // MEASURED REJECTION (r15 verdict #4's map-side-dedup candidate): a
    // MIN-BUCKET emission rule — emit each pair only from the smallest
    // bucket hash its two strings share, recomputing both deletion-hash
    // sets pair-side — removes this exchange entirely (plan drops to 2
    // exchanges) and matches the oracle exactly, but the recompute is
    // O(survivors × variants) interpreted work: at sf0.1 it was a wash
    // (6.4 s vs 6.4 s same-sitting) and at the ×10 fixture it blew the
    // wall slope from 2.87× to ~7× (47 s vs ~13 s), because survivors
    // scale ×10 while the removed exchange carries only ~8 B/pair. A
    // 15k-row distinct() exchange is latency, not volume — the recompute
    // trades a fixed ~0.3 s latency term for a term that GROWS with the
    // corpus. The distinct stays; its cost is bounded by the survivor
    // count, with map-side partial dedup already planned by Spark.
    // STRUCTURAL REJECTION (r16 verdict #7's banding candidate): keying
    // the posting by (bucket, length-class) to cut the explode fan-out is
    // void for THIS bucket scheme — two strings sharing a deletion-hash
    // bucket already satisfy |len(a) − len(b)| ≤ maxDist (a shared
    // variant of lengths La−da = Lb−db forces |La−Lb| = |da−db| ≤
    // maxDist), so a length split divides each bucket into ≤ maxDist+1
    // classes while every member must replicate into the same ≤
    // maxDist+1 neighbor bands to keep cross-class pairs: the fan-out
    // reduction and the replication cancel (Σ(n/k)²·k ≈ n²), and the
    // posting shuffle — the row's actual volume term, 51.6 MB for 15k
    // pairs at sf0.1 — GROWS by the replication factor. Measured state
    // at rejection: 4.89 s solo / 4.30 s in-catalog at sf0.1, slope
    // 2.87× at ×10, zero spill, ≤3 exchanges plan-pinned — the row is
    // declared done at this shape.
    grouped
      .select(explode(col("items")).as("a"), col("items"))
      .select(col("a"), explode(col("items")).as("b"))
      .filter(col("a.id") < col("b.id") && dist <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        dist.cast("long").as("dist"))
      .distinct()
  }

  /** Corpus-size memo for LSH auto-scaling, keyed by the canonicalized
    * logical plan: repeated DataFrame CONSTRUCTION over the same input
    * (bench warm-up + measured passes, plan audits, explain) pays the
    * sizing count once, not once per build. Bounded LRU (like the take
    * index cache) so a long-lived session over many corpora evicts the
    * stalest entry instead of growing — or flushing — the whole map.
    * CAVEAT: entries live for the JVM; if the data BEHIND a plan changes
    * in-session (a table regenerated in place), the stale count mis-sizes
    * the plane auto-scaling — pass an explicit `corpusSize`, or build the
    * query from a fresh session, after in-place data changes.
    */
  private val MaxCorpusSizeEntries = 64
  private val corpusSizeMemo = new java.util.LinkedHashMap[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, java.lang.Long](
      16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
          java.lang.Long]): Boolean =
      size > MaxCorpusSizeEntries
  }

  private def memoizedCount(df: DataFrame): Long = {
    val key = df.queryExecution.logical.canonicalized
    corpusSizeMemo.synchronized(Option(corpusSizeMemo.get(key))) match {
      case Some(n) => n.toLong
      case None =>
        val n = df.count()
        corpusSizeMemo.synchronized(corpusSizeMemo.put(key, n))
        n
    }
  }

  /** Embedding near-dup pairs: cosine ≥ threshold via packed hyperplane-LSH
    * bucketing + native-dot verification with precomputed norms.
    *
    * THE KEY SPACE AUTO-SCALES TO THE CORPUS (round-5 fix of the silent
    * over-capacity failure): the chunk-key space is
    * `chunks · 2^(planes/chunks)` buckets (planes=16/chunks=4 → 64), and by
    * pigeonhole the mean bucket holds n/2^(planes/chunks) vectors — once
    * that crosses `maxBucket`, the cap drops WHOLE buckets and recall
    * collapses toward zero instead of degrading gracefully. With
    * `autoScalePlanes` (default), the per-chunk bit width is raised until
    * the mean bucket sits at ≤ maxBucket/10 (10× headroom for skew):
    * `bits = max(planes/chunks, ceil(log2(10n/maxBucket)))`, capped at the
    * 64-bit packed signature. Each extra bit per chunk doubles the key
    * space at a measurable recall cost (the graceful trade — audited by
    * [[graft.ext.Similarity.sampledRecallAudit]] and the CrossCheckSpec
    * floors), which replaces the cliff. Sizing needs the corpus count —
    * pass `corpusSize` when known (a standing pipeline knows it from the
    * snapshot it indexes); otherwise ONE count() pass is spent and
    * memoized per canonicalized input plan ([[corpusSizeMemo]]). The
    * `graft_cap_bucket` observed metric still warns if a skewed corpus
    * outruns the headroom.
    */
  def embeddingPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 16,
      chunks: Int = 4,
      maxBucket: Int = 10000,
      corpusSize: Option[Long] = None,
      autoScalePlanes: Boolean = true): DataFrame = {
    val effPlanes =
      if (!autoScalePlanes) planes
      else {
        val n = corpusSize.getOrElse(memoizedCount(df))
        val defaultBits = math.max(1, planes / chunks)
        val needBits = math.ceil(
          math.log(math.max(1.0, 10.0 * n / maxBucket)) / math.log(2.0)).toInt
        val bits = math.min(64 / chunks, math.max(defaultBits, needBits))
        if (bits > defaultBits)
          System.err.println(
            s"[graft] embeddingPairs: corpus n=$n outgrows the " +
              s"${chunks}x2^$defaultBits key space at maxBucket=$maxBucket; " +
              s"auto-scaled to $bits bits/chunk (${bits * chunks} planes)")
        bits * chunks
      }
    val v = df.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
      .withColumn("sig", hyperplaneBits(col("v"), effPlanes))
      .withColumn("vn", struct(col("v").as("vec"), l2Norm(col("v")).as("norm")))
    val bucketed = capBuckets(
      v.select(col("id"), explode(chunkKeys(col("sig"), effPlanes, chunks)).as("bucket")),
      "bucket", maxBucket)
    // MERGE hint: single-evaluation rationale, see [[editDistancePairs]]
    // id_a < id_b folded INTO the join condition: the merge join applies it
    // while emitting, so the unordered duplicate half of each bucket's
    // cross product is never materialized into a downstream projection
    val cand = bucketed.as("a")
      .join(bucketed.as("b").hint("MERGE"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    attach(cand, v.select(col("id"), col("vn")), "vn")
      .withColumn(
        "cos",
        when(col("vn_a.norm") === 0 || col("vn_b.norm") === 0, lit(0.0))
          .otherwise(
            dot(col("vn_a.vec"), col("vn_b.vec")) / (col("vn_a.norm") * col("vn_b.norm"))))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
