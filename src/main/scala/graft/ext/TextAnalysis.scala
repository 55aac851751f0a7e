package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Text-analysis operators for training-data curation: language ID
  * (stopword-voting heuristic), quality scoring, token counting, document
  * fingerprinting (north-star extension, SURVEY §7.6).
  *
  * All pure column expressions — narrow (no shuffle), codegen'd, and
  * embarrassingly parallel at any scale.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword-voting
    * heuristic. Deterministic and engine-portable (the DuckDB oracle
    * replicates the same vote).
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "que", "por"),
    "it" -> Seq("il", "la", "gli", "e", "che", "un", "una", "per", "non", "sono"))

  /** Stopword-vote score for one language over a token array. */
  def langScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Predicted language: argmax of stopword votes, ties broken by language
    * code order, "und" (undetermined) when no stopword hits at all.
    * Single-pass native expression — the composed-HOF formulation
    * re-tokenized the document once per candidate language.
    */
  def langId(text: Column): Column =
    graft.functions.NativeExpressions.lang_id(text, stopwords)

  /** Per-document quality statistics. */
  def qualityStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nChars = length(t)
    val nTokens = size(toks)
    val nAlpha = length(regexp_replace(t, "[^A-Za-z]", ""))
    val nPunct = length(regexp_replace(t, "[A-Za-z0-9\\s]", ""))
    val nStop = langScore(tokens(lower(t)), stopwords.toMap.apply("en"))
    df.select(
      col(idCol).as("id"),
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      round(nChars.cast("double") / greatest(nTokens, lit(1)).cast("double"), 4)
        .as("avg_token_len"),
      round(nAlpha.cast("double") / greatest(nChars, lit(1)).cast("double"), 4)
        .as("alpha_ratio"),
      round(nPunct.cast("double") / greatest(nChars, lit(1)).cast("double"), 4)
        .as("punct_ratio"),
      round(nStop.cast("double") / greatest(nTokens, lit(1)).cast("double"), 4)
        .as("stopword_ratio"))
  }

  /** Composite quality score in [0,1]: rewards stopword density and sane
    * token lengths, penalizes punctuation soup — the usual cheap pre-filter
    * before expensive pipeline stages.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text).cast("double")
    val nTokens = greatest(size(toks), lit(1)).cast("double")
    val avgLen = nChars / nTokens
    val stopRatio =
      langScore(tokens(lower(text)), stopwords.toMap.apply("en")).cast("double") / nTokens
    val punctRatio =
      length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
        greatest(nChars, lit(1.0))
    val lenOk = when(avgLen >= 3 && avgLen <= 12, lit(1.0)).otherwise(lit(0.5))
    round(
      least(lit(1.0), greatest(lit(0.0),
        lenOk * (lit(0.5) + stopRatio * 2) - punctRatio * 2)), 4)
  }

  /** Deterministic model-free document embedding: L2-normalized
    * hashing-trick term-frequency vector (native single-pass expression).
    * `ngram` > 1 hashes word n-grams instead of unigrams — essential when
    * the corpus shares a small vocabulary (unigram TF vectors of
    * word-salad docs are all mutually similar, which defeats LSH pruning);
    * bigrams carry word order and separate unrelated documents.
    */
  def hashingTfEmbedding(text: Column, dims: Int = 128, ngram: Int = 1): Column = {
    val units =
      if (ngram <= 1) tokens(lower(text))
      else graft.functions.GraftFunctions.wordShingles(text, ngram)
    graft.functions.NativeExpressions.hashing_tf(units, dims)
  }

  /** doc_id + fingerprints: whole-document rolling hash plus a w-shingle
    * min-fingerprint (winnowing-style representative).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String, k: Int = 8): DataFrame =
    df.select(
      col(idCol).as("id"),
      rollingFingerprint(col(textCol)).as("fingerprint"),
      array_min(transform(charShingles(col(textCol), k), g => xxhash64(g)))
        .as("min_shingle_hash"))

  /** Sliding-window document chunking — the standard LLM-pretraining
    * preprocessing step: token windows of `chunkSize` every `stride` tokens
    * (overlap = chunkSize − stride), last window ragged. One output row per
    * chunk: (id, chunk_idx, n_chunk_tokens, chunk_text).
    *
    * Shape note: the chunk indices are EXPLODED first and each row slices
    * the already-computed token-array attribute. Slicing inside an array
    * HOF instead (`transform(sequence(...), i -> slice(tokens(text),...))`)
    * re-tokenizes the document once per chunk — the interpreted-HOF
    * captured-subtree trap.
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 64,
      stride: Int = 48): DataFrame = {
    require(chunkSize > 0 && stride > 0)
    val toks = df.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
    toks
      .select(
        col("id"),
        col("toks"),
        posexplode(sequence(lit(0), floor((size(col("toks")) - 1) / stride).cast("int"))))
      .select(
        col("id"),
        col("pos").cast("long").as("chunk_idx"),
        slice(col("toks"), col("pos") * stride + 1, lit(chunkSize)).as("chunk"))
      .select(
        col("id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** PII redaction — the standard training-corpus scrub: email addresses,
    * international-ish phone numbers, and long digit runs (IDs, credit
    * cards) are replaced with typed placeholder tags. Pure regexp column
    * expressions; patterns are engine-portable (the DuckDB oracle runs the
    * same three).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"
  val LongDigitsRe = "[0-9]{9,}"

  def redactPii(text: Column): Column = {
    // IDs before phones: a 9+ digit run also matches the phone pattern,
    // so the more specific rule must fire first or it never fires.
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noIds = regexp_replace(noEmail, LongDigitsRe, "<ID>")
    regexp_replace(noIds, PhoneRe, "<PHONE>")
  }

  /** Deterministic sequence packing: documents are concatenated in
    * (`groupCol`, `idCol`) order and cut every `capacity` tokens — the
    * "concat and chunk" packing used to fill training context windows.
    * The running token count is windowed PER GROUP (e.g. per source), so
    * no global single-partition window exists at any scale. Returns one
    * row per document: its bin and position.
    */
  def packSequences(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      capacity: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.select(
        col(groupCol).as("grp"),
        col(idCol).as("id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - col("n_tokens")) / capacity).cast("long"))
  }
}
