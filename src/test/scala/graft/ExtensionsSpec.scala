package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.functions.GraftFunctions._

/** North-star extension operators: dedup, similarity, text analysis,
  * multimodal plumbing (SURVEY §7.6) — semantic sanity on crafted inputs.
  */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "the quick brown fox jumped over the lazy dog"), // near dup of 0
    (3L, "The quick, brown fox jumps over the lazy dog!"), // normalized dup of 0
    (4L, "completely unrelated text about database engines and columnar execution"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts and keeps the min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 2L))) // docs 0 and 1 collapse
    assert(out.size == 5) // 6 docs, one pair merged
  }

  test("normalized dedup additionally collapses punctuation/case variants") {
    val out = Dedup.normalized(docs, "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 3L))) // 0, 1 and 3 collapse
  }

  test("minhash LSH finds the near-duplicate pair and not the unrelated doc") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // identical
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated stays out
  }

  test("chunk keys are bit-compatible with the xxhash64 chaining they replaced") {
    import graft.functions.NativeExpressions
    // the native single-pass ChunkKeys must reproduce the exact key values
    // of the Column formula `xxhash64(lit(c), shiftrightunsigned(sig, c*k)
    // & mask)` so staged artifacts and bucket-cap groupings keyed on the
    // old values stay valid
    val sigs = Seq(0L, -1L, 1L, 123456789L, Long.MinValue, Long.MaxValue,
      0x0123456789abcdefL).toDF("sig")
    for ((totalBits, chunks) <- Seq((64, 4), (64, 8), (16, 4), (64, 1))) {
      val k = totalBits / chunks
      val mask = if (k >= 64) lit(-1L) else lit((1L << k) - 1)
      val legacy = array((0 until chunks).map { c =>
        xxhash64(lit(c), shiftrightunsigned(col("sig"), c * k).bitwiseAND(mask))
      }: _*)
      val rows = sigs.select(
        NativeExpressions.chunk_keys(col("sig"), totalBits, chunks).as("nk"),
        legacy.as("lk")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"totalBits=$totalBits chunks=$chunks: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
      }
    }
  }

  test("simhash near-dup: identical docs at distance 0, unrelated far") {
    val sigs = docs.filter(length($"text") > 0).select(
      $"doc_id", simhash64(tokens(lower($"text"))).as("sig"))
    val d = sigs.as("a").join(sigs.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id",
        hamming64($"a.sig", $"b.sig").cast("int").as("h"))
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    assert(d((0L, 1L)) == 0)
    assert(d((0L, 2L)) < d((0L, 4L)))
  }

  test("ngram jaccard: exact dup = 1.0, near dup high, unrelated low") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.0)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) > 0.5)
    assert(pairs.get((0L, 4L)).forall(_ < 0.1))
  }

  test("cross-corpus ngram jaccard: only (new, old) pairs, values match the self-join") {
    // docs 0 and 3 are the "new batch"; 1, 2, 4, 5 the standing corpus.
    val newBatch = docs.filter($"doc_id".isin(0L, 3L))
    val corpus = docs.filter(!$"doc_id".isin(0L, 3L))
    val across = Dedup.ngramJaccardAcross(newBatch, corpus, "doc_id", "text",
        n = 2, threshold = 0.0)
      .as[(Long, Long, Double)].collect()
    val newIds = Set(0L, 3L)
    assert(across.forall { case (n, o, _) => newIds.contains(n) && !newIds.contains(o) },
      s"pair outside (new, old): ${across.mkString(",")}")
    // doc 0 duplicates 1 (exact) and near-dups 2; never pairs with 4.
    val byPair = across.map { case (n, o, j) => (n, o) -> j }.toMap
    assert(byPair((0L, 1L)) == 1.0)
    assert(byPair((0L, 2L)) > 0.5)
    assert(byPair.get((0L, 4L)).forall(_ < 0.1))
    // Cross-pair jaccards agree exactly with the self-join construction.
    val self = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.0)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => Set(a, b) -> j }.toMap
    byPair.foreach { case ((n, o), j) =>
      assert(self(Set(n, o)) == j, s"($n,$o): across=$j self=${self(Set(n, o))}")
    }
  }

  test("brute-force cosine top-k: self first with cos 1.0, orthogonal excluded") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0), 2).as[(Long, Double)].collect()
    assert(out.head == ((0L, 1.0)))
    assert(out(1)._1 == 1L && out(1)._2 > 0.99)
  }

  test("LSH top-k always recalls the query vector itself") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val q = emb.filter($"vec_id" === 0)
      .select(toDoubleArray($"embedding")).as[Seq[Double]].head()
    val out = Similarity.lshTopK(emb, "vec_id", "embedding", q, 5)
      .as[(Long, Double)].collect()
    assert(out.head._1 == 0L && out.head._2 == 1.0)
  }

  test("language id votes stopwords; no hits yields 'und'") {
    val df = Seq(
      (0L, "the cat is on the mat and it is happy"),
      (1L, "der Hund ist nicht mit der Katze zu Hause"),
      (2L, "xyzzy plugh qwerty")
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(0L) == "en")
    assert(out(1L) == "de")
    assert(out(2L) == "und")
  }

  test("token counts: whitespace and regex variants handle empty and punctuation") {
    val df = Seq((0L, ""), (1L, "  "), (2L, "a b  c"), (3L, "don't stop, world!"))
      .toDF("id", "text")
    val out = df.select($"id", tokenCount($"text").as("ws"),
      regexTokenCount($"text").as("re")).as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L) == ((0, 0)))
    assert(out(1L) == ((0, 0)))
    assert(out(2L) == ((3, 3)))
    assert(out(3L) == ((3, 7))) // don ' t stop , world !
  }

  test("array_count_eq matches the HOF formulation, codegen and interpreted") {
    val df = Seq(
      (0L, Seq("a", "b", "a", "a")),
      (1L, Seq.empty[String]),
      (2L, Seq("b", "b")),
      (3L, Seq("A", "a"))).toDF("id", "toks")
    val out = df.select($"id",
      graft.functions.NativeExpressions.array_count_eq($"toks", "a").as("n"),
      size(filter($"toks", x => x === lit("a"))).as("hof"))
      .as[(Long, Int, Int)].collect()
    out.foreach { case (id, n, hof) => assert(n == hof, s"id=$id") }
    assert(out.map(r => r._1 -> r._2).toMap ==
      Map(0L -> 3, 1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("chunking: sliding windows cover every token with the ragged tail") {
    val df = Seq((0L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (1L, "one"), (2L, " "))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(df, "doc_id", "text", chunkSize = 4, stride = 3)
      .select($"id", $"chunk_idx", $"n_chunk_tokens", $"chunk_text")
      .as[(Long, Long, Long, String)].collect().toSet
    // doc 0: starts at tokens 0,3,6,9 → lengths 4,4,4,1
    assert(out.filter(_._1 == 0L).map(c => c._2 -> c._3) ==
      Set(0L -> 4L, 1L -> 4L, 2L -> 4L, 3L -> 1L))
    assert(out.contains((0L, 0L, 4L, "t0 t1 t2 t3")))
    assert(out.contains((0L, 3L, 1L, "t9")))
    assert(out.filter(_._1 == 1L) == Set((1L, 0L, 1L, "one")))
    assert(!out.exists(_._1 == 2L)) // whitespace-only doc yields no chunks
  }

  test("packing: concat-and-cut bins respect capacity and group boundaries") {
    val df = Seq(
      ("a", 0L, "w w"), ("a", 1L, "w w"), ("a", 2L, "w w w"),
      ("b", 3L, "w w w w w")).toDF("src", "doc_id", "text")
    val out = TextAnalysis.packSequences(df, "src", "doc_id", "text", capacity = 4)
      .select($"grp", $"id", $"bin")
      .as[(String, Long, Long)].collect().toSet
    // group a: cum 2,4,7 → exclusive prefix 0,2,4 → bins 0,0,1; group b restarts
    assert(out == Set(("a", 0L, 0L), ("a", 1L, 0L), ("a", 2L, 1L), ("b", 3L, 0L)))
  }

  test("PII redaction replaces emails, phones, and long digit runs") {
    val df = Seq((0L, "mail a.b+x@c-d.example.org or +1 (555) 123-4567, id 12345678901"))
      .toDF("doc_id", "text")
    val out = df.select(TextAnalysis.redactPii($"text")).as[String].head()
    assert(out.contains("<EMAIL>") && out.contains("<PHONE>") && out.contains("<ID>"))
    assert(!out.exists(_.isDigit) || !"""[0-9]{9,}""".r.findFirstIn(out).isDefined)
    assert(out.startsWith("mail <EMAIL> or <PHONE>, id <ID>"))
  }

  test("rolling fingerprint is deterministic and order-sensitive") {
    val df = Seq((0L, "abc"), (1L, "abc"), (2L, "acb")).toDF("id", "text")
    val fp = df.select($"id", rollingFingerprint($"text").as("f"))
      .as[(Long, Long)].collect().toMap
    assert(fp(0L) == fp(1L))
    assert(fp(0L) != fp(2L))
    // fold semantics: ((0*131+97)*131+98)*131+99 mod 1e9+7
    val expected = ((97L * 131 + 98) * 131 + 99) % 1000000007L
    assert(fp(0L) == expected)
  }

  test("registered SQL functions: graft_* callable from pure SQL") {
    graft.functions.GraftFunctions.registerAll(spark)
    val dot = spark.sql(
      "SELECT graft_vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(dot == 11.0)
    val toks = spark.sql("SELECT size(graft_tokenize('  a b  c ')) AS n")
      .as[Int].head()
    assert(toks == 3)
    assert(spark.sql("SELECT graft_simhash64(graft_tokenize('x y z')) AS s")
      .as[Long].head() != 0L)
    assert(spark.sql("SELECT graft_bounded_levenshtein('kitten', 'sitten', 2) AS d")
      .as[Int].head() == 1)
    // "ab" at k=1: variants {ab, a, b} -> 3 distinct hashes
    assert(spark.sql("SELECT size(graft_deletion_hashes('ab', 1)) AS n")
      .as[Int].head() == 3)
    assert(spark.sql(
      "SELECT graft_array_count_eq(array('a', 'b', 'a'), 'a') AS n")
      .as[Int].head() == 2)
  }

  test("IVF top-k recalls the query vector itself first") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val q = emb.filter($"vec_id" === 0)
      .select(toDoubleArray($"embedding")).as[Seq[Double]].head()
    val out = graft.ext.IvfIndex.topK(emb, "vec_id", "embedding", q, k = 5)
      .as[(Long, Double)].collect()
    assert(out.head._1 == 0L && out.head._2 == 1.0)
    assert(out.length == 5)
  }

  test("IVF k-means refinement keeps full coverage and improves cohesion") {
    import graft.ext.IvfIndex
    import graft.functions.GraftFunctions._
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val n = emb.count()
    val (a0, c0) = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8)
    val (a2, c2) = IvfIndex.refine(emb, "vec_id", "embedding", nlist = 8, iterations = 2)
    assert(a2.count() == n) // every vector still assigned
    assert(c2.count() <= 8 && c2.count() > 0)
    // mean cosine of each vector to its own centroid should not degrade
    def cohesion(a: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame): Double =
      a.join(c, "list_id")
        .select(avg(cosineSimilarity($"v", toDoubleArray($"centroid"))))
        .as[Double].head()
    assert(cohesion(a2, c2) >= cohesion(a0, c0) - 1e-9)
    // search still recalls the query itself
    val q = emb.filter($"vec_id" === 0)
      .select(toDoubleArray($"embedding")).as[Seq[Double]].head()
    val top = IvfIndex.search(a2, c2, q, k = 3, nprobe = 3)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 0L && top.head._2 == 1.0)
  }

  test("salted join multiset equals the plain join") {
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity")
    val o = graft.sources.Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .drop("o_orderkey")
    val salted = graft.operators.SkewJoin
      .saltedInnerJoin(li, o, "l_orderkey", "o_orderkey", saltFactor = 4)
      .drop("o_orderkey")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("deterministic sampling: stable under repartitioning, splits disjoint and complete") {
    import graft.ext.Sampling
    val df = spark.range(10000).toDF("k")
    val s1 = Sampling.hashSample(df, "k", 0.2).as[Long].collect().toSet
    val s2 = Sampling.hashSample(df.repartition(13), "k", 0.2).as[Long].collect().toSet
    assert(s1 == s2) // partitioning-independent membership
    assert(math.abs(s1.size - 2000) < 200) // ~fraction
    val splits = Sampling.assignSplits(df, "k", 0.1, 0.1)
    assert(splits.count() == 10000)
    val counts = splits.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // per-stratum sampling keeps every stratum represented
    val strat = Sampling.stratifiedHashSample(
      df.withColumn("g", pmod($"k", lit(5))), "k", "g", 0.3)
    assert(strat.select(countDistinct($"g")).as[Long].head() == 5)
  }

  test("Moments aggregator matches built-in avg/var_samp") {
    import org.apache.spark.sql.functions.udaf
    val li = graft.sources.Tables.lineitem(spark, sf0001)
    val m = udaf(graft.functions.TypedAggregates.Moments)
    val gotRow = li.agg(m($"l_quantity").as("m"))
      .select(round($"m._1", 6).as("a"), round($"m._2", 6).as("v"))
      .as[(Double, Double)].head()
    val want = li.agg(round(avg($"l_quantity"), 6), round(var_samp($"l_quantity"), 6))
      .as[(Double, Double)].head()
    assert(gotRow == want)
  }

  test("hashing-TF embedding: near-dups cluster, unrelated docs stay apart") {
    import graft.ext.TextAnalysis
    val df = docs.filter(length($"text") > 0)
      .select($"doc_id", TextAnalysis.hashingTfEmbedding($"text", 64).as("emb"))
    val pairs = graft.ext.Dedup
      .embeddingPairs(df, "doc_id", "emb", threshold = 0.9, planes = 8, chunks = 4)
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs((0L, 1L)) == 1.0) // identical text -> identical unit vector
    assert(pairs.get((0L, 2L)).forall(_ >= 0.9)) // near-dup stays close if recalled
    assert(!pairs.contains((0L, 4L))) // unrelated below threshold
    // unit norm
    val norm = df.select(graft.functions.GraftFunctions.l2Norm($"emb")).as[Double].head()
    assert(math.abs(norm - 1.0) < 1e-9)
  }

  test("multimodal featurize: real plumbing, deterministic stub decode") {
    val df = Seq((0L, "hello world"), (1L, "hello world"), (2L, "different"))
      .toDF("doc_id", "text")
    val out = Multimodal.featurize(df, "doc_id", "text", "image/fake")
    assert(out.schema.fieldNames.toSeq ==
      Seq("id", "media_type", "byte_len", "width", "height", "n_frames", "feature"))
    val rows = out.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Long]("byte_len") == 11L)
    // identical payloads decode identically; different payloads differ
    assert(rows(0).getAs[Int]("width") == rows(1).getAs[Int]("width"))
    val f = rows.map(r => r.getSeq[Double](r.fieldIndex("feature")).toList)
    assert(f(0) == f(1))
    assert(rows(0).getAs[Int]("width") != rows(2).getAs[Int]("width") ||
      rows(0).getAs[Int]("height") != rows(2).getAs[Int]("height"))
  }

  test("png header round-trips dims; parser reads a hand-written real header") {
    val dims = Seq((1L, 1L), (640L, 480L), (65535L, 3L)).toDF("w", "h")
    val rt = dims.select(
        Multimodal.pngWidth(Multimodal.pngHeader($"w", $"h")).as("pw"),
        Multimodal.pngHeight(Multimodal.pngHeader($"w", $"h")).as("ph"),
        Multimodal.pngSigOk(Multimodal.pngHeader($"w", $"h")).as("ok"),
        $"w", $"h")
      .collect()
    rt.foreach { r =>
      assert(r.getAs[Long]("pw") == r.getAs[Long]("w"))
      assert(r.getAs[Long]("ph") == r.getAs[Long]("h"))
      assert(r.getAs[Boolean]("ok"))
    }
    // golden: the well-known PNG prelude for a 2x3 image, written BYTE BY
    // BYTE from the spec, not via pngHeader — an independent witness that
    // the parser reads real PNG bytes, not just its own serializer's
    val golden: Array[Byte] = Array(
      0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0x00, 0x00, 0x00, 0x0D, 0x49, 0x48, 0x44, 0x52, // len 13 + "IHDR"
      0x00, 0x00, 0x00, 0x02, // width 2 (big-endian)
      0x00, 0x00, 0x00, 0x03, // height 3
      0x08, 0x06, 0x00, 0x00, 0x00).map(_.toByte)
    val parsed = Seq(Tuple1(golden)).toDF("media")
      .select(Multimodal.pngWidth($"media").as("w"),
        Multimodal.pngHeight($"media").as("h"),
        Multimodal.pngSigOk($"media").as("ok"))
      .as[(Long, Long, Boolean)].head()
    assert(parsed == ((2L, 3L, true)))
    // corrupt signature must be flagged
    val bad = golden.clone(); bad(0) = 0x00
    assert(!Seq(Tuple1(bad)).toDF("media")
      .select(Multimodal.pngSigOk($"media")).as[Boolean].head())
  }

  test("wav header round-trips fields; parser reads a hand-written real header") {
    val specs = Seq((1L, 8000L), (2L, 44100L), (1L, 96000L)).toDF("c", "r")
    val rt = specs.select(
        Multimodal.wavChannels(Multimodal.wavHeader($"c", $"r")).as("pc"),
        Multimodal.wavSampleRate(Multimodal.wavHeader($"c", $"r")).as("pr"),
        Multimodal.wavByteRate(Multimodal.wavHeader($"c", $"r")).as("pb"),
        Multimodal.wavRiffOk(Multimodal.wavHeader($"c", $"r")).as("ok"),
        $"c", $"r")
      .collect()
    rt.foreach { row =>
      assert(row.getAs[Long]("pc") == row.getAs[Long]("c"))
      assert(row.getAs[Long]("pr") == row.getAs[Long]("r"))
      assert(row.getAs[Long]("pb") == row.getAs[Long]("r") * row.getAs[Long]("c") * 2)
      assert(row.getAs[Boolean]("ok"))
    }
    // golden: a canonical 44-byte mono 44.1 kHz 16-bit PCM header written
    // BYTE BY BYTE from the RIFF spec (little-endian fields), not via
    // wavHeader — an independent witness that the parser reads real WAV
    // bytes, not just its own serializer's
    val golden: Array[Byte] = Array(
      0x52, 0x49, 0x46, 0x46, // "RIFF"
      0x24, 0x58, 0x01, 0x00, // chunk size 88100 = 36 + 88064... see below
      0x57, 0x41, 0x56, 0x45, // "WAVE"
      0x66, 0x6D, 0x74, 0x20, // "fmt "
      0x10, 0x00, 0x00, 0x00, // fmt size 16
      0x01, 0x00, // PCM
      0x01, 0x00, // 1 channel
      0x44, 0xAC, 0x00, 0x00, // 44100 (0x0000AC44 little-endian)
      0x88, 0x58, 0x01, 0x00, // byte rate 88200 (0x00015888)
      0x02, 0x00, // block align 2
      0x10, 0x00, // 16 bits
      0x64, 0x61, 0x74, 0x61, // "data"
      0x88, 0x58, 0x01, 0x00 // data size 88200
    ).map(_.toByte)
    val parsed = Seq(Tuple1(golden)).toDF("media")
      .select(Multimodal.wavChannels($"media").as("c"),
        Multimodal.wavSampleRate($"media").as("r"),
        Multimodal.wavByteRate($"media").as("b"),
        Multimodal.wavDataSize($"media").as("d"),
        Multimodal.wavRiffOk($"media").as("ok"))
      .as[(Long, Long, Long, Long, Boolean)].head()
    assert(parsed == ((1L, 44100L, 88200L, 88200L, true)))
    // a PNG payload must NOT pass the RIFF magic check
    assert(!Seq(Tuple1(golden.updated(8, 0x00.toByte))).toDF("media")
      .select(Multimodal.wavRiffOk($"media")).as[Boolean].head())
  }

  test("catalog V2 functions bind their magic methods: Invoke in-plan, no ApplyFunctionExpression") {
    val df = SparkEntry.queries("q_dsv2_function")(spark, sf0001)
    assert(df.count() == 16)
    val plan = df.queryExecution.executedPlan.toString
    // the magic-method path: both calls appear as codegen'd Invoke
    // expressions inside the aggregate...
    assert(plan.contains("KnuthBucket") && plan.contains("Cents"),
      plan.take(1200))
    assert(plan.contains("invoke("), plan.take(1200))
    // ...never as the row-boxing fallback
    assert(!plan.contains("ApplyFunctionExpression"), plan.take(1200))
    // the scalar semantics themselves, spot-checked against the formula
    assert(graft.sources.v2.StageCatalog.KnuthBucket.invoke(16L, 1L) ==
      ((1L * 2654435761L) & 0xFFFFFFFFL) % 16)
    assert(graft.sources.v2.StageCatalog.Cents.invoke(12.345) == 1235L)
    // unknown functions fail loudly through the catalog
    intercept[Exception] {
      spark.sql("SELECT stage_x.default.nope(1)").collect()
    }
  }

  test("catalog V2 aggregate plans the partial/final contract; merge is associative") {
    val df = SparkEntry.queries("q_dsv2_agg_function")(spark, sf0001)
    assert(df.count() == 3)
    val plan = df.queryExecution.executedPlan.toString
    // the two-phase shape: per-partition partial update, merged final —
    // the same lifecycle SUM gets, driven by the V2 AggregateFunction
    assert(plan.contains("partial_v2aggregator"), plan.take(1200))
    assert("(?<!partial_)v2aggregator".r.findFirstIn(plan).isDefined,
      plan.take(1200))
    // merge associativity + null-on-empty, unit-level
    import graft.sources.v2.StageCatalog.GMean
    val a = GMean.newAggregationState()
    a.sumLog = math.log(2.0); a.n = 1
    val b = GMean.newAggregationState()
    b.sumLog = math.log(8.0); b.n = 1
    assert(math.abs(GMean.produceResult(GMean.merge(a, b)) - 4.0) < 1e-12)
    assert(GMean.produceResult(GMean.newAggregationState()) == null)
  }

  test("data-quality rules: one-pass counters match per-rule truth; empty rules rejected") {
    import graft.ext.DataQuality
    val df = Seq(
      (1L, "ok", 10.0), (2L, "ok", -5.0), (3L, "bad", 7.0), (4L, "ok", 0.0)
    ).toDF("id", "status", "v")
    val rep = DataQuality.evaluate(df, Seq(
        "status_ok" -> ($"status" === "ok"),
        "v_positive" -> ($"v" > 0.0)))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rep("status_ok") == ((4L, 3L, 1L)))
    assert(rep("v_positive") == ((4L, 2L, 2L)))
    intercept[IllegalArgumentException] {
      DataQuality.evaluate(df, Seq.empty)
    }
  }
}
