package graft

import graft.ext.{Dedup, Similarity}
import graft.sources.Tables

/** Cross-operator differential checks: the approximate operators must be
  * consistent with their exact counterparts — LSH may MISS pairs (that is
  * the recall trade), but everything it returns must be exactly right.
  */
class CrossCheckSpec extends SparkTestBase {
  import spark.implicits._

  test("LSH embedding pairs are a subset of exact pairs, with equal cosines (q_embed_pairs)") {
    val emb = Tables.embeddings(spark, sf0001)
    val lsh = Dedup.embeddingPairs(emb, "vec_id", "embedding",
        threshold = 0.3, planes = 16, chunks = 4)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val exact = Similarity.bruteForcePairs(emb, "vec_id", "embedding", threshold = 0.3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(lsh.nonEmpty)
    val missingFromExact = lsh.keySet -- exact.keySet
    assert(missingFromExact.isEmpty,
      s"LSH invented pairs the exact scan does not have: $missingFromExact")
    lsh.foreach { case (pair, cos) =>
      assert(exact(pair) == cos, s"cosine mismatch at $pair: lsh=$cos exact=${exact(pair)}")
    }
    // and the recall trade is visible: exact finds at least as many pairs
    assert(exact.size >= lsh.size)
    // the catalog row is the verdict form: exact rows + a green lsh_ok
    val rows = SparkEntry.queries("q_embed_pairs")(spark, sf0001)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.length == exact.size && rows.forall(_._4),
      "q_embed_pairs verdict rows must be the exact pair set with lsh_ok true")
  }

  test("Misra-Gries heavy hitters: guarantee holds at any partitioning") {
    import org.apache.spark.sql.functions._
    // 10,000 items: 'hot' appears 30%, 'warm' 15%, the rest spread thin
    val items = (0 until 10000).map { i =>
      if (i % 10 < 3) "hot"                       // 30%
      else if (i % 20 >= 3 && i % 20 <= 5) "warm" // 15%
      else s"cold_${i % 997}"
    }
    val agg = udaf(new graft.functions.TypedAggregates.HeavyHitters(9))
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.createDataset(items).repartition(parts).toDF("item")
      val out = df.agg(agg(col("item")).as("hh"))
        .as[Map[String, Long]].head()
      // every item with frequency > n/(k+1) = 1000 must be present
      assert(out.contains("hot"), s"parts=$parts: $out")
      assert(out.contains("warm"), s"parts=$parts: $out")
      assert(out.size <= 9)
      // counts are under-estimates of the true frequency
      assert(out("hot") <= 3000 && out("warm") <= 1500)
    }
  }

  test("PQ: codebook centroids encode losslessly; ADC self-query ranks first") {
    val emb = Tables.embeddings(spark, sf0001)
    val cb = graft.ext.Pq.train(emb, "embedding", m = 16, k = 16)
    // a centroid's own sub-vector quantizes to itself (distance 0)
    val synthetic = (0 until cb.m).flatMap(s => cb.centroids(s)(3)).toSeq
    assert(cb.encode(synthetic).forall(_ == 3.toByte))
    assert(cb.adcTable(synthetic).map(_(3)).sum == 0.0)
    // self-query: vec 0's quantized distance to itself is the quantization
    // error, far below the distance to 499 unrelated random vectors
    val q = emb.filter($"vec_id" === 0)
      .select(graft.functions.GraftFunctions.toDoubleArray($"embedding"))
      .as[Seq[Double]].head()
    val top = graft.ext.Pq.topK(emb, "vec_id", "embedding", q, 5, cb)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 0L, s"self-query not first: ${top.toSeq}")
    // training + encoding are deterministic run to run
    val cb2 = graft.ext.Pq.train(emb, "embedding", m = 16, k = 16)
    assert(cb.centroids.flatten.flatten.toSeq == cb2.centroids.flatten.flatten.toSeq)
  }

  // ---- quantitative recall floors for the rows-only catalog queries ----
  // (each `no_oracle` query's approximate operator is differentially bounded
  // against its exact twin — the reference's native-twin discipline,
  // `host/join/join_test.cc:76-79`)

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("minhash pairs: recall floor vs exact char-shingle jaccard (q_minhash_pairs)") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions._
    val docs = Tables.documents(spark, sf0001)
    val sh = docs.select(col("doc_id").as("id"), charShingles(col("text"), 5).as("s"))
    // exact twin: brute-force char-shingle jaccard on the near-dup band the
    // 8x8 banding is tuned for (recall >= 1-(1-0.9^8)^8 ~ 0.989 at j=0.9).
    // repartition(32): the 500-row corpus reads as ONE partition, and the
    // nested-loop cross join inherits the stream side's parallelism — one
    // task grinding 125k interpreted set-unions is the difference between
    // ~25 s and ~12 min for this twin
    val exact = pairSet(sh.repartition(32).as("a")
      .join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        jaccard(col("a.s"), col("b.s")).as("j"))
      .filter(col("j") >= 0.9))
    val mh = pairSet(Dedup.minhashPairs(docs, "doc_id", "text",
      shingleK = 5, numHashes = 64, bands = 8, threshold = 0.8))
    assert(exact.nonEmpty, "corpus has no planted near-dup pairs at j >= 0.9")
    val recall = exact.count(mh.contains).toDouble / exact.size
    info(s"minhash recall at j>=0.9: $recall (${exact.size} exact pairs)")
    assert(recall >= 0.9, s"minhash recall $recall below floor on ${exact.size} pairs")
    // the banded exact audit side equals this brute-force set at its own
    // threshold, and the catalog verdict rows are green
    val banded = pairSet(Dedup.charJaccardPairs(docs, "doc_id", "text", 5, 0.9))
    assert(banded == exact,
      s"banded jaccard != brute force: missing=${exact -- banded} extra=${banded -- exact}")
    val rows = SparkEntry.queries("q_minhash_pairs")(spark, sf0001)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(_._4), "q_minhash_pairs mh_ok verdict false")
  }

  test("simhash pairs: exact-equality vs brute-force hamming (q_simhash_pairs)") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions._
    val docs = Tables.documents(spark, sf0001)
    // native 64-bit signature path: pigeonhole completeness below the
    // bucket cap makes chunked simhash EXACT, not approximate — set
    // equality vs the brute-force hamming scan.
    // repartition: parallelize the cross join (see the minhash twin above)
    val sig = docs.select(col("doc_id").as("id"),
      simhash64(tokens(lower(col("text")))).as("sig"))
    val exact = pairSet(sig.repartition(32).as("a")
      .join(sig.as("b"), col("a.id") < col("b.id"))
      .filter(hamming64(col("a.sig"), col("b.sig")) <= 3)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")))
    val lsh = pairSet(Dedup.simhashPairs(docs, "doc_id", "text",
      maxHamming = 3, chunks = 4))
    assert(exact.nonEmpty, "corpus has no pairs at hamming <= 3")
    assert(lsh == exact,
      s"simhash chunking lost/invented pairs: missing=${exact -- lsh} extra=${lsh -- exact}")
    // portable 60-bit signature path (the catalog row): same completeness
    // argument, same brute-force twin
    val psig = Dedup.portableSimhashSigs(docs, "doc_id", "text")
    val pexact = pairSet(psig.repartition(32).as("a")
      .join(psig.as("b"), col("a.id") < col("b.id"))
      .filter(hamming64(col("a.sig"), col("b.sig")) <= 3)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")))
    val prow = pairSet(SparkEntry.queries("q_simhash_pairs")(spark, sf0001))
    assert(pexact.nonEmpty && prow == pexact,
      s"portable simhash drifted: missing=${pexact -- prow} extra=${prow -- pexact}")
  }

  test("doc-TF embedding pairs: recall floor vs exact cosine (q_doc_embed_pairs)") {
    import org.apache.spark.sql.functions._
    val vecs = Similarity.portableTfVecs(
      Tables.documents(spark, sf0001), "doc_id", "text", dims = 256, ngram = 2)
    // the native single-pass digest route and the SQL-composed posting
    // route build the IDENTICAL vectors (md5-prefix bucketing pinned)
    val composed = Similarity.postingToVec(
        Similarity.portableTfPosting(
          Tables.documents(spark, sf0001), "doc_id", "text", dims = 256, ngram = 2),
        dims = 256)
      .as[(Long, Seq[Double])].collect().toMap
    Similarity.portableTfVecs(
        Tables.documents(spark, sf0001), "doc_id", "text", dims = 256, ngram = 2)
      .as[(Long, Seq[Double])].collect().foreach { case (id, v) =>
        // postingToVec drops gram-less docs; the native route emits zeros
        assert(composed.getOrElse(id, Seq.fill(256)(0.0)) == v, s"vec drift for doc $id")
      }
    val exact = pairSet(
      Similarity.bruteForcePairs(vecs, "id", "vec", threshold = 0.8))
    val lsh = pairSet(Dedup.embeddingPairs(vecs, "id", "vec",
      threshold = 0.8, planes = 32, chunks = 4))
    assert(exact.nonEmpty, "corpus has no TF-cosine pairs at >= 0.8")
    val recall = exact.count(lsh.contains).toDouble / exact.size
    info(s"doc-TF LSH recall at cos>=0.8: $recall (${exact.size} exact pairs)")
    assert(recall >= 0.8, s"doc-TF LSH recall $recall below floor on ${exact.size} pairs")
    assert((lsh -- exact).isEmpty, "LSH invented pairs the exact scan does not have")
    // the catalog row is the verdict form: exact rows + a green lsh_ok
    val rows = SparkEntry.queries("q_doc_embed_pairs")(spark, sf0001)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.length == exact.size && rows.forall(_._4),
      "q_doc_embed_pairs verdict rows must be the exact pair set with lsh_ok true")
    // the sparse posting-list formulation (the oracle's shape, and the
    // high-dims scale path) produces the IDENTICAL pair set and cosines
    // as the dense scan — integer-exact arithmetic on both routes
    val sparse = Similarity.sparseCosinePairs(
        Similarity.portableTfPosting(
          Tables.documents(spark, sf0001), "doc_id", "text", dims = 256, ngram = 2),
        threshold = 0.8)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val dense = Similarity.bruteForcePairs(vecs, "id", "vec", threshold = 0.8)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(sparse == dense, "sparse posting cosine != dense scan cosine")
  }

  test("IVF top-k: overlap floor vs brute force (q_ivf_topk)") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb
      .filter($"vec_id" === 0)
      .select(graft.functions.GraftFunctions.toDoubleArray($"embedding"))
      .as[Seq[Double]].head()
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20)
      .as[(Long, Double)].collect().map(_._1).toSet
    // nprobe = nlist degenerates IVF to an exact scan: the result must
    // EQUAL brute force (same ids), not merely overlap
    val full = graft.ext.IvfIndex.topK(emb, "vec_id", "embedding", q,
        k = 20, nlist = 16, nprobe = 16)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(full == exact,
      s"full-probe IVF != brute force: missing=${exact -- full} extra=${full -- exact}")
    // at the catalog operating point (nprobe 4/16) the floor is modest:
    // these embeddings are deliberately structureless (no clusters), the
    // worst case for a coarse quantizer — probing 1/4 of the lists keeps
    // about 1/3 of the true neighbors (observed 7/20, stable because
    // k-means init is seeded)
    val ivf = graft.ext.IvfIndex.topK(emb, "vec_id", "embedding", q,
        k = 20, nlist = 16, nprobe = 4)
      .as[(Long, Double)].collect().map(_._1).toSet
    val overlap = (exact & ivf).size
    info(s"IVF top-20 overlap with brute force: $overlap/20")
    assert(ivf.contains(0L), "self-query did not survive IVF probing")
    assert(overlap >= 5, s"IVF top-k overlap $overlap/20 below floor")
  }

  test("IVF+PQ: self-query ranks first; overlap floor vs the full PQ scan (q_ivfpq_topk)") {
    val emb = Tables.embeddings(spark, sf0001)
    val cb = graft.ext.Pq.train(emb, "embedding", m = 16, k = 16)
    val q = emb.filter($"vec_id" === 0)
      .select(graft.functions.GraftFunctions.toDoubleArray($"embedding"))
      .as[Seq[Double]].head()
    val ivfpq = graft.ext.IvfIndex
      .topKPq(emb, "vec_id", "embedding", q, k = 20, cb, nlist = 16, nprobe = 4)
      .as[(Long, Double)].collect()
    // the query vector's own list is by construction the nearest centroid,
    // so it is always probed, and its quantization error is minimal
    assert(ivfpq.head._1 == 0L, s"self-query not first: ${ivfpq.toSeq.take(3)}")
    // every returned (id, adc_dist) agrees exactly with the full PQ scan's
    // scoring of the same id (pruning changes the candidate set, never
    // the score), and overlap with the full scan's top-20 clears a floor
    val full = graft.ext.Pq.topK(emb, "vec_id", "embedding", q, 500, cb)
      .as[(Long, Double)].collect().toMap
    ivfpq.foreach { case (id, dist) =>
      assert(full(id) == dist, s"ADC score drift for $id")
    }
    val fullTop = graft.ext.Pq.topK(emb, "vec_id", "embedding", q, 20, cb)
      .as[(Long, Double)].collect().map(_._1).toSet
    val overlap = (ivfpq.map(_._1).toSet & fullTop).size
    info(s"IVF+PQ top-20 overlap with full PQ scan: $overlap/20")
    assert(overlap >= 5, s"overlap $overlap/20 below floor")
  }

  test("sampled recall audit tracks the full-corpus oracle (Similarity.sampledRecallAudit)") {
    val emb = Tables.embeddings(spark, sf0001)
    // frac = 1.0: the audit IS the full oracle ratio
    val full = Similarity.sampledRecallAudit(emb, "vec_id", "embedding",
        threshold = 0.3, frac = 1.0)
      .as[(Long, Long, Double)].head()
    val lsh = Dedup.embeddingPairs(emb, "vec_id", "embedding", threshold = 0.3).count()
    val exact = Similarity.bruteForcePairs(emb, "vec_id", "embedding", threshold = 0.3).count()
    assert(full._1 == lsh && full._2 == exact)
    assert(math.abs(full._3 - lsh.toDouble / exact) < 1e-12)
    // a half sample: deterministic, non-empty, recall within [0, 1] and
    // within a loose band of the full-corpus recall (the audit's purpose:
    // a linear-cost estimate that moves with the real recall)
    val s = Similarity.sampledRecallAudit(emb, "vec_id", "embedding",
        threshold = 0.3, frac = 0.5)
      .as[(Long, Long, Double)].head()
    info(s"sampled audit frac=0.5: n_lsh=${s._1} n_exact=${s._2} recall=${s._3} (full=${full._3})")
    assert(s._2 > 0 && s._3 >= 0.0 && s._3 <= 1.0)
    val s2 = Similarity.sampledRecallAudit(emb, "vec_id", "embedding",
        threshold = 0.3, frac = 0.5)
      .as[(Long, Long, Double)].head()
    assert(s == s2, "id-hash sampling must be deterministic run to run")
  }

  test("HLL sketches stay within their declared error of the exact counts (q_sketches)") {
    import org.apache.spark.sql.functions._
    // the query computes exact and approx side by side and emits the rsd
    // bound (0.05, 3σ = 15%) as in-plan verdicts; the exact columns are
    // re-derived here independently so a broken verdict expression AND a
    // broken exact side cannot cancel out
    val rows = SparkEntry.queries("q_sketches")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val independent = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val exactOrders = r.getAs[Long]("exact_orders")
      val exactParts = r.getAs[Long]("exact_parts")
      assert(independent(flag) == (exactOrders, exactParts),
        s"exact side drifted for $flag")
      assert(exactOrders > 0 && r.getAs[Boolean]("hll_orders_ok"),
        s"orders sketch out of bound for $flag")
      assert(exactParts > 0 && r.getAs[Boolean]("hll_parts_ok"),
        s"parts sketch out of bound for $flag")
    }
  }

  test("approx quantiles honor the GK rank-error bound vs the exact distribution (q_approx_quantiles)") {
    import org.apache.spark.sql.functions._
    // the catalog row emits one scalar row per (group, q) with an in-plan
    // bound verdict; every verdict must be true and n must match
    val rows = SparkEntry.queries("q_approx_quantiles")(spark, sf0001).collect()
    assert(rows.length == 9, s"expected 3 groups x 3 qs, got ${rows.length}")
    // exact per-group sorted values, to rank the sketch's picks against
    val byGroup = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val n = r.getAs[Long]("n")
      assert(n == byGroup(flag).length)
      assert(r.getAs[Boolean]("gk_bound_ok"),
        s"$flag q=${r.getAs[Double]("q")}: in-plan GK bound verdict is false")
    }
    // independent audit: recompute the sketch picks directly and rank them
    // against the collected distribution — does not trust the query's own
    // gk_bound_ok arithmetic
    val qs = Seq(0.5, 0.95, 0.99)
    val picks = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.95), lit(0.99)), lit(1000)).as("approx_p"))
      .collect()
    picks.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val approx = r.getSeq[Double](r.fieldIndex("approx_p"))
      val sorted = byGroup(flag)
      val n = sorted.length.toLong
      qs.zip(approx).foreach { case (q, a) =>
        // rank of the sketch's pick = #values <= a; GK guarantees it is
        // within n/accuracy of the target rank (accuracy = 1000 in the
        // query, so the bound is n/1000, floored at 1 for tiny groups)
        val rank = sorted.count(_ <= a)
        val bound = math.max(1L, n / 1000)
        assert(math.abs(rank - q * n) <= bound + 1,
          s"$flag q=$q: pick=$a rank=$rank target=${q * n} n=$n")
      }
    }
  }

  test("connected components: exact labels on chains, cliques, and islands") {
    import org.apache.spark.sql.functions._
    // one 6-node chain (diameter 5 — beyond one propagation round), one
    // triangle, one isolated pair
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L), // chain
      (20L, 21L), (21L, 22L), (20L, 22L),                         // triangle
      (30L, 31L)                                                  // pair
    ).toDF("a", "b")
    val comp = graft.ext.Components.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert((10L to 15L).forall(comp(_) == 10L), s"chain mislabeled: $comp")
    assert((20L to 22L).forall(comp(_) == 20L))
    assert(comp(30L) == 30L && comp(31L) == 30L)
    assert(comp.size == 11)
    // cluster rollup matches
    val clusters = graft.ext.Components.duplicateClusters(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(clusters == Map(10L -> 6L, 20L -> 3L, 30L -> 2L))
    // a corpus with NO duplicates: empty pair list -> empty labeling
    val none = graft.ext.Components
      .connectedComponents(edges.filter(col("a") < 0), "a", "b")
    assert(none.isEmpty)
  }

  test("label propagation: plurality adoption, min-label ties, synchronous schedule") {
    import org.apache.spark.sql.functions._
    // two triangles bridged by one edge: LPA must keep each triangle its
    // own community (internal plurality beats the single bridge vote).
    // Edges SYMMETRIZED, as the operator contract requires.
    val half = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),   // triangle A
      (7L, 8L), (8L, 9L), (7L, 9L),   // triangle B
      (3L, 7L)                        // bridge
    ).toDF("a", "b")
    val edges = half.union(half.select(col("b"), col("a")))
    val got = graft.ext.Components
      .labelPropagation(edges, "a", "b", iterations = 3)
      .as[(Long, Long)].collect().toMap
    // round 1 from self-labels: every node adopts its min neighbor (all
    // neighbor labels distinct → plurality cnt=1 each → min-label tie
    // rule), then plurality consolidates each triangle onto label 1 / 2:
    // node1←2, node2←1, node3←1, node7←3, node8←7, node9←7; rounds 2-3
    // settle A on 1 and B's majority on node3's propagated label... the
    // exact fixed schedule is what the assertion pins: recompute by hand
    // is brittle — assert the INVARIANTS instead: every node labeled,
    // labels drawn from node ids, and the two triangle interiors agree
    // internally after 3 synchronous rounds.
    assert(got.keySet == Set(1L, 2L, 3L, 7L, 8L, 9L))
    assert(got.values.toSet.subsetOf(Set(1L, 2L, 3L, 7L, 8L, 9L)))
    assert(got(1L) == got(2L), s"triangle A split: $got")
    assert(got(7L) == got(8L) && got(8L) == got(9L), s"triangle B split: $got")
    // determinism: the same input yields the same labeling, run to run
    val again = graft.ext.Components
      .labelPropagation(edges, "a", "b", iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(again == got)
  }

  test("labelPropagation on a DIRECTED chain keeps every node (r13 advice)") {
    import org.apache.spark.sql.functions.col
    // non-symmetric input 1→2→3: before the fix, node 1 (src-only, no
    // in-edges) vanished from the result and node 3's round-1 vote came
    // from a labelless dst-only row. Now: the node universe is src ∪ dst
    // and vote-less nodes keep their current label.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r1 = graft.ext.Components.labelPropagation(edges, "a", "b", 1)
      .as[(Long, Long)].collect().toMap
    // round 1: 2 adopts 1's label, 3 adopts 2's INITIAL label, 1 keeps own
    assert(r1 == Map(1L -> 1L, 2L -> 1L, 3L -> 2L), s"after 1 round: $r1")
    val r2 = graft.ext.Components.labelPropagation(edges, "a", "b", 2)
      .as[(Long, Long)].collect().toMap
    // round 2: 3 adopts 2's propagated label — the whole chain converges
    assert(r2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"after 2 rounds: $r2")
    // symmetric-input results are bit-identical to the pre-fix operator
    // (the coalesce never fires) — covered by the bridged-triangles test
  }

  test("GK summary states merge across the serialization boundary (q_quantile_merge engine)") {
    import graft.functions.TypedAggregates
    // pure-JVM contract check: K independently-built GkStates, round-
    // tripped through the column encoding, GK-merged == rank-bounded
    // against the exact distribution (2·ε·n + 1, the catalog row's band)
    val eps = 1.0 / 10000
    val n = 40000
    // deterministic pseudo-shuffle of 1..n (LCG step, coprime stride)
    val values = (0 until n).map(i => ((i * 48271L) % n + 1).toDouble)
    val build = new TypedAggregates.GkBuild(eps)
    val states = values.grouped(n / 4 + 1).map { part =>
      val qs = part.foldLeft(build.zero)((b, v) => build.reduce(b, v))
      build.finish(qs) // GkState — the parquet-encodable form
    }.toSeq
    assert(states.size == 4)
    val mergeQ = new TypedAggregates.GkMergeQuery(Seq(0.5, 0.9, 0.99))
    val merged = states.foldLeft(mergeQ.zero)((b, s) => mergeQ.reduce(b, s))
    val picks = mergeQ.finish(merged)
    assert(picks.length == 3)
    val sorted = values.sorted
    Seq(0.5, 0.9, 0.99).zip(picks).foreach { case (q, pick) =>
      val rankLo = sorted.count(_ < pick)
      val rankHi = sorted.count(_ <= pick)
      val band = 2.0 * eps * n + 1
      val target = q * n
      assert(rankLo + 1 <= target + band && rankHi >= target - band,
        s"q=$q pick=$pick ranks [$rankLo,$rankHi] outside $target ± $band")
    }
    // the merged count must be exactly the union (no mass lost/duplicated)
    assert(merged.count == n.toLong)
  }

  test("symmetric-delete edit pairs equal the brute-force same-group set (q_edit_pairs)") {
    import org.apache.spark.sql.functions._
    // exact brute force: full same-nation cross product, bounded levenshtein
    val cust = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_nationkey"), col("c_name"))
    val brute = cust.as("a")
      .join(cust.as("b"),
        col("a.c_nationkey") === col("b.c_nationkey") &&
          col("a.c_custkey") < col("b.c_custkey"))
      .select(col("a.c_custkey").as("id_a"), col("b.c_custkey").as("id_b"),
        graft.functions.NativeExpressions
          .bounded_levenshtein(col("a.c_name"), col("b.c_name"), 2)
          .cast("long").as("dist"))
      .filter(col("dist") <= 2)
      .as[(Long, Long, Long)].collect().toSet
    val blocked = Dedup.editDistancePairs(cust, "c_custkey", "c_name",
        maxDist = 2, groupCols = Seq("c_nationkey"))
      .as[(Long, Long, Long)].collect().toSet
    // the blocking is COMPLETE for lev <= 2 (deletion-neighborhood
    // pigeonhole), so this is set equality, not a recall floor
    assert(brute.nonEmpty, "test data produced no pairs — oracle is vacuous")
    assert(blocked == brute,
      s"missing=${brute -- blocked} invented=${blocked -- brute}")
    // synthetic adversarial shapes: substitutions at both ends, an insert,
    // a delete, a cross-group twin that must NOT pair, and an exact dup
    val docs = Seq(
      (1L, "alpha-0001", 1), (2L, "alpha-0002", 1),  // dist 1 (sub)
      (3L, "alpha-001", 1),                          // dist 1 del vs 1; 1 vs 2: dist 2
      (4L, "Xlpha-0001", 1),                         // dist 1 vs 1 (head sub)
      (5L, "alpha-0001", 2),                         // same string, OTHER group
      (6L, "totally-different", 1),
      (7L, "alpha-0001", 1)                          // exact dup of 1
    ).toDF("id", "s", "grp")
    val pairs = Dedup.editDistancePairs(docs, "id", "s",
        maxDist = 2, groupCols = Seq("grp"))
      .as[(Long, Long, Long)].collect().map { case (a, b, d) => (a, b) -> d }.toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 1L)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) == 1L)
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) == 1L)
    assert(pairs.contains((1L, 7L)) && pairs((1L, 7L)) == 0L)
    assert(!pairs.keySet.exists(p => p._1 == 5L || p._2 == 5L),
      s"cross-group pair leaked: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("merged HLL estimate is within the configured error of the exact count") {
    import org.apache.spark.sql.functions._
    // (n_days, exact_users, hll_bound_ok): the 5σ = 8% band (lgConfigK=12
    // → rse ≈ 1.6%) is the in-plan verdict; the exact side is re-derived
    // independently here
    val row = SparkEntry.queries("q_hll_merge")(spark, sf0001)
      .as[(Long, Long, Boolean)].head()
    val exact = Tables.events(spark, sf0001)
      .agg(countDistinct(col("user_id"))).as[Long].head()
    assert(row._2 == exact, s"exact side drifted: ${row._2} vs $exact")
    assert(row._3, s"merged HLL estimate out of its 8% band (exact=$exact)")
    assert(row._1 > 0)
  }

  test("CMS estimates overcount by at most eps*N (and never undercount)") {
    import org.apache.spark.sql.functions._
    // (event_type, exact_n, cms_bound_ok): the never-undercount /
    // overcount ≤ ⌈ε·N⌉ guarantee is the in-plan verdict; the exact side
    // is re-derived independently here
    val rows = SparkEntry.queries("q_cms_freq")(spark, sf0001)
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val independent = Tables.events(spark, sf0001)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (k, exact, ok) =>
      assert(independent(k) == exact, s"exact side drifted for $k")
      assert(ok, s"CMS bound verdict false for $k (exact=$exact)")
    }
  }

  test("bloom prefilter admits every true match and bounds false positives") {
    import org.apache.spark.sql.functions._
    val urgent = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    // same builder the operator uses — sizing/serialization cannot drift
    val bytes = graft.functions.GraftFunctions.buildBloom(urgent, "o_orderkey")
    val li = Tables.lineitem(spark, sf0001)
    val kept = li.filter(graft.functions.NativeExpressions
      .bloom_might_contain(col("l_orderkey"), bytes))
    val exactSemi = li
      .join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
    // no false negatives: the prefilter output is a superset of the exact
    // semi-join (bloom membership can only overcount)
    val lostN = exactSemi
      .join(kept.select(col("l_orderkey").as("k")),
        col("l_orderkey") === col("k"), "left_anti")
      .count()
    assert(lostN == 0, "bloom dropped a true match")
    // false-positive traffic is bounded: kept rows ≤ true matches + fpp
    // slack on the non-matching population (1% nominal; 5% guard)
    val keptN = kept.count()
    val trueMatches = exactSemi.count()
    val total = li.count()
    assert(keptN <= trueMatches + ((total - trueMatches) * 0.05).toLong,
      s"bloom admits too much traffic: kept=$keptN true=$trueMatches")
  }

  test("incremental ANN assignment lands vectors in the full build's lists") {
    import graft.ext.IvfIndex
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf0001)
    val (assigned, centsDf) = IvfIndex.build(emb, "vec_id", "embedding", nlist = 16)
    val cents = centsDf.as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
    val batch = emb.filter(pmod($"vec_id", lit(10)) === 9)
    val incr = IvfIndex.assign(batch, "vec_id", "embedding", cents.map(_._2))
      .select($"id", $"list_id".as("incr_list"))
    val mismatches = assigned
      .select($"id", $"list_id".as("full_list"))
      .join(incr, "id")
      .filter($"full_list" =!= $"incr_list")
    assert(incr.count() > 0)
    assert(mismatches.count() == 0,
      "incremental assignment disagrees with the full build")
  }

  test("incremental ANN catalog row lands the whole batch in valid lists (q_ivf_incremental)") {
    import org.apache.spark.sql.functions._
    // the catalog row is the verdict form: (n_assigned, assign_ok)
    val (nAssigned, assignOk) = SparkEntry.queries("q_ivf_incremental")(spark, sf0001)
      .as[(Long, Boolean)].head()
    assert(assignOk, "valid-list / exactly-once verdict false")
    val batchN = Tables.embeddings(spark, sf0001)
      .filter(pmod($"vec_id", lit(10)) === 9).count()
    assert(nAssigned == batchN, s"conservation: $nAssigned != batch size $batchN")
    // the per-list breakdown (the "which lists need stats refreshed"
    // signal) stays pinned on the operator itself: 1-based valid ids,
    // positive counts, conservation
    val emb = Tables.embeddings(spark, sf0001)
    val (_, centsDf) = graft.ext.IvfIndex.build(emb, "vec_id", "embedding", nlist = 16)
    val cents = centsDf.as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
    val perList = graft.ext.IvfIndex
      .assign(emb.filter(pmod($"vec_id", lit(10)) === 9), "vec_id", "embedding",
        cents.map(_._2))
      .groupBy("list_id").agg(count(lit(1)).as("n_new"))
      .as[(Int, Long)].collect()
    assert(perList.nonEmpty)
    assert(perList.forall { case (list, n) => list >= 1 && list <= 16 && n > 0 })
    assert(perList.map(_._2).sum == batchN)
  }

  test("PQ top-k catalog row: verdict rows green, scores agree with a fresh codebook (q_pq_topk)") {
    val emb = Tables.embeddings(spark, sf0001)
    // the catalog row is the exactness-audit form: exact top-20 + verdict
    val rows = SparkEntry.queries("q_pq_topk")(spark, sf0001)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.length == 20)
    assert(rows.forall(_._4), "PQ recall verdict false")
    assert(rows.head._2 == 0L, "self-query not rank 1 on the exact side")
    // the underlying ADC scan: self-query first (its quantization error is
    // minimal) and the persisted codebook's scores match a freshly trained
    // one exactly (training is deterministic — pinned above)
    val cb = graft.ext.Pq.train(emb, "embedding", m = 16, k = 16)
    val q = emb.filter($"vec_id" === 0)
      .select(graft.functions.GraftFunctions.toDoubleArray($"embedding"))
      .as[(Seq[Double])].head()
    val pq = graft.ext.Pq.topK(emb, "vec_id", "embedding", q, 20, cb)
      .as[(Long, Double)].collect()
    assert(pq.head._1 == 0L, s"self-query not first: ${pq.toSeq.take(3)}")
    assert(pq.map(_._2).sliding(2).forall(w => w.head <= w.last),
      "adc distances not ascending")
    val full = graft.ext.Pq.topK(emb, "vec_id", "embedding", q, 500, cb)
      .as[(Long, Double)].collect().toMap
    pq.foreach { case (id, dist) =>
      assert(full(id) == dist, s"ADC score drift for $id: $dist vs ${full(id)}")
    }
  }

  test("LSH top-k ids all appear in the brute-force ranking with equal scores (q_embed_lsh_topk)") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb
      .filter($"vec_id" === 0)
      .select(graft.functions.GraftFunctions.toDoubleArray($"embedding"))
      .as[(Seq[Double])].head()
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 500)
      .as[(Long, Double)].collect().toMap
    // the raw LSH scan (the catalog row wraps it in the exactness audit):
    // everything it returns must be exactly right — subset discipline
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", q, 20)
      .as[(Long, Double)].collect()
    assert(lsh.nonEmpty && lsh.head._1 == 0L) // the query vector itself survives
    lsh.foreach { case (id, cos) =>
      assert(exact(id) == cos, s"score mismatch for $id")
    }
    // and the catalog verdict rows are green
    val rows = SparkEntry.queries("q_embed_lsh_topk")(spark, sf0001)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.length == 20 && rows.forall(_._4), "LSH recall verdict false")
  }
}
