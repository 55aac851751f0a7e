package graft

import graft.ext.{Dedup, Similarity}
import graft.sources.Tables

/** Cross-operator differential checks: the approximate operators must be
  * consistent with their exact counterparts — LSH may MISS pairs (that is
  * the recall trade), but everything it returns must be exactly right.
  */
class CrossCheckSpec extends SparkTestBase {
  import spark.implicits._

  test("LSH embedding pairs are a subset of exact pairs, with equal cosines") {
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

  test("LSH top-k ids all appear in the brute-force ranking with equal scores") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb
      .filter($"vec_id" === 0)
      .select(graft.functions.GraftFunctions.toDoubleArray($"embedding"))
      .as[Seq[Double]].head()
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 500)
      .as[(Long, Double)].collect().toMap
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", q, 20)
      .as[(Long, Double)].collect()
    assert(lsh.nonEmpty && lsh.head._1 == 0L) // the query vector itself survives
    lsh.foreach { case (id, cos) =>
      assert(exact(id) == cos, s"score mismatch for $id")
    }
  }
}
