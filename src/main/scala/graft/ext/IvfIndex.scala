package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path for embedding search (north-star extension, SURVEY §7.6).
  *
  * Build: pick `nlist` centroids by deterministic hash-order sampling
  * (`orderBy(hash).limit` = per-partition top-k + driver merge, never a
  * global sort), collect them — they are tiny by construction, the same
  * way the reference returns per-partition metadata to the host
  * (`host/partition/partitioner.cc:166-180`) — and assign every corpus
  * vector to its nearest centroid with a single scan: the centroid matrix
  * is a plan literal, so assignment is `nlist` native dot products per row,
  * no join, no shuffle, no window.
  *
  * Query: score the query against the centroid literals, scan only the
  * `nprobe` nearest lists. At cluster scale the assigned table would be
  * written bucketed by `list_id`, making the probe a partition-pruned read.
  */
object IvfIndex {

  /** Corpus → (vector table with `list_id`, centroid table (list_id,
    * centroid)). Deterministic for a fixed input.
    */
  def build(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
    val sampled: Array[Seq[Double]] = v
      .withColumn("__h", xxhash64(col("id")))
      .orderBy(col("__h"), col("id"))
      .limit(nlist)
      .select("v").as[Seq[Double]].collect()
    val centroids = sampled.toSeq.zipWithIndex
      .map { case (c, i) => (i + 1, c) }
      .toDF("list_id", "centroid")
    val centLit = typedlit(sampled.toSeq)
    // norm floor mirrors assignTo's: a zero vector among the sampled
    // centroids would otherwise make every row's score 0/0 = NaN, and
    // NaN-is-largest ordering would assign the ENTIRE corpus to that list
    val normLit = typedlit(sampled.toSeq.map(c =>
      math.max(1e-300, math.sqrt(c.map(x => x * x).sum))))
    // argmax over dot(v, c_i)/||c_i|| — ||v|| is a per-row constant and
    // cannot change the argmax, so it is not computed at all.
    val best = array_max(transform(
      sequence(lit(1), lit(sampled.length)),
      i => struct(
        (dot(col("v"), element_at(centLit, i)) / element_at(normLit, i)).as("score"),
        (-i).as("neg_i"),
        i.as("list_id"))))
    val assigned = v
      .withColumn("list_id", best.getField("list_id"))
      .select("id", "v", "list_id")
    (assigned, centroids)
  }

  /** Lloyd's refinement over a built assignment: per-list elementwise mean
    * becomes the new centroid (k-means step for the coarse quantizer).
    * Each iteration is one posexplode + two group-bys — fully parallel,
    * no driver-side math beyond re-collecting the (tiny) centroid table.
    */
  def refine(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      iterations: Int): (DataFrame, DataFrame) = {
    var (assigned, centroids) = build(df, idCol, vecCol, nlist)
    val spark = df.sparkSession
    import spark.implicits._
    var it = 0
    while (it < iterations) {
      val means = assigned
        .select(col("list_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("list_id"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("list_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("list_id"), transform(col("pm"), p => p.getField("m")).as("centroid"))
      // lists can die (lose all members); renumber the survivors so the
      // assignment ids and the centroid table stay aligned
      val newCents: Seq[Seq[Double]] = means
        .as[(Int, Seq[Double])].collect().sortBy(_._1).map(_._2).toSeq
      assigned = assignTo(df, idCol, vecCol, newCents)
      centroids = newCents.zipWithIndex
        .map { case (c, i) => (i + 1, c) }.toDF("list_id", "centroid")
      it += 1
    }
    (assigned, centroids)
  }

  /** Incremental-ingest entry point: assign a NEW batch to an EXISTING
    * coarse quantizer (no retrain). Centroids must be passed in ascending
    * list_id order (as [[build]]/[[refine]] return them); the batch lands
    * in exactly the lists a full rebuild would choose, so only the touched
    * lists need statistics refreshed — the index stays a write-once
    * artifact plus appends, never a periodic full retrain.
    */
  def assign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[Seq[Double]]): DataFrame = assignTo(df, idCol, vecCol, cents)

  /** Assign every vector to its nearest centroid (cosine) — pure scan. */
  private def assignTo(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[Seq[Double]]): DataFrame = {
    val v = df.select(col(idCol).as("id"), toDoubleArray(col(vecCol)).as("v"))
    val centLit = typedlit(cents)
    val normLit = typedlit(cents.map(c => math.max(1e-300, math.sqrt(c.map(x => x * x).sum))))
    val best = array_max(transform(
      sequence(lit(1), lit(cents.length)),
      i => struct(
        (dot(col("v"), element_at(centLit, i)) / element_at(normLit, i)).as("score"),
        (-i).as("neg_i"),
        i.as("list_id"))))
    v.withColumn("list_id", best.getField("list_id")).select("id", "v", "list_id")
  }

  /** Approximate cosine top-k over a built index: probe the `nprobe`
    * centroid lists nearest to the query, score only their members.
    */
  def search(
      assigned: DataFrame,
      centroids: DataFrame,
      query: Seq[Double],
      k: Int,
      nprobe: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val probeLists = centroids
      .withColumn("__cos", cosineSimilarity(col("centroid"), q))
      .orderBy(col("__cos").desc, col("list_id"))
      .limit(nprobe)
      .select("list_id")
    assigned
      .join(broadcast(probeLists), "list_id")
      .select(col("id"), round(cosineSimilarity(col("v"), q), 6).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Driver-side probe selection over a COLLECTED centroid table — `nlist`
    * rows of metadata, the same host-side discipline as [[build]]'s
    * centroid collect. Ranking matches [[search]]: cosine desc, ties to
    * the lower list id.
    */
  def probeListIds(
      centroids: Seq[(Int, Seq[Double])],
      query: Seq[Double],
      nprobe: Int): Seq[Int] = {
    val nq = math.sqrt(query.map(x => x * x).sum)
    def cos(c: Seq[Double]): Double = {
      val nc = math.sqrt(c.map(x => x * x).sum)
      if (nc == 0 || nq == 0) 0.0
      else c.iterator.zip(query.iterator).map { case (a, b) => a * b }.sum / (nc * nq)
    }
    centroids.map { case (id, c) => (cos(c), id) }
      .sortBy { case (s, id) => (-s, id) }
      .take(nprobe).map(_._2)
  }

  /** Probe-pruned exact-cosine search over a PERSISTED index table
    * (id, v, list_id, …) written `partitionBy("list_id")`: the static
    * `isin` filter on the partition column prunes unprobed lists at the
    * SOURCE (partition pruning, not a post-scan filter) — the read half of
    * the write-once index discipline. Output: (id, cos).
    */
  def searchIndexed(
      assigned: DataFrame,
      probe: Seq[Int],
      query: Seq[Double],
      k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    assigned
      .filter(col("list_id").isin(probe: _*))
      .select(col("id"), round(cosineSimilarity(col("v"), q), 6).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Probe-pruned ADC search over a PERSISTED index carrying PQ codes
    * (id, code, list_id, …): partition-pruned lists scanned as m-byte codes
    * through the query's ADC table — probe coverage × code shrink multiply,
    * and neither the raw vectors nor the unprobed lists are read at all.
    * Output: (id, adc_dist).
    */
  def searchIndexedPq(
      assigned: DataFrame,
      probe: Seq[Int],
      query: Seq[Double],
      k: Int,
      cb: Pq.Codebook): DataFrame =
    assigned
      .filter(col("list_id").isin(probe: _*))
      .select(
        col("id"),
        graft.functions.NativeExpressions
          .pq_adc_dist(col("code"), cb.adcTable(query)).as("adc_dist"))
      .orderBy(col("adc_dist"), col("id"))
      .limit(k)

  /** Convenience end-to-end: build + search in one call. */
  def topK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val (assigned, centroids) = build(df, idCol, vecCol, nlist)
    search(assigned, centroids, query, k, nprobe)
  }

  /** Composed IVF+PQ search (the classic inverted-file-with-product-
    * quantization shape): the coarse quantizer prunes the corpus to
    * `nprobe`/`nlist` of its lists, and WITHIN those lists the scan reads
    * the m-byte PQ codes through an ADC table instead of the raw vectors.
    * The two reductions multiply — at 100 TB, probe coverage (say 1/4)
    * times the 32× code shrink leaves ~1% of the raw bytes actually
    * scanned, which is what makes billion-vector ANN affordable. List
    * selection ranks centroids by cosine; within-list ranking is ADC
    * squared-L2 (the PQ codebook's native metric) — the standard mixed-
    * metric composition, audited by the exact twin in `CrossCheckSpec`.
    */
  def topKPq(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      cb: Pq.Codebook,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val (assigned, centroids) = build(df, idCol, vecCol, nlist)
    val q = array(query.map(lit): _*)
    val probeLists = centroids
      .withColumn("__cos", cosineSimilarity(col("centroid"), q))
      .orderBy(col("__cos").desc, col("list_id"))
      .limit(nprobe)
      .select("list_id")
    assigned
      .join(broadcast(probeLists), "list_id")
      .select(
        col("id"),
        graft.functions.NativeExpressions
          .pq_adc_dist(
            graft.functions.NativeExpressions.pq_encode(col("v"), cb.centroids),
            cb.adcTable(query))
          .as("adc_dist"))
      .orderBy(col("adc_dist"), col("id"))
      .limit(k)
  }
}
