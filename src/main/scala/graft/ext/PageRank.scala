package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank over an edge list — the graph-centrality signal a
  * training-data pipeline uses to quality-weight sources (rank domains /
  * suppliers / hosts by linkage), and the repo's second iterative graph
  * operator beside [[Components]].
  *
  * Fixed-iteration push-style formulation: each round every vertex pushes
  * `rank/out_degree` along its out-edges and collects
  * `(1−d)/n + d·Σ contributions`. A FIXED iteration count (no convergence
  * action per round) keeps the whole run to `iterations` chained
  * join+aggregate stages — at 100 TB a convergence probe per round costs
  * one extra job each; power iteration's geometric convergence makes the
  * count a tuning knob, not a correctness one. It also makes the operator
  * expressible as unrolled SQL, so the catalog row gets a full DuckDB
  * oracle (a recursive CTE cannot aggregate over its own recursive term).
  *
  * Scale shape: [[prepare]] materializes the degree-annotated edge list
  * once, partitioned on `src` — stage it as a bucketed table per corpus
  * and every [[runPrepared]] shuffles only rank rows (2 columns), never
  * the edges. Callers must pass a SYMMETRIZED edge list if the graph is
  * undirected; vertices with no out-edges (dangling) would leak rank mass
  * and are rejected at prepare time, keeping Σ ranks = 1 an invariant the
  * specs can pin.
  */
object PageRank {

  /** Validated, degree-annotated edge list `(src, dst, deg)` — the
    * iteration-invariant half of the computation, split out so callers can
    * STAGE it once per corpus (write it as a bucketed-on-`src` table, the
    * repo's write-once artifact discipline) and amortize the edge build,
    * degree aggregation, and dangling validation across every subsequent
    * [[runPrepared]]. Throws if any vertex lacks an out-edge (symmetrize
    * undirected graphs first) rather than silently leaking rank mass.
    */
  def prepare(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // Distinct edges partitioned by src with the out-degree folded in, so
    // each iteration then needs exactly one join. The degree join is left
    // to AQE: vertex-sized side broadcasts when it fits, else it is a
    // sort-merge over the co-partitioning both sides already share (deg
    // derives from e0 grouped on the same key).
    val e0 = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .repartition(col("src"))
    val deg = e0.groupBy("src").agg(count(lit(1)).as("deg"))
    // materialize BEFORE the dangling validation: the check is an action,
    // and running it against the raw lineage would pay the whole
    // distinct+degree build twice — once for the check, once when the
    // caller consumes (stages/iterates) the returned frame
    val ed = e0.join(deg, "src").localCheckpoint()
    // dangling check: every dst must also appear as a src. Anti-join of
    // the distinct dst set against the (already vertex-sized) degree
    // table — cheaper than an EXCEPT over the raw edge list twice.
    val dangling = ed.select(col("dst").as("v")).distinct()
      .join(deg.select(col("src").as("v")), Seq("v"), "left_anti")
      .limit(1).count()
    require(dangling == 0,
      "PageRank.prepare: graph has dangling vertices (no out-edges); " +
        "symmetrize the edge list or drop sink-only vertices first")
    ed
  }

  /** (id, rank) for every vertex of `edges`. One-shot convenience over
    * [[prepare]] + [[runPrepared]]; repeated runs over the same corpus
    * should stage the prepared edges instead.
    */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      damping: Double = 0.85): DataFrame =
    runPrepared(prepare(edges, srcCol, dstCol), iterations, damping)

  /** Power iterations over an already-validated `(src, dst, deg)` edge
    * list from [[prepare]] — typically a STAGED bucketed table, whose
    * bucketing on `src` keeps the per-iteration rank join exchange-free on
    * the edge side (only the 2-column rank rows shuffle each round).
    * Trusts its input: the dangling-vertex invariant was checked when the
    * edges were prepared.
    *
    * The per-edge term stays rank/deg (not rank·(1/deg)): deg is exact,
    * and the division order matches any engine computing the textbook
    * recurrence — the catalog oracle depends on that bit-parity.
    */
  def runPrepared(
      ed: DataFrame,
      iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val verts = ed.select(col("src").as("id")).distinct().localCheckpoint()
    val n = verts.count() // vertex count — scalar driver metadata
    var ranks = verts.withColumn("rank", lit(1.0 / n))
    var i = 0
    while (i < iterations) {
      // aggregate contributions, then LEFT-join back onto the full vertex
      // set: a vertex with out-edges but no in-edges receives no
      // contribution, yet must keep its teleport share (1−d)/n — grouping
      // by dst alone would silently drop it (and leak its pushed mass
      // from the next round on, breaking Σ ranks = 1).
      val contrib = ed
        .join(ranks, col("src") === col("id"))
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c")).as("contrib"))
      ranks = verts
        .join(contrib, Seq("id"), "left")
        .select(
          col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
      i += 1
    }
    ranks
  }
}
