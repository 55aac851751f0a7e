package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the
  * duplicate-CLUSTER resolution step a dedup pipeline runs after pair
  * finding: near-dup pairs form a graph, each component is one duplicate
  * cluster, and the component label (the minimum member id) is the
  * canonical survivor the pipeline keeps.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round replaces a node's label with the minimum of
  * its own and its neighbors' labels; fixpoint = components. Each round is
  * ONE shuffle of the (small) edge list joined against the (smaller) label
  * table, and rounds needed = graph diameter — for duplicate clusters
  * (cliques and short chains) that is 2–3, not the log-n of the
  * large-star/small-star algorithms a billion-edge social graph would
  * need. `localCheckpoint` after every round truncates the lineage an
  * iterative plan otherwise grows without bound; the driver loop is
  * orchestration only — every data operation is a distributed plan.
  *
  * Only nodes that appear in at least one edge are labeled (singletons are
  * not duplicate clusters; the caller's corpus minus the labeled nodes is
  * the unique set).
  */
object Components {

  /** (id, comp) for every node of `edges`; comp = min node id reachable,
    * i.e. the component representative. `maxIter` bounds the rounds;
    * propagation is checked for convergence each round and stops early.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20): DataFrame = {
    // Materialize the edge list BEFORE symmetrizing: the union would
    // otherwise evaluate the (possibly expensive — e.g. a whole pair-
    // finding pipeline) edge subtree twice.
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    // Round 0 fused into initialization: label = min(own id, min neighbor
    // id) — one aggregate instead of a distinct + a full propagation round.
    var labels = sym
      .groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("m"))
      .select(col("id"), least(col("id"), col("m")).as("comp"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    // Labels only ever DECREASE, so sum(comp) is a strictly monotone
    // convergence witness: one scalar aggregate per round replaces a
    // join-and-diff. Summed as decimal(38,0): ids may span the full signed
    // 64-bit range (xxhash64-derived ids are this repo's own idiom), where
    // a long sum overflows — and ANSI mode turns that into a query-killing
    // exception — while a double sum's ulp at ~1e18 would swallow
    // single-label changes and falsely converge. coalesce: an EMPTY edge
    // list (no duplicates upstream) must yield an empty labeling, not a
    // null-aggregate error.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("comp").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")))
        .head().getDecimal(0)
    var prevSum = labelSum(labels)
    while (iter < maxIter && !converged) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("comp").as("dst_comp")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_comp")).as("nbr_comp"))
      val prop = labels
        .join(nbrMin, Seq("id"), "left_outer")
        .select(
          col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
      // Pointer jumping (path halving): also adopt the label OF the label.
      // Plain neighbor propagation moves a label one hop per round (O(
      // diameter) rounds — slow on near-dup CHAINS, where A≈B≈C≈… links
      // arbitrarily long paths); jumping through the label table doubles
      // the reach each round, i.e. O(log diameter). `prop` is materialized
      // first: it appears on BOTH sides of the jump self-join, and an
      // un-checkpointed subtree would re-run the round's edge-join
      // aggregation (the dominant per-round cost) twice.
      val propM = prop.localCheckpoint()
      val next = propM
        .join(
          propM.select(col("id").as("comp"), col("comp").as("comp2")),
          Seq("comp"), "left_outer")
        .select(col("id"), least(col("comp"), coalesce(col("comp2"), col("comp"))).as("comp"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
    }
    // Unconverged labels are WRONG labels (a cluster split across two
    // survivors) — failing loudly beats silently emitting them. With
    // pointer jumping the round count is O(log diameter), so `maxIter`
    // exhaustion only fires on genuinely pathological inputs (or a
    // mis-set maxIter), where the caller must decide, not guess.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds; " +
          "labels would be incorrect — raise maxIter")
    System.err.println(s"[graft] connectedComponents: $iter rounds (converged=$converged)")
    labels
  }

  /** Minimal hop count from any seed — multi-source BFS as distributed
    * unit-weight relaxation (the Bellman-Ford specialization): seeds
    * start at 0, each round every node adopts `min(own, min neighbor
    * + 1)`, fixpoint = shortest hop distances. The round structure is
    * the same one-edge-shuffle-per-round discipline as
    * [[connectedComponents]], rounds = eccentricity of the seed set
    * (2–3 on near-dup clusters). Distances never increase and the
    * reached set never shrinks, so `(count, Σdist)` is a strict
    * convergence witness — one scalar aggregate per round. Unreached
    * nodes are absent from the result (disconnected from every seed),
    * mirroring the components contract that only edge-touched nodes
    * are labeled.
    */
  def hopDistance(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxIter: Int = 20): DataFrame = {
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    var dist = seeds
      .select(col(seedCol).as("id"), lit(0L).as("dist"))
      .localCheckpoint()
    // Witness: count is non-decreasing, and for a fixed reached set every
    // relaxation strictly lowers the (decimal-exact) distance sum — so
    // the pair is stable iff the table is.
    def witness(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(sum(col("dist").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    var prev = witness(dist)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbr = sym
        .join(dist.select(col("id").as("src"), col("dist")), "src")
        .groupBy(col("dst").as("id"))
        .agg((min(col("dist")) + 1L).as("nd"))
      val next = dist
        .join(nbr, Seq("id"), "full_outer")
        .select(col("id"),
          least(coalesce(col("dist"), col("nd")), coalesce(col("nd"), col("dist")))
            .as("dist"))
        .localCheckpoint()
      val w = witness(next)
      converged = w._1 == prev._1 && w._2.compareTo(prev._2) == 0
      prev = w
      dist = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"hopDistance did not converge in $maxIter rounds; " +
          "distances would be incomplete — raise maxIter")
    dist
  }

  /** One row per duplicate cluster: (cluster_id = min member id,
    * n_members), from a pair list such as [[Dedup.ngramJaccardPairs]].
    */
  def duplicateClusters(pairs: DataFrame, idACol: String, idBCol: String): DataFrame =
    connectedComponents(pairs, idACol, idBCol)
      .groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"))

  /** Synchronous label propagation (community detection): every node
    * (src ∪ dst) starts as its own community; each round every node
    * adopts the PLURALITY label among its in-neighbors (nodes with no
    * in-edges keep their label), ties broken toward the smallest label
    * — on a symmetrized edge list (the intended input, and what the
    * catalog feeds it) in-neighbors == neighbors and this is classic
    * undirected LPA — the
    * fully-deterministic variant of Raghavan et al.'s LPA (the classic
    * asynchronous/random-tie form is irreproducible across engines, so
    * this row fixes both the schedule and the tie rule; bipartite
    * oscillation is why the round count is a FIXED parameter, not a
    * convergence probe — same design as [[PageRank]], and what makes the
    * operator expressible as unrolled SQL for a full DuckDB oracle).
    *
    * Scale shape: votes are PUSHED along edges — `edges ⋈ labels ON src`
    * then tallied per `dst` — so an edge list staged bucketed-on-src
    * (the [[PageRank.prepare]] artifact this operator shares in the
    * catalog) keeps the edge side of every round's join exchange-free;
    * only the 2-column label table shuffles. For symmetric edges the
    * src-side push equals the dst-side pull, vote tallies are map-side
    * combinable, and the plurality argmax is one `min(struct(-cnt,
    * lbl))` aggregate — no window over the tally.
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1, "labelPropagation: iterations must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // node universe = src ∪ dst: on a symmetric edge list the union is a
    // no-op, but on non-symmetric input it keeps dst-only nodes from
    // voting labelless and src-only nodes from vanishing (they hold their
    // own label below) — wrong-communities-not-error was the failure mode
    var labels = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .select(col("id"), col("id").as("lbl"))
    var i = 0
    while (i < iterations) {
      val voted = e
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("id")
        .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l")))
          .as("best"))
        .select(col("id"), col("best.l").as("voted_lbl"))
      // nodes with no in-edges receive no votes: they KEEP their current
      // label (a left join + coalesce) — on symmetric input every node
      // has in-edges, the coalesce never fires, and the plan/values for
      // the catalog row are unchanged
      labels = labels.join(voted, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("voted_lbl"), col("lbl")).as("lbl"))
      i += 1
    }
    labels
  }
}
