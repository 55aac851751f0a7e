package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial self-join — "all point pairs within distance r"
  * without the all-pairs cross join.
  *
  * Each point lands in an r-sized grid cell (floor division, correct for
  * negative coordinates); ONE side replicates to its 3×3 neighbor cells (a
  * constant ×9 map-side expansion — no broadcast of the corpus, no
  * quadratic candidate set) and the join is an ordinary equi-join on the
  * cell id, so it shuffles and hash-partitions like any PK–FK join. Every
  * pair within r is guaranteed to meet (cell size = r ≥ any within-r
  * coordinate delta), each ordered orientation meets exactly once (the
  * home cell of the non-replicated side is unique), and `id_a < id_b`
  * keeps one orientation. Candidate count is bounded by local density ×
  * 9, never n²; a dense-cell hotspot is ordinary join skew (AQE skew
  * split / salting). Distance stays in exact squared-integer space — no
  * sqrt, no doubles, bit-identical across engines.
  */
object SpatialJoin {

  /** All pairs (id_a < id_b) with squared Euclidean distance ≤ r² over
    * integer coordinates. Output: (id_a, id_b, dist2), unordered.
    */
  def withinDistance(points: DataFrame, id: String, x: String, y: String,
      r: Long): DataFrame = {
    require(r > 0, s"radius must be positive, got $r")
    // floor division via pmod (x - pmod(x, r) is exactly divisible, so
    // truncating `div` equals floor — correct for negative coordinates too)
    def cell(c: Column): Column =
      ((c - pmod(c, lit(r))) / lit(r)).cast("long")
    val p = points.select(col(id).as("__id"),
        col(x).cast("long").as("__x"), col(y).cast("long").as("__y"))
      .withColumn("__cx", cell(col("__x")))
      .withColumn("__cy", cell(col("__y")))
    val neighbors = array((for { dx <- -1 to 1; dy <- -1 to 1 } yield
      struct((col("__cx") + dx).as("ncx"), (col("__cy") + dy).as("ncy"))): _*)
    val a = p
      .select(col("__id").as("id_a"), col("__x").as("xa"),
        col("__y").as("ya"), explode(neighbors).as("nc"))
      .select(col("id_a"), col("xa"), col("ya"),
        col("nc.ncx").as("__cx"), col("nc.ncy").as("__cy"))
    val b = p.select(col("__id").as("id_b"), col("__x").as("xb"),
      col("__y").as("yb"), col("__cx"), col("__cy"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    a.join(b, Seq("__cx", "__cy"))
      .filter(col("id_a") < col("id_b") && d2 <= r * r)
      .select(col("id_a"), col("id_b"), d2.as("dist2"))
  }
}
