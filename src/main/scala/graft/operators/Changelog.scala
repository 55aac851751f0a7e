package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC changelog application — materializing a base table forward through
  * an out-of-order update/delete log (Debezium → lakehouse, Hudi/Delta
  * CDF semantics):
  *
  *   - last-writer-wins per key by sequence number,
  *   - `U` replaces the value (and INSERTS if the key is absent — CDC
  *     streams carry inserts as upserts),
  *   - `D` tombstones drop the key.
  *
  * Shape: the log reduces FIRST with a map-side-combinable
  * `max_by(payload, seq)` — the log compaction a streaming CDC sink runs
  * continuously — so the base joins against ONE row per touched key,
  * never the raw log; no window over the log, no ordering shuffle. The
  * base join is key-equi (bucket co-location at 100 TB) and tombstones
  * fall out as a post-join filter.
  *
  * Column contract: `base(k, v)`, `log(k, seq, op, v)` with `op ∈ {U, D}`
  * and `seq` unique per key (ties would be nondeterministic in ANY
  * engine). Output: `(k, v, src)` with `src ∈ {base, updated}`.
  *
  * Algebraic property (pinned in `OperatorPropertySpec`): applying a log
  * split at any sequence boundary in two batches equals applying it in
  * one — the invariant that makes incremental CDC pipelines restartable
  * and batchable at will.
  */
object Changelog {

  def apply(base: DataFrame, log: DataFrame): DataFrame = {
    val compacted = log.groupBy(col("k"))
      .agg(max_by(struct(col("op"), col("v")), col("seq")).as("__f"))
      .select(col("k"), col("__f.op").as("__op"), col("__f.v").as("__v"))
    base.join(compacted, Seq("k"), "full_outer")
      .filter(col("__op").isNull || col("__op") === "U")
      .select(col("k"), coalesce(col("__v"), col("v")).as("v"),
        when(col("__op").isNull, lit("base")).otherwise(lit("updated"))
          .as("src"))
  }
}
