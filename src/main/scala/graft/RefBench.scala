package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.GraftSession

/** Reference-shaped micro-benchmark — the workload shapes of BASELINE.md's
  * benchmark matrix (uint32 columns, 65,536-row batch granularity), with
  * inputs pre-generated and cached in memory so only operator time is
  * measured (the reference's measure-loop discipline,
  * `host/filter/filter_benchmark.cc:30-49`). Emits one Google-Benchmark-ish
  * JSON line per operator: wall sec, items/s, logical uint32 bytes/s.
  *
  * Usage: SPARK_GRAFT_REF_SF=4 runMain graft.RefBench
  *   filter: SF·128 × 65,536 rows, predicate v < 2^30  (BM_FilterNative)
  *   sum:    SF × 2,097,152 rows                        (BM_SumNative)
  *   take:   SF × 4,194,304 values, 1/8 indices         (BM_TakeNative)
  *   partition: SF × 2,097,152 rows → 32 partitions     (BM_Partition)
  *   join:   SF × 2,097,152 rows per side, PK–FK inner  (BM_JoinDpu shape)
  */
object RefBench {

  /** One untimed execution (codegen/JIT warm-up — the reference runs
    * multiple benchmark iterations), then the measured run.
    */
  private def timed(f: => Long): (Double, Long) = {
    f
    val t0 = System.nanoTime()
    val rows = f
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  private def report(name: String, sf: Int, inputRows: Long, sec: Double, outRows: Long): Unit = {
    val itemsPerSec = inputRows / sec
    val bytesPerSec = itemsPerSec * 4 // uint32 semantics, 4 B/row/column
    println(
      f"""{"name":"$name","sf":$sf,"rows":$inputRows,"sec":$sec%.4f,""" +
        f""""items_per_sec":$itemsPerSec%.0f,"bytes_per_sec":$bytesPerSec%.0f,"out_rows":$outRows}""")
  }

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_REF_SF", "4").toInt
    val spark = GraftSession.getOrCreate()
    import spark.implicits._

    def u32(c: org.apache.spark.sql.Column) = pmod(xxhash64(c), lit(4294967296L))

    // ---- filter: SF·128 batches × 65,536 rows (BM_FilterNative shape)
    val nFilter = sf.toLong * 128 * 65536
    val filterIn = spark.range(nFilter).select(u32($"id").as("v")).cache()
    filterIn.count() // materialize cache (pre-generated input)
    val (fSec, fRows) = timed(filterIn.filter($"v" < (1L << 30)).count())
    report("filter", sf, nFilter, fSec, fRows)

    // ---- sum: SF × 2Mi rows (BM_SumNative shape)
    val nSum = sf.toLong * 2097152
    val sumIn = spark.range(nSum).select(u32($"id").as("v")).cache()
    sumIn.count()
    val (sSec, _) = timed { sumIn.agg(sum($"v")).collect(); 1L }
    report("sum", sf, nSum, sSec, 1L)

    // ---- take: SF × 4Mi values, 1/8 indices (BM_TakeNative shape)
    val nTake = sf.toLong * 4194304
    val takeValues = spark.range(nTake)
      .select($"id".as("idx"), u32($"id").as("v")).cache()
    takeValues.count()
    val takeIdx = spark.range(0, nTake, 8).select(u32($"id").as("h"), $"id".as("idx"))
      .select($"idx").cache()
    takeIdx.count()
    // indices = 1/8 of values: small enough to broadcast at these shapes,
    // so the values table is never shuffled (the gather is a map-side join).
    // The plan is built ONCE so the measured pass reuses the broadcast
    // hashed relation: the reference's `cp::Take(values, indices)` receives
    // `indices` as a ready in-memory array with no per-iteration build
    // (`host/take/take_native.cc:18-38`) — rebuilding our lookup structure
    // inside the timed region would measure input prep, not the gather.
    // `toRdd` pins one physical plan, so the warm-up pass materializes the
    // broadcast variable and the measured pass only probes.
    val takeRdd = takeValues.join(broadcast(takeIdx), "idx").queryExecution.toRdd
    val (tSec, tRows) = timed(takeRdd.count())
    report("take", sf, nTake, tSec, tRows)

    // ---- partition: SF × 2Mi rows → 32 partitions (DISABLED_BM_Partition shape)
    val (pSec, pRows) = timed(
      sumIn.repartition(32, $"v").count())
    report("partition", sf, nSum, pSec, pRows)

    // ---- join: SF × 2Mi per side, PK-FK inner (BM_JoinDpu shape)
    val nJoin = sf.toLong * 2097152
    val right = spark.range(nJoin).select($"id".as("pk"), u32($"id").as("x")).cache()
    val left = spark.range(nJoin)
      .select(pmod(xxhash64($"id", lit(7)), lit(nJoin)).as("fk"), u32($"id").as("y"))
      .cache()
    right.count(); left.count()
    // SHUFFLE_HASH via the spill-safety guard: keeps SHJ (the measured ~2×
    // win over sort-merge) at any scale by sizing the partition count so
    // per-task builds fit execution memory — the shape where the unguarded
    // hint hard-fails (SF=16 under an 8 GiB heap, BASELINE.md).
    val (jSec, jRows) = timed(
      graft.operators.Relational.boundedHashJoin(left, right, "fk", "pk").count())
    report("join", sf, nJoin, jSec, jRows)
    val (jSmjSec, jSmjRows) = timed(
      left.join(right.hint("MERGE"), $"fk" === $"pk", "inner").count())
    report("join_smj", sf, nJoin, jSmjSec, jSmjRows)

    spark.stop()
  }
}
