package graft

import org.apache.spark.sql.functions._

import graft.engine.GraftSession

/** Reference-shaped micro-benchmark — the workload shapes of BASELINE.md's
  * benchmark matrix (uint32 columns, 65,536-row batch granularity), with
  * inputs pre-generated and cached in memory so only operator time is
  * measured (the reference's measure-loop discipline,
  * `host/filter/filter_benchmark.cc:30-49`). Emits one Google-Benchmark-ish
  * JSON line per operator: wall sec, items/s, logical uint32 bytes/s.
  *
  * Measurement discipline (round-5 hardening):
  *  - each op runs once untimed (codegen/JIT warm-up) then THREE measured
  *    iterations, reporting the MIN — the reference runs repeated benchmark
  *    iterations for the same reason, and min-of-N is the standard
  *    noise-floor estimator for a fixed workload;
  *  - each section's cached inputs are unpersisted before the next section
  *    starts: the ops are independent, and leaving earlier caches pinned
  *    made later sections measure under arbitrary memory pressure
  *    (partition varied 1.2–6.6 s across rounds for the identical plan).
  *
  * Usage: SPARK_GRAFT_REF_SF=4 runMain graft.RefBench
  *   filter: SF·128 × 65,536 rows, predicate v < 2^30  (BM_FilterNative)
  *   sum:    SF × 2,097,152 rows                        (BM_SumNative)
  *   take:   SF × 4,194,304 values, 1/8 indices         (BM_TakeNative)
  *   partition: SF × 2,097,152 rows → 32 partitions     (BM_Partition)
  *   join:   SF × 2,097,152 rows per side, PK–FK inner  (BM_JoinDpu shape)
  */
object RefBench {

  /** One untimed execution (warm-up), then `iters` measured runs; returns
    * (min seconds, rows from the last run).
    *
    * `warmups` (round-13 hardening): the join section measured 2-3× its
    * own historical envelope on some runs with min-of-3 — profiling
    * (bench.JoinProfile) showed zero spills but cumulative task time 3×
    * higher on early iterations: the C2-compiled codegen isn't hot after
    * one pass of a 33M-row sort-merge, and GC debt from earlier sections'
    * caches lands mid-sort. A GC quiesce before the timed loop plus a
    * second warm-up pass returns the measurement to its envelope — the
    * analog of the reference running every baseline in a FRESH process
    * (`scripts/run-python-baselines.sh`, `baseline/join.py:113-116`),
    * which this single-JVM harness cannot do.
    */
  /** `SPARK_GRAFT_REF_ITERS` raises every section's measured-iteration
    * count (default 3; the r18 verdict's re-anchored pairing records the
    * headline min-of-5 both sides in one sitting).
    */
  private val envIters =
    sys.env.get("SPARK_GRAFT_REF_ITERS").map(_.toInt)

  private def timed(f: => Long, iters0: Int = 3, warmups: Int = 1): (Double, Long) = {
    val iters = envIters.getOrElse(iters0)
    var w = 0
    while (w < warmups) { f; w += 1 }
    System.gc()
    var best = Double.MaxValue
    var rows = 0L
    var i = 0
    while (i < iters) {
      val t0 = System.nanoTime()
      rows = f
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
      i += 1
    }
    (best, rows)
  }

  private def report(name: String, sf: Int, inputRows: Long, sec: Double, outRows: Long): Unit = {
    val itemsPerSec = inputRows / sec
    val bytesPerSec = itemsPerSec * 4 // uint32 semantics, 4 B/row/column
    // ROOT locale: the line is JSON, and the `f` interpolator's
    // locale-sensitive decimal separator must not depend on the JVM default
    def num(v: Double, decimals: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))
    println(
      s"""{"name":"$name","sf":$sf,"rows":$inputRows,"sec":${num(sec, 4)},""" +
        s""""items_per_sec":${num(itemsPerSec, 0)},"bytes_per_sec":${num(bytesPerSec, 0)},"out_rows":$outRows}""")
  }

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_REF_SF", "4").toInt
    // SPARK_GRAFT_REF_SECTIONS=take,join — run a subset of sections (the
    // SF=64 sweeps target one section; dragging 134M-row join iterations
    // behind a take measurement wastes an hour per data point). Default:
    // all sections, unchanged.
    val sections = sys.env.get("SPARK_GRAFT_REF_SECTIONS")
      .map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("filter", "sum", "take", "partition", "join", "spj"))
    def section(name: String)(body: => Unit): Unit =
      if (sections.contains(name)) body
    val spark = GraftSession.getOrCreate()
    import spark.implicits._

    def u32(c: org.apache.spark.sql.Column) = pmod(xxhash64(c), lit(4294967296L))

    section("filter") {
    // ---- filter: SF·128 batches × 65,536 rows (BM_FilterNative shape)
    val nFilter = sf.toLong * 128 * 65536
    val filterIn = spark.range(nFilter).select(u32($"id").as("v")).cache()
    filterIn.count() // materialize cache (pre-generated input)
    val (fSec, fRows) = timed(filterIn.filter($"v" < (1L << 30)).count())
    report("filter", sf, nFilter, fSec, fRows)
    filterIn.unpersist(blocking = true)
    }

    val nSum = sf.toLong * 2097152
    section("sum") {
    // ---- sum: SF × 2Mi rows (BM_SumNative shape)
    val sumIn = spark.range(nSum).select(u32($"id").as("v")).cache()
    sumIn.count()
    val (sSec, _) = timed { sumIn.agg(sum($"v")).collect(); 1L }
    report("sum", sf, nSum, sSec, 1L)
    sumIn.unpersist(blocking = true)
    }

    section("take") {
    // ---- take: SF × 4Mi values, 1/8 indices (BM_TakeNative shape)
    val nTake = sf.toLong * 4194304
    val takeValues = spark.range(nTake)
      .select($"id".as("idx"), u32($"id").as("v")).cache()
    takeValues.count()
    val takeIdx = spark.range(0, nTake, 8).select($"id".as("idx")).cache()
    takeIdx.count()
    // HEADLINE take = the sequential merge gather: the reference's
    // `cp::Take(values, indices)` receives `indices` as a ready in-memory
    // array with no per-iteration build (`host/take/take_native.cc:18-38`),
    // so the sorted index array is prepared once OUTSIDE the timed region —
    // preparing it inside would measure input prep, not the gather. One
    // pointer compare per row, matches-only row copies: measured at pyarrow
    // take parity (BASELINE.md).
    val idxArr = takeIdx.as[Long].collect()
    java.util.Arrays.sort(idxArr)
    val mergeRdd = graft.operators.PositionalTake
      .mergeTake(takeValues, idxArr).queryExecution.toRdd
    val (tSec, tRows) = timed(mergeRdd.count())
    report("take", sf, nTake, tSec, tRows)
    // secondary row: the general join gather (the 100 TB path when the
    // index side outgrows host/executor memory). Indices = 1/8 of values:
    // small enough to broadcast here, so the values table is never shuffled
    // (a map-side join). `toRdd` pins one physical plan, so the warm-up
    // pass materializes the broadcast hashed relation and the measured
    // passes only probe.
    val takeRdd = takeValues.join(broadcast(takeIdx), "idx").queryExecution.toRdd
    val (tjSec, tjRows) = timed(takeRdd.count())
    report("take_join", sf, nTake, tjSec, tjRows)
    // third row: the DISTRIBUTED merge gather — range-shuffles only the
    // index list to the values partitions' own boundaries, merges
    // per-partition (no broadcast build, no hash probe). The alternative
    // that keeps scaling past take_join's broadcast knee (SF=64: a
    // 33.5M-key hashed relation per executor; this ships nothing).
    val distRdd = graft.operators.PositionalTake
      .mergeTakeDist(takeValues, takeIdx, "idx").queryExecution.toRdd
    val (tdSec, tdRows) = timed(distRdd.count())
    report("take_merge_dist", sf, nTake, tdSec, tdRows)
    takeValues.unpersist(blocking = true)
    takeIdx.unpersist(blocking = true)
    }

    section("partition") {
    // ---- partition: SF × 2Mi rows → 32 partitions (DISABLED_BM_Partition shape)
    val partIn = spark.range(nSum).select(u32($"id").as("v")).cache()
    partIn.count()
    val (pSec, pRows) = timed(partIn.repartition(32, $"v").count())
    report("partition", sf, nSum, pSec, pRows)
    partIn.unpersist(blocking = true)
    }

    section("join") {
    // ---- join: SF × 2Mi per side, PK-FK inner (BM_JoinDpu shape)
    val nJoin = sf.toLong * 2097152
    val right = spark.range(nJoin).select($"id".as("pk"), u32($"id").as("x")).cache()
    val left = spark.range(nJoin)
      .select(pmod(xxhash64($"id", lit(7)), lit(nJoin)).as("fk"), u32($"id").as("y"))
      .cache()
    right.count(); left.count()
    // HEADLINE join = sort-merge + AQE, the plan GraftSession defaults pick.
    // Measured at SF=16 under both 8 GiB and 32 GiB heaps (BASELINE.md),
    // SMJ beats the sized-partition guarded SHJ at this shape and never
    // hard-fails; the guard ([[graft.operators.Relational.boundedHashJoin]])
    // stays OPT-IN for builds known to fit, reported below for tracking.
    val (jSec, jRows) = timed(
      left.join(right.hint("MERGE"), $"fk" === $"pk", "inner").count(),
      warmups = 2)
    report("join", sf, nJoin, jSec, jRows)
    val (jShjSec, jShjRows) = timed(
      graft.operators.Relational.boundedHashJoin(left, right, "fk", "pk").count(),
      warmups = 2)
    report("join_shj_guarded", sf, nJoin, jShjSec, jShjRows)
    right.unpersist(blocking = true)
    left.unpersist(blocking = true)

    // ---- join, co-located inputs: both sides repartitioned on the join
    // key and sorted WITHIN partitions before caching — InMemoryRelation
    // preserves its child's outputPartitioning/outputOrdering, so the
    // sort-merge join plans with NO exchange and NO per-run sort: the
    // merge alone. This is the bucketed-table execution shape (see
    // q_bucketed_join) materialized in RAM — the 100 TB path where both
    // fact tables are bucket-partitioned on the join key at write time
    // and every subsequent join is shuffle-free. Reported beside the
    // headline (which pays shuffle+sort every run) to quantify what
    // co-location buys at this shape.
    val rightCo = spark.range(nJoin).select($"id".as("pk"), u32($"id").as("x"))
      .repartition(32, $"pk").sortWithinPartitions($"pk").cache()
    val leftCo = spark.range(nJoin)
      .select(pmod(xxhash64($"id", lit(7)), lit(nJoin)).as("fk"), u32($"id").as("y"))
      .repartition(32, $"fk").sortWithinPartitions($"fk").cache()
    rightCo.count(); leftCo.count()
    val (jCoSec, jCoRows) = timed(
      leftCo.join(rightCo.hint("MERGE"), $"fk" === $"pk", "inner").count(),
      warmups = 2)
    report("join_colocated", sf, nJoin, jCoSec, jCoRows)
    rightCo.unpersist(blocking = true)
    leftCo.unpersist(blocking = true)
    }

    section("spj") {
    // ---- storage-partitioned join A/B (q_dsv2_spj's layout, measured):
    // the same fact ⋈ tiny-dim merge join on mod7, three ways.
    //   spj_keyed     — both scans declare KeyGroupedPartitioning
    //                   (identity(mod7)): ZERO exchanges, per-partition
    //                   sort + merge. Parallelism = the layout's 7
    //                   residue classes (a real table buckets to the
    //                   cluster width; 7 is this synthetic layout's).
    //   spj_shuffle   — identical join, layout undeclared, MERGE forced:
    //                   every fact row crosses an exchange first — the
    //                   cost SPJ deletes.
    //   spj_broadcast — the plan the optimizer picks for a TINY dim. At
    //                   fact×fact scale broadcast is impossible and the
    //                   honest comparison is keyed vs shuffle; reported
    //                   to show keyed rides at broadcast-class cost
    //                   without needing a broadcastable side.
    val nSpj = sf.toLong * 8388608
    def seq(n: Long, keyed: Boolean) = spark.read
      .format("graft.sources.v2.SeqSource")
      .option("n", n).option("slices", 32).option("keyed", keyed).load()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val dimK = seq(7, keyed = true).select($"mod7", $"cents".as("dc"))
    val factK = seq(nSpj, keyed = true)
    val (kSec, kRows) = timed(
      factK.join(dimK.hint("MERGE"), "mod7").count(), warmups = 2)
    report("spj_keyed", sf, nSpj, kSec, kRows)
    val dimU = seq(7, keyed = false).select($"mod7", $"cents".as("dc"))
    val factU = seq(nSpj, keyed = false)
    val (uSec, uRows) = timed(
      factU.join(dimU.hint("MERGE"), "mod7").count(), warmups = 2)
    report("spj_shuffle", sf, nSpj, uSec, uRows)
    val (bSec, bRows) = timed(
      factU.join(broadcast(dimU), "mod7").count(), warmups = 2)
    report("spj_broadcast", sf, nSpj, bSec, bRows)
    //   spj_keyed32   — the WIDTH KNOB measured: same zero-shuffle merge
    //                   join with the layout declared at 32 buckets
    //                   (`buckets` option) instead of 7. The r16
    //                   executor-width sweep showed spj_keyed flat past
    //                   ~7 cores because SPJ parallelism equals the
    //                   layout's cluster count; this leg demonstrates
    //                   that re-bucketing the WRITE, not adding cores, is
    //                   what unlocks the scan — the claim a 1000-executor
    //                   bucketed table rests on.
    def seq32(n: Long) = spark.read
      .format("graft.sources.v2.SeqSource")
      .option("n", n).option("slices", 32)
      .option("keyed", true).option("buckets", 32).load()
    val dim32 = seq32(32).select($"mod32", $"cents".as("dc"))
    val fact32 = seq32(nSpj)
    val (k32Sec, k32Rows) = timed(
      fact32.join(dim32.hint("MERGE"), "mod32").count(), warmups = 2)
    report("spj_keyed32", sf, nSpj, k32Sec, k32Rows)
    }

    spark.stop()
  }
}
