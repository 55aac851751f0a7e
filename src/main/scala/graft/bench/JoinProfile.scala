package graft.bench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.GraftSession

/** One-off profiling harness for the HEADLINE PK–FK join shape
  * (BASELINE.md: SF × 2,097,152 uint32 rows per side, inner join) —
  * answers "where does the wall time go" with per-iteration stage
  * metrics (task time, shuffle bytes, SPILLS — the usual suspect when
  * min-of-3 roams) and A/B's the cheap levers from the round-12 verdict:
  *
  *   base   — sort-merge + AQE exactly as RefBench measures it
  *   advN   — AQE advisoryPartitionSizeInBytes variants
  *   presort— both sides repartitioned on the key and sorted WITHIN
  *            partitions BEFORE caching: InMemoryRelation preserves its
  *            child's outputPartitioning/outputOrdering, so the SMJ
  *            plans with NO exchange and NO sort — the merge alone
  *            (the bucketed-table execution shape, materialized in RAM)
  *   shj    — the guarded shuffled-hash path for comparison
  *
  * Usage: SPARK_GRAFT_REF_SF=16 runMain graft.bench.JoinProfile [iters]
  */
object JoinProfile {

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_REF_SF", "16").toInt
    val iters = if (args.nonEmpty) args(0).toInt else 3
    val spark = GraftSession.getOrCreate()
    import spark.implicits._
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    def u32(c: org.apache.spark.sql.Column) = pmod(xxhash64(c), lit(4294967296L))
    val nJoin = sf.toLong * 2097152

    def profile(name: String, df: => DataFrame): Unit = {
      // warm-up (codegen, broadcast/exchange materialization) — also
      // report which join operator the FINAL adaptive plan chose, so an
      // A/B section can't silently measure the wrong physical join
      locally {
        val w = df
        w.count()
        val node = w.queryExecution.executedPlan.toString
          .linesIterator.map(_.trim)
          .find(l => l.contains("SortMergeJoin") ||
            l.contains("ShuffledHashJoin") || l.contains("BroadcastHashJoin"))
          .getOrElse("?")
        println(f"$name%-28s plan-join: ${node.take(110)}")
      }
      var i = 0
      while (i < iters) {
        val before = listener.snapshot()
        val t0 = System.nanoTime()
        val rows = df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val d = listener.snapshot() - before
        println(f"$name%-28s iter=$i wall=$sec%.3fs rows=$rows ${d.render}")
        i += 1
      }
    }
    def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
      val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val right = spark.range(nJoin).select($"id".as("pk"), u32($"id").as("x")).cache()
    val left = spark.range(nJoin)
      .select(pmod(xxhash64($"id", lit(7)), lit(nJoin)).as("fk"), u32($"id").as("y"))
      .cache()
    right.count(); left.count()

    profile("base_smj", left.join(right.hint("MERGE"), $"fk" === $"pk", "inner"))

    for (adv <- Seq("16MB", "64MB", "256MB")) {
      val saved = spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", adv)
      try profile(s"smj_adv_$adv",
        left.join(right.hint("MERGE"), $"fk" === $"pk", "inner"))
      finally saved match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", v)
        case None => spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      }
    }

    profile("shj_guarded",
      graft.operators.Relational.boundedHashJoin(left, right, "fk", "pk"))

    // r13 verdict #3: the conf-driven SHJ path — preferSortMergeJoin=false
    // lets the planner pick ShuffledHashJoin when a side's per-partition
    // build fits (canBuildLocalHashMap: stats < shuffledHashJoinFactor ×
    // advisoryPartitionSizeInBytes); the PK-FK shape (unique build keys,
    // no spill risk at SF=16) is exactly where SHJ skips BOTH sort legs
    for (factor <- Seq("3", "9")) {
      withConf(
        "spark.sql.join.preferSortMergeJoin" -> "false",
        "spark.sql.shuffledHashJoinFactor" -> factor) {
        profile(s"shj_conf_f$factor",
          left.join(right, $"fk" === $"pk", "inner"))
      }
    }
    // bare hint (no guard, no conf): the planner builds the hinted side
    profile("shj_hint",
      left.join(right.hint("SHUFFLE_HASH"), $"fk" === $"pk", "inner"))
    // SMJ re-measured LAST in the same sitting so the A/B brackets it —
    // if the box drifted during this run, base_smj(start) vs smj_end
    // exposes it
    profile("smj_end",
      left.join(right.hint("MERGE"), $"fk" === $"pk", "inner"))

    // pre-sorted cached inputs: exchange-free, sort-free merge
    val rightSorted = spark.range(nJoin).select($"id".as("pk"), u32($"id").as("x"))
      .repartition(32, $"pk").sortWithinPartitions($"pk").cache()
    val leftSorted = spark.range(nJoin)
      .select(pmod(xxhash64($"id", lit(7)), lit(nJoin)).as("fk"), u32($"id").as("y"))
      .repartition(32, $"fk").sortWithinPartitions($"fk").cache()
    rightSorted.count(); leftSorted.count()
    profile("smj_presorted_cache",
      leftSorted.join(rightSorted.hint("MERGE"), $"fk" === $"pk", "inner"))
    val plan = leftSorted.join(rightSorted.hint("MERGE"), $"fk" === $"pk", "inner")
      .queryExecution.executedPlan.toString
    println("presorted plan has Exchange: " + plan.contains("Exchange")
      + ", extra Sort: " + ("(?m)^\\s*[+:]?-? *Sort ".r.findAllIn(plan).size))

    spark.stop()
  }
}
