package graft

import graft.engine.GraftSession

/** Plan auditor: prints the formatted physical plan of each named query
  * (all queries when no args) so scan pruning (`ReadSchema`), predicate
  * pushdown (`PushedFilters`), broadcast vs shuffle joins, and
  * whole-stage-codegen spans can be reviewed.
  *
  * Usage: runMain graft.Explain [-exec] [sfDir] [queryName ...]
  *
  * With `-exec` the query is EXECUTED (noop-collected) first and the
  * FINAL adaptive plan is printed instead of the static one — under AQE,
  * exchange reuse, broadcast demotion, and skew-split decisions only
  * exist in the executed plan, so auditing a self-join's reuse from the
  * static plan alone is misleading.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (exec, rest) = (args.contains("-exec"), args.filterNot(_ == "-exec"))
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (rest.length > 1) rest.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate()
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        if (exec) {
          // drive THIS QueryExecution to completion (a df.write would build
          // a separate one, leaving this adaptive plan unfinalized —
          // isFinalPlan=false — and hiding runtime reuse/skew decisions)
          df.queryExecution.toRdd.count(): Unit
          println(df.queryExecution.executedPlan.toString)
        } else
          println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
