package graft

import graft.engine.GraftSession

/** Plan auditor: prints the formatted physical plan of each named query
  * (all queries when no args) so scan pruning (`ReadSchema`), predicate
  * pushdown (`PushedFilters`), broadcast vs shuffle joins, and
  * whole-stage-codegen spans can be reviewed.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate()
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
