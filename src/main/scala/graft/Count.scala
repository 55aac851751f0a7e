package graft

import graft.engine.GraftSession

/** Output-cardinality probe: run catalog queries and print ONLY their
  * output row counts — the evidence line for slope analysis (a wall-time
  * slope above linear is meaningless until you know whether the OUTPUT
  * grew; pair-family rows under a replicated fixture grow quadratically
  * by construction, and this is the cheap way to measure that instead of
  * arguing it).
  *
  * Usage: runMain graft.Count <sfDir> <query>[,<query>...]
  */
object Count {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Count <sfDir> <q1>[,<q2>...]")
    val spark = GraftSession.getOrCreate()
    val dir = args(0)
    args(1).split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(s"""{"query":"$name","sf":"$dir","out_rows":$n}""")
    }
    spark.stop()
  }
}
