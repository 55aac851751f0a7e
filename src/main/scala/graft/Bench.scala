package graft

import org.apache.spark.sql.SparkSession

import graft.engine.GraftSession

/** Benchmark main — runs the full query catalog on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line
  * `{"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Mirrors the reference's measurement discipline
  * (`host/filter/filter_benchmark.cc:30-49`): a warm-up pass first so file
  * listing / code generation / JIT are excluded from the measured run, then
  * each query is executed once end-to-end. Results are materialized through
  * the `noop` sink so every output column is computed (a bare `.count()`
  * would let Catalyst prune the projection).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Warm-up: JVM/codegen/file-listing; not measured.
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val results = names.map(n => n -> materialize(n))
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
