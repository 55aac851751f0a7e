package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory with scale-oriented defaults.
  *
  * The reference engine (upmem/dpu_olap) hand-schedules batches onto DPUs
  * (`host/filter/filter_dpu.cc:126-128`); here the equivalent knobs are the
  * shuffle-partition count and AQE, which re-plans partition counts / skew
  * joins at runtime — the behavior a 1000-executor cluster needs.
  */
object GraftSession {

  /** Tuned builder; caller may override anything before `.getOrCreate()`. */
  def builder(master: String = s"local[${defaultCpus}]"): SparkSession.Builder =
    SparkSession
      .builder()
      .withExtensions(new GraftExtensions)
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", defaultCpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
