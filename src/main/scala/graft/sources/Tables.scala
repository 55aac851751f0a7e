package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the driver-provided testdata star schema
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * The reference generates batches in memory (`host/generator/generator.cc:22-30`);
  * our source is a real columnar file scan so Catalyst gets predicate pushdown
  * and column pruning for free — the manual single-column DPU copy of the
  * reference (`host/dpuext/arrow_utils.cc:47-73`) is subsumed by parquet
  * `ReadSchema` pruning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark's vectorized reader rejects; read nanos as long and truncate to
    * microseconds (exactly what engines with native µs timestamps do).
    *
    * Truncation is INTEGER division (`div`): epoch nanos (~1.7e18) exceed
    * double's 2^53 exact range, so the old `/ 1000` float path rounded the
    * nanos before dividing and produced a microsecond value off by one for
    * ~13% of rows — silently diverging from any engine that truncates
    * integers (measured on the sf0.001 events: 127/1000 rows).
    *
    * `nanosAsLong` is a session-level legacy flag with no per-read option;
    * setting it here means later TIMESTAMP(NANOS) reads in the session
    * also surface as longs — acceptable for this library's sessions, where
    * every nanos read goes through this loader.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
