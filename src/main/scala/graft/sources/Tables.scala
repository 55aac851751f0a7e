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
  /** Schema-adaptive events loader: the driver has shipped `events.parquet`
    * with both TIMESTAMP(NANOS) and timestamp[us] encodings across rounds, so
    * the loader branches on the *loaded* `ts` type instead of assuming one —
    * the same discipline as the reference's transfer layer, which reads the
    * byte width from the type layout rather than hard-coding it
    * (`host/dpuext/arrow_utils.cc:41-45` `get_byte_width`,
    * `host/partition/partition.h:33-40`).
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so with
    *    `nanosAsLong` the column surfaces as `LongType` epoch nanos; truncate
    *    to microseconds with INTEGER division (`div`) — epoch nanos (~1.7e18)
    *    exceed double's 2^53 exact range, so a float `/ 1000` rounds and lands
    *    one µs off for ~13% of rows (measured: 127/1000 at sf0.001).
    *  - timestamp[us] without tz: loads as `TimestampNTZType`; cast to
    *    session-local `TimestampType` — the library pins the session to UTC
    *    (`engine/GraftSession.scala`), so the cast is wall-clock identity and
    *    `to_date`/window/epoch semantics match both the old nanos path and the
    *    DuckDB oracle (which reads the file as naive TIMESTAMP).
    *  - timestamp[us] with tz (`TimestampType`): already the target type.
    *
    * `nanosAsLong` is a session-level legacy flag with no per-read option;
    * it is inert for non-NANOS files, so setting it unconditionally is safe.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected nanos-as-long, timestamp_ntz, or timestamp")
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
