package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Source/sink round-trips beyond parquet (the reference has no file
  * formats at all — SURVEY §2.3): CSV and JSON write→read preserve the
  * row multiset with explicit schemas.
  */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  private def sample = Tables.lineitem(spark, sf0001)
    .select("l_orderkey", "l_quantity", "l_returnflag")
    .limit(1000)

  test("csv round-trip preserves rows under an explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(sample.schema).csv(dir)
    assert(back.count() == 1000)
    assert(back.as[(Long, Double, String)].collect().sorted.toSeq ==
      sample.as[(Long, Double, String)].collect().sorted.toSeq)
  }

  test("json round-trip preserves rows under an explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assert(back.as[(Long, Double, String)].collect().sorted.toSeq ==
      sample.as[(Long, Double, String)].collect().sorted.toSeq)
  }

  test("hive-partitioned parquet write prunes partitions at read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf0001)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    // The partition predicate must be resolved from directory metadata,
    // not row-group scans: it shows as a PartitionFilters entry and the
    // data filters list stays free of event_type.
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains("event_type"), scan)
    val expected = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(back.count() == expected && expected > 0)
  }

  test("multimodal resize + frame sampling stages") {
    val df = Seq((0L, "some media payload bytes here")).toDF("doc_id", "text")
    val feats = graft.ext.Multimodal.featurize(df, "doc_id", "text", "video/fake")
    val out = graft.ext.Multimodal
      .sampleFrames(graft.ext.Multimodal.resizeMeta(feats, 128, 128), 4)
      .select($"width", $"height", $"resized_width", $"resized_height",
        $"n_frames", size($"frame_idx").as("k"))
      .head()
    assert(out.getAs[Int]("resized_width") <= 128)
    assert(out.getAs[Int]("resized_height") <= 128)
    val k = out.getAs[Int]("k")
    assert(k == math.min(out.getAs[Int]("n_frames"), 4))
  }
}
