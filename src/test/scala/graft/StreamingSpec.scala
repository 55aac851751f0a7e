package graft

import graft.sources.Tables
import graft.streaming.EventsPipeline

/** Structured Streaming path: the streaming windowed aggregation over the
  * events table must agree with its batch twin (used by the q_events_window
  * oracle query).
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming windowed agg converges to the batch result") {
    // The streaming source reads the same parquet directory; Tables.events
    // sets the nanosAsLong conf, but readStream needs an explicit schema,
    // so stage the events as microsecond-timestamp parquet first.
    val staged = java.nio.file.Files.createTempDirectory("graft_events").toString
    Tables.events(spark, sf0001).write.mode("overwrite").parquet(staged)

    val q = EventsPipeline.streamingWindowedAgg(spark, staged, "stream_out")
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_out")
        .select("window_start", "event_type", "n_events", "sum_value")
        .as[(Long, String, Long, Double)].collect().toSet
      val batch = EventsPipeline.windowedAgg(Tables.events(spark, sf0001))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("sessionization: session count bounded by event count, monotone seq") {
    val s = EventsPipeline.sessionize(Tables.events(spark, sf0001))
    val bad = s.filter($"session_seq" < 1).count()
    assert(bad == 0)
    val perUser = s.groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.max($"session_seq").as("ns"),
        org.apache.spark.sql.functions.count($"event_id").as("ne"))
      .filter($"ns" > $"ne").count()
    assert(perUser == 0)
  }
}
