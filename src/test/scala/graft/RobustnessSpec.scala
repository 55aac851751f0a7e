package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.{Dedup, Similarity, TextAnalysis}
import graft.functions.GraftFunctions._
import graft.operators.{PositionalTake, Relational}

/** Degenerate-input robustness: nulls, empties, and empty frames must not
  * crash any operator (the reference never faces these — its generator
  * produces non-null uint32 only, SURVEY §1.2 — but a real pipeline does).
  */
class RobustnessSpec extends SparkTestBase {
  import spark.implicits._

  private def docsWithNulls = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(0L, "hello world hello"),
        org.apache.spark.sql.Row(1L, null),
        org.apache.spark.sql.Row(2L, ""),
        org.apache.spark.sql.Row(3L, "   ")),
      schema)
  }

  test("null/empty text flows through tokens, shingles, simhash, fingerprints") {
    val out = docsWithNulls.select(
      $"doc_id",
      tokenCount($"text").as("n"),
      charShingles($"text", 5).as("cs"),
      wordShingles($"text", 3).as("ws"),
      simhash64(tokens(lower($"text"))).as("sh"),
      rollingFingerprint($"text").as("fp"))
    val rows = out.orderBy("doc_id").collect()
    assert(rows.length == 4)
    assert(rows(0).getAs[Int]("n") == 3)
    // null text -> null outputs (never exceptions)
    assert(rows(1).isNullAt(rows(1).fieldIndex("n")) || rows(1).getAs[Int]("n") == 0)
    assert(rows(2).getAs[Int]("n") == 0)
    assert(rows(3).getAs[Int]("n") == 0)
  }

  test("dedup operators tolerate null text rows") {
    assert(Dedup.exact(docsWithNulls, "doc_id", "text").count() >= 3)
    assert(Dedup.minhashPairs(docsWithNulls, "doc_id", "text").count() >= 0)
    assert(Dedup.simhashPairs(docsWithNulls, "doc_id", "text").count() >= 0)
    assert(Dedup.ngramJaccardPairs(docsWithNulls, "doc_id", "text").count() >= 0)
    // null strings never pair (explode of the null variant array drops the
    // row); empty strings pair only with other empties at dist 0
    assert(Dedup.editDistancePairs(docsWithNulls, "doc_id", "text").count() >= 0)
    val empties = Seq((1L, ""), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val pairs = Dedup.editDistancePairs(empties, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
  }

  test("language id / quality stats on null and empty text") {
    val langs = docsWithNulls
      .select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.get(0) -> r.get(1)).toMap
    assert(langs(2L) == "und")
    assert(TextAnalysis.qualityStats(docsWithNulls, "doc_id", "text").count() == 4)
  }

  test("operators on empty input frames return empty, not errors") {
    val empty = spark.emptyDataset[(Long, Double)].toDF("k", "v")
    assert(Relational.filterCompact(empty, $"v" > 0, Seq("v")).count() == 0)
    assert(Relational.hashPartition(empty, 4, "k").count() == 0)
    assert(Relational.sumAgg(empty, "v").as[Option[Double]].head().isEmpty)
    assert(PositionalTake.withGlobalIndex(empty, Seq("k")).count() == 0)
    val emptyDocs = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exact(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minhashPairs(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("cosine on zero vectors is 0, never NaN or divide error") {
    val vecs = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", Seq(1.0, 0.0), 2)
      .as[(Long, Double)].collect().toMap
    assert(out(0L) == 0.0)
    assert(out(1L) == 1.0)
  }

  test("pagerank on an empty edge list returns empty, not an error") {
    val empty = spark.emptyDataset[(Long, Long)].toDF("src", "dst")
    assert(graft.ext.PageRank.run(empty, "src", "dst", iterations = 3).count() == 0)
  }

  test("sketch probes pass nulls through as null (codegen and interpreted)") {
    import graft.functions.NativeExpressions
    val keys = Seq(Some(1L), None, Some(42L)).toDF("k")
    val bytes = graft.functions.GraftFunctions
      .buildBloom(keys.filter($"k".isNotNull), "k")
    // codegen'd path (DataFrame projection): null in → null out, keys → true
    val probed = keys
      .select($"k", NativeExpressions.bloom_might_contain($"k", bytes).as("hit"))
      .collect().map(r => (r.get(0), r.get(1)))
    assert(probed.contains((1L, true)) && probed.contains((42L, true)))
    assert(probed.exists { case (k, h) => k == null && h == null })
    // interpreted path — the route Spark silently falls back to when
    // codegen compilation fails — exercised by direct eval
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.LongType
    assert(NativeExpressions.BloomMightContain(Literal(42L), bytes)
      .eval(InternalRow.empty) == true)
    assert(NativeExpressions
      .BloomMightContain(Literal.create(null, LongType), bytes)
      .eval(InternalRow.empty) == null)
    val strs = Seq(Some("view"), None).toDF("s")
    val sk = strs.filter($"s".isNotNull)
      .agg(org.apache.spark.sql.functions.expr(
        "count_min_sketch(s, 0.01d, 0.99d, 7)"))
      .head().getAs[Array[Byte]](0)
    val est = strs
      .select($"s", NativeExpressions.cms_estimate($"s", sk).as("e"))
      .collect().map(r => (r.get(0), r.get(1)))
    assert(est.contains(("view", 1L)))
    assert(est.exists { case (s, e) => s == null && e == null })
  }

  test("concurrent sessions racing a cold staged artifact build once and agree") {
    // ADVICE r10: the write-once staging builders serialize behind a
    // per-directory JVM lock — two threads hitting the same cold
    // directory must not both enter mode(overwrite) (one could replace
    // files under the other's read). Exercised through the public
    // surface: clear the pair-staging root for this corpus tag, then
    // race two q_minhash_pairs builds end to end.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    graft.engine.Fs.deleteRecursively(new java.io.File("/tmp/graft_pairs"))
    // ADVICE r11: deleting the staged root in-session violates the
    // fresh-session regeneration contract, so earlier suites' cached
    // plans over the same path (CrossCheckSpec materializes the pair
    // verdict's persisted join) could serve this test's collect() from
    // the pre-delete cache — the race would then never touch the
    // rebuilt artifacts it claims to validate. Evict everything first
    // so both racers genuinely re-list and re-read.
    SparkEntry.evictCaches(spark)
    val runs = Seq.fill(2)(Future {
      SparkEntry.queries("q_minhash_pairs")(spark, sf0001)
        .collect().map(_.toString).toSeq.sorted
    })
    val Seq(a, b) = Await.result(Future.sequence(runs), 10.minutes)
    assert(a.nonEmpty && a == b,
      "racing builds disagreed — staging is not single-writer")
  }
  test("every tag-keyed /tmp/graft_* staging root is reaper-registered") {
    // the r10 leak class: a new staged artifact root not listed in
    // SparkEntry.artifactRoots survives data regeneration as garbage.
    // Tripwire: every "/tmp/graft_<root>" literal in src/main must appear
    // in the artifactRoots literal (graft_tags is the breadcrumb dir the
    // reaper itself maintains, not a tag-keyed artifact).
    def read(f: java.io.File): String =
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
      val fs = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
      fs.filter(_.isFile).filter(_.getName.endsWith(".scala")) ++
        fs.filter(_.isDirectory).flatMap(scalaFiles)
    }
    val srcs = scalaFiles(new java.io.File("src/main/scala/graft"))
    assert(srcs.nonEmpty)
    val used = srcs.flatMap(f =>
      "\"/tmp/(graft_[a-z0-9_]+)".r.findAllMatchIn(read(f)).map(_.group(1)))
      .toSet - "graft_tags"
    val entry = read(new java.io.File("src/main/scala/graft/SparkEntry.scala"))
    val decl = entry.split("artifactRoots = Seq\\(")(1).split("\\)")(0)
    val registered = "\"(graft_[a-z0-9_]+)\"".r
      .findAllMatchIn(decl).map(_.group(1)).toSet
    val missing = used -- registered
    assert(missing.isEmpty,
      s"staging roots missing from SparkEntry.artifactRoots: $missing")
  }
}
