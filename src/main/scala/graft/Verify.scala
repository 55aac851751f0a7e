package graft

import java.nio.file.{Files, Paths}

import graft.engine.GraftSession

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg (local iteration only; the driver passes two):
    // comma-separated query names to dump instead of the full catalog.
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val spark = GraftSession.getOrCreate()
    new java.io.File(outDir).mkdirs()
    val attempted = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    // Manifest of every query this run WILL attempt, written before any
    // query executes: the checker's fail-closed expected set. Without it,
    // a crashed rows-only query (no oracle_sql entry) leaves no dump AND
    // no expectation, and the gate would read green on a silent skip.
    Files.writeString(Paths.get(s"$outDir/attempted.json"),
      attempted.keys.toSeq.sorted
        .map(n => "\"" + n + "\"").mkString("[", ",", "]"))
    attempted.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a failed query must leave NO dump behind: outDir may be reused
        // across runs, and a stale previous dump would make the driver's
        // compare validate the old binary's output and report green for a
        // query the current build cannot execute
        // cleanup failure must not kill the verify loop: better one
        // possibly-stale dump (caught by the driver's hash compare) than
        // zero dumps for every query after this one
        try graft.engine.Fs.deleteRecursively(new java.io.File(s"$outDir/$name"))
        catch { case c: Throwable =>
          System.err.println(s"[verify] $name: stale-dump cleanup failed: $c")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
