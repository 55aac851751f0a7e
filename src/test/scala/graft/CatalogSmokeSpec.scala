package graft

/** Whole-catalog guard: every SparkEntry query executes at sf0.001, and
  * the oracle map never references a missing query (the driver's
  * correctness gate fails silently on either).
  */
class CatalogSmokeSpec extends SparkTestBase {

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every catalog query executes without error at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf0001).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("queries with oracles return at least one row at sf0.001") {
    val empty = SparkEntry.oracleSql.keySet.toSeq.sorted.filter { name =>
      SparkEntry.queries(name)(spark, sf0001).isEmpty
    }
    assert(empty.isEmpty, s"oracled queries with empty results: $empty")
  }
}
