package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule engine (the Deequ-shaped check surface):
  * a rule is a NAME plus a row-level pass predicate; `evaluate` compiles
  * every rule into ONE aggregate pass over the input — per-rule
  * conditional counters, map-side combinable, no per-rule rescan — and
  * unpivots the 1-row result into the (rule, n_rows, n_pass, n_fail)
  * report a quality dashboard ingests. At 100 TB the cost is one scan
  * regardless of rule count; cross-table rules (referential integrity)
  * enter as predicates over a pre-joined flag column, so the join is
  * planned once, by Catalyst, alongside everything else.
  */
object DataQuality {

  def evaluate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "DataQuality.evaluate: no rules")
    // rule names are spliced into the stack() SQL below as literals and
    // backticked aliases — restrict them to identifier characters so a
    // quote/backtick/comma can't break parsing or mislabel a row
    rules.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+"),
        s"DataQuality.evaluate: rule name '$name' must match [A-Za-z0-9_]+")
    }
    // coalesce: on EMPTY input count() is 0 but sum() is NULL — the report
    // must read 0 passed / 0 failed, not NULL
    val aggs = count(lit(1)).as("__n") +: rules.map { case (name, pred) =>
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L))
        .as(s"__pass_$name")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row: one output row per rule
    val stackExpr = rules.map { case (name, _) =>
      s"'$name', `__pass_$name`"
    }.mkString(s"stack(${rules.size}, ", ", ", ") as (rule, n_pass)")
    one.select(col("__n"), expr(stackExpr))
      .select(col("rule"), col("__n").as("n_rows"), col("n_pass"),
        (col("__n") - col("n_pass")).as("n_fail"))
      .orderBy("rule")
  }
}
