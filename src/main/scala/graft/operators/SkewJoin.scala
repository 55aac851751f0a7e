package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions — the manual complement
  * to AQE's skew-join splitting, for when a handful of hot keys would pin
  * single tasks at 100 TB (AQE only splits post-shuffle partitions of
  * sort-merge joins; salting also covers shuffled-hash and pre-aggregation).
  *
  * Left (fact, skewed) rows get a random salt in [0, saltFactor); right
  * (dimension) rows are replicated once per salt value. The join key
  * becomes (key, salt), spreading each hot key over `saltFactor` tasks.
  * Row multiset of the result is identical to the unsalted join.
  */
object SkewJoin {

  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      saltFactor: Int = 16): DataFrame = {
    // the internal salt column would silently overwrite (then drop) a
    // same-named user column — fail fast instead of destroying data
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedInnerJoin: inputs must not carry a reserved __salt column")
    val salted = left.withColumn(
      "__salt", (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = right.withColumn(
      "__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted
      .join(replicated,
        salted(leftKey) === replicated(rightKey) &&
          salted("__salt") === replicated("__salt"),
        "inner")
      .drop(salted("__salt"))
      .drop(replicated("__salt"))
  }
}
