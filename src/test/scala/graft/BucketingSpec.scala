package graft

import graft.sources.Tables

/** Bucketing: pre-partitioned co-located joins — the at-scale answer to
  * the reference's partition-then-join pipeline (`host/join/join_dpu.cc`
  * PHASE 1): pay the shuffle once at write time, join with no exchange
  * forever after.
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed tables join with no shuffle exchange") {
    // warehouse dir is a temp dir, set statically in SparkTestBase
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.lineitem(spark, sf0001)
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables.orders(spark, sf0001)
        .select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("o_bucketed")

      val li = spark.table("li_bucketed")
      val o = spark.table("o_bucketed")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf0001).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
