package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Bucketing evidence for the SCALE.md co-location claim: writing both
  * join sides bucketed by the join key lets Catalyst plan the join with
  * NO exchange on the bucketed sides — the 100 TB fact-to-fact join
  * strategy (broadcast handles dims; bucketing handles fact×fact).
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed fact-to-fact join plans without a shuffle exchange") {
    // warehouse.dir is a static conf — tables land in ./spark-warehouse
    // (gitignored) under the shared test session
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // disable broadcast so the join strategy decision is real
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not re-shuffle either bucketed side
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join:\n$plan")
      val joinSubtree = plan.substring(joinIdx)
      assert(!joinSubtree.contains("Exchange hashpartitioning"),
        s"bucketed join must not exchange its inputs:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
