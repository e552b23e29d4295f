package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TopKPerKeySpec extends SparkTestBase {
  import spark.implicits._

  test("custom TopKPerKeyExec matches window row_number top-k on orders") {
    val orders = graft.Tables.orders(spark, sf0001)
      .join(graft.Tables.customer(spark, sf0001), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"o_orderkey", $"o_totalprice")

    // unique tiebreak folded into ord so both formulations are
    // deterministic: price dominates, orderkey breaks ties
    val ord = $"o_totalprice" * 100000 - $"o_orderkey"
    val viaCustom = TopK.topKPerKey(orders, Seq("c_mktsegment"), ord, 3)
      .select($"c_mktsegment", $"o_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

    val w = Window.partitionBy($"c_mktsegment").orderBy(ord.desc)
    val viaWindow = orders.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3).select($"c_mktsegment", $"o_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

    assert(viaCustom === viaWindow)
    assert(viaCustom.size === 15) // 5 segments × 3
  }

  test("inputs carrying the reserved ordering-helper column are rejected") {
    val bad = Seq((1L, 2.0)).toDF("k", "__graft_topk_ord")
    val e = intercept[IllegalArgumentException] {
      TopK.topKPerKey(bad, Seq("k"), col("__graft_topk_ord"), 1)
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
  }

  test("physical plan contains the custom operator and no Sort/Window") {
    val orders = graft.Tables.orders(spark, sf0001)
    val df = TopK.topKPerKey(orders, Seq("o_orderstatus"), $"o_totalprice", 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey")) // exec node prints without the Exec suffix
    assert(plan.contains("Exchange hashpartitioning"),
      "ENSURE_REQUIREMENTS must cluster by the key")
    assert(!plan.contains("WindowExec"))
    assert(!plan.toLowerCase.contains("sortexec"), s"no sort expected:\n$plan")
    assert(df.count() === 6) // 3 statuses × 2
  }

  test("partial pass runs BELOW the exchange (map-side combine shape)") {
    val orders = graft.Tables.orders(spark, sf0001)
    val df = TopK.topKPerKey(orders, Seq("o_orderstatus"), $"o_totalprice", 2)
    // assert on the printed plan: AQE wraps the physical tree, so a
    // collect() on executedPlan cannot see inside AdaptiveSparkPlanExec
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains(", true") && s.contains(", false"),
      s"expected one partial and one final TopKPerKeyExec:\n$s")
    // plan order: final above the exchange, partial below it
    val finalIdx = s.indexOf("TopKPerKey")
    val exchangeIdx = s.indexOf("Exchange hashpartitioning")
    val partialIdx = s.indexOf("TopKPerKey", exchangeIdx)
    assert(finalIdx >= 0 && exchangeIdx > finalIdx && partialIdx > exchangeIdx,
      s"partial must sit below the exchange:\n$s")
  }

  test("k larger than group size returns the whole group") {
    val tiny = Seq(("a", 1.0), ("a", 2.0), ("b", 9.0)).toDF("k", "v")
    val r = TopK.topKPerKey(tiny, Seq("k"), $"v", 10).collect()
    assert(r.length === 3)
  }

  test("null ordering values sink to the bottom") {
    val withNulls = Seq(("a", Some(5.0)), ("a", None), ("a", Some(1.0)))
      .toDF("k", "v")
    val top2 = TopK.topKPerKey(withNulls, Seq("k"), $"v", 2)
      .select($"v").collect().map(r => Option(r.get(0)))
    assert(!top2.contains(None))
  }

  test("partial pass flushes above the key threshold with correct results") {
    // 5000 distinct keys, 4 rows each, flush threshold 64: every partial
    // task must flush repeatedly (bounded heap map), and the final pass
    // must still reduce the multiply-flushed survivors to the exact
    // per-key top-2. Strict ord: v dominates, i breaks ties.
    val prev = spark.conf.getOption("spark.graft.topk.maxPartialKeys")
    spark.conf.set("spark.graft.topk.maxPartialKeys", "64")
    try {
      val df = spark.range(20000).select(
        (col("id") % 5000).as("k"),
        (col("id") * 2654435761L % 1000).as("v"),
        col("id").as("i"))
      val ord = col("v") * 100000 + col("i")
      val viaCustom = TopK.topKPerKey(df, Seq("k"), ord, 2)
        .select(col("k"), col("i")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = Window.partitionBy(col("k")).orderBy(ord.desc)
      val viaWindow = df.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2).select(col("k"), col("i")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaCustom === viaWindow)
      assert(viaCustom.size === 10000) // 5000 keys × 2
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.topk.maxPartialKeys", v)
        case None => spark.conf.unset("spark.graft.topk.maxPartialKeys")
      }
    }
  }
}
