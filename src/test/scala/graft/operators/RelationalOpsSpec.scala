package graft.operators

import graft.SparkTestBase

class RelationalOpsSpec extends SparkTestBase {

  test("q1 pricing summary: 6 flag/status groups, counts add up") {
    val r = RelationalOps.q1PricingSummary(spark, sf0001).collect()
    assert(r.length === 6)
    val total = r.map(_.getAs[Long]("count_order")).sum
    assert(total > 0 && total <= 6000)
  }

  test("q2 revenue by nation: 25 nations, positive revenue") {
    val r = RelationalOps.q2RevenueByNation(spark, sf0001).collect()
    assert(r.length === 25)
    assert(r.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q3 window top-k: exactly 3 per segment, descending within segment") {
    val r = RelationalOps.q3TopOrdersPerSegment(spark, sf0001).collect()
    val bySeg = r.groupBy(_.getAs[String]("c_mktsegment"))
    assert(bySeg.values.forall(_.length == 3))
    bySeg.values.foreach { rows =>
      val prices = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("o_totalprice"))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q4 pivot: 5 regions, status counts sum to order count") {
    val r = RelationalOps.q4StatusPivotByRegion(spark, sf0001).collect()
    assert(r.length === 5)
    val totalOrders = r.map(x => x.getAs[Long]("cnt_f") + x.getAs[Long]("cnt_o") + x.getAs[Long]("cnt_p")).sum
    assert(totalOrders === 1500)
  }

  test("q5 semi/anti partition the customer table") {
    val r = RelationalOps.q5SemiAnti(spark, sf0001).collect()
    val total = r.map(x => x.getAs[Long]("with_orders") + x.getAs[Long]("without_orders")).sum
    assert(total === 150)
  }

  test("q6 point lookup returns the requested keys") {
    val r = RelationalOps.q6PointLookup(spark, sf0001).collect()
    assert(r.map(_.getAs[Long]("c_custkey")).toSeq === Seq(3L, 17L, 42L, 99L, 123L))
  }

  test("q7 set ops: partitions of the nation-key universe are disjoint") {
    val r = RelationalOps.q7SetOps(spark, sf0001).collect()
    val keysBySrc = r.groupBy(_.getAs[String]("src")).view.mapValues(_.map(_.getAs[Int]("nk")).toSet).toMap
    val all = keysBySrc.values.toSeq
    assert(all.combinations(2).forall { case Seq(a, b) => (a & b).isEmpty })
  }

  test("flagship entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
