package graft.operators

import graft.{SparkTestBase, Tables}

/** Independent driver-side re-derivations for the supply-chain batch
  * (q91–q96): each test recomputes the expected result from the raw
  * parquet rows with plain Scala collections — no Spark operators in
  * the expectation path — so the engine plans are checked against the
  * QUERY DEFINITION, not against themselves. q95 re-derives at sf0.01
  * because NATION_7 has no suppliers at sf0.001 (a vacuous pass would
  * prove nothing).
  */
class SupplyChainSpec extends SparkTestBase {
  import spark.implicits._

  private case class Li(ok: Long, pk: Long, sk: Long, qty: Double,
    price: Double, disc: Double, ship: java.time.LocalDateTime)

  private def lis(dir: String): Array[Li] = Tables.lineitem(spark, dir)
    .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity",
      $"l_extendedprice", $"l_discount", $"l_shipdate")
    .collect().map(r => Li(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5),
      r.getAs[java.time.LocalDateTime](6)))

  private def ts(s: String): java.time.LocalDateTime =
    java.time.LocalDate.parse(s).atStartOfDay()

  private def money6(cents10k: Long): Double =
    BigDecimal(cents10k / 10000.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Driver-side twin of [[SupplyChainOps.derivedPartSupp]]. */
  private def ps(dir: String): Map[(Long, Long), (Long, Long)] =
    lis(dir).groupBy(l => (l.pk, l.sk)).map { case (k, xs) =>
      k -> (xs.map(l => math.round(l.price / l.qty * 100)).min,
        xs.map(_.qty.toLong).sum)
    }

  test("q91: forecast revenue equals the driver-side filtered sum") {
    val lo = ts(SupplyChainOps.FcStart); val hi = ts(SupplyChainOps.FcEnd)
    val hits = lis(sf0001).filter(l => !l.ship.isBefore(lo) && l.ship.isBefore(hi) &&
      l.disc >= 0.05 && l.disc <= 0.07 && l.qty < 24)
    assert(hits.nonEmpty)
    val expected = money6(hits.map(l => math.round(l.price * l.disc * 10000)).sum)
    val r = SupplyChainOps.q91ForecastRevenue(spark, sf0001).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Double]("revenue") === expected)
    assert(r.head.getAs[Long]("n_lines") === hits.length)
  }

  test("q92: delay-mode conditional counts match a driver re-derivation") {
    val lo = ts(s"${SupplyChainOps.DelayYear}-01-01")
    val hi = ts(s"${SupplyChainOps.DelayYear.toInt + 1}-01-01")
    val orders = Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[java.time.LocalDateTime](1), r.getString(2))).toMap
    val expected = lis(sf0001)
      .filter(l => !l.ship.isBefore(lo) && l.ship.isBefore(hi))
      .map { l =>
        val (od, pri) = orders(l.ok)
        val d = java.time.temporal.ChronoUnit.DAYS.between(od.toLocalDate, l.ship.toLocalDate)
        val mode = if (d < 30) "FAST" else if (d < 90) "MEDIUM" else "SLOW"
        (mode, pri == "1-URGENT" || pri == "2-HIGH")
      }.groupBy(_._1).view.mapValues { xs =>
        (xs.count(_._2).toLong, xs.count(!_._2).toLong)
      }.toMap
    val r = SupplyChainOps.q92ShipDelayModes(spark, sf0001).collect()
    assert(r.nonEmpty && expected.nonEmpty)
    assert(r.map(x => x.getString(0) ->
      (x.getAs[Long]("high_line_count"), x.getAs[Long]("low_line_count"))).toMap === expected)
  }

  test("q93: product profit matches the synthetic-cost re-derivation") {
    val retail = Tables.part(spark, sf0001)
      .filter($"p_name".contains(SupplyChainOps.ProfitNoun))
      .select($"p_partkey", $"p_retailprice").as[(Long, Double)].collect().toMap
    val orderYear = Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_orderdate").collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1).getYear).toMap
    val suppNation = Tables.supplier(spark, sf0001)
      .select($"s_suppkey", $"s_nationkey").as[(Long, Int)].collect().toMap
    val nationName = Tables.nation(spark, sf0001)
      .select($"n_nationkey", $"n_name").as[(Int, String)].collect().toMap
    val expected = lis(sf0001).flatMap { l =>
      retail.get(l.pk).map { rp =>
        val amount = l.price * (1.0 - l.disc) - 0.6 * rp * l.qty
        ((nationName(suppNation(l.sk)), orderYear(l.ok)), math.round(amount * 10000))
      }
    }.groupBy(_._1).view.mapValues(xs => money6(xs.map(_._2).sum)).toMap
    val r = SupplyChainOps.q93ProductProfit(spark, sf0001).collect()
    assert(r.nonEmpty)
    assert(r.map(x => (x.getString(0), x.getAs[Int]("o_year")) ->
      x.getAs[Double]("sum_profit")).toMap === expected)
  }

  test("q94: per-part minimum-cost suppliers, ties kept, cost exact") {
    val scopeParts = Tables.part(spark, sf0001)
      .filter($"p_type" === SupplyChainOps.MinCostType &&
        $"p_size" <= SupplyChainOps.MinCostMaxSize)
      .select($"p_partkey").as[Long].collect().toSet
    val eurSupp = Tables.supplier(spark, sf0001)
      .select($"s_suppkey", $"s_nationkey").as[(Long, Int)].collect()
      .filter { case (_, nk) => nk % 5 == 3 }.map(_._1).toSet // EUROPE = regionkey 3
    val scoped = ps(sf0001).filter { case ((pk, sk), _) =>
      scopeParts(pk) && eurSupp(sk) }
    assert(scoped.nonEmpty)
    val minCost = scoped.groupBy(_._1._1).map { case (pk, xs) =>
      pk -> xs.values.map(_._1).min }
    val expected = scoped.collect {
      case ((pk, sk), (cost, _)) if cost == minCost(pk) => (pk, sk)
    }.toSet
    val suppByName = Tables.supplier(spark, sf0001)
      .select($"s_name", $"s_suppkey").as[(String, Long)].collect().toMap
    val r = SupplyChainOps.q94MinCostSupplier(spark, sf0001).collect()
    assert(r.map(x => (x.getAs[Long]("p_partkey"),
      suppByName(x.getAs[String]("s_name")))).toSet === expected)
    // cost column is the exact min in dollars
    r.foreach { x =>
      val pk = x.getAs[Long]("p_partkey")
      assert(x.getAs[Double]("supply_cost") === minCost(pk) / 100.0)
    }
  }

  test("q95 (sf0.01): value threshold keeps exactly the above-1.2×-mean parts") {
    val natSupp = Tables.supplier(spark, sf001)
      .select($"s_suppkey", $"s_nationkey").as[(Long, Int)].collect()
      .filter(_._2 == 7).map(_._1).toSet // NATION_7
    assert(natSupp.nonEmpty)
    val values = ps(sf001).toSeq.collect {
      case ((pk, sk), (cost, qty)) if natSupp(sk) => (pk, cost * qty)
    }.groupBy(_._1).map { case (pk, xs) => pk -> xs.map(_._2).sum }
    val threshold = values.values.sum.toDouble / values.size * 1.2
    val expected = values.filter(_._2 > threshold)
    assert(expected.nonEmpty && expected.size < values.size)
    val r = SupplyChainOps.q95ImportantStock(spark, sf001).collect()
    assert(r.map(x => x.getAs[Long]("ps_partkey") ->
      x.getAs[Long]("value_cents")).toMap === expected)
  }

  test("q96: concentrated shippers match the share re-derivation") {
    val smallParts = Tables.part(spark, sf0001)
      .filter($"p_name".startsWith(SupplyChainOps.ConcPrefix))
      .select($"p_partkey").as[Long].collect().toSet
    val lo = ts(s"${SupplyChainOps.ConcYear}-01-01")
    val hi = ts(s"${SupplyChainOps.ConcYear.toInt + 1}-01-01")
    val ps97 = lis(sf0001)
      .filter(l => smallParts(l.pk) && !l.ship.isBefore(lo) && l.ship.isBefore(hi))
      .groupBy(l => (l.pk, l.sk)).view.mapValues(_.map(_.qty.toLong).sum).toMap
    val avgByPart = ps97.toSeq.groupBy(_._1._1).map { case (pk, xs) =>
      pk -> xs.map(_._2).sum.toDouble / xs.size }
    val qualifying = ps97.collect {
      case ((pk, sk), q) if q > SupplyChainOps.ConcFactor * avgByPart(pk) => sk
    }.toSet
    val asiaSupp = Tables.supplier(spark, sf0001)
      .select($"s_suppkey", $"s_nationkey").as[(Long, Int)].collect()
      .filter(_._2 % 5 == 2).map(_._1).toSet // ASIA = regionkey 2
    val expected = qualifying & asiaSupp
    val r = SupplyChainOps.q96ConcentratedShippers(spark, sf0001).collect()
    assert(r.map(_.getAs[Long]("s_suppkey")).toSet === expected)
    // supplier rows never duplicate (LEFT SEMI contract)
    assert(r.map(_.getAs[Long]("s_suppkey")).distinct.length === r.length)
  }
}
