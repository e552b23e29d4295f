package graft.operators

import graft.{SparkTestBase, Tables}

/** Specs for the late-round TPC-H shapes (q81–q86). Each check is an
  * independent driver-side re-derivation over sf0.001 from the raw
  * tables — in particular q82 re-derives through the ORIGINAL Q21
  * double-EXISTS definition, so the aggregate rewrite in the engine is
  * proven equivalent, not just self-consistent.
  */
class TpchShapesSpec extends SparkTestBase {
  import spark.implicits._

  private def money(x: Double): Long = math.round(x * 10000)

  private case class Li(ok: Long, sk: Long, ship: java.time.LocalDateTime,
    price: Double, disc: Double, qty: Double, pk: Long)

  private lazy val lis: Array[Li] = Tables.lineitem(spark, sf0001)
    .select($"l_orderkey", $"l_suppkey", $"l_shipdate", $"l_extendedprice",
      $"l_discount", $"l_quantity", $"l_partkey")
    .collect().map(r => Li(r.getLong(0), r.getLong(1),
      r.getAs[java.time.LocalDateTime](2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getLong(6)))

  private lazy val orders: Map[Long, (Long, java.time.LocalDateTime, String, String)] =
    Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderstatus",
        $"o_orderpriority")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[java.time.LocalDateTime](2), r.getString(3),
          r.getString(4))).toMap

  private lazy val custNation: Map[Long, Long] = Tables.customer(spark, sf0001)
    .select($"c_custkey", $"c_nationkey").as[(Long, Long)].collect().toMap
  private lazy val suppNation: Map[Long, Long] = Tables.supplier(spark, sf0001)
    .select($"s_suppkey", $"s_nationkey").as[(Long, Long)].collect().toMap
  private lazy val nationName: Map[Long, String] = Tables.nation(spark, sf0001)
    .select($"n_nationkey", $"n_name").as[(Long, String)].collect().toMap

  private def ts(s: String): java.time.LocalDateTime =
    java.time.LocalDate.parse(s).atStartOfDay()

  test("q81: nation-pair revenue equals a driver-side re-derivation") {
    val pair = Set(RelationalOps.VolShipNationA, RelationalOps.VolShipNationB)
    val lo = ts(RelationalOps.VolShipStart)
    val hi = ts(RelationalOps.VolShipEnd)
    val expected = lis.iterator.flatMap { l =>
      orders.get(l.ok).flatMap { case (ck, _, _, _) =>
        val cn = nationName(custNation(ck))
        val sn = nationName(suppNation(l.sk))
        if (pair(cn) && pair(sn) && cn != sn &&
            !l.ship.isBefore(lo) && l.ship.isBefore(hi))
          Some(((sn, cn, l.ship.getYear), money(l.price * (1.0 - l.disc))))
        else None
      }
    }.toSeq.groupBy(_._1).map { case (k, xs) =>
      k -> BigDecimal(xs.map(_._2).sum / 10000.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = RelationalOps.q81VolumeShipping(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getInt(2)), r.getDouble(3)))
      .toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q82: aggregate rewrite equals the original double-EXISTS Q21 definition") {
    val late: ((Li, java.time.LocalDateTime)) => Boolean = { case (l, od) =>
      l.ship.isAfter(od.plusDays(RelationalOps.LateDays))
    }
    val fLines = lis.flatMap { l =>
      orders.get(l.ok).collect { case (_, od, "F", _) => (l, od) }
    }
    // original formulation: supplier s qualifies for order o when
    //   EXISTS a late line of s in o
    //   AND EXISTS a line of another supplier in o
    //   AND NOT EXISTS a late line of another supplier in o
    val byOrder = fLines.groupBy(_._1.ok)
    val waits = for {
      (_, ls) <- byOrder.toSeq
      s <- ls.map(_._1.sk).distinct
      if ls.exists(x => x._1.sk == s && late(x))
      if ls.exists(_._1.sk != s)
      if !ls.exists(x => x._1.sk != s && late(x))
    } yield s
    val suppName = Tables.supplier(spark, sf0001)
      .select($"s_suppkey", $"s_name").as[(Long, String)].collect().toMap
    val expected = waits.groupBy(identity).map { case (s, xs) =>
      suppName(s) -> xs.size.toLong
    }
    val got = RelationalOps.q82WaitingSuppliers(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q83: histogram preserves the zero-order bucket and totals customers") {
    val rows = RelationalOps.q83OrderCountDistribution(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val counts = custNation.keys.toSeq.map { ck =>
      orders.values.count { case (ock, _, _, pri) =>
        ock == ck && pri != RelationalOps.DistribExcludedPriority
      }.toLong
    }.toSeq
    val expected = counts.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    assert(rows === expected)
    // histogram masses sum to the customer count — nobody dropped
    assert(rows.values.sum === custNation.size.toLong)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q84: window-avg correlated filter equals the per-part subquery definition") {
    val brandParts = Tables.part(spark, sf0001)
      .filter($"p_brand" === RelationalOps.SmallQtyBrand)
      .select($"p_partkey").as[Long].collect().toSet
    val branded = lis.filter(l => brandParts(l.pk))
    val avgByPart = branded.groupBy(_.pk).map { case (pk, xs) =>
      pk -> xs.map(_.qty).sum / xs.size
    }
    val small = branded.filter(l => l.qty < 0.2 * avgByPart(l.pk))
    val row = RelationalOps.q84SmallQuantityRevenue(spark, sf0001).collect().head
    assert(row.getAs[Long]("n_small_lines") === small.length.toLong)
    assert(row.getAs[Double]("avg_yearly") ===
      round6(small.map(l => money(l.price)).sum / 10000.0 / 7.0))
  }

  test("q85: disjunction equals a per-block sum and the part pre-filter loses nothing") {
    val partInfo = Tables.part(spark, sf0001)
      .select($"p_partkey", $"p_brand", $"p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val hits = lis.filter { l =>
      partInfo.get(l.pk).exists { case (b, sz) =>
        RelationalOps.DisjunctiveBlocks.exists { case (bb, (s1, s2), (q1, q2)) =>
          b == bb && sz >= s1 && sz <= s2 && l.qty >= q1 && l.qty <= q2
        }
      }
    }
    val row = RelationalOps.q85DisjunctiveRevenue(spark, sf0001).collect().head
    assert(row.getAs[Long]("n_lines") === hits.length.toLong)
    assert(row.getAs[Double]("revenue") ===
      round6(hits.map(l => money(l.price * (1.0 - l.disc))).sum / 10000.0))
    assert(hits.nonEmpty)
  }

  test("q86: share division sees the exact conditional and total sums") {
    val regionNations: Set[Long] = {
      val rk = Tables.region(spark, sf0001)
        .filter($"r_name" === RelationalOps.MktRegion)
        .select($"r_regionkey").as[Long].collect().toSet
      Tables.nation(spark, sf0001).select($"n_nationkey", $"n_regionkey")
        .as[(Long, Long)].collect().filter(x => rk(x._2)).map(_._1).toSet
    }
    val promoParts = Tables.part(spark, sf0001)
      .filter($"p_type" === RelationalOps.MktPartType)
      .select($"p_partkey").as[Long].collect().toSet
    val lo = ts(RelationalOps.MktStart); val hi = ts(RelationalOps.MktEnd)
    val perYear = lis.iterator.flatMap { l =>
      orders.get(l.ok).flatMap { case (ck, od, _, _) =>
        if (promoParts(l.pk) && regionNations(custNation(ck)) &&
            !od.isBefore(lo) && od.isBefore(hi)) {
          val v = money(l.price * (1.0 - l.disc))
          val n = if (nationName(suppNation(l.sk)) == RelationalOps.MktNation) v else 0L
          Some((od.getYear, (n, v)))
        } else None
      }
    }.toSeq.groupBy(_._1).map { case (y, xs) =>
      y -> (xs.map(_._2._1).sum, xs.map(_._2._2).sum)
    }
    val got = RelationalOps.q86MarketShare(spark, sf0001).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val expected = perYear.map { case (y, (n, t)) =>
      y -> (round6(n / 10000.0), round6(t / 10000.0),
        round6((n / 10000.0) / (t / 10000.0)))
    }
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q90: winners are exactly the scaled-long argmax set") {
    val lo = ts(RelationalOps.TopSuppQuarterStart)
    val hi = ts(RelationalOps.TopSuppQuarterEnd)
    val revBySupp = lis.iterator
      .filter(l => !l.ship.isBefore(lo) && l.ship.isBefore(hi))
      .map(l => l.sk -> money(l.price * (1.0 - l.disc)))
      .toSeq.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val mx = revBySupp.values.max
    val expected = revBySupp.filter(_._2 == mx).map { case (k, r) =>
      k -> round6(r / 10000.0)
    }
    val got = RelationalOps.q90TopSupplier(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
