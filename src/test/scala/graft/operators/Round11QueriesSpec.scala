package graft.operators

import org.apache.spark.sql.functions.{col, unix_micros}

import graft.{SparkTestBase, Tables}

/** Round-11 queries: driver-side re-derivations (independent Scala
  * implementations over collected sf0.001 data) so each gated query has
  * a second, oracle-independent witness — the discipline every prior
  * batch followed and Round 11 originally shipped without (the gap that
  * let the oracle-cast bug through in round 4).
  */
class Round11QueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def day(tsUs: Long): Long = tsUs / 86400000000L

  private def vMilli(v: Double): Long =
    BigDecimal(v * 1000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (user_id, event_id, ts_us, value, event_type). */
  private def eventsLocal: Array[(Long, Long, Long, Double, String)] =
    Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"), col("event_type"))
      .as[(Long, Long, Long, Double, String)].collect()

  // ------------------------------------------------------------- q206
  test("q206: DPP star join equals the local conversion-category rollup") {
    val evs = eventsLocal
    val conv = Set("purchase", "signup")
    val expected = evs.filter(r => conv(r._5))
      .groupBy(r => (r._5, day(r._3))).map { case ((t, d), g) =>
        (t, d, g.length.toLong, g.map(r => vMilli(r._4)).sum)
      }.toSet
    val got = Round11Queries.q206DynamicPruning(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // the dimension filter must keep exactly the two conversion types
    assert(got.map(_._1) === conv)
  }

  // ------------------------------------------------------------- q207
  test("q207: KS distance equals the local exact-CDF computation") {
    val evs = eventsLocal
    val byType = evs.groupBy(_._5).map { case (t, g) =>
      (t, g.map(r => vMilli(r._4)).sorted)
    }
    val types = byType.keys.toSeq.sorted
    val expected = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield {
      val (ta, tb) = (types(i), types(j))
      val (va, vb) = (byType(ta), byType(tb))
      val (na, nb) = (va.length.toLong, vb.length.toLong)
      val vs = (va ++ vb).distinct.sorted
      val dNum = vs.map { v =>
        val ra = va.count(_ <= v).toLong
        val rb = vb.count(_ <= v).toLong
        math.abs(ra * nb - rb * na)
      }.max
      (ta, tb, na, nb, dNum, r9(dNum.toDouble / (na.toDouble * nb.toDouble)))
    }).toSet
    val got = Round11Queries.q207KsTest(spark, sf0001)
      .as[(String, String, Long, Long, Long, Double)].collect().toSet
    assert(got === expected)
    // D is a metric bounded by [0, na*nb] in numerator units
    assert(got.forall { case (_, _, na, nb, d, _) => d >= 0 && d <= na * nb })
  }

  // ------------------------------------------------------------- q208
  test("q208: try-ingest report equals the local parse simulation") {
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .as[(Long, Double, String)].collect()
    val parsed = orders.map { case (k, tp, pri) =>
      val cents = BigDecimal(tp * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val s = cents.toString
      val raw = (k % 11) match {
        case 0 => s + "x"
        case 1 => ""
        case 2 => "-" + s
        case _ => s
      }
      val p = try { Some(raw.toLong) } catch { case _: NumberFormatException => None }
      (pri, p)
    }
    val expected = parsed.groupBy(_._1).map { case (pri, g) =>
      val valid = g.collect { case (_, Some(v)) if v >= 0 => v }
      val mean =
        if (valid.isEmpty) None
        else Some(BigDecimal(valid.sum.toDouble / valid.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (pri, g.length.toLong,
        g.count(_._2.isEmpty).toLong,
        g.count(r => r._2.exists(_ < 0)).toLong,
        valid.length.toLong, valid.sum, mean)
    }.toSet
    val got = Round11Queries.q208TryIngest(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSet
    assert(got === expected)
    // conservation: unparsed + negative + valid == n for every class
    assert(got.forall { case (_, n, u, neg, v, _, _) => u + neg + v == n })
  }

  // ------------------------------------------------------------- q209
  test("q209: weighted median/p90 equal the local cumulative-weight walk") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_quantity"))
      .as[(Long, Double, Double)].collect()
    val supNation = Tables.supplier(spark, sf0001)
      .select(col("s_suppkey"), col("s_nationkey")).as[(Long, Long)]
      .collect().toMap
    val nationName = Tables.nation(spark, sf0001)
      .select(col("n_nationkey"), col("n_name")).as[(Long, String)]
      .collect().toMap
    val expected = li.map { case (sk, ep, q) =>
      (nationName(supNation(sk)),
        BigDecimal(ep * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong,
        q.toLong)
    }.groupBy(_._1).map { case (nation, g) =>
      val byV = g.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      var run = 0L
      var med: Option[Long] = None
      var p90: Option[Long] = None
      byV.foreach { case (v, w) =>
        run += w
        if (med.isEmpty && run * 2 >= tot) med = Some(v)
        if (p90.isEmpty && run * 10 >= tot * 9) p90 = Some(v)
      }
      (nation, tot, med.get, p90.get)
    }.toSet
    val got = Round11Queries.q209WeightedMedian(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // p90 never precedes the median in value
    assert(got.forall { case (_, _, m, p) => p >= m })
  }

  // ------------------------------------------------------------- q210
  test("q210: merkle diff equals the local bucket-checksum reconciliation") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def fp(id: Long, text: String): Long =
      java.lang.Long.parseLong(md5Hex(s"$id:$text").take(12), 16)
    val a = docs.map { case (id, t) => (id, id % 64, fp(id, t)) }
    val b = docs.filter(_._1 % 101 != 0).map { case (id, t) =>
      val t2 = if (id % 97 == 0) t + "~" else t
      (id, id % 64, fp(id, t2))
    }
    val ca = a.groupBy(_._2).view.mapValues(g => (g.length.toLong, g.map(r => BigInt(r._3)).sum)).toMap
    val cb = b.groupBy(_._2).view.mapValues(g => (g.length.toLong, g.map(r => BigInt(r._3)).sum)).toMap
    val diffBuckets = (ca.keySet ++ cb.keySet).filter { k =>
      (ca.get(k), cb.get(k)) match {
        case (Some((n1, h1)), Some((n2, h2))) => n1 != n2 || h1 != h2
        case _                                => true
      }
    }
    val aByDoc = a.filter(r => diffBuckets(r._2)).map(r => r._1 -> r).toMap
    val bByDoc = b.filter(r => diffBuckets(r._2)).map(r => r._1 -> r).toMap
    val expected = diffBuckets.map { bkt =>
      val missing = aByDoc.values.count(r => r._2 == bkt && !bByDoc.contains(r._1)).toLong
      val corrupt = aByDoc.values.count { r =>
        r._2 == bkt && bByDoc.get(r._1).exists(_._3 != r._3)
      }.toLong
      (bkt, ca.get(bkt).map(_._1), cb.get(bkt).map(_._1), missing, corrupt)
    }
    val got = Round11Queries.q210MerkleDiff(spark, sf0001)
      .as[(Long, Option[Long], Option[Long], Long, Long)].collect().toSet
    assert(got === expected)
    // every reported bucket really differs: missing or corrupt or count drift
    assert(got.forall { case (_, na, nb, m, c) => m > 0 || c > 0 || na != nb })
  }
}
