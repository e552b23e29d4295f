package graft.operators

import org.apache.spark.sql.functions.{col, unix_micros}

import graft.{SparkTestBase, Tables}

/** Round-10 queries: driver-side re-derivations (independent Scala
  * implementations over collected sf0.001 data) so each gated query has
  * a second, oracle-independent witness, plus the laws each construct
  * must satisfy (bitmap-vs-naive distinct equality, PIT single-match,
  * attribution credit conservation, streak partition laws, Welch
  * moment arithmetic).
  */
class Round10QueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (user_id, event_id, ts_us, value, event_type). */
  private def eventsLocal: Array[(Long, Long, Long, Double, String)] =
    Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"), col("event_type"))
      .as[(Long, Long, Long, Double, String)].collect()

  private def day(tsUs: Long): Long = tsUs / 86400000000L

  private def vMilli(v: Double): Long =
    BigDecimal(v * 1000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  // ------------------------------------------------------------- q196
  test("q196: bitmap exact-distinct equals the naive distinct counts") {
    val e = eventsLocal.map(r => (r._5, day(r._3), r._1)).distinct
    val expected = e.groupBy(_._1).map { case (t, g) =>
      val daily = g.groupBy(_._2).map { case (_, d) => d.map(_._3).distinct.length }
      (t, daily.size.toLong, daily.map(_.toLong).sum, g.map(_._3).distinct.length.toLong)
    }.toSet
    val got = Round10Queries.q196BitmapDistinct(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // rollup law: OR-merged distinct never exceeds the sum of daily
    // distincts, and is at least the largest single day
    assert(got.forall { case (_, _, dSum, tot) => tot <= dSum })
  }

  // ------------------------------------------------------------- q197
  test("q197: PIT join matches the local interval lookup; versions partition time") {
    val evs = eventsLocal
    val dims = evs.filter(_._5 == "signup").groupBy(_._1).map { case (u, g) =>
      val sorted = g.sortBy(r => (r._3, r._2)) // (ts_us, event_id)
      val versions = sorted.zipWithIndex.map { case (r, i) =>
        val to = if (i + 1 < sorted.length) Some(sorted(i + 1)._3) else None
        (i + 1, r._3, to) // (version, from, to)
      }
      (u, versions)
    }
    val facts = evs.filter(_._5 == "purchase")
    val assigned = facts.map { f =>
      val v = dims.getOrElse(f._1, Array.empty[(Int, Long, Option[Long])])
        .filter(d => d._2 <= f._3 && d._3.forall(f._3 < _))
      assert(v.length <= 1, "half-open versions must match at most once")
      (v.headOption.map(_._1.toLong).getOrElse(-1L), f._1, vMilli(f._4))
    }
    val expected = assigned.groupBy(_._1).map { case (ver, g) =>
      (ver, g.length.toLong, g.map(_._2).distinct.length.toLong, g.map(_._3).sum)
    }.toSet
    val got = Round10Queries.q197PitJoin(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // conservation: every purchase lands in exactly one version bucket
    assert(got.toSeq.map(_._2).sum === facts.length.toLong)
  }

  // ------------------------------------------------------------- q198
  test("q198: U-shaped credits match the local path walk and conserve 10000 bp/user") {
    val evs = eventsLocal
    val convTs = evs.filter(_._5 == "purchase").groupBy(_._1)
      .map { case (u, g) => (u, g.map(_._3).min) }
    val touches = evs.filter(r => r._5 != "purchase" &&
      convTs.get(r._1).exists(r._3 < _))
    val byUser = touches.groupBy(_._1)
    val credits = byUser.toSeq.flatMap { case (_, g) =>
      val sorted = g.sortBy(r => (r._3, r._2))
      val n = sorted.length
      sorted.zipWithIndex.map { case (r, i) =>
        val pos = i + 1
        val bp: Long =
          if (n == 1) 10000L
          else if (n == 2) 5000L
          else if (pos == 1) 4000L + 2000L % (n - 2)
          else if (pos == n) 4000L
          else 2000L / (n - 2)
        (r._5, bp)
      }
    }
    val expected = credits.groupBy(_._1).map { case (ch, g) =>
      (ch, g.length.toLong, g.map(_._2).sum)
    }.toSet
    val got = Round10Queries.q198Attribution(spark, sf0001)
      .as[(String, Long, Long)].collect().toSet
    assert(got === expected)
    // conservation law: total credit = 10000 bp per user with >=1 touch
    assert(got.toSeq.map(_._3).sum === 10000L * byUser.size)
  }

  // ------------------------------------------------------------- q199
  test("q199: streaks match the local islands walk; lengths partition active days") {
    val days = eventsLocal.map(r => (r._1, day(r._3))).distinct
    val expected = days.groupBy(_._1).map { case (u, g) =>
      val sorted = g.map(_._2).sorted
      // islands: consecutive-day run lengths
      val runs = scala.collection.mutable.ListBuffer.empty[Long]
      var cur = 1L
      for (i <- 1 until sorted.length) {
        if (sorted(i) == sorted(i - 1) + 1) cur += 1
        else { runs += cur; cur = 1L }
      }
      runs += cur
      (u, runs.max, runs.length.toLong, sorted.length.toLong)
    }.toSet
    val got = Round10Queries.q199Streaks(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // partition law: streak lengths sum to active days; longest bounded
    assert(got.forall { case (_, longest, nStreaks, active) =>
      longest <= active && nStreaks <= active && longest >= 1 })
  }

  // ------------------------------------------------------------- q200
  test("q200: Welch readout matches the local exact-moment computation") {
    val purch = eventsLocal.filter(_._5 == "purchase")
    val perUser = purch.groupBy(_._1).map { case (u, g) =>
      (u, g.map(r => vMilli(r._4)).sum, if (g.exists(_._4 > 400)) 1L else 0L)
    }.toSeq
    val (as, bs) = perUser.partition { case (u, _, _) =>
      java.lang.Long.parseLong(md5Hex(s"ab42|$u").take(2), 16) % 2 == 0 }
    def moments(xs: Seq[(Long, Long, Long)]) = {
      val n = xs.length.toLong
      val sx = xs.map(_._2).sum
      val sxx = xs.map(t => BigInt(t._2) * BigInt(t._2)).sum
      val conv = xs.map(_._3).sum
      (n, sx, sxx, conv)
    }
    val (na, sxa, sxxa, ca) = moments(as)
    val (nb, sxb, sxxb, cb) = moments(bs)
    def dd(x: BigInt): Double = x.toDouble
    val va = (na.toDouble * dd(sxxa) - sxa.toDouble * sxa.toDouble) /
      (na.toDouble * (na.toDouble - 1.0))
    val vb = (nb.toDouble * dd(sxxb) - sxb.toDouble * sxb.toDouble) /
      (nb.toDouble * (nb.toDouble - 1.0))
    val t = (sxa.toDouble / na - sxb.toDouble / nb) /
      math.sqrt(va / na + vb / nb)
    val got = Round10Queries.q200AbTest(spark, sf0001)
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length === 1)
    val g = got.head
    assert((g._1, g._2, g._3, g._4) === (na, nb, ca, cb))
    assert(g._5 === r6(sxa.toDouble / na))
    assert(g._6 === r6(sxb.toDouble / nb))
    assert(g._7 === r6(t))
    // every purchasing user is in exactly one variant
    assert(na + nb === perUser.length.toLong)
  }

  private def cents(v: Double): Long =
    BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  // ------------------------------------------------------------- q201
  test("q201: WITHIN GROUP percentiles match the local R-7 interpolation") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .as[(String, Double)].collect()
    val expected = li.groupBy(_._1).map { case (f, g) =>
      val xs = g.map(r => cents(r._2)).sorted
      val n = xs.length
      def cont(p: Double): Double = {
        val rn = (n - 1) * p
        val lo = rn.toInt; val frac = rn - lo
        if (frac == 0.0) xs(lo).toDouble
        else xs(lo) * (1.0 - frac) + xs(lo + 1) * frac
      }
      // smallest value whose cume_dist >= 0.5
      val disc = xs(math.ceil(n * 0.5).toInt - 1)
      (f, n.toLong, r6(cont(0.25)), r6(cont(0.5)), r6(cont(0.75)), disc)
    }.toSet
    val got = Round10Queries.q201PercentileWithin(spark, sf0001)
      .as[(String, Long, Double, Double, Double, Long)].collect().toSet
    assert(got === expected)
    assert(got.forall { case (_, _, p25, p50, p75, _) =>
      p25 <= p50 && p50 <= p75 })
  }

  test("q201: explicit form is surface-equivalent to the ANSI WITHIN GROUP SQL") {
    Tables.lineitem(spark, sf0001).createOrReplaceTempView("lineitem_q201")
    val ansi = spark.sql(
      """SELECT l_returnflag,
        |       count(*) AS n_rows,
        |       round(percentile_cont(0.25) WITHIN GROUP (ORDER BY cents), 6)
        |         AS p25_cents,
        |       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY cents), 6)
        |         AS p50_cents,
        |       round(percentile_cont(0.75) WITHIN GROUP (ORDER BY cents), 6)
        |         AS p75_cents,
        |       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
        |            AS BIGINT) AS med_disc_cents
        |FROM (SELECT l_returnflag,
        |             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
        |      FROM lineitem_q201)
        |GROUP BY l_returnflag""".stripMargin)
      .as[(String, Long, Double, Double, Double, Long)].collect().toSet
    val got = Round10Queries.q201PercentileWithin(spark, sf0001)
      .as[(String, Long, Double, Double, Double, Long)].collect().toSet
    assert(got === ansi,
      "explicit cumulative-weight form must equal the engine's own inverse-distribution path")
  }

  /** Local intervals (user_id, event_id, event_type, start_us, end_us). */
  private def intervalsLocal: Array[(Long, Long, String, Long, Long)] =
    eventsLocal.map(r =>
      (r._1, r._2, r._5, r._3, r._3 + vMilli(r._4) * 1000L))

  // ------------------------------------------------------------- q202
  test("q202: interval union matches the local sweep merge") {
    val expected = intervalsLocal.groupBy(_._1).map { case (u, g) =>
      val sorted = g.sortBy(r => (r._4, r._5, r._2))
      var islands = List.empty[(Long, Long)] // (minStart, maxEnd), head = open
      for (iv <- sorted) islands match {
        case (s0, e0) :: t if iv._4 <= e0 =>
          islands = (s0, math.max(e0, iv._5)) :: t
        case _ => islands = (iv._4, iv._5) :: islands
      }
      val cov = islands.map { case (s0, e0) => e0 - s0 }.sum
      (u, cov, islands.length.toLong, g.length.toLong)
    }.toSet
    val got = Round10Queries.q202IntervalUnion(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // union length never exceeds the sum of the parts
    val durs = intervalsLocal.groupBy(_._1)
      .map { case (u, g) => u -> g.map(r => r._5 - r._4).sum }
    assert(got.forall { case (u, cov, _, _) => cov <= durs(u) })
  }

  // ------------------------------------------------------------- q203
  test("q203: peak concurrency matches the local sweep walk") {
    val expected = intervalsLocal.groupBy(_._3).map { case (t, g) =>
      val bounds = g.flatMap(iv =>
        Seq((iv._4, 1L, iv._2), (iv._5, -1L, iv._2)))
        .sortBy(b => (b._1, b._2, b._3))
      var run = 0L
      val levels = bounds.map { b => run += b._2; (b._1, run) }
      val peak = levels.map(_._2).max
      val at = levels.filter(_._2 == peak).map(_._1).min
      (t, peak, at, g.length.toLong)
    }.toSet
    val got = Round10Queries.q203PeakConcurrency(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.forall(_._2 >= 1L))
  }

  // ------------------------------------------------------------- q204
  test("q204: basket lift matches the local pair count and ratio arithmetic") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect().distinct
    val nOrders = li.map(_._1).distinct.length.toLong
    val cnt = li.groupBy(_._2).map { case (p, g) => p -> g.length.toLong }
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }
    val expected = pairs.groupBy(identity).collect {
      case ((a, b), g) if g.length >= 3 =>
        val c = g.length.toLong
        (a, b, c, cnt(a), cnt(b),
          r6(c.toDouble / nOrders), r6(c.toDouble / cnt(a)),
          r6(c.toDouble * nOrders / (cnt(a).toDouble * cnt(b).toDouble)))
    }.toSet
    val got = Round10Queries.q204BasketLift(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSet
    assert(got === expected)
    assert(got.nonEmpty, "min-support 3 must keep pairs at sf0.001")
  }

  // ------------------------------------------------------------- q205
  test("q205: window-identity CUSUM equals the recursive definition") {
    val purch = eventsLocal.filter(_._5 == "purchase")
      .map(r => (r._1, r._3, r._2, vMilli(r._4)))
    val k = purch.map(_._4).sum / purch.length // floor div, all positive
    val expected = purch.groupBy(_._1).map { case (u, g) =>
      val sorted = g.sortBy(r => (r._2, r._3))
      // the recursive form the query may NOT use — the independent witness
      var s = 0L
      val walk = sorted.map { r => s = math.max(0L, s + r._4 - k); (r._2, s) }
      val peak = walk.map(_._2).max
      val at = walk.filter(_._2 == peak).map(_._1).min
      (u, peak, at, g.length.toLong)
    }.toSet
    val got = Round10Queries.q205CusumDrift(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // drift statistic is non-negative by construction
    assert(got.forall(_._2 >= 0L))
  }
}
