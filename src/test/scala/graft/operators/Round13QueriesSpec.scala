package graft.operators

import org.apache.spark.sql.functions.{col, unix_micros}

import graft.{SparkTestBase, Tables}

/** Round-13 queries: driver-side re-derivations plus the laws —
  * bitemporal interval-rebuild correctness (vs the filter-after-chain
  * wrong answer), column-diff conservation, and the seasonal
  * decomposition's zero-mean residual property.
  */
class Round13QueriesSpec extends SparkTestBase {
  import spark.implicits._

  test("sssp: schema contract raised up front — misnamed or non-numeric weight") {
    val seeds = Seq(1L).toDF("id")
    val miss = intercept[IllegalArgumentException] {
      graft.graph.GraphOps.sssp(
        Seq((1L, 2L, 1L)).toDF("src", "dst", "weight"), seeds, 1)
    }
    assert(miss.getMessage.contains("missing 'w'"), miss.getMessage)
    val badType = intercept[IllegalArgumentException] {
      graft.graph.GraphOps.sssp(
        Seq((1L, 2L, "x")).toDF("src", "dst", "w"), seeds, 1)
    }
    assert(badType.getMessage.contains("must be numeric"), badType.getMessage)
    val badSeeds = intercept[IllegalArgumentException] {
      graft.graph.GraphOps.sssp(
        Seq((1L, 2L, 1L)).toDF("src", "dst", "w"), Seq(1L).toDF("v"), 1)
    }
    assert(badSeeds.getMessage.contains("seeds"), badSeeds.getMessage)
  }

  // ------------------------------------------------------------- q219
  test("q219: bitemporal pick matches a local rebuild; naive filter-after-chain differs") {
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val lo = evs.map(_._3).min
    val hi = evs.map(_._3).max
    val tTx = lo + (hi - lo) * 3 / 4
    val tV = lo + (hi - lo) / 2
    val backdate = (hi - lo) * 3 / 8
    val dims = evs.filter(_._4 == "signup").map { case (u, eid, ts, _) =>
      (u, eid, ts, ts - (if (eid % 7 == 0) backdate else 0L))
    }
    // correct: filter to tx <= T_tx FIRST, then chain valid intervals
    val expected = dims.filter(_._3 <= tTx).groupBy(_._1).toSeq.flatMap {
      case (_, g) =>
        val chain = g.sortBy(d => (d._4, d._2)).zipWithIndex
        chain.find { case ((_, _, _, vf), i) =>
          vf <= tV && chain.lift(i + 1).forall { case ((_, _, _, nvf), _) => tV < nvf }
        }.map { case ((_, eid, _, _), i) => (i + 1, eid % 7 == 0) }
    }.toSeq
    val expectedRollup = expected.groupBy(_._1).map { case (v, g) =>
      (v.toLong, g.size.toLong, g.count(_._2).toLong)
    }.toSet
    val got = Round13Queries.q219BitemporalAsOf(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expectedRollup)
    // the subtlety the query exists to pin: chaining over ALL rows and
    // filtering afterwards yields a DIFFERENT answer whenever a
    // correction arrived after T_tx (versions shift / intervals split)
    val naive = dims.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val chain = g.sortBy(d => (d._4, d._2)).zipWithIndex
      chain.find { case ((_, _, tx, vf), i) =>
        tx <= tTx && vf <= tV &&
          chain.lift(i + 1).forall { case ((_, _, _, nvf), _) => tV < nvf }
      }.map { case ((_, eid, _, _), i) => (i + 1, eid % 7 == 0) }
    }.toSeq
    assert(naive.size != expected.size || naive.toSet != expected.toSet,
      "testdata must actually exercise late corrections (else the gate proves nothing)")
  }

  // ------------------------------------------------------------- q220
  test("q220: column diff matches a local replay; rows conserve") {
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .as[(Long, Double, String)].collect()
      .map { case (k, p, pri) =>
        (k, BigDecimal(p * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong, pri)
      }
    val a = orders.filter(_._1 % 23 != 0).map(r => r._1 -> r).toMap
    val b = orders.filter(_._1 % 19 != 0).map { case (k, c, pri) =>
      k -> (k, c + (if (k % 13 == 0) 1L else 0L),
        if (k % 17 == 0) "X-" + pri else pri)
    }.toMap
    val keys = a.keySet ++ b.keySet
    val common = keys.filter(k => a.contains(k) && b.contains(k))
    val expected = (
      common.size.toLong,
      keys.count(!a.contains(_)).toLong,
      keys.count(!b.contains(_)).toLong,
      common.count(k => a(k)._2 != b(k)._2).toLong,
      common.count(k => a(k)._3 != b(k)._3).toLong,
      common.count(k => a(k)._2 == b(k)._2 && a(k)._3 == b(k)._3).toLong)
    val got = Round13Queries.q220ColumnDiff(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got === expected)
    // drift classes overlap-free with identical only when no column drifted
    assert(got._6 <= got._1 - math.max(got._4, got._5))
    assert(got._2 > 0 && got._3 > 0 && got._4 > 0 && got._5 > 0)
  }

  // ------------------------------------------------------------- q223
  test("q223: SSSP matches a local Bellman-Ford; cost order differs from hop order") {
    val edges = DedupQueries.synthEdges(spark, sf0001)
      .as[(Long, Long)].collect()
    val sym = (edges ++ edges.map { case (a, b) => (b, a) })
      .map { case (s2, d) => (s2, d, 1L + (s2 + d) % 5) }
    val adj = sym.groupBy(_._1).map { case (v, es) =>
      v -> es.map(e => (e._2, e._3)).toSeq
    }
    val n = Tables.documents(spark, sf0001).count()
    val seeds = (0L until n).filter(_ % 101 == 0)
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to GraphQueries.SsspRounds) {
      val relaxed = dist.toSeq.flatMap { case (v, d) =>
        adj.getOrElse(v, Seq.empty).map { case (u, w) => (u, d + w) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    val got = GraphQueries.q223Sssp(spark, sf0001)
      .as[(Long, Long)].collect().toSet
    assert(got === dist.toSet)
    // cost-aware paths are a genuinely different ordering than hops:
    // the reached sets agree with BFS, but relative vertex order by
    // cost differs from order by depth somewhere
    val bfs = GraphQueries.q149BfsDepth(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    assert(got.map(_._1) === bfs.keySet, "R-round reachability is identical")
    val pairs = got.toSeq.sortBy(_._1)
    val inversions = for {
      (a, da) <- pairs; (b, db) <- pairs
      if a < b && ((da < db && bfs(a) > bfs(b)) || (da > db && bfs(a) < bfs(b)))
    } yield (a, b)
    assert(inversions.nonEmpty,
      "some vertex pair must order differently by cost than by hops")
  }

  // ------------------------------------------------------------- q222
  test("q222: sequence-pattern matches a local sessionize + regex replay") {
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val gapUs = 30L * 60 * 1000 * 1000
    val pat = java.util.regex.Pattern.compile(Round13Queries.SeqPattern)
    val expected = evs.groupBy(_._1).map { case (u, g) =>
      val ordered = g.sortBy(e => (e._3, e._2))
      // gap sessionization, then one initials string per session
      val seqs = scala.collection.mutable.ArrayBuffer.empty[StringBuilder]
      var prev = Long.MinValue
      ordered.foreach { e =>
        if (prev == Long.MinValue || e._3 - prev > gapUs)
          seqs += new StringBuilder
        seqs.last += e._4.head
        prev = e._3
      }
      val ss = seqs.map(_.toString)
      (u, ss.size.toLong,
        ss.count(s => pat.matcher(s).find()).toLong,
        ss.count(_.contains('e')).toLong)
    }.toSet
    val got = Round13Queries.q222SequenceMatch(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // the pattern is selective: some but not all sessions match
    val (tot, matched) = (got.toSeq.map(_._2).sum, got.toSeq.map(_._3).sum)
    assert(matched > 0 && matched < tot)
  }

  // ------------------------------------------------------------- q224
  test("q224: containment join matches local replay; excerpts found, Jaccard would miss them") {
    val n = Round12Queries.SetSimShingleN
    def shingles(t: String): Set[String] = {
      val ws = t.toLowerCase.replaceAll("(\\d|\\W)+", " ").trim
        .split(" ").filter(_.nonEmpty)
      if (ws.length < n) Set.empty else ws.sliding(n).map(_.mkString(" ")).toSet
    }
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val excerpts = docs.filter(_._1 % 37 == 0).map { case (id, t) =>
      val ws = t.split(" ", -1)
      (id + Round13Queries.ExcerptIdOffset,
        ws.take((ws.length + 1) / 2).mkString(" "))
    }
    val corpus = (docs ++ excerpts).map { case (id, t) => (id, shingles(t)) }
      .filter(_._2.nonEmpty).toMap
    val tauN = Round13Queries.ContainTauNum
    val tauD = Round13Queries.ContainTauDen
    val expected = (for {
      (a, sa) <- corpus.iterator; (b, sb) <- corpus
      if a != b
      inter = (sa & sb).size
      if inter * tauD >= sa.size * tauN
    } yield (a, b, inter.toLong, sa.size.toLong,
      BigDecimal(1e6 * inter / sa.size.toDouble)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)).toSet
    val got = Round13Queries.q224ContainmentJoin(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // every synthetic excerpt with >= n-token half finds its source at
    // containment 1.0 ...
    val pairs = got.map(r => (r._1, r._2)).toSet
    val eligible = excerpts.filter(e => corpus.contains(e._1))
    assert(eligible.nonEmpty)
    eligible.foreach { case (eid, _) =>
      assert(pairs((eid, eid - Round13Queries.ExcerptIdOffset)),
        s"excerpt $eid must be contained in its source")
    }
    // ... and symmetric Jaccard >= 0.8 would MISS every one of them —
    // the reason the asymmetric operator exists
    eligible.foreach { case (eid, _) =>
      val sa = corpus(eid); val sb = corpus(eid - Round13Queries.ExcerptIdOffset)
      val inter = (sa & sb).size
      assert(inter * 9 < (sa.size + sb.size) * 4,
        s"excerpt $eid would also pass J>=0.8 — test loses its point")
    }
  }

  // ------------------------------------------------------------- q221
  test("q221: seasonal indices match a local decomposition; residuals mean ~0 overall") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("us"),
        col("l_extendedprice"))
      .as[(String, Long, Double)].collect()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def q0(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = li.map { case (f, us, p) =>
      (f, us / 86400000000L, q0(p * 100))
    }.groupBy(_._1).flatMap { case (f, g) =>
      val daily = g.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
      val n = daily.length
      val sx = daily.map(d => BigInt(d._1)).sum
      val sy = daily.map(d => BigInt(d._2)).sum
      val sxy = daily.map(d => BigInt(d._1) * BigInt(d._2)).sum
      val sxx = daily.map(d => BigInt(d._1) * BigInt(d._1)).sum
      val b = r6((n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble))
      val aInt = r6((sy.toDouble - sx.toDouble *
        ((n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
         (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble))) / n.toDouble)
      daily.map { case (day, y) =>
        (f, (day + 4) % 7, q0(1e6 * (y.toDouble - (aInt + b * day.toDouble))))
      }.groupBy(r => (r._1, r._2)).map { case ((fl, dow), rs) =>
        (fl, dow, rs.size.toLong,
          r6(rs.map(_._3).sum.toDouble / rs.size / 1e6))
      }
    }.toSet
    val got = Round13Queries.q221SeasonalDecomposition(spark, sf0001)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got === expected)
    // decomposition sanity: per flag, day-count-weighted seasonal
    // indices are near zero (residuals of an OLS fit sum to ~0)
    got.groupBy(_._1).foreach { case (_, g) =>
      val totDays = g.toSeq.map(_._3).sum
      val wmean = g.toSeq.map(r => r._4 * r._3).sum / totDays
      assert(math.abs(wmean) < 1.0, s"weighted seasonal mean $wmean should be ~0")
    }
  }
}
