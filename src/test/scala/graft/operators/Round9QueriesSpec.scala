package graft.operators

import org.apache.spark.sql.functions.col

import graft.{SparkTestBase, Tables}

/** Round-9 queries: driver-side re-derivations (independent Scala
  * implementations over collected sf0.001 data) so each gated query has
  * a second, oracle-independent witness.
  */
class Round9QueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def q0(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (user_id, event_id, ts_us, value) sorted the way the window sorts. */
  private def eventsLocal: Array[(Long, Long, Long, Double)] =
    Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("ts_us"),
        col("value"))
      .as[(Long, Long, Long, Double)].collect()

  // ------------------------------------------------------------- q175
  test("q175: recursive depth equals the closed-form heap depth") {
    val keys = Tables.supplier(spark, sf0001)
      .select("s_suppkey").as[Long].collect()
    // depth of heap index i (= suppkey+1) is floor(log2 i)
    val expected = keys.groupBy(k => 63 - java.lang.Long.numberOfLeadingZeros(k + 1))
      .map { case (d, g) => (d.toLong, g.length.toLong, g.sum) }.toSet
    val got = Round9Queries.q175RecursiveDepth(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  // ------------------------------------------------------------- q176
  test("q176: listagg signature equals the sorted-distinct join-up") {
    val docs = Tables.documents(spark, sf0001)
      .select("source", "lang").as[(String, String)].collect()
    val expected = docs.groupBy(_._1).map { case (src, g) =>
      val langs = g.map(_._2).distinct.sorted
      (src, langs.length.toLong, langs.mkString(","), g.length.toLong)
    }.toSet
    val got = Round9Queries.q176LangSignature(spark, sf0001)
      .as[(String, Long, String, Long)].collect().toSet
    assert(got === expected)
    // the ORDER BY inside the aggregate is what makes this deterministic:
    // every signature must be sorted
    assert(got.forall { case (_, _, sig, _) =>
      val parts = sig.split(","); parts.sameElements(parts.sorted) })
  }

  // ------------------------------------------------------------- q177
  test("q177: retention matrix matches a local cohort re-derivation") {
    val uw = eventsLocal.map(e => (e._1, e._3 / 86400000000L)).distinct
    val firstDay = uw.groupBy(_._1).map { case (u, g) => (u, g.map(_._2).min) }
    val sizes = firstDay.values.groupBy(identity).map { case (d, g) => (d, g.size.toLong) }
    val expected = uw.groupBy { case (u, d) => (firstDay(u), d - firstDay(u)) }
      .map { case ((c, off), g) =>
        (c, off, g.size.toLong, sizes(c), r6(g.size.toDouble / sizes(c))) }.toSet
    val got = Round9Queries.q177RetentionCohorts(spark, sf0001)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got === expected)
    // offset 0 is the cohort itself: retention exactly 1.0 there
    assert(got.filter(_._2 == 0L).forall(r => r._3 == r._4 && r._5 == 1.0))
  }

  // ------------------------------------------------------------- q178
  test("q178: Benford digits match exact cents-string extraction") {
    val prices = Tables.orders(spark, sf0001)
      .select("o_totalprice").as[Double].collect()
    val byDigit = prices.map(p => q0(p * 100).toString.head.asDigit.toLong)
      .groupBy(identity).map { case (d, g) => (d, g.length.toLong) }
    val n = prices.length.toDouble
    val expected = byDigit.map { case (d, c) =>
      (d, c, r6(c / n),
        BigDecimal(math.log(1 + 1.0 / d) / math.log(10))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = Round9Queries.q178Benford(spark, sf0001)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got === expected)
    // shares form a distribution over digits 1..9
    assert(got.map(_._1).subsetOf((1L to 9L).toSet))
    assert(math.abs(got.toSeq.map(_._3).sum - 1.0) < 1e-4)
  }

  // ------------------------------------------------------------- q179
  test("q179: transition matrix matches local sequence pairing") {
    val pairs = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).toSeq.flatMap { case (_, g) =>
        val seq = g.sortBy(e => (e._3, e._2)).map(_._4)
        seq.zip(seq.tail)
      }
    val counts = pairs.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val rowTot = counts.groupBy(_._1._1).map { case (c, g) => (c, g.values.sum) }
    val expected = counts.map { case ((c, nx), n) =>
      (c, nx, n, r6(n.toDouble / rowTot(c))) }.toSet
    val got = Round9Queries.q179TransitionMatrix(spark, sf0001)
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === expected)
    // each row of the matrix sums to ~1
    val rows = got.toSeq.groupBy(_._1).values
    assert(rows.forall(r => math.abs(r.map(_._4).sum - 1.0) < 1e-3))
  }

  // ------------------------------------------------------------- q181
  test("q181: rolling 7-day distinct matches the direct window recount") {
    val uw = eventsLocal.map(e => (e._1, e._3 / 86400000000L)).distinct
    val days = uw.map(_._2).distinct
    val expected = days.map { d =>
      (d, uw.filter(p => p._2 >= d - 6 && p._2 <= d).map(_._1).distinct.length.toLong)
    }.toSet
    val got = Round9Queries.q181RollingDistinct(spark, sf0001)
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
    // the rolling count dominates the single-day count everywhere
    val daily = uw.groupBy(_._2).map { case (d, g) => (d, g.length.toLong) }
    assert(got.forall { case (d, n) => n >= daily(d) })
  }

  // ------------------------------------------------------------- q182
  test("q182: SQL UDF projection matches the inlined expression") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    def score(n: Long): Double =
      BigDecimal(math.log(1 + n.toDouble) / math.log(10))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = docs.map { case (id, n) =>
      val sc = score(n)
      (id, sc, if (sc < 2.5) "short" else if (sc < 3.0) "medium" else "long")
    }.toSet
    val got = Round9Queries.q182SqlUdf(spark, sf0001)
      .as[(Long, Double, String)].collect().toSet
    assert(got === expected)
    // composition: the band column is consistent with the score column
    assert(got.forall { case (_, sc, b) =>
      b == (if (sc < 2.5) "short" else if (sc < 3.0) "medium" else "long") })
  }

  // ------------------------------------------------------------- q183
  test("q183: NOT IN matches local anti-join; NULL in subquery empties it") {
    val excluded = Tables.supplier(spark, sf0001)
      .filter(col("s_acctbal") < 0).select("s_nationkey")
      .as[Int].collect().toSet
    val expected = Tables.customer(spark, sf0001)
      .select("c_nationkey").as[Int].collect()
      .filter(k => !excluded.contains(k))
      .groupBy(identity).map { case (k, g) => (k, g.length.toLong) }.toSet
    val got = Round9Queries.q183NotInNullAware(spark, sf0001)
      .as[(Int, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // the three-valued-logic law the planner must preserve: one NULL
    // in the subquery and NOT IN returns nothing
    val withNull = spark.sql(
      """SELECT x FROM VALUES (1),(2) AS t(x)
        |WHERE x NOT IN (SELECT y FROM VALUES (2),(CAST(NULL AS INT)) AS u(y))""".stripMargin)
    assert(withNull.count() === 0L)
  }

  // ------------------------------------------------------------- q184
  test("q184: grouping sets equal the union of the three group-bys") {
    val os = Tables.orders(spark, sf0001)
      .select("o_orderstatus", "o_orderpriority", "o_totalprice")
      .as[(String, String, Double)].collect()
    def money(g: Iterable[Double]): Double =
      r6(g.map(v => q0(v * 10000)).sum.toDouble / 10000.0)
    val cells = os.groupBy(o => (o._1, o._2)).map { case ((a, b), g) =>
      (a, b, 0L, g.size.toLong, money(g.map(_._3))) }
    val byStatus = os.groupBy(_._1).map { case (a, g) =>
      (a, null.asInstanceOf[String], 1L, g.size.toLong, money(g.map(_._3))) }
    val byPrio = os.groupBy(_._2).map { case (b, g) =>
      (null.asInstanceOf[String], b, 2L, g.size.toLong, money(g.map(_._3))) }
    val expected = (cells ++ byStatus ++ byPrio).toSet
    val got = Round9Queries.q184GroupingSets(spark, sf0001)
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(got === expected)
    // no grand-total row — the asymmetry neither rollup nor cube makes
    assert(!got.exists(_._3 == 3L))
  }

  // ------------------------------------------------------------- q185
  test("q185: bag set ops match min/truncated-difference multiplicity") {
    val ev = Tables.events(spark, sf0001)
      .select("user_id", "event_type").as[(Long, String)].collect()
    val ca = ev.filter(_._1 % 2 == 0).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cb = ev.filter(_._1 % 2 == 1).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected =
      (ca.keySet & cb.keySet).map(t => ("intersect_all", t, math.min(ca(t), cb(t))))
        .filter(_._3 > 0) ++
      ca.keySet.flatMap { t =>
        val d = ca(t) - cb.getOrElse(t, 0L)
        if (d > 0) Some(("except_all", t, d)) else None
      }
    val got = Round9Queries.q185BagSetOps(spark, sf0001)
      .as[(String, String, Long)].collect().toSet
    assert(got === expected.toSet)
    assert(got.exists(_._1 == "intersect_all") && got.exists(_._1 == "except_all"))
  }

  // ------------------------------------------------------------- q186
  test("q186: scalar subqueries match per-region local rollups") {
    val nat = Tables.nation(spark, sf0001)
      .select("n_nationkey", "n_regionkey").as[(Int, Int)].collect().toMap
    val sup = Tables.supplier(spark, sf0001)
      .select("s_nationkey", "s_acctbal").as[(Int, Double)].collect()
    val regions = Tables.region(spark, sf0001)
      .select("r_regionkey", "r_name").as[(Int, String)].collect()
    val expected = regions.map { case (rk, rn) =>
      val nations = nat.filter(_._2 == rk).keySet
      val bals = sup.filter(s => nations.contains(s._1)).map(_._2)
      (rn, nations.size.toLong,
        r6(bals.map(b => q0(b * 10000)).sum.toDouble / 10000.0))
    }.toSet
    val got = Round9Queries.q186ScalarSubquery(spark, sf0001)
      .as[(String, Long, Double)].collect().toSet
    assert(got === expected)
  }

  // ------------------------------------------------------------- q187
  test("q187: deciles match the local ntile split rule") {
    val ev = Tables.events(spark, sf0001)
      .select("event_type", "event_id", "value")
      .as[(String, Long, Double)].collect()
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (t, g) =>
      val sorted = g.sortBy(e => (e._3, e._2))
      val n = sorted.length; val base = n / 10; val extra = n % 10
      // ntile split rule: the first (n mod 10) buckets get base+1 rows
      val sizes = (1 to 10).map(i => if (i <= extra) base + 1 else base)
      val offsets = sizes.scanLeft(0)(_ + _)
      (1 to 10).flatMap { d =>
        val slice = sorted.slice(offsets(d - 1), offsets(d))
        if (slice.isEmpty) None
        else Some((t, d.toLong, slice.length.toLong,
          r6(slice.map(_._3).min), r6(slice.map(_._3).max)))
      }
    }.toSet
    val got = Round9Queries.q187NtileDeciles(spark, sf0001)
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(got === expected)
    // buckets tile the partition: bounds are non-overlapping in order
    val byType = got.toSeq.groupBy(_._1).values
    assert(byType.forall { b =>
      b.sortBy(_._2).sliding(2).forall {
        case Seq(x, y) => x._5 <= y._4 + 1e-9; case _ => true } })
  }

  // ------------------------------------------------------------- q188
  test("q188: training order is the md5 permutation, shards balanced") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source").as[(Long, String)].collect()
    val expected = docs
      .map { case (id, src) =>
        (md5Hex(s"${Round9Queries.TrainSeed}|$id"), id, src) }
      .sortBy(e => (e._1, e._2)).zipWithIndex
      .map { case ((_, id, src), i) =>
        (i + 1L, id, src, i.toLong % Round9Queries.TrainShards) }.toSet
    val got = Round9Queries.q188TrainingOrder(spark, sf0001)
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got === expected)
    // a permutation: positions are exactly 1..n, shards off-by-at-most-one
    assert(got.map(_._1) === (1L to docs.length).toSet)
    val shardSizes = got.toSeq.groupBy(_._4).values.map(_.size)
    assert(shardSizes.max - shardSizes.min <= 1)
  }

  // ------------------------------------------------------------- q189
  test("q189: null-safe diff finds exactly the fr/de rows; <> finds none") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val expected = docs.collect {
      case (id, "fr") => (id, null.asInstanceOf[String], "fr")
      case (id, "de") => (id, "de", null.asInstanceOf[String])
    }.toSet
    val got = Round9Queries.q189NullSafeDiff(spark, sf0001)
      .as[(Long, String, String)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // the trap the operator exists for: plain <> drops every NULL row
    val a = Tables.documents(spark, sf0001)
      .select(col("doc_id"), org.apache.spark.sql.functions
        .nullif(col("lang"), org.apache.spark.sql.functions.lit("fr")).as("lang_a"))
    val b = Tables.documents(spark, sf0001)
      .select(col("doc_id"), org.apache.spark.sql.functions
        .nullif(col("lang"), org.apache.spark.sql.functions.lit("de")).as("lang_b"))
    assert(a.join(b, "doc_id").filter(col("lang_a") =!= col("lang_b")).count() === 0L)
  }

  // ------------------------------------------------------------- q190
  test("q190: unionByName aligns columns; absent ones are NULL") {
    val got = Round9Queries.q190UnionByName(spark, sf0001)
    val nDocs = Tables.documents(spark, sf0001).count()
    val nEvents = Tables.events(spark, sf0001).count()
    assert(got.count() === nDocs + nEvents)
    // docs carry lang/size and never value; events the reverse
    assert(got.filter(col("kind") === "doc")
      .filter(col("value").isNotNull).count() === 0L)
    assert(got.filter(col("kind") === "doc")
      .filter(col("lang").isNull || col("size").isNull).count() === 0L)
    assert(got.filter(col("kind") === "event")
      .filter(col("lang").isNotNull || col("size").isNotNull).count() === 0L)
    assert(got.filter(col("kind") === "event")
      .filter(col("value").isNull).count() === 0L)
  }

  // ------------------------------------------------------------- q191
  test("q191: fused expectations equal independently-computed checks") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), org.apache.spark.sql.functions
          .unix_millis(col("ts")).as("ts_ms"))
      .as[(Long, Long, String, Double, Long)].collect()
    val known = Set("click", "error", "purchase", "signup", "view")
    val expected = Set(
      ("n_rows", ev.length.toLong),
      ("n_ids", ev.length.toLong),
      ("n_distinct_ids", ev.map(_._1).distinct.length.toLong),
      ("n_null_user", 0L),
      ("n_value_range_violations",
        ev.count(e => e._4 < 0 || e._4 > 1000000).toLong),
      ("n_unknown_types", ev.count(e => !known(e._3)).toLong),
      ("n_ts_out_of_window", ev.count(e =>
        e._5 < 1704067200000L || e._5 >= 1767225600000L).toLong))
    val got = Round9Queries.q191Expectations(spark, sf0001)
      .as[(String, Long)].collect().toSet
    assert(got === expected)
    // the uniqueness expectation holds on this table
    assert(got.find(_._1 == "n_distinct_ids").get._2 ===
      got.find(_._1 == "n_rows").get._2)
  }

  // ------------------------------------------------------------- q192
  test("q192: cadence magnitudes match local digit-count bucketing") {
    val byUser = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1)
    val gaps2 = byUser.toSeq.flatMap { case (_, g) =>
      val s = g.sortBy(e => (e._3, e._2))
      s.sliding(2).collect { case Array(a, b) => (b._4, b._3 - a._3) }
    }
    val expected = gaps2.groupBy { case (t, gap) =>
      (t, gap.toString.length.toLong) }
      .map { case ((t, m), grp) =>
        (t, m, grp.size.toLong, grp.map(_._2).min, grp.map(_._2).max) }.toSet
    val got = Round9Queries.q192CadenceHistogram(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // min/max stay inside their decimal-magnitude cell
    assert(got.forall { case (_, m, _, lo, hi) =>
      lo.toString.length == m && hi.toString.length == m })
  }

  // ------------------------------------------------------------- q193
  test("q193: rank keeps boundary ties; groups may exceed k rows") {
    val orders = Tables.orders(spark, sf0001)
      .select("o_custkey").as[Long].collect()
      .groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
    val cust = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_nationkey").as[(Long, Int)].collect()
    val expected = cust.flatMap { case (ck, nk) =>
      orders.get(ck).map(n => (nk, ck, n)) }
      .groupBy(_._1).toSeq.flatMap { case (nk, g) =>
        val sorted = g.sortBy(-_._3)
        sorted.map { case (_, ck, n) =>
          val rk = sorted.count(_._3 > n) + 1L
          (nk, rk, ck, n)
        }.filter(_._2 <= Round9Queries.TopKTies)
      }.toSet
    val got = Round9Queries.q193TopKWithTies(spark, sf0001)
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // ties are real on this data: some group keeps more than k rows
    assert(got.groupBy(_._1).exists(_._2.size > Round9Queries.TopKTies),
      "expected at least one nation with boundary ties kept")
  }

  // ------------------------------------------------------------- q194
  test("q194: keywords are the top-3 rows of the gated q12 vectors") {
    val vecs = DocQueries.q12Tfidf(spark, sf0001)
      .as[(Long, String, Double)].collect()
    val expected = vecs.groupBy(_._1).toSeq.flatMap { case (id, g) =>
      g.sortBy(v => (-v._3, v._2)).take(3).zipWithIndex
        .map { case ((_, word, w), i) => (id, i + 1L, word, w) }
    }.toSet
    val got = DocQueries.q194DocKeywords(spark, sf0001)
      .as[(Long, Long, String, Double)].collect().toSet
    assert(got === expected)
    // every doc with >= 3 terms contributes exactly 3 keywords
    val termCounts = vecs.groupBy(_._1).view.mapValues(_.length)
    assert(got.groupBy(_._1).forall { case (id, ks) =>
      ks.size == math.min(3, termCounts(id)) })
  }

  // ------------------------------------------------------------- q195
  test("q195: exact-moment correlation matches a local BigInt computation") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_returnflag", "l_quantity", "l_extendedprice")
      .as[(String, Double, Double)].collect()
    val expected = li.groupBy(_._1).map { case (f, g) =>
      val xs = g.map(e => BigInt(q0(e._2)))
      val ys = g.map(e => BigInt(q0(e._3 * 100)))
      val n = BigInt(g.length)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val (sxx, syy) = (xs.map(a => a * a).sum, ys.map(b => b * b).sum)
      val corr = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (math.sqrt(n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
         math.sqrt(n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
      (f, g.length.toLong, r6(corr))
    }.toSet
    val got = Round9Queries.q195Correlation(spark, sf0001)
      .as[(String, Long, Double)].collect().toSet
    assert(got === expected)
    assert(got.forall { case (_, _, c) => c >= -1.0 && c <= 1.0 })
  }

  // ------------------------------------------------------------- q180
  test("q180: TWAP matches the local step-function integral") {
    val expected = eventsLocal.groupBy(_._1).toSeq.flatMap { case (u, g) =>
      val s = g.sortBy(e => (e._3, e._2))
      val iv = s.zip(s.tail).map { case (a, b) => (b._3 - a._3, q0(a._4 * 1000)) }
      val tot = iv.map(_._1).sum
      if (iv.isEmpty || tot == 0L) None
      else Some((u, iv.length.toLong, tot,
        r6(iv.map { case (d, v) => d * v }.sum.toDouble / tot.toDouble / 1000.0)))
    }.toSet
    val got = Round9Queries.q180Twap(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === expected)
    // TWAP is bounded by the observed value range
    val bounds = eventsLocal.groupBy(_._1).map { case (u, g) =>
      (u, (g.map(_._4).min - 1e-3, g.map(_._4).max + 1e-3)) }
    assert(got.forall { case (u, _, _, t) =>
      val (lo, hi) = bounds(u); t >= lo && t <= hi })
  }
}
