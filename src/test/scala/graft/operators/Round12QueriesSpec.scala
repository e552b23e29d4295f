package graft.operators

import org.apache.spark.sql.functions.col

import graft.{SparkTestBase, Tables}

/** Round-12 queries: driver-side re-derivations (independent Scala
  * implementations over collected sf0.001 data) plus the laws each
  * construct must satisfy — prefix-filter completeness (vs brute-force
  * all-pairs Jaccard), Aho–Corasick ≡ naive sliding-window counts,
  * Misra–Gries eviction/error bounds on adversarial streams, HRW
  * minimal movement, and skyline ≡ the O(n²) dominance definition.
  */
class Round12QueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The repo-wide normalize: lowercase, digits+non-word → space, trim. */
  private def tokensOf(text: String): Array[String] =
    text.toLowerCase.replaceAll("(\\d|\\W)+", " ").trim
      .split(" ").filter(_.nonEmpty)

  private def docsLocal: Array[(Long, String)] =
    Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()

  // ------------------------------------------------------------- q211
  test("q211: prefix-filter join finds exactly the brute-force J>=0.8 pairs") {
    val n = Round12Queries.SetSimShingleN
    val sets: Map[Long, Set[String]] = docsLocal.map { case (id, t) =>
      val ws = tokensOf(t)
      id -> (if (ws.length < n) Set.empty[String]
             else ws.sliding(n).map(_.mkString(" ")).toSet)
    }.toMap
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices.iterator; j <- ((i + 1) until ids.length).iterator
      a = ids(i); b = ids(j)
      sa = sets(a); sb = sets(b)
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      uni = sa.size + sb.size - inter
      // J >= 4/5  <=>  9*inter >= 4*(|a|+|b|)
      if inter * 9 >= (sa.size + sb.size) * 4
    } yield (a, b, inter.toLong, uni.toLong,
      BigDecimal(1e6 * inter / uni).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    ).toSet
    val got = Round12Queries.q211SetSimJoin(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // equality IS the prefix-filter completeness law: the blocked join
    // must lose nothing against the all-pairs truth, and verify must
    // kill every false candidate
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q211/q224: positional filter strictly prunes candidates, never a true pair") {
    // at the production 5-shingle size only ~25 doc pairs in the whole
    // sf0.01 corpus share ANY shingle (co-occurrence is the binding
    // constraint, and all of them are true near-dups) — so the BITE of
    // the positional bound is demonstrated on 2-shingles, where
    // co-occurrence is dense and the prefix filter alone admits far
    // more candidates than can pass τ
    val sh = graft.dedup.Dedup.shingleSets(
      Tables.documents(spark, sf001), "doc_id", "text", 2).localCheckpoint()
    val ranked = Round12Queries.rankedByRarity(sh).localCheckpoint()
    for ((tn, td) <- Seq((1, 2), (4, 5))) {
      val prefixOnly = Round12Queries
        .setSimCandidates(ranked, positional = false, tn, td).count()
      val posCount = Round12Queries
        .setSimCandidates(ranked, positional = true, tn, td).count()
      info(s"q211 tau=$tn/$td candidates: prefix-only=$prefixOnly " +
        s"positional=$posCount" + (if (prefixOnly > 0)
          f" (${100.0 * (prefixOnly - posCount) / prefixOnly}%.1f%% pruned)"
        else ""))
      assert(posCount <= prefixOnly)
      if ((tn, td) == ((1, 2))) assert(posCount < prefixOnly,
        "positional bound must strictly prune the loose-τ candidate set")
    }
    // soundness on the PRODUCTION path (5-shingles, τ=4/5): every true
    // q211 pair survives the positional filter
    val sh5 = graft.dedup.Dedup.shingleSets(
      Tables.documents(spark, sf001), "doc_id", "text",
      Round12Queries.SetSimShingleN).localCheckpoint()
    val positional = Round12Queries.setSimCandidates(
      Round12Queries.rankedByRarity(sh5), positional = true)
    val truePairs = Round12Queries.q211SetSimJoin(spark, sf001)
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    val keptPairs = positional.select(col("a"), col("b"))
      .as[(Long, Long)].collect().toSet
    assert(truePairs.subsetOf(keptPairs),
      s"pruned true pairs: ${truePairs -- keptPairs}")
    // containment (q224 shape), same ranked table and law
    for ((tn, td) <- Seq((1, 2), (9, 10))) {
      val cPrefixOnly = Round12Queries.containmentCandidates(
        ranked, tn, td, positional = false).count()
      val cPosCount = Round12Queries.containmentCandidates(
        ranked, tn, td, positional = true).count()
      info(s"q224-shape tau=$tn/$td candidates: prefix-only=$cPrefixOnly " +
        s"positional=$cPosCount" + (if (cPrefixOnly > 0)
          f" (${100.0 * (cPrefixOnly - cPosCount) / cPrefixOnly}%.1f%% pruned)"
        else ""))
      assert(cPosCount <= cPrefixOnly)
      if ((tn, td) == ((1, 2))) assert(cPosCount < cPrefixOnly,
        "positional bound must strictly prune the loose-τ candidate set")
    }
  }

  // ------------------------------------------------------------- q212
  test("q212: AC automaton counts equal naive overlapping substring counts") {
    // kernel check on adversarial cases first
    import graft.functions.AhoCorasick
    import org.apache.spark.unsafe.types.UTF8String
    def naive(t: String, p: String): Long =
      (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length)).toLong
    val pats = Array("a", "aa", "ab", "he", "the", "her")
    val auto = new AhoCorasick.Automaton(pats)
    for (t <- Seq("", "aaaa", "ababab", "the her there", "xyz", "aabaa")) {
      val got = auto.countAll(UTF8String.fromString(t)).toLongArray()
      val exp = pats.map(naive(t, _))
      assert(got.toSeq === exp.toSeq, s"text '$t'")
    }
    // gated query vs local replay on real docs
    val expected = Round12Queries.DictPatterns.map { p =>
      val per = docsLocal.map { case (_, t) => naive(t, p) }
      (p, per.sum, per.count(_ > 0).toLong)
    }.toSet
    val got = Round12Queries.q212DictionaryMatch(spark, sf0001)
      .as[(String, Long, Long)].collect().toSet
    assert(got === expected)
    // overlap semantics really bite: "the" occurrences imply >= as many
    // "he" occurrences
    val m = got.map(r => r._1 -> r._2).toMap
    assert(m("he") >= m("the"))
    assert(m("at") >= m("data"))
  }

  // ------------------------------------------------------------- q213
  test("q213: MG summary laws + exact heavy hitters match the local counts") {
    import graft.functions.MisraGries
    // adversarial stream: heavy item interleaved with k distinct spam
    // items that force constant eviction
    val k = 4
    val stream = (0 until 400).flatMap(i =>
      Seq("heavy", s"spam${i % 8}")) // heavy: 400 of 800; spam_j: 50 each
    val sum = MisraGries.summarize(stream.iterator, k)
    assert(sum.size <= k, "summary must stay bounded")
    assert(sum.contains("heavy"), "an item with count > n/k must survive")
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong)
    sum.foreach { case (w, est) =>
      assert(est <= trueCounts(w), "estimates never overcount")
      assert(trueCounts(w) - est <= stream.size.toLong / k,
        "undercount is bounded by n/k")
    }
    // gated query: exact equality with the direct HAVING computation
    val words = docsLocal.flatMap { case (_, t) => tokensOf(t) }
    val n = words.length.toLong
    val expected = words.groupBy(identity).view.mapValues(_.length.toLong)
      .filter { case (_, c) => c * Round12Queries.HhK > n }
      .toMap.toSet
    val got = Round12Queries.q213HeavyHitters(spark, sf0001)
      .as[(String, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty && got.size < words.distinct.length,
      "threshold must split the vocabulary non-trivially")
  }

  // ------------------------------------------------------------- q214
  test("q214: HRW assignment matches the local argmax; movement is minimal") {
    def weight(id: Long, shard: Int): Long =
      java.lang.Long.parseLong(md5Hex(s"$id:$shard").take(12), 16)
    def assign(id: Long, nShards: Int): Int =
      (0 until nShards).maxBy(s => (weight(id, s), -s))
    val ids = docsLocal.map(_._1)
    val before = ids.map(id => id -> assign(id, Round12Queries.ShardsBefore)).toMap
    val after = ids.map(id => id -> assign(id, Round12Queries.ShardsAfter)).toMap
    // minimal-movement law: a changed key can only have moved TO the
    // new shard (argmax over a superset changes only to the new element)
    ids.foreach { id =>
      if (before(id) != after(id))
        assert(after(id) == Round12Queries.ShardsAfter - 1)
    }
    val expected = ids.groupBy(after).map { case (sh, g) =>
      val stayed = g.count(id => before(id) == after(id)).toLong
      (sh.toLong, g.length.toLong, stayed, g.length - stayed)
    }.toSet
    val got = Round12Queries.q214RendezvousShards(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // every shard present; moved fraction is roughly 1/(n_after)
    assert(got.map(_._1) === (0 until Round12Queries.ShardsAfter).map(_.toLong).toSet)
    val moved = got.toSeq.map(_._4).sum
    assert(moved > 0 && moved < ids.length / 4,
      s"HRW moves ~1/${Round12Queries.ShardsAfter} of keys, moved $moved of ${ids.length}")
  }

  // ------------------------------------------------------------- q216
  test("q216: positional-index retrieval equals the q146 scan — index ≡ scan") {
    val fromIndex = Round12Queries.q216PositionalIndex(spark, sf0001)
      .as[(Long, Long)].collect().toSet
    val fromScan = Round7Queries.q146PhraseSearch(spark, sf0001)
      .as[(Long, Long)].collect().toSet
    assert(fromIndex === fromScan,
      "the inverted index must answer the phrase query identically to the scan")
    assert(fromIndex.nonEmpty)
  }

  // ------------------------------------------------------------- q217
  test("q217: nearest-event join matches a local two-pointer replay") {
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val byUser = evs.filter(e => e._4 == "purchase" || e._4 == "click")
      .groupBy(_._1)
    val expected = byUser.flatMap { case (u, g) =>
      val tl = g.sortBy(e => (e._3, e._2))
      val purchases = tl.zipWithIndex.filter(_._1._4 == "purchase")
      if (purchases.isEmpty) None
      else {
        var nM = 0L; var nP = 0L; var nN = 0L; var sumDt = 0L
        purchases.foreach { case (_, idx) =>
          val ts = tl(idx)._3
          val prev = tl.take(idx).filter(_._4 == "click")
            .map(_._3).sorted.lastOption
          val next = tl.drop(idx + 1).filter(_._4 == "click")
            .map(_._3).sorted.headOption
          val dtP = prev.map(ts - _).getOrElse(Long.MaxValue)
          val dtN = next.map(_ - ts).getOrElse(Long.MaxValue)
          val dt = math.min(dtP, dtN)
          if (dt <= Round12Queries.NearTolUs) {
            nM += 1; sumDt += dt
            if (dtP <= dtN) nP += 1 else nN += 1
          }
        }
        Some((u, purchases.length.toLong, nM, nP, nN,
          if (nM > 0) Some(sumDt) else None))
      }
    }.toSet
    val got = Round12Queries.q217NearestEvent(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().toSet
    assert(got === expected)
    // side split conserves matches
    assert(got.forall { case (_, _, m, p, n, _) => p + n == m })
  }

  // ------------------------------------------------------------- q218
  test("q218: grouped OLS matches a BigInt moment replay; R2 in [0,1]") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"),
        org.apache.spark.sql.functions.unix_micros(col("l_shipdate").cast("timestamp")).as("us"),
        col("l_extendedprice"))
      .as[(String, Long, Double)].collect()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = li.map { case (f, us, p) =>
      (f, us / 86400000000L,
        BigDecimal(p * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }.groupBy(_._1).map { case (f, g) =>
      val daily = g.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
      val n = BigInt(daily.length)
      val sx = daily.map(d => BigInt(d._1)).sum
      val sy = daily.map(d => BigInt(d._2)).sum
      val sxy = daily.map(d => BigInt(d._1) * BigInt(d._2)).sum
      val sxx = daily.map(d => BigInt(d._1) * BigInt(d._1)).sum
      val syy = daily.map(d => BigInt(d._2) * BigInt(d._2)).sum
      val slope = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
      val intercept = (sy.toDouble - sx.toDouble * slope) / n.toDouble
      val r2 = math.pow(n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble, 2) /
        ((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
         (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
      (f, daily.length.toLong, r6(slope), r6(intercept), r6(r2))
    }.toSet
    val got = Round12Queries.q218GroupedTrend(spark, sf0001)
      .as[(String, Long, Double, Double, Double)].collect().toSet
    assert(got === expected)
    assert(got.forall { case (_, _, _, _, r2) => r2 >= 0.0 && r2 <= 1.0 })
  }

  // ------------------------------------------------------------- q215
  test("q215: window skyline equals the O(n^2) dominance definition") {
    val pts = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .as[(String, Double, Double)].collect()
      .map { case (f, q, p) =>
        (f, q.toLong,
          BigDecimal(p * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
    val expected = pts.groupBy(_._1).flatMap { case (f, g) =>
      val grouped = g.groupBy(r => (r._2, r._3)).view
        .mapValues(_.length.toLong).toSeq
      val points = grouped.map(_._1)
      grouped.collect {
        case ((x, y), cnt) if !points.exists { case (x2, y2) =>
          (x2 <= x && y2 <= y) && (x2 < x || y2 < y) } =>
          (f, x, y, cnt)
      }
    }.toSet
    val got = Round12Queries.q215Skyline(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // skyline is a staircase: within a flag, cents strictly decrease as
    // qty increases
    got.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.toSeq.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((_, q1, c1, _), (_, q2, c2, _)) =>
          assert(q1 < q2 && c1 > c2)
        case _ =>
      }
    }
  }
}
