package graft.operators

import org.apache.spark.sql.functions.col

import graft.{SparkTestBase, Tables}

/** Round-8 queries: driver-side re-derivations (independent Scala
  * implementations over collected sf0.001 data) so each gated query has
  * a second, oracle-independent witness.
  */
class Round8QueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def q0(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ------------------------------------------------------------- q153
  test("q153: substring spans match a local suffix-scan re-derivation") {
    val L = Round8Queries.SubstrL
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for ((_, t) <- docs; i <- 0 to t.length - L)
      counts.updateWith(t.substring(i, i + L))(c => Some(c.getOrElse(0) + 1))
    val expected = docs.flatMap { case (id, t) =>
      val pos = (0 to t.length - L)
        .filter(i => counts(t.substring(i, i + L)) >= 2).map(_ + 1)
      if (pos.isEmpty) None
      else {
        // islands: break when the gap to the previous position > L
        var spans = List((pos.head, pos.head))
        for (p <- pos.tail)
          if (p - spans.head._2 <= L) spans = (spans.head._1, p) :: spans.tail
          else spans = (p, p) :: spans
        Some((id, pos.size.toLong, spans.size.toLong,
          spans.map { case (a, b) => b - a + L.toLong }.sum))
      }
    }.toSet
    val got = Round8Queries.q153ExactSubstrSpans(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q153: past the broadcast gate the prune is a shuffled semi-join, same rows") {
    val base = Round8Queries.q153ExactSubstrSpans(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    def semiBroadcasts(): Boolean =
      Round8Queries.q153ExactSubstrSpans(spark, sf0001)
        .queryExecution.sparkPlan.toString.linesIterator.exists(l =>
          l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
    // size-based auto-broadcast off: the HINT is then the only thing
    // that can broadcast the dup-hash set, so the gate's effect is
    // exactly observable
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(semiBroadcasts(),
        "under the gate the dup-hash prune must broadcast by hint")
      spark.conf.set("graft.substr.maxBroadcastDupHashes", "0")
      assert(!semiBroadcasts(),
        "past the gate the hint must vanish (shuffled semi-join)")
      val got = Round8Queries.q153ExactSubstrSpans(spark, sf0001)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === base)
    } finally {
      spark.conf.unset("graft.substr.maxBroadcastDupHashes")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  // ------------------------------------------------------------- q154
  test("q154: covariance numerators match a local integer re-derivation") {
    val d = Round8Queries.GramDim
    val vecs = Tables.embeddings(spark, sf0001)
      .select("embedding").as[Seq[Float]].collect()
      .map(_.map(x => q0(1e6 * x.toDouble)).toArray)
    val n = vecs.length.toLong
    val sx = Array.tabulate(d)(i => vecs.map(_(i)).sum)
    val expected = (for (i <- 0 until d; j <- i until d) yield
      (i, j, n * vecs.map(v => v(i) * v(j)).sum - sx(i) * sx(j))).toSet
    val got = Round8Queries.q154EmbeddingCovariance(spark, sf0001)
      .as[(Int, Int, Long)].collect().toSet
    assert(got === expected)
    assert(got.size === d * (d + 1) / 2)
    // diagonal entries are n²·variance ≥ 0
    got.filter(c => c._1 == c._2).foreach(c => assert(c._3 >= 0L))
  }

  test("q154: gram aggregate is partitioning-invariant (merge law)") {
    val base = Round8Queries.q154EmbeddingCovariance(spark, sf0001)
      .as[(Int, Int, Long)].collect().toSet
    val skewed = graft.Tables.embeddings(spark, sf0001).repartition(7)
    val gram = org.apache.spark.sql.functions.udaf(
      new graft.functions.GramMatrixAgg(Round8Queries.GramDim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    val re = skewed.agg(gram(col("embedding")).as("cells"))
      .select(org.apache.spark.sql.functions.explode(col("cells")).as("c"))
      .select(col("c.i"), col("c.j"), col("c.cov_num"))
      .as[(Int, Int, Long)].collect().toSet
    assert(re === base)
  }

  // ------------------------------------------------------------- q155
  test("q155: blocked hard negatives match a local replay; recall vs brute force") {
    val raw = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // centroids: per-(label, j) round(avg, 6) — the q47 contract
    val cents: Map[Int, Array[Double]] = raw.groupBy(_._2).map { case (l, g) =>
      val dim = g.head._3.length
      l -> Array.tabulate(dim) { j =>
        r6(g.map(_._3(j).toDouble).sum / g.length)
      }
    }
    // top-2 probes per vector by (round6(dot) desc, label asc)
    val probes: Map[Long, Seq[Int]] = raw.map { case (id, _, v) =>
      id -> cents.toSeq.map { case (cl, m) =>
        (r6(v.indices.map(j => v(j).toDouble * m(j)).sum), cl)
      }.sortBy { case (c, cl) => (-c, cl) }.take(Round8Queries.HardNegProbes)
        .map(_._2)
    }.toMap
    val quant = raw.map { case (id, l, v) =>
      (id, l, v.map(x => q0(1e6 * x.toDouble)).toArray)
    }
    def dp(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    // blocked truth: argmax over cross-label vectors sharing a probed cluster
    val expected = quant.flatMap { case (id, l, q) =>
      val mine = probes(id).toSet
      val cands = quant.filter { case (nid, nl, _) =>
        nl != l && nid != id && probes(nid).exists(mine)
      }
      if (cands.isEmpty) None
      else {
        val best = cands.map { case (nid, nl, nq) => (dp(q, nq), -nid, nl) }.max
        Some((id, l, -best._2, best._3, best._1))
      }
    }.toSet
    val got = Round8Queries.q155HardNegatives(spark, sf0001)
      .as[(Long, Int, Long, Int, Long)].collect().toSet
    assert(got === expected)
    got.foreach { case (_, l, _, nl, _) => assert(l != nl) }
    // quality vs the unblocked brute-force truth (the same index-quality
    // gate q99 applies to LSH candidates). The synthetic embeddings have
    // weak NN structure (the q20 calibration note), so exact top-1
    // recall is data-limited (~0.59 measured) — but a miner needs HARD
    // negatives, not the unique hardest: the product contract asserted
    // here is that every anchor is covered and every blocked pick ranks
    // within the brute-force top-10 hardest negatives for that anchor.
    val bruteTop = quant.map { case (id, l, q) =>
      val scored = quant.filter(r => r._2 != l)
        .map { case (nid, _, nq) => (dp(q, nq), nid) }
      id -> (scored.map(_._1).max,
        scored.sortBy { case (d, nid) => (-d, nid) }.take(10).map(_._2).toSet)
    }.toMap
    val gotById = got.map(r => r._1 -> r).toMap
    assert(gotById.size == raw.length, "top-2 probe blocking must cover every anchor")
    gotById.foreach { case (id, (_, _, negId, _, d)) =>
      assert(d <= bruteTop(id)._1, "blocked dp can never exceed the brute-force best")
      assert(bruteTop(id)._2.contains(negId),
        s"anchor $id: blocked pick $negId outside the brute-force top-10")
    }
    val hits = gotById.count { case (id, r) => r._5 == bruteTop(id)._1 }
    val recall = hits.toDouble / gotById.size
    assert(recall >= 0.5, s"top-1 recall $recall below 0.5")
  }

  // ------------------------------------------------------------- q156
  test("q156: fertility recomputes from its own exact sums") {
    val rows = TextStatsQueries.q156TokenizerFertility(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nDocs, chars, toks, fert) =>
      assert(nDocs > 0 && toks > 0)
      // merged BPE tokens average more than one char each
      assert(fert === q0(1e6 * (chars.toDouble / toks.toDouble)))
      assert(fert > 1000000L)
    }
    val total = rows.map(_._2).sum
    assert(total === Tables.documents(spark, sf0001).count())
  }

  // ------------------------------------------------------------- q157
  test("q157: shard plan matches a local serpentine assignment and balances") {
    val n = Round8Queries.NumShards
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
      .sortBy { case (id, c) => (-c, id) }
    val assigned = docs.zipWithIndex.map { case ((id, c), rn0) =>
      val off = rn0 % n
      val shard = if ((rn0 / n) % 2 == 0) off else n - 1 - off
      (shard, id, c)
    }
    val expected = assigned.groupBy(_._1).map { case (s, g) =>
      (s, g.length.toLong, g.map(_._3).sum) }.toSet
    val got = Round8Queries.q157ShardPlan(spark, sf0001)
      .as[(Int, Long, Long)].collect().toSet
    assert(got === expected)
    // balance: serpentine keeps the spread below one max-doc size
    val sizes = got.map(_._3)
    assert(sizes.max - sizes.min <= docs.map(_._2).max,
      s"shard spread ${sizes.max - sizes.min} exceeds max doc")
  }

  // ------------------------------------------------------------- q159
  test("q159: k-anonymity audit matches a local QI-group re-derivation") {
    val k = Round8Queries.AnonK
    val docs = Tables.documents(spark, sf0001)
      .select("source", "lang", "n_chars").as[(String, String, Long)].collect()
    val groups = docs.groupBy { case (s, l, c) =>
      (s, l, c / Round8Queries.LenBucket) }.toSeq.map { case (_, g) =>
      (g.head._1, g.length.toLong) }
    val expected = groups.groupBy(_._1).map { case (src, gs) =>
      val nDocs = gs.map(_._2).sum
      val atRisk = gs.filter(_._2 < k).map(_._2).sum
      (src, gs.length.toLong, nDocs, gs.count(_._2 < k).toLong, atRisk,
        q0(1e6 * (atRisk.toDouble / nDocs.toDouble)))
    }.toSet
    val got = Round8Queries.q159KAnonymity(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // small strata at sf0.001 mean the audit actually flags something
    assert(got.exists(_._4 > 0))
  }

  // ------------------------------------------------------------- q160
  test("q160: domain rollup matches a local synthesize-and-parse") {
    val tlds = Vector("com", "org", "net", "io", "edu")
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "n_chars").as[(Long, String, Long)].collect()
    val parsed = docs.map { case (id, src, nc) =>
      val h = java.lang.Long.parseLong(md5Hex(s"u|$id").take(12), 16)
      val url = s"https://d${h % 500}.${tlds((h / 500 % 5).toInt)}/$src/$id"
      val m = "^https?://([^/]+)(/.*)$".r.findFirstMatchIn(url).get
      val host = m.group(1)
      val segs = m.group(2).split("/").length - 1
      (host.split("\\.").last, host, nc, segs.toLong)
    }
    val expected = parsed.groupBy(_._1).map { case (tld, g) =>
      (tld, g.length.toLong, g.map(_._2).distinct.length.toLong,
        g.map(_._3).sum, g.map(_._4).sum) }.toSet
    val got = Round8Queries.q160DomainRollup(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.map(_._1) === tlds.toSet)
  }

  // ------------------------------------------------------------- q161
  test("q161: skew audit matches a local Gini/salt re-derivation") {
    val counts = Tables.events(spark, sf0001)
      .select("user_id").as[Long].collect()
      .groupBy(identity).map { case (u, g) => (u, g.length.toLong) }.toSeq
    val sorted = counts.sortBy { case (u, c) => (c, u) }
    val n = sorted.length.toLong
    val rows = sorted.map(_._2).sum
    val maxC = sorted.map(_._2).max
    val ic = sorted.zipWithIndex.map { case ((_, c), i) => (i + 1) * c }.sum
    val gini = q0(1e6 * ((2.0 * ic - (n + 1.0) * rows) / (n.toDouble * rows)))
    val salt = math.max(1L, (maxC * n + rows - 1) / rows)
    val got = Round8Queries.q161SkewAudit(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((n, rows, maxC, gini, salt)))
    // Gini of a count distribution lives in [0, 1)
    assert(gini >= 0L && gini < 1000000L)
  }

  // ------------------------------------------------------------- q162
  test("q162: sentence stats match a local regex re-derivation") {
    val docs = Tables.documents(spark, sf0001)
      .select("lang", "text").as[(String, String)].collect()
    val per = docs.map { case (l, t) =>
      (l, "[.!?]+".r.findAllIn(t).length.toLong,
        "[^ ]+".r.findAllIn(t).length.toLong) }
    val expected = per.groupBy(_._1).map { case (l, g) =>
      val ss = g.map(_._2).sum; val ww = g.map(_._3).sum
      (l, g.length.toLong, ss, ww,
        if (ss == 0) None else Some(q0(1e6 * (ww.toDouble / ss.toDouble))))
    }.toSet
    val got = Round8Queries.q162SentenceStats(spark, sf0001)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSet
    assert(got === expected)
  }

  // ------------------------------------------------------------- q163
  test("q163: integer power iteration tracks the double-precision eigenvector") {
    val got = Round8Queries.q163PowerIteration(spark, sf0001)
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    assert(got.length === Round8Queries.GramDim)
    // max-norm rescale leaves at least one coordinate at exactly ±1e6
    assert(got.map(math.abs).max === 1000000L)
    // double-precision reference: same v0, same 3 rounds, real covariance
    val vecs = Tables.embeddings(spark, sf0001)
      .select("embedding").as[Seq[Float]].collect()
      .map(_.map(x => q0(1e6 * x.toDouble).toDouble).toArray)
    val d = Round8Queries.GramDim
    val n = vecs.length.toDouble
    val sx = Array.tabulate(d)(i => vecs.map(_(i)).sum)
    val cov = Array.tabulate(d, d)((i, j) =>
      (n * vecs.map(v => v(i) * v(j)).sum - sx(i) * sx(j)) / (n * n) / 1e6)
    var v = Array.fill(d)(1.0)
    for (_ <- 1 to Round8Queries.PowerRounds) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val mx = w.map(math.abs).max
      v = w.map(_ / mx)
    }
    val gd = got.map(_.toDouble / 1e6)
    val cos = (gd, v).zipped.map(_ * _).sum /
      (math.sqrt(gd.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    assert(math.abs(cos) > 0.99, s"integer iterate drifted: cos=$cos")
  }

  // ------------------------------------------------------------- q164
  test("q164: variant extraction returns exactly the synthesized fields") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "n_chars").as[(Long, String, Long)].collect()
    val per = docs.map { case (id, l, nc) =>
      val h = java.lang.Long.parseLong(md5Hex(s"j|$id").take(12), 16)
      (l, nc, h % 10, s"t${h % 7}") }
    val expected = per.groupBy(_._1).map { case (l, g) =>
      (l, g.length.toLong, g.map(_._2).sum, g.map(_._3).sum,
        g.map(_._4).distinct.length.toLong) }.toSet
    val got = Round8Queries.q164VariantExtract(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
  }

  // ------------------------------------------------------------- q165
  test("q165: apportionment matches a local Hamilton allocation; sums to B") {
    val b = Round8Queries.Budget
    val counts = Tables.documents(spark, sf0001)
      .select("source").as[String].collect()
      .groupBy(identity).toSeq.map { case (s, g) => (s, g.length.toLong) }
    val total = counts.map(_._2).sum
    val quotas = counts.map { case (s, c) => (s, c, b * c / total, b * c % total) }
    val extras = quotas.sortBy { case (s, _, _, rem) => (-rem, s) }
      .take((b - quotas.map(_._3).sum).toInt).map(_._1).toSet
    val expected = quotas.map { case (s, c, base, rem) =>
      (s, c, base, rem, base + (if (extras(s)) 1L else 0L)) }.toSet
    val got = Round8Queries.q165BudgetApportion(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // the defining Hamilton property: allocations sum EXACTLY to B
    assert(got.toSeq.map(_._5).sum === b)
    // and every allocation is within 1 of the floor quota
    got.foreach { case (_, _, base, _, alloc) =>
      assert(alloc == base || alloc == base + 1) }
  }

  // ------------------------------------------------------------- q166
  test("q166: chi-square drift matches a local dense-grid re-derivation") {
    val toks = Tables.documents(spark, sf0001)
      .select("source", "text").as[(String, String)].collect()
      .flatMap { case (s, t) => t.split(" ", -1).map((s, _)) }
    val sw = toks.groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
    val st = toks.groupBy(_._1).map { case (s, g) => (s, g.length.toLong) }
    val cw = toks.groupBy(_._2).map { case (w, g) => (w, g.length.toLong) }
    val t = toks.length.toLong
    val expected = st.keys.map { s =>
      val terms = cw.toSeq.map { case (w, c) =>
        val obs = sw.getOrElse((s, w), 0L).toDouble
        val exp = st(s).toDouble * c / t
        (obs, q0(1e9 * (obs - exp) * (obs - exp) / exp))
      }
      (s, cw.size.toLong, terms.count(_._1 == 0d).toLong,
        terms.map(_._2).sum)
    }.toSet
    val got = Round8Queries.q166ChiSquareDrift(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // chi-square is non-negative by construction
    got.foreach { case (_, _, _, chi2) => assert(chi2 >= 0L) }
  }

  // ------------------------------------------------------------- q167
  test("q167: every document BPE-decodes back to its normalized text") {
    val rows = TextStatsQueries.q167BpeDecode(spark, sf0001)
      .as[(Long, Long, String, Long)].collect()
    assert(rows.length ===
      Tables.documents(spark, sf0001).count().toInt)
    // losslessness: EVERY doc round-trips bit-exactly
    assert(rows.forall(_._4 == 1L), "a document failed the decode round-trip")
    // and the decoded text is the normalized original, not empty
    assert(rows.count(_._2 > 0) > rows.length / 2)
  }

  // ------------------------------------------------------------- q168
  test("q168: repetition ratio matches a local 4-gram re-derivation") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    val per = docs.map { case (_, src, t) =>
      val toks = t.split(" ", -1)
      val grams = toks.sliding(Round8Queries.RepN).filter(
        _.length == Round8Queries.RepN).map(_.mkString("")).toSeq
      val byG = grams.groupBy(identity)
      (src, grams.size.toLong,
        byG.valuesIterator.map(_.size).filter(_ >= 2).map(_.toLong).sum)
    }
    val expected = per.groupBy(_._1).map { case (src, g) =>
      val n = g.map(_._2).sum; val d = g.map(_._3).sum
      (src, g.length.toLong, n, d,
        if (n == 0) None else Some(q0(1e6 * (d.toDouble / n.toDouble))))
    }.toSet
    val got = Round8Queries.q168IntraDocRepetition(spark, sf0001)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSet
    assert(got === expected)
  }

  // ------------------------------------------------------------- q169
  test("q169: confusion matrix folds exactly from the gated q25 predictions") {
    val pred = TextStatsQueries.q25LangId(spark, sf0001)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val cells = docs.groupBy { case (id, l) => (l, pred(id)) }
      .map { case (k, g) => (k._1, k._2, g.length.toLong) }.toSeq
    val expected = cells.groupBy(_._1).flatMap { case (_, g) =>
      val tot = g.map(_._3).sum
      g.map { case (t, p, n) =>
        (t, p, n, q0(1e6 * (n.toDouble / tot.toDouble))) }
    }.toSet
    val got = TextStatsQueries.q169LangConfusion(spark, sf0001)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === expected)
    // cell counts account for every document
    assert(got.toSeq.map(_._3).sum === docs.length.toLong)
  }

  // ------------------------------------------------------------- q170
  test("q170: histogram matches local integer binning; mass conserved") {
    val b = EventQueries.HistBins
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
      .map { case (t, v) => (t, q0(1e6 * v)) }
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (t, g) =>
      val mn = g.map(_._2).min; val mx = g.map(_._2).max
      g.groupBy { case (_, v) =>
        math.min(b - 1, b * (v - mn) / (mx - mn + 1)) }
        .map { case (bin, h) => (t, bin, h.length.toLong, mn, mx) }
    }.toSet
    val got = EventQueries.q170ValueHistogram(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.toSeq.map(_._3).sum === ev.length.toLong)
    got.foreach { case (_, bin, _, _, _) => assert(bin >= 0 && bin < b) }
  }

  // ------------------------------------------------------------- q171
  test("q171: funnel matches a local strict-ordering re-derivation") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.unix_millis(col("ts")))
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    def stageMin(prev: Map[Long, Long], tpe: String): Map[Long, Long] =
      prev.flatMap { case (u, t) =>
        val after = byUser(u).filter(e => e._2 == tpe && e._3 > t).map(_._3)
        if (after.isEmpty) None else Some(u -> after.min)
      }
    val v = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, g) => u -> g.map(_._3).min }
    val c = stageMin(v, "click")
    val p = stageMin(c, "purchase")
    val got = EventQueries.q171Funnel(spark, sf0001)
      .as[(Long, String, Long, Option[Long])].collect().sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3)).toSeq === Seq(
      (1L, "view", v.size.toLong), (2L, "click", c.size.toLong),
      (3L, "purchase", p.size.toLong)))
    assert(got(0)._4.isEmpty)
    assert(got(1)._4 === Some(q0(1e6 * (c.size.toDouble / v.size))))
    assert(got(2)._4 === Some(q0(1e6 * (p.size.toDouble / c.size))))
    // strict ordering makes each stage a (non-strict) subset of the previous
    assert(c.size <= v.size && p.size <= c.size)
  }

  // ------------------------------------------------------------- q172
  test("q172: purge manifest matches a local union-find + ranking") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "n_chars").as[(Long, String, Long)].collect()
    val pairs = DedupQueries.q16LshNearDups(spark, sf0001)
      .select("a", "b").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val byCluster = docs.groupBy(d => find(d._1))
    val purged = byCluster.values.flatMap { members =>
      members.sortBy { case (id, _, nc) => (-nc, id) }.drop(1)
    }.toSeq
    val expected = docs.groupBy(_._2).map { case (src, g) =>
      val pg = purged.filter(_._2 == src)
      (src, g.length.toLong, pg.length.toLong, pg.map(_._3).sum,
        g.length.toLong - pg.length.toLong)
    }.toSet
    val got = DedupQueries.q172CanonicalPurge(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // at least one cluster actually collapses at sf0.001
    assert(got.toSeq.map(_._3).sum > 0)
  }

  // ------------------------------------------------------------- q173
  test("q173: pivot-unpivot is the identity on the long form; NULL cells drop") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect()
    val expected = ev.groupBy(e => (e._1 % 10, e._2)).map { case ((c, t), g) =>
      val cents = g.map(e => BigDecimal(e._3 * 10000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
      (c, t, BigDecimal(cents.toDouble / 10000.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = RelationalOps.q173UnpivotRoundtrip(spark, sf0001)
      .as[(Long, String, Double)].collect().toSet
    assert(got === expected)
    // NULL-cell drop: a synthetic frame with a missing (cohort, type)
    // combo must not surface it after the round trip
    val tiny = Seq((0L, "click", 1.0), (1L, "view", 2.0))
      .toDF("user_id", "event_type", "value")
    val wide = tiny.withColumn("cohort", col("user_id") % 10)
      .groupBy(col("cohort"))
      .pivot("event_type", Seq("click", "view"))
      .agg(org.apache.spark.sql.functions.round(
        RelationalOps.exactMoneySum(col("value")), 6))
    // raw unpivot KEEPS the empty cells as NULL rows...
    val raw = wide.unpivot(Array(col("cohort")),
      Array(col("click"), col("view")), "event_type", "total")
    assert(raw.count() === 4)
    assert(raw.filter(col("total").isNull).count() === 2)
    // ...and the operator's documented isNotNull drop restores identity
    val melted = raw.filter(col("total").isNotNull)
      .as[(Long, String, Double)].collect().toSet
    assert(melted === Set((0L, "click", 1.0), (1L, "view", 2.0)))
  }

  // ------------------------------------------------------------- q174
  test("q174: LATERAL top-2 equals the window-rank form") {
    import org.apache.spark.sql.expressions.Window
    val viaWindow = Tables.nation(spark, sf0001)
      .join(Tables.supplier(spark, sf0001),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"), col("n_name"))
      .agg(org.apache.spark.sql.functions.round(
        RelationalOps.exactMoneySum(col("s_acctbal")), 6).as("bal"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number()
        .over(Window.partitionBy(col("n_regionkey"))
          .orderBy(col("bal").desc, col("n_name"))))
      .filter(col("rk") <= 2)
      .join(Tables.region(spark, sf0001),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("r_name"), col("n_name"), col("bal"))
      .as[(String, String, Double)].collect().toSet
    val got = RelationalOps.q174LateralTopN(spark, sf0001)
      .as[(String, String, Double)].collect()
    assert(got.toSet === viaWindow)
    // LIMIT 2 caps every region (a region may have fewer supplier
    // nations at tiny SF)
    assert(got.groupBy(_._1).forall(_._2.length <= 2))
    assert(got.nonEmpty)
  }

  // ------------------------------------------------------------- q158
  test("q158: frame grid matches the local sampling arithmetic") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text", "n_chars").as[(Long, String, Long)].collect()
    val expected = docs.filter(_._1 % 3 == 2).flatMap { case (id, t, nc) =>
      val nFrames = nc * 10 * Round8Queries.Fps / 1000
      (0L until nFrames by Round8Queries.SampleEvery.toLong).map { f =>
        (id, f.toInt, f * 1000000 / Round8Queries.Fps,
          md5Hex(s"${md5Hex(t)}:$f"))
      }
    }.toSet
    val got = Round8Queries.q158VideoFrameSample(spark, sf0001)
      .as[(Long, Int, Long, String)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
