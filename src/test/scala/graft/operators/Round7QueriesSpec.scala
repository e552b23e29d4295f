package graft.operators

import org.apache.spark.sql.functions.col

import graft.{SparkTestBase, Tables}

/** Round-7 queries: driver-side re-derivations (independent Scala
  * implementations over collected sf0.001 data) so each gated query has
  * a second, oracle-independent witness.
  */
class Round7QueriesSpec extends SparkTestBase {
  import spark.implicits._

  /** Spark round() semantics: HALF_UP on decimal (away from zero).
    * Callers pass the ALREADY-scaled double (same association as the
    * engine's expression) so no extra float op perturbs the ulp. */
  private def q0(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // ------------------------------------------------------------- q137
  test("q137: blocked fuzzy linkage matches a brute-force re-derivation") {
    val names = Tables.part(spark, sf0001)
      .groupBy("p_name").count()
      .as[(String, Long)].collect().toMap
    val expected = (for {
      (a, ca) <- names; (b, cb) <- names
      if a < b && a.split(" ")(1) == b.split(" ")(1)
      d = lev(a, b) if d <= 3
    } yield (a, b, d, ca * cb)).toSet
    val got = Round7Queries.q137FuzzyPartLinkage(spark, sf0001)
      .as[(String, String, Int, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // the blocking + threshold really excludes pairs (not all-pairs)
    val allPairs = names.size * (names.size - 1) / 2
    assert(got.size < allPairs)
  }

  // ------------------------------------------------------------- q138
  test("q138: char entropy matches the quantized local formula") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text", "source", "n_chars")
      .as[(Long, String, String, Long)].collect()
    val perDoc = docs.map { case (_, text, src, n) =>
      val terms = text.groupBy(identity).values.map { g =>
        val p = g.length.toDouble / n
        q0(1e9 * p * math.log(p)) // same 1e9*(p·ln p) form + association
      }
      (src, -terms.sum)
    }
    val expected = perDoc.groupBy(_._1).map { case (s, xs) =>
      (s, xs.length.toLong, xs.map(_._2).sum)
    }.toSet
    val got = Round7Queries.q138CharEntropy(spark, sf0001)
      .as[(String, Long, Long)].collect().toSet
    assert(got === expected)
    // entropy of these word corpora lands in a sane band (nats)
    val avg = perDoc.map(_._2).sum.toDouble / perDoc.length / 1e9
    assert(avg > 2.0 && avg < 4.0)
  }

  test("q138: native expression matches the declarative HOF form per doc") {
    val both = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        graft.functions.CharEntropyNanoFn(col("text")).as("native"),
        Round7Queries.entropyNanoDeclarative.as("declarative"))
      .as[(Long, Long, Long)].collect()
    both.foreach { case (id, n, d) =>
      assert(n === d, s"doc $id: native $n != declarative $d")
    }
    assert(both.nonEmpty)
  }

  // ------------------------------------------------------------- q139
  test("q139: constraint report matches a collected recount") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text", "lang", "n_chars")
      .as[(Long, String, String, Long)].collect()
    val langs = Set("de", "en", "es", "fr", "zh")
    val row = Round7Queries.q139QualityReport(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(row === ((
      docs.length.toLong, 0L,
      docs.map(_._1).distinct.length.toLong,
      docs.map(_._4).min, docs.map(_._4).max,
      docs.count(d => langs(d._3)).toLong,
      docs.count(d => d._2.getBytes("UTF-8").length == d._4).toLong,
      docs.count(_._2.matches("[a-z ]+")).toLong)))
    // on clean testdata every validity check passes — audit is total
    assert(row._6 === row._1 && row._7 === row._1 && row._8 === row._1)
  }

  // ------------------------------------------------------------- q140
  test("q140: bigram LM matches an independent local model") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect()
    val toks = docs.map { case (id, t, s) => (id, s, t.split(" ").toSeq) }
    val uni = toks.flatMap(_._3).groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val v = uni.size.toLong
    val bigrams = toks.flatMap { case (_, s, ws) =>
      ws.zip(ws.tail).map(p => (s, p))
    }
    val cb = bigrams.map(_._2).groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val k = Round7Queries.BigramK
    val expected = bigrams.groupBy(_._1).map { case (s, xs) =>
      val sum = xs.map { case (_, (w1, w2)) =>
        q0(1e9 * math.log((cb((w1, w2)) + k) / (uni(w1) + k * v)))
      }.sum
      (s, xs.length.toLong, sum)
    }.toSet
    val got = Round7Queries.q140BigramLm(spark, sf0001)
      .as[(String, Long, Long)].collect().toSet
    assert(got === expected)
    // log-probabilities are negative and the model scores real mass
    assert(got.forall(_._3 < 0L))
  }

  // ------------------------------------------------------------- q141
  test("q141: JL projection matches a local integer matmul") {
    val embs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    val expected = (for {
      (id, e) <- embs
      qx = e.map(x => q0(1e6 * x)) // HALF_UP(1e6·x)
      j <- 0 until Round7Queries.JlOutDim
    } yield (id, j,
      (0 until Round7Queries.JlInDim)
        .map(i => Round7Queries.jlSign(i, j) * qx(i)).sum)).toSet
    val got = Round7Queries.q141JlProjection(spark, sf0001)
      .as[(Long, Int, Long)].collect().toSet
    assert(got === expected)
  }

  test("q141: projection approximately preserves cosine (JL property)") {
    val embs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().take(40)
      .map { case (id, e) => id -> e.map(_.toDouble) }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val proj = embs.map { case (id, e) =>
      id -> (0 until Round7Queries.JlOutDim).map(j =>
        (0 until Round7Queries.JlInDim)
          .map(i => Round7Queries.jlSign(i, j) * e(i)).sum).toSeq
    }.toMap
    val full = embs.toMap
    val devs = for {
      (a, ea) <- embs; (b, eb) <- embs if a < b
    } yield math.abs(cos(ea, eb) - cos(proj(a), proj(b)))
    val mad = devs.sum / devs.length
    assert(mad < 0.25, s"mean |Δcos| = $mad — JL structure not preserved")
  }

  // ------------------------------------------------------------- q143
  test("q143: bloom-pruned revenue equals the exact-join recompute") {
    val urgent = Tables.orders(spark, sf0001)
      .filter("o_orderpriority = '1-URGENT' AND o_totalprice > 150000")
      .select("o_orderkey").as[Long].collect().toSet
    val lines = Tables.lineitem(spark, sf0001)
      .selectExpr("l_orderkey", "date_format(l_shipdate, 'yyyy-MM')",
        "l_extendedprice", "l_discount")
      .as[(Long, String, Double, Double)].collect()
    val expected = lines.filter(l => urgent(l._1)).groupBy(_._2).map {
      case (m, xs) =>
        val cents = xs.map(x => q0(x._3 * (1.0 - x._4) * 10000)).sum
        (m, xs.length.toLong,
          BigDecimal(cents.toDouble / 10000.0)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = Round7Queries.q143BloomPrunedRevenue(spark, sf0001)
      .as[(String, Long, Double)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q143: the bloom filter really prunes fact rows before the join") {
    val urgent = Tables.orders(spark, sf0001)
      .filter("o_orderpriority = '1-URGENT' AND o_totalprice > 150000")
      .selectExpr("o_orderkey AS l_orderkey")
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey")
    val pruned = Sketches.bloomPrune(li, urgent, "l_orderkey", 1L << 17)
    val (total, kept) = (li.count(), pruned.count())
    assert(kept < total, "prune must drop non-matching rows map-side")
    // every true match survives (no false negatives, ever)
    val trueMatches = li.join(urgent, Seq("l_orderkey"), "left_semi").count()
    assert(kept >= trueMatches)
  }

  // ------------------------------------------------------------- q144
  test("q144: trigram novelty matches a local split + set re-derivation") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val split = docs.map { case (id, t, src) =>
      val tr = md5hex(t).charAt(0) < 'e'
      val toks = t.split(" ")
      val tgs = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      (id, src, tr, tgs)
    }.filter(_._4.nonEmpty)
    val trainset = split.filter(_._3).flatMap(_._4).toSet
    val expected = split.filterNot(_._3).groupBy(_._2).map { case (src, xs) =>
      (src, xs.length.toLong,
        xs.map(_._4.size.toLong).sum,
        xs.map(_._4.count(g => !trainset(g)).toLong).sum)
    }.toSet
    val got = Round7Queries.q144TrigramNovelty(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // novelty is non-trivial on this corpus: some but not all novel
    val (tg, nov) = (got.map(_._3).sum, got.map(_._4).sum)
    assert(nov > 0 && nov < tg)
  }

  // ------------------------------------------------------------- q145/q146
  test("q145: conjunctive search matches a local contains-all filter") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)].collect()
    val expected = docs.filter { case (_, t, _, _) =>
      val ws = t.split(" ").toSet
      Round7Queries.SearchTerms.forall(ws)
    }.map(d => (d._1, d._3, d._4)).toSet
    val got = Round7Queries.q145ConjunctiveSearch(spark, sf0001)
      .as[(Long, String, String)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty && got.size < docs.length)
  }

  test("q146: phrase search matches a local sliding-window count") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs.map { case (id, t) =>
      val toks = t.split(" ")
      (id, toks.sliding(2).count(p => p.length == 2 &&
        p(0) == Round7Queries.PhraseW1 && p(1) == Round7Queries.PhraseW2).toLong)
    }.filter(_._2 > 0).toSet
    val got = Round7Queries.q146PhraseSearch(spark, sf0001)
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // adjacency is stricter than co-occurrence: some docs have both
    // words but never adjacent
    val cooc = docs.count { case (_, t) =>
      val ws = t.split(" ").toSet
      ws(Round7Queries.PhraseW1) && ws(Round7Queries.PhraseW2)
    }
    assert(got.size < cooc)
  }

  test("q146 kernel: phrase_count edge cases match the declarative contract") {
    import graft.functions.PhraseCount
    import org.apache.spark.unsafe.types.UTF8String
    // the original interpreted form: filter(sequence(1, size-1),
    // i -> toks[i] = w1 and toks[i+1] = w2) over split(text, ' ')
    def declarative(t: String): Long = {
      val toks = t.split(" ", -1)
      (1 until toks.length)
        .count(i => toks(i - 1) == "key" && toks(i) == "order").toLong
    }
    val cases = Seq("", "key", "order", "key order", "key order key order",
      "key key order", "key  order", " key order ", "keyorder",
      "key order order key", "key order key", "a key order b key order",
      "keys order", "key orders")
    for (t <- cases)
      assert(PhraseCount.count(UTF8String.fromString(t), "key", "order")
        === declarative(t), s"input: '$t'")
  }

  // ------------------------------------------------------------- q147
  test("q147: PII counts and redacted md5 match a java.util.regex replay") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs.map { case (id, text) =>
      val block = s" contact user$id@mail.example or +1-555-${id % 10000}" +
        s" ip 10.${id % 256}.0.1"
      val t = text + block * (id % 3).toInt
      def count(re: String) = re.r.findAllIn(t).length.toLong
      val red = t.replaceAll(Round7Queries.EmailRe, "<EMAIL>")
        .replaceAll(Round7Queries.IpRe, "<IP>")
        .replaceAll(Round7Queries.PhoneRe, "<PHONE>")
      (id, count(Round7Queries.EmailRe), count(Round7Queries.PhoneRe),
        count(Round7Queries.IpRe), md5hex(red))
    }.toSet
    val got = Round7Queries.q147PiiRedaction(spark, sf0001)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got === expected)
    // zero-PII docs (doc_id % 3 == 0) pass through byte-identical
    val origMd5 = docs.toMap
    got.filter(_._1 % 3 == 0).foreach { case (id, e, p, i, h) =>
      assert((e, p, i) === ((0L, 0L, 0L)))
      assert(h === md5hex(origMd5(id)))
    }
  }

  // ------------------------------------------------------------- q148
  test("q148: four-term delta decomposition equals the direct join") {
    import org.apache.spark.sql.functions._
    val direct = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001)
        .filter("o_orderpriority = '1-URGENT'").select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(count(lit(1)).as("n_lines"),
        round(RelationalOps.exactMoneySum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6)
          .as("revenue"))
      .as[(String, Long, Double)].collect().toSet
    val got = Round7Queries.q148JoinIvm(spark, sf0001)
      .as[(String, Long, Double)].collect().toSet
    assert(got === direct)
  }

  test("q148: every one of the four generation terms carries rows") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def old(id: String): Boolean = md5hex(id).charAt(0) < '8'
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber")
      .as[(Long, Int)].collect()
      .map { case (ok, ln) => (ok, old(s"$ok|$ln")) }
    val ords = Tables.orders(spark, sf0001)
      .filter("o_orderpriority = '1-URGENT'")
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect()
      .map { case (ok, ck) => (ok, old(s"$ok|$ck")) }.toMap
    val terms = li.flatMap { case (ok, liOld) =>
      ords.get(ok).map(ordOld => (liOld, ordOld))
    }.groupBy(identity).map { case (k, v) => k -> v.length }
    // all four (old/delta × old/delta) combinations non-empty — the
    // law is actually exercised, not degenerate
    assert(terms.keySet === Set((true, true), (true, false),
      (false, true), (false, false)), s"terms: $terms")
  }

  // ------------------------------------------------------------- q149
  test("q149: BFS depths match a local breadth-first search") {
    val edges = DedupQueries.synthEdges(spark, sf0001)
      .as[(Long, Long)].collect()
    val adj = (edges ++ edges.map { case (a, b) => (b, a) })
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSeq }
    val n = Tables.documents(spark, sf0001).count()
    val seeds = (0L until n).filter(_ % 101 == 0)
    var depth = seeds.map(_ -> 0L).toMap
    for (r <- 1 to GraphQueries.BfsRounds) {
      val frontier = depth.filter(_._2 == r - 1).keys
      val reached = frontier.flatMap(v => adj.getOrElse(v, Seq.empty))
        .filterNot(depth.contains)
      depth = depth ++ reached.map(_ -> r.toLong)
    }
    val got = GraphQueries.q149BfsDepth(spark, sf0001)
      .as[(Long, Long)].collect().toSet
    assert(got === depth.toSet)
    // depths actually spread (not everything is a seed or 1 hop away)
    assert(got.map(_._2).max === GraphQueries.BfsRounds.toLong)
  }

  // ------------------------------------------------------------- q150
  test("q150: PMI collocations match an independent local ranking") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map(_._2.split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val t = toks.map(_.size).sum.toLong
    val bigrams = toks.flatMap(ws => ws.zip(ws.tail))
    val b = bigrams.length.toLong
    val cb = bigrams.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val ranked = cb.toSeq
      .filter(_._2 >= Round7Queries.PmiMinSupport)
      .map { case ((w1, w2), c2) =>
        (w1, w2, c2,
          q0(1e9 * math.log((c2.toDouble / b) /
            ((uni(w1).toDouble / t) * (uni(w2).toDouble / t)))))
      }
      .sortBy { case (w1, w2, _, p) => (-p, w1, w2) }
      .take(Round7Queries.PmiTopK)
    val got = Round7Queries.q150PmiCollocations(spark, sf0001)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got === ranked)
    // PMI ordering differs from raw-count ordering somewhere in the
    // top-k (association, not frequency — on this fixture the single
    // top pair happens to coincide, the full ranking does not)
    val byCount = got.sortBy { case (w1, w2, c2, _) => (-c2, w1, w2) }
    assert(got !== byCount)
    assert(got.head._4 > 0L, "top collocation must be positively associated")
  }

  // ------------------------------------------------------------- q151
  test("q151: per-source KL matches a local distribution re-derivation") {
    val docs = Tables.documents(spark, sf0001)
      .select("source", "text").as[(String, String)].collect()
    val bySrc = docs.groupBy(_._1).map { case (s, xs) =>
      s -> xs.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (w, g) => w -> g.size.toLong }
    }
    val corpus = bySrc.values.flatten
      .groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sum }
    val t = corpus.values.sum
    val expected = bySrc.map { case (s, cnts) =>
      val ts = cnts.values.sum
      val kl = cnts.map { case (w, cs) =>
        q0(1e9 * (cs.toDouble / ts) *
          math.log((cs.toDouble / ts) / (corpus(w).toDouble / t)))
      }.sum
      (s, cnts.size.toLong, kl)
    }.toSet
    val got = Round7Queries.q151SourceKlDrift(spark, sf0001)
      .as[(String, Long, Long)].collect().toSet
    assert(got === expected)
    // KL >= 0 up to quantization noise (Gibbs), and strictly positive
    // somewhere (sources genuinely drift)
    assert(got.forall(_._3 > -1000L))
    assert(got.exists(_._3 > 0L))
  }

  // ------------------------------------------------------------- q152
  test("q152: snapshot diff counts match the synthesis arithmetic") {
    val ids = Tables.documents(spark, sf0001)
      .select("doc_id").as[Long].collect()
    val removed = ids.count(_ % 13 == 0).toLong
    val added = ids.count(_ % 17 == 0).toLong
    val changed = ids.count(i => i % 7 == 0 && i % 13 != 0).toLong
    val unchanged = ids.length - removed - changed
    val got = Round7Queries.q152SnapshotDiff(spark, sf0001)
      .as[(String, Long)].collect().toMap
    assert(got === Map("added" -> added, "removed" -> removed,
      "changed" -> changed, "unchanged" -> unchanged))
    assert(got.values.forall(_ > 0L), "all four statuses exercised")
  }

  // ------------------------------------------------------------- q142
  test("q142: FK audit matches set-membership recounts") {
    val got = Round7Queries.q142FkAudit(spark, sf0001)
      .as[(String, Long, Long)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    def keys(t: String, c: String): Set[Long] =
      Tables.table(spark, sf0001, t).select(c).as[Long].collect().toSet
    def fks(t: String, c: String): Seq[Long] =
      Tables.table(spark, sf0001, t).select(c).as[Long].collect().toSeq
    val cases = Map(
      "customer.c_nationkey" -> (("customer", "c_nationkey"), ("nation", "n_nationkey")),
      "lineitem.l_orderkey" -> (("lineitem", "l_orderkey"), ("orders", "o_orderkey")),
      "lineitem.l_partkey" -> (("lineitem", "l_partkey"), ("part", "p_partkey")),
      "lineitem.l_suppkey" -> (("lineitem", "l_suppkey"), ("supplier", "s_suppkey")),
      "nation.n_regionkey" -> (("nation", "n_regionkey"), ("region", "r_regionkey")),
      "orders.o_custkey" -> (("orders", "o_custkey"), ("customer", "c_custkey")),
      "supplier.s_nationkey" -> (("supplier", "s_nationkey"), ("nation", "n_nationkey")))
    assert(got.keySet === cases.keySet)
    cases.foreach { case (name, ((ft, fc), (dt, dc))) =>
      val f = fks(ft, fc); val d = keys(dt, dc)
      assert(got(name) === ((f.length.toLong, f.count(x => !d(x)).toLong)),
        s"mismatch for $name")
    }
  }
}
