package graft.operators

import graft.SparkTestBase

/** Independent local re-derivations for the round-14 retrieval/eval
  * batch (q226–q230): BM25 recomputed from raw text with a from-scratch
  * scorer, ROUGE-2 clipped counts from hand-built multisets, the MMR
  * greedy replayed over locally computed dots, AUC against the O(n²)
  * pair-count definition, calibration bins against a local fold.
  */
class Round14QueriesSpec extends SparkTestBase {

  private def tokens(text: String): Vector[String] =
    text.toLowerCase.replaceAll("(\\d|\\W)+", " ").trim
      .split(" ").toVector.filter(_.nonEmpty)

  private def docsLocal(dir: String): Vector[(Long, String, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang")
      .collect().toVector
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  /** From-scratch local BM25 (shared by the q226 and q240 replays). */
  private def localBm25(toks: Vector[(Long, Vector[String])],
      query: Seq[String], k: Int): Vector[(Long, Double, Long)] = {
    val n = toks.size.toLong
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n
    val df: Map[String, Long] = query.map { t =>
      t -> toks.count(_._2.contains(t)).toLong
    }.toMap
    val k1 = Round14Queries.Bm25K1
    val b = Round14Queries.Bm25B
    toks.flatMap { case (id, ts) =>
      val dl = ts.size.toLong
      val contribs = query.flatMap { t =>
        val tf = ts.count(_ == t).toLong
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          Some(idf * (tf * (k1 + 1.0)) /
            (tf + k1 * (1.0 - b + b * dl / avgdl)))
        }
      }
      if (contribs.isEmpty) None
      else Some((id, BigDecimal(contribs.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        contribs.size.toLong))
    }.sortBy { case (id, s, _) => (-s, id) }.take(k)
  }

  test("q226: BM25 top-10 matches a from-scratch local scorer") {
    val docs = docsLocal(sf0001)
    val toks = docs.map { case (id, text, _) => id -> tokens(text) }
    val expected = localBm25(toks, Round14Queries.Bm25Query,
      Round14Queries.Bm25TopK)
    val got = Round14Queries.q226Bm25(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toVector
    assert(got === expected)
  }

  test("q239: optimal thresholds equal an exhaustive local sweep") {
    val docs = docsLocal(sf0001)
    val scored = docs.flatMap { case (_, text, lang) =>
      val ts = tokens(text)
      if (ts.isEmpty) None
      else Some((1000000L * ts.distinct.size / ts.size, lang == "en"))
    }
    val p = scored.count(_._2).toLong
    val nTot = scored.size.toLong - p
    val thresholds = scored.map(_._1).distinct
    def counts(t: Long): (Long, Long) = (
      scored.count { case (s, l) => s >= t && l }.toLong,
      scored.count { case (s, l) => s >= t && !l }.toLong)
    // exhaustive argmax with the smaller-threshold tie-break, exact keys
    val bestJ = thresholds.map { t =>
      val (tp, fp) = counts(t); (t, tp, fp, tp * nTot - fp * p)
    }.minBy { case (t, _, _, key) => (-key, t) }
    val bestF = thresholds.map { t =>
      val (tp, fp) = counts(t)
      (t, tp, fp, BigDecimal(2 * tp) / BigDecimal(tp + fp + p))
    }.minBy { case (t, _, _, key) => (-key, t) }
    val got = Round14Queries.q239ThresholdSelect(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got("youden_j")._1 === bestJ._1)
    assert((got("youden_j")._2, got("youden_j")._3) === ((bestJ._2, bestJ._3)))
    assert(got("f1_max")._1 === bestF._1)
    // metric bounds: J ∈ [−1, 1], F1 ∈ [0, 1]
    assert(got("youden_j")._4 >= -1 && got("youden_j")._4 <= 1)
    assert(got("f1_max")._4 >= 0 && got("f1_max")._4 <= 1)
  }

  test("q240: RM3 expansion replays locally end-to-end; expansion changes the ranking input") {
    val docs = docsLocal(sf0001)
    val toks = docs.map { case (id, text, _) => id -> tokens(text) }
    val fb = localBm25(toks, Round14Queries.Bm25Query,
      Round14Queries.Bm25TopK).map(_._1).toSet
    val stop = (graft.text.TextPrep.DefaultStopwords ++
      Round14Queries.Bm25Query).toSet
    val expTerms = toks.filter(t => fb.contains(t._1))
      .flatMap(_._2).filterNot(stop.contains)
      .groupBy(identity).toVector
      .map { case (t, xs) => (t, xs.size.toLong) }
      .sortBy { case (t, c) => (-c, t) }
      .take(Round14Queries.Rm3Expansions).map(_._1)
    assert(expTerms.size === Round14Queries.Rm3Expansions)
    val expected = localBm25(toks,
      Round14Queries.Bm25Query ++ expTerms, Round14Queries.Bm25TopK)
    val got = Round14Queries.q240Rm3Expansion(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toVector
    assert(got === expected)
    // the expansion is real: some result hits more terms than |Q| could give
    assert(got.exists(_._3 > Round14Queries.Bm25Query.size),
      "no doc matched any expansion term — expansion had no effect")
  }

  test("q241: nDCG/MRR equal a local replay over the BM25 ranking") {
    val docs = docsLocal(sf0001)
    val toks = docs.map { case (id, text, _) => id -> tokens(text) }
    val rel: Map[Long, Long] = toks.map { case (id, ts) =>
      id -> math.min(7L, ts.count(Round14Queries.Bm25Query.contains).toLong)
    }.toMap
    val ranking = localBm25(toks, Round14Queries.Bm25Query,
      Round14Queries.Bm25TopK).map(_._1)
    def gainNano(r: Long, pos: Long): Long =
      BigDecimal(1e9 * (math.pow(2.0, r.toDouble) - 1.0) /
        (math.log(pos + 1.0) / math.log(2.0)))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val dcg = ranking.zipWithIndex
      .map { case (id, i) => gainNano(rel(id), i + 1L) }.sum
    val ideal = rel.toVector.sortBy { case (id, r) => (-r, id) }
      .take(Round14Queries.Bm25TopK)
    val idcg = ideal.zipWithIndex
      .map { case ((_, r), i) => gainNano(r, i + 1L) }.sum
    val firstRel = ranking.zipWithIndex
      .collectFirst { case (id, i) if rel(id) >= 2 => i + 1L }
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Round14Queries.q241RankingEval(spark, sf0001).collect()(0)
    assert(r.getLong(0) === dcg)
    assert(r.getLong(1) === idcg)
    assert(r.getDouble(2) === r6(dcg.toDouble / idcg))
    assert(r.getDouble(3) === firstRel.map(p => r6(1.0 / p)).getOrElse(0.0))
    assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1.0)
  }

  test("q227: clipped bigram overlap matches hand-built multisets") {
    val docs = docsLocal(sf0001)
    val bg: Map[Long, Map[String, Long]] = docs.map { case (id, text, _) =>
      val ts = tokens(text)
      id -> ts.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toVector
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    }.toMap
    val got = Round14Queries.q227Rouge2(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(b === a + 1)
      val (ma, mb) = (bg(a), bg(b))
      val overlap = ma.keysIterator.map { k =>
        math.min(ma(k), mb.getOrElse(k, 0L))
      }.sum
      assert(r.getLong(2) === overlap, s"pair $a/$b")
      assert(r.getLong(3) === ma.values.sum)
      assert(r.getLong(4) === mb.values.sum)
    }
    // every adjacent pair where both docs have bigrams is present
    val expectedPairs = docs.map(_._1).sorted.sliding(2).collect {
      case Seq(a, b) if b == a + 1 && bg(a).nonEmpty && bg(b).nonEmpty => a
    }.toSet
    assert(got.map(_.getLong(0)).toSet === expectedPairs)
  }

  test("q228: greedy MMR replayed locally over sequential-order dots") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val qv = emb(0L)
    val pool = emb.toVector.collect { case (id, v) if id != 0L =>
      (id, r6(dot(v, qv)))
    }.sortBy { case (id, rel) => (-rel, id) }.take(Round14Queries.MmrPool)
    val lam = Round14Queries.MmrLambda
    var chosen = Vector.empty[(Long, Double)]
    for (_ <- 1 to Round14Queries.MmrK) {
      val cand = pool.filterNot(p => chosen.exists(_._1 == p._1))
      val scored = cand.map { case (id, rel) =>
        if (chosen.isEmpty) (id, rel)
        else {
          val maxSim = chosen.map { case (sid, _) =>
            r6(dot(emb(id), emb(sid)))
          }.max
          (id, r6(lam * rel - (1.0 - lam) * maxSim))
        }
      }
      chosen :+= scored.minBy { case (id, s) => (-s, id) }
    }
    val got = Round14Queries.q228Mmr(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toVector
    assert(got === chosen)
    // diversity sanity: the greedy picks are not simply the top-k by rel
    val topByRel = pool.take(Round14Queries.MmrK).map(_._1).toSet
    val info = s"greedy=${got.map(_._1)} topRel=$topByRel"
    assert(got.size === Round14Queries.MmrK, info)
  }

  test("q229: rank-sum AUC equals the O(n²) pair-count definition") {
    val docs = docsLocal(sf0001)
    val scored = docs.flatMap { case (_, text, lang) =>
      val ts = tokens(text)
      if (ts.isEmpty) None
      else Some((1000000L * ts.distinct.size / ts.size, lang == "en"))
    }
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    val num2 = (for (p <- pos; q <- neg) yield {
      if (p > q) 2L else if (p == q) 1L else 0L
    }).sum
    val r = Round14Queries.q229RocAuc(spark, sf0001).collect()(0)
    assert(r.getLong(0) === pos.size.toLong)
    assert(r.getLong(1) === neg.size.toLong)
    assert(r.getLong(2) === num2)
    val auc = num2.toDouble / (2.0 * pos.size * neg.size)
    assert(math.abs(r.getDouble(3) - auc) < 1e-6)
  }

  test("q231: dHash matches the analytic block design; banding has full recall") {
    import graft.tools.MediaFixtures
    val dir = new java.io.File(Round14Queries.PhashFixtureDir)
    // decode→hash of every committed fixture equals the hash DERIVED
    // from the block functions alone — the implementation is checked
    // against ground truth it never touched
    val hashes: Map[String, Long] = MediaFixtures.grids.map { case (name, g) =>
      val bytes = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, name).toPath)
      val h = graft.multimodal.Multimodal.dHash64(bytes)
      assert(h === MediaFixtures.analyticHash(g), name)
      name -> h
    }
    val names = MediaFixtures.grids.keys.toVector.sorted
    val expected = for {
      i <- names.indices
      j <- (i + 1) until names.size
      d = java.lang.Long.bitCount(hashes(names(i)) ^ hashes(names(j)))
      if d <= Round14Queries.PhashTau
    } yield (names(i), names(j), d.toLong)
    val got = Round14Queries.q231ImageDhashDedup(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toVector
    assert(got === expected.toVector)
    assert(got.map(_._3).toSet === Set(0L, 3L), "both groups represented")
    // the pigeonhole the banded join relies on: every qualifying pair
    // shares at least one exact 8-bit band
    expected.foreach { case (a, b, _) =>
      assert((0 until 8).exists(i =>
        ((hashes(a) >> (i * 8)) & 255L) === ((hashes(b) >> (i * 8)) & 255L)),
        s"$a/$b must share a band")
    }
    // brightness-invariance law directly on rendered images (no fixture)
    val shifted = MediaFixtures.render((x, y) =>
      MediaFixtures.grids("grad_a0.png")(x, y) + 7)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(shifted, "png", bos)
    assert(graft.multimodal.Multimodal.dHash64(bos.toByteArray)
      === hashes("grad_a0.png"))
  }

  test("q234: the pure-SQL dhash64 surface equals the Scala pipeline; kernel boundary errors") {
    val sqlPath = Round14Queries.q234SqlDhash(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toVector
    val scalaPath = Round14Queries.q231ImageDhashDedup(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toVector
    assert(sqlPath === scalaPath)
    // NULL bytes → NULL hash (nullSafeEval), not a decoder crash
    val nulls = spark.sql("SELECT dhash64(CAST(NULL AS BINARY)) AS h").collect()
    assert(nulls(0).isNullAt(0))
    // wrong input type fails at analysis with the boundary message
    val err = intercept[Exception] {
      spark.sql("SELECT dhash64('not bytes')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("binary"), err.getMessage)
  }

  test("q235: jackknife SE equals a local leave-one-out replay with exact carriers") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), tokens(r.getString(1)).size.toLong))
    val per = docs.groupBy(_._1).map { case (s, xs) =>
      s -> (xs.size.toLong, xs.map(_._2).sum)
    }
    val bigN = per.values.map(_._1).sum
    val bigS = per.values.map(_._2).sum
    val ds: Vector[BigInt] = per.values.toVector
      .filter { case (n, _) => bigN > n }
      .map { case (n, sTok) =>
        BigDecimal(1e9 * (bigS - sTok).toDouble / (bigN - n))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
      }
    val g = ds.size
    val numer = BigInt(g) * ds.map(d => d * d).sum - {
      val sd = ds.sum; sd * sd
    }
    val se = math.sqrt((g - 1).toDouble * numer.toDouble) / g / 1e9
    val r = Round14Queries.q235Jackknife(spark, sf0001).collect()(0)
    assert(r.getLong(0) === g.toLong)
    assert(math.abs(r.getDouble(1) - bigS.toDouble / bigN) < 1e-6)
    assert(math.abs(r.getDouble(2) - se) < 1e-6)
    // sanity: SE positive and far below the mean on this balanced corpus
    assert(r.getDouble(2) > 0 && r.getDouble(2) < r.getDouble(1))
  }

  test("q236: margin mining equals a local replay; margin re-ranks away from raw cosine") {
    val langs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def micro(x: Double): Long =
      BigDecimal(1e6 * x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val xs = vecs.keys.filter(id => langs.get(id).contains("de")).toVector.sorted
    val ys = vecs.keys.filter(id => langs.get(id).contains("en")).toVector.sorted
    val cos: Map[(Long, Long), Long] = (for (x <- xs; y <- ys)
      yield (x, y) -> micro(dot(vecs(x), vecs(y)))).toMap
    val k = Round14Queries.BitextK
    val nx = xs.map(x => x -> ys.map(y => (cos((x, y)), y)).sortBy {
      case (c, y) => (-c, y) }.take(k).map(_._1).sum).toMap
    val ny = ys.map(y => y -> xs.map(x => (cos((x, y)), x)).sortBy {
      case (c, x) => (-c, x) }.take(k).map(_._1).sum).toMap
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = xs.flatMap { x =>
      val cands = ys.filter(y => nx(x) + ny(y) > 0).map { y =>
        (y, r6(2.0 * k * cos((x, y)) / (nx(x) + ny(y))))
      }
      if (cands.isEmpty) None
      else {
        val (y, m) = cands.minBy { case (y, m) => (-m, y) }
        Some((x, y, cos((x, y)), m))
      }
    }
    val got = Round14Queries.q236BitextMargin(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toVector
    assert(got === expected)
    // the margin must actually re-rank: at least one source doc's best
    // candidate differs from its raw-cosine argmax (hub penalization)
    val byCos = xs.map { x =>
      x -> ys.map(y => (cos((x, y)), y)).minBy { case (c, y) => (-c, y) }._2
    }.toMap
    val reranked = got.count { case (x, y, _, _) => byCos(x) != y }
    assert(reranked > 0, "margin never disagreed with raw cosine — no hubness signal")
  }

  test("q237: kappa/macro-F1 equal a local confusion replay; bounds hold") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val pred = graft.textstats.TextStats.langId(docs, "doc_id", "text")
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val conf = truth.keys.groupBy(id => (truth(id), pred(id)))
      .map { case (k, v) => k -> v.size.toLong }
    val labels = (conf.keys.map(_._1) ++ conf.keys.map(_._2)).toVector.distinct
    val row = labels.map(c => c -> conf.collect {
      case ((t, _), n) if t == c => n }.sum).toMap
    val colN = labels.map(c => c -> conf.collect {
      case ((_, p), n) if p == c => n }.sum).toMap
    val diag = labels.map(c => c -> conf.getOrElse((c, c), 0L)).toMap
    val n = row.values.sum
    val peNum = labels.map(c => row(c) * colN(c)).sum
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val kappa = r6((n * diag.values.sum - peNum).toDouble / (n * n - peNum))
    val f1Sum = labels.map { c =>
      BigDecimal(1e6 * 2 * diag(c) / (row(c) + colN(c)).toDouble)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum
    val r = graft.operators.TextStatsQueries
      .q237AgreementMetrics(spark, sf0001).collect()(0)
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === labels.size.toLong)
    assert(r.getDouble(2) === r6(diag.values.sum.toDouble / n))
    assert(r.getDouble(3) === kappa)
    assert(r.getDouble(4) === r6(f1Sum.toDouble / labels.size / 1e6))
    // bounds: po ∈ [0,1], κ ∈ [−1,1], macro-F1 ∈ [0,1], and κ ≤ po
    assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
    assert(r.getDouble(3) >= -1 && r.getDouble(3) <= 1)
    assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
    assert(r.getDouble(3) <= r.getDouble(2) + 1e-9)
  }

  test("q238: blocked mining agrees with exact q236 on most sources; blocking is strict") {
    val exact = Round14Queries.q236BitextMargin(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val blocked = Round14Queries.q238BitextBlocked(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every source doc still gets a best pair through the blocking
    assert(blocked.keySet === exact.keySet)
    // measured top-1 agreement on this weak-NN-structure corpus (the
    // q20 calibration context): 0.61 at sf0.01; floor pinned at 0.5 —
    // fully deterministic (centroids are exact label means, no fit)
    val agree = exact.count { case (x, y) => blocked.get(x).contains(y) }
    assert(agree.toDouble / exact.size >= 0.5,
      s"agreement ${agree.toDouble / exact.size} below floor")
    // and the blocking is strict: candidate pairs < |X|·|Y|
    val langs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nx = langs.values.count(_ == "de").toLong
    val ny = langs.values.count(_ == "en").toLong
    val candCount = {
      import org.apache.spark.sql.functions._
      // recompute the candidate-id relation exactly as the query does
      val e = graft.Tables.embeddings(spark, sf0001)
        .join(spark.read.parquet(s"$sf0001/documents.parquet")
          .select(col("doc_id"), col("lang")), col("vec_id") === col("doc_id"))
        .select(col("vec_id"), col("embedding"), col("lang"))
        .filter(col("lang").isin("de", "en"))
      val cents = {
        val m = graft.operators.AnnQueries.q47EmbeddingCentroids(spark, sf0001)
        m.groupBy(col("label").as("c_label"))
          .agg(transform(array_sort(collect_list(struct(col("j"), col("m")))),
            x => x.getField("m")).as("centroid"))
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("c_label").asc)
      val probes = e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("lang"), col("c_label"),
          round(graft.functions.VectorFunctions.dotD(
            col("embedding").cast("array<double>"), col("centroid")), 6).as("ccos"))
        .withColumn("rk", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rk") <= 2)
      probes.filter(col("lang") === "de").select(col("vec_id").as("x"), col("c_label"))
        .join(probes.filter(col("lang") === "en")
          .select(col("vec_id").as("y"), col("c_label")), Seq("c_label"))
        .select("x", "y").distinct().count()
    }
    assert(candCount < nx * ny,
      s"blocking produced $candCount of ${nx * ny} possible pairs")
  }

  test("q242: audit counts equal a brute-force local recount; lsh ⊆ exact") {
    val docs = docsLocal(sf0001)
    val sets: Vector[(Long, Set[String])] = docs.map { case (id, text, _) =>
      id -> tokens(text).toSet
    }.sortBy(_._1)
    var nExact = 0L
    for (i <- sets.indices; j <- (i + 1) until sets.size) {
      val (a, b) = (sets(i)._2, sets(j)._2)
      val inter = a.intersect(b).size.toLong
      if (inter * 17 >= (a.size + b.size) * 7) nExact += 1
    }
    val r = DedupQueries.q242LshRecallAudit(spark, sf0001).collect()(0)
    assert(r.getLong(0) === nExact, "exact side must equal brute force")
    // verify-containment: every LSH-verified pair is an exact pair
    assert(r.getLong(1) === r.getLong(2), "lsh ⊆ exact (q16 verifies exactly)")
    assert(r.getLong(3) === r.getLong(0) - r.getLong(2))
    assert(r.getLong(5) >= r.getLong(1), "verified pairs come from candidates")
    assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1)
    assert(r.getDouble(6) > 0 && r.getDouble(6) <= 1)
  }

  test("q243: OR-amplification monotonicity holds across the banding sweep; (3,4) row equals q242") {
    val rows = DedupQueries.q243BandingSweep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.map(r => (r._1, r._2)).toSeq ===
      DedupQueries.SweepConfigs.map { case (b, r) => (b.toLong, r.toLong) }
        .sortBy(_._1))
    // more, narrower bands ⇒ monotone candidates up, found up, precision down
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(hi._3 >= lo._3, "candidates must grow with bands")
        assert(hi._4 >= lo._4, "found pairs must grow with bands")
        assert(hi._6 <= lo._6 + 1e-9, "precision must not grow with bands")
      case _ =>
    }
    rows.foreach { r =>
      assert(r._5 > 0 && r._5 <= 1.0)
      assert(r._4 <= r._3, "found ⊆ candidates")
    }
    // the sweep's (3,4) row IS q242's configuration — cross-check counts
    val audit = DedupQueries.q242LshRecallAudit(spark, sf0001).collect()(0)
    val c34 = rows.find(r => r._1 == 3L && r._2 == 4L).get
    assert(c34._3 === audit.getLong(5), "candidate count matches the audit")
    assert(c34._4 === audit.getLong(1), "found count matches the audit")
  }

  test("chooseBanding pure rule: cheapest eligible config, recall-ceiling fallback, order-free") {
    import graft.dedup.Dedup.chooseBanding
    // (bands, rows, nCandidates, nFound); nExact = 100, target 9/10
    val sweep = Seq((3, 4, 50L, 80L), (4, 3, 90L, 92L), (6, 2, 200L, 99L))
    // first-satisfying: (4,3) and (6,2) meet 90; (4,3) has fewer candidates
    assert(chooseBanding(sweep, 100L, 9, 10) === (4, 3))
    // exact-rational boundary: nFound·den == num·nExact is ELIGIBLE
    assert(chooseBanding(Seq((3, 4, 50L, 90L)), 100L, 9, 10) === (3, 4))
    // fallback: none meets 9/10 → highest recall wins regardless of cost
    assert(chooseBanding(
      Seq((3, 4, 50L, 10L), (4, 3, 90L, 30L), (6, 2, 200L, 40L)),
      100L, 9, 10) === (6, 2))
    // fallback tie on nFound → fewer candidates, then fewer bands
    assert(chooseBanding(
      Seq((6, 2, 200L, 40L), (4, 3, 90L, 40L)), 100L, 9, 10) === (4, 3))
    assert(chooseBanding(
      Seq((6, 2, 90L, 40L), (4, 3, 90L, 40L)), 100L, 9, 10) === (4, 3))
    // eligible tie on candidates → fewer bands
    assert(chooseBanding(
      Seq((6, 2, 90L, 95L), (4, 3, 90L, 95L)), 100L, 9, 10) === (4, 3))
    // nExact = 0 degenerate: everything eligible → cheapest
    assert(chooseBanding(sweep, 0L, 9, 10) === (3, 4))
    // input order must not matter
    assert(chooseBanding(sweep.reverse, 100L, 9, 10) === (4, 3))
    intercept[IllegalArgumentException] { chooseBanding(Nil, 100L, 9, 10) }
    intercept[IllegalArgumentException] { chooseBanding(sweep, 100L, 9, 0) }
  }

  test("q268: choice matches the rule on the measured sweep; serve equals the q16 chain at the chosen config") {
    import graft.dedup.Dedup
    // brute-force exact pair count at τ = 7/10 (the q242 replay)
    val docs = docsLocal(sf0001)
    val sets: Vector[(Long, Set[String])] = docs.map { case (id, text, _) =>
      id -> tokens(text).toSet
    }.sortBy(_._1)
    var nExact = 0L
    for (i <- sets.indices; j <- (i + 1) until sets.size) {
      val (a, b) = (sets(i)._2, sets(j)._2)
      val inter = a.intersect(b).size.toLong
      if (inter * 17 >= (a.size + b.size) * 7) nExact += 1
    }
    val sweep = DedupQueries.q243BandingSweep(spark, sf0001).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2),
        r.getLong(3))).toSeq
    val (eb, er) = Dedup.chooseBanding(sweep, nExact,
      DedupQueries.BandingTargetNum, DedupQueries.BandingTargetDen)
    val got = DedupQueries.q268BandingAuto(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(0) === eb.toLong && r.getLong(1) === er.toLong,
        "every served row must carry the chosen configuration")
    }
    // serve side ≡ the q16 chain re-banded at (eb, er) over the same corpus
    val toks = Dedup.tokenSets(
      graft.Tables.documents(spark, sf0001), "doc_id", "text")
    val expected = Dedup.jaccardOnCandidates(toks,
        Dedup.lshCandidates(Dedup.minhashSig(toks, DedupQueries.K), eb, er))
      .withColumn("jaccard", org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.col("jaccard"), 6))
      .filter(org.apache.spark.sql.functions.col("jaccard") >=
        DedupQueries.LshJaccardThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
    assert(got.map(r => (r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
      === expected.toSeq)
  }

  test("q274 persisted banding: cold measures once, warm zero-measure, stale stamp re-measures, serve == q268 + stamp") {
    import org.apache.spark.sql.functions.col
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete(); ()
    }
    val dir = sf0001
    rmrf(new java.io.File(DedupQueries.bandingChoicePath(dir)))
    var measured = 0
    def measure(): (Long, Seq[(Int, Int, Long, Long)]) = {
      measured += 1
      val sweep = DedupQueries.q243BandingSweep(spark, dir).collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2),
          r.getLong(3))).toSeq
      // exact count recomputed the q268-spec way (brute force)
      val sets = docsLocal(dir).map { case (id, text, _) =>
        id -> tokens(text).toSet }.sortBy(_._1)
      var nExact = 0L
      for (i <- sets.indices; j <- (i + 1) until sets.size) {
        val (a, b) = (sets(i)._2, sets(j)._2)
        val inter = a.intersect(b).size.toLong
        if (inter * 17 >= (a.size + b.size) * 7) nExact += 1
      }
      (nExact, sweep)
    }
    val c1 = DedupQueries.ensureBandingChoice(spark, dir, () => measure())
    assert(measured === 1, "cold start measures exactly once")
    assert((c1.bands, c1.rowsPerBand) === graft.dedup.Dedup.chooseBanding(
      c1.sweep, c1.nExact, DedupQueries.BandingTargetNum,
      DedupQueries.BandingTargetDen))
    // WARM: zero-measure law
    val c2 = DedupQueries.ensureBandingChoice(spark, dir,
      () => sys.error("banding measurement forced on a warm choice"))
    assert((c2.bands, c2.rowsPerBand) === ((c1.bands, c1.rowsPerBand)))
    assert(measured === 1)
    // stale stamp re-measures
    DedupQueries.bandingChoiceWrite(spark,
      DedupQueries.bandingChoicePath(dir),
      c1.copy(docRows = c1.docRows + 1L))
    DedupQueries.ensureBandingChoice(spark, dir, () => measure())
    assert(measured === 2, "stale stamp must re-measure")
    // the gated serve: exactly q268's rows, plus the stamp columns
    val auto = DedupQueries.q268BandingAuto(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val pers = DedupQueries.q274BandingPersist(spark, dir)
    assert(pers.columns.toSeq === Seq("bands", "rows_per_band", "a", "b",
      "jaccard", "doc_rows", "doc_content"))
    val served = pers.collect()
    assert(served.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSeq === auto)
    val (dr, dc) = ChoiceStore.documentsStamp(
      graft.Tables.documents(spark, dir).select(col("doc_id"), col("text")))
    assert(served.map(r => (r.getLong(5), r.getLong(6))).distinct.toSeq
      === Seq((dr, dc)))
  }

  test("q230: fixed-width bins fold to the corpus exactly") {
    val docs = docsLocal(sf0001)
    val scored = docs.flatMap { case (_, text, lang) =>
      val ts = tokens(text)
      if (ts.isEmpty) None
      else Some((1000000L * ts.distinct.size / ts.size / 100000L, lang == "en"))
    }
    val expected = scored.groupBy(_._1).map { case (bin, xs) =>
      bin -> (xs.size.toLong, xs.count(_._2).toLong)
    }
    val got = Round14Queries.q230CalibrationBins(spark, sf0001).collect()
    assert(got.map(_.getLong(1)).sum === scored.size.toLong)
    got.foreach { r =>
      val (n, np) = expected(r.getLong(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === np)
      assert(math.abs(r.getDouble(3) - np.toDouble / n) < 1e-6)
    }
    assert(got.map(_.getLong(0)).toSet === expected.keySet)
  }
}
