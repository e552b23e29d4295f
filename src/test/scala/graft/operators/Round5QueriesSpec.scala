package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Specs for the round-5 additions: fixed-point PageRank (q101),
  * semantic dedup (q102), temperature mixture (q103), per-stratum
  * top-k sampling (q104), minhash calibration (q105). Each gets an
  * independent driver-side re-derivation over sf0.001 plus the
  * invariants that matter for its contract.
  */
class Round5QueriesSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- q101
  test("q101: PageRank matches a driver-side integer re-derivation") {
    val edges = DedupQueries.synthEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    val vertices = Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val scale = GraphQueries.PrScale
    val base = scale * 15L / 100L
    val outdeg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var pr = vertices.map(_ -> scale).toMap
    for (_ <- 1 to GraphQueries.PrIters) {
      val sums = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.iterator.map { case (s, _) => pr(s) / outdeg(s) }.foldLeft(0L)(_ + _)
      }
      pr = vertices.map(v => v -> (base + 85L * sums.getOrElse(v, 0L) / 100L)).toMap
    }
    val got = GraphQueries.q101PageRank(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === pr)
    // every vertex keeps at least the teleport base
    assert(got.values.forall(_ >= base))
  }

  test("q101: ranks are partitioning-invariant (exact integer sums)") {
    val docs = Tables.documents(spark, sf).select(col("doc_id").as("id"))
    val e = DedupQueries.synthEdges(spark, sf)
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
    val a = graft.graph.GraphOps.pageRankScaled(docs, sym, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = graft.graph.GraphOps.pageRankScaled(
        docs.repartition(7), sym.repartition(13), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("q101: scale overflow guard trips on absurd scale") {
    val docs = Tables.documents(spark, sf).select(col("doc_id").as("id"))
    val e = DedupQueries.synthEdges(spark, sf)
      .select(col("a").as("src"), col("b").as("dst"))
    val ex = intercept[IllegalArgumentException] {
      graft.graph.GraphOps.pageRankScaled(docs, e, 1, scale = Long.MaxValue / 50)
    }
    assert(ex.getMessage.contains("overflow"))
  }

  // ------------------------------------------------------------- q109
  test("q109: personalized PageRank matches the seeded integer recurrence") {
    val edges = DedupQueries.synthEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    val vertices = Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val scale = GraphQueries.PrScale
    val base = scale * 15L / 100L
    def seeded(v: Long) = v % GraphQueries.SeedMod == 0
    val outdeg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var pr = vertices.map(v => v -> (if (seeded(v)) scale else 0L)).toMap
    for (_ <- 1 to GraphQueries.PrIters) {
      val sums = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.iterator.map { case (s, _) => pr(s) / outdeg(s) }.foldLeft(0L)(_ + _)
      }
      pr = vertices.map(v => v ->
        ((if (seeded(v)) base else 0L) + 85L * sums.getOrElse(v, 0L) / 100L)).toMap
    }
    val got = GraphQueries.q109PersonalizedPageRank(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === pr)
    // seeds hold at least the teleport base; some non-seeds gained
    // mass (proximity). NB an individual non-seed HUB may outrank an
    // individual seed (it collects mass from several seeds) — the
    // proximity claim is about the population, so compare means
    assert(vertices.filter(seeded).forall(v => got(v) >= base))
    assert(vertices.filterNot(seeded).exists(v => got(v) > 0L))
    val (seeds, rest) = vertices.partition(seeded)
    def mean(vs: Array[Long]) = vs.map(got).sum.toDouble / vs.length
    assert(mean(seeds) > mean(rest))
  }

  // ------------------------------------------------------------- q110
  test("q110: label propagation matches a driver-side majority vote") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val edges = DedupQueries.synthEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    def isSeed(v: Long) = v % GraphQueries.LabelMod == 0
    val expected = docs.keys.map { v =>
      if (isSeed(v)) v -> ("seed", Some(docs(v)))
      else {
        val votes = sym.filter(e => e._2 == v && isSeed(e._1))
          .groupBy(e => docs(e._1)).map { case (l, es) => l -> es.size }
        if (votes.isEmpty) v -> ("unlabeled", None)
        else {
          val mx = votes.values.max
          v -> ("propagated",
            Some(votes.filter(_._2 == mx).keys.min))
        }
      }
    }.toMap
    val got = GraphQueries.q110LabelPropagation(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(2), if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    assert(got === expected)
    // the fixture exercises all three origins
    assert(Set("seed", "propagated", "unlabeled")
      .subsetOf(got.values.map(_._1).toSet))
  }

  // ------------------------------------------------------------- q102
  test("q102: verdicts match a brute-force driver re-derivation") {
    val got = AnnQueries.q102SemanticDedup(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap

    val embs = Tables.embeddings(spark, sf)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2)))
    // centroids: per-label mean, 6dp-rounded (the q47 contract)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cents = embs.groupBy(_._3).map { case (l, vs) =>
      l -> Array.tabulate(vs.head._2.length)(j => r6(vs.map(_._2(j)).sum / vs.size))
    }
    def dot(a: Array[Double], b: Array[Double]) =
      r6(a.zip(b).map { case (x, y) => x * y }.sum)
    // nearest centroid: dot desc, label asc
    val cluster = embs.map { case (id, v, _) =>
      id -> cents.toSeq.map { case (l, c) => (dot(v, c), l) }
        .minBy { case (d, l) => (-d, l) }._2
    }.toMap
    val byId = embs.map(e => e._1 -> e._2).toMap
    val ids = embs.map(_._1).sorted
    val expected = ids.map { id =>
      val earlier = ids.filter(o => o < id && cluster(o) == cluster(id) &&
        dot(byId(o), byId(id)) >= AnnQueries.SemDedupCos)
      id -> (cluster(id),
        if (earlier.nonEmpty) "semantic_dup" else "kept",
        earlier.sorted.headOption)
    }.toMap
    assert(got === expected)
    // sanity: the fixture has both verdicts
    assert(got.values.exists(_._2 == "semantic_dup"))
    assert(got.values.exists(_._2 == "kept"))
  }

  // ------------------------------------------------------------- q103
  test("q103: weights normalize, flatten the mix, and preserve order") {
    val rows = TextStatsQueries.q103TemperatureMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // weights sum to 1 (up to per-source 6dp rounding)
    val wsum = rows.map(_._4).sum
    assert(math.abs(wsum - 1.0) < 1e-4 * rows.length)
    // monotone: more tokens never means a smaller weight
    val sorted = rows.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array(lo, hi) => assert(lo._4 <= hi._4 + 1e-9)
      case _ =>
    }
    // temperature flattening: weight spread is strictly inside the
    // token-share spread (sqrt compresses ratios)
    val shares = rows.map(_._3).filter(_ > 0)
    val weights = rows.map(_._4).filter(_ > 0)
    assert(weights.max / weights.min < shares.max / shares.min)
  }

  // ------------------------------------------------------------- q104
  test("q104: exactly k per stratum, window-equivalent, repartition-stable") {
    val df = TextStatsQueries.q104TopKSample(spark, sf)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perLang = got.groupBy(_._1)
    val strataSizes = Tables.documents(spark, sf)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, rows) =>
      assert(rows.length ==
        math.min(TextStatsQueries.SampleTopK.toLong, strataSizes(lang)))
      assert(rows.map(_._3).sorted === (1L to rows.length).toArray)
    }
    // window re-derivation over the SHARED hash definition — this test
    // pins the ranking mechanism (bounded heap ≡ window), the hash
    // contract itself lives in Sampling.sampleRankHash
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    val viaWindow = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"))
      .withColumn("h", Sampling.sampleRankHash(col("doc_id")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= TextStatsQueries.SampleTopK)
      .select(col("lang"), col("doc_id"), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.toSet === viaWindow)
  }

  // ------------------------------------------------------------- q106
  test("q106: z-scores match a driver-side exact-moment re-derivation") {
    val embs = Tables.embeddings(spark, sf)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val dim = embs.head._2.length
    // HALF_UP (away from zero), matching Spark's round + DuckDB — NOT
    // math.round, whose floor(x+0.5) flips negative .5 ties (JDK-8010430)
    def quant(v: Float): Long = BigDecimal(v.toDouble * 1000000L)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val byDim = Array.tabulate(dim)(j => embs.map(e => quant(e._2(j))))
    val means = byDim.map(qs => qs.sum.toDouble / qs.length)
    val stds = byDim.map { qs =>
      val n = qs.length
      val sq = qs.sum.toDouble
      val sqq = qs.map(q => q * q).sum.toDouble
      math.sqrt((sqq - sq * sq / n) / n)
    }
    val expected = embs.map { case (id, v) =>
      val az = Array.tabulate(dim) { j =>
        if (stds(j) == 0) 0.0 else math.abs((quant(v(j)) - means(j)) / stds(j))
      }
      id -> (az.count(_ > AnnQueries.OutlierZ).toLong,
        BigDecimal(az.max).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = AnnQueries.q106EmbeddingOutliers(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === expected)
    // a synthetic gaussian corpus has SOME 3-sigma dims, but not many
    val flagged = got.values.count(_._1 > 0)
    assert(flagged > 0 && flagged < got.size / 2)
  }

  // ------------------------------------------------------------- q107
  test("q107: confusion matrix conserves mass and rows sum to 1") {
    val rows = AnnQueries.q107ConfusionMatrix(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val corpus = Tables.embeddings(spark, sf).count()
    assert(rows.map(_._3).sum === corpus)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-4 * g.length)
    }
    // agrees with a direct rollup of the q49 per-vector output
    val q49 = AnnQueries.q49NearestCentroid(spark, sf).collect()
      .map(r => (r.getInt(1), r.getInt(2)))
    val counts = q49.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap === counts)
    // the diagonal beats the random baseline clearly (the synthetic
    // clusters overlap, so demand 2× random — measured ~36% vs 10%)
    val labels = rows.map(_._1).distinct.length
    val diag = rows.filter(r => r._1 == r._2).map(_._3).sum
    assert(diag.toDouble / corpus > 2.0 / labels)
  }

  // ------------------------------------------------------------- q108
  test("q108: overlap matrix conserves the q16 pair count, src1 <= src2") {
    val m = DedupQueries.q108SourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val pairCount = DedupQueries.q16LshNearDups(spark, sf).count()
    assert(m.map(_._3).sum === pairCount)
    m.foreach { case (s1, s2, n) =>
      assert(s1 <= s2)
      assert(n > 0)
    }
    // unordered keys are unique (no (B,A) twin of (A,B))
    assert(m.map(r => (r._1, r._2)).distinct.length === m.length)
  }

  // ------------------------------------------------------------- q113
  test("q113: weighted sample matches a driver-side A-ES re-derivation") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .filter(col("n_chars") > 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def key(id: Long, w: Long): Long = {
      val v = java.lang.Long.parseLong(md5hex(s"w42|$id").substring(0, 12), 16)
      val u = (v.toDouble + 0.5) / 281474976710656.0
      BigDecimal(1e9 * math.log(u) / w)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (lang, g) =>
      g.map(d => (d._2, d._3, key(d._2, d._3)))
        .sortBy(d => (-d._3, d._1))
        .take(TextStatsQueries.WeightedTopK)
        .zipWithIndex
        .map { case ((id, nc, _), i) => (lang, id, nc, i + 1L) }
    }.toSet
    val got = TextStatsQueries.q113WeightedSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    // importance weighting shows: sampled docs are longer than average
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    val sampleMean = got.map(_._3).sum.toDouble / got.size
    assert(sampleMean > corpusMean)
  }

  // ------------------------------------------------------------- q114
  test("q114: BPE merge step — greedy leftmost non-overlapping semantics") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Seq(
      (1L, "go go go stop"), // top pair (go,go): merge positions 0-1 ONLY
      (2L, "go go stop go go"), // two disjoint merges
      (3L, "stop stop"), // no (go,go) here
      (4L, "???")) // empty after normalization
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStatsQueries.q114BpeMergeStep(spark, dir)
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getLong(2), x.getLong(3))).toMap
    // pair counts: "go go" 3 (docs 1×2 + 2×2 → wait: doc1 has go-go,go-go,
    // go-stop → 2; doc2 go-go,go-stop,stop-go,go-go → 2; total 4),
    // "go stop" 2, "stop go" 1, "stop stop" 1 → top = "go go"
    assert(r(1L)._1 === "go go")
    // doc1 "go go go stop": greedy merges [go go] then go,stop → 3 tokens
    assert(r(1L)._2 === 4L && r(1L)._3 === 3L)
    // doc2: both (go,go) pairs disjoint → 2 merges, 5 → 3
    assert(r(2L)._2 === 5L && r(2L)._3 === 3L)
    // doc3: untouched
    assert(r(3L)._2 === 2L && r(3L)._3 === 2L)
    // doc4: empty stays empty
    assert(r(4L)._2 === 0L && r(4L)._3 === 0L)
  }

  // ------------------------------------------------------------- q115
  test("q115: three BPE rounds compose — merged tokens join later merges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe3").toString
    Seq((1L, "a b a b a b"), (2L, "a b c"), (3L, "c c"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextStatsQueries.q115BpeTrain(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toMap
    // round 1: "a b" wins (4 occurrences); round 2 merges the merged
    // token with itself ("a b"+"a b"); round 3 is a 3-way count tie —
    // byte order picks "a b"+"c" ( sorts below space)
    val (p1, p2, p3, _, _) = rows(1L)
    assert(p1 === "a b")
    assert(p2 === "a b a b")
    assert(p3 === "a b c")
    assert(rows(1L)._4 === 6L && rows(1L)._5 === 2L) // [abab, ab]
    assert(rows(2L)._4 === 3L && rows(2L)._5 === 1L) // [abc]
    assert(rows(3L)._4 === 2L && rows(3L)._5 === 2L) // untouched
  }

  // ------------------------------------------------------------- q111
  test("q111: session_window MERGES an exactly-gap event (boundary pin)") {
    // pins the Spark semantics the oracle encodes: a new session starts
    // only when the incoming window start is STRICTLY past the current
    // session end — an event at t+gap merges, t+gap+1ms splits
    val gapMs = EventQueries.SessionGapMs
    def sessions(ts2: Long): Long = {
      val df = Seq((1L, new java.sql.Timestamp(0L)),
          (1L, new java.sql.Timestamp(ts2)))
        .toDF("user_id", "ts")
      df.groupBy(col("user_id"),
          session_window(col("ts"), s"$gapMs milliseconds"))
        .count().count()
    }
    assert(sessions(gapMs) === 1L)
    assert(sessions(gapMs + 1) === 2L)
  }

  test("q111: native session_window matches a >-gap islands re-derivation") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        col("value"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val gap = EventQueries.SessionGapMs
    val expected = evs.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._4)).toList
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Double, Long)]]) {
        // session_window semantics: exactly-gap MERGES (strict > splits —
        // the boundary-pin test above proves it against Spark itself)
        case (acc, r) if acc.isEmpty || r._2 - acc.head.head._2 > gap =>
          List(r) :: acc
        case (h :: t, r) => (r :: h) :: t
      }.map(_.reverse).reverse
      sessions.map { s =>
        (u, s.head._2) -> (s.last._2 + gap, s.length.toLong, s.map(_._3).sum)
      }
    }
    val got = EventQueries.q111SessionWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, (end, n, sv)) =>
      val (ge, gn, gsv) = got(k)
      assert(ge === end)
      assert(gn === n)
      // double sums are order-sensitive; the driver fold and Spark's
      // partial aggregation agree well inside 6dp rounding noise
      assert(math.abs(gsv - sv) < 1e-5)
    }
    // cross-check against q31: same gap rule, so the session count is
    // IDENTICAL — only the reported end_ms differs
    val q31n = EventQueries.q31Sessionize(spark, sf).count()
    assert(got.size.toLong === q31n)
  }

  // ------------------------------------------------------------- q112
  test("q112: resample grid is contiguous, mass-conserving, forward-filled") {
    val rows = EventQueries.q112ResampleFfill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    // every user's bucket sequence is contiguous first..last
    byUser.foreach { case (_, g) =>
      val bs = g.map(_._2).sorted
      assert(bs === (bs.head to bs.last).toArray)
    }
    // per-bucket event counts conserve the sampled users' event total
    val total = Tables.events(spark, sf)
      .filter(col("user_id") % EventQueries.ResampleUserMod === 0).count()
    assert(rows.map(_._3).sum === total)
    // value_ffill never null-gaps: first bucket has events by
    // construction, later buckets carry the last value forward
    val evs = Tables.events(spark, sf)
      .filter(col("user_id") % EventQueries.ResampleUserMod === 0)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val w = EventQueries.ResampleBucketMs
    byUser.foreach { case (u, g) =>
      var lastVal = Double.NaN
      g.sortBy(_._2).foreach { case (_, b, n, v) =>
        val inBucket = evs.filter(e => e._1 == u && e._2 / w == b)
        assert(inBucket.length.toLong === n)
        if (inBucket.nonEmpty)
          lastVal = inBucket.maxBy(e => (e._2, e._3))._4
        assert(v === BigDecimal(lastVal).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }

  // ------------------------------------------------------------- q116
  test("q116: source signatures obey the sketch-union law; estimates match") {
    import graft.dedup.Dedup
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
    val k = DedupQueries.K
    val mhCols = (0 until k).map(j => f"mh$j%02d")
    // (a) signature of the UNION of token sets (what q116 computes)
    val direct = Dedup.minhashSig(
        Dedup.tokenSets(docs.select(col("source"), col("text")), "source", "text"), k)
      .collect().map(r => r.getString(0) -> mhCols.indices.map(i => r.getString(i + 1))).toMap
    // (b) elementwise MIN over the source's DOC-level signatures — the
    // mergeability law says (a) == (b): sketches combine without
    // re-touching documents
    val docSigs = Dedup.minhashSig(Dedup.tokenSets(docs, "doc_id", "text"), k)
      .join(docs.select(col("doc_id").as("id"), col("source")), Seq("id"))
      .collect().map(r => (r.getString(r.length - 1),
        mhCols.indices.map(i => r.getString(i + 1))))
    val merged = docSigs.groupBy(_._1).map { case (src, sigs) =>
      src -> mhCols.indices.map(i => sigs.map(_._2(i)).min)
    }
    assert(direct === merged)
    // and the q116 estimates are exactly the agreement fractions of (a)
    val got = DedupQueries.q116SourceMinhashUnion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val sources = direct.keys.toSeq.sorted
    for (s1 <- sources; s2 <- sources if s1 < s2) {
      val agree = mhCols.indices.count(i => direct(s1)(i) == direct(s2)(i))
      val expect = BigDecimal(agree.toDouble / k)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got((s1, s2)) === expect)
    }
  }

  // ------------------------------------------------------------- q117
  test("q117: KMV estimate matches driver re-derivation; k-min sets merge") {
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def h(w: String): Long = java.lang.Long.parseLong(md5hex(w).substring(0, 12), 16)
    val k = DedupQueries.KmvK
    def toks(t: String): Set[String] =
      t.toLowerCase.replaceAll("(\\d|\\W)+", " ").trim
        .split(" ").filter(_.nonEmpty).toSet
    val bySource = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, rows) => s -> rows.flatMap(r => toks(r._2)).toSet }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = bySource.map { case (s, words) =>
      val n = words.size.toLong
      // per-WORD hash sequence, not a Set of hashes: the query ranks one
      // row per word, so a 48-bit collision between two distinct words
      // must keep both values here too
      val est = if (n < k) n.toDouble
      else {
        val hk = words.toSeq.map(h).sorted.apply(k - 1)
        (k - 1).toDouble / ((hk + 0.5) / 281474976710656.0)
      }
      s -> (n, r6(est))
    }
    val got = DedupQueries.q117KmvDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === expected)
    // mergeability: the k smallest of a union == the k smallest of the
    // pooled per-half k-min sets (the property that makes KMV a
    // partial-aggregable sketch)
    bySource.values.take(3).foreach { words =>
      val hs = words.toSeq.map(h).sorted
      val (l, r) = words.toSeq.splitAt(words.size / 2)
      val pooled = (l.map(h).sorted.take(k) ++ r.map(h).sorted.take(k))
        .sorted.take(k)
      assert(pooled === hs.take(k))
    }
  }

  // ------------------------------------------------------------- q118
  test("q118: winsorization clamps exactly at the rank-order percentiles") {
    val rows = EventQueries.q118Winsorize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._2)
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)
    byType.foreach { case (t, g) =>
      val sorted = raw(t).sortBy(r => (r._2, r._3)).map(_._2)
      val n = sorted.length
      val lo = sorted(math.max(1, math.ceil(n * 0.01).toInt) - 1)
      val hi = sorted(math.ceil(n * 0.99).toInt - 1)
      g.foreach { case (_, _, v, w, clipped) =>
        val expect = math.max(lo, math.min(hi, v))
        assert(math.abs(w - BigDecimal(expect).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
        assert(clipped === (v < lo || v > hi))
      }
      // clipping is rare but present on a 1% tail
      assert(g.count(_._5) > 0)
      assert(g.count(_._5) < g.size / 10)
    }
  }

  // ------------------------------------------------------------- q119
  test("q119: median/MAD match a driver-side rank re-derivation") {
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = raw.map { case (t, g) =>
      val n = g.length
      val med = g.sortBy(r => (r._2, r._3)).apply((n + 1) / 2 - 1)._2
      val mad = g.map(r => (math.abs(r._2 - med), r._3))
        .sortBy(identity).apply((n + 1) / 2 - 1)._1
      val outliers = g.count(r =>
        mad != 0 && math.abs(0.6745 * (r._2 - med) / mad) > 3.5)
      def r6(x: Double) = BigDecimal(x).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      t -> (n.toLong, r6(med), r6(mad), outliers.toLong)
    }
    val got = EventQueries.q119RobustStats(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got === expected)
  }

  // ------------------------------------------------------------- q120
  test("q120: ORC-migrated lake is bit-faithful and partition-pruned") {
    val got = EventQueries.q120OrcLake(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // same aggregate straight off the parquet source
    val viaParquet = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 6).as("sum_value"))
      .orderBy(col("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got === viaParquet)
    // the ORC scan prunes to the purchase partition — never a post-scan
    // filter over all event types
    val plan = EventQueries.q120OrcLake(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("event_type"), s"expected partition pruning:\n$plan")
  }

  // ------------------------------------------------------------- q121
  test("q121: z-order keys are bijective and locality-preserving") {
    val rows = EventQueries.q121ZorderKey(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // bijectivity: de-interleaving the key recovers both coordinates
    // exactly — the property that makes z-range file pruning sound
    def deinterleave(z: Long): (Long, Long) = {
      var (u, t) = (0L, 0L)
      for (i <- 0 until 16) {
        u |= ((z >> (2 * i)) & 1L) << i
        t |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (u, t)
    }
    rows.foreach { case (u, t, z) => assert(deinterleave(z) === (u, t)) }
    // the defining locality property (exact, density-independent):
    // every ALIGNED 2^k x 2^k block occupies one contiguous z-range of
    // length 2^(2k) — which is why a z-sorted file layout can prune by
    // z-range for predicates on either dimension
    for (k <- Seq(4, 8)) {
      rows.groupBy { case (u, t, _) => (u >> k, t >> k) }
        .foreach { case (_, members) =>
          val zs = members.map(_._3)
          assert(zs.max - zs.min < (1L << (2 * k)))
          assert((zs.min >> (2 * k)) === (zs.max >> (2 * k)))
        }
    }
  }

  // ------------------------------------------------------------- q105
  test("q105: estimator agrees with manual signature comparison") {
    val rows = DedupQueries.q105MinhashCalibration(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (j, est, err) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(j >= 0.0 && j <= 1.0)
      assert(est >= 0.0 && est <= 1.0)
      // est is a multiple of 1/k (k matching components) — up to the
      // 6dp rounding of est itself, which scales by k when multiplied back
      val k = DedupQueries.K
      assert(math.abs(est * k - math.round(est * k).toDouble) < k * 1e-6)
      assert(math.abs(err - math.abs(j - est)) < 1e-6)
    }
    // manual check of one pair: recompute both sides from raw text
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") % DedupQueries.CalibMod === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(t: String): Set[String] =
      t.toLowerCase.replaceAll("(\\d|\\W)+", " ").trim
        .split(" ").filter(_.nonEmpty).toSet
    val ids = docs.keys.toSeq.sorted
    val (a, b) = (ids(0), ids(1))
    val (ta, tb) = (toks(docs(a)), toks(docs(b)))
    val expectJ = ta.intersect(tb).size.toDouble / ta.union(tb).size
    rows.find(r => r.getLong(0) == a && r.getLong(1) == b) match {
      case Some(r) => assert(math.abs(r.getDouble(2) - expectJ) < 1e-6)
      case None => assert(ta.intersect(tb).isEmpty)
    }
  }
}
