package graft.operators

import graft.{SparkTestBase, Tables}

/** Driver-side re-derivations for the corpus-evaluation batch:
  * q97 vocabulary growth, q98 Zipf slope, q99 ANN candidate recall,
  * q100 dedup survivorship. Expectations are computed from the raw
  * rows with plain Scala (tokenization replicated from the engine's
  * normalize contract; LSH hyperplanes re-derived from the same md5
  * construction), so the distributed plans are checked against the
  * definitions.
  */
class CurationEvalSpec extends SparkTestBase {
  import spark.implicits._

  private def tokens(text: String): Array[String] =
    text.toLowerCase.replaceAll("(\\d|\\W)+", " ").trim
      .split(" ").filter(_.nonEmpty)

  private lazy val docs: Array[(Long, String)] =
    Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()

  test("q97: growth curve is monotone and totals the distinct-bigram vocabulary") {
    val r = TextStatsQueries.q97VocabGrowth(spark, sf0001).collect()
    val cum = r.map(_.getAs[Long]("cum_vocab"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a < b })
    assert(r.map(_.getAs[Long]("new_bigrams")).sum === cum.last)
    val allBigrams = docs.flatMap { case (_, t) =>
      tokens(t).sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }.toSet
    assert(cum.last === allBigrams.size)
    // first occurrence honors doc order: bucket 0 exists
    assert(r.head.getAs[Long]("bucket") === 0L)
  }

  test("q98: slope/intercept match the quantized driver regression; slope negative") {
    // q98 runs on the q10 token pipeline, which is stopword-filtered
    val stop = graft.text.TextPrep.DefaultStopwords.toSet
    val freqs = docs.flatMap { case (_, t) => tokens(t) }
      .filterNot(stop)
      .groupBy(identity).map { case (w, xs) => (w, xs.length.toLong) }
    val ranked = freqs.toSeq.sortBy { case (w, f) => (-f, w) }.zipWithIndex
    val pts = ranked.map { case ((_, f), i) =>
      (math.round(math.log(i + 1.0) * 1000), math.round(math.log(f.toDouble) * 1000))
    }
    val n = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = DocQueries.q98ZipfSlope(spark, sf0001).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_words") === n)
    assert(r.head.getAs[Double]("zipf_slope") === r6(slope))
    assert(r.head.getAs[Double]("zipf_slope") < 0.0)
    assert(r.head.getAs[Double]("intercept_nats") ===
      r6((sy.toDouble - slope * sx.toDouble) / (n.toDouble * 1000.0)))
  }

  test("q99: recall equals a full driver re-derivation of LSH candidates ∩ exact top-k") {
    val emb: Array[(Long, Array[Float])] = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val qids = emb.map(_._1).filter(_ % AnnQueries.QueryMod == 0)
    // hyperplanes: same md5 construction the engine broadcasts
    val total = AnnQueries.LshBands * AnnQueries.LshRowsPerBand
    val hp: Map[(Int, Int), Double] = graft.ann.Ann
      .hyperplanes(spark, total, AnnQueries.Dim)
      .collect().map(r => (r.getAs[Int]("h"), r.getAs[Int]("j")) ->
        r.getAs[Double]("s")).toMap
    def buckets(v: Array[Float]): Map[Int, Long] =
      (0 until AnnQueries.LshBands).map { band =>
        val bits = (0 until AnnQueries.LshRowsPerBand).map { row =>
          val h = band * AnnQueries.LshRowsPerBand + row
          val p = v.indices.map(j => hp((h, j)) * v(j)).sum
          if (p > 0) 1L << row else 0L
        }.sum
        band -> bits
      }.toMap
    val allBuckets = emb.map { case (id, v) => id -> buckets(v) }.toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byId = emb.toMap
    val expected = qids.sorted.map { q =>
      val topk = emb.filter(_._1 != q)
        .map { case (n, v) => (n, r6(dot(byId(q), v))) }
        .sortBy { case (n, c) => (-c, n) }.take(AnnQueries.RecallK).map(_._1).toSet
      val qb = allBuckets(q)
      val cand = emb.map(_._1).filter(n => n != q &&
        (0 until AnnQueries.LshBands).exists(b => allBuckets(n)(b) == qb(b))).toSet
      q -> (topk & cand).size.toLong
    }.toMap
    val r = AnnQueries.q99AnnRecall(spark, sf0001).collect()
    assert(r.map(_.getAs[Long]("qid")).toSet === expected.keySet)
    r.foreach { x =>
      val hits = expected(x.getAs[Long]("qid"))
      assert(x.getAs[Long]("n_hit") === hits)
      assert(x.getAs[Double]("recall") ===
        r6(hits.toDouble / AnnQueries.RecallK))
    }
  }

  test("q100: verdict partition is consistent with exact and cluster dedup") {
    val r = DedupQueries.q100DedupSurvivorship(spark, sf0001).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("survivor_id"),
        x.getAs[String]("verdict")))
    assert(r.length === docs.length)
    val exactCanon = docs.groupBy(_._2).values
      .flatMap(g => g.map(d => d._1 -> g.map(_._1).min)).toMap
    val clusterOf = DedupQueries.q19DupClusters(spark, sf0001).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("component")).toMap
    r.foreach { case (id, survivor, verdict) =>
      assert(survivor === clusterOf(id))
      assert(survivor <= id)
      val expectedVerdict =
        if (exactCanon(id) < id) "exact_dup"
        else if (clusterOf(id) < id) "near_dup"
        else "kept"
      assert(verdict === expectedVerdict, s"doc $id")
    }
    // every cluster keeps exactly one survivor
    val kept = r.filter(_._3 == "kept").map(_._1).toSet
    assert(kept === r.map(_._2).toSet)
    assert(r.exists(_._3 == "exact_dup") || r.exists(_._3 == "near_dup"))
  }
}
