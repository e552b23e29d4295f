package graft.operators

import graft.SparkTestBase

/** Independent local re-derivations for the round-16 batch: DSIR
  * importance weights, RRF hybrid fusion, and the passage-dedup
  * profile — each recomputed from raw text / collected leg rankings
  * with plain Scala, no Spark expressions shared with the operator.
  */
class Round16QueriesSpec extends SparkTestBase {

  private def tokens(text: String): Vector[String] =
    text.toLowerCase.replaceAll("(\\d|\\W)+", " ").trim
      .split(" ").toVector.filter(_.nonEmpty)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def nano(x: Double): Long =
    BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val docs: Vector[(Long, String, String)] =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "text").collect().toVector
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("q255: DSIR weights equal a from-scratch local replay; target slice scores higher") {
    val b = Round16Queries.DsirBuckets
    def bucket(tok: String): Long =
      java.lang.Long.parseLong(md5hex(tok).take(8), 16) % b
    val toks = docs.map { case (id, lang, text) =>
      (id, lang, tokens(text).map(bucket)) }
    val raw = toks.flatMap(_._3).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val tgt = toks.filter(_._2 == Round16Queries.DsirTargetLang)
      .flatMap(_._3).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val rTot = raw.values.sum.toDouble
    val tTot = tgt.values.sum.toDouble
    val ratioNano: Map[Long, Long] = (0L until b.toLong).map { bk =>
      bk -> nano(
        math.log((tgt.getOrElse(bk, 0L) + 1.0) / (tTot + b)) -
        math.log((raw.getOrElse(bk, 0L) + 1.0) / (rTot + b)))
    }.toMap
    val expected = toks.map { case (id, _, bks) =>
      id -> (bks.size.toLong, r6(bks.map(ratioNano).sum / 1e9))
    }.toMap
    val got = Round16Queries.q255DsirWeights(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === expected)
    // the defining DSIR property on this fixture: the target slice's
    // mean weight exceeds the rest's (its features ARE the target
    // distribution)
    val byLang = docs.map(d => d._1 -> d._2).toMap
    def mean(ids: Iterable[Long]) =
      ids.map(got(_)._2).sum / ids.size
    val en = got.keys.filter(byLang(_) == Round16Queries.DsirTargetLang)
    val rest = got.keys.filterNot(byLang(_) == Round16Queries.DsirTargetLang)
    assert(en.nonEmpty && rest.nonEmpty)
    assert(mean(en) > mean(rest),
      s"target-slice mean ${mean(en)} must exceed rest ${mean(rest)}")
  }

  test("q256: RRF fusion equals a local fold of its two gated legs") {
    import org.apache.spark.sql.functions.col
    val k = Round16Queries.RrfK
    val bmLeg = Round14Queries.q226Bm25(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val annLeg = graft.ann.Ann.bruteForceTopK(
        graft.Tables.embeddings(spark, sf0001)
          .filter(col("vec_id") === Round16Queries.RrfAnnQueryId),
        graft.Tables.embeddings(spark, sf0001), k = Round16Queries.RrfTopK)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // same double expression as the operator (1e9/(K+rk), THEN round)
    // — (1/(K+rk))·1e9 can differ in the last ulp
    def contrib(r: Long): Long =
      BigDecimal(1e9 / (k + r)).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val fusedAll = (bmLeg.keySet ++ annLeg.keySet).toVector.map { id =>
      val s = bmLeg.get(id).map(contrib).getOrElse(0L) +
        annLeg.get(id).map(contrib).getOrElse(0L)
      (id, s)
    }.sortBy { case (id, s) => (-s, id) }
      .take(Round16Queries.RrfTopK)
    val got = Round16Queries.q256RrfFusion(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.map(r => (r._1, r._2)).toVector === fusedAll)
    assert(got.map(_._3).toVector === (1L to got.length.toLong).toVector)
    // both legs must actually contribute to the fused top-k
    val gotIds = got.map(_._1).toSet
    assert(gotIds.exists(bmLeg.contains) && gotIds.exists(annLeg.contains))
  }

  test("q261: self-BLEU-2 equals a local clipped-bigram replay; bounds hold") {
    val bigramsByDoc: Map[Long, Map[String, Long]] = docs.map { case (id, _, text) =>
      val t = tokens(text)
      id -> t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
        .groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
    }.toMap
    val totals: Map[String, Long] = bigramsByDoc.values.flatten
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sum }
    val expected = bigramsByDoc.collect { case (id, bs) if bs.nonEmpty =>
      val n = bs.values.sum
      val clipped = bs.map { case (g, c) => math.min(c, totals(g) - c) }.sum
      id -> (n, clipped, r6(clipped.toDouble / n))
    }
    val got = Round16Queries.q261SelfBleu(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === expected)
    // precision is a ratio of a clipped numerator: always in [0, 1];
    // and the corpus must show BOTH originality and overlap for the
    // audit to discriminate
    assert(got.values.forall { case (_, _, p) => p >= 0.0 && p <= 1.0 })
    assert(got.values.exists(_._3 < 1.0) && got.values.exists(_._3 > 0.0))
  }

  test("q257: passage-dedup profile equals a local chunk-hash replay") {
    val p = Round16Queries.PassageTokens
    val passages: Vector[(Long, String)] = docs.flatMap { case (id, _, text) =>
      tokens(text).grouped(p).map(chunk => id -> chunk.mkString(" "))
    }
    val occ = passages.groupBy(_._2).map { case (k, v) => k -> v.size }
    val expected = passages.groupBy(_._1).map { case (id, ps) =>
      val dups = ps.count(x => occ(x._2) > 1).toLong
      id -> (ps.size.toLong, dups, r6(dups.toDouble / ps.size))
    }
    val got = Round16Queries.q257PassageDedup(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === expected)
    // non-vacuity: the corpus carries real cross-passage duplication
    assert(got.values.map(_._2).sum > 0L)
  }
}
