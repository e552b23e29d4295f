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
  test("q155: hard negatives match a local brute-force argmax") {
    val rows = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
      .map { case (id, l, v) => (id, l, v.map(x => q0(1e6 * x.toDouble)).toArray) }
    val expected = rows.map { case (id, l, q) =>
      val best = rows.iterator.filter(_._2 != l)
        .map { case (nid, nl, nq) =>
          (q.zip(nq).map { case (a, b) => a * b }.sum, -nid, nl) }
        .max
      (id, l, -best._2, best._3, best._1)
    }.toSet
    val got = Round8Queries.q155HardNegatives(spark, sf0001)
      .as[(Long, Int, Long, Int, Long)].collect().toSet
    assert(got === expected)
    // a hard negative always carries a different label
    got.foreach { case (_, l, _, nl, _) => assert(l != nl) }
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
