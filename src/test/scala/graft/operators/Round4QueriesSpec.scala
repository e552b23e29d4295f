package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Specs for the round-4 additions: repetition ratios (q71), token
  * chunking (q72), promo share (q73), supplier breadth (q74), dormant
  * customers (q75). q71/q72 get exact hand-computed checks over a
  * synthetic documents dir; q73–q75 get invariant + independent
  * re-derivation checks over sf0.001.
  */
class Round4QueriesSpec extends SparkTestBase {
  import spark.implicits._

  /** Write a {doc_id, text} documents.parquet into a temp dir usable as
    * an sfDir (queries only touch the columns they select).
    */
  private def docsDir(rows: Seq[(Long, String)]): String =
    writeDocs(rows.toDF("doc_id", "text"))

  private def docsDirWithSource(rows: Seq[(Long, String, String)]): String =
    writeDocs(rows.toDF("doc_id", "text", "source"))

  private def writeDocs(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q71: repetition ratios on hand-computed docs") {
    val dir = docsDir(Seq(
      (1L, "spam spam spam spam"), // 4 tokens, 3 identical bigrams
      (2L, "one two three four five"), // all distinct
      (3L, "???"), // zero tokens after normalization
      (4L, "go go stop go go"))) // dup bigram "go go" twice
    val r = TextStatsQueries.q71RepetitionRatios(spark, dir)
      .collect().map(x => x.getLong(0) -> x).toMap

    assert(r(1L).getAs[Long]("n_tokens") === 4L)
    assert(r(1L).getAs[Long]("top_word_count") === 4L)
    assert(r(1L).getAs[Double]("top_word_frac") === 1.0)
    assert(r(1L).getAs[Long]("n_bigrams") === 3L)
    // 3 bigrams, 1 distinct → dup frac 2/3
    assert(r(1L).getAs[Double]("dup_bigram_frac") === 0.666667)
    assert(!r(1L).getAs[Boolean]("keep"))

    assert(r(2L).getAs[Double]("top_word_frac") === 0.2)
    assert(r(2L).getAs[Double]("dup_bigram_frac") === 0.0)
    assert(r(2L).getAs[Boolean]("keep"))

    // empty doc: all zeros, no nulls, keep=true (nothing repeats)
    assert(r(3L).getAs[Long]("n_tokens") === 0L)
    assert(r(3L).getAs[Double]("top_word_frac") === 0.0)
    assert(r(3L).getAs[Long]("n_bigrams") === 0L)
    assert(r(3L).getAs[Double]("dup_bigram_frac") === 0.0)

    // bigrams: "go go","go stop","stop go","go go" → 4 total, 3 distinct
    assert(r(4L).getAs[Long]("n_bigrams") === 4L)
    assert(r(4L).getAs[Double]("dup_bigram_frac") === 0.25)
  }

  test("q72: chunk boundaries, strides, and tail suppression") {
    // alphabetic tokens — normalization strips digits, so "w25"-style
    // names would all collapse to the same word
    def tok(i: Int): String = s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val words40 = (0 until 40).map(tok).mkString(" ")
    val words32 = (0 until 32).map(tok).mkString(" ")
    val words10 = (0 until 10).map(tok).mkString(" ")
    val dir = docsDir(Seq((1L, words40), (2L, words32), (3L, words10), (4L, "!!")))
    val rows = TextStatsQueries.q72TokenChunks(spark, dir)
      .collect().groupBy(_.getLong(0))

    // 40 tokens → chunk 0 covers 1..32, chunk 1 covers 25..40 (16 new)
    val d1 = rows(1L).sortBy(_.getAs[Long]("chunk_id"))
    assert(d1.map(_.getAs[Long]("chunk_tokens")).toSeq === Seq(32L, 16L))
    assert(d1(1).getAs[String]("chunk_text").startsWith(tok(24) + " "))
    assert(d1(1).getAs[String]("chunk_text").endsWith(" " + tok(39)))

    // exactly 32 tokens: chunk 0 already reached the end → no tail chunk
    assert(rows(2L).length === 1)
    // short doc → single short chunk
    assert(rows(3L).map(_.getAs[Long]("chunk_tokens")).toSeq === Seq(10L))
    // zero-token doc emits nothing
    assert(!rows.contains(4L))
  }

  test("q73: promo share consistent with its own sums") {
    val r = RelationalOps.q73PromoRevenue(spark, sf0001).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val promo = x.getAs[Double]("promo_revenue")
      val total = x.getAs[Double]("total_revenue")
      val share = x.getAs[Double]("promo_share")
      assert(promo >= 0 && promo <= total)
      assert(math.abs(share - 100.0 * promo / total) < 1e-3)
    }
  }

  test("q74: breadth counts match an independent re-derivation") {
    // sf0.01, not sf0.001: the smaller set has ZERO negative-balance
    // suppliers, so the exclusion anti-join would be vacuous there and
    // the test would pass even with the join dropped or inverted.
    val r = RelationalOps.q74SupplierBreadth(spark, sf001)
    val fromQuery = r.agg(sum($"n_lines")).head.getLong(0)
    // independent path: semi-join-free filter on the good-supplier set
    val allSupp = graft.Tables.supplier(spark, sf001)
      .select($"s_suppkey", $"s_acctbal").as[(Long, Double)].collect()
    val goodSupp = allSupp.filter(_._2 >= 0).map(_._1).toSet
    assert(goodSupp.size < allSupp.length,
      "exclusion set must be non-empty for this test to bite")
    val expected = graft.Tables.lineitem(spark, sf001)
      .filter($"l_suppkey".isin(goodSupp.toSeq: _*)).count()
    assert(fromQuery === expected)
    // per-group sanity: distinct counts never exceed line count
    r.collect().foreach { x =>
      assert(x.getAs[Long]("supplier_cnt") <= x.getAs[Long]("n_lines"))
      assert(x.getAs[Long]("part_cnt") <= x.getAs[Long]("n_lines"))
    }
  }

  test("q78: verdict precedence and directedness on crafted sources") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toString
    Seq(
      // corpus (src1): two docs + an internal exact-dup pair that must
      // NOT surface (candidates are increment-directed)
      (10L, base, "src1"),
      (11L, "totally different content about completely other things entirely " +
        "with many unique words never repeated elsewhere in this corpus", "src1"),
      (12L, base + " omega", "src1"),
      (13L, base + " omega", "src1"),
      // increment (src0)
      (1L, base, "src0"), // byte-identical to 10 → exact_dup, match 10
      (2L, base + " chi", "src0"), // one appended word → shingle J=18/19 → near_dup
      (3L, "qqq www eee rrr ttt yyy uuu iii ooo ppp", "src0")) // new
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = DedupQueries.q78IncrementalDedup(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getLong(2))).toMap
    assert(r.keySet === Set(1L, 2L, 3L), "only increment docs in the output")
    assert(r(1L) === ("exact_dup", 10L))
    assert(r(2L)._1 === "near_dup")
    assert(r(3L) === ("new", -1L))
  }

  test("q78 probe plan: corpus side reads persisted artifacts, no corpus recompute") {
    val q = DedupQueries.q78IncrementalDedup(spark, sf0001)
    // formatted physical explain — the only mode that prints scan paths
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // all three corpus artifacts are parquet scans of the offline dir
    assert("inc-dedup".r.findAllIn(plan).size >= 3,
      "expected shingles/bands/hashes artifact scans in the plan")
    // live computation must only touch the INCREMENT (source = src0):
    // a corpus-side recompute would plan as a NOT(source = src0)
    // filter over a documents scan — exactly what the artifacts replace
    assert(!plan.contains("NOT (source"),
      "corpus-side filter found — corpus shingles/bands recomputed live?")
    assert(plan.contains("src0"), "increment filter must reach the scan")
  }

  test("q76: contamination equals a driver-side brute-force on sf0.001") {
    val out = DedupQueries.q76Decontamination(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_shingles"),
        r.getAs[Long]("overlap"), r.getAs[Double]("contamination"))).toMap
    // independent recomputation: tokenize + shingle in plain Scala
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def toks(t: String): Seq[String] =
      t.toLowerCase.replaceAll("(\\d|\\W)+", " ").trim.split(" ").filter(_.nonEmpty).toSeq
    def shingles(t: String): Set[String] =
      toks(t).sliding(DedupQueries.DecontaminationN)
        .filter(_.size == DedupQueries.DecontaminationN).map(_.mkString(" ")).toSet
    def md5hex(t: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val (train, test) = docs.partition { case (_, t) => md5hex(t).head < 'e' }
    val trainSh = train.flatMap(d => shingles(d._2)).toSet
    assert(out.keySet === test.map(_._1).toSet)
    test.foreach { case (id, t) =>
      val sh = shingles(t)
      val ov = sh.count(trainSh.contains).toLong
      assert(out(id)._1 === sh.size.toLong, s"doc $id n_shingles")
      assert(out(id)._2 === ov, s"doc $id overlap")
      if (sh.nonEmpty)
        assert(math.abs(out(id)._3 - ov.toDouble / sh.size) < 1e-5)
      else assert(out(id)._3 === 0.0)
    }
  }

  test("q77: exists-semantics equals a distinct-count re-derivation") {
    val out = RelationalOps.q77OrderPriorityCheck(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = graft.Tables.orders(spark, sf0001)
      .join(graft.Tables.lineitem(spark, sf0001),
        $"o_orderkey" === $"l_orderkey" && $"l_shipdate" > $"o_orderdate")
      .select($"o_orderpriority", $"o_orderkey").distinct()
      .groupBy($"o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === expected)
    assert(out.values.sum > 0)
  }

  test("q79: local-supplier constraint equals a post-join filter re-derivation") {
    val out = RelationalOps.q79LocalSupplierRevenue(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // independent derivation: plain 4-way join, nation equality applied
    // as an ordinary filter AFTER the joins
    val li = graft.Tables.lineitem(spark, sf001)
    val o = graft.Tables.orders(spark, sf001)
      .filter($"o_orderdate" >= lit(RelationalOps.LocalRevYearStart).cast("timestamp_ntz") &&
        $"o_orderdate" < lit(RelationalOps.LocalRevYearEnd).cast("timestamp_ntz"))
    val joined = li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(graft.Tables.customer(spark, sf001), $"o_custkey" === $"c_custkey")
      .join(graft.Tables.supplier(spark, sf001), $"l_suppkey" === $"s_suppkey")
      .filter($"c_nationkey" === $"s_nationkey")
      .join(graft.Tables.nation(spark, sf001), $"c_nationkey" === $"n_nationkey")
    val expected = joined.groupBy($"n_name")
      .agg(round(RelationalOps.exactMoneySum(
        $"l_extendedprice" * (lit(1.0) - $"l_discount")), 6).as("revenue"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out === expected)
    assert(out.nonEmpty)
  }

  test("q80: top-20 values and ordering match a driver-side re-derivation") {
    val rows = RelationalOps.q80ReturnedItemCustomers(spark, sf001).collect()
    assert(rows.length === RelationalOps.ReturnsTopN)
    val pairs = rows.map(r => (r.getAs[Double]("revenue"), r.getAs[Long]("c_custkey")))
    pairs.sliding(2).foreach { case Array((rev1, k1), (rev2, k2)) =>
      assert(rev1 > rev2 || (rev1 == rev2 && k1 < k2),
        s"ordering violated: ($rev1,$k1) before ($rev2,$k2)")
    }
    // independent value re-derivation in plain Scala: collect the three
    // small inputs and recompute per-customer returns revenue — a
    // dropped returnflag filter or date window fails this, not just
    // the external oracle
    val window = graft.Tables.orders(spark, sf001)
      .filter($"o_orderdate" >= lit(RelationalOps.ReturnsQuarterStart).cast("timestamp_ntz") &&
        $"o_orderdate" < lit(RelationalOps.ReturnsQuarterEnd).cast("timestamp_ntz"))
      .select($"o_orderkey", $"o_custkey").as[(Long, Long)].collect().toMap
    val revByCust = graft.Tables.lineitem(spark, sf001)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      .as[(Long, Double, Double)].collect()
      .flatMap { case (ok, price, disc) =>
        window.get(ok).map(cust => cust -> math.round(price * (1.0 - disc) * 10000))
      }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sum / 10000.0 }
    val expectedTop = revByCust.toSeq
      .map { case (c, rev) => (BigDecimal(rev).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, c) }
      .sortBy { case (rev, c) => (-rev, c) }
      .take(RelationalOps.ReturnsTopN)
    assert(pairs.toSeq === expectedTop)
  }

  test("q87: boilerplate share on hand-computed shingle dfs") {
    // "a b c" occurs in 4 docs (>= MinDf 3); every other shingle is unique
    val dir = docsDir(Seq(
      (1L, "a b c d"), // {a b c, b c d} -> share 0.5
      (2L, "a b c x"), // share 0.5
      (3L, "a b c y"), // share 0.5
      (4L, "z z"), // < 3 tokens -> 0 shingles, share 0.0
      (5L, "a b c"))) // only the boilerplate shingle -> share 1.0
    val r = DedupQueries.q87BoilerplateShare(spark, dir)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2))).toMap
    assert(r === Map(
      1L -> (2L, 0.5), 2L -> (2L, 0.5), 3L -> (2L, 0.5),
      4L -> (0L, 0.0), 5L -> (1L, 1.0)))
  }

  test("q88: mixture weights equalize expected tokens per source") {
    val dir = docsDirWithSource(Seq(
      (1L, "a b c", "s1"), (2L, "d e", "s1"),
      (3L, "f g h i j k l", "s2"),
      (4L, "   ", "s4"))) // zero BPE tokens -> weight 0, not NULL/inf
    val r = TextStatsQueries.q88MixtureWeights(spark, dir)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    // totals: 12 tokens over 3 sources -> 4-token uniform target
    assert(r("s1") === ((2L, 5L, 0.416667, 0.8)))
    assert(r("s2") === ((1L, 7L, 0.583333, 0.571429)))
    assert(r("s4") === ((1L, 0L, 0.0, 0.0)))
    // the invariant the weights exist for: weight * tokens is constant
    // over every source that has tokens
    val budgets = r.values.collect { case (_, tok, _, w) if tok > 0 => w * tok }
    assert(budgets.forall(b => math.abs(b - budgets.head) < 1e-3))
  }

  test("q75: dormant set equals the brute-force definition") {
    val out = RelationalOps.q75DormantCustomers(spark, sf0001)
    val numFromQuery = out.agg(sum($"numcust")).head.getLong(0)
    val cust = graft.Tables.customer(spark, sf0001)
    val scaled = cust.filter($"c_acctbal" > 0)
      .select(round($"c_acctbal" * 100, 0).cast("long").as("s"))
      .agg(sum($"s").as("t"), count(lit(1)).as("n")).head
    val avg = scaled.getLong(0) / 100.0 / scaled.getLong(1)
    val recent = graft.Tables.orders(spark, sf0001)
      .filter($"o_orderdate" >= lit(RelationalOps.DormantCutoff).cast("timestamp_ntz"))
      .select($"o_custkey").as[Long].collect().toSet
    val expected = cust.filter($"c_acctbal" > avg)
      .select($"c_custkey").as[Long].collect().count(k => !recent.contains(k))
    assert(numFromQuery === expected)
    assert(numFromQuery > 0, "cutoff must leave a non-empty dormant set")
  }
}
