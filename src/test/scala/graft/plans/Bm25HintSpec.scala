package graft.plans

import graft.SparkTestBase
import graft.operators.{Round14Queries, Round15Queries}

/** The /*+ BM25 */ SQL surface: parity with the Scala q226 pipeline,
  * the k argument, and malformed-hint fallthrough.
  */
class Bm25HintSpec extends SparkTestBase {

  test("/*+ BM25 */ over a token view equals the Scala q226 pipeline") {
    val hinted = Round15Queries.q246SqlBm25(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toVector
    val viaScala = Round14Queries.q226Bm25(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toVector
    // this corpus has no empty-token documents, so the long-form
    // stats (hint) equal the array-form stats (q226) exactly
    assert(hinted === viaScala)
    assert(hinted.nonEmpty)
  }

  // registered per-test so every test is order-independent and
  // runnable in isolation (a view created in one test leaks suite
  // order into another's preconditions)
  private def registerTokenView(): Unit =
    graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id",
        "explode(filter(split(trim(regexp_replace(lower(text), '(\\\\d|\\\\W)+', ' ')), ' '), w -> w != '')) AS term")
      .createOrReplaceTempView("bm25_spec_tokens")

  test("k argument bounds the result; default k applies without it") {
    registerTokenView()
    val k3 = spark.sql(
      "SELECT /*+ BM25('spark', 'window', 3) */ doc_id, term FROM bm25_spec_tokens")
    assert(k3.columns.toSeq === Seq("doc_id", "bm25", "n_terms_hit"))
    assert(k3.count() === 3)
    val dflt = spark.sql(
      "SELECT /*+ BM25('spark') */ doc_id, term FROM bm25_spec_tokens")
    assert(dflt.count() === Round14Queries.Bm25TopK)
  }

  test("malformed hints fall through without breaking the query") {
    registerTokenView()
    // no term literals → ignored, raw token rows survive
    val noTerms = spark.sql(
      "SELECT /*+ BM25 */ doc_id, term FROM bm25_spec_tokens")
    assert(noTerms.columns.toSeq === Seq("doc_id", "term"))
    // bad k type → ignored
    val badK = spark.sql(
      "SELECT /*+ BM25('spark', 'oops-k') */ doc_id, term FROM bm25_spec_tokens")
    // 'oops-k' parses as another term literal — still a VALID call
    assert(badK.columns.toSeq === Seq("doc_id", "bm25", "n_terms_hit"))
    val badKInt = spark.sql(
      "SELECT /*+ BM25('spark', 0) */ doc_id, term FROM bm25_spec_tokens")
    assert(badKInt.columns.toSeq === Seq("doc_id", "term"))
    // wrong child columns → ignored
    spark.range(3).selectExpr("id AS a", "'x' AS b")
      .createOrReplaceTempView("bm25_spec_bad")
    val badCols = spark.sql(
      "SELECT /*+ BM25('spark') */ a, b FROM bm25_spec_bad")
    assert(badCols.columns.toSeq === Seq("a", "b"))
  }

  test("/*+ BM25_MULTI */ over a query view equals the Scala q244 pipeline") {
    val hinted = Round15Queries.q253SqlMultiBm25(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4))).toVector
    val viaScala = Round15Queries.q244MultiBm25(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4))).toVector
    assert(hinted === viaScala)
    assert(hinted.nonEmpty)
    // the rewrite must rank through the per-query bounded heaps, not
    // a corpus-wide window sort (the q244 PlanSpec discipline)
    val rewritten = Round15Queries.q253SqlMultiBm25(spark, sf0001)
    assert(rewritten.queryExecution.optimizedPlan.collect {
      case t: graft.plans.TopKPerKey => t
    }.nonEmpty, "BM25_MULTI must rank via TopKPerKey")
  }

  test("BM25_MULTI k argument bounds per-query results") {
    registerTokenView()
    import spark.implicits._
    Seq((0L, "spark"), (0L, "data"), (1L, "spark"))
      .toDF("query_id", "term")
      .createOrReplaceTempView("bm25_multi_spec_queries")
    val k2 = spark.sql(
      "SELECT /*+ BM25_MULTI('bm25_multi_spec_queries', 2) */ doc_id, term FROM bm25_spec_tokens")
    assert(k2.columns.toSeq ===
      Seq("query_id", "doc_id", "bm25", "n_terms_hit", "rk"))
    val byQ = k2.collect().groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L))
    byQ.values.foreach(rows => assert(rows.length <= 2))
  }

  test("BM25_MULTI malformed hints fall through without breaking the query") {
    registerTokenView()
    // unresolvable view name → ignored, raw token rows survive
    val noView = spark.sql(
      "SELECT /*+ BM25_MULTI('no_such_view_xyz') */ doc_id, term FROM bm25_spec_tokens")
    assert(noView.columns.toSeq === Seq("doc_id", "term"))
    // view without (query_id, term) columns → ignored
    spark.range(3).selectExpr("id AS a", "'x' AS b")
      .createOrReplaceTempView("bm25_multi_spec_bad")
    val badView = spark.sql(
      "SELECT /*+ BM25_MULTI('bm25_multi_spec_bad') */ doc_id, term FROM bm25_spec_tokens")
    assert(badView.columns.toSeq === Seq("doc_id", "term"))
    // bad k → ignored
    val badK = spark.sql(
      "SELECT /*+ BM25_MULTI('bm25_multi_spec_bad', 0) */ doc_id, term FROM bm25_spec_tokens")
    assert(badK.columns.toSeq === Seq("doc_id", "term"))
    // no args → ignored
    val noArgs = spark.sql(
      "SELECT /*+ BM25_MULTI */ doc_id, term FROM bm25_spec_tokens")
    assert(noArgs.columns.toSeq === Seq("doc_id", "term"))
  }

  test("BM25_MULTI dl view restores full-corpus stats when token-less docs exist") {
    import spark.implicits._
    // tiny corpus WITH a zero-token document (doc 9): a (doc_id, term)
    // relation cannot represent it, so token-derived stats see 3 docs
    // where the corpus has 4 — the round-9 ADVICE divergence, made
    // visible and then fixed by the hint's (doc_id, dl) third argument
    val toks = Seq(
      (0L, "spark"), (0L, "data"), (0L, "data"),
      (1L, "spark"), (1L, "rows"),
      (2L, "data"), (2L, "rows"), (2L, "rows"))
      .toDF("doc_id", "term")
    toks.createOrReplaceTempView("bm25_dl_spec_tokens")
    Seq((0L, "spark")).toDF("query_id", "term")
      .createOrReplaceTempView("bm25_dl_spec_queries")
    Seq((0L, 3L), (1L, 2L), (2L, 3L), (9L, 0L)).toDF("doc_id", "dl")
      .createOrReplaceTempView("bm25_dl_spec_dl")
    def run(sql: String) = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toVector
    val tokenStats = run("SELECT /*+ BM25_MULTI('bm25_dl_spec_queries', 3) */ " +
      "doc_id, term FROM bm25_dl_spec_tokens")
    val fullStats = run("SELECT /*+ BM25_MULTI('bm25_dl_spec_queries', 3, " +
      "'bm25_dl_spec_dl') */ doc_id, term FROM bm25_dl_spec_tokens")
    // same ranked docs, different idf/avgdl → different scores: the
    // empty doc raises n_docs (idf up) and lowers avgdl
    assert(tokenStats.map(t => (t._1, t._2)) === fullStats.map(t => (t._1, t._2)))
    assert(tokenStats.map(_._3) !== fullStats.map(_._3),
      "the dl view must change corpus stats when a token-less doc exists")
    // exact replay of the full-stats side: N=4, avgdl=2, df(spark)=2
    val idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    def bm25(tf: Long, dl: Long) = BigDecimal(
        idf * (tf * (Round14Queries.Bm25K1 + 1.0)) /
          (tf + Round14Queries.Bm25K1 * (1.0 - Round14Queries.Bm25B +
            Round14Queries.Bm25B * dl / 2.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = Seq((0L, bm25(1, 3)), (1L, bm25(1, 2)))
      .sortBy { case (d, s) => (-s, d) }
    assert(fullStats.map(t => (t._2, t._3)).toSeq === exp)
    // an unresolvable dl view must NOT silently degrade to token
    // stats — the hint falls through whole
    val badDl = spark.sql("SELECT /*+ BM25_MULTI('bm25_dl_spec_queries', 3, " +
      "'no_such_dl_view') */ doc_id, term FROM bm25_dl_spec_tokens")
    assert(badDl.columns.toSeq === Seq("doc_id", "term"))
  }
}
