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
}
