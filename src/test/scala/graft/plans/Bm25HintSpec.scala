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

  test("k argument bounds the result; default k applies without it") {
    graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id",
        "explode(filter(split(trim(regexp_replace(lower(text), '(\\\\d|\\\\W)+', ' ')), ' '), w -> w != '')) AS term")
      .createOrReplaceTempView("bm25_spec_tokens")
    val k3 = spark.sql(
      "SELECT /*+ BM25('spark', 'window', 3) */ doc_id, term FROM bm25_spec_tokens")
    assert(k3.columns.toSeq === Seq("doc_id", "bm25", "n_terms_hit"))
    assert(k3.count() === 3)
    val dflt = spark.sql(
      "SELECT /*+ BM25('spark') */ doc_id, term FROM bm25_spec_tokens")
    assert(dflt.count() === Round14Queries.Bm25TopK)
  }

  test("malformed hints fall through without breaking the query") {
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
}
