package graft.textstats

import graft.SparkTestBase

class TextStatsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat and the dog went to the market in the morning, and that was that"),
    (2L, "der hund und die katze sind nicht mit dem zug gefahren und das ist gut"),
    (3L, "el perro y el gato que viven en la casa son una familia para siempre"),
    (4L, "le chien et le chat dans les jardins est une belle chose pour tous"),
    (5L, "你好世界 这是一个测试"),
    (6L, "zzz qqq xxx www"),
    (7L, "le café et les crêpes dans les jardins sont une belle chose")).toDF("doc_id", "text")

  test("langId identifies marker-word languages and scripts") {
    val r = TextStats.langId(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getAs[String]("pred_lang")).toMap
    assert(r(1L) === "en")
    assert(r(2L) === "de")
    assert(r(3L) === "es")
    assert(r(4L) === "fr")
    assert(r(5L) === "zh")
    assert(r(6L) === "und")
    // accented Latin must NOT trip the script short-circuit
    assert(r(7L) === "fr")
  }

  test("unigram LM: improbable-token docs score higher than common-token docs") {
    val corpus = Seq(
      (1L, "the cat and the dog and the cat and the dog"),
      (2L, "the dog and the cat and the dog and the cat"),
      (3L, "zyx qwv pfft glorp zyx wibble")).toDF("doc_id", "text")
    val r = TextStats.unigramLogProb(corpus, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(3L) > r(1L), s"outlier must score higher: $r")
    assert(math.abs(r(1L) - r(2L)) < 1e-9) // same token multiset → same score
  }

  test("quality: repetitive and non-alpha docs are filtered") {
    val bad = Seq(
      (1L, "word word word word word word word word word word word word"),
      (2L, "1234 5678 !!!! ???? 0000 9999 #### $$$$ 1111 2222 3333 4444"),
      (3L, "a perfectly normal sentence with reasonable variety of distinct words here")
    ).toDF("doc_id", "text")
    val r = TextStats.qualityScore(bad, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getAs[Boolean]("keep")).toMap
    assert(!r(1L)) // distinct_ratio = 1/12 < 0.1
    assert(!r(2L)) // alpha_ratio ~ 0
    assert(r(3L))
  }

  test("token counts: whitespace vs BPE-ish on punctuated text") {
    val r = TextStats.tokenCounts(
      Seq((1L, "don't stop-me now! x2")).toDF("doc_id", "text"), "doc_id", "text")
      .head
    assert(r.getLong(1) === 4L) // ws: don't stop-me now! x2
    // bpe: don ' t stop - me now ! x 2 → 10
    assert(r.getLong(2) === 10L)
  }

  test("fingerprints: md5_norm invariant to case/punct, min-shingle robust to suffix edits") {
    val d = Seq(
      (1L, "The CAT sat on the mat, quietly watching birds outside!"),
      (2L, "the cat sat on the mat quietly watching birds outside"),
      (3L, "the cat sat on the mat quietly watching birds outside and then slept")
    ).toDF("doc_id", "text")
    val r = TextStats.fingerprints(d, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getString(2), x.getString(3)))).toMap
    assert(r(1L)._1 !== r(2L)._1) // raw md5 differs
    assert(r(1L)._2 === r(2L)._2) // normalized md5 identical
    assert(r(2L)._3 === r(3L)._3) // min-shingle hash survives the appended words
  }
}
