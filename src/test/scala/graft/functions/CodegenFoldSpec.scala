package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Equality laws for the round-15 codegen hot-path expressions: each
  * replaced an interpreted higher-order-function spelling, so the spec
  * pins BIT-IDENTICAL output against that original spelling on inputs
  * covering the edge algebra (empty arrays, overlapping merge pairs,
  * merged-token-contains-space, single-term folds, zero-length docs).
  */
class CodegenFoldSpec extends SparkTestBase {

  test("Bm25OkapiFold ≡ the interpreted aggregate() fold, bit for bit") {
    import spark.implicits._
    Bm25Functions.register(spark)
    // (terms[(tf, df)], dl, n_docs, avgdl) rows incl. empty terms and
    // extreme df (df = n_docs → negative idf operand inside log1p form)
    val rows = Seq(
      (Seq((3L, 5L), (1L, 99L)), 42L, 100L, 37.5),
      (Seq((1L, 1L)), 1L, 1L, 1.0),
      (Seq.empty[(Long, Long)], 7L, 10L, 3.0),
      (Seq((10L, 100L), (2L, 50L), (7L, 3L)), 250L, 100L, 55.25),
      (Seq((5L, 100L)), 9L, 100L, 10.0))
    val df = rows.toDF("raw", "dl", "n_docs", "avgdl")
      .select(expr("transform(raw, x -> struct(x._1 as tf, x._2 as df))")
        .as("terms"), col("dl"), col("n_docs"), col("avgdl"))
    val grid = Seq((600000L, 0L), (1200000L, 750000L), (2000000L, 1000000L))
    for ((k1m, bm) <- grid) {
      val k1 = lit(k1m) / lit(1e6)
      val b = lit(bm) / lit(1e6)
      val legacy = aggregate(col("terms"), lit(0.0), (acc, t) =>
        acc + log(lit(1.0) +
            (col("n_docs") - t.getField("df") + lit(0.5)) /
            (t.getField("df") + lit(0.5))) *
          (t.getField("tf") * (k1 + lit(1.0))) /
          (t.getField("tf") + k1 *
            (lit(1.0) - b + b * col("dl") / col("avgdl"))))
      val out = df.select(
        Bm25Functions.fold(col("terms"), col("dl"), col("n_docs"),
          col("avgdl"), lit(k1m), lit(bm)).as("fast"),
        legacy.as("slow")).collect()
      out.foreach { r =>
        // bit equality, not tolerance: the contract is identical doubles
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          s"fold mismatch at ($k1m, $bm): ${r.getDouble(0)} vs ${r.getDouble(1)}")
      }
    }
  }

  test("BpeMergePair ≡ the interpreted aggregate() merge fold") {
    import spark.implicits._
    val cases = Seq(
      Seq("a", "b", "c"),                 // one merge at the head
      Seq("a", "a", "a"),                 // overlap: no cascade
      Seq("x", "a", "b", "a", "b", "y"),  // two disjoint merges
      Seq("b", "a"),                      // wrong order: no merge
      Seq("a"),                           // single token
      Seq.empty[String],                  // empty doc
      Seq("a b", "a", "b"),               // token that IS the merged form
      Seq("a", "b", "b"))                 // merged token blocks re-merge
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks")
    def legacy(a: String, b: String) =
      aggregate(col("toks"), array().cast("array<string>"),
        (acc, t) => when(
          size(acc) > 0 && element_at(acc, -1) === lit(a) && t === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat_ws(" ", lit(a), lit(b)))))
          .otherwise(concat(acc, array(t))))
    for ((a, b) <- Seq(("a", "b"), ("a", "a"), ("a b", "a"))) {
      val out = df.select(col("id"),
          BpeMergeFn(col("toks"), lit(a), lit(b)).as("fast"),
          legacy(a, b).as("slow"))
        .collect()
      out.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"merge($a, $b) mismatch on case ${r.getLong(0)}: " +
            s"${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
      }
    }
  }
}
