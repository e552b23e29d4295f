package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MlLshSpec extends SparkTestBase {
  import spark.implicits._

  private val MinJ = 0.7

  test("MinHashLSH near-dups: exact precision, high recall vs brute-force truth") {
    val docs = graft.Tables.documents(spark, sf001)
    // ground truth: exact all-pairs jaccard over the same token sets
    val toks = Dedup.tokenSets(docs, "doc_id", "text")
    val truth = Dedup.allPairsJaccard(toks, MinJ)
      .select($"a", $"b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)

    val got = MlLsh.nearDupPairs(docs, "doc_id", "text", MinJ, numHashTables = 8)
      .select($"a", $"b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // precision 1.0: approxSimilarityJoin verifies candidates with the
    // EXACT key distance, so every returned pair is a true near-dup
    assert(got.subsetOf(truth),
      s"false positives: ${(got -- truth).take(5)}")
    // recall: OR-amplified over 8 tables; on this corpus nearly all true
    // pairs collide somewhere
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall (|got|=${got.size}, |truth|=${truth.size})")
  }

  test("MinHashLSH candidates overlap the md5-banding candidates (interop sanity)") {
    val docs = graft.Tables.documents(spark, sf001)
    val q16Pairs = graft.operators.DedupQueries.q16LshNearDups(spark, sf001)
      .select($"a", $"b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mlPairs = MlLsh.nearDupPairs(docs, "doc_id", "text", MinJ, numHashTables = 8)
      .select($"a", $"b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both are exact-verified at the same threshold; their intersection
    // should dominate either side. Asymmetry is expected: 8 single-row
    // OR-amplified tables (MLlib) recall more than 3 bands × 4 rows
    // (md5), so q16-within-ml sits a little lower (~0.79 on this
    // corpus) than ml-within-q16.
    val inter = (q16Pairs intersect mlPairs).size.toDouble
    assert(inter / q16Pairs.size >= 0.8)
    assert(inter / mlPairs.size >= 0.75)
  }
}
