package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SynthDocsSpec extends SparkTestBase {
  import spark.implicits._

  private def read(rows: Long, parts: Int = 4): DataFrame =
    spark.read.format("graft.sources.SynthDocs")
      .option("rows", rows).option("numPartitions", parts).load()

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("reads the declared row count, deterministic across partitionings") {
    val dfA = read(1000, parts = 4)
    val dfB = read(1000, parts = 7)
    // the numPartitions option must actually reach the planner (it
    // arrives in ORIGINAL case — a lowercase lookup silently defaults)
    assert(dfA.rdd.getNumPartitions === 4)
    assert(dfB.rdd.getNumPartitions === 7)
    val a = dfA.collect().map(_.toString).sorted
    val b = dfB.collect().map(_.toString).sorted
    assert(a.length === 1000)
    assert(a.toSeq === b.toSeq)
  }

  test("column pruning reaches the source (ReadSchema excludes text)") {
    val df = read(100).select($"doc_id", $"lang")
    val p = formatted(df)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), p)
    assert(!p.contains("text:string"), "text must not be generated")
    assert(df.count() === 100)
  }

  test("doc_id range filters push into the source and prune partitions") {
    val df = read(100000, parts = 16).filter($"doc_id" >= 90000 && $"doc_id" < 90100)
    // both filters are FULLY handled by the source (returned as pushed,
    // not as rest), so no Filter node remains above the scan — which
    // makes the count a genuine pruning gate: had the source ignored
    // the range, count() would be 100000
    val p = formatted(df)
    assert(!p.contains("(2) Filter"), s"filters must be fully pushed:\n$p")
    assert(df.count() === 100)
    assert(df.agg(min($"doc_id"), max($"doc_id")).head.toSeq === Seq(90000L, 90099L))
  }

  test("open upper bound Long.MaxValue does not overflow the pushed range") {
    val df = read(1000).filter($"doc_id" <= Long.MaxValue)
    assert(df.count() === 1000)
  }

  test("equality pushdown yields a single-row scan") {
    val df = read(100000).filter($"doc_id" === 12345L)
    assert(df.count() === 1)
    assert(df.head.getLong(0) === 12345L)
  }

  test("generated content flows into engine operators (tokenize + tf)") {
    val tf = graft.tfidf.TfIdf.termFreq(
      graft.tfidf.TfIdf.tokens(read(500), "doc_id", "text", stopwords = Nil))
    assert(tf.count() > 0)
    // vocabulary is the synthetic word list: every token is from it
    val words = tf.select($"word").distinct().as[String].collect().toSet
    assert(words.forall(_.matches("[a-z]+")))
  }
}
