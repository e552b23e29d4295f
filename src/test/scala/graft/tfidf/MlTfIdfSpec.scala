package graft.tfidf

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.Similarity
import graft.text.TextPrep

class MlTfIdfSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val papersPath = getClass.getResource("/papers.jsonl").getPath

  test("MLlib fast path: fit/transform produces unit-norm sparse vectors") {
    val docs = graft.app.Lab2Pipeline.readPapers(spark, papersPath)
      .select($"id", TextPrep.filteredTokensCol($"abstract").as("toks"))
    val model = MlTfIdf.fit(docs, "toks")
    val out = model.transform(docs)
    assert(out.schema.fieldNames.contains("features"))
    val norms = out.select($"features").collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector](0))
      .map(v => math.sqrt(v.toArray.map(x => x * x).sum))
    // empty docs give zero vectors; all others must be unit norm
    norms.filter(_ > 0).foreach(n => assert(math.abs(n - 1.0) < 1e-9))
  }

  test("MLlib path self-retrieval parity with the reference formula on the fixture") {
    val papers = graft.app.Lab2Pipeline.readPapers(spark, papersPath)
      .withColumn("nid", monotonically_increasing_id())
    val absToks = papers.select($"nid", TextPrep.filteredTokensCol($"abstract").as("toks"))
      .filter(size($"toks") > 0)
    val titleToks = papers.select($"nid", TextPrep.filteredTokensCol($"title").as("toks"))
      .filter(size($"toks") > 0)
    val model = MlTfIdf.fit(absToks, "toks")
    val absLong = MlTfIdf.toLongForm(
      model.transform(absToks).withColumnRenamed("nid", "id"), "id", model.cv.vocabulary)
    val titleLong = MlTfIdf.toLongForm(
      model.transform(titleToks).withColumnRenamed("nid", "id"), "id", model.cv.vocabulary)
    val best = Similarity.argmax(Similarity.invertedIndexJoin(titleLong, absLong))
    val acc = Similarity.accuracy(best).head.getDouble(0)
    // reference-formula accuracy on this fixture is ~0.99; the MLlib
    // formula ranks comparably
    assert(acc >= 0.9, s"MLlib-path self-retrieval accuracy too low: $acc")
  }

  test("fitted model reuses TRAINING document frequencies on new corpora") {
    val train = Seq(
      (1L, Seq("alpha", "beta")), (2L, Seq("alpha", "gamma")),
      (3L, Seq("alpha", "beta", "delta"))).toDF("id", "toks")
    val other = Seq((10L, Seq("alpha", "beta"))).toDF("id", "toks")
    val model = MlTfIdf.fit(train, "toks")
    def vec(df: org.apache.spark.sql.DataFrame) = model.transform(df)
      .filter($"id" === 10L || $"id" === 1L)
      .select($"features").head.getAs[org.apache.spark.ml.linalg.Vector](0)
    // same token multiset → identical vector regardless of which corpus
    // it is scored in: the IDF model must NOT be re-fit on `other`
    // (where alpha/beta df=1 would reweight everything)
    val inTrain = vec(train.filter($"id" === 1L))
    val inOther = vec(other)
    assert(inTrain === inOther,
      s"transform re-fit IDF on the new corpus: $inTrain vs $inOther")
  }

  test("float_dot/double_dot raise on dimension mismatch (no silent truncation)") {
    graft.functions.VectorFunctions.register(spark)
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.functions.VectorFunctions.dot($"a", $"b")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("dimension mismatch"))),
      e.toString)
  }

  test("extension wiring registers; float_dot usable from plain SQL") {
    // the injectFunction wiring itself (what spark.sql.extensions would
    // invoke at session build):
    new graft.GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions)
    // and the registered expression drives through the SQL surface:
    val s2 = spark.newSession()
    graft.functions.VectorFunctions.register(s2)
    s2.range(1).createOrReplaceTempView("one")
    val r = s2.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d FROM one")
      .head.getDouble(0)
    assert(r === 11.0)
  }
}
