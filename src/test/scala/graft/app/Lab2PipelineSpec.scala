package graft.app

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

class Lab2PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val papersPath =
    getClass.getResource("/papers.jsonl").getPath
  private lazy val stopwords =
    scala.io.Source.fromResource("stopwords.txt").getLines().map(_.trim)
      .filter(_.nonEmpty).toSeq
  private lazy val result = Lab2Pipeline.run(spark, papersPath, stopwords)

  test("papers fixture reads with explicit schema; edge rows present") {
    val papers = Lab2Pipeline.readPapers(spark, papersPath)
    assert(papers.count() === 103)
    assert(papers.filter($"abstract" === "").count() === 1)
  }

  test("accuracy is high (titles are drawn from their own abstracts) and in [0,1]") {
    val acc = result.accuracy.head
    val a = acc.getDouble(0)
    assert(a >= 0.0 && a <= 1.0)
    assert(a >= 0.8, s"self-retrieval should be strong, got $a")
    // the empty-abstract paper cannot be retrieved → its title still
    // matches SOMETHING or is dropped; n <= 103
    assert(acc.getLong(1) <= 103L)
  }

  test("matches: exactly one row per title, cosine in [0,1]") {
    val m = result.matches
    assert(m.groupBy($"title_id").count().filter($"count" > 1).count() === 0)
    val bounds = m.agg(min($"cosine"), max($"cosine")).head
    assert(bounds.getDouble(0) >= -1e-9 && bounds.getDouble(1) <= 1.0 + 1e-9)
  }

  test("cosine tie resolves deterministically to the lower abstract id") {
    // p_tie_a / p_tie_b have identical abstracts; both titles share the
    // word 'twin'/'duplicate' → their best-match cosine against either
    // abstract is equal, so the declared tie-break picks p_tie_a.
    val m = result.matches.filter($"title_id".isin("p_tie_a", "p_tie_b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("p_tie_a") === "p_tie_a")
    assert(m("p_tie_b") === "p_tie_a") // tie → lowest id, deterministic
  }

  test("empty-abstract paper: title with unseen words still scores (J2 df=0) or drops cleanly") {
    // p_empty's abstract is empty → no abstract vector. Its title words
    // appear in no abstract → zero overlap → no candidate rows → title
    // absent from matches (documented drop semantics, no crash).
    val m = result.matches.filter($"title_id" === "p_empty").count()
    assert(m === 0)
  }

  test("category matrix: symmetric with unit diagonal") {
    val wide = result.categoryMatrix.collect()
    val names = result.categoryMatrix.schema.fieldNames.drop(1)
    val byRow = wide.map(r => r.getString(0) -> names.zipWithIndex
      .map { case (c, i) => c -> r.getDouble(i + 1) }.toMap).toMap
    names.foreach { c =>
      assert(math.abs(byRow(c)(c) - 1.0) < 1e-5, s"diagonal $c")
      names.foreach { d =>
        assert(math.abs(byRow(c)(d) - byRow(d)(c)) < 1e-9, s"symmetry $c,$d")
      }
    }
  }

  test("pipeline runs with the rule-based lemmatizer plugged in (U2 pluggability)") {
    val r = Lab2Pipeline.run(spark, papersPath, stopwords,
      lemmatizer = graft.text.RuleLemmatizer)
    val acc = r.accuracy.head.getDouble(0)
    // lemmatization folds word forms; retrieval should stay strong
    assert(acc >= 0.8, s"rule-lemmatized accuracy degraded: $acc")
    assert(r.matches.count() > 0)
  }

  test("pipeline runs with the POS-aware lemmatizer (U1 tag->lemmatize shape)") {
    val r = Lab2Pipeline.run(spark, papersPath, stopwords,
      lemmatizer = graft.text.PosAwareLemmatizer)
    val acc = r.accuracy.head.getDouble(0)
    assert(acc >= 0.8, s"POS-lemmatized accuracy degraded: $acc")
    assert(r.matches.count() > 0)
  }

  test("mismatch sample has at most 5 enriched rows") {
    val s = result.mismatchSample.collect()
    assert(s.length <= 5)
    s.foreach { r =>
      assert(r.getAs[String]("title") != null)
      assert(r.getAs[String]("matched_abstract") != null)
    }
  }
}

/** ScalaCheck-generated invariants over random micro-corpora
  * (SURVEY.md §5.2). Deterministic seeds — each test draws a fixed set
  * of corpora from Gen.
  */
class TfIdfPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private val docGen = for {
    n <- Gen.choose(1, 8)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")
  private val corpusGen = Gen.listOfN(6, docGen)

  private def corpora(count: Int): Seq[List[String]] =
    (0 until count).flatMap(i => corpusGen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: normalized vectors have unit L2 norm; cosine(v,v)=1") {
    corpora(5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (s"d$i", t) }.toDF("id", "text")
      val vecs = graft.tfidf.TfIdf.vectorize(df, "id", "text", stopwords = Nil)
      val norms = vecs.groupBy($"id").agg(sum($"w" * $"w").as("n2"))
        .collect().map(_.getDouble(1))
      val sims = graft.similarity.Similarity.invertedIndexJoin(vecs, vecs)
        .filter($"l_id" === $"r_id").collect().map(_.getDouble(2))
      assert(norms.forall(n2 => math.abs(n2 - 1.0) < 1e-9), s"norms for $texts")
      assert(sims.forall(s => math.abs(s - 1.0) < 1e-9), s"self-cos for $texts")
    }
  }

  test("property: cosine is symmetric and within [0,1] for nonneg weights") {
    corpora(5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (s"d$i", t) }.toDF("id", "text")
      val vecs = graft.tfidf.TfIdf.vectorize(df, "id", "text", stopwords = Nil)
      val sims = graft.similarity.Similarity.invertedIndexJoin(vecs, vecs)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      val m = sims.map { case (a, b, s) => (a, b) -> s }.toMap
      sims.foreach { case (a, b, s) =>
        assert(s >= -1e-9 && s <= 1.0 + 1e-9, s"range $a,$b for $texts")
        assert(math.abs(m((b, a)) - s) < 1e-9, s"symmetry $a,$b for $texts")
      }
    }
  }
}
