package graft.tfidf

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.similarity.Similarity

/** Hand-computed goldens on the 3-doc micro-corpus (FIXTURES.md §2). */
class TfIdfSpec extends SparkTestBase {
  import spark.implicits._

  // abstracts
  private lazy val docs = Seq(
    ("d1", "cat sat mat", "cat mat"),
    ("d2", "cat cat dog", "dog"),
    ("d3", "bird", "bird song")).toDF("id", "abstract", "title")

  private val eps = 1e-9
  // formula constants, n = 3 (lab2.py:187–189)
  private val idfCat   = math.log10(4.0 / 3.0) + 1.0  // df=2
  private val idfRare  = math.log10(4.0 / 2.0) + 1.0  // df=1
  private val idfMissing = math.log10(4.0 / 1.0) + 1.0 // df=0 (J2 path)
  private val tf2      = 1.0 + math.log10(2.0)

  test("abstract TF-IDF weights match hand-derived values") {
    val vecs = TfIdf.vectorize(docs, "id", "abstract", stopwords = Nil)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap

    val d1norm = math.sqrt(idfCat * idfCat + 2 * idfRare * idfRare)
    assert(math.abs(vecs(("d1", "cat")) - idfCat / d1norm) < eps)
    assert(math.abs(vecs(("d1", "sat")) - idfRare / d1norm) < eps)

    val d2norm = math.sqrt(tf2 * idfCat * tf2 * idfCat + idfRare * idfRare)
    assert(math.abs(vecs(("d2", "cat")) - tf2 * idfCat / d2norm) < eps)

    assert(math.abs(vecs(("d3", "bird")) - 1.0) < eps) // single-term vector
  }

  test("title vectors vs abstract corpus: df=0 smoothing for unseen words (J2)") {
    val absToks = TfIdf.tokens(docs, "id", "abstract", stopwords = Nil)
    val titleToks = TfIdf.tokens(docs, "id", "title", stopwords = Nil)
    val w = TfIdf.weights(TfIdf.termFreq(titleToks), TfIdf.docFreq(absToks), 3, external = true)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // "song" never occurs in abstracts → df=0 → idf = log10(4/1)+1
    assert(math.abs(w(("d3", "song")) - idfMissing) < eps)
    assert(math.abs(w(("d3", "bird")) - idfRare) < eps)
  }

  test("task-1 chain on micro-corpus: every title retrieves its own abstract") {
    val absToks = TfIdf.tokens(docs, "id", "abstract", stopwords = Nil)
    val absVecs = TfIdf.l2Normalize(
      TfIdf.weights(TfIdf.termFreq(absToks), TfIdf.docFreq(absToks), 3))
    val titleToks = TfIdf.tokens(docs, "id", "title", stopwords = Nil)
    val titleVecs = TfIdf.l2Normalize(
      TfIdf.weights(TfIdf.termFreq(titleToks), TfIdf.docFreq(absToks), 3, external = true))
    val best = Similarity.argmax(Similarity.invertedIndexJoin(titleVecs, absVecs)).collect()
    assert(best.length === 3)
    best.foreach(r => assert(r.getString(0) === r.getString(1)))
    val acc = Similarity.accuracy(
      Similarity.argmax(Similarity.invertedIndexJoin(titleVecs, absVecs)))
      .head.getDouble(0)
    assert(acc === 1.0)
  }

  test("all normalized vectors have unit L2 norm") {
    val norms = TfIdf.vectorize(docs, "id", "abstract", stopwords = Nil)
      .groupBy($"id").agg(sum($"w" * $"w").as("n2")).collect()
    norms.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < eps))
  }

  test("empty documents are dropped, not crashed on (SURVEY.md §2.10.9)") {
    val withEmpty = Seq(("e1", "cat dog"), ("e2", ""), ("e3", "the the")).toDF("id", "text")
    val vecs = TfIdf.vectorize(withEmpty, "id", "text") // default stopwords drop "the"
    assert(vecs.select($"id").distinct().as[String].collect().toSet === Set("e1"))
  }
}
