package graft.tfidf

import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, IDF, Normalizer}
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib fast-path TF-IDF (SURVEY.md M3): CountVectorizer → IDF →
  * Normalizer over a token-array column, producing `ml.linalg`
  * SparseVectors for MLlib interop (MinHashLSH,
  * BucketedRandomProjectionLSH, clustering, …).
  *
  * NOT numerically equal to the reference formula ([[TfIdf]]):
  * MLlib IDF is `ln((n+1)/(df+1))` with raw TF — no sublinear TF, no
  * +1 IDF floor, natural log (lab2.py:175–189 uses the sklearn-style
  * base-10 form). Use this path when throughput + MLlib composition
  * matter and exact reference numerics don't; ranking quality is
  * comparable (specs assert self-retrieval parity on the fixture).
  */
object MlTfIdf {

  case class Model(cv: CountVectorizerModel, transform: DataFrame => DataFrame)

  /** Fit vocabulary + IDF on `tokensCol` and return a transformer
    * appending `features` (L2-normalized SparseVector).
    */
  def fit(df: DataFrame, tokensCol: String, vocabSize: Int = 1 << 18): Model = {
    val cv = new CountVectorizer()
      .setInputCol(tokensCol).setOutputCol("tf_vec").setVocabSize(vocabSize)
      .fit(df)
    // fit the IDF ONCE on the training corpus; the returned transform
    // reuses that IDFModel so applying the model to a different corpus
    // scores with the TRAINING document frequencies (fit/transform
    // contract), not the new corpus's.
    val idfModel = new IDF().setInputCol("tf_vec").setOutputCol("tfidf_vec")
      .fit(cv.transform(df))
    val norm = new Normalizer().setInputCol("tfidf_vec").setOutputCol("features").setP(2.0)
    val transformAll = (in: DataFrame) =>
      norm.transform(idfModel.transform(cv.transform(in))).drop("tf_vec", "tfidf_vec")
    Model(cv, transformAll)
  }

  /** Explode a fitted SparseVector column back to the long relational
    * form (id, word, w) — bridges the MLlib path into the engine's
    * similarity operators.
    */
  def toLongForm(df: DataFrame, idCol: String, vocab: Array[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocabDf = broadcast(vocab.zipWithIndex.map(_.swap).toSeq.toDF("idx", "word"))
    df.select(col(idCol).as("id"), col("features"))
      .as[(Long, SparseVector)]
      .flatMap { case (id, v) => v.indices.zip(v.values).map { case (i, w) => (id, i, w) } }
      .toDF("id", "idx", "w")
      .join(vocabDf, Seq("idx"))
      .select(col("id"), col("word"), col("w"))
  }
}
