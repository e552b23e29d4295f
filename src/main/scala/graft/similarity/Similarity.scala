package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity join + downstream reductions (SURVEY.md §2.6 J3–J5, §2.5
  * A8–A9/A11, §4.3).
  *
  * The reference's physical plan for "similarity join" is an RDD
  * `cartesian` (lab2.py:227, 291) — O(n²) pairs, each scored in Python.
  * This engine's default strategy is the '''exact sparse inverted-index
  * join''': vectors stay in long form `(id, word, w)`, an equi-join on
  * `word` generates exactly the pairs with nonzero term overlap, and a
  * grouped `sum(wL*wR)` is the dot product (= cosine, since inputs are
  * L2-normalized). Mathematically identical to the cartesian for
  * argmax/threshold consumers — zero-overlap pairs score 0 and can never
  * win (SURVEY.md J3).
  *
  * Scale: the join shuffles on `word`, the pair aggregation on
  * (l_id, r_id) — both partial-aggregated. The known hazard is term skew
  * (stop-list-surviving words present in most documents make near-
  * quadratic groups); [[pruneHighDf]] caps document frequency, the
  * standard inverted-index mitigation (cf. prefix-filtering literature).
  * A broadcast-cartesian strategy ([[crossJoinDot]]) remains for small
  * sides (Task-2 matrices), and MinHash LSH (graft.dedup) is the
  * approximate path at 100 TB.
  */
object Similarity {

  /** Exact inverted-index similarity join between two long-form vector
    * tables with columns (id, word, w). Returns (l_id, r_id, sim) for all
    * pairs with nonzero overlap.
    */
  def invertedIndexJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("id").as("l_id"), col("word"), col("w").as("l_w"))
    val r = right.select(col("id").as("r_id"), col("word"), col("w").as("r_w"))
    l.join(r, Seq("word"))
      .groupBy(col("l_id"), col("r_id"))
      .agg(sum(col("l_w") * col("r_w")).as("sim"))
  }

  /** DF-based candidate pruning for skewed vocabularies: drop terms that
    * appear in more than `maxDfFraction` of documents before the join
    * (they contribute near-uniform similarity mass at quadratic cost).
    * Exact results require maxDfFraction = 1.0; production similarity
    * search at scale runs 0.05–0.2.
    */
  def pruneHighDf(vectors: DataFrame, nDocs: Long, maxDfFraction: Double): DataFrame = {
    val df = vectors.groupBy(col("word"))
      .agg(countDistinct(col("id")).as("word_df"))
      .filter(col("word_df") <= lit(maxDfFraction * nDocs))
      .select(col("word"))
    vectors.join(broadcast(df), Seq("word"), "left_semi")
  }

  /** Broadcast-cartesian strategy (SURVEY.md §4.3 strategy 2): dot product
    * of two map-typed vector columns. For small sides only (e.g. the
    * category×category matrix); the map arithmetic runs as one codegen'd
    * expression, no shuffle beyond the broadcast.
    */
  def mapDot(a: Column, b: Column): Column =
    aggregate(map_entries(a), lit(0.0),
      (acc, e) => acc + e.getField("value") * coalesce(element_at(b, e.getField("key")), lit(0.0)))

  /** Cross-join similarity over assembled map vectors: (l_id, r_id, sim)
    * for ALL pairs including zero-overlap ones (complete-matrix semantics,
    * SURVEY.md J4).
    */
  def crossJoinDot(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("id").as("l_id"), col("vec").as("l_vec"))
    val r = right.select(col("id").as("r_id"), col("vec").as("r_vec"))
    l.crossJoin(broadcast(r))
      .select(col("l_id"), col("r_id"), mapDot(col("l_vec"), col("r_vec")).as("sim"))
  }

  /** A8 generalized: top-k rows per `keyCol` by (simCol desc, tieCol asc).
    * Deterministic where the reference's reduce-based argmax is shuffle-
    * order-dependent under ties (SURVEY.md §2.10.4).
    */
  def topK(sims: DataFrame, k: Int, keyCol: String = "l_id",
      simCol: String = "sim", tieCol: String = "r_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(simCol).desc, col(tieCol).asc)
    sims.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** A8: argmax — best match per left id. */
  def argmax(sims: DataFrame): DataFrame = topK(sims, 1).drop("rk")

  /** A9: self-retrieval accuracy — fraction of rows where the matched id
    * equals the query id (lab2.py:253–260).
    */
  def accuracy(matches: DataFrame, leftCol: String = "l_id", rightCol: String = "r_id"): DataFrame =
    matches.agg(
      round(avg(when(col(leftCol) === col(rightCol), 1.0).otherwise(0.0)), 6).as("accuracy"),
      count(lit(1)).as("n"))
}
