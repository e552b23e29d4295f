package graft.dedup

import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextPrep

/** MLlib LSH interop (SURVEY.md §4.3 strategy 3): near-duplicate
  * detection through `org.apache.spark.ml.feature.MinHashLSH`'s
  * `approxSimilarityJoin` instead of the hand-rolled md5 banding in
  * [[Dedup]]. Bridges the engine's token pipeline into the MLlib
  * estimator/transformer stack (binary CountVectorizer → MinHashLSH).
  *
  * When to prefer which (also in SCALE.md):
  *  - '''md5 LSH''' ([[Dedup.lshCandidates]]): deterministic across
  *    engines (DuckDB-oracle-checkable), explicit band/row tuning,
  *    skew cap. The choice when results must be reproducible
  *    bit-for-bit or audited against another system.
  *  - '''MLlib MinHashLSH''': composes with the rest of the ML
  *    pipeline API (persistable models, Params, pipelines), does the
  *    candidate-join + EXACT keyDistance verification in one call, and
  *    its hash family is re-randomized per fit (seed param). The choice
  *    inside an MLlib feature pipeline or when operator fusion with
  *    other `ml` stages matters. Hash values differ from the md5
  *    scheme, so candidate SETS differ — both verify exactly, so
  *    precision is 1 either way; recall depends on table count.
  *
  * Scale shape: identical to the hand-rolled path — explode on hash
  * tables, shuffle on (table, hash), pair-join inside buckets, exact
  * distance only on candidates. `numHashTables` trades recall for
  * shuffle volume (OR-amplification).
  */
object MlLsh {

  /** Exact-verified near-dup pairs via MinHashLSH: (a, b, jaccard) with
    * a < b and jaccard ≥ minJaccard over distinct unigram token sets
    * (same tokenization as [[Dedup.tokenSets]]). Every returned pair's
    * jaccard is EXACT (MLlib re-scores candidates with the true key
    * distance); only recall is approximate.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double, numHashTables: Int = 8, seed: Long = 42L,
      vocabSize: Int = 1 << 22): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        array_distinct(array_remove(
          split(TextPrep.normalize(col(textCol)), " "), "")).as("toks"))
      .filter(size(col("toks")) > 0) // MinHashLSH rejects empty vectors
    // NB tokens beyond vocabSize (kept by corpus frequency) are dropped
    // from the vectors, so jaccard is computed over the RETAINED
    // vocabulary — raise vocabSize if exactness over the full token set
    // matters on a very-high-cardinality corpus.
    val cv = new CountVectorizer()
      .setInputCol("toks").setOutputCol("features").setBinary(true)
      .setVocabSize(vocabSize)
      .fit(toks)
    val feats = cv.transform(toks).select(col("id"), col("features"))
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
      .fit(feats)
    // approxSimilarityJoin filters STRICTLY (dist < threshold); nextUp
    // keeps boundary pairs, then the exact >= contract is applied on the
    // re-scored jaccard — matching Dedup's >= threshold semantics.
    lsh.approxSimilarityJoin(feats, feats,
        math.nextUp(1.0 - minJaccard), "jaccard_dist")
      .select(col("datasetA.id").as("a"), col("datasetB.id").as("b"),
        round(lit(1.0) - col("jaccard_dist"), 6).as("jaccard"))
      .filter(col("a") < col("b") && col("jaccard") >= minJaccard)
  }
}
