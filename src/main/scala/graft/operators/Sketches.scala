package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate operators — the 100 TB counterparts of the
  * exact oracle-gated forms. Exact answers (q11 distinct counts, q34
  * percentiles) need full shuffles or sorts; these bound memory and
  * shuffle at a declared error:
  *
  *  - HyperLogLog++ distinct counts (`approx_count_distinct`): fixed
  *    sketch size per group, mergeable partial aggregation.
  *  - GK/relative-error quantiles (`percentile_approx`): bounded
  *    buffer, no per-group sort.
  *  - Count-min heavy hitters: sublinear frequency sketch, driver-side
  *    merge (the sketch, not the data, is collected).
  *  - Bloom-filter semi-join pruning: filter the BIG side before its
  *    shuffle with a compact membership sketch of the small side's
  *    keys. No false negatives — never drops a real match; false
  *    positives only cost wasted shuffle rows at rate `fpp`. (Spark's
  *    own runtime bloom join filters — conf
  *    `spark.sql.optimizer.runtime.bloomFilter.enabled` — are the
  *    declarative form; this utility is the explicit handle.)
  *
  * None are DuckDB-oracle-gated (sketch internals differ across
  * engines); each is spec-gated against its exact counterpart with the
  * sketch's own error bound.
  */
object Sketches {

  /** Approximate distinct values of `valueCol` per `keyCol`
    * (HyperLogLog++, default rsd 5%).
    */
  def approxDistinctPerKey(df: DataFrame, keyCol: String, valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(col(keyCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Approximate percentiles per group (GK sketch; `accuracy` trades
    * memory for error ≤ 1/accuracy relative rank).
    */
  def approxQuantilesPerKey(df: DataFrame, keyCol: String, valueCol: String,
      probabilities: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val probsExpr = probabilities.mkString("array(", ", ", ")")
    df.groupBy(col(keyCol))
      .agg(expr(s"percentile_approx($valueCol, $probsExpr, $accuracy)").as("quantiles"))
  }

  /** Heavy hitters via count-min sketch: estimated counts for the
    * values whose estimate clears `minCount`. The CMS is built
    * distributed (mergeable partial sketches) and only the sketch comes
    * to the driver; candidate values are taken from a distinct pass.
    * CMS never underestimates, so no true heavy hitter is missed.
    */
  def heavyHitters(df: DataFrame, valueCol: String, minCount: Long,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cms = df.stat.countMinSketch(valueCol, eps, confidence, seed)
    val candidates = df.select(col(valueCol).cast("string")).distinct()
      .as[String].collect()
    candidates.map(v => (v, cms.estimateCount(v)))
      .filter(_._2 >= minCount)
      .toSeq.toDF(valueCol, "est_count")
  }

  /** Prune `big` down to rows whose `keyCol` is (probably) present in
    * `small`'s `keyCol` set, using a broadcast Bloom filter. Guarantees
    * every true match survives; expect ~fpp of non-matching rows to
    * leak through (they fall out in the real join).
    */
  def bloomPrune(big: DataFrame, small: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val spark = big.sparkSession
    val bf = small.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val contains = udf((k: Long) => k != null && bc.value.mightContainLong(k))
    big.filter(contains(col(keyCol).cast("long")))
  }
}
