package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (builder-prompt scale checklist: "skewed
  * keys → salting or AQE skew-join").
  *
  * AQE's skew-join handles SORT-MERGE skew by splitting oversized
  * partitions, but it cannot help when one HOT KEY's rows must still
  * meet every matching row (it splits the partition, not the key's
  * hash target). Salting fixes that shape: the skewed side scatters
  * each hot key across `saltBuckets` sub-keys, the small side is
  * replicated once per bucket, and the join key becomes (key, salt) —
  * the hot key's work now spreads over `saltBuckets` tasks.
  *
  * Cost model: replicates the SMALL side ×saltBuckets through the
  * shuffle — use when |small| × saltBuckets ≪ the hot partition it
  * dissolves (the classic fact-to-dimension skew shape).
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Salted equi-join: `skewed` ⋈ `small` on `keys`, with the skewed
    * side scattered over `saltBuckets` sub-partitions per key.
    *
    * Result-identical to `skewed.join(small, keys, joinType)`: every
    * skewed-side row carries exactly ONE salt value, and the small side
    * holds exactly one copy of each row per salt value, so each
    * (skewed-row, small-row) pair meets exactly once.
    *
    * Salt is a deterministic hash of the whole skewed row (not rand()):
    * re-computation under task retry yields the same assignment, which
    * speculative execution and result re-use require. Identical full
    * rows hash to the same bucket — harmless for correctness and only
    * affects spread if the hot key's rows are ALSO byte-identical.
    *
    * `joinType` is restricted to inner/left variants: a right/full
    * outer would emit the small side's unmatched rows once per salt.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    // an input column named like the internal salt would be silently
    // overwritten by withColumn and then joined on — fail loudly instead
    require(!(skewed.columns ++ small.columns).exists(_.equalsIgnoreCase(SaltCol)),
      s"saltedJoin: column name $SaltCol is reserved for the internal salt")
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins, got $joinType " +
        "(outer-preserving the replicated side would duplicate its unmatched rows)")
    val l = skewed.withColumn(SaltCol,
      pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(saltBuckets.toLong)))
    val r = small.withColumn(SaltCol,
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Hot-key-only salting: [[saltedJoin]] replicates the small side
    * ×saltBuckets for EVERY key — wasteful when skew lives in a few hot
    * keys atop a long tail (the usual shape). This variant detects hot
    * keys from a seeded SAMPLE of the skewed side, salts ONLY them, and
    * joins the cold remainder plainly; the two halves union.
    *
    * Cost model (SCALE.md): plain salting shuffles |small|×saltBuckets
    * replica rows; this shuffles |small∩hot|×saltBuckets + |small| and
    * adds one sampling pass over the skewed side — the win grows with
    * the tail/hot ratio. Detection is an OPTIMIZATION, never a
    * correctness input: a missed hot key just joins (correctly) on the
    * cold path, a false positive just salts (correctly) a mild key —
    * property-tested equivalent to the plain join either way.
    *
    * `minSampledCount` is the hotness cut in SAMPLED rows: a key
    * sampled ≥ minSampledCount times has estimated true frequency
    * ≥ minSampledCount / sampleFraction. The sample is seeded and the
    * per-branch split is a semi/anti pair on the same broadcast key
    * set, so retries see the same partition of the data.
    */
  def saltedJoinHotKeys(skewed: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int, sampleFraction: Double = 0.01,
      minSampledCount: Long = 100L, joinType: String = "inner",
      seed: Long = 42L): DataFrame = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    require(minSampledCount > 0, "minSampledCount must be positive")
    val hotKeys = broadcast(
      skewed.select(keys.map(col): _*)
        .sample(withReplacement = false, sampleFraction, seed)
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__graft_hot_n"))
        .filter(col("__graft_hot_n") >= minSampledCount)
        .drop("__graft_hot_n"))
    val skewedHot = skewed.join(hotKeys, keys, "left_semi")
    val skewedCold = skewed.join(hotKeys, keys, "left_anti")
    // the hot branch replicates only the small rows matching hot keys
    val smallHot = small.join(hotKeys, keys, "left_semi")
    saltedJoin(skewedHot, smallHot, keys, saltBuckets, joinType)
      .unionByName(skewedCold.join(small, keys, joinType))
  }
}
