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
}
