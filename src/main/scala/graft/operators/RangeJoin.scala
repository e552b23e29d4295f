package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable point-in-interval RANGE JOIN (builder-prompt operator
  * family; cf. the bucketed range-join optimization in public engine
  * docs — e.g. Databricks' range join hints and the interval-bucketing
  * literature).
  *
  * The naive formulation `points JOIN intervals ON start <= p AND
  * p < end` has no equi-key, so Spark plans a BroadcastNestedLoopJoin —
  * O(|points|·|intervals|) comparisons and a broadcast of one whole
  * side; at 100 TB that is the plan that never finishes. The bucketed
  * form makes it an equi-join: quantize time into `bucketMs` buckets,
  * give each point its ONE bucket, explode each interval into the
  * buckets it covers, hash-join on bucket, and re-check the exact
  * predicate on the survivors. Cost: |points| + Σ(interval spans) join
  * rows, shuffled on bucket — linear, partition-parallel, AQE-skew-
  * splittable.
  *
  * Each (point, interval) pair meets EXACTLY once (a point has one
  * bucket), so no dedup is needed. Pick `bucketMs` ≈ the median
  * interval length: too small explodes intervals into many buckets,
  * too large funnels everything into few buckets (skew).
  */
object RangeJoin {

  private val Bkt = "__graft_bucket"

  /** Contract check shared by both joins: the left-side range columns,
    * right-side range columns, and equi-keys must be pairwise distinct
    * names (case-insensitively — Spark's default resolver is), and no
    * column of EITHER input may collide with the internal bucket column
    * (withColumn would silently overwrite it). */
  private def requireDistinctCols(op: String, left: DataFrame, leftCols: Seq[String],
      right: DataFrame, rightCols: Seq[String], keys: Seq[String]): Unit = {
    val all = leftCols ++ rightCols ++ keys
    val dups = all.groupBy(_.toLowerCase).collect { case (_, vs) if vs.size > 1 => vs.head }
    require(dups.isEmpty,
      s"$op: range/key column names must be pairwise distinct across both " +
        s"inputs (rename one side before joining); duplicated: ${dups.mkString(", ")}")
    require(!(left.columns ++ right.columns).exists(_.equalsIgnoreCase(Bkt)),
      s"$op: column name $Bkt is reserved for the internal bucket column")
  }

  /** Join each point row to every interval row whose
    * `[startCol, endCol)` contains `ptCol` (end exclusive). Timestamp
    * columns; all other columns of both inputs are preserved.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketMs: Long, maxSpanBuckets: Long = 100000L): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    // both inputs' columns coexist after the join, so the point column
    // and the interval columns must not collide (a shared name would
    // surface as an ambiguous-reference AnalysisException deep inside
    // the join filter instead of a contract error here)
    requireDistinctCols("pointInInterval", points, Seq(ptCol),
      intervals, Seq(startCol, endCol), Nil)
    val p = points.withColumn(Bkt, floor(unix_millis(col(ptCol)) / bucketMs))
    val startBkt = floor(unix_millis(col(startCol)) / bucketMs)
    val endBkt = floor(unix_millis(col(endCol)) / bucketMs)
    // fail fast on pathological intervals (open-ended sentinels like
    // 9999-12-31 would ask sequence() for tens of millions of elements
    // in ONE row) instead of OOMing the task mid-job. Inverted intervals
    // (end < start, e.g. a 1970 sentinel end) are just as dangerous the
    // other way: their span is negative — it passes a one-sided span
    // check, and sequence(start, stop) with stop < start counts DOWN,
    // generating |span|+1 elements. No point can satisfy
    // start <= p < end when end < start, so such rows are dropped
    // (explode of the null branch), matching the exact predicate.
    val guardedEnd = when(endBkt - startBkt <= maxSpanBuckets, endBkt)
      .otherwise(raise_error(concat(
        lit(s"pointInInterval: interval spans more than $maxSpanBuckets buckets "),
        lit("(start="), col(startCol).cast("string"),
        lit(", end="), col(endCol).cast("string"),
        lit(s", bucketMs=$bucketMs); raise bucketMs or maxSpanBuckets, or clamp the interval"))))
    val iv = intervals.withColumn(Bkt,
      explode(when(endBkt >= startBkt, sequence(startBkt, guardedEnd))))
    p.join(iv, Seq(Bkt))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop(Bkt)
  }

  /** INTERVAL-overlap equi-join: all (left, right) pairs sharing the
    * equi-`keys` whose half-open intervals `[lStart, lEnd)` and
    * `[rStart, rEnd)` intersect. Same bucketing idea as
    * [[pointInInterval]], with one twist: two overlapping intervals
    * share EVERY bucket of their intersection, so a plain bucket join
    * would emit the pair once per shared bucket. Instead of a
    * `distinct` (an extra full shuffle of the output), the pair is
    * emitted ONLY in the bucket containing `max(lStart, rStart)` —
    * which both intervals provably cover when they overlap — so each
    * pair meets exactly once by construction. Inverted intervals drop
    * (nothing can overlap them); pathological spans fail fast, both as
    * in [[pointInInterval]].
    *
    * The equi-keys bound the candidate space (the realistic shape:
    * overlaps per user/entity, not globally) and give the hash join
    * its distribution; pass `keys = Nil` only when one side is tiny.
    */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      keys: Seq[String], bucketMs: Long,
      maxSpanBuckets: Long = 100000L): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    // the two sides' non-key columns coexist in the joined frame, so
    // natural same-name intervals (e.g. 's'/'e' on both sides) must be
    // renamed by the caller — fail with the contract here, not an
    // ambiguous-reference AnalysisException inside the overlap filter
    requireDistinctCols("intervalOverlap", left, Seq(lStart, lEnd),
      right, Seq(rStart, rEnd), keys)
    def expand(df: DataFrame, s: String, e: String): DataFrame = {
      val sBkt = floor(unix_millis(col(s)) / bucketMs)
      val eBkt = floor(unix_millis(col(e)) / bucketMs)
      val guardedEnd = when(eBkt - sBkt <= maxSpanBuckets, eBkt)
        .otherwise(raise_error(concat(
          lit(s"intervalOverlap: interval spans more than $maxSpanBuckets buckets "),
          lit("(start="), col(s).cast("string"),
          lit(", end="), col(e).cast("string"),
          lit(s", bucketMs=$bucketMs)"))))
      // EMPTY intervals ([x, x) — start == end) intersect nothing under
      // half-open semantics, but they would slip through the pairwise
      // predicate below (lStart < rEnd && rStart < lEnd is true for an
      // empty interval inside a covering one) — drop them at the
      // source, which also skips their explode. Inverted intervals
      // drop with them (s < e is false).
      df.filter(col(s) < col(e))
        .withColumn(Bkt, explode(when(eBkt >= sBkt, sequence(sBkt, guardedEnd))))
    }
    val l = expand(left, lStart, lEnd)
    val r = expand(right, rStart, rEnd)
    l.join(r, keys :+ Bkt)
      // exact half-open overlap predicate on the survivors
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      // emit-once bucket: the one containing max(lStart, rStart)
      .filter(col(Bkt) === greatest(
        floor(unix_millis(col(lStart)) / bucketMs),
        floor(unix_millis(col(rStart)) / bucketMs)))
      .drop(Bkt)
  }
}
