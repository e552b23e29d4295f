package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Capacity-gated broadcast hint — the generalized form of q153's
  * dup-hash gate: broadcast a frame ONLY while its measured row count
  * is inside a configurable budget, otherwise return it un-hinted so
  * the join plans as a shuffled exchange with identical semantics.
  *
  * An unconditional `broadcast()` on an input that is merely
  * "expected small" is a driver-OOM deferred to the first corpus that
  * violates the expectation; this helper makes the expectation a
  * measured, configurable gate with a graceful fallback. The count is
  * one job over `df` — callers should pass a checkpointed/cheap frame
  * (the q153 pattern: `localCheckpoint()` first, so the gate's count
  * and the join share one evaluation), and reuse the RETURNED frame
  * rather than re-deriving it.
  */
object BoundedBroadcast {

  /** @param df        frame to (maybe) broadcast — checkpoint it first
    *                  if its lineage is expensive
    * @param confKey   spark conf key overriding the row budget
    * @param defaultMaxRows budget when the conf key is unset
    */
  def boundedBroadcast(df: DataFrame, confKey: String,
      defaultMaxRows: Long): DataFrame = {
    val max = df.sparkSession.conf.getOption(confKey)
      .map(_.toLong).getOrElse(defaultMaxRows)
    if (df.count() <= max) broadcast(df) else df
  }
}
