package graft.functions

/** Misra–Gries frequent-items summary — the bounded-memory candidate
  * generator for exact heavy-hitter queries (q213). The summary keeps at
  * most `k` counters; processing a stream of length n guarantees
  * `true_count − n/k ≤ estimate ≤ true_count`, so EVERY item with true
  * count > n/k survives in the summary (its estimate stays positive).
  * Partition-wise use inherits the guarantee by pigeonhole: if an item
  * has global count > n/k, some partition has count_p > n_p/k, so the
  * item appears in that partition's summary — the union of per-partition
  * summaries is a complete candidate set for the exact verify pass.
  */
object MisraGries {
  /** One MG step: absorb `item` into the ≤ k counters in `m`.
    * The decrement-all branch charges one occurrence of each of k+1
    * distinct items against each other — the step the n/k undercount
    * bound comes from.
    */
  def update[K](m: scala.collection.mutable.HashMap[K, Long], item: K,
      k: Int): Unit = {
    if (m.contains(item)) m(item) += 1
    else if (m.size < k) m(item) = 1L
    else {
      m.mapValuesInPlace((_, v) => v - 1)
      m.filterInPlace((_, v) => v > 0)
    }
  }

  /** Summarize a stream into ≤ k (item, lower-bound-estimate) counters. */
  def summarize(it: Iterator[String], k: Int): Map[String, Long] = {
    require(k >= 1, s"summary size must be >= 1, got $k")
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach(update(m, _, k))
    m.toMap
  }
}
