package graft.operators

/** In-process striped lock for ensure-style artifact builders.
  *
  * Verify/Bench run gated queries CONCURRENTLY in one JVM (a bounded
  * thread pool over a shared session), and several queries ensure the
  * SAME on-disk artifact (the bm25 dial: q273/q281/q283; the postings
  * index: q281/q283; the nprobe choice: q272/q276/q278). A warm ensure
  * is a read and races are harmless; a COLD ensure writes parquet
  * dirs, and two concurrent cold builders of one path can interleave
  * their overwrite's delete/commit phases — observed as a transient
  * mid-write read failure. Serializing ensures PER ARTIFACT PATH
  * removes the class without changing any semantics: the second
  * entrant re-checks warmth inside the lock and becomes a no-op.
  *
  * In-process only, which matches the deployment shape here (one JVM
  * per Verify/Bench run); a multi-writer production lake would hang
  * this off the table format's commit protocol instead.
  */
object EnsureLock {
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def withLock[T](path: String)(body: => T): T = {
    val lock = locks.computeIfAbsent(path, _ => new Object)
    lock.synchronized(body)
  }
}
