package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Cross-process O_EXCL claim for the MUTATING phase of an artifact
  * ensure — [[SnapshotStore]]'s proven claim-file pattern applied to
  * the artifact tree (round-14 verdict #2): the in-process
  * [[graft.operators.EnsureLock]] serializes cold builders inside ONE
  * JVM by design, so a second PROCESS cold-ensuring the same postings
  * index / masked-df / card / choice artifact could still interleave
  * its overwrite's delete/commit phases with the first's — exactly
  * the torn-write class the snapshot store's `store.lock` makes loud.
  *
  * Semantics, matching the store's policy precisely:
  *   - the claim is taken ONLY around the mutating phase (cold build,
  *     append, rebuild, choice write) — a warm ensure stays a pure
  *     read and never touches the claim file;
  *   - a held foreign claim fails LOUDLY (never waits, never
  *     tears): the loser's retry re-enters the ensure, re-checks
  *     warmth, and becomes a no-op once the winner committed;
  *   - the claim is released on completion OR failure (try/finally);
  *     only a killed process leaves it, and the staleness policy is
  *     manual and stated in the error — verify no other writer is
  *     live, delete the named file, retry (the store.lock doctrine).
  *
  * The claim file is a SIBLING of the artifact path (`<path>.lock`),
  * never inside it: every builder here clears or overwrites the
  * artifact directory itself.
  */
object ArtifactClaim {

  def claimPath(artifactPath: String): String =
    artifactPath.stripSuffix("/") + ".lock"

  def withClaim[T](spark: SparkSession, artifactPath: String,
      what: String)(body: => T): T = {
    val p = new Path(claimPath(artifactPath))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val parent = p.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
    require(SnapshotStore.atomicClaim(fs, p),
      s"ArtifactClaim: $what at $artifactPath is blocked — another " +
        s"writer process holds $p${SnapshotStore.holderStamp(fs, p)} " +
        "(or a crashed one left it). Verify no other writer is live, " +
        "delete the claim file, and retry; the interrupted build will " +
        "re-ensure cleanly.")
    SnapshotStore.writeHolderStamp(fs, p)
    try body finally { fs.delete(p, false); () }
  }
}
