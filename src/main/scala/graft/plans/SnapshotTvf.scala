package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Table-valued-function surface for lake time travel — the SQL half
  * of [[graft.io.SnapshotStore]] (the DataFrame verbs since round 12;
  * registered by [[graft.GraftExtensions]] via `injectTableFunction`):
  *
  * {{{
  *   SELECT * FROM graft_asof('/lake/snapshots', 3)
  *   SELECT * FROM graft_delta('/lake/snapshots', 2, 3)
  * }}}
  *
  * The builder resolves the manifest DURING ANALYSIS (a TSV read —
  * metadata-scale) and returns the store's own plan for the pinned
  * file set, so the TVF inherits every SnapshotStore guarantee
  * unchanged: byte-identical as-of reads, the (len, mtime) rewrite
  * trust boundary failing LOUDLY at plan time, the non-append-interval
  * delta law, file-level pruning before any scan starts. Arguments
  * must be literals (they name the snapshot being planned — a per-row
  * snapshot id has no single plan), checked with the kernel-parameter
  * boundary-error convention.
  */
object SnapshotTvf {

  def asOfPlan(snapDir: String, id: Int): LogicalPlan =
    graft.io.SnapshotStore.readAsOf(SparkSession.active, snapDir, id)
      .queryExecution.analyzed

  def deltaPlan(snapDir: String, fromId: Int, toId: Int): LogicalPlan =
    graft.io.SnapshotStore.readDelta(SparkSession.active, snapDir,
        fromId, toId)
      .queryExecution.analyzed
}
