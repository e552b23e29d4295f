package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Append-only snapshot manifests — TIME TRAVEL as the free payoff of
  * the file-immutability discipline every lifecycle verb here already
  * obeys (ingest creates files, never edits them; the same invariant
  * the stamp sidecar and the q282 index ledger lean on). A snapshot is
  * nothing but the lake's data-file listing at a moment, written as a
  * numbered TSV manifest; reading AS OF snapshot k is a parquet scan
  * restricted to exactly those files — byte-identical to what a reader
  * saw then, however many appends landed since. This is the manifest
  * core of the lakehouse table formats (Iceberg/Delta), built on the
  * engine's own ledger machinery.
  *
  * Guarantees and their boundary, stated plainly:
  *   - APPEND-SAFE: any ingest that only adds files leaves every prior
  *     snapshot readable and bit-identical (spec-pinned).
  *   - REWRITE-FATAL: a compaction/overwrite deletes listed files, and
  *     affected snapshots fail LOUDLY on read (listed file missing) —
  *     there is no copy-on-write here; a deployment wanting snapshots
  *     to survive rewrites retains the old files (exactly what the
  *     table formats' retention windows are).
  *   - Manifests are written with the sidecar's temp+rename, so a torn
  *     record leaves the previous snapshot chain intact.
  */
object SnapshotStore {

  private def manifestPath(snapDir: String, id: Int): String =
    s"$snapDir/$id.tsv"

  /** Ids present under `snapDir`, ascending. */
  def ids(spark: SparkSession, snapDir: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(snapDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.endsWith(".tsv") =>
        scala.util.Try(n.stripSuffix(".tsv").toInt).toOption }
      .flatten.sorted
  }

  /** Record the lake's CURRENT file listing as the next snapshot;
    * returns its id. Pure metadata — no data file is opened. */
  def record(spark: SparkSession, dataDir: String, snapDir: String): Int = {
    val id = ids(spark, snapDir).lastOption.getOrElse(0) + 1
    val files = StampSidecar.listDataFiles(spark, dataDir)
    StampSidecar.write(spark, manifestPath(snapDir, id),
      files.map { case (p, len, mt) =>
        StampSidecar.FileStamp(p, len, mt, 0L, 0L) })
    id
  }

  /** The files snapshot `id` pinned, with their recorded identities. */
  def manifest(spark: SparkSession, snapDir: String,
      id: Int): Seq[StampSidecar.FileStamp] = {
    val m = StampSidecar.read(spark, manifestPath(snapDir, id))
    require(m.nonEmpty, s"SnapshotStore: no snapshot $id under $snapDir")
    m.values.toSeq.sortBy(_.path)
  }

  /** Read the lake AS OF snapshot `id` — a parquet scan over exactly
    * the manifest's files. Fails loudly if any listed file is missing
    * or resized (a rewrite invalidated the snapshot — the documented
    * boundary), never silently serves a different state. */
  def readAsOf(spark: SparkSession, snapDir: String, id: Int): DataFrame = {
    val m = manifest(spark, snapDir, id)
    requireIntact(spark, m, s"snapshot $id")
    spark.read.parquet(m.map(_.path): _*)
  }

  /** Read exactly what was ADDED between snapshots `fromId` < `toId` —
    * the incremental-processing cursor: with an append-only lake the
    * manifest difference IS the ingested batch, read without touching
    * any pre-existing file (file-level pruning before the scan
    * starts). `fromId = 0` means the empty baseline, so the first
    * interval's delta is snapshot 1 itself. Soundness is a set law,
    * spec-pinned: asOf(a) ∪ delta(a, b) ≡ asOf(b). An empty delta (a
    * no-op interval) returns the to-snapshot's schema with zero rows.
    */
  def readDelta(spark: SparkSession, snapDir: String, fromId: Int,
      toId: Int): DataFrame = {
    require(0 <= fromId && fromId < toId,
      s"SnapshotStore: need 0 <= from < to, got ($fromId, $toId)")
    val from: Set[String] =
      if (fromId == 0) Set.empty
      else manifest(spark, snapDir, fromId).map(_.path).toSet
    val to = manifest(spark, snapDir, toId)
    val added = to.filterNot(e => from.contains(e.path))
    requireIntact(spark, added, s"delta $fromId→$toId")
    if (added.isEmpty) readAsOf(spark, snapDir, toId).limit(0)
    else spark.read.parquet(added.map(_.path): _*)
  }

  private def requireIntact(spark: SparkSession,
      m: Seq[StampSidecar.FileStamp], what: String): Unit = {
    if (m.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(m.head.path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val broken = m.filter { e =>
        val p = new org.apache.hadoop.fs.Path(e.path)
        !fs.exists(p) || fs.getFileStatus(p).getLen != e.len
      }
      require(broken.isEmpty,
        s"SnapshotStore: $what invalidated by a rewrite — missing/" +
          s"changed files: ${broken.map(_.path).mkString(", ")}")
    }
  }
}
