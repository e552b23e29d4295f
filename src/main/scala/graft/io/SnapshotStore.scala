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
  *   - RETAINED REWRITE: [[compactWithRetention]] is the table-format
  *     compaction verb — files referenced by a live manifest are
  *     RENAMED (bytes untouched, a metadata op) into the snapshot
  *     dir's `retained/` area and every live manifest is atomically
  *     rewritten to the retained location, so `readAsOf` of any prior
  *     snapshot stays byte-identical across the compaction. Retention
  *     ends only at [[expireSnapshots]], which deletes manifests and
  *     garbage-collects retained files no remaining manifest
  *     references — an expired snapshot read fails LOUDLY (manifest
  *     gone), never silently serves a different state.
  *   - BARE-REWRITE-FATAL: an overwrite that bypasses the retention
  *     verb deletes listed files, and affected snapshots fail LOUDLY
  *     on read (listed file missing/resized/retimed — the full
  *     (len, mtime) trust boundary of [[StampSidecar]]).
  *   - Manifests are written with the sidecar's temp+rename, so a torn
  *     record leaves the previous snapshot chain intact.
  *   - [[record]]/[[compactWithRetention]]/[[expireSnapshots]] run
  *     under the per-path [[graft.operators.EnsureLock]] (in-process —
  *     the documented one-JVM deployment shape; a multi-writer lake
  *     needs a commit protocol).
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
    * returns its id. Pure metadata — no data file is opened. Locked
    * on the snapshot dir: two concurrent recorders would otherwise
    * list-then-write the same id and last-writer-wins a manifest away
    * (the EnsureLock class of race). */
  def record(spark: SparkSession, dataDir: String, snapDir: String): Int =
    graft.operators.EnsureLock.withLock(snapDir) {
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
    // the cursor law (asOf(a) ∪ delta(a,b) ≡ asOf(b)) only holds over
    // an APPEND interval: a from-file missing from the to-manifest
    // means a rewrite landed between the snapshots, and returning just
    // the added files would silently break the law where readAsOf(a)
    // fails loudly — so fail the same way here
    val lost = from -- to.map(_.path).toSet
    require(lost.isEmpty,
      s"SnapshotStore: delta $fromId→$toId spans a rewrite — files in " +
        s"snapshot $fromId absent from $toId: ${lost.mkString(", ")}")
    val added = to.filterNot(e => from.contains(e.path))
    requireIntact(spark, added, s"delta $fromId→$toId")
    if (added.isEmpty) readAsOf(spark, snapDir, toId).limit(0)
    else spark.read.parquet(added.map(_.path): _*)
  }

  private def retainedRoot(snapDir: String): String = s"$snapDir/retained"

  /** COMPACT the lake at `dataDir` to `survivors` while every live
    * snapshot stays readable — the table-format retention verb the
    * REWRITE-FATAL boundary pointed at (compaction keeps files
    * referenced by live manifests). Mechanics, all metadata-scale
    * except the survivor rewrite a compaction pays anyway:
    *
    *   1. survivors are written to a temp dir FIRST (their scan still
    *      reads the pre-compaction files);
    *   2. every current data file referenced by a live manifest is
    *      RENAMED — bytes untouched — into `snapDir/retained/g<gen>/`,
    *      but only after its live (len, mtime) matches the manifest's
    *      recorded identity: a file some rewrite already corrupted is
    *      left in place so its snapshot keeps failing LOUDLY rather
    *      than being re-stamped into silently serving wrong bytes;
    *   3. every live manifest is atomically rewritten (temp+rename) to
    *      point at the retained location with the file's re-observed
    *      post-rename (len, mtime);
    *   4. the data dir is replaced by the survivor files.
    *
    * After this, `readAsOf` of any prior snapshot is byte-identical to
    * before the compaction (spec-pinned); the current-state dir holds
    * only survivors. Returns the number of files moved to retention.
    * Old files live until [[expireSnapshots]] garbage-collects them —
    * retention of the files IS the snapshot (the q285 boundary made
    * composable). */
  def compactWithRetention(spark: SparkSession, dataDir: String,
      snapDir: String, survivors: DataFrame): Int =
    graft.operators.EnsureLock.withLock(snapDir) {
      val conf = spark.sessionState.newHadoopConf()
      val dataP = new org.apache.hadoop.fs.Path(dataDir)
      val fs = dataP.getFileSystem(conf)
      val tmp = new org.apache.hadoop.fs.Path(dataDir + ".compact-tmp")
      survivors.write.mode("overwrite").parquet(tmp.toString)

      val live = ids(spark, snapDir)
      val manifests = live.map(id => id -> manifest(spark, snapDir, id))
      val current = StampSidecar.listDataFiles(spark, dataDir)
        .map(f => f._1 -> f).toMap
      // distinct referenced entries still sitting in the data dir,
      // with their strictest recorded identity (entries agree across
      // manifests for an untouched file — they were listed, not edited)
      val toRetain = manifests.flatMap(_._2)
        .filter(e => current.contains(e.path))
        .groupBy(_.path).map(_._2.head).toSeq.sortBy(_.path)
      val gen = 1 + live.lastOption.getOrElse(0)
      val destDir =
        new org.apache.hadoop.fs.Path(s"${retainedRoot(snapDir)}/g$gen")
      if (toRetain.nonEmpty && !fs.exists(destDir)) fs.mkdirs(destDir)
      val moved = toRetain.flatMap { e =>
        val (_, len, mt) = current(e.path)
        // identity gate BEFORE the move — never launder a corruption
        if (len != e.len || mt != e.mtime) None
        else {
          val src = new org.apache.hadoop.fs.Path(e.path)
          val dst = new org.apache.hadoop.fs.Path(destDir, src.getName)
          require(fs.rename(src, dst),
            s"SnapshotStore: retention rename failed for ${e.path}")
          val st = fs.getFileStatus(dst)
          Some(e.path -> StampSidecar.FileStamp(
            StampSidecar.normalize(dst.toString), st.getLen,
            st.getModificationTime, 0L, 0L))
        }
      }.toMap
      manifests.foreach { case (id, entries) =>
        if (entries.exists(e => moved.contains(e.path)))
          StampSidecar.write(spark, manifestPath(snapDir, id),
            entries.map(e => moved.getOrElse(e.path, e)))
      }
      // unreferenced current files die with the data dir; survivors in
      fs.delete(dataP, true)
      require(fs.rename(tmp, dataP),
        s"SnapshotStore: survivor rename failed for $dataDir")
      moved.size
    }

  /** EXPIRE snapshots outside the retention window: manifests not in
    * `keepIds` are deleted, then retained files no remaining manifest
    * references are garbage-collected. An expired snapshot's read
    * fails loudly from then on (manifest gone). Returns
    * (manifests expired, retained files collected). Only files under
    * the retention area are GC candidates — live data-dir files are
    * never touched here. */
  def expireSnapshots(spark: SparkSession, snapDir: String,
      keepIds: Set[Int]): (Int, Int) =
    graft.operators.EnsureLock.withLock(snapDir) {
      val all = ids(spark, snapDir)
      val drop = all.filterNot(keepIds.contains)
      val root = new org.apache.hadoop.fs.Path(snapDir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      drop.foreach { id =>
        fs.delete(new org.apache.hadoop.fs.Path(
          manifestPath(snapDir, id)), false)
      }
      val retainPrefix = StampSidecar.normalize(retainedRoot(snapDir))
      val stillReferenced = ids(spark, snapDir)
        .flatMap(id => manifest(spark, snapDir, id))
        .map(_.path).filter(_.startsWith(retainPrefix)).toSet
      val collected = StampSidecar
        .listDataFiles(spark, retainedRoot(snapDir))
        .map(_._1).filterNot(stillReferenced.contains)
      collected.foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), false))
      (drop.size, collected.size)
    }

  private def requireIntact(spark: SparkSession,
      m: Seq[StampSidecar.FileStamp], what: String): Unit = {
    if (m.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(m.head.path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      // the full (len, mtime) trust boundary — the StampSidecar/q282
      // ledger discipline: a same-length rewrite moves the mtime, and
      // the scaladoc's 'never silently serves a different state'
      // guarantee needs both compared, not just existence+length
      val broken = m.filter { e =>
        val p = new org.apache.hadoop.fs.Path(e.path)
        !fs.exists(p) || {
          val st = fs.getFileStatus(p)
          st.getLen != e.len || st.getModificationTime != e.mtime
        }
      }
      require(broken.isEmpty,
        s"SnapshotStore: $what invalidated by a rewrite — missing/" +
          s"changed files: ${broken.map(_.path).mkString(", ")}")
    }
  }
}
