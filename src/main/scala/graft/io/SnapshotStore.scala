package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
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
  *   - CRASH-RECOVERABLE COMPACTION: the compaction's move plan is
  *     JOURNALED (temp+rename, atomic) before the first rename; every
  *     later step is idempotent roll-forward from the journal, so a
  *     crash at ANY point leaves a state [[recoverCompaction]] (or the
  *     next compaction/expiry, which auto-recover) completes exactly.
  *     Mid-window reads stay loud and name the journal.
  *   - BARE-REWRITE-FATAL: an overwrite that bypasses the retention
  *     verb deletes listed files, and affected snapshots fail LOUDLY
  *     on read (listed file missing/resized/retimed — the full
  *     (len, mtime) trust boundary of [[StampSidecar]]). Compaction
  *     NEVER launders such a state: a file is retained only while its
  *     live identity matches a manifest's recorded identity, and only
  *     manifest entries recording THAT identity are re-pointed —
  *     entries recording any other identity keep failing loudly.
  *   - Manifests are written with the sidecar's temp+rename, so a torn
  *     record leaves the previous snapshot chain intact.
  *   - FENCED WRITERS: [[record]] claims its id with an O_EXCL claim
  *     file before writing the manifest, so a second WRITER PROCESS
  *     (outside the in-process [[graft.operators.EnsureLock]]) fails
  *     loudly instead of last-writer-winning a manifest away; the
  *     MUTATING verbs ([[compactWithRetention]]/[[expireSnapshots]]/
  *     [[recoverCompaction]]) additionally hold an O_EXCL `store.lock`
  *     for their duration, so two processes compacting/expiring/
  *     recovering the same lake collide loudly, never interleave
  *     renames and manifest rewrites. A claim or lock left by a
  *     crashed writer keeps the verb loudly blocked until an operator
  *     deletes it — the staleness policy is manual and stated in the
  *     error (a crashed compaction also leaves the journal, which
  *     [[recoverCompaction]] then completes). [[record]] additionally
  *     REFUSES while a compaction journal is present: a snapshot
  *     recorded inside the crash window would pin pre-swap files the
  *     roll-forward is about to delete.
  *   - [[record]]/[[compactWithRetention]]/[[expireSnapshots]] run
  *     under the per-path [[graft.operators.EnsureLock]] (in-process;
  *     the claim file is the cross-process complement).
  */
object SnapshotStore {

  private def manifestPath(snapDir: String, id: Int): String =
    s"$snapDir/$id.tsv"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Ids present under `snapDir`, ascending. */
  def ids(spark: SparkSession, snapDir: String): Seq[Int] = {
    val p = new Path(snapDir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.endsWith(".tsv") =>
        scala.util.Try(n.stripSuffix(".tsv").toInt).toOption }
      .flatten.sorted
  }

  /** O_EXCL create of `p` — the cross-process id fence. The local
    * filesystems go through java.io.File.createNewFile (a true atomic
    * O_CREAT|O_EXCL); remote filesystems through the FileSystem
    * create-no-overwrite contract (atomic server-side on HDFS-likes).
    * Returns false ONLY when the path already exists — a concurrent or
    * crashed claimant; any other IO failure propagates, so a transient
    * error is never misreported as contention (which would instruct
    * the operator to delete a lock file that may not exist). */
  private[graft] def atomicClaim(fs: FileSystem, p: Path): Boolean = fs match {
    case _: org.apache.hadoop.fs.LocalFileSystem |
         _: org.apache.hadoop.fs.RawLocalFileSystem =>
      new java.io.File(p.toUri.getPath).createNewFile()
    case f =>
      try f.createNewFile(p)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
      }
  }

  /** Advisory holder stamp written INTO a freshly claimed lock/claim
    * file (after the O_EXCL create — the create is the fence, the
    * content is operator affordance): pid@host + wall-clock, so a
    * blocked writer's error can say WHO holds the file and SINCE WHEN
    * instead of leaving the staleness call blind. */
  private[graft] def writeHolderStamp(fs: FileSystem, p: Path): Unit =
    try {
      val out = fs.create(p, true)
      try out.write((java.lang.ProcessHandle.current.pid().toString +
        "@" + java.net.InetAddress.getLocalHost.getHostName +
        " since " + java.time.Instant.now().toString)
        .getBytes("UTF-8"))
      finally out.close()
    } catch { case _: Throwable => () } // advisory only — never fail a claim

  /** The holder stamp of an existing lock/claim file, for error text.
    * Unreadable/empty reads as unknown — the fence still holds. */
  private[graft] def holderStamp(fs: FileSystem, p: Path): String =
    scala.util.Try {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      if (s.nonEmpty) s" [held by $s]" else ""
    }.getOrElse("")

  private[graft] def claimPath(snapDir: String, id: Int): String =
    s"$snapDir/$id.claim"

  private[graft] def storeLockPath(snapDir: String): String =
    s"$snapDir/store.lock"

  /** Cross-process mutex for the MUTATING store verbs (compaction,
    * expiry — the verbs that rewrite manifests and move/delete files;
    * `record` appends only and is fenced per-id by its claim file).
    * Same policy as the id claim: an O_EXCL lock file, held for the
    * verb, released on completion; a foreign lock fails LOUDLY with
    * the manual staleness policy (delete the named file after
    * verifying no other writer process is live — a crashed holder
    * additionally leaves the compaction journal, which
    * [[recoverCompaction]] completes after the lock is cleared). */
  private def withStoreLock[T](spark: SparkSession, snapDir: String,
      what: String)(body: => T): T = {
    val root = new Path(snapDir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) fs.mkdirs(root)
    val lock = new Path(storeLockPath(snapDir))
    require(atomicClaim(fs, lock),
      s"SnapshotStore: $what at $snapDir is blocked — another writer " +
        s"process holds $lock${holderStamp(fs, lock)} (or a crashed " +
        "one left it). Verify no other writer is live, delete the " +
        "lock file, and retry; if a compaction journal is present, " +
        "run recoverCompaction next.")
    writeHolderStamp(fs, lock)
    try body finally { fs.delete(lock, false); () }
  }

  /** Record the lake's CURRENT file listing as the next snapshot;
    * returns its id. Pure metadata — no data file is opened. Locked
    * on the snapshot dir IN-PROCESS (two concurrent recorders would
    * otherwise list-then-write the same id and last-writer-wins a
    * manifest away) and FENCED cross-process by an O_EXCL claim file:
    * a second JVM racing for the same id loses the claim and fails
    * loudly instead of silently corrupting the chain. The claim is
    * removed once the manifest commits; a claim orphaned by a crash
    * keeps the id loudly blocked (the error names the file to delete
    * after verifying no other writer is live). */
  /** Where snapshot `id`'s recorded-at stamp lives — a sidecar FILE
    * next to the manifest (not a manifest field), so every manifest
    * written by a previous layout stays readable unchanged: a missing
    * sidecar simply means the snapshot's age is unknown. */
  private[graft] def recordedAtPath(snapDir: String, id: Int): String =
    s"$snapDir/$id.at.tsv"

  /** When snapshot `id` was recorded (epoch millis), if its layout
    * carries the stamp. None = a pre-stamp snapshot — age-based
    * policies must treat it conservatively (kept), never silently
    * expire what they cannot date. */
  def recordedAt(spark: SparkSession, snapDir: String,
      id: Int): Option[Long] =
    StampSidecar.read(spark, recordedAtPath(snapDir, id))
      .get("recorded_at").map(_.mtime)

  def record(spark: SparkSession, dataDir: String, snapDir: String): Int =
    record(spark, dataDir, snapDir, recordedAtMillis = -1L)

  /** [[record]] with an explicit recorded-at stamp (epoch millis; a
    * negative value means wall clock) — the deterministic entry the
    * gated age-retention chronology uses; production recorders take
    * the default. The stamp sidecar is written AFTER the manifest
    * commits: a crash between them leaves a valid snapshot of unknown
    * age, which age policies keep (the conservative default), never a
    * stamped-but-unreadable state. */
  def record(spark: SparkSession, dataDir: String, snapDir: String,
      recordedAtMillis: Long): Int =
    graft.operators.EnsureLock.withLock(snapDir) {
      val root = new Path(snapDir)
      val fs = fsOf(spark, root)
      if (!fs.exists(root)) fs.mkdirs(root)
      // an open compaction crash window fences APPENDS too: a snapshot
      // recorded now would pin the pre-swap data files that the roll-
      // forward's survivor swap is about to delete — the record would
      // silently brick. Refuse loudly with the recovery instruction
      // (the same policy the mutating verbs apply by auto-recovering).
      val journalP = new Path(journalPath(snapDir))
      require(!fs.exists(journalP),
        s"SnapshotStore: cannot record a snapshot at $snapDir — a " +
          s"compaction journal is present ($journalP): the store is " +
          "inside a crashed compaction's window and the current data " +
          "dir is about to be replaced by the roll-forward. Run " +
          "SnapshotStore.recoverCompaction first, then record.")
      val id = ids(spark, snapDir).lastOption.getOrElse(0) + 1
      val claim = new Path(claimPath(snapDir, id))
      require(atomicClaim(fs, claim),
        s"SnapshotStore: snapshot id $id at $snapDir is already claimed " +
          s"($claim exists${holderStamp(fs, claim)}) — a concurrent " +
          "writer process, or the residue of a crashed one. Verify no " +
          "other writer is live, delete the claim file, and retry.")
      writeHolderStamp(fs, claim)
      try {
        val files = StampSidecar.listDataFiles(spark, dataDir)
        StampSidecar.write(spark, manifestPath(snapDir, id),
          files.map { case (p, len, mt) =>
            StampSidecar.FileStamp(p, len, mt, 0L, 0L) })
        val at = if (recordedAtMillis >= 0L) recordedAtMillis
          else System.currentTimeMillis()
        StampSidecar.write(spark, recordedAtPath(snapDir, id),
          Seq(StampSidecar.FileStamp("recorded_at", 0L, at, 0L, 0L)))
        id
      } finally { fs.delete(claim, false); () }
    }

  /** Whether snapshot `id` is still recorded (its manifest exists) —
    * the EXPIRED/never-recorded probe, distinct from invalidity: an
    * expired snapshot is a policy decision (manifest deliberately
    * deleted, probe false), a rewrite-invalidated or crash-window one
    * still HAS its manifest and must stay loud on read. Readers that
    * want to fold expiry into a quiet zero gate on this probe and let
    * [[readAsOf]]'s failures propagate — never Try-swallow both. */
  def hasSnapshot(spark: SparkSession, snapDir: String, id: Int): Boolean = {
    val p = new Path(manifestPath(snapDir, id))
    fsOf(spark, p).exists(p)
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
    * boundary), never silently serves a different state. A failure
    * inside a compaction's crash window names the journal so the
    * operator knows the state is recoverable, not lost. */
  def readAsOf(spark: SparkSession, snapDir: String, id: Int): DataFrame = {
    val m = manifest(spark, snapDir, id)
    requireIntact(spark, m, s"snapshot $id", journalHint(spark, snapDir))
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
    requireIntact(spark, added, s"delta $fromId→$toId",
      journalHint(spark, snapDir))
    if (added.isEmpty) readAsOf(spark, snapDir, toId).limit(0)
    else spark.read.parquet(added.map(_.path): _*)
  }

  private def retainedRoot(snapDir: String): String = s"$snapDir/retained"

  private[graft] def journalPath(snapDir: String): String =
    s"$snapDir/compaction.journal"

  /** One planned retention rename, gated on the file's observed
    * identity at plan time (which matched a live manifest's recorded
    * identity — the move is only valid while that holds). */
  private[graft] final case class PlannedMove(src: String, len: Long,
      mtime: Long, dst: String)

  /** The journaled compaction plan: every retention rename plus the
    * final survivor swap. Written atomically BEFORE the first rename;
    * deleted LAST. Its presence marks the crash window. */
  private[graft] final case class CompactionPlan(moves: Seq[PlannedMove],
      survivorTmp: String, dataDir: String)

  private[graft] def journalWrite(spark: SparkSession, snapDir: String,
      plan: CompactionPlan): Unit = {
    // the journal is a TSV: a path carrying a tab or newline would
    // corrupt the plan (or MatchError during recovery), making the
    // crash window unrecoverable — reject at PLAN time, before any
    // rename, so the refusal costs nothing (no Spark/Hadoop writer
    // produces such names; only a hand-picked lake path can)
    val fields = plan.moves.flatMap(m => Seq(m.src, m.dst)) ++
      Seq(plan.survivorTmp, plan.dataDir)
    fields.filter(f => f.exists(c => c == '\t' || c == '\n' || c == '\r'))
      .foreach(f => sys.error(
        "SnapshotStore: refusing to journal a path containing a tab/" +
          s"newline (unrecoverable if crashed): ${f.replace('\t', '␉')}"))
    val p = new Path(journalPath(snapDir))
    val tmp = new Path(journalPath(snapDir) + ".tmp")
    val fs = fsOf(spark, p)
    val out = fs.create(tmp, true)
    try {
      val body = (plan.moves.map(m =>
          s"move\t${m.src}\t${m.len}\t${m.mtime}\t${m.dst}\n") :+
        s"swap\t${plan.survivorTmp}\t${plan.dataDir}\n").mkString
      out.write(body.getBytes("UTF-8"))
    } finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p),
      s"SnapshotStore: journal commit failed at $p")
  }

  private[graft] def journalRead(spark: SparkSession,
      snapDir: String): Option[CompactionPlan] = {
    val p = new Path(journalPath(snapDir))
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try {
        scala.io.Source.fromInputStream(in, "UTF-8").mkString
      } finally in.close()
      val lines = text.linesIterator.filter(_.nonEmpty).toSeq
      val moves = lines.collect {
        case l if l.startsWith("move\t") =>
          val Array(_, src, len, mt, dst) = l.split('\t')
          PlannedMove(src, len.toLong, mt.toLong, dst)
      }
      val swap = lines.collectFirst {
        case l if l.startsWith("swap\t") =>
          val Array(_, tmp, dataDir) = l.split('\t'); (tmp, dataDir)
      }
      // a journal exists only after its atomic rename — a malformed
      // one is outside the model and must stay loud, never skipped
      val (tmp, dataDir) = swap.getOrElse(sys.error(
        s"SnapshotStore: malformed compaction journal at $p"))
      Some(CompactionPlan(moves, tmp, dataDir))
    }
  }

  private def journalHint(spark: SparkSession, snapDir: String): String = {
    val p = new Path(journalPath(snapDir))
    if (fsOf(spark, p).exists(p))
      " [a compaction journal is present at " + p +
        " — the state is a crash window, recoverable via " +
        "SnapshotStore.recoverCompaction]"
    else ""
  }

  /** Roll the journaled plan FORWARD — every step idempotent, so this
    * completes a compaction interrupted anywhere after the journal
    * commit (and a completed one is a no-op pass):
    *   1. each planned rename runs unless its dst already exists; a
    *      src that vanished without its dst existing is outside the
    *      model and fails loudly;
    *   2. each live manifest is atomically rewritten — ONLY entries
    *      whose own recorded (len, mtime) equals the moved file's
    *      pre-move identity are re-pointed (an entry recording any
    *      other identity was already invalidated and keeps failing
    *      loudly — never re-stamped onto bytes it did not pin);
    *   3. the survivor tmp dir replaces the data dir (skipped if the
    *      swap already happened);
    *   4. the journal is deleted LAST.
    * `crashAfterMoves` is the spec's fault-injection hook: throw after
    * that many renames, inside the window the journal exists to close.
    */
  private def executePlan(spark: SparkSession, snapDir: String,
      plan: CompactionPlan, crashAfterMoves: Int): Int = {
    val fs = fsOf(spark, new Path(snapDir))
    var renames = 0
    val movedStamps: Map[String, StampSidecar.FileStamp] =
      plan.moves.map { m =>
        val src = new Path(m.src)
        val dst = new Path(m.dst)
        if (!fs.exists(dst)) {
          require(fs.exists(src),
            s"SnapshotStore: recovery found neither ${m.src} nor " +
              s"${m.dst} — the journaled move cannot complete")
          val st = fs.getFileStatus(src)
          require(st.getLen == m.len && st.getModificationTime == m.mtime,
            s"SnapshotStore: ${m.src} changed after the plan was " +
              "journaled — refusing to retain unverified bytes")
          require(fs.rename(src, dst),
            s"SnapshotStore: retention rename failed for ${m.src}")
          renames += 1
          if (renames >= crashAfterMoves)
            sys.error("SnapshotStore: injected crash after " +
              s"$renames retention renames (test hook)")
        }
        val st = fs.getFileStatus(dst)
        m.src -> StampSidecar.FileStamp(
          StampSidecar.normalize(m.dst), st.getLen,
          st.getModificationTime, 0L, 0L)
      }.toMap
    val srcIdentity = plan.moves.map(m => m.src -> ((m.len, m.mtime))).toMap
    def repoints(e: StampSidecar.FileStamp): Boolean =
      movedStamps.contains(e.path) &&
        srcIdentity(e.path) == ((e.len, e.mtime))
    ids(spark, snapDir).foreach { id =>
      val entries = manifest(spark, snapDir, id)
      if (entries.exists(repoints))
        StampSidecar.write(spark, manifestPath(snapDir, id),
          entries.map(e => if (repoints(e)) movedStamps(e.path) else e))
    }
    val tmpP = new Path(plan.survivorTmp)
    val dataP = new Path(plan.dataDir)
    if (fs.exists(tmpP)) {
      if (fs.exists(dataP)) fs.delete(dataP, true)
      require(fs.rename(tmpP, dataP),
        s"SnapshotStore: survivor rename failed for ${plan.dataDir}")
    } else require(fs.exists(dataP),
      s"SnapshotStore: neither survivor tmp ${plan.survivorTmp} nor " +
        s"data dir ${plan.dataDir} exists — cannot complete the swap")
    fs.delete(new Path(journalPath(snapDir)), false)
    plan.moves.size
  }

  /** Complete (roll forward) a compaction whose journal is present —
    * the documented recovery verb for a crash inside
    * [[compactWithRetention]]'s window. Idempotent; returns true iff
    * a journal was found and executed. The compaction and expiry
    * verbs call this automatically before starting.
    *
    * Recovery is itself a MUTATING store verb (renames, manifest
    * rewrites, the data-dir swap), so it holds the same cross-process
    * `store.lock` as compaction/expiry — a standalone recovery racing
    * another process's live verb (whose entry auto-recovery is doing
    * the same roll-forward) fails loudly instead of interleaving the
    * survivor swap (process B passing the tmp-exists check after
    * process A completed the swap would otherwise delete the live
    * data dir). The documented operator flow already clears a crashed
    * holder's lock before running recovery. */
  def recoverCompaction(spark: SparkSession, snapDir: String): Boolean =
    graft.operators.EnsureLock.withLock(snapDir) {
      withStoreLock(spark, snapDir, "recovery") {
        journalRead(spark, snapDir) match {
          case Some(plan) =>
            executePlan(spark, snapDir, plan, Int.MaxValue); true
          case None => false
        }
      }
    }

  /** COMPACT the lake at `dataDir` to `survivors` while every live
    * snapshot stays readable — the table-format retention verb the
    * REWRITE-FATAL boundary pointed at (compaction keeps files
    * referenced by live manifests). Mechanics, all metadata-scale
    * except the survivor rewrite a compaction pays anyway:
    *
    *   1. survivors are written to a temp dir FIRST (their scan still
    *      reads the pre-compaction files);
    *   2. the retention set is computed: a current data file is
    *      retained iff its live (len, mtime) matches the identity SOME
    *      live manifest recorded for it — a file no manifest pinned at
    *      its current identity (a corruption, or an in-place rewrite
    *      every recording predates) is left to die with the data dir
    *      so its snapshots keep failing LOUDLY rather than being
    *      re-stamped into silently serving wrong bytes;
    *   3. the full move plan + survivor swap is JOURNALED atomically —
    *      from here the compaction is crash-recoverable roll-forward
    *      ([[recoverCompaction]]);
    *   4. retained files are RENAMED — bytes untouched — into
    *      `snapDir/retained/g<gen>/` (gen = 1 + the highest existing
    *      generation, never reused; destination collisions fail the
    *      plan before any rename);
    *   5. every live manifest is atomically rewritten (temp+rename):
    *      ONLY entries recording the moved file's pre-move identity
    *      are re-pointed to the retained location with its re-observed
    *      (len, mtime); entries recording a different identity stay
    *      untouched (still loud);
    *   6. the data dir is replaced by the survivor files; the journal
    *      is deleted LAST.
    *
    * After this, `readAsOf` of any prior snapshot is byte-identical to
    * before the compaction (spec-pinned); the current-state dir holds
    * only survivors. Returns the number of files moved to retention.
    * Old files live until [[expireSnapshots]] garbage-collects them —
    * retention of the files IS the snapshot (the q285 boundary made
    * composable). */
  def compactWithRetention(spark: SparkSession, dataDir: String,
      snapDir: String, survivors: DataFrame): Int =
    compactWithRetentionHooked(spark, dataDir, snapDir, survivors,
      Int.MaxValue)

  /** [[compactWithRetention]] with the spec's crash-injection hook:
    * die after `crashAfterMoves` retention renames — inside the
    * journal's window. */
  private[graft] def compactWithRetentionHooked(spark: SparkSession,
      dataDir: String, snapDir: String, survivors: DataFrame,
      crashAfterMoves: Int): Int =
    graft.operators.EnsureLock.withLock(snapDir) {
      withStoreLock(spark, snapDir, "compaction") {
      // a prior compaction's crash window must be closed before a new
      // plan is computed over half-moved state
      journalRead(spark, snapDir)
        .foreach(p => executePlan(spark, snapDir, p, Int.MaxValue))
      val dataP = new Path(dataDir)
      val fs = fsOf(spark, dataP)
      val tmp = new Path(dataDir + ".compact-tmp")
      survivors.write.mode("overwrite").parquet(tmp.toString)

      val live = ids(spark, snapDir)
      val manifests = live.map(id => id -> manifest(spark, snapDir, id))
      val current = StampSidecar.listDataFiles(spark, dataDir)
        .map(f => f._1 -> f).toMap
      // per-path recorded identity SETS across live manifests: when a
      // bare in-place rewrite landed between snapshots the manifests
      // disagree, and the gate must honor whichever snapshot still
      // pins the LIVE bytes — not the oldest recording (which would
      // fail the gate on a stale stamp and let a still-valid newer
      // snapshot's file die with the data dir)
      val recorded: Map[String, Set[(Long, Long)]] =
        manifests.flatMap(_._2).groupBy(_.path)
          .map { case (p, es) => p -> es.map(e => (e.len, e.mtime)).toSet }
      val toRetain = current.values.toSeq
        .filter { case (p, len, mt) =>
          recorded.get(p).exists(_.contains((len, mt))) }
        .sortBy(_._1)
      // generation ids come from the retained dirs themselves, never
      // from the snapshot count — two compactions without an
      // intervening record() must not share a destination
      val retRoot = new Path(retainedRoot(snapDir))
      val gen = 1 + (if (!fs.exists(retRoot)) 0
        else fs.listStatus(retRoot).toSeq.map(_.getPath.getName)
          .collect { case n if n.startsWith("g") =>
            scala.util.Try(n.drop(1).toInt).toOption }
          .flatten.foldLeft(0)(math.max))
      val destDir = new Path(s"${retainedRoot(snapDir)}/g$gen")
      if (toRetain.nonEmpty && !fs.exists(destDir)) fs.mkdirs(destDir)
      val plan = CompactionPlan(
        toRetain.map { case (p, len, mt) =>
          val dst = new Path(destDir, new Path(p).getName)
          require(!fs.exists(dst),
            s"SnapshotStore: retention destination $dst already exists " +
              "— refusing to plan a colliding move")
          PlannedMove(p, len, mt, StampSidecar.normalize(dst.toString))
        }, StampSidecar.normalize(tmp.toString),
        StampSidecar.normalize(dataDir))
      journalWrite(spark, snapDir, plan)
      executePlan(spark, snapDir, plan, crashAfterMoves)
      }
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
      withStoreLock(spark, snapDir, "expiry") {
      // close any open crash window first: GC over half-rewritten
      // manifests would mis-count references
      journalRead(spark, snapDir)
        .foreach(p => executePlan(spark, snapDir, p, Int.MaxValue))
      val all = ids(spark, snapDir)
      val drop = all.filterNot(keepIds.contains)
      val root = new Path(snapDir)
      val fs = fsOf(spark, root)
      drop.foreach { id =>
        fs.delete(new Path(manifestPath(snapDir, id)), false)
        fs.delete(new Path(recordedAtPath(snapDir, id)), false)
      }
      val retainPrefix = StampSidecar.normalize(retainedRoot(snapDir))
      val stillReferenced = ids(spark, snapDir)
        .flatMap(id => manifest(spark, snapDir, id))
        .map(_.path).filter(_.startsWith(retainPrefix)).toSet
      val collected = StampSidecar
        .listDataFiles(spark, retainedRoot(snapDir))
        .map(_._1).filterNot(stillReferenced.contains)
      collected.foreach(p => fs.delete(new Path(p), false))
      (drop.size, collected.size)
      }
    }

  private def requireIntact(spark: SparkSession,
      m: Seq[StampSidecar.FileStamp], what: String,
      hint: String = ""): Unit = {
    if (m.nonEmpty) {
      val fs = fsOf(spark, new Path(m.head.path))
      // the full (len, mtime) trust boundary — the StampSidecar/q282
      // ledger discipline: a same-length rewrite moves the mtime, and
      // the scaladoc's 'never silently serves a different state'
      // guarantee needs both compared, not just existence+length
      val broken = m.filter { e =>
        val p = new Path(e.path)
        !fs.exists(p) || {
          val st = fs.getFileStatus(p)
          st.getLen != e.len || st.getModificationTime != e.mtime
        }
      }
      require(broken.isEmpty,
        s"SnapshotStore: $what invalidated by a rewrite — missing/" +
          s"changed files: ${broken.map(_.path).mkString(", ")}$hint")
    }
  }
}
