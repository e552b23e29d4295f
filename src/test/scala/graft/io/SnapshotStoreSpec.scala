package graft.io

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SnapshotStore's retention surface (round 13) and the hardened
  * trust boundary: compaction keeps every live snapshot byte-readable
  * (the table-format retention verb), expiry is the only way retention
  * ends and it stays LOUD, and the (len, mtime) identity check catches
  * same-length rewrites.
  */
class SnapshotStoreSpec extends SparkTestBase {

  private def freshLake(tag: String): (String, String, String) = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-$tag")
      .toFile.getAbsolutePath
    (s"$tmp/documents.parquet", s"$tmp/snapshots", tmp)
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("retained compaction: every prior snapshot byte-identical across the rewrite; current state is the survivors; new snapshots chain on") {
    val (lakeDocs, snaps, _) = freshLake("retain")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    docs.filter(col("doc_id") % 4 === 3)
      .write.mode("append").parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    val asOf1Before = rows(SnapshotStore.readAsOf(spark, snaps, 1))
    val asOf2Before = rows(SnapshotStore.readAsOf(spark, snaps, 2))
    // compact to survivors (drop the 1-in-7 delete set) WITH retention
    val survivors = spark.read.parquet(lakeDocs)
      .filter(col("doc_id") % 7 =!= 5)
    val survRows = rows(survivors)
    val moved = SnapshotStore.compactWithRetention(
      spark, lakeDocs, snaps, survivors)
    assert(moved > 0, "the compaction must have retained the old files")
    // the current state is EXACTLY the survivors
    assert(rows(spark.read.parquet(lakeDocs)) === survRows)
    // ...and every prior snapshot reads byte-identically to before
    assert(rows(SnapshotStore.readAsOf(spark, snaps, 1)) === asOf1Before)
    assert(rows(SnapshotStore.readAsOf(spark, snaps, 2)) === asOf2Before)
    // a post-compaction snapshot chains on and reads the survivors
    val s3 = SnapshotStore.record(spark, lakeDocs, snaps)
    assert(s3 === 3)
    assert(rows(SnapshotStore.readAsOf(spark, snaps, 3)) === survRows)
    // the delta cursor across the rewrite interval fails LOUDLY (the
    // append-only law does not hold over a compaction) while the
    // post-compaction interval works
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.readDelta(spark, snaps, 2, 3)
    }
    assert(e.getMessage.contains("spans a rewrite"))
  }

  test("expiry: expired snapshots fail loudly, kept ones keep reading, retained files GC only once unreferenced") {
    val (lakeDocs, snaps, _) = freshLake("expire")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    docs.filter(col("doc_id") % 4 === 3)
      .write.mode("append").parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    SnapshotStore.compactWithRetention(spark, lakeDocs, snaps,
      spark.read.parquet(lakeDocs).filter(col("doc_id") % 7 =!= 5))
    val asOf2 = rows(SnapshotStore.readAsOf(spark, snaps, 2))
    // expire snapshot 1; snapshot 2 still references retained files
    // from the SAME retention generation, so nothing may be collected
    // that 2 needs — and 2 must still read byte-identically
    val (dropped1, _) = SnapshotStore.expireSnapshots(spark, snaps,
      keepIds = Set(2))
    assert(dropped1 === 1)
    intercept[IllegalArgumentException] {
      SnapshotStore.readAsOf(spark, snaps, 1)
    }
    assert(rows(SnapshotStore.readAsOf(spark, snaps, 2)) === asOf2)
    // expire snapshot 2 too: now the retained files are unreferenced
    // and must be garbage-collected
    val (dropped2, collected2) = SnapshotStore.expireSnapshots(spark,
      snaps, keepIds = Set.empty)
    assert(dropped2 === 1)
    assert(collected2 > 0, "unreferenced retained files must be GC'd")
    assert(StampSidecar.listDataFiles(spark, s"$snaps/retained").isEmpty)
    intercept[IllegalArgumentException] {
      SnapshotStore.readAsOf(spark, snaps, 2)
    }
  }

  test("SQL TVFs: graft_asof/graft_delta equal the DataFrame verbs; literal-argument boundary; rewrite stays loud at plan time") {
    val (lakeDocs, snaps, _) = freshLake("tvf")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    docs.filter(col("doc_id") % 4 === 3)
      .write.mode("append").parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    // the SQL surface ≡ the DataFrame verbs, byte-exact
    assert(rows(spark.sql(s"SELECT * FROM graft_asof('$snaps', 1)"))
      === rows(SnapshotStore.readAsOf(spark, snaps, 1)))
    assert(rows(spark.sql(s"SELECT * FROM graft_delta('$snaps', 1, 2)"))
      === rows(SnapshotStore.readDelta(spark, snaps, 1, 2)))
    // TVFs compose with plain SQL (filter + aggregate over the pin)
    val n = spark.sql(
      s"SELECT count(*) FROM graft_asof('$snaps', 2) WHERE doc_id % 2 = 0")
      .head().getLong(0)
    assert(n === spark.read.parquet(lakeDocs)
      .filter(col("doc_id") % 2 === 0).count())
    // literal-argument boundary: a non-literal snapshot id is a clear
    // analysis-time error, not a runtime surprise
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_asof('$snaps', 1 + 1)").collect()
    }
    assert(e1.getMessage.contains("literal"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_asof('$snaps')").collect()
    }
    assert(e2.getMessage.contains("2 arguments"), e2.getMessage)
    // the rewrite boundary fires at PLAN time through SQL too
    docs.filter(col("doc_id") % 4 === 0).localCheckpoint()
      .write.mode("overwrite").parquet(lakeDocs)
    val e3 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_asof('$snaps', 1)").collect()
    }
    assert(e3.getMessage.contains("invalidated by a rewrite"),
      e3.getMessage)
  }

  test("crash inside the compaction window: reads stay loud and name the journal; recoverCompaction rolls forward to the exact committed state; idempotent") {
    val (lakeDocs, snaps, _) = freshLake("crash")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    docs.filter(col("doc_id") % 4 === 3)
      .write.mode("append").parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    val asOf1Before = rows(SnapshotStore.readAsOf(spark, snaps, 1))
    val asOf2Before = rows(SnapshotStore.readAsOf(spark, snaps, 2))
    val survivors = spark.read.parquet(lakeDocs)
      .filter(col("doc_id") % 7 =!= 5).localCheckpoint()
    val survRows = rows(survivors)
    // die after ONE retention rename — files half-moved, manifests
    // not yet rewritten, survivors not yet swapped in: exactly the
    // window that used to brick every snapshot unrecoverably
    val e0 = intercept[RuntimeException] {
      SnapshotStore.compactWithRetentionHooked(spark, lakeDocs, snaps,
        survivors, crashAfterMoves = 1)
    }
    assert(e0.getMessage.contains("injected crash"))
    // mid-window reads fail LOUDLY and point at the journal (snapshot
    // 2 lists EVERY file, so whichever file moved first breaks it —
    // snapshot 1 might not contain the one moved file)
    val e1 = intercept[IllegalArgumentException] {
      SnapshotStore.readAsOf(spark, snaps, 2)
    }
    assert(e1.getMessage.contains("compaction journal"), e1.getMessage)
    // roll forward: the journaled plan completes exactly
    assert(SnapshotStore.recoverCompaction(spark, snaps))
    assert(rows(SnapshotStore.readAsOf(spark, snaps, 1)) === asOf1Before)
    assert(rows(SnapshotStore.readAsOf(spark, snaps, 2)) === asOf2Before)
    assert(rows(spark.read.parquet(lakeDocs)) === survRows)
    // the journal is gone and a second recover is a no-op
    assert(!SnapshotStore.recoverCompaction(spark, snaps))
  }

  test("crash auto-recovery: the next expiry closes a crashed compaction's window before touching manifests") {
    val (lakeDocs, snaps, _) = freshLake("autorec")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    docs.filter(col("doc_id") % 4 === 3)
      .write.mode("append").parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    val asOf1Before = rows(SnapshotStore.readAsOf(spark, snaps, 1))
    val survivors = spark.read.parquet(lakeDocs)
      .filter(col("doc_id") % 7 =!= 5).localCheckpoint()
    intercept[RuntimeException] {
      SnapshotStore.compactWithRetentionHooked(spark, lakeDocs, snaps,
        survivors, crashAfterMoves = 1)
    }
    // the expiry auto-recovers first, then expires snapshot 2; the
    // kept snapshot reads exactly its pre-crash state
    SnapshotStore.expireSnapshots(spark, snaps, keepIds = Set(1))
    assert(rows(SnapshotStore.readAsOf(spark, snaps, 1)) === asOf1Before)
    intercept[IllegalArgumentException] {
      SnapshotStore.readAsOf(spark, snaps, 2)
    }
  }

  test("identity gate honors ANY live manifest: after an in-place rewrite between snapshots, compaction keeps the newer snapshot readable and the stale one loud") {
    val (lakeDocs, snaps, _) = freshLake("ident")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    // a bare IN-PLACE rewrite lands between snapshots: one data file's
    // bytes are replaced (still valid parquet — a one-row table of the
    // same schema) at the SAME path; snapshot 1 is invalidated, and
    // snapshot 2 records the file's NEW identity
    val victim = new java.io.File(lakeDocs).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith(".")).minBy(_.getName)
    val replDir = java.nio.file.Files
      .createTempDirectory("graft-repl").toFile.getAbsolutePath
    docs.filter(col("doc_id") % 4 === 3).limit(1).repartition(1)
      .write.mode("overwrite").parquet(replDir)
    val replFile = new java.io.File(replDir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(replFile.toPath, victim.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // the in-place rewrite bypassed Hadoop's checksumming — drop the
    // stale sidecar .crc or the local fs fails the read on checksum,
    // not on the identity boundary under test
    val crc = new java.io.File(victim.getParentFile,
      s".${victim.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    SnapshotStore.record(spark, lakeDocs, snaps)
    val asOf2Before = rows(SnapshotStore.readAsOf(spark, snaps, 2))
    intercept[IllegalArgumentException] {
      SnapshotStore.readAsOf(spark, snaps, 1) // already invalidated
    }
    // compaction: the live bytes match snapshot 2's recorded identity
    // (not snapshot 1's) — the gate must retain the file for 2, not
    // drop it because the OLDEST recording disagrees
    SnapshotStore.compactWithRetention(spark, lakeDocs, snaps,
      spark.read.parquet(lakeDocs).filter(col("doc_id") % 7 =!= 5)
        .localCheckpoint())
    assert(rows(SnapshotStore.readAsOf(spark, snaps, 2)) === asOf2Before)
    // ...and snapshot 1 keeps failing loudly — never laundered
    intercept[IllegalArgumentException] {
      SnapshotStore.readAsOf(spark, snaps, 1)
    }
  }

  test("record fencing: a foreign claim on the next id fails the record loudly; a successful record leaves no claim behind") {
    val (lakeDocs, snaps, _) = freshLake("fence")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    // a second WRITER PROCESS claimed id 2 (simulated by its O_EXCL
    // claim file): this recorder must fail loudly, never overwrite
    val claim = new java.io.File(SnapshotStore.claimPath(snaps, 2))
    assert(claim.createNewFile())
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.record(spark, lakeDocs, snaps)
    }
    assert(e.getMessage.contains("claimed"), e.getMessage)
    assert(SnapshotStore.ids(spark, snaps) === Seq(1))
    // operator clears the stale claim → the record goes through and
    // cleans up after itself
    assert(claim.delete())
    assert(SnapshotStore.record(spark, lakeDocs, snaps) === 2)
    assert(!claim.exists())
  }

  test("store lock: a foreign lock blocks compaction and expiry loudly; both release the lock on completion") {
    val (lakeDocs, snaps, _) = freshLake("storelock")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    val survivors = spark.read.parquet(lakeDocs)
      .filter(col("doc_id") % 7 =!= 5).localCheckpoint()
    // a second writer process holds the store lock (simulated by its
    // O_EXCL file): the mutating verbs must fail loudly, touch nothing
    val lock = new java.io.File(SnapshotStore.storeLockPath(snaps))
    assert(lock.createNewFile())
    val e1 = intercept[IllegalArgumentException] {
      SnapshotStore.compactWithRetention(spark, lakeDocs, snaps, survivors)
    }
    assert(e1.getMessage.contains("store.lock"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      SnapshotStore.expireSnapshots(spark, snaps, Set(1))
    }
    assert(e2.getMessage.contains("store.lock"), e2.getMessage)
    // the snapshot chain is untouched by the refused verbs
    SnapshotStore.readAsOf(spark, snaps, 1).collect()
    // cleared lock → the verbs run and release it behind themselves
    assert(lock.delete())
    SnapshotStore.compactWithRetention(spark, lakeDocs, snaps, survivors)
    assert(!lock.exists())
    SnapshotStore.expireSnapshots(spark, snaps, Set(1))
    assert(!lock.exists())
    SnapshotStore.readAsOf(spark, snaps, 1).collect()
  }

  test("retention generations are derived from the retained dirs, not the snapshot count — successive compactions never share a destination") {
    val (lakeDocs, snaps, _) = freshLake("gen")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    SnapshotStore.compactWithRetention(spark, lakeDocs, snaps,
      spark.read.parquet(lakeDocs).filter(col("doc_id") % 7 =!= 5)
        .localCheckpoint())
    SnapshotStore.record(spark, lakeDocs, snaps)
    SnapshotStore.compactWithRetention(spark, lakeDocs, snaps,
      spark.read.parquet(lakeDocs).filter(col("doc_id") % 7 =!= 6)
        .localCheckpoint())
    val gens = new java.io.File(s"$snaps/retained").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(gens.size === gens.distinct.size)
    assert(gens.size >= 2, s"expected two generations, got $gens")
    // both snapshots still read across both compactions
    SnapshotStore.readAsOf(spark, snaps, 1).collect()
    SnapshotStore.readAsOf(spark, snaps, 2).collect()
  }

  test("recovery is store-locked: a foreign store.lock blocks standalone recoverCompaction loudly; cleared, recovery completes and releases the lock") {
    val (lakeDocs, snaps, _) = freshLake("reclock")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    val asOf1Before = rows(SnapshotStore.readAsOf(spark, snaps, 1))
    val survivors = spark.read.parquet(lakeDocs)
      .filter(col("doc_id") % 7 =!= 5).localCheckpoint()
    intercept[RuntimeException] {
      SnapshotStore.compactWithRetentionHooked(spark, lakeDocs, snaps,
        survivors, crashAfterMoves = 1)
    }
    // another process's mutating verb (compaction/expiry — whose entry
    // auto-recovery would roll the same journal forward) holds the
    // store lock: standalone recovery must NOT interleave the swap
    val lock = new java.io.File(SnapshotStore.storeLockPath(snaps))
    assert(lock.createNewFile())
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.recoverCompaction(spark, snaps)
    }
    assert(e.getMessage.contains("store.lock"), e.getMessage)
    // the crash window is untouched by the refused verb — the journal
    // is still there and the operator flow (clear lock, recover) works
    assert(lock.delete())
    assert(SnapshotStore.recoverCompaction(spark, snaps))
    assert(!lock.exists())
    assert(rows(SnapshotStore.readAsOf(spark, snaps, 1)) === asOf1Before)
  }

  test("record is fenced by an open crash window: a present compaction journal refuses the record loudly; recovery reopens it") {
    val (lakeDocs, snaps, _) = freshLake("recwin")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    val survivors = spark.read.parquet(lakeDocs)
      .filter(col("doc_id") % 7 =!= 5).localCheckpoint()
    val survRows = rows(survivors)
    intercept[RuntimeException] {
      SnapshotStore.compactWithRetentionHooked(spark, lakeDocs, snaps,
        survivors, crashAfterMoves = 1)
    }
    // inside the window, a record would pin pre-swap files the
    // roll-forward is about to delete — it must refuse, not brick
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.record(spark, lakeDocs, snaps)
    }
    assert(e.getMessage.contains("compaction journal"), e.getMessage)
    assert(SnapshotStore.ids(spark, snaps) === Seq(1))
    // recovery closes the window; the record then chains on cleanly
    assert(SnapshotStore.recoverCompaction(spark, snaps))
    assert(SnapshotStore.record(spark, lakeDocs, snaps) === 2)
    assert(rows(SnapshotStore.readAsOf(spark, snaps, 2)) === survRows)
  }

  test("journal hygiene: a plan whose path carries a tab/newline is rejected at plan time, before any rename") {
    val (_, snaps, tmp) = freshLake("tabpath")
    val plan = SnapshotStore.CompactionPlan(
      Seq(SnapshotStore.PlannedMove(s"$tmp/a\tb.parquet", 1L, 2L,
        s"$tmp/retained/a.parquet")),
      s"$tmp/docs.compact-tmp", s"$tmp/docs")
    val e = intercept[RuntimeException] {
      SnapshotStore.journalWrite(spark, snaps, plan)
    }
    assert(e.getMessage.contains("tab"), e.getMessage)
    // nothing was journaled — the window never opened
    assert(SnapshotStore.journalRead(spark, snaps).isEmpty)
  }

  test("hasSnapshot: false exactly for expired/never-recorded ids; an invalidated snapshot still HAS its manifest and reads loud, never quiet-zero") {
    val (lakeDocs, snaps, _) = freshLake("probe")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    docs.filter(col("doc_id") % 4 === 3)
      .write.mode("append").parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    assert(SnapshotStore.hasSnapshot(spark, snaps, 1))
    assert(SnapshotStore.hasSnapshot(spark, snaps, 2))
    assert(!SnapshotStore.hasSnapshot(spark, snaps, 3))
    SnapshotStore.expireSnapshots(spark, snaps, keepIds = Set(2))
    assert(!SnapshotStore.hasSnapshot(spark, snaps, 1), "expired")
    // an injected rewrite INVALIDATES snapshot 2 without expiring it:
    // the probe stays true and the read stays loud — the q300 slot
    // reader composes these so corruption can never masquerade as a
    // retention decision
    val one = new java.io.File(lakeDocs).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith(".")).head
    assert(one.setLastModified(one.lastModified() + 2000L))
    assert(SnapshotStore.hasSnapshot(spark, snaps, 2))
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.readAsOf(spark, snaps, 2)
    }
    assert(e.getMessage.contains("invalidated by a rewrite"))
    // ...and the gated reader itself THROWS on the invalidated slot
    // while folding the expired one quiet (the round-14 advisory)
    assert(graft.operators.Round18Queries
      .snapshotSlotStamp(spark, snaps, 1) === ((0L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      graft.operators.Round18Queries.snapshotSlotStamp(spark, snaps, 2)
    }
  }

  test("recorded-at stamp: explicit millis read back exactly; default records wall clock; expiry GCs the stamp; a pre-stamp snapshot reads as unknown age") {
    val (lakeDocs, snaps, _) = freshLake("recat")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    val before = System.currentTimeMillis()
    SnapshotStore.record(spark, lakeDocs, snaps) // wall clock
    val after = System.currentTimeMillis()
    val at1 = SnapshotStore.recordedAt(spark, snaps, 1)
    assert(at1.exists(a => a >= before && a <= after), s"$at1")
    docs.filter(col("doc_id") % 4 === 3)
      .write.mode("append").parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps,
      recordedAtMillis = 86400000L)
    assert(SnapshotStore.recordedAt(spark, snaps, 2) === Some(86400000L))
    // a snapshot from a pre-stamp layout: no sidecar → unknown age
    assert(new java.io.File(
      SnapshotStore.recordedAtPath(snaps, 1)).delete())
    assert(SnapshotStore.recordedAt(spark, snaps, 1).isEmpty)
    // expiry garbage-collects the stamp with the manifest
    SnapshotStore.expireSnapshots(spark, snaps, keepIds = Set(1))
    assert(SnapshotStore.recordedAt(spark, snaps, 2).isEmpty)
    assert(!new java.io.File(
      SnapshotStore.recordedAtPath(snaps, 2)).exists())
  }

  test("trust boundary: a same-length rewrite (mtime moved) fails as-of reads loudly") {
    val (lakeDocs, snaps, _) = freshLake("mtime")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    // simulate a same-length in-place rewrite: bump one data file's
    // mtime without touching its bytes (length unchanged — exactly the
    // escape the round-12 advice named)
    val one = new java.io.File(lakeDocs).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith(".")).head
    assert(one.setLastModified(one.lastModified() + 2000L))
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.readAsOf(spark, snaps, 1)
    }
    assert(e.getMessage.contains("invalidated by a rewrite"))
  }
}
