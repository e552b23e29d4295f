package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ann.Ann

/** Laws for the persisted-choice ops surface (q278): the audit agrees
  * with the per-dial artifacts, the stale path is real (not the
  * gate's constant), and missing artifacts are absent rather than
  * invented.
  */
class Round17QueriesSpec extends SparkTestBase {

  test("q278: audit rows equal the per-dial artifacts; fresh on the live state; stale and missing paths are real") {
    // the gated composition: ensure-then-audit — four rows, all fresh
    val out = Round17Queries.q278ChoiceStalenessAudit(spark, sf0001)
      .collect()
    assert(out.map(_.getString(0)).toSeq ===
      Seq("bm25-params", "ivfpq-nprobe", "lsh-banding", "unigram-vocab"))
    assert(out.forall(_.getAs[Long]("fresh") == 1L))
    // corpus stamps agree across the three corpus-keyed dials (same
    // corpus, same stamp); the index dial carries a files component
    val corpusRows = out.filter(_.getString(0) != "ivfpq-nprobe")
    assert(corpusRows.map(r => (r.getAs[Long]("stamp_rows"),
      r.getAs[Long]("stamp_content"))).toSet.size === 1)
    assert(corpusRows.forall(_.getAs[Long]("stamp_files") == 0L))
    assert(out.find(_.getString(0) == "ivfpq-nprobe").get
      .getAs[Long]("stamp_files") > 0L)
    // each row IS its artifact's content
    val bm = Round15Queries.bm25ChoiceRead(spark,
      Round15Queries.bm25ChoicePath(sf0001)).get
    val np = Ann.ivfPqChoiceRead(spark,
      AnnQueries.ivfPqIndexPath(sf0001)).get
    val bd = DedupQueries.bandingChoiceRead(spark,
      DedupQueries.bandingChoicePath(sf0001)).get
    val vc = UnigramQueries.vocabChoiceRead(spark,
      UnigramQueries.vocabChoicePath(sf0001)).get
    val byDial = out.map(r => r.getString(0) ->
      (r.getAs[Long]("chosen_a"), r.getAs[Long]("chosen_b"),
        r.getAs[Long]("n_sweep"))).toMap
    assert(byDial("bm25-params") ===
      ((bm.k1Micro, bm.bMicro, bm.sweep.size.toLong)))
    assert(byDial("ivfpq-nprobe") ===
      ((np.nprobe.toLong, np.targetMicro, np.curve.size.toLong)))
    assert(byDial("lsh-banding") ===
      ((bd.bands.toLong, bd.rowsPerBand.toLong, bd.sweep.size.toLong)))
    assert(byDial("unigram-vocab") ===
      ((vc.chosen.toLong, 0L, vc.curve.size.toLong)))

    // STALE path (the read-only audit, no ensure): a perturbed vocab
    // stamp flags exactly that dial, the others stay fresh — the gate's
    // fresh=1 is a verdict, not a constant
    val vPath = UnigramQueries.vocabChoicePath(sf0001)
    import spark.implicits._
    vc.curve.map { case (v, num, den) =>
      (vc.docRows + 1, vc.docContent, vc.budgetMicro, v, num, den,
        v == vc.chosen)
    }.toDF("doc_rows", "doc_content", "budget_micro", "vocab_size",
        "fert_num", "fert_den", "chosen")
      .repartition(1).write.mode("overwrite").parquet(s"$vPath/curve")
    val stale = Round17Queries.auditChoices(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("fresh")).toMap
    assert(stale ===
      Map("bm25-params" -> 1L, "ivfpq-nprobe" -> 1L,
        "lsh-banding" -> 1L, "unigram-vocab" -> 0L))
    // the gated composition REPAIRS it: ensure re-measures under the
    // live stamp, audit returns to all-fresh with the same choice
    val repaired = Round17Queries.q278ChoiceStalenessAudit(spark, sf0001)
      .collect()
    assert(repaired.forall(_.getAs[Long]("fresh") == 1L))
    assert(repaired.find(_.getString(0) == "unigram-vocab").get
      .getAs[Long]("chosen_a") === vc.chosen.toLong)

    // MISSING path: a deleted artifact yields NO row (absent, never
    // invented), and the other dials still audit
    val fs = new org.apache.hadoop.fs.Path(vPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(vPath), true)
    val missing = Round17Queries.auditChoices(spark, sf0001).collect()
    assert(missing.map(_.getString(0)).sorted.toSeq ===
      Seq("bm25-params", "ivfpq-nprobe", "lsh-banding"))
    // leave the artifact warm for any later suite (the composition
    // restores it)
    UnigramQueries.prepareVocabChoice(spark, sf0001)
  }

  test("q280 corpus-ingest cycle: ingest moves the corpus stamp, exactly the corpus-keyed dials re-measure once, and the lake converges") {
    val out = Round17Queries.q280CorpusIngestCycle(spark, sf0001).collect()
    assert(out.map(_.getString(0)).toSeq ===
      Seq("bm25-params", "ivfpq-nprobe", "lsh-banding", "unigram-vocab"))
    val byDial = out.map(r => r.getString(0) -> r).toMap
    // the full-corpus stamp the lake must land on (append restores
    // exactly the held-out rows — lake content ≡ documents)
    val (fr, fc) = ChoiceStore.documentsStamp(
      graft.Tables.documents(spark, sf0001)
        .select(col("doc_id"), col("text")))
    for (d <- Seq("bm25-params", "lsh-banding", "unigram-vocab")) {
      val r = byDial(d)
      assert(r.getAs[Long]("corpus_keyed") === 1L)
      // the ingest made the dial stale (base ≠ post stamp, COMPUTED)
      assert(r.getAs[Long]("stale_after_ingest") === 1L)
      assert((r.getAs[Long]("base_rows"), r.getAs[Long]("base_content"))
        !== ((r.getAs[Long]("post_rows"), r.getAs[Long]("post_content"))))
      // exactly ONE re-measure on ingest, NONE on the second run —
      // observed counts, not asserted constants
      assert(r.getAs[Long]("measured_on_ingest") === 1L, d)
      assert(r.getAs[Long]("measured_second_run") === 0L, d)
      assert((r.getAs[Long]("post_rows"), r.getAs[Long]("post_content"))
        === ((fr, fc)), s"$d: lake post-stamp ≡ full documents stamp")
    }
    // the index-keyed dial never went stale and never re-measured:
    // a documents-side ingest touches NOTHING index-shaped
    val np = byDial("ivfpq-nprobe")
    assert(np.getAs[Long]("corpus_keyed") === 0L)
    assert(np.getAs[Long]("stale_after_ingest") === 0L)
    assert(np.getAs[Long]("measured_on_ingest") === 0L)
    assert(np.getAs[Long]("measured_second_run") === 0L)
    assert((np.getAs[Long]("base_rows"), np.getAs[Long]("base_content"))
      === ((np.getAs[Long]("post_rows"), np.getAs[Long]("post_content"))))
    // CONVERGENCE pinned independently with throwing thunks: after
    // the cycle every lake artifact is warm for the full-lake state
    val lake = Round17Queries.lakePath(sf0001)
    Round15Queries.ensureBm25ParamsChoice(spark, lake,
      () => sys.error("bm25 re-measured on a converged lake"))
    DedupQueries.ensureBandingChoice(spark, lake,
      () => sys.error("banding re-measured on a converged lake"))
    UnigramQueries.ensureVocabChoice(spark, lake,
      () => sys.error("vocab re-measured on a converged lake"))
    // and the re-measured choices EQUAL the standard full-corpus
    // choices (same rows ⇒ same sweep ⇒ same rule ⇒ same dial) — the
    // equivalence the oracle's standard-chain replay relies on
    Round15Queries.prepareBm25ParamsChoice(spark, sf0001)
    DedupQueries.prepareBandingChoice(spark, sf0001)
    UnigramQueries.prepareVocabChoice(spark, sf0001)
    val bm = Round15Queries.bm25ChoiceRead(spark,
      Round15Queries.bm25ChoicePath(sf0001)).get
    val bd = DedupQueries.bandingChoiceRead(spark,
      DedupQueries.bandingChoicePath(sf0001)).get
    val vc = UnigramQueries.vocabChoiceRead(spark,
      UnigramQueries.vocabChoicePath(sf0001)).get
    assert((byDial("bm25-params").getAs[Long]("chosen_a"),
      byDial("bm25-params").getAs[Long]("chosen_b"))
      === ((bm.k1Micro, bm.bMicro)))
    assert((byDial("lsh-banding").getAs[Long]("chosen_a"),
      byDial("lsh-banding").getAs[Long]("chosen_b"))
      === ((bd.bands.toLong, bd.rowsPerBand.toLong)))
    assert(byDial("unigram-vocab").getAs[Long]("chosen_a")
      === vc.chosen.toLong)
  }

  test("q282 postings-append cycle: one build + one append + convergence; serve ≡ q244 fixed-dial rows") {
    val out = Round17Queries.q282PostingsAppendCycle(spark, sf0001).collect()
    assert(out.nonEmpty)
    // verb contract: exactly one cold build (base), one append
    // (ingest), nothing on the converged third ensure
    assert(out.forall(_.getAs[Long]("builds") == 1L))
    assert(out.forall(_.getAs[Long]("appends") == 1L))
    // stamps: post ≡ the full documents stamp, base ≠ post, and n_new
    // counts exactly the held-out batch
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val (fr, fc) = ChoiceStore.documentsStamp(docs)
    val h = out.head
    assert((h.getAs[Long]("post_rows"), h.getAs[Long]("post_content"))
      === ((fr, fc)))
    assert((h.getAs[Long]("base_rows"), h.getAs[Long]("base_content"))
      !== ((fr, fc)))
    assert(h.getAs[Long]("n_new") ===
      docs.filter(col("doc_id") % Round17Queries.IngestMod
        === Round17Queries.IngestRem).count())
    // the appended-index serve equals q244's fixed-dial rows over the
    // full corpus — the append ≡ rebuild theorem at the query level
    val served = out.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"),
      r.getAs[Long]("n_terms_hit"), r.getAs[Long]("rk"))).toSet
    val q244 = Round15Queries.q244MultiBm25(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("bm25"), r.getAs[Long]("n_terms_hit"),
        r.getAs[Long]("rk"))).toSet
    assert(served === q244)
    // convergence pinned independently: the lake's index is warm
    Round15Queries.ensureBm25IndexIncremental(spark,
      Round17Queries.idxLakePath(sf0001),
      onBuild = () => sys.error("converged index rebuilt"),
      onAppend = _ => sys.error("converged index appended"))
  }

  test("q284 maintenance cycle: SKIP carries the mask, FIRE compacts and truncates, and both branches serve identical rows") {
    import graft.operators.{Round15Queries => R15}
    // the pure rule's boundary arithmetic (exact integers)
    assert(!Round17Queries.chooseIndexRebuild(1L, 8L, 1L, 4L))
    assert(Round17Queries.chooseIndexRebuild(2L, 8L, 1L, 4L))
    assert(Round17Queries.chooseIndexRebuild(3L, 8L, 1L, 4L))
    // gated cycle at the SLO threshold (1/4): the ~1/7 delete SKIPs
    val skip = Round17Queries.postingsMaintenanceCycleCore(spark, sf0001,
      Round17Queries.IndexRebuildThrNum, Round17Queries.IndexRebuildThrDen)
      .collect()
    assert(skip.nonEmpty)
    val s0 = skip.head
    assert(s0.getAs[Long]("fire") === 0L)
    assert(s0.getAs[Long]("n_carried") === s0.getAs[Long]("dead_rows"))
    assert(s0.getAs[Long]("dead_rows") > 0L)
    assert((s0.getAs[Long]("builds"), s0.getAs[Long]("appends"))
      === ((1L, 1L)))
    // SKIP leaves the full corpus indexed
    assert(s0.getAs[Long]("post_rows") === s0.getAs[Long]("live_rows"))
    // a tighter threshold (1/8 < 1/7) drives the FIRE branch
    val fire = Round17Queries.postingsMaintenanceCycleCore(spark, sf0001,
      1L, 8L).collect()
    val f0 = fire.head
    assert(f0.getAs[Long]("fire") === 1L)
    assert(f0.getAs[Long]("n_carried") === 0L, "FIRE truncates tombstones")
    assert((f0.getAs[Long]("builds"), f0.getAs[Long]("appends"))
      === ((2L, 1L)), "FIRE rebuilds once more")
    // the compact really shrank the indexed corpus to the survivors
    assert(f0.getAs[Long]("post_rows") ===
      f0.getAs[Long]("live_rows") - f0.getAs[Long]("dead_rows"))
    // BRANCH INVARIANCE observed end-to-end: both branches serve the
    // identical ranking (masked serve ≡ post-compact rebuild serve)
    def serveRows(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("bm25"), r.getAs[Long]("n_terms_hit"),
        r.getAs[Long]("rk"))).toSet
    assert(serveRows(skip) === serveRows(fire))
    // and no tombstoned doc surfaces on either branch
    val dead = graft.Tables.documents(spark, sf0001).select(col("doc_id"))
      .filter(col("doc_id") % R15.Bm25DeleteMod === R15.Bm25DeleteRem)
      .collect().map(_.getLong(0)).toSet
    assert(!serveRows(skip).exists(t => dead(t._2)))
  }

  test("retention-composed cycle: FIRE compacts through the retention verb — every prior snapshot stays byte-identical across the nightly compaction") {
    import graft.io.SnapshotStore
    val tmp = java.nio.file.Files.createTempDirectory("graft-rmcycle")
      .toFile.getAbsolutePath
    val lake = s"$tmp/lake"
    val snaps = s"$lake/snapshots"
    // the composed cycle at the FIRE-forcing threshold (1/8 < 1/7)
    val fire = Round17Queries.postingsMaintenanceCycleCore(spark, sf0001,
      1L, 8L, lakeOpt = Some(lake), snapDirOpt = Some(snaps)).collect()
    val f0 = fire.head
    assert(f0.getAs[Long]("fire") === 1L)
    // chronology: seed → 1, post-ingest → 2, post-compaction → 3
    assert(SnapshotStore.ids(spark, snaps) === Seq(1, 2, 3))
    def asOf(id: Int) = SnapshotStore.readAsOf(spark, snaps, id)
      .collect().map(_.toSeq).toSet
    val docs = graft.Tables.documents(spark, sf0001).localCheckpoint()
    def expect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    import graft.operators.{Round15Queries => R15}
    // q293's law THROUGH the cycle: snapshots 1 and 2 predate the
    // compaction and must read their exact states from retained files
    assert(asOf(1) === expect(docs.filter(
      col("doc_id") % Round17Queries.IngestMod
        =!= Round17Queries.IngestRem)))
    assert(asOf(2) === expect(docs))
    assert(asOf(3) === expect(docs.filter(
      col("doc_id") % R15.Bm25DeleteMod =!= R15.Bm25DeleteRem)))
    // the current lake is the survivors (the compaction really landed)
    assert(expect(spark.read.parquet(s"$lake/documents.parquet"))
      === asOf(3))
  }

  test("q285 snapshots: as-of reads are byte-exact after appends; ids monotone; rewrites fail loudly") {
    import graft.io.SnapshotStore
    val tmp = java.nio.file.Files.createTempDirectory("graft-snap")
      .toFile.getAbsolutePath
    val lakeDocs = s"$tmp/documents.parquet"
    val snaps = s"$tmp/snapshots"
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    val s1 = SnapshotStore.record(spark, lakeDocs, snaps)
    assert(s1 === 1)
    // capture what a reader sees NOW, before any append
    val before = spark.read.parquet(lakeDocs)
      .collect().map(_.toSeq).toSet
    docs.filter(col("doc_id") % 4 === 3)
      .write.mode("append").parquet(lakeDocs)
    val s2 = SnapshotStore.record(spark, lakeDocs, snaps)
    assert(s2 === 2)
    // the past state is still byte-exactly queryable after the append
    val asOf1 = SnapshotStore.readAsOf(spark, snaps, 1)
      .collect().map(_.toSeq).toSet
    assert(asOf1 === before)
    // ...and snapshot 2 is the current full state
    val asOf2 = SnapshotStore.readAsOf(spark, snaps, 2)
      .collect().map(_.toSeq).toSet
    assert(asOf2 === spark.read.parquet(lakeDocs)
      .collect().map(_.toSeq).toSet)
    assert(asOf1 !== asOf2)
    // the gated 2-row report agrees with direct filtered aggregates
    val out = Round17Queries.q285SnapshotRead(spark, sf0001).collect()
    assert(out.map(_.getAs[Long]("snap_id")).toSeq === Seq(1L, 2L))
    val (fr, fc) = ChoiceStore.documentsStamp(
      graft.Tables.documents(spark, sf0001)
        .select(col("doc_id"), col("text")))
    assert((out(1).getAs[Long]("doc_rows"),
      out(1).getAs[Long]("doc_content")) === ((fr, fc)))
    assert(out(0).getAs[Long]("doc_rows") < fr)
    assert(out(0).getAs[Long]("n_tokens") < out(1).getAs[Long]("n_tokens"))
    // REWRITE-FATAL: an overwrite invalidates the snapshot LOUDLY
    docs.filter(col("doc_id") % 4 === 0).localCheckpoint()
      .write.mode("overwrite").parquet(lakeDocs)
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.readAsOf(spark, snaps, 1)
    }
    assert(e.getMessage.contains("invalidated by a rewrite"))
  }

  test("q286 deltas: the cursor law asOf(a) ∪ delta(a,b) ≡ asOf(b); deltas are disjoint and exactly the batch") {
    import graft.io.SnapshotStore
    val tmp = java.nio.file.Files.createTempDirectory("graft-delta")
      .toFile.getAbsolutePath
    val lakeDocs = s"$tmp/documents.parquet"
    val snaps = s"$tmp/snapshots"
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    docs.filter(col("doc_id") % 4 === 3)
      .write.mode("append").parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val asOf1 = rows(SnapshotStore.readAsOf(spark, snaps, 1))
    val asOf2 = rows(SnapshotStore.readAsOf(spark, snaps, 2))
    val d01 = rows(SnapshotStore.readDelta(spark, snaps, 0, 1))
    val d12 = rows(SnapshotStore.readDelta(spark, snaps, 1, 2))
    // the cursor law, both intervals
    assert(d01 === asOf1)
    assert(asOf1.union(d12) === asOf2)
    // intervals are disjoint (no double-processing) and non-vacuous
    assert(asOf1.intersect(d12).isEmpty)
    assert(d12.nonEmpty)
    // the delta IS the ingested batch, byte-exact
    assert(d12 === rows(docs.filter(col("doc_id") % 4 === 3)))
    // skipping intermediate snapshots composes: delta(0,2) = everything
    assert(rows(SnapshotStore.readDelta(spark, snaps, 0, 2)) === asOf2)
    // the gated report's second interval equals the batch aggregates
    val out = Round17Queries.q286SnapshotDelta(spark, sf0001).collect()
    assert(out.map(r => (r.getAs[Long]("from_snap"),
      r.getAs[Long]("to_snap"))).toSeq === Seq((0L, 1L), (1L, 2L)))
    val batch = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") % Round17Queries.IngestMod
        === Round17Queries.IngestRem)
    val (br, bc) = ChoiceStore.documentsStamp(batch)
    assert((out(1).getAs[Long]("doc_rows"),
      out(1).getAs[Long]("doc_content")) === ((br, bc)))
  }

  test("q288 split: total+disjoint, deterministic, ingest-stable, decorrelated from the pipeline's id classes, plausibly balanced") {
    val out = Round17Queries.q288SplitAssign(spark, sf001).collect()
    val docs = graft.Tables.documents(spark, sf001)
    // TOTAL: every doc assigned exactly once
    assert(out.length === docs.count())
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length === out.length)
    // the fold→split map is the documented 10/10/80
    out.foreach { r =>
      val expected = r.getAs[Long]("fold") match {
        case 0L => "test"; case 1L => "val"; case _ => "train" }
      assert(r.getAs[String]("split") === expected)
    }
    // DETERMINISM: a rerun assigns identically (pure projection)
    val again = Round17Queries.q288SplitAssign(spark, sf001).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    // INGEST STABILITY: assignment restricted to the base slice equals
    // the full run's restriction — a doc's split never depends on what
    // else is in the corpus (the map-only law observed)
    val full = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("split")).toMap
    val baseIds = docs.filter(col("doc_id") % 4 =!= 3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(baseIds.forall(full.contains))
    // DECORRELATION: each ingest class (% 4) and delete class (% 7)
    // sees all three splits — a raw doc_id % 10 fold would correlate
    for (m <- Seq(4L, 7L); r <- 0L until m) {
      val cls = out.filter(x => x.getAs[Long]("doc_id") % m == r)
        .map(_.getAs[String]("split")).toSet
      assert(cls === Set("test", "val", "train"), s"class %$m=$r")
    }
    // BALANCE: global proportions near 10/10/80 (statistical law; the
    // gate corpus is large enough for a loose band)
    val n = out.length.toDouble
    val test = out.count(_.getAs[String]("split") == "test") / n
    val valF = out.count(_.getAs[String]("split") == "val") / n
    assert(test > 0.05 && test < 0.15, s"test fraction $test")
    assert(valF > 0.05 && valF < 0.15, s"val fraction $valF")
  }

  test("q289 leak-free split: near-dup clusters co-travel (non-vacuously); singletons agree with q288; total") {
    val out = Round17Queries.q289LeakFreeSplit(spark, sf0001).collect()
    val clusters = DedupQueries.q19DupClusters(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component"))
    assert(out.length === clusters.length)
    val split = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("split")).toMap
    // LEAKAGE LAW: same near-dup cluster ⇒ same split, non-vacuously
    // (the corpus is deliberately self-similar — real clusters exist)
    val groups = clusters.groupBy(_._2).values.toSeq
    val dupGroups = groups.filter(_.length > 1)
    assert(dupGroups.nonEmpty, "gate corpus must contain near-dup clusters")
    dupGroups.foreach { g =>
      assert(g.map(d => split(d._1)).toSet.size === 1,
        s"cluster ${g.head._2} split apart")
    }
    // SINGLETON AGREEMENT: a singleton's component is its own doc_id,
    // so its assignment equals q288's exactly
    val q288 = Round17Queries.q288SplitAssign(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val singles = groups.filter(_.length == 1)
    assert(singles.nonEmpty)
    singles.foreach { g =>
      assert(split(g.head._1) === q288(g.head._1))
    }
    // rep_id is the cluster's min-label component
    val repOf = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("rep_id")).toMap
    clusters.foreach { case (id, comp) => assert(repOf(id) === comp) }
  }

  test("q290 as-of serve: the eval captured before the append reproduces byte-for-byte after it") {
    import graft.io.SnapshotStore
    val tmp = java.nio.file.Files.createTempDirectory("graft-asof")
      .toFile.getAbsolutePath
    val lakeDocs = s"$tmp/documents.parquet"
    val snaps = s"$tmp/snapshots"
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") % 4 =!= 3).write.parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    // the eval as it ran when this state was LIVE
    def serve(d: org.apache.spark.sql.DataFrame) =
      Round15Queries.bm25ServeCorpusAtDial(d, 1200000L, 750000L)
        .collect().map(_.toSeq).toSet
    val live = serve(spark.read.parquet(lakeDocs))
    // the corpus moves on...
    docs.filter(col("doc_id") % 4 === 3)
      .write.mode("append").parquet(lakeDocs)
    SnapshotStore.record(spark, lakeDocs, snaps)
    // ...and the pinned eval reproduces exactly
    val asOf = serve(SnapshotStore.readAsOf(spark, snaps, 1)
      .select(col("doc_id"), col("text")))
    assert(asOf === live)
    // non-vacuity: the live state's eval is now DIFFERENT
    val now = serve(spark.read.parquet(lakeDocs))
    assert(now !== live, "the append must change the live eval")
    // the gated report carries the as-of stamp of the base slice
    val out = Round17Queries.q290AsOfServe(spark, sf0001).collect()
    val (br, bc) = ChoiceStore.documentsStamp(
      graft.Tables.documents(spark, sf0001)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % Round17Queries.IngestMod
          =!= Round17Queries.IngestRem))
    assert(out.nonEmpty)
    assert((out.head.getAs[Long]("asof_rows"),
      out.head.getAs[Long]("asof_content")) === ((br, bc)))
    assert(out.forall(_.getAs[Long]("snap_id") == 1L))
  }

  test("q291 dataset card: strata totals reconcile to the corpus; a from-scratch stratum replay agrees") {
    val out = Round17Queries.q291DatasetCard(spark, sf0001).collect()
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("lang", "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // totals reconcile exactly to the corpus
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    assert(out.map(_.getAs[Long]("n_bytes")).sum ===
      docs.map(_._3.getBytes("UTF-8").length.toLong).sum)
    // from-scratch replay of one populated stratum
    def toks(t: String) = t.toLowerCase
      .replaceAll("(\\d|\\W)+", " ").trim.split(" ").filter(_.nonEmpty)
    val (l0, s0, _) = docs.head
    val stratum = docs.filter(d => d._1 == l0 && d._2 == s0)
    val row = out.find(r => r.getAs[String]("lang") == l0 &&
      r.getAs[String]("source") == s0).get
    val allToks = stratum.flatMap(d => toks(d._3))
    assert(row.getAs[Long]("n_docs") === stratum.length.toLong)
    assert(row.getAs[Long]("n_tokens") === allToks.length.toLong)
    assert(row.getAs[Long]("n_terms") === allToks.distinct.length.toLong)
    assert(row.getAs[Double]("mean_tokens") ===
      math.rint(allToks.length.toDouble / stratum.length * 1e6) / 1e6)
  }
}
