package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ann.Ann

/** Round-17 batch: operational surfaces over the persisted
  * engine-choice artifacts (the q272/q273/q274/q277 discipline's ops
  * half — reference repo has no counterpart; this is the
  * LLM-data-pipeline extension surface).
  */
object Round17Queries {

  // --------------------------------------------------------------- q278
  /** CHOICE STALENESS AUDIT over ALL FOUR persisted dials — the ops
    * surface the persisted-choice family was missing: one gated query
    * that reports, per dial (BM25 (k1,b), IVF-PQ nprobe, LSH banding,
    * unigram vocabulary), the artifact's persisted stamp (the corpus
    * [[ChoiceStore.documentsStamp]] for the three corpus-keyed dials;
    * the index [[Ann.ivfPqGenerationStamp]] triple for nprobe), its
    * chosen operating point, its sweep cardinality, and whether it is
    * FRESH against the live stamp — what a production deployment
    * monitors nightly to know its tuning artifacts still describe the
    * state they serve.
    *
    * The query is maintenance-then-audit by contract: each dial is
    * first ENSURED (idempotent — warm artifacts pay one stamp pass and
    * a tiny read, the q272 thunk law), so the audit is deterministic
    * for the gate and `fresh` is 1 on every row; the STALE path
    * (fresh = 0) is exercised by [[auditChoices]] directly in
    * Round17QueriesSpec with a perturbed artifact, so the flag is
    * non-vacuous. The oracle is the strongest artifact-content gate in
    * the registry: it independently recomputes both stamps AND all
    * four sweeps+rules (the shared `bm25SweepCtes` /
    * `ivfPqSweepCtesSql` / `bandingChosenSql` / `vocabSweepCtes`
    * replay chains, each inside its own scoped WITH subquery so CTE
    * names never collide), so a corrupted, stale, or hand-edited
    * artifact — wrong stamp, wrong dial, truncated sweep —
    * hash-mismatches in one verdict.
    *
    * 100 TB shape: the audit itself is metadata-scale (four artifact
    * reads + one column-pruned corpus stamp pass + one column-pruned
    * index stamp pass); the ensure verbs amortize exactly as measured
    * in SCALE.md (q272/q273/q277). The output is FOUR rows — the
    * driver-side assembly is the bounded-collect class (|dials| rows,
    * the denseArgmax contract).
    */
  /** Read-only audit core (no ensure — the spec's stale-path surface):
    * rows only for dials whose artifact exists. */
  def auditChoices(s: SparkSession, dir: String): DataFrame = {
    val (dr, dc) = ChoiceStore.documentsStamp(
      Tables.documents(s, dir).select(col("doc_id"), col("text")))
    def fresh(pr: Long, pc: Long): Long = if (pr == dr && pc == dc) 1L else 0L
    val rows =
      Seq.newBuilder[(String, Long, Long, Long, Long, Long, Long, Long)]
    Round15Queries.bm25ChoiceRead(s, Round15Queries.bm25ChoicePath(dir))
      .foreach { c => rows += (("bm25-params", c.docRows, c.docContent, 0L,
        fresh(c.docRows, c.docContent), c.k1Micro, c.bMicro,
        c.sweep.size.toLong)) }
    // the index-keyed dial: persisted generation triple vs the LIVE
    // index stamp (the artifact nests under the index dir, so an
    // existing choice implies an existing index to stamp)
    val idx = AnnQueries.ivfPqIndexPath(dir)
    Ann.ivfPqChoiceRead(s, idx).foreach { c =>
      val (gr, gc, gf) = Ann.ivfPqGenerationStamp(s, idx)
      val f = if (c.genRows == gr && c.genContent == gc &&
        c.genFiles == gf) 1L else 0L
      rows += (("ivfpq-nprobe", c.genRows, c.genContent, c.genFiles, f,
        c.nprobe.toLong, c.targetMicro, c.curve.size.toLong))
    }
    DedupQueries.bandingChoiceRead(s, DedupQueries.bandingChoicePath(dir))
      .foreach { c => rows += (("lsh-banding", c.docRows, c.docContent, 0L,
        fresh(c.docRows, c.docContent), c.bands.toLong,
        c.rowsPerBand.toLong, c.sweep.size.toLong)) }
    UnigramQueries.vocabChoiceRead(s, UnigramQueries.vocabChoicePath(dir))
      .foreach { c => rows += (("unigram-vocab", c.docRows, c.docContent, 0L,
        fresh(c.docRows, c.docContent), c.chosen.toLong, 0L,
        c.curve.size.toLong)) }
    import s.implicits._
    rows.result().toDF("dial", "stamp_rows", "stamp_content",
      "stamp_files", "fresh", "chosen_a", "chosen_b", "n_sweep")
  }

  def q278ChoiceStalenessAudit(s: SparkSession, dir: String): DataFrame = {
    // the nightly composition: every persisted dial ensured warm
    // (idempotent), THEN audited — so the gate is deterministic and
    // the audit's stamps are the live state's
    Round15Queries.prepareBm25ParamsChoice(s, dir)
    val idx = AnnQueries.prepareIvfPq(s, dir)
    Ann.ivfPqEnsureNprobeChoice(s, idx, AnnQueries.PqTopK,
      AnnQueries.NprobeTarget, AnnQueries.NprobeSweep,
      () => AnnQueries.querySubset(s, dir), () => AnnQueries.emb(s, dir))
    DedupQueries.prepareBandingChoice(s, dir)
    UnigramQueries.prepareVocabChoice(s, dir)
    auditChoices(s, dir).orderBy(col("dial"))
  }

  /** The oracle recomputes both stamps and ALL FOUR sweeps+rules in
    * scoped subqueries (each dial's shared replay chain runs inside
    * its own WITH scope, so CTE names never collide). Parameterized by
    * the gate dir because the nprobe branch replays the sweep from the
    * index artifacts materialized FOR that dir (the q272 convention).
    */
  def q278SqlFor(sfDir: String): String = {
    def indent(sql: String): String = sql.linesIterator.mkString("\n  ")
    val idx = AnnQueries.ivfPqIndexPath(sfDir)
    val dstampSub = ChoiceStore.documentsStampSql.linesIterator
      .mkString("\n     ")
    s"""SELECT a.dial, a.stamp_rows, a.stamp_content, a.stamp_files,
       |       CAST(1 AS BIGINT) AS fresh, a.chosen_a, a.chosen_b, a.n_sweep
       |FROM (
       |  SELECT 'bm25-params' AS dial,
       |         ds.doc_rows AS stamp_rows, ds.doc_content AS stamp_content,
       |         CAST(0 AS BIGINT) AS stamp_files,
       |         bm.k1_micro AS chosen_a, bm.b_micro AS chosen_b,
       |         CAST(${Round15Queries.bm25GridPoints.size} AS BIGINT)
       |           AS n_sweep
       |  FROM (
       |  ${indent(Round15Queries.bm25SweepCtes)}
       |  SELECT CAST(k1_micro AS BIGINT) AS k1_micro,
       |         CAST(b_micro AS BIGINT) AS b_micro FROM chosen) bm
       |  CROSS JOIN ($dstampSub) ds
       |  UNION ALL
       |  SELECT 'ivfpq-nprobe' AS dial,
       |         nb.gen_rows AS stamp_rows, nb.gen_content AS stamp_content,
       |         nb.gen_files AS stamp_files,
       |         nb.np AS chosen_a,
       |         CAST(${math.round(AnnQueries.NprobeTarget * 1e6)} AS BIGINT)
       |           AS chosen_b,
       |         CAST(${AnnQueries.NprobeSweep.size} AS BIGINT) AS n_sweep
       |  FROM (
       |  ${indent(AnnQueries.ivfPqSweepCtesSql(idx))},
       |  recalls AS (
       |    SELECT n.np,
       |           coalesce(h.n_hits, 0) / nullif(CAST(t.n AS DOUBLE), 0)
       |             AS rec
       |    FROM nps n LEFT JOIN hits h ON h.np = n.np CROSS JOIN tot t),
       |  chosen AS (
       |    SELECT coalesce(
       |      (SELECT min(np) FROM recalls
       |       WHERE rec >= ${AnnQueries.NprobeTarget}),
       |      (SELECT max(np) FROM recalls)) AS np),
       |  ${indent(AnnQueries.stampCteSql(idx))}
       |  SELECT CAST(c.np AS BIGINT) AS np,
       |         st.gen_rows, st.gen_content, st.gen_files
       |  FROM chosen c CROSS JOIN stamp st) nb
       |  UNION ALL
       |  SELECT 'lsh-banding' AS dial,
       |         ds.doc_rows AS stamp_rows, ds.doc_content AS stamp_content,
       |         CAST(0 AS BIGINT) AS stamp_files,
       |         bd.bands AS chosen_a, bd.rows_per_band AS chosen_b,
       |         CAST(${DedupQueries.SweepConfigs.size} AS BIGINT) AS n_sweep
       |  FROM (
       |  ${indent(DedupQueries.bandingChosenSql)}) bd
       |  CROSS JOIN ($dstampSub) ds
       |  UNION ALL
       |  SELECT 'unigram-vocab' AS dial,
       |         ds.doc_rows AS stamp_rows, ds.doc_content AS stamp_content,
       |         CAST(0 AS BIGINT) AS stamp_files,
       |         vc.vocab_size AS chosen_a, CAST(0 AS BIGINT) AS chosen_b,
       |         CAST(${graft.text.UnigramLm.VocabSweep.size} AS BIGINT)
       |           AS n_sweep
       |  FROM (
       |  ${indent(UnigramQueries.vocabSweepCtes)}
       |  SELECT CAST(vocab_size AS BIGINT) AS vocab_size FROM chosenv) vc
       |  CROSS JOIN ($dstampSub) ds
       |) a
       |ORDER BY a.dial""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q278_choice_staleness_audit" -> (q278ChoiceStalenessAudit _))

  def oraclesFor(sfDir: String): Map[String, String] = Map(
    "q278_choice_staleness_audit" -> q278SqlFor(sfDir))
}
