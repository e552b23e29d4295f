package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-17 batch: operational surfaces over the persisted
  * engine-choice artifacts (the q272/q273/q274/q277 discipline's ops
  * half — reference repo has no counterpart; this is the
  * LLM-data-pipeline extension surface).
  */
object Round17Queries {

  // --------------------------------------------------------------- q278
  /** CHOICE STALENESS AUDIT over the three corpus-keyed dials — the
    * ops surface the persisted-choice family was missing: one gated
    * query that reports, per dial (BM25 (k1,b), LSH banding, unigram
    * vocabulary), the artifact's persisted corpus stamp, its chosen
    * operating point, its sweep cardinality, and whether it is FRESH
    * against the live [[ChoiceStore.documentsStamp]] — what a
    * production deployment monitors nightly to know its tuning
    * artifacts still describe the corpus they serve.
    *
    * The query is maintenance-then-audit by contract: each dial is
    * first ENSURED (idempotent — warm artifacts pay one stamp pass and
    * a tiny read, the q272 thunk law), so the audit is deterministic
    * for the gate and `fresh` is 1 on every row; the STALE path
    * (fresh = 0) is exercised by [[auditChoices]] directly in
    * Round17QueriesSpec with a perturbed artifact, so the flag is
    * non-vacuous. The oracle is the strongest artifact-content gate in
    * the registry: it independently recomputes the corpus stamp AND
    * all three sweeps+rules (the shared `bm25SweepCtes` /
    * `bandingChosenSql` / `vocabSweepCtes` replay chains), so a
    * corrupted, stale, or hand-edited artifact — wrong stamp, wrong
    * dial, truncated sweep — hash-mismatches in one verdict.
    *
    * 100 TB shape: the audit itself is metadata-scale (three artifact
    * reads + one column-pruned stamp pass); the ensure verbs amortize
    * exactly as measured in SCALE.md (q272/q273/q277). The output is
    * THREE rows — the driver-side assembly is the bounded-collect
    * class (|dials| rows, the denseArgmax contract).
    */
  /** Read-only audit core (no ensure — the spec's stale-path surface):
    * rows only for dials whose artifact exists. */
  def auditChoices(s: SparkSession, dir: String): DataFrame = {
    val (dr, dc) = ChoiceStore.documentsStamp(
      Tables.documents(s, dir).select(col("doc_id"), col("text")))
    def fresh(pr: Long, pc: Long): Long = if (pr == dr && pc == dc) 1L else 0L
    val rows = Seq.newBuilder[(String, Long, Long, Long, Long, Long, Long)]
    Round15Queries.bm25ChoiceRead(s, Round15Queries.bm25ChoicePath(dir))
      .foreach { c => rows += (("bm25-params", c.docRows, c.docContent,
        fresh(c.docRows, c.docContent), c.k1Micro, c.bMicro,
        c.sweep.size.toLong)) }
    DedupQueries.bandingChoiceRead(s, DedupQueries.bandingChoicePath(dir))
      .foreach { c => rows += (("lsh-banding", c.docRows, c.docContent,
        fresh(c.docRows, c.docContent), c.bands.toLong,
        c.rowsPerBand.toLong, c.sweep.size.toLong)) }
    UnigramQueries.vocabChoiceRead(s, UnigramQueries.vocabChoicePath(dir))
      .foreach { c => rows += (("unigram-vocab", c.docRows, c.docContent,
        fresh(c.docRows, c.docContent), c.chosen.toLong, 0L,
        c.curve.size.toLong)) }
    import s.implicits._
    rows.result().toDF("dial", "doc_rows", "doc_content", "fresh",
      "chosen_a", "chosen_b", "n_sweep")
  }

  def q278ChoiceStalenessAudit(s: SparkSession, dir: String): DataFrame = {
    // the nightly composition: every corpus-keyed dial ensured warm
    // (idempotent), THEN audited — so the gate is deterministic and
    // the audit's stamps are the live corpus'
    Round15Queries.prepareBm25ParamsChoice(s, dir)
    DedupQueries.prepareBandingChoice(s, dir)
    UnigramQueries.prepareVocabChoice(s, dir)
    auditChoices(s, dir).orderBy(col("dial"))
  }

  /** The oracle recomputes the stamp and ALL THREE sweeps+rules in
    * scoped subqueries (each dial's shared replay chain runs inside
    * its own WITH scope, so CTE names never collide). */
  val q278Sql: String = {
    def indent(sql: String): String = sql.linesIterator.mkString("\n  ")
    s"""WITH dstamp AS (${ChoiceStore.documentsStampSql})
       |SELECT a.dial, ds.doc_rows, ds.doc_content,
       |       CAST(1 AS BIGINT) AS fresh,
       |       a.chosen_a, a.chosen_b, a.n_sweep
       |FROM (
       |  SELECT 'bm25-params' AS dial,
       |         bm.k1_micro AS chosen_a, bm.b_micro AS chosen_b,
       |         CAST(${Round15Queries.bm25GridPoints.size} AS BIGINT)
       |           AS n_sweep
       |  FROM (
       |  ${indent(Round15Queries.bm25SweepCtes)}
       |  SELECT CAST(k1_micro AS BIGINT) AS k1_micro,
       |         CAST(b_micro AS BIGINT) AS b_micro FROM chosen) bm
       |  UNION ALL
       |  SELECT 'lsh-banding' AS dial,
       |         bd.bands AS chosen_a, bd.rows_per_band AS chosen_b,
       |         CAST(${DedupQueries.SweepConfigs.size} AS BIGINT) AS n_sweep
       |  FROM (
       |  ${indent(DedupQueries.bandingChosenSql)}) bd
       |  UNION ALL
       |  SELECT 'unigram-vocab' AS dial,
       |         vc.vocab_size AS chosen_a, CAST(0 AS BIGINT) AS chosen_b,
       |         CAST(${graft.text.UnigramLm.VocabSweep.size} AS BIGINT)
       |           AS n_sweep
       |  FROM (
       |  ${indent(UnigramQueries.vocabSweepCtes)}
       |  SELECT CAST(vocab_size AS BIGINT) AS vocab_size FROM chosenv) vc
       |) a CROSS JOIN dstamp ds
       |ORDER BY a.dial""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q278_choice_staleness_audit" -> (q278ChoiceStalenessAudit _))

  val oracles: Map[String, String] = Map(
    "q278_choice_staleness_audit" -> q278Sql)
}
