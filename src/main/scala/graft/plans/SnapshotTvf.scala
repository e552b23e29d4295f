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

  /** `graft_bm25_masked('<lake dir>', mod, rem)` — the delete-masked
    * BM25 serve (q283's semantics) as a TABLE-VALUED function,
    * completing the SQL-twin convention on the SERVING side (the
    * round-13 verdict's optional #8): a plain SQL user gets the
    * standard synthesized workload ranked over the SURVIVING corpus
    * (tombstones = indexed doc_ids with doc_id % mod = rem), columns
    * (query_id, doc_id, bm25, n_terms_hit, rk), at the fixed
    * production dial. Contract carried over from the DataFrame verbs
    * unchanged:
    *   - the INDEX must already exist for the lake (built offline —
    *     a SQL read never triggers a corpus tokenize; missing index
    *     fails loudly at plan time, the [[graft.operators.Round15Queries
    *     .bm25IndexAppendBatch]] error convention);
    *   - the masked-df artifact is ensured warm-or-computed-once per
    *     (index, tombstone) state and read through the VALIDATED
    *     critical section, so a concurrent masked serve with a
    *     different delete set can never swap states under this one;
    *   - every input is an artifact file: postings partition-pruned
    *     to the workload's buckets, df from the masked artifact, dl +
    *     the 1-row stats — zero corpus text reads.
    */
  /** `graft_card('<card path>')` — the persisted dataset card served
    * as a TABLE-VALUED function: a plain SQL user reads the release
    * datasheet (per-(lang, source) volumes, vocabulary size, mean
    * tokens, the corpus stamp it describes) as a relation. Resolution
    * happens at ANALYSIS, so the card's crash/format discipline
    * carries over unchanged and fires at PLAN time: a TORN card
    * (crashed merge — possibly half-applied volume sums) and a
    * LEGACY-layout card each refuse loudly with their own message; a
    * SQL read never tokenizes a corpus (the card must be ensured
    * offline — [[graft.operators.Round19Queries.ensureCorpusCard]]).
    */
  def cardServePlan(cardPath: String): LogicalPlan =
    graft.operators.Round18Queries.cardServe(SparkSession.active, cardPath)
      .queryExecution.analyzed

  /** `graft_card_drift('<card A>', '<card B>')` — the release drift
    * report ([[graft.operators.Round19Queries.cardDrift]], q308's
    * verb) as a TABLE-VALUED function: per-(lang, source) document/
    * byte/token/term deltas, new and vanished vocabulary, and the
    * status verdict, between any two persisted cards — from one SQL
    * text. Artifact-only by construction (volume tables + bucketed
    * vocab reads; the lakes' text is never touched), so diffing two
    * releases from SQL costs card reads. Both cards resolve through
    * [[cardServePlan]]'s discipline at ANALYSIS: a torn or legacy
    * card on EITHER side refuses loudly at plan time. */
  def cardDriftPlan(aPath: String, bPath: String): LogicalPlan =
    graft.operators.Round19Queries.cardDrift(SparkSession.active,
        aPath, bPath)
      .queryExecution.analyzed

  def maskedServePlan(lakeDir: String, mod: Int, rem: Int): LogicalPlan = {
    require(mod > 0 && rem >= 0 && rem < mod,
      s"graft_bm25_masked: need 0 <= rem < mod, got (mod=$mod, rem=$rem)")
    val s = SparkSession.active
    import org.apache.spark.sql.functions.col
    import graft.operators.{Round14Queries, Round15Queries}
    val idx = Round15Queries.bm25IndexPath(lakeDir)
    require(Round15Queries.bm25IndexRead(s, idx).nonEmpty,
      s"graft_bm25_masked: no readable postings index at $idx — build " +
        "offline first (a SQL serve never pays a corpus tokenize)")
    val tombstones = s.read.parquet(s"$idx/dl").select(col("doc_id"))
      .filter(col("doc_id") % mod.toLong === rem.toLong)
      .localCheckpoint()
    val qt = Round15Queries.multiBm25QueryTableFrom(
      Round15Queries.readMaskedDfValidated(s, idx, tombstones))
    Round15Queries.bm25ServeQueriesFromIndexMasked(s, idx, qt,
        math.round(Round14Queries.Bm25K1 * 1e6),
        math.round(Round14Queries.Bm25B * 1e6), tombstones)
      .drop("k1_micro", "b_micro")
      .queryExecution.analyzed
  }
}
