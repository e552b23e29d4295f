package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.StampSidecar

/** Corpus stamp shared by the persisted corpus-keyed operating-point
  * artifacts (q273's BM25 dials, q274's LSH banding — the documents-
  * table counterpart of [[graft.ann.Ann.ivfPqGenerationStamp]]'s
  * index-generation stamp): a persisted choice is valid FOR a corpus
  * state, and re-measures when the state moves.
  *
  * The stamp is (row count, Σ (doc_id·31 + octet_length(text)) mod
  * 2^20) — one column-pruned pass, all-integer so the DuckDB oracle
  * replays it exactly. Inserts/deletes move the count; edits move the
  * content sum unless the new text has byte-identical length AND the
  * residues collide (the documented fidelity: a length-preserving
  * edit escapes the stamp — acceptable for a TUNING artifact, where
  * the cost of a rare stale serve is a marginally sub-optimal dial,
  * not a wrong result; a deployment wanting edit-exact invalidation
  * swaps in a content hash at one more scan's cost).
  */
object ChoiceStore {

  /** The per-row residue both stamp forms fold — symmetric and
    * associative, so the global sum decomposes exactly into per-file
    * partial sums (what makes the sidecar fast path possible). */
  private def docResidue: Column =
    (col("doc_id") * lit(31L) + octet_length(col("text"))) % lit(1048576L)

  def documentsStamp(docs: DataFrame): (Long, Long) = {
    val r = docs
      .agg(count(lit(1)).as("n"),
        // coalesce: an empty corpus sums to NULL — it must stamp as
        // (0, 0), not NPE (round-11 advice; empty is a normal state
        // for a lake a composition seeds before its first ingest)
        coalesce(sum(docResidue), lit(0L)).as("content"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** [[documentsStamp]] served from a per-file residue sidecar
    * ([[graft.io.StampSidecar]]) — the metadata-scale warm path
    * (round-11 verdict #1): a corpus whose FILES have not moved is
    * re-stamped from a file listing + a tiny TSV, zero data reads;
    * only new/changed files are folded, once. Exactly equal to the
    * content fold (StampSidecarSpec's equivalence law), so every
    * oracle replay ([[documentsStampSql]]) is unchanged. `docsPath`
    * is the parquet location `docs` was read from; `sidecar` lives
    * with the choice artifacts, NEVER beside read-only input data. */
  def documentsStampCached(s: SparkSession, docsPath: String,
      sidecar: String): (Long, Long) = {
    val (rows, content, _) = StampSidecar.stampVia(s, docsPath, sidecar,
      paths => {
        val per = s.read.parquet(paths: _*)
          .select(docResidue.as("res"), input_file_name().as("__f"))
          .groupBy(col("__f"))
          .agg(count(lit(1)).as("n"),
            coalesce(sum(col("res")), lit(0L)).as("content"))
          .collect()
        per.map(r => StampSidecar.normalize(r.getString(0)) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      })
    (rows, content)
  }

  /** Where `dir`'s per-file corpus-stamp sidecar lives — keyed by the
    * dir tag under the engine-owned choice tree (never beside the
    * read-only inputs). Public so index maintenance can snapshot the
    * per-file partials it holds (the q282 ledger). */
  def docStampSidecarFor(dir: String): String =
    new java.io.File(
      s"target/choices/doc-stamp/${PathTag.tagFor(dir)}.tsv")
      .getAbsolutePath

  /** The standard-layout form: stamp `dir`'s documents table with the
    * sidecar at [[docStampSidecarFor]]. */
  def documentsStampCachedFor(s: SparkSession, dir: String): (Long, Long) =
    documentsStampCached(s, s"$dir/documents.parquet",
      docStampSidecarFor(dir))

  /** The stamp replay as a DuckDB CTE body over the registered
    * `documents` view (strlen = bytes, matching octet_length;
    * coalesce mirrors the engine's empty-corpus (0, 0) stamp). */
  val documentsStampSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS doc_rows,
      |       CAST(coalesce(sum((doc_id * 31 + strlen(text)) % 1048576), 0)
      |            AS BIGINT) AS doc_content
      |FROM documents""".stripMargin
}
