package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  def documentsStamp(docs: DataFrame): (Long, Long) = {
    val r = docs
      .agg(count(lit(1)).as("n"),
        sum((col("doc_id") * lit(31L) + octet_length(col("text")))
          % lit(1048576L)).as("content"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** The stamp replay as a DuckDB CTE body over the registered
    * `documents` view (strlen = bytes, matching octet_length). */
  val documentsStampSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS doc_rows,
      |       CAST(sum((doc_id * 31 + strlen(text)) % 1048576) AS BIGINT)
      |         AS doc_content
      |FROM documents""".stripMargin
}
