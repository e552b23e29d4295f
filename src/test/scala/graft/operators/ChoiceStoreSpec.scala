package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Laws for the shared corpus stamp every corpus-keyed choice artifact
  * is keyed by ([[ChoiceStore.documentsStamp]]) — including the
  * DOCUMENTED fidelity bound its scaladoc claims (a length-preserving
  * edit escapes the stamp), pinned non-vacuously the way the hard-EM
  * and lemmatizer divergences are.
  */
class ChoiceStoreSpec extends SparkTestBase {

  private def stamp(rows: Seq[(Long, String)]): (Long, Long) = {
    import spark.implicits._
    ChoiceStore.documentsStamp(rows.toDF("doc_id", "text"))
  }

  test("documentsStamp: order independence, insert/delete/length-edit sensitivity, and the documented length-preserving-edit escape") {
    val base = Seq((1L, "alpha"), (2L, "beta"), (7L, "gamma rays"))
    val s0 = stamp(base)
    // ORDER INDEPENDENCE: count + sum are symmetric — the stamp is a
    // property of the SET, so partitioning/shuffle order can't move it
    assert(stamp(base.reverse) === s0)
    assert(stamp(Seq(base(1), base(2), base(0))) === s0)
    // INSERT moves it (row count changes even on residue collision)
    assert(stamp(base :+ (9L, "delta")) !== s0)
    // DELETE moves it
    assert(stamp(base.take(2)) !== s0)
    // a LENGTH-CHANGING edit moves the content sum (same rows)
    val edited = base.updated(0, (1L, "alphaX"))
    assert(stamp(edited)._1 === s0._1)
    assert(stamp(edited)._2 !== s0._2)
    // THE DOCUMENTED ESCAPE (ChoiceStore scaladoc): a byte-length-
    // preserving edit leaves the stamp unchanged — the accepted
    // fidelity bound of a TUNING artifact key, where a rare stale
    // serve costs a marginally sub-optimal dial, never a wrong result.
    // Non-vacuous: the text differs, the stamp does not.
    val preserved = base.updated(0, (1L, "aplha"))
    assert(preserved.head._2 !== base.head._2)
    assert(preserved.head._2.getBytes("UTF-8").length ===
      base.head._2.getBytes("UTF-8").length)
    assert(stamp(preserved) === s0)
    // byte-length (octet_length), not char-length: a multi-byte char
    // substitution of equal CHAR length still moves the stamp — the
    // stamp reads bytes, the strictest cheap signal one column-pruned
    // pass buys
    val multibyte = base.updated(0, (1L, "alphä"))
    assert(multibyte.head._2.length === base.head._2.length)
    assert(stamp(multibyte) !== s0)
    // the DuckDB replay agrees on the engine's own fixture: strlen =
    // bytes (the oracle-side contract documentsStampSql states)
    import spark.implicits._
    val engine = ChoiceStore.documentsStamp(
      graft.Tables.documents(spark, sf0001)
        .select(col("doc_id"), col("text")))
    // recompute locally byte-for-byte (independent of Spark SQL)
    val local = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = local.length.toLong
    val content = local.map { case (id, t) =>
      (id * 31L + t.getBytes("UTF-8").length) % 1048576L }.sum
    assert(engine === ((n, content)))
  }

  test("an EMPTY corpus stamps as (0, 0) instead of NPEing on the NULL sum") {
    // round-11 advice: empty is a normal state for a lake a
    // composition seeds before its first ingest
    assert(stamp(Seq.empty) === ((0L, 0L)))
  }

  test("torn corpus-dial choice artifacts degrade to the cold path instead of throwing") {
    // crash between Spark overwrite's delete and commit = dir present,
    // no readable parquet footer (round-11 advice); all three
    // corpus-keyed readers share the contract
    def torn(path: String): java.io.File = {
      val d = new java.io.File(path)
      def rmrf(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete(); ()
      }
      rmrf(d); d.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(d, "part-00000.parquet").toPath,
        "not a parquet file".getBytes("UTF-8"))
      d
    }
    val base = new java.io.File("target/spec-torn-corpus").getAbsolutePath
    torn(s"$base/bm25")
    assert(Round15Queries.bm25ChoiceRead(spark, s"$base/bm25") === None)
    torn(s"$base/banding")
    assert(DedupQueries.bandingChoiceRead(spark, s"$base/banding") === None)
    torn(s"$base/vocab/curve")
    assert(UnigramQueries.vocabChoiceRead(spark, s"$base/vocab") === None)
  }
}
