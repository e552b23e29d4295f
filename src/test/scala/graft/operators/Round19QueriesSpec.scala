package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-19 laws: the corpus card's incremental ensure — file-append
  * ingests merge batch-sized (never a lake re-tokenize), and every
  * state the pure plan cannot prove append-safe rebuilds cleanly.
  */
class Round19QueriesSpec extends SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("ensureCorpusCardIncremental: cold builds once, warm is a no-verb read, a file append MERGES (≡ one-shot), a removed file rebuilds") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cardinc")
      .toFile.getAbsolutePath
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "source", "text").localCheckpoint()
    docs.filter(col("doc_id") % 3 =!= 0)
      .write.parquet(s"$tmp/documents.parquet")
    var builds = 0; var appends = 0
    def ensure(): String = Round19Queries.ensureCorpusCardIncremental(
      spark, tmp, onBuild = () => builds += 1,
      onAppend = _ => appends += 1)
    val card = ensure() // cold
    assert((builds, appends) === ((1, 0)))
    ensure() // warm — provably no verb
    assert((builds, appends) === ((1, 0)))
    // an ingest lands as NEW files: the ensure must merge the batch,
    // never re-tokenize the lake
    docs.filter(col("doc_id") % 3 === 0)
      .write.mode("append").parquet(s"$tmp/documents.parquet")
    ensure()
    assert((builds, appends) === ((1, 1)))
    // merged card ≡ the one-shot card over the grown corpus
    val oneShot = s"$tmp/oneshot"
    Round18Queries.cardWrite(spark, oneShot,
      spark.read.parquet(s"$tmp/documents.parquet"))
    assert(rows(Round18Queries.cardServe(spark, card))
      === rows(Round18Queries.cardServe(spark, oneShot)))
    // ...and warm again after the merge
    ensure()
    assert((builds, appends) === ((1, 1)))
    // a REMOVED file breaks the intact rule: the plan must rebuild —
    // appending onto a ledger describing vanished bytes would serve
    // volumes for documents that no longer exist
    val victim = new java.io.File(s"$tmp/documents.parquet").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith(".")).head
    assert(victim.delete())
    val crc = new java.io.File(victim.getParentFile,
      s".${victim.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    ensure()
    assert((builds, appends) === ((2, 1)), "a shrunk lake must rebuild")
    val oneShot2 = s"$tmp/oneshot2"
    Round18Queries.cardWrite(spark, oneShot2,
      spark.read.parquet(s"$tmp/documents.parquet"))
    assert(rows(Round18Queries.cardServe(spark, card))
      === rows(Round18Queries.cardServe(spark, oneShot2)))
  }

  test("corpus card crash window: a merge that dies before meta leaves the card torn; the next incremental ensure REBUILDS, never re-adds the batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cardinc2")
      .toFile.getAbsolutePath
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "source", "text").localCheckpoint()
    docs.filter(col("doc_id") % 3 =!= 0)
      .write.parquet(s"$tmp/documents.parquet")
    var builds = 0; var appends = 0
    val card = Round19Queries.ensureCorpusCardIncremental(spark, tmp,
      onBuild = () => builds += 1, onAppend = _ => appends += 1)
    // the ingest merge crashes in the old double-count window
    docs.filter(col("doc_id") % 3 === 0)
      .write.mode("append").parquet(s"$tmp/documents.parquet")
    intercept[RuntimeException] {
      Round18Queries.cardAppendBatch(spark, card,
        docs.filter(col("doc_id") % 3 === 0), crashBeforeMeta = true)
    }
    assert(Round18Queries.cardTorn(spark, card))
    // the incremental ensure resolves torn via REBUILD (stateOk=false
    // forces it through the plan), and the result is the one-shot card
    Round19Queries.ensureCorpusCardIncremental(spark, tmp,
      onBuild = () => builds += 1, onAppend = _ => appends += 1)
    assert((builds, appends) === ((2, 0)),
      "a torn card must rebuild, never merge")
    val oneShot = s"$tmp/oneshot"
    Round18Queries.cardWrite(spark, oneShot,
      spark.read.parquet(s"$tmp/documents.parquet"))
    assert(rows(Round18Queries.cardServe(spark, card))
      === rows(Round18Queries.cardServe(spark, oneShot)))
  }
}
