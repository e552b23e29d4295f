package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-18 laws: the incremental dataset card's exact mergeability —
  * any micro-batch split of the corpus lands on the one-shot card's
  * tables and report bit-exactly (integer sums + distinct-set union),
  * and the meta stamp advances by exactly each batch's contribution.
  */
class Round18QueriesSpec extends SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("incremental card: any batch split converges to the one-shot card; tables set-equal; stamp advances exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-card")
      .toFile.getAbsolutePath
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "source", "text").localCheckpoint()
    // one-shot reference
    val oneShot = s"$tmp/oneshot"
    Round18Queries.cardWrite(spark, oneShot, docs)
    // incremental: seed third, then two uneven batches
    val inc = s"$tmp/inc"
    Round18Queries.cardWrite(spark, inc, docs.filter(col("doc_id") % 3 === 0))
    Round18Queries.cardAppendBatch(spark, inc,
      docs.filter(col("doc_id") % 3 === 1))
    Round18Queries.cardAppendBatch(spark, inc,
      docs.filter(col("doc_id") % 3 === 2))
    // a different split must land identically too
    val inc2 = s"$tmp/inc2"
    Round18Queries.cardWrite(spark, inc2, docs.filter(col("doc_id") < 100))
    Round18Queries.cardAppendBatch(spark, inc2,
      docs.filter(col("doc_id") >= 100))
    for (p <- Seq(inc, inc2)) {
      assert(rows(spark.read.parquet(s"$p/volumes"))
        === rows(spark.read.parquet(s"$oneShot/volumes")), s"$p volumes")
      assert(rows(spark.read.parquet(s"$p/vocab"))
        === rows(spark.read.parquet(s"$oneShot/vocab")), s"$p vocab")
      assert(rows(Round18Queries.cardServe(spark, p))
        === rows(Round18Queries.cardServe(spark, oneShot)), s"$p serve")
    }
    // the stamp is the full-corpus stamp on every path
    val (fr, fc) = ChoiceStore.documentsStamp(
      docs.select(col("doc_id"), col("text")))
    for (p <- Seq(oneShot, inc, inc2)) {
      val m = spark.read.parquet(s"$p/meta").head()
      assert((m.getAs[Long]("doc_rows"), m.getAs[Long]("doc_content"))
        === ((fr, fc)), p)
    }
    // an empty batch is a no-op (stamp unmoved, tables unmoved)
    val before = rows(Round18Queries.cardServe(spark, inc))
    Round18Queries.cardAppendBatch(spark, inc, docs.filter(col("doc_id") < 0))
    assert(rows(Round18Queries.cardServe(spark, inc)) === before)
    // and the served report matches the one-shot q291 rollup semantics
    val direct = Round17Queries.q291DatasetCard(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val served = Round18Queries.cardServe(spark, oneShot)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(served === direct)
  }

  test("card crash discipline: a torn merge refuses to serve AND refuses the retry; ensure resolves to one rebuild, never a double-add") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cardtorn")
      .toFile.getAbsolutePath
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "source", "text").localCheckpoint()
    val base = docs.filter(col("doc_id") % 3 =!= 2)
    val batch = docs.filter(col("doc_id") % 3 === 2)
    val card = s"$tmp/card"
    var builds = 0
    def ensure(d: org.apache.spark.sql.DataFrame): Unit =
      Round18Queries.cardEnsure(spark, card, d, onBuild = () => builds += 1)
    // cold build, then provably-warm re-ensure
    ensure(base)
    assert(builds === 1)
    ensure(base)
    assert(builds === 1)
    // a merge crashes in the OLD double-count window: tables written
    // (volumes hold the merged sums), meta stale
    val e0 = intercept[RuntimeException] {
      Round18Queries.cardAppendBatch(spark, card, batch,
        crashBeforeMeta = true)
    }
    assert(e0.getMessage.contains("injected crash"))
    assert(Round18Queries.cardTorn(spark, card))
    // the torn card takes the loud path everywhere
    val e1 = intercept[IllegalArgumentException] {
      Round18Queries.cardServe(spark, card)
    }
    assert(e1.getMessage.contains("TORN"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Round18Queries.cardAppendBatch(spark, card, batch)
    }
    assert(e2.getMessage.contains("TORN"), e2.getMessage)
    // ensure resolves torn ⇒ exactly one rebuild, and the result is
    // the one-shot card over the full corpus — the crashed batch's
    // volumes appear ONCE (a double-add would inflate every sum)
    ensure(docs)
    assert(builds === 2)
    assert(!Round18Queries.cardTorn(spark, card))
    val oneShot = s"$tmp/oneshot"
    Round18Queries.cardWrite(spark, oneShot, docs)
    assert(rows(Round18Queries.cardServe(spark, card))
      === rows(Round18Queries.cardServe(spark, oneShot)))
    assert(rows(spark.read.parquet(s"$card/volumes"))
      === rows(spark.read.parquet(s"$oneShot/volumes")))
    // ...and the recovered card is warm again
    ensure(docs)
    assert(builds === 2)
  }

  test("cardEnsure: stale stamp (corpus moved) rebuilds; fresh card is warm") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cardstale")
      .toFile.getAbsolutePath
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "source", "text").localCheckpoint()
    val card = s"$tmp/card"
    var builds = 0
    Round18Queries.cardEnsure(spark, card,
      docs.filter(col("doc_id") % 2 === 0), onBuild = () => builds += 1)
    assert(builds === 1)
    // the corpus moved (stale stamp) ⇒ rebuild; same corpus ⇒ warm
    Round18Queries.cardEnsure(spark, card, docs,
      onBuild = () => builds += 1)
    assert(builds === 2)
    Round18Queries.cardEnsure(spark, card, docs,
      onBuild = () => builds += 1)
    assert(builds === 2)
    assert(rows(Round18Queries.cardServe(spark, card)).nonEmpty)
  }
}
