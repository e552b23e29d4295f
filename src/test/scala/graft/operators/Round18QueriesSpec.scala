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
}
