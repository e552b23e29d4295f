package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Round15Queries

/** Marginal-ingest probe for the q282 SCALE.md batch: the incremental
  * claim is a CLASS claim — the append bill scales with the BATCH (its
  * tokenize) plus corpus-rows/vocabulary merge terms, while the
  * rebuild a non-incremental engine pays on every ingest scales with
  * corpus TEXT bytes. At each scale this measures, on a fresh
  * engine-owned lake:
  *
  *   - `build_base`    — cold index build over the base corpus
  *     (63/64 of docs): the rebuild-class bill.
  *   - `append_batch`  — the incremental ensure after a 1/64 batch
  *     lands as new files: the marginal bill q282's ensure pays
  *     (verified to actually take the append verb).
  *   - `warm`          — the converged ensure (sidecar stamp + meta
  *     read; throwing observers prove no verb fires).
  *   - `rebuild_full`  — the forced from-scratch build over the FULL
  *     lake (index dir wiped): what every ingest would cost without
  *     the ledger.
  *
  * The optional WIDEN factor K suffixes `doc_id % K` to every token
  * (vocabulary ×K, text volume ~unchanged) — the round-13 bucketed-df
  * measurement: with the df table partitioned by term hash, the
  * append's df-merge term must stay BATCH-scale as the corpus
  * vocabulary grows (only the batch's buckets are read/rewritten),
  * where the pre-bucketing layout rewrote the whole vocabulary table.
  *
  * Usage: runMain graft.tools.PostingsAppendProbe <sfDir> [widenK]
  */
object PostingsAppendProbe {
  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete(); ()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: PostingsAppendProbe <sfDir> [widenK]")
    val sfDir = args(0)
    val widenK = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft-apb")
      .toFile.getAbsolutePath
    val lake = s"$tmp/lake"
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs =
      if (widenK <= 1) base
      else base.withColumn("text", concat_ws(" ",
        transform(split(col("text"), " "),
          t => concat(t, lit("w"), translate(
              (col("doc_id") % widenK).cast("string"),
              "0123456789", "abcdefghij")))))
        .localCheckpoint()
    docs.filter(col("doc_id") % 64 =!= 63)
      .write.parquet(s"$lake/documents.parquet")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val tBuild = time { Round15Queries.ensureBm25IndexIncremental(spark, lake) }
    docs.filter(col("doc_id") % 64 === 63)
      .write.mode("append").parquet(s"$lake/documents.parquet")
    var appended = false
    val tAppend = time { Round15Queries.ensureBm25IndexIncremental(
      spark, lake, onAppend = _ => appended = true) }
    val tWarm = time { Round15Queries.ensureBm25IndexIncremental(
      spark, lake,
      onBuild = () => sys.error("warm ensure rebuilt"),
      onAppend = _ => sys.error("warm ensure appended")) }
    rmrf(new java.io.File(Round15Queries.bm25IndexPath(lake)))
    val tRebuild = time { Round15Queries.ensureBm25IndexIncremental(spark, lake) }
    println(s"""{"probe":"postings_append","sf":"$sfDir",""" +
      s""""widen_k":$widenK,""" +
      s""""build_base":$tBuild,"append_batch":$tAppend,""" +
      s""""warm":$tWarm,"rebuild_full":$tRebuild,"appended":$appended}""")
    rmrf(new java.io.File(tmp))
    spark.stop()
  }
}
