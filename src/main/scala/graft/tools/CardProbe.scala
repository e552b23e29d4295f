package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Round18Queries

/** Merge-vs-rebuild A/B for the incremental dataset card (round-14):
  * the card's claim is that republishing after an ingest costs the
  * BATCH tokenize + a strata-scale sum merge + touched-bucket vocab
  * union — never a lake re-tokenize. The probe times:
  *
  *   - `rebuild_s`  — the one-shot card over the FULL corpus (what a
  *     release pays without the incremental artifact);
  *   - `merge64_s`  — cardAppendBatch of a 1/64 batch into a card
  *     built over the other 63/64 (untimed seed build);
  *   - `merge8_s`   — the same with a 1/8 batch (the merge bill must
  *     follow the BATCH fraction, not the lake).
  *
  * Crash-discipline overhead (the round-14 ledger) rides inside both
  * merge numbers — it is one TSV write + a meta⇄ledger compare.
  *
  * Usage: runMain graft.tools.CardProbe <sfDir>
  */
object CardProbe {
  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete(); ()
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: CardProbe <sfDir>")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("graft-cardprobe")
      .toFile.getAbsolutePath
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // untimed warm-up: one tokenize pass through the scan/codegen path
    Round18Queries.cardWrite(spark, s"$root/warm",
      docs.filter(col("doc_id") % 16L === 0L))
    val rebuild = time {
      Round18Queries.cardWrite(spark, s"$root/full", docs)
    }
    def mergeAt(mod: Long): Double = {
      val path = s"$root/m$mod"
      rmrf(new java.io.File(path))
      Round18Queries.cardWrite(spark, path,
        docs.filter(col("doc_id") % mod =!= 0L)) // seed, untimed
      time {
        Round18Queries.cardAppendBatch(spark, path,
          docs.filter(col("doc_id") % mod === 0L))
      }
    }
    val merge64 = mergeAt(64L)
    val merge8 = mergeAt(8L)
    // the drift report (q308) is ARTIFACT-ONLY by claim: diffing the
    // 1/16 card against the full card must bill card reads (strata
    // volumes + bucketed vocab anti-joins), never corpus text — the
    // in-run yardstick is rebuild_s, which DOES pay the tokenize
    val drift = time {
      graft.operators.Round19Queries.cardDrift(spark, s"$root/warm",
        s"$root/full").collect()
    }
    println(s"""{"probe":"card_merge","sf":"$dir",""" +
      s""""rebuild_s":$rebuild,"merge64_s":$merge64,""" +
      s""""merge8_s":$merge8,"drift_s":$drift}""")
    spark.stop()
  }
}
