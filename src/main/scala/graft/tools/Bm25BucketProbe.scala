package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ChoiceStore, Round15Queries}

/** A/B probe for the postings-index BUCKET-COUNT dial (round-12
  * verdict #4): `Bm25IndexBuckets` fixes how many `pt` hash partitions
  * the postings/df tables split into, and the prune fraction a serve
  * enjoys is (buckets hit)/(bucket count) — at 32 buckets the gated
  * 150-query hub workload hits 24/32 (75% of postings read), which is
  * why the full-workload artifact serve TIES recompute in SCALE.md.
  * Unlike the SLO dials the optimum here is measurable: more buckets
  * prune more rows per query batch but produce more, smaller files
  * (per-file open cost, and at 100 TB the planner's split accounting).
  * This probe measures both sides on real index replicas.
  *
  * Per bucket count: build a replica index at that count (untimed —
  * offline maintenance), then time (a) the FULL 150-query workload
  * artifact serve, (b) a small MARGINAL batch serve, and report the
  * workload's bucket-hit and postings-row-scanned fractions. The
  * recompute reference (corpus tokenize per call) is timed once —
  * it has no bucket dependence.
  *
  * The gate corpus's vocabulary is 31 terms (measured — the synthetic
  * fixture), so ANY top-df workload covers 100% of postings mass at
  * every bucket count; to measure the dial's real shape the probe
  * also takes a WIDEN factor K that suffixes `doc_id % K` to every
  * token (vocabulary ×K, document structure preserved) — with
  * vocab ≫ buckets the prune fraction behaves as
  * (workload buckets)/(bucket count), which is the 100 TB regime.
  *
  * Usage: runMain graft.tools.Bm25BucketProbe <sfDir> <nb1,nb2,...>
  *        [marginalQueries] [widenK]
  */
object Bm25BucketProbe {
  private def timeMin(reps: Int)(body: => Unit): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: Bm25BucketProbe <sfDir> <nb1,nb2,...> [marginalQueries]")
    val dir = args(0)
    val nbs = args(1).split(',').map(_.trim.toInt).toSeq
    val nMarginal = if (args.length > 2) args(2).toInt else 3
    val widenK = if (args.length > 3) args(3).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // replica lake so the benchmark's own index artifact is untouched
    val lake = new java.io.File(
      s"target/bucketprobe/${graft.operators.PathTag.tagFor(dir)}-w$widenK")
      .getAbsolutePath
    val lakeDocs = s"$lake/documents.parquet"
    if (!new java.io.File(lakeDocs).exists()) {
      val base = spark.read.parquet(s"$dir/documents.parquet")
      val widened =
        if (widenK <= 1) base
        else base.withColumn("text", concat_ws(" ",
          transform(split(col("text"), " "),
            t => concat(t, lit("w"), translate(
              (col("doc_id") % widenK).cast("string"),
              "0123456789", "abcdefghij")))))
      widened.write.mode("overwrite").parquet(lakeDocs)
    }
    val (dr, dc) = ChoiceStore.documentsStampCachedFor(spark, lake)
    val idx = Round15Queries.bm25IndexPath(lake)

    val qtFull = Round15Queries.multiBm25QueryTable(spark, lake)
      .localCheckpoint()
    val qtMarginal = qtFull.filter(col("query_id") < nMarginal)
      .localCheckpoint()
    def drain(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save(); ()
    }
    // the bucket-independent recompute reference, once
    drain(Round15Queries.bm25ServeQueriesAtDial(spark, lake, qtFull,
      1200000L, 750000L))
    val recomputeFull = timeMin(3) {
      drain(Round15Queries.bm25ServeQueriesAtDial(spark, lake, qtFull,
        1200000L, 750000L))
    }
    val recomputeMarginal = timeMin(3) {
      drain(Round15Queries.bm25ServeQueriesAtDial(spark, lake, qtMarginal,
        1200000L, 750000L))
    }

    nbs.foreach { nb =>
      Round15Queries.bm25IndexWrite(spark, lake, dr, dc, nb)
      val hit = qtFull.select(pmod(hash(col("term")), lit(nb)).as("pt"))
        .distinct().collect().map(_.getInt(0)).toSet
      val byBucket = spark.read.parquet(s"$idx/postings")
        .groupBy(col("pt")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val total = byBucket.values.sum.max(1L)
      val scanned = byBucket.filter(e => hit(e._1)).values.sum
      drain(Round15Queries.bm25ServeQueriesFromIndex(spark, idx, qtFull,
        1200000L, 750000L))
      val artFull = timeMin(3) {
        drain(Round15Queries.bm25ServeQueriesFromIndex(spark, idx, qtFull,
          1200000L, 750000L))
      }
      val artMarginal = timeMin(3) {
        drain(Round15Queries.bm25ServeQueriesFromIndex(spark, idx,
          qtMarginal, 1200000L, 750000L))
      }
      println(f"""{"dir":"$dir","n_buckets":$nb,""" +
        f""""buckets_hit":${hit.size},""" +
        f""""rows_scanned_frac":${scanned.toDouble / total}%.4f,""" +
        f""""artifact_full_s":$artFull%.3f,""" +
        f""""recompute_full_s":$recomputeFull%.3f,""" +
        f""""artifact_marginal_s":$artMarginal%.3f,""" +
        f""""recompute_marginal_s":$recomputeMarginal%.3f}""")
    }
    spark.stop()
  }
}
