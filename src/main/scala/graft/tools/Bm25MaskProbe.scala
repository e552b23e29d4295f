package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Round15Queries

/** Cold/warm A/B for the persisted masked-df artifact (round-13,
  * round-12 verdict #1): before it, EVERY delete-masked serve paid a
  * full postings-table pass to decrement per-term df; now the first
  * serve after (index, tombstone) state moves pays it once and every
  * further masked serve reads a vocabulary-scale table. The probe
  * times the complete q283 serve with the artifact WIPED (cold —
  * includes the decrement pass) and again WARM (artifact read) —
  * the delta IS the postings term the artifact removed.
  *
  * Usage: runMain graft.tools.Bm25MaskProbe <sfDir>
  */
object Bm25MaskProbe {
  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete(); ()
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: Bm25MaskProbe <sfDir>")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // index warm, untimed (offline maintenance by contract)
    Round15Queries.prepareBm25Index(spark, dir)
    val idx = Round15Queries.bm25IndexPath(dir)
    def drain(): Unit = {
      Round15Queries.q283Bm25DeleteServe(spark, dir)
        .write.format("noop").mode("overwrite").save(); ()
    }
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    drain() // one untimed pass (codegen caches, the bench discipline)
    rmrf(new java.io.File(Round15Queries.maskedDfPath(idx)))
    val cold = time { drain() } // pays the postings decrement pass
    val warm = (1 to 2).map(_ => time { drain() }).min
    // the ENSURE verb in isolation — the postings term itself, apart
    // from the scoring exchange it used to hide inside
    import org.apache.spark.sql.functions.col
    val tombstones = spark.read.parquet(s"$idx/dl").select(col("doc_id"))
      .filter(col("doc_id") % Round15Queries.Bm25DeleteMod
        === Round15Queries.Bm25DeleteRem).localCheckpoint()
    rmrf(new java.io.File(Round15Queries.maskedDfPath(idx)))
    val ensureCold = time {
      Round15Queries.ensureBm25MaskedDf(spark, idx, tombstones)
    }
    val ensureWarm = (1 to 2).map(_ => time {
      Round15Queries.ensureBm25MaskedDf(spark, idx, tombstones)
    }).min
    println(s"""{"probe":"mask_artifact","sf":"$dir",""" +
      s""""cold_serve_s":$cold,"warm_serve_s":$warm,""" +
      s""""ensure_cold_s":$ensureCold,"ensure_warm_s":$ensureWarm}""")
    spark.stop()
  }
}
