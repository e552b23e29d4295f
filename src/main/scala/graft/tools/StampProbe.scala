package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ann.Ann
import graft.operators.ChoiceStore

/** Micro-probe for the SCALE.md stamp-validation batch (round-12
  * verdict #1's "Done" criterion): time the CONTENT-FOLD stamp vs the
  * SIDECAR stamp (cold = residues never cached; warm = file set
  * unchanged) for both the documents corpus and an existing IVF-PQ
  * generation, at one sf/replica dir per invocation. The claim under
  * measurement: the fold grows with the data; the warm sidecar path
  * is a file listing + TSV read and stays flat.
  *
  * Protocol matches the scale study: 4-core session (the bench
  * shape), three timed repetitions per point, min reported.
  *
  * Usage: runMain graft.tools.StampProbe <sfDir> [indexDir]
  */
object StampProbe {
  private def timeMin(reps: Int)(body: => Unit): Double = {
    (1 to reps).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StampProbe <sfDir> [indexDir]")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sidecar = new java.io.File(
      s"target/choices/doc-stamp/${graft.operators.PathTag.tagFor(dir)}.tsv")
      .getAbsolutePath
    def dropSidecar(p: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, false)
      ()
    }
    def docsDf = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))

    // warm the JVM/scan path once, untimed
    ChoiceStore.documentsStamp(docsDf)
    val foldDocs = timeMin(3) { ChoiceStore.documentsStamp(docsDf); () }
    dropSidecar(sidecar)
    val coldDocs = timeMin(1) {
      ChoiceStore.documentsStampCachedFor(spark, dir); () }
    val warmDocs = timeMin(3) {
      ChoiceStore.documentsStampCachedFor(spark, dir); () }

    val out = new StringBuilder
    out ++= f"""{"dir":"$dir","docs_fold_s":$foldDocs%.3f,""" +
      f""""docs_sidecar_cold_s":$coldDocs%.3f,""" +
      f""""docs_sidecar_warm_s":$warmDocs%.3f"""

    args.lift(1).foreach { idx =>
      Ann.ivfPqGenerationStamp(spark, idx) // warm the scan path
      val foldIdx = timeMin(3) { Ann.ivfPqGenerationStamp(spark, idx); () }
      dropSidecar(s"$idx/choices/stamp-sidecar.tsv")
      val coldIdx = timeMin(1) {
        Ann.ivfPqGenerationStampCached(spark, idx); () }
      val warmIdx = timeMin(3) {
        Ann.ivfPqGenerationStampCached(spark, idx); () }
      out ++= f""","idx_fold_s":$foldIdx%.3f,""" +
        f""""idx_sidecar_cold_s":$coldIdx%.3f,""" +
        f""""idx_sidecar_warm_s":$warmIdx%.3f"""
    }
    out ++= "}"
    println(out.result())
    spark.stop()
  }
}
