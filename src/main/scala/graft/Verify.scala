package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // scheduler mode is a SparkContext-creation conf (a local property
    // would be a no-op). NB spark.scheduler.mode=FAIR alone is NOT
    // enough: jobs all land in the single "default" pool, whose
    // INTRA-pool mode is FIFO unless an allocation file says otherwise —
    // so we materialize a one-pool FAIR allocation file. With it, the
    // concurrent dump threads' jobs round-robin fairly instead of
    // head-of-line blocking behind one heavy query.
    val poolsXml = Files.createTempFile("graft-fair-pools", ".xml")
    Files.writeString(poolsXml,
      """<?xml version="1.0"?>
        |<allocations>
        |  <pool name="default">
        |    <schedulingMode>FAIR</schedulingMode>
        |    <weight>1</weight>
        |    <minShare>0</minShare>
        |  </pool>
        |</allocations>
        |""".stripMargin)
    poolsXml.toFile.deleteOnExit()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", poolsXml.toString)
      // hint rules (TOPK_PER_KEY, SIMILARITY_TOP1) live in the
      // extensions — q46's pure-SQL surface needs them resolved
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dump queries CONCURRENTLY (bounded pool): the session is
    // thread-safe and most of these queries are small jobs that leave
    // the 32 cores idle between stages — overlapping them cut the wall
    // time of the full dump roughly in half. Per-module memo caches
    // (DocQueries/Lab2Queries) serialize their builders, so concurrent
    // first calls don't double-build (and leak) shared pipelines.
    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "4").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // Dev-loop subset filter (comma-separated names); unset for the
    // driver, which always dumps the full registry.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_VERIFY_ONLY names not in the registry: ${unknown.mkString(", ")}")
    }
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    val dumps = selected.toSeq.map { case (name, fn) =>
      scala.concurrent.Future {
        // repartition(1), not coalesce(1): coalesce would collapse the
        // whole upstream query to one task (see graft.io.Sinks scaladoc).
        try fn(spark, sfDir).repartition(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(dumps),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracleSqlFor(sfDir), not the static default: q43's oracle reads
    // the IVF index materialized for THIS run's sf dir.
    val json = SparkEntry.oracleSqlFor(sfDir)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
