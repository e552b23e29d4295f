package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SinksSpec extends SparkTestBase {
  import spark.implicits._

  test("writePartitioned produces a hive layout with co-located files") {
    val dir = Files.createTempDirectory("graft_part_").toString
    val docs = graft.Tables.documents(spark, sf001)
    Sinks.writePartitioned(docs, dir, Seq("lang"))
    val langDirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langDirs.length >= 2, s"expected lang=... dirs, got ${langDirs.toSeq}")
    // repartition(lang) before the write → one file per partition dir,
    // not one per upstream task
    langDirs.foreach { d =>
      val files = new java.io.File(s"$dir/$d").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"$d has ${files.length} files")
    }
    // round trip with partition pruning
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    val lang = langDirs.head.stripPrefix("lang=")
    val pruned = back.filter($"lang" === lang)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(pruned.count() === docs.filter($"lang" === lang).count())
  }
}
