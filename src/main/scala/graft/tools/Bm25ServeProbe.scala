package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Round15Queries

/** Marginal-serve probe for the q281 SCALE.md batch: time ONE query
  * batch served (a) from the documents table (tokenize + postings +
  * df rebuilt per call — [[Round15Queries.bm25ServeQueriesAtDial]])
  * vs (b) from the persisted postings index (partition-pruned bucket
  * reads — [[Round15Queries.bm25ServeQueriesFromIndex]]).
  *
  * The gated q281-vs-q273 comparison runs the FULL 150-query hub
  * workload, whose 151 terms span most buckets and whose scoring
  * exchange dominates both paths — so the totals tie (measured; the
  * honest reading in SCALE.md). The artifact's real win is the
  * MARGINAL serve a retrieval deployment actually pays: a small query
  * batch against a big corpus, where the recompute path still pays
  * the full corpus tokenize and the index path reads only the
  * buckets its terms hash into. This probe measures exactly that.
  *
  * Usage: runMain graft.tools.Bm25ServeProbe <sfDir> <nQueries>
  */
object Bm25ServeProbe {
  private def timeMin(reps: Int)(body: => Unit): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: Bm25ServeProbe <sfDir> <nQueries>")
    val dir = args(0)
    val n = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // artifacts warm, untimed (offline maintenance by contract)
    Round15Queries.prepareBm25ParamsChoice(spark, dir)
    Round15Queries.prepareBm25Index(spark, dir)
    val c = Round15Queries.bm25ChoiceRead(spark,
      Round15Queries.bm25ChoicePath(dir)).get
    val idx = Round15Queries.bm25IndexPath(dir)
    // the batch: the first n whole queries of the standard workload
    val qt = Round15Queries.multiBm25QueryTable(spark, dir)
      .filter(col("query_id") < n).localCheckpoint()

    def drain(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save(); ()
    }
    // one untimed warm pass each (codegen caches, the bench discipline)
    drain(Round15Queries.bm25ServeQueriesAtDial(spark, dir, qt,
      c.k1Micro, c.bMicro))
    drain(Round15Queries.bm25ServeQueriesFromIndex(spark, idx, qt,
      c.k1Micro, c.bMicro))
    val recompute = timeMin(3) {
      drain(Round15Queries.bm25ServeQueriesAtDial(spark, dir, qt,
        c.k1Micro, c.bMicro))
    }
    val artifact = timeMin(3) {
      drain(Round15Queries.bm25ServeQueriesFromIndex(spark, idx, qt,
        c.k1Micro, c.bMicro))
    }
    println(f"""{"dir":"$dir","n_queries":$n,""" +
      f""""recompute_serve_s":$recompute%.3f,""" +
      f""""artifact_serve_s":$artifact%.3f}""")
    spark.stop()
  }
}
