package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilarityHintSpec extends SparkTestBase {

  /** Session on the shared SparkContext but with GraftExtensions. */
  private def withExtendedSession[A](f: SparkSession => A): A = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      f(ext)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  // tiny L2-normalized long-form vectors: docs 1/2 share "a" strongly,
  // doc 3 overlaps 2 weakly via "c"
  private def fixture(s: SparkSession) = {
    import s.implicits._
    Seq(
      (1L, "a", 0.8), (1L, "b", 0.6),
      (2L, "a", 0.9), (2L, "c", 0.435890),
      (3L, "c", 1.0)
    ).toDF("id", "word", "w")
  }

  test("/*+ SIMILARITY_TOP1 */ matches the programmatic argmaxAdaptive") {
    withExtendedSession { s =>
      val vecs = fixture(s)
      vecs.createOrReplaceTempView("simhint_vecs")
      val viaSql = s.sql(
        """SELECT l_id, r_id, sim FROM (
          |  SELECT /*+ SIMILARITY_TOP1 */ id, word, w FROM simhint_vecs
          |) ORDER BY l_id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val viaApi = graft.similarity.Similarity
        .argmaxAdaptive(vecs, vecs, excludeSelf = true)
        .select(col("l_id").cast("long"), col("r_id").cast("long"), col("sim"))
        .orderBy("l_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(viaSql.toSeq === viaApi.toSeq)
      assert(viaSql.map(t => t._1 -> t._2).toMap === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    }
  }

  test("hint reaches the adaptive DENSE strategy on a small vocabulary") {
    withExtendedSession { s =>
      fixture(s).createOrReplaceTempView("simhint_vecs2")
      val out = s.sql(
        "SELECT /*+ SIMILARITY_TOP1 */ id, word, w FROM simhint_vecs2")
      // the dense-broadcast scorer is the mapPartitions pipeline —
      // visible as an object-serde boundary; the sparse path would show
      // a join + Window instead
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("SerializeFromObject") || plan.contains("MapPartitions"),
        s"expected the dense object-scorer pipeline:\n$plan")
      assert(!plan.contains("WindowExec"), s"dense path has no window sort:\n$plan")
    }
  }

  test("SIMILARITY_TOP1(false) keeps self-matches") {
    withExtendedSession { s =>
      fixture(s).createOrReplaceTempView("simhint_vecs3")
      val got = s.sql(
        """SELECT l_id, r_id, sim FROM (
          |  SELECT /*+ SIMILARITY_TOP1(false) */ id, word, w FROM simhint_vecs3
          |) ORDER BY l_id""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // with self-pairs allowed every doc matches itself (unit vectors)
      assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    }
  }

  test("DECIMAL(18,0) ids are accepted (lossless long cast)") {
    withExtendedSession { s =>
      fixture(s).selectExpr("CAST(id AS DECIMAL(18,0)) AS id", "word", "w")
        .createOrReplaceTempView("simhint_dec")
      val got = s.sql(
        """SELECT l_id, r_id, sim FROM (
          |  SELECT /*+ SIMILARITY_TOP1 */ id, word, w FROM simhint_dec
          |) ORDER BY l_id""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    }
  }

  test("re-analyzing the same hinted shape reuses the cached rewrite (no new gating jobs)") {
    withExtendedSession { s =>
      fixture(s).createOrReplaceTempView("simhint_cache")
      val qry =
        """SELECT l_id, r_id, sim FROM (
          |  SELECT /*+ SIMILARITY_TOP1 */ id, word, w FROM simhint_cache
          |) ORDER BY l_id""".stripMargin
      val a1 = s.sql(qry).queryExecution.analyzed // first analysis runs the gating jobs
      // count jobs during the SECOND analysis of the same shape
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      s.sparkContext.addSparkListener(listener)
      try {
        val a2 = s.sql(qry).queryExecution.analyzed
        // the cached rewrite is spliced in by reference — some subtree
        // node is the SAME instance in both analyzed plans
        val n1 = a1.collect { case n => n }
        assert(a2.exists(n2 => n1.exists(_ eq n2)),
          "expected the second analysis to splice the cached rewrite instance")
        // listener bus is async; give queued events a moment to drain
        Thread.sleep(500)
        assert(jobs.get() === 0,
          s"re-analysis of an already-cached hint shape ran ${jobs.get()} Spark jobs")
      } finally s.sparkContext.removeSparkListener(listener)
      // and the cached plan still executes correctly
      val got = s.sql(qry).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    }
  }

  test("self-join of two identically-hinted blocks survives instance sharing") {
    withExtendedSession { s =>
      fixture(s).createOrReplaceTempView("simhint_self")
      // both branches rewrite to the SAME cached plan instance; the
      // analyzer must deduplicate the conflicting attribute ids (the
      // standard self-join mechanism) rather than mis-resolve the join
      val got = s.sql(
        """SELECT a.l_id, a.r_id, b.r_id AS rr
          |FROM (SELECT /*+ SIMILARITY_TOP1 */ id, word, w FROM simhint_self) a
          |JOIN (SELECT /*+ SIMILARITY_TOP1 */ id, word, w FROM simhint_self) b
          |  ON a.l_id = b.l_id
          |ORDER BY a.l_id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq === Seq((1L, 2L, 2L), (2L, 1L, 1L), (3L, 2L, 2L)))
    }
  }

  test("malformed SIMILARITY_TOP1 hints fall through without breaking the query") {
    withExtendedSession { s =>
      import s.implicits._
      // missing the (id, word, w) contract → hint ignored, query intact
      Seq((1L, 0.5)).toDF("id", "x").createOrReplaceTempView("simhint_bad")
      val out = s.sql("SELECT /*+ SIMILARITY_TOP1 */ id, x FROM simhint_bad")
      assert(out.collect().map(_.getLong(0)).toSeq === Seq(1L))
      // non-integral id → hint declines (the fixed BIGINT output schema
      // would mis-cast string ids); query returns the raw block intact
      Seq(("docA", "x", 1.0)).toDF("id", "word", "w")
        .createOrReplaceTempView("simhint_strid")
      val out2 = s.sql("SELECT /*+ SIMILARITY_TOP1 */ id, word, w FROM simhint_strid")
      assert(out2.columns.toSeq === Seq("id", "word", "w"))
      assert(out2.collect().map(_.getString(0)).toSeq === Seq("docA"))
    }
  }
}
