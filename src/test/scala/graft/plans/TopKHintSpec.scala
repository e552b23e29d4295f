package graft.plans

import org.apache.spark.sql.SparkSession
import graft.SparkTestBase

class TopKHintSpec extends SparkTestBase {

  /** A session on the SAME SparkContext but built with GraftExtensions
    * (the shared test session has none). Active/default sessions are
    * restored afterwards so other suites are unaffected.
    */
  private def withExtendedSession[A](f: SparkSession => A): A = {
    val base = spark // force shared-session init (and its SparkContext)
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

  test("/*+ TOPK_PER_KEY */ hint plans through TopKPerKeyExec with correct results") {
    withExtendedSession { s =>
      import s.implicits._
      Seq(
        ("q1", 1L, 0.9), ("q1", 2L, 0.8), ("q1", 3L, 0.7), ("q1", 4L, 0.6),
        ("q2", 1L, 0.1), ("q2", 2L, 0.5)
      ).toDF("qid", "nid", "cos").createOrReplaceTempView("hint_pairs")
      val out = s.sql(
        "SELECT /*+ TOPK_PER_KEY(qid, cos, 2) */ * FROM hint_pairs")
      assert(out.queryExecution.optimizedPlan.collect {
        case t: TopKPerKey => t
      }.nonEmpty, out.queryExecution.optimizedPlan.toString)
      val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === Set(("q1", 1L), ("q1", 2L), ("q2", 2L), ("q2", 1L)))
    }
  }

  test("malformed TOPK_PER_KEY hints fall through without breaking the query") {
    withExtendedSession { s =>
      import s.implicits._
      Seq(("q1", 0.9)).toDF("qid", "cos").createOrReplaceTempView("hint_pairs2")
      // wrong arity / unknown column: hint is dropped (Spark warns), rows intact
      val out = s.sql(
        "SELECT /*+ TOPK_PER_KEY(no_such_col, cos, 1) */ * FROM hint_pairs2")
      assert(out.count() === 1)
      assert(out.queryExecution.optimizedPlan.collect {
        case t: TopKPerKey => t
      }.isEmpty)
    }
  }

  test("lemmatize_tokens and float_dot are available in SQL via extensions") {
    withExtendedSession { s =>
      val r = s.sql(
        "SELECT lemmatize_tokens(array('cats', 'running')) AS l, " +
          "float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "          array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
        .head
      assert(r.getSeq[String](0) === Seq("cat", "run"))
      assert(r.getDouble(1) === 11.0)
    }
  }
}
