package graft.plans

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions.col

import graft.{SparkTestBase, Tables}
import graft.operators.Round12Queries

/** `/*+ SETSIM_JOIN */` SQL surface: the hint must reproduce the
  * programmatic [[Round12Queries.setSimJoin]] exactly (default and
  * explicit τ), flow its parameters (q225's τ=1/100 yields MORE pairs
  * than the 4/5 default on this corpus — an ignored-args bug cannot
  * hide), and decline malformed shapes loudly rather than rewriting.
  */
class SetSimHintSpec extends SparkTestBase {
  import spark.implicits._

  private def shingles() =
    graft.dedup.Dedup.shingleSets(Tables.documents(spark, sf0001),
      "doc_id", "text", Round12Queries.SetSimShingleN).localCheckpoint()

  test("hinted SQL equals the programmatic join, default and explicit tau") {
    val sh = shingles()
    sh.createOrReplaceTempView("setsim_hint_spec_sh")
    def viaHint(args: String): Set[(Long, Long, Long, Long, Long)] =
      spark.sql(
        s"""SELECT a, b, inter, uni, jac_micro FROM (
           |  SELECT /*+ SETSIM_JOIN$args */ id, shingle
           |  FROM setsim_hint_spec_sh
           |)""".stripMargin)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    def programmatic(n: Int, d: Int): Set[(Long, Long, Long, Long, Long)] =
      Round12Queries.setSimJoin(sh, n, d)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(viaHint("") === programmatic(4, 5))
    assert(viaHint("(4, 5)") === programmatic(4, 5))
    val loose = viaHint("(1, 100)")
    assert(loose === programmatic(1, 100))
    // parameter flow is observable: looser tau admits strictly more
    assert(programmatic(4, 5).map(t => (t._1, t._2))
      .subsetOf(loose.map(t => (t._1, t._2))))
  }

  test("malformed hints decline: bad args or missing columns never rewrite") {
    val sh = shingles()
    sh.createOrReplaceTempView("setsim_hint_spec_sh")
    // tau > 1 is invalid → hint ignored → outer columns unresolvable
    intercept[AnalysisException] {
      spark.sql(
        """SELECT a, b FROM (
          |  SELECT /*+ SETSIM_JOIN(5, 4) */ id, shingle
          |  FROM setsim_hint_spec_sh
          |)""".stripMargin).collect()
    }
    // missing the shingle column → hint ignored, block passes through
    sh.select(col("id")).createOrReplaceTempView("setsim_hint_spec_ids")
    intercept[AnalysisException] {
      spark.sql(
        """SELECT a, b FROM (
          |  SELECT /*+ SETSIM_JOIN */ id FROM setsim_hint_spec_ids
          |)""".stripMargin).collect()
    }
  }
}
