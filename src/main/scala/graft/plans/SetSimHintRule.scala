package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the exact set-similarity self-join
  * ([[graft.operators.Round12Queries.setSimJoin]] — AllPairs/PPJoin
  * prefix + positional filtering with candidate-only verification):
  *
  * {{{
  *   SELECT a, b, inter, uni, jac_micro FROM (
  *     SELECT /*+ SETSIM_JOIN(4, 5) */ id, shingle FROM shingle_sets
  *   ) ORDER BY a, b
  *   -- args optional: SETSIM_JOIN() defaults to tau = 4/5
  * }}}
  *
  * Contract: the hinted query block must produce columns `(id,
  * shingle)` — the long-form set representation (one row per element,
  * distinct). The block's result is REPLACED by `(a, b, inter BIGINT,
  * uni BIGINT, jac_micro BIGINT)`: every pair a < b with Jaccard ≥
  * tauNum/tauDen, exact intersection/union counts (a/b keep the child
  * id type). Args are two INTEGER literals 1 ≤ num ≤ den. As with
  * SIMILARITY_TOP1, the parser attaches the hint above the select-list
  * projection: project the INPUT columns inside the block, read the
  * OUTPUT columns outside.
  *
  * Mechanics: a PURE plan rewrite (like [[TopKHintRule]], unlike the
  * stats-gated [[SimilarityHintRule]]) — setSimJoin composes plain
  * joins/aggregates, so no gating jobs and no memoization are needed;
  * the rewritten subtree optimizes as ordinary Catalyst. The hint does
  * NOT localCheckpoint the child (an eager job at analysis time would
  * surprise SQL users); the programmatic q211 path does — SQL users
  * with an expensive child should materialize the view first.
  * Unmatched shapes (missing columns, bad args) log a warning and are
  * left to Spark's unresolved-hint cleanup.
  */
case class SetSimHintRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val HintName = "SETSIM_JOIN"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case h @ UnresolvedHint(name, params, child)
        if name.equalsIgnoreCase(HintName) && child.resolved =>
      val tau: Option[(Int, Int)] = params match {
        case Seq() =>
          Some((graft.operators.Round12Queries.SetSimTauNum,
            graft.operators.Round12Queries.SetSimTauDen))
        case Seq(Literal(n: Int, IntegerType), Literal(d: Int, IntegerType))
            if n >= 1 && n <= d => Some((n, d))
        case _ => None
      }
      val hasCols = Seq("id", "shingle").forall(n =>
        child.output.exists(o => conf.resolver(o.name, n)))
      if (tau.isEmpty || !hasCols) {
        logWarning(s"$HintName: expects child columns (id, shingle) and " +
          s"either no args or two INTEGER literals 1 <= num <= den; got " +
          s"schema ${child.output.map(o => s"${o.name}:${o.dataType.simpleString}")
            .mkString(", ")}, args $params — hint ignored")
        h
      } else {
        val (num, den) = tau.get
        val df = org.apache.spark.sql.GraftSqlApi.ofRows(spark, child)
          .select(org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.col("shingle"))
        graft.operators.Round12Queries.setSimJoin(df, num, den)
          .queryExecution.analyzed
      }
  }
}
