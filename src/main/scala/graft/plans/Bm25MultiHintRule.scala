package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for MULTI-QUERY Okapi BM25 ranked retrieval — the
  * query-TABLE form of [[Bm25HintRule]] (one hint, a whole retrieval
  * fleet):
  *
  * {{{
  *   SELECT /*+ BM25_MULTI('query_view', 5) */ doc_id, term
  *   FROM doc_tokens
  *   -- args: the NAME of a registered table/view with columns
  *   -- (query_id, term), then an optional INTEGER k (default 5),
  *   -- then an optional NAME of a (doc_id, dl) view covering EVERY
  *   -- document — required for exact full-corpus stats whenever
  *   -- token-less documents exist (invisible in a token relation)
  * }}}
  *
  * Contract: the hinted block must produce `(doc_id, term)` token
  * OCCURRENCES (the [[Bm25HintRule]] long-form rule — raw explode,
  * never deduplicated); the named relation must resolve and carry
  * `(query_id, term)`. The block's result is REPLACED by
  * `(query_id, doc_id, bm25 round-6, n_terms_hit, rk)` — the top-k
  * documents PER QUERY by (bm25 desc, doc_id asc), scored through the
  * shared [[graft.operators.Round14Queries.bm25ScoreKeyed]] core and
  * ranked by per-query [[TopKPerKey]] bounded heaps (never a global
  * sort). The query table rides broadcast joins: it is the |Q|-bounded
  * side by contract (a production query workload), exactly the q244
  * shape.
  *
  * Mechanics: a PURE resolution rewrite like [[Bm25HintRule]] — no
  * gating jobs, no eager evaluation (which is why the heap path's
  * packed-ord id guard is enforced IN-EXPRESSION here: the SQL
  * surface requires doc_id ∈ [0, 2^25) and |bm25| < 2^27 µunits,
  * erroring loudly past them, where the Scala surface
  * ([[graft.operators.Round15Queries.rankMultiBm25]]) probes the id
  * range and degrades to a window rank — an analysis-time rewrite
  * cannot run the probe job). Unmatched shapes (missing columns,
  * unresolvable view, bad k) log a warning and fall through.
  */
case class Bm25MultiHintRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val HintName = "BM25_MULTI"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case h @ UnresolvedHint(name, params, child)
        if name.equalsIgnoreCase(HintName) && child.resolved =>
      // args: query view name [, k [, dl view name]]. The third arg
      // names a (doc_id, dl) relation covering EVERY document — the
      // corpus-stats source when token-less docs exist, which the
      // (doc_id, term) child cannot represent (see
      // multiBm25ScoredFromTokens's dlOverride).
      val parsed: Option[(String, Int, Option[String])] = params match {
        case Seq(Literal(v: UTF8String, StringType)) =>
          Some((v.toString, graft.operators.Round15Queries.MultiBm25K, None))
        case Seq(Literal(v: UTF8String, StringType),
            Literal(k: Int, IntegerType)) if k >= 1 =>
          Some((v.toString, k, None))
        case Seq(Literal(v: UTF8String, StringType),
            Literal(k: Int, IntegerType),
            Literal(d: UTF8String, StringType)) if k >= 1 =>
          Some((v.toString, k, Some(d.toString)))
        case _ => None
      }
      val hasCols = Seq("doc_id", "term").forall(n =>
        child.output.exists(o => conf.resolver(o.name, n)))
      def resolveView(view: String, cols: Seq[String]) =
        try {
          val t = spark.table(view)
          if (cols.forall(n => t.columns.exists(c => conf.resolver(c, n))))
            Some(t)
          else None
        } catch { case _: org.apache.spark.sql.AnalysisException => None }
      val queryTable = parsed.flatMap { case (view, _, _) =>
        resolveView(view, Seq("query_id", "term")) }
      // distinguish "no dl arg" (None — valid) from "dl arg that does
      // not resolve" (fall through with the warning, never silently
      // score with the wrong stats source)
      val dlTable = parsed.map {
        case (_, _, Some(dlView)) =>
          resolveView(dlView, Seq("doc_id", "dl")).map(Some(_))
        case _ => Some(None)
      }.getOrElse(None)
      (parsed, queryTable, dlTable) match {
        case (Some((_, k, _)), Some(qt), Some(dlOpt)) if hasCols =>
          val toks = org.apache.spark.sql.GraftSqlApi.ofRows(spark, child)
            .select(col("doc_id"), col("term"))
          val scored = graft.operators.Round15Queries
            .multiBm25ScoredFromTokens(toks,
              qt.select(col("query_id"), col("term")),
              dlOpt.map(_.select(col("doc_id"), col("dl"))))
          graft.operators.Round15Queries
            .rankMultiBm25Dispatch(scored, heapSafe = true, k)
            .queryExecution.analyzed
        case _ =>
          logWarning(s"$HintName: expects child columns (doc_id, term), one " +
            s"STRING view name resolving to a (query_id, term) relation, an " +
            s"optional positive INTEGER k, and an optional STRING view name " +
            s"resolving to a (doc_id, dl) relation; got schema " +
            s"${child.output.map(o => s"${o.name}:${o.dataType.simpleString}")
              .mkString(", ")}, args $params — hint ignored")
          h
      }
  }
}
