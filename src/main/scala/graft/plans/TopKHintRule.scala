package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Analyzer rule making [[TopKPerKey]] reachable from PLAIN SQL via a
  * hint — the last mile of the custom-operator stack (Expression →
  * LogicalPlan → Strategy → SparkPlan → SQL surface):
  *
  * {{{
  *   SELECT /*+ TOPK_PER_KEY(qid, cos, 3) */ * FROM pairs
  * }}}
  *
  * ≡ top-3 rows per `qid` by `cos` descending, evaluated by
  * [[TopKPerKeyExec]]'s bounded per-key heaps instead of a full window
  * sort. All arguments but the trailing integer k are column names:
  * the LAST name is the ordering column, the ones before it are the
  * grouping keys.
  *
  * '''Determinism contract — the ordering column must be STRICT (no
  * ties) within a key.''' The heap drops an incoming row whose ord
  * EQUALS the current heap minimum, so with tied ord values the
  * retained rows depend on encounter order — and, with the partial
  * pass, on physical partitioning. Callers needing stable output fold a
  * unique tie-break into the ordering column the way
  * [[graft.ann.Ann.bruteForceTopKViaOperator]] does
  * (`round(cos*1e6) * 2^32 - id`); `row_number()`-style positional
  * tie-breaking is exactly what this operator avoids paying for.
  *
  * Registered through `GraftExtensions.injectResolutionRule`, so it
  * runs in the analyzer's main resolution batch — BEFORE Spark's
  * "Remove Unresolved Hints" cleanup discards unrecognized hints with
  * a warning. Unmatched shapes (wrong arity, non-literal k, unresolved
  * child) are left alone and fall through to that cleanup.
  */
case class TopKHintRule() extends Rule[LogicalPlan] {

  private val HintName = "TOPK_PER_KEY"

  private def attrOf(e: Expression, child: LogicalPlan): Option[Attribute] = e match {
    case a: Attribute => child.output.find(o => conf.resolver(o.name, a.name))
    case org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(nameParts)
        if nameParts.length == 1 =>
      child.output.find(o => conf.resolver(o.name, nameParts.head))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case UnresolvedHint(name, params, child)
        if name.equalsIgnoreCase(HintName) && child.resolved && params.length >= 3 =>
      (params.init, params.last) match {
        case (cols, Literal(k: Int, IntegerType)) if k > 0 =>
          val resolved = cols.map(attrOf(_, child))
          if (resolved.forall(_.isDefined)) {
            val attrs = resolved.map(_.get)
            // partial → (exchange) → final, as in TopK.topKPerKey
            TopKPerKey(attrs.init, attrs.last, k,
              TopKPerKey(attrs.init, attrs.last, k, child, partial = true))
          } else {
            logWarning(s"$HintName: could not resolve all columns " +
              s"${cols.mkString(", ")} against ${child.output.map(_.name).mkString(", ")}")
            UnresolvedHint(name, params, child)
          }
        case _ => UnresolvedHint(name, params, child)
      }
  }
}
