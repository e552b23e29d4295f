package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.BooleanType

/** SQL surface for the engine's flagship similarity-join strategy
  * (SURVEY.md §7.3(c), last extension): a hint that rewrites to
  * [[graft.similarity.Similarity.argmaxAdaptive]] — the strategy picker
  * behind q13/q50 that chooses between the dense-broadcast scorer
  * (small dense vocabularies, zero shuffle) and the inverted-index
  * join + window argmax (the 100 TB default):
  *
  * {{{
  *   SELECT l_id, r_id, sim FROM (
  *     SELECT /*+ SIMILARITY_TOP1 */ id, word, w FROM long_vectors
  *   ) ORDER BY l_id
  *   -- optional arg: SIMILARITY_TOP1(false) keeps self-matches
  * }}}
  *
  * Contract: the HINTED QUERY BLOCK must produce columns `(id, word,
  * w)` — the long-form L2-normalized vector shape every Similarity
  * operator uses; the block's result is then REPLACED by
  * `(l_id BIGINT, r_id BIGINT, sim DOUBLE)`, the best-match row per
  * left id under the deterministic (sim desc, r_id asc) contract,
  * consumed by the enclosing query. (The parser attaches a SELECT
  * hint above the select-list projection, so the hinted block itself
  * must resolve — project the INPUT columns inside the block and read
  * the OUTPUT columns outside it, as above.) `excludeSelf` defaults
  * to true (the self-corpus top-1 shape).
  *
  * Mechanics: unlike [[TopKHintRule]] (a pure node rewrite), the
  * adaptive strategy needs STATS — a bounded distinct-vocab collect
  * and a corpus byte estimate — so the rewrite builds the argmax plan
  * through the DataFrame API against the resolved child and splices
  * the resulting ANALYZED logical plan back in. Those gating jobs run
  * once, when the enclosing query is analyzed (they are the same jobs
  * the programmatic API runs); the rewritten plan itself then
  * optimizes/executes as ordinary Catalyst. Unmatched shapes (missing
  * columns, non-boolean arg) are left to Spark's unresolved-hint
  * cleanup, which drops them with a warning.
  *
  * The rewrite (and its gating jobs) is MEMOIZED per semantically-equal
  * hinted child within the session (the rule instance is one-per-session
  * under `injectResolutionRule`): `explain()`, view creation, and every
  * re-analysis of the same query would otherwise re-run the gating jobs
  * each time the analyzer visits the hint. Cache key = the child's
  * canonicalized plan + excludeSelf; value = the analyzed rewrite, whose
  * subtree splices cleanly into later queries (repeated-instance
  * attribute conflicts are handled by Spark's DeduplicateRelations —
  * the same mechanism self-joins rely on). Caveat, documented for
  * users: the dense strategy snapshots the vocabulary at first
  * analysis, so within one session the hint sees the table as it was
  * when the shape was first analyzed; re-create the session (or change
  * the query shape) after rewriting the underlying table.
  */
case class SimilarityHintRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val HintName = "SIMILARITY_TOP1"

  private val MaxCached = 16
  // bounded LRU; analysis can run concurrently across threads sharing
  // the session (and thus this per-session rule instance) → synchronized
  private val cache =
    new java.util.LinkedHashMap[(LogicalPlan, Boolean), LogicalPlan](MaxCached, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(LogicalPlan, Boolean), LogicalPlan]): Boolean =
        size() > MaxCached
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case h @ UnresolvedHint(name, params, child)
        if name.equalsIgnoreCase(HintName) && child.resolved =>
      val excludeSelf: Option[Boolean] = params match {
        case Seq() => Some(true)
        case Seq(Literal(b: Boolean, BooleanType)) => Some(b)
        case _ => None
      }
      val hasCols = Seq("id", "word", "w").forall(n =>
        child.output.exists(o => conf.resolver(o.name, n)))
      // the surface's fixed (l_id BIGINT, r_id BIGINT) schema casts ids
      // to long, so only integral id domains are eligible: a string id
      // would fail the cast at runtime (ANSI) and a fractional one
      // would silently truncate — non-integral ids keep the
      // programmatic API (which preserves the id type on the sparse
      // path) and the hint declines loudly here instead.
      val integralId = child.output.find(o => conf.resolver(o.name, "id"))
        .exists(_.dataType match {
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.LongType => true
          // exact-integral decimals cast to long losslessly (p ≤ 18
          // fits in a 64-bit long)
          case d: org.apache.spark.sql.types.DecimalType
              if d.scale == 0 && d.precision <= 18 => true
          case _ => false
        })
      if (excludeSelf.isEmpty || !hasCols || !integralId) {
        logWarning(s"$HintName: expects child columns (id, word, w) with an " +
          s"integral id and at most one boolean excludeSelf argument; got " +
          s"schema ${child.output.map(o => s"${o.name}:${o.dataType.simpleString}")
            .mkString(", ")}, args $params — hint ignored")
        h
      } else {
        val key = (child.canonicalized, excludeSelf.get)
        cache.synchronized(Option(cache.get(key))).getOrElse {
          val df = org.apache.spark.sql.GraftSqlApi.ofRows(spark, child)
            .select(col("id"), col("word"), col("w"))
          val rewritten = graft.similarity.Similarity
            .argmaxAdaptive(df, df, excludeSelf = excludeSelf.get)
            // both physical strategies agree on values; normalize types so
            // the SQL surface has ONE schema regardless of strategy (the
            // dense scorer emits long ids, the sparse path the child's)
            .select(col("l_id").cast("long").as("l_id"),
              col("r_id").cast("long").as("r_id"),
              col("sim").cast("double").as("sim"))
            .queryExecution.analyzed
          cache.synchronized(cache.put(key, rewritten))
          rewritten
        }
      }
  }
}
