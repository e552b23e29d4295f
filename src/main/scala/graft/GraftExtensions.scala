package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DoubleDotProduct, FloatDotProduct}

/** Session-extension entry point (SURVEY.md §7.3): makes the native
  * vector expressions available to plain SQL users via
  * `--conf spark.sql.extensions=graft.GraftExtensions`:
  *
  * {{{
  *   SELECT a.vec_id, b.vec_id, float_dot(a.embedding, b.embedding) AS cos
  *   FROM embeddings a JOIN embeddings b ...
  * }}}
  *
  * (Programmatic users can instead call `VectorFunctions.register`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (exprs: Seq[Expression]) => FloatDotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("double_dot"),
      new ExpressionInfo(classOf[DoubleDotProduct].getName, "double_dot"),
      (exprs: Seq[Expression]) => DoubleDotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("lemmatize_tokens"),
      new ExpressionInfo(classOf[graft.text.LemmatizeTokens].getName, "lemmatize_tokens"),
      (exprs: Seq[Expression]) => graft.text.LemmatizeTokens(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("dhash64"),
      new ExpressionInfo(classOf[graft.functions.DHash64Expr].getName,
        "dhash64"),
      (exprs: Seq[Expression]) => graft.functions.DHash64Expr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("char_entropy_nano"),
      new ExpressionInfo(classOf[graft.functions.CharEntropyNano].getName,
        "char_entropy_nano"),
      (exprs: Seq[Expression]) => graft.functions.CharEntropyNano(exprs.head)))
    // round-5 kernels: parameters must be NON-NULL literals (they
    // configure the compiled kernel — a per-row pattern would need a
    // different design); arity and nullability are checked at function
    // resolution so SQL users get a clear boundary error, not an
    // eval-time NPE or IndexOutOfBounds
    def litValue(e: Expression, what: String): (Any, org.apache.spark.sql.types.DataType) =
      e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(null, _) =>
          throw new IllegalArgumentException(s"$what must not be NULL")
        case org.apache.spark.sql.catalyst.expressions.Literal(v, t) => (v, t)
        case other => throw new IllegalArgumentException(
          s"$what must be a literal, got $other")
      }
    // typed extraction: the literal's DataType is checked here so a
    // mistyped parameter (rolling_hashes(text, '20'), phrase_count(t, 1,
    // 'y')) raises the same boundary-error style as arity/NULL — never a
    // raw ClassCastException from a blind asInstanceOf
    def litString(e: Expression, what: String): String = {
      import org.apache.spark.sql.types.StringType
      litValue(e, what) match {
        case (v, _: StringType) => v.toString
        case (_, t) => throw new IllegalArgumentException(
          s"$what must be a STRING literal, got ${t.sql}")
      }
    }
    def litInt(e: Expression, what: String): Int = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      litValue(e, what) match {
        case (v: Number, ByteType | ShortType | IntegerType | LongType) =>
          val l = v.longValue()
          if (l < Int.MinValue || l > Int.MaxValue)
            throw new IllegalArgumentException(s"$what out of INT range: $l")
          l.toInt
        case (_, t) => throw new IllegalArgumentException(
          s"$what must be an INTEGER literal, got ${t.sql}")
      }
    }
    def arity(exprs: Seq[Expression], n: Int, fn: String,
        atLeast: Boolean = false): Unit =
      if (if (atLeast) exprs.length < n else exprs.length != n)
        throw new IllegalArgumentException(
          s"$fn expects ${if (atLeast) "at least " else ""}$n arguments, " +
            s"got ${exprs.length}")
    e.injectFunction((
      FunctionIdentifier("phrase_count"),
      new ExpressionInfo(classOf[graft.functions.PhraseCountExpr].getName,
        "phrase_count"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 3, "phrase_count(text, w1, w2)")
        graft.functions.PhraseCountExpr(exprs(0),
          litString(exprs(1), "phrase_count w1"),
          litString(exprs(2), "phrase_count w2"))
      }))
    e.injectFunction((
      FunctionIdentifier("rolling_hashes"),
      new ExpressionInfo(classOf[graft.functions.RollingHashesExpr].getName,
        "rolling_hashes"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "rolling_hashes(text, L)")
        graft.functions.RollingHashesExpr(exprs(0),
          litInt(exprs(1), "rolling_hashes gram length"))
      }))
    e.injectFunction((
      FunctionIdentifier("ac_counts"),
      new ExpressionInfo(classOf[graft.functions.AcCountsExpr].getName,
        "ac_counts"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "ac_counts(text, pattern, ...)", atLeast = true)
        graft.functions.AcCountsExpr(exprs(0),
          exprs.tail.map(p => litString(p, "ac_counts pattern")))
      }))
    // lake time travel as TABLE-VALUED functions — the SQL surface of
    // SnapshotStore (graft.plans.SnapshotTvf): the manifest resolves
    // during analysis (a TSV read), the plan is the pinned file set,
    // and every store guarantee (loud rewrite boundary, non-append
    // delta law, file-level pruning) carries over unchanged
    e.injectTableFunction((
      FunctionIdentifier("graft_asof"),
      new ExpressionInfo(graft.plans.SnapshotTvf.getClass.getName,
        "graft_asof"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "graft_asof(snapshot_dir, id)")
        graft.plans.SnapshotTvf.asOfPlan(
          litString(exprs(0), "graft_asof snapshot dir"),
          litInt(exprs(1), "graft_asof snapshot id"))
      }))
    e.injectTableFunction((
      FunctionIdentifier("graft_delta"),
      new ExpressionInfo(graft.plans.SnapshotTvf.getClass.getName,
        "graft_delta"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 3, "graft_delta(snapshot_dir, from_id, to_id)")
        graft.plans.SnapshotTvf.deltaPlan(
          litString(exprs(0), "graft_delta snapshot dir"),
          litInt(exprs(1), "graft_delta from id"),
          litInt(exprs(2), "graft_delta to id"))
      }))
    // the delete-masked BM25 serve as a TVF — the SQL-twin convention
    // completed on the SERVING side: the index must pre-exist (loud at
    // plan time), the masked df rides the validated critical section
    e.injectTableFunction((
      FunctionIdentifier("graft_card"),
      new ExpressionInfo(graft.plans.SnapshotTvf.getClass.getName,
        "graft_card"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 1, "graft_card(card_path)")
        graft.plans.SnapshotTvf.cardServePlan(
          litString(exprs(0), "graft_card card path"))
      }))
    e.injectTableFunction((
      FunctionIdentifier("graft_card_drift"),
      new ExpressionInfo(graft.plans.SnapshotTvf.getClass.getName,
        "graft_card_drift"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "graft_card_drift(card_a_path, card_b_path)")
        graft.plans.SnapshotTvf.cardDriftPlan(
          litString(exprs(0), "graft_card_drift card A path"),
          litString(exprs(1), "graft_card_drift card B path"))
      }))
    e.injectTableFunction((
      FunctionIdentifier("graft_bm25_masked"),
      new ExpressionInfo(graft.plans.SnapshotTvf.getClass.getName,
        "graft_bm25_masked"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 3, "graft_bm25_masked(lake_dir, mod, rem)")
        graft.plans.SnapshotTvf.maskedServePlan(
          litString(exprs(0), "graft_bm25_masked lake dir"),
          litInt(exprs(1), "graft_bm25_masked tombstone mod"),
          litInt(exprs(2), "graft_bm25_masked tombstone rem"))
      }))
    // the custom top-k planner strategy, so SQL/DataFrame sessions built
    // with the extension plan TopKPerKey nodes without a TopK.install call
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // /*+ TOPK_PER_KEY(keys..., ord, k) */ SQL surface for the operator
    e.injectResolutionRule(_ => graft.plans.TopKHintRule())
    // /*+ SIMILARITY_TOP1 */ SQL surface for the adaptive similarity join
    e.injectResolutionRule(session => graft.plans.SimilarityHintRule(session))
    // /*+ SETSIM_JOIN(num, den) */ SQL surface for the exact set-similarity join
    e.injectResolutionRule(session => graft.plans.SetSimHintRule(session))
    // /*+ BM25('term', ..., k) */ SQL surface for ranked retrieval
    e.injectResolutionRule(session => graft.plans.Bm25HintRule(session))
    // /*+ BM25_MULTI('query_view', k) */ — the query-TABLE (fleet) form
    e.injectResolutionRule(session => graft.plans.Bm25MultiHintRule(session))
  }
}
