package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass adjacent-bigram counter shared by interpreted eval and
  * generated code (the [[TextEntropy]] pattern: codegen emits a call to
  * a static helper rather than inlining the loop).
  */
object PhraseCount {
  /** Number of positions i where `split(text, ' ')` yields
    * token(i) == w1 and token(i+1) == w2 — exactly q146's
    * `filter(sequence(1, size(toks)-1), i -> ...)` contract, including
    * its empty-token semantics (consecutive spaces delimit empty
    * tokens, as `split` does) and overlap handling (the scan carries
    * only a "previous token was w1" bit, which is what the positional
    * filter computes). One pass, zero allocation beyond the decoded
    * string: token boundaries are space positions and tokens compare
    * via `regionMatches`, never substrings.
    */
  def count(text: UTF8String, w1: String, w2: String): Long = {
    val s = text.toString
    val n = s.length
    var cnt = 0L
    var start = 0
    var prevIsW1 = false
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        val len = i - start
        if (prevIsW1 && len == w2.length && s.regionMatches(start, w2, 0, len))
          cnt += 1
        prevIsW1 = len == w1.length && s.regionMatches(start, w1, 0, len)
        start = i + 1
      }
      i += 1
    }
    cnt
  }
}

/** `phrase_count(text, w1, w2)`: the native-codegen form of q146's
  * positional phrase search. Exists because higher-order array lambdas
  * are INTERPRETED — the declarative `filter(sequence(1, size-1), ...)`
  * pays two lambda evals per token position (28 s at sf0.1 for a
  * map-only scan); this is one tight pass per row inside whole-stage
  * codegen, and it also deletes the `split` array materialization.
  * Value-identical to the declarative form by construction
  * ([[PhraseCount.count]]), which the q146 gate and spec pin.
  */
case class PhraseCountExpr(child: Expression, w1: String, w2: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"phrase_count requires a string argument, got " +
        child.dataType.simpleString)
  override def dataType: DataType = LongType
  override def prettyName: String = "phrase_count"

  override def nullSafeEval(v: Any): Any =
    PhraseCount.count(v.asInstanceOf[UTF8String], w1, w2)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w1Ref = ctx.addReferenceObj("w1", w1, "java.lang.String")
    val w2Ref = ctx.addReferenceObj("w2", w2, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PhraseCount$$.MODULE$$.count($c, $w1Ref, $w2Ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PhraseCountExpr = copy(child = newChild)
}

object PhraseCountFn {
  /** Column form, session-registration-free (the GraftSqlApi bridge). */
  def apply(c: Column, w1: String, w2: String): Column =
    org.apache.spark.sql.GraftSqlApi.column(
      PhraseCountExpr(org.apache.spark.sql.GraftSqlApi.expr(c), w1, w2))
}
