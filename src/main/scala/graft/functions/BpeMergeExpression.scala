package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge pass shared by interpreted eval and generated code
  * (the [[RollingHash]] pattern). */
object BpeMerge {
  private val Space = UTF8String.fromString(" ")

  /** Left-to-right single-pass merge: wherever the last EMITTED token
    * equals `a` and the current token equals `b`, replace the emitted
    * token with "a b". Exactly the fold
    * `aggregate(toks, [], (acc, t) -> if (last(acc) = a AND t = b)
    *  replace-last(acc, concat_ws(" ", a, b)) else append(acc, t))` —
    * including its null algebra: a null token never compares equal, so
    * it is appended as-is (the `when` condition is null ⇒ otherwise).
    * A just-merged "a b" is the new last element, so merges never
    * cascade within one pass (matching the fold, where last(acc)
    * becomes the merged token).
    */
  def merge(toks: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = toks.numElements()
    val out = new Array[AnyRef](n)
    val merged = UTF8String.concat(a, Space, b)
    var m = 0 // emitted count
    var i = 0
    while (i < n) {
      val t = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      if (t != null && m > 0 && out(m - 1) != null &&
        out(m - 1).asInstanceOf[UTF8String] == a && t == b) {
        out(m - 1) = merged
      } else {
        out(m) = t
        m += 1
      }
      i += 1
    }
    new GenericArrayData(if (m == n) out else java.util.Arrays.copyOf(out, m))
  }
}

/** `bpe_merge_pair(toks, a, b)`: one BPE merge pass over a token
  * array — the q114/q115/q126 training/encode kernel. Replaces the
  * `aggregate(...)` fold spelling, which is doubly pathological:
  * higher-order functions are CodegenFallback (interpreted lambda per
  * element) AND the array accumulator is rebuilt per element
  * (`concat`/`slice` copy the whole prefix — O(T²) per document).
  * This is a single O(T) pass inside whole-stage codegen, bit-equal
  * output (same merge rule, same null algebra).
  */
case class BpeMergePair(toks: Expression, a: Expression, b: Expression)
    extends TernaryExpression {
  override def first: Expression = toks
  override def second: Expression = a
  override def third: Expression = b

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = toks.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (arrOk && a.dataType == StringType && b.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bpe_merge_pair requires (array<string>, string, string), got " +
        s"${Seq(toks, a, b).map(_.dataType.simpleString).mkString(", ")}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_merge_pair"

  override def nullSafeEval(t: Any, av: Any, bv: Any): Any =
    BpeMerge.merge(t.asInstanceOf[ArrayData], av.asInstanceOf[UTF8String],
      bv.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, av, bv) =>
      s"graft.functions.BpeMerge$$.MODULE$$.merge($t, $av, $bv)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeMergePair =
    copy(toks = newFirst, a = newSecond, b = newThird)
}

object BpeMergeFn {
  /** Column form, session-registration-free (the GraftSqlApi bridge). */
  def apply(toks: Column, a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlApi.column(
      BpeMergePair(org.apache.spark.sql.GraftSqlApi.expr(toks),
        org.apache.spark.sql.GraftSqlApi.expr(a),
        org.apache.spark.sql.GraftSqlApi.expr(b)))
}
