package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling-hash kernel shared by interpreted eval and
  * generated code (the [[TextEntropy]]/[[PhraseCount]] pattern).
  */
object RollingHash {
  /** Odd 64-bit multiplier; the hash ring is the wrapping-long ring
    * (mod 2⁶⁴), so multiplication by an odd constant is a bijection and
    * the polynomial hash loses no entropy to the modulus.
    */
  val Base = 0x9e3779b97f4a7c15L

  /** All L-gram polynomial hashes of `text`, one per 1-based start
    * position `1..n-L+1` (empty array when the text is shorter than L):
    * `h(p) = Σ_k c[p+k]·B^(L-1-k)` in the wrapping-long ring, computed
    * by the O(1)-per-position roll `h(p+1) = (h(p) − c[p]·B^(L-1))·B +
    * c[p+L]`. Equal grams ⇒ equal hashes ALWAYS (the hash is a pure
    * function of the gram), so hash-count pruning never loses a true
    * duplicate; unequal grams collide with ~2⁻⁶⁴ probability, which the
    * caller removes with an exact string verify on the (small)
    * candidate set. Positions and gram symbols are CODE POINTS — the
    * same unit Spark's `substring`, DuckDB's `substr`, and `n_chars`
    * count — so q153's `substring(text, pos, L)` re-extraction is
    * aligned even for supplementary-plane text (a surrogate pair is
    * one symbol, not two).
    */
  def hashes(text: UTF8String, l: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n < l) return new GenericArrayData(Array.emptyLongArray)
    var bl = 1L
    var k = 1
    while (k < l) { bl *= Base; k += 1 }
    val out = new Array[Long](n - l + 1)
    var h = 0L
    var i = 0
    while (i < l) { h = h * Base + cps(i); i += 1 }
    out(0) = h
    var p = 1
    while (p <= n - l) {
      h = (h - cps(p - 1) * bl) * Base + cps(p + l - 1)
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** `rolling_hashes(text, L)`: array of all L-gram Rabin–Karp hashes —
  * the 100 TB substring-dedup key. Exists so the gram EXCHANGE carries
  * 8-byte longs instead of materialized L-char strings (q153: the
  * count-by-gram stage is the corpus-scale shuffle; at L=20 the string
  * key is 5× the hash key and the per-position `substring` copy is L
  * bytes where the roll is O(1)). One tight pass per row inside
  * whole-stage codegen.
  */
case class RollingHashesExpr(child: Expression, l: Int)
    extends UnaryExpression {
  require(l >= 1, s"rolling_hashes gram length must be >= 1, got $l")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hashes requires a string argument, got " +
        child.dataType.simpleString)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hashes"

  override def nullSafeEval(v: Any): Any =
    RollingHash.hashes(v.asInstanceOf[UTF8String], l)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash$$.MODULE$$.hashes($c, $l)")

  override protected def withNewChildInternal(
      newChild: Expression): RollingHashesExpr = copy(child = newChild)
}

object RollingHashesFn {
  /** Column form, session-registration-free (the GraftSqlApi bridge). */
  def apply(c: Column, l: Int): Column =
    org.apache.spark.sql.GraftSqlApi.column(
      RollingHashesExpr(org.apache.spark.sql.GraftSqlApi.expr(c), l))
}
