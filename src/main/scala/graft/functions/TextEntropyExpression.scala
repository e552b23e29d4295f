package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass character-entropy kernel shared by interpreted eval and
  * generated code (the standard Spark built-in pattern: codegen emits a
  * call to a static helper rather than inlining the loop).
  */
object TextEntropy {
  /** Nano-quantized char-level Shannon entropy, exactly the q138
    * contract: for each distinct UTF-16 code unit `c` with count `cnt`
    * over `n` total, term = HALF_UP(1e9 * (cnt/n) * ln(cnt/n)) as a
    * long; result = -Σ terms. Per-term quantization BEFORE the sum
    * keeps the value independent of iteration order (sum of longs),
    * which is what makes it engine-portable — the same reason the
    * declarative form quantizes per term. Code-UNIT counting matches
    * `split(text, '')` on BMP text (the corpus is ASCII). Empty
    * input → 0 (log never sees 0/0).
    */
  def nano(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0L
    // ASCII fast path (the overwhelmingly common case for this
    // corpus); spill to a map only when a high char appears
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Character, Integer] = null
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c < 128) ascii(c) += 1
      else {
        if (other == null) other = new java.util.HashMap[Character, Integer]()
        other.merge(c, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      }
      i += 1
    }
    var acc = 0L
    var c = 0
    while (c < 128) {
      if (ascii(c) > 0) acc += term(ascii(c), n)
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) acc += term(it.next(), n)
    }
    -acc
  }

  /** HALF_UP(1e9 * (cnt/n) * ln(cnt/n)) — same value and association
    * as `round(1e9 * (cnt / n) * ln(cnt / n))` in Spark SQL (round on
    * doubles is BigDecimal HALF_UP). */
  private def term(cnt: Int, n: Int): Long = {
    val p = cnt.toDouble / n
    java.math.BigDecimal.valueOf(1e9 * p * math.log(p))
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
  }
}

/** `char_entropy_nano(text)`: the native-codegen form of q138's
  * quantized entropy (fourth native expression family after the dot
  * products, int8 quantization, and the lemmatizer). Exists because
  * higher-order array lambdas are INTERPRETED — the declarative
  * histogram pays per-distinct-char lambda evals (2.3 s at sf0.1 even
  * with native `replace` bodies); this is one tight pass per row inside
  * whole-stage codegen. Value-identical to the declarative form by
  * construction ([[TextEntropy.nano]]), which the q138 gate and spec
  * pin.
  */
case class CharEntropyNano(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy_nano requires a string argument, got " +
        child.dataType.simpleString)
  override def dataType: DataType = LongType
  override def prettyName: String = "char_entropy_nano"

  override def nullSafeEval(v: Any): Any =
    TextEntropy.nano(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextEntropy$$.MODULE$$.nano($c)")

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropyNano = copy(child = newChild)
}

object CharEntropyNanoFn {
  /** Column form, session-registration-free (the GraftSqlApi bridge). */
  def apply(c: Column): Column =
    org.apache.spark.sql.GraftSqlApi.column(
      CharEntropyNano(org.apache.spark.sql.GraftSqlApi.expr(c)))
}
