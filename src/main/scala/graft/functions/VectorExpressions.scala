package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{aggregate, call_function, lit, sqrt, zip_with}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the dense-vector hot path (SURVEY.md
  * §4.3(b): a codegen'd `Expression` beats a Scala UDF beats anything
  * else).
  *
  * [[FloatDotProduct]] computes Σ aᵢ·bᵢ over two `array<float>` columns
  * in double precision, sequentially — deterministic accumulation order
  * (oracle-stable) and a tight primitive loop in generated code: no
  * boxing, no lambda-expression interpretation (unlike the equivalent
  * `aggregate(zip_with(...))`, which falls back to interpreted lambda
  * evaluation per element), and it stays inside whole-stage codegen.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // NB ExpectsInputTypes is unavailable (AbstractDataType is
  // private[sql]) — validate manually: getFloat on a non-float array
  // would silently read garbage bytes. Exposed to arbitrary SQL via
  // GraftExtensions, so analysis-time rejection matters.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"float_dot requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"float_dot: dimension mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "float_dot: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** As [[FloatDotProduct]] but over `array<double>` children — used by
  * the dense-vector strategy of the sparse similarity join, where
  * TF-IDF weights are doubles.
  */
case class DoubleDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"double_dot requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"double_dot: dimension mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "double_dot: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-level vector functions. */
object VectorFunctions {

  /** Register the native expressions in the session's function registry
    * (idempotent). Needed once per SparkSession before using [[dot]].
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot", exprs => FloatDotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "double_dot", exprs => DoubleDotProduct(exprs(0), exprs(1)), "built-in")
  }

  /** Codegen'd dot product of two array<float> columns (requires
    * [[register]]).
    */
  def dot(a: Column, b: Column): Column = call_function("float_dot", a, b)

  /** Codegen'd dot product of two array<double> columns (requires
    * [[register]]).
    */
  def dotD(a: Column, b: Column): Column = call_function("double_dot", a, b)

  /** Built-in-functions fallback with identical semantics (element-wise
    * double product, sequential sum). Used to cross-check the native
    * expression in tests; interpreted lambda evaluation makes it the
    * slower path.
    */
  def dotZip(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of an array<float> column. */
  def norm(a: Column): Column = sqrt(dotZip(a, a))
}
