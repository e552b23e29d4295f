package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `dhash64(image_bytes)`: the perceptual fingerprint of q231 as a
  * native expression, so SQL users can hash an image column without
  * Scala — `SELECT path, dhash64(content) FROM images` composes with
  * the banded-Hamming join pattern (`shiftright(h, b*8) & 255` band
  * keys, `bit_count(a # b)` verify) entirely in SQL.
  *
  * Codegen delegates straight to
  * [[graft.multimodal.Multimodal.dHash64]] — the cost is the ImageIO
  * decode, not expression dispatch, so a one-call defineCodeGen keeps
  * the row loop inside whole-stage codegen without duplicating the
  * decoder. Corrupt/undecodable bytes fail loudly there (the q45
  * decoder contract); NULL input → NULL out via nullSafeEval.
  */
case class DHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dhash64 requires a binary argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "dhash64"

  override def nullSafeEval(v: Any): Any =
    graft.multimodal.Multimodal.dHash64(v.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.multimodal.Multimodal$$.MODULE$$.dHash64($c)")

  override protected def withNewChildInternal(
      newChild: Expression): DHash64Expr = copy(child = newChild)
}

object DHash64Fn {
  /** Column form, session-registration-free (the GraftSqlApi bridge). */
  def apply(c: Column): Column =
    org.apache.spark.sql.GraftSqlApi.column(
      DHash64Expr(org.apache.spark.sql.GraftSqlApi.expr(c)))
}
