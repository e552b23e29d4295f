package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructType}

/** Native Catalyst expression for the Okapi BM25 fold over a grouped
  * per-(query, doc) component row — the hot inner loop of every BM25
  * scoring surface (q244/q248/q271/q273/q281–q284/q290/q300 and the
  * sweep).
  *
  * Replaces `round(aggregate(terms, 0.0, (acc, t) => acc + ...), 6)`'s
  * inner fold: Spark's higher-order functions (`aggregate`,
  * `transform`) are CodegenFallback — each element is evaluated by the
  * interpreted lambda machinery, measured at ~58 µs/row on the q281
  * serve stage (16 tasks × 4.3 s over 1.1 M rows; see
  * OPTIMIZATION_r15.md). This expression runs the identical arithmetic
  * as a primitive loop inside whole-stage codegen.
  *
  * EXACT-EQUALITY CONTRACT: the accumulation order (array order — the
  * caller sorts `terms`) and every double operation, cast, and
  * association match the Column-expression fold term for term, so the
  * produced doubles are bit-identical and every oracle hash is
  * unchanged:
  *
  *   acc += log(1.0 + ((double)(n_docs − df) + 0.5) / ((double)df + 0.5))
  *          · ((double)tf · (k1 + 1.0))
  *          / ((double)tf + k1 · ((1.0 − b) + (b · (double)dl) / avgdl))
  *
  * with k1 = (double)k1_micro / 1e6, b = (double)b_micro / 1e6. The
  * caller keeps the outer `round(_, 6)`.
  *
  * Children: terms array<struct<tf: long, df: long>>, dl long,
  * n_docs long, avgdl double, k1_micro long, b_micro long → double.
  */
case class Bm25OkapiFold(terms: Expression, dl: Expression,
    nDocs: Expression, avgdl: Expression, k1Micro: Expression,
    bMicro: Expression) extends Expression {

  override def children: Seq[Expression] =
    Seq(terms, dl, nDocs, avgdl, k1Micro, bMicro)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bm25_fold"
  // not foldable even over literal children — keep constant-folding
  // away from the loop (never hot; literals don't reach this shape)
  override def foldable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val termsOk = terms.dataType match {
      case ArrayType(st: StructType, _) =>
        st.fields.length == 2 &&
          st.fields.forall(_.dataType == LongType)
      case _ => false
    }
    val scalarsOk = dl.dataType == LongType && nDocs.dataType == LongType &&
      avgdl.dataType == DoubleType && k1Micro.dataType == LongType &&
      bMicro.dataType == LongType
    if (termsOk && scalarsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bm25_fold requires (array<struct<long,long>>, long, long, double, " +
        s"long, long), got ${children.map(_.dataType.simpleString)}")
  }

  override def eval(input: InternalRow): Any = {
    val t = terms.eval(input)
    val d = dl.eval(input)
    val nd = nDocs.eval(input)
    val ad = avgdl.eval(input)
    val k1m = k1Micro.eval(input)
    val bm = bMicro.eval(input)
    if (t == null || d == null || nd == null || ad == null || k1m == null ||
      bm == null) null
    else {
      val arr = t.asInstanceOf[ArrayData]
      val dlV = d.asInstanceOf[Long]
      val ndV = nd.asInstanceOf[Long]
      val adV = ad.asInstanceOf[Double]
      val k1 = k1m.asInstanceOf[Long].toDouble / 1e6
      val b = bm.asInstanceOf[Long].toDouble / 1e6
      var acc = 0.0
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val row = arr.getStruct(i, 2)
        val tf = row.getLong(0)
        val df = row.getLong(1)
        acc += math.log(1.0d + ((ndV - df).toDouble + 0.5d) /
            (df.toDouble + 0.5d)) *
          (tf.toDouble * (k1 + 1.0d)) /
          (tf.toDouble + k1 * ((1.0d - b) + (b * dlV.toDouble) / adV))
        i += 1
      }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = terms.genCode(ctx)
    val d = dl.genCode(ctx)
    val nd = nDocs.genCode(ctx)
    val ad = avgdl.genCode(ctx)
    val k1c = k1Micro.genCode(ctx)
    val bc = bMicro.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val row = ctx.freshName("trow")
    val tf = ctx.freshName("tf")
    val df = ctx.freshName("df")
    val k1 = ctx.freshName("k1")
    val b = ctx.freshName("b")
    val acc = ctx.freshName("acc")
    val code =
      code"""
        ${t.code}
        ${d.code}
        ${nd.code}
        ${ad.code}
        ${k1c.code}
        ${bc.code}
        boolean ${ev.isNull} = ${t.isNull} || ${d.isNull} || ${nd.isNull} ||
          ${ad.isNull} || ${k1c.isNull} || ${bc.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          final double $k1 = (double) ${k1c.value} / 1.0E6;
          final double $b = (double) ${bc.value} / 1.0E6;
          final int $n = ${t.value}.numElements();
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            InternalRow $row = ${t.value}.getStruct($i, 2);
            long $tf = $row.getLong(0);
            long $df = $row.getLong(1);
            $acc += java.lang.Math.log(1.0D +
                (((double) (${nd.value} - $df)) + 0.5D) /
                (((double) $df) + 0.5D)) *
              (((double) $tf) * ($k1 + 1.0D)) /
              (((double) $tf) + $k1 *
                ((1.0D - $b) + ($b * (double) ${d.value}) / ${ad.value}));
          }
          ${ev.value} = $acc;
        }"""
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Bm25OkapiFold =
    copy(terms = newChildren(0), dl = newChildren(1), nDocs = newChildren(2),
      avgdl = newChildren(3), k1Micro = newChildren(4),
      bMicro = newChildren(5))
}

object Bm25Functions {
  /** Register the fold in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bm25_fold", exprs => Bm25OkapiFold(exprs(0), exprs(1), exprs(2),
        exprs(3), exprs(4), exprs(5)), "built-in")

  /** Codegen'd Okapi fold (requires [[register]]); the caller applies
    * the contract's outer `round(_, 6)`. */
  def fold(terms: Column, dl: Column, nDocs: Column, avgdl: Column,
      k1Micro: Column, bMicro: Column): Column =
    call_function("bm25_fold", terms, dl, nDocs, avgdl, k1Micro, bMicro)
}
