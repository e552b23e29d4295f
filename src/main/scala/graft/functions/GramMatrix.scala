package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One upper-triangle cell of the corpus Gram/covariance matrix:
  * `cov_num = n·Σ(q_i q_j) − Σq_i · Σq_j` over micro-quantized
  * embedding coordinates — the INTEGER numerator of n²·cov(i,j)
  * (divide by n² in double space for the actual covariance). */
case class GramCell(i: Int, j: Int, cov_num: Long)

/** Buffer: element count, max |q| seen (feeds the exactness guard),
  * per-dim linear sums, and the flattened upper-triangle product sums
  * (row-major: (i,j) with j >= i at offset i·d − i(i−1)/2 + (j−i)). */
case class GramBuf(n: Long, maxq: Long, sx: Array[Long], sxy: Array[Long])

/** Distributed exact Gram/covariance moments over an embedding column —
  * the second typed `Aggregator` (after [[ExactGeoMean]]), and the ONE
  * aggregate shape the declarative route handles badly: a 64-dim
  * covariance needs Σq_i and Σ(q_i·q_j) for all 2080 unordered dim
  * pairs, which relationally is a corpus×64 unnest self-joined into
  * corpus×2080 rows before any partial aggregation can shrink it (the
  * oracle pays exactly that). Here each row folds its outer product
  * into a single flat long buffer INSIDE the map-side partial
  * aggregate, so the exchange carries one ~16 KiB buffer per
  * partition — at 100 TB the covariance pass is a map-only scan plus a
  * constant-size merge tree, the same shape `RowMatrix
  * .computeGramianMatrix` uses (public Spark MLlib), but with integer
  * moments that are bit-identical under any partitioning.
  *
  * Exactness: coordinates quantize to micro-unit longs via the SAME
  * `round(1e6 * x)` HALF_UP form as q141's projection (the proven
  * engine-portable rounding); every subsequent sum is integer. The
  * covariance NUMERATOR n·Σxy − Σx·Σy is returned as an exact long —
  * doubles never appear. `finish` `require`s n·maxq² and the final
  * products inside long range, so a corpus too large for exact longs
  * fails loudly instead of wrapping (the q101 overflow-guard rule).
  */
class GramMatrixAgg(val dim: Int) extends Aggregator[Seq[Float], GramBuf, Seq[GramCell]]
    with Serializable {
  private val pairs = dim * (dim + 1) / 2

  override def zero: GramBuf =
    GramBuf(0L, 0L, new Array[Long](dim), new Array[Long](pairs))

  private def quant(x: Float): Long =
    java.math.BigDecimal.valueOf(1e6 * x.toDouble)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  override def reduce(b: GramBuf, v: Seq[Float]): GramBuf = {
    require(v.length == dim, s"expected $dim dims, got ${v.length}")
    val q = new Array[Long](dim)
    var i = 0
    var mx = b.maxq
    while (i < dim) {
      q(i) = quant(v(i))
      val a = math.abs(q(i))
      if (a > mx) mx = a
      i += 1
    }
    var k = 0
    i = 0
    while (i < dim) {
      b.sx(i) += q(i)
      var j = i
      while (j < dim) {
        b.sxy(k) += q(i) * q(j)
        k += 1
        j += 1
      }
      i += 1
    }
    GramBuf(b.n + 1, mx, b.sx, b.sxy)
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    var i = 0
    while (i < dim) { a.sx(i) += b.sx(i); i += 1 }
    var k = 0
    while (k < pairs) { a.sxy(k) += b.sxy(k); k += 1 }
    GramBuf(a.n + b.n, math.max(a.maxq, b.maxq), a.sx, a.sxy)
  }

  override def finish(b: GramBuf): Seq[GramCell] = {
    // every |Σxy| <= n·maxq² and |Σx·Σy| <= (n·maxq)², so n·Σxy stays
    // exact when n²·maxq² < Long.Max — loud failure beats silent wrap
    if (b.n > 0) {
      val bound = BigInt(b.n) * BigInt(b.n) * BigInt(b.maxq) * BigInt(b.maxq)
      require(bound < BigInt(Long.MaxValue),
        s"covariance numerator may overflow long: n=${b.n} maxq=${b.maxq}")
    }
    val out = Vector.newBuilder[GramCell]
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        out += GramCell(i, j, b.n * b.sxy(k) - b.sx(i) * b.sx(j))
        k += 1
        j += 1
      }
      i += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[GramBuf] = ExpressionEncoder[GramBuf]()
  override def outputEncoder: Encoder[Seq[GramCell]] =
    ExpressionEncoder[Seq[GramCell]]()
}
