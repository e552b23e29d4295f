package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom AGGREGATE function (the `Aggregator` extension surface —
  * the engine's custom scalar functions are native `Expression`s, its
  * custom operators `SparkPlan`s; this is the third extension family:
  * a user-defined aggregate registered for both the DataFrame and SQL
  * surfaces via `functions.udaf`).
  *
  * Exact GEOMETRIC mean of (1 + x): each input contributes
  * `round(ln(1 + x) * 1e9)` NANO-QUANTIZED LONG log-units, so the
  * buffer is a pair of exact longs — `reduce` and `merge` are integer
  * additions, associative and commutative, which makes the aggregate
  * bit-identical under any partitioning, combine order, or retry (the
  * q98/q113 quantization rule applied to the one aggregate family
  * Spark cannot partial-agg exactly in doubles: a float log-sum drifts
  * with the tree shape). Doubles reappear only in `finish`:
  * `exp(sum / n / 1e9)`, two exact longs in, one division each — the
  * same arithmetic the DuckDB oracle replays. The geometric mean is
  * the right location statistic for heavy-tailed size distributions
  * (doc lengths, file sizes), where the arithmetic mean is dominated
  * by the tail.
  *
  * Buffer encoding: `Encoders.product` tuple — Tungsten-serializable,
  * partial-aggregated map-side like any built-in (the plan shows
  * partial_geo_mean / geo_mean HashAggregate stages).
  */
object ExactGeoMean extends Aggregator[Long, (Long, Long), Double] {
  val Nano = 1e9

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), x: Long): (Long, Long) =
    // log(1 + x), not log1p: the oracle computes ln(1 + x) over the
    // same exact double, and the two engines must quantize the SAME
    // expression (log1p is more accurate near 0 but can differ in the
    // last ulp — a different nano unit, a different hash)
    (b._1 + 1L, b._2 + math.round(math.log(1.0 + x.toDouble) * Nano))

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Long, Long)): Double =
    if (b._1 == 0L) Double.NaN
    else {
      val mean = b._2.toDouble / b._1 / Nano
      BigDecimal(math.exp(mean))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.product[(Long, Long)]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
