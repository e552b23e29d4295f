package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, max, min, row_number}

/** Custom whole-operator Catalyst extension (SURVEY.md §7.3(c) /
  * §2-A8 generalized): top-k rows per key WITHOUT a total sort.
  *
  * The built-in formulation (`row_number() OVER (PARTITION BY key ORDER
  * BY ord)` + filter) must SORT every partition — O(n log n) per key
  * group and a full `WindowExec` pipeline. This operator clusters rows
  * by key (declared via `requiredChildDistribution`, so Catalyst inserts
  * exactly one exchange — or none if the child is already partitioned
  * compatibly) and then keeps a bounded k-element min-heap per key:
  * O(n log k), no sort buffer, no spillable window state.
  *
  * Pieces: [[TopKPerKey]] (logical UnaryNode), [[TopKStrategy]]
  * (planner strategy, registered via `spark.experimental.extraStrategies`
  * or [[graft.GraftExtensions]]), [[TopKPerKeyExec]] (physical operator).
  *
  * Semantics: rows with the k largest (desc=true) `ord` values per key,
  * ties broken arbitrarily (callers needing stable output add a unique
  * tiebreak to `ord`, e.g. `ord * 1e6 - id`). Output order within key
  * is descending `ord`.
  */
case class TopKPerKey(keys: Seq[Expression], ord: Expression, k: Int,
    child: LogicalPlan, partial: Boolean = false) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, ord, k, child, partial) =>
      TopKPerKeyExec(keys, ord, k, planLater(child), partial) :: Nil
    case _ => Nil
  }
}

/** Physical top-k-per-key. Like an aggregate, it runs in two modes:
  *
  *  - '''partial''' — no distribution requirement; runs on the child's
  *    existing partitioning and keeps ≤k rows per key per PARTITION.
  *    This is the map-side combine: only O(keys×k×partitions) rows
  *    reach the exchange instead of the full input.
  *  - '''final''' — requires ClusteredDistribution(keys) (Catalyst
  *    inserts the hash exchange over the partial output) and reduces
  *    the per-partition survivors to the global per-key top-k.
  *
  * A partial pass is always safe: any row outside its partition's
  * top-k is outside the global top-k too.
  *
  * '''Memory bound''': the partial pass sees arbitrary input
  * partitioning, so worst case every key appears in every partition
  * and the heap map grows O(distinct keys × k) per task. When the map
  * exceeds `spark.graft.topk.maxPartialKeys` (default 100k) distinct
  * keys it is FLUSHED to the output iterator and cleared — safe because
  * the final pass merges duplicate-key survivors; the flush only trades
  * some combine ratio for bounded memory (the aggregate-buffer
  * fallback-to-sort analog, without the sort). The final pass never
  * flushes: after the exchange each key lives in exactly one partition,
  * so its map is O(keys-in-partition × k) and a flush would break the
  * top-k contract.
  */
case class TopKPerKeyExec(keys: Seq[Expression], ord: Expression, k: Int,
    child: SparkPlan, partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "partialFlushes" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "partial heap-map flushes"))

  /** Distinct keys held in one partial task's heap map before a flush. */
  val maxPartialKeys: Int =
    conf.getConfString("spark.graft.topk.maxPartialKeys", "100000").toInt

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val isPartial = partial
    val flushKeys = maxPartialKeys
    val outRows = longMetric("numOutputRows")
    val flushes = longMetric("partialFlushes")
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val ordExpr = BindReferences.bindReference(ord, childOutput)
      // per-key bounded min-heap: head = smallest of the current top-k
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[(Double, InternalRow)]]
      implicit val minOrd: Ordering[(Double, InternalRow)] =
        Ordering.by[(Double, InternalRow), Double](-_._1)
      def insert(row: InternalRow): Unit = {
        val ordVal = ordExpr.eval(row) match {
          case null => Double.NegativeInfinity
          case n: java.lang.Number => n.doubleValue()
          case other => throw new IllegalArgumentException(
            s"TopKPerKey ord must be numeric, got $other")
        }
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val h = mutable.PriorityQueue.empty[(Double, InternalRow)]
            h.enqueue((ordVal, row.copy()))
            heaps.put(key.copy(), h)
          case Some(h) if h.size < k =>
            h.enqueue((ordVal, row.copy()))
          case Some(h) if ordVal > h.head._1 =>
            h.dequeue()
            h.enqueue((ordVal, row.copy()))
          case _ => // below the current top-k: drop
        }
      }
      // drain the heap map (≤ heaps.size × k rows — bounded) and clear it
      def drain(): Iterator[InternalRow] = {
        val rows = heaps.valuesIterator
          .flatMap(h => h.toSeq.sortBy(-_._1).map(_._2)).toArray
        heaps.clear()
        rows.iterator
      }
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        def hasNext: Boolean = {
          while (!out.hasNext && it.hasNext) {
            insert(it.next())
            if (isPartial && heaps.size > flushKeys) {
              out = drain()
              flushes += 1
            }
          }
          if (!out.hasNext && heaps.nonEmpty) out = drain()
          out.hasNext
        }
        def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          outRows += 1
          out.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** User-facing API. */
object TopK {

  /** Ensure the planner strategy is installed (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Top-k rows of `df` per `keyCols`, largest `ordCol` first.
    *
    * NB the Spark 4 analyzer does not resolve attributes inside
    * third-party logical nodes (Column is ColumnNode-backed now), so
    * the node is built from ALREADY-RESOLVED attribute references: the
    * ordering expression is materialized as a helper column and both it
    * and the keys are looked up on the analyzed child plan.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], ordCol: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val ordName = "__graft_topk_ord"
    // an input column with the helper's name would be silently replaced
    // by withColumn AND dropped from the result — fail loudly instead
    require(!df.columns.exists(_.equalsIgnoreCase(ordName)),
      s"topKPerKey: column name $ordName is reserved for the ordering helper")
    val augmented = df.withColumn(ordName, ordCol.cast("double"))
    val child = augmented.queryExecution.analyzed
    def attr(name: String) = child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in ${child.output.map(_.name).mkString(", ")}"))
    val keys = keyCols.map(attr)
    // partial (pre-exchange, map-side) → exchange → final: the shuffle
    // carries only each partition's per-key top-k survivors
    val part = TopKPerKey(keys, attr(ordName), k, child, partial = true)
    org.apache.spark.sql.GraftSqlApi.ofRows(spark,
        TopKPerKey(keys, attr(ordName), k, part))
      .drop(ordName)
  }

  /** True iff every id in `idCol` is in [0, maxExclusive) — the probe
    * gating a packed-ord heap path (one column-pruned min/max over the
    * cheapest table carrying the id domain, negligible next to the
    * scoring scan itself). Empty input is NOT heap-safe: both paths
    * return empty anyway, and routing empties through the window form
    * keeps the probe's contract trivially monotone (adding rows can
    * only flip safe→unsafe, never resurrect a stale safe verdict).
    */
  def idRangeSafe(idSource: DataFrame, idCol: String,
      maxExclusive: Long): Boolean = {
    val r = idSource.agg(min(col(idCol)), max(col(idCol))).head()
    !r.isNullAt(0) && r.getLong(0) >= 0L && r.getLong(1) < maxExclusive
  }

  /** Heap-or-window per-key ranking dispatch — the shared tail of the
    * packed-ord ranking paths ([[graft.ann.Ann]]'s ADC probes,
    * Round15's multi-query BM25). `packedOrd` packs (score, id
    * tie-break) into one double magnitude, collision-free only on a
    * bounded id domain; callers probe that domain with [[idRangeSafe]]
    * and pass the verdict here. Safe ids → [[topKPerKey]] bounded
    * heaps (O(n log k), map-side combine), then the exact
    * `windowOrder` re-ranks the ≤k survivors per key for the stable
    * `rk` column. Unsafe ids → the SAME window ranks the full scored
    * table: degraded (a per-key sort) but correct for arbitrary ids —
    * an out-of-domain id DEGRADES the plan, it never aborts the job.
    */
  def rankTopKOrWindow(scored: DataFrame, keyCols: Seq[String],
      packedOrd: Column, windowOrder: Seq[Column], k: Int,
      heapSafe: Boolean): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(windowOrder: _*)
    val base = if (heapSafe) topKPerKey(scored, keyCols, packedOrd, k)
               else scored
    base.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
