package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity join + downstream reductions (SURVEY.md §2.6 J3–J5, §2.5
  * A8–A9/A11, §4.3).
  *
  * The reference's physical plan for "similarity join" is an RDD
  * `cartesian` (lab2.py:227, 291) — O(n²) pairs, each scored in Python.
  * This engine's default strategy is the '''exact sparse inverted-index
  * join''': vectors stay in long form `(id, word, w)`, an equi-join on
  * `word` generates exactly the pairs with nonzero term overlap, and a
  * grouped `sum(wL*wR)` is the dot product (= cosine, since inputs are
  * L2-normalized). Mathematically identical to the cartesian for
  * argmax/threshold consumers — zero-overlap pairs score 0 and can never
  * win (SURVEY.md J3).
  *
  * Scale: the join shuffles on `word`, the pair aggregation on
  * (l_id, r_id) — both partial-aggregated. The known hazard is term skew
  * (stop-list-surviving words present in most documents make near-
  * quadratic groups); [[pruneHighDf]] caps document frequency, the
  * standard inverted-index mitigation (cf. prefix-filtering literature).
  * A broadcast-cartesian strategy ([[crossJoinDot]]) remains for small
  * sides (Task-2 matrices), and MinHash LSH (graft.dedup) is the
  * approximate path at 100 TB.
  */
object Similarity {

  /** Exact inverted-index similarity join between two long-form vector
    * tables with columns (id, word, w). Returns (l_id, r_id, sim) for all
    * pairs with nonzero overlap.
    */
  def invertedIndexJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("id").as("l_id"), col("word"), col("w").as("l_w"))
    val r = right.select(col("id").as("r_id"), col("word"), col("w").as("r_w"))
    l.join(r, Seq("word"))
      .groupBy(col("l_id"), col("r_id"))
      .agg(sum(col("l_w") * col("r_w")).as("sim"))
  }

  /** DF-based candidate pruning for skewed vocabularies: drop terms that
    * appear in more than `maxDfFraction` of documents before the join
    * (they contribute near-uniform similarity mass at quadratic cost).
    * Exact results require maxDfFraction = 1.0; production similarity
    * search at scale runs 0.05–0.2.
    */
  def pruneHighDf(vectors: DataFrame, nDocs: Long, maxDfFraction: Double): DataFrame = {
    val df = vectors.groupBy(col("word"))
      .agg(countDistinct(col("id")).as("word_df"))
      .filter(col("word_df") <= lit(maxDfFraction * nDocs))
      .select(col("word"))
    vectors.join(broadcast(df), Seq("word"), "left_semi")
  }

  /** Broadcast-cartesian strategy (SURVEY.md §4.3 strategy 2): dot product
    * of two map-typed vector columns. For small sides only (e.g. the
    * category×category matrix); the map arithmetic runs as one codegen'd
    * expression, no shuffle beyond the broadcast.
    */
  def mapDot(a: Column, b: Column): Column =
    aggregate(map_entries(a), lit(0.0),
      (acc, e) => acc + e.getField("value") * coalesce(element_at(b, e.getField("key")), lit(0.0)))

  /** Cross-join similarity over assembled map vectors: (l_id, r_id, sim)
    * for ALL pairs including zero-overlap ones (complete-matrix semantics,
    * SURVEY.md J4).
    */
  def crossJoinDot(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("id").as("l_id"), col("vec").as("l_vec"))
    val r = right.select(col("id").as("r_id"), col("vec").as("r_vec"))
    l.crossJoin(broadcast(r))
      .select(col("l_id"), col("r_id"), mapDot(col("l_vec"), col("r_vec")).as("sim"))
  }

  /** Dense-broadcast argmax strategy — the right physical plan when the
    * vocabulary is SMALL and DENSE (every term in most documents), where
    * the inverted-index join degenerates to near-quadratic shuffle
    * volume (Σ_w n_w² rows with n_w ≈ corpus size). Vectors are pivoted
    * to dense `array<double>` in vocabulary order, the right side is
    * broadcast, and the codegen'd [[graft.functions.DoubleDotProduct]]
    * scores pairs with NO shuffle at all; the per-query argmax is a
    * partial-aggregated `max_by` (no window sort, no pair
    * materialization past the aggregate).
    *
    * Result-identical to invertedIndexJoin + argmax: a dot of
    * strictly-positive weights is 0 iff there is no term overlap, so
    * `sim_raw > 0` reproduces the inverted join's pair set exactly, and
    * ranking uses the same (rounded sim desc, id asc) contract.
    * Requires numeric ids. Exposed via [[argmaxAdaptive]].
    */
  def denseArgmax(left: DataFrame, right: DataFrame,
      excludeSelf: Boolean = false, selfJoinOpt: Option[Boolean] = None,
      maxDenseVocab: Long = 2048, maxDenseBytes: Long = 64L << 20,
      precollectedVocab: Option[Array[String]] = None): DataFrame = {
    val spark = left.sparkSession
    graft.functions.VectorFunctions.register(spark)
    // Self-join shortcut (densify once, rename) is an explicit contract:
    // pass selfJoinOpt = Some(true/false) to control it. The default falls
    // back to object identity — a conservative under-approximation (two
    // structurally identical but distinct frames rebuild the plan twice,
    // correct but 2× work), never a wrong answer.
    val selfJoin = selfJoinOpt.getOrElse(left eq right)
    val wordSrc = if (selfJoin) left.select(col("word"))
      else left.select(col("word")).unionAll(right.select(col("word")))
    // Preconditions ENFORCED here, not only in [[argmaxAdaptive]]: a
    // direct caller must not be able to ship gigabytes to the driver.
    // The vocab collect is limit-bounded (TakeOrderedAndProject — one
    // job, driver memory capped at maxDenseVocab+1 words) and fails
    // loudly when the vocabulary exceeds the bound.
    val limitN = (maxDenseVocab + 1).min(Int.MaxValue.toLong).toInt
    val words = precollectedVocab.getOrElse {
      wordSrc.distinct().orderBy(col("word")).limit(limitN)
        .collect().map(_.getString(0))
    }
    require(words.length <= maxDenseVocab,
      s"denseArgmax: vocabulary exceeds maxDenseVocab=$maxDenseVocab — " +
        "use the inverted-index strategy (argmaxAdaptive) for large vocabularies")
    val dim = words.length
    import spark.implicits._
    val vocab = broadcast(words.zipWithIndex.toSeq.toDF("word", "idx"))
    def toDense(df: DataFrame, idAs: String, vecAs: String): DataFrame = {
      val m = map_from_entries(collect_list(struct(col("idx"), col("w"))))
      // the local scoring loop reads ids as Long (getLong / as[(Long, _)]);
      // cast here so IntegerType/ShortType ids survive the dense path
      df.join(vocab, Seq("word"))
        .groupBy(col("id").cast("long").as(idAs))
        .agg(transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(m, i), lit(0.0))).as(vecAs))
    }
    val l = toDense(left, "l_id", "lv")
    // self-join: rename the SAME dense plan instead of rebuilding the
    // whole vectorization pipeline a second time
    val r = if (selfJoin) l.select(col("l_id").as("r_id"), col("lv").as("rv"))
      else toDense(right, "r_id", "rv")

    // Physical scoring strategy: the BroadcastNestedLoopJoin form
    // materializes every (pair) row (~0.5 KB each — dominates runtime);
    // when the right side is broadcast-sized we instead ship it as a
    // plain array and run a tight primitive loop per left row
    // (mapPartitions — SURVEY §7.3 preference (d), justified: no
    // declarative form scores pairs without materializing them).
    // Ranking contract identical: (sim rounded 6dp desc, r_id asc),
    // zero dots excluded; winner's sim re-rounded with the same
    // HALF_UP BigDecimal rule Spark's round() uses.
    //
    // The collect itself is byte-bounded WITHOUT an extra counting job:
    // collect through limit(maxRows+1) (CollectLimit — per-partition
    // limits, driver memory capped at maxDenseBytes + one row) and fail
    // if the limit truncated. maxRows+1 rows back ⇒ the right side was
    // bigger than the bound; ≤ maxRows rows back ⇒ the limit was a
    // no-op and the array is the COMPLETE set.
    val maxRows = if (dim == 0) Long.MaxValue else maxDenseBytes / (dim.toLong * 8L)
    val limitRows = (math.min(maxRows, Int.MaxValue.toLong - 1L) + 1L).toInt
    val rRows: Array[(Long, Array[Double])] =
      r.limit(limitRows).collect()
        .map(row => (row.getLong(0), row.getSeq[Double](1).toArray))
    require(rRows.length <= maxRows,
      s"denseArgmax: dense right side exceeds maxDenseBytes=$maxDenseBytes " +
        s"(> $maxRows rows × $dim dims × 8 B) — use argmaxAdaptive, which falls " +
        "back to the inverted-index strategy above the byte bound")
    val bc = spark.sparkContext.broadcast(rRows)
    import spark.implicits._
    l.as[(Long, Array[Double])].mapPartitions { it =>
      val rs = bc.value
      it.flatMap { case (lid, lv) =>
        var bestKey = Long.MinValue // rounded micro-units
        var bestId = Long.MaxValue
        var found = false
        var j = 0
        while (j < rs.length) {
          val (rid, rv) = rs(j)
          if (!(excludeSelf && rid == lid)) {
            var s = 0.0
            var i = 0
            val n = math.min(lv.length, rv.length)
            while (i < n) { s += lv(i) * rv(i); i += 1 }
            if (s > 0.0) {
              val key = math.floor(s * 1e6 + 0.5).toLong // HALF_UP for s>0
              if (!found || key > bestKey || (key == bestKey && rid < bestId)) {
                bestKey = key; bestId = rid; found = true
              }
            }
          }
          j += 1
        }
        if (found) Iterator.single((lid, bestId, bestKey / 1e6)) else Iterator.empty
      }
    }.toDF("l_id", "r_id", "sim")
  }

  /** The three physical strategies [[argmaxAdaptive]] dispatches over.
    * Exposed (with [[chooseArgmaxStrategy]]) so the dispatch decision
    * is a unit-testable pure function, not an emergent property of the
    * pipeline.
    */
  sealed trait ArgmaxStrategy
  case object DenseStrategy extends ArgmaxStrategy
  case object InvertedStrategy extends ArgmaxStrategy
  case object LshStrategy extends ArgmaxStrategy

  /** Pure dispatch rule: dense broadcast when the vocabulary and bytes
    * fit; otherwise the exact inverted-index join while its candidate-
    * pair volume (Σ_w n_wL·n_wR — the exact row count of the word
    * equi-join) is inside `maxPairRows`; past the budget, the banded
    * MinHash LSH blocked argmax — UNLESS the caller demanded `exact`,
    * which always stays on an exact strategy (the q13/q50/q46 oracle
    * contract: a gated exact operator must never silently turn
    * approximate; the budget is advisory there and the estimate job is
    * skipped entirely).
    */
  def chooseArgmaxStrategy(denseEligible: Boolean, exact: Boolean,
      pairRows: => Long, maxPairRows: Long): ArgmaxStrategy =
    if (denseEligible) DenseStrategy
    else if (exact || pairRows <= maxPairRows) InvertedStrategy
    else LshStrategy

  /** Exact inverted-join candidate-pair volume: Σ over shared words of
    * n_wL·n_wR — ONE cheap aggregate pass over the long forms (counts
    * only, partial-aggregated; no pair is materialized). This is the
    * n-side blowup the vocabulary gate cannot see: a 10-word
    * vocabulary over 10⁹ documents puts ~10¹⁷ rows through the word
    * join regardless of dim.
    */
  def estimateInvertedPairRows(left: DataFrame, right: DataFrame,
      selfJoin: Boolean): Long = {
    // Summed in DOUBLE, not long: this estimator exists precisely for
    // the regime where the products explode (10 words × 10⁹ docs ⇒
    // ~10¹⁷ pair rows; 10¹¹ docs overflows even the per-word long
    // product), and a budget comparison needs magnitude, not
    // exactness — long arithmetic would throw under ANSI mode or wrap
    // into a WRONG dispatch exactly when the dispatcher matters most.
    // Doubles are exact to 2^53 (far past any sane maxPairRows) and
    // past that merely approximate an answer whose only use is
    // "bigger than the budget?". Saturates to Long.MaxValue (⇒ LSH
    // dispatch) instead of overflowing.
    val cl = left.groupBy(col("word")).agg(count(lit(1)).cast("double").as("nl"))
    val cr =
      if (selfJoin) None
      else Some(right.groupBy(col("word"))
        .agg(count(lit(1)).cast("double").as("nr")))
    pairRowsFromWordCounts(cl, cr)
  }

  /** The saturating fold behind [[estimateInvertedPairRows]], split
    * out so a spec can feed SYNTHETIC per-word counts whose products
    * exceed Long.MaxValue (counts that big cannot be materialized as
    * rows in a test). `cl` is (word, nl: double); `cr` None means
    * self-join (Σ nl²). */
  private[similarity] def pairRowsFromWordCounts(cl: DataFrame,
      cr: Option[DataFrame]): Long = {
    val row = cr match {
      case None    => cl.agg(sum(col("nl") * col("nl"))).head()
      case Some(r) => cl.join(r, Seq("word"))
        .agg(sum(col("nl") * col("nr"))).head()
    }
    if (row.isNullAt(0)) 0L
    else {
      val d = row.getDouble(0)
      if (d >= Long.MaxValue.toDouble) Long.MaxValue else d.toLong
    }
  }

  /** Strategy-picking argmax over long-form vectors — dense-broadcast
    * when the vocabulary is small (≤ maxDenseVocab) and the dense
    * corpus fits `maxDenseBytes`; the exact inverted-index join while
    * its measured candidate-pair volume is inside `maxPairRows`; the
    * banded-MinHash LSH blocked argmax ([[argmaxLshBlocked]]) past the
    * budget. THE ENGINE SWITCHES — the n²-regime fallback the 100 TB
    * argument needs is made here, from a measured pair estimate, not
    * left to the caller.
    *
    * `exact = true` (the default, and the q13/q50/q46 gated contract)
    * is the escape hatch: exact callers never silently degrade to the
    * approximate strategy — an oracle-gated exact operator switching
    * to LSH past a size threshold would change RESULTS, so the
    * approximate regime is an API-level opt-in (`exact = false`), and
    * exact mode skips the estimate job entirely (no wasted pass on the
    * path that cannot act on it). `maxPairRows < 0` (default) reads
    * `graft.similarity.maxPairRows` (fallback 2e9 — ~hundreds of GB of
    * pair traffic, the scale where SCALE.md's measurements say the
    * inverted join stops being answerable).
    *
    * Inputs must carry 6dp-rounded weights for oracle-stable sims (all
    * strategies round sims to 6dp before ranking).
    */
  def argmaxAdaptive(left: DataFrame, right: DataFrame,
      excludeSelf: Boolean = false, maxDenseVocab: Long = 2048,
      maxDenseBytes: Long = 64L << 20, exact: Boolean = true,
      maxPairRows: Long = -1L): DataFrame = {
    // dense path preconditions: INTEGRAL ids (the dense scorer casts to
    // long and tie-breaks numerically — fractional ids would truncate)
    // and a dense corpus small IN BYTES to collect+broadcast: the
    // collect at denseArgmax ships rows × dim × 8B doubles to the driver
    // and every executor, so the guard must bound bytes, not rows —
    // 200k rows × 2048 dims would be 3.3 GB. dim is known after the
    // vocab collect, so no extra job is needed.
    //
    // ONE vocab pass, not two: the gate collects the distinct vocab
    // through limit(maxDenseVocab+1) (TakeOrderedAndProject — bounded
    // driver memory, single job) and branches on the array length;
    // ≤ maxDenseVocab entries back means the limit was a no-op and the
    // SAME array feeds denseArgmax (which previously re-collected the
    // identical distinct set — one of the ~8 fixed-latency driver jobs
    // in the q13/q50 decomposition, see SCALE.md).
    import org.apache.spark.sql.types._
    val integralIds = Seq(left, right).forall(_.schema("id").dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    val vocab: Option[Array[String]] =
      if (!integralIds) None
      else {
        val limitN = (maxDenseVocab + 1).min(Int.MaxValue.toLong).toInt
        val arr = left.select(col("word")).unionAll(right.select(col("word")))
          .distinct().orderBy(col("word")).limit(limitN)
          .collect().map(_.getString(0))
        if (arr.length <= maxDenseVocab) Some(arr) else None
      }
    val denseBytes = vocab match {
      case Some(words) =>
        right.select(col("id")).distinct().count() * words.length.toLong * 8L
      case None => Long.MaxValue
    }
    val selfJoin = left eq right
    val budget =
      if (maxPairRows >= 0) maxPairRows
      else left.sparkSession.conf.getOption("graft.similarity.maxPairRows")
        .map(_.toLong).getOrElse(2_000_000_000L)
    chooseArgmaxStrategy(
        denseEligible = vocab.isDefined && denseBytes <= maxDenseBytes,
        exact = exact,
        pairRows = estimateInvertedPairRows(left, right, selfJoin),
        maxPairRows = budget) match {
      case DenseStrategy =>
        denseArgmax(left, right, excludeSelf, selfJoinOpt = Some(selfJoin),
          maxDenseVocab = maxDenseVocab, maxDenseBytes = maxDenseBytes,
          precollectedVocab = vocab)
      case InvertedStrategy =>
        val sims0 = invertedIndexJoin(left, right)
        val sims = (if (excludeSelf) sims0.filter(col("l_id") =!= col("r_id")) else sims0)
          .withColumn("sim", round(col("sim"), 6))
        argmax(sims)
      case LshStrategy =>
        argmaxLshBlocked(left, right, excludeSelf, selfJoin)
    }
  }

  /** Approximate argmax past the pair budget: banded MinHash LSH over
    * each vector's WORD SET generates candidate pairs (bucket
    * equi-joins on band signatures — never the word join's Σ n_w²
    * blowup), then the exact weighted dot re-scores CANDIDATES ONLY
    * and the argmax ranks with the same (sim round-6 desc, r_id asc)
    * contract. The LSH-then-verify shape of q15/q16, instantiated for
    * weighted cosine argmax: sims of returned pairs are EXACT (the
    * verify recomputes the true dot) — the approximation is only that
    * a best match sharing no band bucket with its query can be missed,
    * with the standard 1−(1−s^r)^b recall curve (q243 measures the
    * dial). Queries whose buckets are all singletons yield no row,
    * like [[graft.ann.Ann.lshTop1Banded]].
    */
  def argmaxLshBlocked(left: DataFrame, right: DataFrame,
      excludeSelf: Boolean = false, selfJoin: Boolean = false,
      minhashK: Int = 12, bands: Int = 6, rowsPerBand: Int = 2): DataFrame = {
    import graft.dedup.Dedup
    // Self-join: one signature table, undirected a<b candidates
    // mirrored into both directions. Two-sided: each side signs its
    // OWN distinct word sets and candidates come from a directed
    // (band, bsig) join of the two band tables — signing a union
    // would merge the word sets of an id that appears on BOTH sides
    // with different words, silently skewing that id's signature (and
    // so its recall; rescoring is exact either way).
    val directed =
      if (selfJoin) {
        val sig = Dedup.minhashSig(
          left.select(col("id"), col("word")).distinct(), minhashK)
        val undirected = Dedup.lshCandidates(sig, bands, rowsPerBand)
        undirected
          .select(col("a").as("l_id"), col("b").as("r_id"))
          .unionAll(undirected.select(col("b").as("l_id"), col("a").as("r_id")))
      } else {
        val bl = Dedup.lshBands(Dedup.minhashSig(
            left.select(col("id"), col("word")).distinct(), minhashK),
            bands, rowsPerBand)
          .select(col("band"), col("bsig"), col("id").as("l_id"))
        val br = Dedup.lshBands(Dedup.minhashSig(
            right.select(col("id"), col("word")).distinct(), minhashK),
            bands, rowsPerBand)
          .select(col("band"), col("bsig"), col("id").as("r_id"))
        bl.join(br, Seq("band", "bsig"))
          .select(col("l_id"), col("r_id")).distinct()
      }
    val cands =
      (if (excludeSelf) directed
       else directed.unionAll(
         left.select(col("id").as("l_id"), col("id").as("r_id")).distinct()))
      .distinct()
    val ea = left.select(col("id").as("l_id"), col("word"), col("w").as("l_w"))
    val eb = right.select(col("id").as("r_id"), col("word"), col("w").as("r_w"))
    val sims = cands
      .join(ea, Seq("l_id"))
      .join(eb, Seq("r_id", "word"))
      .groupBy(col("l_id"), col("r_id"))
      .agg(round(sum(col("l_w") * col("r_w")), 6).as("sim"))
    argmax(sims)
  }

  /** A8 generalized: top-k rows per `keyCol` by (simCol desc, tieCol asc).
    * Deterministic where the reference's reduce-based argmax is shuffle-
    * order-dependent under ties (SURVEY.md §2.10.4).
    */
  def topK(sims: DataFrame, k: Int, keyCol: String = "l_id",
      simCol: String = "sim", tieCol: String = "r_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(simCol).desc, col(tieCol).asc)
    sims.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** A8: argmax — best match per left id. */
  def argmax(sims: DataFrame): DataFrame = topK(sims, 1).drop("rk")

  /** A9: self-retrieval accuracy — fraction of rows where the matched id
    * equals the query id (lab2.py:253–260).
    */
  def accuracy(matches: DataFrame, leftCol: String = "l_id", rightCol: String = "r_id"): DataFrame =
    matches.agg(
      round(avg(when(col(leftCol) === col(rightCol), 1.0).otherwise(0.0)), 6).as("accuracy"),
      count(lit(1)).as("n"))
}
