package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` schema
  * (event_id, ts, user_id, event_type, value, props) — the streaming
  * halves of graft.operators.EventQueries. Every transform takes a
  * DataFrame so it composes identically over `spark.readStream` input
  * (incremental execution, state store, watermark GC) and over batch
  * input (used by the specs to cross-check results).
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond 10 min is dropped and its state evicted);
  * dropDuplicates state is likewise watermark-scoped; sessionization
  * keeps one [[SessionState]] per active user, evicted via processing-
  * time timeout — the standard mapGroupsWithState sizing (state ∝
  * active keys, not history).
  */
object StreamingOps {

  val WatermarkDelay = "10 minutes"
  val WindowLength = "5 minutes"
  val SessionGapMs: Long = 30L * 60 * 1000

  /** Tumbling-window counts/sums per event_type with a watermark —
    * append-mode compatible (windows finalize when the watermark
    * passes).
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", WatermarkDelay)
      .groupBy(window(col("ts"), WindowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming keep-latest-per-key — the incremental twin of the batch
    * compaction query (EventQueries q59): per (user_id, event_type),
    * the row with the greatest (ts, event_id). Expressed as the same
    * partial-aggregatable struct-max, so each micro-batch folds its
    * rows into one state value per key and emits the keys it touched
    * (update mode); the state store holds exactly one struct per key —
    * the materialized-view pattern for a mutable feed. State is
    * per-ACTIVE-key and never per-event; unlike the windowed aggs no
    * watermark bounds it, which is the correct contract for a
    * current-state view (every key's latest must stay queryable).
    */
  def latestPerKey(events: DataFrame): DataFrame =
    events
      .withColumn("ts_ms", unix_millis(col("ts").cast("timestamp")))
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(struct(col("ts_ms"), col("event_id"), col("value"))).as("last"))
      .select(col("user_id"), col("event_type"),
        col("last.ts_ms").as("ts_ms"), col("last.event_id").as("event_id"),
        col("last.value").as("value"))

  /** Running per-source token accounting — q88's incremental twin.
    * The BPE count is a stateless per-row projection; the rollup is an
    * unwatermarked update-mode aggregate whose state is ONE row per
    * source (bounded by source cardinality, like the batch query's
    * post-scan stages — deliberately not watermarked because it is a
    * running corpus total, not a windowed metric). Downstream, the q88
    * weight arithmetic is a per-emission projection over these totals;
    * kept out of this op so the streaming state stays a plain partial
    * aggregate.
    */
  def runningTokenTotals(docs: DataFrame): DataFrame =
    docs
      .withColumn("bpe", graft.textstats.TextStats.bpeCount(col("text")))
      .groupBy(col("source"))
      .agg(sum(col("bpe")).as("tokens"), count(lit(1)).as("n_docs"))

  /** Running per-source OOV monitoring — q127's incremental twin, and
    * the shape of every "model drift" monitor over a live feed: the
    * VOCABULARY is a frozen offline artifact (q127's top-K ranking —
    * passed in as a literal array, exactly how a deployed tokenizer
    * ships), per-document scoring is a stateless row-local projection
    * (tokenize, count tokens outside the literal vocab — no joins, no
    * state), and the rollup is an unwatermarked update-mode aggregate
    * with ONE row of state per source. A rising OOV share on one feed
    * is the live signal that the feed drifted away from the corpus the
    * vocabulary was trained on. The rate division happens at emission
    * from the two exact running sums, so folding order cannot move it.
    */
  def runningOovRate(docs: DataFrame, vocab: Seq[String]): DataFrame = {
    val toks = graft.text.TextPrep.tokensCol(col("text"))
    val vocabArr = array(vocab.map(lit): _*)
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_oov",
        size(filter(toks, t => !array_contains(vocabArr, t))).cast("long"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("tokens"), sum(col("n_oov")).as("oov"),
        count(lit(1)).as("n_docs"))
      .withColumn("oov_rate",
        when(col("tokens") > 0, round(col("oov") / col("tokens"), 6)))
  }

  /** Streaming twin of q97's vocabulary-growth semantics
    * ([[graft.operators.TextStatsQueries.q97VocabGrowth]]): the
    * stateful first-occurrence filter. Each arriving document's
    * bigrams pass `dropDuplicates` exactly once corpus-wide, so the
    * sink sees every vocabulary item a single time and the
    * per-micro-batch output volume IS the novelty curve. State is one
    * entry per distinct bigram — the same O(vocabulary) the batch
    * `min(doc_id)` aggregate holds, and (Heaps' law) sublinear in
    * corpus size. Deliberately unwatermarked: vocabulary state must
    * live for the corpus lifetime — a watermarked variant would
    * re-admit re-appearing bigrams after the horizon.
    *
    * Bigram generation here is the ROW-LOCAL array form
    * ([[graft.dedup.Dedup.shinglesCol]]), not the batch path's
    * posexplode+LEAD pipeline ([[graft.dedup.Dedup.positionalShingles]]):
    * LEAD is a non-time window, which streaming rejects outright
    * ([NON_TIME_WINDOW_NOT_SUPPORTED_IN_STREAMING]). Same tokenization
    * contract (normalize, split, drop empties), same bigram set —
    * spec'd set-equal to the batch pipeline.
    */
  def firstOccurrenceBigrams(docs: DataFrame): DataFrame = {
    val toks = filter(split(graft.text.TextPrep.normalize(col("text")), " "),
      t => t =!= "")
    docs.select(explode(graft.dedup.Dedup.shinglesCol(toks, 2)).as("shingle"))
      .dropDuplicates("shingle")
  }

  case class StratumDoc(lang: String, doc_id: Long, h: Long)
  case class TopKSampleState(entries: List[(Long, Long)])
  case class SampleRow(lang: String, doc_id: Long, rk: Long)

  /** Streaming twin of q104's per-stratum top-k sample
    * ([[graft.operators.TextStatsQueries.q104TopKSample]]): maintain,
    * per language, the k docs with the minimum deterministic hash seen
    * SO FAR, re-emitting a stratum's refreshed sample whenever a batch
    * touches it (update mode). Because membership is a pure function
    * of the doc set — min-k by (md5 prefix, doc_id), no arrival-order
    * dependence — folding any micro-batch split converges to exactly
    * the batch sample: the streaming run IS an incremental
    * maintenance of q104's result. State is O(k) per stratum (a
    * sorted list, k ≤ tens), bounded by stratum cardinality;
    * deliberately untimed-out — the sample must reflect the corpus
    * lifetime. The hash IS the batch query's
    * ([[graft.operators.Sampling.sampleRankHash]] — one shared
    * definition, so bit-for-bit agreement is structural).
    */
  def topKSamplePerStratum(docs: DataFrame, k: Int = 10): Dataset[SampleRow] = {
    require(k >= 1, s"topKSamplePerStratum: k must be >= 1, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("lang"), col("doc_id"))
      .withColumn("h", graft.operators.Sampling.sampleRankHash(col("doc_id")))
      .as[StratumDoc]
      .groupByKey(_.lang)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (lang: String, rows: Iterator[StratumDoc],
         state: GroupState[TopKSampleState]) =>
          // fold the iterator into the ≤k-entry list — transient memory
          // stays O(k) per group even for a hot stratum's huge batch
          // slice (never materialize/sort the whole iterator)
          val ordering = Ordering[(Long, Long)]
          val merged = rows.foldLeft(
            state.getOption.map(_.entries).getOrElse(Nil)) { (acc, r) =>
            val e = (r.h, r.doc_id)
            if (acc.contains(e) ||
                (acc.length == k && ordering.gteq(e, acc.last))) acc
            else ((e :: acc).sorted.take(k))
          }
          state.update(TopKSampleState(merged))
          merged.iterator.zipWithIndex.map { case ((_, id), i) =>
            SampleRow(lang, id, i + 1L)
          }
      }
  }

  /** Streaming twin of q116's per-source MinHash signatures
    * ([[graft.operators.DedupQueries.q116SourceMinhashUnion]]): the
    * running sketch-maintenance shape. Because a MinHash signature is
    * a MERGEABLE sketch (sig(A ∪ B) = elementwise min), the streaming
    * state is just one k-string row per source, folded with the same
    * grouped `min` aggregation the batch query uses — an
    * update-mode aggregate, no custom state function needed. This is
    * the general pattern for maintaining ANY mergeable sketch (HLL,
    * CMS, minhash) over a live feed: the partial-aggregation
    * machinery IS the incremental merge. Deliberately unwatermarked:
    * a corpus signature covers the corpus lifetime.
    */
  def runningSourceMinhash(docs: DataFrame, k: Int = 12): DataFrame =
    // SHARED definitions, not copies (the Sampling.sampleRankHash rule:
    // batch/streaming agreement must be structural): tokenization is
    // TextPrep.tokensCol, the seeded-min construction is minhashSig
    // itself — a duplicate-bearing explode feeds the same mins because
    // duplicates cannot change a min (spec'd against tokenSets)
    graft.dedup.Dedup.minhashSig(
      docs.select(col("source").as("id"),
        explode(graft.text.TextPrep.tokensCol(col("text"))).as("word")), k)
      .withColumnRenamed("id", "source")

  /** Watermark-scoped exact-once dedup on event_id. NB plain
    * `dropDuplicates("event_id")` would keep state per id FOREVER (the
    * watermark only GCs dedup state when the event-time column is part
    * of the key) — `dropDuplicatesWithinWatermark` exists precisely for
    * this, bounding state to the watermark horizon.
    */
  def dedup(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", WatermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  // ------------------------------------------------------ sessionization
  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(userId: Long, startMs: Long, lastMs: Long,
      nEvents: Long, sumValue: Double)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, sum_value: Double)

  /** Stateful gap-based sessionization with flatMapGroupsWithState:
    * one state entry per user; a session closes (and is emitted) when
    * an event arrives ≥ 30 min after the previous one, or on state
    * timeout. Event-order within a micro-batch is enforced by sorting
    * the group iterator (Spark doesn't guarantee group order).
    */
  def sessionize(events: Dataset[Event],
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout): Dataset[Session] = {
    import events.sparkSession.implicits._
    require(timeout != GroupStateTimeout.EventTimeTimeout,
      "sessionize supports ProcessingTimeTimeout or NoTimeout; " +
        "EventTimeTimeout would make setTimeoutDuration throw per batch")
    val useTimeout = timeout != GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(s.userId, s.startMs, s.lastMs, s.nEvents, s.sumValue))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val ms = e.ts.getTime
              cur match {
                case Some(s) if ms - s.lastMs > SessionGapMs =>
                  closed += Session(s.userId, s.startMs, s.lastMs, s.nEvents, s.sumValue)
                  cur = Some(SessionState(userId, ms, ms, 1L, e.value))
                case Some(s) =>
                  cur = Some(s.copy(lastMs = ms, nEvents = s.nEvents + 1,
                    sumValue = s.sumValue + e.value))
                case None =>
                  cur = Some(SessionState(userId, ms, ms, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(SessionGapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming similarity search: score each arriving embedding against
    * a broadcast query-vector set with the codegen'd dot product and
    * emit matches above `minCos`. Stateless map — scales with input
    * rate, state-free, and composes with watermarked dedup upstream.
    * (The SURVEY §7.1.8 "streaming similarity" north star: the batch
    * ANN operators applied to an unbounded source.)
    */
  def streamingSimilarity(vectors: DataFrame, queries: DataFrame,
      minCos: Double): DataFrame = {
    graft.functions.VectorFunctions.register(vectors.sparkSession)
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qv")))
    vectors.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      .crossJoin(q)
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(graft.functions.VectorFunctions.dot(col("qv"), col("nv")), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** One micro-batch (or batch-twin) step of the windowed streaming
    * top-1 similarity north star (BASELINE.json / SURVEY §7.1.8): each
    * arriving document is TF-IDF-vectorized against the PERSISTED
    * corpus statistics (the J2 external-df form — df and n come from
    * the index build, so a batch's weights don't drift with batch
    * boundaries), scored top-1 against the corpus vectors through
    * [[graft.similarity.Similarity.argmaxAdaptive]] (dense-broadcast
    * codegen dot when the vocabulary allows, inverted-index otherwise),
    * and stamped with its event-time tumbling window. Shared verbatim
    * by the foreachBatch closure and the batch twin, so stream ≡ batch
    * holds by construction (StreamingOpsSpec pins it on real data).
    */
  def scoreWindowedTop1(batch: DataFrame, corpusVectors: DataFrame,
      corpusDf: DataFrame, corpusN: Long, windowDuration: String,
      excludeSelf: Boolean): DataFrame = {
    import graft.tfidf.TfIdf
    val toks = TfIdf.tokens(batch, "doc_id", "text")
    val vecs = TfIdf.l2Normalize(
        TfIdf.weights(TfIdf.termFreq(toks), corpusDf, corpusN, external = true))
      .withColumn("w", round(col("w"), 6))
    val best = graft.similarity.Similarity.argmaxAdaptive(
      vecs, corpusVectors, excludeSelf = excludeSelf)
    val wins = batch.select(col("doc_id").as("l_id"),
      window(col("ts"), windowDuration).getField("start").as("window_start"))
    best.join(wins, Seq("l_id"))
      .select(col("window_start"), col("l_id").as("doc_id"),
        col("r_id").as("match_id"), col("sim"))
  }

  /** Windowed streaming top-1 similarity over an unbounded document
    * stream — [[scoreWindowedTop1]] inside `foreachBatch`. STATELESS
    * streaming: the corpus index (df table, corpus size, vectors) is a
    * persisted batch artifact, the window is a row-local event-time
    * stamp, and each micro-batch's work is batch-size × index lookups
    * — no watermark state, no cross-batch state, so state is O(1) in
    * stream history (the same bound as [[streamingSimilarity]]; the
    * argmax itself is the q13 dense path, vocabulary-byte-bounded).
    * `emit` receives each scored micro-batch (the spec appends to a
    * buffer; production would `Sinks.writePartitioned` by window).
    */
  def windowedTop1Similarity(docs: DataFrame, corpusVectors: DataFrame,
      corpusDf: DataFrame, corpusN: Long, windowDuration: String = "1 day",
      excludeSelf: Boolean = true)(emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        emit(scoreWindowedTop1(batch, corpusVectors, corpusDf, corpusN,
          windowDuration, excludeSelf))
      }
      .start()

  /** Stream-stream interval join (the attribution shape of
    * EventQueries.q33 over two UNBOUNDED inputs): each click joins the
    * impressions of the same user that happened in the
    * `[click - window, click]` interval. Both sides carry watermarks,
    * so Spark bounds the join state: an impression can be dropped once
    * the click-side watermark passes `impression_ts + window`, a click
    * once its own watermark passes — the state-GC contract that makes
    * stream-stream joins viable at scale (state ∝ in-flight interval,
    * not history).
    */
  def attributionJoin(impressions: DataFrame, clicks: DataFrame,
      window: String = "10 minutes"): DataFrame = {
    val imp = impressions
      .withColumn("imp_ts", col("ts").cast("timestamp"))
      .withWatermark("imp_ts", WatermarkDelay)
      .select(col("user_id"), col("event_id").as("imp_id"), col("imp_ts"))
    val clk = clicks
      .withColumn("click_ts", col("ts").cast("timestamp"))
      .withWatermark("click_ts", WatermarkDelay)
      .select(col("user_id"), col("event_id").as("click_id"), col("click_ts"))
    clk.join(imp,
      clk("user_id") === imp("user_id") &&
        imp("imp_ts") <= clk("click_ts") &&
        imp("imp_ts") >= clk("click_ts") - expr(s"INTERVAL $window"))
      .select(clk("user_id"), col("click_id"), col("imp_id"),
        col("click_ts"), col("imp_ts"))
  }

  /** Streaming → partitioned lake via `foreachBatch` +
    * [[graft.io.Sinks.writePartitioned]] (one writer implementation —
    * salt repartition against hot partition values, maxRecordsPerFile —
    * shared with batch). IDEMPOTENT under micro-batch replay: rows are
    * sub-partitioned by the checkpointed `__batch_id` and written with
    * DYNAMIC partition overwrite, so a batch that re-runs after a
    * mid-write failure replaces exactly its own partitions instead of
    * appending duplicates — this is what makes the checkpoint's
    * at-least-once replay effectively exactly-once in the lake.
    * Readers see an extra `__batch_id` column (prunable; drop it or
    * treat it as lineage metadata).
    */
  def streamToPartitionedLake(stream: DataFrame, path: String,
      checkpointDir: String, partitionCols: Seq[String],
      filesPerPartition: Int = 1,
      maxRecordsPerFile: Long = 1000000L): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.io.Sinks.writePartitioned(
          batch.withColumn("__batch_id", lit(batchId)),
          path, partitionCols :+ "__batch_id",
          maxRecordsPerFile, filesPerPartition, dynamicOverwrite = true)
      }
      .start()

  /** Convenience: run a streaming query over `transformed` into an
    * in-memory table and block until all available input is processed
    * (test/dev harness; production would use a real sink + trigger).
    */
  /** Streaming twin of q78's EXACT stage: verdict each arriving
    * document against the PERSISTED corpus hash table (the
    * `prepareIncrementalCorpus` artifact) via a stream–static left
    * outer join. The static side is re-planned every micro-batch, so a
    * corpus refresh lands without restarting the query; the stream
    * side needs no state at all (one hash lookup per row, append-mode
    * compatible, no watermark). The LSH near-dup probe stage is
    * deliberately NOT expressed as a continuous transform — it needs
    * the per-document minhash aggregation, which is a stateful
    * aggregate the exact path shouldn't pay; production runs that
    * stage in `foreachBatch` over the same artifacts, batch-identical
    * by construction.
    *
    * @param docs         streaming (doc_id, text); must not carry the
    *                     reserved internal columns `h`/`exact_match`
    *                     (fail loudly, not silently overwrite)
    * @param corpusHashes static (h = md5(text), c_id), UNIQUE per h
    *                     with the smallest owning doc as c_id — the
    *                     form `prepareIncrementalCorpus` writes. The
    *                     reduction lives in the artifact, NOT here: an
    *                     in-join groupBy would re-aggregate the whole
    *                     corpus hash table every micro-batch
    * @param validateUnique when true (default) run ONE batch job at
    *                     stream-construction time proving the
    *                     uniqueness precondition — a duplicate h would
    *                     silently fan out one verdict row per
    *                     duplicate and pick an arbitrary match_id.
    *                     Pass false only for artifacts already
    *                     validated (costs one aggregate over the
    *                     corpus hash table, never per micro-batch)
    */
  def incrementalDedupVerdicts(docs: DataFrame, corpusHashes: DataFrame,
      validateUnique: Boolean = true): DataFrame = {
    Seq("h", "exact_match").foreach { r =>
      require(!docs.columns.exists(_.equalsIgnoreCase(r)),
        s"docs must not carry reserved column '$r'")
    }
    if (validateUnique) {
      val dup = corpusHashes.groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"corpusHashes must be unique per h (the prepareIncrementalCorpus " +
          s"artifact form); found duplicate h=${dup.head.getString(0)} — " +
          "reduce with groupBy(h).agg(min(c_id)) or pass validateUnique=false " +
          "only for pre-validated artifacts")
    }
    docs.withColumn("h", md5(col("text")))
      .join(corpusHashes.withColumnRenamed("c_id", "exact_match"),
        Seq("h"), "left_outer")
      .select(col("doc_id"),
        when(col("exact_match").isNotNull, lit("exact_dup"))
          .otherwise(lit("new")).as("verdict"),
        coalesce(col("exact_match"), lit(-1L)).as("match_id"))
  }

  /** Running exact per-type value moments through Spark 4's
    * `transformWithState` (the arbitrary-state API that replaces
    * mapGroupsWithState going forward: typed state variables on a
    * `StatefulProcessorHandle`, timers, TTL — here one
    * `ValueState[(n, Σq, Σq²)]`). The state row is the q130 mergeable
    * moment triple over micro-quantized longs, so the streaming
    * accumulation is bit-identical to the batch aggregate at every
    * prefix — the IVM law, live. Update mode emits the running triple
    * per touched key per micro-batch; state is one 24-byte tuple per
    * key (state ∝ distinct types, not history). Requires the RocksDB
    * state-store provider (transformWithState's backing store —
    * `rocksdbjni` ships with Spark); the spec sets
    * `spark.sql.streaming.stateStore.providerClass` accordingly.
    * Overflow: |q| ≤ ~5·10⁸ for |value| ≤ 500 ⇒ q² ≤ 2.5·10¹⁷; the
    * processor `require`s Σq² headroom each update rather than wrap.
    */
  case class ValueEvent(event_type: String, value: Double)
  case class MomentsRow(event_type: String, n: Long, sum_q: Long, sumsq_q: Long)

  class MomentsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, ValueEvent, MomentsRow] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("moments",
        org.apache.spark.sql.Encoders.product[(Long, Long, Long)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ValueEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[MomentsRow] = {
      var (n, s, ss) =
        if (st.exists()) st.get() else (0L, 0L, 0L)
      rows.foreach { r =>
        val q = java.math.BigDecimal.valueOf(1e6 * r.value)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        // bound |q| BEFORE squaring: q*q itself wraps past sqrt(2^63),
        // which would defeat the headroom check below for out-of-
        // contract inputs (|value| > ~3e3 in micro-units)
        require(math.abs(q) <= 3037000499L,
          s"value magnitude overflows the micro-unit square for key $key")
        require(ss <= Long.MaxValue - q * q,
          s"sum of squares would overflow for key $key")
        n += 1; s += q; ss += q * q
      }
      st.update((n, s, ss))
      Iterator.single(MomentsRow(key, n, s, ss))
    }
  }

  def runningValueMoments(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type"), col("value")).as[ValueEvent]
      .groupByKey(_.event_type)
      .transformWithState(new MomentsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
      .toDF()
  }

  case class KeyedItem(group: String, item: Long)
  case class HhCandidate(group: String, item: Long, est: Long, n_seen: Long)

  /** Running Misra–Gries frequent-items monitor through
    * `transformWithState` — the streaming twin of q213's bounded-
    * summary candidate pass: ONE ≤ k-counter MG summary per group key
    * lives in the state store, absorbs each micro-batch's items via
    * [[graft.functions.MisraGries.update]], and re-emits the candidate
    * set per touched key per batch (Update mode). State is k counters
    * per group — O(1) in stream history, the same bound the batch pass
    * gets per partition. The MG ESTIMATES are arrival-order-dependent
    * (any MG is), so the spec gates the LAWS, not value equality: the
    * summary stays ≤ k, never overcounts, undercounts by at most
    * n_seen/k, and every item with true prefix-count > n_seen/k is
    * present — exactly the candidate-completeness contract the q213
    * exact-verify pass needs from a monitor feeding it.
    */
  class HeavyHittersProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, KeyedItem, HhCandidate] {
    // state as parallel arrays — the state store's Avro encoder does
    // not support MapType values
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[(Long, Array[Long], Array[Long])] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Array[Long], Array[Long])]("mg",
        org.apache.spark.sql.Encoders.product[(Long, Array[Long], Array[Long])],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedItem],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[HhCandidate] = {
      val (n0, items0, counts0) =
        if (st.exists()) st.get()
        else (0L, Array.empty[Long], Array.empty[Long])
      val m = scala.collection.mutable.HashMap.from(items0.zip(counts0))
      var n = n0
      rows.foreach { r =>
        graft.functions.MisraGries.update(m, r.item, k)
        n += 1
      }
      val arr = m.toArray
      st.update((n, arr.map(_._1), arr.map(_._2)))
      arr.iterator.map { case (item, est) => HhCandidate(key, item, est, n) }
    }
  }

  /** Per-group running heavy-hitter candidates over a keyed item
    * stream (groups = event_type, items = user_id by default shape).
    */
  def runningHeavyHitters(events: DataFrame, k: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type").as("group"), col("user_id").as("item"))
      .as[KeyedItem]
      .groupByKey(_.group)
      .transformWithState(new HeavyHittersProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
      .toDF()
  }

  /** Streaming perceptual near-dup verdicts — q231's incremental twin
    * in the [[incrementalDedupVerdicts]] stream-static shape: each
    * arriving image is hashed ROW-LOCALLY (`dhash64` — stateless,
    * decode never leaves the partition), banded into 8 exact 8-bit
    * keys, and joined against the PERSISTED band index of the accepted
    * corpus (`(band, key, c_name, c_h)` — the q78 build/probe split:
    * state lives in the index artifact, not in streaming state). The
    * per-image verdict folds candidates with `min(struct(hamming,
    * c_name))` — deterministic best match — in an update-mode
    * aggregate keyed by the image (state: one row per in-flight
    * image). Pigeonhole recall at τ≤7 is inherited from the banding,
    * so a "new" verdict is EXACT, not probabilistic.
    */
  def imageDedupVerdicts(images: DataFrame, corpusBands: DataFrame,
      tau: Int = 7): DataFrame = {
    val hashed = images.select(col("name"),
      graft.functions.DHash64Fn(col("content")).as("h"))
    val banded = hashed.select(col("name"), col("h"),
      explode(expr(
        "transform(sequence(0, 7), i -> named_struct('band', i, 'key', shiftright(h, i * 8) & 255L))"))
        .as("b"))
      .select(col("name"), col("h"),
        col("b.band").as("band"), col("b.key").as("key"))
    banded
      .join(broadcast(corpusBands), Seq("band", "key"), "left_outer")
      .withColumn("hamming",
        expr("CAST(bit_count(h ^ c_h) AS BIGINT)")) // null-safe: null c_h → null
      .groupBy(col("name"))
      .agg(min(when(col("hamming") <= tau,
        struct(col("hamming"), col("c_name")))).as("best"))
      .select(col("name"),
        when(col("best").isNotNull, lit("near_dup")).otherwise(lit("new"))
          .as("verdict"),
        col("best.c_name").as("match_name"),
        col("best.hamming").as("hamming"))
  }

  /** Build the band index artifact [[imageDedupVerdicts]] probes: 8
    * (band, key) rows per accepted image. At lake scale this is the
    * scheduled-indexing output, partitioned by band. */
  def imageBandIndex(images: DataFrame): DataFrame =
    images.select(col("name").as("c_name"),
        graft.functions.DHash64Fn(col("content")).as("c_h"))
      .select(col("c_name"), col("c_h"),
        explode(expr(
          "transform(sequence(0, 7), i -> named_struct('band', i, 'key', shiftright(c_h, i * 8) & 255L))"))
          .as("b"))
      .select(col("b.band").as("band"), col("b.key").as("key"),
        col("c_name"), col("c_h"))

  /** Streaming exact set-similarity probe — q211's streaming twin and
    * the live form of ingest-time near-dup screening: documents stream
    * in; each micro-batch's shingle sets are probed against the
    * PERSISTED old-corpus shingle artifact through the batch
    * [[graft.operators.Round12Queries.setSimProbe]] core — stream ≡
    * batch by SHARED CODE (the bm25Rank/MG discipline), so emitted
    * pairs across any micro-batch split union to exactly the batch
    * [[graft.operators.Round12Queries.setSimJoin]] over old ∪ new
    * restricted to (new × old) pairs. State lives in the artifact, not
    * the stream (the q78/imageDedup pattern): the old side's rarity
    * table and prefixes are index outputs, the stream holds nothing
    * between batches. Docs need (doc_id, text).
    */
  def streamingSetSimProbe(docs: DataFrame, oldSh: DataFrame,
      shingleN: Int, tauNum: Int, tauDen: Int)(emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val newSh = graft.dedup.Dedup.shingleSets(batch, "doc_id", "text", shingleN)
        emit(graft.operators.Round12Queries.setSimProbe(
          newSh, oldSh, tauNum, tauDen))
      }
      .start()

  /** Streaming semantic dedup — q102's streaming twin and the live
    * form of embedding-level ingest screening: vectors stream in; each
    * micro-batch is probed against the PERSISTED cluster index (the
    * SemDeDup corpus assignment + centroids — scheduled-indexing
    * artifacts, the q78/imageDedup pattern) through the batch
    * [[graft.ann.Ann.semanticDedupProbe]] core, so stream ≡ batch by
    * SHARED CODE: verdicts for any micro-batch split union to exactly
    * the batch probe over all new vectors. Candidate volume per batch
    * is cluster-local (nearest-centroid blocking), never
    * batch × corpus. Vectors need (vec_id, embedding).
    */
  def streamingSemanticDedup(vectors: DataFrame, assigned: DataFrame,
      centroids: DataFrame, minCos: Double)(emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        emit(graft.ann.Ann.semanticDedupProbe(batch, assigned, centroids, minCos))
      }
      .start()

  /** Streaming IVF-PQ index maintenance — [[graft.ann.Ann.ivfPqAppend]]
    * as a live ingest sink: vectors stream in; each micro-batch is
    * encoded against the index's PERSISTED quantizers (centroids +
    * codebooks — never re-fit) and appended to the cluster-partitioned
    * inverted lists. Stream ≡ batch by SHARED CODE (the
    * semanticDedup/setsim twin discipline): since every batch encodes
    * against the same frozen quantizers and appends are row-disjoint
    * file adds, ANY micro-batch split of the new vectors yields the
    * identical assignments table as one batch [[graft.ann.Ann.ivfPqAppend]]
    * — the AnnSpec law. State lives in the index artifact, not the
    * stream. Vectors need (vec_id, embedding).
    */
  def streamingIvfPqAppend(vectors: DataFrame, indexDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) graft.ann.Ann.ivfPqAppend(batch, indexDir)
      }
      .start()

  /** Running ROC-AUC monitor — q229's streaming twin, and the live
    * form of "is our quality score still separating the classes":
    * per-micro-batch (score, pos, neg) partial counts fold into a
    * running group table whose size the 1e6 micro-unit quantization
    * BOUNDS (the same cardinality argument that allowlists q229's
    * batch window — streaming state here is the score histogram, never
    * the corpus), and each emission recomputes AUC through the
    * IDENTICAL [[graft.operators.Round14Queries.rocAucFromGroups]]
    * tail the batch gate uses — stream ≡ batch by shared code, the
    * bm25Rank discipline. Docs need (lang, text) columns.
    */
  def runningRocAuc(docs: DataFrame)(emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    var groups: Option[DataFrame] = None
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = graft.operators.Round14Queries.ttrScoreGroups(batch)
        val merged = groups.map(_.unionByName(b)
            .groupBy(col("score"))
            .agg(sum(col("pos")).as("pos"), sum(col("neg")).as("neg")))
          .getOrElse(b)
          .localCheckpoint()
        groups = Some(merged)
        emit(graft.operators.Round14Queries.rocAucFromGroups(merged))
      }
      .start()
  }

  /** Incremental BM25 index maintenance + serving — q226's streaming
    * twin and the shape of a live retrieval index: as documents stream
    * in, maintain (a) the postings restricted to the query terms
    * (`matchTf`: one row per (matched doc, term) — QUERY-bounded, not
    * vocabulary-bounded), (b) doc lengths for matched docs, and (c)
    * the two corpus scalars (n_docs, Σdl) as exact driver-held longs.
    * Each micro-batch contributes map-side partial counts, the running
    * artifacts grow by union + localCheckpoint (at lake scale they are
    * appended parquet/Delta postings — the q78 build/probe split), and
    * serving re-ranks through the IDENTICAL
    * [[graft.operators.Round14Queries.bm25Rank]] pipeline the batch
    * query uses — stream ≡ batch by shared code, not by twin
    * maintenance. df/avgdl drift as the corpus grows, so each emission
    * re-scores the matched set under the CURRENT statistics (scores
    * are corpus-relative by definition; a frozen-idf variant is one
    * `dfTab` substitution away).
    *
    * Assumes append semantics (each doc_id arrives once) — upstream
    * exactly-once dedup is [[dedup]]'s job.
    */
  def runningBm25(docs: DataFrame, terms: Seq[String], k: Int)
      (emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    var matchTf: Option[DataFrame] = None
    var matchDl: Option[DataFrame] = None
    var nDocs = 0L
    var sumDl = 0L
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val toks = batch.select(col("doc_id"),
            graft.text.TextPrep.tokensCol(col("text")).as("toks"))
          .localCheckpoint()
        val bDl = toks.select(col("doc_id"),
          size(col("toks")).cast("long").as("dl"))
        val agg = bDl.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
        nDocs += agg.getLong(0)
        sumDl += agg.getLong(1)
        val bTf = toks
          .select(col("doc_id"), explode(col("toks")).as("term"))
          .filter(col("term").isin(terms: _*))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val bMatchDl = bDl.join(
          bTf.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
        matchTf = Some(matchTf.map(_.unionByName(bTf)).getOrElse(bTf)
          .localCheckpoint())
        matchDl = Some(matchDl.map(_.unionByName(bMatchDl)).getOrElse(bMatchDl)
          .localCheckpoint())
        if (nDocs > 0) {
          val dfTab = matchTf.get.groupBy(col("term"))
            .agg(count(lit(1)).as("df"))
          val stats = s.range(1).select(lit(nDocs).as("n_docs"),
            (lit(sumDl) / lit(nDocs)).as("avgdl"))
          emit(graft.operators.Round14Queries.bm25Rank(
            matchTf.get, matchDl.get, dfTab, stats, k))
        }
      }
      .start()
  }

  /** Streaming MULTI-QUERY retrieval monitor — q244's streaming twin
    * (round-7 verdict item #6) and the live form of "what does the
    * whole query fleet see right now": documents stream in; per batch
    * the incremental index state grows (matched tf rows + matched dl
    * rows unioned, exact n_docs/Σdl counters — the [[runningBm25]]
    * state discipline, which bounds streaming state by MATCHED docs ×
    * query terms, never the corpus), and each emission re-scores under
    * the CURRENT statistics through the IDENTICAL keyed core
    * ([[graft.operators.Round14Queries.bm25ScoreKeyed]]) and per-query
    * heap ranking ([[graft.operators.Round15Queries.rankMultiBm25]])
    * the batch q244 gate runs — stream ≡ batch by shared code: after
    * the last batch the emission equals the batch q244 over the union
    * corpus exactly (the StreamingOpsSpec law). `qterms` is the static
    * (query_id, term) query table — broadcast-sized by the q244
    * contract. Assumes append semantics (each doc_id arrives once).
    */
  def runningMultiBm25(docs: DataFrame, qterms: DataFrame)
      (emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val qtermsC = qterms.localCheckpoint()
    val qTermSet = qtermsC.select(col("term")).distinct().localCheckpoint()
    var matchTf: Option[DataFrame] = None
    var matchDl: Option[DataFrame] = None
    var nDocs = 0L
    var sumDl = 0L
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val toks = batch.select(col("doc_id"),
            graft.text.TextPrep.tokensCol(col("text")).as("toks"))
          .localCheckpoint()
        val bDl = toks.select(col("doc_id"),
          size(col("toks")).cast("long").as("dl"))
        val agg = bDl.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
        nDocs += agg.getLong(0)
        sumDl += agg.getLong(1)
        val bTf = toks
          .select(col("doc_id"), explode(col("toks")).as("term"))
          .join(broadcast(qTermSet), Seq("term"), "left_semi")
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val bMatchDl = bDl.join(
          bTf.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
        matchTf = Some(matchTf.map(_.unionByName(bTf)).getOrElse(bTf)
          .localCheckpoint())
        matchDl = Some(matchDl.map(_.unionByName(bMatchDl)).getOrElse(bMatchDl)
          .localCheckpoint())
        if (nDocs > 0) {
          val dfTab = matchTf.get.groupBy(col("term"))
            .agg(count(lit(1)).as("df"))
          val stats = s.range(1).select(lit(nDocs).as("n_docs"),
            (lit(sumDl) / lit(nDocs)).as("avgdl"))
          val tfq = matchTf.get.join(broadcast(qtermsC), Seq("term"))
          emit(graft.operators.Round15Queries.rankMultiBm25(
            graft.operators.Round14Queries.bm25ScoreKeyed(
              tfq, matchDl.get, dfTab, stats),
            matchDl.get.select(col("doc_id"))))
        }
      }
      .start()
  }

  /** Running DSIR selection monitor — q255's streaming twin and the
    * live form of "how target-like is the stream": per micro-batch the
    * per-(doc, bucket) hashed-feature PROFILE accumulates (≤ B rows
    * per doc — the compressed representation, orders of magnitude
    * under the text), and each emission re-scores every doc seen so
    * far through the IDENTICAL
    * [[graft.operators.Round16Queries.dsirWeightsFromProfile]] tail
    * the batch gate uses — stream ≡ batch by shared code. Weights are
    * corpus-relative by definition (the raw/target bucket models
    * drift as the stream grows), so re-scoring under CURRENT stats is
    * the correct semantics, exactly like [[runningBm25]]'s df drift.
    * Docs need (doc_id, lang, text); append semantics assumed.
    */
  def runningDsir(docs: DataFrame)(emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    var profile: Option[DataFrame] = None
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = graft.operators.Round16Queries.dsirProfile(batch)
        profile = Some(profile.map(_.unionByName(b)).getOrElse(b)
          .localCheckpoint())
        emit(graft.operators.Round16Queries.dsirWeightsFromProfile(profile.get))
      }
      .start()
  }

  /** Streaming label-noise screening — q260's ingest twin: labeled
    * vectors stream in; each micro-batch is kNN-vote-checked against
    * the PERSISTED accepted corpus through the batch
    * [[graft.ann.Ann.labelNoiseProbe]] core (the batch side
    * broadcasts — it is the small side by construction; the verdict
    * rides the shared knnLabelVotes tail, so stream ≡ batch by shared
    * code, stateless per batch). Emitted rows are the disagreements a
    * reviewer sees before the batch enters training. Vectors need
    * (vec_id, embedding, label).
    */
  def streamingLabelNoise(vectors: DataFrame, corpus: DataFrame, k: Int)
      (emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        emit(graft.ann.Ann.labelNoiseProbe(batch, corpus, k))
      }
      .start()

  /** Streaming passage-dedup screening — q257's ingest twin: new
    * documents stream in; each micro-batch's passages are probed
    * against the PERSISTED corpus passage-hash artifact through the
    * batch [[graft.operators.Round16Queries.passageDedupProbe]] core
    * (stateless per batch — stream ≡ batch restriction by shared
    * code, the setsim/imageDedup pattern). State lives in the
    * artifact, not the stream. Docs need (doc_id, text).
    */
  def streamingPassageDedup(docs: DataFrame, corpusOcc: DataFrame)
      (emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        emit(graft.operators.Round16Queries.passageDedupProbe(batch, corpusOcc))
      }
      .start()

  /** Streaming unigram ENCODE — q269's ingest twin and the live form
    * of tokenize-on-arrival: documents stream in; each micro-batch is
    * encoded against the FROZEN word→piece-id artifact
    * ([[graft.operators.UnigramQueries.modelWordIds]] — the trained
    * model's deployable form, the q78/imageDedup
    * state-lives-in-the-artifact pattern) through the batch
    * [[graft.operators.UnigramQueries.encodeAgainst]] core. Per-doc
    * output is row-local given the artifact, so stream ≡ batch by
    * shared code AND by shape: any doc-partitioned micro-batch split
    * unions to exactly the one-batch encode. Words the model never
    * saw are counted per doc in `n_oov` (the honest streaming case the
    * batch gate cannot produce), never silently dropped. Docs need
    * (doc_id, text).
    */
  def streamingUnigramEncode(docs: DataFrame, wordIds: DataFrame)
      (emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        emit(graft.operators.UnigramQueries.encodeAgainst(batch, wordIds))
      }
      .start()

  /** Streaming SEGMENTATION against the persisted vocabulary-score
    * artifact — q277's ingest twin, and the stronger deploy shape the
    * persisted CHOSEN vocabulary buys over [[streamingUnigramEncode]]'s
    * word→id table: each micro-batch's documents are Viterbi-segmented
    * through the batch
    * [[graft.operators.UnigramQueries.segmentDocsAgainst]] core under
    * the FROZEN `choices/unigram-vocab/vocab` scores, so a word the
    * trainer NEVER SAW still tokenizes (single-char coverage — the
    * SentencePiece fallback contract), and streaming OOV collapses to
    * the alphabet level (`n_unseg` counts only words with an untrained
    * CHARACTER). Per-doc output is row-local given the artifact —
    * stream ≡ batch by shared code and by shape. Docs need
    * (doc_id, text).
    */
  def streamingVocabSegment(docs: DataFrame, scores: DataFrame)
      (emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        emit(graft.operators.UnigramQueries.segmentDocsAgainst(batch, scores))
      }
      .start()

  /** Streaming RANKED RETRIEVAL from the PERSISTED BM25 dial — the
    * q273 artifact's stream-static twin (round-11 verdict #4), closing
    * the persisted-choice streaming story the way
    * [[streamingVocabSegment]] closed the tokenizer's: the dial is
    * read ONCE at stream start from `choices/bm25-params` (frozen for
    * the stream's lifetime, the frozen-scores discipline), and each
    * micro-batch of queries (query_id, term) is served through the
    * SAME batch core q273 serves with
    * ([[graft.operators.Round15Queries.bm25ServeQueriesAtDial]]) — so
    * stream ≡ batch by shared code, and the dial the stream ranks at
    * is exactly the engine-chosen one. A MISSING artifact is a
    * deployment error, not a tuning trigger: a stream must never pay
    * a cold 12-point sweep mid-flight — run
    * [[graft.operators.Round15Queries.prepareBm25ParamsChoice]]
    * (offline corpus maintenance) first.
    *
    * Per-batch cost: the serve reads ONLY the persisted postings
    * index (q281's artifact — buckets partition-pruned to the batch's
    * terms, plus the vocabulary/doc-length side tables), never the
    * corpus text: the measured 3.1×-at-30×-and-flattening marginal-
    * serve bill (SCALE.md round-16 second batch), which is exactly
    * the micro-batch shape. Both artifacts — the (k1, b) dial and the
    * postings index — are read once at stream start and FROZEN for
    * the stream's lifetime (the frozen-vocab-scores discipline);
    * staleness policy belongs to the offline maintenance job (q278
    * audits it, prepare* refreshes it), never to the serving stream.
    *
    * Batch contract: a query's terms must arrive within ONE
    * micro-batch (per-query rows are independent across batches, so
    * any whole-query split unions to the one-batch result —
    * StreamingOpsSpec's uneven-batch law; a query split across
    * batches would rank its fragments separately).
    */
  def streamingBm25Rank(s: SparkSession, dir: String, queries: DataFrame)
      (emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val c = graft.operators.Round15Queries.bm25ChoiceRead(s,
      graft.operators.Round15Queries.bm25ChoicePath(dir)).getOrElse(
      sys.error("streamingBm25Rank: no persisted (k1, b) artifact for " +
        s"$dir — run prepareBm25ParamsChoice first (a stream never " +
        "pays a cold sweep mid-flight)"))
    val idx = graft.operators.Round15Queries.bm25IndexPath(dir)
    if (graft.operators.Round15Queries.bm25IndexRead(s, idx).isEmpty)
      sys.error("streamingBm25Rank: no persisted postings index for " +
        s"$dir — run prepareBm25Index first (a stream never pays a " +
        "corpus tokenize, cold or per-batch)")
    queries.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        emit(graft.operators.Round15Queries.bm25ServeQueriesFromIndex(
          s, idx, batch, c.k1Micro, c.bMicro))
      }
      .start()
  }

  /** [[streamingBm25Rank]] under a tombstone mask — the q283 delete
    * verb on the serving stream: the dial, the postings index, AND the
    * delete set are all read once at stream start and FROZEN for the
    * stream's lifetime (the frozen-artifact discipline — deletes that
    * arrive mid-flight belong to the next stream epoch, exactly as a
    * corpus move does); every micro-batch of queries is served through
    * the SAME masked batch core q283 gates
    * ([[graft.operators.Round15Queries.bm25ServeQueriesFromIndexMasked]]),
    * so stream ≡ batch by shared code and the filtered-corpus
    * exactness theorem carries over verbatim: no dead doc at any rank,
    * df/stats at the surviving corpus's exact values. Missing dial or
    * index at start is a deployment error (never a mid-stream sweep or
    * tokenize). Per-batch cost = the q283 masked-serve bill.
    */
  def streamingBm25RankMasked(s: SparkSession, dir: String,
      queries: DataFrame, tombstones: DataFrame)(emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val c = graft.operators.Round15Queries.bm25ChoiceRead(s,
      graft.operators.Round15Queries.bm25ChoicePath(dir)).getOrElse(
      sys.error("streamingBm25RankMasked: no persisted (k1, b) artifact " +
        s"for $dir — run prepareBm25ParamsChoice first"))
    val idx = graft.operators.Round15Queries.bm25IndexPath(dir)
    if (graft.operators.Round15Queries.bm25IndexRead(s, idx).isEmpty)
      sys.error("streamingBm25RankMasked: no persisted postings index " +
        s"for $dir — run prepareBm25Index first")
    val frozen = tombstones.select(col("doc_id")).localCheckpoint()
    queries.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        emit(graft.operators.Round15Queries.bm25ServeQueriesFromIndexMasked(
          s, idx, batch, c.k1Micro, c.bMicro, frozen))
      }
      .start()
  }

  /** Streaming split assignment — q288's twin, and the operational
    * point of the map-only design: because the fold is a pure function
    * of the row (the high-bits Knuth mix), assignment at INGEST TIME
    * agrees exactly with assignment computed later at read time —
    * stream ≡ batch by shared code
    * ([[graft.operators.Round17Queries.assignSplits]]) and by
    * row-locality; no state, no reconciliation job. Docs need
    * (doc_id, lang).
    */
  def streamingSplitAssign(docs: DataFrame)(emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        emit(graft.operators.Round17Queries.assignSplits(batch))
      }
      .start()

  /** Streaming POSTINGS-INDEX maintenance — the q282 append verb as a
    * live ingest sink, and [[streamingIvfPqAppend]]'s text-retrieval
    * twin: documents stream in; each micro-batch is tokenized and
    * merged into the persisted postings index
    * ([[graft.operators.Round15Queries.bm25IndexAppendBatch]]) — batch
    * postings/dl appended, df summed exactly, stats re-derived from
    * the dl artifact (order-free long sums), meta advanced by exactly
    * the batch's stamp contribution. Stream ≡ batch by SHARED CODE and
    * exact integer arithmetic: ANY micro-batch split of the new docs
    * lands on an index whose tables are set-equal (and whose meta is
    * bit-equal) to one [[graft.operators.Round15Queries.bm25IndexAppendDocs]]
    * over their union — the StreamingOpsSpec law. State lives in the
    * index artifact, not the stream; the index must exist before the
    * stream starts (a stream never pays a corpus tokenize). Docs need
    * (doc_id, text), ids disjoint from the indexed corpus (the append
    * contract).
    */
  def streamingPostingsAppend(s: SparkSession, docs: DataFrame,
      indexDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    if (graft.operators.Round15Queries.bm25IndexRead(s, indexDir).isEmpty)
      sys.error("streamingPostingsAppend: no persisted postings index " +
        s"at $indexDir — build offline first (prepareBm25Index)")
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.operators.Round15Queries.bm25IndexAppendBatch(
            s, indexDir, batch)
      }
      .start()
  }

  /** [[streamingPostingsAppend]]'s DATASET-CARD twin — a LIVE card
    * that follows the ingest stream: each micro-batch is tokenized
    * and merged into the persisted card
    * ([[graft.operators.Round18Queries.cardAppendBatch]] — volume
    * sums advanced by exactly the batch's contribution, vocab union
    * touching only the batch's hashed buckets at the card's OWN
    * dial, the ledger↔meta Σ-tie crash discipline per merge). Stream
    * ≡ batch by SHARED CODE and exact integer arithmetic: any
    * micro-batch split of the new docs lands on a card whose tables
    * are set-equal (and whose meta is bit-equal) to one merge over
    * their union — and therefore to the one-shot card over the grown
    * corpus (the q295 theorem; the StreamingOpsSpec law). State lives
    * in the card artifact, not the stream; the card must exist before
    * the stream starts (a stream never pays a corpus tokenize). Docs
    * need (doc_id, lang, source, text), ids disjoint from the carded
    * corpus (the append contract). A torn or legacy card refuses
    * loudly at the first merge — the stream surfaces the artifact's
    * own crash discipline, never launders it. */
  /** LIVE DRIFT MONITOR — [[streamingCardAppend]] composed with the
    * release drift report ([[graft.operators.Round19Queries.cardDrift]],
    * q308's verb): the stream maintains the LIVE card, and after every
    * micro-batch `emit` receives the current drift of the live corpus
    * against a pinned REFERENCE card (a release's datasheet — e.g. an
    * as-of card from `cardBuildAsOf`). The operator's question is the
    * release engineer's standing one: HOW FAR has the corpus drifted
    * since release k — per-stratum volume deltas, vocabulary growth,
    * new/vanished strata — answered continuously, at card-read cost
    * per batch (the drift never touches corpus text; the batch
    * tokenize is the append's, paid once). The reference card is
    * never written; the live card carries the merge discipline
    * (Σ-tie, torn refusal at stream start via the append twin).
    * Stream ≡ batch: after the last batch, the emitted drift equals
    * [[graft.operators.Round19Queries.cardDrift]] of the reference
    * against a one-shot card over the grown corpus — the
    * StreamingOpsSpec law, through the append twin's convergence. */
  def streamingCardDriftMonitor(s: SparkSession, docs: DataFrame,
      liveCardPath: String, refCardPath: String)(emit: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    if (graft.operators.Round18Queries.cardState(s, liveCardPath) !=
        graft.operators.Round18Queries.CardOk)
      sys.error("streamingCardDriftMonitor: no healthy live card at " +
        s"$liveCardPath — build offline first (cardEnsure)")
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Round18Queries.cardAppendBatch(
            s, liveCardPath, batch)
          emit(graft.operators.Round19Queries.cardDrift(
            s, refCardPath, liveCardPath))
        }
      }
      .start()
  }

  def streamingCardAppend(s: SparkSession, docs: DataFrame,
      cardPath: String): org.apache.spark.sql.streaming.StreamingQuery = {
    if (graft.operators.Round18Queries.cardState(s, cardPath) !=
        graft.operators.Round18Queries.CardOk)
      sys.error("streamingCardAppend: no healthy persisted card at " +
        s"$cardPath — build offline first (cardEnsure); torn/legacy " +
        "states must be resolved before a stream merges into them")
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.operators.Round18Queries.cardAppendBatch(
            s, cardPath, batch)
      }
      .start()
  }

  /** SNAPSHOT-CURSOR index maintenance — [[streamingPostingsAppend]]
    * with the LAKE MANIFESTS as the stream's source of truth (the
    * round-12 verdict's #5: q286's delta cursor and the streaming
    * append are the same idea on two surfaces — composed here). Each
    * snapshot interval (k, k+1) IS a micro-batch: the manifest
    * difference names exactly the files an ingest added
    * ([[graft.io.SnapshotStore.readDelta]] — two TSV reads + a set
    * difference, zero data I/O to discover; the scan reads only the
    * interval's own files), and each delta is merged through the SAME
    * append body every other ingestion style uses. So a consumer that
    * fell arbitrarily far behind catches up by replaying manifest
    * intervals — batch-sized bills, never a corpus re-tokenize — and
    * lands on an index whose meta is BIT-EQUAL to a one-shot build
    * over the final lake state (the StreamingOpsSpec law; the shared
    * exact-integer-arithmetic argument of the micro-batch law). The
    * cursor position is the snapshot id — durable, externally visible,
    * and exactly-once by the append contract (ids in a delta are new
    * files' rows, disjoint from every indexed doc).
    *
    * The index must exist before consumption starts (built for the
    * from-snapshot's state — a catch-up never pays a corpus tokenize);
    * a rewrite inside the consumed range fails LOUDLY at the delta
    * read (the non-append interval law), which is the correct verdict:
    * a compacted lake needs a rebuild, not an append. Returns the
    * number of non-empty intervals applied. */
  def postingsAppendFromSnapshots(s: SparkSession, snapDir: String,
      indexDir: String, fromId: Int, toId: Int): Int = {
    if (graft.operators.Round15Queries.bm25IndexRead(s, indexDir).isEmpty)
      sys.error("postingsAppendFromSnapshots: no persisted postings " +
        s"index at $indexDir — build offline for snapshot $fromId first")
    (fromId until toId).count { k =>
      val delta = graft.io.SnapshotStore.readDelta(s, snapDir, k, k + 1)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))
      val nonEmpty = !delta.isEmpty
      if (nonEmpty)
        graft.operators.Round15Queries.bm25IndexAppendBatch(
          s, indexDir, delta)
      nonEmpty
    }
  }

  /** [[postingsAppendFromSnapshots]]'s ANN twin — the snapshot cursor
    * feeding the SECOND index family: each interval's delta (the
    * ingested vector files, named exactly by the manifest difference)
    * is encoded against the index's EXISTING quantizers and appended
    * into the cluster-partitioned inverted lists
    * ([[graft.ann.Ann.ivfPqAppend]] — centroids/codebooks untouched by
    * construction, so per-vector assignments are independent and any
    * interval split lands on the same index state the union append
    * would). Same contracts as the postings twin: the index must
    * exist (built for the from-snapshot's state), a rewrite inside
    * the range fails loudly at the delta read (a compacted vector
    * lake needs a rebuild/retrain decision, not an append). Returns
    * the number of non-empty intervals applied. */
  def ivfPqAppendFromSnapshots(s: SparkSession, snapDir: String,
      indexDir: String, fromId: Int, toId: Int): Int = {
    val metaP = new org.apache.hadoop.fs.Path(s"$indexDir/centroids")
    val fs = metaP.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(metaP))
      sys.error("ivfPqAppendFromSnapshots: no persisted IVF-PQ index " +
        s"at $indexDir — build offline for snapshot $fromId first")
    (fromId until toId).count { k =>
      val delta = graft.io.SnapshotStore.readDelta(s, snapDir, k, k + 1)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding"))
      val nonEmpty = !delta.isEmpty
      if (nonEmpty) graft.ann.Ann.ivfPqAppend(delta, indexDir)
      nonEmpty
    }
  }

  def runToMemory(spark: SparkSession, transformed: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): Unit = {
    val q = transformed.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
