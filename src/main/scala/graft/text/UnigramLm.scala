package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Unigram-LM tokenizer TRAINER (Kudo 2018, the SentencePiece unigram
  * model; reference repo has no tokenizer training — this is part of
  * the LLM-data-pipeline surface) — the subword counterpart of
  * q114/q115's BPE, as hard-EM over a seeded piece vocabulary:
  *
  *  1. SEED: every substring (≤ [[MaxPieceLen]] chars) of the corpus'
  *     distinct words, counted weighted by word frequency; single
  *     chars always kept (coverage guarantee — every word stays
  *     segmentable), multi-char pieces gated by [[MinSeedCount]] and
  *     capped at [[MaxSeedPieces]] by (count desc, piece asc) — the
  *     SentencePiece seed_sentencepiece_size dial, which is what keeps
  *     the piece table broadcastable at any corpus size.
  *  2. E-step: Viterbi-segment each DISTINCT word under the current
  *     piece scores — a row-local DP fold (`aggregate` HOF, codegen,
  *     shuffle-free): dp[j] = best over piece lengths l of
  *     dp[j−l] + score(word[j−l+1..j]), ties broken (score desc,
  *     n_pieces asc, piece_len desc) via one integer struct sort.
  *  3. M-step: piece usage counts over the Viterbi paths (weighted by
  *     word frequency), Laplace-smoothed over the seed support, then
  *     re-scored; iterate [[EmRounds]] times.
  *
  * All scores are ln-probabilities micro-quantized to integer longs
  * (the q232/ADC determinism rule), so the DP compares integers and
  * the learned segmentation is bit-identical between the engine and
  * the DuckDB oracle replay.
  *
  * DOCUMENTED DIVERGENCE — hard-EM, not full EM: Kudo 2018's reference
  * trainer computes EXPECTED piece counts over ALL segmentations of
  * each word (forward–backward marginals); this trainer counts pieces
  * along the single Viterbi-BEST path only (Viterbi-/hard-EM). The
  * two estimators genuinely differ: a piece that rides only non-best
  * segmentations gets fractional expected mass under full EM but a
  * raw count of ZERO here (the Laplace floor in [[smoothed]] is what
  * keeps it alive between rounds — pruning stays an output-time
  * decision). Hard-EM is the deliberate choice because the entire
  * determinism story rides on it: the M-step input is an integer
  * argmin path, so usage counts are exact longs and the DuckDB oracle
  * replays training bit-for-bit, whereas forward–backward marginals
  * are irreducibly floating-point (log-sum-exp), which would put a
  * platform-sensitive float inside the hash gate. Same discipline as
  * the documented NLTK-lemmatizer divergence: divergence named,
  * bounded, and spec-pinned (UnigramLmSpec "hard-EM vs full-EM" — the
  * law computes the forward–backward expectation locally and shows a
  * real piece where the two estimators disagree, so the note is
  * non-vacuous on the gate fixture itself).
  *
  * THE SCALE SHAPE IS THE POINT: the corpus is touched ONCE (word
  * counts — one partial-agg exchange); seeding, scoring, EM, and the
  * final vocabulary all run on the DISTINCT-WORD table (vocabulary-
  * scale, orders of magnitude under corpus scale) with broadcast
  * piece-score joins — at 100 TB the trainer's cost after the first
  * pass is independent of corpus size, exactly how production subword
  * trainers consume a word-count table, while BPE (q115) re-walks the
  * merged corpus every round.
  */
object UnigramLm {

  val MaxPieceLen = 4
  val MinSeedCount = 2L
  val MaxSeedPieces: Long = 1L << 20
  val EmRounds = 2
  val VocabSize = 64

  /** The vocab-size sweep and fertility budget of the engine-chosen
    * vocabulary (q275 — the tokenizer layer's last human dial closed,
    * the round-10 verdict's task #3). The budget sits between the
    * corpus' V=48 fertility at sf0.01 (2.3064 — first-satisfying
    * branch, chosen 48) and at sf0.001 (2.3392 — the 48-point misses,
    * so the rule walks on to 64), so the gate pins the rule actually
    * DISCRIMINATING, not rubber-stamping one point; the all-miss
    * fallback branch is spec-pinned with a synthetic budget. */
  val VocabSweep: Seq[Int] = Seq(16, 32, 48, 64)
  val MaxFertilityMicro = 2320000L

  /** Corpus word counts — the only corpus-scale pass. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextPrep.tokensCol(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  // every (end position j, piece length l) of a word, as one flattened
  // row-local expression — shared by seeding and candidate generation
  private def pieceSpans: String =
    s"""flatten(transform(sequence(1, length(word)),
       |  j -> transform(sequence(1, least($MaxPieceLen, j)),
       |    l -> named_struct('j', j, 'l', l,
       |      'piece', substring(word, j - l + 1, l)))))""".stripMargin

  /** Seed piece counts over the distinct-word table: substring
    * occurrences weighted by word frequency, single chars always kept,
    * multi-char pieces frequency-gated and capped (count desc, piece
    * asc — the window ranks the vocabulary-sized piece table, the q126
    * class, never corpus rows). */
  def seedCounts(wc: DataFrame): DataFrame = {
    val counted = wc
      .select(col("n"), explode(expr(pieceSpans)).as("c"))
      .select(col("n"), col("c.piece").as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
    val singles = counted.filter(length(col("piece")) === 1)
    val multi = counted
      .filter(length(col("piece")) > 1 && col("cnt") >= MinSeedCount)
      .withColumn("srk", row_number()
        .over(Window.orderBy(col("cnt").desc, col("piece").asc)))
      .filter(col("srk") <= MaxSeedPieces).drop("srk")
    singles.unionByName(multi)
  }

  /** Piece counts → micro-quantized ln-probability scores (one
    * vocabulary-sized aggregate for the total; broadcast scalar). */
  def scoresFromCounts(counts: DataFrame): DataFrame =
    counts
      .crossJoin(broadcast(counts.agg(sum(col("cnt")).cast("double").as("tot"))))
      .select(col("piece"),
        round(lit(1e6) * log(col("cnt").cast("double") / col("tot")), 0)
          .cast("long").as("s"))

  /** E-step: Viterbi segmentation of every distinct word under the
    * given piece scores. Returns (word, n, pieces, n_pieces,
    * score_micro). Row-local DP — the only exchange is the broadcast
    * score join and the per-word candidate collect. Every position is
    * reachable because single chars are always in the vocabulary. */
  def viterbiSegment(wc: DataFrame, scores: DataFrame): DataFrame = {
    val cands = wc.select(col("word"), explode(expr(pieceSpans)).as("c"))
      .select(col("word"), col("c.j").as("j"), col("c.l").as("l"),
        col("c.piece").as("piece"))
      .join(broadcast(scores), Seq("piece"))
      .groupBy(col("word"))
      .agg(collect_list(struct(col("j"), col("l"), col("s"))).as("cands"))
    wc.join(cands, Seq("word"))
      .withColumn("dp", expr(
        """aggregate(
          |  sequence(1, length(word)),
          |  array(named_struct('ns', 0L, 'np', 0L, 'nl', 0L)),
          |  (acc, j) -> concat(acc, array(element_at(array_sort(transform(
          |      filter(cands, c -> c.j = j),
          |      c -> named_struct(
          |        'ns', element_at(acc, j - c.l + 1).ns - c.s,
          |        'np', element_at(acc, j - c.l + 1).np + 1L,
          |        'nl', CAST(-c.l AS BIGINT)))), 1))))""".stripMargin))
      .withColumn("pieces", expr(
        """aggregate(
          |  sequence(1, length(word)),
          |  named_struct('pos', length(word), 'parts', CAST(array() AS array<string>)),
          |  (acc, i) -> IF(acc.pos <= 0, acc, named_struct(
          |    'pos', acc.pos + CAST(element_at(dp, acc.pos + 1).nl AS INT),
          |    'parts', concat(array(substring(word,
          |        acc.pos + CAST(element_at(dp, acc.pos + 1).nl AS INT) + 1,
          |        CAST(-element_at(dp, acc.pos + 1).nl AS INT))), acc.parts))),
          |  acc -> acc.parts)""".stripMargin))
      .select(col("word"), col("n"), col("pieces"),
        size(col("pieces")).cast("long").as("n_pieces"),
        expr("-element_at(dp, length(word) + 1).ns").as("score_micro"))
  }

  /** M-step: piece usage over the Viterbi paths, word-frequency
    * weighted. */
  def viterbiCounts(seg: DataFrame): DataFrame =
    seg.select(col("n"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))

  /** Laplace smoothing over the SEED support — every seed piece keeps
    * a nonzero probability between rounds (pruning is an output-time
    * decision, never a mid-EM one), and every path piece is covered
    * because candidates only ever come from the seed. */
  def smoothed(seed: DataFrame, counts: DataFrame): DataFrame =
    seed.select(col("piece"))
      .join(counts, Seq("piece"), "left_outer")
      .select(col("piece"), (coalesce(col("cnt"), lit(0L)) + 1L).as("cnt"))

  /** The trained model: the checkpointed word-count and seed tables
    * (the sweep surfaces re-segment against them), final E-step
    * segmentation, raw final usage counts, and the served (smoothed)
    * scores. */
  final case class Model(wc: DataFrame, seed: DataFrame, seg: DataFrame,
      counts: DataFrame, scores: DataFrame)

  private[graft] def trainUncached(s: SparkSession, dir: String): Model = {
    val wc = wordCounts(Tables.documents(s, dir)).localCheckpoint()
    val seed = seedCounts(wc).localCheckpoint()
    var scores = scoresFromCounts(seed)
    var seg: DataFrame = null
    var raw: DataFrame = null
    for (_ <- 1 to EmRounds) {
      seg = viterbiSegment(wc, scores).localCheckpoint()
      raw = viterbiCounts(seg).localCheckpoint()
      scores = scoresFromCounts(smoothed(seed, raw))
    }
    Model(wc, seed, seg, raw, scores)
  }

  // ------------------------------------------- engine-chosen vocab size
  /** Pruned vocabulary at (nominal) size `v`: EVERY single-char seed
    * piece — the coverage guarantee is never traded away, so a `v`
    * under the alphabet size floors at the alphabet (SentencePiece's
    * required_chars contract) — plus the top (v − #singles) multi-char
    * pieces by final Viterbi usage (cnt desc, piece asc — the q266
    * vocabulary ranking). The nested-prefix property is what makes the
    * vocab-size sweep ONE training run: every sweep point is a prune
    * of the SAME trained counts, never a re-train (Kudo 2018 trains
    * large and prunes; the sweep reads the prune ladder).
    */
  def prunedVocab(seed: DataFrame, counts: DataFrame, v: Int): DataFrame = {
    val singles = seed.filter(length(col("piece")) === 1)
      .select(col("piece"))
    val quota = math.max(0L, v.toLong - singles.count())
    val multis = counts.filter(length(col("piece")) > 1)
      .withColumn("mrk", row_number()
        .over(Window.orderBy(col("cnt").desc, col("piece").asc)))
      .filter(col("mrk") <= quota).select(col("piece"))
    singles.unionByName(multis)
  }

  /** Serving scores of a pruned vocabulary: the model's smoothed final
    * counts RESTRICTED to the vocabulary, renormalized
    * ([[scoresFromCounts]]) — pruning is an output-time decision over
    * the trained counts, exactly the trainer's own contract. */
  def vocabScores(seed: DataFrame, counts: DataFrame,
      vocab: DataFrame): DataFrame =
    scoresFromCounts(
      smoothed(seed, counts).join(vocab, Seq("piece"), "left_semi"))

  /** Measured corpus fertility under the pruned vocabulary at `v`, as
    * the EXACT integer pair (Σ n·n_pieces, Σ n) — pieces emitted per
    * corpus word, the quality signal q269 reports per document. One
    * vocabulary-scale E-step over the distinct-word table; the
    * denominator is v-invariant (total corpus words). */
  def fertilityAt(wc: DataFrame, seed: DataFrame, counts: DataFrame,
      v: Int): (Long, Long) = {
    val r = viterbiSegment(wc, vocabScores(seed, counts,
        prunedVocab(seed, counts, v)))
      .agg(sum(col("n") * col("n_pieces")), sum(col("n"))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Pure operating-point rule (the chooseNprobe discipline, exact-
    * rational like chooseBanding): the SMALLEST swept vocabulary whose
    * measured fertility meets the budget — bigger vocabularies cost
    * embedding-table rows and artifact size while fertility saturates,
    * so the first satisfying size is the cheapest one honoring the
    * compression SLO. Satisfaction is the exact integer
    * cross-multiplication num·10^6 ≤ maxFertilityMicro·den (BigInt —
    * a 100 TB corpus' Σ n·n_pieces crosses 2^63/10^6). If no swept
    * size reaches the budget, the LARGEST swept size: the fertility
    * floor is the corpus' intrinsic compressibility under
    * [[MaxPieceLen]] — more vocabulary cannot buy the budget back, so
    * the engine serves the best point it measured.
    */
  def chooseVocabSize(curve: Seq[(Int, Long, Long)],
      maxFertilityMicro: Long): Int = {
    require(curve.nonEmpty, "chooseVocabSize: empty fertility curve")
    require(curve.forall(_._3 > 0), "chooseVocabSize: empty-corpus point")
    val sorted = curve.sortBy(_._1)
    sorted.find { case (_, num, den) =>
      BigInt(num) * 1000000 <= BigInt(maxFertilityMicro) * BigInt(den)
    }.map(_._1).getOrElse(sorted.last._1)
  }

  // model-artifact memo, the bpeTrain cache discipline: bounded LRU
  // keyed by the session OBJECT (see TextStatsQueries.bpeCache for why
  // not a WeakHashMap), serialized first builds
  private val MaxEntries = 8
  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String), Model](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), Model]): Boolean =
        size() > MaxEntries
    }

  def train(s: SparkSession, dir: String): Model = cache.synchronized {
    val k = (s, dir)
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      val m = trainUncached(s, dir)
      cache.put(k, m)
      m
    }
  }
}
