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

  /** The trained model: final E-step segmentation, raw final usage
    * counts, and the served (smoothed) scores. */
  final case class Model(seg: DataFrame, counts: DataFrame,
      scores: DataFrame)

  private def trainUncached(s: SparkSession, dir: String): Model = {
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
    Model(seg, raw, scores)
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
