package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.VectorFunctions
import graft.text.TextPrep

/** Round-14 additions (driver round 6, batch 15): the retrieval/eval
  * layer a training-data pipeline runs AFTER curation — ranked lexical
  * retrieval (BM25), generation-eval n-gram overlap (ROUGE-2 clipped
  * counts), diversity-aware result selection (MMR), and exact
  * classifier-eval statistics (rank-sum ROC-AUC, reliability bins).
  *
  * Determinism contract (the q21/q98 conventions): every cross-engine
  * double is either a round-6 value built from identical integer
  * inputs, or an integer carrier (micro-units, exact pair counts);
  * ln() appears only inside per-row formulas rounded to 1e-6 — never
  * summed across unbounded row counts before rounding.
  */
object Round14Queries {

  // ---------------------------------------------------------------- q226
  /** Okapi BM25 ranked retrieval: score every document against a fixed
    * term query with the standard (k1=1.2, b=0.75) formula and return
    * the top 10. The lexical-retrieval primitive behind "find the
    * training docs most relevant to this eval prompt" — the exact
    * ranked complement of q145's boolean conjunctive search and q216's
    * positional phrase retrieval.
    *
    * Shape at scale: the corpus-wide stages are one token explode
    * filtered to the |Q| query terms (the per-(doc,term) tf table —
    * carrying |Q| terms per doc at most, never the vocabulary) and one
    * map-side token count per doc (dl). df and avgdl are |Q|-row /
    * 1-row broadcasts. Ranking is TakeOrderedAndProject (top-k heap per
    * partition), never a global sort. At lake scale the explode-filter
    * stage is served by the q216 inverted index artifact instead of a
    * rescan; the formula and ranking stages are unchanged.
    *
    * idf uses the Robertson–Sparck Jones form ln(1 + (N-df+0.5)/(df+0.5))
    * — nonnegative even for df > N/2, which this synthetic corpus's
    * high-df vocabulary exercises for every query term. The per-doc
    * score sums |Q| ln-bearing terms (bounded, not corpus-bounded)
    * before the round-6 — inside the q98 quantization-safety rule.
    */
  val Bm25Query: Seq[String] = Seq("spark", "window", "merge")
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25TopK = 10

  /** Keyed BM25 scoring core — ONE implementation of the Okapi formula
    * shared by the single-query tail ([[bm25Rank]], and through it the
    * streaming incremental index
    * [[graft.streaming.StreamingOps.runningBm25]]) and the multi-query
    * retrieval join ([[Round15Queries.q244MultiBm25]]), so every
    * surface agrees by construction. Input `tfq(query_id, doc_id,
    * term, tf)` — the per-query term restriction/fan-out already
    * applied — plus `dl(doc_id, dl)`, `dfTab(term, df)` (query-term
    * sized, broadcast), `stats(n_docs, avgdl)` (1 row, broadcast).
    * Output: (query_id, doc_id, bm25 round-6, n_terms_hit), unranked —
    * callers pick their ranking shape (TakeOrderedAndProject for one
    * query, per-key heaps for many). */
  def bm25ScoreKeyed(tfq: DataFrame, dl: DataFrame, dfTab: DataFrame,
      stats: DataFrame): DataFrame =
    bm25ScoreKeyedAt(tfq, dl, dfTab, stats,
      Seq("query_id", "doc_id"), lit(Bm25K1), lit(Bm25B))

  /** [[bm25ScoreKeyed]] with the Okapi dials (k1, b) as COLUMNS and the
    * aggregation keys explicit — the REFERENCE spelling of the
    * parameterized formula. The q271 grid sweep evaluates the same
    * algebra as a row-local fold over grouped components
    * ([[Round15Queries.scoreComponentsAtGrid]] — the exchange-free
    * shape); Round15QueriesSpec pins fold ≡ this groupBy form at the
    * default dials, so the two spellings cannot silently drift.
    * `keyCols` must make (k1, b) constant within each group when they
    * are real columns. */
  def bm25ScoreKeyedAt(tfq: DataFrame, dl: DataFrame, dfTab: DataFrame,
      stats: DataFrame, keyCols: Seq[String],
      k1: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): DataFrame =
    tfq.join(broadcast(dfTab), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + lit(1.0))) /
          (col("tf") + k1 *
            (lit(1.0) - b + b * col("dl") / col("avgdl"))))
      .groupBy(keyCols.map(col): _*)
      .agg(round(sum(col("contrib")), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))

  /** Single-query BM25 ranking tail — the batch query AND the
    * streaming incremental index
    * ([[graft.streaming.StreamingOps.runningBm25]]) share this, so
    * stream ≡ batch holds by construction, not by parallel
    * maintenance; scoring itself rides [[bm25ScoreKeyed]] with a
    * constant query_id, so the multi-query join shares the formula
    * too. Inputs: `tf(doc_id, term, tf)` restricted to query terms,
    * `dl(doc_id, dl)` covering at least the matched docs,
    * `dfTab(term, df)`, `stats(n_docs, avgdl)` (1 row). Ranking is
    * TakeOrderedAndProject (top-k heap), never a global sort. */
  def bm25Rank(tf: DataFrame, dl: DataFrame, dfTab: DataFrame,
      stats: DataFrame, k: Int): DataFrame =
    bm25ScoreKeyed(tf.withColumn("query_id", lit(0L)), dl, dfTab, stats)
      .select(col("doc_id"), col("bm25"), col("n_terms_hit"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)

  def q226Bm25(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextPrep.tokensCol(col("text")).as("toks"))
    val dl = docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")) / count(lit(1))).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(Bm25Query: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    bm25Rank(tf, dl, dfTab, stats, Bm25TopK)
  }

  private val bm25TermList = Bm25Query.map(t => s"'$t'").mkString(", ")

  val q226Sql: String =
    s"""WITH lists AS (
       |  SELECT doc_id,
       |         list_filter(string_split(trim(regexp_replace(lower(text), '(\\d|\\W)+', ' ', 'g')), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM lists),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 sum(dl) / count(*) AS avgdl FROM dl),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(toks) AS term FROM lists)
       |  WHERE term IN ($bm25TermList)
       |  GROUP BY doc_id, term),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT t.doc_id,
       |         sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
       |             (t.tf * (${Bm25K1} + 1.0)) /
       |             (t.tf + ${Bm25K1} *
       |              (1.0 - ${Bm25B} + ${Bm25B} * l.dl / s.avgdl))) AS raw,
       |         count(*) AS n_terms_hit
       |  FROM tf t JOIN dfreq d USING (term) JOIN dl l USING (doc_id)
       |  CROSS JOIN stats s
       |  GROUP BY t.doc_id)
       |SELECT doc_id, round(raw, 6) AS bm25,
       |       CAST(n_terms_hit AS BIGINT) AS n_terms_hit
       |FROM scored ORDER BY bm25 DESC, doc_id LIMIT $Bm25TopK""".stripMargin

  // ---------------------------------------------------------------- q227
  /** ROUGE-2 clipped bigram overlap over aligned doc pairs — the
    * n-gram generation-eval metric (candidate doc_id d scored against
    * reference d+1; in production the pair key is an example id joining
    * model outputs to references). Clipped counting is the part plain
    * set intersection gets wrong: each candidate bigram matches at most
    * min(count_cand, count_ref) times, so a candidate that repeats one
    * reference bigram 50× cannot buy recall.
    *
    * Shape at scale: two per-doc bigram multiset counts (one explode +
    * map-side combine), a hash join keyed on (bigram, pair id), a
    * pair-keyed rollup. No window, no broadcast of anything
    * corpus-sized; the pair relation is 1:1 on doc_id so every exchange
    * is pair-keyed. Precision/recall emitted as exact integer counts
    * plus round-6 ratios (nullif-guarded for <2-token docs).
    */
  def q227Rouge2(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextPrep.tokensCol(col("text")).as("toks"))
    // size<2 guard: Spark's sequence(0, n) DESCENDS for n<0, and ANSI
    // mode turns the resulting negative toks[i] into a hard error.
    val bigrams = docs.filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
          .as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("c"))
    val totals = bigrams.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    val overlap = bigrams.as("a")
      .join(bigrams.as("b"),
        col("a.bigram") === col("b.bigram") &&
          col("b.doc_id") === col("a.doc_id") + 1)
      .groupBy(col("a.doc_id").as("cand_id"))
      .agg(sum(least(col("a.c"), col("b.c"))).as("overlap"))
    val pairs = totals.as("ta")
      .join(totals.as("tb"), col("tb.doc_id") === col("ta.doc_id") + 1)
      .select(col("ta.doc_id").as("cand_id"), col("tb.doc_id").as("ref_id"),
        col("ta.n").as("n_cand"), col("tb.n").as("n_ref"))
    pairs.join(overlap, Seq("cand_id"), "left_outer")
      .select(col("cand_id"), col("ref_id"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        col("n_cand"), col("n_ref"),
        round(coalesce(col("overlap"), lit(0L)) /
          nullif(col("n_cand"), lit(0L)), 6).as("rouge2_precision"),
        round(coalesce(col("overlap"), lit(0L)) /
          nullif(col("n_ref"), lit(0L)), 6).as("rouge2_recall"))
      .orderBy(col("cand_id"))
  }

  val q227Sql: String =
    """WITH lists AS (
      |  SELECT doc_id,
      |         list_filter(string_split(trim(regexp_replace(lower(text), '(\d|\W)+', ' ', 'g')), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, bigram, count(*) AS c FROM (
      |    SELECT doc_id,
      |           toks[i + 1] || ' ' || toks[i + 2] AS bigram
      |    FROM lists, unnest(range(0, len(toks) - 1)) AS t(i))
      |  GROUP BY doc_id, bigram),
      |totals AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM bg GROUP BY doc_id),
      |ov AS (
      |  SELECT a.doc_id AS cand_id, sum(least(a.c, b.c)) AS overlap
      |  FROM bg a JOIN bg b ON a.bigram = b.bigram AND b.doc_id = a.doc_id + 1
      |  GROUP BY a.doc_id),
      |pairs AS (
      |  SELECT ta.doc_id AS cand_id, tb.doc_id AS ref_id,
      |         ta.n AS n_cand, tb.n AS n_ref
      |  FROM totals ta JOIN totals tb ON tb.doc_id = ta.doc_id + 1)
      |SELECT p.cand_id, p.ref_id,
      |       CAST(COALESCE(o.overlap, 0) AS BIGINT) AS overlap,
      |       p.n_cand, p.n_ref,
      |       round(COALESCE(o.overlap, 0) / nullif(p.n_cand, 0), 6)
      |         AS rouge2_precision,
      |       round(COALESCE(o.overlap, 0) / nullif(p.n_ref, 0), 6)
      |         AS rouge2_recall
      |FROM pairs p LEFT JOIN ov o ON o.cand_id = p.cand_id
      |ORDER BY p.cand_id""".stripMargin

  // ---------------------------------------------------------------- q228
  /** Maximal Marginal Relevance: diversity-aware top-k selection over a
    * relevance-ranked candidate pool — the retrieval-side dedup that
    * keeps a RAG/eval result list from returning five near-copies of
    * the same document. Greedy MMR: pick argmax of
    * λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s), k times.
    *
    * Shape at scale: the corpus-wide stage is the relevance scan +
    * TakeOrderedAndProject into a P-row pool (P=20 here; the pool size,
    * not the corpus, bounds everything downstream). Each greedy step is
    * one pool-sized job: candidates × (≤k-row broadcast of selected
    * vectors) → max-sim rollup → 1-row argmax head(). The driver holds
    * only the k chosen (id, score) rows — the loop is k-bounded, the
    * collect is 1 row per step, and the pool never leaves the cluster.
    * Greedy MMR is inherently sequential in k (each pick conditions the
    * next); k tiny jobs IS its parallel form.
    *
    * Determinism: rel and pairwise sims are round-6 cosines (q21
    * convention); the combined score is one mul/sub over those round-6
    * doubles, re-rounded to 6 — identical IEEE ops in both engines.
    * Ties break on vec_id.
    */
  val MmrLambda = 0.7
  val MmrPool = 20
  val MmrK = 5

  def q228Mmr(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val pool = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"),
        round(VectorFunctions.dot(col("embedding"), col("qv")), 6).as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(MmrPool)
      .localCheckpoint() // pool reused k+1 times; cut the scan lineage
    var chosen = Vector.empty[(Int, Long, Double)] // (step, vec_id, mmr)
    for (step <- 1 to MmrK) {
      val selIds = chosen.map(_._2)
      val cand =
        if (selIds.isEmpty) pool else pool.filter(!col("vec_id").isin(selIds: _*))
      val scored =
        if (selIds.isEmpty)
          cand.select(col("vec_id"), col("rel").as("mmr"))
        else {
          val sel = broadcast(pool.filter(col("vec_id").isin(selIds: _*))
            .select(col("embedding").as("sv")))
          cand.crossJoin(sel)
            .groupBy(col("vec_id"), col("rel"))
            .agg(max(round(VectorFunctions.dot(col("embedding"), col("sv")), 6))
              .as("max_sim"))
            .select(col("vec_id"),
              round(lit(MmrLambda) * col("rel") -
                lit(1.0 - MmrLambda) * col("max_sim"), 6).as("mmr"))
        }
      // pool can run dry when the corpus has fewer than k+1 vectors —
      // stop with the partial selection instead of head() throwing
      val picked = scored.orderBy(col("mmr").desc, col("vec_id")).limit(1).collect()
      if (picked.nonEmpty)
        chosen :+= ((step, picked(0).getLong(0), picked(0).getDouble(1)))
    }
    val schema = StructType(Seq(
      StructField("step", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("mmr", DoubleType, nullable = false)))
    s.createDataFrame(
      java.util.Arrays.asList(
        chosen.map(c => Row(c._1.toLong, c._2, c._3)): _*),
      schema)
  }

  // DuckDB sequential dot of two float lists (the AnnQueries.sqlDot
  // convention), shared by the q228/q236/q238 oracles
  private def sqlDotList(a: String, b: String): String =
    s"(SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) FROM (SELECT unnest($a) AS x, unnest($b) AS y))"
  private def mmrDot(a: String, b: String): String = sqlDotList(a, b)

  /** Greedy selection unrolled as k chained CTE steps (argmax-per-step
    * is sequential, so the oracle mirrors the recursion explicitly). */
  val q228Sql: String = {
    val lam = MmrLambda
    val om = 1.0 - MmrLambda
    // stepN CTEs: selN = ids selected so far, sN = the Nth pick
    val steps = (2 to MmrK).map { n =>
      val prev = (1 until n).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
      s"""c$n AS (
         |  SELECT p.vec_id,
         |         round($lam * p.rel - $om * max(m.sim), 6) AS mmr
         |  FROM pool p
         |  JOIN sims m ON m.ai = p.vec_id
         |  WHERE p.vec_id NOT IN (SELECT vec_id FROM ($prev) AS pr$n)
         |    AND m.bi IN (SELECT vec_id FROM ($prev) AS ps$n)
         |  GROUP BY p.vec_id, p.rel),
         |s$n AS (
         |  SELECT CAST($n AS BIGINT) AS step, vec_id, mmr FROM c$n
         |  ORDER BY mmr DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |pool AS (
       |  SELECT e.vec_id, e.embedding,
       |         round(${mmrDot("e.embedding", "q.qv")}, 6) AS rel
       |  FROM embeddings e CROSS JOIN q
       |  WHERE e.vec_id <> 0
       |  ORDER BY rel DESC, e.vec_id LIMIT $MmrPool),
       |sims AS (
       |  SELECT a.vec_id AS ai, b.vec_id AS bi,
       |         round(${mmrDot("a.embedding", "b.embedding")}, 6) AS sim
       |  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
       |s1 AS (
       |  SELECT CAST(1 AS BIGINT) AS step, vec_id, rel AS mmr FROM pool
       |  ORDER BY mmr DESC, vec_id LIMIT 1),
       |$steps
       |SELECT step, vec_id, mmr FROM (
       |  ${(1 to MmrK).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")}) AS sel
       |ORDER BY step""".stripMargin
  }

  // ---------------------------------------------------------------- q229
  /** Exact ROC-AUC by rank-sum — the classifier-eval primitive behind
    * every quality-filter threshold decision. Score: type-token ratio
    * in integer micro-units (1e6·distinct/total, floor division — an
    * exact integer carrier in both engines); label: lang = 'en'. AUC
    * computed from per-score-group (pos, neg) counts: concordant pairs
    * via a cumulative sum over groups sorted by score, tied pairs
    * counted half — the Mann–Whitney U statistic with tie correction,
    * all in integers until one final division (num2 / (2·P·N)).
    *
    * Shape at scale: per-doc scoring is map-side; the group table is
    * score-cardinality-bounded (≤1e6 rows by construction — the
    * quantization IS the bound), so the single unpartitioned cumsum
    * window rides a bounded post-aggregation table, the same class as
    * q170's value histogram. Nothing corpus-sized crosses the window.
    */
  /** Rank-sum AUC tail over a (score, pos, neg) group table — shared
    * by the batch gate AND the streaming monitor
    * ([[graft.streaming.StreamingOps.runningRocAuc]]), so stream ≡
    * batch holds by shared code (the bm25Rank discipline). */
  def rocAucFromGroups(groups: DataFrame): DataFrame = {
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    groups
      .withColumn("cum_neg_below", sum(col("neg")).over(w) - col("neg"))
      .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(col("pos") * col("cum_neg_below") * 2 + col("pos") * col("neg"))
          .as("num2"))
      .select(col("n_pos"), col("n_neg"), col("num2"),
        // nullif: a single-class corpus (P·N = 0) must yield NULL
        // identically on both engines, not an engine-specific NaN
        // (the q218 ADVICE rule)
        round(col("num2") / nullif(lit(2.0) * col("n_pos") * col("n_neg"),
          lit(0.0)), 6).as("auc"))
  }

  /** Per-doc (score, pos, neg) projection shared by batch and stream:
    * micro-unit TTR score, label = lang = 'en'. */
  def ttrScoreGroups(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), TextPrep.tokensCol(col("text")).as("toks"))
      .filter(size(col("toks")) > 0) // ANSI: div-by-zero is an error, not NULL
      .select(col("lang"),
        expr("1000000L * size(array_distinct(toks)) div size(toks)").as("score"))
      .groupBy(col("score"))
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("pos"),
        sum(when(col("lang") === "en", 0L).otherwise(1L)).as("neg"))

  def q229RocAuc(s: SparkSession, dir: String): DataFrame =
    rocAucFromGroups(ttrScoreGroups(Tables.documents(s, dir)))

  val q229Sql: String =
    """WITH lists AS (
      |  SELECT doc_id, lang,
      |         list_filter(string_split(trim(regexp_replace(lower(text), '(\d|\W)+', ' ', 'g')), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |scored AS (
      |  SELECT lang,
      |         1000000 * len(list_distinct(toks)) // len(toks) AS score
      |  FROM lists WHERE len(toks) > 0),
      |grp AS (
      |  SELECT score,
      |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
      |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
      |  FROM scored GROUP BY score),
      |cum AS (
      |  SELECT score, pos, neg,
      |         sum(neg) OVER (ORDER BY score
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           - neg AS cum_neg_below
      |  FROM grp)
      |SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
      |       CAST(sum(neg) AS BIGINT) AS n_neg,
      |       CAST(sum(pos * cum_neg_below * 2 + pos * neg) AS BIGINT) AS num2,
      |       round(sum(pos * cum_neg_below * 2 + pos * neg)
      |             / nullif(2.0 * sum(pos) * sum(neg), 0.0), 6) AS auc
      |FROM cum""".stripMargin

  // ---------------------------------------------------------------- q230
  /** Reliability (calibration) bins for the q229 score: fixed-width
    * deciles over the micro-unit score space with per-bin count,
    * positive count, and round-6 positive rate — the table a
    * calibration curve plots. Fixed-width (not rank-based) bins keep
    * the shape a pure two-level aggregation: per-doc scoring map-side,
    * one bin-keyed exchange of ≤11 rows. No window, no sort beyond the
    * 11-row output ORDER BY.
    */
  def q230CalibrationBins(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("lang"), TextPrep.tokensCol(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("lang"),
        expr("1000000L * size(array_distinct(toks)) div size(toks)").as("score"))
    docs
      .select(expr("score div 100000").as("bin"), col("lang"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos") / col("n"), 6).as("pos_rate"))
      .orderBy(col("bin"))
  }

  val q230Sql: String =
    """WITH lists AS (
      |  SELECT lang,
      |         list_filter(string_split(trim(regexp_replace(lower(text), '(\d|\W)+', ' ', 'g')), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |scored AS (
      |  SELECT lang,
      |         1000000 * len(list_distinct(toks)) // len(toks) AS score
      |  FROM lists WHERE len(toks) > 0)
      |SELECT score // 100000 AS bin, count(*) AS n,
      |       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_pos,
      |       round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) / count(*), 6)
      |         AS pos_rate
      |FROM scored GROUP BY bin ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------- q231
  /** Perceptual-hash image near-dup join: REAL PNG decode
    * ([[graft.multimodal.Multimodal.dHash64]] — integer-exact 9×8
    * area-average dHash) → banded-Hamming self-join → exact verify.
    * The multimodal↔dedup bridge: the same
    * block/verify discipline as q15's MinHash-LSH and q211's prefix
    * filter, instantiated for the Hamming space image fingerprints
    * live in. Banding: 8 exact 8-bit bands; by pigeonhole any pair
    * within Hamming ≤ 7 shares at least one identical band, so the
    * equi-join on (band, key) has FULL recall at τ=7 and the exact
    * `bit_count(xor)` runs on candidates only. At lake scale the hash
    * table is a persisted per-image artifact (one 8-byte column); the
    * join exchanges 8 band keys per image — never pixels, never
    * payloads — and skewed bands (e.g. all-black thumbnails) get the
    * q15 maxBucket cap.
    *
    * Fixture-dir query (like q45/q132 — the container ships no image
    * corpus): 72×64 block-designed PNGs whose expected hashes and
    * pairwise distances are ANALYTIC ground truth
    * ([[graft.tools.MediaFixtures]]), so the oracle pins a-priori
    * values rather than replaying the implementation.
    */
  val PhashTau = 7

  /** Fixture dir resolution is CWD-independent (the q43Sql target/
    * trap): explicit override (`-Dgraft.phash.fixtureDir` /
    * `GRAFT_PHASH_FIXTURE_DIR`) → test classpath resource (sbt test
    * runs) → repo-root-relative path as the final fallback for drivers
    * launched from the repo root. */
  val PhashFixtureDir: String =
    sys.props.get("graft.phash.fixtureDir")
      .orElse(sys.env.get("GRAFT_PHASH_FIXTURE_DIR"))
      .orElse(Option(getClass.getResource("/media/phash"))
        .filter(_.getProtocol == "file")
        .map(u => new java.io.File(u.toURI).getAbsolutePath))
      .orElse {
        // main-classpath runs (Verify/Bench): walk up from the class
        // code source (target/scala-*/classes) to the repo root and
        // take the fixture path from there — works from any CWD
        Option(getClass.getProtectionDomain.getCodeSource)
          .map(cs => new java.io.File(cs.getLocation.toURI))
          .flatMap { loc =>
            Iterator.iterate(loc)(_.getParentFile).takeWhile(_ != null)
              .map(d => new java.io.File(d, "src/test/resources/media/phash"))
              .find(_.isDirectory).map(_.getAbsolutePath)
          }
      }
      .getOrElse(new java.io.File("src/test/resources/media/phash").getAbsolutePath)

  def q231ImageDhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val files = s.read.format("binaryFile").load(s"$PhashFixtureDir/*.png")
      .select(col("path"), col("content")).as[(String, Array[Byte])]
    val hashes = files.map { case (p, bytes) =>
        (p.substring(p.lastIndexOf('/') + 1),
          graft.multimodal.Multimodal.dHash64(bytes))
      }.toDF("name", "h")
      .localCheckpoint() // decode once; both join sides read the 8-byte table
    val bands = hashes.select(col("name"), col("h"),
      explode(expr(
        "transform(sequence(0, 7), i -> named_struct('band', i, 'key', shiftright(h, i * 8) & 255L))"))
        .as("b"))
      .select(col("name"), col("h"), col("b.band").as("band"), col("b.key").as("key"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.name") < col("y.name"))
      .select(col("x.name").as("a"), col("y.name").as("b"),
        col("x.h").as("ha"), col("y.h").as("hb"))
      .distinct()
    cand
      .select(col("a"), col("b"),
        expr("CAST(bit_count(ha ^ hb) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= PhashTau)
      .orderBy(col("a"), col("b"))
  }

  val q231Sql: String =
    """SELECT * FROM (VALUES
      |  ('grad_a0.png', 'grad_a1.png', CAST(0 AS BIGINT)),
      |  ('grad_a0.png', 'grad_a2.png', CAST(3 AS BIGINT)),
      |  ('grad_a1.png', 'grad_a2.png', CAST(3 AS BIGINT)),
      |  ('grad_b0.png', 'grad_b1.png', CAST(0 AS BIGINT))) t(a, b, hamming)
      |ORDER BY a, b""".stripMargin

  // ---------------------------------------------------------------- q234
  /** q231 through plain SQL — the `dhash64` native expression
    * (GraftExtensions) composed with stock SQL band keys
    * (`shiftright & 255`) and `bit_count(^)` verify: proof the
    * perceptual-dedup pattern needs NO Scala beyond the kernel, the
    * same surface-parity gate q225 gives the set-similarity join and
    * q46 gives argmax. Same analytic VALUES oracle as q231.
    */
  def q234SqlDhash(s: SparkSession, dir: String): DataFrame = {
    s.read.format("binaryFile").load(s"$PhashFixtureDir/*.png")
      .selectExpr("substring_index(path, '/', -1) AS name", "content")
      .createOrReplaceTempView("graft_q234_images")
    s.sql(s"""
      |WITH h AS (SELECT name, dhash64(content) AS h FROM graft_q234_images),
      |bands AS (SELECT name, h, explode(sequence(0, 7)) AS band FROM h),
      |cand AS (
      |  SELECT DISTINCT x.name AS a, y.name AS b, x.h AS ha, y.h AS hb
      |  FROM bands x JOIN bands y
      |    ON x.band = y.band
      |   AND (shiftright(x.h, x.band * 8) & 255L)
      |     = (shiftright(y.h, y.band * 8) & 255L)
      |   AND x.name < y.name)
      |SELECT a, b, CAST(bit_count(ha ^ hb) AS BIGINT) AS hamming
      |FROM cand WHERE bit_count(ha ^ hb) <= $PhashTau
      |ORDER BY a, b""".stripMargin)
  }

  // ---------------------------------------------------------------- q235
  /** Delete-one-group jackknife standard error of the mean token count
    * — the resampling-based uncertainty leg the eval-stats family
    * (q200 A/B, q207 KS, q166 χ², q229 AUC) lacked: "how stable is
    * this corpus statistic under removal of any one source" is the
    * question a curation change-review actually asks, and sources are
    * the natural (and cluster-correlation-honest) resampling unit.
    *
    * Determinism discipline: leave-one-out means are micro-quantized
    * (1e9) to DECIMAL(38,0) BEFORE any sum, so Σd and Σd² are exact
    * (a 20-value double sum would be reduce-order nondeterministic);
    * the variance identity g·Σd² − (Σd)² stays in exact decimal and
    * doubles appear only in the final sqrt/divide, identically ordered
    * in both engines. Shape: one map-side token count, one
    * |sources|-row aggregate, one 1-row broadcast — corpus touched
    * once.
    */
  def q235Jackknife(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("source"), size(TextPrep.tokensCol(col("text"))).cast("long").as("nt"))
    val per = toks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_s"), sum(col("nt")).as("s_s"))
    val tot = per.agg(sum(col("n_s")).as("N"), sum(col("s_s")).as("S"))
    val d = per.crossJoin(broadcast(tot))
      .filter(col("N") > col("n_s"))
      .select(col("N"), col("S"),
        expr("CAST(round(1e9 * (S - s_s) / (N - n_s), 0) AS DECIMAL(38,0))")
          .as("d"))
    d.groupBy(col("N"), col("S"))
      .agg(count(lit(1)).as("g"), sum(col("d")).as("sd"),
        sum(expr("d * d")).as("sdd"))
      .select(col("g"),
        round(col("S").cast("double") / col("N"), 6).as("mean_tokens"),
        round(
          sqrt((col("g") - 1).cast("double") *
            expr("CAST(g * sdd - sd * sd AS DOUBLE)")) /
            col("g") / lit(1e9), 6).as("jackknife_se"))
  }

  val q235Sql: String =
    """WITH lists AS (
      |  SELECT source,
      |         list_filter(string_split(trim(regexp_replace(lower(text), '(\d|\W)+', ' ', 'g')), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |per AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_s,
      |         CAST(sum(len(toks)) AS BIGINT) AS s_s
      |  FROM lists GROUP BY source),
      |tot AS (
      |  SELECT CAST(sum(n_s) AS BIGINT) AS N, CAST(sum(s_s) AS BIGINT) AS S
      |  FROM per),
      |d AS (
      |  SELECT t.N, t.S,
      |         CAST(round(1e9 * (t.S - p.s_s) / (t.N - p.n_s), 0)
      |              AS DECIMAL(38,0)) AS d
      |  FROM per p CROSS JOIN tot t WHERE t.N > p.n_s)
      |SELECT CAST(count(*) AS BIGINT) AS g,
      |       round(CAST(S AS DOUBLE) / N, 6) AS mean_tokens,
      |       round(sqrt(CAST(count(*) - 1 AS DOUBLE) *
      |                  CAST(count(*) * sum(d * d) - sum(d) * sum(d) AS DOUBLE))
      |             / count(*) / 1e9, 6) AS jackknife_se
      |FROM d GROUP BY N, S""".stripMargin

  // ---------------------------------------------------------------- q236
  /** Margin-based cross-lingual bitext mining (the Artetxe–Schwenk
    * ratio margin behind CCMatrix-style parallel-corpus mining): for
    * each source-language document, the best target-language candidate
    * scored not by raw cosine but by the MARGIN
    * `2k·cos(x,y) / (Σ_{z∈NNk(x)}cos + Σ_{w∈NNk(y)}cos)` — raw-cosine
    * mining keeps hub vectors that are near EVERYTHING; dividing by
    * both sides' neighborhood density is what makes mined pairs
    * translation-like rather than merely generic.
    *
    * Determinism: every cosine is micro-quantized to a long BEFORE the
    * k-way neighborhood sums (order-free exact folds — the reduce-order
    * double trap again); the margin is one final division over exact
    * integers, round-6. Sides come from `documents.lang` joined onto
    * the embeddings by id — de (source) mined against en (target).
    *
    * Shape: the pair stage is the brute-force baseline (q21's
    * contract — one |X|×|Y| scoring pass, computed ONCE and reused for
    * both neighborhood directions via localCheckpoint); windows are
    * per-query-keyed. At 100 TB the pair stage is replaced by the
    * q43-IVF / q232-PQ shortlist and the margin math is unchanged —
    * blocking changes candidates, not the scoring contract.
    */
  val BitextK = 4

  def q236BitextMargin(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val langs = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
    val e = Tables.embeddings(s, dir)
      .join(langs, col("vec_id") === col("doc_id"))
      .select(col("vec_id"), col("embedding"), col("lang"))
    val x = e.filter(col("lang") === "de")
      .select(col("vec_id").as("x_id"), col("embedding").as("xv"))
    val y = e.filter(col("lang") === "en")
      .select(col("vec_id").as("y_id"), col("embedding").as("yv"))
    val pairs = x.crossJoin(y)
      .select(col("x_id"), col("y_id"),
        round(lit(1e6) * graft.functions.VectorFunctions.dot(col("xv"), col("yv")), 0)
          .cast("long").as("cos_micro"))
      .localCheckpoint() // scored once; feeds both kNN directions + the argmax
    val wx = Window.partitionBy(col("x_id"))
      .orderBy(col("cos_micro").desc, col("y_id"))
    val sumX = pairs.withColumn("r", row_number().over(wx))
      .filter(col("r") <= BitextK)
      .groupBy(col("x_id")).agg(sum(col("cos_micro")).as("nx"))
    val wy = Window.partitionBy(col("y_id"))
      .orderBy(col("cos_micro").desc, col("x_id"))
    val sumY = pairs.withColumn("r", row_number().over(wy))
      .filter(col("r") <= BitextK)
      .groupBy(col("y_id")).agg(sum(col("cos_micro")).as("ny"))
    val scored = pairs.join(sumX, Seq("x_id")).join(sumY, Seq("y_id"))
      .filter(col("nx") + col("ny") > 0)
      .select(col("x_id"), col("y_id"), col("cos_micro"),
        round(lit(2.0 * BitextK) * col("cos_micro") /
          (col("nx") + col("ny")), 6).as("margin"))
    val wBest = Window.partitionBy(col("x_id"))
      .orderBy(col("margin").desc, col("y_id"))
    scored.withColumn("rk", row_number().over(wBest))
      .filter(col("rk") === 1)
      .select(col("x_id"), col("y_id"), col("cos_micro"), col("margin"))
      .orderBy(col("x_id"))
  }

  private def bitextDot(a: String, b: String): String = sqlDotList(a, b)

  val q236Sql: String =
    s"""WITH e AS (
       |  SELECT em.vec_id, em.embedding, d.lang
       |  FROM embeddings em JOIN documents d ON em.vec_id = d.doc_id),
       |x AS (SELECT vec_id AS x_id, embedding AS xv FROM e WHERE lang = 'de'),
       |y AS (SELECT vec_id AS y_id, embedding AS yv FROM e WHERE lang = 'en'),
       |pairs AS (
       |  SELECT x.x_id, y.y_id,
       |         CAST(round(1e6 * ${bitextDot("x.xv", "y.yv")}, 0) AS BIGINT)
       |           AS cos_micro
       |  FROM x CROSS JOIN y),
       |sumx AS (
       |  SELECT x_id, CAST(sum(cos_micro) AS BIGINT) AS nx FROM (
       |    SELECT x_id, cos_micro,
       |           row_number() OVER (PARTITION BY x_id
       |                              ORDER BY cos_micro DESC, y_id) AS r
       |    FROM pairs) AS t WHERE r <= $BitextK GROUP BY x_id),
       |sumy AS (
       |  SELECT y_id, CAST(sum(cos_micro) AS BIGINT) AS ny FROM (
       |    SELECT y_id, cos_micro,
       |           row_number() OVER (PARTITION BY y_id
       |                              ORDER BY cos_micro DESC, x_id) AS r
       |    FROM pairs) AS t WHERE r <= $BitextK GROUP BY y_id),
       |scored AS (
       |  SELECT p.x_id, p.y_id, p.cos_micro,
       |         round(${2.0 * BitextK} * p.cos_micro / (sx.nx + sy.ny), 6)
       |           AS margin
       |  FROM pairs p JOIN sumx sx USING (x_id) JOIN sumy sy USING (y_id)
       |  WHERE sx.nx + sy.ny > 0),
       |best AS (
       |  SELECT x_id, y_id, cos_micro, margin,
       |         row_number() OVER (PARTITION BY x_id
       |                            ORDER BY margin DESC, y_id) AS rk
       |  FROM scored)
       |SELECT x_id, y_id, cos_micro, margin FROM best WHERE rk = 1
       |ORDER BY x_id""".stripMargin

  // ---------------------------------------------------------------- q238
  /** q236's SCALE PATH as gated code, not prose: centroid-blocked
    * bitext mining. The |X|×|Y| pair stage is replaced by the q155
    * blocking — top-2 centroid probes per vector, candidates = (de,
    * en) pairs sharing a probed cluster — and the margin contract is
    * UNCHANGED, with neighborhoods computed over the candidate graph
    * (the standard practical approximation: at mining scale the exact
    * kNN is itself shortlist-derived). Blocking changes candidates,
    * never the scoring: the same micro-long cosines, the same exact
    * k-way sums, the same one round-6 division. The spec pins the
    * measured agreement with the exact q236 ranking and the strict
    * candidate reduction the blocking buys.
    *
    * Honest sf0.1 measurement: 2.7 s vs q236's 2.2 s — at this scale
    * the probe stage costs more than the (10-centroid, top-2) blocking
    * saves. The crossover is corpus size: the exact pair stage grows
    * |X|·|Y| while the blocked stage grows with candidate volume, and
    * a production coarse quantizer has thousands of cells, not 10
    * label means. The query exists to gate the blocked SHAPE, not to
    * win the small-corpus race.
    */
  def q238BitextBlocked(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val langs = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
    val e = Tables.embeddings(s, dir)
      .join(langs, col("vec_id") === col("doc_id"))
      .select(col("vec_id"), col("embedding"), col("lang"))
      .filter(col("lang").isin("de", "en"))
    val cent = AnnQueries.centroidArrays(s, dir)
    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("c_label").asc)
    val probes = e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("lang"), col("c_label"),
        round(graft.functions.VectorFunctions.dotD(
          col("embedding").cast("array<double>"), col("centroid")), 6)
          .as("ccos"))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= 2)
      .select(col("vec_id"), col("lang"), col("c_label").as("cluster"))
      .localCheckpoint()
    val candIds = probes.filter(col("lang") === "de")
      .select(col("vec_id").as("x_id"), col("cluster"))
      .join(probes.filter(col("lang") === "en")
        .select(col("vec_id").as("y_id"), col("cluster")), Seq("cluster"))
      .select(col("x_id"), col("y_id")).distinct()
    val vx = e.filter(col("lang") === "de")
      .select(col("vec_id").as("x_id"), col("embedding").as("xv"))
    val vy = e.filter(col("lang") === "en")
      .select(col("vec_id").as("y_id"), col("embedding").as("yv"))
    val pairs = candIds.join(vx, Seq("x_id")).join(vy, Seq("y_id"))
      .select(col("x_id"), col("y_id"),
        round(lit(1e6) * graft.functions.VectorFunctions.dot(col("xv"), col("yv")), 0)
          .cast("long").as("cos_micro"))
      .localCheckpoint()
    val wx = Window.partitionBy(col("x_id"))
      .orderBy(col("cos_micro").desc, col("y_id"))
    val sumX = pairs.withColumn("r", row_number().over(wx))
      .filter(col("r") <= BitextK)
      .groupBy(col("x_id")).agg(sum(col("cos_micro")).as("nx"))
    val wy = Window.partitionBy(col("y_id"))
      .orderBy(col("cos_micro").desc, col("x_id"))
    val sumY = pairs.withColumn("r", row_number().over(wy))
      .filter(col("r") <= BitextK)
      .groupBy(col("y_id")).agg(sum(col("cos_micro")).as("ny"))
    val scored = pairs.join(sumX, Seq("x_id")).join(sumY, Seq("y_id"))
      .filter(col("nx") + col("ny") > 0)
      .select(col("x_id"), col("y_id"), col("cos_micro"),
        round(lit(2.0 * BitextK) * col("cos_micro") /
          (col("nx") + col("ny")), 6).as("margin"))
    val wBest = Window.partitionBy(col("x_id"))
      .orderBy(col("margin").desc, col("y_id"))
    scored.withColumn("rk", row_number().over(wBest))
      .filter(col("rk") === 1)
      .select(col("x_id"), col("y_id"), col("cos_micro"), col("margin"))
      .orderBy(col("x_id"))
  }

  val q238Sql: String =
    s"""WITH dims AS (
       |  SELECT vec_id, label, j,
       |         CAST(embedding[CAST(j AS INTEGER) + 1] AS DOUBLE) AS v
       |  FROM embeddings, range(64) t(j)),
       |cent AS (
       |  SELECT label AS c_label, j, round(avg(v), 6) AS m
       |  FROM dims GROUP BY label, j),
       |side AS (
       |  SELECT em.vec_id, em.embedding, d.lang
       |  FROM embeddings em JOIN documents d ON em.vec_id = d.doc_id
       |  WHERE d.lang IN ('de', 'en')),
       |cdots AS (
       |  SELECT d2.vec_id, sd.lang, c.c_label,
       |         round(sum(d2.v * c.m), 6) AS ccos
       |  FROM dims d2 JOIN cent c USING (j)
       |  JOIN side sd ON sd.vec_id = d2.vec_id
       |  GROUP BY d2.vec_id, sd.lang, c.c_label),
       |probes AS (
       |  SELECT vec_id, lang, c_label AS cluster FROM (
       |    SELECT vec_id, lang, c_label,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY ccos DESC, c_label ASC) AS rk
       |    FROM cdots) AS t WHERE rk <= 2),
       |cand AS (
       |  SELECT DISTINCT px.vec_id AS x_id, py.vec_id AS y_id
       |  FROM probes px JOIN probes py ON px.cluster = py.cluster
       |  WHERE px.lang = 'de' AND py.lang = 'en'),
       |pairs AS (
       |  SELECT c.x_id, c.y_id,
       |         CAST(round(1e6 * ${bitextDot("ex.embedding", "ey.embedding")}, 0)
       |              AS BIGINT) AS cos_micro
       |  FROM cand c
       |  JOIN embeddings ex ON ex.vec_id = c.x_id
       |  JOIN embeddings ey ON ey.vec_id = c.y_id),
       |sumx AS (
       |  SELECT x_id, CAST(sum(cos_micro) AS BIGINT) AS nx FROM (
       |    SELECT x_id, cos_micro,
       |           row_number() OVER (PARTITION BY x_id
       |                              ORDER BY cos_micro DESC, y_id) AS r
       |    FROM pairs) AS t WHERE r <= $BitextK GROUP BY x_id),
       |sumy AS (
       |  SELECT y_id, CAST(sum(cos_micro) AS BIGINT) AS ny FROM (
       |    SELECT y_id, cos_micro,
       |           row_number() OVER (PARTITION BY y_id
       |                              ORDER BY cos_micro DESC, x_id) AS r
       |    FROM pairs) AS t WHERE r <= $BitextK GROUP BY y_id),
       |scored AS (
       |  SELECT p.x_id, p.y_id, p.cos_micro,
       |         round(${2.0 * BitextK} * p.cos_micro / (sx.nx + sy.ny), 6)
       |           AS margin
       |  FROM pairs p JOIN sumx sx USING (x_id) JOIN sumy sy USING (y_id)
       |  WHERE sx.nx + sy.ny > 0),
       |best AS (
       |  SELECT x_id, y_id, cos_micro, margin,
       |         row_number() OVER (PARTITION BY x_id
       |                            ORDER BY margin DESC, y_id) AS rk
       |  FROM scored)
       |SELECT x_id, y_id, cos_micro, margin FROM best WHERE rk = 1
       |ORDER BY x_id""".stripMargin

  // ---------------------------------------------------------------- q239
  /** Operating-point selection for a score-based filter: sweep every
    * observed threshold and emit the Youden-J-optimal and F1-optimal
    * cut — the decision step between q229's "how good is the score"
    * and actually deploying a quality filter. Predict-positive-if
    * score ≥ t; tp/fp at every t come from one descending cumulative
    * sum over the score-GROUP table (the same quantization-bounded
    * window class as q229 — allowlisted). The criterion keys are exact
    * integers (J's numerator tp·N − fp·P over the constant P·N; F1 as
    * 2tp over tp+fp+P); the argmax ranks their double ratios — the
    * same IEEE division of the same integers on both engines, so the
    * ordering is cross-engine deterministic even where two thresholds'
    * ratios collide within an ulp (the score tie-break then decides
    * identically).
    * Ties break toward the smaller threshold (the more permissive
    * filter), deterministically.
    */
  def q239ThresholdSelect(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(s, dir)
      .select(col("lang"), TextPrep.tokensCol(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("lang"),
        expr("1000000L * size(array_distinct(toks)) div size(toks)").as("score"))
    val groups = scored.groupBy(col("score"))
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("pos"),
        sum(when(col("lang") === "en", 0L).otherwise(1L)).as("neg"))
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = groups
      .withColumn("tp", sum(col("pos")).over(w))
      .withColumn("fp", sum(col("neg")).over(w))
      .crossJoin(broadcast(groups.agg(sum(col("pos")).as("p_tot"),
        sum(col("neg")).as("n_tot"))))
      .localCheckpoint() // one cumsum pass feeds both criterion argmaxes
    // exact-integer criteria: J ∝ tp·N − fp·P; F1 ranks by tp/(tp+fp+P)
    // ⇔ cross-multiplied tp_a·den_b > tp_b·den_a — monotone in tp/den,
    // so max_by(struct(...)) with the smaller-threshold tie-break works
    // on integer keys only
    val j = cum.select(lit("youden_j").as("criterion"), col("score"),
      col("tp"), col("fp"), col("p_tot"), col("n_tot"),
      (col("tp") * col("n_tot") - col("fp") * col("p_tot")).as("key_num"),
      (col("p_tot") * col("n_tot")).as("key_den"))
    val f = cum.select(lit("f1_max").as("criterion"), col("score"),
      col("tp"), col("fp"), col("p_tot"), col("n_tot"),
      (col("tp") * 2L).as("key_num"),
      (col("tp") + col("fp") + col("p_tot")).as("key_den"))
    j.unionByName(f)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("criterion"))
          .orderBy((col("key_num").cast("double") / col("key_den")).desc,
            col("score").asc)))
      .filter(col("rk") === 1)
      .select(col("criterion"), col("score").as("threshold"),
        col("tp"), col("fp"),
        round(col("key_num") / col("key_den"), 6).as("metric"))
      .orderBy(col("criterion"))
  }

  val q239Sql: String =
    """WITH lists AS (
      |  SELECT lang,
      |         list_filter(string_split(trim(regexp_replace(lower(text), '(\d|\W)+', ' ', 'g')), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |scored AS (
      |  SELECT lang,
      |         1000000 * len(list_distinct(toks)) // len(toks) AS score
      |  FROM lists WHERE len(toks) > 0),
      |grp AS (
      |  SELECT score,
      |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
      |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
      |  FROM scored GROUP BY score),
      |cum AS (
      |  SELECT score,
      |         sum(pos) OVER (ORDER BY score DESC
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
      |         sum(neg) OVER (ORDER BY score DESC
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
      |         (SELECT sum(pos) FROM grp) AS p_tot,
      |         (SELECT sum(neg) FROM grp) AS n_tot
      |  FROM grp),
      |crit AS (
      |  SELECT 'youden_j' AS criterion, score, tp, fp, p_tot, n_tot,
      |         tp * n_tot - fp * p_tot AS key_num, p_tot * n_tot AS key_den
      |  FROM cum
      |  UNION ALL
      |  SELECT 'f1_max', score, tp, fp, p_tot, n_tot,
      |         tp * 2, tp + fp + p_tot
      |  FROM cum),
      |best AS (
      |  SELECT criterion, score, tp, fp, key_num, key_den,
      |         row_number() OVER (PARTITION BY criterion
      |                            ORDER BY CAST(key_num AS DOUBLE) / key_den DESC,
      |                                     score ASC) AS rk
      |  FROM crit)
      |SELECT criterion, score AS threshold,
      |       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
      |       round(key_num / key_den, 6) AS metric
      |FROM best WHERE rk = 1 ORDER BY criterion""".stripMargin

  // ---------------------------------------------------------------- q240
  /** RM3-lite pseudo-relevance feedback: run BM25, mine expansion
    * terms from the top-10 feedback docs (highest feedback term
    * frequency, stopwords and original query excluded, term-asc tie
    * break), re-run BM25 with the expanded query — the two-stage
    * retrieval loop real search stacks run, gated end-to-end with the
    * expansion DERIVED inside the query on both engines (no baked-in
    * term list; the oracle re-derives the same expansion or the hash
    * fails). All counts integer; the only doubles are the shared BM25
    * formula's, identical to q226.
    *
    * Shape: stage 1 is q226 (broadcasts + top-k heap); the feedback
    * term mining is a 10-doc explode (broadcast-semi on the feedback
    * ids); stage 2 re-scores with a (|Q|+3)-term filter — the corpus
    * explode runs twice, which at lake scale both ride the q216
    * inverted index instead.
    */
  val Rm3Expansions = 3

  def q240Rm3Expansion(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextPrep.tokensCol(col("text")).as("toks"))
      .localCheckpoint() // tokenized once; feeds stage 1, mining, stage 2
    val dl = docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")) / count(lit(1))).as("avgdl"))
    val allTf = docs
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint() // per-(doc, term) counts shared by both stages
    def bm25For(terms: DataFrame): DataFrame = {
      val tf = allTf.join(broadcast(terms), Seq("term"), "left_semi")
      val dfTab = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      bm25Rank(tf, dl, dfTab, stats, Bm25TopK)
    }
    val q0 = s.createDataFrame(
      java.util.Arrays.asList(Bm25Query.map(org.apache.spark.sql.Row(_)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val feedback = bm25For(q0).select(col("doc_id"))
    val stop = TextPrep.DefaultStopwords ++ Bm25Query
    val expansions = allTf
      .join(broadcast(feedback), Seq("doc_id"), "left_semi")
      .filter(!col("term").isin(stop: _*))
      .groupBy(col("term")).agg(sum(col("tf")).as("fb_tf"))
      .orderBy(col("fb_tf").desc, col("term").asc)
      .limit(Rm3Expansions)
      .select(col("term"))
    bm25For(q0.unionByName(expansions))
  }

  val q240Sql: String = {
    val stopList = (TextPrep.DefaultStopwords ++ Bm25Query)
      .map(t => s"'$t'").mkString(", ")
    s"""WITH lists AS (
       |  SELECT doc_id,
       |         list_filter(string_split(trim(regexp_replace(lower(text), '(\\d|\\W)+', ' ', 'g')), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM lists),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 sum(dl) / count(*) AS avgdl FROM dl),
       |alltf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id, unnest(toks) AS term FROM lists) AS t
       |  GROUP BY doc_id, term),
       |tf1 AS (SELECT * FROM alltf WHERE term IN ($bm25TermList)),
       |df1 AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf1 GROUP BY term),
       |s1 AS (
       |  SELECT t.doc_id,
       |         round(sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
       |             (t.tf * (${Bm25K1} + 1.0)) /
       |             (t.tf + ${Bm25K1} *
       |              (1.0 - ${Bm25B} + ${Bm25B} * l.dl / s.avgdl))), 6) AS bm25
       |  FROM tf1 t JOIN df1 d USING (term) JOIN dl l USING (doc_id)
       |  CROSS JOIN stats s GROUP BY t.doc_id),
       |fb AS (SELECT doc_id FROM s1 ORDER BY bm25 DESC, doc_id LIMIT $Bm25TopK),
       |exp AS (
       |  SELECT term FROM alltf
       |  WHERE doc_id IN (SELECT doc_id FROM fb)
       |    AND term NOT IN ($stopList)
       |  GROUP BY term
       |  ORDER BY sum(tf) DESC, term ASC LIMIT $Rm3Expansions),
       |q2 AS (SELECT term FROM exp
       |       UNION ALL
       |       SELECT unnest([$bm25TermList]) AS term),
       |tf2 AS (SELECT a.* FROM alltf a WHERE a.term IN (SELECT term FROM q2)),
       |df2 AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf2 GROUP BY term),
       |s2 AS (
       |  SELECT t.doc_id,
       |         round(sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
       |             (t.tf * (${Bm25K1} + 1.0)) /
       |             (t.tf + ${Bm25K1} *
       |              (1.0 - ${Bm25B} + ${Bm25B} * l.dl / s.avgdl))), 6) AS bm25,
       |         CAST(count(*) AS BIGINT) AS n_terms_hit
       |  FROM tf2 t JOIN df2 d USING (term) JOIN dl l USING (doc_id)
       |  CROSS JOIN stats s GROUP BY t.doc_id)
       |SELECT doc_id, bm25, n_terms_hit FROM s2
       |ORDER BY bm25 DESC, doc_id LIMIT $Bm25TopK""".stripMargin
  }

  // ---------------------------------------------------------------- q241
  /** Ranking-quality evaluation of the q226 BM25 ranking: nDCG@10 with
    * graded relevance plus MRR — the metrics that close the retrieval
    * loop (q226 ranks, q240 expands, q241 says whether the ranking is
    * any good). Graded relevance is DERIVED in-query (query-term
    * occurrences capped at 7) so both engines grade identically with
    * no label side-channel. Per-position gains
    * (2^rel − 1)/log2(pos + 1) are nano-quantized to longs before the
    * 10-way sums (the order-free-fold rule); IDCG ranks the WHOLE
    * corpus by relevance (TakeOrderedAndProject, grade-then-id
    * tie-break) so nDCG is against the true ideal, not the retrieved
    * subset's. MRR: reciprocal rank of the first doc with rel ≥ 2,
    * 0 when none.
    */
  def q241RankingEval(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextPrep.tokensCol(col("text")).as("toks"))
    // graded relevance: query-term OCCURRENCES capped at 7 (distinct-term
    // grading saturates on this dense corpus — every top doc holds all
    // |Q| terms and nDCG degenerates to 1.0; occurrence grading makes the
    // ideal differ from the length-normalized BM25 order, so the metric
    // actually discriminates)
    val rel = docs.select(col("doc_id"),
      least(lit(7L), size(filter(col("toks"),
        t => t.isin(Bm25Query: _*))).cast("long")).as("rel"))
      .localCheckpoint() // grades feed the ranking join AND the ideal
    val ranked = q226Bm25(s, dir)
      .withColumn("pos",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
          .cast("long"))
      .join(rel, Seq("doc_id"))
      .select(col("pos"), col("rel"),
        expr("CAST(round(1e9 * (pow(2.0, rel) - 1.0) / log2(pos + 1), 0) AS BIGINT)")
          .as("gain_nano"))
    val ideal = rel
      .orderBy(col("rel").desc, col("doc_id"))
      .limit(Bm25TopK)
      .withColumn("pos",
        row_number().over(Window.orderBy(col("rel").desc, col("doc_id")))
          .cast("long"))
      .select(expr("CAST(round(1e9 * (pow(2.0, rel) - 1.0) / log2(pos + 1), 0) AS BIGINT)")
        .as("gain_nano"))
    val dcg = ranked.agg(sum(col("gain_nano")).as("dcg_nano"))
    val idcg = ideal.agg(sum(col("gain_nano")).as("idcg_nano"))
    val mrr = ranked.filter(col("rel") >= 2)
      .agg(coalesce(round(lit(1.0) / min(col("pos")), 6), lit(0.0)).as("mrr"))
    dcg.crossJoin(idcg).crossJoin(mrr)
      .select(col("dcg_nano"), col("idcg_nano"),
        round(col("dcg_nano") / nullif(col("idcg_nano").cast("double"), lit(0.0)), 6)
          .as("ndcg"),
        col("mrr"))
  }

  private val bm25QueryArr =
    Bm25Query.map(t => s"'$t'").mkString("[", ", ", "]")

  val q241Sql: String =
    s"""WITH lists AS (
       |  SELECT doc_id,
       |         list_filter(string_split(trim(regexp_replace(lower(text), '(\\d|\\W)+', ' ', 'g')), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |rel AS (
       |  SELECT doc_id,
       |         LEAST(7, CAST(len(list_filter(toks,
       |               x -> list_contains($bm25QueryArr, x))) AS BIGINT)) AS rel
       |  FROM lists),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM lists),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 sum(dl) / count(*) AS avgdl FROM dl),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(toks) AS term FROM lists) AS t
       |  WHERE term IN ($bm25TermList)
       |  GROUP BY doc_id, term),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT t.doc_id,
       |         round(sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
       |             (t.tf * (${Bm25K1} + 1.0)) /
       |             (t.tf + ${Bm25K1} *
       |              (1.0 - ${Bm25B} + ${Bm25B} * l.dl / s.avgdl))), 6) AS bm25
       |  FROM tf t JOIN dfreq d USING (term) JOIN dl l USING (doc_id)
       |  CROSS JOIN stats s GROUP BY t.doc_id),
       |ranked AS (
       |  SELECT r.rel,
       |         row_number() OVER (ORDER BY s.bm25 DESC, s.doc_id) AS pos
       |  FROM (SELECT * FROM scored ORDER BY bm25 DESC, doc_id
       |        LIMIT $Bm25TopK) AS s
       |  JOIN rel r USING (doc_id)),
       |rgain AS (
       |  SELECT CAST(round(1e9 * (pow(2.0, rel) - 1.0) / log2(pos + 1), 0)
       |              AS BIGINT) AS gain_nano, rel, pos
       |  FROM ranked),
       |igain AS (
       |  SELECT CAST(round(1e9 * (pow(2.0, rel) - 1.0) / log2(pos + 1), 0)
       |              AS BIGINT) AS gain_nano
       |  FROM (
       |    SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS pos
       |    FROM (SELECT * FROM rel ORDER BY rel DESC, doc_id
       |          LIMIT $Bm25TopK) AS i) AS t)
       |SELECT (SELECT CAST(sum(gain_nano) AS BIGINT) FROM rgain) AS dcg_nano,
       |       (SELECT CAST(sum(gain_nano) AS BIGINT) FROM igain) AS idcg_nano,
       |       round((SELECT sum(gain_nano) FROM rgain)
       |             / nullif(CAST((SELECT sum(gain_nano) FROM igain) AS DOUBLE),
       |                      0.0), 6) AS ndcg,
       |       COALESCE(round(1.0 / (SELECT min(pos) FROM rgain WHERE rel >= 2), 6),
       |                0.0) AS mrr""".stripMargin

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q231_image_dhash_dedup" -> (q231ImageDhashDedup _),
    "q234_sql_dhash" -> (q234SqlDhash _),
    "q235_jackknife" -> (q235Jackknife _),
    "q236_bitext_margin" -> (q236BitextMargin _),
    "q238_bitext_blocked" -> (q238BitextBlocked _),
    "q239_threshold_select" -> (q239ThresholdSelect _),
    "q240_rm3_expansion" -> (q240Rm3Expansion _),
    "q241_ranking_eval" -> (q241RankingEval _),
    "q226_bm25" -> (q226Bm25 _),
    "q227_rouge2" -> (q227Rouge2 _),
    "q228_mmr" -> (q228Mmr _),
    "q229_roc_auc" -> (q229RocAuc _),
    "q230_calibration_bins" -> (q230CalibrationBins _))

  val oracles: Map[String, String] = Map(
    "q231_image_dhash_dedup" -> q231Sql,
    "q234_sql_dhash" -> q231Sql,
    "q235_jackknife" -> q235Sql,
    "q236_bitext_margin" -> q236Sql,
    "q238_bitext_blocked" -> q238Sql,
    "q239_threshold_select" -> q239Sql,
    "q240_rm3_expansion" -> q240Sql,
    "q241_ranking_eval" -> q241Sql,
    "q226_bm25" -> q226Sql,
    "q227_rouge2" -> q227Sql,
    "q228_mmr" -> q228Sql,
    "q229_roc_auc" -> q229Sql,
    "q230_calibration_bins" -> q230Sql)
}
