package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.tfidf.TfIdf

/** Deduplication queries over `documents`, each with a DuckDB oracle.
  * Parameters (k=12 minhash permutations, 3 bands × 4 rows, shingle
  * sizes) are shared constants between the Spark plans and the generated
  * oracle SQL.
  */
object DedupQueries {

  val K = 12
  val Bands = 3
  val RowsPerBand = 4

  /** Unfiltered distinct unigram token sets (dedup compares full text). */
  private def tokCte: String =
    """utoks AS (
      |  SELECT doc_id AS id,
      |         unnest(string_split(trim(regexp_replace(lower(text), '(\d|\W)+', ' ', 'g')), ' ')) AS word
      |  FROM documents),
      |tok AS (SELECT DISTINCT id, word FROM utoks WHERE word <> '')""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Exact dedup: doc → minimum doc_id sharing identical text. */
  def q14DedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.canonicalIds(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("id"))
      .withColumnRenamed("id", "doc_id")

  val q14Sql: String =
    """SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q15
  /** MinHash signatures (k=12) over unigram token sets. */
  def q15Minhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashSig(
        Dedup.tokenSets(Tables.documents(s, dir), "doc_id", "text"), K)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  val q15Sql: String = {
    val mins = (0 until K).map(j =>
      f"min(md5('$j%d|' || word)) AS mh$j%02d").mkString(",\n  ")
    s"""WITH $tokCte
       |SELECT id AS doc_id,
       |  $mins
       |FROM tok GROUP BY id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q16
  /** MinHash LSH near-dup pipeline: band → bucket → candidate pairs →
    * exact Jaccard verification on candidates only, thresholded.
    */
  val LshJaccardThreshold = 0.7

  def q16LshNearDups(s: SparkSession, dir: String): DataFrame = {
    val toks = Dedup.tokenSets(Tables.documents(s, dir), "doc_id", "text")
    val sig = Dedup.minhashSig(toks, K)
    val cands = Dedup.lshCandidates(sig, Bands, RowsPerBand)
    Dedup.jaccardOnCandidates(toks, cands)
      .withColumn("jaccard", round(col("jaccard"), 6))
      .filter(col("jaccard") >= LshJaccardThreshold)
      .orderBy(col("a"), col("b"))
  }

  val q16Sql: String = {
    val mins = (0 until K).map(j =>
      f"min(md5('$j%d|' || word)) AS mh$j%02d").mkString(",\n    ")
    val bandSelects = (0 until Bands).map { b =>
      val cat = (b * RowsPerBand until (b + 1) * RowsPerBand)
        .map(j => f"mh$j%02d").mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5($cat) AS bsig FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""WITH $tokCte,
       |sigs AS (
       |  SELECT id,
       |    $mins
       |  FROM tok GROUP BY id),
       |bandtbl AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT x.id AS a, y.id AS b
       |  FROM bandtbl x JOIN bandtbl y ON x.band = y.band AND x.bsig = y.bsig AND x.id < y.id),
       |sizes AS (SELECT id, count(*) AS sz FROM tok GROUP BY id),
       |shared AS (
       |  SELECT c.a, c.b, count(*) AS shared
       |  FROM cand c
       |  JOIN tok ta ON ta.id = c.a
       |  JOIN tok tb ON tb.id = c.b AND tb.word = ta.word
       |  GROUP BY c.a, c.b),
       |jac AS (
       |  SELECT c.a, c.b,
       |    round(CAST(COALESCE(s.shared, 0) AS DOUBLE) /
       |          CAST(za.sz + zb.sz - COALESCE(s.shared, 0) AS DOUBLE), 6) AS jaccard
       |  FROM cand c
       |  LEFT JOIN shared s ON s.a = c.a AND s.b = c.b
       |  JOIN sizes za ON za.id = c.a
       |  JOIN sizes zb ON zb.id = c.b)
       |SELECT a, b, jaccard FROM jac WHERE jaccard >= $LshJaccardThreshold ORDER BY a, b""".stripMargin
  }

  // ---------------------------------------------------------------- q17
  /** Exact all-pairs n-gram Jaccard (word 2-gram shingles), thresholded —
    * the brute-force spec the LSH path approximates.
    */
  val ShingleN = 2
  val JaccardThreshold = 0.1

  def q17ShingleJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingleSets(Tables.documents(s, dir), "doc_id", "text", ShingleN)
    Dedup.allPairsJaccard(sh, JaccardThreshold, elemCol = "shingle")
      .withColumn("jaccard", round(col("jaccard"), 6))
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy(col("a"), col("b"))
  }

  val q17Sql: String =
    s"""WITH lists AS (
       |  SELECT doc_id AS id,
       |         list_filter(string_split(trim(regexp_replace(lower(text), '(\\d|\\W)+', ' ', 'g')), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT id, shingle FROM (
       |    SELECT id, unnest(list_transform(range(1, len(toks) - ${ShingleN - 2}),
       |                      i -> array_to_string(toks[i:i+${ShingleN - 1}], ' '))) AS shingle
       |    FROM lists)),
       |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
       |shared AS (
       |  SELECT a.id AS a, b.id AS b, count(*) AS shared
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
       |  GROUP BY a.id, b.id),
       |jac AS (
       |  SELECT s.a, s.b,
       |    round(CAST(s.shared AS DOUBLE) / CAST(za.sz + zb.sz - s.shared AS DOUBLE), 6) AS jaccard
       |  FROM shared s JOIN sizes za ON za.id = s.a JOIN sizes zb ON zb.id = s.b)
       |SELECT a, b, jaccard FROM jac WHERE jaccard >= $JaccardThreshold ORDER BY a, b""".stripMargin

  // ---------------------------------------------------------------- q18
  /** 16-bit SimHash per document (tf-weighted md5-nibble bits). */
  def q18Simhash(s: SparkSession, dir: String): DataFrame = {
    val tf = TfIdf.termFreq(
      TfIdf.tokens(Tables.documents(s, dir), "doc_id", "text", stopwords = Nil))
    Dedup.simhash16(tf).orderBy(col("doc_id"))
  }

  val q18Sql: String = {
    val high = "('8','9','a','b','c','d','e','f')"
    val bitSums = (0 until 16).map(i =>
      s"sum(CASE WHEN substr(md5(word), ${i + 1}, 1) IN $high THEN tf ELSE -tf END) AS b$i")
      .mkString(",\n    ")
    val value = (0 until 16).map(i =>
      s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
    s"""WITH $tokCte,
       |tf AS (SELECT id, word, count(*) AS tf FROM utoks WHERE word <> '' GROUP BY id, word),
       |sums AS (
       |  SELECT id,
       |    $bitSums
       |  FROM tf GROUP BY id)
       |SELECT id AS doc_id, CAST($value AS BIGINT) AS simhash16
       |FROM sums ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_dedup_exact" -> (q14DedupExact _),
    "q15_minhash" -> (q15Minhash _),
    "q16_lsh_near_dups" -> (q16LshNearDups _),
    "q17_shingle_jaccard" -> (q17ShingleJaccard _),
    "q18_simhash" -> (q18Simhash _),
  )

  val oracles: Map[String, String] = Map(
    "q14_dedup_exact" -> q14Sql,
    "q15_minhash" -> q15Sql,
    "q16_lsh_near_dups" -> q16Sql,
    "q17_shingle_jaccard" -> q17Sql,
    "q18_simhash" -> q18Sql,
  )
}
