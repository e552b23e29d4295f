package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing query: synthesize binary media assets from
  * `documents` (16-byte header + text bytes), then recover typed
  * metadata by parsing the binary column in-engine. The oracle
  * recomputes the expected values directly from `documents` — so the
  * query proves the binary round-trip (hex/unhex/substring over
  * BinaryType) produces exactly the declared metadata.
  */
object MultimodalQueries {

  def q40MediaMetadata(s: SparkSession, dir: String): DataFrame =
    Multimodal.metadataExpr(
        Multimodal.synthesizeAssets(Tables.documents(s, dir)))
      .orderBy(col("asset_id"))

  val q40Sql: String =
    """SELECT doc_id AS asset_id,
      |  ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
      |  CAST(16 + octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  CAST(doc_id % 1920 + 1 AS INTEGER) AS width,
      |  CAST(doc_id % 1080 + 1 AS INTEGER) AS height,
      |  CAST(n_chars * 10 AS BIGINT) AS duration_ms,
      |  CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
      |  md5(text) AS content_hash
      |FROM documents ORDER BY asset_id""".stripMargin

  /** q41: the DECODER path (typed mapPartitions, [[Multimodal.featurize]])
    * driver-verified — q40 gates only the expression path. Per-kind
    * rollup of the decoded features; the oracle recomputes every value
    * from `documents` arithmetic, so a decoder that misparses the
    * header, drops rows, or double-runs a partition hash-mismatches.
    * (content_hash is excluded: its input spans raw header bytes, which
    * DuckDB's VARCHAR-only md5 cannot ingest.)
    */
  def q41MediaFeatureRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Multimodal.synthesizeAssets(Tables.documents(s, dir))
      .as[Multimodal.MediaAsset]
    Multimodal.featurize(assets).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("byte_len")).as("total_bytes"),
        round(avg(col("duration_ms")), 6).as("avg_duration_ms"),
        max(col("width")).as("max_width"),
        max(col("channels")).as("max_channels"))
      .orderBy(col("kind"))
  }

  val q41Sql: String =
    """WITH feat AS (
      |  SELECT ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
      |    CAST(16 + octet_length(encode(text)) AS BIGINT) AS byte_len,
      |    CAST(n_chars * 10 AS BIGINT) AS duration_ms,
      |    CAST(doc_id % 1920 + 1 AS INTEGER) AS width,
      |    CAST(doc_id % 2 + 1 AS INTEGER) AS channels
      |  FROM documents)
      |SELECT kind, count(*) AS n_assets,
      |  CAST(sum(byte_len) AS BIGINT) AS total_bytes,
      |  round(avg(duration_ms), 6) AS avg_duration_ms,
      |  max(width) AS max_width,
      |  max(channels) AS max_channels
      |FROM feat GROUP BY kind ORDER BY kind""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_media_metadata" -> (q40MediaMetadata _),
    "q41_media_feature_rollup" -> (q41MediaFeatureRollup _))

  val oracles: Map[String, String] = Map(
    "q40_media_metadata" -> q40Sql,
    "q41_media_feature_rollup" -> q41Sql)
}
