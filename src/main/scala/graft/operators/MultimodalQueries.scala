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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_media_metadata" -> (q40MediaMetadata _))

  val oracles: Map[String, String] = Map(
    "q40_media_metadata" -> q40Sql)
}
