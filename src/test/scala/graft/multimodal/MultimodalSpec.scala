package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val assets =
    Multimodal.synthesizeAssets(graft.Tables.documents(spark, sf001))

  test("synthesized assets carry a parseable binary payload") {
    val r = assets.limit(5).collect()
    r.foreach { row =>
      val payload = row.getAs[Array[Byte]]("payload")
      assert(payload.length > 16)
      val (w, h, dur, ch) = Multimodal.FakeDecoder.decode(
        row.getAs[String]("kind"), payload)
      assert(w >= 1 && w <= 1920 && h >= 1 && h <= 1080)
      assert(dur > 0 && (ch == 1 || ch == 2))
    }
  }

  test("mapPartitions featurize path agrees with the expression path") {
    val viaExpr = Multimodal.metadataExpr(assets)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getLong(5), r.getInt(6))))
      .toMap
    val viaMp = Multimodal.featurize(assets.as[Multimodal.MediaAsset])
      .collect().map(f => f.asset_id ->
        ((f.kind, f.byte_len, f.width, f.height, f.duration_ms, f.channels)))
      .toMap
    assert(viaMp.size === 500)
    assert(viaMp === viaExpr)
  }

  test("featurize drops the blob: output rows are shuffle-safe") {
    val out = Multimodal.featurize(assets.as[Multimodal.MediaAsset])
    assert(!out.schema.fieldNames.contains("payload"))
    // and the features aggregate cleanly post-extraction
    val agg = out.groupBy($"kind").agg(count(lit(1)).as("n"), sum($"byte_len").as("bytes"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg.values.sum === 500)
    assert(agg.keySet === Set("image", "audio", "video"))
  }

  test("partition batching: decoder sees each row exactly once across partitions") {
    val repart = assets.repartition(7).as[Multimodal.MediaAsset]
    val n = Multimodal.featurize(repart).select($"asset_id").distinct().count()
    assert(n === 500)
  }
}
