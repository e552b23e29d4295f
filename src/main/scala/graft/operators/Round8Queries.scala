package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 additions (driver round 4, batch 5): exact-substring
  * duplicate spans, a distributed embedding Gram matrix through a typed
  * Aggregator, contrastive hard-negative mining, tokenizer fertility,
  * balanced shard planning, and video frame-sampling plumbing.
  *
  * Same contract as every gated family: floating-point expressions use
  * the SAME form on both engines and are quantized to integer units
  * BEFORE any aggregation, so every sum the gate hashes is an integer
  * sum — bit-identical under any partitioning.
  */
object Round8Queries {

  // ---------------------------------------------------------------- q153
  /** Exact-substring duplicate spans — the character-level dedup pass of
    * "Deduplicating Training Data Makes Language Models Better" (Lee et
    * al., 2022), re-expressed relationally: a position in a document is
    * DUPLICATED when the L-char substring starting there occurs at least
    * twice in the corpus; overlapping duplicated positions merge into
    * SPANS (the text a scrubber would actually cut). The suffix-array
    * construction the paper uses is replaced by the shuffle-native
    * equivalent: overlapping L-grams + a count(*) >= 2 dup set + an
    * islands merge — each stage a keyed aggregate/join that partitions
    * cleanly at 100 TB (the paper's single-machine suffix array does
    * not).
    *
    * Plan shape: positions explode FIRST and the gram is a native
    * `substring` projection AFTER the Generate — fully codegen'd, no
    * higher-order lambda anywhere (the q138 lesson; a
    * transform-then-posexplode form paid ~2× on interpreted lambda
    * evals). Dup membership is ONE gram-keyed exchange: a count window
    * over g, so the gram table is computed once (the agg + semi-join
    * alternative recomputes the explode and shuffles the grams twice —
    * measured 30% slower warm). Then one per-doc window merges islands
    * (intervals [pos, pos+L-1] merge while the gap to the previous
    * matched position is <= L). At 100 TB the gram key becomes a 64-bit
    * rolling hash (20 raw bytes here keep the oracle comparable), and
    * under extreme gram skew the dup set falls back to the AQE-salted
    * groupBy + semi-join shape — same semantics, skew-split exchange.
    * Docs shorter than L chars drop from both engines identically (none
    * in testdata — the guard is the ANSI empty-`sequence` rule).
    */
  val SubstrL = 20

  def q153ExactSubstrSpans(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(s, dir)
      .filter(col("n_chars") >= SubstrL)
      .select(col("doc_id"), col("text"), explode(expr(
        s"sequence(1, cast(n_chars - $SubstrL + 1 as int))")).as("pos"))
      .select(col("doc_id"), col("pos"),
        expr(s"substring(text, pos, $SubstrL)").as("g"))
    val matched = grams
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("c") >= 2)
      .select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    matched
      .withColumn("is_new",
        when(col("pos") - lag(col("pos"), 1).over(w) <= SubstrL, 0L)
          .otherwise(1L))
      .withColumn("span_id", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(count(lit(1)).as("n_pos"),
        (max(col("pos")) - min(col("pos")) + SubstrL).cast("long")
          .as("covered"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_pos")).as("n_dup_positions"),
        count(lit(1)).as("n_spans"),
        sum(col("covered")).as("covered_chars"))
      .orderBy(col("doc_id"))
  }

  val q153Sql: String =
    s"""WITH grams AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos, substr(text, CAST(i AS INT), $SubstrL) AS g
       |  FROM documents, unnest(range(1, CAST(n_chars AS INT) - $SubstrL + 2)) AS t(i)
       |  WHERE n_chars >= $SubstrL),
       |dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
       |matched AS (SELECT doc_id, pos FROM grams SEMI JOIN dup USING (g)),
       |flagged AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |              <= $SubstrL THEN 0 ELSE 1 END AS is_new
       |  FROM matched),
       |spans AS (
       |  SELECT doc_id, pos,
       |    sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
       |                      ROWS UNBOUNDED PRECEDING) AS span_id
       |  FROM flagged),
       |per_span AS (
       |  SELECT doc_id, span_id, count(*) AS n_pos,
       |    max(pos) - min(pos) + $SubstrL AS covered
       |  FROM spans GROUP BY 1, 2)
       |SELECT doc_id, CAST(sum(n_pos) AS BIGINT) AS n_dup_positions,
       |  CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(sum(covered) AS BIGINT) AS covered_chars
       |FROM per_span GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q154
  /** Corpus covariance/Gram matrix over the embedding column — the
    * moment computation under PCA, whitening, and Mahalanobis outlier
    * scoring (the matrix-valued sibling of q106's per-dim z-score
    * moments). The engine folds each row's 64×65/2 outer-product terms
    * into ONE flat long buffer inside the map-side partial aggregate
    * ([[graft.functions.GramMatrixAgg]]) — the exchange carries a
    * ~16 KiB buffer per partition, a map-only scan plus constant-size
    * merge at 100 TB — where the relational route (the oracle) unnests
    * to corpus×64 rows and self-joins to corpus×2080 before its first
    * aggregate. Output is the exact integer numerator
    * n·Σxy − Σx·Σy = n²·cov over micro-quantized coordinates (q141's
    * proven `round(1e6·x)` form); no doubles anywhere, overflow guarded
    * loudly in `finish`.
    */
  val GramDim = 64

  def q154EmbeddingCovariance(s: SparkSession, dir: String): DataFrame = {
    val gram = udaf(new graft.functions.GramMatrixAgg(GramDim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    Tables.embeddings(s, dir)
      .agg(gram(col("embedding")).as("cells"))
      .select(explode(col("cells")).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"),
        col("c.cov_num").as("cov_num"))
      .orderBy(col("i"), col("j"))
  }

  val q154Sql: String =
    """WITH e AS (
      |  SELECT vec_id, unnest(embedding) AS x,
      |         generate_subscripts(embedding, 1) - 1 AS i
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, i, CAST(round(1e6 * x) AS BIGINT) AS q FROM e),
      |n AS (SELECT count(*) AS n FROM embeddings),
      |s AS (SELECT i, CAST(sum(q) AS BIGINT) AS sx FROM q GROUP BY i),
      |p AS (
      |  SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS sxy
      |  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY 1, 2)
      |SELECT CAST(p.i AS INTEGER) AS i, CAST(p.j AS INTEGER) AS j,
      |  CAST(n.n * p.sxy - sa.sx * sb.sx AS BIGINT) AS cov_num
      |FROM p CROSS JOIN n
      |JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j
      |ORDER BY i, j""".stripMargin

  // ---------------------------------------------------------------- q155
  /** Contrastive hard-negative mining — for every embedding, the most
    * similar embedding carrying a DIFFERENT label (the negatives a
    * contrastive or metric-learning trainer pairs with each anchor;
    * random negatives are too easy, so the miner looks for the
    * nearest wrong-label neighbor). Similarity is the exact integer dot
    * of micro-quantized vectors through the codegen
    * [[graft.functions.IntDotProduct]] kernel — no doubles, no cosine
    * division, so the argmax is hash-exact with zero rounding rules;
    * the argmax itself is the q49 partial-agg struct-max (tie → smaller
    * neighbor id via the negated-id field), never a window over the
    * pair table. The O(n²) candidate generation is the brute-force
    * BASELINE (the same contract as q21); at 100 TB the pair stage
    * swaps for the q102 cluster blocking or q20 LSH candidates with the
    * scoring and argmax stages unchanged.
    */
  def q155HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val q = Tables.embeddings(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> cast(round(1e6 * x) as int))").as("qv"))
    val a = q.select(col("vec_id"), col("label"), col("qv").as("qa"))
    val b = q.select(col("vec_id").as("neg_id"), col("label").as("neg_label"),
      col("qv").as("qb"))
    a.join(b, col("label") =!= col("neg_label"))
      .withColumn("dp", org.apache.spark.sql.GraftSqlApi.column(
        graft.functions.IntDotProduct(
          org.apache.spark.sql.GraftSqlApi.expr(col("qa")),
          org.apache.spark.sql.GraftSqlApi.expr(col("qb")))))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(struct(col("dp"), (-col("neg_id")).as("nneg"),
        col("neg_label").as("nl"))).as("m"))
      .select(col("vec_id"), col("label"),
        (-col("m.nneg")).cast("long").as("neg_id"),
        col("m.nl").as("neg_label"), col("m.dp").as("dp"))
      .orderBy(col("vec_id"))
  }

  val q155Sql: String =
    """WITH q AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(round(1e6 * x) AS BIGINT)) AS qv
      |  FROM embeddings),
      |d AS (
      |  SELECT vec_id, label, unnest(qv) AS v,
      |         generate_subscripts(qv, 1) AS j
      |  FROM q),
      |dots AS (
      |  SELECT a.vec_id AS vec_id, a.label AS label, b.vec_id AS neg_id,
      |         b.label AS neg_label, CAST(sum(a.v * b.v) AS BIGINT) AS dp
      |  FROM d a JOIN d b ON a.j = b.j AND a.label <> b.label
      |  GROUP BY 1, 2, 3, 4),
      |best AS (
      |  SELECT vec_id, label, neg_id, neg_label, dp,
      |         row_number() OVER (PARTITION BY vec_id
      |                            ORDER BY dp DESC, neg_id ASC) AS rk
      |  FROM dots)
      |SELECT vec_id, label, neg_id, neg_label, dp
      |FROM best WHERE rk = 1 ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q157
  /** Balanced output-shard planning — assign documents to N shards with
    * near-equal total bytes (the write-side layout primitive: training
    * shards, tar files, webdataset chunks all want byte balance, and
    * naive hash assignment leaves the largest shard dominated by
    * whatever big docs it drew). Deterministic serpentine
    * (boustrophedon) assignment: rank docs by size desc (doc_id
    * tie-break), walk shards 0..N−1 then N−1..0 — each N-sized block
    * contributes one doc per shard, with the zig-zag cancelling the
    * within-block size gradient that plain round-robin accumulates.
    * The plan stage is rank arithmetic, no data moves; the global
    * row_number here rides one sort (at 100 TB the rank comes from a
    * range-partitioned sort + per-partition offsets — the q124
    * metadata-plan caveat; the ASSIGNMENT arithmetic is unchanged).
    * Gate output is the per-shard manifest; the spec asserts the
    * balance property itself.
    */
  val NumShards = 8

  def q157ShardPlan(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("n_chars").desc, col("doc_id"))))
      .withColumn("shard", expr(
        s"""cast(case when ((rn - 1) div $NumShards) % 2 = 0
           |          then (rn - 1) % $NumShards
           |          else $NumShards - 1 - (rn - 1) % $NumShards end
           |     as int)""".stripMargin))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("shard_chars"))
      .orderBy(col("shard"))

  val q157Sql: String =
    s"""WITH ranked AS (
       |  SELECT doc_id, n_chars,
       |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
       |  FROM documents),
       |assigned AS (
       |  SELECT doc_id, n_chars,
       |    CAST(CASE WHEN ((rn - 1) // $NumShards) % 2 = 0
       |              THEN (rn - 1) % $NumShards
       |              ELSE $NumShards - 1 - (rn - 1) % $NumShards END
       |         AS INTEGER) AS shard
       |  FROM ranked)
       |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS shard_chars
       |FROM assigned GROUP BY shard ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------- q158
  /** Video frame-sampling plumbing — the third modality's extract step
    * (images decode in q45, audio in q132; actual video CODECS are not
    * in this container, so the decode stays behind the documented
    * [[graft.multimodal.Multimodal]] stub): for every synthetic video
    * asset, derive the frame count from the container metadata
    * (30 fps nominal), select every 30th frame (1 Hz sampling — the
    * standard cheap keyframe grid for vision-model pretraining), and
    * emit one row per sampled frame with its exact integer-µs timestamp
    * and a deterministic frame reference (md5 of content-hash + frame
    * index — the handle a real decoder would replace with pixels). The
    * whole pass is a row-local sequence explode over the asset table —
    * map-only, no shuffle before the output sort; at 100 TB frame
    * EXTRACTION parallelizes per asset while frame BYTES stay out of
    * the exchange (only references move, the q152 hashes-not-content
    * rule).
    */
  val Fps = 30
  val SampleEvery = 30

  def q158VideoFrameSample(s: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.metadataExpr(
        graft.multimodal.Multimodal.synthesizeAssets(Tables.documents(s, dir)))
      .filter(col("kind") === "video")
      .withColumn("n_frames", expr(s"(duration_ms * $Fps) div 1000"))
      .select(col("asset_id"), col("content_hash"),
        explode(expr(s"sequence(0, cast(n_frames as int) - 1, $SampleEvery)"))
          .as("frame_idx"))
      .select(col("asset_id"), col("frame_idx"),
        expr(s"(cast(frame_idx as bigint) * 1000000) div $Fps").as("ts_us"),
        md5(concat(col("content_hash"), lit(":"),
          col("frame_idx").cast("string")).cast("binary")).as("frame_ref"))
      .orderBy(col("asset_id"), col("frame_idx"))

  val q158Sql: String =
    s"""WITH v AS (
       |  SELECT doc_id AS asset_id, md5(text) AS content_hash,
       |         CAST(n_chars * 10 AS BIGINT) AS duration_ms
       |  FROM documents WHERE doc_id % 3 = 2),
       |f AS (
       |  SELECT asset_id, content_hash,
       |    unnest(range(0, (duration_ms * $Fps) // 1000, $SampleEvery)) AS frame_idx
       |  FROM v)
       |SELECT asset_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       |  CAST((frame_idx * 1000000) // $Fps AS BIGINT) AS ts_us,
       |  md5(content_hash || ':' || CAST(frame_idx AS VARCHAR)) AS frame_ref
       |FROM f ORDER BY asset_id, frame_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_exact_substr_spans" -> (q153ExactSubstrSpans _),
    "q154_embedding_covariance" -> (q154EmbeddingCovariance _),
    "q155_hard_negatives" -> (q155HardNegatives _),
    "q157_shard_plan" -> (q157ShardPlan _),
    "q158_video_frame_sample" -> (q158VideoFrameSample _))

  val oracles: Map[String, String] = Map(
    "q153_exact_substr_spans" -> q153Sql,
    "q154_embedding_covariance" -> q154Sql,
    "q155_hard_negatives" -> q155Sql,
    "q157_shard_plan" -> q157Sql,
    "q158_video_frame_sample" -> q158Sql)
}
