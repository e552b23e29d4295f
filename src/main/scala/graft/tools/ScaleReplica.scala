package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-replica generator for the empirical scale study (SCALE.md).
  *
  * The gate data tops out at sf0.1; the 100 TB arguments in SCALE.md were
  * analytical only. This main manufactures a k× replica of an sf dir so the
  * slowest operator families can be MEASURED at 1×/3×/10× and their observed
  * scaling exponents compared against the documented O() claims.
  *
  * Replica design (deliberate, documented here because it shapes what the
  * measurement means):
  *  - Replica 0 is the RAW table, byte-identical — so the 1× run of the
  *    study is exactly the committed bench corpus and the curve is anchored
  *    at the known numbers.
  *  - Replica i>0 offsets every id column by i·(max+1), keeping doc_id
  *    contiguity (q44's chain graph extends naturally) and FK-free tables
  *    independent.
  *  - Replica i>0 replaces every 7th word of `text` (residue class i mod 7,
  *    token "ri") — WITHOUT this, ten byte-identical copies of each document
  *    make every near-dup/set-sim query's OUTPUT grow quadratically (100×
  *    pairs at 10× data) and the measurement would conflate output volume
  *    with operator cost. With one word in seven replaced, a 5-gram shingle
  *    window survives only when its 5 consecutive positions miss the
  *    replaced residue (2 of 7 alignments), so cross-replica Jaccard lands
  *    around 0.15–0.2 — far below every gated τ (0.8). Corpus statistics
  *    (doc count, length distribution, vocabulary shape) scale linearly;
  *    pair structure does not explode.
  *  - Embeddings get a per-replica 1e-3 DIRECTION nudge (coordinate
  *    i mod dim) followed by re-normalization, so no two replicas are
  *    bit-identical while the pre-normalized dot=cosine invariant the
  *    ANN family relies on is preserved (centroids/IVF remain
  *    meaningful; dot-ranked recall is unbiased across replicas).
  *
  * Usage: runMain graft.tools.ScaleReplica <srcDir> <outDir> <k>
  */
object ScaleReplica {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleReplica <srcDir> <outDir> <k>")
    val Array(src, out, kStr) = args
    val k = kStr.toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String, idCols: Seq[String],
        perturb: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val offsets: Map[String, Long] = idCols.map { c =>
        c -> (base.agg(max(col(c))).head.getLong(0) + 1L)
      }.toMap
      val reps = (0 until k).map { i =>
        val shifted = idCols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(i * offsets(c)))
        }
        if (i == 0) shifted else perturb(shifted, i)
      }
      reps.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale-replica] $name x$k done")
    }

    replicate("documents", Seq("doc_id"), { (df, i) =>
      df.withColumn("text",
        array_join(
          transform(split(col("text"), " "),
            (w, j) => when(j % 7 === lit(i % 7), lit(s"r$i")).otherwise(w)),
          " "))
    })
    replicate("embeddings", Seq("vec_id"), { (df, i) =>
      // perturb DIRECTION, not norm: nudge coordinate (i mod dim) by
      // 1e-3 and re-normalize, so replicas are not bit-identical but
      // the pre-normalized invariant (dot = cosine) the ANN family
      // documents still holds — a norm-only scaling would bias
      // dot-ranked results toward higher-i replicas
      df.withColumn("p", expr(
          s"transform(embedding, (e, j) -> CAST(e AS DOUBLE) + " +
            s"IF(j = $i % size(embedding), CAST(1e-3 AS DOUBLE), CAST(0.0 AS DOUBLE)))"))
        .withColumn("nrm",
          expr("sqrt(aggregate(p, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x))"))
        .withColumn("embedding",
          expr("transform(p, x -> CAST(IF(nrm > 0, x / nrm, x) AS FLOAT))"))
        .drop("p", "nrm")
    })
    replicate("events", Seq("event_id", "user_id"), (df, _) => df)

    // TPC-H tables: copied raw (the scale-study targets are all
    // documents/embeddings families; the bench warm-up just needs the
    // files present).
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem")) {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println(s"[scale-replica] wrote $out at ${k}x")
    spark.stop()
  }
}
