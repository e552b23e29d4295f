package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * One parquet file per table; explicit helper per table keeps call sites
  * typo-proof. Parquet scans are columnar + vectorized out of the box and
  * Catalyst prunes columns / pushes filters into the scan, so no manual
  * projection is needed here — each query should select only what it uses
  * and let the optimizer drive the `ReadSchema`.
  */
object Tables {
  /** Upper bound for the adaptive-parallelism exchange below: past
    * this, a table is big enough that its own file/row-group count
    * should drive scan parallelism and a blanket exchange would be a
    * real shuffle, not noise. */
  private val SmallTableBytes = 256L * 1024 * 1024

  /** Size-adaptive scan parallelization (optimization guide §2.5,
    * "input skew: one huge unsplittable file — repartition immediately
    * after the read"). The driver testdata ships each table as ONE
    * single-row-group parquet file, so a bare scan — and every
    * scan-side tokenize / signature / projection feeding the first
    * exchange — runs at file-count parallelism (one task) no matter
    * how many cores the session has; measured: the corpus-heavy tail
    * queries' biggest stages ran 1–3 tasks on 32 cores
    * (OPTIMIZATION_r15.md). When the file count is below the session's
    * default parallelism AND the table is small enough that one extra
    * round-robin exchange is noise, repartition to the session
    * default; `repartition(n)` with an explicit n is never re-coalesced
    * by AQE. The decision derives from the input layout and the
    * session — at lake scale (files ≥ cores, or bytes past the bound)
    * this is a provable no-op, so nothing here is tuned to local mode.
    * Determinism: the repo-wide no-rand()/total-order discipline means
    * results are partitioning-independent (round-robin repartition
    * itself is retry-deterministic via sort-before-repartition), and
    * the full DuckDB oracle gate re-proves every query bit-identical.
    */
  private def adaptiveParallel(spark: SparkSession, df: DataFrame,
      path: String): DataFrame = {
    // escape hatch (plan-shape tests, A/B measurement): default on
    if (!spark.conf.getOption("spark.graft.scan.adaptiveParallel")
        .forall(_.toBoolean)) return df
    val cores = spark.sparkContext.defaultParallelism
    val p = new org.apache.hadoop.fs.Path(path)
    try {
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val files = fs.listStatus(p).filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      val bytes = files.map(_.getLen).sum
      if (files.nonEmpty && files.length < cores && bytes < SmallTableBytes)
        df.repartition(cores)
      else df
    } catch { case _: Throwable => df }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** [[adaptiveParallel]] applied — only for the text/vector tables,
    * where the per-row scan-side work (tokenize, n-gram/minhash
    * signatures, dot products, projections) dominates and the measured
    * win is ~2× per query; for the relational tables (lineitem-class:
    * more rows, cheap per-row aggregates) the same exchange measured
    * as a net LOSS (+0.2–0.6 s), so their scans stay bare. */
  private def parallelTable(spark: SparkSession, dir: String,
      name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    adaptiveParallel(spark, spark.read.parquet(path), path)
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** `events.ts` has shipped in two physical layouts across driver
    * testdata generations: parquet TIMESTAMP(NANOS) — which Spark 4
    * rejects ([PARQUET_TYPE_ILLEGAL]) unless read as a raw long — and
    * plain TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark infers
    * as TIMESTAMP_NTZ. Normalize both to a session-TZ TimestampType (the
    * session runs UTC, so NTZ wall-clock == UTC instant, matching
    * DuckDB's naive `epoch_us(ts)`); the nanos branch must use integer
    * `div` (nanos ~1.7e18 exceed double's 2^53 integer range).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    parallelTable(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    parallelTable(s, d, "embeddings")
}
