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
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
