package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 read connector: a deterministic synthetic
  * `documents`-shaped generator, used to demonstrate (and spec-gate)
  * the full source-side optimization surface a 100 TB scan needs:
  *
  *  - '''column pruning''' (`SupportsPushDownRequiredColumns`): the
  *    reader only GENERATES requested columns — `SELECT doc_id` never
  *    materializes text (the analog of not decoding unneeded parquet
  *    pages);
  *  - '''filter pushdown''' (`SupportsPushDownFilters`): range/equality
  *    predicates on `doc_id` restrict the generated id range BEFORE
  *    partition planning, so pruned partitions are never even created
  *    (the analog of partition/row-group pruning);
  *  - '''partition planning''': the id range splits into `numPartitions`
  *    even slices — reader parallelism is declared to Spark, not
  *    discovered.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.SynthDocs")
  *     .option("rows", 100000).option("numPartitions", 32)
  *     .load()
  * }}}
  *
  * Rows are a pure function of (doc_id, seed): re-reads, retries, and
  * different partitionings produce identical data.
  */
class SynthDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDocs.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // Spark hands getTable the ORIGINAL-CASE option map
    // (DataSourceV2Utils passes options.asCaseSensitiveMap), so
    // `.option("numPartitions", …)` would miss a lowercase lookup —
    // re-wrap case-insensitively
    val opts = new CaseInsensitiveStringMap(properties)
    new SynthDocsTable(
      opts.getOrDefault("rows", "1000").toLong,
      opts.getOrDefault("numPartitions", "4").toInt,
      opts.getOrDefault("seed", "42").toLong)
  }
}

object SynthDocs {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val Langs = Array("en", "de", "es", "fr", "zh")
  private val Vocab: Array[String] = Array(
    "model", "data", "token", "vector", "query", "spark", "scale",
    "shuffle", "join", "filter", "corpus", "index", "batch", "stream")

  /** Deterministic row content from (doc_id, seed) via splitmix64. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def langOf(id: Long, seed: Long): String =
    Langs(java.lang.Long.remainderUnsigned(mix(id ^ seed), Langs.length).toInt)

  def nWordsOf(id: Long, seed: Long): Long =
    5 + java.lang.Long.remainderUnsigned(mix(id ^ seed ^ 0x5bf03635L), 20)

  def textOf(id: Long, seed: Long): String = {
    val n = nWordsOf(id, seed).toInt
    val sb = new java.lang.StringBuilder(n * 7)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      val w = java.lang.Long.remainderUnsigned(
        mix(id ^ seed ^ (i.toLong << 32)), Vocab.length).toInt
      sb.append(Vocab(w))
      i += 1
    }
    sb.toString
  }
}

class SynthDocsTable(rows: Long, numPartitions: Int, seed: Long)
    extends Table with SupportsRead {
  override def name(): String = s"synth_docs($rows)"
  override def schema(): StructType = SynthDocs.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthDocsScanBuilder(rows, numPartitions, seed)
}

class SynthDocsScanBuilder(rows: Long, numPartitions: Int, seed: Long)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var requiredSchema: StructType = SynthDocs.Schema
  private var lo: Long = 0L          // inclusive id bound after pushdown
  private var hi: Long = rows        // exclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    this.requiredSchema = requiredSchema

  /** Accept doc_id range/equality filters by tightening [lo, hi); all
    * accepted filters are fully applied at the source, so nothing needs
    * re-evaluation above (we return the unsupported remainder only).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case GreaterThan("doc_id", _: Number) => true
      case GreaterThanOrEqual("doc_id", _: Number) => true
      case LessThan("doc_id", _: Number) => true
      case LessThanOrEqual("doc_id", _: Number) => true
      case EqualTo("doc_id", _: Number) => true
      case _ => false
    }
    // saturating +1: `doc_id <= Long.MaxValue` must not wrap the bound
    // negative and silently empty the scan
    def incSat(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    supported.foreach {
      case GreaterThan("doc_id", v: Number) => lo = math.max(lo, incSat(v.longValue()))
      case GreaterThanOrEqual("doc_id", v: Number) => lo = math.max(lo, v.longValue())
      case LessThan("doc_id", v: Number) => hi = math.min(hi, v.longValue())
      case LessThanOrEqual("doc_id", v: Number) => hi = math.min(hi, incSat(v.longValue()))
      case EqualTo("doc_id", v: Number) =>
        lo = math.max(lo, v.longValue()); hi = math.min(hi, incSat(v.longValue()))
      case _ =>
    }
    pushed = supported
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SynthDocsScan(lo, math.max(lo, hi), numPartitions, seed, requiredSchema, pushed)
}

case class SynthDocsPartition(start: Long, end: Long) extends InputPartition

class SynthDocsScan(lo: Long, hi: Long, numPartitions: Int, seed: Long,
    schema: StructType, pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"SynthDocs range=[$lo,$hi) PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${schema.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val total = hi - lo
    if (total <= 0) return Array.empty
    val parts = math.min(numPartitions.toLong, total).toInt
    // BigInt bounds: `i * total` overflows Long for very large row
    // counts (garbage or inverted partitions = silent data loss)
    (0 until parts).map { i =>
      val s = lo + (BigInt(total) * i / parts).toLong
      val e = lo + (BigInt(total) * (i + 1) / parts).toLong
      SynthDocsPartition(s, e)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthDocsReaderFactory(seed, schema)
}

class SynthDocsReaderFactory(seed: Long, schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthDocsPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      // column generators resolved ONCE per reader from the pruned
      // schema — unrequested columns are never computed
      private val gens: Array[Long => Any] = schema.fields.map { f =>
        f.name match {
          case "doc_id" => (i: Long) => i
          case "lang" => (i: Long) => UTF8String.fromString(SynthDocs.langOf(i, seed))
          case "n_words" => (i: Long) => SynthDocs.nWordsOf(i, seed)
          case "text" => (i: Long) => UTF8String.fromString(SynthDocs.textOf(i, seed))
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }
      }
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(id)).toSeq)
      override def close(): Unit = {}
    }
  }
}
