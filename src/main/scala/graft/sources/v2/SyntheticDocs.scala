package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSourceV2 batch source: a deterministic synthetic `documents`
  * generator with REAL scan pushdown — `doc_id` range predicates narrow
  * the generated range (rows outside it are never produced) and column
  * pruning reaches the row builder (unrequested columns are never
  * materialized). This is the connector shape a production source (REST
  * cursor, catalog snapshot, internal KV export) plugs into: Spark owns
  * planning/parallelism, the source owns partition slicing + pushdown.
  *
  * Usage: `spark.read.format("graft.sources.v2.SyntheticDocsProvider")
  *   .option("rows", n).option("partitions", p).load()`
  */
object SyntheticDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val langs = Array("en", "de", "fr", "es", "ja")
  private val words = Array("table", "row", "scan", "join", "hash", "sort",
    "merge", "filter", "agg", "key", "value", "batch", "stream", "window",
    "part", "spark", "query", "data", "fast", "slow", "the", "a")

  private def text(id: Long): String = {
    val n = 20 + (id % 41).toInt
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      // LCG-style mix keeps the stream deterministic per (id, position)
      sb.append(words(((id * 31 + i * 7 + (id >> 3)) % words.length).toInt))
      i += 1
    }
    sb.toString
  }

  /** Build one row holding only the requested columns, in their order. */
  def row(id: Long, required: StructType): InternalRow = {
    lazy val t = text(id)
    InternalRow.fromSeq(required.fieldNames.toSeq.map {
      case "doc_id" => id
      case "text" => UTF8String.fromString(t)
      case "lang" => UTF8String.fromString(langs((id % langs.length).toInt))
      case "source" => UTF8String.fromString("src" + (id % 20))
      case "n_chars" => t.length.toLong
    })
  }
}

class SyntheticDocsProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

class SyntheticDocsTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name: String = s"synthetic_docs($rows)"
  override def schema: StructType = SyntheticDocs.schema
  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, parts)
}

class SyntheticScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows
  private var required: StructType = SyntheticDocs.schema
  private var pushed: Array[Filter] = Array.empty

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition {
      case GreaterThan("doc_id", v) => asLong(v).isDefined
      case GreaterThanOrEqual("doc_id", v) => asLong(v).isDefined
      case LessThan("doc_id", v) => asLong(v).isDefined
      case LessThanOrEqual("doc_id", v) => asLong(v).isDefined
      case EqualTo("doc_id", v) => asLong(v).isDefined
      case IsNotNull("doc_id") => true
      case _ => false
    }
    // saturating +1: these filters are CLAIMED pushed (only `residual`
    // returns to Spark), so a wrapped Long.MaxValue + 1 would silently
    // return every row for `doc_id > Long.MaxValue`
    def incr(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    sup.foreach {
      case GreaterThan(_, v) =>
        val x = asLong(v).get
        // doc_id > MaxValue matches nothing — empty the range
        if (x == Long.MaxValue) { lo = 0L; hi = 0L }
        else lo = math.max(lo, x + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, asLong(v).get)
      case LessThan(_, v) => hi = math.min(hi, asLong(v).get)
      case LessThanOrEqual(_, v) => hi = math.min(hi, incr(asLong(v).get))
      case EqualTo(_, v) =>
        lo = math.max(lo, asLong(v).get); hi = math.min(hi, incr(asLong(v).get))
      case _ => ()
    }
    pushed = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new SyntheticScan(lo, math.max(lo, hi), parts, required, pushed)
}

case class SyntheticRange(lo: Long, hi: Long) extends InputPartition

class SyntheticScan(lo: Long, hi: Long, parts: Int, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description: String =
    s"SyntheticDocs range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}" +
      s" pushed=[${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] = {
    val total = hi - lo
    if (total <= 0) Array.empty
    else {
      val n = math.min(parts.toLong, total).toInt
      (0 until n).map { i =>
        SyntheticRange(lo + total * i / n, lo + total * (i + 1) / n)
      }.toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)
}

class SyntheticReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val SyntheticRange(lo, hi) = p: @unchecked
    new PartitionReader[InternalRow] {
      private var cur = lo - 1
      override def next(): Boolean = { cur += 1; cur < hi }
      override def get(): InternalRow = SyntheticDocs.row(cur, required)
      override def close(): Unit = ()
    }
  }
}
