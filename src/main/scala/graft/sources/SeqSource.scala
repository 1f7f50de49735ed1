package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSourceV2 connector: a deterministic generated table
  * `(id BIGINT, bucket BIGINT, payload STRING)` for id in [0, rows),
  * bucket = id % 10, payload = 'doc_' || id — the custom-source surface
  * a production engine needs for non-file inputs (internal services,
  * generated fixtures, external stores).
  *
  * Demonstrates the full connector contract, scale-relevantly:
  *  - splits into `slices` independent InputPartitions (parallel read,
  *    no driver materialization — each executor generates its range);
  *  - SupportsPushDownFilters: id-range predicates prune partitions at
  *    planning time (the DSv2 analog of parquet row-group pruning) —
  *    pruned work never reaches an executor;
  *  - SupportsPushDownRequiredColumns: only requested columns are
  *    generated (column pruning through a non-columnar source).
  *
  * Filters are also left in the residual, so Spark re-evaluates them —
  * pushdown here is a pruning optimization, never a correctness
  * dependency.
  *
  * Usage: `spark.read.format("graft.sources.SeqSource")
  *   .option("rows", n).option("slices", p).load()`
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.fullSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

object SeqSource {
  val fullSchema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("bucket", LongType, nullable = false)
    .add("payload", StringType, nullable = false)
}

private class SeqTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, slices)
}

private class SeqScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = SeqSource.fullSchema
  private var lo: Long = 0L
  private var hi: Long = rows - 1 // inclusive
  private var accepted: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.collect {
      case f @ EqualTo("id", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue); f
      case f @ GreaterThan("id", v: Number) =>
        lo = math.max(lo, v.longValue + 1); f
      case f @ GreaterThanOrEqual("id", v: Number) =>
        lo = math.max(lo, v.longValue); f
      case f @ LessThan("id", v: Number) =>
        hi = math.min(hi, v.longValue - 1); f
      case f @ LessThanOrEqual("id", v: Number) =>
        hi = math.min(hi, v.longValue); f
    }
    filters // everything stays residual: pushdown only prunes
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SeqScan(rows, lo, hi, slices, required)
}

private class SeqScan(rows: Long, lo: Long, hi: Long, slices: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq range=[$lo,$hi] cols=${required.fieldNames.mkString(",")}"

  /** Fixed slices of the FULL [0, rows) sequence (the "row groups"),
    * each clamped against the pushed id bounds; slices entirely outside
    * the bounds are dropped at planning time and never reach an
    * executor.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi < lo) return Array.empty
    val per = math.max(1L, (rows + slices - 1) / slices)
    (0L until rows by per).flatMap { start =>
      val end = math.min(start + per - 1, rows - 1)
      val s = math.max(start, lo)
      val e = math.min(end, hi)
      if (s <= e) Some(SeqPartition(s, e): InputPartition) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames.toSeq)
}

private case class SeqPartition(start: Long, end: Long) extends InputPartition

private class SeqReaderFactory(fields: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur <= p.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.map {
          case "id" => cur
          case "bucket" => cur % 10
          case "payload" => UTF8String.fromString(s"doc_$cur")
        })
      override def close(): Unit = ()
    }
  }
}
