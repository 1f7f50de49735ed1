package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSourceV2 MICRO-BATCH STREAMING source: a partitioned
  * append-only commit log on disk, read with Kafka-shaped semantics —
  * per-partition monotone offsets, offset-range micro-batches planned
  * from a checkpointed start offset (exactly-once replay), and
  * admission control (`maxRecordsPerBatch`) capping how far each
  * trigger advances. This is the broker-less answer to the Kafka gap:
  * the container has no broker or kafka connector jar, so the
  * offset/admission/replay contract is implemented against a local log
  * layout instead — everything above the storage layer (offset
  * tracking, range planning, partition-parallel reads, watermark-free
  * append) is the same machinery a broker-backed source needs.
  *
  * Log layout: `<path>/log_part=<p>/!*.txt`, one record per line,
  * `offset|user_id|event_type|sec`. Offsets are dense per partition
  * starting at 0 (the writer assigns them; see q221). Readers filter
  * their partition's lines to the planned [start, end) range — a
  * sandbox simplification (a production segment layout seeks via an
  * offset index instead of re-scanning; the planning contract is
  * unchanged by that swap).
  *
  * Streaming surface: `spark.readStream.format("graft.sources.LogSource")
  * .option("path", dir).option("maxRecordsPerBatch", n).load()`.
  * A batch scan of the same layout is also provided (BATCH_READ) so
  * tests can diff stream-vs-batch on identical bytes.
  */
class LogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LogSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // wrap for case-insensitive option lookup (key case differs between
    // the batch and streaming call paths)
    val opts = new CaseInsensitiveStringMap(properties)
    new LogTable(
      opts.get("path"),
      Option(opts.get("maxRecordsPerBatch")).map(_.toLong))
  }
}

object LogSource {

  /** Materialize the events fixture as a partitioned commit log
    * (deterministic: partition = user_id mod nParts, dense offsets in
    * (sec, event_id) order within each partition) — the fixture writer
    * for the streaming-source tests and q221. A per-partition window
    * assigns offsets: each log partition numbers independently, the
    * same sharded shape the source reads back.
    */
  def writeLog(s: org.apache.spark.sql.SparkSession, sfDir: String,
      out: String, nParts: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("log_part").orderBy("sec", "event_id")
    Events.load(s, sfDir)
      .select(pmod(col("user_id"), lit(nParts)).cast("int").as("log_part"),
        col("user_id"), col("event_type"), col("sec"), col("event_id"))
      .withColumn("log_off", row_number().over(w).cast("long") - 1)
      .select(col("log_part"), concat_ws("|", col("log_off"), col("user_id"),
        col("event_type"), col("sec")).as("value"))
      .write.partitionBy("log_part").mode("overwrite").text(out)
  }

  /** Two-segment form of [[writeLog]] for replay/append tests: offsets
    * are assigned over the FULL event set (so they are stable across
    * segments), then rows with sec < splitSec land in `outSeg0` and the
    * rest in `outSeg1` — per-partition order puts all seg-0 offsets
    * before seg-1's, so seg0 alone is a dense prefix [0, k) and
    * appending seg1's files extends it to [0, n) without renumbering.
    * A checkpointed query that drained seg0 resumes EXACTLY at k.
    */
  def writeLogSegments(s: org.apache.spark.sql.SparkSession, sfDir: String,
      outSeg0: String, outSeg1: String, nParts: Int, splitSec: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("log_part").orderBy("sec", "event_id")
    val base = Events.load(s, sfDir)
      .select(pmod(col("user_id"), lit(nParts)).cast("int").as("log_part"),
        col("user_id"), col("event_type"), col("sec"), col("event_id"))
      .withColumn("log_off", row_number().over(w).cast("long") - 1)
      .select(col("log_part"), col("sec"), concat_ws("|", col("log_off"),
        col("user_id"), col("event_type"), col("sec")).as("value"))
      .persist()
    base.filter(col("sec") < splitSec).select("log_part", "value")
      .write.partitionBy("log_part").mode("overwrite").text(outSeg0)
    base.filter(col("sec") >= splitSec).select("log_part", "value")
      .write.partitionBy("log_part").mode("overwrite").text(outSeg1)
    base.unpersist()
  }

  val schema: StructType = new StructType()
    .add("log_part", IntegerType, nullable = false)
    .add("log_off", LongType, nullable = false)
    .add("user_id", LongType, nullable = false)
    .add("event_type", StringType, nullable = false)
    .add("sec", LongType, nullable = false)

  /** Partition dirs `log_part=<p>` under the log root. */
  private[sources] def partDirs(root: String): Seq[(Int, java.io.File)] = {
    val fs = Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
    fs.filter(f => f.isDirectory && f.getName.startsWith("log_part="))
      .map(f => (f.getName.stripPrefix("log_part=").toInt, f))
      .sortBy(_._1).toSeq
  }

  private[sources] def partFiles(dir: java.io.File): Seq[String] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_"))
      .map(_.getPath).sorted.toSeq

  /** Per-file non-empty-line counts, cached by (length, mtime): outside
    * Trigger.AvailableNow, `latestOffset()` plans EVERY micro-batch, so
    * a long-running stream would otherwise re-scan the whole log per
    * trigger — O(log size) planning cost. Log segments are append-only
    * (a changed file changes length/mtime and re-counts), and the map
    * is keyed by path so a rewritten file replaces its stale entry
    * instead of leaking one per version.
    */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Long)]()

  private def countLines(f: String): Long = {
    val file = new java.io.File(f)
    val (len, mt) = (file.length(), file.lastModified())
    val cached = countCache.get(f)
    if (cached != null && cached._1 == len && cached._2 == mt) cached._3
    else {
      val src = scala.io.Source.fromFile(f)
      val n = try src.getLines().count(_.nonEmpty).toLong finally src.close()
      countCache.put(f, (len, mt, n))
      n
    }
  }

  /** End offset (= record count; offsets are dense) per partition. */
  private[sources] def endOffsets(root: String): Map[Int, Long] =
    partDirs(root).map { case (p, d) =>
      p -> partFiles(d).map(countLines).sum
    }.toMap
}

/** JSON-serializable per-partition offset map (the checkpoint format). */
class LogOffset(val offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object LogOffset {
  def parse(json: String): LogOffset = new LogOffset(
    """"(\d+)":(\d+)""".r.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

private class LogTable(path: String, maxPerBatch: Option[Long])
    extends Table with SupportsRead {
  require(path != null, "LogSource requires .option(\"path\", dir)")
  override def name(): String = s"graft_log($path)"
  override def schema(): StructType = LogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LogScan(path, maxPerBatch)
    }
}

private class LogScan(path: String, maxPerBatch: Option[Long]) extends Scan {
  override def readSchema(): StructType = LogSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LogMicroBatchStream(path, maxPerBatch)
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      LogSource.partDirs(path).map { case (p, d) =>
        LogInputPartition(p, 0L, Long.MaxValue,
          LogSource.partFiles(d).toArray): InputPartition
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new LogReaderFactory
  }
}

/** Micro-batch planner: offsets live in the streaming checkpoint;
  * each batch is the per-partition range (start, end]-as-[start, end).
  * With `maxRecordsPerBatch` the source reports a capped latest offset
  * (admission control), so a large backlog drains in bounded batches —
  * under Trigger.AvailableNow Spark loops until the snapshot end.
  */
private class LogMicroBatchStream(path: String, maxPerBatch: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow contract: snapshot the log end ONCE at query
  // start; every batch advances toward that fixed end (respecting the
  // read limit) and the query stops there. Without implementing this
  // interface Spark wraps the stream in AvailableNowDataStreamWrapper,
  // whose latestOffset IGNORES the read limit (single giant batch) —
  // admission control under AvailableNow requires the native
  // implementation (verified against the Spark 4.1 wrapper bytecode).
  @volatile private var availableNowEnd: Option[Map[Int, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(LogSource.endOffsets(path))

  override def initialOffset(): Offset =
    new LogOffset(LogSource.partDirs(path).map(_._1 -> 0L).toMap)

  override def latestOffset(): Offset = new LogOffset(currentEnd)

  override def reportLatestOffset(): Offset = new LogOffset(currentEnd)

  private def currentEnd: Map[Int, Long] =
    availableNowEnd.getOrElse(LogSource.endOffsets(path))

  override def getDefaultReadLimit: ReadLimit =
    maxPerBatch.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[LogOffset].offsets
    val end = currentEnd
    limit match {
      case r: ReadMaxRows =>
        val parts = end.keys.toSeq.sorted
        val cap = math.max(1L, r.maxRows() / math.max(1, parts.size))
        new LogOffset(parts.map { p =>
          val s = from.getOrElse(p, 0L)
          p -> math.min(end(p), s + cap)
        }.toMap)
      case _ => new LogOffset(end)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LogOffset].offsets
    val e = end.asInstanceOf[LogOffset].offsets
    val dirs = LogSource.partDirs(path).toMap
    e.toSeq.sortBy(_._1).flatMap { case (p, eo) =>
      val so = s.getOrElse(p, 0L)
      if (eo > so)
        Some(LogInputPartition(p, so, eo,
          LogSource.partFiles(dirs(p)).toArray): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new LogReaderFactory
  override def deserializeOffset(json: String): Offset = LogOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class LogInputPartition(part: Int, start: Long, end: Long,
    files: Array[String]) extends InputPartition

private class LogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LogInputPartition]
    new PartitionReader[InternalRow] {
      // one file open at a time; closed on advance and in close() so a
      // task that stops mid-range (limit, failure) leaks no descriptor
      private val files = p.files.iterator
      private var src: scala.io.Source = _
      private var lines: Iterator[String] = Iterator.empty
      private var row: InternalRow = _

      private def advanceFile(): Boolean = {
        if (src != null) { src.close(); src = null }
        if (!files.hasNext) false
        else {
          src = scala.io.Source.fromFile(files.next())
          lines = src.getLines().filter(_.nonEmpty)
          true
        }
      }

      override def next(): Boolean = {
        var more = true
        while (more) {
          if (lines.hasNext) {
            val parts = lines.next().split('|')
            val off = parts(0).toLong
            if (off >= p.start && off < p.end) {
              row = InternalRow(p.part, off, parts(1).toLong,
                UTF8String.fromString(parts(2)), parts(3).toLong)
              return true
            }
          } else more = advanceFile()
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit =
        if (src != null) { src.close(); src = null }
    }
  }
}
