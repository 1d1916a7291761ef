package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadAllAvailable, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** KAFKA-SHAPED PARTITIONED LOG — the network-connector semantics the
  * sandbox can't exercise over a socket, implemented over the one transport
  * it has (the filesystem) with the EXACT consumer contract a Kafka/Kinesis
  * source gives Spark: the log is a set of numbered PARTITIONS, each an
  * append-only sequence of records addressed by a monotonically increasing
  * per-partition OFFSET; a streaming read progresses by committing
  * `{partition → next offset}` maps into the checkpoint, so restart resumes
  * exactly where the last batch ended (no replay, no loss), new appends are
  * picked up as later batches, and admission control bounds a batch by
  * per-partition row caps (Kafka's `maxOffsetsPerTrigger`). Swapping this
  * for the real `format("kafka")` changes ONE line in a pipeline — which is
  * the point: everything downstream (watermarks, stateful ops, exactly-once
  * sinks) is already offset-agnostic.
  *
  * Layout: `<root>/p=<k>/<start-offset>.seg` — segment files of
  * tab-separated records `offset\tts_us\tuser_id\tevent_type\tvalue`, plus
  * an `_end` marker per partition for O(1) end-offset lookup. Appends go
  * through [[GraftLog.append]], which assigns consecutive offsets and
  * writes the segment + marker (crash between the two re-derives the end
  * from segment contents — the marker is a cache, not the truth).
  *
  * Scale notes (100 TB): a real broker replaces the directory listing with
  * its metadata API, but the SHAPE is identical — planInputPartitions
  * emits one reader per (partition, offset range), readers seek by segment
  * START offset (file-name addressing — never scanning earlier segments),
  * and nothing is driver-resident beyond the offset maps (one long per
  * partition). Batch reads (`spark.read`) scan [0, end) the same way.
  */
object GraftLog {

  val schema: StructType = StructType(Seq(
    StructField("p", LongType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = true),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private def partDir(root: String, p: Int): Path = Paths.get(root, s"p=$p")

  /** Directory listing with the stream CLOSED on exit — `endOffsets` runs
    * once per micro-batch from the driver's `latestOffset`, so a leaked
    * `Files.list` iterator accumulates open fds for the life of the
    * streaming query (the r16 audit finding). */
  private def listNames(d: Path): Seq[String] = {
    val s = Files.list(d)
    try s.iterator().asScala.map(_.getFileName.toString).toVector
    finally s.close()
  }

  /** Current end offset (next offset to assign) of one partition. */
  def endOffset(root: String, p: Int): Long = {
    val d = partDir(root, p)
    if (!Files.exists(d)) return 0L
    val marker = d.resolve("_end")
    if (Files.exists(marker))
      new String(Files.readAllBytes(marker), UTF_8).trim.toLong
    else segmentStarts(root, p).lastOption.map { start =>
      // marker lost (crash between segment write and marker write): re-count
      // the last segment on a STREAMING read — never the whole file in heap
      val s = Files.lines(d.resolve(f"$start%020d.seg"), UTF_8)
      try start + s.count()
      finally s.close()
    }.getOrElse(0L)
  }

  def partitions(root: String): Seq[Int] = {
    val r = Paths.get(root)
    if (!Files.exists(r)) Nil
    else listNames(r)
      .collect { case s if s.startsWith("p=") => s.stripPrefix("p=").toInt }
      .sorted
  }

  private[sources] def segmentStarts(root: String, p: Int): Seq[Long] = {
    val d = partDir(root, p)
    if (!Files.exists(d)) Nil
    else listNames(d)
      .collect { case s if s.endsWith(".seg") => s.stripSuffix(".seg").toLong }
      .sorted
  }

  /** Append records to one partition; offsets assigned consecutively from
    * the current end. Record = (ts µs, user_id, event_type, value). */
  def append(root: String, p: Int,
      records: Seq[(Long, Long, String, Double)]): Long = {
    if (records.isEmpty) return endOffset(root, p)
    val d = partDir(root, p)
    Files.createDirectories(d)
    val start = endOffset(root, p)
    val lines = records.zipWithIndex.map { case ((ts, uid, et, v), i) =>
      s"${start + i}\t$ts\t$uid\t$et\t$v"
    }
    Files.write(d.resolve(f"$start%020d.seg"),
      lines.mkString("\n").getBytes(UTF_8), StandardOpenOption.CREATE_NEW)
    val end = start + records.size
    Files.write(d.resolve("_end"), end.toString.getBytes(UTF_8))
    end
  }

  def endOffsets(root: String): Map[Int, Long] =
    partitions(root).map(p => p -> endOffset(root, p)).toMap
}

/** The `{partition → next unread offset}` map — Kafka's consumer position,
  * serialized into the streaming checkpoint. */
private[sources] case class GraftLogOffset(ends: Map[Int, Long]) extends Offset {
  override def json(): String =
    ends.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

private[sources] object GraftLogOffset {
  def fromJson(s: String): GraftLogOffset = GraftLogOffset(
    s.trim.stripPrefix("{").stripSuffix("}").split(",").filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split(":")
        k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
      }.toMap)
}

/** Test access to the private offset codec (LogSourceSpec pins the
  * checkpoint JSON round-trip without widening the production visibility). */
object GraftLogOffsetAccess {
  def make(m: Map[Int, Long]): Offset = GraftLogOffset(m)
  def parse(json: String): Offset = GraftLogOffset.fromJson(json)
  def ends(o: Offset): Map[Int, Long] = o.asInstanceOf[GraftLogOffset].ends
}

class GraftLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftLogTable(
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException("graft log source needs .option(\"path\", ...)")),
      Option(properties.get("maxRowsPerBatch")).map(_.toLong))
}

private[sources] class GraftLogTable(root: String, maxRows: Option[Long])
    extends Table with SupportsRead {
  override def name(): String = s"graft_log($root)"
  override def schema(): StructType = GraftLog.schema
  override def capabilities(): util.Set[TableCapability] =
    Set[TableCapability](TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftLogScan(root, maxRows)
    }
}

private[sources] class GraftLogScan(root: String, maxRows: Option[Long])
    extends Scan with Batch {
  override def readSchema(): StructType = GraftLog.schema
  override def description(): String = s"graft_log($root)"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    GraftLog.endOffsets(root).toSeq.sortBy(_._1).map { case (p, end) =>
      GraftLogRange(root, p, 0L, end): InputPartition
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftLogMicroBatch(root, maxRows)
}

/** One reader per (partition, [from, until)) — the Kafka task shape. */
private[sources] case class GraftLogRange(root: String, p: Int,
    from: Long, until: Long) extends InputPartition

private[sources] class GraftLogMicroBatch(root: String, maxRows: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // AvailableNow contract: snapshot the end offsets once, never read past
  // them even if a producer appends mid-run
  @volatile private var availableNowCap: Option[Map[Int, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowCap = Some(GraftLog.endOffsets(root))
  }

  override def getDefaultReadLimit: ReadLimit =
    maxRows.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset =
    GraftLogOffset(GraftLog.partitions(root).map(_ -> 0L).toMap)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control entry point")

  /** Admission control: advance every partition by at most
    * ceil(maxRows / nParts) — Kafka's maxOffsetsPerTrigger split. The cap
    * makes batch boundaries a DETERMINISTIC function of the log content,
    * which is what lets the declared queries carry full value oracles. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftLogOffset].ends
    val ends = availableNowCap.getOrElse(GraftLog.endOffsets(root))
    val perPart = limit match {
      case m: ReadMaxRows =>
        math.max(1L, (m.maxRows() + ends.size - 1) / math.max(ends.size, 1))
      case _: ReadAllAvailable => Long.MaxValue
      case _ => Long.MaxValue
    }
    GraftLogOffset(ends.map { case (p, end) =>
      val cur = s.getOrElse(p, 0L)
      p -> math.min(end, if (perPart == Long.MaxValue) end else cur + perPart)
    })
  }

  override def reportLatestOffset(): Offset =
    GraftLogOffset(availableNowCap.getOrElse(GraftLog.endOffsets(root)))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftLogOffset].ends
    val e = end.asInstanceOf[GraftLogOffset].ends
    e.toSeq.sortBy(_._1).flatMap { case (p, until) =>
      val from = s.getOrElse(p, 0L)
      if (until > from) Some(GraftLogRange(root, p, from, until): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory
  override def deserializeOffset(json: String): Offset =
    GraftLogOffset.fromJson(json)
  // the checkpoint IS the consumer position (the Kafka model: the broker
  // keeps nothing per consumer); nothing to acknowledge source-side
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class GraftLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[GraftLogRange]
    new PartitionReader[InternalRow] {
      // segment SEEK: skip whole files whose successor starts at/below
      // `from` — file-name addressing, never a scan of earlier data
      private val starts = GraftLog.segmentStarts(r.root, r.p)
      private var segs = starts.zipAll(starts.drop(1).map(Some(_)), 0L, None)
        .collect { case (st, nxt) if nxt.forall(_ > r.from) && st < r.until => st }
        .toList
      // one open segment at a time, read as a STREAM (a production-sized
      // segment must never be materialized whole in executor heap) and
      // closed before the next opens — plus on task close/failure
      private var stream: java.util.stream.Stream[String] = _
      private var it: java.util.Iterator[String] = java.util.Collections.emptyIterator()
      private def advanceSegment(): Boolean = segs match {
        case st :: rest =>
          segs = rest
          closeStream()
          stream = Files.lines(Paths.get(r.root, s"p=${r.p}", f"$st%020d.seg"), UTF_8)
          it = stream.iterator()
          true
        case Nil => false
      }
      private def closeStream(): Unit =
        if (stream != null) { stream.close(); stream = null }
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (it.hasNext || advanceSegment()) {
          if (it.hasNext) {
            val parts = it.next().split("\t", 5)
            val off = parts(0).toLong
            if (off >= r.from && off < r.until) {
              cur = new GenericInternalRow(Array[Any](
                r.p.toLong, off, parts(1).toLong, parts(2).toLong,
                UTF8String.fromString(parts(3)), parts(4).toDouble))
              return true
            }
          }
        }
        closeStream()
        false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = closeStream()
    }
  }
}
