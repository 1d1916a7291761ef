package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SURVEY §2 A-band, extension tier: a custom DataSource V2 **write** path —
  * the `SupportsWrite`/`BatchWrite` counterpart to [[RangeEventsSource]]'s
  * read connector. Persists any frame of long/int/double/string columns as
  * tab-separated part files plus a `_schema.ddl` sidecar, and reads them
  * back through the same provider:
  *
  * {{{
  *   df.write.format("graft.sources.GraftTsvSink")
  *     .mode("overwrite").option("path", dir).save()
  *   spark.read.format("graft.sources.GraftTsvSink").option("path", dir).load()
  * }}}
  *
  * Scale design — the commit protocol is the part that matters at 100 TB:
  *  - each task writes ONLY its own partition to a task-attempt-unique temp
  *    file (`_tmp/part-<partition>-<task>`), so executors stream straight to
  *    storage and nothing is driver-resident;
  *  - the driver's `commit()` atomically renames the temp files named in the
  *    commit messages into place and writes the schema sidecar LAST (the
  *    sidecar acts as the _SUCCESS marker: readers refuse a dir without it),
  *    so a job that dies mid-write leaves no readable table behind;
  *  - speculative or retried task attempts write distinct temp files and
  *    only the committed attempt's file is renamed — exactly-once output
  *    without coordination between attempts (the same recipe as Spark's
  *    HadoopMapReduceCommitProtocol);
  *  - `truncate()` (SaveMode.Overwrite) clears previous part files on the
  *    driver before the new job commits.
  */
class GraftTsvSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val ddl = Paths.get(GraftTsvSink.pathOf(options), "_schema.ddl")
    require(Files.exists(ddl), s"no _schema.ddl under ${ddl.getParent} — not a committed graft-tsv table")
    StructType.fromDDL(Files.readString(ddl))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-tsv requires a 'path' option"))
    new GraftTsvTable(path, schema)
  }
}

object GraftTsvSink {
  private[sources] def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-tsv requires a 'path' option"))

  private[sources] val Null = "\\N"

  private[sources] def esc(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '\t' => "\\t"
      case '\n' => "\\n"
      case c => c.toString
    }

  private[sources] def unesc(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb += '\\'
          case 't' => sb += '\t'
          case 'n' => sb += '\n'
          case c => sb += c
        }
        i += 2
      } else { sb += s.charAt(i); i += 1 }
    }
    sb.toString
  }

  private[sources] def checkSupported(schema: StructType): Unit =
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType | IntegerType | DoubleType | StringType => ()
        case dt => throw new IllegalArgumentException(
          s"graft-tsv supports long/int/double/string columns; ${f.name} is $dt")
      }
    }
}

private[sources] class GraftTsvTable(path: String, schema0: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_tsv($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftTsvScanBuilder(path, schema0)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    GraftTsvSink.checkSupported(info.schema())
    new GraftTsvWriteBuilder(path, info.schema(), truncate = false)
  }
}

private[sources] class GraftTsvWriteBuilder(
    path: String, schema: StructType, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder =
    new GraftTsvWriteBuilder(path, schema, truncate = true)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftTsvBatchWrite(path, schema, truncate)
  }
}

private[sources] case class TsvCommit(tmpFile: String, partitionId: Int)
    extends WriterCommitMessage

private[sources] class GraftTsvBatchWrite(
    path: String, schema: StructType, truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftTsvWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    if (truncate) {
      Option(dir.toFile.listFiles()).getOrElse(Array.empty[File])
        .filter(f => f.getName.endsWith(".tsv") || f.getName == "_schema.ddl")
        .foreach(_.delete())
    }
    messages.foreach { case TsvCommit(tmp, pid) =>
      Files.move(Paths.get(tmp), dir.resolve(f"part-$pid%05d.tsv"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // sidecar last: its presence marks the commit complete (readers require it)
    Files.writeString(dir.resolve("_schema.ddl"), schema.toDDL)
    val tmpDir = dir.resolve("_tmp").toFile
    Option(tmpDir.listFiles()).foreach(_.foreach(_.delete()))
    tmpDir.delete()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case TsvCommit(tmp, _) => Files.deleteIfExists(Paths.get(tmp))
      case _ => ()
    }
}

private[sources] class GraftTsvWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val tmpDir = Paths.get(path, "_tmp")
    Files.createDirectories(tmpDir)
    val tmp = tmpDir.resolve(s"part-$partitionId-$taskId")
    val out = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
    val types: Array[DataType] = schema.fields.map(_.dataType)
    new DataWriter[InternalRow] {
      override def write(r: InternalRow): Unit = {
        val cells = types.zipWithIndex.map { case (dt, i) =>
          if (r.isNullAt(i)) GraftTsvSink.Null
          else dt match {
            case LongType => r.getLong(i).toString
            case IntegerType => r.getInt(i).toString
            case DoubleType => r.getDouble(i).toString
            case StringType => GraftTsvSink.esc(r.getUTF8String(i).toString)
            case other => throw new IllegalStateException(s"unreachable: $other")
          }
        }
        out.write(cells.mkString("\t"))
        out.write('\n')
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        TsvCommit(tmp.toString, partitionId)
      }
      override def abort(): Unit = { out.close(); Files.deleteIfExists(tmp) }
      override def close(): Unit = ()
    }
  }
}

/** Column pruning on read: Catalyst hands the required sub-schema down via
  * `SupportsPushDownRequiredColumns`, and the reader then parses ONLY those
  * cells from each line — a wide TSV table projected to 2 columns skips the
  * string-unescape / numeric-parse work for every other field. (Filters are
  * NOT pushed: a row-oriented text format has no statistics or ordering to
  * skip rows with, so pretending to handle predicates would just hide them
  * from Spark's codegen'd post-scan filter.)
  */
private[sources] class GraftTsvScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftTsvScan(path, full, required)
}

private[sources] class GraftTsvScan(path: String, full: StructType, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // surfaces the pruned projection in explain(), like parquet's ReadSchema
  override def description(): String =
    s"graft_tsv ReadSchema: ${required.toDDL}"

  override def planInputPartitions(): Array[InputPartition] = {
    require(Files.exists(Paths.get(path, "_schema.ddl")),
      s"$path has no _schema.ddl — refusing to read an uncommitted table")
    Option(new File(path).listFiles()).getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".tsv"))
      .sortBy(_.getName)
      .map(f => TsvFilePartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TsvReaderFactory(full, required)
}

private[sources] case class TsvFilePartition(file: String) extends InputPartition

private[sources] class TsvReaderFactory(full: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[TsvFilePartition].file
    val lines = Files.lines(Paths.get(file), StandardCharsets.UTF_8)
    val it = lines.iterator()
    // file cells are laid out in the FULL schema's order; parse only the
    // pruned projection's positions
    val srcIdx: Array[Int] = required.fields.map(f => full.fieldIndex(f.name))
    val types: Array[DataType] = required.fields.map(_.dataType)
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean =
        if (!it.hasNext) false
        else {
          val cells = it.next().split("\t", -1)
          val values = new Array[Any](types.length)
          var i = 0
          while (i < types.length) {
            val c = cells(srcIdx(i))
            values(i) =
              if (c == GraftTsvSink.Null) null
              else types(i) match {
                case LongType => c.toLong
                case IntegerType => c.toInt
                case DoubleType => c.toDouble
                case StringType => UTF8String.fromString(GraftTsvSink.unesc(c))
                case other => throw new IllegalStateException(s"unreachable: $other")
              }
            i += 1
          }
          row = new GenericInternalRow(values)
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = lines.close()
    }
  }
}
