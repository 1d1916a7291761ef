package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SURVEY §2 A-band, extension tier: a custom DataSource V2 connector — the
  * public `TableProvider`/`SupportsRead` API a library implements when the
  * built-in formats can't ingest a feed (internal record services, bespoke
  * binary logs, synthetic load). This one generates a deterministic integer
  * stream so the engine's correctness gate can replay it exactly in SQL:
  *
  * {{{
  *   spark.read.format("graft.sources.RangeEventsSource")
  *     .option("rows", "10000").option("parts", "8").load()
  * }}}
  *
  * yields rows (id, grp = id % 10, h = (id * 2654435761) % 1000003) for
  * id in [0, rows).
  *
  * Scale design: the table reports `parts` evenly-split input partitions, so
  * the scan parallelizes like any file source (each reader materializes only
  * its slice, nothing is driver-resident); column pruning is pushed into the
  * reader via `SupportsPushDownRequiredColumns`, so `select(grp)` never
  * computes or ships the other columns; range predicates on `id` are pushed
  * via `SupportsPushDownFilters` and clip the generated slice bounds, so a
  * filtered-out row is never materialized (the generator's analogue of
  * parquet row-group skipping).
  */
class RangeEventsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeEventsSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RangeEventsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "4").toInt)
}

object RangeEventsSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false)))
}

private[sources] class RangeEventsTable(rows: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"range_events($rows)"
  override def schema(): StructType = RangeEventsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set[TableCapability](TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeEventsScanBuilder(rows, parts)
}

private[sources] class RangeEventsScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = RangeEventsSource.schema
  // range predicates on `id` clip the generated slice bounds — the generator
  // never materializes a filtered-out row, exactly like parquet row-group
  // skipping. lo/hi form the half-open surviving interval [lo, hi).
  private var lo: Long = 0L
  private var hi: Long = rows
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def asLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  /** Try to fold one filter into [lo, hi); true = fully handled here. */
  private def clip(f: Filter): Boolean = f match {
    case GreaterThan("id", v) => asLong(v).exists { n => lo = math.max(lo, n + 1); true }
    case GreaterThanOrEqual("id", v) => asLong(v).exists { n => lo = math.max(lo, n); true }
    case LessThan("id", v) => asLong(v).exists { n => hi = math.min(hi, n); true }
    case LessThanOrEqual("id", v) => asLong(v).exists { n => hi = math.min(hi, n + 1); true }
    case EqualTo("id", v) => asLong(v).exists { n => lo = math.max(lo, n); hi = math.min(hi, n + 1); true }
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition(clip)
    pushed = handled
    residual // Spark still evaluates these post-scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new RangeEventsScan(lo, math.max(lo, hi), parts, required, pushed)
}

private[sources] class RangeEventsScan(
    lo: Long, hi: Long, parts: Int, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // surfaces the clipped range in explain() output, like parquet's PushedFilters
  override def description(): String =
    s"range_events[$lo, $hi) PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    (0 until parts).map { i =>
      RangeSlice(lo + n * i / parts, lo + n * (i + 1) / parts): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required.fieldNames)
}

private[sources] case class RangeSlice(start: Long, end: Long) extends InputPartition

private[sources] class RangeReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[RangeSlice]
    new PartitionReader[InternalRow] {
      private var cur = slice.start - 1
      override def next(): Boolean = { cur += 1; cur < slice.end }
      override def get(): InternalRow = {
        val id = cur
        val values: Array[Any] = fields.map {
          case "id" => id
          case "grp" => (id % 10).toInt
          case "h" => (id * 2654435761L) % 1000003L
        }
        new GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}
