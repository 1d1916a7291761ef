package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** STREAMING READ of a [[SnapshotTable]] — the table→stream half of the
  * CDC loop (the streaming-sink half is the i12/i13 exactly-once append
  * band): `spark.readStream.format("graft.sources.GraftTableStream")
  * .option("path", root)` turns every COMMITTED VERSION into micro-batch
  * input, so a downstream pipeline follows a table the way it would
  * follow a Kafka topic.
  *
  * Offsets ARE version numbers — the snapshot protocol already provides a
  * totally ordered, atomically published, checkpointable progress marker,
  * so the source needs no bookkeeping of its own: `getOffset` reads the
  * LATEST pointer (one 8-byte read), and `getBatch(v1, v2]` is the set of
  * data files v2's manifest adds over v1's — **O(delta) at any table
  * size**, never a table scan, never a diff. Restart replays from the
  * checkpointed version exactly-once.
  *
  * TWO MODES:
  *  - default (row feed): APPEND-ONLY lineage is required (the Delta
  *    streaming-source rule): a version that REWROTE files
  *    (UPDATE/DELETE/MERGE/OPTIMIZE) fails the batch loudly — rows already
  *    emitted downstream cannot be retracted by a source.
  *  - `option("readChangeFeed", "true")` (i30 — Delta's CDF streaming):
  *    batches carry ROW-LEVEL CHANGES instead of raw rows — the table's
  *    columns plus `_change_type` ('insert'/'delete'), `_n` (multiset
  *    multiplicity) and `_commit_version` — served PER VERSION via
  *    [[SnapshotTable.changesBetween]], so appends still cost O(delta)
  *    while rewrites emit their multiset diff instead of refusing: a
  *    downstream pipeline follows the table through UPDATE/DELETE/MERGE.
  *    Because every version's changes are tagged with that version, the
  *    union of batch ledgers is independent of how versions pack into
  *    micro-batches — what gives the declared query its full value oracle.
  *
  * `option("startingVersion", v)` begins after version v (default 0 = the
  * table's full history, v1 included); starting at the current version
  * tails only future commits. `option("maxVersionsPerBatch", n)` is the
  * backpressure knob (Delta's maxFilesPerTrigger analog): the source
  * implements SupportsAdmissionControl + SupportsTriggerAvailableNow (the
  * FileStreamSource discipline), so catch-up over a long history runs in
  * bounded batches and Trigger.AvailableNow drains exactly to the version
  * committed at run start — no single-batch fallback. On a KEYED table
  * (m43) the change feed serves keyed semantics (update_preimage /
  * update_postimage instead of delete+insert), same columns.
  *
  * The schema (and in-feed mode the diff shape) is PINNED at the stream's
  * FIRST start and persisted in the checkpoint's source-metadata directory
  * (`graft.schema.pin`), so a restart re-pins the SAME generation even if
  * the table was ALTERed meanwhile or a race moved `latestVersion` between
  * construction and the first batch — refusals are keyed to the
  * checkpoint, never to construction timing (the r18 ADVICE item). A batch
  * whose files were written under a different schema generation refuses
  * loudly in both modes; restart the stream (new checkpoint) after a
  * schema change.
  *
  * Implementation note: this is a V1 `Source` — the API whose
  * `getBatch` returns a DataFrame, letting the delta files flow through
  * the ordinary parquet scan (codegen, pushdown, vectorization) instead
  * of a hand-rolled row reader; the `isStreaming` flag crosses the
  * `private[sql]` boundary via [[org.apache.spark.sql.classic.GraftSqlBridge]].
  */
class GraftTableStream extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def root(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft table stream: set .option(\"path\", <snapshot table root>)"))

  private def isCdf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))

  private def cdfSchema(base: StructType): StructType = base
    .add("_change_type", StringType).add("_n", LongType)
    .add("_commit_version", LongType)

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val base = schema.getOrElse(
      SnapshotTable.readCurrent(ctx.sparkSession, root(parameters)).schema)
    (s"graft_table(${root(parameters)})",
      if (isCdf(parameters)) cdfSchema(base) else base)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftTableStreamSource(ctx, root(parameters),
      parameters.get("startingVersion").map(_.toLong).getOrElse(0L),
      isCdf(parameters), metadataPath,
      parameters.get("maxVersionsPerBatch").map(_.toInt))
}

private[sources] class GraftTableStreamSource(ctx: SQLContext, root: String,
    startingVersion: Long, cdf: Boolean, metadataPath: String,
    maxVersionsPerBatch: Option[Int]) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val spark =
    ctx.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** The version whose schema generation the stream serves under, pinned
    * ONCE per checkpoint: read back on restart, written at first start
    * (single-writer — the streaming driver owns its checkpoint). */
  private val pinnedVersion: Long = {
    val p = new org.apache.hadoop.fs.Path(metadataPath, "graft.schema.pin")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def readPin(): Option[Long] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val line =
          try new java.io.BufferedReader(
            new java.io.InputStreamReader(in, "UTF-8")).readLine()
          finally in.close()
        // an empty/torn pin (legacy non-atomic write) re-pins below — safe:
        // the pin is written before the FIRST getBatch, so a missing value
        // means no batch was ever served under a different generation
        Option(line).map(_.trim).filter(_.nonEmpty).map(_.toLong)
      }
    readPin().getOrElse {
      val v = SnapshotTable.latestVersion(root).getOrElse(
        throw new IllegalStateException(
          s"graft table stream: no committed snapshot at $root"))
      // stage + rename: the pin must never exist half-written (the repo's
      // pointer-swap discipline) — a crash mid-write would otherwise leave
      // a restart failing on an empty file forever
      val tmp = new org.apache.hadoop.fs.Path(metadataPath,
        s".graft.schema.pin.tmp.${System.nanoTime()}")
      val out = fs.create(tmp, true)
      try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
      // a blank legacy pin would block the rename — clear it (blank ⇒ no
      // batch ever served, see above)
      if (fs.exists(p)) fs.delete(p, false)
      if (!fs.rename(tmp, p)) {
        // lost a (theoretical) race to another starter: their pin wins
        fs.delete(tmp, false)
      }
      readPin().getOrElse(throw new IllegalStateException(
        s"graft table stream: could not persist the schema pin at $p"))
    }
  }

  // the schema generation the stream STARTED under (from the PINNED
  // version, never from construction-time latest): every batch must be
  // served under this one schema — emitted rows cannot be re-shaped
  private val startSchemaGen = SnapshotTable.schemaAt(root, pinnedVersion)

  private val baseSchema: StructType =
    SnapshotTable.readVersionCurrent(spark, root, pinnedVersion).schema

  override val schema: StructType =
    if (cdf) baseSchema.add("_change_type", StringType).add("_n", LongType)
      .add("_commit_version", LongType)
    else baseSchema

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset from a restart
  }

  private def versionOfV2(
      o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o match {
      case l: LongOffset => l.offset
      case other => other.json.trim.toLong
    }

  // ADMISSION CONTROL (r19): the engine drives this source through
  // latestOffset(start, limit) instead of the legacy getOffset, which
  // gives the table stream (a) REAL Trigger.AvailableNow semantics — the
  // run drains exactly to the version committed when it STARTED (pinned by
  // prepareForTriggerAvailableNow) instead of the single-batch fallback —
  // and (b) `option("maxVersionsPerBatch", n)` backpressure, Delta's
  // maxFilesPerTrigger analog: a stream starting against a long table
  // history catches up in bounded batches instead of one giant one. Both
  // reads are metadata (a pointer + version arithmetic).
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowCap = SnapshotTable.latestVersion(root)
  }

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    maxVersionsPerBatch.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())
  }

  override def latestOffset(
      startOffset: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val start = Option(startOffset).map(versionOfV2).getOrElse(startingVersion)
    val latestNow = SnapshotTable.latestVersion(root).getOrElse(startingVersion)
    val capped = availableNowCap.fold(latestNow)(math.min(latestNow, _))
    val end = limit match {
      case f: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        math.min(capped, start + f.maxFiles())
      case _ => capped
    }
    if (end <= start) null else LongOffset(end)
  }

  /** Unused once SupportsAdmissionControl is implemented — the engine
    * calls [[latestOffset]] (the FileStreamSource discipline). */
  override def getOffset: Option[Offset] =
    throw new UnsupportedOperationException(
      "graft table stream: latestOffset(Offset, ReadLimit) drives this source")

  /** Whether the table had a DECLARED KEY (m43) when the stream was
    * constructed: keyed tables stream KEYED changes — insert / delete /
    * update_preimage / update_postimage diffed from only the exchanged
    * files — while keyless tables stream the grouped multiset diff. Both
    * shapes share the same columns, so the sink schema is identical; a key
    * declared MID-campaign takes effect at the next (re)start. */
  private val keyed = SnapshotTable.declaredKey(root).isDefined

  /** One version's row-level changes under the CDF contract: (v-1, v]
    * through [[SnapshotTable.keyedChangesBetween]] /
    * [[SnapshotTable.changesBetween]] (both treat v1 = 0 as the empty
    * table, so version 1 is the table's birth — every row an insert) —
    * O(delta) on append lineage, a diff only across rewrites. Tagged with
    * the commit version so the union ledger is
    * micro-batch-packing-independent. */
  private def versionChanges(v: Long): DataFrame = {
    require(SnapshotTable.schemaAt(root, v) == startSchemaGen,
      s"graft table stream: version $v of $root was committed under a " +
        "different schema than the stream started with — a stream cannot " +
        "re-shape emitted rows; restart it (a fresh checkpoint re-pins) " +
        "after the schema change")
    val cols = baseSchema.fieldNames.toSeq
    val base =
      if (keyed) SnapshotTable.keyedChangesBetween(spark, root, v - 1, v)
      else SnapshotTable.changesBetween(spark, root, v - 1, v)
    base.withColumn("_commit_version", lit(v))
      .select(cols.map(col) ++ Seq(col("_change_type"), col("_n"),
        col("_commit_version")): _*)
  }

  /** Batch (v1, v2]: the row feed reads exactly the files v2's manifest
    * adds over v1's; the change feed unions each contained version's
    * changes. */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val v1 = start.map(versionOf).getOrElse(startingVersion)
    val v2 = versionOf(end)
    val batch =
      if (cdf) {
        (v1 + 1 to v2).map(versionChanges)
          .reduceOption(_.unionByName(_))
          .getOrElse(spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
      } else {
        val f1 =
          if (v1 == 0L) Seq.empty[String]
          else SnapshotTable.manifestFiles(root, v1)
        val f2 = SnapshotTable.manifestFiles(root, v2)
        require(f1.toSet.subsetOf(f2.toSet),
          s"graft table stream: versions ($v1, $v2] of $root are not " +
            "append-only — a rewrite (UPDATE/DELETE/MERGE/OPTIMIZE) cannot " +
            "stream as a row feed (already-emitted rows cannot be " +
            "retracted); use option(\"readChangeFeed\", \"true\") to follow " +
            "rewrites as row-level changes, or restart from the rewritten " +
            "version with startingVersion")
        val delta = f2.filterNot(f1.toSet)
        // every delta file must have been written under THE STREAM'S schema:
        // an ALTER TABLE mid-stream (or a pre-evolution generation reached by
        // startingVersion 0) would otherwise be force-read under the wrong
        // names and silently NULL-fill renamed columns
        delta.foreach { f =>
          val gen = "data/v(\\d+)/".r.findFirstMatchIn(f).map(_.group(1).toLong)
            .getOrElse(0L)
          require(SnapshotTable.schemaAt(root, gen) == startSchemaGen,
            s"graft table stream: file $f of $root was written under a " +
              "different schema than the stream started with — a stream " +
              "cannot re-shape emitted rows; restart it (startingVersion) " +
              "after the schema change")
        }
        if (delta.isEmpty) spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        else spark.read.schema(schema).parquet(
          delta.map(SnapshotTable.resolveEntry(root, _)): _*)
      }
    org.apache.spark.sql.classic.GraftSqlBridge.streamingDf(
      spark, batch.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}
