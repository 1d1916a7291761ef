package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

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
  * APPEND-ONLY lineage is required (the Delta streaming-source rule): a
  * version that REWROTE files (UPDATE/DELETE/MERGE/OPTIMIZE) fails the
  * batch loudly — rows already emitted downstream cannot be retracted by
  * a source. `option("startingVersion", v)` begins after version v
  * (default 0 = the table's full history, v1 included); starting at the
  * current version tails only future commits.
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

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (s"graft_table(${root(parameters)})", schema.getOrElse(
      SnapshotTable.readCurrent(ctx.sparkSession, root(parameters)).schema))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftTableStreamSource(ctx, root(parameters),
      parameters.get("startingVersion").map(_.toLong).getOrElse(0L))
}

private[sources] class GraftTableStreamSource(ctx: SQLContext, root: String,
    startingVersion: Long) extends Source {

  private val spark =
    ctx.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  override val schema: StructType = SnapshotTable.readCurrent(spark, root).schema

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset from a restart
  }

  /** The newest committed version — one pointer read; None until a commit
    * lands beyond the starting point. */
  override def getOffset: Option[Offset] =
    SnapshotTable.latestVersion(root).filter(_ > startingVersion)
      .map(LongOffset(_))

  // the schema the stream STARTED under: every batch must be served under
  // this one schema (emitted rows cannot be re-shaped), so a batch whose
  // delta was written under a DIFFERENT schema generation refuses below
  private val startSchemaGen = SnapshotTable.latestVersion(root)
    .flatMap(SnapshotTable.schemaAt(root, _))

  /** Rows of versions (v1, v2]: exactly the files v2's manifest adds over
    * v1's, read through the ordinary parquet scan. */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val v1 = start.map(versionOf).getOrElse(startingVersion)
    val v2 = versionOf(end)
    val f1 =
      if (v1 == 0L) Seq.empty[String]
      else SnapshotTable.manifestFiles(root, v1)
    val f2 = SnapshotTable.manifestFiles(root, v2)
    require(f1.toSet.subsetOf(f2.toSet),
      s"graft table stream: versions ($v1, $v2] of $root are not " +
        "append-only — a rewrite (UPDATE/DELETE/MERGE/OPTIMIZE) cannot " +
        "stream (already-emitted rows cannot be retracted); restart the " +
        "stream from the rewritten version with startingVersion")
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
    val batch =
      if (delta.isEmpty) spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else spark.read.schema(schema).parquet(
        delta.map(SnapshotTable.resolveEntry(root, _)): _*)
    org.apache.spark.sql.classic.GraftSqlBridge.streamingDf(
      spark, batch.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}
