package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps — data skipping one level above parquet's own
  * row-group statistics. A table written range-clustered on a column gives
  * every file a narrow [min, max] envelope on that column; a later range
  * query needs to OPEN only the files whose envelope overlaps the predicate.
  * This is the layout/skipping idiom every large warehouse format (Delta,
  * Iceberg, Hudi) builds in; here it is expressed with nothing but parquet
  * files and a stats pass.
  *
  * Scale notes (100 TB): the stats table has one row PER FILE — metadata
  * scale (a 100 TB table at 256 MB files is ~400k rows), computed with one
  * distributed `_metadata.file_path` group-by and small enough to collect,
  * cache, or persist as its own tiny table. Pruning is a filter on that
  * stats table; the data files it discards are never listed in the scan, so
  * the win is I/O that never happens — on top of, not instead of, parquet
  * row-group skipping within the files that do open.
  */
object ZoneMap {

  /** Materialize `df` as `nFiles` range-clustered parquet files on
    * `clusterCol` (idempotent per target path via a `_ready` marker), and
    * PERSIST the zone map alongside (`_zonemap/`, underscore-hidden from
    * table scans) — stats computed once at WRITE time, not per query
    * (measured at 10M rows: re-deriving them per query cost 1.4 s, more
    * than the scan it saved; reading the persisted map costs ~0.1 s).
    * Honest 10M-row local finding: on clustered files parquet's own
    * row-group statistics already skip the same ranges inside each file,
    * so at 32 local files the end-to-end win is small — the file-level
    * map's real value is at object-store scale, where it prunes the FILE
    * LIST itself (no listing round-trips or footer fetches for skipped
    * files, thousands of files per table). Range clustering is what makes
    * either level selective: disjoint envelopes instead of every file
    * spanning the whole domain.
    */
  def writeClustered(df: DataFrame, path: String, clusterCol: String, nFiles: Int): Unit = {
    val ready = Paths.get(path, "_ready")
    // the marker carries a content fingerprint, so a caller that regenerates
    // the INPUT under the same target path gets a fresh clustered copy +
    // zone map instead of silently reading the stale one; an unchanged input
    // still skips the rewrite (one agg pass vs a full rewrite). Count alone
    // is NOT content-sensitive — a regenerated same-cardinality input (the
    // failure the sf10 gate caught on g49's shingle index) must also flip
    // the marker, so the cluster column's crc32 sum rides along.
    // CRC job memoized per (session, path, source-files size+mtime) — r22,
    // see Tables.memoFingerprint
    val fingerprint = graft.Tables.memoFingerprint(df, s"zonemap:$path") {
      val fpRow = df.agg(count(lit(1)),
        coalesce(sum(crc32(col(clusterCol).cast("string").cast("binary"))),
          lit(0L))).head()
      s"${fpRow.getLong(0)}:${fpRow.getLong(1)}"
    }
    val stale = Files.exists(ready) &&
      new String(Files.readAllBytes(ready), "UTF-8") != fingerprint
    if (!Files.exists(ready) || stale) {
      df.repartitionByRange(nFiles, col(clusterCol))
        .sortWithinPartitions(clusterCol)
        .write.mode("overwrite").parquet(path)
      computeStats(df.sparkSession, path, clusterCol)
        .write.mode("overwrite").parquet(s"$path/_zonemap")
      Files.write(ready, fingerprint.getBytes("UTF-8"))
      ()
    }
  }

  /** One distributed pass over the data: (file, lo, hi) per file. */
  private def computeStats(spark: SparkSession, path: String, clusterCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(clusterCol)).as("lo"), max(col(clusterCol)).as("hi"))

  /** The zone map: the persisted stats table when present (the normal
    * path — written by [[writeClustered]]), else one recomputation pass. */
  def stats(spark: SparkSession, path: String, clusterCol: String): DataFrame =
    if (Files.exists(Paths.get(path, "_zonemap")))
      spark.read.parquet(s"$path/_zonemap")
    else computeStats(spark, path, clusterCol)

  /** The files whose [lo, hi] envelope overlaps [from, to] — the scan list
    * after skipping. The collect is file-level METADATA, never data. */
  def prunedFiles(
      spark: SparkSession, path: String, clusterCol: String,
      from: Column, to: Column): Seq[String] =
    stats(spark, path, clusterCol)
      .filter(col("lo") <= to && col("hi") >= from)
      .select(col("file")).collect().map(_.getString(0)).toSeq.sorted

  /** Zone-map pruned scan of a range predicate: open only overlapping files,
    * then apply the residual predicate (files straddling the boundary still
    * carry out-of-range rows). Semantically identical to scanning the whole
    * table with the same filter.
    */
  def prunedRead(
      spark: SparkSession, path: String, clusterCol: String,
      from: Column, to: Column): DataFrame = {
    val files = prunedFiles(spark, path, clusterCol, from, to)
    // a range overlapping no file is a valid query: the contract is
    // "identical to a full scan with the same filter", so return an EMPTY
    // frame with the table's schema (footer-only read, no data I/O)
    if (files.isEmpty) spark.read.parquet(path).where(lit(false))
    else spark.read.parquet(files: _*)
      .filter(col(clusterCol) >= from && col(clusterCol) <= to)
  }
}
