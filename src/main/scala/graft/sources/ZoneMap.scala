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
    * `clusterCol` (idempotent per target path via a `_ready` marker).
    * Range clustering is what makes the zone maps selective: disjoint
    * envelopes instead of every file spanning the whole domain.
    */
  def writeClustered(df: DataFrame, path: String, clusterCol: String, nFiles: Int): Unit = {
    val ready = Paths.get(path, "_ready")
    if (!Files.exists(ready)) {
      df.repartitionByRange(nFiles, col(clusterCol))
        .sortWithinPartitions(clusterCol)
        .write.mode("overwrite").parquet(path)
      Files.createFile(ready)
      ()
    }
  }

  /** One row per data file: (file, lo, hi) of `clusterCol` — the zone map.
    * One distributed pass; output is metadata-sized. */
  def stats(spark: SparkSession, path: String, clusterCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(clusterCol)).as("lo"), max(col(clusterCol)).as("hi"))

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
    require(files.nonEmpty, s"zone map pruned every file of $path — empty range")
    spark.read.parquet(files: _*)
      .filter(col(clusterCol) >= from && col(clusterCol) <= to)
  }
}
