package graft

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from per-family modules under `operators`; iteration
  * order is stable (ListMap) so Bench output is reproducible.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    operators.ScanFilterQueries
  )

  /** Flagship query (5-way star join rollup) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries.getOrElse("c4_join_5way_star", queries.head._2)(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(modules.flatMap(_.queries): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap(modules.flatMap(_.oracles): _*)
}
