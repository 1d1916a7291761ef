package graft

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from per-family modules under `operators`; iteration
  * order is stable (ListMap) so Bench output is reproducible.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    operators.ScanFilterQueries,
    operators.JoinQueries,
    operators.AggQueries,
    operators.WindowQueries,
    operators.SortSetQueries,
    operators.FunctionQueries,
    operators.TextQueries,
    operators.PipelineQueries,
    operators.VectorQueries,
    operators.StreamingQueries,
    operators.DagQueries,
    operators.SqlQueries,
    operators.WarehouseQueries
  )

  /** Flagship query (5-way star join rollup, C4) on sf0.001; driver
    * smoke-checks rows>0. Fails loudly if the flagship is ever renamed. */
  def entry(spark: SparkSession): DataFrame =
    queries.getOrElse("c4_join_5way_star",
      sys.error("flagship query c4_join_5way_star is not declared")
    )(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Duplicate names
    * across modules would silently desync a query from its oracle — fail fast. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val qs = modules.flatMap(_.queries)
    val names = qs.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    ListMap(qs: _*)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    val os = modules.flatMap(_.oracles)
    val names = os.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate oracle names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    val qNames = queries.keySet
    val orphans = names.filterNot(qNames)
    require(orphans.isEmpty, s"oracles without queries: ${orphans.mkString(", ")}")
    ListMap(os: _*)
  }
}
