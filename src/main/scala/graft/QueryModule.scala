package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One family of declared queries (SURVEY.md §2). `queries` and `oracles`
  * are ordered Seqs so SparkEntry can assemble a stable-iteration ListMap;
  * a query without a matching oracle gets the driver's weaker rows-only
  * check (non-SQL-expressible ops: streaming, approximate sketches).
  */
trait QueryModule {
  type QFn = (SparkSession, String) => DataFrame
  def queries: Seq[(String, QFn)]
  def oracles: Seq[(String, String)]
}
