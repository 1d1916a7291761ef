package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the library's functions resolve in a session built with
  * the standard extension mechanism, without any per-query register calls. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("a session built with GraftExtensions resolves cosine_sim and hll_approx") {
    spark.sparkContext // ensure the shared context exists
    // getOrCreate returns the active session (extensions would be ignored),
    // so clear the active/default slots, build a fresh session over the
    // SAME SparkContext, and restore the shared session afterwards.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try {
        val cos = s2.sql(
          "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
          .head().getDouble(0)
        assert(math.abs(cos - 1.0) < 1e-12)
        val approx = s2.range(1000)
          .selectExpr("hll_approx(id) AS n").head().getLong(0)
        assert(math.abs(approx - 1000.0) / 1000.0 <= 0.02, s"hll said $approx")
        // planner strategies arrive through the same injection: the rn_native
        // pattern plans through GraftTopKPerKeyExec with NO experimental
        // registration on this fresh session
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val topk = s2.range(100)
          .withColumn("g", col("id") % 10)
          .withColumn("rn_native",
            row_number().over(Window.partitionBy("g").orderBy(col("id").desc)))
          .filter(col("rn_native") <= 2)
        assert(topk.queryExecution.executedPlan.toString.contains("GraftTopKPerKey"))
        assert(topk.count() == 20)
      } finally {
        // s2 shares the context; do not stop() it
      }
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

}
