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

  test("conf-gated rule rewrites levenshtein thresholds to the banded kernel") {
    spark.sparkContext // ensure the shared context exists (builder reuses it)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import org.apache.spark.sql.functions._
      // derived from range, not a LocalRelation — ConvertToLocalRelation
      // would otherwise evaluate the filter at optimization time and leave
      // nothing to inspect
      val df = s2.range(300).select(
        substring(md5(col("id").cast("string")), 1, 6).as("a"),
        substring(md5((col("id") * 7).cast("string")), 1, 6).as("b"))
      def q = df.filter(levenshtein(col("a"), col("b")) <= 3)

      val flag = graft.plans.GraftLevBoundedRule.Flag
      s2.conf.set(flag, "false")
      val off = q
      val offRows = off.count()
      assert(!off.queryExecution.optimizedPlan.toString.contains("lev_bounded"))

      s2.conf.set(flag, "true")
      try {
        val on = q
        assert(on.queryExecution.optimizedPlan.toString.contains("lev_bounded"),
          on.queryExecution.optimizedPlan.toString)
        assert(on.count() == offRows)
        // a bare projection (no comparison) keeps the exact built-in
        val bare = df.select(levenshtein(col("a"), col("b")).as("d"))
        assert(!bare.queryExecution.optimizedPlan.toString.contains("lev_bounded"))
      } finally s2.conf.unset(flag)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
