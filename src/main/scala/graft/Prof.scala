package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler / plan auditor (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = sys.env.getOrElse("PROF_QUERIES",
      "m1_scd2_merge,m2_mv_incremental,m5_snapshot_diff,e10_funnel_conversion,e11_cohort_retention,g29_graph_pagerank,g30_fuzzy_pairs,d15_winsorized_mean,g32_mips_topk").split(",")
    names.foreach { n =>
      println(s"========== $n ==========")
      val df = SparkEntry.queries(n.trim)(spark, sfDir)
      df.count() // let AQE finalize
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Scan") ||
          l.contains("Window") || l.contains("Sort") || l.contains("Aggregate"))
        .map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
