// Scratch utility (not part of the library): prints formatted plans for
// headline queries. Run: sbt 'runMain graft.tools.PlanDump'
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("b2_filter_pred", "c4_join_5way_star", "d1_agg_hash", "e1_win_rownumber_topk", "g9_tfidf_topterms")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
