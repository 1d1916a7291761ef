package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test suite (sf0.001 fixtures). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same fork-free local FS as the Bench/Verify mains, so the whole
      // suite exercises the file-scheme impl the benched sessions run on
      .config("spark.hadoop.fs.file.impl", classOf[NoForkLocalFileSystem].getName)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
