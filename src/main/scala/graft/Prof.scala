package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s pass$i ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
      }
    }
    import graft.functions.{TextFunctions => TF}
    graft.functions.BloomSketch.register(spark)
    val t = Tables(spark, sfDir)
    def sh = t.documents
      .withColumn("toks", TF.tokens(lower(col("text"))))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(TF.shingles3("toks")).as("sh"))

    time("corpus shingles")(sh.count())
    time("bench distinct")(sh.filter(col("doc_id") % 10 === 0).select(col("sh")).distinct().count())
    val bench = sh.filter(col("doc_id") % 10 === 0).select(col("sh")).distinct()
    time("bloom build")(bench.agg(expr("bloom_sketch(sh, 1048576, 5)").as("bsk")).count())
    val bloom = bench.agg(expr("bloom_sketch(sh, 1048576, 5)").as("bsk"))
    time("probe via crossJoin") {
      sh.filter(col("doc_id") % 10 =!= 0)
        .join(broadcast(bloom))
        .filter(expr("bloom_contains(bsk, sh)"))
        .count()
    }
    val blob = bloom.head().getAs[Array[Byte]](0)
    time("probe via literal") {
      val probe = org.apache.spark.sql.classic.GraftSqlBridge.column(
        graft.functions.BloomContains(
          org.apache.spark.sql.catalyst.expressions.Literal.create(blob,
            org.apache.spark.sql.types.BinaryType),
          org.apache.spark.sql.classic.GraftSqlBridge.expression(col("sh"))))
      sh.filter(col("doc_id") % 10 =!= 0).filter(probe).count()
    }
    time("g17 full")(SparkEntry.queries("g17_contamination_ngram")(spark, sfDir).count())
    time("g27 full")(SparkEntry.queries("g27_contamination_bloom")(spark, sfDir).count())
    spark.stop()
  }
}
