package graft

import org.apache.spark.sql.SparkSession

/** Temporary measurement scratch (r21 optimization round) — not part of the
  * driver contract; deleted before round end. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $n ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val tb = Tables(spark, dir)
    def registerAll(): Unit = {
      tb.region.createOrReplaceTempView("region")
      tb.nation.createOrReplaceTempView("nation")
      tb.customer.createOrReplaceTempView("customer")
      tb.supplier.createOrReplaceTempView("supplier")
      tb.part.createOrReplaceTempView("part")
      tb.orders.createOrReplaceTempView("orders")
      tb.lineitem.createOrReplaceTempView("lineitem")
      tb.documents.createOrReplaceTempView("documents")
      tb.embeddings.createOrReplaceTempView("embeddings")
    }
    val tpch3 =
      "SELECT o_orderkey, " +
        s"round(${Tables.dsumSql("l_extendedprice * (1.0 - l_discount)")}, 6) AS revenue " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01' " +
        "GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10"
    (1 to 4).foreach { i =>
      t(s"registerAll pass$i")(registerAll())
      t(s"sql-parse+plan pass$i")(spark.sql(tpch3))
      t(s"tpch3-exec pass$i")(spark.sql(tpch3).count())
    }
    // single-table read cost
    (1 to 3).foreach { i =>
      t(s"read.parquet lineitem pass$i")(spark.read.parquet(s"$dir/lineitem.parquet"))
      t(s"cached lineitem pass$i")(Tables(spark, dir).lineitem)
      t(s"cached events pass$i")(Tables(spark, dir).events)
    }
    spark.stop()
  }
}
