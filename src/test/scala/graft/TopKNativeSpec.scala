package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.plans.GraftTopKPerKeyExec — the custom whole-operator Catalyst
  * extension (strategy + physical plan) behind e1c_win_topk_native.
  */
class TopKNativeSpec extends AnyFunSuite {
  import TestSpark._

  test("e1c plans through GraftTopKPerKeyExec, not Sort+Window") {
    val df = SparkEntry.queries("e1c_win_topk_native")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPerKey"), plan)
    assert(!plan.contains("WindowExec"), s"window survived:\n$plan")
  }

  test("e1c output is row-for-row identical to the canonical window plan (e1)") {
    val native = SparkEntry.queries("e1c_win_topk_native")(spark, sfDir)
      .collect().map(_.toSeq)
    val window = SparkEntry.queries("e1_win_rownumber_topk")(spark, sfDir)
      .collect().map(_.toSeq)
    assert(native.length == window.length)
    assert(native.sameElements(window) || native.toSeq == window.toSeq)
  }

  test("the strategy does not fire on an ordinary rn alias") {
    val e1 = SparkEntry.queries("e1_win_rownumber_topk")(spark, sfDir)
    assert(!e1.queryExecution.executedPlan.toString.contains("GraftTopKPerKey"))
  }

  test("randomized: native top-k equals window top-k under heavy key/value ties") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    SparkEntry.queries("e1c_win_topk_native")(spark, sfDir) // registers the strategy
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    // 50 hot keys, only 40 distinct values → constant ties; unique id breaks them
    val df = Seq.tabulate(20000) { i =>
      (rnd.nextInt(50).toLong, rnd.nextInt(40).toDouble, i.toLong)
    }.toDF("k", "v", "id").repartition(7) // uneven pre-partitioning on purpose
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val native = df.withColumn("rn_native", row_number().over(w))
      .filter(col("rn_native") <= 7)
    assert(native.queryExecution.executedPlan.toString.contains("GraftTopKPerKey"))
    val expected = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val got = native
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(got.length == 50 * 7)
    assert(got.toSeq == expected.toSeq)
  }

  test("GraftOps.topKPerKey wraps the pattern and plans natively") {
    import org.apache.spark.sql.functions._
    val t = Tables(spark, sfDir)
    val df = graft.plans.GraftOps.topKPerKey(
      t.orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      keys = Seq(col("o_custkey")),
      order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      k = 3, rankName = "rn")
    assert(df.queryExecution.executedPlan.toString.contains("GraftTopKPerKey"))
    val viaQuery = SparkEntry.queries("e1c_win_topk_native")(spark, sfDir)
    assert(df.orderBy("o_custkey", "rn").collect().map(_.toSeq).toSeq ==
      viaQuery.collect().map(_.toSeq).toSeq)
  }

  test("e1d: the injected optimizer rule rewrites the canonical rn alias to the native operator") {
    val df = SparkEntry.queries("e1d_win_topk_autorewrite")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPerKey"), plan)
    assert(!plan.contains("WindowExec"), s"window survived:\n$plan")
    // output schema keeps the user's alias, not the marker name
    assert(df.columns.toSeq == Seq("o_custkey", "o_orderkey", "o_totalprice", "rn"))
    val window = SparkEntry.queries("e1_win_rownumber_topk")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(df.collect().map(_.toSeq).toSeq == window)
  }

  test("the optimizer rule is inert when the autoRewrite flag is off (default)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession() // rule + strategy installed, flag left unset
    s2.experimental.extraOptimizations = Seq(graft.plans.GraftTopKMarkRule)
    s2.experimental.extraStrategies = Seq(graft.plans.GraftTopKStrategy)
    val t = Tables(s2, sfDir)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val df = t.orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("GraftTopKPerKey"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("spill fallback: high-cardinality keys under a tiny map buffer stay exact") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession()
    // 64 rows of map-side state per task — every task trips the fallback and
    // streams the bulk of its input straight to the sort-based shuffle
    s2.conf.set(graft.plans.GraftTopKStrategy.MaxBufferedRowsKey, "64")
    s2.experimental.extraStrategies = Seq(graft.plans.GraftTopKStrategy)
    import s2.implicits._
    val rnd = new scala.util.Random(7)
    // ~15k every-row-its-own-key keys (the adversarial case the old
    // HashMap-merge reduce side would have buffered wholesale) + 16 hot keys
    val df = Seq.tabulate(20000) { i =>
      val k = if (i % 4 == 0) 100000L + (i / 4) % 16 else i.toLong
      (k, rnd.nextInt(1000).toDouble, i.toLong)
    }.toDF("k", "v", "id").repartition(5)
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val native = df.withColumn("rn_native", row_number().over(w))
      .filter(col("rn_native") <= 3)
    assert(native.queryExecution.executedPlan.toString.contains("GraftTopKPerKey"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(3), r.getLong(2))
    val got = native.collect().map(key).sorted.toSeq
    // plain `rn` alias → canonical Window plan on the same session
    val expected = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .collect().map(key).sorted.toSeq
    assert(got.length == 15000 + 16 * 3)
    assert(got == expected)
  }

  test("SQLMetrics: numOutputRows matches the result; map-side pruning bounds shuffledRows") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.functions._
    // no global orderBy: a final range exchange SAMPLES its child, executing
    // the operator's RDD twice and honestly double-counting the metrics
    val t = Tables(spark, sfDir)
    val df = graft.plans.GraftOps.topKPerKey(
      t.orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      keys = Seq(col("o_custkey")),
      order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      k = 3, rankName = "rn")
    // collect() executes df.queryExecution.executedPlan itself, so the
    // metrics land on the tree we inspect (count() would plan a new tree)
    val n = df.collect().length.toLong
    def find(p: SparkPlan): Option[SparkPlan] =
      if (p.nodeName.contains("GraftTopKPerKey")) Some(p)
      else p match {
        case a: AdaptiveSparkPlanExec => find(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => find(r.child)
        case _ => p.children.view.flatMap(find(_)).headOption
      }
    val exec = find(df.queryExecution.executedPlan).get
    assert(exec.metrics("numOutputRows").value == n)
    // map-side bounded selection shuffles at most k rows per (partition, key)
    // — and at least the final answer
    assert(exec.metrics("shuffledRows").value >= n,
      exec.metrics("shuffledRows").value.toString)
  }

  test("adaptive bail-out holds off while moderate-cardinality buffers warm up") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.functions._
    // 10k keys × 20 rows, k=10, interleaved arrival (row i → key i%10k), ONE
    // map task: at seen=128k every buffer holds <2k rows (no trims yet), so
    // ≥90% of input is buffered — the ratio trigger alone would quit
    // combining and shuffle all 200k rows. The rows-per-key guard
    // (state.size*4 < seen) keeps combining; each key trims once at its
    // 20th row, so exactly keys×k = 100k rows reach the shuffle.
    val s = spark
    import s.implicits._
    SparkEntry.queries("e1c_win_topk_native")(spark, sfDir) // registers the strategy
    val df = (0 until 200000).map { i =>
      (i % 10000L, (i / 10000).toDouble, i.toLong)
    }.toDF("k", "v", "id").coalesce(1)
    val topk = graft.plans.GraftOps.topKPerKey(
      df, keys = Seq(col("k")),
      order = Seq(col("v").desc, col("id").asc), k = 10, rankName = "rn")
    val n = topk.collect().length.toLong
    assert(n == 100000L)
    def find(p: SparkPlan): Option[SparkPlan] =
      if (p.nodeName.contains("GraftTopKPerKey")) Some(p)
      else p.children.view.flatMap(find(_)).headOption
    val exec = find(topk.queryExecution.executedPlan).get
    val shuffled = exec.metrics("shuffledRows").value
    assert(shuffled <= 120000L, s"map-side combine bailed out during warm-up: $shuffled")
  }

  test("k larger than every group returns all rows, correctly ranked") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // register the strategy the same way the declared query does
    SparkEntry.queries("e1c_win_topk_native")(spark, sfDir)
    val t = Tables(spark, sfDir)
    val w = Window.partitionBy("n_regionkey").orderBy(col("n_nationkey").asc)
    val df = t.nation.withColumn("rn_native", row_number().over(w))
      .filter(col("rn_native") <= 1000)
      .select(col("n_nationkey"), col("n_regionkey"), col("rn_native"))
    assert(df.queryExecution.executedPlan.toString.contains("GraftTopKPerKey"))
    val got = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sorted
    assert(got.length == 25)
    // within each region, ranks are exactly 1..count in nationkey order
    got.groupBy(_._2).foreach { case (_, rows) =>
      val ranked = rows.sortBy(_._1).map(_._3)
      assert(ranked.toSeq == (1 to rows.length).toSeq)
    }
  }
}
