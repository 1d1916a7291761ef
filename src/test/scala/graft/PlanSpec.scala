package graft

import org.scalatest.funsuite.AnyFunSuite

/** B3 + §4: assert the physical plans are the ones we designed for scale —
  * filters/columns pushed into the parquet scan, join strategies as hinted,
  * top-k as TakeOrderedAndProject (no global sort).
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.count() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("b2: predicates and column pruning reach the parquet scan") {
    val p = finalPlan("b2_filter_pred")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_quantity"), p)
    // pruned: columns not referenced must not be read
    assert(!p.contains("l_partkey"), "scan reads an unused column")
    assert(!p.contains("l_extendedprice"), "scan reads an unused column")
  }

  test("c1: dimension join broadcasts (no shuffle of the fact side)") {
    assert(finalPlan("c1_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("c2: SHUFFLE_HASH hint yields a shuffled hash join") {
    assert(finalPlan("c2_join_shuffle_hash").contains("ShuffledHashJoin"))
  }

  test("c3: MERGE hint yields a sort-merge join") {
    assert(finalPlan("c3_join_sort_merge").contains("SortMergeJoin"))
  }

  test("c4: star join broadcasts every dimension") {
    val p = finalPlan("c4_join_5way_star")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
  }

  test("f2: ORDER BY + LIMIT compiles to TakeOrderedAndProject") {
    assert(finalPlan("f2_topk_limit").contains("TakeOrderedAndProject"))
  }

  test("c8: tiny band table joins as broadcast nested loop") {
    assert(finalPlan("c8_join_theta").contains("BroadcastNestedLoopJoin"))
  }

  test("c12: bucketed tables join with no shuffle on the join key") {
    val p = finalPlan("c12_join_bucketed")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("hashpartitioning(l_orderkey"), "lineitem side re-shuffled")
    assert(!p.contains("hashpartitioning(o_orderkey"), "orders side re-shuffled")
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"), p)
  }

  test("AQE splits a skewed sort-merge join at runtime (no manual salt needed)") {
    // c14/d9 salt by hand; this documents the other tool in the box — AQE's
    // OptimizeSkewedJoin — with thresholds scaled down to fixture size (the
    // defaults target 256 MB shuffle partitions). A production job keeps the
    // defaults and gets the same split when a hot key exceeds 5x the median.
    import org.apache.spark.sql.functions._
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4kb",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2kb",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val t = Tables(spark, sfDir)
      // 80% of the fact rows share one hot key; the rest spread over users.
      // props rides along so the hot shuffle partition is fat enough to
      // clear the (scaled-down) skew threshold at fixture size, and the
      // repartition(8) gives the map side >1 task — AQE can only split a
      // skewed reducer partition on MAPPER boundaries, so a single-mapper
      // fixture scan would make the skew unsplittable no matter its size.
      val fact = t.events.repartition(8).select(
        when(pmod(col("event_id"), lit(5)) < 4, lit(1L))
          .otherwise(col("user_id") + 1000000L).as("k"),
        col("value"), col("props"))
      val dim = spark.range(1000000L, 1000200L).select(col("id").as("k"))
        .union(spark.range(1L, 2L).select(col("id").as("k")))
        .withColumn("payload", col("k") * 2)
      val df = fact.join(dim.hint("MERGE"), "k")
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("p"),
          sum(length(col("props"))).as("plen"))
      df.collect() // finalize THIS df's adaptive plan (count() would plan anew)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"no skew split in plan:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a10: column pruning pushes into the custom DSv2 source") {
    val df = spark.read.format("graft.sources.RangeEventsSource")
      .option("rows", "100").load()
      .select(org.apache.spark.sql.functions.col("grp"))
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("grp"), scan)
    assert(!scan.contains("hsum") && !scan.contains("h#") && !scan.contains("id#"),
      s"unpruned columns survive in the scan: $scan")
  }

  test("a6: day filter prunes partitions at the scan") {
    val p = finalPlan("a6_partition_pruning")
    assert(p.contains("PartitionFilters: ["), p)
    assert(p.contains("2024-01-05"), p)
  }
}
