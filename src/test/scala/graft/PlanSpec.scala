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

  test("a6: day filter prunes partitions at the scan") {
    val p = finalPlan("a6_partition_pruning")
    assert(p.contains("PartitionFilters: ["), p)
    assert(p.contains("2024-01-05"), p)
  }
}
