package graft

import org.scalatest.funsuite.AnyFunSuite

/** g61 / plans.KCore: the distributed peel must equal an independent
  * in-memory reference on crafted graphs AND on the declared query's own
  * edge set (the k-core is unique, so equality is exact).
  */
class KCoreSpec extends AnyFunSuite {
  import TestSpark._

  /** Reference peeling: repeatedly drop nodes with degree < k. */
  private def referenceCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var es = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }.distinct
    var changed = true
    while (changed && es.nonEmpty) {
      val deg = es.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter { case (u, v) => keep(u) && keep(v) }
      changed = next.size != es.size
      es = next
    }
    es.groupBy(_._1).view.mapValues(_.size).toMap
  }

  private def runCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    val s = spark
    import s.implicits._
    graft.plans.KCore.core(edges.toDF("u", "v"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
  }

  test("triangle with a pendant tail: the 2-core is exactly the triangle") {
    // 1-2-3 triangle, 3-4-5 tail
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(runCore(edges, 2) === Map(1L -> 2, 2L -> 2, 3L -> 2))
    assert(referenceCore(edges, 2) === Map(1L -> 2, 2L -> 2, 3L -> 2))
    // the 3-core of a bare triangle is empty
    assert(runCore(edges, 3) === Map.empty)
  }

  test("two cliques joined by a bridge: 3-core keeps both cliques, drops the bridge-only path") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((4L, 20L), (20L, 10L))
    val got = runCore(edges, 3)
    assert(got === referenceCore(edges, 3))
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L))
    assert(got.values.forall(_ >= 3))
  }

  test("g61: declared query equals the reference peel of its own edge set") {
    import org.apache.spark.sql.functions._
    val t = Tables(spark, sfDir)
    val top = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(least(col("c_nationkey"), col("s_nationkey")).as("u"),
        greatest(col("c_nationkey"), col("s_nationkey")).as("v"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("u"), col("v")).limit(50)
      .select(col("u").cast("long"), col("v").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = referenceCore(top, 3)
    val got = SparkEntry.queries("g61_graph_kcore")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got === expected)
    assert(got.nonEmpty, "trade graph 3-core unexpectedly empty — edge set too sparse")
    assert(got.values.forall(_ >= 3))
  }
}
