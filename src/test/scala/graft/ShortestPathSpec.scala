package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** plans/ShortestPath invariants the g50 oracle can't isolate: exact hop
  * distances on a known graph, unreachable-node exclusion, cycle safety,
  * and convergence well under the iteration cap.
  */
class ShortestPathSpec extends AnyFunSuite {
  import TestSpark._

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def distances(df: org.apache.spark.sql.DataFrame, source: Long): Map[Long, Long] =
    plans.ShortestPath.hops(df, source).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain graph: dist = position along the chain") {
    val d = distances(edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), 1L)
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("shortcut wins over the long way around") {
    // 1→2→3→4 (3 hops) vs direct 1→4 (1 hop)
    val d = distances(edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L), 1L)
    assert(d(4L) === 1L)
    assert(d(3L) === 2L)
  }

  test("unreachable nodes are absent; direction is respected") {
    // 9→1: the edge INTO the source must not make 9 reachable
    val d = distances(edges(1L -> 2L, 9L -> 1L, 7L -> 8L), 1L)
    assert(d === Map(1L -> 0L, 2L -> 1L))
  }

  test("cycles terminate and keep the first-arrival distance") {
    val d = distances(edges(1L -> 2L, 2L -> 3L, 3L -> 1L), 1L)
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("source with no out-edges returns just the source at dist 0") {
    val d = distances(edges(2L -> 3L), 1L)
    assert(d === Map(1L -> 0L))
  }
}
