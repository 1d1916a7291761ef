package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source shortest path (hop count) over a directed edge DataFrame —
  * distributed Bellman-Ford relaxation, the iterative-frontier sibling of
  * [[ConnectedComponents]]: each round joins the current distance table to
  * the edge list (one shuffle on the edge source), takes the per-node min of
  * (known, relaxed) distances, and stops when the (sum, count) signature of
  * the distance table goes stationary — distances only decrease or appear,
  * so the signature is an exact convergence witness, no row-diff join.
  *
  * Scale notes (100 TB): every round is DataFrame-native (AQE, codegen,
  * spill). Rounds needed = graph diameter; the distance table is
  * localCheckpoint'ed per round so the logical plan stays constant-size
  * instead of growing a join per iteration. The edge list is cached once.
  * For web-scale graphs the frontier optimization (relax only rows whose
  * dist changed last round) drops per-round work to the active frontier;
  * at the fixture's dense 25-node nation graph the full relax IS the
  * frontier, so the simpler total-relax round is kept.
  */
object ShortestPath {

  /** @param edges two integral columns `src`, `dst` (directed)
    * @param source the source node id
    * @return (id, dist) for every node reachable from `source`, dist = hops */
  def hops(edges: DataFrame, source: Long, maxIter: Int = 30): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    var dist = e.sparkSession.range(1)
      .select(lit(source).as("id"), lit(0L).as("dist"))
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(coalesce(sum(col("dist")), lit(0L)), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(dist)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val relaxed = e.join(dist, col("src") === col("id"))
        .select(col("dst").as("id"), (col("dist") + 1).as("dist"))
      val next = dist.union(relaxed)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(eager = false)
      val nextSig = signature(next)
      dist = next
      converged = nextSig == sig
      sig = nextSig
      iter += 1
    }
    e.unpersist()
    dist
  }
}
