package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hash-min connected components over an edge DataFrame — the step a real
  * dedup pipeline needs AFTER pair detection: near-dup pairs form a graph,
  * and each document must resolve to one canonical group id (the component's
  * minimum doc id) before survivor selection.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round every node takes the min of its own label and its
  * neighbors' labels; fixpoint in O(diameter) rounds. Each round is one
  * shuffle (join on the edge endpoint + a min-aggregate) — the
  * DataFrame-native formulation of GraphX's connectedComponents, chosen
  * because it inherits AQE, codegen, and spill handling and needs no RDD
  * caching of vertex/edge partitions. At 100 TB: near-dup graphs are sparse
  * forests of small cliques (diameter ≲ 3 in practice), so this converges in
  * a handful of rounds; labels monotonically decrease, so convergence is
  * detected exactly by the (sum, count) signature going stationary — no
  * row-by-row diff join.
  */
object ConnectedComponents {

  /** @param edges two integral columns `u`, `v` (one row per undirected edge)
    * @return one row per node appearing in `edges`: (id, comp) where comp is
    *         the smallest node id in the component — deterministic.
    */
  def labels(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .cache()
    var current = sym.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id"))
      .cache()
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(sum(col("comp")), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(current)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborLabels = sym
        .join(current.withColumnRenamed("id", "nbr"), col("v") === col("nbr"))
        .select(col("u").as("id"), col("comp"))
      val next = current.union(neighborLabels)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .cache()
      val nextSig = signature(next)
      current.unpersist()
      current = next
      converged = nextSig == sig
      sig = nextSig
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    sym.unpersist()
    current
  }
}
