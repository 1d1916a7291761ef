package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition over an edge DataFrame — the graph-density dual of
  * [[ConnectedComponents]]: components say "who is connected at all"; the
  * k-core says "who sits in a densely cross-linked cluster". On a near-dup
  * pair graph the 2-/3-core is exactly the boilerplate family (template
  * pages, mirrored docs pairwise similar to many peers), which is the
  * cluster a curation pipeline treats differently from an isolated
  * duplicate pair.
  *
  * Algorithm: classical iterative peeling. Each round computes every
  * remaining node's degree (one shuffle: groupBy on the symmetrized edge
  * endpoint), drops nodes with degree < k, and restricts the edge set to
  * surviving endpoints (two semi-joins against the small survivor set —
  * broadcast when it fits). The fixpoint — no node dropped — is the k-core,
  * which is UNIQUE and independent of removal order, so the result is
  * deterministic by construction. Edge rows only ever shrink; convergence
  * is detected by the edge count going stationary, which doubles as the
  * action that materializes each round's `localCheckpoint` (same
  * single-action-per-round shape as ConnectedComponents, and the same
  * reason: without lineage truncation the plan doubles per round).
  *
  * Rounds: worst case O(nodes) on an adversarial chain of hanging pendants,
  * but real dedup graphs peel in a handful of rounds (each round removes
  * every currently-underdegree node at once). At 100 TB the per-round cost
  * is one degree aggregate + two hash joins keyed on node id; if round
  * count ever became the bottleneck the literature's bucket-peeling
  * refinement applies, but it changes nothing about this interface.
  */
object KCore {

  /** @param edges two integral columns `u`, `v` (one row per undirected edge)
    * @return one row per node in the k-core: (id, core_deg) where core_deg
    *         is the node's degree WITHIN the core (≥ k) — deterministic.
    */
  def core(edges: DataFrame, k: Int, maxIter: Int = 100): DataFrame = {
    var cur = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint()
    var n = cur.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter && n > 0) {
      val keep = cur.groupBy(col("u")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("u").as("node"))
      val next = cur
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(false)
      val m = next.count() // materializes the checkpoint + convergence test
      converged = m == n
      cur = next
      n = m
      iter += 1
    }
    cur.groupBy(col("u")).agg(count(lit(1)).as("core_deg"))
      .select(col("u").as("id"), col("core_deg"))
  }
}
