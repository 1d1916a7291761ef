package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank as iterated DataFrame joins — the link-analysis
  * primitive corpus-curation pipelines use to weight web-crawl documents by
  * host/link authority. Default model drops dangling mass (rank flowing into
  * a node without out-edges leaves the system — fine for authority SCORING,
  * where only relative order matters and both engines compute the same fixed
  * point; it is also what g29's replayed-CTE oracle computes). For general
  * graphs, `redistributeDangling = true` adds the classic correction — each
  * round the mass sitting on sink nodes is spread uniformly over all nodes —
  * making ranks a proper probability distribution (mass conserved at 1.0;
  * proven against an exact fixpoint in WarehouseSpec).
  *
  * Scale notes (100 TB): each iteration is one join of the edge list against
  * the current rank vector on src (co-partitioned after the first shuffle —
  * both sides hash on the same key, so AQE reuses the exchange) plus a
  * groupBy(dst) sum, i.e. exactly two shuffles of edge-list size per round.
  * The rank vector (one row per node) broadcasts when small. Per-round
  * `localCheckpoint` would truncate lineage for deep iteration counts (see
  * ConnectedComponents.scala); at the 3–20 rounds PageRank needs for scoring,
  * lineage stays shallow enough without it.
  */
object PageRank {

  /** @param edges (src, dst, w) — w > 0; parallel edges should be
    *              pre-aggregated
    * @return (id, pr) for every node appearing as src or dst, after `iters`
    *         rounds of pr' = (1−d)/N + d · Σ_in pr·w/outW from a uniform
    *         start
    */
  def run(edges: DataFrame, iters: Int, damping: Double = 0.85,
      redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, s"pagerank: iters must be >= 1 (got $iters)")
    // materialize the (possibly expensive) edge derivation ONCE — nodes,
    // out-mass, and transition probabilities all re-read it, and plan-level
    // reuse does not cross self-join/union branches
    val e = edges.localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    val n = nodes.count().toDouble
    // per-edge transition probability: w normalized by the source's out-mass
    val outW = e.groupBy("src").agg(sum(col("w")).as("__tw"))
    val trans = e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("__tw")).as("p"))
      .cache()
    // sink nodes (no out-edges) — only needed for the redistribution term
    val sinks =
      if (redistributeDangling)
        nodes.join(e.select(col("src").as("id")).distinct(), Seq("id"), "left_anti").cache()
      else null
    var rank = nodes.select(col("id"), lit(1.0 / n).as("pr"))
    (1 to iters).foreach { _ =>
      val contrib = trans.join(rank, trans("src") === rank("id"))
        .groupBy(trans("dst").as("cid"))
        .agg(sum(col("pr") * col("p")).as("inflow"))
      val base = nodes.join(contrib, nodes("id") === contrib("cid"), "left")
      rank =
        if (!redistributeDangling)
          base.select(nodes("id"),
            (lit((1.0 - damping) / n) +
              lit(damping) * coalesce(col("inflow"), lit(0.0))).as("pr"))
        else {
          // this round's dangling mass as a one-row frame: stays in-plan (a
          // broadcast nested-loop of a scalar), no per-round driver action
          val dm = rank.join(sinks, Seq("id"), "left_semi")
            .agg(coalesce(sum(col("pr")), lit(0.0)).as("__dm"))
          // this branch references `rank` TWICE (contrib + dm), so without
          // per-round truncation the plan would double every iteration; the
          // lazy checkpoint keeps it constant-size (cf. ConnectedComponents)
          base.crossJoin(dm).select(nodes("id"),
            (lit((1.0 - damping) / n) +
              lit(damping) * (coalesce(col("inflow"), lit(0.0)) +
                col("__dm") / n)).as("pr"))
            .localCheckpoint(eager = false)
        }
    }
    // materialize the result, then release the intermediates — a long-lived
    // session running many rank jobs must not accumulate cached tables
    val out = rank.localCheckpoint()
    trans.unpersist()
    nodes.unpersist()
    if (sinks != null) sinks.unpersist()
    out
  }
}
