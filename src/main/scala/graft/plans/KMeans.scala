package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed Lloyd's k-means over an array<double> column — the corpus
  * clustering primitive (IVF coarse quantizers, data-mixture domains,
  * coreset construction) expressed Spark-first and fully deterministic:
  *
  *  - init: the k rows with the SMALLEST id (one distributed top-k, no RNG);
  *  - assignment: distances to all k centroids computed per row inside one
  *    codegen'd projection (sequential-fold sq-L2 per centroid), nearest by
  *    `array_position(min)` so ties break toward the LOWEST centroid id;
  *  - update: per-(cluster, component) DECIMAL(38,12) means — merge-order
  *    independent, so any executor count yields bit-identical centroids;
  *  - empty clusters keep their previous centroid.
  *
  * Each iteration is one distributed pass; the driver holds k×d doubles
  * (metadata scale — the shape that survives 100 TB: n grows, k·d doesn't).
  */
object KMeans {

  /** Squared-L2 to one centroid literal, as a sequential fold (bit-stable). */
  private def sqDist(xCol: String, c: Array[Double]): Column = {
    val clit = array(c.toIndexedSeq.map(lit): _*)
    aggregate(zip_with(col(xCol), clit, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, e) => acc + e)
  }

  /** Nearest-centroid id (0-based) and its squared distance. */
  def assignCols(xCol: String, cents: Array[Array[Double]]): (Column, Column) = {
    val dists = array(cents.toIndexedSeq.map(c => sqDist(xCol, c)): _*)
    val best = array_min(dists)
    (array_position(dists, best).cast("int") - 1, best)
  }

  /** The `p` nearest centroid ids (multi-probe assignment, ties toward the
    * lowest id): sort (dist, id) structs lexicographically, take the first
    * p — all inside one codegen'd projection. */
  def probeCols(xCol: String, cents: Array[Array[Double]], p: Int): Column = {
    val pairs = array(cents.indices.map(i =>
      struct(sqDist(xCol, cents(i)).as("d"), lit(i).as("i"))): _*)
    transform(slice(array_sort(pairs), 1, p), s => s.getField("i"))
  }

  /** @param df     input with an id column and an array<double> column
    * @param idCol  deterministic-init ordering key (smallest k ids seed)
    * @param xCol   vector column
    * @param d      dimensionality
    * @param k      cluster count
    * @param iters  fixed Lloyd iterations
    * @return (final centroids, per-iteration inertia — decimal-exact sums,
    *         non-increasing by Lloyd's monotonicity) */
  def fit(df: DataFrame, idCol: String, xCol: String, d: Int, k: Int,
      iters: Int): (Array[Array[Double]], Seq[Double]) = {
    var cents: Array[Array[Double]] = df.orderBy(col(idCol)).limit(k)
      .select(col(xCol)).collect()
      .map(_.getSeq[Double](0).toArray)
    require(cents.length == k, s"need >= $k rows to seed $k clusters")
    val inertias = Seq.newBuilder[Double]
    for (_ <- 1 to iters) {
      val (cid, dist) = assignCols(xCol, cents)
      val assigned = df.select(col(xCol), cid.as("cid"), dist.as("d2"))
      // one pass: per-(cluster, component) decimal mean + the inertia sum
      val stats = assigned
        .select(col("cid"), col("d2"), posexplode(col(xCol)).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg((sum(col("v").cast(Tables.decHi)).cast("double") / count(lit(1))).as("m"),
          // d2 repeats d times per row — divide back out below
          sum(col("d2").cast(Tables.decHi)).cast("double").as("d2sum"))
        .collect()
      val next = cents.map(_.clone())
      stats.foreach { r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) }
      cents = next
      inertias += stats.filter(_.getInt(1) == 0).map(_.getDouble(3)).sum
    }
    (cents, inertias.result())
  }
}
