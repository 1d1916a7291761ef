package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Matrix-free distributed power iteration: the top principal component of
  * a centered vector column, without ever materializing the d×d covariance
  * matrix or collecting a single data row.
  *
  * Each iteration is ONE distributed pass computing w = Σ_rows (x·v) x —
  * the covariance-vector product expressed as: per-row sequential-fold dot
  * product t = x·v (deterministic evaluation order), then a per-component
  * DECIMAL(38,12) sum of x*t (merge-order independent, so 1000 executors
  * and 32 local threads produce bit-identical iterates). The driver holds
  * only the d-vector between passes — metadata scale, identical shape at
  * 100 TB (d stays small while n grows).
  *
  * The eigenvector sign is canonicalized (largest-|component| positive) so
  * downstream projections are reproducible regardless of iteration count.
  */
object PowerIteration {

  /** @param xc   DataFrame with a centered array<double> column `xcCol`
    * @param d    vector dimensionality
    * @param iters fixed iteration count (deterministic — no tolerance test)
    * @return (unit top eigenvector, eigenvalue estimate λ = mean (x·v)²
    *         — the variance captured by the component)
    */
  def topComponent(xc: DataFrame, xcCol: String, d: Int, iters: Int): (Array[Double], Double) = {
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    for (_ <- 1 to iters) {
      val vlit = array(v.toIndexedSeq.map(lit): _*)
      val t = aggregate(zip_with(col(xcCol), vlit, (a, b) => a * b),
        lit(0.0), (acc, e) => acc + e)
      val w = xc.withColumn("__t", t)
        .select(posexplode(transform(col(xcCol), x => x * col("__t")))
          .as(Seq("pos", "wv")))
        .groupBy(col("pos"))
        .agg(sum(col("wv").cast(Tables.decHi)).cast("double").as("w"))
        .orderBy("pos").collect().map(_.getDouble(1))
      val nrm = math.sqrt(w.map(x => x * x).sum)
      require(nrm > 0, "power iteration collapsed: zero covariance-vector product")
      v = w.map(_ / nrm)
    }
    val imax = v.indices.maxBy(i => math.abs(v(i)))
    if (v(imax) < 0) v = v.map(x => -x)
    val vlit = array(v.toIndexedSeq.map(lit): _*)
    val t = aggregate(zip_with(col(xcCol), vlit, (a, b) => a * b),
      lit(0.0), (acc, e) => acc + e)
    val lambda = xc.select(
        (sum((t * t).cast(Tables.decHi)).cast("double") / count(lit(1))).as("l"))
      .collect()(0).getDouble(0)
    (v, lambda)
  }

  /** Center an array<double> column: per-component DECIMAL mean (one
    * distributed pass, d rows collected) subtracted row-wise. */
  def center(df: DataFrame, xCol: String): (DataFrame, Array[Double]) = {
    val mean = df.select(posexplode(col(xCol)).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg((sum(col("v").cast(Tables.decHi)).cast("double") / count(lit(1))).as("m"))
      .orderBy("pos").collect().map(_.getDouble(1))
    val meanLit = array(mean.toIndexedSeq.map(lit): _*)
    (df.withColumn(xCol, zip_with(col(xCol), meanLit, (a, b) => a - b)), mean)
  }
}
