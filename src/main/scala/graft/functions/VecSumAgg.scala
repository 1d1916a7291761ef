package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** H2 — typed Aggregator: element-wise sum of float vectors (the building
  * block behind label centroids, G6). Dimension is discovered from the first
  * vector, so the same aggregator serves any embedding width.
  *
  * Scale note: this runs as a two-phase (partial + merge) aggregate exactly
  * like built-in sums — each executor folds its partition into one
  * Array[Double] buffer, and only buffers cross the shuffle. Double addition
  * across merge order is not bit-stable; consumers round (≤6dp) as the
  * centroid error is ~1e-13 at fixture scale.
  */
object VecSumAgg extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {

  def zero: Array[Double] = Array.emptyDoubleArray

  def reduce(b: Array[Double], a: Seq[Float]): Array[Double] = {
    val acc = if (b.length == 0) new Array[Double](a.length) else b
    var i = 0
    while (i < a.length) { acc(i) += a(i); i += 1 }
    acc
  }

  def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    if (x.length == 0) y
    else if (y.length == 0) x
    else {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
  }

  def finish(b: Array[Double]): Seq[Double] = b.toSeq

  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
