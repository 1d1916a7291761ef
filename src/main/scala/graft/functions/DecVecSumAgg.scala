package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Element-wise DECIMAL sum of double vectors — the merge-order-independent
  * sibling of [[VecSumAgg]], for consumers that need bit-identical results
  * at any executor count (k-means centroid updates, plans/KMeans.scala).
  *
  * Semantics match `sum(CAST(v AS DECIMAL(38,12)))` per element exactly:
  * each addend is rounded HALF_UP to scale 12 (what Spark's double→decimal
  * cast does), and decimal addition is exact, so any merge order yields the
  * same digits. One d-element buffer per group crosses the shuffle (encoded
  * as array<decimal(38,18)>, which carries scale-12 partial sums exactly).
  */
object DecVecSumAgg
    extends Aggregator[Seq[Double], Array[JBigDecimal], Seq[JBigDecimal]] {

  def zero: Array[JBigDecimal] = Array.empty

  def reduce(b: Array[JBigDecimal], a: Seq[Double]): Array[JBigDecimal] = {
    val acc =
      if (b.length == 0) Array.fill(a.length)(JBigDecimal.ZERO) else b
    var i = 0
    while (i < a.length) {
      acc(i) = acc(i).add(
        JBigDecimal.valueOf(a(i)).setScale(12, RoundingMode.HALF_UP))
      i += 1
    }
    acc
  }

  def merge(x: Array[JBigDecimal], y: Array[JBigDecimal]): Array[JBigDecimal] = {
    if (x.length == 0) y
    else if (y.length == 0) x
    else {
      var i = 0
      while (i < x.length) { x(i) = x(i).add(y(i)); i += 1 }
      x
    }
  }

  def finish(b: Array[JBigDecimal]): Seq[JBigDecimal] = b.toSeq

  def bufferEncoder: Encoder[Array[JBigDecimal]] =
    ExpressionEncoder[Array[JBigDecimal]]()
  def outputEncoder: Encoder[Seq[JBigDecimal]] =
    ExpressionEncoder[Seq[JBigDecimal]]()
}
