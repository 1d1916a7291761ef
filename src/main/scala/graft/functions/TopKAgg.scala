package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Partial top-k per group as a typed Aggregator: each partition keeps only
  * its k best (value, id) pairs in a bounded buffer, and merge combines two
  * such buffers — so the shuffle carries at most k rows per (partition ×
  * group) instead of every row, and NO per-group sort of the full data ever
  * happens. This is the 100 TB replacement for the window
  * `row_number() <= k` pattern (which must sort each whole partition):
  * identical output, map-side-bounded state.
  *
  * Ordering: value DESC, then id ASC as tiebreak — a total order, so results
  * are deterministic and engine-comparable.
  */
final case class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), mutable.ArrayBuffer[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(b: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    if (b.length > k) {
      val sorted = b.sortWith(better)
      b.clear()
      b ++= sorted.take(k)
    }
    b
  }

  def zero: mutable.ArrayBuffer[(Double, Long)] = mutable.ArrayBuffer.empty

  def reduce(b: mutable.ArrayBuffer[(Double, Long)], a: (Double, Long)): mutable.ArrayBuffer[(Double, Long)] = {
    b += a
    // amortize: only re-trim when the buffer doubles past k
    if (b.length >= 2 * k) trim(b) else b
  }

  def merge(x: mutable.ArrayBuffer[(Double, Long)], y: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] =
    trim(x ++= y)

  def finish(b: mutable.ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] =
    b.sortWith(better).take(k).toSeq

  def bufferEncoder: Encoder[mutable.ArrayBuffer[(Double, Long)]] =
    ExpressionEncoder[mutable.ArrayBuffer[(Double, Long)]]()
  def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
