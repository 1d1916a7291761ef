package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** SURVEY §2 I6 family, ListState variant: per-user "most recent k
  * observations" maintained across micro-batches with the Spark 4.x
  * `transformWithState` LIST state primitive — the state shape a streaming
  * feature store keeps (recent-activity windows per entity) that a scalar
  * ValueState cannot express and a windowed aggregation cannot either (the
  * window would need an unbounded frame; the list is explicitly capped).
  *
  * State is bounded by construction: k rows per user, so total state =
  * k × active users regardless of stream length — the 100 TB invariant.
  * A per-user batch sequence number (ValueState) tags every emission so the
  * LAST emission per user is identifiable by max(seq) without relying on
  * sink row order.
  *
  * Input: (user_id, event ts, event_id, value in integer micros).
  * Output: (user_id, seq, n_kept, kept-value sum in micros) per batch.
  */
class RecentValuesProcessor(k: Int)
    extends StatefulProcessor[Long, (Long, Timestamp, Long, Long), (Long, Long, Long, Long)] {

  @transient private var recent: ListState[(Long, Long, Long)] = _
  @transient private var seq: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    recent = getHandle.getListState[(Long, Long, Long)](
      "recent", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
    seq = getHandle.getValueState[Long]("seq", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      user: Long,
      rows: Iterator[(Long, Timestamp, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    val incoming = rows.map { case (_, ts, eid, v) => (ts.getTime, eid, v) }
    val existing = if (recent.exists()) recent.get().toSeq else Seq.empty
    // most recent k by (event time, event_id) — the tiebreak makes the kept
    // set total-order deterministic across replays and engines
    val kept = (existing ++ incoming)
      .sortBy { case (ts, eid, _) => (-ts, -eid) }
      .take(k)
    recent.clear()
    if (kept.nonEmpty) recent.appendList(kept.toArray)
    val s = (if (seq.exists()) seq.get() else 0L) + 1L
    seq.update(s)
    Iterator.single((user, s, kept.size.toLong, kept.map(_._3).sum))
  }
}
