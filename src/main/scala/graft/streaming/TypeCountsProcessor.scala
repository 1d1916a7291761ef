package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** SURVEY §2 I6 family, MapState variant — completing the Spark 4.x
  * arbitrary-state primitive trio (i6 ValueState, i15 ListState, this
  * MapState): per-user counters keyed by event type, the "map of named
  * counters per entity" shape an entitlements / rate-limiting / per-channel
  * metrics stream keeps. MapState updates touch ONLY the key being
  * incremented — on a store like RocksDB that is a point write, not a
  * read-modify-write of a whole serialized map, which is why this beats a
  * ValueState[Map[...]] once maps grow (the 100 TB argument).
  *
  * Emission: the full current map per input batch, tagged with a per-user
  * seq number so the final state is max(seq) per (user, type) — the end
  * state is chunking-independent (= the batch groupBy count), so the
  * declared query carries a full value oracle.
  *
  * Input: (user_id, event ts, event_type). Output: (user_id, seq,
  * event_type, count).
  */
class TypeCountsProcessor
    extends StatefulProcessor[Long, (Long, Timestamp, String), (Long, Long, String, Long)] {

  @transient private var counts: MapState[String, Long] = _
  @transient private var seq: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[String, Long](
      "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    seq = getHandle.getValueState[Long]("seq", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      user: Long,
      rows: Iterator[(Long, Timestamp, String)],
      timerValues: TimerValues): Iterator[(Long, Long, String, Long)] = {
    rows.foreach { case (_, _, tpe) =>
      val c = if (counts.containsKey(tpe)) counts.getValue(tpe) else 0L
      counts.updateValue(tpe, c + 1L)
    }
    val s = (if (seq.exists()) seq.get() else 0L) + 1L
    seq.update(s)
    // snapshot the map deterministically (key-sorted) for this emission
    counts.iterator().toSeq.sortBy(_._1)
      .map { case (tpe, c) => (user, s, tpe, c) }.iterator
  }
}
