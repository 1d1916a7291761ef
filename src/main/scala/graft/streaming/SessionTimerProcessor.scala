package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues, ValueState}

/** SURVEY §2 I6 family, EVENT-TIME TIMER variant — the fourth and last
  * arbitrary-state primitive after Value (i6), List (i15) and Map (i16)
  * state: per-user gap sessionization where a session is emitted by a TIMER
  * when the watermark passes `last_event + gap`, not by a later event of the
  * same user happening to arrive. This is the state shape a real-time
  * engagement pipeline needs (a session must close on silence, e.g. to fire
  * an abandonment action) that neither `session_window` aggregation (i3:
  * fixed aggregate, no custom on-close logic) nor timer-less
  * transformWithState (can never act without an input row for the key) can
  * express.
  *
  * Mechanics per key:
  *  - `handleInputRows`: sort the batch's rows by (ts, event_id); extend the
  *    open session while the gap holds, else emit the closed session
  *    immediately (a newer event is itself proof the gap elapsed) and open a
  *    new one. Re-arm the single event-time timer at `last + gap` (the
  *    previously armed expiry, tracked in `armed`, is deleted first — the
  *    engine keys timers by expiry time, so stale ones must go).
  *  - `handleExpiredTimer`: if the open session's expiry still matches the
  *    fired timer (no newer event re-armed it in the same batch), emit it
  *    and clear state.
  *
  * Event time is carried in MICROSECONDS (the fixtures are µs-grained);
  * timers and watermark are engine-side MILLISECOND quantities, so the
  * expiry is the ceiling ms of `last + gap` — a sub-ms boundary that can
  * only matter for a session expiring within 1 ms of the final watermark.
  *
  * The emitted set is exactly: every maximal gap-session whose `end + gap`
  * ≤ final watermark — independent of micro-batch chunking as long as
  * arrival order is non-decreasing in event time (the ts-ordered chunk
  * source guarantees it; a late row would be watermark-dropped and break
  * parity, which StreamingSpec pins). State per key is one open session +
  * one timer — O(active users) total, the 100 TB invariant; the shuffle key
  * is user_id, the same partitioning any keyed-state op needs.
  *
  * Input: (user_id, ts µs, event_id). Output: (user_id, session start µs,
  * session end µs, n_events).
  */
class SessionTimerProcessor(gapUs: Long)
    extends StatefulProcessorWithInitialState[
      Long, (Long, Long, Long), (Long, Long, Long, Long), (Long, Long, Long)] {

  // open session: (startUs, lastUs, nEvents)
  @transient private var sess: ValueState[(Long, Long, Long)] = _
  // expiry ms of the currently armed timer (0 = none)
  @transient private var armed: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    sess = getHandle.getValueState[(Long, Long, Long)](
      "sess", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
    armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def rearm(lastUs: Long): Unit = {
    val expiryMs = (lastUs + gapUs + 999L) / 1000L // ceil → never fires early
    val prev = if (armed.exists()) armed.get() else 0L
    if (prev != expiryMs) {
      if (prev != 0L) getHandle.deleteTimer(prev)
      getHandle.registerTimer(expiryMs)
      armed.update(expiryMs)
    }
  }

  /** Bootstrap-from-batch (i22): seed the key's open session from a
    * warehouse-computed state row — the migration shape that starts a
    * streaming job from a snapshot WITHOUT replaying history. The seeded
    * session behaves exactly like one built from streamed rows: its timer
    * is armed at `last + gap`, so a user who never appears in the stream
    * still closes by watermark, and a suffix event either extends it or
    * proves the gap and closes it. State row: (startUs, lastUs, nEvents).
    */
  override def handleInitialState(
      user: Long,
      initial: (Long, Long, Long),
      timerValues: TimerValues): Unit = {
    sess.update(initial)
    rearm(initial._2)
  }

  override def handleInputRows(
      user: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    val sorted = rows.map { case (_, ts, eid) => (ts, eid) }.toSeq.sortBy(identity)
    val out = Seq.newBuilder[(Long, Long, Long, Long)]
    var cur = if (sess.exists()) sess.get() else null
    sorted.foreach { case (ts, _) =>
      cur match {
        case null => cur = (ts, ts, 1L)
        case (st, last, n) =>
          if (ts - last > gapUs) { // gap exceeded: close and reopen
            out += ((user, st, last, n))
            cur = (ts, ts, 1L)
          } else {
            cur = (st, math.max(last, ts), n + 1L)
          }
      }
    }
    if (cur != null) {
      sess.update(cur)
      rearm(cur._2)
    }
    out.result().iterator
  }

  override def handleExpiredTimer(
      user: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
    // fire only if this expiry is still the armed one (a newer event may
    // have re-armed the timer in this same batch before timers ran)
    val exp = expiredTimerInfo.getExpiryTimeInMs
    if (sess.exists() && armed.exists() && armed.get() == exp) {
      val (st, last, n) = sess.get()
      sess.clear(); armed.clear()
      Iterator.single((user, st, last, n))
    } else Iterator.empty
  }
}
