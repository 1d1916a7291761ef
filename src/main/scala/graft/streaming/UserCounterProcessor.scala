package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** SURVEY §2 I6 on the Spark 4.x arbitrary-state API: running per-user event
  * counters via `transformWithState`, with an EVENT-TIME idle timeout — when
  * the watermark passes a user's last activity plus `idleTimeoutMs`, the
  * registered timer fires, the counter state is dropped, and a `-1` tombstone
  * row marks the eviction. That bounds state to the active-user set: on an
  * unbounded user population (the 100 TB concern with the old NoTimeout
  * formulation) idle keys are reclaimed instead of leaking forever.
  *
  * Input: (user_id, event ts). Output: (user_id, running count), or
  * (user_id, -1) when the idle timer evicts the user.
  */
class UserCounterProcessor(idleTimeoutMs: Long)
    extends StatefulProcessor[Long, (Long, Timestamp), (Long, Long)] {

  @transient private var count: ValueState[Long] = _
  // the currently-registered timer, so re-activity can re-arm it
  @transient private var timer: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
    timer = getHandle.getValueState[Long]("timer", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      user: Long,
      rows: Iterator[(Long, Timestamp)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    var n = 0L
    var lastSeen = Long.MinValue
    rows.foreach { case (_, ts) =>
      n += 1
      if (ts.getTime > lastSeen) lastSeen = ts.getTime
    }
    val c = (if (count.exists()) count.get() else 0L) + n
    count.update(c)
    if (timer.exists()) getHandle.deleteTimer(timer.get())
    val expiry = lastSeen + idleTimeoutMs
    getHandle.registerTimer(expiry)
    timer.update(expiry)
    Iterator.single((user, c))
  }

  override def handleExpiredTimer(
      user: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long)] = {
    count.clear()
    timer.clear()
    Iterator.single((user, -1L))
  }
}
