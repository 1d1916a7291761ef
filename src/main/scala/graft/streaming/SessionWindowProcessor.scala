package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Timer-based replacement for Spark's built-in `session_window` streaming
  * aggregate (count per gap-session), with IDENTICAL append-mode semantics —
  * the executable target of [[graft.plans.GraftSessionRewriteRule]] (i3b).
  *
  * The built-in plans UpdatingSessions/MergingSessions execs that sort and
  * re-serialize every key's sessions through the state store per micro-batch
  * — measured 145 s at sf10 and flat in state parallelism (the r15 finding).
  * This processor keeps each key's pending sessions in ONE ListState entry
  * and arms ONE rolling event-time timer per key (at the earliest pending
  * session's end), so per-batch work is one list read + one list write +
  * at most one timer swap per ACTIVE key — the i18 cost profile. A first
  * cut kept a MapState entry and a timer PER SESSION; the per-entry RocksDB
  * writes and per-timer map scans made it 3.6× slower than the built-in at
  * sf0.1, which is why the state is one list per key.
  *
  * Semantics matched to `session_window(ts, gap)` + count in append mode:
  *  - rows merge into a session iff ts < last + gap (a gap of exactly `gap`
  *    starts a new session), in ANY arrival order — a row bridging two
  *    pending sessions merges them (counts add), exactly like the
  *    built-in's session merge;
  *  - a session is emitted once the watermark passes its end = last + gap
  *    (the timer is the ceiling ms of the µs end — never early; sub-ms
  *    boundary cases are the same 1 ms caveat i18 documents); when a key's
  *    timer fires, every pending session whose end has passed is emitted
  *    and the timer re-arms at the next pending end;
  *  - late rows behind the watermark are dropped by the engine before the
  *    processor sees them, same as the built-in.
  *
  * State is O(pending sessions per key) in one blob. Output: (key, session
  * start µs, session end µs = last + gap, n_events).
  */
class SessionWindowProcessor(gapUs: Long)
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long, Long)] {

  // pending sessions (start µs, last µs, n), one list blob per key
  @transient private var sess: ListState[(Long, Long, Long)] = _
  // expiry ms of the single armed per-key timer (rolling, i18 discipline)
  @transient private var armed: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    sess = getHandle.getListState[(Long, Long, Long)](
      "sess", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
    armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
  }

  // ceil -> the timer never fires before the µs end has passed
  private def expiryOf(lastUs: Long): Long = (lastUs + gapUs + 999L) / 1000L

  /** Keep exactly one timer per key, armed at the earliest pending end. */
  private def rearm(earliestLastUs: Option[Long]): Unit = {
    val want = earliestLastUs.map(expiryOf).getOrElse(0L)
    val prev = if (armed.exists()) armed.get() else 0L
    if (prev != want) {
      if (prev != 0L) getHandle.deleteTimer(prev)
      if (want != 0L) { getHandle.registerTimer(want); armed.update(want) }
      else armed.clear()
    }
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    val cur = mutable.TreeMap.empty[Long, (Long, Long)] // start -> (last, n)
    sess.get().foreach { case (st, la, n) => cur.put(st, (la, n)); () }
    rows.foreach { case (_, ts) =>
      var s = ts; var l = ts; var n = 1L
      // left neighbor (greatest start <= ts): merge iff ts < last + gap
      cur.rangeTo(ts).lastOption.foreach { case (st, (la, cnt)) =>
        if (ts < la + gapUs) { s = st; l = math.max(la, ts); n = cnt + 1
          cur.remove(st); () }
      }
      // right neighbors: a (possibly merged) session absorbs successors
      // while the gap bridges — counts add, the built-in's session merge
      var done = false
      while (!done) cur.rangeFrom(s + 1).headOption match {
        case Some((rs, (rl, rn))) if rs < l + gapUs =>
          cur.remove(rs); l = math.max(l, rl); n += rn
        case _ => done = true
      }
      cur.put(s, (l, n))
      ()
    }
    sess.clear()
    if (cur.nonEmpty)
      sess.appendList(cur.iterator.map { case (st, (la, n)) => (st, la, n) }.toArray)
    rearm(if (cur.isEmpty) None else Some(cur.valuesIterator.map(_._1).min))
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
    // seal against the CURRENT WATERMARK, not the fired expiry: the single
    // rolling timer was armed at the EARLIEST end, and a timer registered
    // during this batch cannot fire until a later one — gating on the fired
    // expiry would emit one session per key per batch and strand the rest
    val wm = timerValues.getCurrentWatermarkInMs()
    val all = sess.get().toSeq
    val (ready, pending) = all.partition { case (_, la, _) => expiryOf(la) <= wm }
    if (ready.nonEmpty) {
      sess.clear()
      if (pending.nonEmpty) sess.appendList(pending.toArray)
    }
    if (armed.exists() && armed.get() == expiredTimerInfo.getExpiryTimeInMs)
      armed.clear()
    rearm(if (pending.isEmpty) None else Some(pending.map(_._2).min))
    ready.sortBy(_._1).iterator
      .map { case (st, la, n) => (key, st, la + gapUs, n) }
  }
}
