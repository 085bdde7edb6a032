package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The PRODUCTION close path for `transformWithState` sessions:
  * event-time TIMERS instead of [[TwsSessions]]' sentinel flush. Each
  * update (re)arms one timer at `last + gap`; when the watermark passes
  * it, `handleExpiredTimer` emits the session and clears state — idle
  * keys close WITHOUT ever seeing another event, which is the behavior
  * a real stream needs (a user who walks away still gets their session
  * emitted one gap later). This is the capability `flatMapGroups-
  * WithState` only approximates via `GroupStateTimeout`; the new API
  * makes the timer a first-class, per-key re-armable object.
  *
  * State/timer discipline: exactly ONE armed timer per key (the old
  * one is deleted before re-arming) — timer count stays O(keys), not
  * O(events), the invariant that matters at 100 M keys. Timestamps in
  * timers are MILLISECONDS (the API contract); session bounds stay in
  * µs in state, rounding the timer UP so a timer can never fire a
  * fraction early and close a still-open session.
  */
object TwsTimerSessions {

  import StatefulSessions.{Session, SessionState}

  /** Timestamped input row (event-time column required for watermarks). */
  case class EventT(user_id: Long, ts: Timestamp)

  class TimerSessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, EventT, Session] {

    @transient private var open: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionState](
        "open", Encoders.product[SessionState], TTLConfig.NONE)

    private def disarm(): Unit =
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))

    private def arm(lastUs: Long): Unit =
      // µs → ms rounded UP: the timer must not fire before last+gap
      getHandle.registerTimer((lastUs + gapUs + 999L) / 1000L)

    override def handleInputRows(user: Long, rows: Iterator[EventT],
        tv: TimerValues): Iterator[Session] = {
      val sorted = rows.map(e => e.ts.getTime * 1000L +
        (e.ts.getNanos / 1000) % 1000L).toArray.sorted
      val out = collection.mutable.ArrayBuffer.empty[Session]
      sorted.foreach { t =>
        val cur = if (open.exists()) Some(open.get()) else None
        cur match {
          case None =>
            open.update(SessionState(t, t, 1))
          case Some(s) if t - s.last > gapUs =>
            out += Session(user, s.start, s.last, s.n)
            open.update(SessionState(t, t, 1))
          case Some(s) =>
            open.update(SessionState(s.start, t, s.n + 1))
        }
      }
      if (open.exists()) { disarm(); arm(open.get().last) }
      out.iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Session] = {
      // one timer per key ⇒ an expiry always refers to the open session
      if (open.exists()) {
        val s = open.get()
        open.clear()
        Iterator.single(Session(user, s.start, s.last, s.n))
      } else Iterator.empty
    }
  }

  /** Streaming sessions, closed by watermark. Callers must have set a
    * watermark on `events`' `ts` column (the runtime enforces it for
    * `TimeMode.EventTime`).
    */
  def sessionize(events: Dataset[EventT],
      gapUs: Long = StatefulSessions.DefaultGapUs): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new TimerSessionProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
