package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Sessionization on the Spark 4 `transformWithState` API — the
  * successor of `flatMapGroupsWithState` (StatefulSessions.scala) with
  * named, individually-evolvable state variables behind
  * `StatefulProcessorHandle` instead of one opaque state blob.
  *
  * Semantics are identical to [[StatefulSessions.sessionize]] (same
  * Event/Session/SessionState types, same gap rule: an event more than
  * `gapUs` after the last closes the session), so the spec can assert
  * the two APIs agree row-for-row. State per user = the one open
  * session in a `ValueState`; a closed session is emitted the moment
  * the closing event arrives, which keeps per-key state O(1) no matter
  * how long the stream runs — the property that matters when the key
  * space is 100 M users.
  *
  * The runtime requires the RocksDB state-store provider (the feature
  * gate Spark itself enforces); callers set
  * `spark.sql.streaming.stateStore.providerClass` before starting the
  * query — see the spec. Flushing: `transformWithState` under
  * `TimeMode.None` has no timers, so open sessions only close on a
  * later event; a caller that needs end-of-stream flush sends one
  * sentinel event per key at `FlushUs` (closes anything open without
  * opening a new session). Event-time timers (`TimeMode.EventTime`)
  * are the production close-at-watermark path.
  */
object TwsSessions {

  import StatefulSessions.{Event, Session, SessionState}

  /** Sentinel event time: closes the open session for its key without
    * starting a new one (a real event can never carry Long.MaxValue µs).
    */
  val FlushUs: Long = Long.MaxValue

  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, Event, Session] {

    @transient private var open: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionState](
        "open", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[Session] = {
      // within a microbatch rows arrive unordered — sort by event time;
      // cross-batch order is the caller's feeding discipline (same
      // contract as StatefulSessions batch mode)
      val sorted = rows.map(_.eus).toArray.sorted
      val out = collection.mutable.ArrayBuffer.empty[Session]
      sorted.foreach { t =>
        val cur = if (open.exists()) Some(open.get()) else None
        (cur, t) match {
          case (None, FlushUs) => // flush with nothing open: no-op
          case (None, _) =>
            open.update(SessionState(t, t, 1))
          case (Some(s), FlushUs) =>
            out += Session(user, s.start, s.last, s.n)
            open.clear()
          case (Some(s), _) if t - s.last > gapUs =>
            out += Session(user, s.start, s.last, s.n)
            open.update(SessionState(t, t, 1))
          case (Some(s), _) =>
            open.update(SessionState(s.start, t, s.n + 1))
        }
      }
      out.iterator
    }
  }

  /** The transform itself — compose onto a streaming (or batch)
    * `Dataset[Event]`. Emits each session once, when it closes.
    */
  def sessionize(events: Dataset[Event],
      gapUs: Long = StatefulSessions.DefaultGapUs): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor(gapUs),
        TimeMode.None(), OutputMode.Append())
  }
}
