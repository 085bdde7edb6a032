package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** State TTL on `transformWithState`: the mechanism that keeps
  * unbounded-keyspace state BOUNDED at corpus scale. A per-user counter
  * with a TTL simply stops existing `ttl` after its last write — no
  * timer bookkeeping, no manual sweep job, no state-size runaway when
  * 10⁹ one-visit keys pass through. TTL is wall-clock based, so it
  * requires `TimeMode.ProcessingTime`; expiry applies per state
  * variable, which lets one processor mix an expiring hot-window
  * counter with a permanent lifetime counter (exactly what the spec
  * pins: same key, same batches, one state forgets, the other does
  * not).
  */
object TwsTtlCounts {

  case class Counts(user_id: Long, ttl_n: Long, forever_n: Long)

  class CountProcessor(ttlMs: Long) extends StatefulProcessor[Long, Long, Counts] {

    @transient private var ttlN: ValueState[Long] = _
    @transient private var foreverN: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      ttlN = getHandle.getValueState[Long]("ttl_n", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))
      foreverN = getHandle.getValueState[Long]("forever_n",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Long],
        tv: TimerValues): Iterator[Counts] = {
      val k = rows.size.toLong
      if (k == 0L) return Iterator.empty
      val t = (if (ttlN.exists()) ttlN.get() else 0L) + k
      val f = (if (foreverN.exists()) foreverN.get() else 0L) + k
      ttlN.update(t)
      foreverN.update(f)
      Iterator.single(Counts(user, t, f))
    }
  }

  /** Per-user event counts: `ttl_n` forgets `ttlMs` after the user's
    * last write, `forever_n` never does.
    */
  def counts(events: Dataset[Long], ttlMs: Long): Dataset[Counts] = {
    implicit val enc = Encoders.product[Counts]
    events
      .groupByKey(identity)(Encoders.scalaLong)
      .transformWithState(new CountProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
