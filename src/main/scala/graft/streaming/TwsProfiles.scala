package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Rolling per-user profile on `transformWithState`, exercising the
  * two composite state primitives the API adds over
  * `flatMapGroupsWithState`'s single blob:
  *
  *   - `MapState[event_type → count]` — per-key sub-keyed counters the
  *     store reads/writes POINTWISE (`updateValue(k)` touches one map
  *     entry, not a serialized whole — the difference between O(1) and
  *     O(|map|) per event when a user has thousands of distinct types);
  *   - `ListState[event_time]` — the last-N recency buffer, rewritten
  *     through `put` only when it overflows.
  *
  * After each microbatch the processor emits one refreshed profile row
  * per user seen in that batch (totals are monotone, so "latest row
  * per user" is the converged answer — the same emit discipline as an
  * incremental-view sink). Determinism: events are processed in
  * (event_time, within-batch) order; `top_type` ties break
  * lexicographically.
  */
object TwsProfiles {

  case class Evt(user_id: Long, event_type: String, eus: Long)
  case class Profile(user_id: Long, n_total: Long, n_types: Long,
      top_type: String, top_n: Long, recent: Seq[Long])

  val RecentN = 3

  class ProfileProcessor extends StatefulProcessor[Long, Evt, Profile] {

    @transient private var counts: MapState[String, Long] = _
    @transient private var recent: ListState[Long] = _
    @transient private var total: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getListState[Long](
        "recent", Encoders.scalaLong, TTLConfig.NONE)
      total = getHandle.getValueState[Long](
        "total", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Evt],
        tv: TimerValues): Iterator[Profile] = {
      val sorted = rows.toArray.sortBy(_.eus)
      if (sorted.isEmpty) return Iterator.empty
      sorted.foreach { e =>
        val c = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, c + 1)
        recent.appendValue(e.eus)
      }
      // bound the recency buffer: rewrite only on overflow
      val buf = recent.get().toArray
      if (buf.length > RecentN) recent.put(buf.takeRight(RecentN))
      val newTotal = (if (total.exists()) total.get() else 0L) + sorted.length
      total.update(newTotal)
      val (topT, topN) = counts.iterator().toArray
        .minBy { case (t, n) => (-n, t) } // max count, lexicographic tiebreak
      Iterator.single(Profile(user, newTotal, counts.keys().size.toLong,
        topT, topN, recent.get().toArray.takeRight(RecentN).toSeq))
    }
  }

  def profiles(events: Dataset[Evt]): Dataset[Profile] = {
    implicit val enc = Encoders.product[Profile]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new ProfileProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
