package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{StatefulSessions, TwsTimerSessions}

/** Event-time timers on `transformWithState`: idle sessions must close
  * when the WATERMARK passes `last + gap` — no further event for the
  * key, no sentinel. One far-future event from a dummy key advances the
  * watermark; every real user's final session must then be emitted by
  * `handleExpiredTimer`, and the result must equal the batch reference.
  */
class TwsTimerSessionsSpec extends SparkSpec {

  test("event-time timers close idle sessions at the watermark") {
    import spark.implicits._
    // ms-truncate event times so the streaming Timestamp (ms) and the
    // µs batch reference see identical instants
    val events = Tables(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp)) as eus")
      .as[StatefulSessions.Event].collect()
      .map(e => StatefulSessions.Event(e.user_id, e.eus - e.eus % 1000))
      .sortBy(e => (e.eus, e.user_id)).toSeq
    val maxUs = events.map(_.eus).max
    val dummy = TwsTimerSessions.EventT(-1L, new Timestamp(maxUs / 1000 + 10L * 86400 * 1000))

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[TwsTimerSessions.EventT]
      val q = TwsTimerSessions
        .sessionize(in.toDS().withWatermark("ts", "0 seconds"))
        .writeStream.format("memory").queryName("tws_timer_sessions")
        .outputMode("append").start()
      try {
        in.addData(events.map(e =>
          TwsTimerSessions.EventT(e.user_id, new Timestamp(e.eus / 1000))))
        q.processAllAvailable()
        in.addData(Seq(dummy)) // watermark jumps 10 days -> all timers fire
        q.processAllAvailable()
      } finally q.stop()

      val got = spark.table("tws_timer_sessions").filter("user_id >= 0")
      val expected =
        StatefulSessions.sessionize(spark, spark.createDataset(events)).toDF()
      assert(got.count() > 0, "timer run must emit sessions")
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        "timer-closed sessions must equal the batch reference")
      // the dummy key's own session is still open: never emitted
      assert(spark.table("tws_timer_sessions").filter("user_id < 0").count() == 0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
