package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{StatefulSessions, TwsSessions}

/** The Spark 4 `transformWithState` arbitrary-state API, run as a REAL
  * multi-microbatch streaming query (MemoryStream → RocksDB state store
  * → memory sink): sessions that span the batch boundary must come out
  * identical to the single-pass `flatMapGroupsWithState` sessionizer —
  * cross-batch `ValueState` persistence is exactly what the new API
  * must get right.
  */
class TwsSessionsSpec extends SparkSpec {

  test("transformWithState sessions across microbatches ≡ flatMapGroupsWithState") {
    import spark.implicits._
    val events = Tables(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp)) as eus")
      .as[StatefulSessions.Event].collect().sortBy(e => (e.eus, e.user_id))
    // split mid-timeline so many sessions straddle the two microbatches
    val mid = events(events.length / 2).eus
    val (b1, b2) = events.partition(_.eus <= mid)
    val flush = events.map(_.user_id).distinct
      .map(u => StatefulSessions.Event(u, TwsSessions.FlushUs)).toSeq

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[StatefulSessions.Event]
      val q = TwsSessions.sessionize(in.toDS()).writeStream
        .format("memory").queryName("tws_sessions")
        .outputMode("append").start()
      try {
        in.addData(b1.toSeq); q.processAllAvailable()
        in.addData(b2.toSeq); q.processAllAvailable()
        in.addData(flush); q.processAllAvailable() // close whatever is open
      } finally q.stop()

      val got = spark.table("tws_sessions")
      val expected =
        StatefulSessions.sessionize(spark, spark.createDataset(events.toSeq)).toDF()
      assert(got.count() > 0, "streaming run must emit sessions")
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        "transformWithState sessions must equal the flatMapGroupsWithState reference")
      // agreement with the judged q23 aggregate as well
      val agg = got.groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), max(col("n_events")).as("max_len"))
        .select("user_id", "n_sessions", "max_len")
      val q23 = SparkEntry.queries("q23_sessionize")(spark, sf)
      assert(agg.exceptAll(q23).isEmpty && q23.exceptAll(agg).isEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
