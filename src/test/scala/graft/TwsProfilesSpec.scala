package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.TwsProfiles

/** MapState + ListState on `transformWithState`: per-user rolling
  * profiles accumulated across two microbatches must converge to the
  * same counts / top-type / recency window a one-shot batch
  * computation produces. The per-batch emissions are monotone in
  * n_total, so the converged answer is each user's max-n_total row.
  */
class TwsProfilesSpec extends SparkSpec {

  test("MapState/ListState profiles across microbatches ≡ batch computation") {
    import spark.implicits._
    val events = Tables(spark, sf, "events")
      .selectExpr("user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as eus")
      .as[TwsProfiles.Evt].collect().sortBy(_.eus).toSeq
    val mid = events(events.length / 2).eus
    val (b1, b2) = events.partition(_.eus <= mid)

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[TwsProfiles.Evt]
      val q = TwsProfiles.profiles(in.toDS()).writeStream
        .format("memory").queryName("tws_profiles")
        .outputMode("append").start()
      try {
        in.addData(b1); q.processAllAvailable()
        in.addData(b2); q.processAllAvailable()
      } finally q.stop()

      // converged = the max-n_total emission per user
      val got = spark.table("tws_profiles")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy(col("n_total").desc)))
        .filter("rn = 1").drop("rn")
        .collect().map(r => r.getLong(0) -> r).toMap

      val byUser = events.groupBy(_.user_id)
      assert(got.size == byUser.size)
      byUser.foreach { case (u, evs) =>
        val r = got(u)
        assert(r.getLong(1) == evs.length.toLong, s"user $u n_total")
        val counts = evs.groupBy(_.event_type).view.mapValues(_.length.toLong)
        assert(r.getLong(2) == counts.size.toLong, s"user $u n_types")
        val (topT, topN) = counts.toSeq.minBy { case (t, n) => (-n, t) }
        assert(r.getString(3) == topT && r.getLong(4) == topN, s"user $u top")
        val recent = evs.sortBy(_.eus).takeRight(TwsProfiles.RecentN).map(_.eus)
        assert(r.getSeq[Long](5) == recent, s"user $u recency window")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
