package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.TwsTtlCounts

/** State TTL on transformWithState: the expiring counter forgets after
  * the TTL elapses, while the no-TTL control state in the SAME
  * processor (same key, same batches) keeps accumulating — isolating
  * exactly the TTL behavior from everything else.
  *
  * The TTL clock is wall time, not query uptime, so the spec lets it
  * lapse with the query STOPPED and restarts from the checkpoint:
  * batch 2 runs in a second query life. Each life runs under
  * `Trigger.Once` — exactly one micro-batch, then unconditional
  * self-termination. A TimeMode.ProcessingTime query under any
  * open-ended trigger (default, ProcessingTime, even AvailableNow)
  * always schedules a follow-up batch — that is how TTL sweeps and
  * processing-time timers fire with no new data — so it never latches
  * "done": `processAllAvailable` blocks forever and AvailableNow never
  * self-terminates (both observed empirically; hundreds of empty
  * batches). The stop/restart shape is also the stronger claim: TTL
  * applies to state recovered from a checkpoint, not just state held
  * in memory.
  */
class TwsTtlSpec extends SparkSpec {

  test("TTL state expires across a restart; no-TTL state persists") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val ttlMs = 1000L
      val ckpt = Files.createTempDirectory("graft_tws_ttl").toString
      val in = MemoryStream[Long]
      // foreachBatch, not the memory sink: only sinks with a commit log
      // can recover from a checkpoint, and life 2 must restart from it
      def drainLife(): Seq[TwsTtlCounts.Counts] = {
        val buf = new scala.collection.concurrent.TrieMap[TwsTtlCounts.Counts, Unit]
        val q = TwsTtlCounts.counts(in.toDS(), ttlMs).writeStream
          .foreachBatch { (df: org.apache.spark.sql.Dataset[TwsTtlCounts.Counts], _: Long) =>
            df.collect().foreach(c => buf.put(c, ()))
          }
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.Once())
          .start()
        try {
          assert(q.awaitTermination(120000L), "Trigger.Once life must stop")
          buf.keys.toSeq
        } finally q.stop()
      }

      // life 1: both states count
      in.addData(1L, 1L, 2L)
      val rows1 = drainLife()

      Thread.sleep(ttlMs * 3) // TTL lapses while no query runs

      // life 2: recovered-from-checkpoint TTL state has expired
      in.addData(1L, 2L)
      val rows2 = drainLife()

      // batch 1: both states agree
      assert(rows1.exists(c => c.user_id == 1L && c.ttl_n == 2L && c.forever_n == 2L))
      assert(rows1.exists(c => c.user_id == 2L && c.ttl_n == 1L && c.forever_n == 1L))
      // batch 2: ttl_n restarted from empty, forever_n kept counting
      assert(rows2.exists(c => c.user_id == 1L && c.ttl_n == 1L && c.forever_n == 3L),
        s"user 1 TTL state should have expired; got ${rows2.toSeq}")
      assert(rows2.exists(c => c.user_id == 2L && c.ttl_n == 1L && c.forever_n == 2L),
        s"user 2 TTL state should have expired; got ${rows2.toSeq}")

      // offline confirmation via the statestore reader: the persisted
      // no-TTL state variable holds the lifetime counts — per-variable
      // inspection of a transformWithState checkpoint, query not running
      val forever = spark.read.format("statestore")
        .option("stateVarName", "forever_n")
        .load(ckpt)
      val persisted = forever
        .selectExpr("key.value as user_id", "value.value as n")
        .as[(Long, Long)].collect().toMap
      assert(persisted == Map(1L -> 3L, 2L -> 2L),
        s"checkpointed forever_n must hold lifetime counts; got $persisted")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
