package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Streams

/** Structured Streaming ↔ batch equivalence: the same event-time logic
  * (SURVEY §7.5) produces the same answers whether events arrive as a
  * bounded DataFrame or through readStream. Streaming runs use the
  * memory sink + processAllAvailable (synchronous local drain).
  */
class StreamingSpec extends SparkSpec {

  private lazy val events = Tables(spark, sf, "events")

  test("tumblingHourly (batch mode) agrees with Q22's bucket counts") {
    val streamShaped = Streams.tumblingHourly(events)
      .withColumn("bucket", expr("unix_micros(cast(window_start as timestamp)) div 3600000000"))
      .select("bucket", "event_type", "n")
    val q22 = SparkEntry.queries("q22_tumbling_window")(spark, sf)
      .select("bucket", "event_type", "n")
    assert(streamShaped.exceptAll(q22).isEmpty && q22.exceptAll(streamShaped).isEmpty)
  }

  test("hoppingHalfHour (batch mode) agrees with Q62's hopping windows") {
    val streamShaped = Streams.hoppingHalfHour(events)
      .withColumn("ws", expr("unix_micros(cast(window_start as timestamp))"))
      .select("ws", "event_type", "n", "sumv")
    val q62 = SparkEntry.queries("q62_hopping_window")(spark, sf)
      .select("ws", "event_type", "n", "sumv")
    assert(streamShaped.exceptAll(q62).isEmpty && q62.exceptAll(streamShaped).isEmpty)
  }

  test("sessionized (batch mode) agrees with Q23's session counts per user") {
    val bySession = Streams.sessionized(events)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), max(col("session_len")).as("max_len"))
    val q23 = SparkEntry.queries("q23_sessionize")(spark, sf)
    val a = bySession.select("user_id", "n_sessions", "max_len")
    assert(a.exceptAll(q23).isEmpty && q23.exceptAll(a).isEmpty)
  }

  test("flatMapGroupsWithState sessionizer agrees with Q23") {
    import spark.implicits._
    import graft.streaming.StatefulSessions
    val evs = events
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp)) as eus")
      .as[StatefulSessions.Event]
    val sessions = StatefulSessions.sessionize(spark, evs)
    val agg = sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), max(col("n_events")).as("max_len"))
      .select("user_id", "n_sessions", "max_len")
    val q23 = SparkEntry.queries("q23_sessionize")(spark, sf)
    assert(agg.exceptAll(q23).isEmpty && q23.exceptAll(agg).isEmpty)
  }

  test("append-dir stream: watermark closes windows, drops late data") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream_append").toString
    def writeBatch(n: Int, rows: Seq[(Long, String)]): Unit =
      rows.toDF("eus", "event_type")
        .select(expr("timestamp_micros(eus)").as("ts"), col("event_type"))
        .coalesce(1).write.parquet(s"$dir/b$n")
    def us(h: Int, m: Int): Long = (h * 3600L + m * 60L) * 1000000L
    // batch 1: two events in [00:00,01:00) + one at 02:30 that will push
    // the watermark (1h delay) past W0's end
    writeBatch(1, Seq(us(0, 10) -> "click", us(0, 20) -> "click", us(2, 30) -> "click"))
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(s"$dir/b*")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(expr("unix_micros(cast(w.start as timestamp))").as("ws"), col("n"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      q.processAllAvailable() // batch 1: watermark advances to 01:30
      // batch 2: a LATE event for W0 (00:15 < watermark) that must be
      // dropped, plus 04:00 to advance the watermark further
      writeBatch(2, Seq(us(0, 15) -> "late", us(4, 0) -> "click"))
      q.processAllAvailable()
      // batch 3: push the watermark past every earlier window
      writeBatch(3, Seq(us(6, 0) -> "click"))
      q.processAllAvailable()
      val out = spark.table("late_out").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // W0 closed with ONLY the two on-time events — the late 00:15
      // arrival after the watermark passed was discarded
      assert(out.get(us(0, 0)).contains(2L),
        s"window [00:00,01:00) must close with 2 on-time rows, got $out")
      // the 02:30 event's window closed intact
      assert(out.get(us(2, 0)).contains(1L), s"missing [02:00,03:00) in $out")
      // no window ever emitted twice (append-mode contract)
      val emitted = spark.table("late_out").groupBy("ws").count()
        .filter(col("count") > 1).count()
      assert(emitted == 0, "append mode must emit each closed window once")
    } finally q.stop()
  }

  test("streaming exact dedup: cross-batch duplicates dropped within watermark") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream_dedup").toString
    def writeBatch(n: Int, rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("doc_id", "text", "eus")
        .select(col("doc_id"), col("text"), expr("timestamp_micros(eus)").as("ts"))
        .coalesce(1).write.parquet(s"$dir/b$n")
    // keep event times well past epoch 0: the initial watermark is 0,
    // and a row AT the watermark is boundary-expired by the dedup state
    def us(m: Int): Long = (24 * 3600L + m * 60L) * 1000000L
    writeBatch(1, Seq((1L, "alpha", us(0)), (2L, "beta", us(10))))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    // the L3 exact-dedup op lifted to a stream: state bounded by the
    // watermark instead of unbounded key memory — the 100 TB posture
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(s"$dir/b*")
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("text")
      .select("doc_id", "text")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      // batch 2: doc 3 re-sends "alpha" within the watermark → dropped;
      // doc 4 is new
      writeBatch(2, Seq((3L, "alpha", us(20)), (4L, "gamma", us(30))))
      q.processAllAvailable()
      val got = spark.table("dedup_out").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSet
      assert(got == Set(1L -> "alpha", 2L -> "beta", 4L -> "gamma"),
        s"duplicate text must be dropped across micro-batches, got $got")
    } finally q.stop()
  }

  test("file sink + checkpoint: stop/restart is exactly-once (no dup, no loss)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("stream_eos")
    val (inDir, outDir, ckpt) =
      (s"$root/in", s"$root/out", s"$root/ckpt")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    def writeBatch(n: Int, rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "v").coalesce(1).write.parquet(s"$inDir/b$n")
    def runOnce(): Unit = {
      val q = graft.streaming.Streams.fileToFile(spark, s"$inDir/b*", schema,
        _.withColumn("v2", upper(col("v"))), outDir, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    writeBatch(1, Seq(1L -> "a", 2L -> "b"))
    runOnce() // first life of the query
    writeBatch(2, Seq(3L -> "c", 4L -> "d"))
    runOnce() // restarted from the same checkpoint: resumes, no replay
    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "a", "A"), (2L, "b", "B"), (3L, "c", "C"), (4L, "d", "D")),
      s"file sink must deliver each row exactly once across restart, got $got")
    // the sink's transaction log is what makes the guarantee: it exists
    // and journals both lives' commits
    assert(new java.io.File(s"$outDir/_spark_metadata").list().nonEmpty)
  }

  test("foreachBatch: batch-id-keyed overwrite makes replays idempotent") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("stream_feb")
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    Seq(1L -> "x", 2L -> "y").toDF("id", "v")
      .coalesce(1).write.parquet(s"$inDir/b1")
    def runOnce(): Unit = {
      val q = graft.streaming.Streams.foreachBatchParquet(spark, s"$inDir/b*",
        schema, identity, outDir, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    Seq(3L -> "z").toDF("id", "v").coalesce(1).write.parquet(s"$inDir/b2")
    runOnce() // restart: the committed batch is NOT re-delivered
    def readAll(): Set[Long] = spark.read
      .option("basePath", outDir).parquet(outDir)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(readAll() == Set(1L, 2L, 3L))
    // simulate an uncommitted-batch REPLAY: re-writing a batch's keyed
    // path (what a restarted query does for an in-flight batch id)
    // leaves the total unchanged — overwrite, not append
    Seq(1L -> "x", 2L -> "y").toDF("id", "v")
      .write.mode("overwrite").parquet(s"$outDir/batch_id=0")
    assert(readAll() == Set(1L, 2L, 3L),
      "batch-id overwrite must be idempotent under replay")
  }

  test("true streaming run: readStream → tumbling agg → memory sink") {
    // readStream requires an explicit file schema; take it from the
    // file itself and normalize ts exactly as the judged batch reads
    // do (Tables.normalizeEvents handles either testdata generation —
    // ns-as-long or native µs timestamp).
    val fileSchema = spark.read.parquet(s"$sf/events.parquet").schema
    // readStream requires a directory source; stage the single file
    val streamDir = java.nio.file.Files.createTempDirectory("stream_src")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = Tables.normalizeEvents(
      spark.readStream.schema(fileSchema).parquet(streamDir.toString))
      // watermarks require TIMESTAMP, not NTZ; UTC session ⇒ same values
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
    val q = Streams.tumblingHourly(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumbling_out")
        .withColumn("bucket", expr("unix_micros(cast(window_start as timestamp)) div 3600000000"))
        .select("bucket", "event_type", "n")
      val batch = SparkEntry.queries("q22_tumbling_window")(spark, sf)
        .select("bucket", "event_type", "n")
      assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join matches batch; watermarked state bounds") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("stream_ssj")
    def writeRows(sub: String, n: Int, rows: Seq[(Long, Long)], ts: String): Unit =
      rows.toDF("ad_id", "eus")
        .select(col("ad_id"), expr("timestamp_micros(eus)").as(ts))
        .coalesce(1).write.parquet(s"$root/$sub/b$n")
    def us(m: Int): Long = (24 * 3600L + m * 60L) * 1000000L
    // impressions at 00 and 30; clicks at +5 (match), +12 (outside the
    // 10-minute window), +35 (matches the second impression)
    writeRows("imp", 1, Seq(1L -> us(0), 1L -> us(30), 2L -> us(0)), "its")
    writeRows("clk", 1, Seq(1L -> us(5), 1L -> us(12), 1L -> us(35), 3L -> us(5)), "cts")
    def src(sub: String, ts: String) = spark.readStream
      .schema(StructType(Seq(
        StructField("ad_id", LongType), StructField(ts, TimestampType))))
      .option("pathGlobFilter", "*.parquet").parquet(s"$root/$sub/b*")
      .withWatermark(ts, "1 hour")
    val q = Streams.intervalJoin(src("imp", "its"), src("clk", "cts"),
        "ad_id", "its", "cts", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("ssj_out")
      .start()
    try {
      q.processAllAvailable()
      // a second micro-batch joins across batch boundaries too
      writeRows("clk", 2, Seq(2L -> us(8)), "cts")
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .select(col("ad_id"), expr("unix_micros(its)"), expr("unix_micros(cts)"))
        .as[(Long, Long, Long)].collect().toSet
      // exactly the in-window matches: no 12-minute click, no ad 3
      assert(got == Set((1L, us(0), us(5)), (1L, us(30), us(35)),
        (2L, us(0), us(8))), s"got $got")
      // the same operator on the materialized inputs (batch mode) agrees
      val impB = spark.read.parquet(s"$root/imp/b*")
      val clkB = spark.read.parquet(s"$root/clk/b*")
      val batch = Streams.intervalJoin(impB, clkB, "ad_id", "its", "cts", "10 minutes")
        .select(col("ad_id"), expr("unix_micros(its)"), expr("unix_micros(cts)"))
        .as[(Long, Long, Long)].collect().toSet
      assert(batch == got, s"stream and batch disagree: $batch vs $got")
    } finally q.stop()
  }

  test("left-outer interval join: unmatched rows emit nulls once watermark passes") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("stream_loj")
    def writeRows(sub: String, n: Int, rows: Seq[(Long, Long)], ts: String): Unit =
      rows.toDF("ad_id", "eus")
        .select(col("ad_id"), expr("timestamp_micros(eus)").as(ts))
        .coalesce(1).write.parquet(s"$root/$sub/b$n")
    def us(m: Int): Long = (24 * 3600L + m * 60L) * 1000000L
    // ad 1 gets a click in-window; ad 2 never does
    writeRows("imp", 1, Seq(1L -> us(0), 2L -> us(0)), "its")
    writeRows("clk", 1, Seq(1L -> us(5)), "cts")
    def src(sub: String, ts: String) = spark.readStream
      .schema(StructType(Seq(
        StructField("ad_id", LongType), StructField(ts, TimestampType))))
      .option("pathGlobFilter", "*.parquet").parquet(s"$root/$sub/b*")
      .withWatermark(ts, "1 minute")
    val q = Streams.intervalJoin(src("imp", "its"), src("clk", "cts"),
        "ad_id", "its", "cts", "10 minutes", how = "left_outer")
      .writeStream.outputMode("append").format("memory").queryName("loj_out")
      .start()
    try {
      q.processAllAvailable()
      // the outer row for ad 2 is NOT yet emitted: no-match only
      // becomes a fact when the watermark clears its join window
      val early = spark.table("loj_out")
        .filter(col("cts").isNull).count()
      assert(early == 0, "outer result must wait for the watermark")
      // a much later event on each stream advances both watermarks
      // past us(0) + 10 minutes + 1 minute delay → outer row emits
      writeRows("imp", 2, Seq(9L -> us(120)), "its")
      writeRows("clk", 2, Seq(9L -> us(240)), "cts")
      q.processAllAvailable()
      val got = spark.table("loj_out")
        .select(col("ad_id"), expr("unix_micros(its)"),
          expr("unix_micros(cts)"))
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(got.contains((1L, us(0), Some(us(5)))), s"matched row missing: $got")
      assert(got.contains((2L, us(0), None)), s"outer row missing: $got")
    } finally q.stop()
  }

  test("full-outer interval join: BOTH sides' unmatched rows emit after watermark") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("stream_foj")
    def writeRows(sub: String, n: Int, rows: Seq[(Long, Long)], ts: String): Unit =
      rows.toDF("ad_id", "eus")
        .select(col("ad_id"), expr("timestamp_micros(eus)").as(ts))
        .coalesce(1).write.parquet(s"$root/$sub/b$n")
    def us(m: Int): Long = (24 * 3600L + m * 60L) * 1000000L
    // ad 1 matches; ad 2 is a left-only impression; ad 3 a right-only click
    writeRows("imp", 1, Seq(1L -> us(0), 2L -> us(0)), "its")
    writeRows("clk", 1, Seq(1L -> us(5), 3L -> us(5)), "cts")
    def src(sub: String, ts: String) = spark.readStream
      .schema(StructType(Seq(
        StructField("ad_id", LongType), StructField(ts, TimestampType))))
      .option("pathGlobFilter", "*.parquet").parquet(s"$root/$sub/b*")
      .withWatermark(ts, "1 minute")
    val q = Streams.intervalJoin(src("imp", "its"), src("clk", "cts"),
        "ad_id", "its", "cts", "10 minutes", how = "full_outer")
      .writeStream.outputMode("append").format("memory").queryName("foj_out")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("foj_out")
        .filter(col("cts").isNull || col("its").isNull).count() == 0,
        "outer results must wait for the watermark")
      // advance both watermarks far past every join window
      writeRows("imp", 2, Seq(9L -> us(120)), "its")
      writeRows("clk", 2, Seq(9L -> us(240)), "cts")
      q.processAllAvailable()
      val got = spark.table("foj_out")
        .select(col("ad_id"), expr("unix_micros(its)"),
          expr("unix_micros(cts)"))
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      assert(got.contains((1L, Some(us(0)), Some(us(5)))), s"match missing: $got")
      assert(got.contains((2L, Some(us(0)), None)), s"left-outer missing: $got")
      assert(got.contains((3L, None, Some(us(5)))), s"right-outer missing: $got")
    } finally q.stop()
  }

  test("right-outer interval join: unmatched RIGHT rows keep a non-null key") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("stream_roj")
    def writeRows(sub: String, n: Int, rows: Seq[(Long, Long)], ts: String): Unit =
      rows.toDF("ad_id", "eus")
        .select(col("ad_id"), expr("timestamp_micros(eus)").as(ts))
        .coalesce(1).write.parquet(s"$root/$sub/b$n")
    def us(m: Int): Long = (24 * 3600L + m * 60L) * 1000000L
    // ad 1 matches; ad 3 is a right-only click — its key lives on the
    // RIGHT side only, so the coalesced output key must be non-null
    writeRows("imp", 1, Seq(1L -> us(0)), "its")
    writeRows("clk", 1, Seq(1L -> us(5), 3L -> us(5)), "cts")
    def src(sub: String, ts: String) = spark.readStream
      .schema(StructType(Seq(
        StructField("ad_id", LongType), StructField(ts, TimestampType))))
      .option("pathGlobFilter", "*.parquet").parquet(s"$root/$sub/b*")
      .withWatermark(ts, "1 minute")
    val q = Streams.intervalJoin(src("imp", "its"), src("clk", "cts"),
        "ad_id", "its", "cts", "10 minutes", how = "right_outer")
      .writeStream.outputMode("append").format("memory").queryName("roj_out")
      .start()
    try {
      q.processAllAvailable()
      writeRows("imp", 2, Seq(9L -> us(120)), "its")
      writeRows("clk", 2, Seq(9L -> us(240)), "cts")
      q.processAllAvailable()
      val got = spark.table("roj_out")
        .select(col("ad_id"), expr("unix_micros(its)"), expr("unix_micros(cts)"))
        .as[(Option[Long], Option[Long], Long)].collect().toSet
      assert(got.contains((Some(1L), Some(us(0)), us(5))), s"match missing: $got")
      assert(got.contains((Some(3L), None, us(5))),
        s"right-unmatched row must carry its key: $got")
      assert(!got.exists(_._1.isEmpty), s"NULL key leaked: $got")
      // batch-mode formulation of the same operator agrees (modulo the
      // watermark-advancer key 9, whose join window the stream has not
      // closed yet — outer emission waits for the watermark)
      val batch = Streams.intervalJoin(
          spark.read.parquet(s"$root/imp/b*"),
          spark.read.parquet(s"$root/clk/b*"),
          "ad_id", "its", "cts", "10 minutes", how = "right_outer")
        .select(col("ad_id"), expr("unix_micros(its)"), expr("unix_micros(cts)"))
        .as[(Option[Long], Option[Long], Long)].collect().toSet
      assert(batch.filterNot(_._1.contains(9L)) == got.filterNot(_._1.contains(9L)),
        s"stream and batch disagree: $batch vs $got")
    } finally q.stop()
  }

  test("stream-static enrichment join: per-batch dim join, stateless, matches batch") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("enrich")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("v", LongType)))
    def writeBatch(n: Int, rows: Seq[(Long, Long)]): Unit =
      rows.toDF("user_id", "v").coalesce(1).write.parquet(s"$root/in/b$n")
    writeBatch(1, Seq((1L, 10L), (2L, 20L), (9L, 90L))) // 9 has no dim row
    val dim = Seq((1L, "gold"), (2L, "silver"), (3L, "bronze"))
      .toDF("user_id", "segment")
    val q = Streams.enrich(
        spark.readStream.schema(schema).parquet(s"$root/in/b*"), dim, "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out")
      .start()
    try {
      q.processAllAvailable()
      writeBatch(2, Seq((2L, 21L), (3L, 30L)))
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .as[(Long, Long, String)].collect().toSet
      // inner join semantics: the dimension-less user drops; both
      // micro-batches enriched against the same static snapshot
      assert(got == Set((1L, 10L, "gold"), (2L, 20L, "silver"),
        (2L, 21L, "silver"), (3L, 30L, "bronze")), s"got $got")
      // stateless: a stream-static join holds NO state store
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static join must not allocate a state store")
      // mode-agnostic: same operator on the materialized input agrees
      val batch = Streams.enrich(spark.read.parquet(s"$root/in/b*"), dim, "user_id")
        .as[(Long, Long, String)].collect().toSet
      assert(batch == got, s"stream and batch disagree: $batch vs $got")
      // and the batch plan broadcasts the dim (the stream side never shuffles)
      val plan = Streams.enrich(spark.read.parquet(s"$root/in/b*"), dim, "user_id")
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"dim must broadcast:\n$plan")
    } finally q.stop()
  }
}
