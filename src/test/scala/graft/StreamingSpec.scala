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

  test("true streaming run: readStream → tumbling agg → memory sink") {
    // ns-timestamp parquet arrives as long under nanosAsLong; declare the
    // file schema explicitly (required for readStream) and convert.
    val fileSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // readStream requires a directory source; stage the single file
    val streamDir = java.nio.file.Files.createTempDirectory("stream_src")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(fileSchema)
      .parquet(streamDir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
}
