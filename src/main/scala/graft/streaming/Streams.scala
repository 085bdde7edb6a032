package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.Canonical.dec

/** Structured-Streaming formulations of the event-time operators
  * (SURVEY §7.5). The judged batch queries Q22/Q23 are written over
  * event-time columns precisely so the same logic lifts here without
  * semantic change: tumbling windows via `window()`, sessions via
  * `session_window()`, late data bounded by watermarks. Batch callers
  * can pass a plain DataFrame — these transforms are mode-agnostic —
  * which is also how the specs cross-check them against Q22/Q23.
  */
object Streams {

  /** 1-hour tumbling counts/sums per event_type (streaming Q22).
    * On an unbounded stream add `.withWatermark("ts", ...)` upstream;
    * output mode `append` emits each window once the watermark passes.
    */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sumv"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sumv"))

  /** Hopping (sliding) counts/sums per event_type (streaming Q62):
    * 1-hour windows every 30 minutes — each event lands in exactly
    * size/slide = 2 windows; `window()` expands membership inside the
    * operator. Same watermark/append contract as [[tumblingHourly]].
    */
  def hoppingHalfHour(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sumv"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sumv"))

  /** 30-minute-gap sessions per user (streaming Q23): Spark's native
    * `session_window` merges events whose gaps are below the timeout —
    * the same islands the batch lag+cumsum formulation finds.
    */
  def sessionized(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("session_len"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("session_len"))

  /** Stream-stream interval join: match each right event to left
    * events of the same key within `[left.ts, left.ts + within]`.
    * The time-range condition plus BOTH watermarks is what lets Spark
    * bound the join state: a buffered left row can be evicted once the
    * right watermark passes `left.ts + within`, so state is
    * O(key-rate × window), not unbounded — the only formulation that
    * survives an infinite stream. Mode-agnostic: on batch frames it is
    * a plain range-predicate equi-join (how the spec cross-checks it).
    *
    * `how = "left_outer"` additionally emits each unmatched left row
    * (null right columns) — but only once the right watermark passes
    * `left.ts + within`, the earliest moment "no match" is a fact
    * rather than a race: outer results are late by exactly the
    * watermark delay, the price of correctness on an unbounded stream.
    *
    * @param within SQL interval string, e.g. "10 minutes"
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String,
      how: String = "inner"): DataFrame = {
    val joined = left.join(right,
      left(key) === right(key) &&
        right(rightTs) >= left(leftTs) &&
        right(rightTs) <= left(leftTs) + expr(s"INTERVAL $within"),
      how)
    // any join kind that can emit a right-unmatched row carries its key
    // on the RIGHT side only — surface ONE key column that is non-null
    // for every output row (full AND right outer; inner/left keep the
    // always-populated left key)
    if (Set("full_outer", "outer", "full", "right_outer", "right")(how)) {
      val others = left.columns.filterNot(_ == key).map(left(_)) ++
        right.columns.filterNot(_ == key).map(right(_))
      joined.select(coalesce(left(key), right(key)).as(key) +: others.toSeq: _*)
    } else joined.drop(right(key))
  }

  /** Stream-static enrichment join: every micro-batch hash-joins
    * against a STATIC dimension. Stateless by construction — no
    * watermark, no state store, nothing buffered across batches (the
    * dim is re-planned each batch, so slowly-refreshed dim snapshots
    * are picked up). The explicit broadcast keeps the stream side
    * shuffle-free: at 100 TB/day the fact stream never moves, only the
    * (small) dim does. Mode-agnostic: on a batch frame it is the plain
    * broadcast equi-join the spec cross-checks against.
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), key)

  // ------------------------------------------------------------ sinks

  /** Checkpointed file-to-file pipeline: directory source → transform →
    * parquet FILE SINK. Exactly-once across restarts by construction:
    * source offsets commit to the checkpoint and the sink journals each
    * batch in its `_spark_metadata` transaction log, so a restarted
    * query (same checkpoint + output dir) resumes from the committed
    * offset and readers see every input row exactly once — no dup on
    * replay, no loss on early stop.
    */
  def fileToFile(spark: SparkSession, inDir: String, schema: StructType,
      transform: DataFrame => DataFrame, outDir: String,
      ckptDir: String): StreamingQuery =
    transform(spark.readStream.schema(schema).parquet(inDir))
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .start()

  /** foreachBatch with batch-id-keyed idempotent writes: each
    * micro-batch overwrites `outDir/batch_id=<id>`, so a replay after
    * a mid-batch failure rewrites the SAME path instead of appending a
    * duplicate — the standard recipe that upgrades foreachBatch's
    * at-least-once delivery to exactly-once effects on any sink that
    * supports keyed overwrite.
    */
  def foreachBatchParquet(spark: SparkSession, inDir: String,
      schema: StructType, transform: DataFrame => DataFrame, outDir: String,
      ckptDir: String): StreamingQuery =
    transform(spark.readStream.schema(schema).parquet(inDir))
      .writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.write.mode("overwrite").parquet(s"$outDir/batch_id=$id")
      }
      .start()
}
