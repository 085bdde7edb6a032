package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source layer: the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's ingest surface — Parquet scan of a file or glob
  * (`taxi_pipeline_native.py:43-46,125,164`) with schema inferred from
  * footers — plus the one normalization the judged data needs:
  * `events.ts` is TIMESTAMP(NANOS) in the file; Spark 4 reads it (only)
  * as a long when `spark.sql.legacy.parquet.nanosAsLong=true`, so we
  * truncate ns → µs and expose a TIMESTAMP_NTZ, which is exactly what
  * DuckDB's reader produces (TIMESTAMP_NS → TIMESTAMP truncation), per
  * SURVEY §2.4 rule 2.
  */
object Tables {

  /** Star-schema + event/LLM tables shipped at every scale factor. */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The eight tables TESTDATA.md lists (Q01's inventory). */
  val core: Seq[String] = all.take(8)

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = read(spark, s"$sfDir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** Plain parquet read; path may be a single file, directory, or glob —
    * Spark unions multi-file scans natively into one FileSourceScanExec
    * (reference O1, `taxi_pipeline_native.py:43-46`).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path)
  }

  /** `ts` → TIMESTAMP_NTZ regardless of the file's physical encoding,
    * matching the DuckDB oracle's read of the same file. Handles both
    * testdata generations: TIMESTAMP(NANOS) surfaces as a ns long
    * (truncate to µs — UTC session ⇒ value-preserving), TIMESTAMP(µs)
    * arrives as a native timestamp (cast only). Public because stream
    * readers of the events table (which must declare a file schema)
    * need the SAME normalization to agree with the judged batch
    * queries.
    */
  def normalizeEvents(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    else
      df.withColumn("ts", expr("cast(ts as timestamp_ntz)"))

  /** Register every table of a scale-factor dir as a temp view so the
    * SQL frontend (`spark.sql`) sees the same catalog the DataFrame API
    * does (reference O16/O17, `taxi_pipeline_native.py:165-171`).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
