package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Non-parquet sources/sinks from the L2 capability checklist
  * (SURVEY §2.2: "CSV/JSON read — Ibis/DuckDB both expose; unused in the
  * reference"). Thin, typed wrappers over Spark's native readers — the
  * schema-inference / pushdown behavior is Catalyst's.
  */
object Sources {

  def csv(spark: SparkSession, path: String, header: Boolean = true,
      inferSchema: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path)

  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** ORC — the second columnar format Spark ships natively (predicate
    * pushdown + column pruning work the same as parquet).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** In-memory rows source (reference O26, `utils/check_pyspark.py:15-16`). */
  def inMemory[T <: Product : org.apache.spark.sql.Encoder](
      spark: SparkSession, rows: Seq[T]): DataFrame = {
    spark.createDataset(rows).toDF()
  }

  // ------------------------------------------------------- cloud storage

  /** Cloud object storage (reference roadmap `README.md:96` "cloud
    * storage support"): every reader in this engine goes through
    * Spark's Hadoop-FS path resolution, so `s3a://bucket/...` and
    * `gs://bucket/...` URIs work UNCHANGED once the connector jars
    * (hadoop-aws / gcs-connector) are on the classpath — there is no
    * separate cloud code path to maintain. This helper applies the
    * standard connector configuration to a session; [[cloudReadable]]
    * reports whether a scheme is currently usable (connectors are not
    * bundled in the offline build, so the API shape is testable but a
    * real read needs the jars + credentials).
    *
    * Keys are the public Hadoop connector ones (fs.s3a.endpoint,
    * fs.s3a.access.key, ...) — pass exactly what your deployment needs;
    * nothing here assumes any particular provider or environment.
    */
  def configureCloud(spark: SparkSession, hadoopConf: Map[String, String]): Unit =
    hadoopConf.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }

  /** True iff `scheme://` paths can resolve a Hadoop FileSystem in this
    * session (i.e. the connector for that scheme is on the classpath).
    */
  def cloudReadable(spark: SparkSession, scheme: String): Boolean =
    try {
      org.apache.hadoop.fs.FileSystem.getFileSystemClass(
        scheme, spark.sparkContext.hadoopConfiguration)
      true
    } catch { case _: Exception => false }
}
