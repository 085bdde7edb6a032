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

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** In-memory rows source (reference O26, `utils/check_pyspark.py:15-16`). */
  def inMemory[T <: Product : org.apache.spark.sql.Encoder](
      spark: SparkSession, rows: Seq[T]): DataFrame = {
    spark.createDataset(rows).toDF()
  }
}
