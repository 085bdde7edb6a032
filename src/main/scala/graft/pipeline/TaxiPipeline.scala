package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

import graft.Canonical.avg4
import graft.Tables

/** The reference pipeline re-expressed Spark-first: the 4-asset DAG of
  * `taxi_pipeline_native.py:180-191` — glob-ingest → single-file export
  * → the analytics question answered twice (DataFrame API and SQL text,
  * converging on one Catalyst plan; the reference runs it on two engines
  * to the same end, README.md:103-105).
  *
  * The analytics question (`taxi_pipeline_native.py:92-97`): "for trips
  * with a fare over $50, what is the average fare by passenger count?"
  */
final class TaxiPipeline(srcGlob: String, exportFile: String) {
  private val log = LoggerFactory.getLogger(classOf[TaxiPipeline])

  @volatile var exportedBytes: Long = -1L
  @volatile var ingestedRows: Long = -1L
  @volatile var dfResult: Array[org.apache.spark.sql.Row] = Array.empty
  @volatile var sqlResult: Array[org.apache.spark.sql.Row] = Array.empty

  /** filter → group → avg, the reference query shape (O7-O9). */
  def analysis(trips: DataFrame): DataFrame =
    trips.filter(col("fare_amount") > 50)
      .groupBy("passenger_count")
      .agg(avg4(col("fare_amount")).as("avg_fare"))
      .orderBy(asc_nulls_first("passenger_count"))

  val ingest: Asset = Asset("ingest_taxi_data")( { spark =>
    val df = Tables.read(spark, srcGlob)
    df.createOrReplaceTempView("nyc_taxi")
    ingestedRows = df.count()
    log.info(s"Ingested $ingestedRows rows into nyc_taxi")
  })

  val export: Asset = Asset("export_taxi_parquet", Seq("ingest_taxi_data"))( { spark =>
    exportedBytes = Sinks.exportSingleParquet(spark.table("nyc_taxi"), exportFile)
    log.info(f"Exported ${exportedBytes / 1e6}%.2f MB to $exportFile")
  })

  val analyzeDf: Asset = Asset("spark_analysis", Seq("export_taxi_parquet"))( { spark =>
    dfResult = analysis(Tables.read(spark, exportFile)).collect()
  })

  val analyzeSql: Asset = Asset("spark_sql_analysis", Seq("export_taxi_parquet"))( { spark =>
    Tables.read(spark, exportFile).createOrReplaceTempView("nyc_taxi_export")
    sqlResult = spark.sql(
      """SELECT passenger_count,
                ROUND(CAST(SUM(CAST(fare_amount AS DECIMAL(18,4))) AS DOUBLE)
                      / COUNT(fare_amount), 4) AS avg_fare
         FROM nyc_taxi_export
         WHERE fare_amount > 50
         GROUP BY passenger_count
         ORDER BY passenger_count ASC NULLS FIRST""").collect()
  })

  def pipeline: Pipeline = new Pipeline(Seq(ingest, export, analyzeDf, analyzeSql))

  def materialize(spark: SparkSession): Seq[AssetResult] = pipeline.materialize(spark)
}
