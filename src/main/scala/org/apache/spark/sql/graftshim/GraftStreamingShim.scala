package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSparkSession}
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` door a V1 streaming `Source` has to use:
  * `MicroBatchExecution` asserts that the DataFrame `getBatch` returns
  * has `isStreaming = true`, and the only constructor that produces
  * such a frame from an arbitrary plan is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`.
  * Delta Lake's `DeltaSource` calls exactly this method for the same
  * reason; it is `private[sql]`, so the call must live under the
  * `org.apache.spark.sql` package. This object is that single access
  * point — nothing else in the repo reaches into Spark internals.
  */
object GraftStreamingShim {

  /** Wrap an InternalRow RDD as a streaming-tagged DataFrame. */
  def streamingFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[ClassicSparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** The inverse door, for a V1 `Sink.addBatch`: the DataFrame Spark
    * hands a sink carries a streaming-tagged plan that batch writers
    * reject — re-tag it as a batch frame over the same rows (what
    * Delta's sink does for the same reason).
    */
  def batchFrame(df: DataFrame): DataFrame =
    df.sparkSession.asInstanceOf[ClassicSparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
        isStreaming = false)

  /** `Dataset.ofRows` — wrap an analyzed logical plan as a DataFrame
    * (the graft DML rule hands a MERGE's resolved source plan to the
    * table format this way; `ofRows` is `private[sql]`).
    */
  def frameOf(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[ClassicSparkSession], plan)

  /** `DataSourceStrategy.translateFilter` (protected[sql]) — the graft
    * DML rule uses it to mirror the planner's own judgement of whether
    * a DELETE predicate can ride the connector `SupportsDelete` path.
    */
  def translateFilter(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)
}

/** Second (and last) `private[sql]` door: `V2TableWithV1Fallback` is
  * how a connector `Table` tells the streaming resolver to fall back
  * to its V1 `Source` for `readStream.table(...)` — the exact bridge
  * the Delta connector rides for by-name streaming. The trait is
  * `private[sql]` at the Scala level, so the extends-clause must live
  * under the `org.apache.spark.sql` package; this empty subtrait
  * re-exports it (the `instanceof` check in `RelationResolution` sees
  * the inherited interface).
  */
trait GraftV1FallbackTable
    extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback
