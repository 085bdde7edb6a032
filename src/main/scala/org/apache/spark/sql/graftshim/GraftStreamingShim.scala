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
}
