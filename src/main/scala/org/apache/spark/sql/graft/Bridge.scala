package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSession}

/** Minimal `private[sql]` bridge (the standard pattern for Spark
  * extension libraries): Column ⇄ Expression conversion and function-
  * registry access live behind `private[sql]` in Spark 4, so this one
  * object — placed under `org.apache.spark.sql` — re-exports exactly
  * what graft's custom expressions need. No Spark internals are
  * modified or shadowed.
  */
object Bridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (classic Dataset.ofRows). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a session-scoped SQL function backed by a raw Expression
    * builder (the `SparkSessionExtensions.injectFunction` analogue for
    * an already-built session).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
