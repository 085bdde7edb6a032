package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the classic time-series operator Spark has no
  * built-in for (SURVEY §2.2 "as-of / interval"). Composed from existing
  * operators (preference order (a), SURVEY §2.2): tagged union + one
  * window pass, so the whole join costs ONE shuffle on the key columns
  * and a per-partition sort — no range cross-join, no per-row probe.
  * That shape holds at 100 TB: both sides co-partition by key, skew
  * follows the key distribution exactly like any groupBy.
  *
  * Semantics: for each left row, attach the payload of the latest right
  * row with the same keys and right.ts ≤ left.ts (inclusive); optionally
  * null the match out when left.ts − right.ts > tolerance.
  */
object AsOfJoin {

  /** @param on        equi-key columns present on both sides
    * @param leftTs    left event-time column (long or timestamp)
    * @param rightTs   right event-time column (same type)
    * @param rightVals right payload columns to attach
    * @param tolerance max allowed staleness in the ts column's unit
    *                  (only meaningful for numeric ts), None = unbounded
    */
  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightVals.forall(right.columns.contains), "missing right payload col")

    // tagged union: right rows carry payload, left rows carry their own
    // columns; __side orders right (0) before left (1) at equal ts so an
    // exact-ts right row is visible to the left row (inclusive ≤).
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rt", lit(null).cast(right.schema(rightTs).dataType))
    val lAligned = rightVals.foldLeft(l)((d, c) =>
      d.withColumn(s"__v_$c", lit(null).cast(right.schema(c).dataType)))

    val r0 = right
      .withColumn("__t", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__rt", col(rightTs))
    val rAligned = rightVals.foldLeft(r0)((d, c) => d.withColumn(s"__v_$c", col(c)))
      // project to the union schema: keys + bookkeeping + payload
      .select((on.map(col) ++ Seq(col("__t"), col("__side"), col("__rt")) ++
        leftCols.filterNot(on.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(c => col(s"__v_$c"))): _*)

    val unioned = lAligned
      .select((on.map(col) ++ Seq(col("__t"), col("__side"), col("__rt")) ++
        leftCols.filterNot(on.contains).map(col) ++
        rightVals.map(c => col(s"__v_$c"))): _*)
      .unionByName(rAligned)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = rightVals.foldLeft(
      unioned.withColumn("__mrt", last(col("__rt"), ignoreNulls = true).over(w))
    )((d, c) => d.withColumn(s"__m_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w)))

    val stale = tolerance match {
      case Some(tol) =>
        col("__mrt").isNull || (col("__t") - col("__mrt")) > tol
      case None => col("__mrt").isNull
    }

    val out = rightVals.foldLeft(
      matched.filter(col("__side") === 1)
        .withColumn(rightTs + "_asof", when(stale, lit(null)).otherwise(col("__mrt")))
    )((d, c) => d.withColumn(c + "_asof", when(stale, lit(null)).otherwise(col(s"__m_$c"))))

    out.select((leftCols.map(col) :+ col(rightTs + "_asof")) ++
      rightVals.map(c => col(c + "_asof")): _*)
  }
}
