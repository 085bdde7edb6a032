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
      tolerance: Option[Long] = None): DataFrame =
    run(left, right, on, leftTs, rightTs, rightVals, tolerance, fwd = false)

  /** Forward as-of: attach the EARLIEST right row with right.ts ≥
    * left.ts (inclusive — matches DuckDB `ASOF ... ON l.ts <= r.ts`).
    * Same one-shuffle tagged-union shape, mirrored window frame.
    */
  def forward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    run(left, right, on, leftTs, rightTs, rightVals, tolerance, fwd = true)

  private def run(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      tolerance: Option[Long], fwd: Boolean): DataFrame = {
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

    // Backward: right(0) sorts before left(1) at equal ts, and the
    // preceding-frame last() sees it (inclusive ≤). Forward mirrors:
    // left before right at equal ts, following-frame first() sees the
    // exact-ts right row (inclusive ≥).
    val w =
      if (fwd)
        Window.partitionBy(on.map(col): _*)
          .orderBy(col("__t"), col("__side").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else
        Window.partitionBy(on.map(col): _*)
          .orderBy(col("__t"), col("__side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // ONE struct carries the matched right row's ts + ALL payload values,
    // taken with a single last(ignoreNulls): ts and payload always come
    // from the SAME right row. (Independent per-column last() windows
    // would pair the newest row's ts with an OLDER row's payload whenever
    // the newest payload value is NULL — diverging from asof semantics,
    // which must surface the matched row's NULL.) The struct is NULL for
    // left rows (side=1), so ignoreNulls skips them.
    val payload = when(col("__side") === 0,
      struct((col("__rt").as("__rt") +:
        rightVals.map(c => col(s"__v_$c").as(s"__v_$c"))): _*))
    val matched = unioned.withColumn("__m",
      (if (fwd) first(payload, ignoreNulls = true)
       else last(payload, ignoreNulls = true)).over(w))

    val gap =
      if (fwd) col("__m.__rt") - col("__t")
      else col("__t") - col("__m.__rt")
    val stale = tolerance match {
      case Some(tol) => col("__m").isNull || gap > tol
      case None => col("__m").isNull
    }

    val out = rightVals.foldLeft(
      matched.filter(col("__side") === 1)
        .withColumn(rightTs + "_asof", when(stale, lit(null)).otherwise(col("__m.__rt")))
    )((d, c) => d.withColumn(c + "_asof",
      when(stale, lit(null)).otherwise(col(s"__m.__v_$c"))))

    out.select((leftCols.map(col) :+ col(rightTs + "_asof")) ++
      rightVals.map(c => col(c + "_asof")): _*)
  }
}
