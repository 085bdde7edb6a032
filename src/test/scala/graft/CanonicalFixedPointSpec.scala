package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-16 optimization pin: the fixed-point (split-long) money
  * aggregates must be BIT-IDENTICAL to the DECIMAL(18,4) formulation
  * they replaced, in every regime the contract covers — positive and
  * negative values, nulls, empty/all-null groups, 2-dp and 4-dp
  * inputs, and sums up to the 2⁵³ output-exactness bound. The oracle
  * differ already proves this on the judged corpora (158/158 at three
  * SFs); this spec pins it on adversarial synthetic data so a future
  * edit to either side fails fast.
  */
class CanonicalFixedPointSpec extends SparkSpec {

  /** The pre-round-16 decimal formulations, verbatim. */
  private def decMoneySum(c: Column): Column =
    sum(Canonical.dec(c)).cast("double")
  private def decAvg4(c: Column): Column =
    round(sum(Canonical.dec(c)).cast("double") / count(c), 4)
  private def decRevenueSum(p: Column, d: Column): Column =
    sum((Canonical.dec(p) * (lit(1) - Canonical.dec(d)))
      .cast(DecimalType(18, 4))).cast("double")

  private def bits(d: java.lang.Double): Any =
    if (d == null) null else java.lang.Double.doubleToLongBits(d)

  private def compareAgg(df: DataFrame, newAgg: Column, oldAgg: Column,
      label: String): Unit = {
    val rows = df.groupBy("g")
      .agg(newAgg.as("nw"), oldAgg.as("old"))
      .collect()
    assert(rows.nonEmpty, label)
    rows.foreach { r =>
      val nw = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
      val old = if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))
      assert(bits(nw) == bits(old),
        s"$label: group ${r.get(0)} new=$nw old=$old")
    }
  }

  /** Deterministic pseudo-random money frame: 2-dp values in
    * [-999999.99, 999999.99], ~5% nulls, 8 groups.
    */
  private def moneyFrame(seed: Int, dp: Int): DataFrame = {
    val scale = math.pow(10, dp)
    spark.range(20000)
      .select(col("id"), (xxhash64(col("id"), lit(seed))).as("h"))
      .select(col("id"), pmod(col("h"), lit(8)).as("g"),
        when(pmod(col("h"), lit(20)) === 0, lit(null))
          .otherwise((pmod(shiftrightunsigned(col("h"), 3), lit((2e8).toLong))
            .cast("double") - lit(1e8)) / lit(scale)).as("v"),
        (pmod(shiftrightunsigned(col("h"), 13), lit(100L))
          .cast("double") / lit(100.0)).as("d"))
  }

  test("moneySum is bit-identical to the decimal formulation (2 dp ± nulls)") {
    compareAgg(moneyFrame(1, 2), Canonical.moneySum(col("v")),
      decMoneySum(col("v")), "moneySum 2dp")
  }

  test("moneySum is bit-identical at 4 dp") {
    compareAgg(moneyFrame(2, 4), Canonical.moneySum(col("v")),
      decMoneySum(col("v")), "moneySum 4dp")
  }

  test("avg4 is bit-identical to the decimal formulation") {
    compareAgg(moneyFrame(3, 2), Canonical.avg4(col("v")),
      decAvg4(col("v")), "avg4")
  }

  test("revenueSum is bit-identical to the decimal formulation") {
    // price ≥ 0 (2 dp), discount ∈ [0, 0.99] (2 dp) — the TPC-H shape
    val df = moneyFrame(4, 2).select(col("g"), abs(col("v")).as("p"), col("d"))
    compareAgg(df, Canonical.revenueSum(col("p"), col("d")),
      decRevenueSum(col("p"), col("d")), "revenueSum")
  }

  test("all-null and single-row groups match (null propagation)") {
    val df = spark.range(4).select(pmod(col("id"), lit(2)).as("g"),
      when(col("id") < 2, lit(null).cast("double"))
        .otherwise(lit(12.34)).as("v"))
    // group 0: all null → both sides NULL; group 1: 2 × 12.34
    compareAgg(df, Canonical.moneySum(col("v")), decMoneySum(col("v")),
      "null groups")
  }

  test("bit-parity holds approaching the 2^53 output bound") {
    // 10k rows of ~5e7-money 2-dp values ⇒ Σ ≈ 5e11 money = 5e15 units
    // — just under the 2⁵³ (≈9.007e15) units bound the parity claim
    // covers (and past which the OLD path's double output was already
    // inexact / not oracle-matched)
    val df = spark.range(10000)
      .select(lit(0L).as("g"),
        (lit(49999999.00) + pmod(xxhash64(col("id")), lit(100L))
          .cast("double") / 100.0).as("v"))
    compareAgg(df, Canonical.moneySum(col("v")), decMoneySum(col("v")),
      "near-2^53")
    // explicitly verify the probe regime sits inside the bound but
    // within 2× of it, so the test exercises the claimed edge
    val sumUnits = df.agg(sum((col("v") * 10000.0 + 0.5).cast("long")))
      .head.getLong(0)
    assert(sumUnits < (1L << 53) && sumUnits > (1L << 52),
      s"probe regime off: $sumUnits")
  }
}
