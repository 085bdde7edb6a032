package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-point binary logarithm `q(x) ≈ ⌊64·log2(x)⌋` — an EXACT
  * integer program for cross-engine log-likelihood scoring:
  * `q(x) = 64·msb(x) + #{k ∈ 1..63 : mantissa(x) ≥ t_k}` with
  * `mantissa(x) = (x << 20) >> msb(x) ∈ [2^20, 2^21)` and thresholds
  * `t_k = ⌊2^(20 + k/64)⌋` baked as integer constants.
  *
  * Why not `ln`/`log2`: libm logs are not correctly rounded, so Spark
  * (JDK `Math.log`) and the DuckDB oracle can disagree in the last ulp
  * and flip a rounded score. Why not `length(bin(x))-1` (the
  * text_perplexity quantization): a 1-bit floor erases every sub-bit
  * likelihood ratio, which is exactly the signal a trained classifier
  * lives on. This table resolves 1/64 of a bit using only integer
  * shift/compare — bit-identical on any engine, any partitioning —
  * and stays a LINEAR-size expression (an iterative square-and-shift
  * formulation nests the mantissa ~6⁶ deep once ProjectCollapse
  * inlines it; this was measured as a multi-minute analysis hang).
  *
  * The thresholds are themselves exact: `⌊2^((1280+k)/64)⌋` computed
  * once as BigInt 64th roots — no floating point anywhere in the
  * contract. Domain 1 ≤ x < 2^42 (so `x << 20` fits a BIGINT),
  * enforced with `raise_error` rather than silent wraparound.
  */
object FixedLog2 {

  private val FP = 20
  /** Domain bound: x << FP must stay inside a signed 64-bit long. */
  private val MaxX = 1L << 42

  /** `t_k = ⌊2^(FP + k/64)⌋` for k = 1..63, via exact integer 64th
    * roots of `2^(64·FP + k)` (binary search on BigInt — zero floats).
    */
  private[graft] val thresholds: Array[Long] = (1 to 63).map { k =>
    val n = BigInt(1) << (64 * FP + k)
    var lo = BigInt(1) << FP
    var hi = BigInt(1) << (FP + 1)
    while (hi - lo > 1) {
      val mid = (lo + hi) / 2
      if (mid.pow(64) <= n) lo = mid else hi = mid
    }
    lo.toLong
  }.toArray

  /** Fixed-point `≈⌊64·log2(x)⌋` for an integral column, domain
    * 1 ≤ x < 2^42 (raises outside it).
    */
  def qlog2(x: Column): Column = {
    val xl = x.cast("long")
    val guarded = when(xl >= lit(1L) && xl < lit(MaxX), xl)
      .otherwise(raise_error(concat(
        lit(s"qlog2 domain [1, 2^42) violated: x = "), xl.cast("string"))))
    val m = (length(bin(guarded)) - 1).cast("int")
    val p = call_function("shiftright", shiftleft(guarded, FP), m)
    val frac = thresholds.map(t => (p >= lit(t)).cast("long")).reduce(_ + _)
    m.cast("long") * 64 + frac
  }

  /** Driver-side [[qlog2]] for already-collected model-sized frames
    * (round 16): the SAME program — same `thresholds` array, same
    * mantissa shift — on a plain Long, so a B-row bucket model can be
    * scored without compiling the 64-term column expression into a
    * throwaway plan (Dsir's model step measured ~1 s of analysis +
    * session-clone overhead per call). Equality with the column
    * program is spec-pinned across the domain (FixedLog2Spec).
    */
  def qlog2Long(x: Long): Long = {
    require(x >= 1L && x < MaxX, s"qlog2 domain [1, 2^42) violated: x = $x")
    val m = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val p = (x << FP) >> m
    var frac = 0L
    var k = 0
    while (k < thresholds.length) {
      if (p >= thresholds(k)) frac += 1
      k += 1
    }
    m.toLong * 64 + frac
  }

  /** Oracle-side (DuckDB) spelling of [[qlog2]] as a 2-CTE chain
    * generated from the SAME threshold table. Returns the CTE text (no
    * trailing comma); the final CTE `<prefix>q` carries `cols` plus the
    * result column `q`. No domain guard oracle-side — DuckDB errors on
    * BIGINT overflow rather than wrapping, which is equivalent loudness.
    *
    * @param prefix CTE name prefix, unique within the statement
    * @param src    CTE/table to read from; must expose `cols` and `x`
    * @param cols   passthrough columns, comma-separated
    * @param x      integral SQL expression to take the log of
    */
  def qlog2CteSql(prefix: String, src: String, cols: String,
      x: String): String = {
    val sum = thresholds
      .map(t => s"CASE WHEN p >= $t THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""${prefix}0 AS (
       |  SELECT $cols, CAST(LENGTH(bin($x)) - 1 AS BIGINT) AS m,
       |         (($x) << $FP) >> (LENGTH(bin($x)) - 1) AS p
       |  FROM $src),
       |${prefix}q AS (SELECT $cols, 64*m + ($sum) AS q FROM ${prefix}0)""".stripMargin
  }
}
