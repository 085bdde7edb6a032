package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers (SURVEY §2.4 canonicalization contract).
  *
  * Money/double aggregation is exact-by-construction so that partial-agg
  * order (Spark's map-side combine, DuckDB's parallel hash agg) cannot
  * perturb results:
  *   - monetary inputs (≤4 decimal digits at rest) are cast to
  *     DECIMAL(18,4) *before* SUM — decimal addition is associative;
  *   - the final value is cast to DOUBLE once, from an exact decimal, so
  *     both engines emit bit-identical doubles;
  *   - AVG is *defined* as ROUND(CAST(SUM(dec) AS DOUBLE) / COUNT(x), 4)
  *     — never an engine's native AVG (DuckDB's AVG(DECIMAL) returns
  *     DOUBLE with order-dependent summation).
  */
object Canonical {

  /** Money-typed view of a ≤4-dp column: exact, associative addition. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  // -------------------------------------------------------- fixed-point
  // Round 16 (optimization guide §1.2 "per-task work"): the money
  // aggregates used to SUM DECIMAL(18,4). Spark sizes that sum's buffer
  // at DECIMAL(28,4) — past 18 digits the agg buffer is a byte-array
  // BigDecimal in UnsafeRow, so every update pays a deserialize +
  // BigDecimal add + reserialize, and the double→decimal CAST itself
  // goes through Double.toString. Measured on the 600k-row judged fact
  // scan (one parquet row group, so the map side is one task): the q45
  // four-sum aggregate cost 1.49 s against 0.18 s for the bare scan.
  //
  // The replacement does the same exact arithmetic in LONG fixed-point
  // units of 1e-4 ("units4"): a ≤4-dp money value v is N/10⁴ with
  // integer N, its double is within 1e-7·N of N/10⁴, so
  // cast(v·10⁴ ± 0.5 as long) (HALF_UP, away from zero — exactly the
  // rounding the DECIMAL cast applies) recovers N exactly. Sums run as
  // TWO long sums (hi = N >> 20, lo = N − (hi << 20) ∈ [0, 2²⁰)):
  //  - exactness/determinism: long addition is associative-exact, so
  //    partial-agg order can never perturb the result — the same
  //    property the decimal sum was chosen for;
  //  - bit-parity: below 2⁵³ total units the final
  //    (Σhi·2²⁰ + Σlo)/10⁴ double combine is exact-integer double math
  //    followed by ONE correctly-rounded division — bit-identical to
  //    Decimal.toDouble of the exact decimal sum (spec-pinned, and the
  //    2⁵³ bound is the SAME bound past which the old path's double
  //    OUTPUT stopped being exact and cross-engine hash parity already
  //    broke, per the revenueSum note below);
  //  - overflow: the split keeps both long sums loud-safe (ANSI sum
  //    overflow raises) to ~8·10¹² rows per group (Σlo ≤ n·2²⁰) — three
  //    orders past a 100 TB corpus; the old decimal ceiling (10²⁴) only
  //    ever protected outputs that had already lost double exactness.
  // Measured: the q45 aggregate 1.49 s → 0.24 s, identical bits.

  /** Exact integer 1e-4 units of a ≤4-dp money double (HALF_UP). */
  private def units4(c: Column): Column =
    (c * lit(10000.0) + when(c < 0, lit(-0.5)).otherwise(lit(0.5)))
      .cast("long")

  /** Exact integer 1e-2 units (cents) of a ≤2-dp money double, as
    * LONG — the cheap per-row replacement for the
    * `round(x·100).cast(DECIMAL)` pattern (Spark's `round` on DOUBLE
    * goes through BigDecimal.valueOf → Double.toString per row).
    * Identical to it on any ≤2-dp value (the money contract).
    */
  def cents(c: Column): Column =
    (c * lit(100.0) + when(c < 0, lit(-0.5)).otherwise(lit(0.5)))
      .cast("long")

  /** HALF_UP round of a ≤2-dp double to an integer LONG — the cheap
    * replacement for per-row `round(x).cast("long")`.
    */
  def wholeHalfUp(c: Column): Column =
    (c + when(c < 0, lit(-0.5)).otherwise(lit(0.5))).cast("long")

  /** Correctly-rounded DOUBLE of the EXACT sum of an integer LONG
    * column, via overflow-split long sums. The combine is exact-then-
    * one-rounding: Σhi < 2⁵³ makes `cast(sum(hi) as double)` exact,
    * the ·2²⁰ is a pure exponent shift (no mantissa change), and the
    * final addition is the single IEEE rounding — so this equals
    * `SUM(DECIMAL)::DOUBLE` (also correctly rounded) bit-for-bit all
    * the way to |Σ| < 2⁷³, far past the 2⁵³ bound where double
    * OUTPUTS stop being exact integers. Long-sum overflow is loud
    * (ANSI) and unreachable before ~8·10¹² rows per group (Σlo).
    */
  def exactLongSumAsDouble(u: Column): Column = {
    val hi = shiftright(u, 20)
    val lo = u - shiftleft(hi, 20) // ∈ [0, 2²⁰): shifts floor-divide
    sum(hi).cast("double") * lit(1048576.0) + sum(lo).cast("double")
  }

  /** Overflow-split exact sum of integer units, combined to the same
    * DOUBLE the decimal path emitted (see block comment above).
    */
  private def unitsSumAsDouble(u: Column): Column =
    exactLongSumAsDouble(u) / lit(10000.0)

  /** Exact SUM of a money column, emitted as a deterministic DOUBLE. */
  def moneySum(c: Column): Column = unitsSumAsDouble(units4(c))

  /** Deterministic 4-dp AVG per the contract (§2.4 rule 3). */
  def avg4(c: Column): Column = round(moneySum(c) / count(c), 4)

  /** Exact SUM of `price·(1−disc)` — the TPC-H revenue shape. The raw
    * decimal product carries scale 8, which at sf≥0.1 pushes the exact
    * sum past 2⁵³ where DuckDB's int128→double cast and Spark's
    * Decimal.toDouble round DIFFERENTLY. Money inputs have ≤2 real
    * decimals (spec-asserted), so `cents(p)·(100 − cents(d))` IS the
    * product's exact 1e-4 unit count — the same lossless-at-scale-4
    * fact the old DECIMAL(18,4) downcast relied on, now in pure long
    * arithmetic (≤1.1·10⁹ units per row: no per-row overflow).
    */
  def revenueSum(price: Column, disc: Column): Column =
    unitsSumAsDouble(cents(price) * (lit(100L) - cents(disc)))

  /** Oracle-side (DuckDB SQL) spellings of the same three helpers; kept
    * here so engine and oracle formulations evolve together.
    */
  def decSql(x: String): String = s"CAST($x AS DECIMAL(18,4))"
  def moneySumSql(x: String): String = s"CAST(SUM(${decSql(x)}) AS DOUBLE)"
  def avg4Sql(x: String): String =
    s"ROUND(CAST(SUM(${decSql(x)}) AS DOUBLE) / COUNT($x), 4)"
  def revenueSumSql(p: String, d: String): String =
    s"CAST(SUM(CAST(${decSql(p)} * (1 - ${decSql(d)}) AS DECIMAL(18,4))) AS DOUBLE)"

  /** Runtime guard for the exact-integer-sum contract (the q34/q52/q53
    * claim class): those queries cast integer/decimal sums to DOUBLE and
    * rely on every |Σ| < 2⁵³ for the cast to be exact. The comments used
    * to merely assert the bound; this makes it enforced. The wrapping
    * aggregation additionally computes, per group, `ng` = row count and
    * `gmax` = max|summed term| (both DECIMAL(19,0)); `ng·gmax` is an
    * upper bound on every |Σ|, and any output wrapped by the returned
    * function `raise_error`s when the bound reaches 2⁵³ — a loud failure
    * at exactly the scale where silent last-ulp drift would begin. The
    * guard product cannot itself drift: DECIMAL(19,0)·DECIMAL(19,0) →
    * DECIMAL(38,0) is exact, and an (astronomical) decimal overflow
    * NULLs the predicate, which also raises.
    */
  def exactSumGuard(tag: String, n: Column = col("ng"),
      maxTerm: Column = col("gmax")): Column => Column = {
    val bound = n * maxTerm
    val ok = bound < lit(9007199254740992L) // 2^53
    out => when(ok, out).otherwise(raise_error(concat(
      lit(s"$tag: a group breaches the 2^53 exact-integer-sum bound (n*max|term| = "),
      coalesce(bound.cast("string"), lit("decimal overflow")), lit(")"))))
  }

  /** 60-bit cross-engine hash: first 15 hex chars of md5 as a BIGINT.
    * Unlike xxhash64 (Spark-only), md5 is identical everywhere, so
    * integer pipelines built on this hash (minhash, simhash) are
    * oracle-able. 15 hex chars keep the value < 2⁶⁰ — positive and
    * overflow-safe in both engines.
    */
  def xhash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB spelling of [[xhash]] (verified identical on DuckDB 1.0). */
  def xhashSql(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"
}
