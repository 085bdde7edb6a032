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

  /** Exact SUM of a money column, emitted as a deterministic DOUBLE. */
  def moneySum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic 4-dp AVG per the contract (§2.4 rule 3). */
  def avg4(c: Column): Column = round(sum(dec(c)).cast("double") / count(c), 4)

  /** Exact SUM of `price·(1−disc)` — the TPC-H revenue shape. The raw
    * decimal product carries scale 8, which at sf≥0.1 pushes the exact
    * sum past 2⁵³ where DuckDB's int128→double cast and Spark's
    * Decimal.toDouble round DIFFERENTLY. Money inputs have ≤2 real
    * decimals, so the product has ≤4 — casting it back to DECIMAL(18,4)
    * before SUM is LOSSLESS (spec-asserted) and keeps the final double
    * cast exact at any judged scale.
    */
  def revenueSum(price: Column, disc: Column): Column =
    sum((dec(price) * (lit(1) - dec(disc))).cast(DecimalType(18, 4)))
      .cast("double")

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
