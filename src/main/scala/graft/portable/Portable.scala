package graft.portable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Canonical, Tables}

/** Portable relational IR — the engine-side realization of the
  * reference's design thesis: "write the transformation once, run it on
  * DuckDB or Spark" (README.md:33,103-105; the Ibis expression at
  * `taxi_pipeline.py:89-94` is built once and executed on both backends
  * at `:115-117` and `:140-147`).
  *
  * A `Rel` tree compiles three ways:
  *   - [[Compile.toDataFrame]] → a lazy Spark plan (Catalyst optimizes);
  *   - [[Compile.toSparkSql]]  → Spark-dialect SQL text (`spark.sql`);
  *   - [[Compile.toSql]]       → DuckDB-dialect SQL (the oracle side).
  *
  * The aggregate vocabulary bakes in the cross-engine determinism
  * contract ([[graft.Canonical]]): `MoneySum`/`Avg4` compile to
  * exact-decimal formulations on BOTH backends, so a query written once
  * in this IR is hash-stable across engines *by construction* — the
  * property the hand-written Q01–Q30 pairs prove query-by-query.
  */
object Portable {

  // ---------------------------------------------------------------- exprs
  sealed trait Expr
  final case class Col(name: String) extends Expr
  final case class LitNum(v: Double) extends Expr
  final case class LitStr(v: String) extends Expr
  /** op ∈ > >= < <= = != and or + - * / */
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  /** Scalar function call, names restricted to [[Compile.scalarFns]] —
    * the subset spelled and typed identically in both dialects.
    */
  final case class Fn(name: String, args: Seq[Expr]) extends Expr
  /** to ∈ bigint | int | double | string | date (identical CAST
    * semantics). */
  final case class Cast(e: Expr, to: String) extends Expr
  /** CASE WHEN b₁ THEN v₁ … ELSE otherwise END. */
  final case class Case(branches: Seq[(Expr, Expr)], otherwise: Expr) extends Expr
  final case class IsNull(e: Expr) extends Expr
  final case class IsNotNull(e: Expr) extends Expr
  /** SQL IN over a literal list. */
  final case class InList(e: Expr, values: Seq[Expr]) extends Expr
  /** SQL BETWEEN (inclusive both ends). */
  final case class Between(e: Expr, lo: Expr, hi: Expr) extends Expr
  /** SQL LIKE with `%`/`_` wildcards — identical matching semantics
    * (case-sensitive, no implicit anchors) on Spark and DuckDB.
    */
  final case class Like(e: Expr, pattern: String) extends Expr
  /** Whole days from `start` to `end`, BIGINT on both backends. Encodes
    * the classic cross-dialect hazard ONCE: Spark spells it
    * `datediff(end, start)` (2 args, end first) while DuckDB spells it
    * `date_diff('day', start, end)` (3 args, start first) — an IR user
    * never sees the divergence.
    */
  final case class DateDiffDays(end: Expr, start: Expr) extends Expr

  // ------------------------------------------------------------------ aggs
  sealed trait Agg { def alias: String }
  final case class CountAll(alias: String) extends Agg
  final case class CountDistinct(col: String, alias: String) extends Agg
  /** Exact money sum per the §2.4 contract. */
  final case class MoneySum(col: String, alias: String) extends Agg
  /** Contract AVG: ROUND(CAST(SUM(dec) AS DOUBLE)/COUNT, 4). */
  final case class Avg4(col: String, alias: String) extends Agg
  final case class MinOf(col: String, alias: String) extends Agg
  final case class MaxOf(col: String, alias: String) extends Agg
  /** Plain SUM for integral columns — exact, BIGINT on both backends
    * (DuckDB widens BIGINT sums to HUGEINT; the cast restores the lane).
    */
  final case class SumOf(col: String, alias: String) extends Agg
  /** Plain average of an integral column: exact integer sum, then ONE
    * IEEE division — bit-identical across engines (a naive AVG()
    * accumulates in engine-specific float order).
    */
  final case class AvgOf(col: String, alias: String) extends Agg
  /** Sample stddev of a money column under the §2.4 contract: exact
    * decimal cents sums, the two-pass-free textbook formula evaluated
    * in doubles, rule-3 ROUND(x, 4) on the output.
    */
  final case class StddevMoney4(col: String, alias: String) extends Agg
  /** Conditional count — the SQL-standard `COUNT(*) FILTER (WHERE p)`
    * (shared by Spark SQL and DuckDB); the DataFrame backend compiles
    * the equivalent `count(when(p, 1))`. BIGINT on all frontends.
    */
  final case class CountIf(pred: Expr, alias: String) extends Agg
  /** Conditional exact money sum (§2.4 decimal lane), COALESCEd to 0
    * so a group with no matching rows is 0.0 — not NULL — on every
    * frontend.
    */
  final case class MoneySumIf(col: String, pred: Expr, alias: String) extends Agg

  // --------------------------------------------------------------- windows
  /** Window-function vocabulary. Determinism contract: the window's
    * ORDER BY must be a total order (callers add a unique tiebreak);
    * ranking functions compile to BIGINT on both backends; the running
    * money sum follows the §2.4 decimal contract with an explicit
    * `ROWS UNBOUNDED PRECEDING → CURRENT ROW` frame on both backends.
    */
  sealed trait WinFn
  case object RowNum extends WinFn
  case object RankOf extends WinFn
  case object DenseRankOf extends WinFn
  final case class LagCol(col: String, n: Int) extends WinFn
  final case class LeadCol(col: String, n: Int) extends WinFn
  final case class RunningMoneySum(col: String) extends WinFn
  /** Trailing moving average over an explicit `ROWS n PRECEDING →
    * CURRENT ROW` frame, in the §2.4 decimal lane: exact decimal sum
    * over the frame, one IEEE division by the frame's row count,
    * rule-3 ROUND(x, 4) — hash-stable where a naive AVG() OVER is not.
    */
  final case class MovingAvg4(col: String, nPreceding: Int) extends WinFn

  // ------------------------------------------------------------------ rels
  sealed trait Rel
  /** Named base table (resolved per backend: parquet dir / DuckDB view). */
  final case class Scan(table: String) extends Rel
  final case class Filter(in: Rel, pred: Expr) extends Rel
  final case class Project(in: Rel, cols: Seq[(Expr, String)]) extends Rel
  final case class GroupAgg(in: Rel, keys: Seq[String], aggs: Seq[Agg]) extends Rel
  /** how ∈ inner | left | right | full | semi | anti. Inner/outer joins
    * keep both key columns (identical `SELECT *` semantics on both
    * backends); semi/anti keep only the left side's columns. `keys` is
    * a conjunction of (leftCol, rightCol) equalities — names must
    * differ across sides (rename in a Project first), keeping the
    * DataFrame compile free of ambiguous-column traps.
    */
  final case class Join(l: Rel, r: Rel, keys: Seq[(String, String)],
      how: String = "inner") extends Rel
  final case class Distinct(in: Rel) extends Rel
  /** Positional union (both branches come from one tree, so positions
    * agree by construction); `all = false` dedups.
    */
  final case class Union(l: Rel, r: Rel, all: Boolean) extends Rel
  /** One window column appended to the input's columns. */
  final case class WindowCol(in: Rel, partitionBy: Seq[String],
      orderBy: Seq[(String, Boolean)], fn: WinFn, alias: String) extends Rel
  /** keys: (column, ascending); asc NULLS FIRST / desc NULLS LAST
    * (contract). */
  final case class Sort(in: Rel, keys: Seq[(String, Boolean)]) extends Rel
  final case class Limit(in: Rel, n: Int) extends Rel

  // ----------------------------------------------------------- fluent api
  implicit final class RelOps(private val r: Rel) extends AnyVal {
    def where(pred: Expr): Rel = Filter(r, pred)
    def select(cols: (Expr, String)*): Rel = Project(r, cols)
    def groupBy(keys: String*)(aggs: Agg*): Rel = GroupAgg(r, keys, aggs)
    /** HAVING is Filter-over-GroupAgg — same tree, named for intent. */
    def having(pred: Expr): Rel = Filter(r, pred)
    def join(other: Rel, lk: String, rk: String): Rel = Join(r, other, Seq(lk -> rk))
    def leftJoin(other: Rel, lk: String, rk: String): Rel = Join(r, other, Seq(lk -> rk), "left")
    def rightJoin(other: Rel, lk: String, rk: String): Rel = Join(r, other, Seq(lk -> rk), "right")
    def fullJoin(other: Rel, lk: String, rk: String): Rel = Join(r, other, Seq(lk -> rk), "full")
    def semiJoin(other: Rel, lk: String, rk: String): Rel = Join(r, other, Seq(lk -> rk), "semi")
    def antiJoin(other: Rel, lk: String, rk: String): Rel = Join(r, other, Seq(lk -> rk), "anti")
    /** Multi-key equi-join: conjunction of (leftCol, rightCol) pairs. */
    def joinOn(other: Rel, keys: (String, String)*): Rel = Join(r, other, keys)
    def distinct: Rel = Distinct(r)
    def union(other: Rel): Rel = Union(r, other, all = false)
    def unionAll(other: Rel): Rel = Union(r, other, all = true)
    def window(partitionBy: Seq[String], orderBy: Seq[(String, Boolean)],
        fn: WinFn, alias: String): Rel = WindowCol(r, partitionBy, orderBy, fn, alias)
    def orderBy(keys: (String, Boolean)*): Rel = Sort(r, keys)
    def limit(n: Int): Rel = Limit(r, n)
  }
  def table(name: String): Rel = Scan(name)
  def c(name: String): Col = Col(name)

  object Compile {

    // ------------------------------------------------------------- spark
    def toDataFrame(spark: SparkSession, sfDir: String, rel: Rel): DataFrame =
      rel match {
        case Scan(t) => Tables(spark, sfDir, t)
        case Filter(in, p) => toDataFrame(spark, sfDir, in).filter(exprCol(p))
        case Project(in, cols) =>
          toDataFrame(spark, sfDir, in)
            .select(cols.map { case (e, a) => exprCol(e).as(a) }: _*)
        case GroupAgg(in, keys, aggs) =>
          val df = toDataFrame(spark, sfDir, in)
          val cols = aggs.map(aggCol)
          if (keys.isEmpty) df.agg(cols.head, cols.tail: _*)
          else df.groupBy(keys.map(col): _*).agg(cols.head, cols.tail: _*)
        case Join(l, r, keys, how) =>
          val sparkHow = how match {
            case "semi" => "left_semi"
            case "anti" => "left_anti"
            case h => h
          }
          val ldf = toDataFrame(spark, sfDir, l)
          val rdf = toDataFrame(spark, sfDir, r)
          // the Join doc REQUIRES key names to differ across sides
          // (rename in a Project first); enforce it — a same-named key
          // would resolve `col(lk) === col(rk)` ambiguously (or
          // trivially true) here and be ambiguous in the SQL dialects'
          // bare `lk = rk` — mirror of the duplicate-window-alias check
          val lcols = ldf.columns.toSet
          val rcols = rdf.columns.toSet
          keys.foreach { case (lk, rk) =>
            require(lk != rk, s"join key '$lk' used on both sides — rename one in a Project first")
            require(lcols.contains(lk) && !rcols.contains(lk),
              s"left join key '$lk' must exist on the left side only (left=${lcols.mkString(",")}, right=${rcols.mkString(",")})")
            require(rcols.contains(rk) && !lcols.contains(rk),
              s"right join key '$rk' must exist on the right side only (left=${lcols.mkString(",")}, right=${rcols.mkString(",")})")
          }
          val cond = keys.map { case (lk, rk) => col(lk) === col(rk) }
            .reduce(_ && _)
          ldf.join(rdf, cond, sparkHow)
        case Distinct(in) => toDataFrame(spark, sfDir, in).distinct()
        case Union(l, r, all) =>
          val u = toDataFrame(spark, sfDir, l).union(toDataFrame(spark, sfDir, r))
          if (all) u else u.distinct()
        case WindowCol(in, pb, ob, fn, alias) =>
          import org.apache.spark.sql.expressions.{Window => W}
          val inDf = toDataFrame(spark, sfDir, in)
          // a duplicate alias would silently REPLACE here (withColumn)
          // but APPEND in the SQL dialects (`SELECT *, … AS alias`) —
          // reject loudly instead of letting the frontends diverge
          require(!inDf.columns.contains(alias),
            s"window alias '$alias' already exists in ${inDf.columns.mkString(",")}")
          val sortCols = ob.map { case (k, asc) =>
            if (asc) asc_nulls_first(k) else desc_nulls_last(k) }
          val base =
            (if (pb.isEmpty) W.partitionBy() else W.partitionBy(pb.map(col): _*))
              .orderBy(sortCols: _*)
          val c = fn match {
            case RowNum => row_number().over(base).cast("long")
            case RankOf => rank().over(base).cast("long")
            case DenseRankOf => dense_rank().over(base).cast("long")
            case LagCol(cn, n) => lag(col(cn), n).over(base)
            case LeadCol(cn, n) => lead(col(cn), n).over(base)
            case RunningMoneySum(cn) =>
              sum(Canonical.dec(col(cn)))
                .over(base.rowsBetween(W.unboundedPreceding, W.currentRow))
                .cast("double")
            case MovingAvg4(cn, n) =>
              val frame = base.rowsBetween(-n.toLong, W.currentRow)
              round(sum(Canonical.dec(col(cn))).over(frame).cast("double") /
                count(col(cn)).over(frame), 4)
          }
          inDf.withColumn(alias, c)
        case Sort(in, keys) =>
          toDataFrame(spark, sfDir, in)
            .orderBy(keys.map { case (k, asc) =>
              if (asc) asc_nulls_first(k) else desc_nulls_last(k) }: _*)
        case Limit(in, n) => toDataFrame(spark, sfDir, in).limit(n)
      }

    /** Scalar functions admitted into the IR: same name, argument
      * shape, and result type in Spark SQL and DuckDB. (Notable
      * exclusions: `length`/`year` return INT on Spark vs BIGINT on
      * DuckDB — admit them only under an explicit [[Cast]]; `round`
      * on raw doubles differs in tie-breaking — the contract's
      * decimal-based aggs handle rounding instead.)
      */
    val scalarFns: Set[String] = Set(
      "upper", "lower", "substr", "concat", "trim", "abs", "floor",
      "ceil", "coalesce", "length", "year", "month",
      "replace", "lpad", "rpad", "nullif", "split_part", "date_trunc")

    private def exprCol(e: Expr): Column = e match {
      case Col(n) => col(n)
      // integral literals stay integral (the SQL renderer already
      // prints them without a decimal point — keep the frontends typed
      // alike)
      case LitNum(v) => if (v == v.floor && v.abs < 1e15) lit(v.toLong) else lit(v)
      case LitStr(v) => lit(v)
      case Fn(name, args) =>
        require(scalarFns(name), s"function $name not in the portable subset")
        call_function(name, args.map(exprCol): _*)
      case Cast(x, to) => exprCol(x).cast(to)
      case Case(branches, otherwise) =>
        branches.tail
          .foldLeft(when(exprCol(branches.head._1), exprCol(branches.head._2))) {
            case (acc, (p, v)) => acc.when(exprCol(p), exprCol(v))
          }
          .otherwise(exprCol(otherwise))
      case IsNull(x) => exprCol(x).isNull
      case IsNotNull(x) => exprCol(x).isNotNull
      case InList(x, vs) => exprCol(x).isin(vs.map {
        case LitNum(v) => if (v == v.floor && v.abs < 1e15) v.toLong else v
        case LitStr(v) => v
        case other => throw new IllegalArgumentException(
          s"IN list takes literals, got $other")
      }: _*)
      case Between(x, lo, hi) =>
        exprCol(x).between(exprCol(lo), exprCol(hi))
      case Like(x, p) => exprCol(x).like(p)
      // Spark: datediff(end, start), INT → widen to the contract lane
      case DateDiffDays(end, start) =>
        datediff(exprCol(end), exprCol(start)).cast("long")
      case Bin(op, l, r) =>
        val (a, b) = (exprCol(l), exprCol(r))
        op match {
          case ">" => a > b;   case ">=" => a >= b
          case "<" => a < b;   case "<=" => a <= b
          case "=" => a === b; case "!=" => a =!= b
          case "and" => a && b; case "or" => a || b
          case "+" => a + b; case "-" => a - b
          case "*" => a * b; case "/" => a / b
        }
    }

    private def aggCol(a: Agg): Column = a match {
      case CountAll(al) => count(lit(1)).as(al)
      case CountDistinct(cn, al) => countDistinct(col(cn)).as(al)
      case MoneySum(cn, al) => Canonical.moneySum(col(cn)).as(al)
      case Avg4(cn, al) => Canonical.avg4(col(cn)).as(al)
      case MinOf(cn, al) => min(col(cn)).as(al)
      case MaxOf(cn, al) => max(col(cn)).as(al)
      case SumOf(cn, al) => sum(col(cn)).cast("bigint").as(al)
      case AvgOf(cn, al) =>
        (sum(col(cn)).cast("double") / count(col(cn))).as(al)
      case StddevMoney4(cn, al) =>
        // q27's contract formulation: exact decimal cents sums, the
        // one-pass variance identity in doubles, ROUND(x, 4)
        val cents = round(col(cn) * 100).cast("decimal(18,0)")
        val sumsq = sum(cents * cents).cast("double")
        val sumc = sum(cents).cast("double")
        val n = count(cents)
        round(sqrt((sumsq - sumc * sumc / n) / (n - lit(1))) / 100.0, 4).as(al)
      case CountIf(p, al) => count(when(exprCol(p), lit(1))).as(al)
      case MoneySumIf(cn, p, al) =>
        coalesce(sum(when(exprCol(p), Canonical.dec(col(cn))))
          .cast("double"), lit(0.0)).as(al)
    }

    // --------------------------------------------------------- sql text
    // ANSI core is shared; the dialects differ only in join keywords
    // (DuckDB `SEMI JOIN`/`ANTI JOIN` vs Spark `LEFT SEMI JOIN`/`LEFT
    // ANTI JOIN`). The Spark dialect makes the IR genuinely
    // THREE-frontend — one tree runs as a DataFrame plan, as Spark SQL
    // text, and as the DuckDB oracle (the reference's multi-frontend
    // redundancy, SURVEY §2.1 totals note).
    def toSql(rel: Rel): String = s"SELECT * FROM ${relSql(rel, spark = false)}"
    def toSparkSql(rel: Rel): String =
      s"SELECT * FROM ${relSql(rel, spark = true)}"

    private def relSql(rel: Rel, spark: Boolean): String = rel match {
      case Scan(t) => t
      case Filter(in, p) =>
        s"(SELECT * FROM ${relSql(in, spark)} WHERE ${exprSql(p, spark)})"
      case Project(in, cols) =>
        val cs = cols.map { case (e, a) => s"${exprSql(e, spark)} AS $a" }.mkString(", ")
        s"(SELECT $cs FROM ${relSql(in, spark)})"
      case GroupAgg(in, keys, aggs) =>
        val sel = (keys ++ aggs.map(aggSql(_, spark))).mkString(", ")
        val grp = if (keys.isEmpty) "" else s" GROUP BY ${keys.mkString(", ")}"
        s"(SELECT $sel FROM ${relSql(in, spark)}$grp)"
      case Join(l, r, keys, how) =>
        val kw = how match {
          case "inner" => "JOIN"
          case "left" => "LEFT JOIN"
          case "right" => "RIGHT JOIN"
          case "full" => "FULL JOIN"
          case "semi" => if (spark) "LEFT SEMI JOIN" else "SEMI JOIN"
          case "anti" => if (spark) "LEFT ANTI JOIN" else "ANTI JOIN"
        }
        val on = keys.map { case (lk, rk) => s"$lk = $rk" }.mkString(" AND ")
        s"(SELECT * FROM ${relSql(l, spark)} $kw ${relSql(r, spark)} ON $on)"
      case Distinct(in) => s"(SELECT DISTINCT * FROM ${relSql(in, spark)})"
      case Union(l, r, all) =>
        val kw = if (all) "UNION ALL" else "UNION"
        s"(SELECT * FROM ${relSql(l, spark)} $kw SELECT * FROM ${relSql(r, spark)})"
      case WindowCol(in, pb, ob, fn, alias) =>
        val part = if (pb.isEmpty) "" else s"PARTITION BY ${pb.mkString(", ")} "
        val ord = ob.map { case (k, asc) =>
          s"$k ${if (asc) "ASC NULLS FIRST" else "DESC NULLS LAST"}" }
          .mkString(", ")
        val (fnSql, frame) = fn match {
          case RowNum => ("ROW_NUMBER()", "")
          case RankOf => ("RANK()", "")
          case DenseRankOf => ("DENSE_RANK()", "")
          case LagCol(cn, n) => (s"LAG($cn, $n)", "")
          case LeadCol(cn, n) => (s"LEAD($cn, $n)", "")
          case RunningMoneySum(cn) =>
            (s"CAST(SUM(${Canonical.decSql(cn)})",
              " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
          case MovingAvg4(cn, n) =>
            (cn, s" ROWS BETWEEN $n PRECEDING AND CURRENT ROW")
        }
        val over = s"OVER ($part" + s"ORDER BY $ord$frame)"
        val expr = fn match {
          case RunningMoneySum(_) => s"$fnSql $over AS DOUBLE) AS $alias"
          case MovingAvg4(cn, _) =>
            s"ROUND(CAST(SUM(${Canonical.decSql(cn)}) $over AS DOUBLE)" +
              s" / COUNT($cn) $over, 4) AS $alias"
          case _ => s"$fnSql $over AS $alias"
        }
        s"(SELECT *, $expr FROM ${relSql(in, spark)})"
      case Sort(in, keys) =>
        val ks = keys.map { case (k, asc) =>
          s"$k ${if (asc) "ASC" else "DESC"} NULLS ${if (asc) "FIRST" else "LAST"}" }
          .mkString(", ")
        s"(SELECT * FROM ${relSql(in, spark)} ORDER BY $ks)"
      case Limit(in, n) => s"(SELECT * FROM ${relSql(in, spark)} LIMIT $n)"
    }

    private def exprSql(e: Expr, spark: Boolean): String = e match {
      case Col(n) => n
      case LitNum(v) => if (v == v.floor && v.abs < 1e15) v.toLong.toString else v.toString
      case LitStr(v) => s"'${v.replace("'", "''")}'"
      case Fn(name, args) =>
        require(scalarFns(name), s"function $name not in the portable subset")
        s"$name(${args.map(exprSql(_, spark)).mkString(", ")})"
      case Cast(x, to) =>
        val t = to match {
          case "bigint" => "BIGINT"; case "int" => "INTEGER"
          case "double" => "DOUBLE"; case "date" => "DATE"
          case "string" => if (spark) "STRING" else "VARCHAR"
        }
        s"CAST(${exprSql(x, spark)} AS $t)"
      case Case(branches, otherwise) =>
        val whens = branches
          .map { case (p, v) => s"WHEN ${exprSql(p, spark)} THEN ${exprSql(v, spark)}" }
          .mkString(" ")
        s"(CASE $whens ELSE ${exprSql(otherwise, spark)} END)"
      case IsNull(x) => s"(${exprSql(x, spark)} IS NULL)"
      case IsNotNull(x) => s"(${exprSql(x, spark)} IS NOT NULL)"
      case InList(x, vs) =>
        s"(${exprSql(x, spark)} IN (${vs.map(exprSql(_, spark)).mkString(", ")}))"
      case Between(x, lo, hi) =>
        s"(${exprSql(x, spark)} BETWEEN ${exprSql(lo, spark)} AND ${exprSql(hi, spark)})"
      case Like(x, p) =>
        s"(${exprSql(x, spark)} LIKE '${p.replace("'", "''")}')"
      case DateDiffDays(end, start) =>
        if (spark)
          s"CAST(datediff(${exprSql(end, spark)}, ${exprSql(start, spark)}) AS BIGINT)"
        else
          s"date_diff('day', ${exprSql(start, spark)}, ${exprSql(end, spark)})"
      case Bin(op, l, r) =>
        val o = op match {
          case "and" => "AND"; case "or" => "OR"; case "!=" => "<>"; case x => x
        }
        s"(${exprSql(l, spark)} $o ${exprSql(r, spark)})"
    }

    private def aggSql(a: Agg, spark: Boolean): String = a match {
      case CountAll(al) => s"COUNT(*) AS $al"
      case CountDistinct(cn, al) => s"COUNT(DISTINCT $cn) AS $al"
      case MoneySum(cn, al) => s"${Canonical.moneySumSql(cn)} AS $al"
      case Avg4(cn, al) => s"${Canonical.avg4Sql(cn)} AS $al"
      case MinOf(cn, al) => s"MIN($cn) AS $al"
      case MaxOf(cn, al) => s"MAX($cn) AS $al"
      case SumOf(cn, al) => s"CAST(SUM($cn) AS BIGINT) AS $al"
      case AvgOf(cn, al) =>
        s"(CAST(SUM($cn) AS DOUBLE) / COUNT($cn)) AS $al"
      case StddevMoney4(cn, al) =>
        val cts = s"CAST(ROUND($cn * 100) AS DECIMAL(18,0))"
        s"""ROUND(SQRT((CAST(SUM($cts * $cts) AS DOUBLE)
           |  - CAST(SUM($cts) AS DOUBLE) * CAST(SUM($cts) AS DOUBLE) / COUNT($cts))
           | / (COUNT($cts) - 1)) / 100.0, 4) AS $al""".stripMargin.replaceAll("\n", " ")
      case CountIf(p, al) =>
        s"COUNT(*) FILTER (WHERE ${exprSql(p, spark)}) AS $al"
      case MoneySumIf(cn, p, al) =>
        s"COALESCE(CAST(SUM(${Canonical.decSql(cn)}) FILTER (WHERE ${exprSql(p, spark)}) AS DOUBLE), 0.0) AS $al"
    }
  }
}
