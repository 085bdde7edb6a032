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
  * A `Rel` tree compiles two ways:
  *   - [[Compile.toDataFrame]] → a lazy Spark plan (Catalyst optimizes);
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

  // ------------------------------------------------------------------ rels
  sealed trait Rel
  /** Named base table (resolved per backend: parquet dir / DuckDB view). */
  final case class Scan(table: String) extends Rel
  final case class Filter(in: Rel, pred: Expr) extends Rel
  final case class Project(in: Rel, cols: Seq[(Expr, String)]) extends Rel
  final case class GroupAgg(in: Rel, keys: Seq[String], aggs: Seq[Agg]) extends Rel
  final case class InnerJoin(l: Rel, r: Rel, lk: String, rk: String) extends Rel
  /** keys: (column, ascending); always NULLS FIRST (contract). */
  final case class Sort(in: Rel, keys: Seq[(String, Boolean)]) extends Rel
  final case class Limit(in: Rel, n: Int) extends Rel

  // ----------------------------------------------------------- fluent api
  implicit final class RelOps(private val r: Rel) extends AnyVal {
    def where(pred: Expr): Rel = Filter(r, pred)
    def select(cols: (Expr, String)*): Rel = Project(r, cols)
    def groupBy(keys: String*)(aggs: Agg*): Rel = GroupAgg(r, keys, aggs)
    def join(other: Rel, lk: String, rk: String): Rel = InnerJoin(r, other, lk, rk)
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
        case InnerJoin(l, r, lk, rk) =>
          toDataFrame(spark, sfDir, l)
            .join(toDataFrame(spark, sfDir, r), col(lk) === col(rk))
        case Sort(in, keys) =>
          toDataFrame(spark, sfDir, in)
            .orderBy(keys.map { case (k, asc) =>
              if (asc) asc_nulls_first(k) else desc_nulls_last(k) }: _*)
        case Limit(in, n) => toDataFrame(spark, sfDir, in).limit(n)
      }

    private def exprCol(e: Expr): Column = e match {
      case Col(n) => col(n)
      case LitNum(v) => lit(v)
      case LitStr(v) => lit(v)
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
    }

    // ------------------------------------------------------------ duckdb
    def toSql(rel: Rel): String = s"SELECT * FROM ${relSql(rel)}"

    private def relSql(rel: Rel): String = rel match {
      case Scan(t) => t
      case Filter(in, p) =>
        s"(SELECT * FROM ${relSql(in)} WHERE ${exprSql(p)})"
      case Project(in, cols) =>
        val cs = cols.map { case (e, a) => s"${exprSql(e)} AS $a" }.mkString(", ")
        s"(SELECT $cs FROM ${relSql(in)})"
      case GroupAgg(in, keys, aggs) =>
        val sel = (keys ++ aggs.map(aggSql)).mkString(", ")
        val grp = if (keys.isEmpty) "" else s" GROUP BY ${keys.mkString(", ")}"
        s"(SELECT $sel FROM ${relSql(in)}$grp)"
      case InnerJoin(l, r, lk, rk) =>
        s"(SELECT * FROM ${relSql(l)} JOIN ${relSql(r)} ON $lk = $rk)"
      case Sort(in, keys) =>
        val ks = keys.map { case (k, asc) =>
          s"$k ${if (asc) "ASC" else "DESC"} NULLS ${if (asc) "FIRST" else "LAST"}" }
          .mkString(", ")
        s"(SELECT * FROM ${relSql(in)} ORDER BY $ks)"
      case Limit(in, n) => s"(SELECT * FROM ${relSql(in)} LIMIT $n)"
    }

    private def exprSql(e: Expr): String = e match {
      case Col(n) => n
      case LitNum(v) => if (v == v.floor && v.abs < 1e15) v.toLong.toString else v.toString
      case LitStr(v) => s"'${v.replace("'", "''")}'"
      case Bin(op, l, r) =>
        val o = op match {
          case "and" => "AND"; case "or" => "OR"; case "!=" => "<>"; case x => x
        }
        s"(${exprSql(l)} $o ${exprSql(r)})"
    }

    private def aggSql(a: Agg): String = a match {
      case CountAll(al) => s"COUNT(*) AS $al"
      case CountDistinct(cn, al) => s"COUNT(DISTINCT $cn) AS $al"
      case MoneySum(cn, al) => s"${Canonical.moneySumSql(cn)} AS $al"
      case Avg4(cn, al) => s"${Canonical.avg4Sql(cn)} AS $al"
      case MinOf(cn, al) => s"MIN($cn) AS $al"
      case MaxOf(cn, al) => s"MAX($cn) AS $al"
    }
  }
}
