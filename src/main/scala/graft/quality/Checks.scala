package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks — the reference's own stated extension roadmap
  * ("data quality checks", README.md:95). Each check is a single
  * aggregation returning violation counts (0 = pass), so a whole
  * check-suite over a table is ONE scan with map-side combine — the
  * shape that stays cheap at 100 TB.
  */
object Checks {

  final case class CheckResult(check: String, violations: Long) {
    def passed: Boolean = violations == 0
  }

  /** Count of NULLs in each of the given columns. */
  def notNull(df: DataFrame, cols: Seq[String]): Seq[CheckResult] = {
    val aggs = cols.map(c => sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.zipWithIndex.map { case (c, i) => CheckResult(s"not_null($c)", row.getLong(i)) }
  }

  /** Number of key values occurring more than once. */
  def unique(df: DataFrame, key: String): CheckResult = {
    val dups = df.groupBy(key).count().filter(col("count") > 1).count()
    CheckResult(s"unique($key)", dups)
  }

  /** Child rows whose FK has no match in the parent (left-anti join). */
  def referential(child: DataFrame, fk: String, parent: DataFrame,
      pk: String): CheckResult = {
    val orphans = child.join(parent, col(fk) === col(pk), "left_anti").count()
    CheckResult(s"fk($fk->$pk)", orphans)
  }

  /** Rows where the predicate does NOT hold (nulls count as violations). */
  def satisfies(df: DataFrame, name: String, pred: Column): CheckResult =
    CheckResult(s"satisfies($name)",
      df.filter(!coalesce(pred, lit(false))).count())

  // ----------------------------------------------------------- lazy suite
  // The eager helpers above run one Spark job EACH — fine interactively,
  // wasteful as a suite (N checks = N scans). The lazy variants below
  // return unevaluated (check, violations) frames the caller unions and
  // evaluates as ONE job; every scan-shaped check over a table folds
  // into a single aggregation over a single scan.

  /** All not-null + predicate checks over one table as ONE lazy
    * single-scan aggregation: (check, violations) rows.
    */
  def scanSuite(df: DataFrame, notNullCols: Seq[String],
      preds: Seq[(String, Column)] = Nil): DataFrame = {
    val aggs =
      notNullCols.map(c =>
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"not_null($c)")) ++
      preds.map { case (n, p) =>
        sum(when(!coalesce(p, lit(false)), 1).otherwise(0)).cast("long")
          .as(s"satisfies($n)") }
    require(aggs.nonEmpty, "no checks requested")
    val names = notNullCols.map(c => s"not_null($c)") ++
      preds.map { case (n, _) => s"satisfies($n)" }
    val kvs = names.flatMap(n => Seq(lit(n), col(s"`$n`")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(map(kvs: _*)).as(Seq("check", "violations")))
  }

  /** Lazy [[unique]]: one (check, violations) row. */
  def uniqueLazy(df: DataFrame, key: String): DataFrame =
    df.groupBy(key).count().filter(col("count") > 1)
      .agg(count(lit(1)).cast("long").as("violations"))
      .select(lit(s"unique($key)").as("check"), col("violations"))

  /** Lazy [[referential]]: one (check, violations) row. */
  def referentialLazy(child: DataFrame, fk: String, parent: DataFrame,
      pk: String): DataFrame =
    child.join(parent, col(fk) === col(pk), "left_anti")
      .agg(count(lit(1)).cast("long").as("violations"))
      .select(lit(s"fk($fk->$pk)").as("check"), col("violations"))
}
