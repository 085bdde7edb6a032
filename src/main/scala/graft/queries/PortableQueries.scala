package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.portable.Portable._
import graft.portable.Portable.Compile

/** Queries written ONCE in the portable IR, with BOTH the engine side
  * and the DuckDB oracle generated from the same tree — the reference's
  * Ibis thesis ("one expression, two backends",
  * `taxi_pipeline.py:89-94,115-117,140-147`) realized in graft. These
  * entries go through the same hash gate as the hand-paired queries:
  * if the two compilers ever diverge semantically, the driver's differ
  * catches it.
  */
object PortableQueries {

  /** The reference analytics question transplanted (Q02 shape):
    * filter → group → contract-avg, ordered.
    */
  val refQuery: Rel =
    table("orders")
      .where(Bin(">", c("o_totalprice"), LitNum(100000)))
      .groupBy("o_orderpriority")(
        CountAll("n"), Avg4("o_totalprice", "avg_price"))
      .orderBy("o_orderpriority" -> true)

  /** Join + aggregate (Q05 shape) with a top-k tail. */
  val joinAgg: Rel =
    table("orders")
      .join(table("customer"), "o_custkey", "c_custkey")
      .groupBy("c_mktsegment")(
        CountAll("n"), MoneySum("o_totalprice", "sum_price"),
        MinOf("c_custkey", "min_cust"), MaxOf("o_orderkey", "max_order"))
      .orderBy("c_mktsegment" -> true)

  /** Conjunctive filter + projection + sort/limit (Q03 shape). */
  val filterTopK: Rel =
    table("orders")
      .where(Bin("and",
        Bin("=", c("o_orderstatus"), LitStr("F")),
        Bin(">", c("o_totalprice"), LitNum(50000))))
      .select(c("o_orderkey") -> "o_orderkey", c("o_totalprice") -> "o_totalprice")
      .orderBy("o_totalprice" -> false, "o_orderkey" -> true)
      .limit(50)

  val all: Seq[(String, Rel)] = Seq(
    "portable_ref_query" -> refQuery,
    "portable_join_agg" -> joinAgg,
    "portable_filter_topk" -> filterTopK,
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, rel) =>
      n -> ((s: SparkSession, dir: String) => Compile.toDataFrame(s, dir, rel))
    }.toMap

  def oracleSql: Map[String, String] =
    all.map { case (n, rel) => n -> Compile.toSql(rel) }.toMap
}
