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

  /** Left outer join + ranking window + HAVING-style post-filter: the
    * null-producing side flows through ROW_NUMBER with the contract's
    * pinned null order, then top-2 orders per customer survive.
    */
  val leftJoinRank: Rel =
    table("customer")
      .where(Bin("<", c("c_custkey"), LitNum(40)))
      .leftJoin(table("orders"), "c_custkey", "o_custkey")
      .window(Seq("c_custkey"), Seq("o_totalprice" -> false, "o_orderkey" -> true),
        RowNum, "rn")
      .where(Bin("<=", c("rn"), LitNum(2)))
      .select(c("c_custkey") -> "c_custkey", c("rn") -> "rn",
        c("o_orderkey") -> "o_orderkey", c("o_totalprice") -> "o_totalprice")
      .orderBy("c_custkey" -> true, "rn" -> true)

  /** UNION ALL of two filtered projections → group → HAVING → sort:
    * the bag-union and post-aggregation-filter vocabulary.
    */
  val unionHaving: Rel =
    table("orders")
      .where(Bin(">", c("o_totalprice"), LitNum(150000)))
      .select(c("o_custkey") -> "k")
      .unionAll(
        table("orders")
          .where(Bin("=", c("o_orderstatus"), LitStr("F")))
          .select(c("o_custkey") -> "k"))
      .groupBy("k")(CountAll("n"))
      .having(Bin(">=", c("n"), LitNum(8)))
      .orderBy("k" -> true)

  /** Anti join + distinct + running money sum: customers WITHOUT any
    * high-value order, their order history with a §2.4-contract
    * cumulative spend.
    */
  val antiRunning: Rel =
    table("orders")
      .where(Bin("<", c("o_custkey"), LitNum(30)))
      .antiJoin(
        table("orders").where(Bin(">", c("o_totalprice"), LitNum(250000)))
          .select(c("o_custkey") -> "hi_k").distinct,
        "o_custkey", "hi_k")
      .window(Seq("o_custkey"), Seq("o_orderdate" -> true, "o_orderkey" -> true),
        RunningMoneySum("o_totalprice"), "running")
      .select(c("o_custkey") -> "o_custkey", c("o_orderkey") -> "o_orderkey",
        c("running") -> "running")
      .orderBy("o_custkey" -> true, "o_orderkey" -> true)

  /** Semi join over a deduped key set: orders whose customer appears in
    * the automobile segment (EXISTS vocabulary through the IR).
    */
  val semiDistinct: Rel =
    table("orders")
      .semiJoin(
        table("customer")
          .where(Bin("=", c("c_mktsegment"), LitStr("AUTOMOBILE")))
          .select(c("c_custkey") -> "c_custkey").distinct,
        "o_custkey", "c_custkey")
      .groupBy("o_orderpriority")(
        CountAll("n"), Avg4("o_totalprice", "avg_price"))
      .orderBy("o_orderpriority" -> true)

  /** Scalar-function vocabulary through the IR: string, date-part, and
    * math functions from the cross-dialect subset, with explicit casts
    * where the engines' native widths differ (year/length are INT on
    * Spark, BIGINT on DuckDB).
    */
  val scalarFns: Rel =
    table("orders")
      .where(Bin("<", c("o_orderkey"), LitNum(2000)))
      .select(
        c("o_orderkey") -> "k",
        Fn("upper", Seq(Fn("substr", Seq(c("o_orderpriority"), LitNum(3), LitNum(6))))) -> "pname",
        Cast(Fn("year", Seq(c("o_orderdate"))), "bigint") -> "yr",
        Cast(Fn("length", Seq(c("o_orderpriority"))), "bigint") -> "prio_len",
        Cast(Fn("floor", Seq(Bin("/", c("o_totalprice"), LitNum(1000)))), "bigint") -> "kprice",
        Fn("coalesce", Seq(Fn("trim", Seq(c("o_orderstatus"))), LitStr(""))) -> "st")
      .orderBy("k" -> true)

  /** CASE/WHEN + IS [NOT] NULL through a null-producing left join, with
    * the plain exact-integer aggregates: customers banded by their
    * orders' value, order-less customers surfacing through the NULL
    * branch (the first thing a second Ibis pipeline reaches for).
    */
  val caseIsNull: Rel =
    table("customer")
      .where(Bin("<", c("c_custkey"), LitNum(200)))
      .leftJoin(table("orders"), "c_custkey", "o_custkey")
      .select(
        c("c_custkey") -> "ck",
        Case(Seq(
          IsNull(c("o_orderkey")) -> LitStr("none"),
          Bin(">", c("o_totalprice"), LitNum(200000)) -> LitStr("high"),
          Bin(">", c("o_totalprice"), LitNum(100000)) -> LitStr("mid")),
          LitStr("low")) -> "band",
        Case(Seq(IsNotNull(c("o_orderkey")) -> LitNum(1)), LitNum(0)) -> "has_order")
      .groupBy("band")(
        CountAll("n"), SumOf("has_order", "n_orders"),
        CountDistinct("ck", "n_cust"))
      .orderBy("band" -> true)

  /** Multi-key equi-join (the grouped-rejoin pattern: per-(order, flag)
    * rollup joined back on BOTH keys) + DateDiffDays + the plain
    * Sum/Avg and contract-stddev aggregates.
    */
  val multiKeyDates: Rel = {
    val grp = table("lineitem")
      .groupBy("l_orderkey", "l_returnflag")(
        CountAll("grp_n"), MoneySum("l_extendedprice", "grp_rev"))
      .select(c("l_orderkey") -> "gk", c("l_returnflag") -> "gf",
        c("grp_n") -> "grp_n")
    table("lineitem")
      .where(Bin("<", c("l_orderkey"), LitNum(400)))
      .joinOn(grp, "l_orderkey" -> "gk", "l_returnflag" -> "gf")
      .select(c("gf") -> "gf",
        c("grp_n") -> "grp_n",
        c("l_quantity") -> "qty",
        c("l_extendedprice") -> "price",
        DateDiffDays(c("l_shipdate"),
          Cast(Fn("date_trunc", Seq(LitStr("year"), c("l_shipdate"))), "date")) -> "ship_doy")
      .groupBy("gf")(
        CountAll("n"), SumOf("grp_n", "sum_grp_n"),
        AvgOf("ship_doy", "avg_ship_doy"),
        StddevMoney4("price", "sd_price"))
      .orderBy("gf" -> true)
  }

  /** Second scalar-function battery: string surgery (split_part /
    * replace / lpad), date bucketing (date_trunc under an explicit DATE
    * cast — Spark returns TIMESTAMP, DuckDB DATE), NULLIF, and the
    * day-offset DateDiffDays — all on one projection.
    */
  val scalarFns2: Rel =
    table("orders")
      .where(Bin("<", c("o_orderkey"), LitNum(1500)))
      .select(
        c("o_orderkey") -> "k",
        Fn("split_part", Seq(c("o_orderpriority"), LitStr("-"), LitNum(2))) -> "prio_word",
        Fn("replace", Seq(c("o_orderstatus"), LitStr("F"), LitStr("FINAL"))) -> "st",
        Fn("lpad", Seq(Cast(c("o_orderkey"), "string"), LitNum(8), LitStr("0"))) -> "k_pad",
        Cast(Fn("date_trunc", Seq(LitStr("month"), c("o_orderdate"))), "date") -> "omonth",
        Fn("nullif", Seq(c("o_orderstatus"), LitStr("O"))) -> "st_null",
        DateDiffDays(c("o_orderdate"),
          Cast(Fn("date_trunc", Seq(LitStr("month"), c("o_orderdate"))), "date")) -> "dom0")
      .orderBy("k" -> true)

  /** The predicate vocabulary an Ibis user writes in the first lines
    * of any pipeline: IN-list, BETWEEN, LIKE, and the NULLIF→COALESCE
    * recoding idiom — one tree, three frontends.
    */
  val predicates: Rel =
    table("orders")
      .where(Bin("and",
        InList(c("o_orderpriority"),
          Seq(LitStr("1-URGENT"), LitStr("2-HIGH"), LitStr("3-MEDIUM"))),
        Between(c("o_totalprice"), LitNum(50000), LitNum(250000))))
      .where(Like(c("o_orderpriority"), "%-%"))
      .select(
        Fn("coalesce", Seq(
          Fn("nullif", Seq(c("o_orderstatus"), LitStr("O"))),
          LitStr("open"))) -> "status2",
        c("o_orderpriority") -> "prio",
        c("o_totalprice") -> "price")
      .groupBy("status2", "prio")(
        CountAll("n"), MoneySum("price", "rev"))
      .orderBy("status2" -> true, "prio" -> true)

  /** Conditional aggregation — the SQL-standard FILTER clause (DuckDB
    * and Spark SQL spell it identically; the DataFrame backend compiles
    * count(when)/sum(when)): per-priority totals alongside
    * filtered sub-counts and a filtered money sum, from ONE pass.
    * The relational idiom that replaces a self-join per condition.
    */
  val conditionalAgg: Rel =
    table("orders")
      .groupBy("o_orderpriority")(
        CountAll("n"),
        CountIf(Bin("=", c("o_orderstatus"), LitStr("F")), "n_f"),
        CountIf(Bin("and",
          Bin("=", c("o_orderstatus"), LitStr("O")),
          Bin(">", c("o_totalprice"), LitNum(100000))), "n_o_big"),
        MoneySumIf("o_totalprice",
          Bin("=", c("o_orderstatus"), LitStr("P")), "rev_p"))
      .orderBy("o_orderpriority" -> true)

  /** Trailing moving average — the time-series smoothing idiom — over
    * an EXPLICIT `ROWS 6 PRECEDING` frame in the decimal contract lane:
    * per-priority 7-order trailing average of order value, partial
    * frames at each partition head averaging over the rows that exist.
    */
  val movingAvg: Rel =
    table("orders")
      .where(Bin(">", c("o_totalprice"), LitNum(250000)))
      .select(c("o_orderpriority") -> "prio",
        c("o_orderkey") -> "okey", c("o_totalprice") -> "price")
      .window(Seq("prio"), Seq("okey" -> true),
        MovingAvg4("price", 6), "trail7")
      .orderBy("prio" -> true, "okey" -> true)

  val all: Seq[(String, Rel)] = Seq(
    "portable_ref_query" -> refQuery,
    "portable_join_agg" -> joinAgg,
    "portable_filter_topk" -> filterTopK,
    "portable_left_join_rank" -> leftJoinRank,
    "portable_union_having" -> unionHaving,
    "portable_anti_running" -> antiRunning,
    "portable_semi_distinct" -> semiDistinct,
    "portable_scalar_fns" -> scalarFns,
    "portable_case_isnull" -> caseIsNull,
    "portable_multikey_dates" -> multiKeyDates,
    "portable_scalar_fns2" -> scalarFns2,
    "portable_predicates" -> predicates,
    "portable_conditional_agg" -> conditionalAgg,
    "portable_moving_avg" -> movingAvg,
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, rel) =>
      n -> ((s: SparkSession, dir: String) => Compile.toDataFrame(s, dir, rel))
    }.toMap

  def oracleSql: Map[String, String] =
    all.map { case (n, rel) => n -> Compile.toSql(rel) }.toMap
}
