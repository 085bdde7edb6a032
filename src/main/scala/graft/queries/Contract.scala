package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Canonical, Tables}
import graft.Canonical.{avg4, avg4Sql, dec, decSql, moneySum, moneySumSql}

/** The declared query inventory Q01–Q61 (SURVEY §2.4) — the t2 correctness
  * contract. Each query has (a) a Spark DataFrame formulation and (b) an
  * equivalent DuckDB SQL oracle over the same parquet tables.
  *
  * Determinism rules applied throughout (SURVEY §2.4):
  *   - every query ends in a total ORDER BY (unique key set, NULLS FIRST
  *     made explicit on the oracle side — DuckDB defaults to NULLS LAST);
  *   - money sums go through DECIMAL(18,4) ([[graft.Canonical]]);
  *   - no raw TIMESTAMP columns in outputs — time is emitted as epoch
  *     micros (BIGINT) or extracted integer fields, sidestepping tz /
  *     precision / schema drift between the two engines;
  *   - computed integers are cast to the same width on both sides
  *     (DuckDB SUM(int)→HUGEINT and LENGTH→BIGINT vs Spark INT/LONG).
  *
  * Query semantics transplant the reference's single analytics question —
  * filter → group → avg (`taxi_pipeline_native.py:92-97,127-129,166-171`)
  * — onto the judged star schema (Q02) and then widen across the L2
  * capability checklist (SURVEY §2.2).
  */
object Contract {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** name -> (spark query, duckdb oracle sql) */
  lazy val entries: Seq[(String, Q, String)] = Seq(

    // Q01 — multi-source scan, count, union-all, literal projection.
    ("q01_counts",
      (s: SparkSession, dir: String) =>
        Tables.core
          .map(n => t(s, dir, n).agg(count(lit(1)).as("n")).select(lit(n).as("tbl"), col("n")))
          .reduce(_.unionAll(_))
          .orderBy("tbl"),
      Tables.core
        .map(n => s"SELECT '$n' AS tbl, COUNT(*) AS n FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY tbl")),

    // Q02 — the reference query transplanted: filter → group → avg.
    ("q02_ref_query",
      (s: SparkSession, dir: String) =>
        t(s, dir, "orders")
          .filter(col("o_totalprice") > 100000)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), avg4(col("o_totalprice")).as("avg_price"))
          .orderBy("o_orderpriority"),
      s"""SELECT o_orderpriority, COUNT(*) AS n, ${avg4Sql("o_totalprice")} AS avg_price
          FROM orders WHERE o_totalprice > 100000
          GROUP BY o_orderpriority ORDER BY o_orderpriority"""),

    // Q03 — projection, conjunctive filter, sort desc, top-k.
    ("q03_topk",
      (s: SparkSession, dir: String) =>
        t(s, dir, "orders")
          .filter(col("o_orderstatus") === "F" &&
            col("o_orderdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100),
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderstatus = 'F' AND o_orderdate >= TIMESTAMP '1996-01-01'
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),

    // Q04 — TPC-H Q1 shape: multi-aggregate hash agg with computed exprs.
    ("q04_pricing_summary",
      (s: SparkSession, dir: String) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            moneySum(col("l_quantity")).as("sum_qty"),
            moneySum(col("l_extendedprice")).as("sum_base"),
            Canonical.revenueSum(col("l_extendedprice"), col("l_discount"))
              .as("sum_disc_price"),
            avg4(col("l_quantity")).as("avg_qty"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus"),
      s"""SELECT l_returnflag, l_linestatus,
            ${moneySumSql("l_quantity")} AS sum_qty,
            ${moneySumSql("l_extendedprice")} AS sum_base,
            ${Canonical.revenueSumSql("l_extendedprice", "l_discount")} AS sum_disc_price,
            ${avg4Sql("l_quantity")} AS avg_qty,
            COUNT(*) AS n
          FROM lineitem GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus"""),

    // Q05 — fact ⋈ dim inner equi-join + post-join agg.
    ("q05_join_agg",
      (s: SparkSession, dir: String) =>
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
          .orderBy("c_mktsegment"),
      s"""SELECT c_mktsegment, COUNT(*) AS n, ${moneySumSql("o_totalprice")} AS sum_price
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment ORDER BY c_mktsegment"""),

    // Q06 — 3-way join + filter + agg + top-k (TPC-H Q3 shape).
    ("q06_revenue_topk",
      (s: SparkSession, dir: String) =>
        t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderkey")
          .agg(Canonical.revenueSum(col("l_extendedprice"), col("l_discount"))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10),
      s"""SELECT o_orderkey,
            ${Canonical.revenueSumSql("l_extendedprice", "l_discount")} AS revenue
          FROM customer JOIN orders ON c_custkey = o_custkey
                        JOIN lineitem ON o_orderkey = l_orderkey
          WHERE c_mktsegment = 'BUILDING'
          GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10"""),

    // Q07 — left outer join with a null-producing side.
    ("q07_left_join",
      (s: SparkSession, dir: String) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey"),
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey"""),

    // Q08 — left-semi join (EXISTS).
    ("q08_semi_join",
      (s: SparkSession, dir: String) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders").filter(col("o_totalprice") > 150000),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey")
          .orderBy("c_custkey"),
      """SELECT c_custkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 150000)
         ORDER BY c_custkey"""),

    // Q09 — left-anti join (NOT EXISTS).
    ("q09_anti_join",
      (s: SparkSession, dir: String) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey")
          .orderBy("c_custkey"),
      """SELECT c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey"""),

    // Q10 — broadcast-size dim chain join (region ⋈ nation ⋈ customer).
    ("q10_dim_chain",
      (s: SparkSession, dir: String) =>
        t(s, dir, "region")
          .join(t(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
          .join(t(s, dir, "customer"), col("n_nationkey") === col("c_nationkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n"))
          .orderBy("r_name", "n_name"),
      """SELECT r_name, n_name, COUNT(*) AS n
         FROM region JOIN nation ON r_regionkey = n_regionkey
                     JOIN customer ON n_nationkey = c_nationkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name"""),

    // Q11 — distinct / count-distinct. Two independent single-distinct
    // aggregates cross-joined instead of one multi-distinct agg: Spark
    // lowers the latter to an Expand that doubles and double-shuffles
    // every input row; two column-pruned scans each shuffle only their
    // own distinct keys — the cheaper plan at fact-table scale.
    ("q11_count_distinct",
      (s: SparkSession, dir: String) => {
        val o = t(s, dir, "orders")
        o.agg(countDistinct(col("o_custkey")).as("d1"))
          .crossJoin(o.agg(countDistinct(col("o_orderpriority")).as("d2")))
      },
      """SELECT COUNT(DISTINCT o_custkey) AS d1, COUNT(DISTINCT o_orderpriority) AS d2
         FROM orders"""),

    // Q12 — rollup / grouping sets over the dim chain, via the SQL
    // frontend (reference O17): the DataFrame rollup API in Spark 4.1
    // false-positives the ambiguous-self-join check when grouping columns
    // are re-referenced after agg; the parser path carries no dataset-id
    // metadata and plans the identical Expand + Aggregate.
    ("q12_rollup",
      (s: SparkSession, dir: String) => {
        t(s, dir, "region").createOrReplaceTempView("region")
        t(s, dir, "nation").createOrReplaceTempView("nation")
        t(s, dir, "customer").createOrReplaceTempView("customer")
        s.sql("""SELECT COALESCE(r_name, '(all)') AS rname,
                        COALESCE(n_name, '(all)') AS nname, COUNT(*) AS n
                 FROM region JOIN nation ON r_regionkey = n_regionkey
                             JOIN customer ON n_nationkey = c_nationkey
                 GROUP BY ROLLUP(r_name, n_name) ORDER BY rname, nname""")
      },
      """SELECT COALESCE(r_name, '(all)') AS rname, COALESCE(n_name, '(all)') AS nname,
            COUNT(*) AS n
         FROM region JOIN nation ON r_regionkey = n_regionkey
                     JOIN customer ON n_nationkey = c_nationkey
         GROUP BY ROLLUP(r_name, n_name) ORDER BY rname, nname"""),

    // Q13 — window ranking: top-3 per group.
    ("q13_window_rank",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("c_mktsegment", "rn", "c_custkey")
          .orderBy("c_mktsegment", "rn")
      },
      """SELECT c_mktsegment, rn, c_custkey FROM (
           SELECT c_mktsegment, c_custkey,
                  ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal DESC, c_custkey) AS rn
           FROM customer) q
         WHERE rn <= 3 ORDER BY c_mktsegment, rn"""),

    // Q14 — window analytic lag: order-to-order price delta per customer.
    ("q14_window_lag",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        t(s, dir, "orders")
          .filter(col("o_custkey") < 50)
          .withColumn("delta",
            (dec(col("o_totalprice")) - lag(dec(col("o_totalprice")), 1).over(w))
              .cast("double"))
          .select("o_custkey", "o_orderkey", "delta")
          .orderBy("o_custkey", "o_orderkey")
      },
      s"""SELECT o_custkey, o_orderkey,
            CAST(${decSql("o_totalprice")} - LAG(${decSql("o_totalprice")}) OVER
              (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS delta
          FROM orders WHERE o_custkey < 50
          ORDER BY o_custkey, o_orderkey"""),

    // Q15 — window frame running aggregate over event time.
    ("q15_running_sum",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .filter(col("user_id") < 20)
          .withColumn("running", sum(dec(col("value"))).over(w).cast("double"))
          .select("user_id", "event_id", "running")
          .orderBy("user_id", "event_id")
      },
      s"""SELECT user_id, event_id,
            CAST(SUM(${decSql("value")}) OVER
              (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
          FROM events WHERE user_id < 20
          ORDER BY user_id, event_id"""),

    // Q16 — top-1-per-group via window (the dedup pattern): latest event.
    ("q16_latest_per_user",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_id", "event_type")
          .orderBy("user_id")
      },
      """SELECT user_id, event_id, event_type FROM (
           SELECT user_id, event_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) q
         WHERE rn = 1 ORDER BY user_id"""),

    // Q17 — intersect / except / union-distinct, tagged and concatenated.
    ("q17_set_ops",
      (s: SparkSession, dir: String) => {
        val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
        val sup = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
        c.intersect(sup).select(lit("intersect").as("tag"), col("k"))
          .unionAll(c.except(sup).select(lit("except").as("tag"), col("k")))
          .unionAll(c.union(sup).distinct().select(lit("union").as("tag"), col("k")))
          .orderBy("tag", "k")
      },
      """SELECT 'intersect' AS tag, k FROM
           (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier) a
         UNION ALL
         SELECT 'except' AS tag, k FROM
           (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier) b
         UNION ALL
         SELECT 'union' AS tag, k FROM
           (SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier) c
         ORDER BY tag, k"""),

    // Q18 — string function battery.
    ("q18_strings",
      (s: SparkSession, dir: String) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("up"),
            substring(col("p_type"), 1, 6).as("sub"),
            length(col("p_name")).as("ln"),
            col("p_name").like("%a%").cast("int").as("lk"),
            split_part(col("p_type"), lit(" "), lit(1)).as("sp"))
          .orderBy("p_partkey")
          .limit(200),
      """SELECT p_partkey, UPPER(p_brand) AS up, SUBSTR(p_type, 1, 6) AS sub,
            CAST(LENGTH(p_name) AS INT) AS ln,
            CAST(p_name LIKE '%a%' AS INT) AS lk,
            SPLIT_PART(p_type, ' ', 1) AS sp
         FROM part ORDER BY p_partkey LIMIT 200"""),

    // Q19 — date/time extraction + agg.
    ("q19_dates",
      (s: SparkSession, dir: String) =>
        t(s, dir, "orders")
          .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
          .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
          .orderBy("yr", "mo"),
      s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
            CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
            COUNT(*) AS n, ${moneySumSql("o_totalprice")} AS sum_price
          FROM orders GROUP BY yr, mo ORDER BY yr, mo"""),

    // Q20 — CASE bucketing, math fns, forced NULL group key.
    ("q20_case_math_nullkey",
      (s: SparkSession, dir: String) =>
        t(s, dir, "lineitem")
          .groupBy(
            when(col("l_quantity") < 10, "low")
              .when(col("l_quantity") < 25, "mid")
              .otherwise("high").as("bucket"),
            expr("nullif(l_linestatus, 'F')").as("nkey"))
          .agg(
            count(lit(1)).as("n"),
            sum(floor(col("l_quantity"))).as("fl"),
            sum(ceil(col("l_quantity"))).as("ce"),
            // round 16: moneySum ≡ the old SUM(DECIMAL)::DOUBLE bit-for-
            // bit (CanonicalFixedPointSpec); wholeHalfUp ≡ per-row
            // round()::LONG on ≤2-dp money — both drop the per-row
            // BigDecimal paths from this one-task fact scan
            Canonical.moneySum(abs(col("l_discount") - 0.05)).as("ab"),
            sum(Canonical.wholeHalfUp(col("l_extendedprice"))).as("rd"))
          .orderBy(asc_nulls_first("bucket"), asc_nulls_first("nkey")),
      s"""SELECT CASE WHEN l_quantity < 10 THEN 'low'
                      WHEN l_quantity < 25 THEN 'mid'
                      ELSE 'high' END AS bucket,
            NULLIF(l_linestatus, 'F') AS nkey,
            COUNT(*) AS n,
            CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS fl,
            CAST(SUM(CAST(CEIL(l_quantity) AS BIGINT)) AS BIGINT) AS ce,
            CAST(SUM(${decSql("ABS(l_discount - 0.05)")}) AS DOUBLE) AS ab,
            CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT)) AS BIGINT) AS rd
          FROM lineitem GROUP BY bucket, nkey
          ORDER BY bucket NULLS FIRST, nkey NULLS FIRST"""),

    // Q21 — JSON extraction from events.props.
    ("q21_json",
      (s: SparkSession, dir: String) =>
        t(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sumk"),
            min(col("k")).as("mink"), max(col("k")).as("maxk"))
          .orderBy("event_type"),
      """SELECT event_type, COUNT(*) AS n,
            CAST(SUM(k) AS BIGINT) AS sumk, MIN(k) AS mink, MAX(k) AS maxk
         FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
               FROM events) q
         GROUP BY event_type ORDER BY event_type"""),

    // Q22 — tumbling 1-hour event-time window (batch semantics).
    ("q22_tumbling_window",
      (s: SparkSession, dir: String) =>
        t(s, dir, "events")
          .withColumn("bucket", expr("unix_micros(cast(ts as timestamp)) div 3600000000"))
          .groupBy("bucket", "event_type")
          .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sumv"))
          .orderBy("bucket", "event_type"),
      s"""SELECT epoch_us(ts) // 3600000000 AS bucket, event_type,
            COUNT(*) AS n, ${moneySumSql("value")} AS sumv
          FROM events GROUP BY bucket, event_type ORDER BY bucket, event_type"""),

    // Q23 — sessionization (gaps-and-islands: lag + cumulative sum).
    ("q23_sessionize",
      (s: SparkSession, dir: String) => {
        val wOrd = Window.partitionBy("user_id").orderBy("eus", "event_id")
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .withColumn("eus", expr("unix_micros(cast(ts as timestamp))"))
          .withColumn("prev", lag(col("eus"), 1).over(wOrd))
          .withColumn("newsess",
            when(col("prev").isNull || col("eus") - col("prev") > 1800000000L, 1)
              .otherwise(0))
          .withColumn("sid", sum(col("newsess")).over(wRun))
          .groupBy("user_id", "sid")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("user_id")
          .agg(max(col("sid")).as("n_sessions"), max(col("cnt")).as("max_len"))
          .orderBy("user_id")
      },
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(ts) AS eus FROM events),
         s AS (
           SELECT user_id, event_id, eus,
                  CASE WHEN LAG(eus) OVER w IS NULL
                            OR eus - LAG(eus) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS newsess
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY eus, event_id)),
         t AS (
           SELECT user_id,
                  CAST(SUM(newsess) OVER (PARTITION BY user_id ORDER BY eus, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
           FROM s),
         g AS (
           SELECT user_id, sid, COUNT(*) AS cnt FROM t GROUP BY user_id, sid)
         SELECT user_id, CAST(MAX(sid) AS BIGINT) AS n_sessions,
                CAST(MAX(cnt) AS BIGINT) AS max_len
         FROM g GROUP BY user_id ORDER BY user_id"""),

    // Q24 — exact dedup stats over documents (L3).
    ("q24_dedup_stats",
      (s: SparkSession, dir: String) => {
        val d = t(s, dir, "documents")
        val base = d.agg(count(lit(1)).as("total"), countDistinct(col("text")).as("uniq"))
        val dups = d.groupBy("text").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).agg(count(lit(1)).as("ndup"))
        base.crossJoin(dups)
      },
      """SELECT COUNT(*) AS total, COUNT(DISTINCT text) AS uniq,
            (SELECT COUNT(*) FROM (SELECT text FROM documents
                                   GROUP BY text HAVING COUNT(*) > 1) d) AS ndup
         FROM documents"""),

    // Q25 — array ops over embeddings (L3).
    ("q25_array_ops",
      (s: SparkSession, dir: String) =>
        t(s, dir, "embeddings")
          .groupBy("label")
          .agg(count(lit(1)).as("n"), min(col("vec_id")).as("minv"),
            max(col("vec_id")).as("maxv"), max(size(col("embedding"))).as("dim"))
          .orderBy("label"),
      """SELECT label, COUNT(*) AS n, MIN(vec_id) AS minv, MAX(vec_id) AS maxv,
            CAST(MAX(len(embedding)) AS INT) AS dim
         FROM embeddings GROUP BY label ORDER BY label"""),

    // Q26 — tokenize / explode / count: top-20 tokens (L3 text analysis).
    ("q26_token_topk",
      (s: SparkSession, dir: String) =>
        t(s, dir, "documents")
          .select(explode(split(lower(col("text")), " ")).as("tok"))
          .filter(col("tok") =!= "")
          .groupBy("tok")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("tok"))
          .limit(20),
      """SELECT tok, COUNT(*) AS n FROM (
           SELECT unnest(string_split(LOWER(text), ' ')) AS tok FROM documents) q
         WHERE tok <> '' GROUP BY tok ORDER BY n DESC, tok LIMIT 20"""),

    // Q27 — advanced aggregates: variance/stddev derived from EXACT
    // integer-cent decimal sums (engine-native stddev is FP-order-
    // dependent and can never be hash-judged). Magnitude discipline:
    // DuckDB's int128→double cast is not correctly rounded, so every
    // decimal that reaches a DOUBLE cast must keep its scaled integer
    // under 2^63 — hence cents (scale 0), not dollars (scale 8).
    ("q27_advanced_aggs",
      (s: SparkSession, dir: String) => {
        // Round 16: LONG fixed-point (see q34) — cents² ≤ 3.1·10¹⁵ per
        // row is long-safe, and the split-long sums' double combine is
        // bit-identical to the old decimal casts to |Σ| < 2⁷³.
        val o = t(s, dir, "orders")
          .withColumn("cents", Canonical.cents(col("o_totalprice")))
        val sumsq = Canonical.exactLongSumAsDouble(col("cents") * col("cents"))
        val sumc = Canonical.exactLongSumAsDouble(col("cents"))
        val n = count(col("cents"))
        val varCents = (sumsq - sumc * sumc / n) / (n - lit(1))
        o.groupBy("o_orderpriority")
          .agg(
            n.as("n"),
            // §2.4 rule 3: the squared-cents sums exceed 2⁵³ at sf≥0.1,
            // where the two engines' int128/decimal→double casts round
            // differently at the last ulp — the statistic itself is
            // stable to ~1e-10 relative, so the final doubles are
            // ROUND(x, 4) like every other free double in the contract
            round(varCents / 10000.0, 4).as("variance"),
            round(sqrt(varCents) / 100.0, 4).as("stddev"),
            // Array outputs crash the driver's pandas-based hasher
            // ("unhashable type: numpy.ndarray") — emit the key list as a
            // canonical comma-joined string on both sides instead.
            concat_ws(",", slice(sort_array(collect_list(col("o_orderkey"))), 1, 3))
              .as("first_keys"))
          .orderBy("o_orderpriority")
      },
      """WITH c AS (SELECT o_orderpriority, o_orderkey,
                CAST(ROUND(o_totalprice * 100) AS DECIMAL(18,0)) AS cents
              FROM orders)
          SELECT o_orderpriority, COUNT(cents) AS n,
            ROUND(((CAST(SUM(cents * cents) AS DOUBLE)
              - CAST(SUM(cents) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE) / COUNT(cents))
             / (COUNT(cents) - 1)) / 10000.0, 4) AS variance,
            ROUND(SQRT((CAST(SUM(cents * cents) AS DOUBLE)
              - CAST(SUM(cents) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE) / COUNT(cents))
             / (COUNT(cents) - 1)) / 100.0, 4) AS stddev,
            array_to_string((list_sort(list(o_orderkey)))[1:3], ',') AS first_keys
          FROM c GROUP BY o_orderpriority ORDER BY o_orderpriority"""),

    // Q28 — CUBE over the dim chain (all four grouping sets), via the
    // SQL frontend like Q12.
    ("q28_cube",
      (s: SparkSession, dir: String) => {
        t(s, dir, "nation").createOrReplaceTempView("nation")
        t(s, dir, "customer").createOrReplaceTempView("customer")
        s.sql("""SELECT COALESCE(n_name, '(all)') AS nname,
                        COALESCE(c_mktsegment, '(all)') AS seg, COUNT(*) AS n
                 FROM nation JOIN customer ON n_nationkey = c_nationkey
                 GROUP BY CUBE(n_name, c_mktsegment) ORDER BY nname, seg""")
      },
      """SELECT COALESCE(n_name, '(all)') AS nname,
            COALESCE(c_mktsegment, '(all)') AS seg, COUNT(*) AS n
         FROM nation JOIN customer ON n_nationkey = c_nationkey
         GROUP BY CUBE(n_name, c_mktsegment) ORDER BY nname, seg"""),

    // Q29 — remaining ranking/distribution window functions: ntile,
    // percent_rank, dense_rank, cume_dist (rank-derived ⇒ exact doubles).
    ("q29_window_distribution",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("c_mktsegment").orderBy(col("c_custkey"))
        t(s, dir, "customer")
          .filter(col("c_custkey") <= 200)
          .select(
            col("c_mktsegment"), col("c_custkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 4).as("pr"),
            dense_rank().over(w).cast("long").as("dr"),
            round(cume_dist().over(w), 4).as("cd"))
          .orderBy("c_mktsegment", "c_custkey")
      },
      """SELECT c_mktsegment, c_custkey,
            NTILE(4) OVER w AS quartile,
            ROUND(PERCENT_RANK() OVER w, 4) AS pr,
            CAST(DENSE_RANK() OVER w AS BIGINT) AS dr,
            ROUND(CUME_DIST() OVER w, 4) AS cd
         FROM customer WHERE c_custkey <= 200
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_custkey)
         ORDER BY c_mktsegment, c_custkey"""),

    // Q30 — scalar-function battery: date arithmetic (datediff arg order
    // differs between engines — SURVEY §7.6), trunc, concat/replace/trim,
    // regexp_extract, and a map built from the events JSON.
    ("q30_scalar_battery",
      (s: SparkSession, dir: String) =>
        t(s, dir, "events")
          .withColumn("d0", to_date(expr("TIMESTAMP '2024-01-01 00:00:00'")))
          .select(
            col("event_id"),
            datediff(to_date(expr("cast(ts as timestamp)")), col("d0"))
              .cast("long").as("days_since"),
            unix_micros(date_trunc("hour", expr("cast(ts as timestamp)")))
              .as("hour_us"),
            concat(upper(trim(col("event_type"))), lit(":"),
              regexp_replace(col("event_type"), "e", "3")).as("tag"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"),
            map_keys(from_json(col("props"), lit("map<string,int>"))).getItem(0).as("k0"))
          .filter(col("event_id") < 500)
          .orderBy("event_id"),
      """SELECT event_id,
            CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS days_since,
            epoch_us(date_trunc('hour', ts)) AS hour_us,
            UPPER(TRIM(event_type)) || ':' || regexp_replace(event_type, 'e', '3', 'g') AS tag,
            CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
            json_keys(props)[1] AS k0
         FROM events WHERE event_id < 500 ORDER BY event_id"""),

    // Q31 — theta / non-equi range join: orders banded into price tiers
    // via a broadcast nested-loop join against a tiny tier table (the
    // physical shape Spark picks for non-equi conditions; the tier side
    // is 4 rows, so BNLJ is the *right* plan at any scale).
    ("q31_range_join",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        val tiers = Seq(
          ("T1_low", 0.0, 75000.0), ("T2_mid", 75000.0, 150000.0),
          ("T3_high", 150000.0, 300000.0), ("T4_top", 300000.0, 1e9))
          .toDF("tier", "lo", "hi")
        t(s, dir, "orders")
          .join(broadcast(tiers),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy("tier")
          .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
          .orderBy("tier")
      },
      s"""SELECT tier, COUNT(*) AS n, ${moneySumSql("o_totalprice")} AS sum_price
          FROM orders
          JOIN (VALUES ('T1_low', 0.0, 75000.0), ('T2_mid', 75000.0, 150000.0),
                       ('T3_high', 150000.0, 300000.0), ('T4_top', 300000.0, 1e9))
               tiers(tier, lo, hi)
            ON o_totalprice >= lo AND o_totalprice < hi
          GROUP BY tier ORDER BY tier"""),

    // Q33 — exact per-group median by rank selection (engine-native
    // median/percentile interpolate in engine-specific ways; picking the
    // ⌈n/2⌉-th element under a total order is deterministic everywhere).
    ("q33_median",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy("o_totalprice", "o_orderkey")
        val wc = Window.partitionBy("o_orderpriority")
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(wc))
          .filter(expr("rn = (cnt + 1) div 2")) // ⌈n/2⌉ in integer division
          .select(col("o_orderpriority"), col("o_totalprice").as("median_price"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, o_totalprice AS median_price FROM (
           SELECT o_orderpriority, o_totalprice, o_orderkey,
                  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice, o_orderkey) AS rn,
                  COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
           FROM orders) q
         WHERE rn = (cnt + 1) // 2 ORDER BY o_orderpriority"""),

    // Q34 — Pearson correlation from exact integer-cent sums (the same
    // magnitude discipline as Q27; engine-native corr() is FP-order-
    // dependent). x = extendedprice cents, y = quantity (integral).
    // NOTE on the q52/q53 guard class (Canonical.exactSumGuard): q34
    // deliberately does NOT carry it — Σx² already passes 2⁵³ at sf0.1,
    // and determinism here rests on the weaker (documented) claim below:
    // the O(1)-stable statistic survives last-ulp cast drift under
    // rule-3 ROUND(·,4), not on sum exactness.
    ("q34_correlation",
      (s: SparkSession, dir: String) => {
        // Round 16: LONG fixed-point instead of round(·)→DECIMAL(18,0)
        // per row + DECIMAL-buffer sums (guide §1.2 per-task work; the
        // whole stage is ONE task — single-row-group fact file). The
        // split-long sums' double combine is correctly rounded to
        // |Σ| < 2⁷³ (Canonical.exactLongSumAsDouble), i.e. BIT-
        // IDENTICAL to the old CAST(SUM(DECIMAL) AS DOUBLE) including
        // the past-2⁵³ regime this query documents. Measured
        // 1.95 s → see OPTIMIZATION_r16.md; oracle SQL unchanged.
        val li = t(s, dir, "lineitem")
          .withColumn("x", Canonical.cents(col("l_extendedprice")))
          .withColumn("y", Canonical.wholeHalfUp(col("l_quantity")))
        val n = count(lit(1))
        val sx = Canonical.exactLongSumAsDouble(col("x"))
        val sy = Canonical.exactLongSumAsDouble(col("y"))
        val sxx = Canonical.exactLongSumAsDouble(col("x") * col("x"))
        val syy = Canonical.exactLongSumAsDouble(col("y") * col("y"))
        val sxy = Canonical.exactLongSumAsDouble(col("x") * col("y"))
        li.groupBy("l_returnflag")
          .agg(n.as("n"),
            // §2.4 rule 3: the squared-cent sums pass 2⁵³ at sf≥0.1
            // (engine-dependent last-ulp double casts, same hazard q27
            // hit) — the O(1) statistic is stable far beyond 4 dp, so
            // the output is rounded like every free double
            round((n * sxy - sx * sy) /
              sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4).as("corr_xy"))
          .orderBy("l_returnflag")
      },
      """WITH c AS (SELECT l_returnflag,
                CAST(ROUND(l_extendedprice * 100) AS DECIMAL(19,0)) AS x,
                CAST(ROUND(l_quantity) AS DECIMAL(19,0)) AS y
              FROM lineitem)
          SELECT l_returnflag, COUNT(*) AS n,
            ROUND((COUNT(*) * CAST(SUM(x * y) AS DOUBLE)
              - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
            / SQRT((COUNT(*) * CAST(SUM(x * x) AS DOUBLE)
                     - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
                   * (COUNT(*) * CAST(SUM(y * y) AS DOUBLE)
                     - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))), 4) AS corr_xy
          FROM c GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Q35 — edit distance (both engines implement exact Levenshtein).
    ("q35_edit_distance",
      (s: SparkSession, dir: String) =>
        t(s, dir, "part")
          .select(col("p_partkey"),
            levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev"),
            levenshtein(substring(col("p_name"), 1, 10), lit("standard")).cast("long").as("lev2"))
          .orderBy("p_partkey")
          .limit(300),
      """SELECT p_partkey, levenshtein(p_brand, p_type) AS lev,
            levenshtein(SUBSTR(p_name, 1, 10), 'standard') AS lev2
         FROM part ORDER BY p_partkey LIMIT 300"""),

    // Q36 — array higher-order functions over embeddings: lambda filter/
    // transform with integer outcomes (float comparisons are exact).
    ("q36_array_hof",
      (s: SparkSession, dir: String) =>
        t(s, dir, "embeddings")
          .select(col("vec_id"),
            size(filter(col("embedding"), x => x > 0)).as("n_pos"),
            size(filter(col("embedding"), x => x < 0)).as("n_neg"),
            size(expr("transform(embedding, (x, i) -> i)")).as("dim"))
          .orderBy("vec_id"),
      """SELECT vec_id,
            CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
            CAST(len(list_filter(embedding, x -> x < 0)) AS INT) AS n_neg,
            CAST(len(embedding) AS INT) AS dim
         FROM embeddings ORDER BY vec_id"""),

    // Q37 — pivot (orders count + money sum by priority × status); the
    // oracle spells it as conditional aggregation, which is also what
    // Spark's PivotFirst lowers to.
    ("q37_pivot",
      (s: SparkSession, dir: String) =>
        t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .select(col("o_orderpriority"), col("F").as("n_f"),
            col("O").as("n_o"), col("P").as("n_p"))
          .orderBy("o_orderpriority"),
      """SELECT o_orderpriority,
            CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_f,
            CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_o,
            CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),

    // Q38 — subquery forms through the SQL frontend: IN-subquery
    // (rewritten to semi join), correlated EXISTS (decorrelated), and
    // an uncorrelated scalar subquery (contract-avg threshold). Oracle
    // runs the same ANSI text.
    ("q38_subqueries",
      (s: SparkSession, dir: String) => {
        t(s, dir, "customer").createOrReplaceTempView("customer")
        t(s, dir, "nation").createOrReplaceTempView("nation")
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(subquerySql)
      },
      subquerySql),
  ) :+ q39 :+ q40 :+ q41 :+ q42 :+ q43 :+ q44 :+ q45 :+ q46 :+ q47 :+ q48 :+ q49 :+ q50 :+ q51 :+ q53 :+ q54 :+
    q55 :+ q56 :+ q57 :+ q58 :+ q59 :+ q60 :+ q61 :+ q62

  /** Q48 — exact multi-percentile per group (percentile_disc without
    * the engine's percentile function, whose interpolation conventions
    * differ): rank selection at `ceil(p·n)` via pure integer
    * arithmetic, one windowed pass joined to a literal percentile
    * table so small groups can emit the same source row for several
    * percentiles.
    */
  private val q48: (String, Q, String) = (
    "q48_percentiles",
    (s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      val wc = Window.partitionBy("o_orderpriority")
      val pcts = Seq(25, 50, 75, 90).toDF("pct")
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(wc))
        .join(pcts, expr("rn = (cnt * pct + 99) div 100"))
        .select(col("o_orderpriority"), col("pct"),
          col("o_totalprice").as("v"))
        .orderBy("o_orderpriority", "pct")
    },
    """SELECT o_orderpriority, pct, o_totalprice AS v FROM (
         SELECT o_orderpriority, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice, o_orderkey) AS rn,
                COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
         FROM orders) q
       CROSS JOIN (VALUES (25), (50), (75), (90)) p(pct)
       WHERE rn = (cnt * pct + 99) // 100
       ORDER BY o_orderpriority, pct""")

  /** Q49 — equi-depth (quantile) binning per group: NTILE deciles of
    * order value within each priority, then per-bin count and bounds.
    * The window is PARTITIONED (per-priority), so each group sorts
    * independently — the scale-safe shape; a global NTILE would funnel
    * everything through one partition. NTILE's uneven-split rule
    * (first n mod k tiles get the extra row) is the same SQL-standard
    * behavior on both engines; ties broken by unique key.
    */
  private val q49: (String, Q, String) = (
    "q49_equidepth",
    (s: SparkSession, dir: String) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      t(s, dir, "orders")
        .withColumn("bin", ntile(10).over(w).cast("bigint"))
        .groupBy("o_orderpriority", "bin")
        .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy("o_orderpriority", "bin")
    },
    """SELECT o_orderpriority, bin, COUNT(*) AS n,
              MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
       FROM (SELECT o_orderpriority, o_totalprice,
                    NTILE(10) OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice, o_orderkey) AS bin
             FROM orders) q
       GROUP BY o_orderpriority, bin
       ORDER BY o_orderpriority, bin""")

  /** Q50 — binned range join, hash-judged: orders matched to literal
    * price tiers through [[graft.operators.Scale.binnedRangeJoin]] (the
    * theta→equi rewrite — intervals explode into fixed-width bins,
    * each point maps to ONE bin, residual filter applies the exact
    * predicate), aggregated per tier. The oracle spells the plain
    * BETWEEN theta join over the same literal tiers: two formulations,
    * one answer — and the engine side's plan is a hash join, not the
    * nested loop the theta spelling forces at scale (ScaleSpec asserts
    * the plan shape; this query judges the values).
    */
  private val q50: (String, Q, String) = (
    "q50_binned_range",
    (s: SparkSession, dir: String) => {
      import s.implicits._
      val tiers = Seq(("T1", 0L, 75000L), ("T2", 75001L, 150000L),
        ("T3", 150001L, 300000L), ("T4", 300001L, 600000L))
        .toDF("tier", "lo", "hi")
      graft.operators.Scale
        .binnedRangeJoin(t(s, dir, "orders"), "o_totalprice", tiers,
          "lo", "hi", binWidth = 50000.0)
        .groupBy("tier")
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("rev"))
        .orderBy("tier")
    },
    s"""WITH tiers AS (SELECT * FROM (VALUES
         ('T1', 0, 75000), ('T2', 75001, 150000),
         ('T3', 150001, 300000), ('T4', 300001, 600000)) t(tier, lo, hi))
       SELECT tier, COUNT(*) AS n, ${Canonical.moneySumSql("o_totalprice")} AS rev
       FROM orders JOIN tiers
         ON o_totalprice >= lo AND o_totalprice <= hi
       GROUP BY tier ORDER BY tier""")

  /** Q45 — unpivot/melt (wide → long): four per-status contract sums
    * melted into (status, metric, v) rows via `Dataset.unpivot`. The
    * oracle spells the same reshape as a UNION ALL — two independent
    * formulations of the melt.
    */
  private val q45: (String, Q, String) = (
    "q45_unpivot",
    (s: SparkSession, dir: String) => {
      val wide = t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_price"),
          moneySum(col("l_discount")).as("sum_disc"),
          moneySum(col("l_tax")).as("sum_tax"))
      wide.unpivot(
          Array(col("l_linestatus")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc"), col("sum_tax")),
          "metric", "v")
        .orderBy("l_linestatus", "metric")
    },
    s"""WITH wide AS (
          SELECT l_linestatus,
                 ${moneySumSql("l_quantity")} AS sum_qty,
                 ${moneySumSql("l_extendedprice")} AS sum_price,
                 ${moneySumSql("l_discount")} AS sum_disc,
                 ${moneySumSql("l_tax")} AS sum_tax
          FROM lineitem GROUP BY l_linestatus)
        SELECT l_linestatus, metric, v FROM (
          SELECT l_linestatus, 'sum_qty' AS metric, sum_qty AS v FROM wide
          UNION ALL SELECT l_linestatus, 'sum_price', sum_price FROM wide
          UNION ALL SELECT l_linestatus, 'sum_disc', sum_disc FROM wide
          UNION ALL SELECT l_linestatus, 'sum_tax', sum_tax FROM wide) u
        ORDER BY l_linestatus, metric""")

  /** Q46 — time-series gap-fill (resample): the hourly event series with
    * MISSING buckets zero-filled — `sequence()`+`explode` against a
    * left join (Spark) vs `generate_series` (DuckDB). The dense axis is
    * integer hour buckets, so the fill is exact on both engines.
    */
  private val q46: (String, Q, String) = (
    "q46_gapfill",
    (s: SparkSession, dir: String) => {
      val counts = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .withColumn("bucket", expr("unix_micros(cast(ts as timestamp)) div 3600000000"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
      val series = counts.agg(min("bucket").as("lo"), max("bucket").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("bucket"))
      series.join(counts, Seq("bucket"), "left")
        .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("bucket")
    },
    """WITH counts AS (
         SELECT epoch_us(ts) // 3600000000 AS bucket, COUNT(*) AS n
         FROM events WHERE event_type = 'purchase' GROUP BY bucket),
       series AS (
         SELECT unnest(generate_series((SELECT MIN(bucket) FROM counts),
                                       (SELECT MAX(bucket) FROM counts))) AS bucket)
       SELECT s.bucket, COALESCE(c.n, 0) AS n
       FROM series s LEFT JOIN counts c ON s.bucket = c.bucket
       ORDER BY s.bucket""")

  /** Q51 — linear interpolation across series gaps (the resample
    * companion to Q46's zero-fill): missing hourly buckets take
    * `prev + (next − prev) · (t − t_prev) / (t_next − t_prev)`. The
    * neighbor scan is `last/first(…, ignoreNulls)` over mirrored
    * unbounded frames — one ordered window pass, no self-join per gap.
    * Determinism: every term is an exact integer; ONE IEEE division,
    * one multiply, one add, then rule-3 ROUND(x, 4) — spelled
    * identically on both engines. Like Q46, the dense axis is one
    * bounded series, so the global ordered window is fine; many-series
    * data would add the series key to partitionBy and keep the same
    * plan shape per series.
    */
  private val q51: (String, Q, String) = (
    "q51_interpolate",
    (s: SparkSession, dir: String) => {
      val counts = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .withColumn("bucket", expr("unix_micros(cast(ts as timestamp)) div 3600000000"))
        .groupBy("bucket").agg(count(lit(1)).as("v"))
        // thin the series so real gaps exist at every SF
        .filter(col("bucket") % 3 =!= 1)
      val series = counts.agg(min("bucket").as("lo"), max("bucket").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("bucket"))
      val j = series.join(counts, Seq("bucket"), "left")
      val wPrev = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      j.withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("pb", last(when(col("v").isNotNull, col("bucket")),
          ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("nb", first(when(col("v").isNotNull, col("bucket")),
          ignoreNulls = true).over(wNext))
        .select(col("bucket"),
          when(col("v").isNotNull, col("v").cast("double"))
            .otherwise(round(col("pv") +
              (col("nv") - col("pv")) * (col("bucket") - col("pb")) /
                (col("nb") - col("pb")), 4)).as("vi"))
        .orderBy("bucket")
    },
    """WITH counts AS (
         SELECT bucket, v FROM (
           SELECT epoch_us(ts) // 3600000000 AS bucket, COUNT(*) AS v
           FROM events WHERE event_type = 'purchase' GROUP BY bucket)
         WHERE bucket % 3 <> 1),
       series AS (
         SELECT unnest(generate_series((SELECT MIN(bucket) FROM counts),
                                       (SELECT MAX(bucket) FROM counts))) AS bucket),
       j AS (SELECT s.bucket, c.v FROM series s
             LEFT JOIN counts c ON s.bucket = c.bucket),
       w AS (SELECT bucket, v,
               LAST_VALUE(v IGNORE NULLS) OVER
                 (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               LAST_VALUE(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER
                 (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
               FIRST_VALUE(v IGNORE NULLS) OVER
                 (ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               FIRST_VALUE(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER
                 (ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
             FROM j)
       SELECT bucket,
              CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                   ELSE ROUND(pv + (nv - pv) * (bucket - pb) / (nb - pb), 4)
              END AS vi
       FROM w ORDER BY bucket""")

  /** Q53 — least-squares regression per group (REGR_SLOPE/INTERCEPT
    * without the engine's regr_* functions, whose accumulation orders
    * differ): slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) from EXACT
    * integer sums — x is the integral quantity, y integer cents — and
    * the closed-form arithmetic is the same IEEE op sequence on both
    * engines. Rule-3 ROUND(x, 4) on the outputs.
    *
    * Exactness BOUND, enforced at runtime: the double casts of the sums
    * are exact only while every |Σ| < 2⁵³. Σx·y grows ~5.3×10⁸/row
    * (max|x·y| in this data), so the claim holds to ~1.7×10⁷ rows/group
    * (~sf9 here; judged SFs have ≥86× headroom). Rather than trust the
    * comment, the query carries [[Canonical.exactSumGuard]]: the same
    * single aggregation also computes n·max|term| in DECIMAL and
    * `raise_error`s if a group could breach 2⁵³ — a loud failure at the
    * exact scale where silent last-ulp drift would otherwise begin.
    */
  private val q53: (String, Q, String) = (
    "q53_regression",
    (s: SparkSession, dir: String) => {
      // Round 16: y in LONG cents (same fixed-point move as q34/q27 —
      // per-row round()→DECIMAL and decimal-buffer sums replaced by
      // long arithmetic; split-long double combines are bit-identical
      // to the old casts to |Σ| < 2⁷³, and the 2⁵³ guard below fires
      // long before either bound).
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("bigint").as("x"),
          Canonical.cents(col("l_extendedprice")).as("y"))
      val guard = Canonical.exactSumGuard("q53_regression")
      li.groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
          Canonical.exactLongSumAsDouble(col("x")).as("sx"),
          Canonical.exactLongSumAsDouble(col("y")).as("sy"),
          Canonical.exactLongSumAsDouble(col("x") * col("y")).as("sxy"),
          Canonical.exactLongSumAsDouble(col("x") * col("x")).as("sxx"),
          count(lit(1)).cast("decimal(19,0)").as("ng"),
          greatest(
            max(abs(col("x") * col("y"))).cast("decimal(19,0)"),
            max(col("x") * col("x")).cast("decimal(19,0)"),
            max(abs(col("y"))).cast("decimal(19,0)")).as("gmax"))
        .select(col("l_returnflag"),
          guard(round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")) / 100.0, 4))
            .as("slope"),
          guard(round((col("sy") / col("n") -
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx"))) *
              (col("sx") / col("n"))) / 100.0, 4)).as("icept"))
        .orderBy("l_returnflag")
    },
    """WITH s AS (
         SELECT l_returnflag,
                CAST(COUNT(*) AS DOUBLE) AS n,
                CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
                CAST(SUM(x * y) AS DOUBLE) AS sxy,
                CAST(SUM(x * x) AS DOUBLE) AS sxx
         FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
                      CAST(ROUND(l_extendedprice * 100) AS DECIMAL(18,0)) AS y
               FROM lineitem)
         GROUP BY l_returnflag)
       SELECT l_returnflag,
              ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0, 4) AS slope,
              ROUND((sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (sx / n)) / 100.0, 4) AS icept
       FROM s ORDER BY l_returnflag""")

  /** Q54 — funnel analysis (ordered event-sequence matching): users who
    * did view → click → purchase IN ORDER, each stage's timestamp at or
    * after the previous stage's first occurrence. Three per-user min
    * aggregations chained by semi-join-shaped inner joins — group sizes
    * are per-user event counts, stage frames shrink monotonically; no
    * window over the whole event stream, no cross join. The product-
    * analytics op every event pipeline grows eventually.
    */
  private val q54: (String, Q, String) = (
    "q54_funnel",
    (s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(cast(ts as timestamp))").as("us"))
      val a = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("ta"))
      val b = ev.filter(col("event_type") === "click")
        .join(a, "user_id").filter(col("us") >= col("ta"))
        .groupBy("user_id").agg(min(col("us")).as("tb"))
      val c = ev.filter(col("event_type") === "purchase")
        .join(b, "user_id").filter(col("us") >= col("tb"))
        .groupBy("user_id").agg(min(col("us")).as("tc"))
      a.select(lit("1_view").as("stage"), col("user_id"))
        .unionByName(b.select(lit("2_click").as("stage"), col("user_id")))
        .unionByName(c.select(lit("3_purchase").as("stage"), col("user_id")))
        .groupBy("stage").agg(count(lit(1)).as("users"))
        .orderBy("stage")
    },
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
       a AS (SELECT user_id, MIN(us) AS ta FROM ev
             WHERE event_type = 'view' GROUP BY user_id),
       b AS (SELECT ev.user_id, MIN(us) AS tb FROM ev
             JOIN a ON ev.user_id = a.user_id
             WHERE event_type = 'click' AND us >= ta GROUP BY ev.user_id),
       c AS (SELECT ev.user_id, MIN(us) AS tc FROM ev
             JOIN b ON ev.user_id = b.user_id
             WHERE event_type = 'purchase' AND us >= tb GROUP BY ev.user_id)
       SELECT stage, COUNT(*) AS users FROM (
         SELECT '1_view' AS stage, user_id FROM a
         UNION ALL SELECT '2_click', user_id FROM b
         UNION ALL SELECT '3_purchase', user_id FROM c)
       GROUP BY stage ORDER BY stage""")

  /** Q47 — histogram bucketing: fixed-width value bins with count and
    * contract sum per bin. The bin id is `FLOOR(value / 25.0)` — one
    * IEEE division + floor, identical on both engines (dodges
    * width_bucket's engine-specific boundary conventions).
    */
  private val q47: (String, Q, String) = (
    "q47_histogram",
    (s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .filter(col("value").isNotNull)
        .withColumn("bin", floor(col("value") / lit(25.0)).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sumv"))
        .orderBy("bin")
    },
    s"""SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bin,
          COUNT(*) AS n, ${moneySumSql("value")} AS sumv
        FROM events WHERE value IS NOT NULL
        GROUP BY bin ORDER BY bin""")

  /** Q43 — right outer join with a null-producing LEFT side (closes the
    * join matrix alongside Q07's left outer): only high-value orders
    * survive the filter, so most customers join to nothing and the order
    * columns are NULL — COALESCE'd to sentinels for a hashable output.
    */
  private val q43: (String, Q, String) = (
    "q43_right_join",
    (s: SparkSession, dir: String) =>
      t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .select(col("c_custkey"),
          coalesce(col("o_orderkey"), lit(-1L)).as("ok"),
          coalesce(col("o_totalprice"), lit(0.0)).as("price"))
        .orderBy("c_custkey", "ok"),
    """SELECT c_custkey, COALESCE(o_orderkey, -1) AS ok,
          COALESCE(o_totalprice, 0.0) AS price
       FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
       RIGHT JOIN customer ON o_custkey = c_custkey
       ORDER BY c_custkey, ok""")

  /** Q44 — full outer join with nulls produced on BOTH sides: disjoint
    * nation-key ranges guarantee left-only, both, and right-only keys.
    */
  private val q44: (String, Q, String) = (
    "q44_full_outer_join",
    (s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer").filter(col("c_nationkey") < 15)
        .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("nc"))
      val sup = t(s, dir, "supplier").filter(col("s_nationkey") >= 10)
        .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("ns"))
      c.join(sup, col("ck") === col("sk"), "full")
        .select(coalesce(col("ck"), col("sk")).as("nk"),
          coalesce(col("nc"), lit(0L)).as("n_cust"),
          coalesce(col("ns"), lit(0L)).as("n_supp"))
        .orderBy("nk")
    },
    """SELECT COALESCE(ck, sk) AS nk, COALESCE(nc, 0) AS n_cust,
          COALESCE(ns, 0) AS n_supp
       FROM (SELECT c_nationkey AS ck, COUNT(*) AS nc FROM customer
             WHERE c_nationkey < 15 GROUP BY 1) c
       FULL JOIN (SELECT s_nationkey AS sk, COUNT(*) AS ns FROM supplier
                  WHERE s_nationkey >= 10 GROUP BY 1) s
         ON ck = sk
       ORDER BY nk""")

  /** Q41 — bag-semantics set ops (EXCEPT ALL / INTERSECT ALL preserve
    * multiplicity, unlike Q17's distinct forms).
    */
  private val q41: (String, Q, String) = (
    "q41_bag_set_ops",
    (s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
      c.exceptAll(sup).groupBy("k").agg(count(lit(1)).as("n"))
        .withColumn("tag", lit("except_all"))
        .unionAll(c.intersectAll(sup).groupBy("k").agg(count(lit(1)).as("n"))
          .withColumn("tag", lit("intersect_all")))
        .select("tag", "k", "n")
        .orderBy("tag", "k")
    },
    """SELECT tag, k, n FROM (
         SELECT 'except_all' AS tag, k, COUNT(*) AS n FROM
           (SELECT c_nationkey AS k FROM customer
            EXCEPT ALL SELECT s_nationkey FROM supplier) a GROUP BY k
         UNION ALL
         SELECT 'intersect_all' AS tag, k, COUNT(*) AS n FROM
           (SELECT c_nationkey AS k FROM customer
            INTERSECT ALL SELECT s_nationkey FROM supplier) b GROUP BY k) q
       ORDER BY tag, k""")

  /** Q42 — value window functions: first/last/nth over a full frame
    * under a total order (deterministic by construction).
    */
  private val q42: (String, Q, String) = (
    "q42_value_windows",
    (s: SparkSession, dir: String) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 500)
        .select(col("o_orderpriority"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_key"),
          last(col("o_orderkey")).over(w).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
        .orderBy("o_orderpriority", "o_orderkey")
    },
    """SELECT o_orderpriority, o_orderkey,
          FIRST_VALUE(o_orderkey) OVER w AS first_key,
          LAST_VALUE(o_orderkey) OVER w AS last_key,
          NTH_VALUE(o_orderkey, 2) OVER w AS second_key
       FROM orders WHERE o_orderkey < 500
       WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ORDER BY o_orderpriority, o_orderkey""")

  /** Q39 — data-quality report over the star schema (the reference's
    * own roadmap item, README.md:95): one row per check with its
    * violation count — all deterministic counts, hence oracle-able.
    */
  private val q39: (String, Q, String) = (
    "q39_quality_report",
    (s: SparkSession, dir: String) => {
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val lineitem = t(s, dir, "lineitem")
      // One lazy union-of-aggregates plan — a single Spark job, not six
      // sequential driver-side .count() actions.
      def check(name: String, violations: DataFrame): DataFrame =
        violations.agg(count(lit(1)).as("violations"))
          .select(lit(name).as("check_name"), col("violations"))
      Seq(
        check("orders.o_orderkey not null",
          orders.filter(col("o_orderkey").isNull)),
        check("orders.o_orderkey unique",
          orders.groupBy("o_orderkey").count().filter(col("count") > 1)),
        check("orders.o_custkey fk customer",
          orders.join(customer, col("o_custkey") === col("c_custkey"), "left_anti")),
        check("lineitem.l_orderkey fk orders",
          lineitem.join(orders, col("l_orderkey") === col("o_orderkey"), "left_anti")),
        check("orders.o_totalprice positive",
          orders.filter(!coalesce(col("o_totalprice") > 0, lit(false)))),
        check("lineitem.l_discount in [0,1]",
          lineitem.filter(!coalesce(col("l_discount") >= 0 && col("l_discount") <= 1,
            lit(false)))))
        .reduce(_.unionAll(_))
        .orderBy("check_name")
    },
    """SELECT check_name, violations FROM (
         SELECT 'orders.o_orderkey not null' AS check_name,
                (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS violations
         UNION ALL SELECT 'orders.o_orderkey unique',
                (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                                       GROUP BY o_orderkey HAVING COUNT(*) > 1) d)
         UNION ALL SELECT 'orders.o_custkey fk customer',
                (SELECT COUNT(*) FROM orders WHERE NOT EXISTS
                   (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
         UNION ALL SELECT 'lineitem.l_orderkey fk orders',
                (SELECT COUNT(*) FROM lineitem WHERE NOT EXISTS
                   (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
         UNION ALL SELECT 'orders.o_totalprice positive',
                (SELECT COUNT(*) FROM orders
                 WHERE NOT COALESCE(o_totalprice > 0, FALSE))
         UNION ALL SELECT 'lineitem.l_discount in [0,1]',
                (SELECT COUNT(*) FROM lineitem
                 WHERE NOT COALESCE(l_discount >= 0 AND l_discount <= 1, FALSE))) q
       ORDER BY check_name""")

  /** Q40 — explicit GROUPING SETS (beyond rollup/cube), SQL frontend. */
  private val q40: (String, Q, String) = (
    "q40_grouping_sets",
    (s: SparkSession, dir: String) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(groupingSetsSql)
    },
    groupingSetsSql)

  private lazy val groupingSetsSql: String =
    """SELECT COALESCE(o_orderpriority, '(any)') AS prio,
          COALESCE(o_orderstatus, '(any)') AS status, COUNT(*) AS n
       FROM orders
       GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
       ORDER BY prio, status"""

  /** Shared ANSI text for Q38 — valid in both Spark SQL and DuckDB. */
  private lazy val subquerySql: String =
    s"""SELECT c_custkey FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 1)
          AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          AND c_acctbal > (SELECT ${avg4Sql("c_acctbal")} FROM customer)
        ORDER BY c_custkey"""

  /** Q55 — VARIANT semi-structured ingestion (new engine type in Spark
    * 4): `props` JSON is parsed ONCE to a VARIANT value, then fields
    * come out through typed `variant_get` (error-on-mismatch) and
    * `try_variant_get` (NULL on absent path). Unlike Q21's per-path
    * `get_json_object` string re-parse, the VARIANT path parses each
    * document a single time into a binary form that downstream
    * extractions share — the representation a wide-schema 100 TB event
    * store wants (parse cost paid once per row, not once per path).
    * The oracle reads the same JSON relationally; an absent path is
    * NULL on both engines, so COUNT(absent) pins the NULL semantics.
    */
  private val q55: (String, Q, String) = (
    "q55_variant",
    (s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .withColumn("v", parse_json(col("props")))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'int')").as("k"),
          expr("try_variant_get(v, '$.absent', 'int')").as("absent"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sumk"),
          count(col("absent")).as("n_absent"),
          min(col("k")).as("mink"), max(col("k")).as("maxk"))
        .orderBy("event_type")
    },
    """SELECT event_type, COUNT(*) AS n,
          CAST(SUM(k) AS BIGINT) AS sumk,
          COUNT(absent) AS n_absent,
          MIN(k) AS mink, MAX(k) AS maxk
       FROM (SELECT event_type,
                    CAST(json_extract_string(props, '$.k') AS INT) AS k,
                    CAST(json_extract_string(props, '$.absent') AS INT) AS absent
             FROM events) q
       GROUP BY event_type ORDER BY event_type""")

  /** Shared ANSI text for Q56 — the correlated LATERAL subquery is
    * valid in both Spark 4 SQL and DuckDB. Per-segment top-2 orders:
    * Spark decorrelates the LATERAL into a ranked window join (no
    * per-row re-execution — the rewrite is what makes the construct
    * usable at scale), which PlanAuditSpec's no-undeclared-BNLJ gate
    * keeps honest. Deterministic: price ties broken by o_orderkey.
    */
  private lazy val lateralSql: String =
    """SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice
       FROM (SELECT DISTINCT c_mktsegment FROM customer) c,
       LATERAL (SELECT o_orderkey, o_totalprice
                FROM orders JOIN customer ON o_custkey = c_custkey
                WHERE c_mktsegment = c.c_mktsegment
                ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
       ORDER BY c_mktsegment, o_orderkey"""

  private val q56: (String, Q, String) = (
    "q56_lateral",
    (s: SparkSession, dir: String) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(lateralSql)
    },
    lateralSql)

  /** Q57 — the NATIVE `session_window` operator in batch mode (the
    * same expression Streams.scala runs under a watermark), hash-judged
    * against a gaps-and-islands oracle. Boundary semantics verified
    * empirically before freezing the oracle: events exactly `gap`
    * apart MERGE (split only when the gap is strictly exceeded), so
    * the oracle's island break is `eus - prev > gap`, matching Q23's
    * convention; window end = last event + gap. Scale shape: one
    * hash-partition by user_id then per-partition sort-merge of
    * windows — no global sort, no all-pairs.
    */
  private val q57: (String, Q, String) = (
    "q57_session_window",
    (s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          expr("unix_micros(cast(w.start as timestamp))").as("start_us"),
          expr("unix_micros(cast(w.end as timestamp))").as("end_us"),
          col("n_events"))
        .orderBy("user_id", "start_us")
    },
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS eus FROM events),
       s AS (SELECT user_id, event_id, eus,
                    CASE WHEN LAG(eus) OVER w IS NULL
                              OR eus - LAG(eus) OVER w > 1800000000
                         THEN 1 ELSE 0 END AS newsess
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY eus, event_id)),
       t AS (SELECT user_id, eus,
                    SUM(newsess) OVER (PARTITION BY user_id ORDER BY eus, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             FROM s),
       g AS (SELECT user_id, MIN(eus) AS start_us,
                    MAX(eus) + 1800000000 AS end_us, COUNT(*) AS n_events
             FROM t GROUP BY user_id, sid)
       SELECT user_id, start_us, end_us, n_events FROM g
       ORDER BY user_id, start_us""")

  /** Q58 — recursive CTE (new in Spark 4): per-row ancestor chain over
    * the implicit binary-tree hierarchy `parent(k) = k div 2`, i.e.
    * each customer key walks k → k/2 → … → 0, emitting depth and the
    * exact integer sum of keys along the path. Real iteration (depth
    * ~log₂(maxkey), ~14 at sf0.1), not unrollable by a fixed join
    * chain, and every per-step value is exact BIGINT arithmetic. The
    * two texts differ ONLY in the integer-division spelling (Spark
    * `DIV`, DuckDB `//`). The recursion's working set SHRINKS each
    * step (rows whose cur hit 0 drop out), so the distributed plan is
    * log-depth × narrow — the same shape as Components' pointer
    * jumping.
    */
  private def recursiveSql(intDiv: String): String =
    s"""WITH RECURSIVE anc(node, cur, depth, path_sum) AS (
          SELECT c_custkey, c_custkey, 0, CAST(c_custkey AS BIGINT)
          FROM customer
          UNION ALL
          SELECT node, cur $intDiv 2, depth + 1,
                 path_sum + CAST(cur $intDiv 2 AS BIGINT)
          FROM anc WHERE cur > 0)
        SELECT node, MAX(depth) AS depth, MAX(path_sum) AS path_sum
        FROM anc GROUP BY node ORDER BY node"""

  private val q58: (String, Q, String) = (
    "q58_recursive",
    (s: SparkSession, dir: String) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(recursiveSql("DIV"))
    },
    recursiveSql("//"))

  /** Q59 — `approx_top_k` heavy-hitters sketch (Spark 4), judged under
    * an EXACTNESS contract: with `maxItemsTracked` (default 10⁴) ≥ the
    * column's true NDV the sketch degenerates to exact counts — the
    * same design as the HLL/quantile specs, but here the exactness
    * window makes it hash-judgeable against a plain GROUP BY oracle.
    * Re-ordered by item so the sketch's internal tie order never
    * matters. k=64 ≫ NDV(event_type); the estimate-is-exact premise is
    * what the oracle verifies.
    */
  private val q59: (String, Q, String) = (
    "q59_approx_topk",
    (s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .agg(expr("approx_top_k(event_type, 64)").as("tk"))
        .select(explode(col("tk")).as("x"))
        .select(col("x.item").as("item"),
          col("x.count").cast("long").as("cnt"))
        .orderBy("item")
    },
    """SELECT event_type AS item, COUNT(*) AS cnt FROM events
       GROUP BY event_type ORDER BY item""")

  /** Q60 — SQL pipe syntax (Spark 4 `|>` operator chaining): the same
    * filter → aggregate → order contract query expressed as a linear
    * pipeline instead of nested SELECT. Purely a FRONTEND surface —
    * the parser lowers `|>` stages onto the identical logical plan, so
    * Catalyst optimizes it like any other query (same pushdown, same
    * partial agg); the oracle is the plain-ANSI spelling. NOTE: the
    * pipe text must never pass through `stripMargin` (the leading `|>`
    * would be eaten) — only oracle strings are stripped, and this
    * oracle is pipe-free.
    */
  private val q60: (String, Q, String) = (
    "q60_pipe_syntax",
    (s: SparkSession, dir: String) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        s"""FROM lineitem
            |> WHERE l_quantity >= 30
            |> AGGREGATE COUNT(*) AS n, ${moneySumSql("l_extendedprice")} AS sumv
               GROUP BY l_returnflag, l_linestatus
            |> ORDER BY l_returnflag, l_linestatus""")
    },
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          ${moneySumSql("l_extendedprice")} AS sumv
        FROM lineitem WHERE l_quantity >= 30
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")

  /** Q61 — string collation (Spark 4 COLLATE): grouping under
    * UTF8_LCASE folds case variants into ONE group at comparison time
    * — no lower() materialized, the collator lives in the comparator,
    * which is what lets a 100 TB shuffle avoid rewriting every key.
    * Case diversity is synthesized deterministically (even keys upper,
    * odd lower), and the output key is re-normalized through LOWER so
    * the group's arbitrary case representative can't leak into the
    * hash (MIN/MAX over collated strings tie on case-equal values and
    * are NOT deterministic — deliberately excluded). The oracle groups
    * by LOWER(); if Spark's collation semantics drifted from plain
    * case-folding for this ASCII domain, counts would diverge.
    */
  private val q61: (String, Q, String) = (
    "q61_collation",
    (s: SparkSession, dir: String) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(
        """SELECT LOWER(seg) AS seg_lc, COUNT(*) AS n,
                  COUNT(DISTINCT c_nationkey) AS n_nations
           FROM (SELECT CASE WHEN c_custkey % 2 = 0 THEN UPPER(c_mktsegment)
                             ELSE LOWER(c_mktsegment)
                        END COLLATE UTF8_LCASE AS seg,
                        c_nationkey
                 FROM customer) q
           GROUP BY seg ORDER BY seg_lc""")
    },
    """SELECT LOWER(seg) AS seg_lc, COUNT(*) AS n,
          CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations
       FROM (SELECT CASE WHEN c_custkey % 2 = 0 THEN UPPER(c_mktsegment)
                         ELSE LOWER(c_mktsegment) END AS seg,
                    c_nationkey
             FROM customer) q
       GROUP BY LOWER(seg) ORDER BY seg_lc""")

  /** Q62 — hopping (sliding) time window via the NATIVE
    * `window(ts, size, slide)` generator: 1 h windows every 30 min, so
    * each event lands in exactly two overlapping windows (size/slide);
    * Spark explodes window membership inside the operator — no manual
    * self-union — and windows align to the epoch. The oracle derives
    * the same two window starts arithmetically (`halfslot` and its
    * predecessor). Batch spelling of the streaming hop-window operator
    * (streaming/Streams covers the watermark side); at 100 TB the
    * expansion factor is the declared size/slide constant, partial
    * aggs absorb it map-side.
    */
  private val q62: (String, Q, String) = (
    "q62_hopping_window",
    (s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .groupBy(
          window(col("ts").cast("timestamp"), "1 hour", "30 minutes")
            .as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sumv"))
        .select(expr("unix_micros(w.start)").as("ws"), col("event_type"),
          col("n"), col("sumv"))
        .orderBy("ws", "event_type")
    },
    s"""WITH e AS (
          SELECT epoch_us(ts) // 1800000000 AS halfslot, event_type, value
          FROM events),
        x AS (
          SELECT halfslot * 1800000000 AS ws, event_type, value FROM e
          UNION ALL
          SELECT (halfslot - 1) * 1800000000 AS ws, event_type, value
          FROM e)
        SELECT ws, event_type, COUNT(*) AS n, ${moneySumSql("value")} AS sumv
        FROM x GROUP BY ws, event_type ORDER BY ws, event_type""")

  def queries: Map[String, Q] =
    entries.map { case (n, q, _) => n -> q }.toMap

  def oracleSql: Map[String, String] =
    entries.map { case (n, _, o) => n -> o.stripMargin }.toMap
}
