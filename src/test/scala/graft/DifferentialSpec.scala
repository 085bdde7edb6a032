package graft

import org.apache.spark.sql.DataFrame

/** In-engine differential testing — the reference's de-facto correctness
  * mechanism (the same question asked through multiple frontends must
  * agree, SURVEY §5.1): DataFrame formulations vs independently-written
  * Spark SQL text, converging on one Catalyst optimizer from two
  * different parse paths.
  */
class DifferentialSpec extends SparkSpec {

  private def sqlTwin(name: String, sql: String): (DataFrame, DataFrame) = {
    Tables.registerAll(spark, sf)
    (SparkEntry.queries(name)(spark, sf), spark.sql(sql))
  }

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.sameElements(b.columns))
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  test("q02 DataFrame ≡ Spark SQL text") {
    val (df, sql) = sqlTwin("q02_ref_query",
      """SELECT o_orderpriority, COUNT(*) AS n,
            ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  / COUNT(o_totalprice), 4) AS avg_price
         FROM orders WHERE o_totalprice > 100000
         GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    assertSame(df, sql)
  }

  test("q05 DataFrame ≡ Spark SQL text") {
    val (df, sql) = sqlTwin("q05_join_agg",
      """SELECT c_mktsegment, COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    assertSame(df, sql)
  }

  test("q13 DataFrame ≡ Spark SQL text") {
    val (df, sql) = sqlTwin("q13_window_rank",
      """SELECT c_mktsegment, CAST(rn AS BIGINT) AS rn, c_custkey FROM (
           SELECT c_mktsegment, c_custkey,
                  ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal DESC, c_custkey) AS rn
           FROM customer) q
         WHERE rn <= 3 ORDER BY c_mktsegment, rn""")
    assertSame(df, sql)
  }

  test("q17 DataFrame ≡ Spark SQL text (set operators)") {
    val (df, sql) = sqlTwin("q17_set_ops",
      """SELECT 'intersect' AS tag, k FROM
           (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier) a
         UNION ALL
         SELECT 'except' AS tag, k FROM
           (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier) b
         UNION ALL
         SELECT 'union' AS tag, k FROM
           (SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier) c
         ORDER BY tag, k""")
    assertSame(df, sql)
  }
}
