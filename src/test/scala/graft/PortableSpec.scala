package graft

import graft.portable.Portable._
import graft.portable.Portable.Compile
import graft.queries.PortableQueries

/** The portable-IR property the reference stakes its design on
  * (one expression, two backends): the IR-compiled Spark plan must agree
  * with the independently hand-written formulation, and the generated
  * SQL must be well-formed DuckDB (the oracle side of the hash gate
  * proves semantic equality; here we pin the structural bits).
  */
class PortableSpec extends SparkSpec {

  test("IR-compiled ref query ≡ hand-written q02 (same rows, same order)") {
    val ir = Compile.toDataFrame(spark, sf, PortableQueries.refQuery)
    val hand = SparkEntry.queries("q02_ref_query")(spark, sf)
    assert(ir.columns.sameElements(hand.columns))
    assert(ir.collect().toSeq == hand.collect().toSeq)
  }

  test("generated SQL carries the determinism contract") {
    val sql = Compile.toSql(PortableQueries.refQuery)
    assert(sql.contains("DECIMAL(18,4)"), "money sum must be exact-decimal")
    assert(sql.contains("NULLS FIRST"), "ascending sort must pin null order")
    val topk = Compile.toSql(PortableQueries.filterTopK)
    assert(topk.contains("ORDER BY") && topk.contains("LIMIT 50"))
    assert(topk.contains("DESC NULLS LAST"))
  }

  test("widened vocabulary: joins/union/distinct/having/window compile both ways") {
    import org.apache.spark.sql.functions.{col => fcol}
    // left join ≡ hand-written Dataset.join(..., "left") + window
    val ir = Compile.toDataFrame(spark, sf, PortableQueries.leftJoinRank)
    val cust = Tables(spark, sf, "customer").filter(fcol("c_custkey") < 40)
    val hand = cust.join(Tables(spark, sf, "orders"),
        fcol("c_custkey") === fcol("o_custkey"), "left")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("c_custkey")
          .orderBy(fcol("o_totalprice").desc_nulls_last, fcol("o_orderkey").asc_nulls_first))
        .cast("long"))
      .filter(fcol("rn") <= 2)
      .select("c_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("c_custkey", "rn")
    assert(ir.collect().toSeq == hand.collect().toSeq)
    // join vocabulary reaches SQL with the right keywords
    val sql = Compile.toSql(PortableQueries.leftJoinRank)
    assert(sql.contains("LEFT JOIN") && sql.contains("ROW_NUMBER()"))
    assert(Compile.toSql(PortableQueries.antiRunning).contains("ANTI JOIN"))
    assert(Compile.toSql(PortableQueries.antiRunning)
      .contains("ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"))
    assert(Compile.toSql(PortableQueries.semiDistinct).contains("SEMI JOIN"))
    assert(Compile.toSql(PortableQueries.semiDistinct).contains("SELECT DISTINCT"))
    assert(Compile.toSql(PortableQueries.unionHaving).contains("UNION ALL"))
    // union dedup vs bag union
    val a = table("orders").select(c("o_orderstatus") -> "s")
    val dedup = Compile.toDataFrame(spark, sf, a.union(a)).count()
    val bag = Compile.toDataFrame(spark, sf, a.unionAll(a)).count()
    assert(dedup == 3 && bag == 2 * Tables(spark, sf, "orders").count())
  }

  test("three frontends, one tree: DataFrame ≡ spark.sql(toSparkSql)") {
    // register base tables once for the SQL-text frontend
    Seq("orders", "customer", "lineitem").foreach(n =>
      Tables(spark, sf, n).createOrReplaceTempView(n))
    PortableQueries.all.foreach { case (name, rel) =>
      val viaDf = Compile.toDataFrame(spark, sf, rel)
      val viaSql = spark.sql(Compile.toSparkSql(rel))
      assert(viaDf.columns.sameElements(viaSql.columns),
        s"$name: column mismatch df=${viaDf.columns.mkString(",")} sql=${viaSql.columns.mkString(",")}")
      assert(viaDf.collect().toSeq == viaSql.collect().toSeq,
        s"$name: DataFrame and Spark-SQL frontends disagree")
    }
  }

  test("DateDiffDays renders each dialect's arg order from one node") {
    val e = table("orders").select(
      DateDiffDays(c("o_orderdate"), c("start_d")) -> "d")
    assert(Compile.toSql(e).contains("date_diff('day', start_d, o_orderdate)"))
    assert(Compile.toSparkSql(e)
      .contains("CAST(datediff(o_orderdate, start_d) AS BIGINT)"))
  }

  test("multi-key join renders a conjunctive ON clause") {
    val j = table("orders").joinOn(table("customer"),
      "o_custkey" -> "c_custkey", "o_orderstatus" -> "c_mktsegment")
    assert(Compile.toSql(j)
      .contains("ON o_custkey = c_custkey AND o_orderstatus = c_mktsegment"))
  }

  test("IR trees are plain data: reusable and composable") {
    val base = table("orders").where(Bin(">", c("o_totalprice"), LitNum(100000)))
    val a = base.groupBy("o_orderpriority")(CountAll("n"))
    val b = base.limit(5)
    assert(Compile.toDataFrame(spark, sf, a).count() == 5)
    assert(Compile.toDataFrame(spark, sf, b).count() == 5)
  }
}
