package graft

import org.apache.spark.sql.functions._

/** Remaining L2 function-surface checks that can't be hash-judged:
  * HLL approximate distinct (engine-specific sketch) and the scalar UDF
  * registration path (present for completeness — graft's own operators
  * deliberately avoid UDFs in favor of codegen'd expressions).
  */
class FunctionSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on orders keys") {
    val o = Tables(spark, sf, "orders")
    val r = o.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey")).as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"HLL error too large: exact=$exact approx=$approx")
  }

  test("scalar UDF registers and runs through both frontends") {
    val tier = udf((p: Double) => if (p > 100000) "high" else "low")
    spark.udf.register("price_tier", tier)
    val o = Tables(spark, sf, "orders")
    val viaDf = o.select(tier(col("o_totalprice")).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    o.createOrReplaceTempView("orders_udf")
    val viaSql = spark.sql(
      "SELECT price_tier(o_totalprice) AS t, COUNT(*) n FROM orders_udf GROUP BY t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaDf == viaSql && viaDf.keySet == Set("high", "low"))
  }

  test("q31 range join uses broadcast nested loop (the right plan for non-equi)") {
    val df = SparkEntry.queries("q31_range_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"unexpected join in:\n$plan")
  }
}
