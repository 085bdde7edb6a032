package graft

import org.apache.spark.sql.functions._

/** Mergeable-sketch surface: distinct-count sketches whose PARTIALS
  * compose — the only distinct-count that scales. At 100 TB,
  * `COUNT(DISTINCT x)` needs a full shuffle of x; a sketch aggregates
  * map-side into a few KB per partition, and per-group/per-partition
  * sketches union into wider rollups WITHOUT re-reading data (the
  * cube/rollup over distinct counts that exact computation cannot do
  * incrementally).
  */
class SketchSpec extends SparkSpec {

  test("HLL sketch: per-group partials union to the global estimate") {
    val orders = Tables(spark, sf, "orders")
    val exact = orders.select(countDistinct(col("o_custkey"))).head.getLong(0)
    val direct = orders
      .select(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
      .head.getLong(0)
    // partial per-priority sketches merged — no second pass over rows
    val merged = orders.groupBy("o_orderpriority")
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .select(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head.getLong(0)
    assert(merged == direct,
      s"union of partials must equal the direct sketch: $merged vs $direct")
    val err = math.abs(direct - exact).toDouble / exact
    assert(err < 0.05, s"estimate $direct vs exact $exact: err $err")
  }

  test("approx vs exact distinct per group stays within HLL error") {
    val li = Tables(spark, sf, "lineitem")
    val both = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("exact"),
        hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"))).as("est"))
      .collect()
    both.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"group ${r.getString(0)}: $est vs $exact")
    }
  }
}
