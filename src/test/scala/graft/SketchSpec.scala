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

  test("quantile sketch (approx_percentile): rank-error bound holds on ANY partitioning") {
    val li = Tables(spark, sf, "lineitem").select("l_extendedprice")
    val acc = 1000 // accuracy knob: rank error <= n/acc per merge level
    def quantiles(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.select(percentile_approx(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.9)), lit(acc)).as("q"))
        .head.getSeq[Double](0).toSeq
    // Greenwald-Khanna partials ARE order-dependent (unlike HLL union,
    // whose merge is exactly deterministic — see above): different
    // partitionings may return different elements. The contract that
    // makes per-partition partials safe at 100 TB is that every merge
    // result stays within the rank-error bound — assert it for three
    // different layouts rather than a bit-equality no sketch promises.
    val n = li.count()
    val sorted = li.orderBy("l_extendedprice").collect().map(_.getDouble(0))
    val layouts = Seq(li, li.repartition(13), li.repartition(3, col("l_extendedprice")))
    layouts.foreach { df =>
      Seq(0.25, 0.5, 0.9).zip(quantiles(df)).foreach { case (p, est) =>
        val rank = sorted.indexWhere(_ >= est)
        assert(math.abs(rank - p * n) <= n.toDouble / acc * 2 + 1,
          s"p$p: estimate $est at rank $rank of $n rows")
      }
    }
  }
}
