package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan audits: the scale-discipline assertions (SURVEY §4) —
  * filters reach the parquet scan, projections prune columns, small dims
  * broadcast, aggregations are partial+final, top-k fuses into
  * TakeOrderedAndProject, and hot paths stay inside whole-stage codegen.
  * A plan regression here is a 100 TB incident that local row counts
  * would never catch.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): SparkPlan = df.queryExecution.executedPlan
  private def planString(df: DataFrame): String = planOf(df).toString

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  test("q02: price filter is pushed down to the parquet scan") {
    val s = planString(q("q02_ref_query"))
    assert(s.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,100000.0)]"),
      s"missing pushdown in:\n$s")
  }

  test("q02: scan reads only the two referenced columns") {
    val s = planString(q("q02_ref_query"))
    assert(s.contains("ReadSchema: struct<o_totalprice:double,o_orderpriority:string>"),
      s"column pruning failed in:\n$s")
  }

  test("q10: dim-chain joins broadcast (no shuffle join for 5/25-row dims)") {
    val s = planString(q("q10_dim_chain"))
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$s")
    assert(!s.contains("SortMergeJoin"), s"dims must not sort-merge:\n$s")
  }

  test("q04: aggregation is partial+final (map-side combine)") {
    val p = planString(q("q04_pricing_summary"))
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate in:\n$p")
  }

  test("q03: top-k fuses into TakeOrderedAndProject (no global sort)") {
    val s = planString(q("q03_topk"))
    assert(s.contains("TakeOrderedAndProject"), s"top-k not fused in:\n$s")
  }

  test("q04 hot path is inside whole-stage codegen") {
    val df = q("q04_pricing_summary")
    df.collect() // finalize the AQE plan on this Dataset's QueryExecution
    val s = planString(df)
    // codegen'd operators print with a "*(stage)" prefix
    assert(s.contains("*("), s"no codegen span in:\n$s")
  }

  test("native dot-product expression does not break codegen") {
    val emb = Tables(spark, sf, "embeddings")
    val df = emb.select(graft.functions.DotProduct
      .dotNative(org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.col("embedding")).as("d"))
    val s = planString(df)
    assert(s.contains("*("), s"dot product fell out of codegen:\n$s")
    // and it actually evaluates
    assert(df.limit(5).collect().forall(!_.isNullAt(0)))
  }

  test("exact ANN plans: broadcast query side, no cartesian product") {
    // lsh: bucket join + id-pair distinct + vector rejoin — the
    // candidate exchange must carry id pairs, never a cross product
    val lsh = q("ann_lsh_topk")
    lsh.collect()
    val lshPlan = planString(lsh)
    assert(!lshPlan.contains("CartesianProduct"),
      s"LSH ANN must never cross-join:\n$lshPlan")
    assert(lshPlan.contains("BroadcastHashJoin") || lshPlan.contains("BroadcastExchange"),
      s"query side should broadcast:\n$lshPlan")
    // ivf: centroid probe is a broadcast nested loop over |cells| rows
    // (bounded by cell count, not corpus) — corpus scoring itself must
    // be a broadcast hash join on cell
    val ivf = q("ann_ivf_topk")
    ivf.collect()
    val ivfPlan = planString(ivf)
    assert(ivfPlan.contains("BroadcastHashJoin"),
      s"IVF candidate join should broadcast probes:\n$ivfPlan")
  }

  test("q22: event-time bucketing aggregates without a pre-shuffle sort") {
    val s = planString(q("q22_tumbling_window"))
    assert(s.contains("HashAggregate"), s"expected hash agg in:\n$s")
  }
}
