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

  test("hive-partitioned read: partition filter prunes directories at plan time") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("prune").toString + "/events"
    val ev = Tables(spark, sf, "events").withColumn("etype", col("event_type"))
    ev.write.partitionBy("etype").parquet(dir)
    val nTypes = ev.select("etype").distinct().count()
    val one = spark.read.parquet(dir).filter(col("etype") === "click")
    val s = planString(one)
    // the partition predicate must land in PartitionFilters (metadata
    // pruning — pruned directories are never listed, let alone read),
    // NOT in PushedFilters (row-group evaluation after opening files)
    assert(s.contains("PartitionFilters") && s.contains("isnotnull(etype"),
      s"partition filter missing from scan metadata:\n$s")
    val scan = planOf(one).collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .length == 1,
      s"expected 1 of $nTypes partition dirs to survive pruning")
  }

  test("bucketed table: filter on the bucket key reads ONE bucket") {
    import org.apache.spark.sql.functions._
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS orders_bkt_prune")
    Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt_prune")
    // autoBucketedScan disables bucketed reads when no join/agg wants
    // the distribution — but a point filter DOES want bucket pruning;
    // pin it on so the scan keeps bucket metadata for this shape
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val one = spark.table("orders_bkt_prune")
        .filter(col("o_orderkey") === 1L)
      val s = planString(one)
      // bucket pruning: the literal's hash selects a single bucket, so
      // 7/8 of the table's files are skipped without reading a footer
      assert(s.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected single-bucket scan:\n$s")
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS orders_bkt_prune")
    }
  }

  test("rank filter lowers to WindowGroupLimit (per-group heap, not full sort+filter)") {
    // rn <= k over a window must plan as WindowGroupLimitExec: each
    // partition keeps a k-bounded heap per group BEFORE the exchange,
    // so the shuffle carries O(groups·k) rows — the difference between
    // a per-key top-k and materializing every ranked row at 100 TB.
    // text_top_term (rn = 1 keep-first) and q56_lateral (LIMIT 2 per
    // segment after decorrelation) both ride this lowering.
    for (name <- Seq("text_top_term", "q56_lateral")) {
      val s = planString(q(name))
      assert(s.contains("WindowGroupLimit"),
        s"$name lost the WindowGroupLimit lowering:\n$s")
    }
  }
}
