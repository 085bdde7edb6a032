package graft

/** Systemic plan-regression gate: every judged query's physical plan is
  * audited for operators that do not survive a 100× scale-up. A
  * cartesian product or broadcast-nested-loop join anywhere EXCEPT the
  * declared whitelist fails the build — so an innocent-looking edit
  * that silently degrades a join to O(n·m) is caught at test time, not
  * in a 100 TB run. The whitelist is exact: an entry that stops being
  * needed also fails, keeping it honest.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries whose plans legitimately contain a non-equi or cross join,
    * each with the reason it is scale-safe.
    */
  private val allowed: Map[String, String] = Map(
    "q11_count_distinct" -> "single-row cross join (two global aggregates combined)",
    "q24_dedup_stats" -> "single-row cross join (global dedup ratio)",
    "q31_range_join" -> "declared theta-join surface: BNLJ over a broadcast 5-row bound table",
    "ann_brute_topk" -> "declared brute-force baseline: broadcast queries × corpus by design",
    "ann_sq8_topk" -> "SQ8 scan tier: broadcast queries × corpus over 1-byte codes by design; re-rank joins on the shortlist",
    "ann_sq8_small" -> "the SQ8 tier's second-scale (fixed sf0.001) judged row — same broadcast scan shape",
    "q48_percentiles" -> "4-row literal percentile frame broadcast against ranked groups",
    "ann_ivf_topk" -> "probe scoring: queries × broadcast centroid-mean frame (cells ≪ corpus) by design",
    "ann_pq_topk" -> "ADC scoring: code table × broadcast per-query LUT frame (queries ≪ corpus) by design",
    "ann_ivfpq_topk" -> "probe scoring: queries × broadcast centroid frame (cells ≪ corpus) by design; ADC itself joins on cell",
    "text_bm25" -> "single-row cross join (corpus stats N/avgdl/df broadcast back onto docs)",
    "text_perplexity" -> "single-row cross join (total-token count N broadcast onto the vocab)",
    "text_ccnet_buckets" -> "single-row cross join (the shared lmSurprisal N-broadcast shape)",
    "dedup_semantic" -> "SemDeDup assignment: corpus × broadcast centroid-mean frame (cells ≪ corpus) by design",
    "ann_ivf_index" -> "VectorIndex probe scoring: queries × broadcast persisted-centroid frame (≤nCells rows) by design",
    "text_nb_lang" -> "NB scoring: doc-term frequencies × broadcast per-language prior frame (#langs rows) by design",
    "sample_dsir" -> "single-row cross join (the two model-total logs broadcast onto per-doc scores)",
  )

  /** Allowed but not required: plans that flip between a subquery
    * expression (no join) and a single-row broadcast BNLJ depending on
    * session state — both forms are scale-safe.
    */
  private val conditional: Set[String] = Set(
    "q38_subqueries" // scalar subquery: single row compared against every row
  )

  test("no undeclared cartesian / broadcast-nested-loop joins in any judged plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      spark.catalog.clearCache()
      val bad = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (bad) Some(name) else None
    }.toSet
    val undeclared = offenders -- allowed.keySet -- conditional
    val stale = allowed.keySet -- offenders
    assert(undeclared.isEmpty,
      s"queries gained an unexpected cartesian/BNL join: $undeclared")
    assert(stale.isEmpty,
      s"whitelist entries no longer needed (remove them): $stale")
  }

  /** Queries whose plans legitimately contain a PARTITIONLESS window
    * (every row through one task — the other O(n)-on-one-executor shape
    * besides BNLJ), each with the reason it is scale-safe.
    */
  private val allowedGlobalWindow: Map[String, String] = Map(
    "q51_interpolate" -> ("neighbor scan over HOURLY-BUCKET aggregates: " +
      "cardinality = series length (bounded by the time range, not by |events|)"),
    "sample_temperature" -> ("largest-remainder apportionment over PER-LANGUAGE " +
      "totals: cardinality = #languages, not |documents|"),
  )

  test("no undeclared partitionless window in any judged plan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      spark.catalog.clearCache()
      val global = plan.collectWithSubqueries {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      if (global.nonEmpty) Some(name) else None
    }.toSet
    val undeclared = offenders -- allowedGlobalWindow.keySet
    val stale = allowedGlobalWindow.keySet -- offenders
    assert(undeclared.isEmpty,
      s"queries gained a partitionless (single-task) window: $undeclared")
    assert(stale.isEmpty,
      s"global-window whitelist entries no longer needed (remove them): $stale")
  }

  /** Queries whose top-k / quota semantics MUST rank through the
    * bounded-heap TopKPerGroup operator (map-side partials cap the
    * shuffle at groups·k rows per partition), not a grouped
    * row_number window that sorts every input row of every group.
    * A regression back to the window shape fails here.
    */
  private val mustUseBoundedTopK: Seq[String] = Seq(
    "ann_brute_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk",
    "ann_ivfpq_topk", "sample_capped")

  test("top-k queries rank through the bounded-heap operator") {
    mustUseBoundedTopK.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      spark.catalog.clearCache()
      assert(plan.contains("TopKPerGroupFinal") &&
        plan.contains("TopKPerGroupPartial"),
        s"$name no longer ranks through the bounded TopKPerGroup operator")
    }
  }

  /** Aggregation-only manifests must not smuggle a ranking window in:
    * the per-shard head doc is a `min_by` aggregate, and the quota cap
    * is the bounded heap — neither plan may contain ANY window.
    */
  test("window-free manifests stay window-free") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    Seq("sample_shards", "sample_capped").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      spark.catalog.clearCache()
      val wins = plan.collectWithSubqueries { case w: LWindow => w }
      assert(wins.isEmpty, s"$name gained a window: ranked/ordered work " +
        "must flow through aggregates or the bounded top-k operator")
    }
  }
}
