package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dynamic partition pruning, proven at the plan AND runtime-metric
  * level (the result itself is hash-judged via dpp_partitioned_join's
  * oracle entry): the fact scan must carry a dynamicpruningexpression
  * partition filter, and after execution its numPartitions metric must
  * show only the dim-selected year partitions were read.
  */
class DppSpec extends SparkSpec {

  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case qs: QueryStageExec => fileScans(qs.plan) // AQE stage wrapper is a leaf
    case s: FileSourceScanExec => Seq(s)
    case other =>
      (other.children ++ other.subqueries).flatMap(fileScans)
  }

  test("dpp_partitioned_join: pruning subquery in plan, 3 of 7 partitions read") {
    val q = SparkEntry.queries("dpp_partitioned_join")(spark, sf)
    // collect() drives q's OWN queryExecution, so the scan metrics below
    // belong to this run (a count() would execute a separate plan)
    assert(q.collect().nonEmpty)
    val plan = q.queryExecution.executedPlan
    assert(plan.toString.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning filter on the partitioned scan:\n$plan")
    val pruned = fileScans(plan).filter(
      _.partitionFilters.exists(_.toString.toLowerCase.contains("dynamicpruning")))
    assert(pruned.nonEmpty, "no FileSourceScanExec with a dynamic partition filter")
    val partitionsRead = pruned.map(_.metrics("numPartitions").value)
    assert(partitionsRead.forall(_ == 3),
      s"expected 3 year partitions read (1995/1998/2001), got $partitionsRead")
  }
}
