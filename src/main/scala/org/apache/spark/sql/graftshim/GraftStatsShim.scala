package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{SupportsReportStatistics, V1Scan, Statistics => V2Statistics}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.sources.Filter

/** Statistics bridge for V1-bridged DSv2 scans — a declared shim, not
  * a copy (see the package's other shim for the pattern).
  *
  * Spark's scan pushdown wraps every `V1Scan` in `V1ScanWrapper`, and
  * `DataSourceV2ScanRelation.computeStats` pattern-matches the WRAPPER
  * for `SupportsReportStatistics` — so a V1-bridged scan's exact
  * metadata statistics (live row counts, zone-map column stats) never
  * reach the logical plan: every catalog table estimates at
  * `defaultSizeInBytes` (8 EiB), static broadcast decisions fall to
  * AQE, and CBO sees nothing. This subclass forwards the wrapped
  * scan's statistics through the wrapper; [[V1ScanStatsRule]] swaps it
  * in from the "User Provided Optimizers" batch
  * (`experimental.extraOptimizations`, installed by
  * `graft.Engine.installStatsRule`) — the ONLY logical hook that runs
  * after early scan pushdown (every `SparkSessionExtensions` injection
  * point, preCBO included, runs before it, when no scan relation
  * exists yet). Planner pattern-matches on the `V1ScanWrapper`
  * case-class extractor still bind — the subclass carries the same
  * fields.
  *
  * Known boundary: the "Join Reorder" batch runs right after pushdown
  * and BEFORE this rule's slot, so CostBasedJoinReorder sees V1-
  * bridged scans still stats-blind; it DOES see SPJ scans
  * (`GraftBatchScan` is a native DSv2 batch, never wrapped) — join
  * reorder on catalog tables therefore engages under the SPJ flag
  * (spec-pinned in ColumnStatsSpec). Everything downstream of the
  * rule — filter estimation, static broadcast selection, AQE's
  * initial plan — gets the stats on both paths.
  */
final class StatsV1ScanWrapper(v1: V1Scan, handled: Seq[Filter],
    ops: PushedDownOperators)
    extends V1ScanWrapper(v1, handled, ops) with SupportsReportStatistics {
  override def estimateStatistics(): V2Statistics =
    v1.asInstanceOf[SupportsReportStatistics].estimateStatistics()

  // NOT case-class-equal to the base wrapper, or TreeNode.transform
  // (fastEquals = ==) decides the rewritten relation is unchanged and
  // silently keeps the stats-blind original
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[StatsV1ScanWrapper]
  override def equals(that: Any): Boolean = that match {
    case s: StatsV1ScanWrapper => super.equals(s)
    case _ => false
  }
  override def hashCode(): Int = super.hashCode()
}

/** Pre-CBO rule: re-wrap stats-capable V1 scans so the relation's
  * `computeStats` sees them. No-op for anything else.
  */
case class V1ScanStatsRule() extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: DataSourceV2ScanRelation
        if r.scan.isInstanceOf[V1ScanWrapper] &&
          !r.scan.isInstanceOf[SupportsReportStatistics] &&
          r.scan.asInstanceOf[V1ScanWrapper].v1Scan
            .isInstanceOf[SupportsReportStatistics] =>
      val w = r.scan.asInstanceOf[V1ScanWrapper]
      r.copy(scan = new StatsV1ScanWrapper(
        w.v1Scan, w.handledFilters, w.pushedDownOperators))
  }
}
