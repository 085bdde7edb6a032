package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in query accelerator as a Catalyst OPTIMIZER rule: when the
  * session flag [[ApproxDistinctRule.flag]] is true, every exact
  * `COUNT(DISTINCT x)` in the plan is rewritten to a HyperLogLog++
  * estimate (default 5% rsd) — same result column name and type, a
  * fraction of the cost. The 100 TB rationale: exact distinct-count
  * shuffles every distinct value of x; the sketch aggregates map-side
  * into a few KB per partition, so the exchange carries sketches, not
  * values — the difference between a full-key shuffle and a metadata
  * shuffle on a dashboard query that tolerates ±5%.
  *
  * The rewrite is deliberately CONSERVATIVE: single-argument COUNT
  * DISTINCT only (multi-column distinct and DISTINCT under other
  * aggregates keep exact semantics), and nothing fires unless the user
  * sets the flag — an optimizer rule must never silently change
  * answers. Registered via `SparkSessionExtensions.injectOptimizerRule`
  * ([[GraftExtensions]]) or idempotently at runtime with [[install]].
  */
case class ApproxDistinctRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.get(ApproxDistinctRule.flag, "false").toBoolean) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(c: Count, _, true, None, _)
          if c.children.size == 1 =>
        ae.copy(
          aggregateFunction = HyperLogLogPlusPlus(c.children.head),
          isDistinct = false)
    }
}

object ApproxDistinctRule {

  /** Session conf gating the rewrite; default off (exact semantics). */
  val flag = "spark.graft.approxDistinct"

  /** Idempotently attach the rule to an already-built session. */
  def install(spark: SparkSession): Unit = {
    val rule = ApproxDistinctRule(spark)
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[ApproxDistinctRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }
}
