package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/** Custom whole-operator extension (tier (c), SURVEY §2.2): top-k rows
  * per group — an operator Spark has no physical primitive for. The
  * built-in formulation (`row_number().over(window) … filter(rn ≤ k)`)
  * SORTS every partition of every group; this operator keeps a bounded
  * heap of k rows per group per partition instead: O(n log k) work,
  * O(groups·k) memory, no sort buffer, no spill pressure — the
  * difference between "sort 100 TB" and "scan 100 TB" when k ≪ rows
  * per group.
  *
  * Wiring: [[TopKPerGroupPlan]] (logical) → [[TopKStrategy]] (planner
  * strategy) → [[TopKPerGroupExec]] (physical, declares
  * `ClusteredDistribution` so Catalyst inserts exactly one hash
  * exchange on the group keys). Registered either via
  * [[GraftExtensions]] (`SparkSessionExtensions.injectPlannerStrategy`,
  * for sessions built with `.withExtensions`) or at runtime through
  * `spark.experimental.extraStrategies` ([[TopK.install]]) for
  * already-built sessions.
  */
final case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupPlan =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  /** Two-phase plan, the partial-aggregation shape: a map-side partial
    * top-k BELOW the exchange bounds shuffle volume to ≤ groups·k rows
    * per input partition (vs every input row for the window
    * formulation), then the post-exchange final pass is exact.
    */
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, s, k, child) =>
      TopKPerGroupExec(g, s, k, partial = false,
        TopKPerGroupExec(g, s, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  /** Final pass: one hash exchange on the group keys — after it, every
    * group lives in exactly one partition and the heaps are exact.
    * Partial pass: runs on the child's partitioning as-is (map side);
    * its per-partition top-k is a superset of each group's global
    * top-k, so the final pass loses nothing.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial)
      org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val boundGroup = groupExprs.map(BindReferences.bindReference(_, child.output))
    val orderingGen = new LazilyGeneratedOrdering(sortOrders, child.output)
    val kk = k
    val outRows = longMetric("numOutputRows")
    child.execute().mapPartitions({ iter =>
      val ordering: Ordering[InternalRow] = orderingGen
      val groupProj = UnsafeProjection.create(boundGroup)
      // per group: bounded "max"-heap holding the current best k — the
      // heap's top is the WORST kept row, evicted when a better arrives
      val heaps = collection.mutable.HashMap
        .empty[UnsafeRow, collection.mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          collection.mutable.PriorityQueue.empty[UnsafeRow](
            ordering.asInstanceOf[Ordering[UnsafeRow]]))
        if (heap.size < kk) {
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        outRows += heap.size
        heap.dequeueAll.reverseIterator // ascending under the sort order
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

/** `SparkSessionExtensions` registration — build sessions with
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
final class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(ApproxDistinctRule(_))
    e.injectResolutionRule(GraftDmlRule(_)) // SQL UPDATE/MERGE/DELETE → GraftTable DML
    // NOTE: the V1-scan statistics rule (graftshim.V1ScanStatsRule)
    // is NOT injectable here — every extension hook runs before early
    // scan pushdown; Engine.installStatsRule registers it in the
    // post-pushdown "User Provided Optimizers" batch instead.
  }
}

object TopK {

  /** Idempotently attach the strategy to an already-built session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Top-k rows per group, ordered by `orderBy` (col, ascending).
    * Output rows are the same shape as the input (no rank column).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val sorts = orderBy.map { case (n, asc) =>
      if (asc) SortOrder(attr(n), org.apache.spark.sql.catalyst.expressions.Ascending)
      else SortOrder(attr(n), org.apache.spark.sql.catalyst.expressions.Descending)
    }
    Bridge.ofRows(spark,
      TopKPerGroupPlan(groupCols.map(attr), sorts, k, analyzed))
  }

  /** Bounded top-k per group WITH an explicit rank column: the
    * bounded-heap operator keeps the survivors first (map-side partials
    * cap the shuffle at groups·k rows per partition), and only then a
    * grouped window numbers them — so the window's input is
    * OUTPUT-sized (≤ groups·k rows), never input-sized. This is the
    * scale-safe spelling of `row_number().over(partitionBy(g).orderBy(
    * …)) ≤ k`, which sorts every input row of every group.
    */
  def rankedPerGroup(df: DataFrame, groupCol: String,
      orderBy: Seq[(String, Boolean)], k: Int,
      rankCol: String = "rank", rankType: String = "long"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val kept = perGroup(df, Seq(groupCol), orderBy, k)
    val w = Window.partitionBy(groupCol).orderBy(orderBy.map {
      case (n, true) => col(n).asc
      case (n, false) => col(n).desc
    }: _*)
    kept.withColumn(rankCol, row_number().over(w).cast(rankType))
  }
}
