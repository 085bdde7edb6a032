package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, sum}
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType}

/** Materialized-view (aggregate rollup) query rewrite — the classic
  * warehouse accelerator as an opt-in Catalyst rule: a query that
  * groups the BASE table by a subset of a registered rollup's keys and
  * asks only re-aggregable measures is silently answered from the
  * rollup, whose cardinality is |group keys' domain| instead of the
  * base row count. At 100 TB this is the difference between scanning
  * the fact table and scanning megabytes.
  *
  * Correctness posture (an optimizer rule must never change answers):
  *   - fires only under [[MaterializedRollup.flag]];
  *   - ONLY exact re-aggregable measures rewrite: `COUNT(*)` → sum of
  *     the rollup's partial counts, `SUM(col)` over integral/decimal
  *     columns → sum of partial sums cast back to the original type
  *     (integer and decimal addition are associative — partials
  *     re-aggregate exactly; float sums are deliberately NOT matched,
  *     their reassociation drifts);
  *   - the query's grouping keys must be plain columns, a SUBSET of
  *     the rollup's keys; anything else (filters, expressions, other
  *     aggregates) leaves the plan untouched;
  *   - output attribute ids/names/types are preserved exactly, so
  *     parent operators are oblivious to the swap.
  *
  * Staleness is the caller's contract (same as every warehouse MV):
  * [[MaterializedRollup.create]] materializes at a point in time and
  * registers; re-create after base-table changes.
  */
case class RollupRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import MaterializedRollup.{Descriptor, flag, registry}

  private def exactSummable(e: Expression): Boolean = e.dataType match {
    case IntegerType | LongType | _: DecimalType => true
    case _ => false
  }

  /** The base-relation paths a plan leaf scans, if it is a file scan. */
  private def leafPaths(p: LogicalPlan): Option[(LogicalRelation, Seq[String])] =
    p match {
      case l @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some((l, fs.location.rootPaths.map(_.toString)))
      case Project(projList, child) if projList.forall(_.isInstanceOf[Attribute]) =>
        leafPaths(child)
      case _ => None
    }

  // EXACT normalized-path match: substring matching would let a rollup
  // for /data/orders silently answer queries over /data/orders_returns.
  // Strip the URI scheme, then absolutize so a descriptor registered
  // with a relative path still matches the scan's file:/abs form.
  private def normalize(p: String): String =
    new java.io.File(new org.apache.hadoop.fs.Path(p).toUri.getPath)
      .getAbsolutePath
  private def descriptorFor(paths: Seq[String]): Option[Descriptor] =
    registry.values.find(d =>
      paths.exists(p => normalize(p) == normalize(d.baseTag)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.get(flag, "false").toBoolean) plan
    else plan.transform {
      // leafPaths/descriptorFor evaluated ONCE per Aggregate node
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        leafPaths(child).flatMap(lp => descriptorFor(lp._2)) match {
          case Some(d) => rewrite(agg, groupExprs, aggExprs, d).getOrElse(agg)
          case None => agg
        }
    }

  private def rewrite(orig: Aggregate, groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], d: Descriptor): Option[LogicalPlan] = {
    // grouping keys: plain columns, subset of the rollup's keys
    val groupAttrs = groupExprs.map {
      case a: AttributeReference if d.groupKeys.contains(a.name) => a
      case _ => return None
    }
    // the MV's plan was analyzed ONCE at create() time — re-resolving
    // here would re-list and re-infer the MV footer inside the
    // optimizer on EVERY matching query, including candidates the
    // rewrite then rejects. newInstance() mints fresh attribute ids so
    // one cached relation can be spliced into many queries safely.
    val mvPlan = d.mvRelation.newInstance()
    val mvOut = mvPlan.output.map(a => a.name -> a).toMap
    // every column the rewrite will reference must exist in the MV
    val needed = groupAttrs.map(_.name) ++ Seq("cnt") ++
      d.sumCols.map(c => s"sum_$c")
    if (!needed.forall(mvOut.contains)) return None
    def mv(name: String): Attribute = mvOut(name)

    def reAgg(e: Expression): Option[Expression] = e match {
      case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _) =>
        Some(Coalesce(Seq(
          AggregateExpression(Sum(mv("cnt")), Complete, isDistinct = false),
          Literal(0L))))
      case ae @ AggregateExpression(Sum(a: AttributeReference, _), Complete, false, None, _)
          if d.sumCols.contains(a.name) && exactSummable(a) =>
        Some(Cast(
          AggregateExpression(Sum(mv(s"sum_${a.name}")), Complete, isDistinct = false),
          ae.dataType))
      case _ => None
    }

    val newAggExprs: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if d.groupKeys.contains(a.name) =>
        Alias(mv(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(child, name) =>
        reAgg(child) match {
          case Some(ne) => Alias(ne, name)(exprId = al.exprId)
          case None => return None // not exactly re-aggregable: bail
        }
      case _ => return None
    }
    val newGroup = groupAttrs.map(a => mv(a.name))
    // explicit pruning Project: extraOptimizations run AFTER the main
    // optimizer batches, so ColumnPruning never revisits this subtree —
    // without it the MV scan would read every rollup column
    val refs = (newGroup.flatMap(_.references) ++
      newAggExprs.flatMap(_.references)).distinct
    Some(Aggregate(newGroup, newAggExprs, Project(refs, mvPlan), None))
  }
}

object MaterializedRollup {

  /** Session conf gating the rewrite; default off. */
  val flag = "spark.graft.rollupRewrite"

  /** @param baseTag the base table's file path (matched EXACTLY after
    *        URI normalization — never by substring)
    * @param mvPath  rollup location (parquet)
    * @param groupKeys rollup grouping columns
    * @param sumCols  base columns with a `sum_<col>` partial in the MV
    * @param mvRelation the MV's analyzed scan relation, resolved once
    *        at [[create]] (file listing + footer schema inference);
    *        the rule splices `mvRelation.newInstance()` — plan-time IO
    *        never happens on the query path
    */
  case class Descriptor(baseTag: String, mvPath: String,
      groupKeys: Seq[String], sumCols: Seq[String],
      mvRelation: LogicalRelation)

  private[plans] val registry = TrieMap.empty[String, Descriptor]

  /** Materialize `SELECT keys, COUNT(*) cnt, SUM(c) sum_c... GROUP BY
    * keys` over the base frame and register it for the rewrite.
    */
  def create(spark: SparkSession, base: DataFrame, baseTag: String,
      groupKeys: Seq[String], sumCols: Seq[String], mvPath: String): Unit = {
    val aggs = count(lit(1)).as("cnt") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    base.groupBy(groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(mvPath)
    val rel = spark.read.parquet(mvPath).queryExecution.analyzed match {
      case l: LogicalRelation => l
      case other => throw new IllegalStateException(
        s"expected a file-scan relation for the MV, got ${other.nodeName}")
    }
    registry.put(baseTag, Descriptor(baseTag, mvPath, groupKeys, sumCols, rel))
  }

  def drop(baseTag: String): Unit = registry.remove(baseTag)

  /** Idempotently attach the rule to an already-built session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[RollupRewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRewriteRule(spark)
}
