package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, EqualTo, ExprId, Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftshim.GraftStreamingShim
import org.apache.spark.sql.types.LongType

import graft.table.{GraftTable, GraftV2Table}

/** SQL `UPDATE`, `MERGE INTO`, and predicate-general `DELETE` for
  * graft catalog tables, via an injected ANALYZER rule — the
  * extension architecture Delta Lake's paper describes for the same
  * problem (SQL DML onto a log-structured format), built here on the
  * repo's own copy-on-write primitives:
  *
  *   - `UPDATE t SET … WHERE …`   → [[GraftTable.updateWhereAuto]]
  *   - `MERGE INTO t USING s ON …` → [[GraftTable.mergeInto]]
  *   - `DELETE FROM t WHERE …`     → [[GraftTable.deleteWhereAuto]],
  *     ONLY when the predicate defeats the connector `SupportsDelete`
  *     path (a non-translatable expression such as `k % 10 = 3`) —
  *     translatable deletes keep riding the standard V2 interface.
  *
  * Spark's own rewrite for these verbs (`SupportsRowLevelOperations`
  * → `ReplaceData`) requires executor-side V2 writers; the table
  * format's write path is its atomic-commit `writeData`, so the verbs
  * instead lower to eagerly-executed commands whose file pruning,
  * constraint enforcement, CDC semantics, and conflict retry are
  * exactly the judged programmatic DML.
  *
  * Expression handling: the resolved condition / SET / action
  * expressions are re-rendered to SQL text with attributes reduced to
  * bare names (target columns keep their names; MERGE source columns
  * render as the `src_<name>` namespace [[GraftTable.mergeInto]]
  * defines, source join keys as the target key name). Subqueries
  * cannot round-trip through text, so a DML statement carrying one is
  * left for Spark's standard path to reject with its own error.
  */
case class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(rel, assignments, cond) if u.resolved =>
      graftOf(rel) match {
        case Some((out, table)) =>
          toUpdate(table, out, assignments, cond)
        case None => plan
      }
    // WITH SCHEMA EVOLUTION: Spark's own ResolveMergeIntoSchemaEvolution
    // applies the additive column changes through the catalog's
    // alterTable FIRST (gated by AUTOMATIC_SCHEMA_EVOLUTION) — wait for
    // it, then lower the merge against the evolved target relation
    case m: MergeIntoTable if m.resolved && !m.needSchemaEvolution =>
      graftOf(m.targetTable) match {
        case Some((out, table)) => toMerge(m, out, table)
        case None => plan
      }
    case d @ DeleteFromTable(rel, cond) if d.resolved =>
      graftOf(rel) match {
        case Some((_, table))
            if !hasSubquery(cond) && !connectorCanDelete(cond) =>
          GraftDeleteCommand(table.root, render(cond, AttributeSet.empty,
            Map.empty))
        case _ => plan
      }
    case other => other
  }

  /** The graft table behind a (possibly aliased) relation plan. */
  private def graftOf(plan: LogicalPlan)
      : Option[(AttributeSet, GraftV2Table)] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftV2Table] =>
        (r.outputSet, r.table.asInstanceOf[GraftV2Table])
    }

  private def hasSubquery(e: Expression): Boolean =
    e.exists(_.isInstanceOf[SubqueryExpression])

  /** Mirrors the planner's check: every conjunct must translate to a
    * connector filter [[graft.table.FilterSql]] can also express —
    * then `SupportsDelete` handles it and this rule stays out.
    */
  private def connectorCanDelete(cond: Expression): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).forall(c =>
      GraftStreamingShim.translateFilter(c)
        .exists(f => graft.table.FilterSql.translate(f).isDefined))
  }

  /** Re-render a resolved expression as parseable SQL text: source
    * join keys → the target key name, other source attributes →
    * `src_<name>`, everything else → its bare name.
    */
  private def render(e: Expression, srcAttrs: AttributeSet,
      srcKeyNames: Map[ExprId, String]): String =
    e.transform {
      case a: AttributeReference if srcKeyNames.contains(a.exprId) =>
        UnresolvedAttribute(Seq(srcKeyNames(a.exprId)))
      case a: AttributeReference if srcAttrs.contains(a) =>
        UnresolvedAttribute(Seq(s"src_${a.name}"))
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    }.sql

  private def toUpdate(table: GraftV2Table, tgt: AttributeSet,
      assignments: Seq[Assignment], cond: Option[Expression])
      : LogicalPlan = {
    cond.foreach(c => require(!hasSubquery(c),
      "graft UPDATE does not support subqueries in WHERE"))
    val sets = assignments.map { a =>
      a.key match {
        case ar: AttributeReference =>
          ar.name -> render(a.value, AttributeSet.empty, Map.empty)
        case other => throw new IllegalArgumentException(
          s"graft UPDATE supports top-level column assignment only, got $other")
      }
    }
    val condSql =
      cond.map(render(_, AttributeSet.empty, Map.empty)).getOrElse("true")
    GraftUpdateCommand(table.root, condSql, sets)
  }

  private def toMerge(m: MergeIntoTable, tgt: AttributeSet,
      table: GraftV2Table): LogicalPlan = {
    require(!hasSubquery(m.mergeCondition) &&
      (m.matchedActions ++ m.notMatchedActions ++
        m.notMatchedBySourceActions).forall {
        case UpdateAction(c, as, _) =>
          !c.exists(hasSubquery) && !as.exists(a => hasSubquery(a.value))
        case InsertAction(c, as) =>
          !c.exists(hasSubquery) && !as.exists(a => hasSubquery(a.value))
        case DeleteAction(c) => !c.exists(hasSubquery)
        case _ => true
      }, "graft MERGE does not support subqueries in conditions/values")

    val srcOut = m.sourceTable.outputSet

    // ON must be a conjunction of target-col = source-col equalities —
    // the equi-key contract mergeInto's pruning and single join need
    def eqPairs(e: Expression)
        : Seq[(AttributeReference, AttributeReference)] = e match {
      case And(l, r) => eqPairs(l) ++ eqPairs(r)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tgt.contains(a) && srcOut.contains(b) => Seq((a, b))
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tgt.contains(b) && srcOut.contains(a) => Seq((b, a))
      case other => throw new IllegalArgumentException(
        "graft MERGE requires ON to be a conjunction of " +
          s"target-column = source-column equalities, got: ${other.sql}")
    }
    val pairs = eqPairs(m.mergeCondition)
    require(pairs.nonEmpty, "graft MERGE requires at least one key equality")
    val keyNames = pairs.map(_._1.name)
    val srcKeyNames = pairs.map(p => p._2.exprId -> p._1.name).toMap
    def rend(e: Expression): String = render(e, srcOut, srcKeyNames)

    // the source plan re-projected so join keys carry the TARGET key
    // names (what mergeInto joins on); non-key source columns pass
    // through for the src_<name> namespace — one that would collide
    // with a key name is dropped (unreferencable either way)
    val keyAliases = pairs.map { case (t, s) => Alias(s, t.name)() }
    val passThrough = m.sourceTable.output
      .filterNot(a => srcKeyNames.contains(a.exprId))
      .filterNot(a => keyNames.contains(a.name))
    val srcPlan = Project(keyAliases ++ passThrough, m.sourceTable)

    // clause order → mergeInto's fixed delete-then-update order: each
    // action's effective condition picks up the negation of every
    // EARLIER action's condition, so first-matching-clause semantics
    // survive the reorder; an unconditional action makes later ones
    // unreachable and they drop. The negation must be NULL-safe: a
    // prior condition evaluating NULL did NOT fire its clause, so the
    // later clause must still be eligible — plain NOT(p) would carry
    // the NULL through and the conjunction would coalesce to false.
    def guarded(prior: Seq[String], own: Option[Expression]): String = {
      val negs = prior.map(p => s"(($p) IS NOT TRUE)")
      val c = own.map(rend).getOrElse("true")
      (negs :+ s"($c)").mkString(" AND ")
    }
    var priors = Seq.empty[String]
    var unreachable = false
    var update: Option[(Seq[(String, String)], String)] = None
    var delete: Option[String] = None

    def starSets(action: String): Seq[Assignment] = {
      val byName = m.sourceTable.output.map(a => a.name -> a).toMap
      tgt.toSeq.collect {
        case t: AttributeReference if !keyNames.contains(t.name) =>
          val s = byName.getOrElse(t.name, throw new IllegalArgumentException(
            s"graft MERGE $action *: source lacks column '${t.name}'"))
          Assignment(t, s)
      }
    }

    m.matchedActions.foreach { act =>
      if (!unreachable) act match {
        case UpdateAction(c, assigns, _) =>
          require(update.isEmpty, "graft MERGE supports one matched UPDATE")
          val sets = assigns.map { a =>
            a.key match {
              case ar: AttributeReference => ar.name -> rend(a.value)
              case other => throw new IllegalArgumentException(
                s"graft MERGE supports top-level SET only, got $other")
            }
          }
          update = Some((sets, guarded(priors, c)))
          if (c.isEmpty) unreachable = true else priors :+= rend(c.get)
        case UpdateStarAction(c) =>
          require(update.isEmpty, "graft MERGE supports one matched UPDATE")
          val sets = starSets("UPDATE SET").map(a =>
            a.key.asInstanceOf[AttributeReference].name -> rend(a.value))
          update = Some((sets, guarded(priors, c)))
          if (c.isEmpty) unreachable = true else priors :+= rend(c.get)
        case DeleteAction(c) =>
          require(delete.isEmpty, "graft MERGE supports one matched DELETE")
          delete = Some(guarded(priors, c))
          if (c.isEmpty) unreachable = true else priors :+= rend(c.get)
        case other => throw new IllegalArgumentException(
          s"graft MERGE: unsupported matched action $other")
      }
    }

    // WHEN NOT MATCHED BY SOURCE: its own first-matching-clause chain,
    // independent of the matched class (a row is in exactly one class).
    // Expressions may reference TARGET columns only — the source side
    // of an unmatched row does not exist (Spark's analyzer enforces
    // the same rule; re-checked here because rend would silently map
    // stray source refs into the all-NULL src_ namespace).
    var bsPriors = Seq.empty[String]
    var bsUnreachable = false
    var bsUpdate: Option[(Seq[(String, String)], String)] = None
    var bsDelete: Option[String] = None
    def tgtOnly(what: String, es: Seq[Expression]): Unit =
      es.foreach(e => require(e.references.subsetOf(tgt),
        s"graft MERGE: NOT MATCHED BY SOURCE $what may reference " +
          "target columns only"))
    m.notMatchedBySourceActions.foreach { act =>
      if (!bsUnreachable) act match {
        case UpdateAction(c, assigns, _) =>
          require(bsUpdate.isEmpty,
            "graft MERGE supports one NOT MATCHED BY SOURCE UPDATE")
          tgtOnly("UPDATE", c.toSeq ++ assigns.map(_.value))
          val sets = assigns.map { a =>
            a.key match {
              case ar: AttributeReference => ar.name -> rend(a.value)
              case other => throw new IllegalArgumentException(
                s"graft MERGE supports top-level SET only, got $other")
            }
          }
          bsUpdate = Some((sets, guarded(bsPriors, c)))
          if (c.isEmpty) bsUnreachable = true else bsPriors :+= rend(c.get)
        case DeleteAction(c) =>
          require(bsDelete.isEmpty,
            "graft MERGE supports one NOT MATCHED BY SOURCE DELETE")
          tgtOnly("DELETE", c.toSeq)
          bsDelete = Some(guarded(bsPriors, c))
          if (c.isEmpty) bsUnreachable = true else bsPriors :+= rend(c.get)
        case other => throw new IllegalArgumentException(
          s"graft MERGE: unsupported NOT MATCHED BY SOURCE action $other")
      }
    }

    val insert = m.notMatchedActions match {
      case Nil => None
      case Seq(InsertAction(c, assigns)) =>
        val sets = assigns.flatMap { a =>
          val name = a.key match {
            case ar: AttributeReference => ar.name
            case other => throw new IllegalArgumentException(
              s"graft MERGE supports top-level INSERT columns only, got $other")
          }
          if (keyNames.contains(name)) {
            // key columns always take the source key — accept only the
            // identity assignment and drop it
            val ok = a.value match {
              case ar: AttributeReference =>
                srcKeyNames.get(ar.exprId).contains(name)
              case _ => false
            }
            require(ok, s"graft MERGE: INSERT must assign key '$name' " +
              "from the matching source key")
            None
          } else {
            require(a.value.references.subsetOf(srcOut),
              s"graft MERGE: INSERT value for '$name' may reference " +
                "source columns only")
            Some(name -> rend(a.value))
          }
        }
        Some((sets, c.map(rend)))
      case Seq(InsertStarAction(c)) =>
        val sets = starSets("INSERT").map(a =>
          a.key.asInstanceOf[AttributeReference].name -> rend(a.value))
        Some((sets, c.map(rend)))
      case other => throw new IllegalArgumentException(
        "graft MERGE supports at most one WHEN NOT MATCHED clause, got " +
          other.size)
    }

    GraftMergeCommand(table.root, srcPlan, keyNames,
      matchedUpdate = update.map(_._1).getOrElse(Nil),
      matchedUpdateCond = update.map(_._2),
      matchedDelete = delete,
      notMatchedInsert = insert.map(_._1),
      notMatchedInsertCond = insert.flatMap(_._2),
      bySourceUpdate = bsUpdate.map(_._1).getOrElse(Nil),
      bySourceUpdateCond = bsUpdate.map(_._2),
      bySourceDelete = bsDelete)
  }
}

/** Eagerly-executed `UPDATE` — the version it committed is the row. */
case class GraftUpdateCommand(root: String, condSql: String,
    sets: Seq[(String, String)]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(GraftTable.updateWhereAuto(spark, root, condSql, sets)))
}

/** Eagerly-executed predicate-general `DELETE`. */
case class GraftDeleteCommand(root: String, condSql: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(GraftTable.deleteWhereAuto(spark, root, condSql)))
}

/** Eagerly-executed `MERGE INTO`. Carries the analyzed source plan;
  * run() wraps it as a DataFrame and hands it to the tri-clause
  * [[GraftTable.mergeInto]] (unique-key check, file pruning,
  * constraint enforcement, CDC bag-diff all included).
  */
case class GraftMergeCommand(root: String, sourcePlan: LogicalPlan,
    keys: Seq[String], matchedUpdate: Seq[(String, String)],
    matchedUpdateCond: Option[String], matchedDelete: Option[String],
    notMatchedInsert: Option[Seq[(String, String)]],
    notMatchedInsertCond: Option[String],
    bySourceUpdate: Seq[(String, String)] = Nil,
    bySourceUpdateCond: Option[String] = None,
    bySourceDelete: Option[String] = None) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftStreamingShim.frameOf(spark, sourcePlan)
    Seq(Row(GraftTable.mergeInto(spark, root, src, keys,
      matchedUpdate, matchedUpdateCond, matchedDelete,
      notMatchedInsert, notMatchedInsertCond,
      bySourceUpdate = bySourceUpdate,
      bySourceUpdateCond = bySourceUpdateCond,
      bySourceDelete = bySourceDelete)))
  }
}
