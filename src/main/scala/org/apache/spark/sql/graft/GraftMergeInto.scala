package org.apache.spark.sql.graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.sources.{GraftRelation, VersionedTable}

/** SQL `MERGE INTO` over graft tables — the DDL-parity half of the
  * `graft` data source (VERDICT r12 #6): a resolution rule rewrites a
  * resolved [[MergeIntoTable]] whose TARGET is a graft relation into
  * [[GraftMergeCommand]], which drives the engine's own
  * [[VersionedTable.merge]] (one full-outer key join, copy-on-write
  * commit, optimistic publish-race retry). Installed by
  * `graft.GraftExtensions`; stock Spark would otherwise reject the
  * statement (V1 relations have no row-level-operation support).
  *
  * Deliberately MINIMAL surface — the canonical CDC-fold statement:
  *
  *   MERGE INTO t USING s ON t.k = s.k [AND t.k2 = s.k2 ...]
  *     [WHEN MATCHED AND <source-side cond> THEN DELETE]
  *     [WHEN MATCHED THEN UPDATE SET *]
  *     [WHEN NOT MATCHED THEN INSERT *]
  *
  * Anything the engine verb cannot express one-to-one fails LOUDLY at
  * analysis (unequal key names, target-referencing delete conditions,
  * per-column assignments that are not `SET *`, conditional
  * update/insert, NOT MATCHED BY SOURCE, update-before-delete clause
  * order) — a silent semantic drift from SQL MERGE would be far worse
  * than a clear unsupported-shape error naming the engine API.
  */
case class GraftMergeRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def unwrap(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => unwrap(c)
    case other => other
  }

  private def graftTarget(p: LogicalPlan): Option[GraftRelation] =
    unwrap(p) match {
      case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] =>
        Some(lr.relation.asInstanceOf[GraftRelation])
      case _ => None
    }

  /** Rewrites TARGET-column references by NAME: the command re-reads
    * the table at execution time with fresh attribute ids, so the
    * stored condition must re-resolve against that frame, not against
    * this statement's analysis ids.
    */
  private def byName(e: Expression): Expression = e.transform {
    case a: AttributeReference =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        .quoted(a.name)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case m: MergeIntoTable if m.resolved =>
        graftTarget(m.targetTable)
          .map(translate(m, _)).getOrElse(m)
      case d @ DeleteFromTable(target, condition) if d.resolved =>
        graftTarget(target).map { rel =>
          GraftDeleteCommand(rel.root, Shielded(byName(condition)))
            : LogicalPlan
        }.getOrElse(d)
      case u @ UpdateTable(target, assignments, condition)
          if u.resolved =>
        graftTarget(target).map { rel =>
          val sets = assignments.map { a =>
            a.key match {
              case k: AttributeReference => k.name -> Shielded(byName(a.value))
              case other => throw new UnsupportedOperationException(
                s"graft UPDATE supports plain column assignments: $other")
            }
          }
          GraftUpdateCommand(rel.root, sets,
            condition.map(c => Shielded(byName(c)))): LogicalPlan
        }.getOrElse(u)
    }

  private def fail(what: String): Nothing =
    throw new UnsupportedOperationException(
      "graft MERGE INTO supports ON same-name key equality, WHEN " +
        "MATCHED [AND <source cond>] THEN DELETE (first), WHEN " +
        "MATCHED THEN UPDATE SET *, WHEN NOT MATCHED THEN INSERT * — " +
        s"unsupported: $what (use VersionedTable.merge for richer " +
        "shapes)")

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def translate(m: MergeIntoTable,
      rel: GraftRelation): LogicalPlan = {
    val tgtOut = unwrap(m.targetTable).outputSet
    val srcOut = m.sourceTable.outputSet
    val keyCols = conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tgtOut.contains(a) && srcOut.contains(b) &&
            a.name.equalsIgnoreCase(b.name) => a.name
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if tgtOut.contains(a) && srcOut.contains(b) &&
            a.name.equalsIgnoreCase(b.name) => a.name
      case other => fail(s"ON conjunct $other")
    }
    // star-expanded assignments: every target column from the
    // same-name source column (possibly under a widening cast)
    def isStar(assigns: Seq[Assignment]): Boolean =
      assigns.forall { a =>
        val key = a.key match {
          case k: AttributeReference => k.name
          case _ => return false
        }
        def base(e: Expression): Expression = e match {
          case c: org.apache.spark.sql.catalyst.expressions.Cast =>
            base(c.child)
          case other => other
        }
        base(a.value) match {
          case v: AttributeReference =>
            srcOut.contains(v) && v.name.equalsIgnoreCase(key)
          case _ => false
        }
      }
    var updateMatched = false
    var deleteIf: Option[Expression] = None
    m.matchedActions.foreach {
      case DeleteAction(cond) =>
        if (deleteIf.isDefined) fail("two DELETE clauses")
        // SQL applies the FIRST matching clause in order; the engine
        // verb applies deleteIf before update — only the same order
        // translates faithfully
        if (updateMatched) fail("DELETE after UPDATE (clause order)")
        cond.foreach { c =>
          if (!c.references.subsetOf(srcOut))
            fail(s"DELETE condition referencing the target: $c")
        }
        deleteIf = Some(cond.getOrElse(Literal.TrueLiteral))
      case UpdateStarAction(None) => updateMatched = true
      case UpdateAction(None, assigns, _) if isStar(assigns) =>
        updateMatched = true
      case other => fail(s"WHEN MATCHED clause $other")
    }
    var insertUnmatched = false
    m.notMatchedActions.foreach {
      case InsertStarAction(None) => insertUnmatched = true
      case InsertAction(None, assigns) if isStar(assigns) =>
        insertUnmatched = true
      case other => fail(s"WHEN NOT MATCHED clause $other")
    }
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE")
    if (m.withSchemaEvolution) fail("WITH SCHEMA EVOLUTION")
    GraftMergeCommand(rel.root, m.sourceTable, keyCols, deleteIf,
      updateMatched, insertUnmatched)
  }
}

/** The executable node [[GraftMergeRule]] rewrites into: re-wraps the
  * already-resolved source plan as a DataFrame (same attribute ids,
  * so the stored delete condition re-binds exactly) and calls the
  * engine merge. The stored expressions are RESOLVED, keeping the
  * command analyzable as a leaf.
  */
case class GraftMergeCommand(root: String, source: LogicalPlan,
    keyCols: Seq[String], deleteIf: Option[Expression],
    updateMatched: Boolean, insertUnmatched: Boolean)
    extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val classicSession =
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val src =
      org.apache.spark.sql.classic.Dataset.ofRows(classicSession, source)
    val v = VersionedTable.merge(session, root, src, keyCols,
      deleteIf.map(ColumnBridge.column), updateMatched,
      insertUnmatched, tag = "sql-merge")
    Seq(Row(v))
  }

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version",
      org.apache.spark.sql.types.LongType, nullable = false)())
}

/** Holds a (possibly unresolved, name-rewritten) expression OUTSIDE
  * the query-plan tree walk: `QueryPlan.expressions` scans every
  * product field for `Expression`s, and a stored
  * `UnresolvedAttribute` would pin the whole command un-resolved
  * forever. The wrapper type is opaque to that scan; the command
  * re-resolves the expression against its own freshly-read frame.
  */
case class Shielded(e: Expression)

/** SQL `DELETE FROM <graft table> WHERE <cond>` — the engine's
  * copy-on-write predicate delete under the optimistic rewrite-retry
  * (key-scoped MoR erasure stays an API verb: SQL has no key-column
  * clause). An absent WHERE deletes everything, per the standard.
  */
case class GraftDeleteCommand(root: String, cond: Shielded)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val v = VersionedTable.deleteWhere(session, root,
      ColumnBridge.column(cond.e), tag = "sql-delete")
    Seq(Row(v))
  }
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version",
      org.apache.spark.sql.types.LongType, nullable = false)())
}

/** SQL `UPDATE <graft table> SET c = expr [, ...] [WHERE cond]` — a
  * copy-on-write rewrite: unmatched rows stream through untouched,
  * matched rows take the assignments (cast to the column's own type,
  * the standard UPDATE coercion), one commit under the optimistic
  * rewrite-retry.
  */
case class GraftUpdateCommand(root: String,
    sets: Seq[(String, Shielded)], cond: Option[Shielded])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val v = VersionedTable.updateWhere(session, root,
      sets.map { case (c, s) => c -> ColumnBridge.column(s.e) },
      cond.map(s => ColumnBridge.column(s.e)), tag = "sql-update")
    Seq(Row(v))
  }
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version",
      org.apache.spark.sql.types.LongType, nullable = false)())
}
