package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge

import graft.sources.CommitLogV2Table
import graft.tables.CommitLogTable

/** `MERGE INTO` SQL over commit-log catalog tables.
  *
  * Spark 4 plans a resolved [[MergeIntoTable]] only for connectors
  * implementing the row-level-operation API; for everything else the
  * planner throws "MERGE INTO TABLE is not supported temporarily"
  * (`SparkStrategies.BasicOperators`). This strategy runs BEFORE the
  * built-ins (injected strategies always do), recognizes a commit-log
  * target, and hands the fully-resolved clause tree to
  * [[CommitLogTable.mergeInto]] — one transactional commit with CDF,
  * exactly Delta's `MergeIntoCommand` architecture (a command node
  * executing the engine primitive, not a row-level rewrite).
  *
  * Installed two ways, same object: `spark.sql.extensions=
  * graft.GraftExtensions` (cluster-wide), or automatically by
  * [[graft.sources.CommitLogCatalog]] when the catalog initializes —
  * so `MERGE INTO cat.ns.t` works with no extra setup.
  *
  * Reference: docs/databricks_setup.md:170-198 (the documented Silver
  * `MERGE INTO ... WHEN MATCHED ... WHEN NOT MATCHED`).
  */
object MergeIntoCommitLogStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case m @ MergeIntoTable(target, source, cond,
        matchedA, notMatchedA, bySourceA, withSchemaEvolution)
        if m.resolved =>
      unwrap(target) match {
        case Some((tbl, attrs)) =>
          if (withSchemaEvolution) throw new UnsupportedOperationException(
            "MERGE INTO commitlog: WITH SCHEMA EVOLUTION is not supported")
          // capture the PLANNING session: execution may happen on a
          // thread where a different (cloned) session is active
          Seq(MergeIntoCommitLogExec(SparkSession.active, tbl.tableDir,
            source, attrs, cond, matchedA, notMatchedA, bySourceA))
        case None => Nil // not ours — fall through to the stock planner
      }
    case _ => Nil
  }

  /** The planner sees the OPTIMIZED plan: aliases eliminated and the
    * relation already converted to a scan relation — match both forms.
    * (Shared with [[UpdateCommitLogStrategy]], which targets the same
    * relation shapes.)
    */
  private[plans] def unwrapTarget(
      p: LogicalPlan): Option[(CommitLogV2Table, Seq[Attribute])] = unwrap(p)

  private def unwrap(p: LogicalPlan): Option[(CommitLogV2Table, Seq[Attribute])] =
    p match {
      case SubqueryAlias(_, child) => unwrap(child)
      case r: DataSourceV2Relation => r.table match {
        case t: CommitLogV2Table => Some((t, r.output))
        case _ => None
      }
      case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        s.relation.table match {
          case t: CommitLogV2Table => Some((t, s.output))
          case _ => None
        }
      case _ => None
    }
}

/** Eagerly-executed command node (the `V2CommandExec` pattern): the
  * merge commits once, on whichever of `executeCollect`/`doExecute`
  * Spark's eager-command execution invokes first.
  */
final case class MergeIntoCommitLogExec(spark: SparkSession, dir: String,
    source: LogicalPlan, targetAttrs: Seq[Attribute], cond: Expression,
    matchedA: Seq[MergeAction], notMatchedA: Seq[MergeAction],
    bySourceA: Seq[MergeAction]) extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  private lazy val done: Unit = runMerge(spark)

  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
  override protected def doExecute(): RDD[InternalRow] = {
    done; sparkContext.emptyRDD
  }

  /** Rebind the analyzed clause tree onto [[CommitLogTable.mergeInto]]'s
    * Column convention: every attribute of the TARGET relation becomes
    * `t.<name>`, every attribute of the SOURCE plan `s.<name>` —
    * exprId-exact, so shared column names never cross wires.
    */
  private def runMerge(spark: SparkSession): Unit = {
    val tIds = targetAttrs.map(_.exprId).toSet
    val sIds = source.output.map(_.exprId).toSet
    def toCol(e: Expression): Column = graftbridge.toColumn(e.transform {
      case a: AttributeReference if tIds.contains(a.exprId) =>
        UnresolvedAttribute(Seq("t", a.name))
      case a: AttributeReference if sIds.contains(a.exprId) =>
        UnresolvedAttribute(Seq("s", a.name))
    })
    def assigns(as: Seq[Assignment], what: String): Map[String, Column] =
      as.map { a =>
        a.key match {
          case ar: AttributeReference => ar.name -> toCol(a.value)
          case other => throw new UnsupportedOperationException(
            s"MERGE INTO commitlog: $what supports only top-level target " +
              s"columns, got $other")
        }
      }.toMap
    val matched = matchedA.map {
      case UpdateAction(c, as, _) =>
        CommitLogTable.MatchedUpdate(c.map(toCol), assigns(as, "UPDATE SET"))
      case DeleteAction(c) => CommitLogTable.MatchedDelete(c.map(toCol))
      case other => throw new UnsupportedOperationException(
        s"MERGE INTO commitlog: unsupported WHEN MATCHED action $other")
    }
    val notMatched = notMatchedA.map {
      case InsertAction(c, as) =>
        CommitLogTable.NotMatchedInsert(c.map(toCol), assigns(as, "INSERT"))
      case other => throw new UnsupportedOperationException(
        s"MERGE INTO commitlog: unsupported WHEN NOT MATCHED action $other")
    }
    val bySource = bySourceA.map {
      case UpdateAction(c, as, _) =>
        CommitLogTable.BySourceUpdate(c.map(toCol), assigns(as, "UPDATE SET"))
      case DeleteAction(c) => CommitLogTable.BySourceDelete(c.map(toCol))
      case other => throw new UnsupportedOperationException(
        s"MERGE INTO commitlog: unsupported WHEN NOT MATCHED BY SOURCE " +
          s"action $other")
    }
    val sourceDf = graftbridge.ofRows(spark, source)
    CommitLogTable.open(spark, dir)
      .mergeInto(sourceDf, toCol(cond), matched, notMatched, bySource)
  }
}
