package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, UpdateTable}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge

import graft.tables.CommitLogTable

/** `UPDATE <table> SET … [WHERE …]` SQL over commit-log catalog tables.
  *
  * Same architecture as [[MergeIntoCommitLogStrategy]]: Spark 4 plans a
  * resolved [[UpdateTable]] only for connectors implementing the
  * row-level-operation API ("UPDATE TABLE is not supported temporarily"
  * otherwise), so this strategy runs before the built-ins, recognizes a
  * commit-log target, and hands the clause tree to
  * [[CommitLogTable.update]] — one transactional copy-on-write commit
  * with file-stat pruning (provably-unaffected files carry by
  * reference) and CDF pre/post images. Completes the SQL DML triad next
  * to `DELETE FROM` (SupportsDelete) and `MERGE INTO` (strategy).
  *
  * Reference: the `UPDATE bronze SET … WHERE …` surface Delta gives the
  * reference's tables (docs/databricks_setup.md).
  */
object UpdateCommitLogStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // subquery conditions/values are excluded (like DeleteFromCommitLog):
    // Expression.transform does not descend into a subquery's plan, so the
    // rebind would leave stale exprIds inside it — let such statements
    // fall through to Spark's clean unsupported-statement refusal
    case u @ UpdateTable(target, assignments, condition)
        if u.resolved &&
          !condition.exists(SubqueryExpression.hasSubquery) &&
          !assignments.exists(a => SubqueryExpression.hasSubquery(a.value)) =>
      MergeIntoCommitLogStrategy.unwrapTarget(target) match {
        case Some((tbl, attrs)) =>
          Seq(UpdateCommitLogExec(SparkSession.active, tbl.tableDir,
            attrs, assignments, condition))
        case None => Nil // not ours — fall through to the stock planner
      }
    case _ => Nil
  }
}

/** Eagerly-executed command node: the update commits once, on whichever
  * of `executeCollect`/`doExecute` Spark's eager-command execution
  * invokes first.
  */
final case class UpdateCommitLogExec(spark: SparkSession, dir: String,
    targetAttrs: Seq[Attribute], assignments: Seq[Assignment],
    condition: Option[Expression]) extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  private lazy val done: Unit = runUpdate(spark)

  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
  override protected def doExecute(): RDD[InternalRow] = {
    done; sparkContext.emptyRDD
  }

  /** Rebind the analyzed expressions onto [[CommitLogTable.update]]'s
    * Column convention: every target attribute becomes a bare
    * `UnresolvedAttribute(name)` resolved against the table scan
    * (exprId-exact, so an `UPDATE t AS x` alias never matters).
    */
  private def runUpdate(spark: SparkSession): Unit = {
    val tIds = targetAttrs.map(_.exprId).toSet
    def toCol(e: Expression): Column = graftbridge.toColumn(e.transform {
      case a: AttributeReference if tIds.contains(a.exprId) =>
        UnresolvedAttribute(Seq(a.name))
    })
    val set = assignments.map { a =>
      a.key match {
        case ar: AttributeReference => ar.name -> toCol(a.value)
        case other => throw new UnsupportedOperationException(
          "UPDATE commitlog: SET supports only top-level target columns, " +
            s"got $other")
      }
    }.toMap
    CommitLogTable.open(spark, dir)
      .update(condition.map(toCol).getOrElse(lit(true)), set)
  }
}
