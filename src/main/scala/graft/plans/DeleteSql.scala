package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge

import graft.tables.CommitLogTable

/** `DELETE FROM <table> WHERE <any predicate>` over commit-log catalog
  * tables.
  *
  * The SupportsDelete bridge (`CommitLogCatalogTable.deleteWhere`)
  * covers only predicates expressible as V1 `Filter`s — Spark refuses
  * the statement otherwise. This strategy intercepts the resolved
  * [[DeleteFromTable]] first and hands the CONDITION EXPRESSION itself
  * to [[CommitLogTable.delete]], so any deterministic predicate
  * (arithmetic, functions, CASE …) deletes transactionally with the
  * same file-stat pruning and CDF delete images. Subquery conditions
  * fall through to the stock planner (a Column cannot re-host an
  * analyzed subquery), which reports them unsupported — unchanged
  * behavior, never silent.
  */
object DeleteFromCommitLogStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case d @ DeleteFromTable(target, condition) if d.resolved &&
        !SubqueryExpression.hasSubquery(condition) =>
      MergeIntoCommitLogStrategy.unwrapTarget(target) match {
        case Some((tbl, attrs)) =>
          Seq(DeleteFromCommitLogExec(SparkSession.active, tbl.tableDir,
            attrs, condition))
        case None => Nil
      }
    case _ => Nil
  }
}

/** Eagerly-executed command node — same pattern as
  * [[UpdateCommitLogExec]].
  */
final case class DeleteFromCommitLogExec(spark: SparkSession, dir: String,
    targetAttrs: Seq[Attribute], condition: Expression)
    extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  private lazy val done: Unit = runDelete(spark)

  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
  override protected def doExecute(): RDD[InternalRow] = {
    done; sparkContext.emptyRDD
  }

  private def runDelete(spark: SparkSession): Unit = {
    val tIds = targetAttrs.map(_.exprId).toSet
    val cond: Column = graftbridge.toColumn(condition.transform {
      case a: AttributeReference if tIds.contains(a.exprId) =>
        UnresolvedAttribute(Seq(a.name))
    })
    CommitLogTable.open(spark, dir).delete(cond)
  }
}
