package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.PredicateHelper
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.StreamingDataSourceV2ScanRelation
import org.apache.spark.sql.graftbridge

import graft.sources.CommitLogScan

/** Filter pushdown for STREAMING commitlog scans.
  *
  * Spark's `V2ScanRelationPushDown` rewrites only the batch
  * `DataSourceV2Relation`; streaming scans are built at stream start
  * with NO pushdown pass, so `readStream.table(t).where(cond)` reads
  * every file each micro-batch admits and filters rows afterwards. At
  * 100 TB that is the difference between a silver stream reading the
  * one partition it asked for and reading the whole bronze increment.
  *
  * The incremental optimizer runs injected rules per micro-batch, so
  * this rule sees each batch's plan: for a Filter sitting on a
  * commitlog streaming scan (the standard `PushDownPredicates` batch
  * has already pushed it through intervening operators), it translates
  * the V1-expressible conjuncts and hands them to the scan, which
  * stats-prunes that batch's file list before planning splits
  * ([[CommitLogScan.planStreamPartitions]]). The plan itself is
  * returned UNCHANGED — the Filter stays, Spark still evaluates the
  * full predicate row-by-row, and pruning is purely an optimization
  * (the same soundness rule as every other stats-skipping path).
  */
class PushFiltersIntoCommitLogStream(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case Filter(cond, r: StreamingDataSourceV2ScanRelation) =>
        r.scan match {
          case s: CommitLogScan =>
            s.setStreamFilters(splitConjunctivePredicates(cond)
              .flatMap(graftbridge.translateFilterV1))
          case _ => ()
        }
      case _ => ()
    }
    plan
  }
}
