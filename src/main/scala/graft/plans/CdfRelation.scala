package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{CommitLogCatalogTable, CommitLogCdfTable}

/** Delta's table-read CDF spelling for commit-log CATALOG tables:
  *
  * {{{
  *   spark.read.option("readChangeFeed", true).table("cat.ns.t")
  *     [.option("startingVersion", a)][.option("endingVersion", b)]
  *   spark.readStream.option("readChangeFeed", true).table("cat.ns.t")
  * }}}
  *
  * The catalog resolves the table under its DATA schema before the
  * options are consulted, so a relation-level swap is the only place
  * the change columns can enter the plan — the same move Delta's
  * `DeltaAnalysis` makes. This rule (in the main Resolution batch, so
  * it sees the RESOLVED relations) replaces the data relation with one
  * over [[CommitLogCdfTable]] (schema = data + `_change_type` +
  * `_commit_version`), batch and streaming alike; a time-travel pin
  * carries over as the batch range's default ending bound. Everything
  * downstream — range options, version-atomic streaming admission,
  * per-file `_commit_version` backfill — is the ONE CDF code path the
  * format read uses.
  */
final class ResolveCommitLogCdfRelation(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def wantsCdf(o: CaseInsensitiveStringMap): Boolean =
    o.getBoolean("readChangeFeed", false)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if wantsCdf(r.options) &&
          r.table.isInstanceOf[CommitLogCatalogTable] =>
        val t = r.table.asInstanceOf[CommitLogCatalogTable]
        DataSourceV2Relation.create(
          new CommitLogCdfTable(spark, t.tableDir, t.pinnedVersion),
          r.catalog, r.identifier, r.options)
      case s: StreamingRelationV2 if wantsCdf(s.extraOptions) &&
          s.table.isInstanceOf[CommitLogCatalogTable] =>
        val t = s.table.asInstanceOf[CommitLogCatalogTable]
        val cdf = new CommitLogCdfTable(spark, t.tableDir)
        s.copy(table = cdf,
          output = DataTypeUtils.toAttributes(cdf.schema()))
    }
}
