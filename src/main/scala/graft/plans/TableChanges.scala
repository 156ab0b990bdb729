package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier

import graft.tables.CommitLogTable

/** `commitlog_table_changes(table_or_path[, startingVersion[,
  * endingVersion]])` — the Change Data Feed as a SQL table-valued
  * function, Delta's `table_changes('t', 2)` surface
  * (what the reference's CDF consumers query in SQL):
  *
  * {{{
  *   SELECT * FROM commitlog_table_changes('cat.ns.t', 2)
  *   SELECT * FROM commitlog_table_changes('/path/to/table', 2, 5)
  * }}}
  *
  * The first argument is a commitlog CATALOG name (`cat.ns.t`, resolved
  * through the session's catalog manager) or a filesystem path (anything
  * containing '/'). Versions default to `1 .. latest`. Registered via
  * `SparkSessionExtensions.injectTableFunction` (GraftExtensions); the
  * builder runs at analysis and splices in the change relation —
  * `_change_type` / `_commit_version`-tagged rows under current logical
  * column names, the same frame [[CommitLogTable.readChanges]] serves.
  */
object CommitLogTableChanges {

  def build(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.size <= 3,
      "commitlog_table_changes(table_or_path[, startingVersion[, endingVersion]])")
    def lit(e: Expression, what: String): Any = {
      require(e.foldable,
        s"commitlog_table_changes: $what must be a literal")
      val v = e.eval()
      require(v != null, s"commitlog_table_changes: $what must not be NULL")
      v
    }
    val spark = SparkSession.active
    val name = lit(args.head, "table").toString
    val dir =
      if (name.contains("/")) name
      else {
        val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(name)
        require(parts.length >= 2, "commitlog_table_changes: qualify the " +
          s"table as catalog.ns.table (got '$name') or pass a path")
        spark.sessionState.catalogManager.catalog(parts.head) match {
          case c: graft.sources.CommitLogCatalog =>
            c.tableDir(Identifier.of(
              parts.slice(1, parts.length - 1).toArray, parts.last))
          case other => throw new IllegalArgumentException(
            s"commitlog_table_changes: '${parts.head}' is not a commitlog " +
              s"catalog (got ${other.getClass.getName})")
        }
      }
    val t = CommitLogTable.open(spark, dir)
    val from = args.lift(1)
      .map(e => lit(e, "startingVersion").toString.toLong).getOrElse(1L)
    val to = args.lift(2)
      .map(e => lit(e, "endingVersion").toString.toLong)
      .getOrElse(t.latestVersion)
    t.readChanges(from, to).queryExecution.analyzed
  }
}
