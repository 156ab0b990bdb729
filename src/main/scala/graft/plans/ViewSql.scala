package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, Project, RenameTable, SetViewProperties, ShowViews, SubqueryAlias, UnsetViewProperties}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge

import graft.sources.CommitLogCatalog

/** SQL views on [[CommitLogCatalog]] — the reference's gold layer DDL
  * (`CREATE OR REPLACE VIEW stock_pipeline.gold.price_features AS …`,
  * docs/databricks_setup.md:209).
  *
  * Spark 4.1 ships the `ViewCatalog` connector API but no analyzer
  * wiring for it: `ResolveSessionCatalog` hard-refuses every view
  * command aimed at a non-session catalog ("MISSING_CATALOG_ABILITY"),
  * and relation resolution never consults a ViewCatalog. So — exactly
  * like Iceberg's view extension — this rule runs in the HINTS batch
  * (before Resolution can throw), recognizes view plans whose catalog
  * is a [[CommitLogCatalog]], and rewrites them onto the catalog's
  * ViewCatalog implementation: CREATE [OR REPLACE] VIEW [IF NOT
  * EXISTS], DROP VIEW, SHOW VIEWS, ALTER VIEW SET/UNSET TBLPROPERTIES,
  * ALTER VIEW RENAME, and — the read path — a table reference that
  * names a stored view expands to its re-parsed, freshly-analyzed
  * definition (late-binding semantics: the view always sees the live
  * table, nested views expand recursively with a depth guard).
  *
  * Installed via `spark.sql.extensions=graft.GraftExtensions` (analyzer
  * rules cannot be injected after session construction, unlike the
  * planner strategies the catalog self-installs).
  */
final class ResolveCommitLogViews(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def catalogOf(name: String): Option[CommitLogCatalog] =
    // conf pre-check first: this rule sees EVERY multi-part relation in
    // every query, and exception-driven catalogManager.catalog lookups
    // on plain `db.table` names would tax all workloads
    if (spark.conf.getOption(s"spark.sql.catalog.$name").isEmpty) None
    else try spark.sessionState.catalogManager.catalog(name) match {
      case c: CommitLogCatalog => Some(c)
      case _ => None
    } catch { case _: Exception => None } // unregisterable catalog

  private def split(parts: Seq[String]): Option[(CommitLogCatalog, Identifier)] =
    if (parts.length < 2) None
    else catalogOf(parts.head).map(c =>
      (c, Identifier.of(parts.slice(1, parts.length - 1).toArray, parts.last)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case c @ CreateView(UnresolvedIdentifier(parts, _), cols, comment, _,
          props, originalText, query, allowExisting, replace, _) =>
        split(parts) match {
          case Some((cat, ident)) =>
            val sql = originalText.getOrElse(
              throw new UnsupportedOperationException(
                "CREATE VIEW commitlog: missing original SQL text"))
            CreateCommitLogViewCommand(cat, ident, sql,
              cols.map(_._1), cols.map(_._2), comment, props,
              query, allowExisting, replace)
          case None => c
        }

      case d @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
        split(parts) match {
          case Some((cat, ident)) =>
            DropCommitLogViewCommand(cat, ident, ifExists)
          case None => d
        }

      case s @ ShowViews(UnresolvedNamespace(parts, _), pattern, output)
          if parts.nonEmpty && catalogOf(parts.head).isDefined =>
        ShowCommitLogViewsCommand(catalogOf(parts.head).get,
          parts.tail, pattern, output)

      case s @ SetViewProperties(UnresolvedView(parts, _, _, _), props) =>
        split(parts) match {
          case Some((cat, ident)) =>
            AlterCommitLogViewPropsCommand(cat, ident, set = props,
              unset = Nil, unsetIfExists = true)
          case None => s
        }

      case u @ UnsetViewProperties(UnresolvedView(parts, _, _, _), keys,
          ifExists) =>
        split(parts) match {
          case Some((cat, ident)) =>
            AlterCommitLogViewPropsCommand(cat, ident, set = Map.empty,
              unset = keys, unsetIfExists = ifExists)
          case None => u
        }

      case r @ RenameTable(u: UnresolvedTableOrView, newName, true) =>
        split(u.multipartIdentifier) match {
          case Some((cat, ident)) if cat.viewExists(ident) =>
            // RENAME TO takes a bare or qualified name; resolve it into
            // the SAME catalog. A name prefixed with a DIFFERENT
            // catalog is refused loudly — falling through would write
            // the file under a bogus nested namespace in this catalog.
            val target = newName match {
              case Seq(one) => Identifier.of(ident.namespace(), one)
              case head +: rest if catalogOf(head).contains(cat) =>
                Identifier.of(rest.dropRight(1).toArray, rest.last)
              case head +: _ if spark.conf.getOption(
                    s"spark.sql.catalog.$head").isDefined ||
                  head == "spark_catalog" =>
                // conf-registered catalogs AND the always-present
                // session catalog (never conf-registered, the
                // CatalogManager.SESSION_CATALOG_NAME constant —
                // private[sql]) both refuse
                throw new UnsupportedOperationException(
                  s"ALTER VIEW RENAME across catalogs is not supported " +
                    s"(from ${u.multipartIdentifier.mkString(".")} " +
                    s"to ${newName.mkString(".")})")
              case other =>
                // a head that names NO catalog is almost always a typo'd
                // catalog, and treating it as a namespace would silently
                // land the view under a bogus nested namespace here — the
                // exact misplacement the branch above guards against.
                // Namespace moves stay expressible as <thisCatalog>.ns.v.
                throw new UnsupportedOperationException(
                  s"ALTER VIEW RENAME target ${other.mkString(".")}: " +
                    s"'${other.head}' is not a registered catalog; to move " +
                    s"the view to a namespace of this catalog, qualify it " +
                    s"as ${cat.name()}.${other.mkString(".")}")
            }
            RenameCommitLogViewCommand(cat, ident, target)
          case _ => r
        }

      // the READ path: a relation naming a stored view expands to its
      // definition, re-parsed and analyzed fresh (late binding)
      case u: UnresolvedRelation if !u.isStreaming =>
        split(u.multipartIdentifier) match {
          case Some((cat, ident)) if cat.viewExists(ident) =>
            CommitLogViewExpansion.expand(spark, cat, ident,
              u.multipartIdentifier)
          case _ => u
        }
    }
}

private object CommitLogViewExpansion {
  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }
  private val MaxDepth = 16

  def expand(spark: SparkSession, cat: CommitLogCatalog, ident: Identifier,
      parts: Seq[String]): LogicalPlan = {
    if (depth.get() >= MaxDepth)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3101",
        messageParameters = Map("msg" ->
          s"view ${parts.mkString(".")}: cyclic or >$MaxDepth-deep view nesting"))
    val v = cat.loadView(ident)
    // Unqualified names in the stored text must resolve in the DEFINING
    // session's catalog/namespace context (persisted at CREATE VIEW) —
    // not whatever the reading session's current database happens to
    // be, which would silently bind to a different table. The context
    // switch happens on a THROWAWAY CLONE of the session (same confs,
    // temp views, catalog registrations): mutating the live session's
    // CatalogManager would race a concurrent analysis on another thread
    // into resolving ITS unqualified names in the view's namespace.
    // Nested views (depth > 0) already run inside the clone's analyzer
    // — its rule instance binds the clone — so they set-and-restore on
    // that clone, which is single-threaded within this analysis.
    val nested = depth.get() > 0
    val target = if (nested) spark else graftbridge.cloneSession(spark)
    val cm = target.sessionState.catalogManager
    val (prevCat, prevNs) = (cm.currentCatalog.name(), cm.currentNamespace)
    depth.set(depth.get() + 1)
    val analyzed =
      try {
        // full nested analysis: CTEs in the view text get their own
        // Substitution pass, nested views re-enter this expansion
        val parsed = target.sessionState.sqlParser.parsePlan(v.query())
        if (v.currentCatalog() != null) cm.setCurrentCatalog(v.currentCatalog())
        if (v.currentNamespace() != null && v.currentNamespace().nonEmpty)
          cm.setCurrentNamespace(v.currentNamespace())
        graftbridge.ofRows(target, parsed).queryExecution.analyzed
      } finally {
        depth.set(depth.get() - 1)
        if (nested) {
          // restore exactly (setCurrentCatalog alone no-ops when the
          // name is unchanged and would leak the namespace)
          cm.setCurrentCatalog(prevCat)
          if (prevNs != null) cm.setCurrentNamespace(prevNs)
        }
      }
    val aliases = v.columnAliases()
    val aliased =
      if (aliases == null || aliases.isEmpty) analyzed
      else {
        require(aliases.length == analyzed.output.length,
          s"view ${parts.mkString(".")}: ${aliases.length} column aliases " +
            s"for ${analyzed.output.length} columns")
        Project(analyzed.output.zip(aliases).map { case (a, n) =>
          Alias(a, n)()
        }, analyzed)
      }
    SubqueryAlias(parts.last, aliased)
  }
}

/** CREATE [OR REPLACE] VIEW [IF NOT EXISTS]: analyzes the body once for
  * the stored schema, persists the ORIGINAL SQL text plus the session's
  * catalog/namespace context through the ViewCatalog API.
  */
final case class CreateCommitLogViewCommand(cat: CommitLogCatalog,
    ident: Identifier, sql: String, colAliases: Seq[String],
    colComments: Seq[Option[String]], comment: Option[String],
    props: Map[String, String], query: LogicalPlan,
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    if (allowExisting && cat.viewExists(ident)) return Nil
    val analyzed = graftbridge.ofRows(spark, query).queryExecution.analyzed
    if (colAliases.nonEmpty)
      require(colAliases.length == analyzed.output.length,
        s"CREATE VIEW: ${colAliases.length} column names for " +
          s"${analyzed.output.length} query columns")
    val cm = spark.sessionState.catalogManager
    val allProps = props ++ comment.map(
      org.apache.spark.sql.connector.catalog.ViewCatalog.PROP_COMMENT -> _)
    import scala.jdk.CollectionConverters._
    val info = new ViewInfo(ident, sql, cm.currentCatalog.name(),
      cm.currentNamespace,
      org.apache.spark.sql.types.StructType(analyzed.schema.fields),
      analyzed.output.map(_.name).toArray,
      if (colAliases.isEmpty) null else colAliases.toArray,
      if (colComments.forall(_.isEmpty)) null
      else colComments.map(_.orNull).toArray,
      allProps.asJava)
    if (replace) cat.replaceView(info, true) else cat.createView(info)
    Nil
  }
}

final case class DropCommitLogViewCommand(cat: CommitLogCatalog,
    ident: Identifier, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (!cat.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Nil
  }
}

final case class ShowCommitLogViewsCommand(cat: CommitLogCatalog,
    namespace: Seq[String], pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val names = cat.listViews(namespace: _*).map(_.name()).toSeq
    val kept = pattern.map(p =>
      org.apache.spark.sql.catalyst.util.StringUtils
        .filterPattern(names, p)).getOrElse(names)
    kept.sorted.map(n => Row(namespace.mkString("."), n, false))
  }
}

final case class AlterCommitLogViewPropsCommand(cat: CommitLogCatalog,
    ident: Identifier, set: Map[String, String], unset: Seq[String],
    unsetIfExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val existing = cat.loadView(ident).properties()
    if (!unsetIfExists) unset.foreach(k =>
      require(existing.containsKey(k),
        s"ALTER VIEW: property '$k' not set on ${ident}"))
    val changes: Seq[ViewChange] =
      set.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) } ++
        unset.filter(existing.containsKey).map(ViewChange.removeProperty)
    if (changes.nonEmpty) cat.alterView(ident, changes: _*)
    Nil
  }
}

final case class RenameCommitLogViewCommand(cat: CommitLogCatalog,
    from: Identifier, to: Identifier) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    cat.renameView(from, to)
    Nil
  }
}
