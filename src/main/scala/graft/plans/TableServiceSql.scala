package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.CommitLogCatalog

/** Databricks-flavored SQL sugar for the table services — the
  * statements the reference's runbooks actually type
  * (`docs/databricks_setup.md` OPTIMIZE/ZORDER;
  * `bronze_prices_auto_loader.ipynb` cell 4 DESCRIBE HISTORY):
  *
  * {{{
  *   DESCRIBE HISTORY cat.ns.t
  *   DESCRIBE DETAIL cat.ns.t
  *   OPTIMIZE cat.ns.t [WHERE <partition predicate>] [ZORDER BY (c1, c2)]
  *   VACUUM cat.ns.t [RETAIN 5 VERSIONS]
  *   RESTORE [TABLE] cat.ns.t [TO] VERSION AS OF 3
  * }}}
  *
  * Injected as a PARSER wrapper ([[graft.GraftExtensions]]): a matched
  * statement whose target lives in a commit-log catalog (explicit
  * `cat.` prefix, or the CURRENT catalog) is rewritten to the
  * equivalent `CALL cat.system.<proc>(…)` text and re-parsed by the
  * delegate — one surface, zero new plan nodes, the procedures keep
  * owning validation and execution. Anything else (unmatched text, a
  * non-commitlog target) parses through the stock parser unchanged, so
  * Spark's own errors surface verbatim. graft retention is
  * version-based, hence `RETAIN n VERSIONS` where Databricks writes
  * `RETAIN n HOURS`.
  *
  * Known shadowing, shared with Databricks' own statement: inside a
  * commitlog catalog, `DESCRIBE history day` parses as `DESCRIBE
  * HISTORY <table day>`, not as describe-column `day` of a table
  * literally named `history` — the HISTORY keyword wins, exactly as on
  * a Databricks cluster; qualify the table to describe it.
  */
final class TableServiceSqlParser(session: SparkSession,
    delegate: ParserInterface) extends ParserInterface {

  import TableServiceSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(rewrite(sqlText).getOrElse(sqlText))

  /** matched service statement → CALL text, None = not ours */
  private def rewrite(sqlText: String): Option[String] = {
    def target(ident: String): Option[(String, String)] = {
      // the delegate's identifier parser owns backticks/escapes
      val parts = delegate.parseMultipartIdentifier(ident)
      // the CALL procedures' table argument re-splits on '.', so a
      // quoted part containing one (`a.b`) cannot round-trip — fall
      // through to the stock parser's error rather than resolve a
      // DIFFERENT table
      if (parts.exists(_.contains('.'))) return None
      def confCatalog(cat: String): Option[String] =
        session.conf.getOption(s"spark.sql.catalog.$cat")
      def isCommitLog(cat: String): Boolean =
        confCatalog(cat).contains(classOf[CommitLogCatalog].getName)
      // a head that names ANY catalog decides the statement: commitlog →
      // ours; any other (spark_catalog, or a conf-registered
      // other-provider catalog) → NOT ours, even when the CURRENT
      // catalog is commitlog — hijacking an explicitly-qualified target
      // into the current catalog would run the service against the
      // wrong table
      if (parts.length >= 2 && isCommitLog(parts.head))
        Some((parts.head, parts.tail.mkString(".")))
      else if (parts.length >= 2 &&
          (parts.head == "spark_catalog" || confCatalog(parts.head).isDefined))
        None
      else {
        val current = session.sessionState.catalogManager.currentCatalog
        if (current.isInstanceOf[CommitLogCatalog])
          Some((current.name(), parts.mkString(".")))
        else None
      }
    }
    def quoted(s: String): String = "'" + s.replace("'", "''") + "'"
    val history = HistoryRe.matcher(sqlText)
    if (history.matches()) return target(history.group(1)).map { case (c, t) =>
      s"CALL `$c`.system.history(table => ${quoted(t)})" }
    val detail = DetailRe.matcher(sqlText)
    if (detail.matches()) return target(detail.group(1)).map { case (c, t) =>
      s"CALL `$c`.system.detail(table => ${quoted(t)})" }
    val restore = RestoreRe.matcher(sqlText)
    if (restore.matches()) return target(restore.group(1)).map { case (c, t) =>
      s"CALL `$c`.system.restore(table => ${quoted(t)}, " +
        s"version => ${restore.group(2)})" }
    val optimize = OptimizeRe.matcher(sqlText)
    if (optimize.matches()) return target(optimize.group(1)).map { case (c, t) =>
      val where = Option(optimize.group(2)).map(_.trim)
      // normalize "(a, b)" / "a, b" to the procedure's 'a,b' form
      val zorder = Option(optimize.group(3)).map(
        _.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
          .mkString(","))
      s"CALL `$c`.system.optimize(table => ${quoted(t)}" +
        where.map(w => s", where => ${quoted(w)}").getOrElse("") +
        zorder.map(z => s", zorder_by => ${quoted(z)}").getOrElse("") + ")"
    }
    val vacuum = VacuumRe.matcher(sqlText)
    if (vacuum.matches()) return target(vacuum.group(1)).map { case (c, t) =>
      s"CALL `$c`.system.vacuum(table => ${quoted(t)}" +
        Option(vacuum.group(2))
          .map(n => s", retain_versions => $n").getOrElse("") + ")"
    }
    None
  }

  override def parsePlanWithParameters(sqlText: String,
      parameters: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan =
    rewrite(sqlText) match {
      case Some(call) => delegate.parsePlan(call) // services take no params
      case None => delegate.parsePlanWithParameters(sqlText, parameters)
    }

  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

private object TableServiceSqlParser {
  // a (possibly backtick-quoted) multipart identifier
  private val Ident = """((?:[\w]+|`[^`]+`)(?:\s*\.\s*(?:[\w]+|`[^`]+`))*)"""
  private def re(p: String): Pattern =
    Pattern.compile(p, Pattern.CASE_INSENSITIVE | Pattern.DOTALL)

  val HistoryRe: Pattern =
    re(s"""\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$Ident\\s*;?\\s*""")
  val DetailRe: Pattern =
    re(s"""\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$Ident\\s*;?\\s*""")
  val RestoreRe: Pattern = re(
    s"""\\s*RESTORE\\s+(?:TABLE\\s+)?$Ident\\s+(?:TO\\s+)?VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""")
  val OptimizeRe: Pattern = re(
    s"""\\s*OPTIMIZE\\s+$Ident(?:\\s+WHERE\\s+(.+?))?""" +
      """(?:\s+ZORDER\s+BY\s+\(?([^()]+?)\)?)?\s*;?\s*""")
  val VacuumRe: Pattern = re(
    s"""\\s*VACUUM\\s+$Ident(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS?)?\\s*;?\\s*""")
}
