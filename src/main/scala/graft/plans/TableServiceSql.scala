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
  *   RESTORE [TABLE] cat.ns.t [TO] TIMESTAMP AS OF '2026-08-14 12:00:00'
  *   CREATE TABLE cat.ns.tgt SHALLOW CLONE cat.ns.src [VERSION AS OF 3]
  *   CONVERT TO COMMITLOG parquet.`/path/to/dump` [PARTITIONED BY (day)]
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
    // a regex-extracted SQL fragment must actually PARSE before it is
    // trusted: a partition predicate containing the literal text
    // 'zorder by' (or an unbalanced quote/paren) mis-splits the groups,
    // and rewriting the garbage would run the service with a mangled
    // predicate — validate, then retry the WHERE-only reading, then
    // give the statement back to the stock parser's own error
    def parses(e: String): Boolean =
      e.nonEmpty && (try { delegate.parseExpression(e); true }
        catch { case _: Exception => false })
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
    val restoreTs = RestoreTsRe.matcher(sqlText)
    if (restoreTs.matches()) return target(restoreTs.group(1)).map { case (c, t) =>
      s"CALL `$c`.system.restore(table => ${quoted(t)}, " +
        s"timestamp => ${quoted(restoreTs.group(2))})" }
    val clone = CloneRe.matcher(sqlText)
    if (clone.matches()) {
      // target and source must land in the SAME commitlog catalog — a
      // cross-catalog clone falls through to the stock parser's error
      return (target(clone.group(1)), target(clone.group(2))) match {
        case (Some((c1, tgt)), Some((c2, src))) if c1 == c2 =>
          Some(s"CALL `$c1`.system.clone(table => ${quoted(src)}, " +
            s"target => ${quoted(tgt)}" +
            Option(clone.group(3)).map(v => s", version => $v")
              .getOrElse("") + ")")
        case _ => None
      }
    }
    val convert = ConvertRe.matcher(sqlText)
    if (convert.matches()) {
      // CONVERT names a PATH, not an identifier: route to the CURRENT
      // catalog when it is a commitlog one
      val current = session.sessionState.catalogManager.currentCatalog
      if (current.isInstanceOf[CommitLogCatalog]) {
        val source = convert.group(1).toLowerCase(java.util.Locale.ROOT)
        val cols = Option(convert.group(3)).map(
          _.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty).mkString(","))
        // a delta adoption takes its partition columns from the log —
        // a PARTITIONED BY clause there is a contradiction, not ours
        // to guess at; let the stock parser produce the error
        if (source == "delta" && cols.isDefined) return None
        return Some(s"CALL `${current.name()}`.system.convert(" +
          s"path => ${quoted(convert.group(2))}" +
          (if (source != "parquet") s", source => ${quoted(source)}" else "") +
          cols.map(cs => s", partition_cols => ${quoted(cs)}").getOrElse("") +
          Option(convert.group(4)).map(v => s", version => $v")
            .getOrElse("") + ")")
      }
      return None
    }
    val optimize = OptimizeRe.matcher(sqlText)
    if (optimize.matches()) {
      val where = Option(optimize.group(2)).map(_.trim)
      // validate the RAW tokens (backticks intact — `2col` parses as an
      // attribute, its stripped form does not), then normalize
      // "(a, b)" / "a, b" to the procedure's 'a,b' form
      val zorderRaw = Option(optimize.group(3))
        .map(_.split(',').map(_.trim).toSeq)
      val zorder = zorderRaw.map(
        _.map(_.stripPrefix("`").stripSuffix("`")).mkString(","))
      val wellSplit = where.forall(parses) &&
        zorderRaw.forall(_.forall(parses))
      if (wellSplit)
        return target(optimize.group(1)).map { case (c, t) =>
          s"CALL `$c`.system.optimize(table => ${quoted(t)}" +
            where.map(w => s", where => ${quoted(w)}").getOrElse("") +
            zorder.map(z => s", zorder_by => ${quoted(z)}").getOrElse("") + ")"
        }
      // mis-split (e.g. 'ZORDER BY' inside a string literal): the whole
      // remainder may be one valid WHERE predicate
      val whereOnly = OptimizeWhereOnlyRe.matcher(sqlText)
      if (whereOnly.matches() &&
          Option(whereOnly.group(2)).map(_.trim).forall(parses))
        return target(whereOnly.group(1)).map { case (c, t) =>
          s"CALL `$c`.system.optimize(table => ${quoted(t)}" +
            Option(whereOnly.group(2)).map(w =>
              s", where => ${quoted(w.trim)}").getOrElse("") + ")"
        }
      return None
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
  val RestoreTsRe: Pattern = re(
    s"""\\s*RESTORE\\s+(?:TABLE\\s+)?$Ident\\s+(?:TO\\s+)?TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*""")
  // Delta's `CREATE TABLE tgt SHALLOW CLONE src [VERSION AS OF n]`
  val CloneRe: Pattern = re(
    s"""\\s*CREATE\\s+TABLE\\s+$Ident\\s+SHALLOW\\s+CLONE\\s+$Ident""" +
      """(?:\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""")
  // Delta's `CONVERT TO DELTA parquet.`/path``, commitlog-spelled; the
  // delta source adopts an existing Delta table via its log (optionally
  // at a pinned version) — partition columns come from the log, so
  // PARTITIONED BY applies to the parquet source only
  val ConvertRe: Pattern = re(
    """\s*CONVERT\s+TO\s+COMMITLOG\s+(parquet|delta)\s*\.\s*`([^`]+)`""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^()]*)\))?""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""")
  val OptimizeRe: Pattern = re(
    s"""\\s*OPTIMIZE\\s+$Ident(?:\\s+WHERE\\s+(.+?))?""" +
      """(?:\s+ZORDER\s+BY\s+\(?([^()]+?)\)?)?\s*;?\s*""")
  // the no-ZORDER reading of the same statement, for predicates whose
  // TEXT contains 'zorder by' (mis-split repair — see rewrite())
  val OptimizeWhereOnlyRe: Pattern = re(
    s"""\\s*OPTIMIZE\\s+$Ident(?:\\s+WHERE\\s+(.+?))?\\s*;?\\s*""")
  val VacuumRe: Pattern = re(
    s"""\\s*VACUUM\\s+$Ident(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS?)?\\s*;?\\s*""")
}
