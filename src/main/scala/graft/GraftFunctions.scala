package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.registerTempFunction
import org.apache.spark.sql.types.IntegerType

import graft.llm.{DotDecimal, MinHashSlices, SimHashN, UnicodeNormalize}

/** SQL surface for the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT simhash32(text) ...")` works next to the Column API.
  *
  * Two activation paths, same builders:
  *   - cluster-wide: `--conf spark.sql.extensions=graft.GraftExtensions`
  *     (constructor injection via [[SparkSessionExtensions.injectFunction]],
  *     the supported plugin mechanism for third-party expression libraries);
  *   - per-session at runtime: [[GraftFunctions.register]].
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash32" -> {
      case Seq(c) => SimHashN(c, 32)
      case args => throw new IllegalArgumentException(
        s"simhash32(text) takes 1 argument, got ${args.length}")
    },
    "simhash64" -> {
      case Seq(c) => SimHashN(c, 64)
      case args => throw new IllegalArgumentException(
        s"simhash64(text) takes 1 argument, got ${args.length}")
    },
    "minhash_slices" -> {
      case Seq(c, k, n) =>
        MinHashSlices(c, intLit(k, "k"), intLit(n, "numHashes"))
      case args => throw new IllegalArgumentException(
        s"minhash_slices(text, k, numHashes) takes 3 arguments, got ${args.length}")
    },
    "dot_decimal" -> {
      case Seq(a, b) => DotDecimal(a, b)
      case args => throw new IllegalArgumentException(
        s"dot_decimal(a, b) takes 2 arguments, got ${args.length}")
    },
    "nfc_normalize" -> {
      case Seq(c) => UnicodeNormalize(c, nfkc = false)
      case args => throw new IllegalArgumentException(
        s"nfc_normalize(text) takes 1 argument, got ${args.length}")
    },
    "nfkc_normalize" -> {
      case Seq(c) => UnicodeNormalize(c, nfkc = true)
      case args => throw new IllegalArgumentException(
        s"nfkc_normalize(text) takes 1 argument, got ${args.length}")
    })

  /** Register all functions as temp functions on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      registerTempFunction(spark, name, builder)
    }
}

/** `spark.sql.extensions` entry point: the SQL function surface plus the
  * MERGE INTO planner strategy for commit-log tables (also installed
  * automatically when [[graft.sources.CommitLogCatalog]] initializes).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // DESCRIBE HISTORY / OPTIMIZE [ZORDER BY] / VACUUM [RETAIN] sugar —
    // rewrites to the CALL system.* procedures (plans/TableServiceSql.scala)
    e.injectParser((s, delegate) =>
      new graft.plans.TableServiceSqlParser(s, delegate))
    e.injectPlannerStrategy(_ => graft.plans.MergeIntoCommitLogStrategy)
    e.injectPlannerStrategy(_ => graft.plans.UpdateCommitLogStrategy)
    e.injectPlannerStrategy(_ => graft.plans.DeleteFromCommitLogStrategy)
    // Hints batch — BEFORE ResolveSessionCatalog can refuse view DDL on
    // a non-session catalog (see plans/ViewSql.scala)
    e.injectHintResolutionRule(s => new graft.plans.ResolveCommitLogViews(s))
    // table-read CDF (spark.read.option("readChangeFeed", true)
    // .table(...)) — relation swap onto the CDF table, Delta-style
    // (plans/CdfRelation.scala)
    e.injectResolutionRule(s => new graft.plans.ResolveCommitLogCdfRelation(s))
    // per-micro-batch: Spark builds streaming scans with no pushdown
    // pass (see plans/StreamScanPushdown.scala)
    e.injectOptimizerRule(s => new graft.plans.PushFiltersIntoCommitLogStream(s))
    // Delta's table_changes TVF (see plans/TableChanges.scala)
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("commitlog_table_changes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        graft.plans.CommitLogTableChanges.getClass.getCanonicalName,
        "commitlog_table_changes"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.plans.CommitLogTableChanges.build(args)))
  }
}
