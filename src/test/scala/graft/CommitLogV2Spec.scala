package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.CommitLogTable

/** The DataSource-V2 read path over the commit-log table format
  * (`sources/CommitLogV2.scala`): `spark.read.format("commitlog")` must
  * equal the table's own `read()` on every snapshot shape — evolution,
  * renames, merge-on-read delete marks, time travel — while a natural
  * `.filter(...)` prunes files through the manifest stats automatically
  * (the behavior `readRange` provides explicitly, and Delta readers get
  * from `spark.read.table`).
  */
class CommitLogV2Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-commitlog-v2-spec").toString

  /** 8 clustered files with disjoint k ranges, then rename + evolution:
    * the table every test reads.
    */
  private def buildTable(dir: String): CommitLogTable = {
    val df = spark.range(800).select($"id".as("k"),
      concat(lit("s"), ($"id" % 5).cast("string")).as("cat"),
      ($"id" * 1.0).as("v"))
    val t = CommitLogTable.create(spark, dir, df.schema)
    t.append(df.repartitionByRange(8, $"k").sortWithinPartitions("k"),
      recordChanges = false)
    t.renameColumn("v", "amount")
    t.append(Seq((9001L, "s9", 42.0, "x")).toDF("k", "cat", "amount", "tag"),
      mergeSchema = true)
    t
  }

  test("DSv2 read parity across rename + evolution; filter prunes files via manifest stats") {
    val dir = tmpDir()
    val t = buildTable(dir)
    val v2 = spark.read.format("commitlog").load(dir)
    assert(v2.schema.fieldNames.toSeq == Seq("k", "cat", "amount", "tag"))
    // full parity with the native reader (sorted collect — file order is
    // not part of the contract)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "cat", "amount", "tag").orderBy("k").collect().toSeq
    assert(key(v2) == key(t.read()))
    // a natural filter prunes: k ∈ [700, 800) lives in ONE of the 9 files
    val q = v2.filter($"k" >= 700 && $"k" < 800).select("k", "amount")
    assert(q.agg(sum("amount")).head.getDouble(0) ==
      (700 until 800).map(_.toDouble).sum)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("files=1/9"),
      s"expected stats pruning to 1 of 9 files in plan:\n$plan")
    assert(plan.contains("PushedFilters: [GreaterThanOrEqual(k,700)"),
      s"pushed filters missing from plan:\n$plan")
    // unprovable predicate shapes read everything — and still compute
    // correctly (pruning is only ever an optimization)
    val orQ = v2.filter($"k" < 10 || $"k" >= 790)
    assert(orQ.count() == 21) // 0..9, 790..799, 9001
    assert(orQ.queryExecution.executedPlan.toString.contains("files=9/9"))
  }

  test("DSv2 honors merge-on-read delete marks, including under column pruning") {
    val dir = tmpDir()
    val t = buildTable(dir)
    t.deleteLazy("amount < 100")
    val v2 = spark.read.format("commitlog").load(dir)
    assert(v2.count() == t.read().count())
    // mark references `amount`; this projection does NOT — the reader
    // must widen its read schema internally and project back down
    assert(v2.select("k").count() == t.read().count())
    assert(v2.filter($"k" < 200).count() == 100) // 100..199 survive
  }

  test("DSv2 time travel via versionAsOf matches read(version); vacuumed pins fail fast") {
    val dir = tmpDir()
    val t = buildTable(dir)
    val v1 = spark.read.format("commitlog").option("versionAsOf", 1).load(dir)
    assert(v1.schema.fieldNames.toSeq == Seq("k", "cat", "v")) // pre-rename
    assert(v1.count() == 800)
    assert(spark.read.format("commitlog").option("versionAsOf", 3).load(dir)
      .count() == 801)
  }
}
