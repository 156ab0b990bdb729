package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.CommitLogTable

/** `MERGE INTO` SQL over commit-log catalog tables
  * (`plans/MergeIntoSql.scala` + `CommitLogTable.mergeInto`): every
  * clause kind lands in ONE transactional commit with CDF, ANSI
  * multi-match is rejected, a no-effect merge publishes nothing, and a
  * partition-equi ON condition bounds the rewrite to the source's
  * partitions. Reference: the documented Silver MERGE,
  * docs/databricks_setup.md:170-198.
  */
class MergeIntoSqlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val cat = s"graft_merge$n"
    val wh = Files.createTempDirectory("graft-merge-sql-spec").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.CommitLogCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("MERGE INTO: update/delete/insert/by-source clauses, ordered, one commit") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.t (k BIGINT, v BIGINT) USING commitlog")
    spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 10), (2, 20), (4, 40)")
    Seq((2L, 200L), (3L, 300L), (4L, 1L)).toDF("k", "v")
      .createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO $cat.default.t AS t USING merge_src AS s ON t.k = s.k
         |WHEN MATCHED AND s.v >= 100 THEN UPDATE SET *
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.v < 15
         |  THEN UPDATE SET v = t.v + 1000""".stripMargin)
    assert(spark.sql(s"SELECT * FROM $cat.default.t ORDER BY k")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 1010L), (2L, 200L), (3L, 300L)))
    // one commit: version 3 (create=0? create publishes v0, insert v1, merge v2)
    val t = CommitLogTable.open(spark, s"$wh/default/t")
    val hist = t.history.collect()
    assert(hist.count(_.getString(1) == "merge") == 1)
    // bookkeeping: 1 insert, 2 updates (one matched + one by-source), 1 delete
    val m = hist.find(_.getString(1) == "merge").get
    assert((m.getLong(2), m.getLong(3), m.getLong(4)) == ((1L, 2L, 1L)),
      m.toString)
    // CDF of the merge version carries all four image kinds
    val ver = m.getLong(0)
    val ch = t.readChanges(ver, ver)
      .select(col("_change_type"), col("k"), col("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(ch == Set(
      ("insert", 3L, 300L),
      ("update_preimage", 2L, 20L), ("update_postimage", 2L, 200L),
      ("update_preimage", 1L, 10L), ("update_postimage", 1L, 1010L),
      ("delete", 4L, 40L)))
  }

  test("MERGE INTO: ANSI cardinality — a target row matching two source rows errors") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.t (k BIGINT, v BIGINT) USING commitlog")
    spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 10)")
    Seq((1L, 100L), (1L, 101L)).toDF("k", "v")
      .createOrReplaceTempView("merge_dup_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $cat.default.t AS t USING merge_dup_src AS s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("matched multiple source rows")), e)
  }

  test("MERGE INTO: no-effect merge publishes no version") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.t (k BIGINT, v BIGINT) USING commitlog")
    spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 10)")
    val t = CommitLogTable.open(spark, s"$wh/default/t")
    val vBefore = t.history.collect().map(_.getLong(0)).max
    Seq((9L, 90L)).toDF("k", "v").createOrReplaceTempView("merge_noop_src")
    // only a matched clause, and nothing matches → nothing to do
    spark.sql(
      s"""MERGE INTO $cat.default.t AS t USING merge_noop_src AS s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(CommitLogTable.open(spark, s"$wh/default/t")
      .history.collect().map(_.getLong(0)).max == vBefore)
  }

  test("MERGE INTO: partition-equi ON bounds the rewrite to the source's partitions") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.t (day BIGINT, k BIGINT, v BIGINT) " +
      "USING commitlog PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.default.t " +
      "SELECT id % 8 AS day, id AS k, id AS v FROM range(0, 400)")
    val t = CommitLogTable.open(spark, s"$wh/default/t")
    val filesBefore = t.resolvedManifest(None).files
      .map(f => f.partitionKey -> f.path).toMap
    Seq((3L, 1003L, -1L)).toDF("day", "k", "v")
      .createOrReplaceTempView("merge_part_src")
    spark.sql(
      s"""MERGE INTO $cat.default.t AS t USING merge_part_src AS s
         |ON t.day = s.day AND t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = CommitLogTable.open(spark, s"$wh/default/t")
    val filesAfter = after.resolvedManifest(None).files
      .map(f => f.partitionKey -> f.path).toMap
    // every partition except day=3 carried its file BY REFERENCE
    filesBefore.foreach { case (p, path) =>
      if (p != "3") assert(filesAfter(p) == path, s"partition $p was rewritten")
      else assert(filesAfter(p) != path, "day=3 should have been rewritten")
    }
    assert(after.read().filter(col("k") === 1003L).count() == 1)
    assert(spark.table(s"$cat.default.t").count() == 401)
  }

  test("MERGE INTO: multi-match is legal while no update/delete pair fires") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.t (k BIGINT, v BIGINT) USING commitlog")
    spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 10)")
    val t = CommitLogTable.open(spark, s"$wh/default/t")
    val vBefore = t.history.collect().map(_.getLong(0)).max
    // two source rows match k=1, but the clause fires for NEITHER:
    // legal (no modification is ambiguous), the row stays single, and
    // nothing publishes
    Seq((1L, -5L), (1L, -6L)).toDF("k", "v")
      .createOrReplaceTempView("merge_mm_none")
    spark.sql(
      s"""MERGE INTO $cat.default.t AS t USING merge_mm_none AS s ON t.k = s.k
         |WHEN MATCHED AND s.v > 0 THEN UPDATE SET v = s.v""".stripMargin)
    assert(spark.sql(s"SELECT * FROM $cat.default.t").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 10L)))
    assert(CommitLogTable.open(spark, s"$wh/default/t")
      .history.collect().map(_.getLong(0)).max == vBefore)
    // exactly ONE of the pairs fires: applies cleanly, single row out
    Seq((1L, -5L), (1L, 7L)).toDF("k", "v")
      .createOrReplaceTempView("merge_mm_one")
    spark.sql(
      s"""MERGE INTO $cat.default.t AS t USING merge_mm_one AS s ON t.k = s.k
         |WHEN MATCHED AND s.v > 0 THEN UPDATE SET v = s.v""".stripMargin)
    assert(spark.sql(s"SELECT * FROM $cat.default.t").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 7L)))
  }

  test("MERGE INTO: insert-only merge appends — no target file is rewritten") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.t (day BIGINT, k BIGINT) " +
      "USING commitlog PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.default.t " +
      "SELECT id % 4 AS day, id AS k FROM range(0, 100)")
    val before = CommitLogTable.open(spark, s"$wh/default/t")
      .resolvedManifest(None).files.map(_.path).toSet
    Seq((2L, 1002L), (2L, 50L)).toDF("day", "k")
      .createOrReplaceTempView("merge_insonly")
    spark.sql(
      s"""MERGE INTO $cat.default.t AS t USING merge_insonly AS s
         |ON t.day = s.day AND t.k = s.k
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = CommitLogTable.open(spark, s"$wh/default/t")
      .resolvedManifest(None).files.map(_.path).toSet
    // every original file carried by reference; only the insert's file is new
    assert(before.subsetOf(after), "a target file was rewritten")
    assert((after -- before).nonEmpty)
    // k=50 existed (day 2) → suppressed; k=1002 inserted
    assert(spark.table(s"$cat.default.t").count() == 101)
  }

  test("MERGE INTO: insert-only merge with clause condition") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.t (k BIGINT, v BIGINT) USING commitlog")
    spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 10)")
    Seq((1L, 11L), (2L, 22L), (3L, -3L)).toDF("k", "v")
      .createOrReplaceTempView("merge_ins_src")
    spark.sql(
      s"""MERGE INTO $cat.default.t AS t USING merge_ins_src AS s ON t.k = s.k
         |WHEN NOT MATCHED AND s.v > 0 THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    // k=1 matched (no matched clause → unchanged), k=2 inserted, k=3
    // filtered by the clause condition
    assert(spark.sql(s"SELECT * FROM $cat.default.t ORDER BY k")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 10L), (2L, 22L)))
  }
}
