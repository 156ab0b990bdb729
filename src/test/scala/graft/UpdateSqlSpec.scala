package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.tables.CommitLogTable

/** `UPDATE … SET … WHERE …` SQL over commit-log catalog tables
  * (`plans/UpdateSql.scala` + `CommitLogTable.update`): one
  * transactional copy-on-write commit with file-stat pruning and CDF
  * pre/post images, no-op publishes nothing, SET expressions may read
  * the row's current values, and the partition column is immovable.
  */
class UpdateSqlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val cat = s"graft_upd$n"
    val wh = Files.createTempDirectory("graft-update-sql-spec").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.CommitLogCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("UPDATE: self-referential SET, WHERE filter, one commit with CDF") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.t (k BIGINT, v BIGINT) USING commitlog")
    spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 10), (2, 20), (3, 30)")
    spark.sql(s"UPDATE $cat.default.t SET v = v + 5 WHERE k >= 2")
    assert(spark.sql(s"SELECT * FROM $cat.default.t ORDER BY k")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (2L, 25L), (3L, 35L)))
    val t = CommitLogTable.open(spark, s"$wh/default/t")
    val hist = t.history.collect()
    assert(hist.map(_.getString(1)).contains("update"))
    // rowsUpdated bookkeeping on the update commit
    val updRow = hist.find(_.getString(1) == "update").get
    assert(updRow.getLong(3) == 2L) // rows_updated column
    // CDF pre/post images for the touched rows
    val changes = t.readChanges(hist.map(_.getLong(0)).max,
      hist.map(_.getLong(0)).max)
    val byType = changes.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 2L, "update_postimage" -> 2L))
  }

  test("UPDATE: no WHERE updates every row; no-match WHERE publishes nothing") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.t (k BIGINT, v BIGINT) USING commitlog")
    spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 10), (2, 20)")
    spark.sql(s"UPDATE $cat.default.t SET v = 0")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.default.t").head.getLong(0) == 0)
    val t = CommitLogTable.open(spark, s"$wh/default/t")
    val vBefore = t.history.collect().map(_.getLong(0)).max
    spark.sql(s"UPDATE $cat.default.t SET v = 99 WHERE k > 100")
    assert(CommitLogTable.open(spark, s"$wh/default/t")
      .history.collect().map(_.getLong(0)).max == vBefore,
      "a no-match UPDATE must not publish a version")
  }

  test("UPDATE: table alias resolves, partition column SET is refused") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.t (day BIGINT, v BIGINT) " +
      "USING commitlog PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 10), (2, 20)")
    spark.sql(s"UPDATE $cat.default.t AS x SET v = x.v * 2 WHERE x.day = 1")
    assert(spark.sql(s"SELECT v FROM $cat.default.t WHERE day = 1")
      .head.getLong(0) == 20L)
    val e = intercept[Exception](
      spark.sql(s"UPDATE $cat.default.t SET day = 9"))
    assert(e.getMessage.contains("partition column"))
    // stats pruning: a day-selective UPDATE carries the other day's file
    val before = CommitLogTable.open(spark, s"$wh/default/t")
      .resolvedManifest(None).files.map(_.path).toSet
    spark.sql(s"UPDATE $cat.default.t SET v = v + 1 WHERE day = 2")
    val after = CommitLogTable.open(spark, s"$wh/default/t")
      .resolvedManifest(None).files.map(_.path).toSet
    assert((before & after).exists(_.contains("__part=1")),
      s"day=1 files must carry by reference: before=$before after=$after")
    assert(!(after -- before).exists(_.contains("__part=1")),
      "no day=1 file may be rewritten by a day=2-selective UPDATE")
  }

  test("UPDATE with a subquery condition falls through to Spark's clean refusal") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.t (k BIGINT, v BIGINT) USING commitlog")
    spark.sql(s"CREATE TABLE $cat.default.s (k BIGINT) USING commitlog")
    spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 10), (2, 20)")
    spark.sql(s"INSERT INTO $cat.default.s VALUES (1)")
    // Expression.transform cannot rebind inside a subquery's plan, so the
    // strategy must decline and let the stock planner refuse the statement
    // instead of failing later with a stale-exprId resolution error
    val e = intercept[Exception](spark.sql(
      s"UPDATE $cat.default.t SET v = 0 " +
        s"WHERE k IN (SELECT k FROM $cat.default.s)"))
    assert(e.getMessage.toLowerCase.contains("not supported"),
      s"expected Spark's unsupported-statement refusal, got: ${e.getMessage}")
    // a subquery in a SET value declines the same way
    val e2 = intercept[Exception](spark.sql(
      s"UPDATE $cat.default.t SET v = (SELECT max(k) FROM $cat.default.s)"))
    assert(e2.getMessage.toLowerCase.contains("not supported"),
      s"expected Spark's unsupported-statement refusal, got: ${e2.getMessage}")
    // and the table is untouched
    assert(spark.sql(s"SELECT sum(v) FROM $cat.default.t").head.getLong(0) == 30)
  }

  test("DELETE: arbitrary (filter-untranslatable) predicate deletes with CDF") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.t (k BIGINT, v BIGINT) USING commitlog")
    spark.sql(s"INSERT INTO $cat.default.t SELECT id, id * 10 FROM range(0, 10)")
    // `k % 2 = 1` has no V1 Filter form — the SupportsDelete bridge alone
    // would refuse it; the DeleteFromTable strategy runs it transactionally
    spark.sql(s"DELETE FROM $cat.default.t WHERE k % 2 = 1")
    assert(spark.sql(s"SELECT count(*) FROM $cat.default.t")
      .head.getLong(0) == 5)
    val t = CommitLogTable.open(spark, s"$wh/default/t")
    val hist = t.history.collect()
    val delRow = hist.find(_.getString(1) == "delete").get
    assert(delRow.getLong(4) == 5L) // rows_deleted
    val v = delRow.getLong(0)
    assert(t.readChanges(v, v).filter("_change_type = 'delete'").count() == 5)
  }
}
