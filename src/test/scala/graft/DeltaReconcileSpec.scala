package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.{CommitLogTable, DeltaLogBridge}

/** Two-engine coexistence on one `_delta_log`
  * ([[DeltaLogBridge.reconcile]]): mid-cutover, an EXTERNAL Delta
  * writer (the reference's still-running Databricks Silver job,
  * `docs/databricks_setup.md:352-373`) keeps committing to the log
  * graft adopted — foreign commits must replay into the commit log
  * before graft's own writes, so both readers converge on one history
  * instead of forking. Covers the pull-before-commit hook, explicit
  * reconcile, CDF continuity across the interleave, foreign deletes,
  * and the loud refusals (underivable images, unvouched logs).
  */
class DeltaReconcileSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-delta-reconcile").toString

  private val M =
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()

  private def onePart(dir: String, sub: String): String = {
    val s = Files.list(Paths.get(dir, sub))
    try s"$sub/" + s.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get.getFileName
    finally s.close()
  }

  private def writeJson(dir: String, v: Long, lines: String): Unit =
    Files.write(Paths.get(dir, f"_delta_log/$v%020d.json"),
      lines.getBytes(UTF_8))

  /** Delta v0: schema (k BIGINT, s STRING), one data file, two rows. */
  private def buildBase(dir: String): String = {
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1)
      .write.parquet(s"$dir/d0")
    val f0 = onePart(dir, "d0")
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType))).json.replace("\"", "\\\"")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    writeJson(dir, 0L,
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"beef","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1700000000000}}
         |{"add":{"path":"$f0","partitionValues":{},"size":100,"modificationTime":1700000000000,"dataChange":true}}
         |""".stripMargin)
    f0
  }

  /** A foreign writer's plain append at Delta version `v`. */
  private def foreignAppend(dir: String, v: Long,
      rows: Seq[(Long, String)], sub: String): String = {
    rows.toDF("k", "s").coalesce(1).write.parquet(s"$dir/$sub")
    val f = onePart(dir, sub)
    writeJson(dir, v,
      s"""{"add":{"path":"$f","partitionValues":{},"size":100,"modificationTime":1700000002000,"dataChange":true}}
         |""".stripMargin)
    f
  }

  private def rows(t: CommitLogTable): Set[(Long, String)] =
    t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("cutover loop: foreign appends pull in before each graft commit, " +
      "both readers converge, CDF covers the reconciled versions") {
    val dir = tmpDir() + "/t"
    buildBase(dir)
    val t = CommitLogTable.convertFromDelta(spark, dir) // graft v0, aligned
    t.setProperties(Map( // graft v1, mirrored as Delta v1
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true"))
    // the foreign job commits Delta v2 while graft is idle
    foreignAppend(dir, 2L, Seq((10L, "x"), (11L, "y")), "fd2")
    // graft's next commit pulls v2 first, then lands as v3
    t.append(Seq((20L, "g")).toDF("k", "s"))
    assert(t.latestVersion == 3L)
    val m2 = t.resolvedManifest(Some(2L))
    assert(m2.action == "reconcile")
    assert(m2.rowsInserted == 2L && m2.rowsTotal == 4L)
    assert(rows(t) == Set((1L, "a"), (2L, "b"), (10L, "x"), (11L, "y"),
      (20L, "g")))
    // the mirror CONTINUED past the pull: Delta v3 is graft's append,
    // and an external Delta reader sees the same table
    assert(Files.exists(Paths.get(dir, "_delta_log/00000000000000000003.json")))
    val external = DeltaLogBridge.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(external == rows(t), "external Delta reader diverged")
    // CDF is intact ACROSS the interleave: the reconciled version
    // serves the foreign rows as insert images on BOTH planes
    val graftImages = t.readChanges(2, 2)
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(graftImages == Set((10L, "insert"), (11L, "insert")))
    val bridgeImages = DeltaLogBridge.readChanges(spark, dir, 2, 2)
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(bridgeImages == graftImages, "stream-of-record forked")
    // a second foreign append reconciles EXPLICITLY too
    foreignAppend(dir, 4L, Seq((30L, "w")), "fd4")
    assert(DeltaLogBridge.reconcile(t) == 4L)
    assert(t.latestVersion == 4L &&
      t.resolvedManifest(Some(4L)).action == "reconcile")
    assert(rows(t).contains((30L, "w")))
    // idempotent: nothing foreign left to pull
    assert(DeltaLogBridge.reconcile(t) == 4L)
    // graft keeps committing on top, mirror stays 1:1
    t.append(Seq((40L, "h")).toDF("k", "s"))
    assert(t.latestVersion == 5L)
    assert(DeltaLogBridge.snapshot(spark, dir).version == 5L)
    assert(DeltaLogBridge.read(spark, dir).count() == rows(t).size.toLong)
  }

  test("foreign whole-file delete reconciles: the file drops, delete " +
      "images serve on both planes, counters record the deletion") {
    val dir = tmpDir() + "/t"
    val f0 = buildBase(dir)
    val t = CommitLogTable.convertFromDelta(spark, dir)
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true")) // graft v1 / Delta v1
    writeJson(dir, 2L,
      s"""{"remove":{"path":"$f0","deletionTimestamp":1700000003000,"dataChange":true}}
         |""".stripMargin)
    assert(DeltaLogBridge.reconcile(t) == 2L)
    val m2 = t.resolvedManifest(Some(2L))
    assert(m2.action == "reconcile" && m2.rowsDeleted == 2L &&
      m2.rowsTotal == 0L && m2.files.isEmpty)
    assert(t.read().isEmpty)
    val images = t.readChanges(2, 2).select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(images == Set((1L, "delete"), (2L, "delete")))
  }

  test("an image-less foreign rewrite refuses BY NAME and blocks the " +
      "graft commit instead of forking the logs") {
    val dir = tmpDir() + "/t"
    val f0 = buildBase(dir)
    val t = CommitLogTable.convertFromDelta(spark, dir)
    t.setProperties(Map(DeltaLogBridge.MirrorProp -> "true")) // no CDF
    // a foreign COW rewrite (remove + add, no cdc): images underivable
    Seq((1L, "A"), (2L, "B")).toDF("k", "s").coalesce(1)
      .write.parquet(s"$dir/fd2")
    val f2 = onePart(dir, "fd2")
    writeJson(dir, 2L,
      s"""{"remove":{"path":"$f0","deletionTimestamp":1700000003000,"dataChange":true}}
         |{"add":{"path":"$f2","partitionValues":{},"size":100,"modificationTime":1700000003000,"dataChange":true}}
         |""".stripMargin)
    val e = intercept[IllegalArgumentException](
      t.append(Seq((9L, "z")).toDF("k", "s")))
    assert(e.getMessage.contains("cdc"),
      s"refusal must name the missing cdc images: ${e.getMessage}")
    // nothing was applied: the graft log still ends at v1, unforked
    assert(t.latestVersion == 1L)
  }

  test("a COLUMN-MAPPED table reconciles: foreign adds keyed by " +
      "physical partition values pull in, physical identities pinned") {
    val root = tmpDir()
    val dir = root + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, s STRING"))
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true")) // v1
    t.append(Seq((1L, "a")).toDF("k", "s")) // v2
    t.renameColumn("s", "label") // v3: column mapping (name mode)
    val phys = t.resolvedManifest(None).columnMapping("label")
    assert(phys == "s", "rename should map label -> physical s")
    // the foreign writer reads the MAPPED log and appends: its parquet
    // carries the PHYSICAL column name, like any Delta name-mode writer
    Seq((10L, "x")).toDF("k", "s").coalesce(1).write.parquet(s"$dir/fm4")
    val part = {
      val w = Files.list(Paths.get(dir, "fm4"))
      try w.iterator().asScala.find(_.toString.endsWith(".parquet")).get
      finally w.close()
    }
    writeJson(dir, 4L,
      s"""{"add":{"path":"fm4/${part.getFileName}","partitionValues":{},"size":${Files.size(part)},"modificationTime":1700000004000,"dataChange":true}}
         |""".stripMargin)
    assert(DeltaLogBridge.reconcile(t) == 4L)
    val got = t.read().select("k", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (10L, "x")))
    // mapping survived the pull and the graft CDF serves LOGICAL names
    assert(t.resolvedManifest(None).columnMapping("label") == phys)
    val img = t.readChanges(4, 4).select("k", "label", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(img.toSeq == Seq((10L, "x", "insert")))
  }

  test("a foreign commit CARRYING cdc actions (the Silver MERGE shape) " +
      "imports its exact images") {
    val root = tmpDir()
    val dir = root + "/t"
    val f0 = buildBase(dir) // rows (1,a) (2,b)
    val t = CommitLogTable.convertFromDelta(spark, dir)
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true")) // graft v1 / Delta v1
    // the foreign MERGE: rewrites f0 (2 -> B), emitting cdc images —
    // exactly what a CDF-enabled delta-spark MERGE writes
    Seq((1L, "a"), (2L, "B")).toDF("k", "s").coalesce(1)
      .write.parquet(s"$dir/fr2")
    val newPart = {
      val w = Files.list(Paths.get(dir, "fr2"))
      try "fr2/" + w.iterator().asScala
        .find(_.toString.endsWith(".parquet")).get.getFileName
      finally w.close()
    }
    Seq((2L, "b", "update_preimage"), (2L, "B", "update_postimage"))
      .toDF("k", "s", "_change_type").coalesce(1)
      .write.parquet(s"$dir/_change_data/cd2")
    val cdcPart = {
      val w = Files.list(Paths.get(dir, "_change_data/cd2"))
      try "_change_data/cd2/" + w.iterator().asScala
        .find(_.toString.endsWith(".parquet")).get.getFileName
      finally w.close()
    }
    writeJson(dir, 2L,
      s"""{"remove":{"path":"$f0","deletionTimestamp":1700000003000,"dataChange":true}}
         |{"add":{"path":"$newPart","partitionValues":{},"size":100,"modificationTime":1700000003000,"dataChange":true}}
         |{"cdc":{"path":"$cdcPart","partitionValues":{},"size":100,"dataChange":false}}
         |""".stripMargin)
    assert(DeltaLogBridge.reconcile(t) == 2L)
    val m2 = t.resolvedManifest(Some(2L))
    assert(m2.action == "reconcile" && m2.rowsUpdated == 1L &&
      m2.rowsTotal == 2L)
    assert(rows(t) == Set((1L, "a"), (2L, "B")))
    // the imported images are the cdc parquet's EXACT rows, on both planes
    val img = t.readChanges(2, 2).select("k", "s", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(img == Set((2L, "b", "update_preimage"),
      (2L, "B", "update_postimage")))
    assert(img == DeltaLogBridge.readChanges(spark, dir, 2, 2)
      .select("k", "s", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet)
  }

  test("CALL system.delta_reconcile pulls foreign commits without a " +
      "graft write") {
    val wh = tmpDir()
    val cat = "graft_rec_cat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.CommitLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.default.t (k BIGINT, s STRING) " +
      "USING commitlog TBLPROPERTIES (" +
      s"'${DeltaLogBridge.MirrorProp}'='true', " +
      "'delta.enableChangeDataFeed'='true')")
    spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 'a')") // v2
    val dir = s"$wh/default/t"
    foreignAppend(dir, 3L, Seq((10L, "x"), (11L, "y")), "fd3")
    val row = spark.sql(
      s"CALL $cat.system.delta_reconcile(table => 'default.t')").head()
    assert(row.getLong(0) == 1L && row.getLong(1) == 3L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.default.t")
      .head().getLong(0) == 3L)
    val t = CommitLogTable.open(spark, dir)
    assert(t.resolvedManifest(Some(3L)).action == "reconcile")
  }

  test("a log this table cannot vouch for refuses to reconcile") {
    val dir = tmpDir() + "/t"
    buildBase(dir)
    val t = CommitLogTable.convertFromDelta(spark, dir)
    // strip the adoption's alignment marker — now it's a foreign log
    Files.delete(Paths.get(dir, "_delta_log/_graft_aligned"))
    foreignAppend(dir, 1L, Seq((10L, "x")), "fd1")
    val e = intercept[IllegalArgumentException](DeltaLogBridge.reconcile(t))
    assert(e.getMessage.contains("vouch"))
  }
}
