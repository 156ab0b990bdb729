package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.{CommitLogTable, DeltaLogBridge}

/** Streaming CDF consumption of a FOREIGN `_delta_log`
  * ([[graft.sources.DeltaCdfDataSource]], `format("delta-cdf")`): a
  * read-only consumer follows a Delta table's change feed with
  * checkpointed exactly-once restarts and WITHOUT adopting the table —
  * the reference's CDF-driven Silver pattern
  * (`docs/databricks_setup.md:170-198`) as a pure consumer. The
  * growing log under test is a live graft MIRROR (a real Delta log
  * with cdc actions for update/delete commits and derived-insert
  * appends), read here exclusively through the foreign-consumer path.
  */
class DeltaCdfStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-delta-cdf-stream").toString

  private def drain(dir: String, out: String, ckpt: String,
      options: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream.format("delta-cdf").option("path", dir)
    options.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load().writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
  }

  private def images(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, String, String, Long)] =
    df.select("k", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet

  test("a growing mirrored Delta log streams exactly-once across " +
      "restarts, and the stream's images equal the batch feed's") {
    val root = tmpDir()
    val dir = root + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true")) // Delta v1
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")) // v2: adds
    t.update($"k" === 2L, Map("v" -> lit("B"))) // v3: cdc images
    // the mirror SEEDS v1 as a checkpoint (no commit JSON), so the
    // feed's replayable floor — and the stream's default start — is v2
    drain(dir, root + "/out", root + "/ckpt")
    val got1 = images(spark.read.parquet(root + "/out"))
    val batch13 = images(DeltaLogBridge.readChanges(spark, dir, 2, 3))
    assert(got1 == batch13, s"stream != batch: $got1 vs $batch13")
    assert(got1.exists(_._3 == "update_postimage") &&
      got1.exists(_._3 == "insert"))
    // the table keeps moving: a delete (cdc) and another append
    t.delete($"k" === 1L) // v4
    t.append(Seq((5L, "e")).toDF("k", "v")) // v5
    // restart from the checkpoint: ONLY v4..v5 arrive — no replays
    drain(dir, root + "/out", root + "/ckpt")
    val got2 = images(spark.read.parquet(root + "/out"))
    assert(got2 == images(DeltaLogBridge.readChanges(spark, dir, 2, 5)))
    assert((got2 -- got1) ==
      images(DeltaLogBridge.readChanges(spark, dir, 4, 5)))
    // an idle restart produces nothing new
    drain(dir, root + "/out", root + "/ckpt")
    assert(images(spark.read.parquet(root + "/out")) == got2)
  }

  test("startingVersion excludes earlier commits; maxVersionsPerTrigger " +
      "paces catch-up without splitting a version") {
    val root = tmpDir()
    val dir = root + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true"))
    t.append(Seq((1L, "a")).toDF("k", "v")) // v2
    t.append(Seq((2L, "b")).toDF("k", "v")) // v3
    t.append(Seq((3L, "c")).toDF("k", "v")) // v4
    // Trigger.AvailableNow fixes its end offset at start, so a paced
    // run stops after maxVersionsPerTrigger versions — the first drain
    // serves ONLY v3, the second catches up to v4 (and a version never
    // splits across batches)
    drain(dir, root + "/out", root + "/ckpt",
      Map("startingVersion" -> "3", "maxVersionsPerTrigger" -> "1"))
    val first = images(spark.read.parquet(root + "/out"))
    assert(first == images(DeltaLogBridge.readChanges(spark, dir, 3, 3)))
    assert(first.map(_._4) == Set(3L))
    drain(dir, root + "/out", root + "/ckpt",
      Map("startingVersion" -> "3", "maxVersionsPerTrigger" -> "1"))
    val got = images(spark.read.parquet(root + "/out"))
    assert(got == images(DeltaLogBridge.readChanges(spark, dir, 3, 4)))
    assert(got.map(_._4) == Set(3L, 4L))
    // paced: the two drains committed one micro-batch each
    val commits = Files.list(Paths.get(root + "/ckpt", "commits"))
    val n = try commits.iterator().asScala.count(p =>
      !p.getFileName.toString.startsWith(".")) finally commits.close()
    assert(n >= 2, s"expected >=2 paced micro-batches, got $n")
  }

  test("a WIDE version range plans a bounded read: at most one scan " +
      "per image kind, never one frame per version") {
    val root = tmpDir()
    val dir = root + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true"))
    (1 to 25).foreach(i =>
      t.append(Seq((i.toLong, s"r$i")).toDF("k", "v").coalesce(1)))
    t.update($"k" === 5L, Map("v" -> lit("R5"))) // one cdc commit
    val head = t.latestVersion
    val df = DeltaLogBridge.readChanges(spark, dir, 2, head)
    // correctness over the whole range
    val got = images(df)
    assert(got.count(_._3 == "insert") == 25)
    assert(got.exists(x => x._3 == "update_postimage" && x._2 == "R5"))
    // plan shape: 26 versions must NOT plan 26 scans — one parquet scan
    // per image kind (cdc + derived inserts) plus their broadcast
    // file-lookup sides, regardless of range width
    val leaves = df.queryExecution.executedPlan.collectLeaves()
    assert(leaves.size <= 6,
      s"expected a consolidated plan, got ${leaves.size} leaves:\n" +
        df.queryExecution.executedPlan.toString.take(2000))
  }

  test("pacing recovery is seeded by the start offset alone: a stale " +
      "end below the recovered start is an empty batch, and the next " +
      "offset never falls below the checkpoint") {
    val root = tmpDir()
    val dir = root + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true")) // v1 (checkpoint seed)
    (1 to 4).foreach(i =>
      t.append(Seq((i.toLong, s"r$i")).toDF("k", "v"))) // v2..v5
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val src = new graft.sources.DeltaCdfDataSource().createSource(
      spark.sqlContext, root + "/meta", None, "delta-cdf",
      Map("path" -> dir, "maxVersionsPerTrigger" -> "1"))
    // the engine's recovery replay hands back the checkpointed range
    // with a stale end: end(3) < recovered start(4)+1 must be an EMPTY
    // frame, never the "bad CDF bounds" failure that wedges the
    // checkpoint
    val empty = src.getBatch(Some(LongOffset(4L)), LongOffset(3L))
    assert(empty.schema.fieldNames.contains("_commit_version"))
    // ...and the recovered START seeded the pacing state: with one
    // version per trigger the next offset is 5 (4+1), not the 4 a
    // stale-end-only seed would produce (which could replan at or
    // below the checkpoint)
    assert(src.getOffset.map(_.json.toLong).contains(5L))
  }

  test("restart-to-widen: a foreign schema evolution mid-stream is " +
      "served after restart — new column on post-evolution images, " +
      "null-backfill on pre-evolution rows") {
    val root = tmpDir()
    val dir = root + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true")) // v1 (mirror seeds here)
    t.append(Seq((1L, "a")).toDF("k", "v")) // v2, pre-evolution
    // schema-flexible drain: foreachBatch records rows under whatever
    // schema the restarted source declares (a parquet sink would pin
    // wave 1's schema and hide the widening)
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Option[Long], String, Long)]
    def drainFB(ckpt: String): org.apache.spark.sql.types.StructType = {
      var schema: org.apache.spark.sql.types.StructType = null
      val q = spark.readStream.format("delta-cdf").option("path", dir)
        .load().writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          schema = df.schema
          val hasExtra = df.schema.fieldNames.contains("extra")
          df.collect().foreach { r =>
            seen.synchronized { seen += ((r.getLong(r.fieldIndex("k")),
              r.getString(r.fieldIndex("v")),
              if (hasExtra && !r.isNullAt(r.fieldIndex("extra")))
                Some(r.getLong(r.fieldIndex("extra"))) else None,
              r.getString(r.fieldIndex("_change_type")),
              r.getLong(r.fieldIndex("_commit_version")))) }
          }
        }.trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
      schema
    }
    val s1 = drainFB(root + "/ckpt")
    assert(!s1.fieldNames.contains("extra"))
    assert(seen.toSet == Set((1L, "a", None, "insert", 2L)))
    // the FOREIGN writer evolves the schema mid-stream (the reference's
    // Auto Loader addNewColumns restart pattern,
    // docs/databricks_setup.md:120): a wider append commits v3 with the
    // mirrored metaData carrying the new column
    t.append(Seq((2L, "b", 7L)).toDF("k", "v", "extra"),
      mergeSchema = true) // v3
    // restart widens: the source re-resolves the log HEAD's schema, and
    // ONLY v3 arrives (exactly-once held across the widening)
    seen.clear()
    val s2 = drainFB(root + "/ckpt")
    assert(s2.fieldNames.contains("extra"),
      s"restart must widen, got ${s2.fieldNames.mkString(",")}")
    assert(seen.toSet == Set((2L, "b", Some(7L), "insert", 3L)))
    // a FRESH consumer starting from scratch post-evolution reads the
    // whole feed under the END schema: the pre-evolution image
    // null-backfills the new column
    seen.clear()
    drainFB(root + "/ckpt2")
    assert(seen.toSet == Set(
      (1L, "a", None, "insert", 2L),
      (2L, "b", Some(7L), "insert", 3L)))
  }

  test("a path listed at k versions in one range (foreign RESTORE / " +
      "remove-then-re-add) yields k image sets, never k²") {
    val root = tmpDir()
    val dir = root + "/t"
    // hand-authored foreign log: the SAME data file is added at v0,
    // removed at v1, re-added at v2 — so the consolidated derived-insert
    // read lists one path at TWO versions. The scan must read the path
    // once and let the broadcast (path, version) rows fan the
    // multiplicity out; scanning the duplicated list too squares it.
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1).write.parquet(dir)
    val dataFile = {
      val s = Files.list(Paths.get(dir))
      try s.iterator().asScala.map(_.getFileName.toString)
        .find(_.endsWith(".parquet")).get
      finally s.close()
    }
    // a cdc parquet shared by TWO commits (v3, v4) — same dup shape on
    // the cdc-exclusive branch, _change_type travels in-data
    Seq((9L, "u", "update_postimage")).toDF("k", "s", "_change_type")
      .coalesce(1).write.parquet(s"$dir/_change_data")
    val cdcFile = {
      val s = Files.list(Paths.get(dir, "_change_data"))
      try s.iterator().asScala.map(_.getFileName.toString)
        .find(_.endsWith(".parquet")).get
      finally s.close()
    }
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType))).json.replace("\"", "\\\"")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    def jsonAt(v: Int, body: String): Unit =
      Files.write(Paths.get(dir,
        f"_delta_log/$v%020d.json"), body.getBytes(UTF_8))
    jsonAt(0,
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"feed","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1700000000000}}
         |{"add":{"path":"$dataFile","partitionValues":{},"size":100,"modificationTime":1700000000000,"dataChange":true}}
         |""".stripMargin)
    jsonAt(1,
      s"""{"remove":{"path":"$dataFile","deletionTimestamp":1700000001000,"dataChange":true}}
         |""".stripMargin)
    jsonAt(2,
      s"""{"add":{"path":"$dataFile","partitionValues":{},"size":100,"modificationTime":1700000002000,"dataChange":true}}
         |""".stripMargin)
    jsonAt(3,
      s"""{"cdc":{"path":"_change_data/$cdcFile","partitionValues":{},"size":100,"dataChange":false}}
         |""".stripMargin)
    jsonAt(4,
      s"""{"cdc":{"path":"_change_data/$cdcFile","partitionValues":{},"size":100,"dataChange":false}}
         |""".stripMargin)
    val df = DeltaLogBridge.readChanges(spark, dir, 0, 4)
    val got = df.select("k", "s", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    // exactly one image per (row, listing): 2 inserts @v0, 2 deletes
    // @v1, 2 inserts @v2, 1 cdc image @v3 and @v4 — 8 rows, all distinct
    assert(got.size == 8, s"expected 8 images (k per listing), got " +
      s"${got.size}: ${got.sorted.mkString("; ")}")
    assert(got.distinct.size == 8, "duplicate images — the scan is " +
      "multiplying the broadcast fan-out")
    assert(got.count(x => x._3 == "insert" && x._4 == 0L) == 2)
    assert(got.count(x => x._3 == "delete" && x._4 == 1L) == 2)
    assert(got.count(x => x._3 == "insert" && x._4 == 2L) == 2)
    assert(got.count(x => x._3 == "update_postimage" && x._4 == 3L) == 1)
    assert(got.count(x => x._3 == "update_postimage" && x._4 == 4L) == 1)
  }

  test("a retention-trimmed log serves survivors by default; an " +
      "explicit start below the floor refuses loudly") {
    val root = tmpDir()
    val dir = root + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true",
      "graft.deltaMirror.logRetainCheckpoints" -> "1",
      "graft.deltaMirror.checkpointInterval" -> "2"))
    (1 to 6).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("k", "v")))
    // mirror log vacuum dropped early jsons; find the surviving floor
    val logDir = Paths.get(dir, "_delta_log")
    val floor = {
      val s = Files.list(logDir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.length == 25 && n.endsWith(".json"))
        .map(_.dropRight(5).toLong).min
      finally s.close()
    }
    assert(floor > 1L, "fixture should have vacuumed the early log")
    drain(dir, root + "/out", root + "/ckpt")
    val got = images(spark.read.parquet(root + "/out"))
    assert(got == images(DeltaLogBridge.readChanges(spark, dir, floor,
      t.latestVersion)))
    // explicit below-floor start: the bridge's range check refuses
    val e = intercept[Exception] {
      drain(dir, root + "/out2", root + "/ckpt2",
        Map("startingVersion" -> "1"))
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).exists(_.getMessage != null) &&
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .take(8).exists(t0 => Option(t0.getMessage)
          .exists(_.contains("not in the log"))),
      s"expected the vacuumed-range refusal, got: ${e.getMessage}")
  }
}
