package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DeltaSqlTableOps
import graft.tables.{CommitLogTable, DeltaLogBridge}

// classic-checkpoint fixture shapes (top-level for Encoder derivation)
case class CkptProtocol(minReaderVersion: Int, minWriterVersion: Int)
case class CkptFormat(provider: String)
case class CkptMeta(id: String, format: CkptFormat, schemaString: String,
    partitionColumns: Seq[String])
case class CkptAdd(path: String, partitionValues: Map[String, String],
    size: Long, modificationTime: Long, dataChange: Boolean)
case class CkptRow(protocol: Option[CkptProtocol],
    metaData: Option[CkptMeta], add: Option[CkptAdd])

/** Protocol-level Delta interop WITHOUT the delta-spark jar
  * ([[graft.tables.DeltaLogBridge]]): a hand-authored `_delta_log`
  * (JSON actions verbatim from the public protocol spec) must read
  * correctly — adds, removes, partitionValues, schemaString, version
  * replay — and a commit-log snapshot must export to the same actions
  * zero-copy and read back identically. This is the in-sandbox half of
  * the interop evidence; `DeltaInteropSpec` drives real delta-spark
  * when the jar is present (it self-cancels here).
  */
class DeltaFixtureSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-delta-fixture").toString

  /** The committed fixture: a two-version Delta log written action by
    * action — v0 creates a day-partitioned table with two files (one in
    * a space-bearing subdir, exercising the protocol's %-encoded
    * relative-URI paths), v1 removes day=2's file and adds a
    * replacement. Data files deliberately OMIT the partition column:
    * Delta sources those values from the log.
    */
  private def buildFixture(dir: String): Unit = {
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1)
      .write.parquet(s"$dir/sub dir/d1")
    Seq((3L, "c")).toDF("k", "s").coalesce(1)
      .write.parquet(s"$dir/d2")
    Seq((30L, "z"), (31L, "y")).toDF("k", "s").coalesce(1)
      .write.parquet(s"$dir/d2b")
    def onePart(sub: String): String = {
      val s = Files.list(Paths.get(dir, sub))
      val f = try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
        finally s.close()
      s"$sub/${f.getFileName}"
    }
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType))).json
      .replace("\"", "\\\"")
    val f1 = onePart("sub dir/d1").replace("sub dir", "sub%20dir")
    val f2 = onePart("d2")
    val f2b = onePart("d2b")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"f00d","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":["day"],"configuration":{},"createdTime":1700000000000}}
         |{"add":{"path":"$f1","partitionValues":{"day":"1"},"size":100,"modificationTime":1700000000000,"dataChange":true}}
         |{"add":{"path":"$f2","partitionValues":{"day":"2"},"size":100,"modificationTime":1700000000000,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000001.json"),
      (s"""{"commitInfo":{"operation":"REPLACE WHERE day = 2"}}
         |{"remove":{"path":"$f2","deletionTimestamp":1700000001000,"dataChange":true}}
         |{"add":{"path":"$f2b","partitionValues":{"day":"2"},"size":100,"modificationTime":1700000001000,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
  }

  test("hand-authored protocol fixture: adds/removes/partitionValues/time travel") {
    val dir = tmpDir()
    buildFixture(dir)
    val latest = DeltaLogBridge.read(spark, dir)
    assert(latest.schema.fieldNames.toSeq == Seq("day", "k", "s"))
    assert(latest.orderBy("k").as[(Long, Long, String)].collect().toSeq ==
      Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 30L, "z"), (2L, 31L, "y")),
      "partition values must come from the LOG (files omit the column)")
    val v0 = DeltaLogBridge.read(spark, dir, versionAsOf = Some(0L))
    assert(v0.orderBy("k").as[(Long, Long, String)].collect().toSeq ==
      Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 3L, "c")),
      "time travel must replay only through the pinned version")
    // _last_checkpoint is a HINT readers must tolerate (protocol spec):
    // a dangling one — no checkpoint parquet exists — must NOT fail a
    // read the complete JSON chain can serve
    Files.write(Paths.get(dir, "_delta_log/_last_checkpoint"),
      """{"version":1,"size":3}""".getBytes(UTF_8))
    assert(DeltaLogBridge.read(spark, dir).count() == 4)
    // ... and an unparseable hint is equally harmless
    Files.write(Paths.get(dir, "_delta_log/_last_checkpoint"),
      "not json{{{".getBytes(UTF_8))
    assert(DeltaLogBridge.read(spark, dir).count() == 4)
  }

  test("classic checkpoint: seed state from the parquet, replay the JSON tail, refuse pre-checkpoint pins once vacuumed") {
    val dir = tmpDir()
    buildFixture(dir)
    // the live state AT v1 (what a writer checkpoints): f1 (day=1), f2b (day=2)
    def onePart(sub: String): String = {
      val s = Files.list(Paths.get(dir, sub))
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
        .getFileName.toString
      finally s.close()
    }
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType))).json
    val rows = Seq(
      CkptRow(Some(CkptProtocol(1, 2)), None, None),
      CkptRow(None, Some(CkptMeta("f00d", CkptFormat("parquet"),
        schemaJson, Seq("day"))), None),
      CkptRow(None, None, Some(CkptAdd(
        "sub%20dir/d1/" + onePart("sub dir/d1"),
        Map("day" -> "1"), 100L, 1L, dataChange = false))),
      CkptRow(None, None, Some(CkptAdd(
        "d2b/" + onePart("d2b"),
        Map("day" -> "2"), 100L, 1L, dataChange = false))))
    val tmpCk = tmpDir()
    rows.toDS().coalesce(1).write.parquet(tmpCk + "/ck")
    val part = { val s = Files.list(Paths.get(tmpCk, "ck"))
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close() }
    Files.copy(part,
      Paths.get(dir, "_delta_log/00000000000000000001.checkpoint.parquet"))
    Files.write(Paths.get(dir, "_delta_log/_last_checkpoint"),
      """{"version":1,"size":4}""".getBytes(UTF_8))
    // a JSON tail after the checkpoint
    Files.write(Paths.get(dir, "_delta_log/00000000000000000002.json"),
      (s"""{"remove":{"path":"sub%20dir/d1/${onePart("sub dir/d1")}","deletionTimestamp":2,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    def latest() = DeltaLogBridge.read(spark, dir).orderBy("k")
      .as[(Long, Long, String)].collect().toSeq
    // with the full JSON chain present, the pure replay still serves
    assert(latest() == Seq((2L, 30L, "z"), (2L, 31L, "y")))
    assert(DeltaLogBridge.read(spark, dir, Some(0L)).count() == 3)
    // vacuum the pre-checkpoint JSON: state must seed from the parquet
    Files.delete(Paths.get(dir, "_delta_log/00000000000000000000.json"))
    assert(latest() == Seq((2L, 30L, "z"), (2L, 31L, "y")))
    assert(DeltaLogBridge.read(spark, dir, Some(1L)).orderBy("k")
      .as[(Long, Long, String)].collect().toSeq ==
      Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 30L, "z"), (2L, 31L, "y")))
    // a pin BELOW the checkpoint is gone with the vacuumed chain
    val e = intercept[IllegalArgumentException](
      DeltaLogBridge.read(spark, dir, Some(0L)))
    assert(e.getMessage.contains("not in log") ||
      e.getMessage.contains("predates checkpoint"), e.getMessage)
  }

  test("absolute add.path URIs are refused loudly, not silently mangled") {
    val dir = tmpDir()
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType))).json.replace("\"", "\\\"")
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1}}
         |{"add":{"path":"s3://bucket/data/f.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    val e = intercept[IllegalArgumentException](DeltaLogBridge.read(spark, dir))
    assert(e.getMessage.contains("table-relative"), e.getMessage)
  }

  test("commitlog snapshot exports to Delta actions zero-copy and reads back identically") {
    val dir = tmpDir() + "/t"
    val df = spark.range(40).select(
      when($"id" % 4 === 0, lit(null).cast("long"))
        .otherwise($"id" % 4).as("day"),
      $"id".as("k"), ($"id" * 0.5).as("v"))
    val t = CommitLogTable.create(spark, dir, df.schema, Seq("day"))
    t.append(df, recordChanges = false)
    t.append(df.limit(0), recordChanges = false) // no-op append publishes nothing
    val nFiles = DeltaLogBridge.export(t)
    assert(nFiles == t.resolvedManifest(None).files.size)
    // no data copied: the log references the table's own parquet
    val logLines = new String(Files.readAllBytes(
      Paths.get(dir, "_delta_log/00000000000000000000.json")), UTF_8)
    assert(logLines.contains("\"minReaderVersion\":1"))
    val back = DeltaLogBridge.read(spark, dir)
    def key(d: org.apache.spark.sql.DataFrame) = d.orderBy("k").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(1), r.getDouble(2))).toSeq
    assert(key(back) == key(t.read()),
      "exported Delta log must read back exactly the commitlog snapshot " +
        "(NULL partition values included)")
    // if real delta-spark is on the classpath, it must read the export too
    if (DeltaSqlTableOps.sessionReady(spark))
      assert(spark.read.format("delta").load(dir).count() == 40)
  }

  test("live Delta mirror: every commit appends a 1:1 Delta commit; breaks cleanly on unmappables") {
    val dir = tmpDir() + "/t"
    val df = spark.range(20).select(($"id" % 3).as("day"), $"id".as("k"))
    val t = CommitLogTable.create(spark, dir, df.schema, Seq("day"))
    t.append(df, recordChanges = false) // v1, pre-mirror history
    t.setProperties(Map(DeltaLogBridge.MirrorProp -> "true")) // v2: seeds
    def mirrorEq(): Unit = {
      val tt = CommitLogTable.open(spark, dir)
      def key(d: org.apache.spark.sql.DataFrame) = d.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(key(DeltaLogBridge.read(spark, dir)) == key(tt.read()),
        "the mirrored Delta log must read back the live table")
      if (graft.operators.DeltaSqlTableOps.sessionReady(spark))
        assert(spark.read.format("delta").load(dir).count() == tt.read().count())
    }
    mirrorEq() // checkpoint seed at v2
    t.append(df.filter($"k" < 5).withColumn("k", $"k" + 100L))
    mirrorEq() // v3 as Delta JSON commit 3
    t.delete($"k" >= 100L) // copy-on-write: removes + re-adds
    mirrorEq()
    t.compact(1024L * 1024 * 1024) // may no-op; mirror stays consistent
    mirrorEq()
    // versions stay 1:1 — the Delta commit for graft v3 exists by name
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      dir, "_delta_log/00000000000000000003.json")))
    // a LAZY delete mirrors as a deletion-vector commit (round 14):
    // the mirror never pauses on the table's cheapest write verb
    t.deleteLazy("k = 0")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      dir, "_delta_log/_GRAFT_MIRROR_BROKEN")),
      "a lazy delete must mirror as a DV commit, not break")
    mirrorEq()
    // and later commits keep following
    t.append(df.limit(1))
    mirrorEq()

    // checkpoint seeding with a NULL partition value round-trips too
    val dir2 = tmpDir() + "/tn"
    val dfn = spark.range(6).select(
      when($"id" % 2 === 0, lit(null).cast("long")).otherwise(1L).as("day"),
      $"id".as("k"))
    val tn = CommitLogTable.create(spark, dir2, dfn.schema, Seq("day"))
    tn.append(dfn, recordChanges = false)
    tn.setProperties(Map(DeltaLogBridge.MirrorProp -> "true"))
    val back = DeltaLogBridge.read(spark, dir2).orderBy("k").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1))).toSeq
    assert(back == (0L until 6L).map(k =>
      (if (k % 2 == 0) -1L else 1L, k)))
  }

  test("export expresses lazy-delete marks as deletion vectors (round-14 flip)") {
    val dir = tmpDir() + "/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val t = CommitLogTable.create(spark, dir, df.schema)
    t.append(df, recordChanges = false)
    t.deleteLazy("k = 1")
    // pending marks export as a reader-v3 DV log, zero data copied
    assert(DeltaLogBridge.export(t) == t.resolvedManifest(None).files.size)
    val v0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_delta_log/00000000000000000000.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(v0.contains("\"minReaderVersion\":3") &&
      v0.contains("deletionVectors") && v0.contains("\"storageType\":\"u\""), v0)
    val dvBack = DeltaLogBridge.read(spark, dir)
    assert(dvBack.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "b")),
      "the exported DV must hide exactly the marked rows")
    // materializing the mark (OPTIMIZE) still exports cleanly
    t.compact(1024L * 1024 * 1024)
    assert(DeltaLogBridge.export(t, overwrite = true) ==
      t.resolvedManifest(None).files.size)
    assert(DeltaLogBridge.read(spark, dir).count() == 1)
    // a renamed column = live column mapping → exports as a reader-v2
    // NAME-mode log (round 13) and round-trips with logical names
    val dir2 = tmpDir() + "/t2"
    val t2 = CommitLogTable.create(spark, dir2, df.schema)
    t2.append(df, recordChanges = false)
    t2.renameColumn("s", "s2")
    assert(DeltaLogBridge.export(t2) == t2.resolvedManifest(None).files.size)
    val back = DeltaLogBridge.read(spark, dir2)
    assert(back.schema.fieldNames.toSeq == Seq("k", "s2"))
    assert(back.orderBy("k").collect().map(_.getString(1)).toSeq ==
      Seq("a", "b"))
  }
}
