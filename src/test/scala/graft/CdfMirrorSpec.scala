package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.{CommitLogTable, DeltaLogBridge}

/** The mirror's CHANGE DATA FEED surface (round 15): with
  * `delta.enableChangeDataFeed=true` (the reference's own Bronze
  * TBLPROPERTY, `docs/databricks_setup.md:96`), every mirrored
  * update/delete/merge commit ships its persisted change rows as
  * `_change_data/` parquet plus `cdc` actions — the protocol shape an
  * external Delta CDF consumer needs for the reference's CDF-driven
  * Silver MERGE. Pure-insert commits carry NO cdc (readers derive
  * inserts from the adds, Delta's own writer rule). Also covers the
  * metaData carriage that ships with it: stored CHECK constraints,
  * user TBLPROPERTIES, and generated/identity field metadata travel
  * into mirrored and exported logs, with the legacy writer-version
  * ladder in the protocol.
  */
class CdfMirrorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-cdf-mirror").toString

  private val M = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()

  private def jsonLines(dir: String, v: Long): Seq[com.fasterxml.jackson.databind.JsonNode] =
    new String(Files.readAllBytes(
      Paths.get(dir, "_delta_log", f"$v%020d.json")), UTF_8)
      .split('\n').filter(_.trim.nonEmpty).toSeq.map(M.readTree)

  private def cdcNodes(dir: String, v: Long) =
    jsonLines(dir, v).filter(_.has("cdc")).map(_.get("cdc"))

  test("update/delete commits carry cdc actions 1:1 with the commitlog " +
      "change files; pure-insert appends carry none; the cdc parquet " +
      "drops _commit_version and reads back as the exact images") {
    val dir = tmpDir() + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true"))
    // v2: pure-insert append — NO cdc action (readers derive from adds)
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    assert(cdcNodes(dir, 2L).isEmpty,
      "a pure-insert commit must not write cdc")
    // v3: UPDATE — cdc with pre/post images
    t.update($"k" === 2L, Map("v" -> lit("B")))
    val updCdc = cdcNodes(dir, 3L)
    assert(updCdc.nonEmpty, jsonLines(dir, 3L).toString)
    updCdc.foreach { c =>
      assert(c.get("path").asText.startsWith("_change_data/"))
      assert(!c.get("dataChange").asBoolean)
      val p = Paths.get(dir, c.get("path").asText)
      assert(Files.isRegularFile(p), s"cdc names a real file: $p")
      assert(Files.size(p) == c.get("size").asLong)
    }
    val updRows = spark.read
      .parquet(updCdc.map(c => s"$dir/${c.get("path").asText}"): _*)
    assert(!updRows.columns.contains("_commit_version"),
      "readers take the version from the action, not the file")
    val images = updRows.select("k", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(images == Set((2L, "b", "update_preimage"),
      (2L, "B", "update_postimage")), images.toString)
    // ...and they are 1:1 with the commitlog's own change rows
    val own = t.readChanges(3L, 3L).select("k", "v", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(images == own)
    // v4: DELETE — cdc with the delete image
    t.delete($"k" === 3L)
    val delRows = spark.read
      .parquet(cdcNodes(dir, 4L).map(c => s"$dir/${c.get("path").asText}"): _*)
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(delRows == Set((3L, "delete")), delRows.toString)
    // the enabling commit (or seed) declared the property and the
    // legacy writer level CDF needs
    val md = jsonLines(dir, 3L) ++ jsonLines(dir, 2L)
    val seedMeta = {
      val ck = Paths.get(dir, "_delta_log",
        f"${1L}%020d.checkpoint.parquet")
      spark.read.parquet(ck.toString)
        .selectExpr("metaData.configuration", "protocol.minWriterVersion")
        .where("metaData IS NOT NULL OR protocol IS NOT NULL").collect()
    }
    val conf = seedMeta.flatMap(r => Option(r.getMap[String, String](0)))
      .flatMap(_.toMap).toMap
    assert(conf.get("delta.enableChangeDataFeed").contains("true"),
      conf.toString)
    assert(!conf.keys.exists(_.startsWith("graft.")),
      s"engine-internal keys must stay home: $conf")
    val minW = seedMeta.flatMap(r =>
      if (r.isNullAt(1)) None else Some(r.getInt(1))).max
    assert(minW >= 4, s"changeDataFeed needs writer v4, got $minW")
    // the log stays readable by the bridge throughout
    assert(DeltaLogBridge.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B")))
  }

  test("partitioned cdc: files lay out partitionBy (column NOT in the " +
      "parquet), partitionValues carry the values, and a MERGE commit's " +
      "cdc covers insert + update images") {
    val dir = tmpDir() + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL(
        "day STRING, k BIGINT, v DOUBLE"), Seq("day"))
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true"))
    t.append(Seq(("d1", 1L, 1.0), ("d2", 2L, 2.0)).toDF("day", "k", "v"))
    // latest-wins merge: updates k=2, inserts k=9 — one commit, v3
    t.merge(Seq(("d2", 2L, 20.0), ("d2", 9L, 9.0)).toDF("day", "k", "v"),
      Seq("k"), Seq(col("day"), col("v")))
    val cdc = cdcNodes(dir, 3L)
    assert(cdc.nonEmpty, jsonLines(dir, 3L).toString)
    cdc.foreach { c =>
      val pv = c.get("partitionValues")
      assert(pv.hasNonNull("day"), c.toString)
      // the parquet itself must NOT carry the partition column — Delta
      // readers inject it from partitionValues
      val cols = spark.read.parquet(s"$dir/${c.get("path").asText}").columns
      assert(!cols.contains("day"), cols.mkString(","))
    }
    // reassemble (file rows + injected pv) and compare with the
    // commitlog's own change feed for that version
    val assembled = cdc.flatMap { c =>
      val day = c.get("partitionValues").get("day").asText
      spark.read.parquet(s"$dir/${c.get("path").asText}")
        .select("k", "v", "_change_type").collect()
        .map(r => (day, r.getLong(0), r.getDouble(1), r.getString(2)))
    }.toSet
    val own = t.readChanges(3L, 3L)
      .select("day", "k", "v", "_change_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getString(3))).toSet
    assert(assembled == own, s"cdc $assembled vs commitlog $own")
    assert(own.exists(_._4 == "update_postimage") &&
      own.exists(_._4 == "insert"), own.toString)
    // the bridge's own CDF reader consumes the partitioned cdc output
    // and agrees with the engine's feed
    val viaBridge = DeltaLogBridge.readChanges(spark, dir, 3L, 3L)
      .select("day", "k", "v", "_change_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getString(3))).toSet
    assert(viaBridge == own, s"bridge $viaBridge vs commitlog $own")
  }

  test("the bridge READS CDF: the mirror's output round-trips 1:1 with " +
      "the engine's own change feed (derived inserts + cdc commits); " +
      "an image-less rewrite commit refuses") {
    val dir = tmpDir() + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true"))
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")) // v2
    t.update($"k" === 2L, Map("v" -> lit("B"))) // v3: cdc
    t.delete($"k" === 3L) // v4: cdc
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet
    val own = shape(t.readChanges(2L, 4L))
    val viaBridge = shape(DeltaLogBridge.readChanges(spark, dir, 2L, 4L))
    assert(viaBridge == own, s"bridge $viaBridge vs engine $own")
    assert(own.exists(_._3 == "insert") && own.exists(_._3 == "delete") &&
      own.exists(_._3 == "update_preimage"), own.toString)
    // a COW rewrite on a CDF-LESS mirror (remove+add, no cdc) is
    // underivable — the reader must refuse, never fabricate images
    val dir2 = tmpDir() + "/t2"
    val t2 = CommitLogTable.create(spark, dir2,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
    t2.setProperties(Map(DeltaLogBridge.MirrorProp -> "true"))
    t2.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")) // v2
    t2.update($"k" === 1L, Map("v" -> lit("A"))) // v3: remove+add, no cdc
    val e = intercept[IllegalArgumentException](
      DeltaLogBridge.readChanges(spark, dir2, 2L, 3L).collect())
    assert(e.getMessage.contains("without cdc"), e.getMessage)
    // ...but the pure-insert prefix still derives
    assert(shape(DeltaLogBridge.readChanges(spark, dir2, 2L, 2L)) ==
      Set((1L, "a", "insert", 2L), (2L, "b", "insert", 2L)))
  }

  test("constraints, user TBLPROPERTIES, and generated/identity specs " +
      "travel into the exported log; the protocol climbs the legacy " +
      "writer ladder") {
    val dir = tmpDir() + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, k BIGINT, v STRING, day DATE"))
    t.setProperties(Map(
      "team" -> "data-eng",
      "graft.identity.id" -> "1,1,false",
      "graft.generated.day" -> "CAST(NULL AS DATE)"))
    t.addConstraint("k_pos", "k > 0")
    t.append(Seq((5L, "x")).toDF("k", "v"))
    DeltaLogBridge.export(t)
    val lines = jsonLines(dir, 0L)
    val proto = lines.find(_.has("protocol")).get.get("protocol")
    // identity ⇒ legacy writer v6 (implies constraints/CDF/generated)
    assert(proto.get("minWriterVersion").asInt == 6, proto.toString)
    val md = lines.find(_.has("metaData")).get.get("metaData")
    val conf = md.get("configuration")
    assert(conf.get("delta.constraints.k_pos").asText == "k > 0")
    assert(conf.get("team").asText == "data-eng")
    assert(!conf.fieldNames().asScala.exists(_.startsWith("graft.")),
      conf.toString)
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(md.get("schemaString").asText)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val idMeta = schema("id").metadata
    assert(idMeta.getLong("delta.identity.start") == 1L)
    assert(idMeta.getLong("delta.identity.step") == 1L)
    assert(!idMeta.getBoolean("delta.identity.allowExplicitInsert"))
    assert(idMeta.getLong("delta.identity.highWaterMark") == 1L,
      "the synced high-water travels")
    assert(schema("day").metadata.getString("delta.generationExpression")
      == "CAST(NULL AS DATE)")
    // the exported log still reads through the bridge (the extra
    // configuration keys and field metadata are tolerated)
    assert(DeltaLogBridge.read(spark, dir).count() == 1)
  }

  test("a column-MAPPED table's cdc round-trips: change files carry " +
      "physical names, the bridge reader surfaces logical ones") {
    val dir = tmpDir() + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")) // v2
    t.renameColumn("v", "label") // v3: column mapping goes live
    t.update($"k" === 2L, Map("label" -> lit("B"))) // v4: cdc, mapped
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "label", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet
    val own = shape(t.readChanges(4L, 4L))
    val viaBridge = shape(DeltaLogBridge.readChanges(spark, dir, 4L, 4L))
    assert(viaBridge == own, s"bridge $viaBridge vs engine $own")
    assert(own == Set((2L, "b", "update_preimage", 4L),
      (2L, "B", "update_postimage", 4L)), own.toString)
    // the cdc parquet itself stores the PHYSICAL column name
    val cdc = cdcNodes(dir, 4L)
    val physCols = spark.read
      .parquet(cdc.map(c => s"$dir/${c.get("path").asText}"): _*).columns
    assert(physCols.contains("v") && !physCols.contains("label"),
      physCols.mkString(","))
  }

  test("mirror log retention sweeps a dropped commit's _change_data " +
      "with its json; kept commits' cdc files survive") {
    val dir = tmpDir() + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true",
      DeltaLogBridge.CheckpointIntervalProp -> "3",
      DeltaLogBridge.LogRetainCheckpointsProp -> "1"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")) // v2
    def cdcDirOf(v: Long): java.nio.file.Path = {
      val nodes = cdcNodes(dir, v)
      assert(nodes.nonEmpty, s"v$v should carry cdc")
      Paths.get(dir, nodes.head.get("path").asText).getParent
    }
    t.update($"k" === 1L, Map("v" -> lit("v1"))) // v3 (cadence ckpt at 3)
    val earlyCdc = cdcDirOf(3L) // capture BEFORE later ckpts vacuum v3
    (2 to 8).foreach(i => // v4..v10
      t.update($"k" === 1L, Map("v" -> lit(s"v$i"))))
    val lateCdc = cdcDirOf(10L)
    // v11 crosses a checkpoint multiple → retention runs, keeps only
    // the newest checkpoint; v3's json AND its cdc directory are gone
    t.update($"k" === 1L, Map("v" -> lit("last")))
    assert(!Files.exists(Paths.get(dir, "_delta_log",
      f"${3L}%020d.json")), "v3 json vacuumed")
    assert(!Files.exists(earlyCdc), s"v3 cdc dir must go with its json")
    assert(Files.exists(lateCdc), "kept commits keep their cdc files")
    assert(DeltaLogBridge.read(spark, dir).orderBy("k").collect().toSeq ==
      t.read().orderBy("k").collect().toSeq)
  }

  test("a mirrored identity append re-emits metaData with the advanced " +
      "high-water (Delta's own behavior); plain tables emit none") {
    val dir = tmpDir() + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING"))
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "graft.identity.id" -> "1,1,false"))
    t.append(Seq("a", "b").toDF("v")) // v2: ids 1..2
    t.append(Seq("c").toDF("v")) // v3: id advances past 2
    def hw(v: Long): Option[Long] =
      jsonLines(dir, v).find(_.has("metaData")).map { n =>
        val s = org.apache.spark.sql.types.DataType
          .fromJson(n.get("metaData").get("schemaString").asText)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        s("id").metadata.getLong("delta.identity.highWaterMark")
      }
    assert(hw(2L).contains(2L), jsonLines(dir, 2L).toString)
    assert(hw(3L).contains(3L), jsonLines(dir, 3L).toString)
    // a steady-state commit on a PLAIN mirrored table emits no metaData
    val dir2 = tmpDir() + "/t2"
    val t2 = CommitLogTable.create(spark, dir2,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
    t2.setProperties(Map(DeltaLogBridge.MirrorProp -> "true"))
    t2.append(Seq(1L).toDF("k"))
    t2.append(Seq(2L).toDF("k"))
    assert(!jsonLines(dir2, 3L).exists(_.has("metaData")),
      "steady-state appends must stay metaData-free")
  }
}
