package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.{CommitLogTable, DeltaLogBridge, LeaseCoordinator}

// v2-checkpoint fixture shapes (top-level for Encoder derivation)
case class V2Protocol(minReaderVersion: Int, minWriterVersion: Int,
    readerFeatures: Seq[String], writerFeatures: Seq[String])
case class V2Format(provider: String)
case class V2Meta(id: String, format: V2Format, schemaString: String,
    partitionColumns: Seq[String], configuration: Map[String, String])
case class V2Sidecar(path: String, sizeInBytes: Long)
case class V2ManifestRow(protocol: Option[V2Protocol],
    metaData: Option[V2Meta], sidecar: Option[V2Sidecar])
case class V2Dv(storageType: String, pathOrInlineDv: String, offset: Int,
    sizeInBytes: Int, cardinality: Long)
case class V2Add(path: String, partitionValues: Map[String, String],
    size: Long, modificationTime: Long, dataChange: Boolean,
    deletionVector: Option[V2Dv])
case class V2SidecarRow(add: Option[V2Add])

/** Round-13 Delta-bridge surface: modern protocol reads (reader v2/v3
  * table features accepted when declared features are understood or
  * provably unused; genuinely-used DV / column mapping refuse loudly),
  * UUID-named v2 checkpoints with sidecars, multi-part classic
  * checkpoints, and the SINGLE-SCAN read assembly (one FileScan node no
  * matter how many partitions — the round-12 `weak` finding). Reference
  * anchor: the reference's Bronze tables are Databricks-written with
  * column mapping enabled (`bronze_prices_auto_loader.ipynb` cell 4),
  * so real-world `_delta_log`s routinely carry reader v2+.
  */
class DeltaBridgeModernSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-delta-modern").toString

  private def onePart(dir: String, sub: String): String = {
    val s = Files.list(Paths.get(dir, sub))
    val f = try s.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    s"$sub/${f.getFileName}"
  }

  private val schemaJson = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("day",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("k",
      org.apache.spark.sql.types.LongType))).json

  /** One-commit v3 log over one physical file; `extraProtocol` and
    * `extraMeta` splice into the protocol / metaData actions.
    */
  private def v3Fixture(dir: String, readerFeatures: Seq[String],
      configuration: String = "{}", dvOnAdd: Boolean = false): Unit = {
    Seq(7L).toDF("k").coalesce(1).write.parquet(s"$dir/d1")
    val f1 = onePart(dir, "d1")
    val feats = readerFeatures.map("\"" + _ + "\"").mkString(",")
    // a REAL u-storage DV marking the file's only row (index 0) deleted
    val dv = if (!dvOnAdd) "" else {
      val uuid = java.util.UUID.fromString(
        "a1a1a1a1-b2b2-c3c3-d4d4-e5e5e5e5e5e5")
      val bm = graft.tables.DeletionVectors.serializeBitmap(Iterator(0L))
      val off = graft.tables.DeletionVectors.writeFile(
        graft.tables.GPath(dir, s"deletion_vector_$uuid.bin"), Seq(bm)).head
      s""","deletionVector":{"storageType":"u","pathOrInlineDv":"${graft.tables.DeletionVectors.z85Uuid(uuid)}","offset":$off,"sizeInBytes":${bm.length},"cardinality":1}"""
    }
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":[$feats],"writerFeatures":[]}}
         |{"metaData":{"id":"beef","format":{"provider":"parquet","options":{}},"schemaString":${M(schemaJson)},"partitionColumns":["day"],"configuration":$configuration,"createdTime":1}}
         |{"add":{"path":"$f1","partitionValues":{"day":"1"},"size":9,"modificationTime":1,"dataChange":true$dv}}
         |""".stripMargin).getBytes(UTF_8))
  }
  private def M(s: String): String =
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .writeValueAsString(s)

  test("reader v3 with declared-but-unused features reads; rows and partition values intact") {
    val dir = tmpDir()
    v3Fixture(dir, Seq("columnMapping", "deletionVectors", "v2Checkpoint",
      "timestampNtz", "vacuumProtocolCheck"),
      configuration = """{"delta.columnMapping.mode":"none"}""")
    val df = DeltaLogBridge.read(spark, dir)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 7L)))
  }

  test("genuinely-used deletion vector READS (round-14 flip: refuse → serve)") {
    // the v3Fixture's single-row file with a real u-storage DV marking
    // row 0 deleted: the read must return ZERO rows, not refuse and not
    // resurrect the row — the post-DBR-14 Databricks default path
    val dir = tmpDir()
    v3Fixture(dir, Seq("deletionVectors"), dvOnAdd = true)
    assert(DeltaLogBridge.read(spark, dir).count() == 0L)
  }

  test("column mapping mode NAME resolves physical fields to logical names") {
    val dir = tmpDir()
    // the FILE carries physical names (k_7, day is directory-sourced)
    Seq(42L).toDF("k_7").coalesce(1).write.parquet(s"$dir/d1")
    val f1 = onePart(dir, "d1")
    val mappedSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.LongType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.columnMapping.id", 1L)
          .putString("delta.columnMapping.physicalName", "day_p").build()),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.columnMapping.id", 2L)
          .putString("delta.columnMapping.physicalName", "k_7").build()))).json
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
         |{"metaData":{"id":"abcd","format":{"provider":"parquet","options":{}},"schemaString":${M(mappedSchema)},"partitionColumns":["day"],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":1}}
         |{"add":{"path":"$f1","partitionValues":{"day_p":"6"},"size":9,"modificationTime":1,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    val df = DeltaLogBridge.read(spark, dir)
    assert(df.schema.fieldNames.toSeq == Seq("day", "k"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((6L, 42L)))
  }

  test("NESTED name-mode fields resolve too; mode-none ignores leftover mapping metadata") {
    val dir = tmpDir()
    // file carries physical names at BOTH levels: top k_7, nested n_1
    spark.sql("SELECT 42L AS k_7, named_struct('n_1', 7L) AS s_2")
      .coalesce(1).write.parquet(s"$dir/d1")
    val f1 = onePart(dir, "d1")
    def fld(name: String, dt: org.apache.spark.sql.types.DataType,
        phys: String, id: Long) =
      org.apache.spark.sql.types.StructField(name, dt, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.columnMapping.id", id)
          .putString("delta.columnMapping.physicalName", phys).build())
    val nested = org.apache.spark.sql.types.StructType(Seq(
      fld("n", org.apache.spark.sql.types.LongType, "n_1", 3L)))
    val mappedSchema = org.apache.spark.sql.types.StructType(Seq(
      fld("k", org.apache.spark.sql.types.LongType, "k_7", 1L),
      fld("s", nested, "s_2", 2L))).json
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    def writeLog(configuration: String): Unit =
      Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
        (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
           |{"metaData":{"id":"abcd","format":{"provider":"parquet","options":{}},"schemaString":${M(mappedSchema)},"partitionColumns":[],"configuration":$configuration,"createdTime":1}}
           |{"add":{"path":"$f1","partitionValues":{},"size":9,"modificationTime":1,"dataChange":true}}
           |""".stripMargin).getBytes(UTF_8))
    writeLog("""{"delta.columnMapping.mode":"name"}""")
    val df = DeltaLogBridge.read(spark, dir)
    assert(df.schema.fieldNames.toSeq == Seq("k", "s"))
    val row = df.head()
    assert(row.getLong(0) == 42L &&
      row.getStruct(1).getLong(0) == 7L,
      "nested struct fields must resolve by their physical names")
    assert(df.select($"s.n").head().getLong(0) == 7L)
    // derived frames carry NO mapping metadata (a re-export must not
    // inherit stale physical redirections)
    assert(df.schema.fields.forall(!_.metadata
      .contains("delta.columnMapping.physicalName")))
    // mode-none: the SAME metadata-bearing schemaString must be read by
    // LOGICAL names (the spec: mapping metadata is inert without the
    // mode) — here the files carry physical names, so the logical
    // columns legitimately read as absent (null), never misdirected
    writeLog("{}")
    val plain = DeltaLogBridge.read(spark, dir)
    assert(plain.head().isNullAt(0),
      "mode none must ignore physicalName metadata, not resolve through it")
  }

  test("column mapping mode ID without id annotations refuses loudly (corrupt schema)") {
    val dir = tmpDir()
    v3Fixture(dir, Seq("columnMapping"),
      configuration = """{"delta.columnMapping.mode":"id"}""")
    val e = intercept[IllegalArgumentException](DeltaLogBridge.read(spark, dir))
    assert(e.getMessage.contains("column mapping"), e.getMessage)
  }

  test("column mapping mode ID resolves by parquet FIELD IDS (round-14 flip), names are decoys") {
    val dir = tmpDir()
    import org.apache.spark.sql.types._
    def idMeta(id: Long) = new MetadataBuilder()
      .putLong("parquet.field.id", id).build()
    // the data FILE: field names deliberately unrelated to both logical
    // and declared-physical names — only the ids can resolve them
    val fileSchema = StructType(Seq(
      StructField("zz_a", LongType, nullable = true, idMeta(2)),
      StructField("zz_b", LongType, nullable = true, idMeta(5)),
      StructField("zz_s", StructType(Seq(
        StructField("zz_n", LongType, nullable = true, idMeta(8)))),
        nullable = true, idMeta(7))))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    rows.add(org.apache.spark.sql.Row(42L, 7L, org.apache.spark.sql.Row(9L)))
    spark.createDataFrame(rows, fileSchema).coalesce(1)
      .write.parquet(s"$dir/d1")
    val f1 = onePart(dir, "d1")
    def fld(name: String, dt: DataType, phys: String, id: Long) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putLong("delta.columnMapping.id", id)
        .putString("delta.columnMapping.physicalName", phys).build())
    val mappedSchema = StructType(Seq(
      fld("k", LongType, "decoy_k", 2L),
      fld("v", LongType, "decoy_v", 5L),
      fld("s", StructType(Seq(
        fld("n", LongType, "decoy_n", 8L))), "decoy_s", 7L))).json
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
         |{"metaData":{"id":"idm","format":{"provider":"parquet","options":{}},"schemaString":${M(mappedSchema)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"8"},"createdTime":1}}
         |{"add":{"path":"$f1","partitionValues":{},"size":9,"modificationTime":1,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    val df = DeltaLogBridge.read(spark, dir)
    assert(df.schema.fieldNames.toSeq == Seq("k", "v", "s"))
    val r = df.head()
    assert(r.getLong(0) == 42L && r.getLong(1) == 7L &&
      r.getStruct(2).getLong(0) == 9L,
      "id-mode must resolve every (nested) field through its parquet field id")
    // a file PREDATING the ids fails Spark's own field-id check loudly
    Seq(1L).toDF("plain").coalesce(1).write.parquet(s"$dir/d2")
    val f2 = onePart(dir, "d2")
    Files.write(Paths.get(dir, "_delta_log/00000000000000000001.json"),
      (s"""{"add":{"path":"$f2","partitionValues":{},"size":9,"modificationTime":2,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    val e = intercept[Exception](DeltaLogBridge.read(spark, dir).collect())
    assert(e.getMessage != null)
  }

  test("mapped field ids are SEQUENTIAL and maxColumnId is monotonic across drops (never reused)") {
    val dir = tmpDir() + "/t"
    // an array<struct> rides along: ids of container-nested fields must
    // carry forward too (their paths thread '.element')
    val df = spark.range(4).select($"id".as("day"), $"id".as("k"),
      $"id".as("x"), array(struct($"id".as("n"))).as("arr"))
    val t = CommitLogTable.create(spark, dir, df.schema, Seq("day"))
    t.setProperties(Map(DeltaLogBridge.MirrorProp -> "true"))
    t.append(df, recordChanges = false)
    t.renameColumn("k", "key") // mapping appears: metaData with ids
    def latestMeta(): (Map[String, Long], Long, Long) = {
      val n = new String(Files.readAllBytes(Paths.get(dir,
        f"_delta_log/${t.latestVersion}%020d.json")), UTF_8)
        .linesIterator.find(_.contains("metaData")).get
      val md = com.fasterxml.jackson.databind.json.JsonMapper.builder()
        .build().readTree(n).get("metaData")
      val sch = org.apache.spark.sql.types.DataType
        .fromJson(md.get("schemaString").asText)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val ids = sch.fields.map(f => f.name ->
        f.metadata.getLong("delta.columnMapping.id")).toMap
      val nestedId = sch("arr").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
        .asInstanceOf[org.apache.spark.sql.types.StructType]("n")
        .metadata.getLong("delta.columnMapping.id")
      (ids, md.get("configuration")
        .get("delta.columnMapping.maxColumnId").asText.toLong, nestedId)
    }
    val (ids1, max1, nested1) = latestMeta()
    assert((ids1.values.toSeq :+ nested1).sorted == Seq(1L, 2L, 3L, 4L, 5L),
      s"ids must be sequential from 1, got $ids1 + nested $nested1")
    assert(max1 == 5L)
    val xId = ids1("x")
    t.dropColumn("x") // retires the column — its id must NEVER re-issue
    val (ids2, max2, nested2) = latestMeta()
    assert(!ids2.contains("x") && max2 == max1,
      s"maxColumnId must not decrease on drop: $max2 vs $max1")
    assert(ids2.forall { case (n, i) => ids1(n) == i },
      "surviving columns keep their ids across the rewrite")
    assert(nested2 == nested1,
      "an array-nested struct field keeps its id across the rewrite")
    t.addColumns(Seq(org.apache.spark.sql.types.StructField("y",
      org.apache.spark.sql.types.LongType)))
    val (ids3, max3, nested3) = latestMeta()
    assert(ids3("y") == max1 + 1 && max3 == max1 + 1 && nested3 == nested1,
      s"a new column takes maxColumnId+1 (never $xId): $ids3 max $max3")
    // and the mirrored log still round-trips
    def key(d: org.apache.spark.sql.DataFrame) = d.orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(key(DeltaLogBridge.read(spark, dir).select("day", "key")) ==
      key(t.read().select("day", "key")))
  }

  test("a RENAMED graft table exports as a reader-v2 name-mode log and round-trips") {
    val dir = tmpDir() + "/t"
    // a nested struct column rides along: the spec requires mapping
    // metadata on NESTED fields too (delta-spark validates it)
    val df = spark.range(10).select(($"id" % 2).as("day"), $"id".as("k"),
      struct($"id".as("inner")).as("s"))
    val t = CommitLogTable.create(spark, dir, df.schema, Seq("day"))
    t.append(df, recordChanges = false)
    t.renameColumn("k", "key") // live column mapping: key -> physical k
    assert(DeltaLogBridge.export(t) == t.resolvedManifest(None).files.size)
    val v0 = new String(Files.readAllBytes(Paths.get(dir,
      "_delta_log/00000000000000000000.json")), UTF_8)
    assert(v0.contains("\"minReaderVersion\":2"), v0)
    assert(v0.contains("delta.columnMapping.mode"), v0)
    assert(v0.contains("\"delta.columnMapping.physicalName\\\":\\\"k\\\""), v0)
    // nested fields are annotated too (spec-required; delta-spark checks)
    assert(v0.contains("\\\"inner\\\""), v0)
    val schemaStr = com.fasterxml.jackson.databind.json.JsonMapper
      .builder().build().readTree(v0.linesIterator
        .find(_.contains("metaData")).get)
      .get("metaData").get("schemaString").asText
    val exported = org.apache.spark.sql.types.DataType.fromJson(schemaStr)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val innerMeta = exported("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("inner").metadata
    assert(innerMeta.contains("delta.columnMapping.physicalName") &&
      innerMeta.contains("delta.columnMapping.id"),
      "nested struct fields must carry mapping metadata")
    val back = DeltaLogBridge.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("day", "key", "s"))
    assert(back.orderBy("key").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getStruct(2).getLong(0))).toSeq ==
      t.read().orderBy("key").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getStruct(2).getLong(0))).toSeq)
  }

  test("the mirror follows a RENAME (protocol upgrade + mapped metaData), no break") {
    val dir = tmpDir() + "/t"
    val df = spark.range(6).select(($"id" % 2).as("day"), $"id".as("k"))
    val t = CommitLogTable.create(spark, dir, df.schema, Seq("day"))
    t.setProperties(Map(DeltaLogBridge.MirrorProp -> "true"))
    t.append(df, recordChanges = false)
    assert(DeltaLogBridge.read(spark, dir).count() == 6)
    t.renameColumn("k", "key")
    assert(!Files.exists(Paths.get(dir, "_delta_log/_GRAFT_MIRROR_BROKEN")),
      "a rename must mirror as reader-v2 name mode, not break")
    val afterRename = DeltaLogBridge.read(spark, dir)
    assert(afterRename.schema.fieldNames.toSeq == Seq("day", "key"))
    // and the mirror keeps appending normally after the upgrade
    t.append(spark.range(100, 103).select(($"id" % 2).as("day"),
      $"id".as("key")), recordChanges = false)
    assert(DeltaLogBridge.read(spark, dir).count() == 9)
    // the upgrade commit carries the protocol action
    val renameCommit = new String(Files.readAllBytes(Paths.get(dir,
      f"_delta_log/${t.latestVersion - 1}%020d.json")), UTF_8)
    assert(renameCommit.contains("\"minReaderVersion\":2"), renameCommit)
  }

  test("unknown reader feature refuses loudly (never misread past it)") {
    val dir = tmpDir()
    v3Fixture(dir, Seq("someFutureFeature"))
    val e = intercept[IllegalArgumentException](DeltaLogBridge.read(spark, dir))
    assert(e.getMessage.contains("someFutureFeature"), e.getMessage)
  }

  test("reader v2 (implicit column mapping) reads when the mode is none/absent") {
    val dir = tmpDir()
    Seq(9L).toDF("k").coalesce(1).write.parquet(s"$dir/d1")
    val f1 = onePart(dir, "d1")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
         |{"metaData":{"id":"c0de","format":{"provider":"parquet","options":{}},"schemaString":${M(schemaJson)},"partitionColumns":["day"],"configuration":{},"createdTime":1}}
         |{"add":{"path":"$f1","partitionValues":{"day":"4"},"size":9,"modificationTime":1,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    assert(DeltaLogBridge.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((4L, 9L)))
  }

  test("v2 UUID checkpoint with sidecars seeds the state; JSON tail replays on top") {
    val dir = tmpDir()
    Seq(1L).toDF("k").coalesce(1).write.parquet(s"$dir/d1")
    Seq(2L).toDF("k").coalesce(1).write.parquet(s"$dir/d2")
    Seq(3L).toDF("k").coalesce(1).write.parquet(s"$dir/d3")
    val (f1, f2, f3) = (onePart(dir, "d1"), onePart(dir, "d2"), onePart(dir, "d3"))
    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir.resolve("_sidecars"))
    // sidecar parquet: the adds live HERE, not in the manifest
    def writeOneParquet[T <: Product : org.apache.spark.sql.Encoder](
        rows: Seq[T], target: java.nio.file.Path): Unit = {
      val tmp = Files.createTempDirectory("v2ck").toString
      rows.toDS().toDF().coalesce(1).write.parquet(tmp + "/p")
      val part = { val s = Files.list(Paths.get(tmp, "p"))
        try s.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally s.close() }
      Files.copy(part, target)
    }
    writeOneParquet(Seq(
      V2SidecarRow(Some(V2Add(f1, Map("day" -> "1"), 9, 1, true, None))),
      V2SidecarRow(Some(V2Add(f2, Map("day" -> "2"), 9, 1, true, None)))),
      logDir.resolve("_sidecars/part-0001.parquet"))
    writeOneParquet(Seq(
      V2ManifestRow(Some(V2Protocol(3, 7, Seq("v2Checkpoint"), Seq.empty)),
        None, None),
      V2ManifestRow(None, Some(V2Meta("feed", V2Format("parquet"),
        schemaJson, Seq("day"), Map.empty)), None),
      V2ManifestRow(None, None,
        Some(V2Sidecar("part-0001.parquet", 100L)))),
      logDir.resolve(
        "00000000000000000004.checkpoint.80a083e8-7026-4e79-81be-64bd76c43a11.parquet"))
    Files.write(logDir.resolve("_last_checkpoint"),
      """{"version":4,"size":3}""".getBytes(UTF_8))
    // a JSON tail past the checkpoint: v5 adds d3, removes d1
    Files.write(logDir.resolve("00000000000000000005.json"),
      (s"""{"add":{"path":"$f3","partitionValues":{"day":"3"},"size":9,"modificationTime":2,"dataChange":true}}
         |{"remove":{"path":"$f1","deletionTimestamp":2,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    val latest = DeltaLogBridge.read(spark, dir)
    assert(latest.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 2L), (3L, 3L)))
    // pinned at the checkpoint version itself
    assert(DeltaLogBridge.read(spark, dir, Some(4L)).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 2L)))
  }

  test("a HISTORICAL deletion vector whose .bin was vacuumed reads fine once purged; " +
      "pinning AT the DV-bearing version fails loudly (never resurrects rows)") {
    val dir = tmpDir()
    Seq(1L).toDF("k").coalesce(1).write.parquet(s"$dir/d1")
    Seq(2L).toDF("k").coalesce(1).write.parquet(s"$dir/d2")
    val (f1, f2) = (onePart(dir, "d1"), onePart(dir, "d2"))
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    // a plausible u-storage descriptor whose .bin was VACUUMED away —
    // the log is still readable wherever that DV is no longer live
    val goneDv = {
      val uuid = java.util.UUID.fromString(
        "99999999-8888-7777-6666-555544443333")
      s"""{"storageType":"u","pathOrInlineDv":"${graft.tables.DeletionVectors.z85Uuid(uuid)}","offset":1,"sizeInBytes":36,"cardinality":1}"""
    }
    // v0: a DV-bearing add; v1: REORG-style purge — the remove NAMES the
    // DV state it retires (the (path, uniqueId) action key), + clean re-add
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":[]}}
         |{"metaData":{"id":"dead","format":{"provider":"parquet","options":{}},"schemaString":${M(schemaJson)},"partitionColumns":["day"],"configuration":{},"createdTime":1}}
         |{"add":{"path":"$f1","partitionValues":{"day":"1"},"size":9,"modificationTime":1,"dataChange":true,"deletionVector":$goneDv}}
         |""".stripMargin).getBytes(UTF_8))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000001.json"),
      (s"""{"remove":{"path":"$f1","deletionTimestamp":2,"dataChange":true,"deletionVector":$goneDv}}
         |{"add":{"path":"$f2","partitionValues":{"day":"2"},"size":9,"modificationTime":2,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    // latest: the DV-bearing action is GONE — its .bin is never opened
    assert(DeltaLogBridge.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 2L)))
    // pinned AT the DV-bearing version: the missing .bin fails the read
    // loudly — serving the file without its DV would resurrect rows
    intercept[Exception](DeltaLogBridge.read(spark, dir, Some(0L)))
  }

  test("JSON-format v2 manifest (spec-legal .checkpoint.<uuid>.json) seeds with sidecars") {
    val dir = tmpDir()
    Seq(5L).toDF("k").coalesce(1).write.parquet(s"$dir/d5")
    val f5 = onePart(dir, "d5")
    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir.resolve("_sidecars"))
    val tmp = Files.createTempDirectory("v2jck").toString
    Seq(V2SidecarRow(Some(V2Add(f5, Map("day" -> "5"), 9, 1, true, None))))
      .toDS().toDF().coalesce(1).write.parquet(tmp + "/p")
    val part = { val s = Files.list(Paths.get(tmp, "p"))
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close() }
    Files.copy(part, logDir.resolve("_sidecars/sc-01.parquet"))
    Files.write(logDir.resolve(
      "00000000000000000007.checkpoint.3a7a0069-55ae-4860-bfbe-cd0799dfa0b9.json"),
      (s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":[]}}
         |{"metaData":{"id":"cafe","format":{"provider":"parquet","options":{}},"schemaString":${M(schemaJson)},"partitionColumns":["day"],"configuration":{},"createdTime":1}}
         |{"sidecar":{"path":"sc-01.parquet","sizeInBytes":100}}
         |""".stripMargin).getBytes(UTF_8))
    assert(DeltaLogBridge.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((5L, 5L)))
    // an absolute sidecar path refuses loudly rather than mangles
    Files.write(logDir.resolve(
      "00000000000000000007.checkpoint.3a7a0069-55ae-4860-bfbe-cd0799dfa0b9.json"),
      (s"""{"metaData":{"id":"cafe","format":{"provider":"parquet","options":{}},"schemaString":${M(schemaJson)},"partitionColumns":["day"],"configuration":{},"createdTime":1}}
         |{"sidecar":{"path":"/abs/sc-01.parquet","sizeInBytes":100}}
         |""".stripMargin).getBytes(UTF_8))
    val e = intercept[IllegalArgumentException](DeltaLogBridge.read(spark, dir))
    assert(e.getMessage.contains("_sidecars-relative"), e.getMessage)
  }

  test("multi-part classic checkpoint: all parts read, missing part falls back") {
    val dir = tmpDir()
    Seq(1L).toDF("k").coalesce(1).write.parquet(s"$dir/d1")
    Seq(2L).toDF("k").coalesce(1).write.parquet(s"$dir/d2")
    val (f1, f2) = (onePart(dir, "d1"), onePart(dir, "d2"))
    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir)
    def part(rows: Seq[CkptRow], name: String): Unit = {
      val tmp = Files.createTempDirectory("mpck").toString
      rows.toDS().toDF().coalesce(1).write.parquet(tmp + "/p")
      val p = { val s = Files.list(Paths.get(tmp, "p"))
        try s.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally s.close() }
      Files.copy(p, logDir.resolve(name))
    }
    part(Seq(
      CkptRow(Some(CkptProtocol(1, 2)), None, None),
      CkptRow(None, Some(CkptMeta(" 2par", CkptFormat("parquet"),
        schemaJson, Seq("day"))), None),
      CkptRow(None, None, Some(CkptAdd(f1, Map("day" -> "1"), 9, 1, true)))),
      "00000000000000000003.checkpoint.0000000001.0000000002.parquet")
    part(Seq(
      CkptRow(None, None, Some(CkptAdd(f2, Map("day" -> "2"), 9, 1, true)))),
      "00000000000000000003.checkpoint.0000000002.0000000002.parquet")
    Files.write(logDir.resolve("_last_checkpoint"),
      """{"version":3,"parts":2,"size":4}""".getBytes(UTF_8))
    assert(DeltaLogBridge.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 2L)))
    // delete one part: the incomplete part-set must not be used (and
    // with no JSON chain either, the read refuses)
    Files.delete(logDir.resolve(
      "00000000000000000003.checkpoint.0000000002.0000000002.parquet"))
    intercept[IllegalArgumentException](DeltaLogBridge.read(spark, dir))
  }

  test("scale: a many-partition snapshot reads through ONE FileScan node, byte-identical") {
    val dir = tmpDir() + "/t"
    val n = 1000
    val df = spark.range(n).select(($"id" % n).as("day"), $"id".as("k"),
      ($"id" * 0.5).as("v"))
    val t = CommitLogTable.create(spark, dir, df.schema, Seq("day"))
    t.append(df, recordChanges = false)
    assert(t.resolvedManifest(None).files.size == n)
    DeltaLogBridge.export(t)
    val back = DeltaLogBridge.read(spark, dir)
    val plan = back.queryExecution.executedPlan.toString
    // exactly one parquet scan — never a per-partition union
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"expected one FileScan over $n partitions:\n${plan.take(2000)}")
    def key(d: org.apache.spark.sql.DataFrame) = d.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(key(back) == key(t.read()))
  }

  test("lazy delete mirrors as a DV commit; OPTIMIZE mirrors as the DV-clearing rewrite") {
    val dir = tmpDir() + "/t"
    val df = spark.range(12).select(($"id" % 3).as("day"), $"id".as("k"))
    val t = CommitLogTable.create(spark, dir, df.schema, Seq("day"))
    t.setProperties(Map(DeltaLogBridge.MirrorProp -> "true"))
    t.append(df, recordChanges = false)
    assert(DeltaLogBridge.read(spark, dir).count() == 12)
    val marker = Paths.get(dir, "_delta_log/_GRAFT_MIRROR_BROKEN")
    t.deleteLazy("k = 0") // mirrors 1:1 as a deletion-vector swap
    assert(!Files.exists(marker),
      "the cheapest write verb must never pause the mirror")
    assert(DeltaLogBridge.read(spark, dir).count() == 11,
      "external readers must see the lazy delete immediately")
    // the commit carries the protocol upgrade + the DV action pair:
    // remove of the clean state, re-add with a u-storage descriptor
    val dvCommit = new String(Files.readAllBytes(Paths.get(dir,
      f"_delta_log/${t.latestVersion}%020d.json")), UTF_8)
    assert(dvCommit.contains("\"minReaderVersion\":3") &&
      dvCommit.contains("\"deletionVectors\""), dvCommit)
    assert(dvCommit.contains("\"storageType\":\"u\""), dvCommit)
    assert(dvCommit.contains("\"remove\""), dvCommit)
    // a SECOND lazy delete widens the DV: the remove must name the OLD
    // uniqueId (the (path, uniqueId) action key), the add the new one
    t.deleteLazy("k = 1")
    assert(!Files.exists(marker))
    assert(DeltaLogBridge.read(spark, dir).count() == 10)
    val widen = new String(Files.readAllBytes(Paths.get(dir,
      f"_delta_log/${t.latestVersion}%020d.json")), UTF_8)
    // the day=0 file was ALREADY marked ("k = 0") — ITS remove retires
    // the old DV state; the freshly-marked day=1 file removes clean
    assert(widen.linesIterator.exists(l => l.contains("\"remove\"") &&
      l.contains("__part=0") && l.contains("deletionVector")),
      s"the widening remove must carry the retired DV state:\n$widen")
    assert(widen.linesIterator.exists(l => l.contains("\"remove\"") &&
      l.contains("__part=1") && !l.contains("deletionVector")),
      s"a first-mark remove retires the CLEAN state (no DV):\n$widen")
    // OPTIMIZE materializes the marks → mirrors as remove-with-DV +
    // clean adds, and the mirror keeps following
    t.compact(1024L * 1024 * 1024)
    assert(!Files.exists(marker))
    assert(DeltaLogBridge.read(spark, dir).count() == 10)
    val opt = new String(Files.readAllBytes(Paths.get(dir,
      f"_delta_log/${t.latestVersion}%020d.json")), UTF_8)
    assert(opt.linesIterator.filter(_.contains("\"remove\""))
      .forall(_.contains("deletionVector")),
      s"the clearing rewrite must retire the DV-bearing states:\n$opt")
    assert(opt.linesIterator.filter(_.contains("\"add\""))
      .forall(!_.contains("deletionVector")),
      s"materialized files must re-add clean:\n$opt")
    t.append(spark.range(100, 103).select(($"id" % 3).as("day"), $"id".as("k")),
      recordChanges = false)
    assert(DeltaLogBridge.read(spark, dir).count() == 13)
  }

  test("mirror gap detection: a deleted Delta commit breaks the mirror instead of appending past it") {
    val dir = tmpDir() + "/t"
    val df = spark.range(6).select(($"id" % 2).as("day"), $"id".as("k"))
    val t = CommitLogTable.create(spark, dir, df.schema, Seq("day"))
    t.setProperties(Map(DeltaLogBridge.MirrorProp -> "true"))
    t.append(df, recordChanges = false)
    t.append(df.withColumn("k", $"k" + 10), recordChanges = false)
    t.append(df.withColumn("k", $"k" + 20), recordChanges = false)
    // sabotage: remove a MID-chain Delta commit (deleting the newest one
    // is harmless — deterministic translation just re-writes it; a hole
    // BELOW the mirrored head is the unrecoverable-by-append case)
    val victim = Paths.get(dir, "_delta_log/00000000000000000003.json")
    assert(Files.exists(victim))
    Files.delete(victim)
    t.append(df.withColumn("k", $"k" + 30), recordChanges = false)
    assert(Files.exists(Paths.get(dir, "_delta_log/_GRAFT_MIRROR_BROKEN")),
      "appending past a log gap would hand readers a log that skips commits")
    // the cure: any expressible commit re-seeds past the damage
    t.compact(1024L * 1024 * 1024)
    val healed = t.append(df.withColumn("k", $"k" + 40), recordChanges = false)
    assert(!Files.exists(Paths.get(dir, "_delta_log/_GRAFT_MIRROR_BROKEN")))
    assert(DeltaLogBridge.read(spark, dir).count() ==
      CommitLogTable.open(spark, dir).read().count())
    assert(healed > 0)
  }

  test("past the file-count threshold the mirror SEEDS a v2 manifest+sidecar checkpoint") {
    val dir = tmpDir() + "/t"
    val df = spark.range(64).select(($"id" % 16).as("day"), $"id".as("k"))
    val t = CommitLogTable.create(spark, dir, df.schema, Seq("day"))
    t.append(df, recordChanges = false) // 16 files, mirror not yet on
    t.setProperties(Map(DeltaLogBridge.MirrorProp -> "true",
      DeltaLogBridge.V2CheckpointMinFilesProp -> "8")) // seeds at head
    val logDir = Paths.get(dir, "_delta_log")
    val names = { val s = Files.list(logDir)
      try s.iterator().asScala.map(_.getFileName.toString).toVector
      finally s.close() }
    val V2Name = """\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet""".r
    val manifest = names.find(n => V2Name.pattern.matcher(n).matches())
    assert(manifest.isDefined, s"expected a v2 UUID manifest, got $names")
    assert(!names.exists(_.matches("""\d{20}\.checkpoint\.parquet""")),
      "past the threshold the seed must be v2, not classic")
    assert(Files.list(logDir.resolve("_sidecars")).count() >= 1)
    // the manifest protocol declares the gating feature
    val mfDf = spark.read.parquet(s"$dir/_delta_log/${manifest.get}")
    val prot = mfDf
      .selectExpr("protocol.minReaderVersion", "protocol.readerFeatures")
      .where("protocol IS NOT NULL").head()
    assert(prot.getInt(0) == 3 &&
      prot.getSeq[String](1).contains("v2Checkpoint"), prot.toString)
    // …and carries EXACTLY ONE checkpointMetadata action with the seed
    // version — the spec's v2 marker delta-spark's provider keys on
    val ckMeta = mfDf.selectExpr("checkpointMetadata.version")
      .where("checkpointMetadata IS NOT NULL").collect()
    assert(ckMeta.length == 1 && ckMeta.head.getLong(0) ==
      CommitLogTable.open(spark, dir).latestVersion, ckMeta.mkString(","))
    // the bridge's own reader round-trips the seed…
    def key(d: org.apache.spark.sql.DataFrame) = d.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(key(DeltaLogBridge.read(spark, dir)) == key(t.read()))
    // …and the seed is a recognized COMMIT POINT: later commits append
    // JSON on top instead of re-seeding or breaking
    t.append(spark.range(100, 104).select(($"id" % 16).as("day"),
      $"id".as("k")), recordChanges = false)
    assert(!Files.exists(logDir.resolve("_GRAFT_MIRROR_BROKEN")))
    assert(Files.exists(logDir.resolve(
      f"${t.latestVersion}%020d.json".replace("v", ""))) ||
      Files.exists(logDir.resolve(f"${t.latestVersion}%020d.json")))
    assert(key(DeltaLogBridge.read(spark, dir)) == key(t.read()))
    // a rename AFTER the v2 seed: the upgrade merges INTO the declared
    // protocol — columnMapping joins v2Checkpoint, never replaces it
    t.renameColumn("k", "key")
    val renameCommit = new String(Files.readAllBytes(logDir.resolve(
      f"${t.latestVersion}%020d.json")), UTF_8)
    assert(renameCommit.contains("\"minReaderVersion\":3") &&
      renameCommit.contains("v2Checkpoint") &&
      renameCommit.contains("columnMapping"), renameCommit)
    assert(DeltaLogBridge.read(spark, dir).schema.fieldNames.contains("key"))
  }

  test("field-id carry reads the v2 MANIFEST: a drop after a mapped v2 seed keeps maxColumnId") {
    val dir = tmpDir() + "/t"
    val df = spark.range(16).select(($"id" % 8).as("day"), $"id".as("k"),
      $"id".as("x"))
    val t = CommitLogTable.create(spark, dir, df.schema, Seq("day"))
    t.append(df, recordChanges = false) // 8 files, no mirror yet
    t.renameColumn("k", "key") // mapping exists BEFORE the seed
    t.setProperties(Map(DeltaLogBridge.MirrorProp -> "true",
      DeltaLogBridge.V2CheckpointMinFilesProp -> "4")) // MAPPED v2 seed
    // the only id/maxColumnId declaration lives in the v2 manifest —
    // the next metaData emission must carry it, not restart at 1
    t.dropColumn("x")
    val n = new String(Files.readAllBytes(Paths.get(dir,
      f"_delta_log/${t.latestVersion}%020d.json")), UTF_8)
      .linesIterator.find(_.contains("metaData")).get
    val md = com.fasterxml.jackson.databind.json.JsonMapper.builder()
      .build().readTree(n).get("metaData")
    val sch = org.apache.spark.sql.types.DataType
      .fromJson(md.get("schemaString").asText)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val ids = sch.fields.map(f => f.name ->
      f.metadata.getLong("delta.columnMapping.id")).toMap
    val maxId = md.get("configuration")
      .get("delta.columnMapping.maxColumnId").asText.toLong
    assert(ids == Map("day" -> 1L, "key" -> 2L),
      s"ids must carry from the v2 manifest, got $ids")
    assert(maxId == 3L,
      s"maxColumnId must stay at the v2 manifest's 3 (x retired), got $maxId")
    assert(DeltaLogBridge.read(spark, dir).count() == 16)
  }

  test("racing first catch-ups under the LEASE coordinator seed one consistent mirror") {
    val dir = tmpDir() + "/t"
    val df = spark.range(8).select(($"id" % 2).as("day"), $"id".as("k"))
    val t1 = CommitLogTable.create(spark, dir, df.schema, Seq("day"))
    t1.append(df, recordChanges = false)
    val t2 = CommitLogTable.open(spark, dir)
    // object-store posture: no atomic create — both handles arbitrate
    // through lease claims only
    t1.coordinator = new LeaseCoordinator(settleMillis = 30L)
    t2.coordinator = new LeaseCoordinator(settleMillis = 30L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val f1 = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = DeltaLogBridge.mirrorCatchUp(t1) })
      val f2 = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = DeltaLogBridge.mirrorCatchUp(t2) })
      assert(Set(f1.get(), f2.get()) == Set(1L),
        "both racers must converge on the seeded head")
    } finally pool.shutdown()
    // exactly one committed seed: _last_checkpoint names an existing
    // classic checkpoint, and the read serves the table
    val lc = new String(Files.readAllBytes(
      Paths.get(dir, "_delta_log/_last_checkpoint")), UTF_8)
    assert(lc.contains("\"version\":1"), lc)
    assert(Files.exists(Paths.get(dir,
      "_delta_log/00000000000000000001.checkpoint.parquet")))
    assert(DeltaLogBridge.read(spark, dir).count() == 8)
    // later commits keep appending 1:1 through the lease coordinator too
    t1.append(df.withColumn("k", $"k" + 50), recordChanges = false)
    DeltaLogBridge.mirrorCatchUp(t1)
    assert(DeltaLogBridge.read(spark, dir).count() == 16)
  }

  test("mirror checkpoint cadence: every Nth mirrored commit also writes " +
      "a checkpoint, so readers never replay an unbounded json chain — " +
      "and a cadence checkpoint NEVER downgrades the declared protocol") {
    val dir = tmpDir() + "/t"
    val df0 = spark.range(2).select($"id".as("k"))
    val t = CommitLogTable.create(spark, dir, df0.schema)
    t.setProperties(Map(DeltaLogBridge.MirrorProp -> "true",
      DeltaLogBridge.CheckpointIntervalProp -> "4")) // v1: seeds
    t.append(df0, recordChanges = false) // v2
    t.deleteLazy("k = 0") // v3: mirrors as a DV commit → declares (3,7)
    t.compact(1L << 30) // v4: materializes the mark — snapshot is clean
    (5 to 10).foreach(i =>
      t.append(df0.withColumn("k", $"k" + i * 10), recordChanges = false))
    assert(t.latestVersion == 10L)
    // v4/v8 cadence checkpoints were written AFTER the marks cleared —
    // their protocol must still carry the DECLARED (3,7 deletionVectors)
    // state: the protocol has no downgrade action, and a reader seeding
    // from the checkpoint must not replay any DV artifact un-upgraded
    val ck8 = spark.read.parquet(
      dir + "/_delta_log/00000000000000000008.checkpoint.parquet")
    val proto = ck8.select("protocol").where("protocol IS NOT NULL")
      .collect()
    assert(proto.length == 1)
    val p = proto.head.getStruct(0)
    assert(p.getInt(p.fieldIndex("minReaderVersion")) == 3, p.toString)
    assert(p.getSeq[String](p.fieldIndex("readerFeatures"))
      .contains("deletionVectors"), p.toString)
    // cadence checkpoints landed at the multiples of 4 past the seed
    assert(Files.exists(Paths.get(dir,
      "_delta_log/00000000000000000004.checkpoint.parquet")))
    assert(Files.exists(Paths.get(dir,
      "_delta_log/00000000000000000008.checkpoint.parquet")))
    // the hint follows the newest one
    val hint = new String(Files.readAllBytes(
      Paths.get(dir, "_delta_log/_last_checkpoint")), UTF_8)
    assert(hint.contains("\"version\":8"), hint)
    // an external reader seeded at the cadence checkpoint sees the full
    // table even with the pre-checkpoint jsons vacuumed away
    (1L to 7L).foreach(v => Files.deleteIfExists(
      Paths.get(dir, f"_delta_log/$v%020d.json")))
    assert(DeltaLogBridge.read(spark, dir).count() == t.read().count())
    assert(DeltaLogBridge.read(spark, dir).orderBy("k").collect().toSeq ==
      t.read().orderBy("k").collect().toSeq)
  }

  test("mirror log retention: old jsons and checkpoints drop at checkpoint " +
      "time; the kept checkpoint's STORED protocol prevents a downgrade " +
      "after the declaring json is gone") {
    val dir = tmpDir() + "/t"
    val df0 = spark.range(2).select($"id".as("k"))
    val t = CommitLogTable.create(spark, dir, df0.schema)
    t.setProperties(Map(DeltaLogBridge.MirrorProp -> "true",
      DeltaLogBridge.CheckpointIntervalProp -> "3",
      DeltaLogBridge.LogRetainCheckpointsProp -> "1")) // v1: seeds
    t.append(df0, recordChanges = false) // v2
    t.deleteLazy("k = 0") // v3: DV commit declares (3,7); cadence ckpt at 3
    t.compact(1L << 30) // v4
    (5 to 9).foreach(i =>
      t.append(df0.withColumn("k", $"k" + i * 10), recordChanges = false))
    // cadence checkpoints landed at 3, 6, 9; retention keeps ONLY the
    // newest — jsons and checkpoints below 9 are gone
    val logDir = Paths.get(dir, "_delta_log")
    import scala.jdk.CollectionConverters._
    val names = { val s = Files.list(logDir)
      try s.iterator().asScala.map(_.getFileName.toString).toVector
      finally s.close() }
    assert(!names.exists(_.matches("""0{17}00[1-8]\.json""")), names.sorted)
    assert(names.contains("00000000000000000009.json"))
    assert(names.count(_.contains(".checkpoint.")) == 1, names.sorted)
    // reads still serve, byte-parity with the table
    assert(DeltaLogBridge.read(spark, dir).orderBy("k").collect().toSeq ==
      t.read().orderBy("k").collect().toSeq)
    // the v3 json that DECLARED deletionVectors is vacuumed — a new DV
    // commit must still see (3,7) as declared (the kept checkpoint's
    // stored protocol), emitting NO downgrade and NO redundant upgrade
    t.deleteLazy("k = 50") // v10 (k=50 exists — a no-match lazy delete
                           // would be a stats-pruned no-op commit)
    val v10 = new String(Files.readAllBytes(
      logDir.resolve("00000000000000000010.json")), UTF_8)
    assert(!v10.contains("\"protocol\""),
      s"no protocol action expected (already declared): $v10")
    assert(DeltaLogBridge.read(spark, dir).orderBy("k").collect().toSeq ==
      t.read().orderBy("k").collect().toSeq)
  }
}
