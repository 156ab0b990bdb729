package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.{CommitLogTable, DeltaLogBridge}

/** `CommitLogTable.convertFromDelta` — zero-copy adoption of an
  * existing DELTA table via its log (the reference's Bronze tables ARE
  * Delta tables; this is the migration verb a switching user runs
  * first — `docs/databricks_setup.md`). The live file set comes from
  * the replayed log, never a directory walk: tombstoned files must not
  * resurrect. Delta files do not carry partition columns physically,
  * so adoption exercises the manifest-valued column machinery
  * end-to-end.
  */
class DeltaConvertSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-delta-convert").toString

  private def onePart(dir: String, sub: String): String = {
    val s = Files.list(Paths.get(dir, sub))
    try s"$sub/" + s.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get.getFileName
    finally s.close()
  }

  /** Two-version day-partitioned fixture (files OMIT the day column,
    * Delta's layout): v0 adds d1+d2, v1 replaces d2's file — so the
    * directory holds THREE parquet files but only two are live.
    */
  private def buildFixture(dir: String): Unit = {
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1)
      .write.parquet(s"$dir/d1")
    Seq((3L, "c")).toDF("k", "s").coalesce(1)
      .write.parquet(s"$dir/d2")
    Seq((30L, "z"), (31L, "y")).toDF("k", "s").coalesce(1)
      .write.parquet(s"$dir/d2b")
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType))).json
      .replace("\"", "\\\"")
    val (f1, f2, f2b) =
      (onePart(dir, "d1"), onePart(dir, "d2"), onePart(dir, "d2b"))
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"f00d","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":["day"],"configuration":{},"createdTime":1700000000000}}
         |{"add":{"path":"$f1","partitionValues":{"day":"1"},"size":100,"modificationTime":1700000000000,"dataChange":true}}
         |{"add":{"path":"$f2","partitionValues":{"day":"2"},"size":100,"modificationTime":1700000000000,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000001.json"),
      (s"""{"remove":{"path":"$f2","deletionTimestamp":1700000001000,"dataChange":true}}
         |{"add":{"path":"$f2b","partitionValues":{"day":"2"},"size":100,"modificationTime":1700000001000,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
  }

  test("adopt a Delta table: live files only, log-sourced partition values, " +
      "typed column, pruning, and full table services after") {
    val dir = tmpDir()
    buildFixture(dir)
    val expected = DeltaLogBridge.read(spark, dir)
      .orderBy("k").collect().toSeq
    val t = CommitLogTable.convertFromDelta(spark, dir)
    val m = t.resolvedManifest(None)
    // two LIVE files adopted — the tombstoned d2 file must NOT resurrect
    assert(m.action == "convert" && m.files.size == 2 && m.rowsTotal == 4)
    assert(m.partitionCols == Seq("day"))
    // the partition column keeps its LOGGED type (LONG, not a string)
    assert(m.schema("day").dataType.typeName == "long")
    // every adopted file serves day from the manifest + synthetic stat
    assert(m.files.forall(_.manifestVals.keySet == Set("day")))
    assert(m.files.forall(f => f.stats.get("day").exists(s => s._1 == s._2)))
    // row parity with the bridge's own read
    assert(t.read().orderBy("k").collect().toSeq == expected)
    // DSv2 plane: values attach, a day predicate file-prunes
    val v2 = spark.read.format("commitlog").load(dir).filter($"day" === 2L)
    assert(v2.select(sum($"k")).head().getLong(0) == 61)
    assert(v2.queryExecution.executedPlan.toString.contains("files=1/2"))
    // full citizen: merge + time travel across the convert
    t.merge(Seq((2L, 30L, "Z")).toDF("day", "k", "s"), Seq("k"),
      Seq(col("day"), col("s")))
    assert(t.read().filter($"k" === 30L).head().getString(2) == "Z")
    assert(t.read(Some(1L)).filter($"k" === 30L).head().getString(2) == "z")
  }

  test("a NOT NULL partition column adopts and still serves manifest " +
      "values: the data-side binding must stay nullable or codegen " +
      "never falls through the coalesce") {
    val dir = tmpDir()
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1)
      .write.parquet(s"$dir/d1")
    Seq((3L, "c")).toDF("k", "s").coalesce(1)
      .write.parquet(s"$dir/d2")
    // Delta schemas routinely declare partition columns NOT NULL —
    // the physical read of the (absent) column is still all-NULL
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType))).json
      .replace("\"", "\\\"")
    val (f1, f2) = (onePart(dir, "d1"), onePart(dir, "d2"))
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"f00e","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":["day"],"configuration":{},"createdTime":1700000000000}}
         |{"add":{"path":"$f1","partitionValues":{"day":"1"},"size":100,"modificationTime":1700000000000,"dataChange":true}}
         |{"add":{"path":"$f2","partitionValues":{"day":"2"},"size":100,"modificationTime":1700000000000,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    val t = CommitLogTable.convertFromDelta(spark, dir)
    // DSv2 plane: the attached values must surface (not 0/garbage from
    // a non-nullable binding whose null bit codegen never consults)
    val got = spark.read.format("commitlog").load(dir)
      .select("day", "k").orderBy("k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == Seq(1L -> 1L, 1L -> 2L, 2L -> 3L), got.toString)
    // DataFrame plane agrees
    assert(t.read().select("day", "k").orderBy("k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq == got)
    // a lazy-delete mark referencing the NOT NULL attached column
    // evaluates over the manifest value on the DSv2 plane too
    t.deleteLazy("day = 2")
    assert(spark.read.format("commitlog").load(dir).count() == 2)
  }

  test("version pin adopts the PINNED file set") {
    val dir = tmpDir()
    buildFixture(dir)
    val t = CommitLogTable.convertFromDelta(spark, dir, Some(0L))
    assert(t.read().orderBy("k").as[(Long, Long, String)].collect().toSeq ==
      Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 3L, "c")))
  }

  test("plain convert still refuses a _delta_log dir; convertFromDelta " +
      "refuses an existing table and a vacuumed live file") {
    val dir = tmpDir()
    buildFixture(dir)
    val e = intercept[IllegalArgumentException](
      CommitLogTable.convert(spark, dir))
    assert(e.getMessage.contains("_delta_log"), e.getMessage)
    CommitLogTable.convertFromDelta(spark, dir)
    val e2 = intercept[IllegalArgumentException](
      CommitLogTable.convertFromDelta(spark, dir))
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    // a live file the log references but the disk lost (vacuumed by a
    // foreign writer / torn copy) refuses with the path named
    val dir2 = tmpDir()
    buildFixture(dir2)
    val gone = Files.walk(Paths.get(dir2, "d2b")).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.delete(gone)
    val e3 = intercept[IllegalArgumentException](
      CommitLogTable.convertFromDelta(spark, dir2))
    assert(e3.getMessage.contains("missing or not parquet"), e3.getMessage)
  }

  test("live deletion vectors ADOPT as merge-on-read state: both read " +
      "planes filter, OPTIMIZE materializes with CDF delete images and " +
      "mirrors the DV-clearing rewrite; an unresolvable DV refuses") {
    import graft.tables.{DeletionVectors => DV}
    val dir = tmpDir()
    buildFixture(dir) // d1 holds (k=1,"a"),(k=2,"b") at row indexes 0,1
    val f1 = onePart(dir, "d1")
    // v2: Delta DELETEd k=1 — a DV marking row index 0 of d1's file
    val bm = DV.serializeBitmap(Iterator(0L))
    val dv = s"""{"storageType":"i","pathOrInlineDv":"${DV.z85EncodePadded(bm)}","sizeInBytes":${bm.length},"cardinality":1}"""
    Files.write(Paths.get(dir, "_delta_log/00000000000000000002.json"),
      (s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}
         |{"remove":{"path":"$f1","deletionTimestamp":1700000002000,"dataChange":true}}
         |{"add":{"path":"$f1","partitionValues":{"day":"1"},"size":100,"modificationTime":1700000002000,"dataChange":true,"deletionVector":$dv}}
         |""".stripMargin).getBytes(UTF_8))
    val expected = DeltaLogBridge.read(spark, dir)
      .orderBy("k").collect().toSeq
    val t = CommitLogTable.convertFromDelta(spark, dir)
    val m = t.resolvedManifest(None)
    assert(m.files.count(_.adoptedDv.isDefined) == 1)
    // row parity with the bridge's own DV-filtered read, BOTH planes
    assert(t.read().orderBy("k").collect().toSeq == expected)
    assert(spark.read.format("commitlog").load(dir)
      .orderBy("k").collect().toSeq == expected)
    assert(!expected.exists(_.getLong(1) == 1L), "k=1 is deleted")
    // pruning predicates still work alongside the DV filter
    assert(spark.read.format("commitlog").load(dir)
      .filter($"k" >= 2L).count() == 3)
    // mirror continues the original log; OPTIMIZE materializes the DV
    // and mirrors as the DV-clearing rewrite (remove names the old
    // uniqueId, the new add carries none)
    t.setProperties(Map(DeltaLogBridge.MirrorProp -> "true"))
    t.compact(targetFileBytes = 1L << 30)
    val m2 = t.resolvedManifest(None)
    assert(m2.files.forall(_.adoptedDv.isEmpty))
    assert(t.read().orderBy("k").collect().toSeq == expected)
    // the materializing compact stamped the deferred CDF delete image
    val cdf = t.readChanges(m2.version, m2.version)
      .filter($"_change_type" === "delete").collect()
    assert(cdf.map(_.getAs[Long]("k")).toSeq == Seq(1L), cdf.toSeq.toString)
    // external Delta readers of the continued log agree after the rewrite
    assert(DeltaLogBridge.read(spark, dir).orderBy("k").collect().toSeq ==
      expected)
    // a SHALLOW CLONE taken while DVs were live re-scopes u-storage
    // descriptors to the source's absolute .bin (protocol p storage) —
    // the clone reads filtered without copying a byte
    val dirPreClone = tmpDir()
    buildFixture(dirPreClone)
    val h1 = onePart(dirPreClone, "d1")
    // u-storage this time — the clone must RE-SCOPE the table-relative
    // descriptor, not just copy it
    val uUuid = java.util.UUID.randomUUID()
    val uOff = DV.writeFile(graft.tables.GPath(dirPreClone,
      s"deletion_vector_$uUuid.bin"), Seq(bm)).head
    val uDv = s"""{"storageType":"u","pathOrInlineDv":"${DV.z85Uuid(uUuid)}","offset":$uOff,"sizeInBytes":${bm.length},"cardinality":1}"""
    Files.write(Paths.get(dirPreClone, "_delta_log/00000000000000000002.json"),
      (s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}
         |{"remove":{"path":"$h1","deletionTimestamp":1700000002000,"dataChange":true}}
         |{"add":{"path":"$h1","partitionValues":{"day":"1"},"size":100,"modificationTime":1700000002000,"dataChange":true,"deletionVector":$uDv}}
         |""".stripMargin).getBytes(UTF_8))
    val tSrc = CommitLogTable.convertFromDelta(spark, dirPreClone)
    // a STREAMING read of the LIVE-DV adopted table filters too — the
    // stream's reader factory is the same DV-aware assembly
    val streamOut = tmpDir()
    val q = spark.readStream.format("commitlog")
      .option("path", dirPreClone)
      .load().writeStream.format("parquet")
      .option("path", streamOut + "/out")
      .option("checkpointLocation", streamOut + "/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    assert(spark.read.parquet(streamOut + "/out")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      expected.map(_.getLong(1)).sorted)
    val cloneDir = tmpDir() + "/clone"
    val tClone = tSrc.shallowCloneTo(cloneDir)
    assert(tClone.read().orderBy("k").collect().map(_.getLong(1)).toSeq ==
      expected.map(_.getLong(1)))
    assert(spark.read.format("commitlog").load(cloneDir)
      .orderBy("k").collect().map(_.getLong(1)).toSeq ==
      expected.map(_.getLong(1)))

    // an unresolvable DV fails the ADOPTION, not a later read
    val dir2 = tmpDir()
    buildFixture(dir2)
    val g1 = onePart(dir2, "d1")
    Files.write(Paths.get(dir2, "_delta_log/00000000000000000002.json"),
      (s"""{"remove":{"path":"$g1","deletionTimestamp":1700000002000,"dataChange":true}}
         |{"add":{"path":"$g1","partitionValues":{"day":"1"},"size":100,"modificationTime":1700000002000,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"xxxx","offset":1,"sizeInBytes":8,"cardinality":1}}}
         |""".stripMargin).getBytes(UTF_8))
    val e = intercept[IllegalArgumentException](
      CommitLogTable.convertFromDelta(spark, dir2))
    assert(e.getMessage.contains("deletion vector"), e.getMessage)
    // the PINNED pre-DV version still adopts
    val t2 = CommitLogTable.convertFromDelta(spark, dir2, Some(1L))
    assert(t2.read().count() == 4)
  }

  test("column mapping modes name AND id adopt (logical names surface, " +
      "physical names read); an id-mode file whose field ids diverge " +
      "from the physical names refuses") {
    val dir = tmpDir()
    // files under PHYSICAL column names
    Seq((1L, "a"), (2L, "b")).toDF("col-k1", "col-s1").coalesce(1)
      .write.parquet(s"$dir/d1")
    val f1 = onePart(dir, "d1")
    def meta(k: String, phys: String, id: Int) =
      org.apache.spark.sql.types.Metadata.fromJson(
        s"""{"delta.columnMapping.physicalName":"$phys",
           |"delta.columnMapping.id":$id}""".stripMargin)
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType, nullable = true,
        meta("k", "col-k1", 1)),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType, nullable = true,
        meta("s", "col-s1", 2)))).json.replace("\"", "\\\"")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    def writeV0(mode: String): Unit =
      Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
        (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
           |{"metaData":{"id":"f00d","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"$mode","delta.columnMapping.maxColumnId":"2"},"createdTime":1700000000000}}
           |{"add":{"path":"$f1","partitionValues":{},"size":100,"modificationTime":1700000000000,"dataChange":true}}
           |""".stripMargin).getBytes(UTF_8))
    // mode id adopts when field-id resolution provably equals name
    // resolution (this file carries no field ids → names govern)
    writeV0("id")
    val tId = CommitLogTable.convertFromDelta(spark, dir)
    assert(tId.resolvedManifest(None).columnMapping ==
      Map("k" -> "col-k1", "s" -> "col-s1"))
    assert(tId.read().orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // a file binding a declared field id to a DIFFERENT name refuses —
    // name resolution would read the wrong column
    Files.walk(Paths.get(dir)).iterator().asScala.toVector
      .filter(p => p.toString.contains("_graft_log"))
      .sortBy(-_.toString.length).foreach(Files.deleteIfExists(_))
    val divergent = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("col-other",
        org.apache.spark.sql.types.LongType, nullable = true,
        org.apache.spark.sql.types.Metadata.fromJson(
          """{"parquet.field.id":1}"""))))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        Seq(org.apache.spark.sql.Row(9L)).asJava), divergent)
      .coalesce(1).write.parquet(s"$dir/d2")
    val f2 = onePart(dir, "d2")
    Files.write(Paths.get(dir, "_delta_log/00000000000000000001.json"),
      (s"""{"add":{"path":"$f2","partitionValues":{},"size":100,"modificationTime":1700000001000,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    val eId = intercept[IllegalArgumentException](
      CommitLogTable.convertFromDelta(spark, dir))
    assert(eId.getMessage.contains("field id"), eId.getMessage)
    // back to the clean v0 log for the name-mode half
    Files.delete(Paths.get(dir, "_delta_log/00000000000000000001.json"))
    writeV0("name")
    val t = CommitLogTable.convertFromDelta(spark, dir)
    val m = t.resolvedManifest(None)
    // the adopting table's OWN column mapping carries the physical names;
    // the stored schema is annotation-free
    assert(m.columnMapping == Map("k" -> "col-k1", "s" -> "col-s1"))
    assert(m.schema.fields.forall(f =>
      !f.metadata.contains("delta.columnMapping.physicalName")))
    assert(t.read().orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    assert(spark.read.format("commitlog").load(dir)
      .filter($"s" === "b").count() == 1)
  }

  test("adoption IMPORTS the table's metadata: CHECK constraints " +
      "enforce, TBLPROPERTIES carry (CDF stays on through the " +
      "migration), generated/identity columns keep working") {
    val dir = tmpDir()
    Seq((1L, 5L, 6L)).toDF("id", "k", "day").coalesce(1)
      .write.parquet(s"$dir/d1")
    val f1 = onePart(dir, "d1")
    def meta(json: String) =
      org.apache.spark.sql.types.Metadata.fromJson(json)
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = true,
        meta("""{"delta.identity.start":1,"delta.identity.step":1,
               |"delta.identity.allowExplicitInsert":false,
               |"delta.identity.highWaterMark":1}""".stripMargin)),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.LongType, nullable = true,
        meta("""{"delta.generationExpression":"k + 1"}"""))))
      .json.replace("\"", "\\\"")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":6}}
         |{"metaData":{"id":"f00f","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{"delta.constraints.k_pos":"k > 0","team":"data-eng","delta.enableChangeDataFeed":"true"},"createdTime":1700000000000}}
         |{"add":{"path":"$f1","partitionValues":{},"size":100,"modificationTime":1700000000000,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    val t = CommitLogTable.convertFromDelta(spark, dir)
    assert(t.constraints == Map("k_pos" -> "k > 0"))
    assert(t.properties.get("team").contains("data-eng"))
    assert(t.properties.get("delta.enableChangeDataFeed").contains("true"))
    assert(t.properties.get("graft.generated.day").contains("k + 1"))
    assert(t.properties.get("graft.identity.id").contains("1,1,false"))
    assert(t.properties.get("graft.identity.id.highWater").contains("1"))
    // the stored schema is annotation-free (specs live as properties)
    assert(t.resolvedManifest(None).schema.fields.forall(f =>
      !f.metadata.contains("delta.generationExpression") &&
        !f.metadata.contains("delta.identity.start")))
    // generated + identity FILL on the adopted table's first append
    t.setProperties(Map(DeltaLogBridge.MirrorProp -> "true")) // v1
    t.append(Seq(7L).toDF("k")) // v2: id allocates past 1, day computes
    val row = t.read().filter($"k" === 7L).head()
    assert(row.getLong(0) == 2L, s"identity continues past the " +
      s"imported high-water: $row")
    assert(row.getLong(2) == 8L, s"generated day = k + 1: $row")
    // the imported CHECK refuses a violating write, like a native one
    val e = intercept[Exception](t.append(Seq(-3L).toDF("k")))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(_.contains("k_pos"))),
      e.getMessage)
    // CDF continuity: the imported flag keeps the CONTINUED log
    // emitting cdc for change-bearing commits
    t.update($"k" === 5L, Map("k" -> lit(9L))) // v3
    val v3 = new String(Files.readAllBytes(
      Paths.get(dir, "_delta_log/00000000000000000003.json")), UTF_8)
    assert(v3.contains("\"cdc\""), v3)
  }

  test("a checkpoint-seeded log (json history vacuumed) adopts from the " +
      "checkpoint state") {
    val dir = tmpDir()
    buildFixture(dir)
    // checkpoint the v1 live state (f1 day=1, f2b day=2), then vacuum
    // the json chain — the shape a long-lived Databricks table ships in
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
      CkptRow(None, None, Some(CkptAdd(onePart(dir, "d1"),
        Map("day" -> "1"), 100L, 1L, dataChange = false))),
      CkptRow(None, None, Some(CkptAdd(onePart(dir, "d2b"),
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
    Files.delete(Paths.get(dir, "_delta_log/00000000000000000000.json"))
    Files.delete(Paths.get(dir, "_delta_log/00000000000000000001.json"))
    val t = CommitLogTable.convertFromDelta(spark, dir)
    assert(t.latestVersion == 1L)
    assert(t.read().orderBy("k").as[(Long, Long, String)].collect().toSeq ==
      Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 30L, "z"), (2L, 31L, "y")))
  }

  test("genesis lands AT the adopted Delta version; enabling the mirror " +
      "CONTINUES the original _delta_log at N+1") {
    val dir = tmpDir()
    buildFixture(dir) // Delta head = 1
    val t = CommitLogTable.convertFromDelta(spark, dir)
    assert(t.latestVersion == 1L, "convert manifest lands at the Delta head")
    // graft time travel starts at the adopted version, like a vacuumed log
    intercept[Exception](t.read(Some(0L)).collect())
    // graft v2 (the property commit) and v3 (an append) mirror as Delta
    // v2/v3 APPENDED to the original log — no reseed, no fork
    t.setProperties(Map(DeltaLogBridge.MirrorProp -> "true"))
    t.append(Seq((3L, 40L, "w")).toDF("day", "k", "s"))
    assert(Files.exists(
      Paths.get(dir, "_delta_log/00000000000000000002.json")))
    assert(Files.exists(
      Paths.get(dir, "_delta_log/00000000000000000003.json")))
    assert(!Files.exists(Paths.get(dir, "_delta_log/_GRAFT_MIRROR_BROKEN")))
    // an external Delta reader of the SAME log sees graft's writes…
    assert(DeltaLogBridge.read(spark, dir).orderBy("k").collect().toSeq ==
      t.read().orderBy("k").collect().toSeq)
    // …and the PRE-adoption history stays time-travelable via the log
    assert(DeltaLogBridge.read(spark, dir, Some(0L)).count() == 3)
    // a version-pinned adoption does NOT version-align with the log's
    // head: the mirror refuses to append (no alignment proof), then
    // self-cures by CHECKPOINT once the graft head passes the stale
    // tail — jsons below a checkpoint never replay on top of it
    val dir2 = tmpDir()
    buildFixture(dir2)
    val t2 = CommitLogTable.convertFromDelta(spark, dir2, Some(0L))
    t2.setProperties(Map(DeltaLogBridge.MirrorProp -> "true")) // graft v1
    assert(Files.exists(Paths.get(dir2, "_delta_log/_GRAFT_MIRROR_BROKEN")),
      "no append without an alignment proof")
    t2.append(Seq((9L, 90L, "x")).toDF("day", "k", "s")) // graft v2 > stale 1
    assert(!Files.exists(Paths.get(dir2, "_delta_log/_GRAFT_MIRROR_BROKEN")),
      "reseed cures once head passes the stale tail")
    assert(DeltaLogBridge.read(spark, dir2).orderBy("k").collect().toSeq ==
      t2.read().orderBy("k").collect().toSeq)
  }

  test("SQL spelling: CONVERT TO COMMITLOG delta.`path` [VERSION AS OF n]") {
    val cat = "graftsqlconvdelta"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.CommitLogCatalog].getName)
    val root = tmpDir()
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
    val prev = spark.catalog.currentCatalog()
    spark.catalog.setCurrentCatalog(cat)
    try {
      val dir = tmpDir() + "/t"
      buildFixture(dir)
      val out = spark.sql(s"CONVERT TO COMMITLOG delta.`$dir` VERSION AS OF 0")
        .collect()
      assert(out.head.getInt(1) == 2 && out.head.getLong(2) == 3L,
        out.mkString(","))
      // PARTITIONED BY contradicts a delta source: not ours, stock error
      val dir2 = tmpDir() + "/t2"
      buildFixture(dir2)
      intercept[Exception](spark.sql(
        s"CONVERT TO COMMITLOG delta.`$dir2` PARTITIONED BY (day)"))
    } finally spark.catalog.setCurrentCatalog(prev)
  }
}
