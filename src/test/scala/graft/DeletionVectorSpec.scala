package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.{DeletionVectors => DV, DeltaLogBridge}

/** Deletion vectors, end to end against the public protocol spec
  * (PROTOCOL.md "Deletion Vectors"): the Z85 codec, the 64-bit portable
  * RoaringBitmap framing, the `.bin` file layout with offsets and
  * CRC-32, and the bridge READ path — inline and u-storage descriptors,
  * (path, uniqueId) action keying, time travel across the DV commit,
  * and checkpoint-sourced DVs. Reference anchor: Databricks enables DVs
  * by default since DBR 14, so the reference's own Bronze tables
  * (`bronze_prices_auto_loader.ipynb` cell 4) carry them after any
  * UPDATE/DELETE/MERGE.
  */
class DeletionVectorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-dv").toString

  private def onePart(dir: String, sub: String): String = {
    val s = Files.list(Paths.get(dir, sub))
    val f = try s.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    s"$sub/${f.getFileName}"
  }

  private def M(s: String): String =
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .writeValueAsString(s)

  private val schemaJson = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k",
      org.apache.spark.sql.types.LongType))).json

  // ------------------------------------------------------------ z85

  test("z85 matches the ZeroMQ reference vector and round-trips") {
    // the spec's own test case: 86 4F D2 6F B5 59 F7 5B <-> HelloWorld
    val helloWorld = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(DV.z85Encode(helloWorld) == "HelloWorld")
    assert(DV.z85Decode("HelloWorld").toSeq == helloWorld.toSeq)
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { i =>
      val b = Array.fill(4 * i)(rnd.nextInt().toByte)
      assert(DV.z85Decode(DV.z85Encode(b)).toSeq == b.toSeq)
    }
    val u = new java.util.UUID(0x0123456789abcdefL, 0xfedcba9876543210L)
    assert(DV.z85Uuid(u).length == 20)
    assert(DV.uuidFromZ85(DV.z85Uuid(u)) == u)
    intercept[IllegalArgumentException](DV.z85Decode("~~~~~"))
  }

  test("bitmap round-trips across 32-bit bucket boundaries; magic is enforced") {
    val idx = Seq(0L, 1L, 5L, 4095L, 4096L, 70000L,
      (1L << 32) + 7L, (3L << 32) + 42L)
    val bytes = DV.serializeBitmap(idx.iterator)
    val r = DV.Resolved(DV.deserializeBitmap(bytes))
    idx.foreach(i => assert(r.contains(i), s"missing $i"))
    Seq(2L, 4094L, 1L << 32, (2L << 32) + 1L).foreach(i =>
      assert(!r.contains(i), s"phantom $i"))
    assert(r.cardinality == idx.size)
    // dense bucket keys 0..3 are written even though 2 is empty
    val empty = DV.serializeBitmap(Iterator.empty)
    assert(DV.Resolved(DV.deserializeBitmap(empty)).cardinality == 0)
    bytes(0) = (bytes(0) ^ 1).toByte
    val e = intercept[IllegalArgumentException](DV.deserializeBitmap(bytes))
    assert(e.getMessage.contains("magic"))
  }

  test("the .bin framing: multi-DV offsets, size echo, CRC-32; corruption refuses") {
    val dir = tmpDir()
    val b1 = DV.serializeBitmap(Iterator(1L, 3L))
    val b2 = DV.serializeBitmap(Iterator(0L, 2L, 4L))
    val target = graft.tables.GPath(dir, "deletion_vector_test.bin")
    val offsets = DV.writeFile(target, Seq(b1, b2))
    assert(offsets == Seq(1, 1 + 4 + b1.length + 4))
    assert(DV.readFromFile(target, offsets(0), b1.length).toSeq == b1.toSeq)
    assert(DV.readFromFile(target, offsets(1), b2.length).toSeq == b2.toSeq)
    // size mismatch between descriptor and file refuses
    val e1 = intercept[IllegalArgumentException](
      DV.readFromFile(target, offsets(0), b1.length - 2))
    assert(e1.getMessage.contains("size mismatch"))
    // flip a data byte: CRC catches it
    val raw = Files.readAllBytes(Paths.get(target.raw))
    raw(offsets(0) + 4 + 5) = (raw(offsets(0) + 4 + 5) ^ 0x40).toByte
    Files.write(Paths.get(target.raw), raw)
    val e2 = intercept[IllegalArgumentException](
      DV.readFromFile(target, offsets(0), b1.length))
    assert(e2.getMessage.contains("checksum"))
  }

  // ----------------------------------------------------- bridge reads

  /** One data file `d1` holding k = 10..14 in row-index order. */
  private def dataFile(dir: String): String = {
    Seq(10L, 11L, 12L, 13L, 14L).toDF("k").coalesce(1)
      .write.parquet(s"$dir/d1")
    onePart(dir, "d1")
  }

  private def dvJson(d: DV.Descriptor): String = {
    val off = d.offset.map(o => s""","offset":$o""").getOrElse("")
    s"""{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}"$off,"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
  }

  private def protoV3 =
    """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}"""

  private def metaLine(partCols: String = "[]") =
    s"""{"metaData":{"id":"dvt","format":{"provider":"parquet","options":{}},"schemaString":${M(schemaJson)},"partitionColumns":$partCols,"configuration":{},"createdTime":1}}"""

  test("an INLINE deletion vector filters its row indexes out of the read") {
    val dir = tmpDir()
    val f1 = dataFile(dir)
    val bm = DV.serializeBitmap(Iterator(1L, 3L)) // drop k=11, k=13
    val d = DV.Descriptor("i", DV.z85EncodePadded(bm), None, bm.length, 2L)
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""$protoV3
         |${metaLine()}
         |{"add":{"path":"$f1","partitionValues":{},"size":9,"modificationTime":1,"dataChange":true,"deletionVector":${dvJson(d)}}}
         |""".stripMargin).getBytes(UTF_8))
    assert(DeltaLogBridge.read(spark, dir).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(10L, 12L, 14L))
  }

  test("u-storage DVs: two files sharing one .bin via offsets; time travel crosses the DV commit") {
    val dir = tmpDir()
    val f1 = dataFile(dir)
    Seq(20L, 21L, 22L).toDF("k").coalesce(1).write.parquet(s"$dir/d2")
    val f2 = onePart(dir, "d2")
    // one DV file holding both bitmaps, Databricks-style packing
    val b1 = DV.serializeBitmap(Iterator(0L, 4L)) // f1 drops k=10, k=14
    val b2 = DV.serializeBitmap(Iterator(1L))     // f2 drops k=21
    val uuid = java.util.UUID.fromString("0f0f0f0f-1111-2222-3333-444455556666")
    val offs = DV.writeFile(
      graft.tables.GPath(dir, s"deletion_vector_$uuid.bin"), Seq(b1, b2))
    val d1 = DV.Descriptor("u", DV.z85Uuid(uuid), Some(offs(0)), b1.length, 2L)
    val d2 = DV.Descriptor("u", DV.z85Uuid(uuid), Some(offs(1)), b2.length, 1L)
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    // v0: both files clean; v1: the delete — remove clean adds, re-add
    // with DVs (exactly the action pair a Delta DELETE emits)
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""$protoV3
         |${metaLine()}
         |{"add":{"path":"$f1","partitionValues":{},"size":9,"modificationTime":1,"dataChange":true}}
         |{"add":{"path":"$f2","partitionValues":{},"size":9,"modificationTime":1,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000001.json"),
      (s"""{"add":{"path":"$f1","partitionValues":{},"size":9,"modificationTime":2,"dataChange":true,"deletionVector":${dvJson(d1)}}}
         |{"add":{"path":"$f2","partitionValues":{},"size":9,"modificationTime":2,"dataChange":true,"deletionVector":${dvJson(d2)}}}
         |{"remove":{"path":"$f1","deletionTimestamp":2,"dataChange":true}}
         |{"remove":{"path":"$f2","deletionTimestamp":2,"dataChange":true}}
         |""".stripMargin).getBytes(UTF_8))
    assert(DeltaLogBridge.read(spark, dir).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(11L, 12L, 13L, 20L, 22L))
    // pinned BEFORE the delete: every row present
    assert(DeltaLogBridge.read(spark, dir, Some(0L)).orderBy("k").collect()
      .map(_.getLong(0)).toSeq ==
      Seq(10L, 11L, 12L, 13L, 14L, 20L, 21L, 22L))
  }

  test("file actions key by (path, uniqueId): a remove naming the OLD DV never kills the new add") {
    val dir = tmpDir()
    val f1 = dataFile(dir)
    val bmOld = DV.serializeBitmap(Iterator(1L))
    val bmNew = DV.serializeBitmap(Iterator(1L, 3L))
    val dOld = DV.Descriptor("i", DV.z85EncodePadded(bmOld), None, bmOld.length, 1L)
    val dNew = DV.Descriptor("i", DV.z85EncodePadded(bmNew), None, bmNew.length, 2L)
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""$protoV3
         |${metaLine()}
         |{"add":{"path":"$f1","partitionValues":{},"size":9,"modificationTime":1,"dataChange":true,"deletionVector":${dvJson(dOld)}}}
         |""".stripMargin).getBytes(UTF_8))
    // the DV-widening commit: the ADD comes first in the file, the
    // remove of the OLD state after — path-keyed replay would drop the
    // file entirely; uniqueId keying must keep the new state
    Files.write(Paths.get(dir, "_delta_log/00000000000000000001.json"),
      (s"""{"add":{"path":"$f1","partitionValues":{},"size":9,"modificationTime":2,"dataChange":true,"deletionVector":${dvJson(dNew)}}}
         |{"remove":{"path":"$f1","deletionTimestamp":2,"dataChange":true,"deletionVector":${dvJson(dOld)}}}
         |""".stripMargin).getBytes(UTF_8))
    assert(DeltaLogBridge.read(spark, dir).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(10L, 12L, 14L))
    // and the intermediate pin serves the OLD DV state
    assert(DeltaLogBridge.read(spark, dir, Some(0L)).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(10L, 12L, 13L, 14L))
  }

  test("two live DV states for one file = corrupt log, refused") {
    val dir = tmpDir()
    val f1 = dataFile(dir)
    val bm = DV.serializeBitmap(Iterator(1L))
    val d = DV.Descriptor("i", DV.z85EncodePadded(bm), None, bm.length, 1L)
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""$protoV3
         |${metaLine()}
         |{"add":{"path":"$f1","partitionValues":{},"size":9,"modificationTime":1,"dataChange":true}}
         |{"add":{"path":"$f1","partitionValues":{},"size":9,"modificationTime":1,"dataChange":true,"deletionVector":${dvJson(d)}}}
         |""".stripMargin).getBytes(UTF_8))
    val e = intercept[IllegalArgumentException](DeltaLogBridge.read(spark, dir))
    assert(e.getMessage.contains("multiple"), e.getMessage)
  }

  test("DVs on a PARTITIONED table compose with log-sourced partition values") {
    val dir = tmpDir()
    val f1 = dataFile(dir)
    val bm = DV.serializeBitmap(Iterator(0L, 2L))
    val d = DV.Descriptor("i", DV.z85EncodePadded(bm), None, bm.length, 2L)
    val pSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.LongType))).json
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
      (s"""$protoV3
         |{"metaData":{"id":"dvp","format":{"provider":"parquet","options":{}},"schemaString":${M(pSchema)},"partitionColumns":["day"],"configuration":{},"createdTime":1}}
         |{"add":{"path":"$f1","partitionValues":{"day":"6"},"size":9,"modificationTime":1,"dataChange":true,"deletionVector":${dvJson(d)}}}
         |""".stripMargin).getBytes(UTF_8))
    assert(DeltaLogBridge.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((11L, 6L), (13L, 6L), (14L, 6L)))
  }

  test("checkpoint-sourced DVs filter too (v2 sidecar adds carry descriptors)") {
    val dir = tmpDir()
    val f1 = dataFile(dir)
    val bm = DV.serializeBitmap(Iterator(2L))
    val d = V2Dv("i", DV.z85EncodePadded(bm), 0, bm.length, 1L)
    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir.resolve("_sidecars"))
    def writeOneParquet[T <: Product : org.apache.spark.sql.Encoder](
        rows: Seq[T], target: java.nio.file.Path): Unit = {
      val tmp = Files.createTempDirectory("dvck").toString
      rows.toDS().toDF().coalesce(1).write.parquet(tmp + "/p")
      val part = { val s = Files.list(Paths.get(tmp, "p"))
        try s.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally s.close() }
      Files.copy(part, target)
    }
    writeOneParquet(Seq(
      V2SidecarRow(Some(V2Add(f1, Map.empty, 9, 1, true, Some(d))))),
      logDir.resolve("_sidecars/sc-dv.parquet"))
    writeOneParquet(Seq(
      V2ManifestRow(Some(V2Protocol(3, 7,
        Seq("v2Checkpoint", "deletionVectors"), Seq.empty)), None, None),
      V2ManifestRow(None, Some(V2Meta("dvck", V2Format("parquet"),
        schemaJson, Seq.empty, Map.empty)), None),
      V2ManifestRow(None, None, Some(V2Sidecar("sc-dv.parquet", 64L)))),
      logDir.resolve(
        "00000000000000000002.checkpoint.7a7a0069-55ae-4860-bfbe-cd0799dfa0b9.parquet"))
    assert(DeltaLogBridge.read(spark, dir).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(10L, 11L, 13L, 14L))
  }

  test("a mirror SEEDED at a marks-bearing head checkpoints DV descriptors (v3 seed)") {
    val dir = tmpDir() + "/t"
    val df = spark.range(10).select(($"id" % 2).as("day"), $"id".as("k"))
    val t = graft.tables.CommitLogTable.create(spark, dir, df.schema, Seq("day"))
    t.append(df, recordChanges = false)
    t.deleteLazy("k < 4") // marks exist BEFORE the mirror does
    t.setProperties(Map(DeltaLogBridge.MirrorProp -> "true")) // seeds at head
    val back = DeltaLogBridge.read(spark, dir)
    def key(d: org.apache.spark.sql.DataFrame) = d.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(key(back) == key(t.read()),
      "the seed checkpoint must carry the marks as DVs")
    assert(back.count() == 6)
    // the checkpoint itself declares the v3 protocol with the feature
    val ck = spark.read.parquet(
      s"$dir/_delta_log/${f"${t.latestVersion}%020d"}.checkpoint.parquet")
    val prot = ck.selectExpr("protocol.minReaderVersion",
      "protocol.readerFeatures").where("protocol IS NOT NULL").head()
    assert(prot.getInt(0) == 3 &&
      prot.getSeq[String](1).contains("deletionVectors"))
    // and follow-up commits keep mirroring on top of the DV seed
    t.append(spark.range(100, 104).select(($"id" % 2).as("day"), $"id".as("k")),
      recordChanges = false)
    assert(key(DeltaLogBridge.read(spark, dir)) == key(t.read()))
  }

  test("absolute-path ('p') DV storage: a reachable LOCAL path reads " +
      "(the shallow-clone case); remote schemes and dangling paths " +
      "refuse; cardinality mismatch refuses") {
    val dir = tmpDir()
    val f1 = dataFile(dir)
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    def writeLog(dv: String): Unit =
      Files.write(Paths.get(dir, "_delta_log/00000000000000000000.json"),
        (s"""$protoV3
           |${metaLine()}
           |{"add":{"path":"$f1","partitionValues":{},"size":9,"modificationTime":1,"dataChange":true,"deletionVector":$dv}}
           |""".stripMargin).getBytes(UTF_8))
    // a shallow clone references the SOURCE table's DV file by absolute
    // path: reachable local .bin → the read works
    val srcDir = tmpDir()
    val bm0 = DV.serializeBitmap(Iterator(1L, 3L)) // drop k=11, k=13
    val bin = graft.tables.GPath(srcDir, "deletion_vector_source.bin")
    val off = DV.writeFile(bin, Seq(bm0)).head
    writeLog(dvJson(DV.Descriptor("p", bin.toString, Some(off),
      bm0.length, 2L)))
    assert(DeltaLogBridge.read(spark, dir).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(10L, 12L, 14L))
    // a remote scheme still refuses by name — never guess scope
    writeLog("""{"storageType":"p","pathOrInlineDv":"s3://bucket/dv.bin","offset":1,"sizeInBytes":8,"cardinality":1}""")
    val e1 = intercept[IllegalArgumentException](DeltaLogBridge.read(spark, dir))
    assert(e1.getMessage.contains("absolute-path"), e1.getMessage)
    // a dangling local path refuses with the source-table hint
    writeLog(s"""{"storageType":"p","pathOrInlineDv":"$srcDir/gone.bin","offset":1,"sizeInBytes":8,"cardinality":1}""")
    val eGone = intercept[IllegalArgumentException](DeltaLogBridge.read(spark, dir))
    assert(eGone.getMessage.contains("does not exist"), eGone.getMessage)
    val bm = DV.serializeBitmap(Iterator(1L))
    writeLog(dvJson(DV.Descriptor("i", DV.z85EncodePadded(bm), None,
      bm.length, 5L))) // lies about cardinality
    val e2 = intercept[IllegalArgumentException](DeltaLogBridge.read(spark, dir))
    assert(e2.getMessage.contains("cardinality"), e2.getMessage)
  }
}
