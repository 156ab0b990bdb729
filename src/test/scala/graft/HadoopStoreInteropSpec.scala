package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.{CommitLogTable, DeltaLogBridge, GFiles, GPath}

/** The storage seam's OTHER metadata consumers exercised end-to-end at
  * `file:` URI roots (the Hadoop `FileSystem` binding, HDFS's in-sandbox
  * double): the Delta mirror writing a `_delta_log` (checkpoint seed,
  * commit JSONs, DV `.bin`s, cdc parquet), the bridge reading it back,
  * zero-copy adoption of a Delta log under a scheme'd root,
  * foreign-commit reconciliation, the SQL catalog with a scheme'd
  * warehouse (tables, views, procedures), and the streaming
  * source/sink pair (epoch staging moves + CDF stream). Together with
  * `CommitLogHadoopStoreSpec` (the whole core suite at `file:`), this
  * pins that NO metadata path still assumes a POSIX root.
  */
class HadoopStoreInteropSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** `file:`-scheme root — dispatches to [[graft.tables.HadoopStore]]. */
  private def tmpF(): String =
    "file:" + Files.createTempDirectory("graft-hstore-interop").toString

  test("mirror at a file: root: seed checkpoint, commit JSONs, cdc, DV " +
      "bins all write through the Hadoop binding; the bridge reads back") {
    val dir = tmpF() + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true"))
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")) // v2
    t.update($"k" === 2L, Map("v" -> lit("B"))) // v3: cdc
    t.delete($"k" === 3L) // v4: lazy delete -> protocol DV commit
    val logDir = GPath(dir, "_delta_log")
    assert(GFiles.isDirectory(logDir), "mirror wrote nothing")
    val names = GFiles.list(logDir).map(_.fileName)
    assert(names.exists(_.endsWith(".checkpoint.parquet")) ||
      names.exists(_.contains(".checkpoint.")), s"no seed checkpoint: $names")
    assert(names.contains("00000000000000000004.json"))
    // external-reader parity through the bridge, DV filtering included
    val external = DeltaLogBridge.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(external == Set((1L, "a"), (2L, "B")))
    // the CDF reads back from the scheme'd log, batch and stream alike
    val batch = DeltaLogBridge.readChanges(spark, dir, 3, 3)
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(batch == Set((2L, "update_preimage"), (2L, "update_postimage")))
  }

  test("adoption + reconciliation at a file: root") {
    val root = tmpF()
    val dir = root + "/t"
    // author a Delta v0 under the scheme'd root (all IO via GFiles)
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1)
      .write.parquet(s"$dir/d0")
    val f0rel = "d0/" + GFiles.list(GPath(dir, "d0"))
      .map(_.fileName).find(_.endsWith(".parquet")).get
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType))).json.replace("\"", "\\\"")
    GFiles.createDirectories(GPath(dir, "_delta_log"))
    GFiles.writeString(GPath(dir, "_delta_log/00000000000000000000.json"),
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"h5","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1700000000000}}
         |{"add":{"path":"$f0rel","partitionValues":{},"size":100,"modificationTime":1700000000000,"dataChange":true}}
         |""".stripMargin)
    val t = CommitLogTable.convertFromDelta(spark, dir)
    assert(t.read().count() == 2L)
    t.setProperties(Map(
      DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true")) // graft v1 / Delta v1
    // a foreign append lands at Delta v2; graft's next commit pulls it
    Seq((10L, "x")).toDF("k", "s").coalesce(1).write.parquet(s"$dir/fd2")
    val f2rel = "fd2/" + GFiles.list(GPath(dir, "fd2"))
      .map(_.fileName).find(_.endsWith(".parquet")).get
    GFiles.writeString(GPath(dir, "_delta_log/00000000000000000002.json"),
      s"""{"add":{"path":"$f2rel","partitionValues":{},"size":100,"modificationTime":1700000002000,"dataChange":true}}
         |""".stripMargin)
    t.append(Seq((20L, "g")).toDF("k", "s")) // pulls v2, commits v3
    assert(t.latestVersion == 3L &&
      t.resolvedManifest(Some(2L)).action == "reconcile")
    assert(t.read().collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 10L, 20L))
    val external = DeltaLogBridge.read(spark, dir).count()
    assert(external == 4L, "external reader diverged at the file: root")
  }

  test("SQL catalog with a file: warehouse: tables, views, procedures, " +
      "and the streaming toTable sink stage through the Hadoop binding") {
    val root = tmpF()
    val cat = "graft_hstore_cat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.CommitLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root + "/wh")
    spark.sql(s"CREATE TABLE $cat.default.t (k BIGINT, v DOUBLE) USING commitlog")
    spark.sql(s"INSERT INTO $cat.default.t VALUES (1, 1.5), (2, 2.5)")
    assert(spark.sql(s"SELECT sum(k) FROM $cat.default.t")
      .head().getLong(0) == 3L)
    // view metadata JSON under the scheme'd warehouse
    spark.sql(s"CREATE VIEW $cat.default.v AS " +
      s"SELECT k FROM $cat.default.t WHERE v > 2.0")
    assert(spark.sql(s"SELECT * FROM $cat.default.v")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // a procedure over the scheme'd table
    val hist = spark.sql(
      s"CALL $cat.system.history(table => 'default.t')").collect()
    assert(hist.length >= 2)
    // streaming sink: executor-staged parquet moves into the scheme'd
    // table root as one transactional epoch append
    Seq((5L, 5.5)).toDF("k", "v").write.parquet(root.stripPrefix("file:") + "/in/b0")
    val q = spark.readStream.schema("k BIGINT, v DOUBLE")
      .parquet(root.stripPrefix("file:") + "/in/*")
      .writeStream.option("checkpointLocation",
        root.stripPrefix("file:") + "/ckpt")
      .trigger(Trigger.AvailableNow()).toTable(s"$cat.default.t")
    assert(q.awaitTermination(120000))
    while (spark.streams.active.exists(_.id == q.id)) Thread.sleep(50)
    assert(spark.sql(s"SELECT sum(k) FROM $cat.default.t")
      .head().getLong(0) == 8L)
    // and the table's own CDF stream reads from the scheme'd root
    val out = Files.createTempDirectory("graft-hstore-out").toString
    val q2 = spark.readStream.format("commitlog")
      .option("path", s"${root}/wh/default/t")
      .option("readChangeFeed", "true").load()
      .writeStream.format("parquet").option("path", out + "/p")
      .option("checkpointLocation", out + "/ck")
      .trigger(Trigger.AvailableNow()).start()
    assert(q2.awaitTermination(120000))
    val images = spark.read.parquet(out + "/p")
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(images == Set((1L, "insert"), (2L, "insert"), (5L, "insert")))
  }
}
