package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DeltaSqlTableOps, TableOps}

/** Real delta-spark interop through the [[TableOps]] seam (SURVEY
  * §7.3, round-9 stretch): the SAME medallion upsert the parquet and
  * commit-log bindings run, bound to `DeltaSqlTableOps`.
  *
  * SELF-CANCELING here: this environment is zero-egress and the
  * pre-warmed coursier cache carries no `io.delta` artifacts (README
  * documents the check), so `DeltaSqlTableOps.available` is false and
  * every test reports as canceled, not passed. Drop
  * `io.delta:delta-spark` on the test classpath (plus the extension +
  * catalog confs below) and the suite runs against the real thing —
  * the binding itself is format-string/SQL only and compiles either
  * way.
  */
class DeltaInteropSpec extends AnyFunSuite {

  private def deltaSession(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-delta-interop")
      .config("spark.sql.extensions",
        "io.delta.sql.DeltaSparkSessionExtension")
      .config("spark.sql.catalog.spark_catalog",
        "org.apache.spark.sql.delta.catalog.DeltaCatalog")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s
  }

  test("medallion upsert runs through the TableOps seam on real Delta") {
    assume(DeltaSqlTableOps.available,
      "io.delta:delta-spark not on the classpath — interop spec skipped")
    val spark = deltaSession()
    import spark.implicits._
    assume(DeltaSqlTableOps.sessionReady(spark),
      "session lacks DeltaSparkSessionExtension (built before conf?)")
    val dir = Files.createTempDirectory("graft-delta-interop").toString + "/t"
    val ops: TableOps = DeltaSqlTableOps
    // v1: initial load
    ops.upsert(Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "v", "seq"),
      dir, Seq("k"), Seq(col("seq")))
    // v2: update k=2 (batch-internal latest per key wins), insert k=3
    ops.upsert(Seq((2L, "b1", 1), (2L, "b2", 2), (3L, "c", 1))
      .toDF("k", "v", "seq"), dir, Seq("k"), Seq(col("seq")))
    val got = ops.readTable(spark, dir)
      .select($"k", $"v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // table services execute (results advisory, like the parquet binding)
    ops.compact(spark, dir, "k", 128L * 1024 * 1024, Seq.empty)
    ops.readTable(spark, dir) // still readable post-OPTIMIZE
  }

  test("a MIRRORED graft log serves a real delta-spark reader: " +
      "snapshot, time travel, CDF images, and DV-filtered reads") {
    assume(graft.operators.DeltaSqlTableOps.available,
      "io.delta:delta-spark not on the classpath — interop spec skipped")
    val spark = deltaSession()
    import spark.implicits._
    assume(graft.operators.DeltaSqlTableOps.sessionReady(spark),
      "session lacks DeltaSparkSessionExtension (built before conf?)")
    val dir = Files.createTempDirectory("graft-mirror-interop")
      .toString + "/t"
    val t = graft.tables.CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
    t.setProperties(Map(
      graft.tables.DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true"))
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")) // v2
    t.update($"k" === 2L, Map("v" -> lit("B"))) // v3: cdc actions
    t.deleteLazy("k = 3") // v4: protocol deletion vector
    // snapshot parity — delta-spark must resolve the DV and filter k=3
    val viaDelta = spark.read.format("delta").load(dir)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(viaDelta == Seq((1L, "a"), (2L, "B")), viaDelta.toString)
    // time travel to the pre-update version
    assert(spark.read.format("delta").option("versionAsOf", 2)
      .load(dir).count() == 3)
    // CDF: the update commit's cdc images, via delta-spark's reader
    val cdf = spark.read.format("delta")
      .option("readChangeFeed", "true")
      .option("startingVersion", 3).option("endingVersion", 3)
      .load(dir)
      .select($"k", $"v", $"_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(cdf == Set((2L, "b", "update_preimage"),
      (2L, "B", "update_postimage")), cdf.toString)
  }

  test("graft ADOPTS a real delta-spark-written table (DML leaves " +
      "deletion vectors) zero-copy, row parity with delta's own read") {
    assume(graft.operators.DeltaSqlTableOps.available,
      "io.delta:delta-spark not on the classpath — interop spec skipped")
    val spark = deltaSession()
    import spark.implicits._
    assume(graft.operators.DeltaSqlTableOps.sessionReady(spark),
      "session lacks DeltaSparkSessionExtension (built before conf?)")
    val dir = Files.createTempDirectory("graft-adopt-interop")
      .toString + "/t"
    spark.range(100).select($"id".as("k"), ($"id" % 5).as("g"))
      .write.format("delta").save(dir)
    spark.sql(s"ALTER TABLE delta.`$dir` SET TBLPROPERTIES " +
      "('delta.enableDeletionVectors' = 'true')")
    spark.sql(s"DELETE FROM delta.`$dir` WHERE k % 10 = 0")
    spark.sql(s"UPDATE delta.`$dir` SET g = g + 100 WHERE k = 7")
    val expected = spark.read.format("delta").load(dir)
      .orderBy("k").as[(Long, Long)].collect().toSeq
    val t = graft.tables.CommitLogTable.convertFromDelta(spark, dir)
    assert(t.read().orderBy("k").as[(Long, Long)].collect().toSeq ==
      expected)
    assert(spark.read.format("commitlog").load(dir)
      .orderBy("k").as[(Long, Long)].collect().toSeq == expected)
  }

  test("two-engine coexistence with a REAL delta-spark writer: its " +
      "appends pull into the commit log before each graft commit, and " +
      "the delta-cdf stream follows delta-spark's own change feed") {
    assume(graft.operators.DeltaSqlTableOps.available,
      "io.delta:delta-spark not on the classpath — interop spec skipped")
    val spark = deltaSession()
    import spark.implicits._
    assume(graft.operators.DeltaSqlTableOps.sessionReady(spark),
      "session lacks DeltaSparkSessionExtension (built before conf?)")
    val root = Files.createTempDirectory("graft-reconcile-interop").toString
    val dir = root + "/t"
    // delta-spark authors the table; graft adopts it at head (aligned)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("delta").save(dir)
    val t = graft.tables.CommitLogTable.convertFromDelta(spark, dir)
    t.setProperties(Map(
      graft.tables.DeltaLogBridge.MirrorProp -> "true",
      "delta.enableChangeDataFeed" -> "true"))
    // the still-running delta-spark job appends mid-cutover
    Seq((10L, "x"), (11L, "y")).toDF("k", "v")
      .write.format("delta").mode("append").save(dir)
    // graft's next commit pulls the foreign commit first
    t.append(Seq((20L, "g")).toDF("k", "v"))
    val viaGraft = t.read().orderBy("k").as[(Long, String)].collect().toSeq
    val viaDelta = spark.read.format("delta").load(dir)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(viaGraft == viaDelta && viaGraft.map(_._1) ==
      Seq(1L, 2L, 10L, 11L, 20L), s"graft=$viaGraft delta=$viaDelta")
    assert(t.history.collect().map(_.getString(1)).contains("reconcile"))
    // the no-adoption streaming consumer over a delta-spark-written log
    val src = root + "/s"
    Seq((1L, "p")).toDF("k", "v").write.format("delta").save(src)
    spark.sql(s"ALTER TABLE delta.`$src` SET TBLPROPERTIES " +
      "('delta.enableChangeDataFeed' = 'true')")
    Seq((2L, "q")).toDF("k", "v")
      .write.format("delta").mode("append").save(src)
    spark.sql(s"UPDATE delta.`$src` SET v = 'Q' WHERE k = 2")
    val q = spark.readStream.format("delta-cdf").option("path", src).load()
      .writeStream.format("parquet").option("path", root + "/out")
      .option("checkpointLocation", root + "/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    val got = spark.read.parquet(root + "/out")
      .select("k", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val batch = graft.tables.DeltaLogBridge.readChanges(spark, src, 0,
      graft.tables.DeltaLogBridge.snapshot(spark, src).version)
      .select("k", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == batch, s"stream=$got batch=$batch")
    assert(got.exists(_._3 == "update_postimage"))
  }
}
