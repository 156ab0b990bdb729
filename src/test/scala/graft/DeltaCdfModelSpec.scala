package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.tables.DeltaLogBridge

/** Randomized model check of the consolidated foreign-CDF read
  * ([[DeltaLogBridge.readChanges]]): seeded random commit sequences —
  * fresh adds, whole-file removes, RE-adds of previously removed files
  * (the multiplicity case the round-17 k² fix addresses), and
  * cdc-exclusive commits that may re-list a cdc parquet shared with an
  * earlier version — are replayed against a straightforward
  * per-version in-test reference. The bridge's at-most-one-scan-per-
  * image-kind plan must serve the EXACT image multiset the naive
  * per-version walk defines, over the full range and over random
  * sub-ranges (the delta-cdf streaming source's paced batches are
  * exactly such sub-ranges).
  */
class DeltaCdfModelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def writeOneParquet(dir: String, sub: String,
      rows: Seq[(Long, String)]): String = {
    rows.toDF("k", "s").coalesce(1).write.parquet(s"$dir/$sub")
    val s = Files.list(Paths.get(dir, sub))
    val f = try s.iterator().asScala.map(_.getFileName.toString)
      .find(_.endsWith(".parquet")).get
    finally s.close()
    s"$sub/$f"
  }

  private def writeCdcParquet(dir: String, sub: String,
      rows: Seq[(Long, String, String)]): String = {
    rows.toDF("k", "s", "_change_type").coalesce(1)
      .write.parquet(s"$dir/$sub")
    val s = Files.list(Paths.get(dir, sub))
    val f = try s.iterator().asScala.map(_.getFileName.toString)
      .find(_.endsWith(".parquet")).get
    finally s.close()
    s"$sub/$f"
  }

  /** One image as the oracle sees it. */
  private type Img = (Long, String, String, Long)

  private def runSeed(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = Files.createTempDirectory(s"graft-cdf-model-$seed").toString
    // a small pool of data files (2 rows each) and cdc files (1 row
    // each) the log will reference — re-adds re-list the SAME path
    val dataFiles = (0 until 5).map { i =>
      val rows = Seq((i * 10L, s"a$i"), (i * 10L + 1, s"b$i"))
      (writeOneParquet(dir, s"d$i", rows), rows)
    }
    val cdcFiles = (0 until 3).map { i =>
      val rows = Seq((900L + i, s"u$i", "update_postimage"))
      (writeCdcParquet(dir, s"_change_data/c$i", rows), rows)
    }
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType))).json.replace("\"", "\\\"")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    def commit(v: Int, body: String): Unit =
      Files.write(Paths.get(dir, f"_delta_log/$v%020d.json"),
        body.getBytes(UTF_8))
    def addJson(p: String) =
      s"""{"add":{"path":"$p","partitionValues":{},"size":100,"modificationTime":0,"dataChange":true}}"""
    def removeJson(p: String) =
      s"""{"remove":{"path":"$p","deletionTimestamp":0,"dataChange":true}}"""
    def cdcJson(p: String) =
      s"""{"cdc":{"path":"$p","partitionValues":{},"size":100,"dataChange":false}}"""
    commit(0,
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"model-$seed","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":0}}
         |""".stripMargin)
    // the model: per version, the naive reference's expected images
    val live = scala.collection.mutable.Set.empty[Int]
    val expected = Vector.newBuilder[Img]
    val versions = 1 + rnd.nextInt(14) // 1..14 commits after v0
    (1 to versions).foreach { v =>
      val canRemove = live.nonEmpty
      val canAdd = live.size < dataFiles.size
      val choice = rnd.nextInt(3) match {
        case 0 if canAdd => "add"
        case 1 if canRemove => "remove"
        case _ => "cdc"
      }
      choice match {
        case "add" =>
          // fresh add OR re-add of a previously removed file — both are
          // just "an absent file becomes live"; a re-add re-lists a
          // path an earlier version already listed
          val i = rnd.shuffle((0 until dataFiles.size)
            .filterNot(live.contains).toList).head
          live += i
          commit(v, addJson(dataFiles(i)._1) + "\n")
          dataFiles(i)._2.foreach { case (k, s) =>
            expected += ((k, s, "insert", v.toLong)) }
        case "remove" =>
          val i = rnd.shuffle(live.toList).head
          live -= i
          commit(v, removeJson(dataFiles(i)._1) + "\n")
          dataFiles(i)._2.foreach { case (k, s) =>
            expected += ((k, s, "delete", v.toLong)) }
        case "cdc" =>
          val i = rnd.nextInt(cdcFiles.size)
          commit(v, cdcJson(cdcFiles(i)._1) + "\n")
          cdcFiles(i)._2.foreach { case (k, s, ct) =>
            expected += ((k, s, ct, v.toLong)) }
      }
    }
    def multiset(xs: Seq[Img]): Map[Img, Int] =
      xs.groupBy(identity).view.mapValues(_.size).toMap
    def got(from: Long, to: Long): Seq[Img] =
      DeltaLogBridge.readChanges(spark, dir, from, to)
        .select("k", "s", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
    val exp = expected.result()
    // full range
    assert(multiset(got(0L, versions.toLong)) == multiset(exp),
      s"seed=$seed full-range mismatch")
    // three random sub-ranges (the paced stream's batch shapes)
    (1 to 3).foreach { _ =>
      val a = rnd.nextInt(versions) + 1
      val b = a + rnd.nextInt(versions - a + 1)
      assert(multiset(got(a.toLong, b.toLong)) ==
        multiset(exp.filter(img => img._4 >= a && img._4 <= b)),
        s"seed=$seed sub-range [$a,$b] mismatch")
    }
  }

  test("randomized foreign logs: the consolidated read serves the " +
      "naive per-version image multiset exactly (re-adds, shared cdc " +
      "paths, random sub-ranges)") {
    Seq(1L, 7L, 42L, 1337L, 20260817L).foreach(runSeed)
  }
}
