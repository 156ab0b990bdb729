package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.CommitLogTable

/** `CommitLogTable.convert` — the CONVERT TO DELTA analogue: adopt an
  * existing plain-parquet directory as a commit-log table IN PLACE
  * (zero bytes copied, one footer pass), refusing the layouts that
  * cannot adopt soundly. At 100 TB this is the adoption path; the
  * alternative is rewriting the corpus.
  */
class ConvertSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("unpartitioned adoption: zero-copy, stats prune, full table services after") {
    val dir = Files.createTempDirectory("graft-convert").toString + "/t"
    spark.range(1000).select($"id".as("k"), ($"id" * 0.5).as("v"))
      .repartitionByRange(5, $"k").sortWithinPartitions("k")
      .write.parquet(dir)
    val before = Files.walk(Paths.get(dir)).filter(p =>
      p.toString.endsWith(".parquet")).count()
    val t = CommitLogTable.convert(spark, dir)
    val m = t.resolvedManifest(None)
    assert(m.action == "convert" && m.files.size == 5 && m.rowsTotal == 1000)
    // zero-copy: exactly the same parquet files, adopted where they sit
    val after = Files.walk(Paths.get(dir)).filter(p =>
      p.toString.endsWith(".parquet") &&
        !p.toString.contains("_graft_log")).count()
    assert(after == before)
    assert(t.read().count() == 1000)
    // footer stats landed → manifest-level skipping works immediately
    assert(t.rangeFiles(m, "k", 10L, 20L).size == 1)
    // the adopted table is a full citizen: merge, time travel, history
    t.merge(Seq((5L, 99.0)).toDF("k", "v"), Seq("k"), Seq(col("v")))
    assert(t.read().filter($"k" === 5).head().getDouble(1) == 99.0)
    assert(t.read(Some(1L)).filter($"k" === 5).head().getDouble(1) == 2.5)
    assert(t.history.collect().map(_.getString(1)).toSeq
      .containsSlice(Seq("convert", "merge")))
    // and the DSv2 read path serves it with pushdown
    assert(spark.read.format("commitlog").load(dir)
      .filter($"k" >= 990).count() == 10)
  }

  test("partitionBy layout (columns NOT in the files) adopts: manifest-valued " +
      "columns attach on every read plane, prune, and materialize on rewrite") {
    val dir = Files.createTempDirectory("graft-convert-hive").toString + "/t"
    spark.range(100).select($"id".as("k"), ($"id" % 3).as("day"))
      .write.partitionBy("day").parquet(dir)
    val t = CommitLogTable.convert(spark, dir, Seq("day"))
    val m = t.resolvedManifest(None)
    // the stripped column joined the schema as STRING (path segments are
    // strings) and every file records its value in manifestVals + a
    // synthetic min=max stat
    assert(m.schema("day").dataType.typeName == "string")
    assert(m.files.forall(f => f.manifestVals.get("day").contains(
      f.partitionVals.head)))
    assert(m.files.forall(f => f.stats.get("day").exists(s => s._1 == s._2)))
    // DataFrame plane: values attach from the manifest
    val byDay = t.read().groupBy($"day").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDay == Map("0" -> 34, "1" -> 33, "2" -> 33))
    // DSv2 plane: same values, and a day predicate file-prunes via the
    // synthetic stats (the filter itself stays residual and re-evaluates
    // over the attached values — exactness, not trust)
    val v2 = spark.read.format("commitlog").load(dir).filter($"day" === "1")
    assert(v2.count() == 33)
    val desc = v2.queryExecution.executedPlan.toString
    // one day's files survive pruning (the writer emitted 4 part files
    // per day directory)
    assert(desc.contains("files=4/12"), desc)
    // metadata-only grouped aggregate answers from the manifest alone
    val q = spark.read.format("commitlog").load(dir)
      .groupBy($"day").agg(count(lit(1)).as("n"))
    assert(q.queryExecution.executedPlan.toString.contains("CommitLogAggScan"))
    assert(q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      byDay)
    // a lazy-delete mark over the manifest-valued column evaluates
    // against the attached value, both planes
    t.deleteLazy("day = '2' AND k >= 90") // hides 92, 95, 98
    assert(t.read().count() == 97)
    assert(spark.read.format("commitlog").load(dir).count() == 97)
    // a rewrite materializes the column physically and clears the flag
    t.compact(targetFileBytes = 1L << 30)
    val m2 = t.resolvedManifest(None)
    assert(m2.files.forall(_.manifestVals.isEmpty))
    assert(t.read().groupBy($"day").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("0" -> 34, "1" -> 33, "2" -> 30))
    // adopting it UNPARTITIONED still refuses — the day column would
    // silently vanish from the data
    val dir2 = Files.createTempDirectory("graft-convert-hive2").toString + "/t"
    spark.range(10).select($"id".as("k"), ($"id" % 2).as("day"))
      .write.partitionBy("day").parquet(dir2)
    val e2 = intercept[IllegalArgumentException](
      CommitLogTable.convert(spark, dir2))
    assert(e2.getMessage.contains("silently drop"), e2.getMessage)
  }

  test("mixed carry: files WITH the column physically and files WITHOUT " +
      "coexist — coalesce picks the physical value, manifest fills the rest") {
    val dir = Files.createTempDirectory("graft-convert-mixed").toString + "/t"
    // file A carries day physically (typed LONG) under day=7
    spark.range(5).select($"id".as("k"), lit(7L).as("day"))
      .coalesce(1).write.parquet(s"$dir/day=7")
    // file B is a partitionBy-style stripped file under day=8
    spark.range(5, 9).select($"id".as("k"))
      .coalesce(1).write.parquet(s"$dir/day=8")
    val t = CommitLogTable.convert(spark, dir, Seq("day"))
    val m = t.resolvedManifest(None)
    // the column kept file A's LONG type; only file B is manifest-valued
    // (its "8" validated castable to LONG at adoption)
    assert(m.schema("day").dataType.typeName == "long")
    assert(m.files.count(_.manifestVals.nonEmpty) == 1)
    val got = t.read().groupBy($"day").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(7L -> 5, 8L -> 4))
    assert(spark.read.format("commitlog").load(dir)
      .filter($"day" === 8L).select(sum($"k")).head().getLong(0) == 26)
    // a NON-castable dir value for a typed column refuses at adoption
    val dir2 = Files.createTempDirectory("graft-convert-badcast").toString + "/t"
    spark.range(3).select($"id".as("k"), lit(1L).as("day"))
      .coalesce(1).write.parquet(s"$dir2/day=1")
    spark.range(3, 6).select($"id".as("k"))
      .coalesce(1).write.parquet(s"$dir2/day=oops")
    val e = intercept[IllegalArgumentException](
      CommitLogTable.convert(spark, dir2, Seq("day")))
    assert(e.getMessage.contains("does not cast"), e.getMessage)
  }

  test("a STREAMING read of an adopted partitionBy table attaches the " +
      "manifest-valued column per micro-batch") {
    val root = Files.createTempDirectory("graft-convert-stream").toString
    val dir = root + "/t"
    spark.range(30).select($"id".as("k"), ($"id" % 3).as("day"))
      .write.partitionBy("day").parquet(dir)
    val t = CommitLogTable.convert(spark, dir, Seq("day"))
    def drain(): Unit = {
      val q = spark.readStream.format("commitlog").option("path", dir)
        .load().writeStream.format("parquet")
        .option("path", root + "/out")
        .option("checkpointLocation", root + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000))
    }
    drain() // initial snapshot: adopted files, day from the manifest
    val got = spark.read.parquet(root + "/out")
      .groupBy($"day").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("0" -> 10, "1" -> 10, "2" -> 10), got.toString)
    // an incremental append (physically-carried day) flows alongside
    t.append(Seq((100L, "9")).toDF("k", "day"))
    drain()
    assert(spark.read.parquet(root + "/out")
      .filter($"day" === "9").count() == 1)
  }

  test("NULL partition directory (__HIVE_DEFAULT_PARTITION__) adopts as NULL") {
    val dir = Files.createTempDirectory("graft-convert-nullpart").toString + "/t"
    spark.range(6).select($"id".as("k"),
      when($"id" % 2 === 0, concat(lit("d"), $"id" % 2)).as("day"))
      .write.partitionBy("day").parquet(dir)
    val t = CommitLogTable.convert(spark, dir, Seq("day"))
    val got = t.read().select($"day").collect().map(r =>
      if (r.isNullAt(0)) "NULL" else r.getString(0))
    assert(got.count(_ == "NULL") == 3 && got.count(_ == "d0") == 3)
    assert(spark.read.format("commitlog").load(dir)
      .filter($"day".isNull).count() == 3)
  }

  test("Hive layout WITH carried columns adopts partitioned, tuples recorded") {
    val dir = Files.createTempDirectory("graft-convert-carried").toString + "/t"
    // build the adoptable shape by hand: named k=v dirs, files CARRY the
    // partition columns physically
    for (ep <- Seq("prices", "news"); dt <- Seq("d1", "d2"))
      spark.range(10).select($"id".as("k"), lit(ep).as("ep"), lit(dt).as("dt"))
        .coalesce(1).write.parquet(s"$dir/ep=$ep/dt=$dt")
    val t = CommitLogTable.convert(spark, dir, Seq("ep", "dt"))
    val m = t.resolvedManifest(None)
    assert(m.partitionCols == Seq("ep", "dt"))
    assert(m.files.map(_.partitionVals).toSet == Set(
      Seq("prices", "d1"), Seq("prices", "d2"),
      Seq("news", "d1"), Seq("news", "d2")))
    assert(t.read().count() == 40)
    // manifest partition pruning works on the adopted tuples — via the
    // column-explicit surface (bare-value readPartitions is ambiguous
    // over composite keys and refuses, round-14 hardening)
    assert(t.partitionKeysWhere("ep = 'prices'").size == 2)
    intercept[IllegalArgumentException](t.readPartitions(Set("prices")))
    assert(t.read().filter($"ep" === "prices").count() == 20)
    // grouped metadata aggregate answers from the adopted manifest alone
    val q = spark.read.format("commitlog").load(dir)
      .groupBy($"ep", $"dt").agg(count(lit(1)).as("n"))
    assert(q.queryExecution.executedPlan.toString.contains("CommitLogAggScan"))
    assert(q.collect().forall(_.getLong(2) == 10L))
  }

  test("an UNDECLARED directory-encoded column refuses (no silent narrowing)") {
    val dir = Files.createTempDirectory("graft-convert-undeclared").toString + "/t"
    // two-level layout where files carry day but not hour
    spark.range(10).select($"id".as("k"), lit("d1").as("day"))
      .coalesce(1).write.parquet(s"$dir/day=d1/hour=00")
    val e = intercept[IllegalArgumentException](
      CommitLogTable.convert(spark, dir, Seq("day")))
    assert(e.getMessage.contains("hour"), e.getMessage)
  }

  test("a directory governed by another transaction log refuses") {
    val dir = Files.createTempDirectory("graft-convert-governed").toString + "/t"
    spark.range(10).select($"id".as("k")).coalesce(1).write.parquet(dir)
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    val e = intercept[IllegalArgumentException](CommitLogTable.convert(spark, dir))
    assert(e.getMessage.contains("_delta_log"), e.getMessage)
  }

  test("extensionless parquet (Hive/Impala part files) adopts by magic; " +
      "a torn .parquet refuses; heterogeneous schemas union") {
    val dir = Files.createTempDirectory("graft-convert-magic").toString + "/t"
    spark.range(5).select($"id".as("k")).coalesce(1).write.parquet(dir)
    // rename the part file to the Hive spelling (no extension)
    val part = Files.list(Paths.get(dir)).iterator()
    import scala.jdk.CollectionConverters._
    val pq = part.asScala.find(_.toString.endsWith(".parquet")).get
    Files.move(pq, pq.resolveSibling("000000_0"))
    // a second file with an EXTRA column: schema must union (mergeSchema)
    spark.range(5, 8).select($"id".as("k"), ($"id" * 2.0).as("v"))
      .coalesce(1).write.mode("append").parquet(dir)
    val t = CommitLogTable.convert(spark, dir)
    assert(t.resolvedManifest(None).files.size == 2)
    assert(t.read().count() == 8)
    assert(t.read().schema.fieldNames.toSet == Set("k", "v"))
    assert(t.read().filter($"k" < 5).select("v").collect().forall(_.isNullAt(0)),
      "old files null-backfill the unioned column")
    // a truncated .parquet file fails the conversion loudly
    val dir2 = Files.createTempDirectory("graft-convert-torn").toString + "/t"
    spark.range(3).select($"id".as("k")).coalesce(1).write.parquet(dir2)
    Files.write(Paths.get(dir2, "torn.parquet"), Array[Byte](1, 2, 3))
    val e = intercept[IllegalArgumentException](CommitLogTable.convert(spark, dir2))
    assert(e.getMessage.contains("PAR1"), e.getMessage)
  }

  test("double convert and convert-over-table refuse; a racing convert loses loudly") {
    val dir = Files.createTempDirectory("graft-convert-twice").toString + "/t"
    spark.range(10).select($"id".as("k")).coalesce(1).write.parquet(dir)
    CommitLogTable.convert(spark, dir)
    val e = intercept[IllegalArgumentException](CommitLogTable.convert(spark, dir))
    assert(e.getMessage.contains("already exists"), e.getMessage)
  }
}
