package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.CommitLogTable

/** Streaming DATA read of a commit-log table (`readStream.format
  * ("commitlog")` without `readChangeFeed`) — the Delta streaming-source
  * semantics the reference's silver layer consumes
  * (`silver_prices_transform.ipynb`: `spark.readStream.table(bronze)`):
  * initial snapshot, incremental appends, admission control,
  * data-change refusal, exactly-once restart.
  */
class CommitLogStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-clstream").toString

  private def drain(dir: String, out: String, ckpt: String,
      options: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream.format("commitlog").option("path", dir)
    options.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load().writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
  }

  private def sink(out: String): Seq[(Long, Double)] =
    spark.read.parquet(out).as[(Long, Double)].collect().sorted.toSeq

  test("initial snapshot, then appends stream incrementally; restart is exactly-once; idle restart a no-op") {
    val root = tmpDir()
    val dir = root + "/t"
    val t = CommitLogTable.create(spark, dir,
      Seq.empty[(Long, Double)].toDF("k", "v").schema)
    t.append(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
    t.append(Seq((3L, 3.0)).toDF("k", "v"))

    drain(dir, root + "/out", root + "/ckpt")
    assert(sink(root + "/out") == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)),
      "first run = the full current snapshot")

    // only the delta arrives on restart
    t.append(Seq((4L, 4.0)).toDF("k", "v"))
    drain(dir, root + "/out", root + "/ckpt")
    assert(sink(root + "/out") ==
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)))

    // idle restart: nothing new, no duplicates
    drain(dir, root + "/out", root + "/ckpt")
    assert(sink(root + "/out").size == 4)
  }

  test("maxFilesPerTrigger paces the AvailableNow drain across micro-batches") {
    val root = tmpDir()
    val dir = root + "/t"
    val t = CommitLogTable.create(spark, dir,
      Seq.empty[(Long, Double)].toDF("k", "v").schema)
    (0 until 3).foreach(i => t.append(
      Seq((i * 2L, 1.0), (i * 2L + 1, 1.0)).toDF("k", "v")))
    val nFiles = t.fileCount()
    assert(nFiles >= 3)

    val q = spark.readStream.format("commitlog").option("path", dir)
      .option("maxFilesPerTrigger", 1).load()
      .writeStream.format("parquet").option("path", root + "/out")
      .option("checkpointLocation", root + "/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    assert(sink(root + "/out").map(_._1) == (0L until 6L),
      "rate limiting must not lose or duplicate rows")
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches == nFiles,
      s"one file per micro-batch expected ($nFiles files), saw $dataBatches")
  }

  test("data-change commits fail the stream; skipChangeCommits skips them whole") {
    val root = tmpDir()
    val dir = root + "/t"
    val t = CommitLogTable.create(spark, dir,
      Seq.empty[(Long, Double)].toDF("k", "v").schema)
    t.append(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
    drain(dir, root + "/out", root + "/ckpt")

    // an UPDATE between runs: the checkpointed stream must refuse
    t.update($"k" === 2L, Map("v" -> org.apache.spark.sql.functions.lit(20.0)))
    t.append(Seq((5L, 5.0)).toDF("k", "v"))
    val ex = intercept[StreamingQueryException](
      drain(dir, root + "/out", root + "/ckpt"))
    assert(ex.getMessage.contains("skipChangeCommits"),
      s"refusal must name the escape hatch, got: ${ex.getMessage}")

    // opting in skips the update commit, streams the later append
    drain(dir, root + "/out", root + "/ckpt",
      Map("skipChangeCommits" -> "true"))
    assert(sink(root + "/out") == Seq((1L, 1.0), (2L, 2.0), (5L, 5.0)),
      "the updated row's new value must NOT re-stream")
  }

  test("model parity: random commit sequences vs an append-only stream model (skipChangeCommits)") {
    // the interactions no single spec exercises — an update between two
    // drains, an append whose rows a LATER update rewrites before the
    // next drain (the sink must keep the as-appended values), a compact
    // materializing marks mid-stream. Model: sink = table content at
    // first drain + every row appended after, at its append-time value.
    // Seeded: deterministic across runs.
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 2) {
      val root = tmpDir()
      val dir = root + "/t"
      def mk(rows: Seq[(Long, String, Double)]) =
        rows.toDF("k", "cat", "v")
      val t = CommitLogTable.create(spark, dir, mk(Nil).schema)
      var nextKey = trial * 100000L
      def freshRows(n: Int): Seq[(Long, String, Double)] =
        (1 to n).map { _ =>
          nextKey += 1
          (nextKey, s"c${rnd.nextInt(3)}", rnd.nextInt(100) / 2.0)
        }
      t.append(mk(freshRows(3)).coalesce(1)) // pre-stream content
      var started = false
      var expect = Vector.empty[(Long, String, Double)]
      var pending = Vector.empty[(Long, String, Double)]
      def tableRows(): Vector[(Long, String, Double)] =
        t.read().collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toVector
      def drain(step: Int): Unit = {
        val q = spark.readStream.format("commitlog").option("path", dir)
          .option("skipChangeCommits", "true").load()
          .writeStream.format("parquet").option("path", root + "/out")
          .option("checkpointLocation", root + "/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        assert(q.awaitTermination(120000))
        while (spark.streams.active.exists(_.id == q.id)) Thread.sleep(50)
        if (!started) { expect = tableRows(); started = true }
        else { expect ++= pending }
        pending = Vector.empty
        val got = spark.read.parquet(root + "/out").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toVector
        assert(got.sorted == expect.sorted,
          s"trial $trial diverged after drain at step $step")
      }
      for (step <- 1 to 12) {
        rnd.nextInt(8) match {
          case 0 | 1 =>
            val rows = freshRows(1 + rnd.nextInt(3))
            t.append(mk(rows).coalesce(1))
            if (started) pending ++= rows
          case 2 => // upsert: a data-change commit the stream must skip WHOLE
            val rows = freshRows(1) ++ tableRows().take(1)
              .map { case (k, c, _) => (k, c, 999.0) }
            t.merge(mk(rows).coalesce(1), Seq("k"), Seq($"v"))
          case 3 =>
            t.update($"v" >= rnd.nextInt(40).toDouble,
              Map("v" -> (org.apache.spark.sql.functions.col("v") + 0.25)))
          case 4 => t.delete($"v" < rnd.nextInt(10).toDouble)
          case 5 => t.deleteLazy(s"v < ${rnd.nextInt(10)}")
          case 6 => t.compact(targetFileBytes = 4L * 1024)
          case 7 => drain(step)
        }
      }
      drain(13)
    }
  }

  test("readStream.table through the SQL catalog: snapshot, incremental restart, option-paced drain") {
    val root = tmpDir()
    spark.conf.set("spark.sql.catalog.graft_st",
      classOf[graft.sources.CommitLogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_st.warehouse", root + "/wh")
    spark.sql("CREATE TABLE graft_st.br.prices (k BIGINT, v DOUBLE) USING commitlog")
    spark.sql("INSERT INTO graft_st.br.prices VALUES (1, 1.0), (2, 2.0)")
    spark.sql("INSERT INTO graft_st.br.prices VALUES (3, 3.0)")

    def run(): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = spark.readStream.option("maxFilesPerTrigger", 1)
        .table("graft_st.br.prices")
        .writeStream.format("parquet").option("path", root + "/out")
        .option("checkpointLocation", root + "/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
      q
    }
    val q1 = run()
    assert(sink(root + "/out") == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)),
      "first run = the full current snapshot")
    assert(q1.recentProgress.count(_.numInputRows > 0) >= 2,
      "maxFilesPerTrigger=1 must pace the snapshot drain")

    // restart: only the newly inserted rows arrive
    spark.sql("INSERT INTO graft_st.br.prices VALUES (4, 4.0)")
    run()
    assert(sink(root + "/out") ==
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)))

    // idle restart: no duplicates
    run()
    assert(sink(root + "/out").size == 4)
  }

  test("restart mid-snapshot replays the OFFSET's snapshot: marks committed after the pin don't leak in") {
    val root = tmpDir()
    val dir = root + "/t"
    val t = CommitLogTable.create(spark, dir,
      Seq.empty[(Long, Double)].toDF("k", "v").schema)
    t.append(Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    t.append(Seq((2L, 2.0)).toDF("k", "v").coalesce(1))
    t.append(Seq((3L, 3.0)).toDF("k", "v").coalesce(1))

    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    def mkStream(opts: java.util.Map[String, String] =
        java.util.Collections.emptyMap()) =
      new graft.sources.CommitLogV2Table(spark, dir, None)
        .newScanBuilder(new CaseInsensitiveStringMap(opts)).build()
        .toMicroBatchStream(root + "/ckpt")
        .asInstanceOf[graft.sources.CommitLogMicroBatchStream]
    def rowsOf(stream: org.apache.spark.sql.connector.read.streaming.MicroBatchStream,
        a: org.apache.spark.sql.connector.read.streaming.Offset,
        b: org.apache.spark.sql.connector.read.streaming.Offset): Seq[Long] = {
      val factory = stream.createReaderFactory()
      stream.planInputPartitions(a, b).toSeq.flatMap { p =>
        val r = factory.createReader(p)
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (r.next()) out += r.get().getLong(0)
        r.close(); out.toSeq
      }
    }

    // run 1: consume ONE snapshot file, then "crash"
    val s1 = mkStream()
    val o0 = s1.initialOffset()
    val o1 = s1.latestOffset(o0, ReadLimit.maxFiles(1))
    val firstBatch = rowsOf(s1, o0, o1)
    assert(firstBatch.size == 1)

    // between runs: a lazy delete marks EVERY file at a newer version
    t.deleteLazy("k >= 1")

    // run 2 (fresh scan pins the NEWER version; skipChangeCommits lets
    // the walk pass the delete commit): the restored offset's snapshot
    // must replay as of the ORIGINAL pin — the rows the first run
    // hadn't reached yet, with no v4 marks applied
    val s2 = mkStream(java.util.Map.of("skipChangeCommits", "true"))
    val restored = s2.deserializeOffset(o1.asInstanceOf[
      org.apache.spark.sql.execution.streaming.Offset].json)
    val o2 = s2.latestOffset(restored, ReadLimit.allAvailable())
    val rest = rowsOf(s2, restored, o2)
    assert((firstBatch ++ rest).sorted == Seq(1L, 2L, 3L),
      s"restart must complete the pinned snapshot exactly; " +
        s"got first=$firstBatch rest=$rest")
  }

  test("CTAS / RTAS / partitioned CTAS land as transactional catalog tables") {
    val root = tmpDir()
    spark.conf.set("spark.sql.catalog.graft_ctas",
      classOf[graft.sources.CommitLogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ctas.warehouse", root + "/wh")
    spark.sql("CREATE TABLE graft_ctas.db.c USING commitlog AS " +
      "SELECT id AS k, id * 0.5 AS v FROM range(10)")
    assert(spark.sql("SELECT count(*) FROM graft_ctas.db.c").head.getLong(0) == 10)
    spark.sql("REPLACE TABLE graft_ctas.db.c USING commitlog AS " +
      "SELECT id AS k FROM range(3)")
    assert(spark.sql("SELECT count(*) FROM graft_ctas.db.c").head.getLong(0) == 3)
    spark.sql("CREATE TABLE graft_ctas.db.p USING commitlog " +
      "PARTITIONED BY (d) AS " +
      "SELECT id AS k, concat('d', id % 3) AS d FROM range(9)")
    val t = CommitLogTable.open(spark, root + "/wh/db/p")
    assert(t.resolvedManifest(None).files.flatMap(_.partitionVals).toSet
      == Set("d0", "d1", "d2"), "CTAS must route partition values")
  }

  test("pushed filters stats-prune each streaming micro-batch's files") {
    val root = tmpDir()
    spark.conf.set("spark.sql.catalog.graft_sp",
      classOf[graft.sources.CommitLogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_sp.warehouse", root + "/wh")
    spark.sql("CREATE TABLE graft_sp.db.t (k BIGINT, v DOUBLE) USING commitlog")
    // two appends with DISJOINT k ranges -> two files with disjoint stats
    spark.sql("INSERT INTO graft_sp.db.t SELECT id, id * 1.0 FROM range(0, 100)")
    spark.sql("INSERT INTO graft_sp.db.t SELECT id, id * 1.0 FROM range(1000, 1100)")
    val q = spark.readStream.table("graft_sp.db.t").where("k >= 1000")
      .writeStream.format("parquet").option("path", root + "/out")
      .option("checkpointLocation", root + "/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    assert(sink(root + "/out").size == 100)
    // numInputRows counts rows the SOURCE produced: a pruned file's 100
    // rows must never have been read
    val inputRows = q.recentProgress.map(_.numInputRows).sum
    assert(inputRows == 100,
      s"expected the k<1000 file pruned from the scan, read $inputRows rows")
  }

  test("snapshot applies history (merge/delete/lazy marks); startingVersion skips it; compaction is data-neutral") {
    val root = tmpDir()
    val dir = root + "/t"
    val t = CommitLogTable.create(spark, dir,
      Seq.empty[(Long, Double)].toDF("k", "v").schema)
    t.append(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v")) // v1
    t.merge(Seq((2L, 20.0), (4L, 4.0)).toDF("k", "v"),
      Seq("k"), Seq($"v"))                                        // v2
    t.delete($"k" === 3L)                                         // v3
    t.deleteLazy("k = 1")                                         // v4 (mark)

    // fresh stream: exactly the CURRENT rows — history never replays
    drain(dir, root + "/out", root + "/ckpt")
    assert(sink(root + "/out") == Seq((2L, 20.0), (4L, 4.0)))

    // a compaction (materializes the lazy mark) is dataChange=false:
    // nothing streams, the offset just advances past it
    t.compact(targetFileBytes = 64 * 1024 * 1024)                 // v5
    t.append(Seq((6L, 6.0)).toDF("k", "v"))                       // v6
    drain(dir, root + "/out", root + "/ckpt")
    assert(sink(root + "/out") == Seq((2L, 20.0), (4L, 4.0), (6L, 6.0)))

    // startingVersion: incremental-only, no snapshot
    drain(dir, root + "/out2", root + "/ckpt2",
      Map("startingVersion" -> "6"))
    assert(sink(root + "/out2") == Seq((6L, 6.0)))
  }

  test("CDF model parity: random commit sequences stream == batch readChanges under random admission") {
    // the invariant the offset/admission/replay machinery must keep: a
    // CDF stream drained in arbitrary chunks (random maxFilesPerTrigger,
    // restart per drain) accumulates EXACTLY the change rows the batch
    // readChanges(1, head) serves — no version skipped, split, or
    // duplicated. Seeded: deterministic across runs.
    val rnd = new scala.util.Random(12)
    for (trial <- 1 to 2) {
      val root = tmpDir()
      val dir = root + "/t"
      def mk(rows: Seq[(Long, String, Double)]) = rows.toDF("k", "cat", "v")
      val t = CommitLogTable.create(spark, dir, mk(Nil).schema)
      var nextKey = trial * 100000L
      def freshRows(n: Int): Seq[(Long, String, Double)] =
        (1 to n).map { _ =>
          nextKey += 1
          (nextKey, s"c${rnd.nextInt(3)}", rnd.nextInt(100) / 2.0)
        }
      def changeKey(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "cat", "v", "_change_type", "_commit_version")
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
            r.getString(3), r.getLong(4))).sorted.toVector
      def drain(step: Int): Unit = {
        val q = spark.readStream.format("commitlog").option("path", dir)
          .option("readChangeFeed", "true")
          .option("maxFilesPerTrigger", (1 + rnd.nextInt(3)).toString)
          .load()
          .writeStream.format("parquet").option("path", root + "/out")
          .option("checkpointLocation", root + "/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        assert(q.awaitTermination(120000))
        while (spark.streams.active.exists(_.id == q.id)) Thread.sleep(50)
        assert(changeKey(spark.read.parquet(root + "/out")) ==
          changeKey(t.readChanges(1, t.latestVersion)),
          s"trial $trial diverged from batch readChanges after step $step")
      }
      t.append(mk(freshRows(2)).coalesce(1))
      for (step <- 1 to 12) {
        rnd.nextInt(8) match {
          case 0 | 1 => t.append(mk(freshRows(1 + rnd.nextInt(3))).coalesce(1))
          case 2 =>
            val existing = t.read().limit(1).collect()
              .map(r => (r.getLong(0), r.getString(1), 999.0)).toSeq
            t.merge(mk(freshRows(1) ++ existing).coalesce(1),
              Seq("k"), Seq($"v"))
          case 3 => t.update($"v" >= rnd.nextInt(40).toDouble,
            Map("v" -> (org.apache.spark.sql.functions.col("v") + 0.25)))
          case 4 => t.delete($"v" < rnd.nextInt(10).toDouble)
          case 5 => t.deleteLazy(s"v < ${rnd.nextInt(10)}")
          case 6 => t.compact(targetFileBytes = 4L * 1024)
          case 7 => drain(step)
        }
      }
      drain(13)
    }
  }

  test("CDF stream rides the V2 micro-batch source with version-atomic admission") {
    val root = tmpDir()
    val dir = root + "/t"
    val t = CommitLogTable.create(spark, dir,
      Seq.empty[(Long, Double)].toDF("k", "v").schema)
    (0 until 3).foreach(i => t.append(Seq((i.toLong, i * 1.0)).toDF("k", "v")))
    val q = spark.readStream.format("commitlog").option("path", dir)
      .option("readChangeFeed", "true").option("maxFilesPerTrigger", 1)
      .load()
      .writeStream.format("parquet").option("path", root + "/out")
      .option("checkpointLocation", root + "/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    // the route IS the V2 stream, not the V1 fallback
    val desc = q.recentProgress.flatMap(_.sources.map(_.description)).distinct
    assert(desc.exists(_.contains("CommitLogCdfMicroBatchStream")),
      s"expected the V2 CDF stream, saw: ${desc.mkString("; ")}")
    // content parity with the batch CDF read
    val got = spark.read.parquet(root + "/out")
      .select("k", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val batch = spark.read.format("commitlog")
      .option("readChangeFeed", "true").load(dir)
      .select("k", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(got == batch && got.size == 3)
    // maxFilesPerTrigger=1 → version-atomic pacing: every data batch
    // carries exactly ONE commit version (a version never splits, and
    // the cap stops the batch at the next version's files)
    val perBatch = q.recentProgress.filter(_.numInputRows > 0)
    assert(perBatch.length == 3,
      s"3 single-file change commits should pace to 3 batches, saw " +
        s"${perBatch.length}")
    // restart after one more commit: only the delta, exactly once
    t.delete(org.apache.spark.sql.functions.expr("k = 0"))
    val q2 = spark.readStream.format("commitlog").option("path", dir)
      .option("readChangeFeed", "true").load()
      .writeStream.format("parquet").option("path", root + "/out")
      .option("checkpointLocation", root + "/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    assert(q2.awaitTermination(120000))
    val after = spark.read.parquet(root + "/out").count()
    assert(after == 4, s"restart must append exactly the delete image, " +
      s"got $after rows")
  }
}
