package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.CommitLogTable

/** V2 streaming WRITE into commit-log catalog tables
  * (`writeStream.toTable`, `CommitLogStreamingWrite`) — the sink the
  * reference's Auto Loader notebook runs against bronze
  * (`bronze_prices_auto_loader.ipynb` cell 3): executor-written staged
  * parquet, one transactional epoch commit, txn-idempotent replay.
  */
class CommitLogSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val cat = s"graft_sink$n"
    val root = Files.createTempDirectory("graft-clsink").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.CommitLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root + "/wh")
    (cat, root)
  }

  private def addInput(dir: String, batch: Int, rows: Seq[(Long, String, Double)]): Unit =
    rows.toDF("k", "part", "v").repartition(2).write.parquet(s"$dir/b$batch")

  private def drainInto(root: String, target: String): Unit = {
    val q = spark.readStream.schema("k BIGINT, part STRING, v DOUBLE")
      .parquet(root + "/in/*")
      .writeStream.option("checkpointLocation", root + "/ckpt")
      .trigger(Trigger.AvailableNow()).toTable(target)
    assert(q.awaitTermination(120000))
    // awaitTermination can return before the manager unregisters the
    // query; a fast restart on the same checkpoint then trips Spark's
    // concurrent-use check
    while (spark.streams.active.exists(_.id == q.id)) Thread.sleep(50)
  }

  test("toTable: epoch commits land as transactional appends with CDF; replay after a lost engine commit is a no-op") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.br.t (k BIGINT, part STRING, v DOUBLE) USING commitlog")
    Files.createDirectories(Paths.get(root + "/in"))
    addInput(root + "/in", 0, Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    drainInto(root, s"$cat.br.t")
    assert(spark.sql(s"SELECT k, v FROM $cat.br.t ORDER BY k")
      .as[(Long, Double)].collect().toSeq == Seq((1L, 1.0), (2L, 2.0)))

    val dir = root + "/wh/br/t"
    val t = CommitLogTable.open(spark, dir)
    val hist = t.history.collect()
    assert(hist.map(_.getString(1)).count(_ == "append") == 1,
      "one streamed epoch = one append commit")
    // CDF insert images recorded at the epoch's version
    val changes = t.readChanges(1, t.latestVersion)
      .select("k", "_change_type").as[(Long, String)].collect().toSeq
    assert(changes.sorted == Seq((1L, "insert"), (2L, "insert")))

    // crash between the TABLE commit and the ENGINE's checkpoint commit:
    // drop the sink's last commit marker (and its Hadoop .crc sidecar —
    // a stale checksum blocks the marker's rewrite) so the engine
    // replays the epoch
    val commits = Paths.get(root + "/ckpt/commits")
    val last = Files.list(commits).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
    while (last.hasNext) { val p = last.next(); if (!p.getFileName.toString.startsWith(".")) names += p }
    val victim = names.maxBy(_.getFileName.toString.toLong)
    Files.delete(victim)
    Files.deleteIfExists(victim.resolveSibling(s".${victim.getFileName}.crc"))
    drainInto(root, s"$cat.br.t")
    assert(spark.sql(s"SELECT count(*) FROM $cat.br.t").head.getLong(0) == 2,
      "replayed epoch must publish nothing (txn-recorded)")
    assert(t.latestVersion == hist.map(_.getLong(0)).max,
      "no new version on replay")

    // new input streams incrementally
    addInput(root + "/in", 1, Seq((3L, "a", 3.0)))
    drainInto(root, s"$cat.br.t")
    assert(spark.sql(s"SELECT count(*) FROM $cat.br.t").head.getLong(0) == 3)
  }

  test("toTable on a PARTITIONED table routes files by partition value; stats prune per partition") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.br.p (k BIGINT, part STRING, v DOUBLE) " +
      "USING commitlog PARTITIONED BY (part)")
    Files.createDirectories(Paths.get(root + "/in"))
    addInput(root + "/in", 0,
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0), (4L, null, 4.0)))
    drainInto(root, s"$cat.br.p")

    val t = CommitLogTable.open(spark, root + "/wh/br/p")
    val m = t.resolvedManifest(None)
    assert(m.files.nonEmpty && m.files.forall(_.partitionVals.nonEmpty),
      "every streamed file must carry its partition value")
    val parts = m.files.flatMap(_.partitionVals).toSet
    assert(parts.contains("a") && parts.contains("b") &&
      parts.exists(p => p.contains("DEFAULT_PARTITION")),
      s"expected a/b/null partitions, got $parts")
    // RequiresDistributionAndOrdering clusters the epoch by partition
    // value before the writers: ONE file per touched partition, not
    // task-count × value (the input arrived across 2 shuffle partitions)
    assert(m.files.size == parts.size,
      s"expected one file per partition value, got ${m.files.size} files " +
        s"for ${parts.size} values")
    // partition-selective read touches only that partition's files
    val aRows = t.readPartitions(Set("a"))
      .select("k").as[Long].collect().toSeq.sorted
    assert(aRows == Seq(1L, 3L))
    assert(spark.sql(s"SELECT k FROM $cat.br.p WHERE part IS NULL")
      .as[Long].head() == 4L)
  }

  test("a fully-filtered epoch publishes nothing: idle micro-batches never grow the log") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.br.f (k BIGINT, part STRING, v DOUBLE) USING commitlog")
    Files.createDirectories(Paths.get(root + "/in"))
    addInput(root + "/in", 0, Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    val q = spark.readStream.schema("k BIGINT, part STRING, v DOUBLE")
      .parquet(root + "/in/*").filter("k > 100") // drops every row
      .writeStream.option("checkpointLocation", root + "/ckpt")
      .trigger(Trigger.AvailableNow()).toTable(s"$cat.br.f")
    assert(q.awaitTermination(120000))
    val t = CommitLogTable.open(spark, root + "/wh/br/f")
    assert(t.latestVersion == 0L,
      "an all-filtered epoch must not publish a version")
    assert(spark.sql(s"SELECT count(*) FROM $cat.br.f").head.getLong(0) == 0)
  }

  test("batch readChangeFeed through the format path serves the commit range") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.br.cdf (k BIGINT, v DOUBLE) USING commitlog")
    spark.sql(s"INSERT INTO $cat.br.cdf VALUES (1, 1.0), (2, 2.0)") // v1
    spark.sql(s"UPDATE $cat.br.cdf SET v = 20.0 WHERE k = 2")        // v2
    val dir = root + "/wh/br/cdf"
    val all = spark.read.format("commitlog").option("readChangeFeed", "true")
      .load(dir).select("k", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(all == Seq((1L, "insert", 1L), (2L, "insert", 1L),
      (2L, "update_postimage", 2L), (2L, "update_preimage", 2L)))
    val ranged = spark.read.format("commitlog")
      .option("readChangeFeed", "true").option("startingVersion", "2")
      .load(dir).select("_change_type").as[String].collect().toSeq.sorted
    assert(ranged == Seq("update_postimage", "update_preimage"))
    // the table_changes TVF: same rows through SQL, by catalog name and
    // by path, version-ranged
    val tvf = spark.sql("SELECT _change_type FROM " +
      s"commitlog_table_changes('$cat.br.cdf', 2)")
      .as[String].collect().toSeq.sorted
    assert(tvf == ranged)
    assert(spark.sql(
      s"SELECT count(*) FROM commitlog_table_changes('$dir', 1, 1)")
      .head.getLong(0) == 2, "path form + endingVersion")
  }

  test("readChangeFeed through a catalog table read serves CHANGES, never silently data") {
    // round 12 closes the gap this test used to pin as a refusal: the
    // table-read CDF spelling now serves the change feed itself
    // (plans/CdfRelation.scala) — the invariant is unchanged, data rows
    // must never masquerade as the change feed
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.br.c (k BIGINT) USING commitlog")
    spark.sql(s"INSERT INTO $cat.br.c VALUES (1)")
    val got = spark.read.option("readChangeFeed", "true")
      .table(s"$cat.br.c")
      .select("k", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "insert", 1L)))
    val q = spark.readStream.option("readChangeFeed", "true")
      .table(s"$cat.br.c")
      .writeStream.format("parquet").option("path", root + "/cdfout")
      .option("checkpointLocation", root + "/cdfckpt")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    assert(spark.read.parquet(root + "/cdfout")
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "insert")))
  }

  test("vacuum sweeps a crashed stream's staging debris past the grace window") {
    val (_, root) = freshCatalog()
    val dir = root + "/wh/br/v"
    CommitLogTable.create(spark, dir,
      Seq.empty[(Long, Double)].toDF("k", "v").schema)
    val stage = Paths.get(dir, "_streaming_stage", "dead-query", "0")
    Files.createDirectories(stage)
    Files.writeString(stage.resolve("t0-0-0.parquet"), "debris")
    // within grace: untouched (could be an in-flight epoch)
    CommitLogTable.vacuumPath(dir, retainVersions = 1)
    assert(Files.exists(stage.resolve("t0-0-0.parquet")))
    // past grace: swept, empty dirs pruned. (aged() is STRICTLY greater
    // — a file written in the same millisecond as the sweep isn't past
    // a zero grace window; step past it)
    Thread.sleep(20)
    CommitLogTable.vacuumPath(dir, retainVersions = 1, orphanGraceMillis = 0)
    assert(!Files.exists(stage.resolve("t0-0-0.parquet")))
    assert(!Files.exists(stage), "empty epoch dir pruned")
  }

  test("medallion: readStream.table(bronze) -> transform -> toTable(silver), end to end exactly-once") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.br.prices (k BIGINT, part STRING, v DOUBLE) USING commitlog")
    spark.sql(s"CREATE TABLE $cat.ag.prices (k BIGINT, v2 DOUBLE) USING commitlog")
    spark.sql(s"INSERT INTO $cat.br.prices VALUES (1, 'a', 1.0), (2, 'b', 2.0)")

    def run(): Unit = {
      val q = spark.readStream.table(s"$cat.br.prices")
        .selectExpr("k", "v * 2 AS v2")
        .writeStream.option("checkpointLocation", root + "/ckpt2")
        .trigger(Trigger.AvailableNow()).toTable(s"$cat.ag.prices")
      assert(q.awaitTermination(120000))
    }
    run()
    assert(spark.sql(s"SELECT k, v2 FROM $cat.ag.prices ORDER BY k")
      .as[(Long, Double)].collect().toSeq == Seq((1L, 2.0), (2L, 4.0)))

    spark.sql(s"INSERT INTO $cat.br.prices VALUES (3, 'a', 3.0)")
    run()
    assert(spark.sql(s"SELECT k, v2 FROM $cat.ag.prices ORDER BY k")
      .as[(Long, Double)].collect().toSeq ==
      Seq((1L, 2.0), (2L, 4.0), (3L, 6.0)))

    run() // idle: no new versions on either side
    assert(spark.sql(s"SELECT count(*) FROM $cat.ag.prices").head.getLong(0) == 3)
  }

  test("gold layer: windowed aggregation with watermark from readStream.table into toTable") {
    // the reference's full streaming stack composed on the table format:
    // silver (commit-log table) -> watermark + tumbling window agg in
    // append mode (windows finalize when the watermark passes) -> gold
    // (commit-log table via the epoch sink)
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ag.silver (ts TIMESTAMP, sym STRING, px DOUBLE) USING commitlog")
    spark.sql(s"CREATE TABLE $cat.ag.gold (window_start TIMESTAMP, sym STRING, n BIGINT, sum_px DOUBLE) USING commitlog")
    spark.sql(s"INSERT INTO $cat.ag.silver VALUES " +
      "(TIMESTAMP'2024-01-02 09:30:10', 'A', 10.0), " +
      "(TIMESTAMP'2024-01-02 09:30:40', 'A', 12.0), " +
      "(TIMESTAMP'2024-01-02 09:31:05', 'B', 5.0)")

    def run(): Unit = {
      val q = spark.readStream.table(s"$cat.ag.silver")
        .withWatermark("ts", "30 seconds")
        .groupBy(org.apache.spark.sql.functions.window($"ts", "1 minute"),
          $"sym")
        .agg(org.apache.spark.sql.functions.count("*").as("n"),
          org.apache.spark.sql.functions.sum($"px").as("sum_px"))
        .selectExpr("window.start AS window_start", "sym", "n", "sum_px")
        .writeStream.option("checkpointLocation", root + "/ckptG")
        .trigger(Trigger.AvailableNow()).toTable(s"$cat.ag.gold")
      assert(q.awaitTermination(120000))
      while (spark.streams.active.exists(_.id == q.id)) Thread.sleep(50)
    }
    run()
    // a late-enough second wave advances the watermark past 09:31,
    // finalizing both earlier windows
    spark.sql(s"INSERT INTO $cat.ag.silver VALUES " +
      "(TIMESTAMP'2024-01-02 09:33:00', 'A', 1.0)")
    run()
    val gold = spark.sql(
      s"SELECT sym, n, sum_px FROM $cat.ag.gold ORDER BY sym")
      .as[(String, Long, Double)].collect().toSeq
    assert(gold.contains(("A", 2L, 22.0)) && gold.contains(("B", 1L, 5.0)),
      s"finalized 09:30/09:31 windows expected, got $gold")
    // exactly-once across the whole stack: idle rerun adds nothing
    val before = spark.sql(s"SELECT count(*) FROM $cat.ag.gold").head.getLong(0)
    run()
    assert(spark.sql(s"SELECT count(*) FROM $cat.ag.gold")
      .head.getLong(0) == before)
  }

  test("schema drift between epochs fails the commit with a restart instruction; Complete mode refused") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.br.s (k BIGINT, part STRING, v DOUBLE) USING commitlog")
    Files.createDirectories(Paths.get(root + "/in"))
    addInput(root + "/in", 0, Seq((1L, "a", 1.0)))
    drainInto(root, s"$cat.br.s")
    // table evolves AFTER the stream's first run
    spark.sql(s"ALTER TABLE $cat.br.s ADD COLUMNS (extra BIGINT)")
    addInput(root + "/in", 1, Seq((2L, "b", 2.0)))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drainInto(root, s"$cat.br.s"))
    assert(ex.getMessage.contains("restart the stream") ||
      Option(ex.getCause).exists(_.getMessage.contains("restart the stream")),
      s"got: ${ex.getMessage}")

    // Complete output mode is refused up front
    val agg = spark.readStream.schema("k BIGINT, part STRING, v DOUBLE")
      .parquet(root + "/in/*").groupBy($"part").count()
    val ex2 = intercept[Exception] {
      val q = agg.writeStream.outputMode("complete")
        .option("checkpointLocation", root + "/ckptC")
        .trigger(Trigger.AvailableNow()).toTable(s"$cat.br.s")
      q.awaitTermination(120000)
    }
    assert(ex2.getMessage.contains("Append") ||
      Option(ex2.getCause).exists(_.getMessage.contains("Append")))
  }
}
