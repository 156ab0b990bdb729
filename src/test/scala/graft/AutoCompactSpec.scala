package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.CommitLogTable

/** Post-commit auto-compact (`graft.autoCompact.minFiles` —
  * [[graft.tables.CommitLogTable]]`.maybeAutoCompact`, the
  * `autoCompact`/`optimizeWrite` options the reference's Bronze Delta
  * write sets, bronze_prices_auto_loader.ipynb cell 3): an
  * epoch-per-file stream must CONVERGE to a bounded file count per
  * partition without any scheduled OPTIMIZE, exactly-once must hold
  * across the interleaved compact commits, and partitions a commit
  * didn't touch must never be compacted.
  */
class AutoCompactSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val cat = s"graft_ac$n"
    val root = Files.createTempDirectory("graft-autocompact").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.CommitLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root + "/wh")
    (cat, root)
  }

  private def filesPerPartition(dir: String): Map[String, Int] =
    CommitLogTable.open(spark, dir).resolvedManifest(None).files
      .groupBy(_.partitionKey).map { case (p, fs) => p -> fs.size }

  test("armed table: repeated small appends converge; quiet partitions untouched") {
    val dir = Files.createTempDirectory("graft-ac-batch").toString + "/t"
    val df0 = Seq((0L, "hot", 0.0)).toDF("k", "part", "v")
    val t = CommitLogTable.create(spark, dir, df0.schema, Seq("part"))
    t.setProperties(Map(
      CommitLogTable.AutoCompactMinFilesProp -> "4",
      CommitLogTable.AutoCompactTargetBytesProp -> (1024 * 1024).toString))
    // one quiet partition, written once, never touched again
    t.append(Seq((1000L, "quiet", 1.0)).toDF("k", "part", "v"),
      recordChanges = false)
    val quietFile = CommitLogTable.open(spark, dir).resolvedManifest(None)
      .files.filter(_.partitionVals.contains("quiet")).map(_.path)
    assert(quietFile.size == 1)
    // 12 epoch-sized appends to the hot partition: without the hook this
    // leaves 12 files; with minFiles=4 it must keep converging
    (1 to 12).foreach { i =>
      t.append(Seq((i.toLong, "hot", i * 0.5)).toDF("k", "part", "v"),
        recordChanges = false)
    }
    val perPart = filesPerPartition(dir)
    assert(perPart("hot") < 4,
      s"hot partition must converge below the minFiles trigger, got $perPart")
    // exactly-once content across interleaved compacts
    val rows = CommitLogTable.open(spark, dir).read()
      .filter($"part" === "hot").select("k").as[Long].collect().sorted.toSeq
    assert(rows == (1L to 12L))
    // the quiet partition's ORIGINAL file survives — no compact touched it
    val quietNow = CommitLogTable.open(spark, dir).resolvedManifest(None)
      .files.filter(_.partitionVals.contains("quiet")).map(_.path)
    assert(quietNow == quietFile, "a quiet partition must never be compacted")
    // compact commits happened, and each was its own version
    val hist = CommitLogTable.open(spark, dir).history.collect()
      .map(_.getString(1))
    assert(hist.count(_ == "compact") >= 2, hist.mkString(","))
  }

  test("unarmed table: no compact commits ever fire") {
    val dir = Files.createTempDirectory("graft-ac-off").toString + "/t"
    val df0 = Seq((0L, "hot", 0.0)).toDF("k", "part", "v")
    val t = CommitLogTable.create(spark, dir, df0.schema, Seq("part"))
    (1 to 8).foreach { i =>
      t.append(Seq((i.toLong, "hot", i * 0.5)).toDF("k", "part", "v"),
        recordChanges = false)
    }
    assert(filesPerPartition(dir)("hot") == 8)
    assert(!CommitLogTable.open(spark, dir).history.collect()
      .map(_.getString(1)).contains("compact"))
  }

  test("epoch-per-file stream converges under the hook with exactly-once intact") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.br.t (k BIGINT, part STRING, v DOUBLE) " +
      "USING commitlog PARTITIONED BY (part) " +
      s"TBLPROPERTIES ('${CommitLogTable.AutoCompactMinFilesProp}'='4')")
    Files.createDirectories(Paths.get(root + "/in"))
    def drain(): Unit = {
      val q = spark.readStream.schema("k BIGINT, part STRING, v DOUBLE")
        .parquet(root + "/in/*")
        .writeStream.option("checkpointLocation", root + "/ckpt")
        .trigger(Trigger.AvailableNow()).toTable(s"$cat.br.t")
      assert(q.awaitTermination(120000))
      while (spark.streams.active.exists(_.id == q.id)) Thread.sleep(50)
    }
    (0 until 10).foreach { b =>
      Seq((b.toLong, "hot", b * 1.0)).toDF("k", "part", "v")
        .coalesce(1).write.parquet(s"$root/in/b$b")
      drain() // one epoch per batch → one small file per epoch
    }
    val dir = root + "/wh/br/t"
    assert(filesPerPartition(dir)("hot") < 4,
      s"streamed partition must converge, got ${filesPerPartition(dir)}")
    // exactly-once: every epoch's row lands exactly once
    assert(spark.sql(s"SELECT k FROM $cat.br.t ORDER BY k")
      .as[Long].collect().toSeq == (0L until 10L))
    val hist = CommitLogTable.open(spark, dir).history.collect()
      .map(_.getString(1))
    assert(hist.count(_ == "append") == 10, "one append per epoch")
    assert(hist.count(_ == "compact") >= 2, hist.mkString(","))
  }

  test("two-level partitioning: epoch-per-file stream converges per LEAF " +
      "with within-file clustering preserved (sortCols)") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.br.mp (k BIGINT, ep STRING, dt STRING, " +
      "v DOUBLE) USING commitlog PARTITIONED BY (ep, dt) " +
      s"TBLPROPERTIES ('${CommitLogTable.AutoCompactMinFilesProp}'='4', " +
      s"'${CommitLogTable.AutoCompactSortColsProp}'='k')")
    Files.createDirectories(Paths.get(root + "/in"))
    def drain(): Unit = {
      val q = spark.readStream.schema("k BIGINT, ep STRING, dt STRING, v DOUBLE")
        .parquet(root + "/in/*")
        .writeStream.option("checkpointLocation", root + "/ckpt")
        .trigger(Trigger.AvailableNow()).toTable(s"$cat.br.mp")
      assert(q.awaitTermination(120000))
      while (spark.streams.active.exists(_.id == q.id)) Thread.sleep(50)
    }
    // 12 epochs round-robining two leaves of one endpoint, DESCENDING k
    // within each epoch (so a coalesce-only compact would leave k
    // unsorted in the packed file)
    (0 until 12).foreach { b =>
      val dt = if (b % 2 == 0) "d1" else "d2"
      Seq((100L - b, "prices", dt, b * 1.0))
        .toDF("k", "ep", "dt", "v")
        .coalesce(1).write.parquet(s"$root/in/b$b")
      drain()
    }
    val dir = root + "/wh/br/mp"
    val perLeaf = filesPerPartition(dir)
    assert(perLeaf.keySet == Set("prices/d1", "prices/d2"), perLeaf.toString)
    assert(perLeaf.values.forall(_ < 4),
      s"every leaf must converge below minFiles, got $perLeaf")
    // exactly-once across the interleaved sorted compacts
    assert(spark.sql(s"SELECT k FROM $cat.br.mp ORDER BY k DESC")
      .as[Long].collect().toSeq == (89L to 100L).reverse)
    // clustering preserved: each multi-row compacted file is SORTED by k
    // (probe the parquet directly — row order inside the file, not the
    // query result, is what stats-skipping depends on)
    val m = CommitLogTable.open(spark, dir).resolvedManifest(None)
    val packed = m.files.filter(_.rows > 1)
    assert(packed.nonEmpty, "expected at least one bin-packed file")
    packed.foreach { f =>
      val ks = spark.read.parquet(s"$dir/${f.path}")
        .select("k").as[Long].collect().toSeq
      assert(ks == ks.sorted, s"file ${f.path} must be k-sorted, got $ks")
    }
  }
}
