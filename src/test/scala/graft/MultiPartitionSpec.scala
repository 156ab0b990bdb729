package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.CommitLogTable

/** Multi-column (composite-key) partitioning through every plane that
  * was single-column until round 13: write layout + manifest tuples,
  * merge partition pruning, compact per LEAF partition, grouped
  * metadata-only aggregates over both key columns, storage-partitioned
  * joins on the composite key, the `_partition` metadata column, legacy
  * single-column manifest JSON back-compat, and the Delta bridge's
  * `add.partitionValues` map. Reference anchor: the raw zone's nested
  * `raw/fmp/<endpoint>/dt=…` layout (`fmp_dump_raw.py:86-111`) — a
  * 100 TB stock lake partitions by `(endpoint, dt)`, not one column.
  */
class MultiPartitionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def dir(): String =
    Files.createTempDirectory("graft-multipart").toString + "/t"

  private def mk(d: String): CommitLogTable = {
    val df = Seq(
      (1L, "prices", "2024-01-01", 1.0), (2L, "prices", "2024-01-01", 2.0),
      (3L, "prices", "2024-01-02", 3.0), (4L, "news", "2024-01-01", 4.0),
      (5L, "news", "2024-01-02", 5.0), (6L, "news", "2024-01-02", 6.0))
      .toDF("id", "endpoint", "dt", "v")
    val t = CommitLogTable.create(spark, d, df.schema, Seq("endpoint", "dt"))
    t.append(df, recordChanges = false)
    t
  }

  test("composite layout: per-file partition tuples, nested dirs, round-trip") {
    val d = dir(); val t = mk(d)
    val m = t.resolvedManifest(None)
    assert(m.partitionCols == Seq("endpoint", "dt"))
    assert(m.files.nonEmpty && m.files.forall(_.partitionVals.length == 2))
    val tuples = m.files.map(_.partitionVals).toSet
    assert(tuples == Set(Seq("prices", "2024-01-01"), Seq("prices", "2024-01-02"),
      Seq("news", "2024-01-01"), Seq("news", "2024-01-02")))
    // the files nest <shadow0>=endpoint/<shadow1>=dt in partition order
    assert(m.files.forall(f =>
      f.path.split('/').count(_.contains("=")) == 2))
    // read-back is exact (files physically carry the partition columns)
    assert(t.read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      (1L to 6L))
    // manifest JSON survives a re-open (list round-trip)
    val t2 = CommitLogTable.open(spark, d)
    assert(t2.resolvedManifest(None).files.map(_.partitionVals).toSet == tuples)
  }

  test("merge prunes by partition TUPLE, untouched leaves carry by reference") {
    val d = dir(); val t = mk(d)
    val before = t.resolvedManifest(None).files
      .map(f => f.partitionVals -> f.path).toMap
    val upd = Seq((2L, "prices", "2024-01-01", 20.0))
      .toDF("id", "endpoint", "dt", "v")
    t.merge(upd, keys = Seq("id"), order = Seq(col("v")))
    val after = t.resolvedManifest(None).files
      .map(f => f.partitionVals -> f.path).toMap
    // only the (prices, 2024-01-01) leaf was rewritten
    assert(after(Seq("prices", "2024-01-01")) != before(Seq("prices", "2024-01-01")))
    assert(after(Seq("prices", "2024-01-02")) == before(Seq("prices", "2024-01-02")))
    assert(after(Seq("news", "2024-01-01")) == before(Seq("news", "2024-01-01")))
    assert(after(Seq("news", "2024-01-02")) == before(Seq("news", "2024-01-02")))
    assert(t.read().filter(col("id") === 2).head().getDouble(3) == 20.0)
  }

  test("mergeInto ON-conjunct pruning binds any subset of partition columns") {
    val d = dir(); val t = mk(d)
    val before = t.resolvedManifest(None).files
      .map(f => f.partitionVals -> f.path).toMap
    val src = Seq((5L, "news", "2024-01-02", 50.0))
      .toDF("id", "endpoint", "dt", "v")
    // equi-conjuncts on BOTH partition columns → only that leaf rewrites
    t.mergeInto(src,
      condition = col("t.id") === col("s.id") &&
        col("t.endpoint") === col("s.endpoint") && col("t.dt") === col("s.dt"),
      matched = Seq(CommitLogTable.MatchedUpdate(None,
        Map("v" -> col("s.v")))),
      notMatched = Seq.empty, bySource = Seq.empty)
    val after = t.resolvedManifest(None).files
      .map(f => f.partitionVals -> f.path).toMap
    assert(after(Seq("news", "2024-01-02")) != before(Seq("news", "2024-01-02")))
    assert(after(Seq("prices", "2024-01-01")) == before(Seq("prices", "2024-01-01")))
    assert(after(Seq("prices", "2024-01-02")) == before(Seq("prices", "2024-01-02")))
    assert(after(Seq("news", "2024-01-01")) == before(Seq("news", "2024-01-01")))
    assert(t.read().filter(col("id") === 5).head().getDouble(3) == 50.0)
  }

  test("compact bin-packs per LEAF partition; values filter takes composite keys") {
    val d = dir(); val t = mk(d)
    // pile small files into one leaf
    (1 to 4).foreach { i =>
      t.append(Seq((100L + i, "prices", "2024-01-01", i * 1.0))
        .toDF("id", "endpoint", "dt", "v"), recordChanges = false)
    }
    val leafKey = t.resolvedManifest(None).files
      .find(_.partitionVals == Seq("prices", "2024-01-01")).get.partitionKey
    assert(leafKey == "prices/2024-01-01")
    val report = t.compact(64L * 1024 * 1024, values = Some(Seq(leafKey)))
    assert(report.keySet == Set(leafKey))
    val after = t.resolvedManifest(None).files
      .filter(_.partitionVals == Seq("prices", "2024-01-01"))
    assert(after.size == 1, s"leaf must bin-pack to one file, got $after")
    // other leaves untouched by the scoped pass
    assert(t.read().count() == 10)
  }

  test("grouped metadata aggregate over both partition columns: zero data files") {
    val d = dir(); mk(d)
    val q = spark.read.format("commitlog").load(d)
      .groupBy(col("endpoint"), col("dt"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"))
    assert(q.queryExecution.executedPlan.toString.contains("CommitLogAggScan"),
      q.queryExecution.executedPlan.toString)
    val rows = q.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set(("prices", "2024-01-01", 2L, 1L),
      ("prices", "2024-01-02", 1L, 3L), ("news", "2024-01-01", 1L, 4L),
      ("news", "2024-01-02", 2L, 5L)))
    // a SUBSET of the partition columns still pushes down: every file
    // belongs to exactly one (endpoint) group, so the manifest answers
    // the coarser rollup too — zero data files read
    val sub = spark.read.format("commitlog").load(d)
      .groupBy(col("endpoint")).agg(count(lit(1)).as("n"))
    assert(sub.queryExecution.executedPlan.toString.contains("CommitLogAggScan"))
    assert(sub.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("prices", 3L), ("news", 3L)))
    // duplicated grouping expressions keep the pushdown SHAPE contract
    // (one key column per expression) — ADVICE r12 regression
    val dup = spark.read.format("commitlog").load(d)
      .groupBy(col("endpoint"), col("dt"), col("endpoint"))
      .agg(count(lit(1)).as("n"))
    assert(dup.collect().length == 4)
  }

  test("storage-partitioned join on the composite key plans shuffle-free") {
    val d1 = dir(); mk(d1)
    val d2 = dir(); mk(d2)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val a = s2.read.format("commitlog").load(d1)
      .groupBy(col("endpoint"), col("dt"))
      .agg(sum(col("v")).as("sv"))
    val b = s2.read.format("commitlog").load(d2)
      .groupBy(col("endpoint"), col("dt"))
      .agg(count(lit(1)).as("n"))
    val j = a.join(b, Seq("endpoint", "dt"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(j.collect().length == 4)
  }

  test("_partition metadata column renders the composite key") {
    val d = dir(); mk(d)
    val parts = spark.read.format("commitlog").load(d)
      .select(col("_partition")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(parts == Set("prices/2024-01-01", "prices/2024-01-02",
      "news/2024-01-01", "news/2024-01-02"))
  }

  test("single-column tables keep the LEGACY manifest spelling on disk") {
    val d = dir()
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "part", "v")
    val t = CommitLogTable.create(spark, d, df.schema, Seq("part"))
    t.append(df, recordChanges = false)
    val logDir = java.nio.file.Paths.get(d, "_graft_log")
    val json = java.nio.file.Files.list(logDir).iterator()
    var sawLegacy = false
    import scala.jdk.CollectionConverters._
    json.asScala.filter(_.getFileName.toString.endsWith(".json")).foreach { p =>
      val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      assert(!s.contains("partitionCols"), s"single-col manifest must use legacy field: $p")
      if (s.contains("\"partitionCol\"")) sawLegacy = true
    }
    assert(sawLegacy)
    // and reads back identically
    assert(CommitLogTable.open(spark, d).resolvedManifest(None)
      .partitionCols == Seq("part"))
  }

  test("partition-column rename and drop-refusal cover every key column") {
    val d = dir(); val t = mk(d)
    intercept[IllegalArgumentException](t.dropColumn("dt"))
    t.renameColumn("dt", "day")
    val m = t.resolvedManifest(None)
    assert(m.partitionCols == Seq("endpoint", "day"))
    assert(t.read().filter(col("day") === "2024-01-02").count() == 3)
    intercept[IllegalArgumentException](
      t.update(col("id") === 1L, Map("day" -> lit("x"))))
  }

  test("Delta export carries the full partitionValues map") {
    val d = dir(); val t = mk(d)
    graft.tables.DeltaLogBridge.export(t)
    val back = graft.tables.DeltaLogBridge.read(spark, d)
    assert(back.orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      t.read().orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSeq)
    // the log names both columns
    val v0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(d, "_delta_log",
        "00000000000000000000.json")), "UTF-8")
    assert(v0.contains("\"partitionColumns\":[\"endpoint\",\"dt\"]"), v0)
    assert(v0.contains("\"endpoint\":\"prices\"") && v0.contains("\"dt\":\"2024-01-02\""))
  }

  test("streaming toTable routes rows into composite leaves exactly-once") {
    val root = Files.createTempDirectory("graft-multipart-stream")
    val d = root.toString + "/t"
    val ckpt = root.toString + "/ckpt"
    val srcDir = root.toString + "/src"
    val df = Seq((1L, "prices", "2024-01-01", 1.0),
      (2L, "news", "2024-01-02", 2.0)).toDF("id", "endpoint", "dt", "v")
    CommitLogTable.create(spark, d, df.schema, Seq("endpoint", "dt"))
    df.write.parquet(srcDir)
    val cat = "graft_mp_stream"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.CommitLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root.toString + "/wh")
    spark.sql(s"CREATE TABLE $cat.gold.mp (id BIGINT, endpoint STRING, " +
      "dt STRING, v DOUBLE) PARTITIONED BY (endpoint, dt)")
    val q = spark.readStream.schema(df.schema).parquet(srcDir)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(s"$cat.gold.mp")
    q.awaitTermination()
    val whDir = root.toString + "/wh/gold/mp"
    val m = CommitLogTable.open(spark, whDir).resolvedManifest(None)
    assert(m.partitionCols == Seq("endpoint", "dt"))
    assert(m.files.map(_.partitionVals).toSet ==
      Set(Seq("prices", "2024-01-01"), Seq("news", "2024-01-02")))
    assert(spark.sql(s"SELECT count(*) FROM $cat.gold.mp").head().getLong(0) == 2)
  }
}
