package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks
import graft.streaming.FileStreamIngest

import java.nio.file.Files

class StreamingSinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("availableNow file stream: two triggers, exactly-once across restarts") {
    val src = tmp("src"); val out = tmp("out"); val ckpt = tmp("ckpt")
    val ev = Tables.events(spark, TestSpark.sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val total = ev.count()
    val slice1 = ev.filter($"event_id" % 2 === 0)
    val slice2 = ev.filter($"event_id" % 2 === 1)
    slice1.write.mode("append").parquet(src)
    val schema = ev.schema

    val s1 = FileStreamIngest.bronzeStream(spark, src, schema)
    FileStreamIngest.runAvailableNowAppend(s1, out, ckpt)
    assert(spark.read.parquet(out).count() == slice1.count())

    // new files arrive; a NEW query on the SAME checkpoint must pick up
    // only the delta (exactly-once across restarts)
    slice2.write.mode("append").parquet(src)
    val s2 = FileStreamIngest.bronzeStream(spark, src, schema)
    FileStreamIngest.runAvailableNowAppend(s2, out, ckpt)
    val got = spark.read.parquet(out)
    assert(got.count() == total)
    assert(got.select(countDistinct($"event_id")).collect()(0).getLong(0) == total)
  }

  test("foreachBatch silver upsert: latest-wins across two micro-batch runs") {
    val src = tmp("usrc"); val target = tmp("utgt") + "/silver"; val ckpt = tmp("uckpt")
    val b1 = Seq((1L, 10L, 1.0), (2L, 10L, 2.0)).toDF("k", "ord", "v")
    b1.write.mode("append").parquet(src)
    val schema = b1.schema
    FileStreamIngest.runAvailableNowUpsert(
      FileStreamIngest.bronzeStream(spark, src, schema),
      target, ckpt, Seq("k"), Seq($"ord".desc))
    val after1 = spark.read.parquet(target).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(after1 == Map(1L -> (10L, 1.0), 2L -> (10L, 2.0)))

    val b2 = Seq((1L, 20L, 9.0), (3L, 20L, 3.0)).toDF("k", "ord", "v")
    b2.write.mode("append").parquet(src)
    FileStreamIngest.runAvailableNowUpsert(
      FileStreamIngest.bronzeStream(spark, src, schema),
      target, ckpt, Seq("k"), Seq($"ord".desc))
    val after2 = spark.read.parquet(target).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(after2 == Map(1L -> (20L, 9.0), 2L -> (10L, 2.0), 3L -> (20L, 3.0)))
  }

  test("partitioned parquet sink: day partitions, idempotent unless forced") {
    val out = tmp("psink") + "/prices"
    val df = Seq(("2024-01-01", 1.0), ("2024-01-02", 2.0)).toDF("dt", "v")
    Sinks.partitionedParquet(df, out, "dt", force = false)
    assert(Files.exists(java.nio.file.Paths.get(out, "dt=2024-01-01")))
    // second non-forced write is a no-op (SaveMode.Ignore)
    Sinks.partitionedParquet(df.withColumn("v", lit(99.0)), out, "dt", force = false)
    assert(spark.read.parquet(out).filter($"v" === 99.0).count() == 0)
    // forced write replaces only the partitions present in the batch
    Sinks.partitionedParquet(
      Seq(("2024-01-01", 50.0)).toDF("dt", "v"), out, "dt", force = true)
    // partition column type inference reads dt back as a DATE — stringify
    val vals = spark.read.parquet(out).collect()
      .map(r => String.valueOf(r.getAs[Any]("dt")) -> r.getDouble(0)).toMap
    assert(vals == Map("2024-01-01" -> 50.0, "2024-01-02" -> 2.0))
  }

  test("ndjson.gz sink round-trips and writes gzip files") {
    val out = tmp("jsink") + "/raw"
    val df = Seq((1L, "income", "{\"a\":1}"), (2L, "income", "{\"b\":2}"))
      .toDF("id", "endpoint", "payload")
    Sinks.ndjsonGz(df, out, Seq("endpoint"))
    val files = Files.walk(java.nio.file.Paths.get(out)).toArray.map(_.toString)
    assert(files.exists(_.endsWith(".json.gz")))
    val back = spark.read.json(out)
    assert(back.count() == 2)
    assert(back.columns.contains("endpoint")) // partition column recovered
  }

  test("metrics sink appends one JSON document per run") {
    val out = tmp("msink") + "/metrics"
    val m = Sinks.RunMetrics("r1", "events", "2024-01-01T00:00:00", "2024-01-01T00:01:00", 100, 98, 2)
    Sinks.writeMetrics(spark, m, out)
    Sinks.writeMetrics(spark, m.copy(run_id = "r2"), out)
    val back = spark.read.json(out)
    assert(back.count() == 2)
    assert(back.select("rows_rejected").collect().forall(_.getLong(0) == 2))
  }
}
