package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Expectations, GoldFeatures, Normalize, TableOps}
import graft.streaming.FileStreamIngest

/** The reference's WHOLE architecture as one running artifact: an
  * always-on bronze→DQ/quarantine→silver→gold pipeline
  * (`FileStreamIngest.medallionBatch`) driven ProcessingTime, stopped
  * mid-stream ("crash"), restarted from its checkpoint, and required to
  * land row-for-row on the BATCH pipeline's answers: silver ==
  * `Normalize.events`, gold == `q_gold_features`'s window view,
  * quarantine == the batch DQ sweep. Exactly-once comes from keyed
  * upserts at every sink — a replayed micro-batch converges instead of
  * double-appending, which the replay test pins directly.
  */
class MedallionPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(s"graft-medallion-$p").toString

  // DQ rules mirroring Normalize.events' validation filter, so the
  // streamed silver is exactly the batch normalization of the good rows
  private val rules = Seq(
    Expectations.Expectation("not_null_ts", col("ts").isNotNull),
    Expectations.Expectation("not_null_user", col("user_id").isNotNull),
    Expectations.Expectation("nonneg_value", col("value") >= 0))

  private val rawCols = Seq("event_id", "ts", "user_id", "event_type", "value")

  /** events plus three injected DQ-violating rows (ids beyond the corpus). */
  private def corpus(): DataFrame = {
    val ev = Tables.events(spark, TestSpark.sfDir)
      .select(rawCols.map(col): _*)
    val bad = Seq(
      (900001L, Some("2024-01-10 01:02:03"), Option.empty[Long], Some("CLICK"), Some(1.0)),
      (900002L, Some("2024-01-11 01:02:03"), Some(7L), Some("view"), Some(-4.0)),
      (900003L, Option.empty[String], Some(8L), Some("view"), Some(2.0))
    ).toDF(rawCols: _*)
      .select(col("event_id"), col("ts").cast("timestamp"), col("user_id"),
        col("event_type"), col("value"))
    ev.unionByName(bad)
  }

  private def batchGold(all: DataFrame): DataFrame =
    GoldFeatures.features(Normalize.events(all), keyCols = Seq("user_id"),
      order = Seq(col("ts"), col("event_id")), valueCol = "value")

  private def assertSameSet(got: DataFrame, want: DataFrame): Unit = {
    val g = got.select(want.columns.map(col).toIndexedSeq: _*)
    assert(g.count() == want.count())
    assert(g.exceptAll(want).isEmpty && want.exceptAll(g).isEmpty)
  }

  test("always-on medallion: crash/restart, then exact batch parity for silver/gold/quarantine") {
    val src = tmp("src"); val out = tmp("out"); val ckpt = tmp("ckpt")
    val all = corpus()
    val schema = all.schema
    // waves split by event_id parity: wave 2 carries rows with EARLIER
    // timestamps than wave-1 rows of the same user — real late data, so
    // gold's incremental maintenance must re-derive downstream features
    val wave1 = all.filter($"event_id" % 2 === 0)
    val wave2 = all.filter($"event_id" % 2 === 1)

    wave1.write.mode("append").parquet(src)
    val q1 = FileStreamIngest.runProcessingTimeMedallion(
      FileStreamIngest.bronzeStream(spark, src, schema), out, ckpt, rules,
      interval = "50 milliseconds")
    try q1.processAllAvailable() finally q1.stop() // "crash" between batches

    // intermediate state is itself the batch answer over wave 1
    assertSameSet(spark.read.parquet(s"$out/gold"), batchGold(wave1))

    wave2.write.mode("append").parquet(src)
    val q2 = FileStreamIngest.runProcessingTimeMedallion(
      FileStreamIngest.bronzeStream(spark, src, schema), out, ckpt, rules,
      interval = "50 milliseconds")
    try q2.processAllAvailable() finally q2.stop()

    val silver = spark.read.parquet(s"$out/silver")
    assertSameSet(silver, Normalize.events(all))
    // exactly-once: one row per event
    assert(silver.select(countDistinct($"event_id")).as[Long].head() ==
      silver.count())
    assertSameSet(spark.read.parquet(s"$out/gold"), batchGold(all))
    val quar = spark.read.parquet(s"$out/quarantine")
    assert(quar.select("event_id").as[Long].collect().sorted.toSeq ==
      Seq(900001L, 900002L, 900003L))
    assert(quar.select("dq_reason").as[String].collect().toSet ==
      Set("not_null_ts", "not_null_user", "nonneg_value"))

    // checkpoint replay convergence: re-running an already-committed
    // micro-batch (what a crash INSIDE foreachBatch causes on restart)
    // leaves every table unchanged — all sinks are keyed upserts
    // materialize the pre-replay snapshot: the replay's upsert swaps the
    // underlying files, so a lazy frame over them would dangle
    val goldDf = spark.read.parquet(s"$out/gold")
    val goldCols = goldDf.columns.sorted.toSeq
    def goldRows() = spark.read.parquet(s"$out/gold")
      .select(goldCols.map(col): _*).collect().map(_.toString).sorted.toSeq
    val before = goldRows()
    val quarCount = quar.count()
    FileStreamIngest.medallionBatch(wave2, out, rules)
    assertSameSet(spark.read.parquet(s"$out/silver"), Normalize.events(all))
    assert(goldRows() == before)
    assert(spark.read.parquet(s"$out/quarantine").count() == quarCount)
  }

  test("ALWAYS-ON medallion over transactional tables: crash/restart, atomic commits, batch parity") {
    val src = tmp("clog-src"); val out = tmp("clog-stream-out"); val ckpt = tmp("clog-ckpt")
    val all = corpus()
    val schema = all.schema
    val wave1 = all.filter($"event_id" % 2 === 0)
    val wave2 = all.filter($"event_id" % 2 === 1)

    wave1.write.mode("append").parquet(src)
    val q1 = FileStreamIngest.runProcessingTimeMedallion(
      FileStreamIngest.bronzeStream(spark, src, schema), out, ckpt, rules,
      ops = TableOps.commitLog, interval = "50 milliseconds")
    try q1.processAllAvailable() finally q1.stop() // crash between batches

    wave2.write.mode("append").parquet(src)
    val q2 = FileStreamIngest.runProcessingTimeMedallion(
      FileStreamIngest.bronzeStream(spark, src, schema), out, ckpt, rules,
      ops = TableOps.commitLog, interval = "50 milliseconds")
    try q2.processAllAvailable() finally q2.stop()

    assertSameSet(TableOps.commitLog.readTable(spark, s"$out/silver"),
      Normalize.events(all))
    assertSameSet(TableOps.commitLog.readTable(spark, s"$out/gold"),
      batchGold(all))
    // every micro-batch landed as one atomic MERGE commit per table, and
    // the change feed replays the whole silver history
    val silverT = graft.tables.CommitLogTable.open(spark, s"$out/silver")
    val acts = silverT.history.select("action").as[String].collect()
    assert(acts.head == "create" && acts.tail.forall(_ == "merge"))
    val inserted = silverT.readChanges(1, silverT.latestVersion)
      .filter($"_change_type" === "insert").count()
    assert(inserted == Normalize.events(all).count(),
      "CDF insert images must cover exactly the silver rows")
    // quarantine goes through the same seam: transactional too
    val quar = TableOps.commitLog.readTable(spark, s"$out/quarantine")
    assert(quar.select("event_id").as[Long].collect().sorted.toSeq ==
      Seq(900001L, 900002L, 900003L))
  }

  test("quarantine replay convergence for NULL-id (malformed) rows") {
    val out = tmp("qnull")
    // both rows FAIL the DQ gate; the first is malformed to the point of a
    // NULL event_id — the exact shape a naive event_id-keyed upsert
    // re-inserts on every checkpointed replay (NULL keys never equi-match)
    val bad = Seq(
      (Option.empty[Long], Some("2024-01-10 01:02:03"), Option.empty[Long],
        Some("CLICK"), Some(1.0)),
      (Some(900002L), Some("2024-01-11 01:02:03"), Some(7L), Some("view"),
        Some(-4.0))
    ).toDF(rawCols: _*)
      .select(col("event_id"), col("ts").cast("timestamp"), col("user_id"),
        col("event_type"), col("value"))
    FileStreamIngest.medallionBatch(bad, out, rules)
    val first = spark.read.parquet(s"$out/quarantine")
    assert(first.count() == 2)
    assert(first.filter(col("quarantine_key").isNull).isEmpty,
      "the surrogate key must be non-null even for NULL-id rows")
    // a crash inside foreachBatch replays the batch verbatim — the keyed
    // upsert must converge instead of double-appending the NULL-id row
    FileStreamIngest.medallionBatch(bad, out, rules)
    assert(spark.read.parquet(s"$out/quarantine").count() == 2,
      "replayed malformed rows re-inserted: quarantine diverges under replay")
  }

  test("streaming upsert restarts across a schema evolution (commit-log binding)") {
    val src = tmp("evo-src"); val ckpt = tmp("evo-ckpt")
    val out = tmp("evo-out") + "/tbl"
    val keys = Seq("event_id", "day")
    def d(s: String) = java.sql.Date.valueOf(s)
    val narrow = Seq((1L, d("2024-01-01"), 1.0)).toDF("event_id", "day", "value")
    narrow.write.mode("append").parquet(src)
    FileStreamIngest.runAvailableNowUpsertPartitioned(
      FileStreamIngest.bronzeStream(spark, src, narrow.schema), out, ckpt,
      keys, Seq($"value"), "day", ops = TableOps.commitLog)
    // restart with a WIDENED source schema — the reference's Auto Loader
    // addNewColumns restart (`docs/databricks_setup.md:120`): the new
    // column must evolve the silver table in place, not crash the stream
    val wide = Seq((1L, d("2024-01-01"), 10.0, "fmp"),
      (2L, d("2024-01-02"), 2.0, "iex"))
      .toDF("event_id", "day", "value", "source")
    wide.write.mode("append").parquet(src)
    FileStreamIngest.runAvailableNowUpsertPartitioned(
      FileStreamIngest.bronzeStream(spark, src, wide.schema), out, ckpt,
      keys, Seq($"value"), "day", ops = TableOps.commitLog)
    val t = graft.tables.CommitLogTable.open(spark, out)
    assert(t.read().columns.toSeq == Seq("event_id", "day", "value", "source"))
    val got = t.read().select("event_id", "value", "source").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
    assert(got == Set((1L, 10.0, Some("fmp")), (2L, 2.0, Some("iex"))))
    // pre-evolution history is still time-travelable with its own schema
    assert(t.read(Some(1)).columns.toSeq == Seq("event_id", "day", "value"))
  }

  test("medallion through the transactional commit-log binding") {
    val out = tmp("clog-out")
    val all = corpus()
    val wave1 = all.filter($"event_id" % 2 === 0)
    val wave2 = all.filter($"event_id" % 2 === 1)
    FileStreamIngest.medallionBatch(wave1, out, rules, TableOps.commitLog)
    FileStreamIngest.medallionBatch(wave2, out, rules, TableOps.commitLog)
    val silver = TableOps.commitLog.readTable(spark, s"$out/silver")
    assertSameSet(silver, Normalize.events(all))
    assertSameSet(TableOps.commitLog.readTable(spark, s"$out/gold"),
      batchGold(all))
    // each batch = one atomic MERGE commit on each table
    val hist = graft.tables.CommitLogTable.open(spark, s"$out/gold")
      .history.select("action").as[String].collect().toSeq
    assert(hist == Seq("create", "merge", "merge"))
  }
}
