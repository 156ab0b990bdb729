package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Measured skew evidence for the shuffle-join mitigation ladder
  * (broadcast → AQE skew-join → `Skew.saltedJoin`): build a join where
  * ONE key holds half the big side's rows — the celebrity-key shape that
  * turns a 32-way shuffle into a 1-task straggler — and record the
  * per-task duration distribution under three configurations:
  *
  *   1. `unsalted_aqe_off`  — the naive plan: the hot key's reducer does
  *      half the work alone; wall time ≈ the straggler.
  *   2. `unsalted_aqe_on`   — AQE skew-join splits the oversized
  *      partition at runtime (threshold lowered so the demo corpus
  *      qualifies; at 100 TB the defaults trigger on their own).
  *   3. `salted`            — [[Skew.saltedJoin]]: explicit salting for
  *      plans AQE can't fix (it only splits sort-merge/shuffle-hash
  *      joins — a skewed aggregation or a join shape AQE declines still
  *      needs the manual lever).
  *
  * All three must return identical row counts (salting only moves
  * partition placement). Usage:
  *   tools/run.sh graft.SkewProbe [dir=/tmp/scale10x] [amp=16] [salt=32]
  * Prints one JSON line per mode; "speedup" compares each mode's wall
  * time to mode 1.
  */
object SkewProbe {

  /** Collects per-task durations; reset per measured block. */
  private class TaskMeter extends SparkListener {
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      if (te.taskInfo != null) durations.add(te.taskInfo.duration)
    def reset(): Unit = durations.clear()
    def snapshot(): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      durations.asScala.toSeq.sorted
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/scale10x")
    val amp = args.lift(1).map(_.toInt).getOrElse(16)
    val salt = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = Sessions.build("local[32]", 32, "graft-skew-probe")
    spark.sparkContext.setLogLevel("WARN")
    val meter = new TaskMeter
    spark.sparkContext.addSparkListener(meter)

    // big side: docs amplified `amp`× with a celebrity key — pmod(id,10)<5
    // maps HALF the rows to key 0, the rest spread over 1..1000. Cached
    // and pre-materialized so every measured mode pays ONLY the shuffle +
    // join, not the scan/explode (whose own task distribution would
    // otherwise pollute the straggler comparison).
    val big = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        explode(expr(s"sequence(1, $amp)")).as("__rep"))
      .select(col("doc_id"), col("n_chars"), col("__rep"),
        when(pmod(col("doc_id"), lit(10)) < 5, lit(0L))
          .otherwise(pmod(col("doc_id"), lit(1000)) + 1).as("k"))
      .repartition(32)
      .persist()
    big.count()
    // small side: one dim row per key — broadcast DISABLED below, because
    // the scenario under test is "both sides too large to broadcast"
    val small = spark.range(0, 1001).select(col("id").as("k"),
      (col("id") * 37 % 101).as("dim_payload"))

    def run(mode: String, skewJoinOn: Boolean, joined: => DataFrame,
        baseSec: Double): Double = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoinOn.toString)
      // lower the skew thresholds so the demo-scale hot partition
      // qualifies (production defaults: 256m/5x — this corpus's hot
      // partition is tens of MB, real 100 TB hot keys are not)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      try {
        meter.reset()
        val t0 = System.nanoTime()
        val df = joined
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // let task-end events settle
        val d = meter.snapshot()
        val rows = df.count()
        val maxMs = if (d.isEmpty) 0L else d.last
        val p50 = if (d.isEmpty) 0L else d(d.size / 2)
        val speedup = if (baseSec > 0) math.rint(baseSec / sec * 100) / 100 else 1.0
        println(s"""{"probe":"skew","mode":"$mode","sec":${r2(sec)},""" +
          s""""task_max_ms":$maxMs,"task_p50_ms":$p50,"tasks":${d.size},""" +
          s""""rows":$rows,"speedup_vs_naive":$speedup}""")
        sec
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      }
    }

    val naiveSec = run("unsalted_aqe_off", skewJoinOn = false,
      big.join(small, Seq("k")), 0.0)
    run("unsalted_aqe_on", skewJoinOn = true,
      big.join(small, Seq("k")), naiveSec)
    run("salted_aqe_off", skewJoinOn = false,
      Skew.saltedJoin(big, small, Seq("k"), saltFactor = salt), naiveSec)
    spark.stop()
  }

  private def r2(d: Double): Double = math.rint(d * 100) / 100
}
