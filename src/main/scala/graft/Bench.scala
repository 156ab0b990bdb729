package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** Total stop-the-world GC time so far, in seconds — the delta across a
    * query diagnoses anomalous samples from the artifact itself (a query
    * whose wall-time balloons WITH gc_sec is memory pressure/contention; one
    * without is plan or IO).
    */
  private def gcSeconds(): Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum / 1e3
  }

  /** Time one query; a failure yields Left(marker) instead of a bogus
    * fast timing (a broken query must never look like a good one).
    * Right = (wall seconds, GC seconds inside the window).
    */
  def timeQuery(spark: SparkSession, sfDir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, (Double, Double)] = {
    val g0 = gcSeconds()
    val t0 = System.nanoTime()
    try {
      fn(spark, sfDir).count()
      Right(((System.nanoTime() - t0) / 1e9, gcSeconds() - g0))
    } catch {
      case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
    } finally {
      // release frames operators left cached for this query's plan —
      // without this, 40+ queries accumulate blocks and later queries
      // pay their predecessors' memory pressure
      CacheBin.drain()
    }
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: pay session/codegen/filesystem init once, outside the
    // timings — all four fact tables, so no query is first to list files
    // and parse parquet footers
    Tables.lineitem(spark, sfDir).count()
    Tables.events(spark, sfDir).count()
    Tables.documents(spark, sfDir).count()
    Tables.embeddings(spark, sfDir).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> timeQuery(spark, sfDir, fn)
    }
    // The downstream artifact keeps only the last ~2000 chars of stdout, and
    // round 5's line (per-query gc_sec inline) outgrew that window — the
    // total was cut off the front. The stdout line now carries ONLY the
    // contract fields ({"metric",…,"queries",…,"sf"}) at centisecond
    // precision; full-precision timings, per-query GC and peak heap land in
    // bench_last.json on disk.
    def r1(x: Double): Double = math.rint(x * 10) / 10
    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    val qs = results.map {
      case (k, Right((sec, _))) => s"\"$k\":${r1(sec)}"
      case (k, Left(err)) => s"""\"$k\":{"err":"${jsonEscape(err)}"}"""
    }.mkString("{", ",", "}")
    // per-query GC seconds as a SIBLING map: the driver's contract reads
    // "queries" as name→seconds, so diagnostics ride alongside, not inside
    val gcs = results.collect {
      case (k, Right((_, gc))) => s"\"$k\":${math.rint(gc * 1000) / 1000}"
    }.mkString("{", ",", "}")
    val qsFull = results.map {
      case (k, Right((sec, _))) => s"\"$k\":${r3(sec)}"
      case (k, Left(err)) => s"""\"$k\":{"err":"${jsonEscape(err)}"}"""
    }.mkString("{", ",", "}")
    // TRUE high-water mark across the run (per-pool peaks, heap pools
    // only) — an instantaneous getUsed read would miss a mid-run balloon
    // that a later full GC already reclaimed
    val peakMb = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getType == java.lang.management.MemoryType.HEAP)
        .map(p => math.max(0L, p.getPeakUsage.getUsed)).sum / (1024 * 1024)
    }
    CacheBin.drainAll() // suite end: release session-pinned shared results
    val total = r3(results.collect { case (_, Right((sec, _))) => sec }.sum)
    val failed = results.count(_._2.isLeft)
    // "queries" leads and metric/value/sf trail: JSON key order is
    // irrelevant to a parser, but the tail window clips the FRONT of the
    // output — this way the total survives even if the per-query map is cut
    val sfShort = java.nio.file.Paths.get(sfDir).getFileName.toString
    val failedPart = if (failed > 0) s""""failed":$failed,""" else ""
    val line = s"""{"queries":$qs,$failedPart"metric":"total","value":$total,"unit":"sec","sf":"$sfShort"}"""
    println(line)
    // full-precision detail (per-query ms, GC, peak heap) as a file: stdout
    // must stay inside the tail window, and harness wrappers (sbt) prefix
    // stdout anyway — the artifact on disk is always clean
    val detail = s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.length},"queries":$qsFull,"gc_sec":$gcs,"peak_heap_mb":$peakMb,"failed":$failed,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), detail + "\n")
    catch { case _: java.io.IOException => () } // stdout remains the contract
    spark.stop()
  }
}
