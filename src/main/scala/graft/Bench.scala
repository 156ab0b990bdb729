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
    *
    * Materialization is a noop-sink WRITE, not count(): under count() the
    * optimizer prunes every count-independent subtree — a left join
    * against a groupBy (unique keys ⇒ join eliminated), a window or regex
    * column nobody counts — so projection-heavy queries (chunk dedup, PII
    * scrub inside curate) timed near zero while Verify paid their real
    * cost. The noop sink consumes every output column, which is what a
    * consumer of the query does.
    */
  def timeQuery(spark: SparkSession, sfDir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, (Double, Double)] = {
    val g0 = gcSeconds()
    val t0 = System.nanoTime()
    try {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
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

  /** JIT/codegen warm-up on SYNTHETIC data (spark.range — deliberately not
    * the sfDir tables, so no query-specific data cache is primed): at bench
    * scale the tables are small and per-query wall time is dominated by
    * one-time infrastructure cost — Janino compilation of the first
    * generated classes, C2-compiling the interpreter/codegen hot paths,
    * first-use init of each physical operator (hash agg, window sort, SMJ,
    * broadcast exchange, explode, array/string intrinsics). The first few
    * TIMED queries paid all of it (q1 ran 1.5 s for a 600k-row agg; the
    * same query warm runs ~0.3 s), which measured JVM startup, not plans.
    * One pass of representative shapes moves that cost into the untimed
    * window — exactly what a long-lived production session amortizes.
    */
  private def warmUpOperators(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val base = spark.range(0, 20000).select(col("id"),
      (col("id") % 97).as("k"),
      concat_ws(" ", lit("warm"), col("id").cast("string"),
        lit("tokens of some text"), (col("id") % 7).cast("string")).as("txt"))
    // hash aggregate + partial agg + string hash/regex machinery
    base.select(col("k"), sha2(col("txt"), 256).as("h"),
        xxhash64(col("txt")).as("x"),
        regexp_replace(col("txt"), "[0-9]+", "#").as("r"))
      .groupBy(col("k"))
      .agg(count(lit(1)), min(col("h")), max(col("r")), sum(col("x")))
      .count()
    // window sort + row_number/lag + collect_list + array intrinsics
    val w = Window.partitionBy(col("k")).orderBy(col("id"))
    base.select(col("id"), col("k"), row_number().over(w).as("rn"),
        lag(col("id"), 1).over(w).as("lg"))
      .filter(col("rn") <= 3)
      .groupBy(col("k")).agg(collect_list(col("id")).as("ids"))
      .select(size(array_distinct(col("ids"))).as("n")).agg(sum(col("n")))
      .count()
    // explode of an in-row sequence + re-agg (the shingle/chunk shape)
    base.limit(2000)
      .select(col("id"), explode(expr(
        "transform(sequence(1, 8), i -> substring(txt, i, 6))")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).count()
    // sort-merge join (above broadcast threshold semantics via hint) and
    // broadcast join, plus a distinct
    val l = base.select(col("id"), col("k"))
    val r = base.select(col("id"), (col("id") % 13).as("j"))
    l.hint("merge").join(r, Seq("id")).groupBy(col("j")).count().count()
    l.join(broadcast(r.limit(100)), Seq("id"), "left_semi").distinct().count()
    // higher-order numeric path (the cosine/dot-product shape)
    spark.range(0, 500).select(col("id"),
        expr("transform(sequence(1, 16), i -> cast(i * (id % 7 + 1) as double))").as("v"))
      .select(expr("aggregate(zip_with(v, v, (a, b) -> a * b), 0D, (acc, x) -> acc + x)").as("d"))
      .agg(sum(col("d"))).count()
  }

  /** Table-format warm-up on synthetic data in a throwaway dir: the
    * first commitlog MERGE of a session pays ~5 s of one-time codegen
    * (the full-outer-join change-set plan, manifest serde, parquet
    * footer readers) that round 12's A/B memo attribution proved is
    * session-scoped, not per-table — so single-sample driver benches
    * swung ±3 s on whichever query built the first demo table. One
    * untimed append+merge+CDF exercise moves that cost out of the
    * timings, exactly like [[warmUpOperators]] does for stock plans.
    */
  private def warmUpTableFormat(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bench-warm").toString + "/t"
    val df = spark.range(0, 2000).select(col("id").as("k"),
      (col("id") % 5).cast("string").as("part"), (col("id") * 0.5).as("v"))
    val t = graft.tables.CommitLogTable.create(spark, dir, df.schema,
      Seq("part"))
    t.append(df)
    t.merge(df.limit(500).withColumn("v", col("v") + 1.0),
      keys = Seq("k"), order = Seq(col("v")))
    t.readChanges(1, t.latestVersion).write.format("noop")
      .mode("overwrite").save()
    spark.read.format("commitlog").load(dir).filter(col("k") >= 1500)
      .groupBy(col("part")).agg(count(lit(1))).count()
    () // the throwaway dir dies with /tmp — nothing to clean inline
  }

  /** The FROZEN round-1 query basket (the 29 queries of the first green
    * sf0.1 run, BENCH_r01.json) — its subtotal is emitted every round as
    * `basket_r1`, so the self-relative baseline compares like against like
    * even as the full query set grows. Do NOT edit this list: its value is
    * being frozen.
    */
  private val basketR1: Set[String] = Set(
    "q1_pricing_summary", "q6_revenue_filter", "q_asof_purchase",
    "q_binary_meta", "q_cosine_topk", "q_count_by_type", "q_coverage",
    "q_day_filehash", "q_dedup_keeplast", "q_docs_exact_dedup", "q_dq_audit",
    "q_dup_props", "q_embed_neardup", "q_envelope", "q_fingerprint",
    "q_gold_features", "q_ivf_assign", "q_latest_day_monitor",
    "q_minhash_pairs", "q_month_chunks", "q_ngram_jaccard", "q_norm_events",
    "q_quarantine", "q_revenue_by_nation", "q_silver_merge", "q_simhash",
    "q_text_stats", "q_topk_users", "q_trading_calendar")

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
    // timings — a FULL noop read of all four fact tables, so no timed
    // query is first to list files, parse footers, JIT the vectorized
    // column decoders, or fault the data pages in from disk (count()
    // alone reads only metadata; the first COLUMN scan was still cold and
    // landed on whichever query ran first)
    // Each warm-up step is fault-isolated: round 7's bench died rc=1 in
    // THIS untimed block (an events-loader analysis error) before a single
    // query ran — a warm-up must never be able to zero the whole artifact.
    // A swallowed warm-up failure must still leave a trace: without the
    // stderr line, a loader regression is invisible here and the first timed
    // query silently absorbs both the cold cache and the original error.
    def warmSafe(name: String)(step: => Unit): Unit =
      try step catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] warm-up '$name' failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    warmSafe("lineitem")(Tables.lineitem(spark, sfDir).write.format("noop").mode("overwrite").save())
    warmSafe("events")(Tables.events(spark, sfDir).write.format("noop").mode("overwrite").save())
    warmSafe("documents")(Tables.documents(spark, sfDir).write.format("noop").mode("overwrite").save())
    warmSafe("embeddings")(Tables.embeddings(spark, sfDir).write.format("noop").mode("overwrite").save())
    warmSafe("operators")(warmUpOperators(spark))
    warmSafe("tableFormat")(warmUpTableFormat(spark))
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> timeQuery(spark, sfDir, fn)
    }
    // Two MORE samples of the frozen basket → per-query median-of-3
    // (`basket_r1_med`). Single-sample basket totals swing ±25% under
    // co-tenant load (round-9 documented spread 17.3–22.1 s), which makes
    // one-round regressions unreadable; the median pins them. The extra
    // samples run with every session memo already built, so the median is
    // the REPEAT-STABLE marginal cost of the basket plans — `basket_r1`
    // (first-sample sum, memo builds billed to first consumers) remains
    // the apples-to-apples gate number against BASELINE.md.
    // SPARK_GRAFT_MEDIAN_ALL=1 resamples EVERY query (profiling runs:
    // separates one-time memo-build cost from a plan's repeat-stable
    // marginal cost for the whole suite); default resamples the basket
    val sampleAll = sys.env.contains("SPARK_GRAFT_MEDIAN_ALL")
    val basketQs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(p => sampleAll || basketR1(p._1))
    val extraSamples = (1 to 2).map { _ =>
      basketQs.map { case (name, fn) =>
        name -> timeQuery(spark, sfDir, fn) }.toMap
    }
    val medianSamples = results.collect {
      case (k, Right((s0, _))) if sampleAll || basketR1(k) =>
        k -> (s0 +: extraSamples.flatMap(_.get(k).collect {
          case Right((s, _)) => s }))
    }
    val basketSamples = medianSamples.filter(p => basketR1(p._1))
    val basketMed = basketSamples
      .map { case (_, ss) => ss.sorted.apply(ss.size / 2) }.sum
    // per-sample basket sums document the run's spread in the artifact
    val basketSums = (0 to 2).map(i => basketSamples.map {
      case (_, ss) => if (i < ss.size) ss(i) else ss.head }.sum)
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
    // per-memo build seconds (read BEFORE drainAll in case hooks evolve):
    // the shared-pipeline cost attribution — q_curate's wall time includes
    // building the MinHash pair memo its four siblings then read at ~0
    val memoSec = SessionMemo.buildSeconds.toSeq.sortBy(_._1).map {
      case (k, sec) => s"\"${jsonEscape(k)}\":${r3(sec)}"
    }.mkString("{", ",", "}")
    CacheBin.drainAll() // suite end: release session-pinned shared results
    val total = r3(results.collect { case (_, Right((sec, _))) => sec }.sum)
    // frozen r1-basket subtotal: the apples-to-apples number against
    // BASELINE.md's 29-query baseline, judged from the artifact alone
    val basket = r3(results.collect {
      case (k, Right((sec, _))) if basketR1(k) => sec }.sum)
    // always emit "failed" (even 0): a parser distinguishing failed:0 from
    // key-absent must not break on the good case
    val failed = results.count(_._2.isLeft)
    // "queries" leads and metric/value/sf trail: JSON key order is
    // irrelevant to a parser, but the tail window clips the FRONT of the
    // output — this way the total survives even if the per-query map is cut
    val line = s"""{"queries":$qs,"failed":$failed,"basket_r1":$basket,"basket_r1_med":${r3(basketMed)},"metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}"""
    println(line)
    // full-precision detail (per-query ms, GC, peak heap, memo builds) as a
    // file: stdout must stay inside the tail window, and harness wrappers
    // (sbt) prefix stdout anyway — the artifact on disk is always clean
    val basketMedQs = medianSamples.map { case (k, ss) =>
      s"\"$k\":${r3(ss.sorted.apply(ss.size / 2))}" }.mkString("{", ",", "}")
    val detail = s"""{"metric":"total","value":$total,"unit":"sec","basket_r1":$basket,"basket_r1_med":${r3(basketMed)},"basket_r1_samples":[${basketSums.map(r3).mkString(",")}],"basket_med_queries":$basketMedQs,"n_queries":${results.length},"queries":$qsFull,"gc_sec":$gcs,"memo_sec":$memoSec,"peak_heap_mb":$peakMb,"failed":$failed,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), detail + "\n")
    catch { case _: java.io.IOException => () } // stdout remains the contract
    spark.stop()
  }
}
