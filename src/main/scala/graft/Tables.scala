package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under the scale-factor dir. Reads are plain
  * `spark.read.parquet` so Catalyst gets full projection/predicate pushdown
  * into the vectorized parquet reader — at cluster scale these would be
  * partitioned directories and the same call sites pick up partition pruning
  * for free.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Split-for-parallelism table service over the FACT tables: the local
    * testdata ships each table as ONE parquet file with ONE row group, and
    * parquet parallelism is row-group-granular — so every scan-heavy first
    * stage (decode + per-row expressions + partial aggregation) ran on a
    * single task while the other 31 cores idled. At cluster scale inputs
    * arrive in thousands of splits and this is a non-problem; locally the
    * engine applies its own remedy ONCE per (session, corpus): rewrite the
    * table as a multi-file parquet mirror (the inverse of the OPTIMIZE
    * compaction service — same table-layout discipline, opposite
    * direction) and read the mirror. Every row is preserved; no operator
    * in the engine depends on input row order. A well-split input
    * (≥ half the cluster's scan slots) is left untouched — the mirror is a
    * local-input repair, not a default extra hop.
    */
  private def splitMirror(spark: SparkSession, dir: String, name: String,
      prep: DataFrame => DataFrame = identity): DataFrame = {
    val raw = prep(load(spark, dir, name))
    val parallelism = spark.sparkContext.defaultParallelism
    // file count, not df.rdd.getNumPartitions: the RDD probe forces a
    // physical planning pass outside AQE just to count splits. Small files
    // are never split (only packed), so file count upper-bounds scan
    // parallelism — the conservative direction for a single-file repair
    if (raw.inputFiles.length * 2 >= parallelism) raw
    else {
      val dirKey = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val dst = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-split",
        spark.sparkContext.applicationId, s"$name-$dirKey").toString
      // parallelism/4 files: enough scan slots to unserialize the decode
      // stage (the win is 1 task → 8, not 8 → 32) while keeping the
      // per-query footer/listing overhead of the mirror small — 87 bench
      // queries re-open these files constantly
      val nFiles = math.max(2, parallelism / 4)
      SessionMemo.once(spark, s"split:$dir:$name") {
        // the path is applicationId-unique, so a completed mirror on disk
        // is valid for this session even after drainAll() cleared the
        // SessionMemo — skip the redundant shuffle+rewrite (e.g. every
        // BenchOne DRAIN_ALL=1 rep re-entered here)
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dst, "_SUCCESS"))) {
          raw.repartition(nFiles).write
            .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dst)
        }
        registerMirrorCleanup(spark)
      }
      spark.read.parquet(dst)
    }
  }

  private val cleanupRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Delete this application's split-mirror directory on JVM exit — the
    * mirrors are session-scoped repair state, not data; without this, one
    * directory set per applicationId accumulates in tmp across runs.
    */
  private def registerMirrorCleanup(spark: SparkSession): Unit =
    if (cleanupRegistered.compareAndSet(false, true)) {
      val root = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-split",
        spark.sparkContext.applicationId)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          import scala.jdk.CollectionConverters._
          if (java.nio.file.Files.exists(root)) {
            java.nio.file.Files.walk(root).iterator().asScala.toSeq
              .sortBy(-_.getNameCount)
              .foreach(p => java.nio.file.Files.deleteIfExists(p))
          }
        } catch { case _: java.io.IOException => () }))
    }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    splitMirror(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame =
    splitMirror(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` has shipped under THREE physical parquet encodings across
    * testdata regenerations — TIMESTAMP(NANOS) (rejected by Spark's µs
    * TimestampType unless read as long under the legacy conf),
    * TIMESTAMP(MICROS) not adjusted to UTC (reads as TimestampNTZ), and a
    * plain UTC TIMESTAMP — so the loader probes the stored type from the
    * footer and adapts instead of hardcoding any one encoding. All paths
    * normalize to the session-TZ TimestampType (session TZ is UTC, so the
    * NTZ cast and the nanos div-1000 are value-identical). The conversion
    * runs BEFORE the split mirror, so the mirror stores a proper µs
    * timestamp column.
    */
  private val eventsTsType = scala.collection.concurrent.TrieMap
    .empty[String, Option[org.apache.spark.sql.types.DataType]]
  // A testdata regeneration under a long-lived JVM must re-probe the stored
  // encoding, or the adaptive loader defeats its own purpose.
  CacheBin.onDrainAll(() => { eventsTsType.clear(); countCache.clear() })

  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}
    val nanosShim: DataFrame => DataFrame =
      _.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // Footer-only schema probe, memoized per path — the stored type can't
    // change mid-run, and 24 queries re-enter this loader. A nanos file
    // throws here when the legacy conf is off — that exception IS the
    // signal to turn the conf on.
    val probed: Option[DataType] = eventsTsType.getOrElseUpdate(s"$dir/events",
      try Some(load(spark, dir, "events").schema("ts").dataType)
      catch { case scala.util.control.NonFatal(_) => None })
    probed match {
      case Some(TimestampType) => splitMirror(spark, dir, "events")
      case Some(TimestampNTZType) => splitMirror(spark, dir, "events",
        _.withColumn("ts", col("ts").cast(TimestampType)))
      case Some(LongType) =>
        // The probe result is memoized per PATH but the LongType outcome is
        // SESSION-dependent (it means nanosAsLong was on when probed). A
        // second session in the same JVM hits the memo without the conf, so
        // re-assert it here — idempotent for the session that set it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        splitMirror(spark, dir, "events", nanosShim)
      case None => // probe threw = nanos rejected: enable legacy read, then shim
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        splitMirror(spark, dir, "events", nanosShim)
      case Some(other) =>
        // A future regeneration shipping ts as STRING/DATE/INT96 must fail
        // loudly at the loader, not be silently treated as nanos and
        // mis-converted by the div-1000 shim downstream.
        throw new IllegalStateException(
          s"events.ts stored as unsupported parquet type $other at $dir — " +
          "extend Tables.events for this encoding")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    splitMirror(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    splitMirror(spark, dir, "embeddings")

  private val countCache = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Memoized table row count — one zero-column parquet count per (dir,
    * table) per session instead of one full pass per query that needs a
    * size (IVF centroid sizing runs off this). On a real deployment this
    * is the catalog's row-count statistic; the memoized count is the
    * stand-in for path-addressed tables without a catalog entry.
    */
  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    countCache.getOrElseUpdate(s"$dir/$name", load(spark, dir, name).count())

  /** Content stamp of a source table's parquet file (size + mtime): keyed
    * into on-disk index/demo-table paths so an `exists(dir)` rebuild
    * guard can't serve state built from a PREVIOUS testdata generation —
    * the path itself changes when the source file does.
    */
  def tableStamp(dir: String, name: String): String = {
    val p = java.nio.file.Paths.get(dir, s"$name.parquet")
    val info =
      if (java.nio.file.Files.exists(p))
        s"$p:${java.nio.file.Files.size(p)}:" +
          java.nio.file.Files.getLastModifiedTime(p).toMillis
      else s"$p:absent"
    java.security.MessageDigest.getInstance("MD5")
      .digest(info.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }
}
