package graft.tables

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}
import java.util.UUID

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A transactional plain-parquet table format: versioned, atomically
  * committed manifests over immutable data files — the engine's answer to
  * the reference's Delta-lake plane (MERGE / OPTIMIZE / VACUUM / Change
  * Data Feed / time travel — `docs/databricks_setup.md:96,170-198`,
  * `bronze_prices_auto_loader.ipynb:158`, `README.md:174`) in an
  * environment with no lakehouse jars.
  *
  * Layout under the table root:
  * {{{
  *   _graft_log/v<20-digit>.json     one manifest per committed version
  *   _graft_log/changes/c-<uuid>/    persisted change rows (CDF) per commit
  *   data/c-<uuid>/[p=v/]part-*.parquet   immutable data files per commit
  * }}}
  *
  * Each manifest carries the FULL active file list (path, partition value,
  * footer row count, bytes) plus commit statistics — so resolving any
  * version is one small JSON read, with no log replay. At 100 TB the list
  * is tens of thousands of entries of ~100 bytes: still a single-digit-MB
  * driver-side read, the same order as a Delta checkpoint, and file-level
  * partition pruning happens on this metadata rather than on directory
  * listings.
  *
  * ATOMICITY & ISOLATION. A commit writes its data files first (invisible
  * to readers — nothing references them), then publishes a fully-written
  * manifest via hard-link: `Files.createLink(v<N>.json, tmp)` atomically
  * fails with [[FileAlreadyExistsException]] if another writer claimed
  * version N, giving optimistic concurrency on any POSIX filesystem —
  * losers recompute against the new snapshot and retry onto N+1. Readers
  * resolve a manifest once and read ONLY its file list, so a concurrent
  * compact/merge/vacuum never changes what an already-resolved reader
  * sees: old files are immutable and survive until [[vacuum]] drops
  * versions past the retention window. This closes the reader-visibility
  * window the stage-then-swap emulation
  * ([[graft.streaming.FileStreamIngest.upsertIntoPartitionedParquet]])
  * documents but cannot close.
  *
  * Change Data Feed: merge/append/delete commits persist their change rows
  * (`_change_type` ∈ insert / update_preimage / update_postimage / delete)
  * as parquet under `_graft_log/changes/`, referenced from the manifest —
  * a durable, replayable change table ([[readChanges]]), not an in-flight
  * `foreachBatch` callback, and a checkpointed STREAMING source
  * ([[readChangesStream]] — the reference's `readChangeFeed` read).
  *
  * Scale notes: merge rewrites ONLY the files of partitions present in the
  * update batch (manifest-level pruning — the copy-on-write granularity
  * Delta uses); the change set falls out of the same full-outer join that
  * produces the new snapshot (one shuffle, no second pass); all row counts
  * come from parquet footers, never a data scan.
  */
final class CommitLogTable private (val spark: SparkSession, val dir: String) {
  import CommitLogTable._

  private val logDir = Paths.get(dir, LogDirName)

  // ---------------------------------------------------------------- reads

  /** Latest committed version (0 = created empty). */
  def latestVersion: Long = listVersions.last

  /** Snapshot read; `version` pins a historical snapshot (time travel).
    * The file list is resolved NOW — the returned frame is isolated from
    * any later commit.
    */
  def read(version: Option[Long] = None): DataFrame = {
    val m = manifest(version.getOrElse(latestVersion))
    readFiles(m.files, m.schema, m.partitionCol)
  }

  /** Partition-pruned snapshot read: only files whose manifest partition
    * value (string form) is in `values` are read — pruning happens on the
    * manifest metadata, never on directory listings or footer reads. This
    * is the probed-index read path: an IVF / postings table stores one
    * partition per inverted list, and a query resolves its probe set to a
    * file list in one driver-side manifest pass (the same metadata-level
    * pruning a Delta reader does with its checkpoint's per-file stats).
    * Same snapshot-isolation contract as [[read]].
    */
  def readPartitions(values: Set[String],
      version: Option[Long] = None): DataFrame = {
    val m = manifest(version.getOrElse(latestVersion))
    require(m.partitionCol.isDefined,
      s"readPartitions on unpartitioned table $dir")
    readFiles(m.files.filter(_.partition.exists(values.contains)),
      m.schema, m.partitionCol)
  }

  /** File count of the current (or pinned) snapshot — manifest-only. */
  def fileCount(version: Option[Long] = None): Int =
    manifest(version.getOrElse(latestVersion)).files.size

  /** One row per committed version, oldest first: the table's history
    * (action + row/file statistics), from manifests only — no data read.
    */
  def history: DataFrame = {
    val rows = listVersions.map(manifest).map { m =>
      Row(m.version, m.action, m.rowsInserted, m.rowsUpdated, m.rowsDeleted,
        m.rowsTotal, m.files.size, m.tsMillis)
    }
    spark.createDataFrame(rows.asJava, HistorySchema).orderBy("version")
  }

  /** Replayable CDF: all change rows committed in versions
    * [`fromVersion`, `toVersion`], each tagged `_commit_version` (stored in
    * the change files at commit time). Versions without changes
    * (create/compact/restore) contribute nothing.
    */
  def readChanges(fromVersion: Long, toVersion: Long): DataFrame = {
    val ms = listVersions.filter(v => v >= fromVersion && v <= toVersion)
      .map(manifest).filter(_.changesDir.isDefined)
    ms.foreach(m => promoteChanges(m.changesDir.get)) // crash repair
    val sch = changeSchema(manifest(latestVersion).schema)
    val frames = ms.map { m =>
      spark.read.schema(sch).parquet(s"$dir/${m.changesDir.get}")
    }
    if (frames.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), sch)
    else frames.reduce(_.unionByName(_))
  }

  /** STREAMING CDF — the reference's `readChangeFeed` streaming read
    * (`bronze_prices_auto_loader.ipynb:158`) over the commit log: a
    * checkpointed parquet file stream globbing the per-commit change
    * directories. Exactly-once falls out of the file-source WAL; ordering
    * within a micro-batch comes from the stored `_commit_version`. Safe
    * against optimistic-concurrency losers because a losing writer deletes
    * its own change files before retrying ([[retryCommit]]) — phantom
    * changes from lost commits never enter the feed: change files stage
    * OUTSIDE the globbed dir and move in atomically only after their
    * manifest wins the publish race. At 100 TB the change volume is
    * commit-proportional (the listing cost is one directory glob per
    * trigger), never corpus-proportional.
    */
  def readChangesStream: DataFrame = {
    // repair any commit that crashed between publish and promotion, so
    // the stream doesn't silently skip its (durable, committed) changes
    listVersions.map(manifest).flatMap(_.changesDir).foreach(promoteChanges)
    spark.readStream.schema(changeSchema(snapshot().schema))
      .parquet(s"$dir/$ChangesDirName/*")
  }

  private def changeSchema(base: StructType): StructType =
    new StructType(base.fields :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType) :+
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType))

  // --------------------------------------------------------------- writes

  /** Blind append: new files, all rows recorded as CDF inserts.
    * `recordChanges = false` skips the change images — for DERIVED tables
    * (index postings, signature stores) whose source table already owns
    * the change feed, the insert copy would double every append's write
    * volume for rows a consumer can re-derive; data tables keep the
    * default.
    */
  def append(df: DataFrame, recordChanges: Boolean = true): Long =
    retryCommit("append") { snap =>
      requireSchema(df, snap)
      val (newFiles, dataRows) = writeData(df, snap.partitionCol)
      val changesSub = if (recordChanges) Some(writeChanges(
        readFiles(newFiles, snap.schema, snap.partitionCol)
          .withColumn("_change_type", lit("insert")), snap.version + 1)) else None
      mkManifest(snap, "append", snap.files ++ newFiles,
        rowsInserted = dataRows, rowsUpdated = 0, rowsDeleted = 0,
        rowsTotal = snap.rowsTotal + dataRows, changesDir = changesSub)
    }

  /** MERGE upsert, latest-wins per `keys` under `order` (same semantics as
    * [[graft.operators.MergeUpsert.merge]]), committed atomically with
    * file-level partition pruning: only files of partitions present in the
    * update batch are rewritten; every other file carries over by
    * reference. CDF records insert + update pre/post images.
    *
    * Partitioned tables require the partition value of an existing key to
    * be stable across updates (true for day-keyed upserts, where the day
    * is part of the merge key) — a row "moving" partitions would escape
    * the pruned rewrite, exactly as in partition-pruned Delta MERGE.
    */
  def merge(updates: DataFrame, keys: Seq[String], order: Seq[Column]): Long =
    retryCommit("merge") { snap =>
      requireSchema(updates, snap)
      // latest-wins collapses only NON-NULL-keyed rows: a NULL merge key
      // never equi-matches anything (itself included) — each NULL-keyed
      // update row is an independent insert, like Delta MERGE — and
      // keepLast's window would wrongly group the NULLs together
      val anyKeyNull = keys.map(col(_).isNull).reduce(_ || _)
      val latest = graft.operators.Dedup
        .keepLast(updates.filter(!anyKeyNull), keys, order)
        .unionByName(updates.filter(anyKeyNull))
      val (affected, untouched) = snap.partitionCol match {
        case Some(p) =>
          // bounded driver collect: distinct partition values of ONE batch
          // (micro-batches touch a handful of days; a backfill, a few
          // hundred) — never corpus-scale. NULL partition values must map
          // to the Hive default-partition name the manifest stores, or
          // the NULL-partition file would silently escape the rewrite
          val vals = latest.select(
              coalesce(col(p).cast("string"), lit(HiveDefaultPartition)))
            .distinct().collect().map(_.getString(0)).toSet
          snap.files.partition(f => f.partition.exists(vals.contains))
        case None => (snap.files, Seq.empty[LogFile])
      }
      val target = readFiles(affected, snap.schema, snap.partitionCol)
      // explicit presence markers, NOT key-nullness: a NULL merge key never
      // equi-matches (SQL semantics — it inserts, like Delta MERGE), and
      // probing the key column would then misread the row as absent and
      // null out its value columns
      val t = target.withColumn("__t", lit(true)).as("t")
      val u = latest.withColumn("__u", lit(true)).as("u")
      val joinCond = keys.map(k => col(s"t.$k") === col(s"u.$k")).reduce(_ && _)
      // ONE shuffle produces snapshot + change set + counts: persist the
      // joined frame, release after the commit's writes are on disk
      val joined = t.join(u, joinCond, "full_outer").persist()
      try {
        val uP = col("u.__u").isNotNull
        val tP = col("t.__t").isNotNull
        val valueCols = snap.schema.fieldNames.filterNot(keys.contains)
        val picks = keys.map(k => when(uP, col(s"u.$k")).otherwise(col(s"t.$k")).as(k)) ++
          valueCols.map(c => when(uP, col(s"u.$c")).otherwise(col(s"t.$c")).as(c))
        def side(s0: String) =
          snap.schema.fieldNames.map(c => col(s"$s0.$c").as(c)).toSeq
        val changes =
          joined.filter(uP && !tP).select(side("u"): _*)
            .withColumn("_change_type", lit("insert"))
          .unionByName(joined.filter(uP && tP).select(side("t"): _*)
            .withColumn("_change_type", lit("update_preimage")))
          .unionByName(joined.filter(uP && tP).select(side("u"): _*)
            .withColumn("_change_type", lit("update_postimage")))
        val (newFiles, _) = writeData(joined.select(picks: _*), snap.partitionCol)
        val changesSub = writeChanges(changes, snap.version + 1)
        val counts = joined.agg(
          sum(when(uP && !tP, 1L).otherwise(0L)),
          sum(when(uP && tP, 1L).otherwise(0L))).head()
        val (ins, upd) = (zeroIfNull(counts, 0), zeroIfNull(counts, 1))
        mkManifest(snap, "merge", untouched ++ newFiles,
          rowsInserted = ins, rowsUpdated = upd, rowsDeleted = 0,
          rowsTotal = snap.rowsTotal - affected.map(_.rows).sum +
            newFiles.map(_.rows).sum,
          changesDir = Some(changesSub))
      } finally joined.unpersist(false)
    }

  /** Delete rows matching `predicate`; CDF records the deleted rows.
    * SQL DELETE semantics: only rows where the predicate is TRUE go — a
    * NULL predicate keeps the row (naively filtering on `!predicate`
    * would silently drop NULL-evaluating rows from BOTH the table and
    * the change feed). Full-table copy-on-write (no file-stat pruning —
    * acceptable for the maintenance-grade deletes this engine issues).
    */
  def delete(predicate: Column): Long = retryCommit("delete") { snap =>
    val current = readFiles(snap.files, snap.schema, snap.partitionCol).persist()
    val goes = coalesce(predicate, lit(false))
    try {
      val (newFiles, kept) = writeData(current.filter(!goes), snap.partitionCol)
      val changesSub = writeChanges(
        current.filter(goes).withColumn("_change_type", lit("delete")),
        snap.version + 1)
      mkManifest(snap, "delete", newFiles,
        rowsInserted = 0, rowsUpdated = 0,
        rowsDeleted = snap.rowsTotal - kept, rowsTotal = kept,
        changesDir = Some(changesSub))
    } finally current.unpersist(false)
  }

  /** OPTIMIZE: bin-pack each partition's files toward `targetFileBytes`,
    * optionally CLUSTERING rows by `sortCols` during the rewrite — the
    * `OPTIMIZE ... ZORDER BY` emulation inside the transactional format
    * (range-clustered + sorted-within-file is the plain-Spark answer to
    * Z-ordering, SURVEY §4.3): parquet min/max stats on the sort columns
    * then prune row groups at scan, which is what ZORDER buys.
    * Logical content is unchanged (no CDF); readers pinned at earlier
    * versions are untouched — their files survive until [[vacuum]].
    * Partition rewrites are independent, so they run CONCURRENTLY on a
    * driver thread pool (each a small Spark job — the scheduler
    * interleaves their tasks): a thousand-list index compaction is one
    * commit of parallel rewrites, not a thousand sequential jobs.
    * Returns partitionValue → (filesBefore, filesAfter); key "" for an
    * unpartitioned table.
    */
  def compact(targetFileBytes: Long,
      values: Option[Seq[String]] = None,
      sortCols: Seq[Column] = Seq.empty): Map[String, (Int, Int)] = {
    require(targetFileBytes > 0)
    var report = Map.empty[String, (Int, Int)]
    val sortKey = if (sortCols.isEmpty) None
      else Some(sortCols.map(_.toString).mkString(","))
    retryCommit("compact") { snap =>
      // a clustered rewrite is skippable only when the SNAPSHOT is already
      // clustered by these keys (the manifest marker, cleared by any
      // data-changing commit) — without the marker a scheduled clustered
      // compact would re-read and rewrite the whole table on every idle
      // run, which is exactly what the no-op guard below exists to stop
      val alreadyClustered = sortKey.isEmpty || snap.clusteredBy == sortKey
      val groups = snap.files.groupBy(_.partition.getOrElse(""))
        .filter { case (v, _) => values.forall(_.contains(v)) }
      val results = inParallel(groups.toSeq.sortBy(_._1)) { case (v, fs) =>
        val bytes = fs.map(_.bytes).sum
        val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
        // re-pack only when it buys something: at least two undersized
        // files to merge (the Delta OPTIMIZE minFileSize rule). A bare
        // fs.size > nOut test oscillates — each rewrite of sorted data
        // compresses better, shrinking nOut below the fresh file count
        // and triggering another full rewrite on the next idle run
        val undersized = fs.count(_.bytes < targetFileBytes / 2)
        if ((fs.size <= nOut || undersized < 2) && alreadyClustered)
          (v, fs.size, fs.size, Seq.empty[LogFile], Seq.empty[LogFile])
        else {
          val src = readFiles(fs, snap.schema, snap.partitionCol)
          val df =
            if (sortCols.isEmpty) src.coalesce(nOut)
            else if (nOut == 1) src.coalesce(1).sortWithinPartitions(sortCols: _*)
            else src.repartitionByRange(nOut, sortCols: _*)
              .sortWithinPartitions(sortCols: _*)
          val (nf, _) = writeData(df, snap.partitionCol, preClustered = true)
          (v, fs.size, nf.size, fs, nf)
        }
      }
      report = results.map { case (v, nb, na, _, _) => v -> (nb, na) }.toMap
      val replaced = results.flatMap(_._4).map(_.path).toSet
      // nothing needed rewriting → don't publish a version identical to
      // its predecessor: a scheduled maintenance loop would otherwise
      // grow the log and tick the vacuum retention window forward on
      // every idle run
      if (replaced.isEmpty) throw NoOpCommit
      // the marker holds only for a clustered compact over the WHOLE
      // table (a values-scoped pass leaves other partitions unsorted, and
      // a plain bin-pack's coalesce destroys any previous ordering in the
      // files it rewrites)
      val marker = if (values.isEmpty) sortKey else None
      mkManifest(snap, "compact",
        snap.files.filterNot(f => replaced.contains(f.path)) ++
          results.flatMap(_._5),
        rowsInserted = 0, rowsUpdated = 0, rowsDeleted = 0,
        rowsTotal = snap.rowsTotal, changesDir = None, clusteredBy = marker)
    }
    report
  }

  /** Re-publish a historical version's file list as the new head (the
    * write side of time travel). Fails if [[vacuum]] already dropped any
    * of that version's files. The existence check races a CONCURRENT
    * vacuum (old-version-referenced files have no age grace) — schedule
    * restore and vacuum in the same maintenance window, never overlapped,
    * as with Delta's RESTORE + VACUUM retention interplay.
    */
  def restore(version: Long): Long = retryCommit("restore") { snap =>
    val old = manifest(version)
    old.files.foreach(f => require(Files.exists(Paths.get(dir, f.path)),
      s"restore($version): data file ${f.path} was vacuumed"))
    mkManifest(snap, "restore", old.files, rowsInserted = 0, rowsUpdated = 0,
      rowsDeleted = 0, rowsTotal = old.rowsTotal, changesDir = None)
  }

  /** Drop data files referenced ONLY by versions older than the last
    * `retainVersions` — after this, time travel reaches back exactly
    * `retainVersions` versions. Change files and manifests are kept (they
    * are the audit trail; size is commit-proportional, not
    * corpus-proportional). Returns deleted-file count. Also sweeps
    * manifest-unreferenced files and stale staged-change dirs, but only
    * past an age grace window — a concurrent IN-FLIGHT commit's output is
    * also unreferenced until its manifest lands, and the age gate is what
    * keeps vacuum from corrupting it (see [[CommitLogTable.vacuumPath]]).
    */
  def vacuum(retainVersions: Int = 2): Int =
    CommitLogTable.vacuumPath(dir, retainVersions)

  // ------------------------------------------------------------ internals

  private def listVersions: Seq[Long] = CommitLogTable.listVersionsAt(dir)

  private val manifestCache =
    scala.collection.concurrent.TrieMap.empty[Long, Manifest]

  private def manifest(version: Long): Manifest =
    manifestCache.getOrElseUpdate(version, CommitLogTable.manifestAt(dir, version))

  private def snapshot(): Manifest = manifest(latestVersion)

  private def requireSchema(df: DataFrame, snap: Manifest): Unit = {
    // names AND types (nullability excepted — catalogString is
    // nullability-insensitive at every nesting level, and the stored
    // schema round-trips through DDL which drops nested containsNull): a
    // name-only check would let a type-drifted batch commit files the
    // manifest schema can't read — the commit succeeds but every later
    // scan throws
    def sig(s: StructType) = s.fields.map(f => (f.name, f.dataType.catalogString)).toSeq
    require(sig(df.schema) == sig(snap.schema),
      s"schema mismatch: table has ${snap.schema.toDDL}, " +
        s"got ${df.schema.toDDL}")
  }

  private def zeroIfNull(r: Row, i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)

  /** Explicit-file read: the manifest IS the file index, so no partition
    * or schema inference ever runs — each path is a leaf parquet file and
    * the stored schema is authoritative. (Partition values live both in
    * the data columns and in the manifest's per-file metadata; pruning
    * happens on the manifest, not on directory listings.)
    */
  private def readFiles(files: Seq[LogFile], schema: StructType,
      partitionCol: Option[String]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    else
      spark.read.schema(schema).parquet(files.map(f => s"$dir/${f.path}"): _*)
        .select(schema.fieldNames.map(col).toSeq: _*)

  /** Write `df` as this commit's immutable data files; returns (file
    * entries with footer row counts, total rows). Partitioned tables
    * co-locate each partition before the write and lay files out
    * Hive-style via a SHADOW of the partition column (`__part=value/`),
    * so the real column survives IN the data files — explicit-file reads
    * then need no path-based partition reconstruction, which cannot span
    * multiple commit roots.
    */
  private def writeData(df: DataFrame, partitionCol: Option[String],
      preClustered: Boolean = false): (Seq[LogFile], Long) = {
    val sub = s"$DataDirName/c-${UUID.randomUUID().toString.take(12)}"
    val abs = s"$dir/$sub"
    partitionCol match {
      case Some(p) =>
        // preClustered: the caller already co-located (and possibly
        // sorted) the rows — compact's per-partition rewrites — and a
        // repartition here would both redistribute and UNSORT them
        val shadowed = df.withColumn(ShadowPartCol, col(p).cast("string"))
        val arranged =
          if (preClustered) shadowed else shadowed.repartition(col(ShadowPartCol))
        arranged.write.partitionBy(ShadowPartCol).parquet(abs)
      case None => df.write.parquet(abs)
    }
    val files = enumerate(Paths.get(abs), sub)
    (files, files.map(_.rows).sum)
  }

  /** Persist a commit's change rows, tagged with the version the commit
    * is ABOUT to claim — correct because a lost race recomputes `body`
    * against the fresh snapshot (new files, new tag) after deleting this
    * attempt's output.
    *
    * Written to a STAGING dir outside `changes/` and atomically renamed
    * in only after the manifest publish wins ([[tryPublish]]): the
    * streaming CDF reader globs the changes dir directly, so an in-flight or
    * losing commit's change files must never be visible there — under
    * write-then-publish they briefly were. Returns the FINAL sub-path
    * the manifest records.
    */
  private def writeChanges(changes: DataFrame, version: Long): String = {
    val name = s"c-${UUID.randomUUID().toString.take(12)}"
    changes.withColumn("_commit_version", lit(version))
      .write.parquet(s"$dir/$StagedChangesDirName/$name")
    s"$ChangesDirName/$name"
  }

  /** Promote a committed manifest's staged change dir into `changes/`
    * (atomic directory rename). Runs at publish; also invoked lazily by
    * readers as crash repair — a crash between manifest publish and
    * promotion leaves the staged dir complete on disk, so the move is
    * merely deferred. Idempotent and race-safe: a concurrent promote
    * loses the rename and finds the target already present.
    */
  private def promoteChanges(finalSub: String): Unit = {
    val staged = Paths.get(dir, StagedChangesDirName,
      Paths.get(finalSub).getFileName.toString)
    val target = Paths.get(dir, finalSub)
    if (!Files.exists(target) && Files.isDirectory(staged)) {
      Files.createDirectories(target.getParent)
      try Files.move(staged, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: FileAlreadyExistsException |
                   _: java.nio.file.NoSuchFileException => () }
    }
  }

  private def enumerate(root: Path, sub: String): Seq[LogFile] = {
    val paths = {
      val s = Files.walk(root)
      try s.iterator().asScala
        .filter(p => Files.isRegularFile(p) && {
          val n = p.getFileName.toString
          !n.startsWith("_") && !n.startsWith(".")
        }).toVector
      finally s.close()
    }
    // footer reads are independent driver-side I/O — fan them out (a
    // partitioned commit writes one file per partition; reading hundreds
    // of footers serially would dominate small-batch commit latency)
    inParallel(paths) { p =>
      val rel = s"$sub/${root.relativize(p)}"
      val partition = root.relativize(p).iterator().asScala.toSeq.init
        .map(_.toString).find(_.contains("=")).map { seg =>
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(seg.substring(seg.indexOf('=') + 1))
        }
      LogFile(rel, partition, footerRows(p), Files.size(p))
    }
  }

  /** Run `f` over `items` on a bounded thread pool, preserving order.
    * Used for driver-side metadata I/O and for launching independent
    * per-partition Spark jobs concurrently.
    */
  private def inParallel[A, B](items: Seq[A])(f: A => B): Seq[B] =
    if (items.lengthCompare(2) < 0) items.map(f)
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, items.size))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(Future.sequence(items.map(a => Future(f(a)))), Duration.Inf)
      finally pool.shutdown()
    }

  /** Footer-only row count — never a data scan. */
  private def footerRows(p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri),
      spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  private def mkManifest(snap: Manifest, action: String, files: Seq[LogFile],
      rowsInserted: Long, rowsUpdated: Long, rowsDeleted: Long,
      rowsTotal: Long, changesDir: Option[String],
      clusteredBy: Option[String] = None): Manifest =
    Manifest(snap.version + 1, action, System.currentTimeMillis(),
      snap.schema, snap.partitionCol, files, rowsInserted, rowsUpdated,
      rowsDeleted, rowsTotal, changesDir, clusteredBy)

  /** Optimistic-concurrency commit loop: recompute against the fresh
    * snapshot, publish via atomic hard-link. A loser deletes its OWN
    * attempt's output before retrying — its new data dirs (hygiene;
    * vacuum would also sweep them) and its staged change files. "Own"
    * is established by exclusion: a candidate dir is deleted only if NO
    * committed manifest references anything inside it — files this
    * attempt re-referenced from history (restore, compact carry-overs)
    * are never its output and must survive the loss.
    */
  private def retryCommit(action: String)(body: Manifest => Manifest): Long = {
    var attempts = 0
    while (attempts < MaxCommitRetries) {
      val snap = snapshot()
      val m = try body(snap) catch { case NoOpCommit => return snap.version }
      if (tryPublish(m)) return m.version
      val carried = snap.files.map(_.path).toSet
      val committed = listVersions.flatMap(v => manifest(v).files.map(_.path)).toSet
      m.files.filterNot(f => carried.contains(f.path))
        .map(f => Paths.get(f.path).subpath(0, 2).toString).distinct
        .filterNot(sub => committed.exists(_.startsWith(sub + "/")))
        .foreach(sub => deleteRecursively(Paths.get(dir, sub)))
      m.changesDir.foreach { sub =>
        deleteRecursively(Paths.get(dir, StagedChangesDirName,
          Paths.get(sub).getFileName.toString))
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"$action lost $MaxCommitRetries commit races at $dir")
  }

  private def deleteRecursively(root: Path): Unit = if (Files.exists(root)) {
    val s = Files.walk(root)
    try s.iterator().asScala.toVector.sortBy(-_.getNameCount)
      .foreach(Files.deleteIfExists)
    finally s.close()
  }

  private def tryPublish(m: Manifest): Boolean = {
    val tmp = logDir.resolve(s".tmp-${UUID.randomUUID()}")
    // SYNC: the manifest bytes must be durable BEFORE the link makes the
    // version visible — otherwise power loss after the link leaves a
    // torn v<N>.json that bricks every subsequent read
    Files.write(tmp, manifestJson(m).getBytes(UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.SYNC)
    val won =
      try { Files.createLink(logDir.resolve(manifestName(m.version)), tmp); true }
      catch { case _: FileAlreadyExistsException => false }
      finally Files.deleteIfExists(tmp)
    // best-effort directory-entry durability for the link itself
    if (won) {
      try {
        val ch = java.nio.channels.FileChannel.open(logDir,
          java.nio.file.StandardOpenOption.READ)
        try ch.force(true) finally ch.close()
      } catch { case _: Exception => () }
    }
    // the commit is durable once the manifest link exists; promotion into
    // the stream-visible changes/ dir is repaired lazily by readers if a
    // crash lands exactly here
    if (won) m.changesDir.foreach(promoteChanges)
    won
  }
}

object CommitLogTable {
  private val LogDirName = "_graft_log"
  private val DataDirName = "data"
  private val ChangesDirName = s"$LogDirName/changes"
  private val StagedChangesDirName = s"$LogDirName/staged_changes"
  private val ShadowPartCol = "__part"
  private val MaxCommitRetries = 20
  /** What partitionBy writes for a NULL partition value — and therefore
    * what [[enumerate]] reads back into the manifest's partition field.
    */
  private val HiveDefaultPartition =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME

  /** Thrown by a commit body to abandon the attempt without publishing
    * (e.g. a compact that found nothing to rewrite); flow control, not
    * an error.
    */
  private object NoOpCommit extends scala.util.control.ControlThrowable

  final case class LogFile(path: String, partition: Option[String],
      rows: Long, bytes: Long)

  final case class Manifest(version: Long, action: String, tsMillis: Long,
      schema: StructType, partitionCol: Option[String], files: Seq[LogFile],
      rowsInserted: Long, rowsUpdated: Long, rowsDeleted: Long,
      rowsTotal: Long, changesDir: Option[String],
      clusteredBy: Option[String] = None)

  val HistorySchema: StructType = StructType.fromDDL(
    "version BIGINT, action STRING, rows_inserted BIGINT, " +
      "rows_updated BIGINT, rows_deleted BIGINT, rows_total BIGINT, " +
      "num_files INT, ts_millis BIGINT")

  def exists(dir: String): Boolean =
    Files.isDirectory(Paths.get(dir, LogDirName))

  /** Open an existing table. Requires at least one published manifest —
    * a log dir with none is the debris of a create() that died before
    * its v0 publish ([[forPath]] repairs that state by re-creating).
    */
  def open(spark: SparkSession, dir: String): CommitLogTable = {
    require(exists(dir), s"no commit-log table at $dir")
    require(listVersionsAt(dir).nonEmpty,
      s"table creation incomplete at $dir (log dir exists, no manifest)")
    new CommitLogTable(spark, dir)
  }

  /** Create an empty table at `dir` (version 0) — or open it if a
    * concurrent creator won the v0 race or it already exists.
    */
  def create(spark: SparkSession, dir: String, schema: StructType,
      partitionCol: Option[String] = None): CommitLogTable = {
    partitionCol.foreach(p => require(schema.fieldNames.contains(p),
      s"partition column $p not in schema"))
    val logDir = Paths.get(dir, LogDirName)
    Files.createDirectories(logDir.resolve("changes"))
    Files.createDirectories(logDir.resolve("staged_changes"))
    val t = new CommitLogTable(spark, dir)
    val v0 = Manifest(0L, "create", System.currentTimeMillis(), schema,
      partitionCol, Seq.empty, 0, 0, 0, 0, None)
    t.tryPublish(v0) // losing the race means someone else created it: fine
    t
  }

  /** Open-or-create; a log dir without any manifest (create() crashed
    * before v0) is re-created rather than opened broken.
    */
  def forPath(spark: SparkSession, dir: String, schema: StructType,
      partitionCol: Option[String] = None): CommitLogTable =
    if (exists(dir) && listVersionsAt(dir).nonEmpty) open(spark, dir)
    else create(spark, dir, schema, partitionCol)

  private def manifestName(version: Long): String = f"v$version%020d.json"

  private[tables] def listVersionsAt(dir: String): Seq[Long] = {
    val s = Files.list(Paths.get(dir, LogDirName))
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.substring(1, n.length - 5).toLong).toVector.sorted
    finally s.close()
  }

  private[tables] def manifestAt(dir: String, version: Long): Manifest = {
    val p = Paths.get(dir, LogDirName).resolve(manifestName(version))
    require(Files.exists(p), s"version $version does not exist at $dir")
    parseManifest(new String(Files.readAllBytes(p), UTF_8))
  }

  /** Spark-free vacuum (see the instance method's contract): drop data
    * files referenced only by versions older than the last
    * `retainVersions`; sweep commit dirs left holding nothing but
    * markers. Returns deleted-file count.
    *
    * Files referenced by NO manifest at all — a crashed writer's output,
    * or a lost race whose self-cleanup also died — are deleted only once
    * older than `orphanGraceMillis`: a CONCURRENT in-flight commit's
    * freshly-written files are also unreferenced until its manifest
    * lands, and an age gate is what keeps vacuum from corrupting it
    * (the same reason Delta's VACUUM has a retention-hours floor).
    * Stale `staged_changes/` dirs past the grace window are swept the
    * same way.
    */
  def vacuumPath(dir: String, retainVersions: Int = 2,
      orphanGraceMillis: Long = 20L * 60 * 1000): Int = {
    require(retainVersions >= 1)
    val versions = listVersionsAt(dir)
    val retainedRefs = versions.takeRight(retainVersions)
      .flatMap(v => manifestAt(dir, v).files.map(_.path)).toSet
    val committedManifests = versions.map(v => manifestAt(dir, v))
    val anyRefs = committedManifests.flatMap(_.files.map(_.path)).toSet
    val promotedChanges = committedManifests.flatMap(_.changesDir)
      .map(sub => Paths.get(sub).getFileName.toString).toSet
    val now = System.currentTimeMillis()
    def aged(p: Path): Boolean =
      try now - Files.getLastModifiedTime(p).toMillis > orphanGraceMillis
      catch { case _: java.io.IOException => false }
    var deleted = 0
    // crashed tryPublish attempts leak .tmp-<uuid> manifests in the log
    // dir (the finally-delete never ran); sweep them past the grace age
    val logRoot = Paths.get(dir, LogDirName)
    if (Files.isDirectory(logRoot)) {
      val s = Files.list(logRoot)
      val tmps = try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(".tmp-")).toVector
        finally s.close()
      tmps.filter(aged).foreach { p =>
        if (Files.deleteIfExists(p)) deleted += 1
      }
    }
    // stale staging dirs: promoted ones were MOVED out, so anything left
    // past the grace window is a dead writer's orphan (a referenced-but-
    // unpromoted dir is crash state the readers repair — keep it)
    val stagedRoot = Paths.get(dir, StagedChangesDirName)
    if (Files.isDirectory(stagedRoot)) {
      val s = Files.list(stagedRoot)
      val dead = try s.iterator().asScala.toVector finally s.close()
      dead.filter(p => !promotedChanges.contains(p.getFileName.toString) && aged(p))
        .foreach { p =>
          val f = Files.walk(p)
          val all = try f.iterator().asScala.toVector finally f.close()
          all.sortBy(-_.getNameCount).foreach(Files.deleteIfExists)
          deleted += 1
        }
    }
    val dataRoot = Paths.get(dir, DataDirName)
    if (!Files.isDirectory(dataRoot)) return deleted
    def walk[T](f: Iterator[Path] => T): T = {
      val s = Files.walk(dataRoot)
      try f(s.iterator().asScala) finally s.close()
    }
    def isMarker(p: Path): Boolean = {
      val n = p.getFileName.toString
      n.startsWith("_") || n.startsWith(".")
    }
    walk(_.filter(p => Files.isRegularFile(p) && !isMarker(p)).toVector)
      .foreach { p =>
        val rel = Paths.get(dir).relativize(p).toString
        if (!retainedRefs.contains(rel) && (anyRefs.contains(rel) || aged(p))) {
          Files.deleteIfExists(p); deleted += 1
        }
      }
    // bottom-up: drop commit dirs holding nothing but markers (_SUCCESS/.crc)
    walk(_.toVector).sortBy(-_.getNameCount).foreach { p =>
      if (Files.isDirectory(p) && p != dataRoot) {
        val children = { val s = Files.list(p)
          try s.iterator().asScala.toVector finally s.close() }
        if (children.forall(c => Files.isRegularFile(c) && isMarker(c))) {
          children.foreach(Files.deleteIfExists)
          Files.deleteIfExists(p)
        }
      }
    }
    deleted
  }

  // ----------------------------------------------------------- JSON codec
  // Jackson ships with Spark; manifests are small driver-side documents.

  private val mapper = new ObjectMapper()

  private def manifestJson(m: Manifest): String = {
    val root = mapper.createObjectNode()
    root.put("version", m.version)
    root.put("action", m.action)
    root.put("tsMillis", m.tsMillis)
    root.put("schemaDdl", m.schema.toDDL)
    m.partitionCol.foreach(root.put("partitionCol", _))
    root.put("rowsInserted", m.rowsInserted)
    root.put("rowsUpdated", m.rowsUpdated)
    root.put("rowsDeleted", m.rowsDeleted)
    root.put("rowsTotal", m.rowsTotal)
    m.changesDir.foreach(root.put("changesDir", _))
    m.clusteredBy.foreach(root.put("clusteredBy", _))
    val arr = root.putArray("files")
    m.files.foreach { f =>
      val o = arr.addObject()
      o.put("path", f.path)
      f.partition.foreach(o.put("partition", _))
      o.put("rows", f.rows)
      o.put("bytes", f.bytes)
    }
    mapper.writeValueAsString(root)
  }

  private def parseManifest(s: String): Manifest = {
    val n = mapper.readTree(s)
    def optText(field: String): Option[String] =
      if (n.hasNonNull(field)) Some(n.get(field).asText) else None
    val files = n.get("files").elements().asScala.map { f =>
      LogFile(f.get("path").asText,
        if (f.hasNonNull("partition")) Some(f.get("partition").asText) else None,
        f.get("rows").asLong, f.get("bytes").asLong)
    }.toVector
    Manifest(n.get("version").asLong, n.get("action").asText,
      n.get("tsMillis").asLong,
      StructType.fromDDL(n.get("schemaDdl").asText), optText("partitionCol"),
      files, n.get("rowsInserted").asLong, n.get("rowsUpdated").asLong,
      n.get("rowsDeleted").asLong, n.get("rowsTotal").asLong,
      optText("changesDir"), optText("clusteredBy"))
  }
}
