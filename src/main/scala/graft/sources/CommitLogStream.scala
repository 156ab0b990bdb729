package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.types.StructType

import graft.tables.CommitLogTable
import graft.tables.CommitLogTable.LogFile

/** Shared planning core of the streaming DATA reads of a commit-log
  * table (the V1 [[CommitLogStreamSource]] behind
  * `readStream.format("commitlog")` and the V2
  * [[CommitLogMicroBatchStream]] behind `readStream.table(...)`):
  * offset arithmetic over the immutable commit log.
  *
  * Offsets ([[CommitLogStreamSource.Pos]]) address `(version,
  * fileIndex[, snapshot])`: `snap=true` → the first `i` files of the
  * initial snapshot resolved AT version `v`; `snap=false` → versions
  * < `v` fully consumed plus the first `i` files of `v`'s adds. Both
  * phases enumerate manifest-stored file order — immutable once
  * committed — so any (from, to] range replays to the identical file
  * list: the exactly-once guarantee.
  *
  * Scale: planning is driver-side arithmetic on per-commit diffs —
  * O(files ADDED) per micro-batch, never O(table files) — and version
  * adds resolve from the raw diff manifest (one small file read,
  * memoized).
  */
private[sources] final class StreamWalk(table: CommitLogTable, path: String,
    startingVersion: Option[Long], skipChangeCommits: Boolean) {
  import CommitLogStreamSource.Pos

  // versionAdds memo — versions are immutable, so entries never
  // invalidate; one raw-manifest read per version per stream incarnation
  private val addsCache =
    new java.util.concurrent.ConcurrentHashMap[Long, (String, Seq[LogFile])]()
  private def addsAt(v: Long): (String, Seq[LogFile]) =
    addsCache.computeIfAbsent(v, _ => table.versionAdds(v))

  // snapshot file list for the pinned snapshot version — at most one
  // version is ever used per stream (the one in the offsets)
  @volatile private var snapMemo: Option[(Long, Seq[LogFile])] = None
  private[sources] def snapshotFiles(v: Long): Seq[LogFile] = snapMemo match {
    case Some((sv, fs)) if sv == v => fs
    case _ =>
      val m = table.resolvedManifest(Some(v))
      table.requireFilesPresent(m,
        s"commitlog streaming source initial snapshot @v$v")
      snapMemo = Some((v, m.files))
      m.files
  }

  /** Additive / data-neutral / data-change classification. Unknown
    * future actions land in data-change — fail loudly, never silently
    * mis-stream.
    */
  private def isAdditive(v: Long, action: String): Boolean =
    v == 0L || action == "append" || action == "create"

  /** Enumerate files strictly AFTER `from`, in offset order, stopping at
    * whichever comes first: the file/byte caps, `stopAt` (inclusive), or
    * version `head`. Returns (position reached, files). Deterministic
    * for fixed offsets — the replay guarantee.
    */
  def walk(from: Option[Pos], capFiles: Long, capBytes: Long,
      stopAt: Option[Pos], head: Long): (Option[Pos], Seq[LogFile]) = {
    val out = Vector.newBuilder[LogFile]
    var nFiles = 0L
    var nBytes = 0L
    var last: Option[Pos] = from
    def done: Boolean = stopAt.isDefined && last == stopAt

    // emits fs[startIdx..); false = stop the walk (cap hit or stopAt)
    def take(fs: Seq[LogFile], v: Long, startIdx: Long, snap: Boolean): Boolean = {
      var idx = startIdx
      fs.drop(startIdx.toInt).foreach { f =>
        if (nFiles >= capFiles || nBytes >= capBytes || done) return false
        out += f; nFiles += 1; nBytes += f.bytes; idx += 1
        last = Some(Pos(v, idx, snap))
      }
      !done
    }

    // phase 1: the initial snapshot (absent under startingVersion)
    var v: Long = from match {
      case Some(p) if p.snap =>
        val fs = snapshotFiles(p.v)
        if (!take(fs, p.v, p.i, snap = true)) return (last, out.result())
        p.v + 1
      case Some(p) => p.v // may be mid-version; resume index below
      case None => startingVersion match {
        case Some(sv) => sv
        case None =>
          // replaying a checkpointed first batch must re-pin the SAME
          // snapshot version the original run chose — it's in `stopAt`
          val h = stopAt.filter(_.snap).map(_.v).getOrElse(head)
          last = Some(Pos(h, 0, snap = true))
          if (done) return (last, out.result())
          if (!take(snapshotFiles(h), h, 0, snap = true))
            return (last, out.result())
          h + 1
      }
    }
    var resumeIdx: Long = from match {
      case Some(p) if !p.snap && p.v == v => p.i
      case _ => 0L
    }

    // phase 2: incremental commits
    while (v <= head) {
      val (action, adds) = addsAt(v)
      if (isAdditive(v, action)) {
        if (!take(adds, v, resumeIdx, snap = false))
          return (last, out.result())
        last = Some(Pos(v, adds.size.toLong max resumeIdx, snap = false))
      } else if (CommitLogStreamSource.NeutralActions.contains(action)
          || skipChangeCommits) {
        // consumed-without-emitting: position jumps past the whole version
        last = Some(Pos(v, adds.size.toLong max resumeIdx, snap = false))
      } else {
        throw new IllegalStateException(
          s"commitlog streaming source at $path: version $v is a " +
            s"'$action' commit, which updates or removes rows already " +
            "streamed. Set .option(\"skipChangeCommits\", true) to skip " +
            "such commits, or stream the change feed instead " +
            "(.option(\"readChangeFeed\", true)).")
      }
      if (done) return (last, out.result())
      resumeIdx = 0L
      v += 1
    }
    (last, out.result())
  }
}

private[sources] object StreamWalk {
  /** Translate the engine's read limit to (fileCap, byteCap); the
    * configured caps are the fallback for row-based limits a
    * file-granular source can't honor exactly.
    */
  def caps(limit: ReadLimit, maxFiles: Int, maxBytes: Option[Long]): (Long, Long) =
    limit match {
      case _: ReadAllAvailable => (Long.MaxValue, Long.MaxValue)
      case f: ReadMaxFiles => (f.maxFiles().toLong, Long.MaxValue)
      case b: ReadMaxBytes => (Long.MaxValue, b.maxBytes())
      case c: CompositeReadLimit => c.getReadLimits
        .map(caps(_, maxFiles, maxBytes))
        .reduce((a, b) => (a._1 min b._1, a._2 min b._2))
      case _ => (maxFiles.toLong, maxBytes.getOrElse(Long.MaxValue))
    }

  def defaultLimit(maxFiles: Int, maxBytes: Option[Long]): ReadLimit =
    maxBytes match {
      case Some(b) => ReadLimit.compositeLimit(
        Array(ReadLimit.maxFiles(maxFiles), ReadLimit.maxBytes(b)))
      case None => ReadLimit.maxFiles(maxFiles)
    }
}

/** Streaming DATA read of a commit-log table — Delta's default
  * streaming-source semantics (what the reference's silver layer
  * consumes via `spark.readStream.table("bronze_prices")`,
  * `silver_prices_transform.ipynb`): the first batches replay the
  * table's CURRENT snapshot, then each appended commit streams
  * incrementally as its added files.
  *
  * {{{
  *   spark.readStream.format("commitlog").option("path", dir)
  *     [.option("maxFilesPerTrigger", 100)]       // admission control
  *     [.option("maxBytesPerTrigger", 128000000)]
  *     [.option("startingVersion", 7)]   // incremental-only, no snapshot
  *     [.option("skipChangeCommits", true)]
  *     .load()
  * }}}
  *
  * Semantics (each the Delta contract):
  *
  *  - '''Initial snapshot.''' A fresh stream pins the head version H in
  *    its first offset and replays the resolved snapshot AT H (lazy
  *    delete marks applied) before streaming commits > H. Restart
  *    re-derives the same file list from the checkpointed offset's
  *    version — deterministic replay as long as log retention out-lives
  *    the stream's lag (`vacuumLog` / `vacuum` deeper than the slowest
  *    consumer, the same retention contract Delta documents).
  *  - '''startingVersion''' skips the snapshot: only commits ≥ the given
  *    version stream (a consumer bootstrapped from a snapshot at V
  *    starts with V+1).
  *  - '''Data-change commits fail the stream''' (merge / update / delete
  *    / delete_lazy / overwrite / restore — anything that changes or
  *    removes already-streamed rows): an append-only consumer reading
  *    past one would silently diverge from the table. `skipChangeCommits
  *    =true` opts into skipping those commits whole. Compactions and
  *    metadata commits (compact / evolve / rename / drop / constraint /
  *    properties) are data-neutral rewrites of rows already streamed and
  *    always skip — Delta's `dataChange=false` rule.
  *  - '''Admission control.''' `maxFilesPerTrigger` (default 1000, like
  *    Delta) and `maxBytesPerTrigger` bound each micro-batch through
  *    [[SupportsAdmissionControl]], always admitting at least one file;
  *    a version's adds split across batches. Under
  *    `Trigger.AvailableNow` the head is pinned at start and the stream
  *    drains to it batch-by-batch at the configured rate.
  *
  * The declared schema is pinned at stream start (files store immutable
  * physical names, so adds from before a mid-stream rename still read
  * correctly; restart after an evolution picks up widened columns — the
  * standard source schema-change contract).
  */
final class CommitLogStreamSource(spark: SparkSession, path: String,
    options: Map[String, String]) extends Source
    with SupportsTriggerAvailableNow {

  import CommitLogStreamSource._

  private val table = CommitLogTable.open(spark, path)
  // pinned at construction: every batch this incarnation emits uses ONE
  // logical schema + physical mapping (see class doc)
  private val pinned = table.resolvedManifest(None)

  private val maxFiles: Int =
    options.get("maxFilesPerTrigger").map(_.toInt).getOrElse(1000)
  private val maxBytes: Option[Long] =
    options.get("maxBytesPerTrigger").map(_.toLong)
  require(maxFiles > 0, "maxFilesPerTrigger must be positive")
  require(maxBytes.forall(_ > 0), "maxBytesPerTrigger must be positive")

  private val walker = new StreamWalk(table, path,
    options.get("startingVersion").map(_.toLong),
    options.get("skipChangeCommits").exists(_.toBoolean))

  override def schema: StructType = pinned.schema

  /** AvailableNow pins the drain target at start; commits racing in
    * after it wait for the next invocation.
    */
  @volatile private var availableNowHead: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowHead = Some(table.latestVersion)

  override def getDefaultReadLimit: ReadLimit =
    StreamWalk.defaultLimit(maxFiles, maxBytes)

  /** The engine's admission-control entry point (it never calls
    * [[getOffset]] on a SupportsAdmissionControl source): walk forward
    * from the engine-supplied start position under the limit's caps.
    */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val from = Option(startOffset).map(Pos.of)
    val (capF, capB) = StreamWalk.caps(limit, maxFiles, maxBytes)
    val head = availableNowHead.getOrElse(table.latestVersion)
    val (next, _) = walker.walk(from, capF, capB, stopAt = None, head)
    next.orNull
  }

  override def getOffset: Option[V1Offset] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the entry point for this source")

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(Pos.of)
    val to = Pos.of(end)
    val (_, files) = walker.walk(from, Long.MaxValue, Long.MaxValue,
      stopAt = Some(to), head = to.v)
    org.apache.spark.sql.graftbridge.asStreamingFrame(
      table.readFilesAs(files, pinned.schema, pinned.columnMapping))
  }

  override def stop(): Unit = ()
  override def toString: String = s"CommitLogDataSource[$path]"
}

object CommitLogStreamSource {
  /** Data-neutral commit actions: rewrites/metadata over rows already
    * streamed (Delta's `dataChange=false` rule).
    */
  private[sources] val NeutralActions = Set(
    "compact", "evolve", "rename", "drop", "constraint", "properties")

  /** Stream position: `snap=true` → `i` files of the initial snapshot
    * AT version `v` consumed; `snap=false` → versions < `v` consumed
    * plus the first `i` files of `v`'s adds.
    */
  private[sources] final case class Pos(v: Long, i: Long, snap: Boolean)
      extends V1Offset {
    override def json: String = s"""{"v":$v,"i":$i,"snap":$snap}"""
  }

  private[sources] object Pos {
    def of(o: OffsetV2): Pos = o match {
      case p: Pos => p
      case other => fromJson(other.json)
    }
    def fromJson(j: String): Pos = {
      val n = CommitLogCatalog.viewMapper.readTree(j)
      Pos(n.get("v").asLong, n.get("i").asLong, n.get("snap").asBoolean)
    }
  }
}

/** V2 micro-batch stream behind `spark.readStream.table("cat.ns.t")` on
  * a [[CommitLogCatalog]] table — the exact read the reference's silver
  * notebook opens on its bronze Delta table. Same offset arithmetic,
  * admission control, and data-change contract as
  * [[CommitLogStreamSource]] (options flow through
  * `readStream.option(...)` into the scan), with two V2 upgrades:
  *
  *  - the initial snapshot pins the version the SCAN resolved (so
  *    merge-on-read delete marks in the read path always agree with the
  *    planned snapshot), persisted in the offset log via
  *    `initialOffset` — restarts replay the identical snapshot;
  *  - pushed-down filters keep working: each micro-batch's file list is
  *    stats-pruned by the scan's pushed predicates before planning
  *    (every filter stays residual, so pruning is purely an
  *    optimization — same soundness rule as the batch scan).
  */
final class CommitLogMicroBatchStream(spark: SparkSession,
    table: CommitLogTable, path: String, scan: CommitLogScan,
    snapVersion: Long, options: Map[String, String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  import CommitLogStreamSource.Pos

  private val startingVersion: Option[Long] =
    options.get("startingversion").map(_.toLong)
  private val maxFiles: Int =
    options.get("maxfilespertrigger").map(_.toInt).getOrElse(1000)
  private val maxBytes: Option[Long] =
    options.get("maxbytespertrigger").map(_.toLong)
  require(maxFiles > 0, "maxFilesPerTrigger must be positive")
  require(maxBytes.forall(_ > 0), "maxBytesPerTrigger must be positive")

  private val walker = new StreamWalk(table, path, startingVersion,
    options.get("skipchangecommits").exists(_.toBoolean))

  /** The snapshot version THIS RUN's offsets actually reference — on a
    * fresh stream the scan's pin, on restart whatever version the
    * checkpointed offsets carry (every restored offset passes through
    * [[deserializeOffset]] before any batch executes). Mark handling
    * must follow the OFFSET's version: a lazy delete committed after
    * the original pin must not leak into the remaining snapshot
    * batches of a restarted drain.
    */
  @volatile private var snapUsed: Long = snapVersion
  private def observe(p: Pos): Pos = { if (p.snap) snapUsed = p.v; p }

  override def initialOffset(): OffsetV2 = startingVersion match {
    case Some(sv) => Pos(sv, 0, snap = false)
    case None => observe(Pos(snapVersion, 0, snap = true))
  }

  @volatile private var availableNowHead: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowHead = Some(table.latestVersion)

  override def getDefaultReadLimit: ReadLimit =
    StreamWalk.defaultLimit(maxFiles, maxBytes)

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val from = Option(startOffset).map(Pos.of)
    val (capF, capB) = StreamWalk.caps(limit, maxFiles, maxBytes)
    val head = availableNowHead.getOrElse(table.latestVersion)
    val (next, _) = walker.walk(from, capF, capB, stopAt = None, head)
    next.getOrElse(initialOffset())
  }

  override def latestOffset(): OffsetV2 =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the entry point for this stream")

  override def planInputPartitions(start: OffsetV2, end: OffsetV2)
      : Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val to = Pos.of(end)
    val (_, files) = walker.walk(Some(observe(Pos.of(start))), Long.MaxValue,
      Long.MaxValue, stopAt = Some(to), head = to.v)
    // the scan's pushed predicates stats-prune the batch's files — a
    // filtered stream never plans a provably-unmatched file
    scan.planStreamPartitions(files)
  }

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    // mark handling built over the files of the snapshot version the
    // OFFSETS reference (the only files that can carry merge-on-read
    // marks on this stream's path — incremental adds come from append
    // commits). A startingVersion stream never emits the snapshot, so
    // it never pays the O(table files) resolve + presence check
    scan.streamReaderFactory(
      if (startingVersion.isDefined) Seq.empty
      else walker.snapshotFiles(snapUsed))

  override def deserializeOffset(json: String): OffsetV2 =
    observe(Pos.fromJson(json))
  override def commit(end: OffsetV2): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"CommitLogMicroBatchStream[$path@v$snapVersion]"
}

/** V2 micro-batch CDF stream (`readStream.format("commitlog")
  * .option("readChangeFeed", true)`) — the change-feed twin of
  * [[CommitLogMicroBatchStream]], so BOTH streaming reads ride the same
  * V2 machinery: offsets in the engine's offset log, admission control
  * (`maxFilesPerTrigger`/`maxBytesPerTrigger`, counted over change
  * files), Trigger.AvailableNow. Each micro-batch is the change rows of
  * a contiguous commit-version range, `_change_type` tagged and
  * `_commit_version` filled per file (stored by post-tag writers,
  * synthesized from the version for legacy files).
  *
  * Offsets are LAST-CONSUMED COMMIT VERSIONS and serialize as the bare
  * number — byte-identical to the V1 source's `LongOffset` json, so a
  * checkpoint written by the old V1 route restarts on this stream
  * unchanged. Admission is version-atomic (a version's change rows
  * never split across batches — CDF consumers see transactions whole),
  * with ≥1 version per batch so an oversized commit still progresses.
  *
  * Scale: planning is O(new versions' change files) per trigger — one
  * manifest lookup + one directory listing per version, memoized
  * (versions are immutable); never O(table).
  */
final class CommitLogCdfMicroBatchStream(spark: SparkSession,
    table: CommitLogTable, path: String, options: Map[String, String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  /** Default start (no option) clamps to the oldest SURVIVING version —
    * the from-the-beginning read over a log-vacuumed table serves the
    * survivors (the documented retention contract). An EXPLICIT
    * startingVersion below the floor, a startingTimestamp reaching into
    * vacuumed history, or a checkpointed offset resuming into it, hits
    * the loud refusal instead — silent gaps in an incremental feed are
    * data loss. `startingTimestamp` resolves by Delta's at-or-after
    * rule; ending bounds are a batch concept and refuse on a stream.
    */
  private val starting: Long = {
    val v = options.get("startingversion")
    val ts = options.get("startingtimestamp")
    require(v.isEmpty || ts.isEmpty,
      "CDF stream: give startingVersion OR startingTimestamp, not both")
    require(!options.contains("endingversion") &&
        !options.contains("endingtimestamp"),
      "CDF stream: ending bounds apply to batch reads only")
    v.map(_.toLong)
      .orElse(ts.map(s => table.cdfStartingVersionAt(
        graft.tables.CommitLogTable.parseTsMillis(s, spark))))
      .getOrElse(math.max(1L, table.earliestVersion))
  }
  private val maxFiles: Int =
    options.get("maxfilespertrigger").map(_.toInt).getOrElse(1000)
  private val maxBytes: Option[Long] =
    options.get("maxbytespertrigger").map(_.toLong)
  require(maxFiles > 0, "maxFilesPerTrigger must be positive")
  require(maxBytes.forall(_ > 0), "maxBytesPerTrigger must be positive")

  // declared ONCE at stream construction (same contract as the V1
  // source and Delta: restart after a schema evolution to widen)
  private val logicalSchema = table.cdfSchema
  private val physSchema = table.cdfPhysicalSchema

  // change files per version, memoized — versions are immutable
  private val filesCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Seq[(String, Long)]]()
  private def filesAt(v: Long): Seq[(String, Long)] =
    filesCache.computeIfAbsent(v, table.changeFilesAt)

  private final case class CdfOff(v: Long) extends OffsetV2 {
    override def json: String = v.toString
  }
  private def ver(o: OffsetV2): Long = o match {
    case CdfOff(v) => v
    case other => other.json.trim.toLong
  }

  override def initialOffset(): OffsetV2 = CdfOff(starting - 1)

  @volatile private var availableNowHead: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowHead = Some(table.latestVersion)

  override def getDefaultReadLimit: ReadLimit =
    StreamWalk.defaultLimit(maxFiles, maxBytes)

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val (capF, capB) = StreamWalk.caps(limit, maxFiles, maxBytes)
    val head = availableNowHead.getOrElse(table.latestVersion)
    var v = ver(startOffset)
    var nF = 0L
    var nB = 0L
    var advanced = false
    while (v < head) {
      val fs = filesAt(v + 1)
      val (f2, b2) = (nF + fs.size, nB + fs.map(_._2).sum)
      // version-atomic admission: stop BEFORE the version that busts a
      // cap — unless it would be the batch's first (progress guarantee)
      if (advanced && fs.nonEmpty && (f2 > capF || b2 > capB))
        return CdfOff(v)
      v += 1; nF = f2; nB = b2
      if (fs.nonEmpty) advanced = true
    }
    CdfOff(v)
  }

  override def latestOffset(): OffsetV2 =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the entry point for this stream")

  override def planInputPartitions(start: OffsetV2, end: OffsetV2)
      : Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val files = ((ver(start) + 1) to ver(end)).flatMap(filesAt)
    CommitLogParquet.filePartitions(spark, files)
  }

  // the read schema never changes within an incarnation: build (and
  // broadcast) the stock factory once, not once per micro-batch
  private lazy val innerFactory =
    CommitLogParquet.factory(spark, physSchema, physSchema, Seq.empty)

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    CdfAssemblingFactory(innerFactory, logicalSchema,
      logicalSchema.fieldIndex("_commit_version"), versionByPath)

  /** version of every memoized change file, keyed by the SparkPath
    * (URI-encoded) form the executor's PartitionedFile carries.
    */
  private def versionByPath: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    filesCache.entrySet().asScala.flatMap { e =>
      e.getValue.map { case (abs, _) =>
        CommitLogParquet.sparkPathKey(abs) -> e.getKey.longValue()
      }
    }.toMap
  }

  override def deserializeOffset(json: String): OffsetV2 =
    CdfOff(json.trim.toLong)
  override def commit(end: OffsetV2): Unit = {
    // bound the memo (and the per-batch versionByPath map it feeds) to
    // the in-flight window: committed versions never replan, so a
    // long-running stream over a high-commit-rate table stays O(window),
    // not O(every version ever streamed)
    val v = ver(end)
    filesCache.keySet().removeIf(_ <= v)
  }
  override def stop(): Unit = ()
  override def toString: String = s"CommitLogCdfMicroBatchStream[$path]"
}

/** Row-assembly wrapper for the CDF stream's parquet reads: rows come
  * back positionally as the physical change schema (aligned with the
  * logical one); the single transformation is `_commit_version :=
  * coalesce(stored, <file's version>)` — one codegen'd projection per
  * file, constant-folded on the version literal.
  */
private[sources] final case class CdfAssemblingFactory(
    inner: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory,
    logicalSchema: StructType,
    cvOrdinal: Int,
    versionByPath: Map[String, Long])
    extends org.apache.spark.sql.execution.datasources.v2.FilePartitionReaderFactory {

  override def options: org.apache.spark.sql.catalyst.FileSourceOptions =
    inner.options
  override def supportColumnarReads(
      p: org.apache.spark.sql.connector.read.InputPartition): Boolean = false

  override def buildReader(
      file: org.apache.spark.sql.execution.datasources.PartitionedFile)
      : org.apache.spark.sql.connector.read.PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Coalesce, Literal, UnsafeProjection}
    val raw = inner.buildReader(file)
    val v = versionByPath.getOrElse(file.filePath.toString,
      throw new IllegalStateException(
        s"CDF read: change file ${file.filePath} not in the planned map"))
    new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
      private val proj = UnsafeProjection.create(
        logicalSchema.fields.zipWithIndex.map { case (f, i) =>
          if (i == cvOrdinal)
            Coalesce(Seq(BoundReference(i, f.dataType, f.nullable),
              Literal(v, f.dataType)))
          else BoundReference(i, f.dataType, f.nullable)
        }.toSeq)
      override def next(): Boolean = raw.next()
      override def get(): InternalRow = proj(raw.get())
      override def close(): Unit = raw.close()
    }
  }
}
