package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.MergeUpsert

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** Incremental file-stream ingestion — the open-source analogue of the
  * reference's Auto Loader notebooks.
  *
  * Bronze (`databricks/bronze_prices_auto_loader.ipynb` cells 1–3;
  * `bronze_fundamentals_auto_loader.ipynb` cells 2–3):
  *   file-source `readStream` (incremental listing, exactly-once via the
  *   checkpoint WAL — the OSS equivalent of `cloudFiles` discovery) →
  *   normalize projection → `Trigger.AvailableNow` append sink (drain all
  *   new files, then stop — the cost-optimized batch-style trigger the
  *   reference runs on a schedule).
  *
  * Silver (`docs/databricks_setup.md:170-198` + the CDF note at
  * `bronze_prices_auto_loader.ipynb:158`): without Delta's MERGE/CDF, each
  * micro-batch IS the change set — `foreachBatch` runs the latest-wins
  * upsert against the current Silver snapshot. Two variants:
  *   - [[upsertIntoPartitionedParquet]] (preferred): day-partitioned
  *     snapshot, merge reads ONLY the partitions the batch touches and
  *     dynamic partition overwrite rewrites only those — O(batch days), the
  *     same file-pruning a Delta MERGE gets from its transaction log;
  *   - [[upsertIntoParquet]] (legacy, unpartitioned): full-snapshot
  *     stage-then-swap, O(target) per batch — only for small dimension-like
  *     targets.
  */
object FileStreamIngest {

  /** Bronze: incremental parquet file stream. `includeExisting=false`
    * mirrors Auto Loader's `includeExistingFiles=false` (only files arriving
    * after the checkpoint's first listing are processed on later runs; the
    * first run drains what's there).
    */
  def bronzeStream(spark: SparkSession, srcDir: String, schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(srcDir)
  }

  /** [[bronzeStream]] without a declared schema — OSS
    * `spark.sql.streaming.schemaInference` parity (the conf Auto Loader's
    * `inferColumnTypes` wraps for self-describing formats): the parquet
    * file source infers the schema from the files present at stream
    * start. Parquet footers make the inference deterministic for a
    * consistent directory; a source whose schema may DRIFT between
    * restarts should use the declared-schema [[bronzeStream]] or the
    * schema-location protocol of [[bronzeJsonStreamInferred]] instead,
    * which is what pins a stable schema under the checkpoint.
    */
  def bronzeStreamInferred(spark: SparkSession, srcDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // scoped via an ISOLATED session, not a set/restore on the caller's:
    // the file source resolves its schema during load(), and a toggle on
    // the shared session races any concurrent reader construction — a
    // schema-less readStream built in the window would silently infer
    // (and re-type across restarts) instead of failing fast, or an
    // interleaved restore could leave the wrong final value. newSession()
    // shares the SparkContext but owns its conf; the caller's session is
    // never mutated. Runtime confs are carried over so the stream plans
    // under the caller's settings (shuffle partitions etc.).
    val s2 = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      try s2.conf.set(k, v) catch { case _: Exception => () } // static confs
    }
    s2.conf.set("spark.sql.streaming.schemaInference", "true")
    val r = s2.readStream
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(srcDir)
  }

  /** Bronze: incremental NDJSON(.gz) stream with schema-evolution rescue —
    * the streaming half of S5, matching the fundamentals Auto Loader
    * (`bronze_fundamentals_auto_loader.ipynb:86-98`, cell 2: `cloudFiles`
    * json + `recursiveFileLookup` + `schemaEvolutionMode=rescue`). Rows
    * that don't parse into the declared schema land intact in
    * `_rescued_data`, and VALID rows carrying undeclared extra fields get
    * those fields captured there as JSON instead of silently dropped
    * (same projection as the batch source — [[graft.sources.RescueJson]]);
    * nested date directories are discovered recursively; gzipped files
    * decompress by extension.
    */
  def bronzeJsonStream(spark: SparkSession, srcDir: String, schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
      .option("recursiveFileLookup", "true")
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.text(srcDir)
      .filter(trim(col("value")) =!= "")
      .select(graft.sources.RescueJson.rescueProjection(col("value"), schema): _*)
  }

  /** S5 with STREAMING SCHEMA INFERENCE — OSS parity for Auto Loader's
    * `cloudFiles.inferColumnTypes=true` + `cloudFiles.schemaLocation`
    * (`bronze_fundamentals_auto_loader.ipynb:91-95`; the OSS knob is
    * `spark.sql.streaming.schemaInference`, but bare inference re-runs at
    * every restart and silently re-types the stream — the schema-location
    * protocol below is what makes inference restart-stable, which is the
    * part Auto Loader actually adds):
    *
    *   - FIRST run: infer the schema from the NDJSON(.gz) files already
    *     in `srcDir` (one batch inference pass over what exists — the
    *     stream hasn't started, so this is bounded by the initial
    *     backlog, never by stream lifetime) and RECORD it at
    *     `schemaLocation/schema.json` (atomic publish);
    *   - LATER runs: load the recorded schema — inference never re-runs,
    *     so a restart cannot re-type or re-order columns under the
    *     checkpoint;
    *   - columns that appear AFTER the schema was recorded land in
    *     `_rescued_data` (the rescue projection of [[bronzeJsonStream]]),
    *     mirroring `schemaEvolutionMode=rescue` — an operator widens the
    *     stream by recording a new schema file and restarting, which is
    *     Auto Loader's `addNewColumns` restart made explicit.
    *
    * Returns the streaming frame; the schema in force is recoverable from
    * the schema file.
    */
  def bronzeJsonStreamInferred(spark: SparkSession, srcDir: String,
      schemaLocation: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = loadOrInferSchema(spark, srcDir, schemaLocation)
    bronzeJsonStream(spark, srcDir, schema, maxFilesPerTrigger)
  }

  /** The schema-location protocol: load `schema.json` if recorded, else
    * infer from the current files and publish atomically (tmp + rename —
    * two racing first runs converge on one winner's schema).
    */
  private[graft] def loadOrInferSchema(spark: SparkSession, srcDir: String,
      schemaLocation: String): StructType = {
    // storage-seam IO: Auto Loader's schemaLocation lives on the lake
    // (DBFS/S3 in the reference's setup), so the protocol must work on
    // any scheme the table format deploys to
    val loc = graft.tables.GPath(schemaLocation)
    val file = loc.resolve("schema.json")
    if (graft.tables.GFiles.exists(file))
      org.apache.spark.sql.types.DataType.fromJson(
        graft.tables.GFiles.readString(file)).asInstanceOf[StructType]
    else {
      val inferred = spark.read
        .option("recursiveFileLookup", "true")
        .json(srcDir).schema
      // the corrupt-record column is an inference artifact, not data
      val clean = StructType(inferred.fields.filterNot(
        _.name == spark.conf.get("spark.sql.columnNameOfCorruptRecord")))
      require(clean.nonEmpty,
        s"schema inference found no parseable JSON under $srcDir")
      graft.tables.GFiles.createDirectories(loc)
      val tmp = loc.resolve(s".tmp-${java.util.UUID.randomUUID()}")
      graft.tables.GFiles.writeString(tmp, clean.json)
      try graft.tables.GFiles.moveNoReplace(tmp, file)
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        graft.tables.GFiles.deleteIfExists(tmp)
        () } // a concurrent first run won: use its schema
      org.apache.spark.sql.types.DataType.fromJson(
        graft.tables.GFiles.readString(file)).asInstanceOf[StructType]
    }
  }

  /** Run a stream to a parquet append sink with AvailableNow semantics:
    * drain everything new, commit the checkpoint, stop. Returns after the
    * drain completes (the reference's scheduled-batch shape).
    */
  def runAvailableNowAppend(df: DataFrame, outDir: String, checkpointDir: String): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Always-on variant of [[runAvailableNowAppend]]: micro-batches on a
    * `Trigger.ProcessingTime` cadence, the reference's documented
    * alternative to `availableNow` for continuous ingest
    * (`docs/databricks_setup.md:131`). Returns the RUNNING query — it never
    * self-terminates; the caller owns `stop()`/`awaitTermination()`.
    * Exactly-once discovery rides the same checkpoint WAL, so a pipeline
    * can flip between scheduled (availableNow) and always-on
    * (processingTime) without re-ingesting.
    */
  def runProcessingTimeAppend(df: DataFrame, outDir: String,
      checkpointDir: String, interval: String = "5 minutes"): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(interval))
      .start()

  /** Exactly-once BLIND append into a commit-log table from a streaming
    * foreachBatch — the idempotent-writes shape Delta documents for
    * foreachBatch sinks (`txnAppId`/`txnVersion`): the micro-batch id is
    * the transaction version, so a batch replayed after a crash between
    * the append and the checkpoint commit is recognized by the table's
    * recorded txn watermark and skipped, instead of double-appending.
    * This closes the at-least-once caveat of the plain foreachBatch
    * appenders WITHOUT requiring a merge key — the Bronze shape, where
    * rows are raw and keys may not exist yet. `appId` must be unique per
    * logical stream (two streams sharing an appId would suppress each
    * other's batches); the checkpoint and the appId must move together.
    */
  def runAvailableNowCommitLogAppend(df: DataFrame, tableDir: String,
      checkpointDir: String, appId: String): Unit = {
    val q = df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.tables.CommitLogTable
          .forPath(batch.sparkSession, tableDir, batch.schema, Seq.empty)
          .append(batch, txn = Some((appId, batchId)))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Always-on twin of [[runAvailableNowCommitLogAppend]] (the same
    * AvailableNow/ProcessingTime duality every other runner has): the
    * txn watermark rides the shared checkpoint's batch ids, so a
    * pipeline can flip between scheduled drains and continuous ingest
    * without re-appending OR double-appending. Returns the RUNNING
    * query — the caller owns stop().
    */
  def runProcessingTimeCommitLogAppend(df: DataFrame, tableDir: String,
      checkpointDir: String, appId: String,
      interval: String = "5 minutes"): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(interval))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.tables.CommitLogTable
          .forPath(batch.sparkSession, tableDir, batch.schema, Seq.empty)
          .append(batch, txn = Some((appId, batchId)))
        ()
      }
      .start()

  /** AvailableNow drain through an arbitrary per-batch sink function. */
  def runAvailableNowForeachBatch(df: DataFrame, checkpointDir: String)
      (f: DataFrame => Unit): Unit = {
    val q = df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => f(batch) }
      .start()
    q.awaitTermination()
  }

  /** Write-side schema evolution (`mergeSchema=true` on the reference's
    * streaming write, `bronze_prices_auto_loader.ipynb` cell 3 line 122 /
    * `addNewColumns` in `docs/databricks_setup.md:120`): each restart may
    * declare a WIDER schema; batches append as-is and readers union file
    * schemas via [[graft.sinks.Sinks.readEvolved]] — new columns read as
    * null for history written before they existed.
    */
  def runAvailableNowEvolvingAppend(df: DataFrame, outDir: String,
      checkpointDir: String): Unit =
    runAvailableNowForeachBatch(df, checkpointDir)(
      graft.sinks.Sinks.evolvingAppend(_, outDir))

  /** Streaming dedup on ingest: duplicate records (same `idCols`) arriving
    * within `delay` of each other are emitted once; state expires with the
    * watermark so it stays bounded on an unbounded stream — the streaming-
    * native alternative to deduping in the Silver merge when duplicates
    * are known to arrive close together (retried uploads, at-least-once
    * sources).
    */
  def dedupWithinWatermark(df: DataFrame, idCols: Seq[String], tsCol: String,
      delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Streaming DQ gate (the reference's expectation suite applied at ingest
    * time, `validation/expectations_prices.json` +
    * `docs/databricks_setup.md` DQ flow): each micro-batch splits on the
    * rules — passing rows append to `outDir`, failing rows land in
    * `quarantineDir` with their `dq_reason`. One pass over the cached batch
    * feeds both sinks.
    *
    * Delivery is AT-LEAST-ONCE: these are blind appends inside
    * foreachBatch, so a crash between the writes and the checkpoint
    * commit replays the batch and double-appends. Consumers that need
    * exactly-once use [[medallionBatch]] (keyed upserts converge on
    * replay) or the plain file-sink runners (`_spark_metadata` log).
    */
  def runAvailableNowWithExpectations(df: DataFrame, outDir: String,
      quarantineDir: String, checkpointDir: String,
      rules: Seq[graft.operators.Expectations.Expectation]): Unit =
    runAvailableNowForeachBatch(df, checkpointDir) { batch =>
      import graft.operators.Expectations
      val cached = batch.persist()
      try {
        Expectations.enforce(cached, rules)
          .write.mode(SaveMode.Append).parquet(outDir)
        Expectations.quarantine(cached, rules)
          .write.mode(SaveMode.Append).parquet(quarantineDir)
      } finally cached.unpersist()
    }

  /** Silver: AvailableNow stream where each micro-batch latest-wins-merges
    * into the parquet snapshot at `targetDir` (CDF emulation: the batch is
    * the change set). Unpartitioned legacy variant.
    */
  def runAvailableNowUpsert(df: DataFrame, targetDir: String, checkpointDir: String,
      keys: Seq[String], order: Seq[Column]): Unit =
    runAvailableNowForeachBatch(df, checkpointDir)(
      upsertIntoParquet(_, targetDir, keys, order))

  /** Silver: partition-pruned streaming upsert — day-partitioned snapshot,
    * only partitions present in the batch are read and rewritten.
    */
  def runAvailableNowUpsertPartitioned(df: DataFrame, targetDir: String,
      checkpointDir: String, keys: Seq[String], order: Seq[Column],
      dayCol: String,
      ops: graft.operators.TableOps = graft.operators.TableOps.default): Unit =
    runAvailableNowForeachBatch(df, checkpointDir)(
      ops.upsertPartitions(_, targetDir, keys, order, dayCol))

  /** Always-on variant of [[runAvailableNowUpsertPartitioned]]: the same
    * checkpointed latest-wins merge on a `ProcessingTime` cadence —
    * continuous Silver. Returns the RUNNING query (caller owns stop);
    * flipping between scheduled and always-on preserves progress through
    * the shared WAL, exactly as with the append runners.
    */
  def runProcessingTimeUpsertPartitioned(df: DataFrame, targetDir: String,
      checkpointDir: String, keys: Seq[String], order: Seq[Column],
      dayCol: String, interval: String = "5 minutes"): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(interval))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.TableOps.default.upsertPartitions(batch, targetDir, keys, order, dayCol)
      }
      .start()

  /** One micro-batch of the WHOLE medallion: the reference's
    * bronze→silver→gold architecture (`docs/databricks_setup.md` DQ flow
    * + Silver merge + Gold view) applied end-to-end to a single batch,
    * maintaining three tables under `outRoot`:
    *
    *   - `quarantine/` — rows failing the DQ `rules`, with `dq_reason`;
    *   - `silver/`     — normalized events, partition-pruned latest-wins
    *     upsert keyed by `event_id`, day-partitioned;
    *   - `gold/`       — the window-feature view ([[graft.operators
    *     .GoldFeatures]]), INCREMENTALLY maintained: the features are
    *     backward-looking per-key windows, so a key's gold rows change
    *     only when that key receives data. Each batch recomputes the
    *     window chain for the TOUCHED user_ids' full history (read back
    *     from silver through the binding's `readTable` seam — at 100 TB
    *     the per-key history is bounded while silver is not) and upserts
    *     exactly those keys' rows. Late data is thereby handled for
    *     free: a late row re-derives every downstream feature of its key.
    *
    * Exactly-once: the streaming checkpoint replays an interrupted batch,
    * and every sink here is a KEYED upsert — quarantine included — so a
    * replay converges to identical tables instead of double-appending.
    * The quarantine key is a non-null surrogate (below), so convergence
    * holds even for malformed NULL-id rows; silver/gold key on
    * `event_id`, so rows that PASS the DQ gate must carry a non-null
    * `event_id` for replay convergence — gate NULL ids with a
    * `not_null(event_id)` expectation (they then converge in quarantine).
    * All storage goes through the [[graft.operators.TableOps]] seam, so
    * the plain-parquet and transactional commit-log bindings both run the
    * pipeline unchanged.
    */
  def medallionBatch(batch: DataFrame, outRoot: String,
      rules: Seq[graft.operators.Expectations.Expectation],
      ops: graft.operators.TableOps = graft.operators.TableOps.default): Unit = {
    import graft.operators.{Expectations, GoldFeatures, Normalize}
    val spark = batch.sparkSession
    val cached = batch.persist()
    // persisted: each upsert helper fires several actions (emptiness
    // probe, touched-days collect, the write, the merge) — without the
    // persists the normalize chain and the full gold window chain over
    // the touched keys' silver history would re-execute per action,
    // tripling the dominant per-batch work at scale
    val normalized = Normalize.events(Expectations.enforce(cached, rules)).persist()
    var gold: DataFrame = null
    try {
      // through the seam like silver/gold — under the commit-log binding
      // the quarantine table gets the same atomic commits and CDF.
      // Keyed on a NON-NULL surrogate, not event_id directly: quarantine
      // is exactly where malformed rows land, and a NULL merge key never
      // equi-matches (it inserts unconditionally) — a checkpointed replay
      // after a crash would re-insert every NULL-keyed row on each retry.
      // coalesce(event_id, sha256(full row)) is replay-deterministic, so
      // retries converge for malformed rows too (identical malformed rows
      // collapse to one — the price of idempotence, since replays cannot
      // tell copies apart). Tie-break order is the full row (struct
      // comparison): replayed duplicate keys converge on ONE
      // deterministic winner — ordering by the key itself would make
      // keepLast arbitrary-wins and a replay could produce a different
      // table than the first attempt
      val quarRaw = Expectations.quarantine(cached, rules)
      val quar = quarRaw.withColumn("quarantine_key",
        coalesce(col("event_id").cast("string"),
          sha2(to_json(struct(quarRaw.columns.map(col).toIndexedSeq: _*)), 256)))
      ops.upsert(quar, s"$outRoot/quarantine", Seq("quarantine_key"),
        Seq(struct(quarRaw.columns.map(col).toIndexedSeq: _*)))
      if (!normalized.isEmpty) {
        val silverDir = s"$outRoot/silver"
        // day rides the merge key (it is a function of ts, so the pair is
        // as unique as event_id alone) — the partition-stability contract
        // both upsert bindings want
        ops.upsertPartitions(normalized, silverDir,
          keys = Seq("event_id", "day"), order = Seq(col("ts").desc),
          dayCol = "day")
        val touched = normalized.select("user_id").distinct()
        val history = ops.readTable(spark, silverDir)
          .join(broadcast(touched), Seq("user_id"), "left_semi")
        gold = GoldFeatures.features(history, keyCols = Seq("user_id"),
          order = Seq(col("ts"), col("event_id")), valueCol = "value").persist()
        ops.upsertPartitions(gold, s"$outRoot/gold",
          keys = Seq("event_id", "day"), order = Seq(col("ts").desc),
          dayCol = "day")
      }
    } finally {
      cached.unpersist()
      normalized.unpersist()
      if (gold != null) gold.unpersist()
    }
  }

  /** Always-on medallion: [[medallionBatch]] on a `ProcessingTime`
    * cadence — the reference's scheduled notebooks as ONE running
    * pipeline. Returns the running query (caller owns stop); restarts
    * resume exactly-once from the shared checkpoint.
    */
  def runProcessingTimeMedallion(df: DataFrame, outRoot: String,
      checkpointDir: String,
      rules: Seq[graft.operators.Expectations.Expectation],
      ops: graft.operators.TableOps = graft.operators.TableOps.default,
      interval: String = "5 minutes"): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(interval))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        medallionBatch(batch, outRoot, rules, ops)
      }
      .start()

  /** Scheduled-drain medallion (Trigger.AvailableNow), sharing the
    * checkpoint — flip between this and the always-on form freely.
    */
  def runAvailableNowMedallion(df: DataFrame, outRoot: String,
      checkpointDir: String,
      rules: Seq[graft.operators.Expectations.Expectation],
      ops: graft.operators.TableOps = graft.operators.TableOps.default): Unit =
    runAvailableNowForeachBatch(df, checkpointDir)(
      medallionBatch(_, outRoot, rules, ops))

  /** Latest-wins upsert of `batch` into the DAY-PARTITIONED parquet
    * snapshot at `targetDir`: read only the partitions the batch touches
    * (partition pruning), merge, and swap in exactly those — untouched day
    * directories are never rewritten. This is the shape that survives a
    * 100 TB Silver table: per-batch cost is O(touched days), not O(target).
    *
    * Crash safety (per-partition stage-then-rename): the merged output
    * materializes in a sibling `.staged` dir BEFORE the snapshot is
    * touched; each touched `day=` directory is then staged to `.old`,
    * renamed in, and its `.old` dropped. A crash anywhere leaves every day
    * either intact, or restorable from `.old` — the recovery sweep at the
    * start of the next call restores it, so the checkpointed foreachBatch
    * retry always merges against an uncorrupted snapshot (the property
    * Delta's transactional MERGE gives the reference). Single-writer, like
    * [[upsertIntoParquet]]; directory renames are atomic on local/HDFS
    * filesystems — an object store without atomic rename needs a real
    * table format instead.
    *
    * Requires `dayCol ∈ keys` (the merge key must determine the partition,
    * as with the reference's (symbol, trade_date) key / trade_date
    * partitioning) — otherwise a key's latest row could move between days
    * and the pruned merge could not retract the old day's row. `dayCol`
    * should be a DateType/string column with stable text form (partition
    * values round-trip through directory names).
    *
    * Reader visibility: crash safety covers the WRITER, not concurrent
    * readers — between the two renames of a touched `day=X` the partition
    * is briefly absent, so a snapshot scan racing a batch commit can miss
    * it. Readers must not scan while a commit is in flight (schedule reads
    * between batches, or publish the snapshot path via a catalog pointer
    * flipped after the swap). Delta's log gives the reference this
    * isolation for free; plain parquet directories cannot.
    */
  def upsertIntoPartitionedParquet(batch: DataFrame, targetDir: String,
      keys: Seq[String], order: Seq[Column], dayCol: String): Unit = lockFor(targetDir).synchronized {
    require(keys.contains(dayCol),
      s"dayCol '$dayCol' must be part of the merge key ${keys.mkString("[", ",", "]")}")
    requireLocalPath(targetDir)
    if (batch.isEmpty) return // no-data micro-batch: nothing to merge
    val spark = batch.sparkSession
    val target = Paths.get(targetDir)
    val oldRoot = Paths.get(targetDir + ".old")
    recoverPartitionSwaps(target, oldRoot)
    // touched partitions: bounded by days-per-batch, safe to collect
    val days = batch.select(col(dayCol)).distinct().collect().map(_.get(0))
    if (!Files.exists(target)) {
      // bootstrap: nothing to corrupt, write the deduped batch directly
      graft.operators.Dedup.keepLast(batch, keys, order)
        .write.mode(SaveMode.Overwrite).partitionBy(dayCol).parquet(targetDir)
      return
    }
    // NULL day values must select the target's null-day rows too:
    // isin(null) never evaluates TRUE, yet the swap below replaces the
    // day=__HIVE_DEFAULT_PARTITION__ dir — without the isNull leg the
    // target's existing null-day rows would be silently lost
    val nonNull = days.filter(_ != null).toIndexedSeq
    val dayPred =
      if (days.contains(null)) col(dayCol).isin(nonNull: _*) || col(dayCol).isNull
      else col(dayCol).isin(nonNull: _*)
    // mergeSchema: a previous wider batch may have evolved the seam, so
    // the target holds mixed per-partition schemas — single-footer
    // inference could resolve a pre-evolution file, alignToBatch would
    // null-backfill the evolved column, and carried-over rows would
    // silently lose their real values on the rewrite
    val current = alignToBatch(
      spark.read.option("mergeSchema", "true").parquet(targetDir).filter(dayPred),
      batch)
    val merged = MergeUpsert.merge(current, batch, keys, order)
    val staged = Paths.get(targetDir + ".staged")
    deleteRecursively(staged)
    merged.write.partitionBy(dayCol).parquet(staged.toString)
    // per-partition swap: target/day=X → .old/day=X → replaced → .old
    // dropped; the snapshot is only mutated AFTER the merge fully wrote
    Files.createDirectories(oldRoot)
    listDir(staged)
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith(s"$dayCol="))
      .foreach { sp =>
        val dirName = sp.getFileName
        val tp = target.resolve(dirName)
        val op = oldRoot.resolve(dirName)
        deleteRecursively(op)
        if (Files.exists(tp)) Files.move(tp, op, StandardCopyOption.ATOMIC_MOVE)
        Files.move(sp, tp, StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(op)
      }
    deleteRecursively(staged)
    deleteRecursively(oldRoot)
  }

  /** Restore any day partition whose swap was interrupted: a `.old/day=X`
    * with no live `day=X` means the crash hit between the two renames —
    * move it back; a `.old/day=X` next to a live one is a stale backup —
    * drop it.
    */
  private def recoverPartitionSwaps(target: Path, oldRoot: Path): Unit =
    if (Files.exists(oldRoot)) {
      listDir(oldRoot).foreach { op =>
        val tp = target.resolve(op.getFileName)
        if (!Files.exists(tp)) Files.move(op, tp, StandardCopyOption.ATOMIC_MOVE)
        else deleteRecursively(op)
      }
      deleteRecursively(oldRoot)
    }

  /** Latest-wins upsert of `batch` into the unpartitioned parquet dir at
    * `targetDir` (created if absent), staged to a sibling dir then renamed
    * into place. Single-writer only (`synchronized` guards one JVM; nothing
    * guards concurrent writers on a shared filesystem). A crash between the
    * two renames leaves data in `targetDir.old` — recovered on the next
    * call.
    */
  def upsertIntoParquet(batch: DataFrame, targetDir: String,
      keys: Seq[String], order: Seq[Column]): Unit = lockFor(targetDir).synchronized {
    requireLocalPath(targetDir)
    if (batch.isEmpty) return // no-data micro-batch: keep the snapshot as-is
    val spark = batch.sparkSession
    val target = Paths.get(targetDir)
    val old = Paths.get(targetDir + ".old")
    // crash recovery: an interrupted swap leaves target missing and .old
    // holding the last good snapshot — restore it before merging
    if (!Files.exists(target) && Files.exists(old))
      Files.move(old, target, StandardCopyOption.ATOMIC_MOVE)
    val merged =
      if (Files.exists(target)) {
        MergeUpsert.merge(alignToBatch(spark.read.parquet(targetDir), batch),
          batch, keys, order)
      } else {
        graft.operators.Dedup.keepLast(batch, keys, order)
      }
    val staged = Paths.get(targetDir + ".staged")
    deleteRecursively(staged)
    merged.write.parquet(staged.toString)
    deleteRecursively(old)
    if (Files.exists(target)) Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staged, target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  // single-writer safety without cross-table serialization: one monitor
  // per canonical target path — two pipelines upserting DIFFERENT tables
  // in one JVM must not wait on each other for the duration of a write job
  private val targetLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(targetDir: String): Object =
    targetLocks.computeIfAbsent(
      Paths.get(targetDir).toAbsolutePath.normalize.toString,
      _ => new Object)

  /** The stage-then-rename emulation is java.nio-local by construction; a
    * remote URI would silently resolve as a relative LOCAL path, miss the
    * existing table, and bootstrap-Overwrite the real one on every batch.
    * Fail loudly instead — a remote deployment mounts the commit-log (or a
    * real table format), not the rename emulation.
    */
  private def requireLocalPath(targetDir: String): Unit =
    require(graft.tables.GPath.schemeOf(targetDir).isEmpty,
      s"upsert emulation requires a bare local path, got URI '$targetDir' " +
        "— its isolation rides atomic POSIX directory renames; use " +
        "TableOps.commitLog (any scheme) for remote storage")

  /** Project the live table to the batch's schema. A NARROWER batch is
    * refused (it would silently project existing columns AWAY from every
    * rewritten partition); a WIDER batch EVOLVES the rewritten
    * partitions — missing columns null-backfill, so a pipeline restarted
    * with an upgraded schema (a widened source, or an upgraded engine
    * adding a column like the quarantine surrogate key) keeps flowing
    * over a pre-evolution snapshot instead of crashing on the first
    * micro-batch. This is the parquet-seam mirror of the commit-log
    * binding's auto-mergeSchema.
    */
  private def alignToBatch(current: DataFrame, batch: DataFrame): DataFrame = {
    val extraT = current.columns.toSet -- batch.columns
    require(extraT.isEmpty,
      s"batch is missing table columns ${extraT.mkString(",")} — a " +
        "narrower upsert would silently drop them from rewritten partitions")
    current.select(batch.schema.fields.map(f =>
      if (current.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
  }

  // NIO directory streams hold an fd until closed — a long-running
  // foreachBatch stream would leak one per micro-batch without the
  // try/finally (GC closes them eventually, but fd exhaustion comes first
  // on a busy ingest node)
  private def listDir(p: Path): Array[Path] = {
    val s = Files.list(p)
    try s.toArray.map(_.asInstanceOf[Path]) finally s.close()
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
}
