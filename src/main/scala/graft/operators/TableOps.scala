package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Table-services seam (SURVEY §7.3) — the four mutating table services
  * the engine emulates over plain parquet, behind ONE small trait so a
  * transactional table format (Delta/Iceberg/Hudi) can slot in without
  * touching call sites:
  *
  *   - `merge`: MERGE-upsert semantics on frames (latest-wins per key) —
  *     Delta maps it to `DeltaTable.merge`;
  *   - `upsertPartitions`: apply a batch to a live partitioned table
  *     (here: partition-pruned stage-then-swap renames; Delta: the same
  *     merge with partition pruning, plus real reader isolation — the
  *     documented swap-visibility window this seam exists to close);
  *   - `compact`: OPTIMIZE / bin-packing small-file compaction;
  *   - `vacuum`: sweep stale artifacts (staging dirs here; aged
  *     tombstoned files in a real format).
  *
  * The default binding is [[ParquetTableOps]]; production code paths
  * (silver merge, the streaming upsert triggers, the maintenance specs)
  * go through [[TableOps.default]], so swapping the implementation is a
  * one-line binding change, not a refactor.
  */
trait TableOps {

  /** MERGE upsert: latest row per `keys` wins under `order`; unmatched
    * target rows survive, unmatched update rows insert.
    */
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String],
      order: Seq[Column]): DataFrame

  /** Apply `batch` to the live day-partitioned table at `targetDir` with
    * partition pruning (only partitions present in the batch are
    * touched), crash-safe.
    */
  def upsertPartitions(batch: DataFrame, targetDir: String, keys: Seq[String],
      order: Seq[Column], dayCol: String): Unit

  /** Apply `batch` to the live UNPARTITIONED keyed table at `targetDir`
    * (latest-wins per `keys` under `order`) — the quarantine-table shape:
    * small, keyed, no day partitioning worth pruning on.
    */
  def upsert(batch: DataFrame, targetDir: String, keys: Seq[String],
      order: Seq[Column]): Unit

  /** OPTIMIZE: compact the named partition values toward
    * `targetFileBytes` per file; returns value → (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, dir: String, partitionCol: String,
      targetFileBytes: Long, values: Seq[String]): Map[String, (Int, Int)]

  /** VACUUM: restore-first sweep of orphaned maintenance artifacts;
    * returns (restored, deleted).
    */
  def vacuum(dir: String): (Int, Int)

  /** Read the live table this binding maintains at `dir` — the read half
    * of [[upsertPartitions]] (plain parquet scan here; a snapshot resolve
    * in a transactional format, `spark.read.format("delta").load` in
    * Delta). Pipelines that read their own silver/gold mid-stream go
    * through this seam so the binding stays swappable end-to-end.
    */
  def readTable(spark: SparkSession, dir: String): DataFrame
}

object TableOps {
  /** The engine-wide binding — swap here to mount a transactional
    * format's implementation.
    */
  val default: TableOps = ParquetTableOps

  /** The transactional binding: the same four services over the
    * [[graft.tables.CommitLogTable]] versioned-manifest format — atomic
    * commits, snapshot-isolated readers, persisted CDF, time travel.
    * Callers read the table through `CommitLogTable.open(...).read()`
    * rather than a bare `spark.read.parquet(dir)`.
    */
  val commitLog: TableOps = CommitLogTableOps
}

/** [[graft.tables.CommitLogTable]]-backed table services: upserts become
  * atomic versioned MERGE commits with partition-pruned copy-on-write,
  * compact/vacuum operate on the manifest rather than live directories —
  * so a concurrent reader's resolved snapshot is never perturbed.
  */
object CommitLogTableOps extends TableOps {
  import graft.tables.CommitLogTable

  /** Frame-level MERGE is storage-free — same semantics as the default
    * binding (the transactional value-add lives in [[upsertPartitions]],
    * where the result is committed).
    */
  override def merge(target: DataFrame, updates: DataFrame, keys: Seq[String],
      order: Seq[Column]): DataFrame =
    MergeUpsert.merge(target, updates, keys, order)

  /** A batch that COVERS the table's columns and adds new ones evolves
    * the schema in place (the reference's Auto Loader `addNewColumns` +
    * Bronze `mergeSchema=true` applied at the table seam — a stream
    * restarting with a widened source keeps flowing); a NARROWER batch
    * still fails loudly (silently nulling existing columns on matched
    * rows is never what an upsert meant).
    */
  private def evolves(tbl: CommitLogTable, batch: DataFrame): Boolean =
    tbl.schema.fieldNames.forall(batch.columns.contains) &&
      batch.columns.length > tbl.schema.fields.length

  override def upsertPartitions(batch: DataFrame, targetDir: String,
      keys: Seq[String], order: Seq[Column], dayCol: String): Unit = {
    val tbl = CommitLogTable.forPath(batch.sparkSession, targetDir,
      batch.schema, Seq(dayCol))
    tbl.merge(batch, keys, order, mergeSchema = evolves(tbl, batch))
  }

  override def upsert(batch: DataFrame, targetDir: String, keys: Seq[String],
      order: Seq[Column]): Unit = {
    val tbl = CommitLogTable.forPath(batch.sparkSession, targetDir,
      batch.schema, Seq.empty)
    tbl.merge(batch, keys, order, mergeSchema = evolves(tbl, batch))
  }

  override def compact(spark: SparkSession, dir: String, partitionCol: String,
      targetFileBytes: Long, values: Seq[String]): Map[String, (Int, Int)] =
    CommitLogTable.open(spark, dir).compact(targetFileBytes, Some(values))

  /** Sweeps data files outside the 2-version retention window plus
    * orphans of lost commit races; the commit-log format never restores
    * (nothing is ever in a half-swapped state), so `restored` is 0.
    */
  override def vacuum(dir: String): (Int, Int) =
    (0, CommitLogTable.vacuumPath(dir, retainVersions = 2))

  /** Snapshot-isolated read of the latest committed version. */
  override def readTable(spark: SparkSession, dir: String): DataFrame =
    CommitLogTable.open(spark, dir).read()
}

/** The plain-parquet implementation: delegates to the spec-proven
  * emulations ([[MergeUpsert]], [[graft.streaming.FileStreamIngest]],
  * [[graft.sinks.Sinks]]).
  */
object ParquetTableOps extends TableOps {
  override def merge(target: DataFrame, updates: DataFrame, keys: Seq[String],
      order: Seq[Column]): DataFrame =
    MergeUpsert.merge(target, updates, keys, order)

  override def upsertPartitions(batch: DataFrame, targetDir: String,
      keys: Seq[String], order: Seq[Column], dayCol: String): Unit =
    graft.streaming.FileStreamIngest.upsertIntoPartitionedParquet(
      batch, targetDir, keys, order, dayCol)

  override def upsert(batch: DataFrame, targetDir: String, keys: Seq[String],
      order: Seq[Column]): Unit =
    graft.streaming.FileStreamIngest.upsertIntoParquet(
      batch, targetDir, keys, order)

  override def compact(spark: SparkSession, dir: String, partitionCol: String,
      targetFileBytes: Long, values: Seq[String]): Map[String, (Int, Int)] =
    graft.sinks.Sinks.compactPartitions(spark, dir, partitionCol,
      targetFileBytes, values)

  override def vacuum(dir: String): (Int, Int) =
    graft.sinks.Sinks.vacuumStaging(dir)

  override def readTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
