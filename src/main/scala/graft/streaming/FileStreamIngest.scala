package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
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
  * upsert against the current Silver snapshot and atomically swaps the
  * staged result in (stage-then-rename, the plain-filesystem stand-in for
  * a transactional commit).
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

  /** Silver: AvailableNow stream where each micro-batch latest-wins-merges
    * into the parquet snapshot at `targetDir` (CDF emulation: the batch is
    * the change set). The merged result is staged and atomically swapped.
    */
  def runAvailableNowUpsert(df: DataFrame, targetDir: String, checkpointDir: String,
      keys: Seq[String], order: Seq[Column]): Unit = {
    val q = df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertIntoParquet(batch, targetDir, keys, order)
      }
      .start()
    q.awaitTermination()
  }

  /** Latest-wins upsert of `batch` into the parquet dir at `targetDir`
    * (created if absent), staged to a sibling dir then renamed into place.
    */
  def upsertIntoParquet(batch: DataFrame, targetDir: String,
      keys: Seq[String], order: Seq[Column]): Unit = synchronized {
    val spark = batch.sparkSession
    val target = Paths.get(targetDir)
    val merged =
      if (Files.exists(target)) {
        val current = spark.read.parquet(targetDir)
        MergeUpsert.merge(current.select(batch.columns.map(col): _*), batch, keys, order)
      } else {
        graft.operators.Dedup.keepLast(batch, keys, order)
      }
    val staged = Paths.get(targetDir + ".staged")
    deleteRecursively(staged)
    merged.write.parquet(staged.toString)
    val old = Paths.get(targetDir + ".old")
    deleteRecursively(old)
    if (Files.exists(target)) Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staged, target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    }
}
