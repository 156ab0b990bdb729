package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The [[TableOps]] seam bound to REAL delta-spark (SURVEY §7.3's
  * interop point) — written entirely through format strings and SQL
  * (`format("delta")`, ``MERGE INTO delta.`path` ``), so it compiles
  * with zero delta imports and activates only when the runtime
  * classpath carries `io.delta:delta-spark` AND the session was built
  * with Delta's extension + catalog:
  *
  * {{{
  *   spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension
  *   spark.sql.catalog.spark_catalog=org.apache.spark.sql.delta.catalog.DeltaCatalog
  * }}}
  *
  * This environment is zero-egress and the pre-warmed dependency cache
  * carries no delta artifacts (documented in README), so
  * `DeltaInteropSpec` self-cancels here; with the jar dropped in, the
  * same spec drives the medallion upsert through this binding
  * unchanged — the proof the seam holds against the real thing.
  */
object DeltaSqlTableOps extends TableOps {

  /** Is delta-spark on the classpath? (The extension/catalog confs are
    * additionally required for the SQL surface — checked by callers via
    * [[sessionReady]].)
    */
  def available: Boolean =
    try { Class.forName("io.delta.tables.DeltaTable"); true }
    catch { case _: ClassNotFoundException => false }

  def sessionReady(spark: SparkSession): Boolean = available &&
    spark.conf.getOption("spark.sql.extensions")
      .exists(_.contains("DeltaSparkSessionExtension"))

  private def requireReady(spark: SparkSession): Unit =
    require(sessionReady(spark),
      "DeltaSqlTableOps needs io.delta:delta-spark on the classpath and " +
        "a session built with DeltaSparkSessionExtension + DeltaCatalog")

  private def ref(dir: String): String = s"delta.`$dir`"

  /** Frame-level MERGE is storage-free — identical to every binding. */
  override def merge(target: DataFrame, updates: DataFrame, keys: Seq[String],
      order: Seq[Column]): DataFrame =
    MergeUpsert.merge(target, updates, keys, order)

  private def sqlMerge(batch: DataFrame, targetDir: String,
      keys: Seq[String], order: Seq[Column]): Unit = {
    val spark = batch.sparkSession
    requireReady(spark)
    // seam contract (same as CommitLogTable.merge): latest-wins collapses
    // only NON-NULL-keyed rows — a NULL merge key never equi-matches
    // anything, so each NULL-keyed row is an independent insert (which is
    // also why the ON uses `=`, not the null-safe `<=>`)
    val anyKeyNull = keys.map(col(_).isNull).reduce(_ || _)
    val latest = Dedup.keepLast(batch.filter(!anyKeyNull), keys, order)
      .unionByName(batch.filter(anyKeyNull))
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(targetDir, "_delta_log"))) {
      latest.write.format("delta").save(targetDir)
    } else {
      val view = "graft_delta_merge_src_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      latest.createOrReplaceTempView(view)
      try spark.sql(
        s"""MERGE INTO ${ref(targetDir)} AS t USING $view AS s
           |ON ${keys.map(k => s"t.`$k` = s.`$k`").mkString(" AND ")}
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      finally spark.catalog.dropTempView(view)
    }
  }

  override def upsertPartitions(batch: DataFrame, targetDir: String,
      keys: Seq[String], order: Seq[Column], dayCol: String): Unit =
    sqlMerge(batch, targetDir, keys, order)

  override def upsert(batch: DataFrame, targetDir: String, keys: Seq[String],
      order: Seq[Column]): Unit =
    sqlMerge(batch, targetDir, keys, order)

  override def compact(spark: SparkSession, dir: String, partitionCol: String,
      targetFileBytes: Long, values: Seq[String]): Map[String, (Int, Int)] = {
    requireReady(spark)
    val where =
      if (values.isEmpty) ""
      else s" WHERE `$partitionCol` IN (${values.map(v => s"'$v'").mkString(",")})"
    spark.sql(s"OPTIMIZE ${ref(dir)}$where")
    // Delta's OPTIMIZE metrics frame is version-dependent; report the
    // touched values without per-value file counts (callers treat the
    // map as advisory — the parquet binding documents the same)
    values.map(_ -> (0, 0)).toMap
  }

  override def vacuum(dir: String): (Int, Int) = {
    val spark = SparkSession.active
    requireReady(spark)
    spark.sql(s"VACUUM ${ref(dir)} RETAIN 168 HOURS")
    (0, 0)
  }

  override def readTable(spark: SparkSession, dir: String): DataFrame = {
    requireReady(spark)
    spark.read.format("delta").load(dir)
  }
}
