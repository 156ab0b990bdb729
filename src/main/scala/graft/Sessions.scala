package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory with the engine's scale-tuned defaults — one
  * place for the conf discipline every entry point (Verify/Bench/user code)
  * shares.
  *
  * The settings and why:
  *  - `shuffle.partitions`: sized to the cluster (cores here; ~2-3× total
  *    cores on a real cluster) instead of the 200 default — with AQE
  *    coalescing ON, this is the UPPER bound and small stages shrink
  *    automatically.
  *  - AQE on (default in Spark 4) + skew-join: runtime re-planning splits
  *    skewed shuffle partitions; `Skew.saltedJoin` covers what AQE can't.
  *  - `files.maxPartitionBytes` 128m: keeps scan partitions within executor
  *    memory at 100 TB inputs (a 100 TB scan → ~800k tasks, the right
  *    granularity for 1000 executors).
  *  - session timezone UTC: the reference stores tz-naive UTC timestamps;
  *    cross-engine determinism requires pinning it.
  *  - `cbo.planStats.enabled`: propagate catalog row counts (ANALYZE'd by
  *    [[graft.sources.Catalog.registerParquet]]) into logical-plan stats,
  *    so sizing decisions (IVF centroid counts) read metadata instead of
  *    paying a count job per query.
  */
object Sessions {
  def build(master: String, cores: Int, appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      // SQL functions + DML strategies + view rules; analyzer rules can
      // only be injected at construction (plans/ViewSql.scala)
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.cbo.planStats.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
