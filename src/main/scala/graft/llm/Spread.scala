package graft.llm

import org.apache.spark.sql.DataFrame

/** Gated input spreading for per-row-heavy stages: a single-split input
  * (one small parquet file) serializes the whole scan into one task, so
  * spread it across the cluster first; a well-split input (≥ half the
  * available slots) is left alone — at corpus scale the round-robin
  * shuffle would cost more than it buys.
  *
  * The split estimate reads the plan's file-source inventory
  * (`inputFiles`), NOT `df.rdd.getNumPartitions`: converting the plan to
  * RDD lineage just to count splits forces a full physical planning pass
  * outside AQE and pins the un-reoptimized plan. File count upper-bounds
  * scan parallelism for the small-file inputs this gate exists to repair
  * (small files are never split, only packed), which is exactly the
  * conservative direction. A non-file input (in-memory relation, post-
  * shuffle stage) reports no files and is left alone — by that point
  * parallelism is governed by shuffle partitioning, not input splits.
  */
private[llm] object Spread {
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val nFiles = df.inputFiles.length
    if (nFiles > 0 && nFiles * 2 < p) df.repartition(p) else df
  }
}
