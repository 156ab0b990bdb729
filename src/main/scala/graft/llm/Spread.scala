package graft.llm

import org.apache.spark.sql.DataFrame

/** Gated input spreading for per-row-heavy stages: a single-split input
  * (one small parquet file) serializes the whole scan into one task, so
  * spread it across the cluster first; a well-split input (≥ half the
  * available slots) is left alone — at corpus scale the round-robin
  * shuffle would cost more than it buys.
  */
private[llm] object Spread {
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < p) df.repartition(p) else df
  }
}
