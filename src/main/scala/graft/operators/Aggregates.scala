package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation/monitoring operators (reference §2.5 A1–A6, O2 top-k).
  *
  * All are plain hash aggregates → Catalyst plans partial (map-side) + final
  * aggregation, so the shuffle carries one row per (partition × group), not
  * per input row. Top-k is `TakeOrderedAndProject` — each partition keeps k
  * rows, the driver merges k×partitions rows; no global sort at any scale.
  */
object Aggregates {

  /** A1: row counts per group. */
  def countByGroup(df: DataFrame, groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("n"))

  /** A2: per-column null counts in one pass
    * (`bronze_fundamentals_auto_loader.ipynb` cell 3, lines 171-173).
    */
  def nullAudit(df: DataFrame, cols: Seq[String]): DataFrame = {
    val counts =
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c"))
    df.agg(count(lit(1)).as("n_total"), counts: _*)
  }

  /** A5: per-key coverage — min/max/distinct-count of a date column
    * (`docs/databricks_setup.md:321-329`).
    */
  def coverage(df: DataFrame, keyCols: Seq[String], dateCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        min(col(dateCol)).as("first_day"),
        max(col(dateCol)).as("last_day"),
        countDistinct(col(dateCol)).as("n_days"),
        count(lit(1)).as("n_rows"))

  /** A5 at 100 TB: sketch-based coverage. `countDistinct` shuffles every
    * distinct (key, day) pair; the HLL++ sketch merges map-side, so the
    * shuffle carries one fixed-size sketch per key per partition. Oracle
    * compare is impossible across engines (different sketches) — the spec
    * bounds the error against the exact count instead.
    */
  def coverageApprox(df: DataFrame, keyCols: Seq[String], dateCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        min(col(dateCol)).as("first_day"),
        max(col(dateCol)).as("last_day"),
        approx_count_distinct(col(dateCol), rsd).as("n_days_approx"),
        count(lit(1)).as("n_rows"))

  /** O2: deterministic top-k — `order` must totally order rows (include a
    * unique tiebreaker) so the k-th row is well-defined.
    */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Batch sessionization (the oracle-verifiable twin of
    * `streaming.StatefulOps.sessionize`): gap-based sessions via the
    * classic lag-flag + cumulative-sum pattern — one shuffle on the key,
    * two window passes, one aggregate; `orderCols` must totally order rows
    * within a key (include a unique tiebreaker) for determinism.
    */
  def sessionizeBatch(df: DataFrame, userCol: String, tsCol: String,
      orderCols: Seq[Column], gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapMinutes * 60000000L
    val w = Window.partitionBy(col(userCol)).orderBy(orderCols: _*)
    val us = unix_micros(col(tsCol))
    val newFlag = when(
      lag(us, 1).over(w).isNull || us - lag(us, 1).over(w) >= gapUs, 1L)
      .otherwise(0L)
    df.withColumn("__nf", newFlag)
      .withColumn("session_id", sum(col("__nf"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Distribution summary for DQ monitoring: exact discrete percentiles
    * per group (`percentile_disc` picks actual data values — cross-engine
    * deterministic, unlike interpolated percentiles whose rounding can
    * drift). Exact percentiles sort within groups; at 100 TB swap in
    * `approx_percentile` for a sketch-merge plan — same call shape.
    */
  def quantileSummary(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[Double]): DataFrame = {
    val aggs = ps.map { p =>
      expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY $valueCol)")
        .as(s"p${(p * 100).round}")
    }
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** A6: latest-day ingest monitor — counts + max arrival per key on the most
    * recent day in the data (`docs/databricks_setup.md:301-310` uses
    * CURRENT_DATE; pinned to max(day) for reproducibility).
    */
  def latestDayMonitor(df: DataFrame, keyCols: Seq[String], dayCol: String, tsCol: String): DataFrame = {
    val maxDay = df.agg(max(col(dayCol)).as("__max_day"))
    df.join(broadcast(maxDay), col(dayCol) === col("__max_day"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), max(col(tsCol)).as("latest_ts"))
  }
}
