package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO emulation: matched-update / not-matched-insert upsert.
  *
  * The reference's Silver load is a Delta `MERGE INTO ... ON t.symbol =
  * s.symbol AND t.trade_date = s.trade_date WHEN MATCHED UPDATE WHEN NOT
  * MATCHED INSERT`, with the source pre-deduped latest-wins by `ingest_ts`
  * (`docs/databricks_setup.md:170-198`). Without Delta, the same result is a
  * full-outer join on the key with update-wins column picks, rewritten
  * atomically by the caller (stage-then-swap).
  *
  * Scale: both sides hash-partition on the merge key — one shuffle each, then
  * a sort-merge join (or broadcast, if AQE sees the update batch is small —
  * daily batches typically are ≪ target). This is the same data movement
  * Delta's MERGE performs internally; no driver-side collection anywhere.
  */
object MergeUpsert {

  /** Upsert `updates` into `target` on `keys`. `updates` is first deduped
    * latest-wins by `order` (caller encodes direction, e.g.
    * `col("ingest_ts").desc`). Matched keys take every non-key column from
    * the update row (including its NULLs); unmatched rows pass through.
    * Both inputs must share a schema; key columns must be non-null.
    */
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    require(target.columns.sameElements(updates.columns),
      "merge requires identical schemas")
    val latest = Dedup.keepLast(updates, keys, order)
    val valueCols = target.columns.filterNot(keys.contains)
    val t = target.as("t")
    val u = latest.as("u")
    val joinCond = keys.map(k => col(s"t.$k") === col(s"u.$k")).reduce(_ && _)
    val joined = t.join(u, joinCond, "full_outer")
    // u-side presence detected via a key marker (keys are non-null), so a
    // matched update row wins even where its value columns are NULL.
    val uPresent = col(s"u.${keys.head}").isNotNull
    val picks = keys.map(k => coalesce(col(s"u.$k"), col(s"t.$k")).as(k)) ++
      valueCols.map(c => when(uPresent, col(s"u.$c")).otherwise(col(s"t.$c")).as(c))
    joined.select(picks: _*)
  }
}
