package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * The reference dedupes three ways:
  *   - keyed keep-last (`ingest_fmp_prices.py:273`, polars
  *     `unique(keep="last")`) — order-dependent, so here it is the explicit
  *     `ROW_NUMBER() ... ORDER BY <arrival> DESC` pattern of its Silver MERGE
  *     spec (`docs/databricks_setup.md:183-187`), which is deterministic on a
  *     cluster where input order is not;
  *   - multi-key `dropDuplicates` (`docs/ingestion_quickstart.md:333`);
  *   - duplicate *detection* by hash (`bronze_fundamentals_auto_loader.ipynb`
  *     cell 3, `groupBy(hash).count().filter(_ > 1)`).
  *
  * Scale notes: keep-last is one hash-partition shuffle on the key columns +
  * an in-partition sort (no global sort); the window rank never materializes
  * more than one partition's rows per task. Duplicate detection is a partial
  * (map-side) count then a final agg — skewed hash keys are impossible since
  * the key *is* a hash.
  */
object Dedup {

  /** Latest-wins dedup: one row per `keys`, the first under `order`.
    * `order` must be a total order (include a unique tiebreaker column) or
    * the result is nondeterministic — same caveat as the reference's
    * `ROW_NUMBER` spec.
    */
  def keepLast(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Multi-key dedup where any representative row is acceptable
    * (reference O5). Spark's `dropDuplicates` keeps an arbitrary row; callers
    * needing determinism must use [[keepLast]].
    */
  def dropDupKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Duplicate detector: groups of `keyCols` appearing more than once. */
  def duplicateGroups(df: DataFrame, groupExpr: Column, as: String): DataFrame =
    df.groupBy(groupExpr.as(as))
      .agg(count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)
}
