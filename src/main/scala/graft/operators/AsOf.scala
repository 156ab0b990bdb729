package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each fact row, the most recent dimension
  * value with `dimTime <= factTime` for the same key.
  *
  * The reference implies this for its Gold layer: prices × statements must
  * join each price bar to the latest statement filed on-or-before the bar's
  * date (SURVEY.md §2.4 J2; reference `README.md:110` declares the layer,
  * `docs/databricks_setup.md:15` the join direction). Spark has no built-in
  * as-of join, so this composes built-ins:
  *
  *   union(facts, dim) → window(partitionBy key, orderBy time with dim rows
  *   first at equal timestamps) → last(dimValue, ignoreNulls) over an
  *   unbounded-preceding frame → keep fact rows.
  *
  * Scale: ONE shuffle (hash-partition on key) + one in-partition sort —
  * identical movement to a sort-merge join, no row explosion, no driver
  * collection. A key × time-range skew would be handled upstream by range
  * bucketing the time axis; per-symbol daily series fit comfortably.
  */
object AsOf {

  /** Left as-of join. `facts` keeps all its columns plus `outCol` holding the
    * latest `dimValueCol` from `dim` at `dimTime <= factTime` (inclusive),
    * NULL when no dim row precedes. `dim` must be unique per (key, time) —
    * pre-dedup with [[Dedup.keepLast]] otherwise.
    */
  def joinLastValue(
      facts: DataFrame,
      dim: DataFrame,
      keyCol: String,
      timeCol: String,
      dimValueCol: String,
      outCol: String): DataFrame = {
    val factCols = facts.columns.toSeq
    val dimValueType = dim.schema(dimValueCol).dataType
    val f = facts
      .withColumn("__dim_val", lit(null).cast(dimValueType))
      .withColumn("__is_fact", lit(1))
    val d0 = dim.select(col(keyCol), col(timeCol), col(dimValueCol).as("__dim_val"))
    // align to the fact schema: fact-only columns are NULL on dim rows
    val d = factCols.foldLeft(d0) { (acc, c) =>
      if (acc.columns.contains(c)) acc
      else acc.withColumn(c, lit(null).cast(facts.schema(c).dataType))
    }.withColumn("__is_fact", lit(0))
      .select((factCols :+ "__dim_val" :+ "__is_fact").map(col): _*)

    // dim rows sort before fact rows at equal time → inclusive (<=) semantics
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__is_fact"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    f.unionByName(d)
      .withColumn(outCol, last(col("__dim_val"), ignoreNulls = true).over(w))
      .filter(col("__is_fact") === 1)
      .select((factCols :+ outCol).map(col): _*)
  }
}
