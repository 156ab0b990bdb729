package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations with violation counts + quarantine.
  *
  * Models the reference's two DQ surfaces:
  *   - Great Expectations suite (`validation/expectations_prices.json:1-43`):
  *     columns exist + not-null, `volume >= 0`, `close >= 0`;
  *   - DLT `expect_or_drop` (`docs/databricks_setup.md:273-274`): drop rows
  *     violating `volume >= 0` / `symbol IS NOT NULL`, keep drop counts.
  *
  * Each rule is a predicate that must hold; the audit is ONE aggregate pass
  * producing all violation counts (conditional-sum per rule → map-side
  * partial aggregation, a single scan at any scale). Quarantine is the
  * complementary filter — both share the scan when cached or are two
  * pushed-down scans otherwise.
  */
object Expectations {

  /** A named expectation: `holds` must be true for a row to pass. */
  final case class Expectation(name: String, holds: Column)

  /** One-row audit: total row count + one violation count per rule. */
  def audit(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val counts = rules.map { r =>
      sum(when(!coalesce(r.holds, lit(false)), 1L).otherwise(0L)).as(s"n_viol_${r.name}")
    }
    df.agg(count(lit(1)).as("n_total"), counts: _*)
  }

  /** Rows failing ANY rule, tagged with the first failing rule's name
    * (quarantine branch — reference `README.md:38` names the pattern).
    */
  def quarantine(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val failsAny = rules.map(r => !coalesce(r.holds, lit(false))).reduce(_ || _)
    val reason = rules.foldRight(lit(null).cast("string")) { (r, acc) =>
      when(!coalesce(r.holds, lit(false)), lit(r.name)).otherwise(acc)
    }
    df.filter(failsAny).withColumn("dq_reason", reason)
  }

  /** Keep only passing rows (DLT `expect_or_drop` semantics). */
  def enforce(df: DataFrame, rules: Seq[Expectation]): DataFrame =
    df.filter(rules.map(r => coalesce(r.holds, lit(false))).reduce(_ && _))
}
