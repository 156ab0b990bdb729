package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Batch sources mirroring the reference's inputs.
  *
  * - S3 ticker CSV (`ingest_fmp_prices.py:443-470`, duplicated at
  *   `fmp_dump_raw.py:559-579`): a one-column symbol list; read as text,
  *   trim + uppercase, drop header tokens (`symbol`/`ticker`) and blanks.
  * - S5 NDJSON(.gz) with schema-evolution rescue: OSS Spark has no
  *   `_rescued_data`, so the permissive-mode corrupt-record column is the
  *   documented emulation (SURVEY.md §2.10) — malformed lines land intact
  *   in `_rescued_data` instead of being dropped.
  * - O6 vertical concat: `unionByName` fold over per-batch frames.
  */
object Sources {

  /** Ticker list: uppercased symbols, header tokens and empty lines dropped. */
  def tickerCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(upper(trim(col("value"))).as("symbol"))
      .filter(col("symbol") =!= "" && !lower(col("symbol")).isin("symbol", "ticker"))

  /** NDJSON (optionally gzipped — Spark decompresses by extension) with a
    * declared schema plus rescue column for rows that don't parse.
    */
  def ndjsonWithRescue(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(StructField("_rescued_data", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_rescued_data")
      .option("recursiveFileLookup", "true") // nested date dirs, like the stream
      .json(path)

  /** Vertical concat of same-schema frames (reference `pl.concat` O6). */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_))

  /** S7 lineage column: source file path per row
    * (reference `bronze_fundamentals_auto_loader.ipynb:107` —
    * `_metadata.file_path` → `_input_file`). Must be applied directly on a
    * file-sourced frame.
    */
  def withInputFile(df: DataFrame): DataFrame =
    df.withColumn("_input_file", col("_metadata.file_path"))
}
