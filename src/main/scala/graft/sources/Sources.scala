package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch sources mirroring the reference's inputs.
  *
  * - S3 ticker CSV (`ingest_fmp_prices.py:443-470`, duplicated at
  *   `fmp_dump_raw.py:559-579`): a one-column symbol list; read as text,
  *   trim + uppercase, drop header tokens (`symbol`/`ticker`) and blanks.
  * - S5 NDJSON(.gz) with schema-evolution rescue: OSS Spark has no
  *   `_rescued_data`, so it's emulated (SURVEY.md §2.10): malformed lines
  *   land intact, and undeclared extra fields on valid rows are captured
  *   as JSON — both in `_rescued_data` ([[RescueJson]]).
  * - O6 vertical concat: `unionByName` fold over per-batch frames.
  */
object Sources {

  /** Ticker list: uppercased symbols, header tokens and empty lines dropped. */
  def tickerCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(upper(trim(col("value"))).as("symbol"))
      .filter(col("symbol") =!= "" && !lower(col("symbol")).isin("symbol", "ticker"))

  /** NDJSON (optionally gzipped — Spark decompresses by extension) with a
    * declared schema plus `_rescued_data`: malformed lines land whole,
    * and undeclared extra fields on VALID rows are captured as a JSON
    * object (Auto Loader rescue semantics — see [[RescueJson]]). Read as
    * text so the raw line survives for the extras pass; blank lines are
    * dropped to match the JSON reader.
    */
  def ndjsonWithRescue(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val raw = spark.read
      .option("recursiveFileLookup", "true") // nested date dirs, like the stream
      .text(path)
      .filter(trim(col("value")) =!= "")
    raw.select(RescueJson.rescueProjection(col("value"), schema): _*)
  }

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
