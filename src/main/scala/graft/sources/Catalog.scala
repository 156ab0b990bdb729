package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** K5 catalog DDL: register a parquet location as a named table and read it
  * back through the catalog — the open-source shape of the reference's
  * `CREATE TABLE ... USING ... LOCATION` + `spark.table` round-trip
  * (`databricks/bronze_prices_auto_loader.ipynb:141-171`, cell 4).
  *
  * External tables only (LOCATION-backed): dropping the table never deletes
  * data, matching the reference's external-table discipline. Registration is
  * what gives downstream SQL (`spark.sql("SELECT ... FROM bronze_prices")`)
  * and the catalog's schema cache a stable name at scale.
  */
object Catalog {

  /** Register (idempotently) and return the table. */
  def registerParquet(spark: SparkSession, name: String, location: String): DataFrame = {
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS `$name` USING parquet LOCATION '$location'")
    spark.table(name)
  }

  /** Drop the registration (external: data stays at the location). */
  def deregister(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
}
