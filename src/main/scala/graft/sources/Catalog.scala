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

  /** Register (idempotently) and return the table. Identifiers and the
    * location are escaped before interpolation (a quote in a path must
    * not break the DDL), and an already-registered name must point at the
    * SAME location — `IF NOT EXISTS` silently returning a table backed by
    * different data is the failure mode this guards.
    */
  def registerParquet(spark: SparkSession, name: String, location: String): DataFrame = {
    val safeName = name.replace("`", "``")
    if (spark.catalog.tableExists(name)) {
      val existing = spark.sql(s"DESCRIBE FORMATTED `$safeName`")
        .filter(org.apache.spark.sql.functions.col("col_name") === "Location")
        .head().getString(1)
      val conf = spark.sessionState.newHadoopConf()
      def qualified(l: String): String = {
        val p = new org.apache.hadoop.fs.Path(l)
        p.getFileSystem(conf).makeQualified(p).toString
      }
      if (qualified(existing) != qualified(location))
        throw new IllegalStateException(
          s"table `$name` is already registered at '$existing', not '$location' — " +
            "deregister it first or pick another name")
    } else {
      spark.sql(s"CREATE TABLE IF NOT EXISTS `$safeName` USING parquet " +
        s"LOCATION '${location.replace("'", "''")}'")
      // record row/size statistics at registration: one metadata pass here
      // means sizing decisions downstream (IVF centroid counts, join
      // strategy) read the catalog instead of re-scanning per query —
      // with `spark.sql.cbo.planStats.enabled` the counts flow into
      // logical-plan stats automatically
      analyze(spark, name)
    }
    spark.table(name)
  }

  /** Recompute table statistics (call after appending to the location —
    * external-table stats don't refresh themselves).
    */
  def analyze(spark: SparkSession, name: String): Unit =
    spark.sql(s"ANALYZE TABLE `${name.replace("`", "``")}` COMPUTE STATISTICS")

  /** Catalog row count, if statistics have been computed. */
  def rowCount(spark: SparkSession, name: String): Option[Long] =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
      .stats.flatMap(_.rowCount).map(_.toLong)

  /** Drop the registration (external: data stays at the location). */
  def deregister(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
}
