package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under the scale-factor dir. Reads are plain
  * `spark.read.parquet` so Catalyst gets full projection/predicate pushdown
  * into the vectorized parquet reader — at cluster scale these would be
  * partitioned directories and the same call sites pick up partition pruning
  * for free.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's µs TimestampType
    * rejects outright. Read nanos as long (legacy conf, set per-session at
    * call time so it works under any driver-provided session) and convert —
    * the generator emits whole-µs values, so the division is lossless.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private val countCache = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Memoized table row count — one zero-column parquet count per (dir,
    * table) per session instead of one full pass per query that needs a
    * size (IVF centroid sizing runs off this). On a real deployment this
    * is the catalog's row-count statistic; the memoized count is the
    * stand-in for path-addressed tables without a catalog entry.
    */
  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    countCache.getOrElseUpdate(s"$dir/$name", load(spark, dir, name).count())
}
