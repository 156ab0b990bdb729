package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Second-JVM writer for the cross-process commit-arbitration spec: a
  * SEPARATE process (own SparkSession, own CommitLogTable instance, no
  * shared memory) appending `n` single-row batches to the table at
  * `dir`. Publish races against the spec's in-process writer arbitrate
  * purely through the filesystem's atomic hard-link create — the
  * multi-writer story a real deployment (two jobs writing one table)
  * depends on. Prints `DONE <versions>` on success.
  */
object CommitRaceAppender {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val tag = args(2)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-commit-race-appender")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val t = graft.tables.CommitLogTable.open(spark, dir)
      val versions = (1 to n).map { i =>
        t.append(spark.range(1).select(
          lit(s"$tag-$i").as("k"), lit(tag).as("cat"), lit(i * 1.0).as("v")))
      }
      // every append must have claimed a DISTINCT version in this process
      require(versions.distinct.size == n, s"duplicate versions: $versions")
      println(s"DONE ${versions.mkString(",")}")
    } finally spark.stop()
  }
}
