package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.documents(spark, sfDir).count(); Tables.embeddings(spark, sfDir).count()
    for (name <- args; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // per-query lifecycle mirrors Bench/Verify; DRAIN_ALL=1 also clears
      // session-pinned memos so later reps re-run shared pipelines warm-JVM
      if (sys.env.get("SPARK_GRAFT_DRAIN_ALL").contains("1")) CacheBin.drainAll()
      else CacheBin.drain()
    }
    spark.stop()
  }
}
