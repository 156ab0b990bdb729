package graft
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // same factory as Bench — A/B numbers must come from the same confs
    // (AQE, planStats, partitioning), or profiling chases config ghosts
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-bench-one")
    spark.sparkContext.setLogLevel("WARN")
    // warm-up mirrors Bench: a count() reads parquet footers only, so
    // rep1 would still pay the cold COLUMN scan (and the split-mirror
    // build) — materialize all four fact tables through the noop sink so
    // the timed reps compare plans, not first-touch IO
    Tables.lineitem(spark, sfDir).write.format("noop").mode("overwrite").save()
    Tables.events(spark, sfDir).write.format("noop").mode("overwrite").save()
    Tables.documents(spark, sfDir).write.format("noop").mode("overwrite").save()
    Tables.embeddings(spark, sfDir).write.format("noop").mode("overwrite").save()
    for (name <- args; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      // noop sink, same materialization as Bench.timeQuery (count() lets
      // the optimizer skip count-independent subtrees)
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"$name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // per-query lifecycle mirrors Bench/Verify; DRAIN_ALL=1 also clears
      // session-pinned memos so later reps re-run shared pipelines warm-JVM
      if (sys.env.get("SPARK_GRAFT_DRAIN_ALL").contains("1")) CacheBin.drainAll()
      else CacheBin.drain()
    }
    spark.stop()
  }
}
