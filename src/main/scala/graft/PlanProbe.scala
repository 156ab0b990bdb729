package graft

/** Phase profiler: `tools/run.sh graft.PlanProbe <sfDir> <query ...>`
  * times, for three repetitions of each named query, (a) DataFrame
  * construction, (b) analysis+optimization+physical planning
  * (`executedPlan` forced), and (c) execution through the noop sink —
  * separating driver-side planning cost from cluster-side run cost.
  * Guide §1 (measure first) / §3.3 (planning time on giant plans).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-planprobe")
    spark.sparkContext.setLogLevel("ERROR")
    Tables.lineitem(spark, sfDir).write.format("noop").mode("overwrite").save()
    Tables.events(spark, sfDir).write.format("noop").mode("overwrite").save()
    Tables.documents(spark, sfDir).write.format("noop").mode("overwrite").save()
    Tables.embeddings(spark, sfDir).write.format("noop").mode("overwrite").save()
    for (name <- names; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      val qe = df.queryExecution
      qe.executedPlan // force analysis + optimization + physical planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"$name rep$rep construct=${(t1 - t0) / 1e9}%.3f " +
        f"plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f " +
        f"total=${(t3 - t0) / 1e9}%.3f")
      CacheBin.drain()
    }
    spark.stop()
  }
}
