package graft

/** Commit-path profiler: `tools/run.sh graft.CommitProbe <sfDir>` times
  * each phase of the commit-log demo-table build (create, append, two
  * merges) and counts the Spark jobs each phase launches — the
  * measure-first evidence for write-path optimization (guide §1).
  */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-commitprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          starts.put(js.jobId, (System.nanoTime(),
            Option(js.properties.getProperty("callSite.short")).getOrElse("?")))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(je.jobId)).foreach { case (t0, cs) =>
            if (false) println(f"    job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.3f s  $cs")
          }
        }
      })
    // same warm-up discipline as Bench: JIT + table-format first-use paid
    // outside the measured phases
    Tables.events(spark, sfDir).write.format("noop").mode("overwrite").save()
    def phase[T](name: String)(body: => T): T = {
      Thread.sleep(50) // let listener events drain
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      Thread.sleep(50)
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  jobs=${jobs.get() - j0}")
      r
    }
    // SPARK_GRAFT_PROBE_PLAN=1: print the merge-join shape A/B (union of
    // null-keyed rows vs bypass) instead of timing commits — the
    // exchange-count evidence for the window/join shared shuffle
    if (sys.env.get("SPARK_GRAFT_PROBE_PLAN").contains("1")) {
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val m = col("event_id") % 4
      val anyNull = col("event_id").isNull
      val latestBypass = graft.operators.Dedup
        .keepLast(ev.filter(m === 1 || m === 2).filter(!anyNull),
          Seq("event_id"), Seq(col("event_id"))).persist()
      val latestUnion = latestBypass
        .unionByName(ev.filter(m === 1 || m === 2).filter(anyNull)).persist()
      val t = ev.filter(m < 2).withColumn("__t", lit(true)).as("t")
      def shape(name: String, u0: org.apache.spark.sql.DataFrame): Unit = {
        val u = u0.withColumn("__u", lit(true)).as("u")
        val j = t.join(u, col("t.event_id") === col("u.event_id"), "full_outer")
        val plan = j.queryExecution.executedPlan.toString
        println(s"== $name exchanges=${"Exchange".r.findAllIn(plan).length}")
        println(plan.linesIterator.filter(l =>
          l.contains("Exchange") || l.contains("Join") || l.contains("Window"))
          .mkString("\n"))
      }
      shape("union (old)", latestUnion)
      shape("bypass (new)", latestBypass)
      shape("bypass+localCheckpoint", graft.operators.Dedup
        .keepLast(ev.filter(m === 1 || m === 2).filter(!anyNull),
          Seq("event_id"), Seq(col("event_id"))).localCheckpoint())
      spark.stop(); return
    }
    for (rep <- 1 to 5) {
      println(s"--- rep $rep ---")
      val dir = java.nio.file.Files
        .createTempDirectory("graft-commitprobe").toString + "/t"
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .persist()
      phase("materialize input")(ev.write.format("noop").mode("overwrite").save())
      val m = col("event_id") % 4
      val t = phase("create")(
        graft.tables.CommitLogTable.create(spark, dir, ev.schema))
      phase("append v1")(t.append(ev.filter(m < 2)))
      phase("merge v2")(t.merge(ev.filter(m === 1 || m === 2)
        .withColumn("value", col("value") * 2), Seq("event_id"), Seq(col("event_id"))))
      phase("merge v3")(t.merge(ev.filter(m === 2 || m === 3)
        .withColumn("value", col("value") * 3), Seq("event_id"), Seq(col("event_id"))))
      ev.unpersist()
    }
    spark.stop()
  }
}
