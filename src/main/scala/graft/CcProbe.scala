package graft

import org.apache.spark.sql.functions._

import graft.llm.MinHashDedup

/** Connected-components path parity at scale: run the dedup clustering's
  * DISTRIBUTED label-propagation fallback (the billions-of-pairs regime
  * where the edge list cannot be collected) against the same verified
  * pair table as the driver union-find fast path, and require identical
  * cluster maps — plus record how many checkpointed rounds the
  * distributed path needed (pointer jumping should keep it at
  * O(log diameter), a handful even on 100× corpora).
  *
  * Usage: tools/run.sh graft.CcProbe [dir=/tmp/scale10x]
  * Prints one JSON line.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/scale10x")
    val spark = Sessions.build("local[32]", 32, "graft-cc-probe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    val pairs = MinHashDedup.verifiedPairsShared(docs,
        corpusKey = s"$dir/documents", "doc_id", "text", k = 16,
        bucketCap = 50)
      .filter(col("jaccard") >= 0.5)
      .persist()
    val nPairs = pairs.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // driver union-find (the exact fast path below the pair threshold)
    val (uf, ufSec) = timed {
      MinHashDedup.connectedComponents(docs, "doc_id", pairs,
        maxDriverPairs = Long.MaxValue).persist()
        .tap(_.count())
    }
    // distributed label propagation, forced (maxDriverPairs = 0)
    val (lp, lpSec) = timed {
      MinHashDedup.connectedComponents(docs, "doc_id", pairs,
        maxDriverPairs = 0L).persist()
        .tap(_.count())
    }
    val rounds = MinHashDedup.lastCcRounds
    val mismatch = uf.exceptAll(lp).count() + lp.exceptAll(uf).count()
    val clusters = uf.select(countDistinct(col("cluster_id"))).head().getLong(0)
    val docsN = uf.count()
    println(s"""{"probe":"cc_parity","dir":"$dir","n_pairs":$nPairs,""" +
      s""""docs":$docsN,"clusters":$clusters,"uf_sec":${f(ufSec)},""" +
      s""""lp_sec":${f(lpSec)},"lp_rounds":$rounds,"mismatch":$mismatch}""")
    spark.stop()
    if (mismatch != 0) sys.exit(1)
  }

  private def f(d: Double): Double = math.rint(d * 100) / 100

  private implicit class Tap[T](private val t: T) extends AnyVal {
    def tap(f: T => Unit): T = { f(t); t }
  }
}
