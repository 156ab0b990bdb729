package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Bm25, MinHashDedup, Similarity}
import graft.tables.CommitLogTable

/** Persisted-index LIFECYCLE over the commit-log table format: the IVF
  * inverted lists, BM25 postings, and MinHash signature store are not
  * one-shot session artifacts — batches append atomically against the
  * stored structure, OPTIMIZE bin-packs the lists, and every maintained
  * index must be result-identical to a fresh build over the same corpus.
  * That parity is the contract `q_ivf_topk_maintained` /
  * `q_bm25_topk_maintained` carry to the DuckDB oracle (they share the
  * fresh path's SQL verbatim).
  */
class IndexLifecycleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // deterministic toy embedding corpus: 40 vectors in 4 dims
  private def embCorpus(): DataFrame =
    (0L until 40L).map { i =>
      (i, Array(
        math.sin(i * 1.7).toFloat, math.cos(i * 0.9).toFloat,
        ((i % 7) - 3).toFloat / 3f, math.sin(i * 0.31 + 1).toFloat))
    }.toDF("vec_id", "embedding")

  private def docCorpus(): DataFrame =
    (0L until 30L).map { i =>
      val words = (0 to (i % 9).toInt + 4).map(j => s"w${(i * 3 + j * 7) % 23}")
      (i, ("doc " + words.mkString(" ") + s" tail${i % 5}") * ((i % 3).toInt + 1))
    }.toDF("doc_id", "text")

  private def ranked(df: DataFrame): Seq[(Long, Long, Int)] =
    df.select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted

  test("maintained IVF index (append + append + compact) matches the fresh build") {
    val emb = embCorpus()
    val cents = emb.orderBy(col("vec_id")).limit(6)
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 3)

    // fresh one-shot directory index
    val freshDir = tmpDir("graft-ivf-fresh")
    Similarity.ivfIndexWrite(emb, "vec_id", "embedding", freshDir,
      centroids = Some(cents))
    val fresh = Similarity.ivfTopKFromIndex(queries, "vec_id", "embedding",
      freshDir, k = 5, nProbe = 2)

    // maintained commit-log index: two appends + compact
    val logDir = tmpDir("graft-ivf-log")
    Similarity.ivfLogAppend(spark, logDir,
      emb.filter(col("vec_id") < 25), "vec_id", "embedding", cents)
    Similarity.ivfLogAppend(spark, logDir,
      emb.filter(col("vec_id") >= 25), "vec_id", "embedding", cents)
    val table = CommitLogTable.open(spark, logDir)
    val filesBefore = table.fileCount()
    table.compact(targetFileBytes = 32L << 20)
    assert(table.fileCount() < filesBefore,
      "compact should bin-pack each inverted list's two per-batch files")
    val maintained = Similarity.ivfTopKFromLog(queries, "vec_id",
      "embedding", table, cents, k = 5, nProbe = 2)

    assert(ranked(maintained) == ranked(fresh))
    assert(table.history.select("action").as[String].collect().toSeq ==
      Seq("create", "append", "append", "compact"))
  }

  test("probed commit-log read prunes to the probe set on the manifest") {
    val emb = embCorpus()
    val cents = emb.orderBy(col("vec_id")).limit(6)
      .select(col("vec_id"), col("embedding"))
    val logDir = tmpDir("graft-ivf-prune")
    Similarity.ivfLogAppend(spark, logDir, emb, "vec_id", "embedding", cents)
    val table = CommitLogTable.open(spark, logDir)
    val all = table.read()
    val allParts = all.select("centroid_id").distinct().as[Long].collect().toSet
    assert(allParts.size >= 3, s"toy corpus should fill several lists: $allParts")
    val probe = allParts.take(2).map(String.valueOf)
    val pruned = table.readPartitions(probe)
    // the pruned frame's INPUT FILES are a strict subset: pruning happened
    // at plan construction (manifest metadata), not as a post-scan filter
    assert(pruned.inputFiles.toSet.subsetOf(all.inputFiles.toSet))
    assert(pruned.inputFiles.length < all.inputFiles.length)
    assert(pruned.select("centroid_id").distinct().as[Long].collect().toSet ==
      probe.map(_.toLong))
  }

  test("maintained BM25 postings index matches the in-memory scorer") {
    val docs = docCorpus()
    val fresh = Bm25.moreLikeThis(docs, "doc_id", "text", nQueries = 2,
      queryTerms = 4, k1 = 1.2, b = 0.75, topK = 5)

    val logDir = tmpDir("graft-bm25-log")
    Bm25.indexLogAppend(spark, logDir, docs.filter(col("doc_id") < 18),
      "doc_id", "text", nBuckets = 8)
    Bm25.indexLogAppend(spark, logDir, docs.filter(col("doc_id") >= 18),
      "doc_id", "text", nBuckets = 8)
    val table = CommitLogTable.open(spark, logDir)
    table.compact(targetFileBytes = 32L << 20)
    val maintained = Bm25.topKFromLog(docs, "doc_id", "text", table,
      nBuckets = 8, nQueries = 2, queryTerms = 4, k1 = 1.2, b = 0.75,
      topK = 5)

    val key = (df: DataFrame) => df
      .select("query_id", "doc_id", "n_terms", "score", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4))).toSeq.sortBy(t => (t._1, t._5))
    assert(key(maintained) == key(fresh))
  }

  test("BM25 corpus-stat rows ride the batch commit and sum additively") {
    val docs = docCorpus()
    val logDir = tmpDir("graft-bm25-stats")
    Bm25.indexLogAppend(spark, logDir, docs.filter(col("doc_id") < 10),
      "doc_id", "text", nBuckets = 8)
    val table = CommitLogTable.open(spark, logDir)
    // one stat row per committed batch, in the reserved bucket
    val stats1 = table.readPartitions(Set(Bm25.StatsBucket.toString))
    assert(stats1.count() == 1L)
    Bm25.indexLogAppend(spark, logDir, docs.filter(col("doc_id") >= 10),
      "doc_id", "text", nBuckets = 8)
    val stats2 = table.readPartitions(Set(Bm25.StatsBucket.toString))
    assert(stats2.count() == 2L)
    val n = stats2.agg(sum(col("doc_id"))).as[Long].head()
    assert(n == docs.count(),
      "summed per-batch doc counts must equal the corpus size")
  }

  test("minhash signature store serves incrementalNewKeep identically to the one-pass form") {
    val base = (0L until 12L).map(i =>
      (i, s"the quick brown fox number $i jumps over the lazy dog " * 3))
    val batch = Seq(
      (100L, base(3)._2),                         // dup of stored doc 3
      (101L, "an entirely novel document about commit logs and parquet"),
      (102L, base(7)._2.replace("number 7", "number 7!"))) // near-dup of 7
    val all = (base ++ batch).toDF("doc_id", "text")

    val storeDir = tmpDir("graft-sigstore")
    // the store accretes batch-by-batch, like the daily cycle
    MinHashDedup.signatureStoreAppend(spark, storeDir,
      all.filter(col("doc_id") < 6), "doc_id", "text", k = 5)
    MinHashDedup.signatureStoreAppend(spark, storeDir,
      all.filter(col("doc_id") >= 6 && col("doc_id") < 100), "doc_id",
      "text", k = 5)
    val store = CommitLogTable.open(spark, storeDir)
    assert(store.read().count() == 12L)

    val viaStore = MinHashDedup.incrementalNewKeep(all, "doc_id", "text",
      k = 5, bucketCap = 50, isNew = col("doc_id") >= 100,
      threshold = 0.8, storedSigs = Some(store.read()))
    val onePass = MinHashDedup.incrementalNewKeep(all, "doc_id", "text",
      k = 5, bucketCap = 50, isNew = col("doc_id") >= 100, threshold = 0.8)
    val key = (df: DataFrame) => df.collect()
      .map(_.toSeq).toSeq.sortBy(_.toString)
    assert(key(viaStore) == key(onePass))

    // close the cycle: append the kept batch docs for the next run
    val keptIds = viaStore.filter(col("keep")).select("doc_id").as[Long]
      .collect().toSet
    MinHashDedup.signatureStoreAppend(spark, storeDir,
      all.filter(col("doc_id").isin(keptIds.toSeq: _*)), "doc_id", "text",
      k = 5)
    assert(store.read().count() == 12L + keptIds.size)
  }
}
