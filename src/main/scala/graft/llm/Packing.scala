package graft.llm


import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Sequence packing: lay the corpus out as one global token stream and
  * assign every document its start offset and training-sequence id —
  * the step between curation and tokenized-shard writing in a pretraining
  * pipeline (sequences of `budget` tokens are then filled left to right,
  * documents split at sequence boundaries downstream).
  *
  * Semantics (deterministic, engine-independent): documents are
  * concatenated in `idCol` order; `start_offset` is the exclusive running
  * sum of `n_tokens` before the document; `seq_id = start_offset /
  * budget` — the sequence in which the document STARTS. Equivalent to the
  * SQL window `SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED
  * PRECEDING AND 1 PRECEDING)`, which is the oracle.
  *
  * Scale shape — the point of this operator: a naive global window is a
  * SINGLE-PARTITION sort (`Window.orderBy` with no partition key pulls
  * the whole corpus through one task — the classic 100 TB deadend). This
  * runs the textbook distributed prefix-sum instead:
  *
  *  1. range-partition by `idCol` (global order across partition indexes,
  *     P-way parallel sort within), on the 2-column projection only;
  *  2. pass 1: per-partition token totals — P rows to the driver;
  *  3. exclusive prefix over those P totals on the driver (trivial);
  *  4. pass 2: scan-local running sum per partition + broadcast offset —
  *     `mapPartitions`, the genuinely-imperative per-partition case,
  *     no shuffle, no single-task stage.
  *
  * The projection is persisted between the passes: range boundaries come
  * from a sampling pass whose seed varies per execution, so pass 1 and
  * pass 2 MUST observe the same physical partitioning (on a cluster the
  * same holds — persist the projection or write it bucketed). Output is
  * partition-count independent (exact prefix sum), which the spec proves
  * by re-running under different partitionings.
  */
object Packing {

  /** `(doc_id, n_tokens, start_offset, seq_id)` for every document, in
    * whitespace tokens (the `tokenCounts` proxy; swap `tokenExpr` for a
    * real tokenizer count column when available).
    *
    * `resumeFrom` continues an existing stream at that token offset for
    * incremental corpus growth. PRECONDITION the engine cannot check
    * (the packed history isn't an input): every id in `df` must sort
    * AFTER every already-packed id. An overlapping batch produces
    * offsets appended past the stream instead of interleaved — callers
    * growing a corpus must partition batches by ascending id ranges
    * (e.g. monotonic ingest ids), which is what makes not re-reading
    * history possible at all.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Long, partitions: Int = 0, resumeFrom: Long = 0L): DataFrame =
    packSequencesBy(
      df.select(col(idCol),
        size(TextOps.tokens(col(textCol))).cast("long").as("__nt")),
      idCol, "__nt", budget, partitions, resumeFrom)

  /** [[packSequences]] over a PRECOMPUTED per-document token-count column
    * — the seam a real tokenizer plugs into: [[Bpe.tokenCounts]] feeds
    * learned-BPE counts through the identical prefix-sum machinery (same
    * semantics, same no-global-window scale shape).
    */
  def packSequencesBy(df: DataFrame, idCol: String, nTokensCol: String,
      budget: Long, partitions: Int = 0, resumeFrom: Long = 0L): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(resumeFrom >= 0, "resume offset must be non-negative")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val proj = df.select(
        col(idCol).cast("long").as("doc_id"),
        col(nTokensCol).cast("long").as("n_tokens"))
      .repartitionByRange(p, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    graft.CacheBin.register(proj)

    // Both passes run over the SAME cached partitions via
    // mapPartitionsWithIndex: the index is the PARENT partition's own
    // (bound in the Partition object), not the task's — a downstream
    // coalesce(1) wraps many parent partitions into one task, where
    // TaskContext.getPartitionId would return 0 for all of them and
    // silently zero every offset. RDD hop is deliberate: this is the
    // genuinely-imperative per-partition case, and the prefix offset is
    // positional state Catalyst has no vocabulary for.
    val rows = proj.rdd

    // pass 1: per-partition totals (P rows), exclusive prefix on driver
    val totals = rows.mapPartitionsWithIndex { (i, it) =>
      var t = 0L
      while (it.hasNext) t += it.next().getLong(1)
      Iterator((i, t))
    }.collect().toMap
    val nParts = rows.getNumPartitions
    val offsets = new Array[Long](nParts)
    // incremental growth: a new batch continues the stream where the
    // already-packed corpus ended (pass its total token count) — batch N+1
    // packs without re-reading batches 1..N, provided ids keep ascending
    var acc = resumeFrom
    var i = 0
    while (i < nParts) {
      offsets(i) = acc
      acc += totals.getOrElse(i, 0L)
      i += 1
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    // pass 2: scan-local running sum — same persisted partitions, so the
    // offsets line up with what pass 1 measured
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("start_offset", LongType, nullable = false),
      StructField("seq_id", LongType, nullable = false)))
    val packed = rows.mapPartitionsWithIndex { (pid, it) =>
      var run = bcOffsets.value(pid)
      it.map { r =>
        val id = r.getLong(0)
        val n = r.getLong(1)
        val start = run
        run += n
        Row(id, n, start, start / budget)
      }
    }
    spark.createDataFrame(packed, outSchema)
  }

  /** Write a packed corpus into `nShards` token-balanced shard
    * directories (`shard=<i>/`): sequences are budget-sized by
    * construction, so round-robin on `seq_id` balances token counts to
    * within one sequence per shard — no second pass, no token-count
    * bin-packing job. The repartition on the shard key means each shard
    * is written by one task as contiguous files (the same
    * one-dir-one-writer discipline as the day-partitioned sink:
    * partitionBy without it makes every task write every directory).
    */
  def writeShards(packed: DataFrame, out: String, nShards: Int): Unit = {
    require(nShards > 0, "shard count must be positive")
    packed
      .withColumn("shard", (col("seq_id") % nShards).cast("int"))
      .repartition(col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(out)
  }
}
