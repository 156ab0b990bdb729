package graft

import org.apache.spark.sql.Dataset

/** Session-scoped registry for frames an operator must leave persisted
  * because its RETURNED plan reads them (e.g. [[graft.llm.MinHashDedup
  * .verifiedPairs]]'s candidate-bounded result, connected-components'
  * final label checkpoint). The operator can't unpersist those itself —
  * the caller hasn't materialized the plan yet — but somebody must, or a
  * multi-query session (Bench/Verify run 40+ queries back to back)
  * accumulates leaked blocks and every query pays the memory pressure of
  * all its predecessors.
  *
  * Two tiers:
  *   - per-query (`register`): released by `drain()` after each query —
  *     the default for anything one query's plan reads;
  *   - session (`pin`): survives per-query drains — for results SHARED
  *     across queries in a suite (e.g. the memoized MinHash verified-pairs
  *     table both `q_minhash_pairs` and `q_dedup_clusters` read; at 100 TB
  *     the same principle is "materialize pairs once, read twice").
  *     Released by `drainAll()` at suite end, which also runs any
  *     registered invalidation hooks so memo tables don't hand out frames
  *     whose cache was just dropped.
  *
  * Contract: operators `register`/`pin` what they leave cached; entry
  * points call `drain()` after materializing each query and `drainAll()`
  * once at suite end. Unpersisting an already-unpersisted frame is a
  * no-op, so operators that release early (when they know the consumer is
  * done) stay correct.
  */
object CacheBin {
  private val bin = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()
  private val pinnedBin = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()
  private val invalidationHooks = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  def register[T <: Dataset[_]](df: T): T = { bin.add(df); df }

  /** Session-tier registration: survives `drain()`, released by `drainAll()`. */
  def pin[T <: Dataset[_]](df: T): T = { pinnedBin.add(df); df }

  private val pinnedCheckpoints =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  /** Session-tier registration of a LOCALLY-CHECKPOINTED frame: the
    * checkpoint's backing RDD blocks are what hold the rows (a plain
    * `Dataset.unpersist` would not touch them), so `drainAll()` releases
    * the RDDs directly.
    */
  def pinCheckpoint[T <: Dataset[_]](df: T): T = {
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(pinnedCheckpoints.add)
    df
  }

  /** Run `hook` on `drainAll()` — memo owners use this to clear entries
    * whose cached frames are about to be unpersisted.
    */
  def onDrainAll(hook: () => Unit): Unit = invalidationHooks.add(hook)

  /** Unpersist (non-blocking) everything registered since the last drain.
    * Pinned frames are untouched.
    */
  def drain(): Unit = {
    var df = bin.poll()
    while (df != null) { df.unpersist(false); df = bin.poll() }
  }

  /** Suite-end release: per-query tier, then pinned tier, then
    * invalidation hooks (memo clears).
    */
  def drainAll(): Unit = {
    drain()
    var df = pinnedBin.poll()
    while (df != null) { df.unpersist(false); df = pinnedBin.poll() }
    var rdd = pinnedCheckpoints.poll()
    while (rdd != null) { rdd.unpersist(false); rdd = pinnedCheckpoints.poll() }
    invalidationHooks.forEach(h => h())
  }
}

/** Generic session memo over [[CacheBin]]'s pinned tier: build a frame
  * once per (session, key), persist + pin it, and hand the SAME frame to
  * every later consumer until `drainAll()` clears cache and memo together
  * — the reusable form of the MinHash pair-table memo. At 100 TB the
  * decision it encodes is "materialize this intermediate once, read it N
  * times" instead of recomputing a corpus pass per consumer. Keyed on the
  * session REFERENCE (hashes collide and outlive stopped sessions).
  */
object SessionMemo {
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), org.apache.spark.sql.DataFrame]
  private val ran = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), Unit]
  private val buildSec = scala.collection.concurrent.TrieMap.empty[String, Double]
  CacheBin.onDrainAll(() => { memo.clear(); ran.clear() })

  /** Wall seconds spent BUILDING each memoized frame (plan construction +
    * cache materialization), keyed by memo key. Survives drainAll() —
    * it's run-level diagnostics, not cache state. Bench emits it as
    * `memo_sec` so a shared pipeline's cost stops reading as a regression
    * of whichever consumer ran first alphabetically.
    *
    * ADDITIVE decomposition: a memo build that triggers nested memo
    * builds (the curate-v3/v4 pattern) records only its SELF time — each
    * nested build's wall time is subtracted from every enclosing build
    * and billed to the nested key alone. sum(buildSeconds) therefore
    * never double-bills and stays ≤ the run's total wall time.
    */
  def buildSeconds: Map[String, Double] = buildSec.toMap

  // Per-thread stack of child-time accumulators: builds run under this
  // object's locks, so nesting is always same-thread.
  private val nesting = new ThreadLocal[List[Array[Double]]] {
    override def initialValue: List[Array[Double]] = Nil
  }

  /** Time `body` into `buildSeconds(key)` as SELF time (total minus any
    * nested timed builds), while billing the full elapsed time upward to
    * the enclosing build's child accumulator.
    */
  private def timedSelf[T](key: String)(body: => T): T = {
    val childAcc = Array(0.0)
    nesting.set(childAcc :: nesting.get())
    val t0 = System.nanoTime()
    try body finally {
      val elapsed = (System.nanoTime() - t0) / 1e9
      nesting.set(nesting.get().tail)
      nesting.get() match {
        case parentAcc :: _ => parentAcc(0) += elapsed
        case Nil => ()
      }
      buildSec.update(key, elapsed - childAcc(0))
    }
  }

  /** Run `action` once per (session, key) — for idempotent side effects a
    * query amortizes across a session (e.g. a materialized-index write).
    * Re-running after `drainAll()` must be safe (actions overwrite).
    * Synchronized: TrieMap.getOrElseUpdate may evaluate a losing racer's
    * thunk and discard only the VALUE — a side effect would still run
    * twice, concurrently, into the same target.
    */
  def once(spark: org.apache.spark.sql.SparkSession, key: String)(
      action: => Unit): Unit = ran.synchronized {
    if (!ran.contains((spark, key))) {
      timedSelf(key)(action)
      ran.update((spark, key), ())
    }
  }

  /** Time a non-DataFrame model build (BPE merge table, codebooks) into
    * `buildSeconds` under `key` — same cost-attribution channel as the
    * frame memos, for driver-side model state that isn't a cacheable
    * plan. The caller owns the memoization; this only makes the one real
    * build measurable instead of smeared into its first consumer.
    */
  def timed[T](key: String)(build: => T): T = timedSelf(key)(build)

  def cached(spark: org.apache.spark.sql.SparkSession, key: String)(
      build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    // same race note as `once`: a losing racer's build would leak its
    // persist; the lock makes build-once actually once (reentrant, so a
    // builder composing other memoized stages stays safe)
    memo.synchronized {
      memo.getOrElseUpdate((spark, key), timedSelf(key) {
        val df = build
        // LINEAGE-TRUNCATED materialization: an eager localCheckpoint
        // both fills the memo's storage NOW (so the build cost is
        // attributable to the memo rather than smeared into whichever
        // consumer acts first) and replaces the build's — often
        // enormous — logical plan with a leaf. Under the old
        // persist+noop form every consumer re-ANALYZED the full build
        // lineage per query (measured 0.3-0.6 s of driver time per
        // construction on the pair/IVF/BM25 consumers at sf0.1); the
        // cache manager only substitutes the cached subtree after that
        // analysis pass. A builder's internal persists stay registered
        // with their own CacheBin tier and drain as before — the
        // checkpoint holds the rows from then on; its blocks release
        // at drainAll() like every pinned frame.
        val ck = df.localCheckpoint()
        // a builder that persisted its RESULT frame (relying on the old
        // pin-until-drainAll contract) is done with that cache the
        // moment the checkpoint is materialized — release it now, or
        // nothing ever would (builder-INTERNAL persists register with
        // CacheBin themselves and drain as before; double-unpersist is
        // a no-op)
        if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
          df.unpersist(false)
        CacheBin.pinCheckpoint(ck)
      })
    }
}
