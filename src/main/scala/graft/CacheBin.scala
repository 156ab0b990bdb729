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
  * Contract: operators `register` what they leave cached; entry points
  * call `drain()` after materializing each query. Unpersisting an
  * already-unpersisted frame is a no-op, so operators that release early
  * (when they know the consumer is done) stay correct.
  */
object CacheBin {
  private val bin = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  def register[T <: Dataset[_]](df: T): T = { bin.add(df); df }

  /** Unpersist (non-blocking) everything registered since the last drain. */
  def drain(): Unit = {
    var df = bin.poll()
    while (df != null) { df.unpersist(false); df = bin.poll() }
  }
}
