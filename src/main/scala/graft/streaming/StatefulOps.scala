package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful Structured Streaming operators over the event stream — the
  * streaming counterparts of the batch monitoring aggregates (reference
  * daily-ingest DQ counts, `docs/databricks_setup.md:246-341` family),
  * built the idiomatic way: watermark + windowed agg for totals,
  * `flatMapGroupsWithState` for custom per-key state.
  *
  * Scale notes: both shapes shuffle once on the grouping key and keep
  * bounded state — the watermark expires window/session state, so a
  * 100 TB/day stream holds only the open-window working set per key, and
  * `OutputMode.Append` emits each finalized result exactly once.
  */
object StatefulOps {

  /** Watermarked tumbling-window counts: rows per (window × key-free)
    * bucket, emitted (append) once the watermark passes the window end —
    * late rows beyond `watermarkDelay` are dropped, finalized windows are
    * never restated.
    */
  def windowedCounts(stream: DataFrame, tsCol: String,
      windowDuration: String, watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n"))

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(startMs: Long, lastMs: Long, n: Long)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Gap-based sessionization: consecutive events of a user belong to one
    * session while separated by < `gapMinutes`; a session is emitted once
    * the event-time watermark passes `last_event + gap` (EventTimeTimeout),
    * so output is append-only and state is self-expiring.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int): Dataset[Session] = {
    val gapMs = gapMinutes * 60000L
    val typed = events
      .select(col(userCol).cast("long").as("user_id"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", s"$gapMinutes minutes")
      .as(Encoders.product[SessionEvent])
    typed
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.lastMs), s.n))
          } else {
            val ts = rows.map(_.ts.getTime).toArray.sorted
            var closed = List.empty[Session]
            var s = state.getOption.getOrElse(SessionState(ts.head, ts.head, 0L))
            ts.foreach { t =>
              if (t - s.lastMs >= gapMs) {
                // gap inside the batch: close the running session in-line
                closed ::= Session(user, new java.sql.Timestamp(s.startMs),
                  new java.sql.Timestamp(s.lastMs), s.n)
                s = SessionState(t, t, 1L)
              } else {
                s = SessionState(math.min(s.startMs, t), math.max(s.lastMs, t), s.n + 1)
              }
            }
            state.update(s)
            state.setTimeoutTimestamp(s.lastMs + gapMs)
            closed.reverseIterator
          }
        })(Encoders.product[SessionState], Encoders.product[Session])
  }
}
