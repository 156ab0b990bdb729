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

  /** Ingest-time curation gate as a STREAMING transform: Gopher rule
    * conjunction → PII scrub (survivors only) → deterministic split
    * label. Every signal is a pure per-row projection
    * ([[graft.llm.TextOps.gopherKeep]]/`scrubPii`/`splitLabel`), so the
    * same expression tree runs unchanged on a file stream with
    * exactly-once append semantics — the scan-local HALF of curation
    * applied as documents land; the corpus-wide gates (LM score, near-dup
    * survivorship, decontamination) run as the batch sweep over the
    * landed corpus (Queries.curateV2), which is how a 100 TB pipeline
    * splits the work: per-document filters at ingest, corpus passes on
    * the lake.
    */
  def curationGate(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Long, maxTokens: Long,
      minAvgTokLen: Double, maxAvgTokLen: Double,
      maxRepeatRatio: Double, minDistinctStop: Int,
      splitSalt: String, pctTrain: Int): DataFrame = {
    import graft.llm.TextOps
    TextOps.scrubPii(
        docs.filter(TextOps.gopherKeep(col(textCol), minTokens, maxTokens,
          minAvgTokLen, maxAvgTokLen, maxRepeatRatio, minDistinctStop)),
        idCol, textCol)
      .select(col(idCol), col("clean"),
        TextOps.splitLabel(col(idCol), splitSalt, pctTrain).as("split"))
  }

  /** [[curationGate]] extended with ingest-time eval-set hygiene — the
    * streaming face of [[graft.llm.BloomDecon.decontaminateBloom]]: the
    * benchmark's Bloom filter rides into every task as BROADCAST STATE
    * (a literal in the plan — Spark ships it with the serialized
    * expression tree exactly like the optimizer's injected runtime
    * filters), and each arriving document is gated per row:
    *
    *  1. the codegen'd `might_contain` prunes the document's in-row
    *     n-gram array scan-locally (the 100 TB lever — most grams of most
    *     docs miss, and misses cost one hash, no memory);
    *  2. the bloom SURVIVORS confirm exactly against the benchmark's
    *     distinct gram set (bounded by the decontaminate contract — the
    *     broadcast side must not grow with the corpus), so false
    *     positives cannot drop a clean document: decisions are IDENTICAL
    *     to the batch operator's, which the spec proves across waves.
    *
    * Everything stays a pure projection — no stream-stream join, no
    * stateful operator — so exactly-once append semantics carry over
    * unchanged. Rebuilding the filter when the eval set changes is a
    * planning-time event (new literal, new stream restart), matching how
    * eval suites version in practice.
    */
  def curationGateDecon(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Long, maxTokens: Long,
      minAvgTokLen: Double, maxAvgTokLen: Double,
      maxRepeatRatio: Double, minDistinctStop: Int,
      splitSalt: String, pctTrain: Int,
      bloom: Array[Byte], benchGrams: Seq[String], n: Int,
      minOverlap: Long): DataFrame = {
    import graft.llm.{BloomDecon, TextOps}
    require(n >= 1 && minOverlap >= 1)
    // in-row gram array (same construction as TextOps.wordNgrams, minus
    // the explode); docs shorter than n words carry no grams
    val grams = expr(
      s"case when size(split($textCol, ' ')) >= $n " +
        s"then transform(sequence(1, size(split($textCol, ' ')) - ${n - 1}), " +
        s"i -> concat_ws(' ', slice(split($textCol, ' '), i, $n))) " +
        "else array() end")
    val bloomHits = filter(grams, g => BloomDecon.mightContain(bloom, g))
    // exact confirm: distinct overlap count vs the benchmark gram set —
    // array_intersect dedups, mirroring the batch countDistinct
    val overlap = size(array_intersect(array_distinct(bloomHits),
      typedLit(benchGrams)))
    TextOps.scrubPii(
        docs.filter(TextOps.gopherKeep(col(textCol), minTokens, maxTokens,
            minAvgTokLen, maxAvgTokLen, maxRepeatRatio, minDistinctStop))
          .filter(overlap < minOverlap),
        idCol, textCol)
      .select(col(idCol), col("clean"),
        TextOps.splitLabel(col(idCol), splitSalt, pctTrain).as("split"))
  }

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

  final case class BandDoc(band: Int, bv: Long, doc_id: Long, simhash: Long)
  final case class BucketState(members: List[BucketMember])
  final case class BucketMember(doc_id: Long, simhash: Long)
  final case class NearDupHit(doc_a: Long, doc_b: Long, hamming: Int)

  /** Streaming near-duplicate detection — the ingest-time twin of
    * [[graft.llm.SimHash.hammingPairs]]: as documents arrive, each is
    * banded on its SimHash fingerprint (same 4-band pigeonhole guarantee
    * up to hamming `maxHamming` ≤ 3) and compared against the documents
    * already resident in its band buckets; every match emits a
    * `(doc_a, doc_b, hamming)` pair, ids ordered.
    *
    * Semantics vs the batch twin, stated honestly:
    *  - a pair can surface through MORE than one matching band →
    *    at-least-once pair emission (the batch twin `.distinct()`s; a
    *    streaming sink dedups downstream or writes idempotently);
    *  - `bucketCap` bounds per-bucket state by TRUNCATION (docs past the
    *    cap join no bucket, costing recall on flooded buckets), whereas
    *    the batch twin drops oversized buckets wholesale — a streaming
    *    operator cannot know a bucket's final size in advance;
    *  - state never expires (near-dup history is the point); at 100 TB,
    *    cap state by construction — shard the stream by corpus partition
    *    or add a TTL wrapper — rather than by watermark, since documents
    *    carry no event time.
    *
    * Scale shape: one shuffle on (band, bv) per micro-batch, state
    * bounded by 4·buckets·bucketCap members, comparisons bounded by
    * bucketCap per arrival — the same linear-vs-quadratic trade as the
    * batch LSH stage, paid incrementally.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, bucketCap: Int = 10000, bits: Int = 64): Dataset[NearDupHit] = {
    require(maxHamming <= 3, "4 bands guarantee recall only up to hamming 3")
    val sh = if (bits == 64) graft.llm.SimHash.simhash64(col(textCol))
      else graft.llm.SimHash.simhash32(col(textCol))
    val bands = docs
      .select(col(idCol).cast("long").as("doc_id"), sh.as("simhash"))
      .select(col("doc_id"), col("simhash"),
        // the SAME banding expression as the batch twin — the spec's
        // stream/batch pair-set equality rides on this sharing
        explode(graft.llm.SimHash.bandStructs(col("simhash"), bits)).as("b"))
      .select(col("b.band").as("band"), col("b.bv").as("bv"),
        col("doc_id"), col("simhash"))
      .as(Encoders.product[BandDoc])
    bands
      .groupByKey(b => (b.band, b.bv))(Encoders.product[(Int, Long)])
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), rows: Iterator[BandDoc], state: GroupState[BucketState]) => {
          var seen = state.getOption.map(_.members).getOrElse(Nil)
          var nSeen = seen.size
          val out = List.newBuilder[NearDupHit]
          // doc_id order within the batch: deterministic pairs regardless
          // of shuffle arrival order
          rows.toArray.sortBy(_.doc_id).foreach { r =>
            if (nSeen < bucketCap && !seen.exists(_.doc_id == r.doc_id)) {
              seen.foreach { m =>
                val d = java.lang.Long.bitCount(m.simhash ^ r.simhash)
                if (d <= maxHamming)
                  out += NearDupHit(math.min(m.doc_id, r.doc_id),
                    math.max(m.doc_id, r.doc_id), d)
              }
              seen = BucketMember(r.doc_id, r.simhash) :: seen
              nSeen += 1
            }
          }
          state.update(BucketState(seen))
          out.result().iterator
        })(Encoders.product[BucketState], Encoders.product[NearDupHit])
  }

  final case class MhBandDoc(band: Int, sig: String, doc_id: Long)
  final case class MhBucket(members: List[Long])
  final case class CandidatePair(doc_a: Long, doc_b: Long)

  /** Streaming MinHash-LSH candidate generation — the ingest-time twin of
    * [[graft.llm.MinHashDedup.candidatePairs]] and the streaming half of
    * the incremental dedup story ([[graft.llm.MinHashDedup
    * .incrementalNewKeep]] is the scheduled-batch form): each arriving
    * document is banded on its MinHash signature (same slices, same
    * band/sig concatenation as the batch stage) and paired against the
    * documents already RESIDENT in its band buckets. Downstream, exact
    * Jaccard verification runs as the batch verify stage over the emitted
    * candidates — candidates are cheap, verification is the expensive
    * part, and only candidates need to be incremental.
    *
    * Same honest divergences as [[nearDupPairs]]: at-least-once pair
    * emission (a pair can match in more than one band; the batch twin
    * `.distinct()`s), cap-by-truncation instead of the batch's
    * drop-the-bucket, and non-expiring state (shard or TTL-wrap at
    * corpus scale). One shuffle on (band, sig) per micro-batch;
    * comparisons per arrival bounded by bucketCap.
    */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, bucketCap: Int = 10000): Dataset[CandidatePair] = {
    import graft.llm.{MinHashDedup, MinHashExpr}
    val bands = docs
      .select(col(idCol).cast("long").as("doc_id"),
        MinHashExpr.minhashSlices(col(textCol), k, MinHashDedup.numHashes).as("__mh"))
      .filter(col("__mh").isNotNull)
      .select(col("doc_id"),
        explode(array((0 until MinHashDedup.numBands).map(i =>
          struct(lit(i).as("band"),
            concat(col("__mh").getItem(MinHashDedup.bandRows * i),
              col("__mh").getItem(MinHashDedup.bandRows * i + 1)).as("sig"))): _*)).as("b"))
      .select(col("b.band").as("band"), col("b.sig").as("sig"), col("doc_id"))
      .as(Encoders.product[MhBandDoc])
    bands
      .groupByKey(b => (b.band, b.sig))(Encoders.product[(Int, String)])
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, String), rows: Iterator[MhBandDoc], state: GroupState[MhBucket]) => {
          var seen = state.getOption.map(_.members).getOrElse(Nil)
          var nSeen = seen.size
          val out = List.newBuilder[CandidatePair]
          rows.toArray.sortBy(_.doc_id).foreach { r =>
            if (nSeen < bucketCap && !seen.contains(r.doc_id)) {
              seen.foreach(m => out += CandidatePair(
                math.min(m, r.doc_id), math.max(m, r.doc_id)))
              seen = r.doc_id :: seen
              nSeen += 1
            }
          }
          state.update(MhBucket(seen))
          out.result().iterator
        })(Encoders.product[MhBucket], Encoders.product[CandidatePair])
  }

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
