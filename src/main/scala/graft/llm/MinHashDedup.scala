package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over a text column.
  *
  * Pipeline: char-k-shingles → one sha256 per shingle → H minhash
  * signatures (disjoint 8-hex-char slices of the digest, min per slice) →
  * LSH banding (one band per signature row) → bucket join for candidate
  * pairs → exact shingle-Jaccard verification of candidates.
  *
  * Scale design:
  *   - ONE digest per (doc, shingle); the H signature slices reuse it, so
  *     hashing cost is O(total shingles), not O(H × shingles);
  *   - candidate generation is a self-join ONLY within LSH buckets, with
  *     mega-buckets (> bucketCap docs) dropped — the standard guard that
  *     keeps worst-case pair counts linear instead of quadratic when a
  *     common min-shingle floods one bucket;
  *   - Jaccard verification joins shingle sets only for surviving candidate
  *     pairs (tiny compared to the corpus).
  */
object MinHashDedup {

  val numHashes = 8

  /** MinHash signature per document: columns m0..m7 (8-hex-char strings). */
  def signatures(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    signaturesFromShingles(TextOps.charShingles(docs, idCol, textCol, k), idCol)

  def signaturesFromShingles(shingles: DataFrame, idCol: String): DataFrame = {
    val hashed = shingles.withColumn("__h", sha2(col("shingle"), 256))
    val slices = (0 until numHashes).map(i =>
      min(substring(col("__h"), 1 + 8 * i, 8)).as(s"m$i"))
    hashed.groupBy(col(idCol)).agg(slices.head, slices.tail: _*)
  }

  /** Append one document batch's signatures to a commit-log-backed
    * signature store (the [[signatures]] layout: idCol, m0..m7), computed
    * via the codegen'd one-pass [[MinHashExpr]] (spec-proven identical to
    * the shingle/agg formulation). This is the persistence half of
    * [[incrementalNewKeep]]'s production cycle: each daily run reads the
    * store snapshot as `storedSigs` (old-corpus signatures — the batch is
    * the only text scanned), dedups the batch against it, then appends
    * the KEPT batch rows here for the next run. Documents shorter than
    * the shingle width produce no signature — same as the full sweep.
    * The first append creates the table; compact/vacuum ride
    * [[graft.tables.CommitLogTable]].
    */
  def signatureStoreAppend(spark: org.apache.spark.sql.SparkSession,
      dir: String, docs: DataFrame, idCol: String, textCol: String,
      k: Int): Long = {
    val sigs = docs
      .select(col(idCol),
        MinHashExpr.minhashSlices(col(textCol), k, numHashes).as("__mh"))
      .filter(col("__mh").isNotNull)
      .select(col(idCol) +: (0 until numHashes).map(i =>
        col("__mh").getItem(i).as(s"m$i")): _*)
    // recordChanges=false: signatures are derived from the document
    // table, which owns the change feed
    graft.tables.CommitLogTable.forPath(spark, dir, sigs.schema, Seq.empty)
      .append(sigs, recordChanges = false)
  }

  /** LSH banding: r rows per band. r=2 over 8 signatures → 4 bands; the
    * collision curve 1−(1−j²)⁴ passes ~50% at j≈0.4, so candidates are
    * probable near-dups rather than anything sharing one common min-shingle
    * (r=1 floods the candidate set on vocabulary-heavy corpora).
    */
  val bandRows = 2
  val numBands: Int = numHashes / bandRows

  /** Candidate near-dup pairs (idCol_a < idCol_b) sharing at least one LSH
    * bucket, skipping buckets larger than `bucketCap`.
    */
  /** The (id, band, sig) stream of a signature table — the banding every
    * bucket consumer (pair expansion, occupancy audit) starts from.
    */
  private def bandsOf(sigs: DataFrame, idCol: String): DataFrame =
    sigs.select(
      col(idCol),
      explode(array((0 until numBands).map(i =>
        struct(lit(i).as("band"),
          concat(col(s"m${bandRows * i}"), col(s"m${bandRows * i + 1}")).as("sig"))): _*)).as("b"))
      .select(col(idCol), col("b.band").as("band"), col("b.sig").as("sig"))

  def candidatePairs(sigs: DataFrame, idCol: String, bucketCap: Int): DataFrame = {
    // the in-row expansion below builds ≤ cap² structs in one row; that is
    // the RIGHT trade for LSH caps (tens), and catastrophically the wrong
    // one for huge caps — callers wanting cap ≫ 10³ need the bucket
    // self-join formulation (SimHash.hammingPairs keeps it) instead
    require(bucketCap >= 2 && bucketCap <= 1000,
      s"bucketCap $bucketCap outside [2, 1000]: the in-row pair expansion " +
        "is sized for LSH-scale caps; use a join-based candidate stage beyond")
    val bands = bandsOf(sigs, idCol)
    // size-gate FIRST with a count aggregate (map-side partials, no list
    // ever materialized — a mega-bucket must be droppable without any
    // executor holding its id array), then collect ONLY the surviving
    // ≤-cap buckets and expand pairs IN-ROW (≤ cap²/2 structs per row, a
    // few KB at LSH caps). The semi-join and the collect_list groupBy
    // share the (band, sig) hash partitioning, so the band stream still
    // crosses one wide exchange; vs the old window-count + bucket
    // self-join this drops the per-bucket SORT and the join build.
    val okBuckets = bands
      .groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn").between(2, bucketCap))
      .select(col("band"), col("sig"))
    bands
      .join(okBuckets, Seq("band", "sig"), "left_semi")
      .groupBy(col("band"), col("sig"))
      .agg(collect_list(col(idCol)).as("__ids"))
      .select(explode(expr(
        """filter(
             flatten(transform(__ids,
               a -> transform(__ids, b -> named_struct('doc_a', a, 'doc_b', b)))),
             p -> p.doc_a < p.doc_b)""")).as("__p"))
      .select(col("__p.doc_a").as("doc_a"), col("__p.doc_b").as("doc_b"))
      .distinct()
  }

  /** LSH bucket-gate occupancy audit — the "no silent caps" companion of
    * [[candidatePairs]] (same pattern as `TextOps.winnowCoverage` for the
    * winnow gate): buckets larger than `bucketCap` are dropped before any
    * pair expansion, which is the guard that keeps the sweep subquadratic
    * — and also the place recall silently leaks if the corpus's duplicate
    * density outgrows the cap. One corpus-size-invariant row off the same
    * (band, sig) exchange the pair stage pays: bucket counts by class
    * (singleton / pairable / hot), band-row mass in each, and
    * `pair_coverage` — the fraction of band rows still pairable under
    * the cap. Read it before trusting a sweep's pair output; hot mass
    * growing round-over-round is the signal to re-tune bands × rows or
    * the cap.
    */
  def bucketStats(sigs: DataFrame, idCol: String, bucketCap: Int): DataFrame = {
    val per = bandsOf(sigs, idCol)
      .groupBy(col("band"), col("sig")).agg(count(lit(1)).as("n_occ"))
    per.agg(
        count(lit(1)).as("n_buckets"),
        sum(col("n_occ")).as("n_rows_total"),
        sum(when(col("n_occ") === 1, 1L).otherwise(0L))
          .as("n_buckets_singleton"),
        sum(when(col("n_occ") > bucketCap, 1L).otherwise(0L))
          .as("n_buckets_hot"),
        sum(when(col("n_occ") > bucketCap, col("n_occ")).otherwise(0L))
          .as("n_rows_hot"),
        sum(when(col("n_occ").between(2, bucketCap), col("n_occ"))
          .otherwise(0L)).as("n_rows_pairable"))
      .select(col("n_buckets"), col("n_rows_total"),
        col("n_buckets_singleton"), col("n_buckets_hot"), col("n_rows_hot"),
        col("n_rows_pairable"),
        (col("n_rows_pairable").cast("double") / col("n_rows_total"))
          .as("pair_coverage"))
  }

  /** Exact shingle-Jaccard for each candidate pair.
    *
    * Scale structure: the raw (non-distinct) shingle stream feeds the
    * signature aggregation WITHOUT any corpus-wide dedup shuffle — MIN is
    * duplicate-insensitive, and partial aggregation reduces map-side to
    * 8 slices per doc. Set semantics (distinct shingles) are only needed
    * for the exact-Jaccard step, which runs on CANDIDATE docs alone — a
    * semi-join-filtered sliver of the corpus.
    */
  def verifiedPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, bucketCap: Int): DataFrame =
    graft.CacheBin.register(verifiedPairsImpl(docs, idCol, textCol, k, bucketCap))

  /** Session memo for [[verifiedPairs]] results, keyed by (session,
    * corpusKey, idCol, textCol, k, bucketCap). The expensive part of a
    * dedup sweep — signatures, banding, candidate join, exact Jaccard —
    * runs ONCE per session and serves every consumer (`q_minhash_pairs`
    * wants the pairs, `q_dedup_clusters` clusters them). The cached frame
    * is candidate-bounded (near-dup pairs, a sliver of the corpus), so
    * pinning it across queries is cheap; at 100 TB the same decision is
    * "materialize the pair table once, read it twice", which this memo
    * encodes rather than leaves to the caller.
    *
    * Ownership: the frame is `CacheBin.pin`ned (survives per-query
    * `drain()`); `CacheBin.drainAll()` at suite end unpersists it and the
    * registered hook clears the memo so no caller receives a frame whose
    * cache was just dropped.
    */
  def verifiedPairsShared(docs: DataFrame, corpusKey: String, idCol: String,
      textCol: String, k: Int, bucketCap: Int): DataFrame =
    graft.SessionMemo.cached(docs.sparkSession,
      s"minhash:$corpusKey:$idCol:$textCol:$k:$bucketCap")(
      verifiedPairsImpl(docs, idCol, textCol, k, bucketCap,
        sharedSigs = Some(signaturesShared(docs, corpusKey, idCol, textCol, k))))

  /** Session-memoized signature table ((idCol, m0..m7), the
    * [[signatures]] layout) — the artifact a 100 TB sweep materializes to
    * the store once and every consumer reads: the full-sweep pair build
    * AND the incremental batch dedup ([[incrementalNewKeep]]'s
    * `storedSigs`) both ride it, so the corpus-wide minhash scan runs
    * once per session, not once per pipeline.
    */
  def signaturesShared(docs: DataFrame, corpusKey: String, idCol: String,
      textCol: String, k: Int): DataFrame =
    graft.SessionMemo.cached(docs.sparkSession,
      s"minhashsigs:$corpusKey:$idCol:$textCol:$k:$numHashes") {
      Spread(docs)
        .select(col(idCol), MinHashExpr.minhashSlices(col(textCol), k, numHashes).as("__mh"))
        .filter(col("__mh").isNotNull)
        .select(col(idCol) +: (0 until numHashes).map(i =>
          col("__mh").getItem(i).as(s"m$i")): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private def verifiedPairsImpl(docs: DataFrame, idCol: String, textCol: String,
      k: Int, bucketCap: Int, sharedSigs: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // single-file corpora arrive as one input split; spread them before the
    // per-doc signature pass. A well-split input (≥ half the cluster's
    // slots) is left alone — at scale the corpus already has thousands of
    // splits, and a corpus-wide round-robin shuffle before a scan-local
    // signature pass would dwarf everything downstream.
    val spread = Spread(docs)
    // signatures via the one-pass native expression — scan-local, no
    // explode/shuffle (see MinHashSlices); identical output to
    // signaturesFromShingles, which remains the generic/oracle formulation.
    // Persists are LAZY (no eager count jobs): each fills on first use
    // inside the single result job and serves the remaining consumers.
    // persisted: candidatePairs consumes the band stream TWICE (the
    // count-gate aggregate and the collect_list side of the semi-join),
    // and without the cache each pass re-evaluates the minhash expression
    // over every document — the single most expensive scan expression in
    // the pipeline, paid double. The signature table is 1+numHashes narrow
    // columns per doc (the thing a 100 TB sweep materializes to the
    // store); the shared-memo path hands in exactly that table, owned by
    // SessionMemo — only a locally-built one is unpersisted below.
    val sigs = sharedSigs.getOrElse(spread
      .select(col(idCol), MinHashExpr.minhashSlices(col(textCol), k, numHashes).as("__mh"))
      .filter(col("__mh").isNotNull)
      .select(col(idCol) +: (0 until numHashes).map(i =>
        col("__mh").getItem(i).as(s"m$i")): _*)
      .persist(MEMORY_AND_DISK))
    val pairs = candidatePairs(sigs, idCol, bucketCap).persist(MEMORY_AND_DISK)
    // no distinct: the ONLY consumer is a left-semi join, whose hash build
    // dedups — an explicit distinct would add a whole shuffle to save the
    // build a few duplicate inserts
    val candDocs = pairs.select(col("doc_a").as(idCol))
      .union(pairs.select(col("doc_b").as(idCol)))
    // exact Jaccard over IN-ROW shingle sets: semi-join the corpus down to
    // the candidate sliver, build each doc's distinct-shingle set as one
    // array column (a scan-local projection — no explode, no corpus-wide
    // distinct shuffle), then join the sets onto the pairs and intersect
    // in place. The previous formulation exploded candidates to (doc,
    // shingle) rows and recovered |A∩B| via a two-sided equi-join + three
    // count joins — six shuffle stages this one projection + two joins
    // replace; a long synchronous critical path is exactly what balloons
    // under cluster contention, so the stage graph is the optimization
    // target here, not just the row counts. Per-row set size is bounded by
    // document length (the same data the exploded form carried, held one
    // row at a time).
    val setExpr = array_distinct(expr(
      s"transform(sequence(1, length($textCol) - ${k - 1}), i -> substring($textCol, i, $k))"))
    val candSets = spread.join(candDocs, Seq(idCol), "left_semi")
      .filter(length(col(textCol)) >= k)
      .select(col(idCol), setExpr.as("__sh"))
      .persist(MEMORY_AND_DISK)
    val out = pairs
      .join(candSets.select(col(idCol).as("doc_a"), col("__sh").as("__sha")), Seq("doc_a"))
      .join(candSets.select(col(idCol).as("doc_b"), col("__sh").as("__shb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("__sha"), col("__shb"))).cast("long").as("n_inter"),
        size(col("__sha")).cast("long").as("n_a"),
        size(col("__shb")).cast("long").as("n_b"))
      // n_inter is referenced twice below, which keeps CollapseProject from
      // re-inlining the array_intersect into both references
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
          .as("jaccard"))
      .persist(MEMORY_AND_DISK)
    // one materializing job for the (candidate-bounded, small) result, then
    // release the corpus-sized intermediates — repeated calls in a session
    // no longer accumulate cached blocks. The returned frame stays cached
    // (the returned plan reads it); the public entry points hand its
    // release to CacheBin (per-query tier via `verifiedPairs`, session
    // tier via `verifiedPairsShared`).
    out.count()
    if (sharedSigs.isEmpty) sigs.unpersist(false)
    pairs.unpersist(false); candSets.unpersist(false)
    out
  }

  /** Incremental dedup: keep/drop decisions for a NEW batch of documents
    * against the existing corpus — the daily-ingest shape of the sweep.
    * A new document is dropped when it near-dups (exact shingle-Jaccard ≥
    * `threshold`) ANY old document or an EARLIER (lower-id) new one; a
    * later new sibling never evicts an earlier one, so the batch's
    * internal ordering is deterministic.
    *
    * The 100 TB structure is what makes this different from re-running
    * the full sweep over old ∪ new:
    *   - LSH buckets the new batch never touches are dropped by the
    *     bucket gate BEFORE any pair expansion — at a daily ratio of
    *     1:1000 that is nearly all of them, so candidate volume scales
    *     with the BATCH, not the corpus;
    *   - old×old pairs are structurally excluded from the in-row
    *     expansion (the filter requires a new side), so the exact-verify
    *     join only ever loads shingle sets for batch-adjacent docs;
    *   - signatures for old docs are recomputed here because the query is
    *     self-contained over one table; a production deployment reads
    *     them from the signature store the previous run materialized
    *     (same slices [[signatures]] emits) and this stage becomes
    *     batch-sized too.
    *
    * Output: one row per new document — (id, n_dups, keep), where
    * `n_dups` counts the verified duplicate partners that evict it.
    */
  def incrementalNewKeep(docs: DataFrame, idCol: String, textCol: String,
      k: Int, bucketCap: Int, isNew: Column, threshold: Double,
      storedSigs: Option[DataFrame] = None): DataFrame = {
    require(bucketCap >= 2 && bucketCap <= 1000,
      s"bucketCap $bucketCap outside [2, 1000]: see candidatePairs")
    val spread = Spread(docs.withColumn("__new", isNew))
    def sigPass(in: DataFrame): DataFrame = in
      .select(col(idCol), col("__new"),
        MinHashExpr.minhashSlices(col(textCol), k, numHashes).as("__mh"))
      .filter(col("__mh").isNotNull)
      .select(col(idCol) +: col("__new") +: (0 until numHashes).map(i =>
        col("__mh").getItem(i).as(s"m$i")): _*)
    // `storedSigs` is the production shape: the previous run's signature
    // table ([[signatures]] layout: idCol, m0..m7) read from the store, so
    // the corpus-wide signature pass costs the BATCH only. Without it the
    // self-contained single-pass form computes both sides in one scan.
    val sigs = storedSigs match {
      case Some(st) =>
        sigPass(spread.filter(col("__new"))).unionByName(
          st.select(col(idCol) +: (0 until numHashes).map(i => col(s"m$i")): _*)
            .withColumn("__new", lit(false)))
      case None => sigPass(spread)
    }
    // persisted: the bucket-size gate aggregation AND the bucket join
    // both consume the banded rows — without the persist the new
    // batch's MinHash pass (numHashes sha256 slices per shingle) runs
    // once per consumer
    val bands = graft.CacheBin.register(sigs.select(
      col(idCol), col("__new"),
      explode(array((0 until numBands).map(i =>
        struct(lit(i).as("band"),
          concat(col(s"m${bandRows * i}"), col(s"m${bandRows * i + 1}")).as("sig"))): _*)).as("b"))
      .select(col(idCol), col("__new"), col("b.band").as("band"), col("b.sig").as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // gate on TOTAL bucket size (same cap as the full sweep — candidate
    // pairs involving a new doc are identical to the full pipeline's) AND
    // on the bucket containing at least one new doc
    val okBuckets = bands
      .groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("__bn"), max(col("__new")).as("__hasNew"))
      .filter(col("__bn").between(2, bucketCap) && col("__hasNew"))
      .select(col("band"), col("sig"))
    val pairs = graft.CacheBin.register(bands
      .join(okBuckets, Seq("band", "sig"), "left_semi")
      .groupBy(col("band"), col("sig"))
      .agg(collect_list(struct(col(idCol).as("id"), col("__new").as("nw"))).as("__ds"))
      .select(explode(expr(
        """filter(
             flatten(transform(__ds, a -> transform(__ds, b -> named_struct('a', a, 'b', b)))),
             p -> p.a.id < p.b.id AND (p.a.nw OR p.b.nw))""")).as("__p"))
      .select(col("__p.a.id").as("doc_a"), col("__p.b.id").as("doc_b"),
        col("__p.a.nw").as("__a_new"), col("__p.b.nw").as("__b_new"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val candDocs = pairs.select(col("doc_a").as(idCol))
      .union(pairs.select(col("doc_b").as(idCol)))
    val setExpr = array_distinct(expr(
      s"transform(sequence(1, length($textCol) - ${k - 1}), i -> substring($textCol, i, $k))"))
    // persisted: the exact-verify join attaches shingle sets to BOTH
    // pair sides — without the persist the candidate-sliver explode
    // would run once per side
    val candSets = graft.CacheBin.register(spread
      .join(candDocs, Seq(idCol), "left_semi")
      .filter(length(col(textCol)) >= k)
      .select(col(idCol), setExpr.as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val verified = pairs
      .join(candSets.select(col(idCol).as("doc_a"), col("__sh").as("__sha")), Seq("doc_a"))
      .join(candSets.select(col(idCol).as("doc_b"), col("__sh").as("__shb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("__a_new"), col("__b_new"),
        size(array_intersect(col("__sha"), col("__shb"))).cast("long").as("n_inter"),
        size(col("__sha")).cast("long").as("n_a"),
        size(col("__shb")).cast("long").as("n_b"))
      .select(col("doc_a"), col("doc_b"), col("__a_new"), col("__b_new"),
        (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
    // a verified pair (a < b) evicts b when b is new (a precedes it: old
    // corpus or earlier new), and evicts a only when b is OLD — each pair
    // contributes to exactly ONE side, so the victim is a per-row `when`
    // (the former two-branch filter-union re-ran the verify joins once
    // per branch) and n_dups = distinct partners
    val victim = when(col("__b_new"), col("doc_b"))
      .when(col("__a_new") && not(col("__b_new")), col("doc_a"))
    val dups = verified.select(victim.as(idCol))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_dups"))
    spread.filter(col("__new")).select(col(idCol))
      .join(dups, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("n_dups").isNull.as("keep"))
  }

  /** Connected components over near-dup pairs: every document gets the
    * MINIMUM doc id reachable through the pair graph as its `cluster_id`
    * (singletons label themselves) — the pairs → clusters → keep-one step
    * that completes a dedup sweep.
    *
    * Min-label propagation to fixpoint: each round joins labels to the
    * (symmetrized) edge list and takes the elementwise min. The driver
    * loop runs O(component diameter) rounds — near-dup clusters are
    * shallow (dups of dups), so a handful of DISTRIBUTED join+agg rounds,
    * not a per-row driver loop; each round's result is persisted and the
    * previous round released to keep lineage flat.
    */
  /** Diagnostic for the scale probe: which path the last
    * [[connectedComponents]] call took (0 = driver union-find; n>0 = the
    * distributed label-propagation converged in n checkpointed rounds).
    */
  @volatile var lastCcRounds: Int = 0

  def connectedComponents(vertices: DataFrame, idCol: String,
      pairs: DataFrame, maxIter: Int = 20,
      maxDriverPairs: Long = 5000000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark = vertices.sparkSession
    // iterate ONLY over the pair-touched subgraph — the sliver the LSH +
    // verify stages produce; untouched docs are singletons and join back
    // at the end with their own id as the label
    val edges0 = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val nEdges = edges0.count()
    // verified near-dup pairs are usually a sliver of the corpus: below
    // the threshold, min-rooted union-find on the driver is exact, O(E α)
    // and instant — the label-propagation rounds below exist for the
    // billions-of-pairs regime where the edge list can't be collected
    if (maxDriverPairs == Long.MaxValue || nEdges <= 2L * maxDriverPairs) {
      lastCcRounds = 0
      val idField = vertices.schema(idCol)
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      def lt(a: Any, b: Any): Boolean =
        a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
      pairs.select(col("doc_a"), col("doc_b")).collect().foreach { r =>
        val (ra, rb) = (find(r.get(0)), find(r.get(1)))
        if (ra != rb) {
          if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb // min wins
        }
      }
      val touched = parent.keySet ++ parent.values
      val labelRows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(touched.toSeq.map(v =>
          org.apache.spark.sql.Row(v, find(v))): _*)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        idField.copy(name = "doc_id"), idField.copy(name = "__cc")))
      val labelsDf = spark.createDataFrame(labelRows, schema)
      return vertices.select(col(idCol).as("doc_id"))
        .join(broadcast(labelsDf), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("__cc"), col("doc_id")).as("cluster_id"))
    }
    // distributed path: size the iteration's partitioning to the subgraph,
    // not the corpus — label-propagation rounds on few edges are
    // task-overhead bound at corpus partition counts
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (nEdges / 100000L).toInt + 1))
    val edges = edges0.repartition(parts, col("src")).persist(MEMORY_AND_DISK)
    // localCheckpoint (eager) each round: persists truncate EXECUTION but
    // the logical plan would still deepen every iteration and the
    // optimizer would pay quadratically — checkpointing roots each round's
    // plan at a leaf. (On a cluster swap in reliable checkpoint() — local
    // blocks don't survive executor loss.)
    var cp = edges0.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("label"))
      .repartition(parts, col("doc_id"))
      .localCheckpoint(true)
    var labels = cp
    var changed = if (nEdges == 0) 0L else 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val neighborMin = edges.join(labels, col("src") === col("doc_id"))
        .groupBy(col("dst")).agg(min(col("label")).as("__nbr"))
      val l1 = labels
        .join(neighborMin, labels("doc_id") === neighborMin("dst"), "left")
        .select(col("doc_id"), col("label").as("__old"),
          least(col("label"), coalesce(col("__nbr"), col("label"))).as("label"))
      // pointer-jumping: also adopt the label OF my label — paths collapse
      // in O(log diameter) rounds instead of O(diameter)
      val lookup = l1.select(col("doc_id").as("__lid"), col("label").as("__llabel"))
      val step = l1
        .join(lookup, l1("label") === col("__lid"), "left")
        .select(col("doc_id"), col("__old"),
          least(col("label"), coalesce(col("__llabel"), col("label"))).as("label"))
        .localCheckpoint(true)
      // eager checkpoint: `step`'s blocks exist now, so the round that fed
      // it is disposable — release it here instead of leaking one cached
      // label set per iteration
      cp.unpersist(false)
      cp = step
      changed = step.filter(col("label") =!= col("__old")).count()
      labels = step.select("doc_id", "label")
      i += 1
    }
    lastCcRounds = i
    edges.unpersist(false)
    // the final label checkpoint (subgraph-sized) backs the returned plan;
    // CacheBin releases it once the caller has materialized
    graft.CacheBin.register(cp)
    vertices.select(col(idCol).as("doc_id"))
      .join(labels.withColumnRenamed("label", "cluster_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** Exact word-n-gram Jaccard between given id pairs (the reference-free
    * "n-gram Jaccard" dedup primitive; callers supply the candidate pairs —
    * from LSH, blocking, or a deterministic sample).
    */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String, n: Int,
      pairs: DataFrame): DataFrame =
    ngramOverlap(docs, idCol, textCol, n, pairs)
      .select("doc_a", "doc_b", "jaccard")

  /** The full overlap profile per candidate pair: Jaccard resemblance
    * PLUS both containment directions — `containment_a = |A∩B| / |A|`
    * flags A as a sub-document of B even when the symmetric Jaccard is
    * low (a quoted paragraph inside a long page never scores high on
    * resemblance, which is exactly how boilerplate survives
    * resemblance-only dedup). One shared join pipeline feeds
    * [[ngramJaccard]] and the containment query; shuffle volume is
    * per-doc distinct grams for the candidate pairs only.
    */
  def ngramOverlap(docs: DataFrame, idCol: String, textCol: String, n: Int,
      pairs: DataFrame): DataFrame = {
    // persisted: the per-doc counts and BOTH pair sides read the
    // distinct-gram rows — one explode+distinct pass, not three
    val grams = graft.CacheBin.register(
      TextOps.wordNgrams(docs, idCol, textCol, n).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val counts = grams.groupBy(col(idCol)).agg(count(lit(1)).as("n_g"))
    val ga = grams.withColumnRenamed(idCol, "doc_a")
    val gb = grams.withColumnRenamed(idCol, "doc_b")
    val inter = pairs.join(ga, Seq("doc_a")).join(gb, Seq("doc_b", "ngram"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(counts.withColumnRenamed(idCol, "doc_a").withColumnRenamed("n_g", "n_a"), Seq("doc_a"))
      .join(counts.withColumnRenamed(idCol, "doc_b").withColumnRenamed("n_g", "n_b"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
          .as("jaccard"),
        (col("n_inter").cast("double") / col("n_a")).as("containment_a"),
        (col("n_inter").cast("double") / col("n_b")).as("containment_b"))
  }

  /** Priority-aware cluster resolution: one survivor per cluster, the
    * member with the HIGHEST score (doc_id tie-break; null scores rank
    * last via a -1.0 sentinel — callers pass non-negative scores).
    *
    * `clusters` is a (doc_id, cluster_id) map ([[connectedComponents]]
    * output), `scores` a (doc_id, scoreCol) table. One doc_id hash join,
    * then ONE cluster-keyed hash aggregate whose argmax is
    * `min(struct(-score, doc_id))` — partial-aggregable map-side, so the
    * exchange carries one candidate row per (partition, cluster), never
    * a window over the corpus.
    */
  def keepBest(clusters: DataFrame, scores: DataFrame,
      scoreCol: String): DataFrame =
    clusters
      .join(scores.select(col("doc_id"), col(scoreCol).as("__score")), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(
        min(struct((-coalesce(col("__score"), lit(-1.0))).as("nscore"),
          col("doc_id").as("d"), col("__score").as("sc"))).as("__best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"), col("__best.d").as("keep_doc_id"),
        col("__best.sc").as(s"keep_$scoreCol"), col("n_members"),
        (col("__best.d") =!= col("cluster_id")).as("promoted"))
}
