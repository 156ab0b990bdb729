package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scale-headroom probe: run the dedup + ANN + curation plane against a
  * baseline corpus and a K× corpus (tools/gen_scale10x.py) and compare wall
  * time AND total shuffle-write records per phase. The sf0.1 bench is too
  * small to catch a quadratic regression hiding under task overhead; this
  * probe makes the growth CURVE observable: a phase whose shuffle rows grow
  * ~K× is linear, one growing ~K²× has lost its bucketing/cap guard.
  *
  * Usage: tools/run.sh graft.ScaleProbe [baseDir] [scaledDir]
  * Prints one JSON line per (phase, dir) and a final ratio summary.
  */
object ScaleProbe {

  /** Accumulates shuffle-write record counts from completed stages. Stage
    * events arrive on the listener bus asynchronously; [[settle]] waits a
    * beat so a phase's last stages are counted before the snapshot.
    */
  private class ShuffleMeter extends SparkListener {
    val records = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      records.addAndGet(
        sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
  }

  private def settle(): Unit = Thread.sleep(800)

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val scaledDir = args.lift(1).getOrElse("/tmp/scale10x")
    // optional 3rd arg: probe only the named phases (local iteration)
    val only = args.lift(2).map(_.split(',').toSet)
    val spark = Sessions.build("local[32]", 32, "graft-scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    // the phases under test: every large-×-large-risk operator of the LLM
    // plane (bucketed dedup, blocked near-dup, probed ANN, composed curate)
    val phases: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "minhash_pairs" -> (Queries.minhashPairs _),
      // occupancy audit beside the sweep: shuffle = the one (band, sig)
      // exchange, output one row — hot-bucket mass growing faster than
      // corpus rows is the early warning the cap is eating recall
      "minhash_bucket_stats" -> (Queries.minhashBucketStats _),
      "dedup_keep" -> (Queries.dedupKeep _),
      "curate" -> (Queries.curate _),
      "simhash_hamming64" -> (Queries.simhashHamming64 _),
      // the probe's one superlinear finding, mitigated: the synthetic
      // vocab is tiny (~30 words), so documents are GENUINELY mutually
      // near-dup and the true hamming≤3 pair set grows ~quadratically —
      // the bucket cap is the lever that bounds emitted pairs at any
      // density; this phase proves tightening it restores ~linear growth
      "simhash_hamming64_cap200" -> ((s: SparkSession, dir: String) =>
        graft.llm.SimHash.hammingPairs(Tables.documents(s, dir), "doc_id",
          "text", maxHamming = 3, bucketCap = 200, bits = 64)),
      // the occupancy audit for that superlinear plane: hot-bucket mass
      // here quantifies exactly how much the cap is clipping as density
      // grows — the number an operator reads before re-tuning the cap
      "simhash64_bucket_stats" -> (Queries.simhashBucketStats _),
      "embed_neardup" -> (Queries.embedNearDup _),
      // block-occupancy audit beside the blocked self-join: hot-block
      // vector mass growing with the corpus = the blocking key is
      // degenerating and the cap is eating near-dup recall
      "embed_block_stats" -> (Queries.embedBlockStats _),
      "ivf_topk" -> (Queries.ivfTopK _),
      // list-balance audit beside the probe path: skew (max/avg list)
      // rising with corpus growth = probe latency decoupling from the
      // nProbe budget — re-train centroids before trusting latency SLAs
      "ivf_list_balance" -> (Queries.ivfListBalance _),
      "quant_topk" -> (Queries.quantTopK _),
      // round 6: prefix-sum packing (shuffle = the one range exchange on
      // the 2-col projection → must grow linearly; a global-window
      // regression would show as a 1-partition stage, i.e. wall time
      // growing superlinearly while shuffle stays linear) and bloom decon
      // (corpus side scan-local: shuffle rows = surviving grams only)
      "pack_sequences" -> (Queries.packSequences _),
      "decontaminate_bloom" -> (Queries.decontaminateBloom _),
      // vocab: shuffle = per-doc distinct tokens (bounded by doc length);
      // label coherence: shuffle = L×dim centroid rows + 1 row/vector
      // from the map-side rank-1 limit; lang confusion: L² cells only
      "vocab_topk" -> (Queries.vocabTopK _),
      "label_coherence" -> (Queries.labelCoherence _),
      "lang_confusion" -> (Queries.langConfusion _),
      // round-6b: incremental dedup (candidates scale with the BATCH —
      // the new-doc gate must keep bucket expansion bounded), semdedup
      // CC over the blocked pair sliver, distinctive terms (shuffle =
      // per-doc distinct tokens + broadcast vocab join), source overlap
      // (pair-sliver joins only), embedding drift (2L×dim pre-aggregated
      // rows — corpus-size-independent shuffle)
      "incremental_dedup" -> (Queries.incrementalDedup _),
      "semdedup_keep" -> (Queries.semdedupKeep _),
      "distinctive_terms" -> (Queries.distinctiveTerms _),
      "source_overlap" -> (Queries.sourceOverlap _),
      "embed_drift" -> (Queries.embedDrift _),
      // winnow pairs: per-bucket expansion is cap²-bounded, bucket count
      // grows ~linearly; bigram topk: shuffle = per-doc distinct bigrams.
      // At 10× of THIS corpus winnow_pairs returns 0 rows — every
      // fingerprint runs past the absolute 2..50 bucket cap on the
      // tiny-vocab synthetic text — which is why the coverage audit runs
      // beside it: pair_coverage collapsing toward 0 is the observable
      // that says "re-tune the cap before trusting the pair output"
      "winnow_pairs" -> (Queries.winnowPairs _),
      "winnow_coverage" -> (Queries.winnowCoverage _),
      "bigram_topk" -> (Queries.bigramTopK _),
      // round 6: dsir/lm score (shuffle = exploded token/bigram stream →
      // linear in corpus tokens; the stats side must stay broadcast),
      // chunk dedup (ONE chunk-keyed shuffle; the hashed variant must
      // shuffle the same ROWS with smaller bytes), epoch order (one
      // shard-keyed window exchange), gopher rules (scan-local: ZERO
      // shuffle at any scale — any nonzero scaled count is a regression)
      "dsir_weights" -> (Queries.dsirWeights _),
      "lm_score" -> (Queries.lmScore _),
      "chunk_dedup" -> (Queries.chunkDedup _),
      "chunk_dedup_hashed" -> (Queries.chunkDedupHashed _),
      "epoch_order" -> (Queries.epochOrder _),
      "gopher_rules" -> (Queries.gopherRules _),
      // round 6d: v2 curation (rides the pair/decon/LM memos — its own
      // marginal shuffle is the survivor sliver), split leakage (pair
      // sliver rollup only), oov rate (token stream + broadcast vocab)
      "curate_v2" -> (Queries.curateV2 _),
      "split_leakage" -> (Queries.splitLeakage _),
      "oov_rate" -> (Queries.oovRate _),
      // round 7: substring dedup is count-based (two-level gram agg + a
      // hits join + doc-local windows) — shuffle rows must grow ~linearly
      // in corpus tokens; there is no pair expansion to go quadratic. The
      // hashed variant must shuffle the same ROWS at ~L× smaller bytes.
      "substring_dedup" -> (Queries.substringDedup _),
      "substring_dedup_hashed" -> (Queries.substringDedupHashed _),
      // BPE counts: training input is the vocab-bounded word table; the
      // corpus-scale shuffle is the exploded word stream + per-doc rollup
      // (broadcast segmentation join) — must stay ~linear
      "bpe_token_count" -> (Queries.bpeTokenCounts _),
      // the cut adds a token explode + a per-doc disjoint-interval join
      // over the span machinery — still ~linear in corpus tokens
      "substring_cut" -> (Queries.substringCut _),
      // postings-bounded retrieval: tf/df/scoring all run on the query
      // vocabulary's postings — shuffle ~linear in corpus tokens
      "bm25" -> (Queries.bm25TopK _),
      // broadcast eval slice, scan-local cosine pass; shuffle is the
      // hit-bounded rollup only
      "semantic_decon" -> (Queries.decontaminateSemantic _),
      // one source-keyed window exchange (rank-bounded map-side) + the
      // prefix-sum over the budget-bounded survivors — the survivor
      // count is budget-fixed, so shuffle should stay ~linear and the
      // pack side constant
      "training_mix" -> (Queries.trainingMix _),
      // marginal cost over the shared memos is the survivor sliver's
      // joins — same flat-to-linear expectation as curate_v2
      "curate_v3" -> (Queries.curateV3 _),
      // round 7b: rank-limited keyed shuffle over the memoized assignment
      // (the assignment pass itself is charged to the ANN phases)
      "cluster_sample" -> (Queries.clusterSample _),
      // round 7b: per-(band, hash-prefix) windows + metadata-scale offsets
      "curriculum_order" -> (Queries.curriculumOrder _),
      // round 7b: K aggregate scans (fit) + one scan-local score pass;
      // the per-step shuffle is d+2 longs per partition, corpus-invariant
      "classifier_scores" -> (Queries.classifierScores _),
      // round 7b: shuffle = per-source distinct tokens (vocab-bounded)
      "source_entropy" -> (Queries.sourceEntropy _),
      // round 7b: 64 broadcast hyperplanes; map-side partial collapses
      // the 64x expansion, so the exchange carries one row per vector
      "binary_hamming_topk" -> (Queries.binaryHammingTopK _),
      // round 7b: marginal over the shared memos = survivor sliver joins
      // + its banded windows (same claim as curate_v2/v3)
      "curate_v4" -> (Queries.curateV4 _),
      // round 7c: ground truth broadcasts the FIXED probe set over one
      // scan-local corpus pass — shuffle is the true-pair sliver plus
      // single-row aggregates, so growth must stay ~linear in corpus size
      "minhash_recall" -> (Queries.minhashRecall _),
      // round 7c: the O(len²) DP runs only on the memoized pair sliver —
      // shuffle is that sliver's two text-lookup joins, ~linear growth
      "edit_neardup" -> (Queries.editNearDup _),
      // round 7d: line dedup — two-level (line-hash, doc) partial agg +
      // hot-sliver anti-join + per-doc regroup; shuffle ~linear in corpus
      // lines (the hot set is threshold-bounded tiny)
      "line_dedup" -> (Queries.lineDedup _),
      // round 7d: MG sketch partial buffers are k-bounded, so the sketch
      // exchange is O(k·partitions) — corpus-size-INVARIANT; the confirm
      // pass hash-aggregates only the ≤k-candidate sliver. Wall time may
      // grow (two scans) but shuffle rows should stay ~flat
      "heavy_hitters" -> (Queries.heavyHitters _),
      // round 7d: one corpus-scale exchange (the bigram hash-agg, same
      // stream bigram_topk probes); everything downstream is
      // vocabulary(²)-bounded stat tables behind broadcasts
      "pmi_collocations" -> (Queries.pmiCollocations _),
      // round 7d: rides the cluster + LM memos (probe it AFTER dedup_keep
      // and lm_score to see the marginal cost) — one doc_id join and one
      // cluster-keyed partial-agg argmax
      "keep_best" -> (Queries.dedupKeepBest _),
      // round 7e: CDC chunk construction is in-row (zero exchange); the
      // shuffled rows are the chunk-keyed window + per-doc regroup —
      // ~linear in corpus tokens, same claim as chunk_dedup
      "cdc_dedup" -> (Queries.cdcDedup _),
      // round 7e: the fit reduces the corpus to dim+dim² sufficient
      // statistics (map-side combinable), so the exchange carries
      // dim²×partitions longs — corpus-size-INVARIANT, like the
      // classifier's per-step gradient; projection is scan-local
      "pca_project" -> (Queries.pcaProject _),
      // round 7e: envelope hash is scan-local; the only exchanges are the
      // banded candidate stage + the bounded pair sliver (image-plane twin)
      "audio_neardup" -> (Queries.audioNearDup _),
      // round 9: the commit-log maintained-index lifecycle end-to-end —
      // two batch appends (each scans only ITS batch against the frozen
      // codebook / term buckets), an OPTIMIZE commit over the inverted
      // lists, then the probe. Shuffle must stay ~linear in corpus size
      // (assignment + postings rollup); the probe side stays pruned to
      // the manifest's probe set at any scale
      "ivf_topk_maintained" -> (Queries.ivfTopKMaintained _),
      "bm25_maintained" -> (Queries.bm25TopKMaintained _))
      .filter { case (name, _) => only.forall(_.contains(name)) }

    val results = scala.collection.mutable.Map.empty[(String, String), (Double, Long, Long)]
    for (dir <- Seq(baseDir, scaledDir); (name, fn) <- phases) {
      settle()
      val s0 = meter.records.get()
      val t0 = System.nanoTime()
      // materialize via the noop sink (NOT count(): the optimizer prunes
      // count-independent subtrees — left joins against unique-keyed
      // aggregates, unread window/regex columns — and the probe would
      // measure a plan the real consumer never runs)
      val df = fn(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      settle()
      val sec = (System.nanoTime() - t0) / 1e9 - 0.8 // subtract the settle
      val shuffled = meter.records.get() - s0
      // row count AFTER the shuffle snapshot, so its jobs never pollute
      // the phase's shuffle attribution (cheap: memo/caches are warm)
      val rows = df.count()
      results((name, dir)) = (sec, shuffled, rows)
      println(s"""{"phase":"$name","dir":"$dir","sec":${math.rint(sec * 100) / 100},"shuffle_records":$shuffled,"rows":$rows}""")
      // cap-audit phases emit a handful of occupancy/coverage rows; print
      // them verbatim so the probe log records WHAT the caps clipped at
      // each scale, not just that the audit ran (cheap: memos are warm)
      if (rows <= 8)
        df.toJSON.collect().foreach(j => println(s"""{"phase":"$name","dir":"$dir","row":$j}"""))
      CacheBin.drain()
    }
    CacheBin.drainAll()

    println("--- ratios (scaled / base); corpus multiplier is the linear expectation")
    var worst = 0.0
    for ((name, _) <- phases) {
      val (bs, br, _) = results((name, baseDir))
      val (ss, sr, _) = results((name, scaledDir))
      val secRatio = if (bs > 0) ss / bs else 0
      // base = 0 shuffle records means the 1× plan was fully broadcast; if
      // the scaled run shuffles at all, that's a LOST broadcast shape, not
      // a pass — flag it with the absolute record count, never ratio 0
      val recRatio =
        if (br > 0) sr.toDouble / br
        else if (sr == 0) 1.0
        else sr.toDouble
      worst = math.max(worst, recRatio)
      println(f"""{"phase":"$name%s","sec_ratio":$secRatio%.1f,"shuffle_ratio":$recRatio%.1f}""")
    }
    println(s"""{"metric":"worst_shuffle_ratio","value":$worst}""")
    spark.stop()
  }
}
