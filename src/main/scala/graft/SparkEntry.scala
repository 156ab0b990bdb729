package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 is registered here as a query over
  * the driver testdata, with a DuckDB-runnable SQL twin in [[oracleSql]]
  * (omitted only for ops that SQL can't express — those get rows-only checks
  * and ScalaTest coverage instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The medallion end-to-end slice: normalize → validate → gold window
    * features (SURVEY.md §7.1 step 1).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.goldFeatures(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_norm_events" -> (Queries.normEvents _),
    "q_dedup_keeplast" -> (Queries.dedupKeepLast _),
    "q_gold_features" -> (Queries.goldFeatures _),
    "q_silver_merge" -> (Queries.silverMerge _),
    "q_dq_audit" -> (Queries.dqAudit _),
    "q_ge_audit" -> (Queries.geAudit _),
    "q_quarantine" -> (Queries.quarantine _),
    "q_count_by_type" -> (Queries.countByType _),
    "q_dup_props" -> (Queries.dupProps _),
    "q_coverage" -> (Queries.coverage _),
    "q_topk_users" -> (Queries.topkUsers _),
    "q_latest_day_monitor" -> (Queries.latestDayMonitor _),
    "q_sessionize" -> (Queries.sessionizeEvents _),
    "q_value_quantiles" -> (Queries.valueQuantiles _),
    "q_null_audit" -> (Queries.nullAudit _),
    "q_distinct_keys" -> (Queries.distinctKeys _),
    "q1_pricing_summary" -> (Queries.pricingSummary _),
    "q6_revenue_filter" -> (Queries.revenueFilter _),
    "q_revenue_by_nation" -> (Queries.revenueByNation _),
    "q_asof_purchase" -> (Queries.asofPurchase _),
    "q_trading_calendar" -> (Queries.tradingCalendar _),
    "q_trading_calendar_multiyear" -> (Queries.tradingCalendarMultiyear _),
    "q_month_chunks" -> (Queries.monthChunks _),
    "q_last_n_trading_days" -> (Queries.lastNTradingDays _),
    "q_trading_day_events" -> (Queries.tradingDayEvents _),
    "q_envelope" -> (Queries.envelope _),
    "q_day_filehash" -> (Queries.dayFileHash _),
    "q_docs_exact_dedup" -> (Queries.docsExactDedup _),
    "q_minhash_pairs" -> (Queries.minhashPairs _),
    "q_minhash_bucket_stats" -> (Queries.minhashBucketStats _),
    "q_minhash_recall" -> (Queries.minhashRecall _),
    "q_edit_neardup" -> (Queries.editNearDup _),
    "q_dedup_clusters" -> (Queries.dedupClusters _),
    "q_dedup_keep" -> (Queries.dedupKeep _),
    "q_simhash" -> (Queries.simhash _),
    "q_text_stats" -> (Queries.textStats _),
    "q_fingerprint" -> (Queries.fingerprint _),
    "q_cosine_topk" -> (Queries.cosineTopK _),
    "q_quant_topk" -> (Queries.quantTopK _),
    "q_quality_gate" -> (Queries.qualityGate _),
    "q_repetition" -> (Queries.repetition _),
    "q_l2_normalize" -> (Queries.l2Normalize _),
    "q_decontaminate" -> (Queries.decontaminate _),
    "q_decontaminate_bloom" -> (Queries.decontaminateBloom _),
    "q_pii_scrub" -> (Queries.piiScrub _),
    "q_unicode_normalize" -> (Queries.unicodeNormalize _),
    "q_quality_classifier" -> (Queries.qualityClassifier _),
    "q_classifier_scores" -> (Queries.classifierScores _),
    "q_source_entropy" -> (Queries.sourceEntropy _),
    "q_embed_binary" -> (Queries.embedBinary _),
    "q_binary_hamming_topk" -> (Queries.binaryHammingTopK _),
    "q_curate" -> (Queries.curate _),
    "q_hash_split" -> (Queries.hashSplit _),
    "q_stratified_sample" -> (Queries.stratifiedSample _),
    "q_cluster_sample" -> (Queries.clusterSample _),
    "q_ivf_assign" -> (Queries.ivfAssign _),
    "q_ivf_list_balance" -> (Queries.ivfListBalance _),
    "q_binary_meta" -> (Queries.binaryMeta _),
    "q_media_gate" -> (Queries.mediaGate _),
    "q_ngram_jaccard" -> (Queries.ngramJaccard _),
    "q_ngram_containment" -> (Queries.ngramContainment _),
    "q_embed_neardup" -> (Queries.embedNearDup _),
    "q_embed_block_stats" -> (Queries.embedBlockStats _),
    "q_simhash_hamming" -> (Queries.simhashHamming _),
    "q_simhash64" -> (Queries.simhash64 _),
    "q_simhash64_hamming" -> (Queries.simhashHamming64 _),
    "q_simhash64_bucket_stats" -> (Queries.simhashBucketStats _),
    "q_ivf_topk" -> (Queries.ivfTopK _),
    "q_ivf_topk_kmeans" -> (Queries.ivfTopKKmeans _),
    "q_ivf_topk_indexed" -> (Queries.ivfTopKIndexed _),
    "q_ivf_topk_maintained" -> (Queries.ivfTopKMaintained _),
    "q_backfill_window" -> (Queries.backfillWindow _),
    "q_token_count" -> (Queries.tokenCounts _),
    "q_pack_sequences" -> (Queries.packSequences _),
    "q_vocab_topk" -> (Queries.vocabTopK _),
    "q_label_coherence" -> (Queries.labelCoherence _),
    "q_winnow" -> (Queries.winnow _),
    "q_lang_id" -> (Queries.langId _),
    "q_lang_confusion" -> (Queries.langConfusion _),
    "q_source_overlap" -> (Queries.sourceOverlap _),
    "q_incremental_dedup" -> (Queries.incrementalDedup _),
    "q_distinctive_terms" -> (Queries.distinctiveTerms _),
    "q_embed_outliers" -> (Queries.embedOutliers _),
    "q_semdedup_keep" -> (Queries.semdedupKeep _),
    "q_length_histogram" -> (Queries.lengthHistogram _),
    "q_source_quality" -> (Queries.sourceQuality _),
    "q_shard_balance" -> (Queries.shardBalance _),
    "q_embed_drift" -> (Queries.embedDrift _),
    "q_ivf_quant_topk" -> (Queries.ivfQuantTopK _),
    "q_dedup_summary" -> (Queries.dedupSummary _),
    "q_winnow_pairs" -> (Queries.winnowPairs _),
    "q_winnow_coverage" -> (Queries.winnowCoverage _),
    "q_bigram_topk" -> (Queries.bigramTopK _),
    "q_token_budget_sample" -> (Queries.tokenBudgetSample _),
    "q_dsir_weights" -> (Queries.dsirWeights _),
    "q_mixture_weights" -> (Queries.mixtureWeights _),
    "q_chunk_dedup" -> (Queries.chunkDedup _),
    "q_ann_recall" -> (Queries.annRecall _),
    "q_lm_score" -> (Queries.lmScore _),
    "q_gopher_rules" -> (Queries.gopherRules _),
    "q_chunk_dedup_hashed" -> (Queries.chunkDedupHashed _),
    "q_cdc_dedup" -> (Queries.cdcDedup _),
    "q_cdc_dedup_hashed" -> (Queries.cdcDedupHashed _),
    "q_pca_components" -> (Queries.pcaComponents _),
    "q_pca_project" -> (Queries.pcaProject _),
    "q_line_dedup" -> (Queries.lineDedup _),
    "q_intradoc_dedup" -> (Queries.intraDocDedup _),
    "q_line_filter" -> (Queries.lineFilterDocs _),
    "q_heavy_hitters" -> (Queries.heavyHitters _),
    "q_pmi_collocations" -> (Queries.pmiCollocations _),
    "q_dedup_keep_best" -> (Queries.dedupKeepBest _),
    "q_epoch_order" -> (Queries.epochOrder _),
    "q_curriculum_order" -> (Queries.curriculumOrder _),
    "q_split_leakage" -> (Queries.splitLeakage _),
    "q_oov_rate" -> (Queries.oovRate _),
    "q_curate_v2" -> (Queries.curateV2 _),
    "q_substring_dedup" -> (Queries.substringDedup _),
    "q_substring_dedup_hashed" -> (Queries.substringDedupHashed _),
    "q_substring_stats" -> (Queries.substringStats _),
    "q_image_dhash" -> (Queries.imageDhash _),
    "q_image_neardup" -> (Queries.imageNearDup _),
    "q_audio_hash" -> (Queries.audioHash _),
    "q_audio_neardup" -> (Queries.audioNearDup _),
    "q_bpe_vocab" -> (Queries.bpeVocab _),
    "q_bpe_token_count" -> (Queries.bpeTokenCounts _),
    "q_pack_sequences_bpe" -> (Queries.packSequencesBpe _),
    "q_ivf_pq_topk" -> (Queries.ivfPqTopK _),
    "q_gold_view_sorted" -> (Queries.goldViewSorted _),
    "q_substring_cut" -> (Queries.substringCut _),
    "q_bm25_topk" -> (Queries.bm25TopK _),
    "q_decontaminate_semantic" -> (Queries.decontaminateSemantic _),
    "q_hybrid_rrf" -> (Queries.hybridRrf _),
    "q_chunk_windows" -> (Queries.chunkWindows _),
    "q_knn_label" -> (Queries.knnLabel _),
    "q_bpe_fertility" -> (Queries.bpeFertility _),
    "q_training_mix" -> (Queries.trainingMix _),
    "q_bm25_topk_indexed" -> (Queries.bm25TopKIndexed _),
    "q_bm25_topk_maintained" -> (Queries.bm25TopKMaintained _),
    "q_semantic_split_leakage" -> (Queries.semanticSplitLeakage _),
    "q_hard_negatives" -> (Queries.hardNegatives _),
    "q_lm_percentile_gate" -> (Queries.lmPercentileGate _),
    "q_cluster_split" -> (Queries.clusterSplit _),
    "q_curate_v3" -> (Queries.curateV3 _),
    "q_curate_v4" -> (Queries.curateV4 _),
    "q_classifier_eval" -> (Queries.classifierEval _),
    "q_dataset_manifest" -> (Queries.datasetManifest _),
    "q_corpus_card" -> (Queries.corpusCard _),
    "q_sequence_manifest" -> (Queries.sequenceManifest _),
    "q_table_history" -> (Queries.tableHistory _),
    "q_cdf_read" -> (Queries.cdfRead _),
    "q_time_travel" -> (Queries.timeTravel _),
    "q_table_evolve" -> (Queries.tableEvolve _),
    "q_table_drop" -> (Queries.tableDrop _),
    "q_table_skip" -> (Queries.tableSkip _),
    "q_table_dsv2" -> (Queries.tableDsv2 _),
    "q_table_spj" -> (Queries.tableSpj _),
    "q_table_merge_sql" -> (Queries.tableMergeSql _),
    "q_table_dml_sql" -> (Queries.tableDmlSql _),
    "q_table_meta_cols" -> (Queries.tableMetaCols _),
    "q_table_view_sql" -> (Queries.tableViewSql _),
    "q_table_stream" -> (Queries.tableStreamData _),
    "q_table_sink" -> (Queries.tableStreamSink _),
    "q_table_bloom" -> (Queries.tableBloom _),
    "q_table_update" -> (Queries.tableUpdate _),
    "q_table_lazy_delete" -> (Queries.tableLazyDelete _),
    "q_table_clone" -> (Queries.tableClone _),
    "q_table_ckpt" -> (Queries.tableCkpt _),
    "q_table_agg" -> (Queries.tableAgg _),
    "q_table_agg_group" -> (Queries.tableAggGroup _),
    "q_table_multipart" -> (Queries.tableMultipart _),
    "q_table_convert" -> (Queries.tableConvert _),
    "q_table_convert_delta" -> (Queries.tableConvertDelta _),
    "q_table_generated" -> (Queries.tableGenerated _),
    "q_delta_dv_read" -> (Queries.deltaDvRead _),
    "q_delta_adopt_dv" -> (Queries.deltaAdoptDv _),
    "q_delta_cdf_bridge" -> (Queries.deltaCdfBridge _),
    "q_delta_reconcile" -> (Queries.deltaReconcile _),
    "q_delta_cdf_stream" -> (Queries.deltaCdfStream _),
    "q_delta_silver_medallion" -> (Queries.deltaSilverMedallion _),
    "q_table_cdf_ts" -> (Queries.tableCdfTs _),
    "q_table_cdf" -> (Queries.tableCdf _),
    "q_table_sql" -> (Queries.tableSql _),
  )

  /** Shared gram/count/pair/intersection CTEs for the n-gram overlap
    * oracles (`q_ngram_jaccard`, `q_ngram_containment`) — the DuckDB
    * mirror of `MinHashDedup.ngramOverlap`'s shared join pipeline.
    */
  private val ngramOverlapCtes: String =
    """g AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
               i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))) AS ngram
           FROM documents WHERE len(string_split(text, ' ')) >= 3),
         cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_g FROM g GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
         inter AS (
           SELECT p.doc_a, p.doc_b, count(*) AS n_inter
           FROM pairs p
           JOIN g ga ON ga.doc_id = p.doc_a
           JOIN g gb ON gb.doc_id = p.doc_b AND gb.ngram = ga.ngram
           GROUP BY p.doc_a, p.doc_b)"""

  /** Shared trigram-score CTE + decision CASE for the language oracles
    * (`q_lang_id`, `q_lang_confusion`) — mirrors `TextOps.langScores`/
    * `langPred`, one definition each side.
    */
  private val langScoreCte: String =
    """sc AS (
           SELECT doc_id,
             CAST((length(lower(text)) - length(replace(lower(text), 'the', '')))
               + (length(lower(text)) - length(replace(lower(text), 'and', '')))
               + (length(lower(text)) - length(replace(lower(text), 'ing', '')))
               + (length(lower(text)) - length(replace(lower(text), 'ion', '')))
               + (length(lower(text)) - length(replace(lower(text), ' of', ''))) AS BIGINT) AS score_en,
             CAST((length(lower(text)) - length(replace(lower(text), 'der', '')))
               + (length(lower(text)) - length(replace(lower(text), 'sch', '')))
               + (length(lower(text)) - length(replace(lower(text), 'ein', '')))
               + (length(lower(text)) - length(replace(lower(text), 'ich', '')))
               + (length(lower(text)) - length(replace(lower(text), 'und', ''))) AS BIGINT) AS score_de,
             CAST((length(lower(text)) - length(replace(lower(text), 'les', '')))
               + (length(lower(text)) - length(replace(lower(text), 'ent', '')))
               + (length(lower(text)) - length(replace(lower(text), 'que', '')))
               + (length(lower(text)) - length(replace(lower(text), 'des', '')))
               + (length(lower(text)) - length(replace(lower(text), 'ais', ''))) AS BIGINT) AS score_fr
           FROM documents)"""

  private val langCaseSql: String =
    """CASE WHEN score_en >= score_de AND score_en >= score_fr THEN 'en'
                WHEN score_de >= score_fr THEN 'de' ELSE 'fr' END"""

  /** Shared CTE prefix for the MinHash dedup oracles: shingles →
    * signatures → banding → capped buckets → candidate pairs → exact
    * Jaccard ≥ 0.5 edges → transitive reach (the DuckDB mirror of the
    * session-memoized pipeline both consumers ride in Spark).
    */
  private val minhashReachCte: String =
    """WITH RECURSIVE sh AS (
           SELECT DISTINCT doc_id, substr(text, p, 16) AS shingle
           FROM (SELECT doc_id, text,
                   unnest(generate_series(1, length(text) - 15)) AS p
                 FROM documents WHERE length(text) >= 16) t),
         hashed AS (SELECT doc_id, sha256(shingle) AS h FROM sh),
         sig AS (
           SELECT doc_id,
             min(substr(h, 1, 8)) AS m0, min(substr(h, 9, 8)) AS m1,
             min(substr(h, 17, 8)) AS m2, min(substr(h, 25, 8)) AS m3,
             min(substr(h, 33, 8)) AS m4, min(substr(h, 41, 8)) AS m5,
             min(substr(h, 49, 8)) AS m6, min(substr(h, 57, 8)) AS m7
           FROM hashed GROUP BY doc_id),
         bands AS (
           SELECT doc_id, 0 AS band, m0 || m1 AS sig FROM sig
           UNION ALL SELECT doc_id, 1, m2 || m3 FROM sig
           UNION ALL SELECT doc_id, 2, m4 || m5 FROM sig
           UNION ALL SELECT doc_id, 3, m6 || m7 FROM sig),
         ok AS (SELECT band, sig FROM bands GROUP BY band, sig
                HAVING count(*) BETWEEN 2 AND 50),
         inok AS (SELECT b.* FROM bands b JOIN ok USING (band, sig)),
         pairs AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM inok a JOIN inok b
             ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         inter AS (
           SELECT p.doc_a, p.doc_b, count(*) AS n_inter
           FROM pairs p
           JOIN sh sa ON sa.doc_id = p.doc_a
           JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
           GROUP BY p.doc_a, p.doc_b),
         jac AS (
           SELECT p.doc_a, p.doc_b,
             CAST(coalesce(i.n_inter, 0) AS DOUBLE)
               / (ca.n_sh + cb.n_sh - coalesce(i.n_inter, 0)) AS jaccard
           FROM pairs p
           LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
           JOIN cnt ca ON ca.doc_id = p.doc_a
           JOIN cnt cb ON cb.doc_id = p.doc_b),
         e AS (
           SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.5
           UNION ALL
           SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.5),
         reach(doc_id, label) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, r.label FROM reach r JOIN e ON e.src = r.doc_id)"""

  // --- shared curation-oracle fragments: every threshold, pattern, and
  // seed string below reads the SAME constants the Spark queries use
  // (Queries.Quality*/Decon*/Split*/PiiSeedSuffix, TextOps.piiPatterns),
  // so the standalone oracles and the composed q_curate cannot diverge.

  private val qualityStatsCtes: String =
    """qt AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
             CAST(len(list_filter(string_split(text, ' '),
                      x -> x = 'the' OR x = 'a')) AS BIGINT) AS n_stopwords
           FROM documents),
         qs AS (
           SELECT doc_id, n_tokens,
             CAST(n_stopwords AS DOUBLE) / n_tokens AS stop_ratio,
             CAST(n_uniq_tokens AS DOUBLE) / n_tokens AS uniq_ratio,
             (CAST(n_stopwords AS DOUBLE) / n_tokens) * 0.5
               + CAST(least(n_tokens, 100) AS DOUBLE) / 100.0 * 0.3
               + (CAST(n_uniq_tokens AS DOUBLE) / n_tokens) * 0.2 AS quality_score
           FROM qt)"""

  private val qualityKeepPred: String =
    s"(n_tokens >= ${Queries.QualityMinTokens} AND n_tokens <= ${Queries.QualityMaxTokens}" +
      s" AND stop_ratio >= ${Queries.QualityMinStopRatio}" +
      s" AND uniq_ratio >= ${Queries.QualityMinUniqRatio})"

  /** Gopher signal CTEs (`gps` counts → `gpm` ratios) + the four-rule keep
    * conjunction over `gpm`'s columns — shared by q_gopher_rules and the
    * curriculum-band oracle so the rule set is written once.
    */
  private val gopherCtes: String =
    """gps AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
               ['the', 'a'])) AS BIGINT) AS n_distinct_stop
           FROM documents),
         gpm AS (
           SELECT doc_id, n_tokens, n_distinct_stop,
             CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len,
             CAST(1 AS DOUBLE) - CAST(n_uniq AS DOUBLE) / n_tokens AS repeat_ratio
           FROM gps)"""

  private val gopherKeepPred: String =
    s"""((n_tokens BETWEEN ${Queries.GopherMinTokens} AND ${Queries.GopherMaxTokens})
             AND avg_token_len >= ${Queries.GopherMinAvgTokLen}
             AND avg_token_len <= ${Queries.GopherMaxAvgTokLen}
             AND repeat_ratio <= ${Queries.GopherMaxRepeatRatio}
             AND n_distinct_stop >= ${Queries.GopherMinDistinctStop})"""

  /** The classifier fit, unrolled: feature CTE (the same shared
    * quality/gopher stat fragments), then per step one gradient aggregate
    * + one weight update — every float expression written in the exact
    * association the Scala side uses, every per-row gradient term
    * floor-quantized to 1e-9 and summed as BIGINTs, weights
    * floor-quantized to 1e-6 per step. `cw` ends holding the final
    * weights; requires qualityStatsCtes + gopherCtes in scope.
    */
  private val classifierZ =
    "w.wb + w.w1*f.f1 + w.w2*f.f2 + w.w3*f.f3 + w.w4*f.f4 + w.w5*f.f5"

  private val classifierCtes: String = {
    val lr = Queries.ClassifierLr
    val p = s"(1.0/(1.0+exp(-($classifierZ))))"
    // centered at fixed constants, ×4-scaled, squared length term in a
    // second stage so f5 is built from the IDENTICAL f3 double
    val feats = s"""cfeats0 AS (
           SELECT qs.doc_id,
             (qs.stop_ratio - 0.05)*4.0 AS f1,
             (qs.uniq_ratio - 0.5)*4.0 AS f2,
             (CAST(least(qs.n_tokens, 100) AS DOUBLE) / 100.0 - 0.5)*4.0 AS f3,
             (gpm.avg_token_len / 10.0 - 0.5)*4.0 AS f4,
             CASE WHEN cqk.qkeep THEN 1.0 ELSE 0.0 END AS y
           FROM qs JOIN gpm USING (doc_id)
             JOIN (SELECT doc_id, $qualityKeepPred AS qkeep FROM qs) cqk
               USING (doc_id)),
         cfeats AS MATERIALIZED (SELECT *, f3*f3 AS f5 FROM cfeats0)"""
    val w0 = "cw0 AS (SELECT 0.0 AS wb, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4, 0.0 AS w5)"
    def gradTerm(x: String) =
      s"CAST(SUM(CAST(floor((p - y)$x*1000000000.0) AS BIGINT)) AS BIGINT)"
    def upd(wCol: String, gCol: String) =
      s"floor((w.$wCol - $lr*((CAST(g.$gCol AS DOUBLE)/1000000000.0)/g.n))*1000000.0)/1000000.0 AS $wCol"
    val steps = (1 to Queries.ClassifierSteps).map { k =>
      s"""cg$k AS MATERIALIZED (
           SELECT CAST(count(*) AS BIGINT) AS n,
             ${gradTerm("")} AS gb,
             ${(1 to 5).map(j => gradTerm(s"*f$j") + s" AS g$j").mkString(",\n             ")}
           FROM (SELECT f.*, $p AS p FROM cfeats f CROSS JOIN cw${k - 1} w) t),
         cw$k AS MATERIALIZED (
           SELECT ${upd("wb", "gb")},
             ${(1 to 5).map(j => upd(s"w$j", s"g$j")).mkString(",\n             ")}
           FROM cw${k - 1} w CROSS JOIN cg$k g)"""
    }
    val last = s"cw AS (SELECT * FROM cw${Queries.ClassifierSteps})"
    (Seq(feats, w0) ++ steps :+ last).mkString(",\n         ")
  }

  /** The scoring expression over `cfeats f CROSS JOIN cw w` — shared by
    * the weights and scores oracles' final SELECTs.
    */
  private val classifierScoreSql: String =
    s"floor((1.0/(1.0+exp(-($classifierZ))))*1000000.0)/1000000.0"

  private val deconGramExpr: String = (0 until Queries.DeconN)
    .map(j => if (j == 0) "ws[i]" else s"ws[i+$j]").mkString(", ")

  private val deconCtes: String =
    s"""cg AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, len(ws) - ${Queries.DeconN - 1}),
               i -> concat_ws(' ', $deconGramExpr))) AS gram
           FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t
           WHERE len(ws) >= ${Queries.DeconN}),
         bg AS (SELECT DISTINCT gram FROM cg
                WHERE doc_id < ${Queries.DeconBenchmarkMaxId}),
         contaminated AS (
           SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
           FROM cg c JOIN bg USING (gram)
           GROUP BY c.doc_id HAVING count(*) >= ${Queries.DeconMinOverlap})"""

  /** Dense cosine top-k oracle CTE chain (decimal-exact dots, rank with
    * id tiebreak — mirrors Similarity.cosineTopK): terminal CTE `cr`
    * carries `(query_id, neighbor_id, cosine, rank)`. Parameterized so
    * q_cosine_topk (queries < AnnNumQueries), q_knn_label (same), and
    * q_hybrid_rrf's dense side (queries < Bm25NQueries) share one
    * definition.
    */
  private def cosineRankCtes(maxQueryId: Long, k: Int): String =
    s"""cn2 AS (
         SELECT vec_id, embedding,
           CAST(list_sum(list_transform(embedding,
             x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
             AS DOUBLE) AS nn
         FROM embeddings),
       cq AS (SELECT vec_id AS query_id, embedding AS qv, nn AS qn FROM cn2
         WHERE vec_id < $maxQueryId),
       cc AS (SELECT vec_id AS neighbor_id, embedding AS nv, nn AS cn FROM cn2),
       cp AS (
         SELECT cq.query_id, cc.neighbor_id,
           CAST(list_sum(list_transform(list_zip(cq.qv, cc.nv),
             z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
             AS DOUBLE) / (sqrt(cq.qn) * sqrt(cc.cn)) AS cosine
         FROM cq, cc WHERE cc.neighbor_id <> cq.query_id),
       cr AS (SELECT query_id, neighbor_id, cosine, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id) AS rank FROM cp) t
         WHERE rank <= $k)"""

  /** LM bigram-score oracle CTE chain (see q_lm_score): terminal CTE
    * `lmr` carries `(doc_id, n_bigrams, lm_score)`; shared with the
    * percentile gate so the score definition cannot diverge.
    */
  private val lmScoreCtes: String =
    """d AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       bi AS (
         SELECT doc_id, unnest(generate_series(1, len(w) - 1)) AS i, w
         FROM d WHERE len(w) >= 2),
       b2 AS (
         SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM bi),
       bc AS (
         SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
         FROM b2 GROUP BY w1, w2),
       pc AS (
         SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM b2 GROUP BY w1),
       v AS (
         SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM (
           SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
       sc AS (
         SELECT b2.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CAST(
             CAST(bc.c12 + 1 AS DOUBLE) / CAST(pc.c1 + v.v AS DOUBLE)
             AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS lm_score
         FROM b2 JOIN bc USING (w1, w2) JOIN pc USING (w1) CROSS JOIN v
         GROUP BY b2.doc_id),
       lmr AS (
         SELECT d.doc_id,
           coalesce(sc.n_bigrams, 0) AS n_bigrams, sc.lm_score
         FROM d LEFT JOIN sc USING (doc_id))"""

  /** BM25 oracle CTE chain (see q_bm25_topk for the determinism notes);
    * terminal CTE `bmr` carries the ranked lists, reused verbatim by the
    * q_hybrid_rrf fusion so sparse ranks cannot diverge between the
    * standalone query and the hybrid.
    */
  private val bm25Ctes: String = {
    val nq = Queries.Bm25NQueries
    val qtn = Queries.Bm25QueryTerms
    val k1 = Queries.Bm25K1
    val k1p1 = Queries.Bm25K1 + 1.0
    val oneMb = 1.0 - Queries.Bm25B
    val b = Queries.Bm25B
    val k = Queries.Bm25TopK
    s"""base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       s AS (SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(len(toks)) AS BIGINT) AS total FROM base),
       qe AS (SELECT doc_id AS query_id,
           unnest(generate_series(1, len(toks))) AS p,
           unnest(toks) AS term
         FROM base WHERE doc_id < $nq),
       qt AS (SELECT query_id, term FROM (
           SELECT query_id, term,
             row_number() OVER (PARTITION BY query_id
               ORDER BY min(p), term) AS rn
           FROM qe GROUP BY query_id, term) t
         WHERE rn <= $qtn),
       tk AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
           unnest(toks) AS term FROM base),
       tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
           max(dl) AS dl
         FROM tk WHERE term IN (SELECT term FROM qt)
         GROUP BY doc_id, term),
       dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         FROM tf GROUP BY term),
       sc AS (SELECT qt.query_id, tf.doc_id,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(CAST(
             ((CAST(s.n AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)
                / (CAST(dfq.df AS DOUBLE) + 0.5))
             * (CAST(tf.tf AS DOUBLE) * $k1p1
                / (CAST(tf.tf AS DOUBLE) + $k1 * ($oneMb
                   + $b * CAST(tf.dl AS DOUBLE) * CAST(s.n AS DOUBLE)
                     / CAST(s.total AS DOUBLE))))
             AS DECIMAL(28,12))) AS DOUBLE) AS score
         FROM tf JOIN dfq USING (term) JOIN qt USING (term) CROSS JOIN s
         WHERE tf.doc_id <> qt.query_id
         GROUP BY qt.query_id, tf.doc_id),
       bmr AS (SELECT query_id, doc_id, n_terms, score, rank
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, doc_id) AS rank FROM sc) r
         WHERE rank <= $k)"""
  }

  private val piiSeededCte: String =
    s"""seeded AS (
           SELECT doc_id,
             text || CASE WHEN doc_id % 10 = 0
               THEN '${Queries.PiiSeedSuffix}'
               ELSE '' END AS text
           FROM documents)"""

  /** The scrub cascade over `textExpr`, generated from the SAME pattern
    * list the Spark side folds over (order included).
    */
  private def scrubCleanSql(textExpr: String): String =
    graft.llm.TextOps.piiPatterns.foldLeft(textExpr) {
      case (acc, (_, pat, repl)) => s"regexp_replace($acc, '$pat', '$repl', 'g')"
    }

  private val piiCountsSql: String =
    graft.llm.TextOps.piiPatterns.map { case (cat, pat, _) =>
      s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$cat"
    }.mkString(",\n           ")

  private def splitBucketSql(idExpr: String): String =
    s"CAST(concat('0x', substr(sha256(concat(CAST($idExpr AS VARCHAR), " +
      s"'${Queries.SplitSalt}')), 1, 8)) AS BIGINT) % 100"

  private def splitCaseSql(idExpr: String): String =
    s"CASE WHEN ${splitBucketSql(idExpr)} < ${Queries.SplitPctTrain} " +
      "THEN 'train' ELSE 'holdout' END"

  /** Shared chunk-dedup oracle: q_chunk_dedup (text-keyed shuffle) and
   * q_chunk_dedup_hashed (xxhash64-keyed shuffle) produce identical rows,
   * so both verify against one SQL.
   */
  /** PCA oracle CTE chain: re-derives Pca.fit operation-for-operation —
    * quantized-BIGINT mean and Gram sums, then Queries.PcaSteps unrolled
    * power-iteration steps per component with 1e-9 re-quantization of the
    * iterate each step (w{c}_{s} = quantized matvec, n{c}_{s} = its norm,
    * v{c}_{s} = the normalized re-quantized iterate), then quantized
    * deflation between components. Both engines execute the same IEEE
    * operation sequence, so loadings compare bit-identically (sqrt and
    * division are exactly rounded under IEEE-754; every SUM is integer).
    */
  private def pcaCtes: String = {
    val steps = Queries.PcaSteps
    val comps = Queries.PcaComponents
    val sb = new StringBuilder
    sb.append(s"""
         WITH nrows AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
         dims AS MATERIALIZED (SELECT unnest(generate_series(1,
           (SELECT len(embedding) FROM embeddings LIMIT 1))) AS j),
         coords AS MATERIALIZED (
           SELECT vec_id, unnest(generate_series(1, len(embedding))) AS j,
             unnest(list_transform(generate_series(1, len(embedding)),
               t -> CAST(embedding[t] AS DOUBLE))) AS x
           FROM embeddings),
         m AS MATERIALIZED (
           SELECT j, CAST(CAST(sum(CAST(floor(x * 1000000.0) AS BIGINT)) AS BIGINT)
             AS DOUBLE) / 1000000.0 / (SELECT n FROM nrows) AS m
           FROM coords GROUP BY j),
         cc AS MATERIALIZED (SELECT c.vec_id, c.j, c.x - m.m AS cx
           FROM coords c JOIN m ON c.j = m.j),
         g1 AS MATERIALIZED (
           SELECT a.j AS i, b.j AS j,
             CAST(CAST(sum(CAST(floor(a.cx * b.cx * 1000000.0) AS BIGINT)) AS BIGINT)
               AS DOUBLE) / 1000000.0 / (SELECT n FROM nrows) AS gv
           FROM cc a JOIN cc b USING (vec_id) GROUP BY a.j, b.j)""")
    for (c <- 1 to comps) {
      sb.append(s""",
         v${c}_0 AS MATERIALIZED (SELECT j, 0.125 AS v FROM dims)""")
      for (s <- 1 to steps) {
        sb.append(s""",
         w${c}_$s AS MATERIALIZED (
           SELECT g.i AS j, CAST(sum(CAST(floor(g.gv * v.v * 1000000000.0)
             AS BIGINT)) AS BIGINT) AS wq
           FROM g$c g JOIN v${c}_${s - 1} v ON g.j = v.j GROUP BY g.i),
         n${c}_$s AS MATERIALIZED (
           SELECT sqrt(CAST(CAST(sum(CAST(floor(
             (CAST(wq AS DOUBLE) / 1000000000.0) *
             (CAST(wq AS DOUBLE) / 1000000000.0) * 1000000000.0) AS BIGINT))
             AS BIGINT) AS DOUBLE) / 1000000000.0) AS nrm FROM w${c}_$s),
         v${c}_$s AS MATERIALIZED (
           SELECT j, floor(CAST(wq AS DOUBLE) / 1000000000.0 /
             (SELECT nrm FROM n${c}_$s) * 1000000000.0) / 1000000000.0 AS v
           FROM w${c}_$s)""")
      }
      if (c < comps) sb.append(s""",
         g${c + 1} AS MATERIALIZED (
           SELECT g.i, g.j, g.gv - floor((SELECT nrm FROM n${c}_$steps) *
             vi.v * vj.v * 1000000000.0) / 1000000000.0 AS gv
           FROM g$c g JOIN v${c}_$steps vi ON g.i = vi.j
           JOIN v${c}_$steps vj ON g.j = vj.j)""")
    }
    sb.toString
  }

  private val pcaComponentsSql: String = {
    val steps = Queries.PcaSteps
    val selects = (1 to Queries.PcaComponents).map { c =>
      s"""SELECT CAST($c AS INTEGER) AS component, CAST(v.j AS INTEGER) AS dim_idx,
           v.v AS loading, (SELECT nrm FROM n${c}_$steps) AS eigenvalue,
           m.m AS dim_mean
         FROM v${c}_$steps v JOIN m ON v.j = m.j"""
    }.mkString("\n         UNION ALL\n         ")
    s"$pcaCtes\n         $selects"
  }

  private val pcaProjectSql: String = {
    val steps = Queries.PcaSteps
    val pcCols = (1 to Queries.PcaComponents).map { c =>
      s"""CAST(CAST(sum(CAST(floor(cc.cx * p$c.v * 1000000000.0) AS BIGINT))
           AS BIGINT) AS DOUBLE) / 1000000000.0 AS pc$c"""
    }.mkString(",\n           ")
    val joins = (1 to Queries.PcaComponents).map { c =>
      s"JOIN v${c}_$steps p$c ON cc.j = p$c.j"
    }.mkString(" ")
    s"""$pcaCtes
         SELECT cc.vec_id, $pcCols
         FROM cc $joins
         GROUP BY cc.vec_id"""
  }

  private val chunkDedupSql: String = (s"""
         WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         c AS (
           SELECT doc_id,
             unnest(generate_series(1,
               CAST(ceil(len(toks) / ${Queries.ChunkDedupTokens}.0) AS BIGINT))) AS idx,
             unnest(list_transform(
               generate_series(1,
                 CAST(ceil(len(toks) / ${Queries.ChunkDedupTokens}.0) AS BIGINT)),
               i -> array_to_string(list_slice(toks,
                 (i - 1) * ${Queries.ChunkDedupTokens} + 1,
                 least(i * ${Queries.ChunkDedupTokens}, len(toks))), ' '))) AS chunk
           FROM d),
         k AS (
           SELECT doc_id, idx, chunk,
             row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
           FROM c),
         kept AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(chunk, ' ' ORDER BY idx) AS kept_text
           FROM k WHERE rn = 1 GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(ceil(len(d.toks) / ${Queries.ChunkDedupTokens}.0) AS BIGINT) AS n_chunks,
           coalesce(kept.n_kept, 0) AS n_kept,
           coalesce(kept.kept_text, '') AS kept_text
         FROM d LEFT JOIN kept USING (doc_id)""")

  /** Content-defined-chunking oracle: replays ChunkDedup.cdcChunkList's
    * boundary rule (sha256 of the trailing CdcWindow-token gram starts
    * with a hex digit below CdcHexDigits) with DuckDB list lambdas, then
    * the same first-occurrence window + reassembly as chunkDedupSql.
    * DuckDB's sha256() and Spark's sha2(…, 256) both emit lowercase hex,
    * so the boundary predicate is engine-identical by construction.
    */
  private val cdcDedupSql: String = {
    val w = Queries.CdcWindow
    val boundaryChars =
      (0 until Queries.CdcHexDigits).map(d => s"'${d.toHexString}'").mkString(", ")
    (s"""
         WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         b AS (
           SELECT doc_id, toks,
             list_filter(generate_series($w, greatest(len(toks) - 1, $w)), i ->
               i + 1 <= len(toks) AND
               substr(sha256(array_to_string(
                 list_slice(toks, i - $w + 1, i), ' ')), 1, 1) IN ($boundaryChars)) AS bnds
           FROM d),
         c AS (
           SELECT doc_id,
             unnest(generate_series(1, len(bnds) + 1)) AS idx,
             unnest(list_transform(generate_series(0, len(bnds)), k ->
               array_to_string(list_slice(toks,
                 CASE WHEN k = 0 THEN 1 ELSE bnds[k] + 1 END,
                 CASE WHEN k = len(bnds) THEN len(toks) ELSE bnds[k + 1] END),
                 ' '))) AS chunk
           FROM b),
         k AS (
           SELECT doc_id, idx, chunk,
             row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
           FROM c),
         kept AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(chunk, ' ' ORDER BY idx) AS kept_text
           FROM k WHERE rn = 1 GROUP BY doc_id)
         SELECT b.doc_id,
           CAST(len(b.bnds) + 1 AS BIGINT) AS n_chunks,
           coalesce(kept.n_kept, 0) AS n_kept,
           coalesce(kept.kept_text, '') AS kept_text
         FROM b LEFT JOIN kept USING (doc_id)""")
  }

  /** A seed string with embedded newlines as a SQL concat of its lines
    * joined by chr(10) — no raw control characters ride the SQL text
    * (same convention as the unicode-seed chr() spelling).
    */
  private def seedLinesSql(s: String): String =
    s.split("\n").map(l => s"'$l'").mkString(" || chr(10) || ")

  /** The multiline corpus view (Queries.multilineDocs replayed in SQL):
    * text re-wrapped at LineWrapTokens tokens per line + the seeded
    * boilerplate/junk/duplicate lines on the same doc_id residues. `ml`
    * carries the split line list, `pl` the per-line rows with 1-based
    * positions — shared by all three line-plane oracles.
    */
  private val mLinesCtes: String = {
    val wrapPat = s"((?:\\S+ ){${Queries.LineWrapTokens - 1}}\\S+) "
    s"""mdocs AS (
           SELECT doc_id,
             regexp_replace(text, '$wrapPat', '\\1' || chr(10), 'g')
             || CASE WHEN doc_id % 7 = 2
               THEN chr(10) || '${Queries.LineSeedBoiler}' ELSE '' END
             || CASE WHEN doc_id % 11 = 5
               THEN chr(10) || ${seedLinesSql(Queries.LineSeedJunk)} ELSE '' END
             || CASE WHEN doc_id % 13 = 1
               THEN chr(10) || '${Queries.LineSeedDup}' || chr(10) ||
                 '${Queries.LineSeedDup}' ELSE '' END AS text
           FROM documents),
         ml AS (
           SELECT doc_id, string_split(text, chr(10)) AS ls FROM mdocs),
         pl AS (
           SELECT doc_id, unnest(ls) AS line,
             generate_subscripts(ls, 1) AS pos
           FROM ml)"""
  }

  /** The LineOps.lineKeep predicate over a SQL line expression `x` —
    * single-sourced thresholds; the lambda body of the line-filter oracle.
    */
  private def lineKeepSql(x: String): String =
    s"len(string_split($x, ' ')) >= ${Queries.LineFilterMinTokens} " +
      s"AND NOT starts_with($x, '- ') AND NOT starts_with($x, '* ') " +
      s"AND 2 * length(regexp_replace($x, '[^A-Z]', '', 'g')) <= " +
      s"length(regexp_replace($x, '[^A-Za-z]', '', 'g'))"

  /** IVF CTE chain (`n2` → … → `pairs`) WITHOUT the final rank-select —
    * shared by `q_ivf_topk`/`q_ivf_topk_indexed` (which rank to top-10)
    * and `q_ann_recall` (which joins the ranked set against brute force).
    */
  private val ivfPairsCtes: String =
    """n2 AS (
         SELECT vec_id, embedding,
           CAST(list_sum(list_transform(embedding,
             x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
             AS DOUBLE) AS nn
         FROM embeddings),
       c AS (
         SELECT vec_id AS centroid_id, embedding AS cv, nn AS cn FROM n2
         QUALIFY row_number() OVER (ORDER BY vec_id) <=
           CAST(ceil(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)),
       pc AS (
         SELECT vec_id AS neighbor_id, embedding AS nv, nn, centroid_id FROM (
           SELECT v.vec_id, v.embedding, v.nn, c.centroid_id,
             row_number() OVER (PARTITION BY v.vec_id ORDER BY
               v.nn + c.cn - 2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
                 z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
                 AS DOUBLE), c.centroid_id) AS rn
           FROM n2 v, c) t
         WHERE rn = 1),
       qp AS (
         SELECT vec_id AS query_id, embedding AS qv, nn AS qn, centroid_id FROM (
           SELECT v.vec_id, v.embedding, v.nn, c.centroid_id,
             row_number() OVER (PARTITION BY v.vec_id ORDER BY
               v.nn + c.cn - 2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
                 z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
                 AS DOUBLE), c.centroid_id) AS rn
           FROM (SELECT * FROM n2 WHERE vec_id < 5) v, c) t
         WHERE rn <= 3),
       pairs AS (
         SELECT qp.query_id, pc.neighbor_id,
           CAST(list_sum(list_transform(list_zip(qp.qv, pc.nv),
             z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
             AS DOUBLE) / (sqrt(qp.qn) * sqrt(pc.nn)) AS cosine
         FROM qp JOIN pc
           ON qp.centroid_id = pc.centroid_id AND pc.neighbor_id <> qp.query_id)"""

  /** Sign-LSH binary-code CTEs: deterministic hyperplanes from the
    * shared sha256 top-bit rule ("first hex char < '8'"), decimal-exact
    * projections, HUGEINT bit-sum wrapped to the signed BIGINT Spark's
    * LongType carries (same wrap trick as the simhash64 oracle).
    */
  private val binaryCodeCtes: String =
    """edim AS (SELECT CAST(max(len(embedding)) AS INT) AS d FROM embeddings),
       ehp AS (
         SELECT j.j AS j, i.i AS i,
           CASE WHEN substr(sha256('hp:' || j.j || ':' || i.i), 1, 1) < '8'
             THEN 1.0 ELSE -1.0 END AS s
         FROM (SELECT unnest(generate_series(0, 63)) AS j) j,
              (SELECT unnest(generate_series(0, (SELECT d FROM edim) - 1)) AS i) i),
       ehpl AS (SELECT j, list(s ORDER BY i) AS hv FROM ehp GROUP BY j),
       ebits AS (
         SELECT e.vec_id, h.j,
           CASE WHEN CAST(list_sum(list_transform(list_zip(e.embedding, h.hv),
             z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
             AS DOUBLE) > 0.0 THEN 1 ELSE 0 END AS s
         FROM embeddings e CROSS JOIN ehpl h),
       ecode AS (
         SELECT vec_id,
           CAST(CASE WHEN uv >= 9223372036854775808 THEN uv - 18446744073709551616
                     ELSE uv END AS BIGINT) AS code64
         FROM (SELECT vec_id, sum(CAST(s AS HUGEINT) << CAST(63 - j AS INT)) AS uv
               FROM ebits GROUP BY vec_id) u)"""

  /** The full v3 curation chain as a reusable fragment ending in the
    * survivor CTE `cv3 (doc_id, clean, split)` — q_curate_v3 selects it
    * verbatim; q_curate_v4 composes the classifier gate on top.
    */
  private val curateV3Ctes: String = (minhashReachCte + s""",
         gs AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS gn,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS gu,
             CAST(length(text) AS BIGINT) AS gc,
             CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
               ['the', 'a'])) AS BIGINT) AS gds
           FROM documents),
         gk AS (
           SELECT doc_id FROM gs
           WHERE gn BETWEEN ${Queries.GopherMinTokens} AND ${Queries.GopherMaxTokens}
             AND CAST(gc - (gn - 1) AS DOUBLE) / gn >= ${Queries.GopherMinAvgTokLen}
             AND CAST(gc - (gn - 1) AS DOUBLE) / gn <= ${Queries.GopherMaxAvgTokLen}
             AND CAST(1 AS DOUBLE) - CAST(gu AS DOUBLE) / gn <= ${Queries.GopherMaxRepeatRatio}
             AND gds >= ${Queries.GopherMinDistinctStop}),
         lmd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         lmbi AS (
           SELECT doc_id, unnest(generate_series(1, len(w) - 1)) AS i, w
           FROM lmd WHERE len(w) >= 2),
         lmb2 AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM lmbi),
         lmbc AS (
           SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
           FROM lmb2 GROUP BY w1, w2),
         lmpc AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM lmbc GROUP BY w1),
         lmv AS (
           SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM (
             SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
         lmsc AS (
           SELECT lmb2.doc_id,
             CAST(sum(CAST(
               CAST(lmbc.c12 + 1 AS DOUBLE) / CAST(lmpc.c1 + lmv.v AS DOUBLE)
               AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS lm_score
           FROM lmb2 JOIN lmbc USING (w1, w2) JOIN lmpc USING (w1) CROSS JOIN lmv
           GROUP BY lmb2.doc_id),
         lmthr AS (SELECT quantile_disc(lm_score, ${Queries.LmGatePercentile})
           AS t FROM lmsc),
         lmk AS (SELECT doc_id FROM lmsc CROSS JOIN lmthr WHERE lm_score >= t),
         reps AS (
           SELECT doc_id FROM (
             SELECT doc_id, min(label) AS cluster_id
             FROM reach GROUP BY doc_id) c
           WHERE doc_id = cluster_id),
         cl AS (SELECT doc_id, min(label) AS cluster_id
           FROM reach GROUP BY doc_id),
         sdn2 AS (
           SELECT vec_id, embedding,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS nn
           FROM embeddings),
         sde AS (SELECT vec_id, embedding AS ev, nn AS en FROM sdn2
           WHERE vec_id < ${Queries.DeconBenchmarkMaxId}),
         sdc AS (SELECT vec_id, embedding AS cv, nn AS cn FROM sdn2
           WHERE vec_id >= ${Queries.DeconBenchmarkMaxId}),
         semcont AS (
           SELECT DISTINCT sdc.vec_id AS doc_id
           FROM sdc, sde
           WHERE CAST(list_sum(list_transform(list_zip(sdc.cv, sde.ev),
               z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) / (sqrt(sdc.cn) * sqrt(sde.en))
             >= ${Queries.SemanticDeconTau}),
         $deconCtes,
         $piiSeededCte,
         cv3 AS (
           SELECT d.doc_id,
             ${scrubCleanSql("d.text")} AS clean,
             ${splitCaseSql("cl.cluster_id")} AS split
           FROM seeded d
           JOIN gk USING (doc_id)
           JOIN lmk USING (doc_id)
           JOIN reps USING (doc_id)
           JOIN cl USING (doc_id)
           LEFT JOIN contaminated ct ON ct.doc_id = d.doc_id
           LEFT JOIN semcont sx ON sx.doc_id = d.doc_id
           WHERE ct.doc_id IS NULL AND sx.doc_id IS NULL)""")

  private val ivfTopKSql: String =
    s"""WITH $ivfPairsCtes
       SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
         SELECT *, row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
         FROM pairs) r
       WHERE rank <= 10"""

  /** Shared winnow CTEs (`h` → `wnw` with the per-doc fingerprint list):
    * `q_winnow` summarizes, `q_winnow_pairs` joins on shared prints.
    */
  private val winnowCtes: String =
    """h AS (
           SELECT doc_id,
             list_transform(generate_series(1, length(text) - 7),
               i -> list_reduce(
                 list_transform(generate_series(0, 7),
                   j -> CAST(ascii(substr(text, CAST(i + j AS INT), 1)) AS BIGINT)),
                 (a, b) -> (a * 257 + b) % 1000000007)) AS hs
           FROM documents WHERE length(text) >= 11),
         wnw AS (
           SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(hs) - 3),
               i -> list_min(list_slice(hs, CAST(i AS INT), CAST(i + 3 AS INT))))) AS fp
           FROM h)"""

  /** Shared CTE chain for the embedding near-dup oracles: norms → ⌈√n⌉
    * lowest-id centroids → assignment → (centroid, label) block cap →
    * exact-cosine pairs ≥ 0.2 (`ep`). `q_embed_neardup` reads `ep`
    * directly; `q_semdedup_keep` runs the transitive closure over it.
    */
  private val embedNearDupCtes: String =
    """n2 AS (
           SELECT vec_id, label, embedding,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS nn
           FROM embeddings),
         c AS (
           SELECT vec_id AS centroid_id, embedding AS cv, nn AS cn FROM n2
           QUALIFY row_number() OVER (ORDER BY vec_id) <=
             CAST(ceil(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)),
         p AS (
           SELECT v.vec_id, v.label, v.embedding, v.nn, c.centroid_id,
             v.nn + c.cn - 2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
               z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS dist2
           FROM n2 v, c),
         a AS (
           SELECT vec_id, label, embedding, nn, centroid_id FROM (
             SELECT *, row_number() OVER (
               PARTITION BY vec_id ORDER BY dist2, centroid_id) AS rn
             FROM p) t
           WHERE rn = 1),
         ok AS (
           SELECT centroid_id, label FROM a
           GROUP BY centroid_id, label HAVING count(*) <= 10000),
         a2 AS (SELECT a.* FROM a JOIN ok USING (centroid_id, label)),
         ep AS (
           SELECT vec_a, vec_b, cosine FROM (
             SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
               CAST(list_sum(list_transform(list_zip(x.embedding, y.embedding),
                 z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
                 AS DOUBLE) / (sqrt(x.nn) * sqrt(y.nn)) AS cosine
             FROM a2 x JOIN a2 y
               ON x.centroid_id = y.centroid_id AND x.label = y.label
                 AND x.vec_id < y.vec_id) t
           WHERE cosine >= 0.2)"""

  /** Shared IVF coarse-assignment SQL (`q_ivf_assign`) — `q_embed_outliers`
    * wraps it with a distance ordering, one definition of dist2 each side.
    */
  private val ivfAssignSql: String =
    """WITH n2 AS (
           SELECT vec_id, embedding,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS nn
           FROM embeddings),
         c AS (SELECT vec_id AS centroid_id, embedding AS cv, nn AS cn FROM n2 WHERE vec_id < 16),
         p AS (
           SELECT v.vec_id, c.centroid_id,
             v.nn + c.cn - 2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
               z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS dist2
           FROM n2 v, c)
         SELECT vec_id, centroid_id, dist2 FROM (
           SELECT *, row_number() OVER (
             PARTITION BY vec_id ORDER BY dist2, centroid_id) AS rn
           FROM p) r
         WHERE rn = 1"""

  private val goldFeaturesSql: String =
    """WITH norm AS (
           SELECT event_id, ts, CAST(ts AS DATE) AS day, user_id,
                  upper(trim(event_type)) AS event_type, value
           FROM events
           WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value >= 0)
         SELECT event_id, ts, day, user_id, event_type, value,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w20 AS DOUBLE) / count(*) OVER w20 AS ma_20,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w50 AS DOUBLE) / count(*) OVER w50 AS ma_50,
           CASE WHEN count(*) OVER w20 > 1 THEN sqrt(greatest(
             (CAST(sum(CAST(value*value AS DECIMAL(18,4))) OVER w20 AS DOUBLE)
              - CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w20 AS DOUBLE)
                * CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w20 AS DOUBLE)
                / (count(*) OVER w20))
             / (count(*) OVER w20 - 1), 0.0)) END AS vol_20,
           lag(value, 1) OVER w AS prev_value,
           (value - lag(value, 1) OVER w) / nullif(lag(value, 1) OVER w, 0) AS daily_return
         FROM norm
         WINDOW
           w AS (PARTITION BY user_id ORDER BY ts, event_id),
           w20 AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
           w50 AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)"""

  /** Shared CTE chain for the exact-substring dedup oracles: L-grams at
    * every position (1-based) → grams in ≥ 2 distinct docs → anchor hits
    * → gaps-and-islands merge → maximal spans — the DuckDB mirror of
    * [[graft.llm.SubstringDedup]] (one definition of L via
    * [[Queries.SubstringMinTokens]]).
    */
  private val substringSpanCtes: String = {
    val L = Queries.SubstringMinTokens
    s"""d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         g AS (
           SELECT doc_id,
             unnest(generate_series(1, len(toks) - $L + 1)) AS pos,
             unnest(list_transform(generate_series(1, len(toks) - $L + 1),
               i -> array_to_string(list_slice(toks, i, i + $L - 1), ' '))) AS gram
           FROM d WHERE len(toks) >= $L),
         dupg AS (
           SELECT gram FROM (
             SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram) t
           WHERE nd >= 2),
         hits AS (SELECT g.doc_id, g.pos FROM g JOIN dupg USING (gram)),
         isl AS (
           SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + $L
                  THEN 1 ELSE 0 END AS nf
           FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         st AS (
           SELECT doc_id, pos,
             sum(nf) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS island
           FROM isl),
         spans AS (
           SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
             CAST(max(pos) + $L - 1 AS BIGINT) AS span_end,
             CAST(max(pos) + $L - 1 - min(pos) + 1 AS BIGINT) AS span_tokens
           FROM st GROUP BY doc_id, island)"""
  }

  /** Maximal duplicated spans — q_substring_dedup_hashed runs the SAME
    * oracle: its Spark plan keys the corpus-wide shuffle by
    * xxhash64(gram) instead of the gram text (the shuffle-bytes lever),
    * identical output absent a 64-bit collision.
    */
  private val substringSpansSql: String =
    s"""WITH $substringSpanCtes
         SELECT doc_id, span_start, span_end, span_tokens FROM spans"""

  /** Shared CTE chain for the perceptual image-hash oracles: the seeded
    * media payloads (every 5th = previous doc's bytes, last byte
    * rewritten — same rule as [[Queries.seededMedia]]), the byte-sampled
    * 9×8 gray grid, and the 64-bit dHash (unsigned accumulate in HUGEINT,
    * wrapped to signed BIGINT like the simhash64 oracle). Replays
    * [[graft.llm.ImageHashImpl]]'s fallback path exactly — the corpus
    * payloads are ASCII text, so character positions = byte positions.
    */
  /** The seeded-media view shared by the perceptual image AND audio
    * oracles (Queries.seededMedia replayed in SQL): every 5th payload is
    * the previous doc's bytes with the final byte rewritten.
    */
  private val seededMediaCtes: String =
    """prev AS (SELECT doc_id + 1 AS doc_id, text AS ptext FROM documents),
         seeded AS (
           SELECT d.doc_id,
             CASE WHEN d.doc_id % 5 = 4 AND p.ptext IS NOT NULL
                  THEN substr(p.ptext, 1, length(p.ptext) - 1) || 'z'
                  ELSE d.text END AS text
           FROM documents d LEFT JOIN prev p USING (doc_id))"""

  private val imageDhashCtes: String =
    s"""$seededMediaCtes,
         gr AS (
           SELECT doc_id, list_transform(generate_series(0, 71),
             i -> ascii(substr(text, CAST((i * length(text)) // 72 + 1 AS INT), 1))) AS gs
           FROM seeded),
         bv AS (
           SELECT doc_id, j,
             CASE WHEN gs[CAST((j // 8) * 9 + (j % 8) + 2 AS INT)]
                     > gs[CAST((j // 8) * 9 + (j % 8) + 1 AS INT)]
                  THEN 1 ELSE 0 END AS bit
           FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS j, gs FROM gr) t),
         u AS (SELECT doc_id, sum(CAST(bit AS HUGEINT) << CAST(63 - j AS INT)) AS uv
               FROM bv GROUP BY doc_id),
         sh AS (SELECT doc_id, uv,
           CAST(CASE WHEN uv >= 9223372036854775808 THEN uv - 18446744073709551616
                     ELSE uv END AS BIGINT) AS dhash
           FROM u)"""

  /** Audio envelope-hash oracle chain: the opaque fallback path of
    * AudioHashImpl replayed in SQL — 65 byte samples at (i·len)/65 as the
    * energy curve, bit j = e(j+1) > e(j), assembled MSB-first (the same
    * HUGEINT → signed BIGINT fold as the image/simhash oracles).
    */
  private val audioHashCtes: String =
    s"""$seededMediaCtes,
         agr AS (
           SELECT doc_id, list_transform(generate_series(0, 64),
             i -> ascii(substr(text, CAST((i * length(text)) // 65 + 1 AS INT), 1))) AS es
           FROM seeded),
         abv AS (
           SELECT doc_id, j,
             CASE WHEN es[CAST(j + 2 AS INT)] > es[CAST(j + 1 AS INT)]
                  THEN 1 ELSE 0 END AS bit
           FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS j, es FROM agr) t),
         au AS (SELECT doc_id, sum(CAST(bit AS HUGEINT) << CAST(63 - j AS INT)) AS uv
               FROM abv GROUP BY doc_id),
         ash AS (SELECT doc_id, uv,
           CAST(CASE WHEN uv >= 9223372036854775808 THEN uv - 18446744073709551616
                     ELSE uv END AS BIGINT) AS ahash
           FROM au)"""

  /** Unrolled BPE-training oracle (DuckDB replays the training loop):
    * t0 encodes each distinct word's symbol sequence as `(s1)(s2)…` with
    * its count; each round r picks the best pair (count desc, pair asc)
    * and applies it via `replace()` — whose non-overlapping left-to-right
    * scan reproduces greedy BPE merge application exactly (the `(…)`
    * wrapping is what makes adjacent matches non-overlapping in the
    * string). MATERIALIZED is load-bearing: t{r} is referenced twice per
    * round, and inlining would re-derive the whole chain exponentially.
    * One definition of the merge count via [[Queries.BpeNumMerges]]; the
    * inner series bound 50 just needs to exceed the longest word.
    */
  private val bpeCtes: String = {
    val M = Queries.BpeNumMerges
    val sb = new StringBuilder
    sb.append(
      """t0 AS MATERIALIZED (
           SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt,
             '(' || array_to_string(list_transform(generate_series(1, length(w)),
               i -> substr(w, i, 1)), ')(') || ')' AS enc
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) z
           GROUP BY w)""")
    for (r <- 0 until M) sb.append(s""",
         b$r AS MATERIALIZED (
           SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(cnt) AS BIGINT) AS c
           FROM (SELECT cnt, string_split(substr(enc, 2, length(enc) - 2), ')(') AS syms
                 FROM t$r) s,
                (SELECT unnest(generate_series(1, 50)) AS i) ii
           WHERE i <= len(syms) - 1
           GROUP BY 1, 2
           ORDER BY c DESC, a ASC, b ASC LIMIT 1),
         t${r + 1} AS MATERIALIZED (
           SELECT word, cnt,
             replace(enc, '(' || b$r.a || ')(' || b$r.b || ')',
               '(' || b$r.a || b$r.b || ')') AS enc
           FROM t$r CROSS JOIN b$r)""")
    sb.toString
  }

  /** Final per-word BPE segment counts (reads the last training state). */
  private val bpeNsymCte: String =
    s"""ns AS (
           SELECT word, CAST(len(string_split(substr(enc, 2, length(enc) - 2),
             ')(')) AS BIGINT) AS nsym
           FROM t${Queries.BpeNumMerges})"""

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    // the composed curation pipeline: quality envelope ∩ dedup keep-list
    // ∩ not-contaminated, then PII scrub over the seeded survivors +
    // deterministic split — every stage is the same shared fragment its
    // standalone oracle uses
    "q_curate" -> (minhashReachCte + s""",
         $qualityStatsCtes,
         qual AS (SELECT doc_id FROM qs WHERE $qualityKeepPred),
         reps AS (
           SELECT doc_id FROM (
             SELECT doc_id, min(label) AS cluster_id
             FROM reach GROUP BY doc_id) c
           WHERE doc_id = cluster_id),
         $deconCtes,
         $piiSeededCte
         SELECT d.doc_id,
           ${scrubCleanSql("d.text")} AS clean,
           ${splitCaseSql("d.doc_id")} AS split
         FROM seeded d
         JOIN qual USING (doc_id)
         JOIN reps USING (doc_id)
         LEFT JOIN contaminated ct ON ct.doc_id = d.doc_id
         WHERE ct.doc_id IS NULL"""),

    // keep-list: one survivor (the min doc id) per cluster with the member
    // count it represents — the final materialization of the dedup sweep
    "q_dedup_keep" -> (minhashReachCte +
      """
         SELECT cluster_id AS doc_id, CAST(count(*) AS BIGINT) AS n_members
         FROM (SELECT doc_id, min(label) AS cluster_id
               FROM reach GROUP BY doc_id) c
         GROUP BY cluster_id"""),

    "q_norm_events" ->
      """SELECT event_id, ts, CAST(ts AS DATE) AS day, user_id,
         upper(trim(event_type)) AS event_type, value
         FROM events
         WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value >= 0""",

    "q_dedup_keeplast" ->
      """SELECT user_id, event_type, ts, event_id, value FROM (
           SELECT user_id, event_type, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) t
         WHERE rn = 1""",

    "q_gold_features" -> goldFeaturesSql,

    // O3: the same gold view under the reference's global ORDER BY —
    // the driver hash is order-insensitive (rows/schema/hash identical
    // to q_gold_features); the spec pins the actual global ordering and
    // the range-partitioned (never single-task) sort plan
    "q_gold_view_sorted" -> (goldFeaturesSql +
      """
         ORDER BY user_id ASC, ts DESC, event_id DESC"""),

    "q_silver_merge" ->
      """WITH t AS (
           SELECT user_id, event_type, ts, event_id, value FROM (
             SELECT user_id, event_type, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
             FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-15') x
           WHERE rn = 1),
         u AS (
           SELECT user_id, event_type, ts, event_id, value FROM (
             SELECT user_id, event_type, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
             FROM events WHERE CAST(ts AS DATE) > DATE '2024-01-15') x
           WHERE rn = 1)
         SELECT
           coalesce(u.user_id, t.user_id) AS user_id,
           coalesce(u.event_type, t.event_type) AS event_type,
           CASE WHEN u.user_id IS NOT NULL THEN u.ts ELSE t.ts END AS ts,
           CASE WHEN u.user_id IS NOT NULL THEN u.event_id ELSE t.event_id END AS event_id,
           CASE WHEN u.user_id IS NOT NULL THEN u.value ELSE t.value END AS value
         FROM t FULL OUTER JOIN u
           ON t.user_id = u.user_id AND t.event_type = u.event_type""",

    "q_dq_audit" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN NOT coalesce(user_id IS NOT NULL, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_not_null_user,
           CAST(sum(CASE WHEN NOT coalesce(value >= 0, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_nonneg_value,
           CAST(sum(CASE WHEN NOT coalesce(value <= 300, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_value_le_300,
           CAST(sum(CASE WHEN NOT coalesce(ts IS NOT NULL, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_not_null_ts
         FROM events""",

    "q_ge_audit" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(0 AS BIGINT) AS n_viol_exists_user_id,
           CAST(0 AS BIGINT) AS n_viol_exists_ts,
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_not_null_user_id,
           CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_not_null_ts,
           CAST(sum(CASE WHEN value IS NOT NULL AND (value < 0 OR value > 300) THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_between_value
         FROM events""",

    "q_quarantine" ->
      """SELECT event_id, user_id, event_type, value,
           CASE WHEN NOT coalesce(user_id IS NOT NULL, false) THEN 'not_null_user'
                WHEN NOT coalesce(value >= 0, false) THEN 'nonneg_value'
                WHEN NOT coalesce(value <= 300, false) THEN 'value_le_300'
           END AS dq_reason
         FROM events
         WHERE NOT coalesce(user_id IS NOT NULL, false)
            OR NOT coalesce(value >= 0, false)
            OR NOT coalesce(value <= 300, false)""",

    "q_count_by_type" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events GROUP BY event_type""",

    "q_dup_props" ->
      """SELECT rec_hash, n_dups FROM (
           SELECT sha256(event_type || '|' || props) AS rec_hash,
             CAST(count(*) AS BIGINT) AS n_dups
           FROM events GROUP BY 1) t
         WHERE n_dups > 1""",

    "q_coverage" ->
      """SELECT user_id, min(day) AS first_day, max(day) AS last_day,
           CAST(count(DISTINCT day) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_rows
         FROM (SELECT user_id, CAST(ts AS DATE) AS day FROM events) t
         GROUP BY user_id""",

    "q_topk_users" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY user_id
         ORDER BY n DESC, user_id ASC LIMIT 20""",

    "q_latest_day_monitor" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n, max(ts) AS latest_ts
         FROM events
         WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM events)
         GROUP BY user_id""",

    "q_null_audit" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_user_id,
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
           CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_props
         FROM events""",

    "q_distinct_keys" ->
      """SELECT DISTINCT user_id, event_type FROM events""",

    "q_value_quantiles" ->
      """SELECT event_type,
           quantile_disc(value, 0.25) AS p25,
           quantile_disc(value, 0.50) AS p50,
           quantile_disc(value, 0.75) AS p75,
           quantile_disc(value, 0.95) AS p95
         FROM events GROUP BY event_type""",

    "q_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 43200000000
                  THEN 1 ELSE 0 END AS nf
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts,
             CAST(sum(nf) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM flagged)
         SELECT user_id, session_id, min(ts) AS session_start,
           max(ts) AS session_end, CAST(count(*) AS BIGINT) AS n_events
         FROM s GROUP BY user_id, session_id""",

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q6_revenue_filter" ->
      """SELECT
           CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.03 AND l_discount <= 0.07
           AND l_quantity < 24""",

    "q_revenue_by_nation" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",

    "q_asof_purchase" ->
      """SELECT e.event_id, e.user_id, e.ts, e.event_type, e.value,
           p.value AS last_purchase_value
         FROM events e
         ASOF LEFT JOIN
           (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
           ON e.user_id = p.user_id AND e.ts >= p.ts""",

    "q_trading_calendar" ->
      """WITH bounds AS (
           SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
         days AS (
           SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                  CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS cal_day
           FROM bounds),
         flagged AS (
           SELECT cal_day, CAST(isodow(cal_day) - 1 AS INT) AS dow,
             cal_day IN (DATE '2024-01-01', DATE '2024-01-15', DATE '2024-02-19',
                         DATE '2024-03-29', DATE '2024-05-27', DATE '2024-06-19',
                         DATE '2024-07-04', DATE '2024-09-02', DATE '2024-11-28',
                         DATE '2024-12-25') AS is_holiday,
             ((isodow(cal_day) - 1) <= 4 AND cal_day NOT IN (
                         DATE '2024-01-01', DATE '2024-01-15', DATE '2024-02-19',
                         DATE '2024-03-29', DATE '2024-05-27', DATE '2024-06-19',
                         DATE '2024-07-04', DATE '2024-09-02', DATE '2024-11-28',
                         DATE '2024-12-25')) AS is_trading_day,
             cal_day IN (DATE '2024-07-03', DATE '2024-11-29',
                         DATE '2024-12-24') AS is_early_close
           FROM days)
         SELECT cal_day, dow, is_holiday, is_trading_day, is_early_close,
           last_value(CASE WHEN is_trading_day THEN cal_day END IGNORE NULLS)
             OVER (ORDER BY cal_day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_trading_day
         FROM flagged""",

    // single source of truth for the multiyear oracle's holiday in-list:
    // the same rule generator the Spark side joins against (the RULES
    // themselves are pinned by known-day specs in NyseCalendarSpec)
    "q_trading_calendar_multiyear" -> {
      val hol = graft.operators.NyseCalendar.holidaysBetween(
          java.time.LocalDate.parse("2021-12-01"),
          java.time.LocalDate.parse("2025-12-31"))
        .map(d => s"DATE '$d'").mkString(", ")
      val ec = graft.operators.NyseCalendar.earlyClosesBetween(
          java.time.LocalDate.parse("2021-12-01"),
          java.time.LocalDate.parse("2025-12-31"))
        .map(d => s"DATE '$d'").mkString(", ")
      s"""WITH days AS (
           SELECT CAST(unnest(generate_series(TIMESTAMP '2021-12-01',
                  TIMESTAMP '2025-12-31', INTERVAL 1 DAY)) AS DATE) AS cal_day),
         flagged AS (
           SELECT cal_day, CAST(isodow(cal_day) - 1 AS INT) AS dow,
             cal_day IN ($hol) AS is_holiday,
             ((isodow(cal_day) - 1) <= 4 AND cal_day NOT IN ($hol)) AS is_trading_day,
             cal_day IN ($ec) AS is_early_close
           FROM days)
         SELECT cal_day, dow, is_holiday, is_trading_day, is_early_close,
           last_value(CASE WHEN is_trading_day THEN cal_day END IGNORE NULLS)
             OVER (ORDER BY cal_day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_trading_day
         FROM flagged"""
    },

    // backfill-window resolution: same rule-generated holiday in-list as
    // the multiyear calendar oracle; anchor 2025-07-04 is a Friday holiday
    // so the snapshot falls back to the previous trading day
    "q_backfill_window" -> {
      val hol = graft.operators.NyseCalendar.holidaysBetween(
          java.time.LocalDate.parse("2025-05-21"),
          java.time.LocalDate.parse("2025-07-04"))
        .map(d => s"DATE '$d'").mkString(", ")
      s"""WITH days AS (
           SELECT CAST(unnest(generate_series(TIMESTAMP '2025-05-21',
                  TIMESTAMP '2025-07-04', INTERVAL 1 DAY)) AS DATE) AS cal_day),
         cal AS (
           SELECT cal_day,
             ((isodow(cal_day) - 1) <= 4 AND cal_day NOT IN ($hol)) AS is_trading_day,
             last_value(CASE WHEN ((isodow(cal_day) - 1) <= 4
                 AND cal_day NOT IN ($hol)) THEN cal_day END IGNORE NULLS)
               OVER (ORDER BY cal_day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_trading_day
           FROM days),
         snap AS (
           SELECT CASE WHEN is_trading_day THEN cal_day
                       ELSE prev_trading_day END AS snapshot_date
           FROM cal WHERE cal_day = DATE '2025-07-04')
         SELECT cal_day AS backfill_day, snapshot_date,
           DATE '2025-06-04' AS backfill_from, DATE '2025-07-04' AS backfill_to
         FROM cal, snap
         WHERE is_trading_day AND cal_day >= DATE '2025-06-04'"""
    },

    "q_last_n_trading_days" ->
      """WITH bounds AS (
           SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
         days AS (
           SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                  CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS cal_day
           FROM bounds),
         trading AS (
           SELECT cal_day FROM days
           WHERE (isodow(cal_day) - 1) <= 4 AND cal_day NOT IN (
             DATE '2024-01-01', DATE '2024-01-15', DATE '2024-02-19',
             DATE '2024-03-29', DATE '2024-05-27', DATE '2024-06-19',
             DATE '2024-07-04', DATE '2024-09-02', DATE '2024-11-28',
             DATE '2024-12-25'))
         SELECT cal_day, CAST(rn AS INT) AS rn FROM (
           SELECT cal_day, row_number() OVER (ORDER BY cal_day DESC) AS rn
           FROM trading) t
         WHERE rn <= 10""",

    "q_trading_day_events" ->
      """SELECT event_id, user_id, ts, event_type, value,
           CAST(ts AS DATE) AS day
         FROM events
         WHERE (isodow(CAST(ts AS DATE)) - 1) <= 4
           AND CAST(ts AS DATE) NOT IN (
             DATE '2024-01-01', DATE '2024-01-15', DATE '2024-02-19',
             DATE '2024-03-29', DATE '2024-05-27', DATE '2024-06-19',
             DATE '2024-07-04', DATE '2024-09-02', DATE '2024-11-28',
             DATE '2024-12-25')""",

    "q_month_chunks" ->
      """SELECT CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS month_start,
           min(CAST(ts AS DATE)) AS chunk_start,
           max(CAST(ts AS DATE)) AS chunk_end,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_rows
         FROM events GROUP BY 1""",

    "q_envelope" ->
      """SELECT CAST(user_id AS VARCHAR) AS symbol,
           CAST(ts AS DATE) AS as_of_date,
           event_type AS endpoint,
           props AS payload,
           ts AS fetched_at,
           'EVENTS' AS source,
           CAST(200 AS INT) AS http_status,
           coalesce(json_extract_string(props, '$.k'),
                    json_extract_string(props, '$.key')) AS k_value,
           sha256(props) AS payload_hash
         FROM events""",

    "q_day_filehash" ->
      """SELECT CAST(ts AS DATE) AS day,
           sha256(string_agg(props, chr(10) ORDER BY props)) AS file_hash,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1""",

    "q_docs_exact_dedup" ->
      """SELECT sha256(text) AS text_hash, min(doc_id) AS keep_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
         FROM documents GROUP BY 1""",

    // sweep summary: one row per dedup stage, every leg a count over the
    // same shared CTE chain the standalone oracles use
    "q_dedup_summary" -> (minhashReachCte +
      """
         SELECT 'docs' AS stage, CAST(count(*) AS BIGINT) AS n FROM documents
         UNION ALL
         SELECT 'exact_dup_groups', CAST(count(*) AS BIGINT) FROM (
           SELECT sha256(text) FROM documents
           GROUP BY 1 HAVING count(*) > 1) g
         UNION ALL
         SELECT 'near_dup_pairs', CAST(count(*) AS BIGINT)
         FROM jac WHERE jaccard >= 0.5
         UNION ALL
         SELECT 'clusters_kept', CAST(count(DISTINCT cluster_id) AS BIGINT)
         FROM (SELECT doc_id, min(label) AS cluster_id
               FROM reach GROUP BY doc_id) c"""),

    // pairs oracle rides the same shared CTE (the jac step already
    // carries doc_a/doc_b/jaccard); reach is defined but unused — valid SQL
    "q_minhash_pairs" -> (minhashReachCte +
      """
         SELECT doc_a, doc_b, jaccard FROM jac"""),

    // LSH bucket-gate occupancy audit: same bands CTE, per-bucket counts
    // classed against the 2..50 cap — the no-silent-caps companion of
    // q_minhash_pairs (winnow twin: q_winnow_coverage)
    "q_minhash_bucket_stats" -> (minhashReachCte + """
         , g AS (SELECT band, sig, count(*) AS n_occ FROM bands
                 GROUP BY band, sig)
         SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(n_occ) AS BIGINT) AS n_rows_total,
           CAST(sum(CASE WHEN n_occ = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_buckets_singleton,
           CAST(sum(CASE WHEN n_occ > 50 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_buckets_hot,
           CAST(sum(CASE WHEN n_occ > 50 THEN n_occ ELSE 0 END) AS BIGINT)
             AS n_rows_hot,
           CAST(sum(CASE WHEN n_occ BETWEEN 2 AND 50 THEN n_occ ELSE 0 END)
             AS BIGINT) AS n_rows_pairable,
           CAST(sum(CASE WHEN n_occ BETWEEN 2 AND 50 THEN n_occ ELSE 0 END)
             AS DOUBLE) / CAST(sum(n_occ) AS DOUBLE) AS pair_coverage
         FROM g"""),

    // LSH recall eval: ground truth = exact shingle Jaccard of each probe
    // (doc_id < probeN, where probeN = greatest(floor, 1% of docs) is
    // derived from count(*) on BOTH engines — never a literal, so the
    // probe set scales with the corpus) against the full corpus, reusing
    // the shared sh/cnt CTEs; candidates = the jac chain on probe pairs
    "q_minhash_recall" -> (minhashReachCte + s"""
         , pn AS (SELECT greatest(${Queries.DedupProbeFloor}, count(*) // 100)
                    AS probe_n FROM documents),
         pinter AS (
           SELECT least(a.doc_id, b.doc_id) AS doc_a,
                  greatest(a.doc_id, b.doc_id) AS doc_b,
                  count(DISTINCT a.shingle) AS n_inter
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle
            AND a.doc_id < (SELECT probe_n FROM pn)
            AND b.doc_id <> a.doc_id
           GROUP BY 1, 2),
         tj AS (
           SELECT i.doc_a, i.doc_b,
             CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) AS j
           FROM pinter i
           JOIN cnt ca ON ca.doc_id = i.doc_a
           JOIN cnt cb ON cb.doc_id = i.doc_b),
         tp AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM tj WHERE j >= 0.5),
         pc AS (
           SELECT CAST(count(*) AS BIGINT) AS n_candidates,
             CAST(coalesce(sum(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits
           FROM jac WHERE doc_a < (SELECT probe_n FROM pn))
         SELECT n_true, n_candidates, n_hits,
           CAST(n_hits AS DOUBLE) / nullif(n_true, 0) AS recall,
           CAST(n_hits AS DOUBLE) / nullif(n_candidates, 0) AS cand_precision
         FROM tp, pc"""),

    // edit-distance verification of the LSH candidate sliver: DuckDB's
    // levenshtein is the same integer DP as Spark's; the similarity is a
    // single IEEE division + subtraction, so the hash compare is exact
    "q_edit_neardup" -> (minhashReachCte + s"""
         , ed AS (
           SELECT p.doc_a, p.doc_b,
             CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
             CAST(greatest(length(a.text), length(b.text)) AS BIGINT) AS len_m
           FROM pairs p
           JOIN documents a ON a.doc_id = p.doc_a
           JOIN documents b ON b.doc_id = p.doc_b)
         SELECT doc_a, doc_b, edit_dist,
           1.0 - CAST(edit_dist AS DOUBLE) / len_m AS edit_sim
         FROM ed
         WHERE 1.0 - CAST(edit_dist AS DOUBLE) / len_m >= ${Queries.EditSimThreshold}"""),

    "q_dedup_clusters" -> (minhashReachCte +
      """
         SELECT doc_id, min(label) AS cluster_id
         FROM reach GROUP BY doc_id"""),

    // priority-aware keep-list: the reach chain's clusters resolved by
    // LM quality (coalesce(-1.0) ranks unscored docs last, matching the
    // Spark side's sentinel), doc_id tie-break
    "q_dedup_keep_best" -> (minhashReachCte + ", " + lmScoreCtes +
      """,
         cl AS (SELECT doc_id, min(label) AS cluster_id
             FROM reach GROUP BY doc_id),
         mq AS (SELECT cl.cluster_id, cl.doc_id, lmr.lm_score
             FROM cl JOIN lmr USING (doc_id)),
         rk AS (SELECT cluster_id, doc_id, lm_score,
             row_number() OVER (PARTITION BY cluster_id
               ORDER BY coalesce(lm_score, -1.0) DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY cluster_id) AS n_members
           FROM mq)
         SELECT cluster_id, doc_id AS keep_doc_id, lm_score AS keep_lm_score,
           CAST(n_members AS BIGINT) AS n_members,
           (doc_id <> cluster_id) AS promoted
         FROM rk WHERE rn = 1"""),

    // leakage-safe split: the split hash keys on the CLUSTER id, so a
    // near-dup cluster lands in one split wholesale (same reach chain
    // as q_dedup_clusters, same split rule as q_hash_split)
    "q_cluster_split" -> (minhashReachCte + s"""
         , cl AS (SELECT doc_id, min(label) AS cluster_id
             FROM reach GROUP BY doc_id)
         SELECT doc_id, cluster_id,
           ${splitCaseSql("cluster_id")} AS split
         FROM cl"""),

    "q_simhash" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
         th AS (SELECT doc_id, sha256(token) AS h FROM tok),
         tb AS (SELECT doc_id, h, unnest(generate_series(0, 31)) AS j FROM th),
         bits AS (
           SELECT doc_id, j,
             ((strpos('0123456789abcdef', substr(h, CAST(1 + j // 4 AS INT), 1)) - 1)
               >> CAST(3 - j % 4 AS INT)) & 1 AS bit
           FROM tb),
         votes AS (SELECT doc_id, j, sum(2 * bit - 1) AS v FROM bits GROUP BY doc_id, j),
         signs AS (SELECT doc_id, j, CASE WHEN v > 0 THEN 1 ELSE 0 END AS s FROM votes)
         SELECT doc_id,
           CAST(sum(CAST(s AS BIGINT) << CAST(31 - j AS INT)) AS BIGINT) AS simhash
         FROM signs GROUP BY doc_id""",

    "q_text_stats" ->
      """WITH t AS (
           SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
             CAST(len(list_filter(string_split(text, ' '),
                      x -> x = 'the' OR x = 'a')) AS BIGINT) AS n_stopwords,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letter
           FROM documents)
         SELECT doc_id, n_chars, n_tokens, n_uniq_tokens, n_stopwords,
           CAST(n_stopwords AS DOUBLE) / n_tokens AS stop_ratio,
           CAST(n_uniq_tokens AS DOUBLE) / n_tokens AS uniq_ratio,
           CAST(n_letter AS DOUBLE) / n_tokens AS avg_token_len,
           (CAST(n_stopwords AS DOUBLE) / n_tokens) * 0.5
             + CAST(least(n_tokens, 100) AS DOUBLE) / 100.0 * 0.3
             + (CAST(n_uniq_tokens AS DOUBLE) / n_tokens) * 0.2 AS quality_score,
           CASE WHEN CAST(n_stopwords AS DOUBLE) / n_tokens > 0.06
                THEN 'en' ELSE 'other' END AS pred_lang
         FROM t""",

    "q_fingerprint" ->
      """WITH n AS (
           SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                  ' +', ' ', 'g')) AS nt
           FROM documents)
         SELECT doc_id, sha256(nt) AS fingerprint,
           substr(sha256(nt), 1, 4) AS fp_bucket
         FROM n""",

    "q_cosine_topk" ->
      s"""WITH ${cosineRankCtes(Queries.AnnNumQueries, Queries.AnnTopK)}
         SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
         FROM cr""",

    // kNN label classification: majority label of the cosine top-k
    // (shared cr chain), ties toward the smaller label
    "q_knn_label" ->
      s"""WITH ${cosineRankCtes(Queries.AnnNumQueries, Queries.AnnTopK)},
         v AS (
           SELECT cr.query_id, e.label AS pred_label,
             CAST(count(*) AS BIGINT) AS n_votes
           FROM cr JOIN embeddings e ON e.vec_id = cr.neighbor_id
           GROUP BY cr.query_id, e.label),
         b AS (
           SELECT query_id, pred_label, n_votes,
             row_number() OVER (PARTITION BY query_id
               ORDER BY n_votes DESC, pred_label) AS rn
           FROM v)
         SELECT b.query_id, t.label AS true_label, b.pred_label, b.n_votes,
           (b.pred_label = t.label) AS correct
         FROM b JOIN embeddings t ON t.vec_id = b.query_id
         WHERE b.rn = 1""",

    // unit-normalization, one row per element (scalar doubles compare
    // exactly; an array column would go through string rendering);
    // decimal-exact norm, the 1e-300 guard keeps zero vectors zero
    "q_l2_normalize" ->
      """WITH n2 AS (
           SELECT vec_id, embedding,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS nn
           FROM embeddings)
         SELECT vec_id, CAST(pos AS INT) AS pos,
           CAST(embedding[CAST(pos AS INT)] AS DOUBLE)
             / sqrt(greatest(nn, 1e-300)) AS value
         FROM (SELECT vec_id, embedding, nn,
                 unnest(generate_series(1, len(embedding))) AS pos
               FROM n2) t""",

    // PII scrub: same pattern set and replacement order as
    // TextOps.piiPatterns (Java-regex/RE2-identical syntax); DuckDB
    // regexp_replace needs the 'g' flag to match Spark's replace-all.
    // Every 10th doc gets the same deterministic PII suffix as the Spark
    // side so every pattern actually fires cross-engine.
    "q_pii_scrub" -> (s"""WITH $piiSeededCte
         SELECT doc_id,
           ${scrubCleanSql("text")} AS clean,
           $piiCountsSql
         FROM seeded"""),

    // unicode canonicalization: DuckDB's nfc_normalize is the independent
    // NFC implementation (utf8proc) checking the JDK Normalizer; the seed
    // codepoints are spelled with chr() so no raw control byte rides the
    // SQL text, and the control-strip class is the shared ControlClass
    // constant verbatim
    "q_unicode_normalize" -> (s"""
         WITH useeded AS (
           SELECT doc_id,
             text || CASE WHEN doc_id % 10 = 3
               THEN ' cafe' || chr(769) || chr(7) ELSE '' END AS text
           FROM documents)
         SELECT doc_id,
           nfc_normalize(text) AS nfc_text,
           nfc_normalize(text) != text AS changed,
           CAST(length(trim(regexp_replace(nfc_normalize(text),
             '${graft.llm.UnicodeNorm.ControlClass}', '', 'g'))) AS BIGINT)
             AS n_chars_sanitized
         FROM useeded"""),

    // per-source lexical diversity: entropy terms floor-quantized to
    // 1e-9 and summed as BIGINTs (ln is 1-ulp engine-specific and float
    // sums are order-sensitive; the quantized integer sum is neither)
    "q_source_entropy" -> ("""
         WITH etok AS (
           SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
         ecnt AS (
           SELECT source, t, CAST(count(*) AS BIGINT) AS c
           FROM etok GROUP BY source, t),
         etot AS (
           SELECT source, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_types
           FROM ecnt GROUP BY source),
         ej AS (
           SELECT ecnt.source, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p,
             n, n_types
           FROM ecnt JOIN etot USING (source))
         SELECT source, max(n) AS n_tokens, max(n_types) AS n_types,
           -(CAST(SUM(CAST(floor(p*ln(p)*1000000000.0) AS BIGINT)) AS BIGINT)
             / 1000000000.0) AS entropy,
           CAST(max(n_types) AS DOUBLE) / CAST(max(n) AS DOUBLE) AS ttr
         FROM ej GROUP BY source"""),

    // trained quality classifier: the full fixed-step logistic fit
    // unrolled as CTEs — DuckDB independently trains the same model and
    // must land on bit-identical weights (see classifierCtes)
    "q_quality_classifier" -> (s"""WITH $qualityStatsCtes, $gopherCtes,
         $classifierCtes
         SELECT 'bias' AS feature, wb AS weight FROM cw
         UNION ALL SELECT 'stop_ratio', w1 FROM cw
         UNION ALL SELECT 'uniq_ratio', w2 FROM cw
         UNION ALL SELECT 'len_feat', w3 FROM cw
         UNION ALL SELECT 'avg_token_len', w4 FROM cw
         UNION ALL SELECT 'len_feat_sq', w5 FROM cw"""),

    // every document scored by the trained model: quantized sigmoid,
    // >= 0.5 keep decision, and the rule label the fit distilled
    "q_classifier_scores" -> (s"""WITH $qualityStatsCtes, $gopherCtes,
         $classifierCtes
         SELECT f.doc_id, $classifierScoreSql AS score,
           ($classifierScoreSql >= 0.5) AS pred_keep,
           (f.y = 1.0) AS label
         FROM cfeats f CROSS JOIN cw w"""),

    // decontamination: distinct word-3-gram overlap vs the fixed
    // 10-doc benchmark slice, flagged at >= 3 shared grams
    "q_decontaminate" -> (s"""WITH $deconCtes
         SELECT doc_id, n_overlap FROM contaminated"""),

    // bloom-prefiltered variant: no false negatives + exact confirm join
    // => answer-identical to q_decontaminate, oracle shared verbatim
    "q_decontaminate_bloom" -> (s"""WITH $deconCtes
         SELECT doc_id, n_overlap FROM contaminated"""),

    // deterministic split: first-8-hex of sha256(id || salt) mod 100 —
    // engine-independent (identical sha256 + unsigned-32 semantics)
    "q_hash_split" -> (s"""SELECT doc_id, source,
           CAST(${splitBucketSql("doc_id")} AS INT) AS bucket,
           ${splitCaseSql("doc_id")} AS split
         FROM documents"""),

    // token-budgeted mixture sample: hash-rank per source, keep while the
    // running token sum fits the budget; rank and cumsum share one window
    // order, integer arithmetic end-to-end
    "q_token_budget_sample" -> (s"""
         WITH t AS (
           SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             sha256(concat(CAST(doc_id AS VARCHAR), '${Queries.SplitSalt}')) AS k
           FROM documents),
         r AS (
           SELECT doc_id, source, n_tokens, k,
             row_number() OVER (PARTITION BY source ORDER BY k, doc_id) AS rn
           FROM t),
         c AS (
           SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
           FROM r WHERE rn <= ${Queries.SampleTokenBudget})
         SELECT doc_id, source, n_tokens, cum_tokens FROM c
         WHERE cum_tokens <= ${Queries.SampleTokenBudget}"""),

    // stratified corpus-mixture sample: hash-rank per source, top-N; both
    // engines produce lowercase-hex sha256, so the rank ORDER is identical
    "q_stratified_sample" -> (s"""
         SELECT doc_id, source, CAST(rn AS INT) AS sample_rank FROM (
           SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY sha256(concat(CAST(doc_id AS VARCHAR),
                 '${Queries.SplitSalt}')), doc_id) AS rn
           FROM documents) t
         WHERE rn <= ${Queries.SamplePerStratum}"""),

    // cluster-balanced diversity sample: the IVF corpus assignment (pc of
    // the shared CTEs — same lowest-id codebook, same decimal-exact
    // distance, same lowest-centroid tie-break) as the stratum, then the
    // identical sha256 hash-rank rule as q_stratified_sample
    "q_cluster_sample" -> (s"""WITH $ivfPairsCtes
         SELECT vec_id, centroid_id, CAST(rn AS INT) AS sample_rank FROM (
           SELECT neighbor_id AS vec_id, centroid_id,
             row_number() OVER (PARTITION BY centroid_id
               ORDER BY sha256(concat(CAST(neighbor_id AS VARCHAR),
                 '${Queries.SplitSalt}')), neighbor_id) AS rn
           FROM pc) t
         WHERE rn <= ${Queries.ClusterSampleK}"""),

    // word-3-gram repetition: per-doc gram counts then rollup; the ratio
    // divisions are double/int with identical operand order in both engines
    "q_repetition" ->
      """WITH w AS (
           SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         g AS (
           SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ws) - 2),
               i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS gram
           FROM w WHERE len(ws) >= 3),
         c AS (
           SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram)
         SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS n_uniq_grams,
           1.0 - CAST(count(*) AS DOUBLE) / sum(cnt) AS dup_ratio,
           CAST(max(cnt) AS DOUBLE) / sum(cnt) AS top_gram_ratio
         FROM c GROUP BY doc_id""",

    // curation gate: same stats formulation as q_text_stats, thresholds as
    // literals; concat_ws skips NULL reason slots in both engines
    "q_quality_gate" -> (s"""WITH $qualityStatsCtes
         SELECT doc_id, n_tokens, stop_ratio, uniq_ratio, quality_score,
           $qualityKeepPred AS keep,
           concat_ws(';',
             CASE WHEN n_tokens < ${Queries.QualityMinTokens} THEN 'too_short' END,
             CASE WHEN n_tokens > ${Queries.QualityMaxTokens} THEN 'too_long' END,
             CASE WHEN stop_ratio < ${Queries.QualityMinStopRatio} THEN 'low_stopword_ratio' END,
             CASE WHEN uniq_ratio < ${Queries.QualityMinUniqRatio} THEN 'low_lexical_diversity' END)
             AS drop_reasons
         FROM qs"""),

    // int8 quantize-then-rerank: symmetric per-vector scale (max|x|/127,
    // MIN_NORMAL-guarded), round-half-up via floor(x/s + 0.5) — identical
    // IEEE ops in both engines; the coarse integer dot is summed exactly
    // (BIGINT here, long in Spark), so the 4×k pool is deterministic, and
    // the final rank uses the same decimal-exact cosine as q_cosine_topk
    "q_quant_topk" ->
      """WITH z AS (
           SELECT vec_id, embedding,
             greatest(list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))),
               2.2250738585072014e-308) / 127.0 AS scale,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS nn
           FROM embeddings),
         q8 AS (
           SELECT vec_id, embedding, scale, nn,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)) AS q
           FROM z),
         pool AS (
           SELECT query_id, neighbor_id, qv, qn, nv, cn FROM (
             SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
               qq.embedding AS qv, qq.nn AS qn,
               cc.embedding AS nv, cc.nn AS cn,
               row_number() OVER (PARTITION BY qq.vec_id ORDER BY
                 CAST(list_sum(list_transform(list_zip(qq.q, cc.q),
                   p -> p[1] * p[2])) AS DOUBLE) * qq.scale * cc.scale DESC,
                 cc.vec_id) AS crn
             FROM (SELECT * FROM q8 WHERE vec_id < 5) qq
             JOIN q8 cc ON cc.vec_id <> qq.vec_id) t
           WHERE crn <= 40),
         rer AS (
           SELECT query_id, neighbor_id,
             CAST(list_sum(list_transform(list_zip(qv, nv),
               z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) / (sqrt(qn) * sqrt(cn)) AS cosine
           FROM pool)
         SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
           SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
           FROM rer) r
         WHERE rank <= 10""",

    "q_ivf_assign" -> ivfAssignSql,

    // inverted-list balance audit over the same assignment: skew =
    // max/avg list size, the probe-latency factor — the ANN-plane
    // member of the cap-audit family
    "q_ivf_list_balance" ->
      """WITH n2 AS (
           SELECT vec_id, embedding,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS nn
           FROM embeddings),
         c AS (SELECT vec_id AS centroid_id, embedding AS cv, nn AS cn FROM n2 WHERE vec_id < 16),
         p AS (
           SELECT v.vec_id, c.centroid_id,
             v.nn + c.cn - 2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
               z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS dist2
           FROM n2 v, c),
         a AS (
           SELECT vec_id, centroid_id FROM (
             SELECT *, row_number() OVER (
               PARTITION BY vec_id ORDER BY dist2, centroid_id) AS rn
             FROM p) r
           WHERE rn = 1),
         g AS (SELECT centroid_id, count(*) AS n FROM a GROUP BY centroid_id)
         SELECT CAST(count(*) AS BIGINT) AS n_lists,
           CAST(sum(n) AS BIGINT) AS n_vectors,
           CAST(min(n) AS BIGINT) AS min_list,
           CAST(max(n) AS BIGINT) AS max_list,
           CAST(sum(n) AS DOUBLE) / count(*) AS avg_list,
           CAST(max(n) AS DOUBLE) * count(*) / sum(n) AS skew
         FROM g""",

    // embedding outliers: the same assignment, ordered by distance —
    // farthest 20 from their centroid (dist2 hash-matches in
    // q_ivf_assign, so the (dist2 DESC, vec_id) cutoff is identical)
    "q_embed_outliers" ->
      s"""SELECT vec_id, centroid_id, dist2 FROM ($ivfAssignSql) t
         ORDER BY dist2 DESC, vec_id LIMIT 20""",

    // cross-source near-dup leakage: verified pairs at jaccard >= 0.5
    // bucketed by unordered source pair — shares the minhash CTE prefix
    "q_source_overlap" -> (minhashReachCte +
      """
         SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(count(*) AS BIGINT) AS n_pairs
         FROM jac j
         JOIN documents da ON da.doc_id = j.doc_a
         JOIN documents db ON db.doc_id = j.doc_b
         WHERE j.jaccard >= 0.5
         GROUP BY 1, 2"""),

    // incremental dedup: new batch = doc_id % 5 = 4. A pair (a < b) from
    // the shared jac CTE evicts b when b is new (a precedes it), and
    // evicts a only when b is OLD — a later new sibling never evicts an
    // earlier one. Candidates involving a new doc are identical between
    // the full sweep and the incremental banding (same total-size bucket
    // gate), so the shared CTE is the exact mirror.
    "q_incremental_dedup" -> (minhashReachCte +
      """,
         nd AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 4),
         hits AS (
           SELECT doc_b AS doc_id FROM jac
           WHERE jaccard >= 0.5 AND doc_b % 5 = 4
           UNION ALL
           SELECT doc_a FROM jac
           WHERE jaccard >= 0.5 AND doc_a % 5 = 4 AND doc_b % 5 <> 4),
         dups AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dups
           FROM hits GROUP BY doc_id)
         SELECT nd.doc_id,
           coalesce(d.n_dups, CAST(0 AS BIGINT)) AS n_dups,
           d.doc_id IS NULL AS keep
         FROM nd LEFT JOIN dups d USING (doc_id)"""),

    // per-doc distinctive term: lowest document frequency, ties to higher
    // in-doc count then token order — exact integer ordering, no float idf
    "q_distinctive_terms" ->
      """WITH t AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
         tf AS (
           SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
           FROM t GROUP BY 1, 2),
         dfreq AS (
           SELECT token, CAST(count(*) AS BIGINT) AS df
           FROM tf GROUP BY 1)
         SELECT doc_id, token, tf, df FROM (
           SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
             row_number() OVER (PARTITION BY tf.doc_id
               ORDER BY dfreq.df ASC, tf.tf DESC, tf.token ASC) AS rn
           FROM tf JOIN dfreq USING (token)) x
         WHERE rn = 1""",

    "q_binary_meta" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_hash,
           CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_chunks
         FROM documents""",

    // the multimodal curation gate over the text corpus wrapped as media:
    // every payload takes the deterministic fallback decoder (the corpus
    // carries no image magic bytes), whose width/height derive from the
    // first byte and byte length — the same expressions mirrored here.
    // The width reads the first UTF-8 BYTE (hex of the encoded blob), not
    // the first character's code point: ascii() would diverge from the
    // byte-based Spark kernel on any non-ASCII-initial document.
    // Real-image decode paths are spec-covered (no JDK-independent oracle
    // for pixel checksums); thresholds read Queries.Media* constants.
    "q_media_gate" -> s"""
         WITH m AS (
           SELECT doc_id,
             CAST(64 + CAST(concat('0x', substr(hex(encode(text)), 1, 2)) AS INT) % 64 AS INT) AS width,
             CAST(64 + octet_length(encode(text)) % 64 AS INT) AS height,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             'opaque' AS decoder
           FROM documents)
         SELECT doc_id, width, height, n_bytes, decoder,
           (width >= ${Queries.MediaMinW} AND height >= ${Queries.MediaMinH}
             AND n_bytes >= ${Queries.MediaMinBytes}
             AND n_bytes <= ${Queries.MediaMaxBytes}) AS keep,
           concat_ws(';',
             CASE WHEN width < ${Queries.MediaMinW} THEN 'too_narrow' END,
             CASE WHEN height < ${Queries.MediaMinH} THEN 'too_flat' END,
             CASE WHEN n_bytes < ${Queries.MediaMinBytes} THEN 'too_few_bytes' END,
             CASE WHEN n_bytes > ${Queries.MediaMaxBytes} THEN 'too_many_bytes' END)
             AS drop_reasons
         FROM m""",

    "q_ngram_jaccard" ->
      (s"""WITH $ngramOverlapCtes
         SELECT p.doc_a, p.doc_b,
           CAST(coalesce(i.n_inter, 0) AS DOUBLE)
             / (ca.n_g + cb.n_g - coalesce(i.n_inter, 0)) AS jaccard
         FROM pairs p
         LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         JOIN cnt ca ON ca.doc_id = p.doc_a
         JOIN cnt cb ON cb.doc_id = p.doc_b"""),

    // same pipeline, full overlap profile: containment flags sub-document
    // duplication that symmetric resemblance misses
    "q_ngram_containment" ->
      (s"""WITH $ngramOverlapCtes
         SELECT p.doc_a, p.doc_b,
           CAST(coalesce(i.n_inter, 0) AS DOUBLE)
             / (ca.n_g + cb.n_g - coalesce(i.n_inter, 0)) AS jaccard,
           CAST(coalesce(i.n_inter, 0) AS DOUBLE) / ca.n_g AS containment_a,
           CAST(coalesce(i.n_inter, 0) AS DOUBLE) / cb.n_g AS containment_b
         FROM pairs p
         LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         JOIN cnt ca ON ca.doc_id = p.doc_a
         JOIN cnt cb ON cb.doc_id = p.doc_b"""),

    "q_simhash_hamming" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
         th AS (SELECT doc_id, sha256(token) AS h FROM tok),
         tb AS (SELECT doc_id, h, unnest(generate_series(0, 31)) AS j FROM th),
         bits AS (
           SELECT doc_id, j,
             ((strpos('0123456789abcdef', substr(h, CAST(1 + j // 4 AS INT), 1)) - 1)
               >> CAST(3 - j % 4 AS INT)) & 1 AS bit
           FROM tb),
         votes AS (SELECT doc_id, j, sum(2 * bit - 1) AS v FROM bits GROUP BY doc_id, j),
         signs AS (SELECT doc_id, j, CASE WHEN v > 0 THEN 1 ELSE 0 END AS s FROM votes),
         sh AS (
           SELECT doc_id,
             CAST(sum(CAST(s AS BIGINT) << CAST(31 - j AS INT)) AS BIGINT) AS simhash
           FROM signs GROUP BY doc_id),
         bands AS (
           SELECT doc_id, simhash, b AS band, (simhash >> (8 * b)) & 255 AS bv
           FROM sh, (SELECT unnest(generate_series(0, 3)) AS b) t),
         ok AS (SELECT band, bv FROM bands GROUP BY band, bv
                HAVING count(*) BETWEEN 2 AND 10000),
         inok AS (SELECT b.* FROM bands b JOIN ok USING (band, bv)),
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sh_a, b.simhash AS sh_b
           FROM inok a JOIN inok b
             ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
         FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 1""",

    // 64-bit twin: the unsigned bit-sum runs in HUGEINT, then wraps to the
    // signed BIGINT Spark's LongType carries
    "q_simhash64" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
         th AS (SELECT doc_id, sha256(token) AS h FROM tok),
         tb AS (SELECT doc_id, h, unnest(generate_series(0, 63)) AS j FROM th),
         bits AS (
           SELECT doc_id, j,
             ((strpos('0123456789abcdef', substr(h, CAST(1 + j // 4 AS INT), 1)) - 1)
               >> CAST(3 - j % 4 AS INT)) & 1 AS bit
           FROM tb),
         votes AS (SELECT doc_id, j, sum(2 * bit - 1) AS v FROM bits GROUP BY doc_id, j),
         signs AS (SELECT doc_id, j, CASE WHEN v > 0 THEN 1 ELSE 0 END AS s FROM votes),
         u AS (SELECT doc_id, sum(CAST(s AS HUGEINT) << CAST(63 - j AS INT)) AS uv
               FROM signs GROUP BY doc_id)
         SELECT doc_id,
           CAST(CASE WHEN uv >= 9223372036854775808 THEN uv - 18446744073709551616
                     ELSE uv END AS BIGINT) AS simhash64
         FROM u""",

    "q_simhash64_hamming" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
         th AS (SELECT doc_id, sha256(token) AS h FROM tok),
         tb AS (SELECT doc_id, h, unnest(generate_series(0, 63)) AS j FROM th),
         bits AS (
           SELECT doc_id, j,
             ((strpos('0123456789abcdef', substr(h, CAST(1 + j // 4 AS INT), 1)) - 1)
               >> CAST(3 - j % 4 AS INT)) & 1 AS bit
           FROM tb),
         votes AS (SELECT doc_id, j, sum(2 * bit - 1) AS v FROM bits GROUP BY doc_id, j),
         signs AS (SELECT doc_id, j, CASE WHEN v > 0 THEN 1 ELSE 0 END AS s FROM votes),
         u AS (SELECT doc_id, sum(CAST(s AS HUGEINT) << CAST(63 - j AS INT)) AS uv
               FROM signs GROUP BY doc_id),
         sh AS (SELECT doc_id, uv,
           CAST(CASE WHEN uv >= 9223372036854775808 THEN uv - 18446744073709551616
                     ELSE uv END AS BIGINT) AS simhash
           FROM u),
         bands AS (
           SELECT doc_id, simhash,
             b AS band, CAST((uv >> CAST(16 * b AS INT)) & 65535 AS BIGINT) AS bv
           FROM sh, (SELECT unnest(generate_series(0, 3)) AS b) t),
         ok AS (SELECT band, bv FROM bands GROUP BY band, bv
                HAVING count(*) BETWEEN 2 AND 10000),
         inok AS (SELECT b.* FROM bands b JOIN ok USING (band, bv)),
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sh_a, b.simhash AS sh_b
           FROM inok a JOIN inok b
             ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
         FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3""",

    // band-bucket occupancy audit: same chain up to bands, per-bucket
    // counts classed against the 2..10000 cap — the no-silent-caps
    // companion of q_simhash64_hamming
    "q_simhash64_bucket_stats" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
         th AS (SELECT doc_id, sha256(token) AS h FROM tok),
         tb AS (SELECT doc_id, h, unnest(generate_series(0, 63)) AS j FROM th),
         bits AS (
           SELECT doc_id, j,
             ((strpos('0123456789abcdef', substr(h, CAST(1 + j // 4 AS INT), 1)) - 1)
               >> CAST(3 - j % 4 AS INT)) & 1 AS bit
           FROM tb),
         votes AS (SELECT doc_id, j, sum(2 * bit - 1) AS v FROM bits GROUP BY doc_id, j),
         signs AS (SELECT doc_id, j, CASE WHEN v > 0 THEN 1 ELSE 0 END AS s FROM votes),
         u AS (SELECT doc_id, sum(CAST(s AS HUGEINT) << CAST(63 - j AS INT)) AS uv
               FROM signs GROUP BY doc_id),
         bands AS (
           SELECT doc_id, b AS band,
             CAST((uv >> CAST(16 * b AS INT)) & 65535 AS BIGINT) AS bv
           FROM u, (SELECT unnest(generate_series(0, 3)) AS b) t),
         g AS (SELECT band, bv, count(*) AS n_occ FROM bands GROUP BY band, bv)
         SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(n_occ) AS BIGINT) AS n_rows_total,
           CAST(sum(CASE WHEN n_occ = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_buckets_singleton,
           CAST(sum(CASE WHEN n_occ > 10000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_buckets_hot,
           CAST(sum(CASE WHEN n_occ > 10000 THEN n_occ ELSE 0 END) AS BIGINT)
             AS n_rows_hot,
           CAST(sum(CASE WHEN n_occ BETWEEN 2 AND 10000 THEN n_occ ELSE 0 END)
             AS BIGINT) AS n_rows_pairable,
           CAST(sum(CASE WHEN n_occ BETWEEN 2 AND 10000 THEN n_occ ELSE 0 END)
             AS DOUBLE) / CAST(sum(n_occ) AS DOUBLE) AS pair_coverage
         FROM g""",

    "q_ivf_topk" -> ivfTopKSql,

    // sign-LSH binary codes (Charikar hyperplane LSH): 32× compression
    // of the embedding corpus into 8-byte codes
    "q_embed_binary" -> (s"""WITH $binaryCodeCtes
         SELECT vec_id, code64 FROM ecode"""),

    // coarse retrieval over the codes: brute hamming top-k for the
    // standard ANN query slice, ties to the lower neighbor id
    "q_binary_hamming_topk" -> (s"""WITH $binaryCodeCtes
         SELECT query_id, neighbor_id, CAST(hamming AS INT) AS hamming,
           CAST(rank AS INT) AS rank FROM (
           SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             bit_count(xor(q.code64, n.code64)) AS hamming,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY bit_count(xor(q.code64, n.code64)), n.vec_id) AS rank
           FROM ecode q JOIN ecode n ON n.vec_id <> q.vec_id
           WHERE q.vec_id < ${Queries.AnnNumQueries}) r
         WHERE rank <= ${Queries.AnnTopK}"""),

    // IVF × int8 composition: the q_ivf_topk probe/assignment structure
    // (n2/c/pc/qp CTE shapes) + the q_quant_topk quantization (z/q8) —
    // int8 coarse scores rank WITHIN probed lists to a 4×k pool, the
    // decimal-exact cosine reranks; multiplication order of the coarse
    // score (int sum × query scale × corpus scale) mirrors dot8 exactly
    "q_ivf_quant_topk" ->
      """WITH n2 AS (
           SELECT vec_id, embedding,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS nn
           FROM embeddings),
         c AS (
           SELECT vec_id AS centroid_id, embedding AS cv, nn AS cn FROM n2
           QUALIFY row_number() OVER (ORDER BY vec_id) <=
             CAST(ceil(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)),
         pc AS (
           SELECT vec_id AS neighbor_id, embedding AS nv, nn, centroid_id FROM (
             SELECT v.vec_id, v.embedding, v.nn, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 v.nn + c.cn - 2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
                   w -> CAST(CAST(w[1] AS DOUBLE) * CAST(w[2] AS DOUBLE) AS DECIMAL(28,12))))
                   AS DOUBLE), c.centroid_id) AS rn
             FROM n2 v, c) t
           WHERE rn = 1),
         qp AS (
           SELECT vec_id AS query_id, embedding AS qv, nn AS qn, centroid_id FROM (
             SELECT v.vec_id, v.embedding, v.nn, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 v.nn + c.cn - 2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
                   w -> CAST(CAST(w[1] AS DOUBLE) * CAST(w[2] AS DOUBLE) AS DECIMAL(28,12))))
                   AS DOUBLE), c.centroid_id) AS rn
             FROM (SELECT * FROM n2 WHERE vec_id < 5) v, c) t
           WHERE rn <= 3),
         z AS (
           SELECT vec_id, embedding,
             greatest(list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))),
               2.2250738585072014e-308) / 127.0 AS scale
           FROM embeddings),
         q8 AS (
           SELECT vec_id, scale,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)) AS q
           FROM z),
         cand AS (
           SELECT qp.query_id, pc.neighbor_id, qp.qv, qp.qn, pc.nv, pc.nn,
             CAST(list_sum(list_transform(list_zip(zq.q, zn.q),
               p -> p[1] * p[2])) AS DOUBLE) * zq.scale * zn.scale AS coarse
           FROM qp
           JOIN pc ON qp.centroid_id = pc.centroid_id AND pc.neighbor_id <> qp.query_id
           JOIN q8 zq ON zq.vec_id = qp.query_id
           JOIN q8 zn ON zn.vec_id = pc.neighbor_id),
         pool AS (
           SELECT query_id, neighbor_id, qv, qn, nv, nn FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY coarse DESC, neighbor_id) AS crn
             FROM cand) t
           WHERE crn <= 40),
         rer AS (
           SELECT query_id, neighbor_id,
             CAST(list_sum(list_transform(list_zip(qv, nv),
               w -> CAST(CAST(w[1] AS DOUBLE) * CAST(w[2] AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) / (sqrt(qn) * sqrt(nn)) AS cosine
           FROM pool)
         SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
           SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
           FROM rer) r
         WHERE rank <= 10""",

    // the materialized-index reader computes the SAME probed top-k (same
    // lowest-id codebook, probes, k) — what changes is the storage shape
    // (partition-pruned inverted lists), so the oracle is shared verbatim
    "q_ivf_topk_indexed" -> ivfTopKSql,

    // the incrementally-maintained commit-log index assigns each batch
    // against the SAME frozen codebook — assignment is per-row, so the
    // maintained lists equal the fresh build's and the oracle is shared
    "q_ivf_topk_maintained" -> ivfTopKSql,


    // k-means-refined IVF: two unrolled Lloyd rounds from the lowest-id
    // init, per-dimension means accumulated as DECIMAL(28,12) (the exact
    // mirror of Similarity.kmeansCentroids), then the same probed top-k as
    // q_ivf_topk against the refined codebook.
    "q_ivf_topk_kmeans" ->
      """WITH n2 AS (
           SELECT vec_id, embedding,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS nn
           FROM embeddings),
         c0 AS (
           SELECT vec_id AS centroid_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
           FROM embeddings
           QUALIFY row_number() OVER (ORDER BY vec_id) <=
             CAST(ceil(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)),
         cn0 AS (
           SELECT centroid_id, cv,
             CAST(list_sum(list_transform(cv,
               x -> CAST(x * x AS DECIMAL(28,12)))) AS DOUBLE) AS cn
           FROM c0),
         a1 AS (
           SELECT vec_id, centroid_id FROM (
             SELECT v.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 v.nn + c.cn - 2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
                   z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
                   AS DOUBLE), c.centroid_id) AS rn
             FROM n2 v, cn0 c) t
           WHERE rn = 1),
         x1 AS (
           SELECT a.centroid_id, v.embedding,
             unnest(generate_series(1, len(v.embedding))) AS pos
           FROM a1 a JOIN embeddings v USING (vec_id)),
         m1 AS (
           SELECT centroid_id, pos,
             CAST(sum(CAST(CAST(embedding[CAST(pos AS INT)] AS DOUBLE)
               AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m
           FROM x1 GROUP BY centroid_id, pos),
         c1 AS (
           SELECT centroid_id, list(m ORDER BY pos) AS cv
           FROM m1 GROUP BY centroid_id),
         cn1 AS (
           SELECT centroid_id, cv,
             CAST(list_sum(list_transform(cv,
               x -> CAST(x * x AS DECIMAL(28,12)))) AS DOUBLE) AS cn
           FROM c1),
         a2 AS (
           SELECT vec_id, centroid_id FROM (
             SELECT v.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 v.nn + c.cn - 2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
                   z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
                   AS DOUBLE), c.centroid_id) AS rn
             FROM n2 v, cn1 c) t
           WHERE rn = 1),
         x2 AS (
           SELECT a.centroid_id, v.embedding,
             unnest(generate_series(1, len(v.embedding))) AS pos
           FROM a2 a JOIN embeddings v USING (vec_id)),
         m2 AS (
           SELECT centroid_id, pos,
             CAST(sum(CAST(CAST(embedding[CAST(pos AS INT)] AS DOUBLE)
               AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m
           FROM x2 GROUP BY centroid_id, pos),
         c2 AS (
           SELECT centroid_id, list(m ORDER BY pos) AS cv
           FROM m2 GROUP BY centroid_id),
         cn2 AS (
           SELECT centroid_id, cv,
             CAST(list_sum(list_transform(cv,
               x -> CAST(x * x AS DECIMAL(28,12)))) AS DOUBLE) AS cn
           FROM c2),
         pc AS (
           SELECT vec_id AS neighbor_id, embedding AS nv, nn, centroid_id FROM (
             SELECT v.vec_id, v.embedding, v.nn, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 v.nn + c.cn - 2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
                   z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
                   AS DOUBLE), c.centroid_id) AS rn
             FROM n2 v, cn2 c) t
           WHERE rn = 1),
         qp AS (
           SELECT vec_id AS query_id, embedding AS qv, nn AS qn, centroid_id FROM (
             SELECT v.vec_id, v.embedding, v.nn, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 v.nn + c.cn - 2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
                   z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
                   AS DOUBLE), c.centroid_id) AS rn
             FROM (SELECT * FROM n2 WHERE vec_id < 5) v, cn2 c) t
           WHERE rn <= 3),
         pairs AS (
           SELECT qp.query_id, pc.neighbor_id,
             CAST(list_sum(list_transform(list_zip(qp.qv, pc.nv),
               z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) / (sqrt(qp.qn) * sqrt(pc.nn)) AS cosine
           FROM qp JOIN pc
             ON qp.centroid_id = pc.centroid_id AND pc.neighbor_id <> qp.query_id)
         SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
           SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
           FROM pairs) r
         WHERE rank <= 10""",

    "q_lang_id" ->
      (s"""WITH $langScoreCte
         SELECT doc_id, score_en, score_de, score_fr,
           $langCaseSql AS pred_lang
         FROM sc"""),

    // confusion audit: predicted vs labeled language — same score CTE and
    // decision CASE as q_lang_id (single-sourced, cannot drift)
    "q_lang_confusion" ->
      (s"""WITH $langScoreCte,
         p AS (SELECT doc_id, $langCaseSql AS pred_lang FROM sc)
         SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n
         FROM documents d JOIN p USING (doc_id)
         GROUP BY 1, 2"""),

    // sequence packing: exclusive running token sum in doc_id order, then
    // the 2048-token sequence each document starts in. The window form IS
    // the semantics; the engine computes it as a distributed prefix-sum
    // (DuckDB window SUM(BIGINT) returns HUGEINT — cast back)
    "q_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         o AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS start_offset
           FROM t)
         SELECT doc_id, n_tokens, start_offset,
           CAST(FLOOR(start_offset / ${Queries.PackBudget}.0) AS BIGINT) AS seq_id
         FROM o""",

    // label coherence: per-label decimal-exact centroids, nearest-centroid
    // re-assignment (squared L2, ties to lowest label), confusion rollup —
    // the same exact-mean/exact-dot CTE shapes as the kmeans oracle
    "q_label_coherence" ->
      """WITH n2 AS (
           SELECT vec_id, embedding, CAST(label AS BIGINT) AS label,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS nn
           FROM embeddings),
         x AS (
           SELECT CAST(label AS BIGINT) AS lbl, embedding,
             unnest(generate_series(1, len(embedding))) AS pos
           FROM embeddings),
         m AS (
           SELECT lbl, pos,
             CAST(sum(CAST(CAST(embedding[CAST(pos AS INT)] AS DOUBLE)
               AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m
           FROM x GROUP BY lbl, pos),
         c AS (SELECT lbl, list(m ORDER BY pos) AS cv FROM m GROUP BY lbl),
         cn AS (
           SELECT lbl, cv,
             CAST(list_sum(list_transform(cv,
               x -> CAST(x * x AS DECIMAL(28,12)))) AS DOUBLE) AS cn
           FROM c),
         a AS (
           SELECT vec_id, label, predicted_label FROM (
             SELECT v.vec_id, v.label, c.lbl AS predicted_label,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 v.nn + c.cn - 2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
                   z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
                   AS DOUBLE), c.lbl) AS rn
             FROM n2 v, cn c) t
           WHERE rn = 1)
         SELECT label, predicted_label, CAST(COUNT(*) AS BIGINT) AS n
         FROM a GROUP BY 1, 2""",

    // vocabulary heavy hitters: top-100 tokens by occurrence count with
    // document frequencies, token-tie-broken so the cutoff is stable
    "q_vocab_topk" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
         d AS (SELECT token, doc_id, COUNT(*) AS n FROM t GROUP BY 1, 2)
         SELECT token, CAST(SUM(n) AS BIGINT) AS n_occurrences,
           CAST(COUNT(*) AS BIGINT) AS n_docs
         FROM d GROUP BY token
         ORDER BY n_occurrences DESC, token ASC LIMIT ${Queries.VocabK}""",

    "q_token_count" ->
      """SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text,
             '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +'))
             AS BIGINT) AS n_bpeish_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
         FROM documents""",

    "q_winnow" -> (s"WITH $winnowCtes" +
      """
         SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp,
           list_min(fp) AS fp_min, list_max(fp) AS fp_max,
           CAST(list_sum(fp) AS BIGINT) AS fp_sum
         FROM wnw"""),

    // winnow candidate pairs: shared fingerprints with the same bucket
    // gate (2..50) as the Spark side; n_shared counts capped fps only
    "q_winnow_pairs" -> (s"WITH $winnowCtes," +
      """
         f AS (SELECT doc_id, unnest(fp) AS fpv FROM wnw),
         ok AS (SELECT fpv FROM f GROUP BY fpv
                HAVING count(*) BETWEEN 2 AND 50),
         fi AS (SELECT f.* FROM f JOIN ok USING (fpv))
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
         FROM fi a JOIN fi b ON a.fpv = b.fpv AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 3"""),

    // winnow bucket-gate coverage audit: how much fingerprint mass the
    // 2..50 cap keeps pairable — the no-silent-caps companion of
    // q_winnow_pairs (same gate constants)
    "q_winnow_coverage" -> (s"WITH $winnowCtes," +
      """
         f AS (SELECT doc_id, unnest(fp) AS fpv FROM wnw),
         g AS (SELECT fpv, count(*) AS n_occ FROM f GROUP BY fpv)
         SELECT CAST(count(*) AS BIGINT) AS n_fp_distinct,
           CAST(sum(n_occ) AS BIGINT) AS n_occ_total,
           CAST(sum(CASE WHEN n_occ = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_fp_singleton,
           CAST(sum(CASE WHEN n_occ > 50 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_fp_hot,
           CAST(sum(CASE WHEN n_occ > 50 THEN n_occ ELSE 0 END) AS BIGINT)
             AS n_occ_hot,
           CAST(sum(CASE WHEN n_occ BETWEEN 2 AND 50 THEN n_occ ELSE 0 END)
             AS BIGINT) AS n_occ_pairable,
           CAST(sum(CASE WHEN n_occ BETWEEN 2 AND 50 THEN n_occ ELSE 0 END)
             AS DOUBLE) / CAST(sum(n_occ) AS DOUBLE) AS pair_coverage
         FROM g"""),

    // bigram heavy hitters: q_vocab_topk generalized to 2-grams
    "q_bigram_topk" ->
      s"""WITH t AS (
           SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ws) - 1),
               i -> concat_ws(' ', ws[i], ws[i+1]))) AS ngram
           FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) s
           WHERE len(ws) >= 2),
         d AS (SELECT ngram, doc_id, COUNT(*) AS n FROM t GROUP BY 1, 2)
         SELECT ngram, CAST(SUM(n) AS BIGINT) AS n_occurrences,
           CAST(COUNT(*) AS BIGINT) AS n_docs
         FROM d GROUP BY ngram
         ORDER BY n_occurrences DESC, ngram ASC LIMIT ${Queries.VocabK}""",

    "q_embed_neardup" -> (s"WITH $embedNearDupCtes" +
      """
         SELECT vec_a, vec_b, cosine FROM ep"""),

    // (centroid, label) block-occupancy audit over the same assignment
    // chain: the embedding-plane no-silent-caps row (cap 10000, matching
    // the ok gate above; ep is defined but unused — valid SQL)
    "q_embed_block_stats" -> (s"WITH $embedNearDupCtes" +
      """
         , g AS (SELECT centroid_id, label, count(*) AS n_occ
                 FROM a GROUP BY centroid_id, label)
         SELECT CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(n_occ) AS BIGINT) AS n_vectors_total,
           CAST(sum(CASE WHEN n_occ = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocks_singleton,
           CAST(sum(CASE WHEN n_occ > 10000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocks_hot,
           CAST(sum(CASE WHEN n_occ > 10000 THEN n_occ ELSE 0 END) AS BIGINT)
             AS n_vectors_hot,
           CAST(sum(CASE WHEN n_occ BETWEEN 2 AND 10000 THEN n_occ ELSE 0 END)
             AS BIGINT) AS n_vectors_pairable,
           CAST(sum(CASE WHEN n_occ BETWEEN 2 AND 10000 THEN n_occ ELSE 0 END)
             AS DOUBLE) / CAST(sum(n_occ) AS DOUBLE) AS pair_coverage
         FROM g"""),

    // semantic split leakage: the same ep pair sliver rolled up by the
    // deterministic split labels of its endpoints
    "q_semantic_split_leakage" -> (s"""WITH $embedNearDupCtes
         SELECT least(${splitCaseSql("vec_a")}, ${splitCaseSql("vec_b")})
             AS split_a,
           greatest(${splitCaseSql("vec_a")}, ${splitCaseSql("vec_b")})
             AS split_b,
           CAST(count(*) AS BIGINT) AS n_pairs
         FROM ep GROUP BY 1, 2"""),

    // SemDeDup keep-list: connected components over the embedding
    // near-dup pairs (same ep CTE as q_embed_neardup), one survivor (the
    // min vec id) per cluster with its member count — the embedding twin
    // of q_dedup_keep
    "q_semdedup_keep" -> (s"WITH RECURSIVE $embedNearDupCtes," +
      """
         e AS (
           SELECT vec_a AS src, vec_b AS dst FROM ep
           UNION ALL
           SELECT vec_b, vec_a FROM ep),
         reach(vec_id, label) AS (
           SELECT vec_id, vec_id FROM embeddings
           UNION
           SELECT e.dst, r.label FROM reach r JOIN e ON e.src = r.vec_id)
         SELECT cluster_id AS vec_id, CAST(count(*) AS BIGINT) AS n_members
         FROM (SELECT vec_id, min(label) AS cluster_id
               FROM reach GROUP BY vec_id) c
         GROUP BY cluster_id"""),

    // token-length histogram: decade buckets over the whitespace token
    // count — the length distribution behind packing budgets and
    // curriculum mixes
    "q_length_histogram" ->
      """WITH t AS (
           SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents)
         SELECT (n_tokens // 10) * 10 AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total
         FROM t GROUP BY 1""",

    // shard balance: round-robin on the packed seq_id (the writeShards
    // assignment), rolled up per shard — same window cumsum as
    // q_pack_sequences underneath
    "q_shard_balance" ->
      s"""WITH t AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         o AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS start_offset
           FROM t),
         p AS (SELECT doc_id, n_tokens,
             CAST(FLOOR(start_offset / ${Queries.PackBudget}.0) AS BIGINT) AS seq_id
           FROM o)
         SELECT seq_id % 8 AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT seq_id) AS BIGINT) AS n_seqs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total
         FROM p GROUP BY 1""",

    // per-label centroid drift between even/odd vec_id halves: exact
    // decimal means per (label, half), exact squared-L2 shift — the same
    // mean discipline as q_label_coherence
    "q_embed_drift" ->
      """WITH x AS (
           SELECT CAST(label AS BIGINT) AS lbl, vec_id % 2 AS snap, embedding,
             unnest(generate_series(1, len(embedding))) AS pos
           FROM embeddings),
         m AS (
           SELECT lbl, snap, pos,
             CAST(sum(CAST(CAST(embedding[CAST(pos AS INT)] AS DOUBLE)
               AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m
           FROM x GROUP BY lbl, snap, pos),
         c AS (SELECT lbl, snap, list(m ORDER BY pos) AS cv
               FROM m GROUP BY lbl, snap),
         n AS (SELECT CAST(label AS BIGINT) AS lbl, vec_id % 2 AS snap,
                 CAST(count(*) AS BIGINT) AS cnt
               FROM embeddings GROUP BY 1, 2)
         SELECT o.lbl AS label, no.cnt AS n_old, nn.cnt AS n_new,
           CAST(list_sum(list_transform(list_zip(o.cv, w.cv),
             z -> CAST((z[1] - z[2]) * (z[1] - z[2]) AS DECIMAL(28,12))))
             AS DOUBLE) AS drift2
         FROM c o
         JOIN c w ON w.lbl = o.lbl AND o.snap = 0 AND w.snap = 1
         JOIN n no ON no.lbl = o.lbl AND no.snap = 0
         JOIN n nn ON nn.lbl = o.lbl AND nn.snap = 1""",

    // per-source quality report: doc counts, quality-gate keep rate,
    // token volume, decimal-exact mean quality — the mixture-weight
    // planning table; stats and keep predicate are the shared fragments
    "q_source_quality" -> (s"""WITH $qualityStatsCtes,
         j AS (
           SELECT d.source, qs.n_tokens, qs.quality_score,
             CASE WHEN $qualityKeepPred THEN 1 ELSE 0 END AS keep
           FROM qs JOIN documents d USING (doc_id))
         SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(keep) AS BIGINT) AS n_keep,
           CAST(sum(keep) AS DOUBLE) / count(*) AS keep_rate,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total,
           CAST(sum(CAST(quality_score AS DECIMAL(18,12))) AS DOUBLE)
             / count(*) AS avg_quality
         FROM j GROUP BY source"""),

    // DSIR-style importance weights: smoothed target/corpus token-ratio
    // mean per doc (exact integer counts → one double division per token
    // → DECIMAL(28,12)-exact sum), top-quarter keep via the k-th
    // (score desc, id) threshold row — ceil-division k as in Spark
    "q_dsir_weights" -> (s"""
         WITH t AS (
           SELECT doc_id, (lang = 'en') AS tgt,
             unnest(string_split(text, ' ')) AS token
           FROM documents),
         st AS (
           SELECT token, CAST(count(*) AS BIGINT) AS cr,
             CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct
           FROM t GROUP BY token),
         tot AS (
           SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt,
             CAST(count(*) AS BIGINT) AS v
           FROM st),
         sc AS (
           SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CAST(
               CAST(st.ct + 1 AS DOUBLE) * CAST(tot.nr + tot.v AS DOUBLE)
                 / (CAST(st.cr + 1 AS DOUBLE) * CAST(tot.nt + tot.v AS DOUBLE))
               AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS dsir_score
           FROM t JOIN st USING (token) CROSS JOIN tot
           GROUP BY t.doc_id),
         thr AS (
           SELECT dsir_score AS ts, doc_id AS td FROM sc
           QUALIFY row_number() OVER (ORDER BY dsir_score DESC, doc_id) =
             ((SELECT count(*) FROM documents) * ${Queries.DsirKeepNum}
               + ${Queries.DsirKeepDen - 1}) // ${Queries.DsirKeepDen})
         SELECT sc.doc_id, sc.n_tokens, sc.dsir_score,
           (sc.dsir_score > thr.ts
             OR (sc.dsir_score = thr.ts AND sc.doc_id <= thr.td)) AS selected
         FROM sc CROSS JOIN thr"""),

    // temperature-scaled mixture weights: τ=1 (proportional) and τ=0.5
    // (sqrt up-sampling); the sqrt-sum denominator is floor-quantized to
    // 1e-6 then summed as exact BIGINTs — floor of a double is bit-exact
    // in both engines, where a direct double→DECIMAL cast of an
    // irrational sqrt rounds engine-specifically near scale boundaries
    "q_mixture_weights" ->
      """WITH per AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY source),
         tot AS (
           SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
             CAST(sum(CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0)
               AS BIGINT)) AS BIGINT) AS stotq
           FROM per)
         SELECT source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS w_prop,
           sqrt(CAST(n_tokens AS DOUBLE))
             / (CAST(stotq AS DOUBLE) / 1000000.0) AS w_temp
         FROM per CROSS JOIN tot""",

    // sub-document chunk dedup: 10-token chunks, corpus-wide first
    // occurrence (doc_id, chunk idx) wins, docs reassemble in order.
    // q_chunk_dedup_hashed runs the SAME oracle: its Spark plan keys the
    // first-occurrence shuffle by xxhash64(chunk) instead of the chunk
    // text (the shuffle-bytes lever), which changes bytes moved, not rows
    // kept — identical output absent a 64-bit collision.
    "q_chunk_dedup_hashed" -> chunkDedupSql,
    "q_chunk_dedup" -> chunkDedupSql,

    // content-defined chunking: boundaries where the trailing CdcWindow-gram
    // sha256 starts below CdcHexDigits; both variants (text-keyed and
    // xxhash64-keyed window) must match the one chunk-policy oracle
    "q_cdc_dedup" -> cdcDedupSql,
    "q_cdc_dedup_hashed" -> cdcDedupSql,

    // PCA fit inside the determinism contract: the oracle re-runs the
    // identical quantized power iteration to bit-identical loadings
    "q_pca_components" -> pcaComponentsSql,
    "q_pca_project" -> pcaProjectSql,

    // CCNet-style boilerplate-line removal over the seeded multiline
    // view: a line in >= LineDedupMinDocs distinct docs is dropped from
    // every document; reassembly preserves original line order
    "q_line_dedup" -> (s"""WITH $mLinesCtes,
         hot AS (
           SELECT line FROM (SELECT DISTINCT line, doc_id FROM pl)
           GROUP BY line HAVING count(*) >= ${Queries.LineDedupMinDocs}),
         keptl AS (
           SELECT * FROM pl WHERE line NOT IN (SELECT line FROM hot)),
         r AS (
           SELECT doc_id, count(*) AS n_kept,
             string_agg(line, chr(10) ORDER BY pos) AS clean_text
           FROM keptl GROUP BY doc_id)
         SELECT ml.doc_id, coalesce(r.clean_text, '') AS clean_text,
           CAST(len(ml.ls) AS BIGINT) AS n_lines,
           CAST(len(ml.ls) - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped
         FROM ml LEFT JOIN r USING (doc_id)"""),

    // within-document first-occurrence line dedup on the same view
    "q_intradoc_dedup" -> (s"""WITH $mLinesCtes,
         f AS (
           SELECT doc_id, line, pos,
             row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn
           FROM pl),
         k AS (
           SELECT doc_id, count(*) AS n_kept,
             string_agg(line, chr(10) ORDER BY pos) AS clean_text
           FROM f WHERE rn = 1 GROUP BY doc_id)
         SELECT ml.doc_id, k.clean_text,
           CAST(len(ml.ls) AS BIGINT) AS n_lines,
           CAST(len(ml.ls) - k.n_kept AS BIGINT) AS n_dupes_removed
         FROM ml JOIN k USING (doc_id)"""),

    // rule-based junk-line strip: the lineKeep predicate as a list_filter
    // lambda over the split line list — scan-local on both engines
    "q_line_filter" -> (s"""WITH $mLinesCtes
         SELECT doc_id,
           array_to_string(list_filter(ls, x -> ${lineKeepSql("x")}),
             chr(10)) AS clean_text,
           CAST(len(ls) AS BIGINT) AS n_lines,
           CAST(len(list_filter(ls, x -> ${lineKeepSql("x")})) AS BIGINT)
             AS n_kept
         FROM ml"""),

    // exact heavy hitters: the Spark side answers via MG sketch + exact
    // confirm, whose k·phi>1 guarantee makes it EQUAL to this full
    // GROUP BY + HAVING (the whole point of the exact-confirm pass)
    "q_heavy_hitters" ->
      s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
           FROM documents),
         tot AS (SELECT COUNT(*) AS total FROM t)
         SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(*) AS DOUBLE) / total AS share
         FROM t, tot GROUP BY token, total
         HAVING COUNT(*) >= CAST(CEIL(${Queries.HeavyHitterPhi} * total) AS BIGINT)""",

    // PMI collocations: the ratio chain below is written in EXACTLY the
    // Spark operator's operation order (exact BIGINT counts → one fixed
    // shape of IEEE double ops), so the doubles are bit-identical
    "q_pmi_collocations" ->
      s"""WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
         pc AS (
           SELECT bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS n_pair FROM (
             SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
               i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS bg
             FROM w WHERE len(ws) >= 2) b
           GROUP BY 1, 2),
         uc AS (SELECT t, COUNT(*) AS n FROM
           (SELECT unnest(ws) AS t FROM w) u GROUP BY t),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tokens FROM uc),
         btot AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS n_bigrams FROM pc)
         SELECT pc.w1, pc.w2, CAST(pc.n_pair AS BIGINT) AS n_pair,
           CAST(ua.n AS BIGINT) AS n_a, CAST(ub.n AS BIGINT) AS n_b,
           (CAST(pc.n_pair AS DOUBLE) * n_tokens * n_tokens) /
             (CAST(n_bigrams AS DOUBLE) * ua.n * ub.n) AS pmi_ratio
         FROM pc, tot, btot
         JOIN uc ua ON ua.t = pc.w1
         JOIN uc ub ON ub.t = pc.w2
         WHERE pc.n_pair >= ${Queries.PmiMinPair}
         ORDER BY pmi_ratio DESC, w1 ASC, w2 ASC LIMIT ${Queries.PmiTopK}""",


    // ANN recall@10: per query, |IVF top-10 ∩ brute-force top-10| / 10 —
    // the IVF chain is the shared ivfPairsCtes, brute force the cosine CTE
    "q_ann_recall" -> (s"""
         WITH $ivfPairsCtes,
         approx AS (
           SELECT query_id, neighbor_id FROM (
             SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
             FROM pairs) r
           WHERE rank <= 10),
         bfpairs AS (
           SELECT q.query_id, c2.neighbor_id,
             CAST(list_sum(list_transform(list_zip(q.qv, c2.nv),
               z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) / (sqrt(q.qn) * sqrt(c2.cn)) AS cosine
           FROM (SELECT vec_id AS query_id, embedding AS qv, nn AS qn
                 FROM n2 WHERE vec_id < 5) q,
                (SELECT vec_id AS neighbor_id, embedding AS nv, nn AS cn FROM n2) c2
           WHERE c2.neighbor_id <> q.query_id),
         bf AS (
           SELECT query_id, neighbor_id FROM (
             SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
             FROM bfpairs) r
           WHERE rank <= 10)
         SELECT b.query_id, CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
           CAST(count(a.neighbor_id) AS DOUBLE) / 10.0 AS recall
         FROM bf b LEFT JOIN approx a
           ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
         GROUP BY b.query_id"""),

    // corpus-bigram LM score: Laplace-smoothed mean P(w2|w1) per doc —
    // exact integer counts → one double division per bigram →
    // DECIMAL(28,12)-exact sum, as in Spark; <2-token docs score NULL
    "q_lm_score" ->
      s"""WITH $lmScoreCtes
         SELECT doc_id, n_bigrams, lm_score FROM lmr""",

    // dynamic quality threshold: keep docs at or above the corpus's own
    // lm_score percentile — percentile_disc picks an actual data value,
    // so the cut is engine-deterministic (same lmr chain as q_lm_score)
    "q_lm_percentile_gate" ->
      s"""WITH $lmScoreCtes,
         s AS (SELECT doc_id, lm_score FROM lmr WHERE lm_score IS NOT NULL),
         thr AS (SELECT quantile_disc(lm_score, ${Queries.LmGatePercentile})
           AS t FROM s)
         SELECT doc_id, lm_score, t AS threshold, (lm_score >= t) AS keep
         FROM s CROSS JOIN thr""",

    // Gopher-rule audit: all signals are exact integer counts with single
    // double divisions; boolean thresholds identical to the Spark side
    "q_gopher_rules" -> (s"""
         WITH $gopherCtes
         SELECT doc_id, n_tokens, avg_token_len, repeat_ratio, n_distinct_stop,
           (n_tokens BETWEEN ${Queries.GopherMinTokens} AND ${Queries.GopherMaxTokens})
             AS ok_token_count,
           (avg_token_len >= ${Queries.GopherMinAvgTokLen}
             AND avg_token_len <= ${Queries.GopherMaxAvgTokLen}) AS ok_avg_token_len,
           (repeat_ratio <= ${Queries.GopherMaxRepeatRatio}) AS ok_repeat_ratio,
           (n_distinct_stop >= ${Queries.GopherMinDistinctStop}) AS ok_stopwords,
           $gopherKeepPred AS keep
         FROM gpm"""),

    // quality curriculum: band from the SAME shared quality/gopher
    // predicates as the gate oracles; the global position is the plain
    // total-order row_number here — the engine's no-global-sort
    // decomposition must land on exactly this order (shard is a hash
    // prefix, so (band, shard, hash) ≡ (band, hash))
    "q_curriculum_order" -> (s"""WITH $qualityStatsCtes, $gopherCtes,
         qk AS (SELECT doc_id, $qualityKeepPred AS qkeep FROM qs),
         gk AS (SELECT doc_id, $gopherKeepPred AS gkeep FROM gpm),
         b AS (
           SELECT doc_id,
             CASE WHEN qkeep AND gkeep THEN 0
                  WHEN qkeep THEN 1 ELSE 2 END AS band
           FROM qk JOIN gk USING (doc_id))
         SELECT doc_id, band,
           CAST(row_number() OVER (ORDER BY band,
             sha256(concat(CAST(doc_id AS VARCHAR), '${Queries.SplitSalt}')),
             doc_id) - 1 AS BIGINT) AS curriculum_pos
         FROM b"""),

    // v2 curation: gopher-rule gate ∧ LM-score floor ∧ dedup survivor ∧
    // not-contaminated → scrub → split; every stage is the same shared
    // fragment (or same-constant inline) its standalone oracle uses
    "q_curate_v2" -> (minhashReachCte + s""",
         gs AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS gn,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS gu,
             CAST(length(text) AS BIGINT) AS gc,
             CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
               ['the', 'a'])) AS BIGINT) AS gds
           FROM documents),
         gk AS (
           SELECT doc_id FROM gs
           WHERE gn BETWEEN ${Queries.GopherMinTokens} AND ${Queries.GopherMaxTokens}
             AND CAST(gc - (gn - 1) AS DOUBLE) / gn >= ${Queries.GopherMinAvgTokLen}
             AND CAST(gc - (gn - 1) AS DOUBLE) / gn <= ${Queries.GopherMaxAvgTokLen}
             AND CAST(1 AS DOUBLE) - CAST(gu AS DOUBLE) / gn <= ${Queries.GopherMaxRepeatRatio}
             AND gds >= ${Queries.GopherMinDistinctStop}),
         lmd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         lmbi AS (
           SELECT doc_id, unnest(generate_series(1, len(w) - 1)) AS i, w
           FROM lmd WHERE len(w) >= 2),
         lmb2 AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM lmbi),
         lmbc AS (
           SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
           FROM lmb2 GROUP BY w1, w2),
         lmpc AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM lmbc GROUP BY w1),
         lmv AS (
           SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM (
             SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
         lmk AS (
           SELECT doc_id FROM (
             SELECT lmb2.doc_id,
               CAST(sum(CAST(
                 CAST(lmbc.c12 + 1 AS DOUBLE) / CAST(lmpc.c1 + lmv.v AS DOUBLE)
                 AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS lm_score
             FROM lmb2 JOIN lmbc USING (w1, w2) JOIN lmpc USING (w1) CROSS JOIN lmv
             GROUP BY lmb2.doc_id) sc
           WHERE lm_score >= ${Queries.CurateV2LmMin}),
         reps AS (
           SELECT doc_id FROM (
             SELECT doc_id, min(label) AS cluster_id
             FROM reach GROUP BY doc_id) c
           WHERE doc_id = cluster_id),
         $deconCtes,
         $piiSeededCte
         SELECT d.doc_id,
           ${scrubCleanSql("d.text")} AS clean,
           ${splitCaseSql("d.doc_id")} AS split
         FROM seeded d
         JOIN gk USING (doc_id)
         JOIN lmk USING (doc_id)
         JOIN reps USING (doc_id)
         LEFT JOIN contaminated ct ON ct.doc_id = d.doc_id
         WHERE ct.doc_id IS NULL"""),

    // per-source data card: cluster sizes from the reach chain, the
    // decon scan, and the lm chain rolled up by source; the lm mean is
    // floor-quantized to 1e-12 (the mixture-weight determinism rule)
    "q_corpus_card" -> (minhashReachCte + s""",
         cs AS (SELECT doc_id, min(label) AS cluster_id
           FROM reach GROUP BY doc_id),
         csz AS (SELECT cluster_id, count(*) AS csize FROM cs GROUP BY cluster_id),
         dup AS (SELECT cs.doc_id, (csz.csize > 1) AS isdup
           FROM cs JOIN csz USING (cluster_id)),
         lmd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         lmbi AS (
           SELECT doc_id, unnest(generate_series(1, len(w) - 1)) AS i, w
           FROM lmd WHERE len(w) >= 2),
         lmb2 AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM lmbi),
         lmbc AS (
           SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
           FROM lmb2 GROUP BY w1, w2),
         lmpc AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM lmbc GROUP BY w1),
         lmv AS (
           SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM (
             SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
         lmsc AS (
           SELECT lmb2.doc_id,
             CAST(sum(CAST(
               CAST(lmbc.c12 + 1 AS DOUBLE) / CAST(lmpc.c1 + lmv.v AS DOUBLE)
               AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS lm_score
           FROM lmb2 JOIN lmbc USING (w1, w2) JOIN lmpc USING (w1) CROSS JOIN lmv
           GROUP BY lmb2.doc_id),
         $deconCtes,
         base AS (SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS nt FROM documents)
         SELECT b.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(b.nt) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN dup.isdup THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(sum(CASE WHEN ct.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(sum(CASE WHEN dup.isdup THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS dup_rate,
           CAST(sum(CASE WHEN ct.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS contamination_rate,
           CAST(sum(CAST(floor(lmsc.lm_score * 1000000000000.0) AS BIGINT))
               AS DOUBLE) / 1000000000000.0
             / CAST(count(lmsc.lm_score) AS DOUBLE) AS mean_lm_score
         FROM base b
         JOIN dup USING (doc_id)
         LEFT JOIN contaminated ct ON ct.doc_id = b.doc_id
         LEFT JOIN lmsc USING (doc_id)
         GROUP BY b.source"""),

    // v3 curation: v2's gates with the dynamic lm decile (same lm chain
    // as q_lm_percentile_gate), a semantic-decon anti-join (same cosine
    // form as q_decontaminate_semantic, CTEs prefixed sd to avoid the
    // reach chain's names), and the cluster split of q_cluster_split


    "q_curate_v3" -> (curateV3Ctes + """
         SELECT doc_id, clean, split FROM cv3"""),

    // dataset manifest: the pack-sequence shard rule + an order-invariant
    // XOR of per-doc sha256-prefix fingerprints (15 hex chars = 60 bits,
    // signed-BIGINT-safe in both engines)
    "q_dataset_manifest" -> (s"""
         WITH mt AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         mo AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS start_offset
           FROM mt),
         ms AS (SELECT doc_id, n_tokens,
             CAST(FLOOR(start_offset / ${Queries.PackBudget}.0) AS BIGINT)
               % ${Queries.NShards} AS shard_id
           FROM mo),
         mf AS (SELECT ms.shard_id, ms.n_tokens,
             CAST(concat('0x', substr(sha256(concat(CAST(d.doc_id AS VARCHAR),
               ':', d.text)), 1, 15)) AS BIGINT) AS fp
           FROM ms JOIN documents d USING (doc_id))
         SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total,
           bit_xor(fp) AS content_fp
         FROM mf GROUP BY shard_id"""),

    // classifier evaluation: confusion rollup + derived metrics, all
    // single float divisions of exact BIGINT counts
    "q_classifier_eval" -> (s"""WITH $qualityStatsCtes, $gopherCtes,
         $classifierCtes,
         cm AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN $classifierScoreSql >= 0.5 AND f.y = 1.0
               THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN $classifierScoreSql >= 0.5 AND f.y = 0.0
               THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN $classifierScoreSql < 0.5 AND f.y = 1.0
               THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN $classifierScoreSql < 0.5 AND f.y = 0.0
               THEN 1 ELSE 0 END) AS BIGINT) AS tn
           FROM cfeats f CROSS JOIN cw w)
         SELECT n, tp, fp, fn, tn,
           CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
           CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall,
           CAST(2*tp AS DOUBLE) / CAST(2*tp + fp + fn AS DOUBLE) AS f1,
           CAST(tp + tn AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy
         FROM cm"""),

    // v4: v3's survivors gated by the TRAINED classifier, ordered by
    // learned quality (score-decile band, best first, hash-shuffled
    // within band) — the engine computes the same position without a
    // global sort (band/hash decomposition, see q_curriculum_order)
    "q_curate_v4" -> (curateV3Ctes + s""",
         $qualityStatsCtes, $gopherCtes,
         $classifierCtes,
         csc AS (
           SELECT f.doc_id, $classifierScoreSql AS score
           FROM cfeats f CROSS JOIN cw w),
         v4 AS (
           SELECT cv3.doc_id, cv3.clean, cv3.split, csc.score
           FROM cv3 JOIN csc USING (doc_id)
           WHERE csc.score >= 0.5)
         SELECT doc_id, clean, split, score,
           CAST(9 - floor(score*10.0) AS INT) AS band,
           CAST(row_number() OVER (ORDER BY 9 - floor(score*10.0),
             sha256(concat(CAST(doc_id AS VARCHAR), '${Queries.SplitSalt}')),
             doc_id) - 1 AS BIGINT) AS curriculum_pos
         FROM v4"""),

    // train/holdout near-dup leakage: the shared minhash CTE's verified
    // pairs at jaccard ≥ 0.5, endpoints labeled by the SAME split rule as
    // q_hash_split, rolled up by unordered split pair
    "q_split_leakage" -> (minhashReachCte + s"""
         SELECT least(${splitCaseSql("doc_a")}, ${splitCaseSql("doc_b")}) AS split_a,
           greatest(${splitCaseSql("doc_a")}, ${splitCaseSql("doc_b")}) AS split_b,
           CAST(count(*) AS BIGINT) AS n_pairs
         FROM jac WHERE jaccard >= 0.5
         GROUP BY 1, 2"""),

    // per-source OOV rate vs the corpus top-N vocabulary (count desc,
    // token asc — total order, deterministic vocab)
    "q_oov_rate" -> (s"""
         WITH t AS (
           SELECT source, unnest(string_split(text, ' ')) AS token
           FROM documents),
         voc AS (
           SELECT token FROM (
             SELECT token, count(*) AS c,
               row_number() OVER (ORDER BY count(*) DESC, token) AS rn
             FROM t GROUP BY token) r
           WHERE rn <= ${Queries.OovVocabTopN})
         SELECT t.source, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN voc.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(sum(CASE WHEN voc.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS oov_rate
         FROM t LEFT JOIN voc USING (token)
         GROUP BY t.source"""),

    // deterministic epoch shuffle: shard = first-8-hex(sha256(id∥seed))
    // mod nShards, pos = rank of the hash within the shard
    "q_epoch_order" -> (s"""
         WITH h AS (
           SELECT doc_id,
             sha256(concat(CAST(doc_id AS VARCHAR), '${Queries.EpochSeed}')) AS hh
           FROM documents)
         SELECT doc_id,
           CAST(CAST(concat('0x', substr(hh, 1, 8)) AS BIGINT)
             % ${Queries.EpochShards} AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY CAST(concat('0x', substr(hh, 1, 8)) AS BIGINT)
               % ${Queries.EpochShards}
             ORDER BY hh, doc_id) AS BIGINT) AS pos
         FROM h"""),

    "q_substring_dedup" -> substringSpansSql,
    "q_substring_dedup_hashed" -> substringSpansSql,

    // per-document duplicated-text audit: span sliver rolled up, every
    // document zero-filled
    "q_substring_stats" -> (s"""
         WITH $substringSpanCtes,
         per AS (
           SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS dup,
             CAST(count(*) AS BIGINT) AS nsp
           FROM spans GROUP BY doc_id)
         SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens,
           coalesce(per.dup, 0) AS n_dup_tokens,
           CAST(coalesce(per.dup, 0) AS DOUBLE) / len(d.toks) AS dup_ratio,
           coalesce(per.nsp, 0) AS n_spans
         FROM d LEFT JOIN per USING (doc_id)"""),

    // the substring CUT: remove tokens covered by non-corpus-first
    // duplicated-gram occurrences (first = lowest (doc, pos)); merged
    // disjoint intervals gate a token-level coverage anti-join
    "q_substring_cut" -> {
      val L = Queries.SubstringMinTokens
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         g AS (
           SELECT doc_id,
             unnest(generate_series(1, len(toks) - $L + 1)) AS pos,
             unnest(list_transform(generate_series(1, len(toks) - $L + 1),
               i -> array_to_string(list_slice(toks, i, i + $L - 1), ' '))) AS gram
           FROM d WHERE len(toks) >= $L),
         dd AS (SELECT gram FROM (
             SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram) t
           WHERE nd >= 2),
         firsts AS (SELECT gram, doc_id AS fd, pos AS fp FROM (
             SELECT gram, doc_id, pos,
               row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
             FROM g) t
           WHERE rn = 1),
         nf AS (
           SELECT g.doc_id, g.pos FROM g
           JOIN dd USING (gram) JOIN firsts f USING (gram)
           WHERE NOT (g.doc_id = f.fd AND g.pos = f.fp)),
         isl AS (
           SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + $L
                  THEN 1 ELSE 0 END AS nfg
           FROM nf WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         st AS (
           SELECT doc_id, pos, sum(nfg) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS UNBOUNDED PRECEDING) AS island
           FROM isl),
         iv AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS lo,
             CAST(max(pos) + $L - 1 AS BIGINT) AS hi
           FROM st GROUP BY doc_id, island),
         tk AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS tpos,
             unnest(toks) AS token FROM d),
         kept AS (
           SELECT t.doc_id, t.tpos, t.token FROM tk t
           LEFT JOIN iv ON iv.doc_id = t.doc_id AND t.tpos BETWEEN iv.lo AND iv.hi
           WHERE iv.doc_id IS NULL),
         per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nk,
             string_agg(token, ' ' ORDER BY tpos) AS kt
           FROM kept GROUP BY doc_id)
         SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens,
           CAST(len(d.toks) - coalesce(per.nk, 0) AS BIGINT) AS n_removed,
           coalesce(per.kt, '') AS kept_text
         FROM d LEFT JOIN per USING (doc_id)"""
    },

    // composed training mix: temperature weights -> per-source budget
    // fill (same sha256 rank key as q_token_budget_sample) -> the
    // q_pack_sequences prefix-sum over the survivors; every constant
    // and expression mirrors the standalone stages
    "q_training_mix" -> (s"""
         WITH per AS (
           SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY source),
         tot AS (
           SELECT CAST(sum(CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0)
               AS BIGINT)) AS BIGINT) AS stotq
           FROM per),
         bud AS (
           SELECT source,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))
               / (CAST(stotq AS DOUBLE) / 1000000.0)
               * ${Queries.MixTokenBudget}.0) AS BIGINT) AS src_budget
           FROM per CROSS JOIN tot),
         t AS (
           SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             sha256(concat(CAST(doc_id AS VARCHAR), '${Queries.SplitSalt}')) AS k
           FROM documents),
         r AS (
           SELECT doc_id, source, n_tokens, k,
             row_number() OVER (PARTITION BY source ORDER BY k, doc_id) AS rn
           FROM t),
         c AS (
           SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
           FROM r WHERE rn <= ${Queries.MixTokenBudget}),
         sel AS (
           SELECT c.doc_id, c.source, c.n_tokens
           FROM c JOIN bud USING (source)
           WHERE c.cum_tokens <= bud.src_budget),
         o AS (
           SELECT doc_id, source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS start_offset
           FROM sel)
         SELECT doc_id, source, n_tokens, start_offset,
           CAST(FLOOR(start_offset / ${Queries.PackBudget}.0) AS BIGINT) AS seq_id
         FROM o"""),

    // RAG sliding-window chunking: integer-only window arithmetic
    // (count, 1-based inclusive offsets) — engine-exact by construction
    "q_chunk_windows" -> {
      val w = Queries.RagWindow
      val st = Queries.RagStride
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS len,
             CASE WHEN len(toks) <= $w THEN 1
                  ELSE ((len(toks) - $w + ${st - 1}) // $st) + 1 END AS nw
           FROM d),
         e AS (SELECT doc_id, toks, len,
             unnest(generate_series(1, nw)) AS i FROM n)
         SELECT doc_id, CAST(i AS INT) AS win_id,
           CAST(1 + (i - 1) * $st AS BIGINT) AS tok_lo,
           CAST(least(1 + (i - 1) * $st + ${w - 1}, len) AS BIGINT) AS tok_hi,
           CAST(least(1 + (i - 1) * $st + ${w - 1}, len)
             - (1 + (i - 1) * $st) + 1 AS BIGINT) AS n_tokens,
           array_to_string(list_slice(toks, 1 + (i - 1) * $st,
             least(1 + (i - 1) * $st + ${w - 1}, len)), ' ') AS chunk_text
         FROM e"""
    },

    // tokenizer fertility: exact BIGINT sums per source over the shared
    // BPE segmentation chain; single double divisions for the ratios
    "q_bpe_fertility" -> (s"""
         WITH $bpeCtes,
         $bpeNsymCte,
         wc AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         t AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(ns.nsym) AS BIGINT) AS n_bpe
           FROM wc JOIN ns USING (word)
           GROUP BY doc_id)
         SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(t.n_words) AS BIGINT) AS n_words,
           CAST(sum(t.n_bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(d.n_chars) AS BIGINT) AS n_chars,
           CAST(sum(t.n_bpe) AS DOUBLE) / CAST(sum(t.n_words) AS DOUBLE)
             AS fertility,
           CAST(sum(d.n_chars) AS DOUBLE) / CAST(sum(t.n_bpe) AS DOUBLE)
             AS chars_per_token
         FROM documents d JOIN t USING (doc_id)
         GROUP BY d.source"""),

    // semantic decontamination: decimal-exact cosine vs the benchmark
    // embedding slice, threshold + id convention shared with the Spark
    // side via Queries constants; max_cos is order-independent (a max)
    "q_decontaminate_semantic" ->
      s"""WITH n2 AS (
           SELECT vec_id, embedding,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS nn
           FROM embeddings),
         e AS (SELECT vec_id AS eid, embedding AS ev, nn AS en FROM n2
           WHERE vec_id < ${Queries.DeconBenchmarkMaxId}),
         c AS (SELECT vec_id, embedding AS cv, nn AS cn FROM n2
           WHERE vec_id >= ${Queries.DeconBenchmarkMaxId}),
         p AS (
           SELECT c.vec_id,
             CAST(list_sum(list_transform(list_zip(c.cv, e.ev),
               z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) / (sqrt(c.cn) * sqrt(e.en)) AS cosine
           FROM c, e)
         SELECT vec_id, CAST(count(*) AS BIGINT) AS n_hits, max(cosine) AS max_cos
         FROM p WHERE cosine >= ${Queries.SemanticDeconTau}
         GROUP BY vec_id""",

    // BM25 more-like-this: rational (log-free) idf — pure IEEE
    // arithmetic, no library-specific transcendental — with the
    // DECIMAL(28,12) contribution sum; parenthesization mirrors
    // Bm25.moreLikeThis token-for-token (CTEs shared with q_hybrid_rrf)
    "q_bm25_topk" ->
      s"""WITH $bm25Ctes
         SELECT query_id, doc_id, n_terms, score, CAST(rank AS INT) AS rank
         FROM bmr""",

    // the materialized-index path computes the identical lists — the
    // oracle is shared verbatim (what changes is where postings live)
    "q_bm25_topk_indexed" ->
      s"""WITH $bm25Ctes
         SELECT query_id, doc_id, n_terms, score, CAST(rank AS INT) AS rank
         FROM bmr""",

    // postings and corpus stats are per-document facts, additive across
    // batches — the incrementally-maintained index computes the identical
    // lists, so the oracle is again shared verbatim
    "q_bm25_topk_maintained" ->
      s"""WITH $bm25Ctes
         SELECT query_id, doc_id, n_terms, score, CAST(rank AS INT) AS rank
         FROM bmr""",

    // hard negatives: the dense top-k minus the BM25 lists (both CTE
    // chains shared verbatim with their standalone queries)
    "q_hard_negatives" ->
      s"""WITH $bm25Ctes,
         ${cosineRankCtes(Queries.Bm25NQueries, Queries.Bm25TopK)}
         SELECT query_id, neighbor_id AS doc_id, cosine,
           CAST(rank AS INT) AS dense_rank,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY rank)
             AS INT) AS neg_rank
         FROM cr
         WHERE NOT EXISTS (SELECT 1 FROM bmr b
           WHERE b.query_id = cr.query_id AND b.doc_id = cr.neighbor_id)""",

    // hybrid retrieval: the BM25 lists fused with dense cosine top-k by
    // reciprocal rank — each term is one IEEE division on a small-int
    // rank, summed sparse-first exactly as Bm25.rrfFuse does
    "q_hybrid_rrf" ->
      s"""WITH $bm25Ctes,
         ${cosineRankCtes(Queries.Bm25NQueries, Queries.Bm25TopK)},
         f AS (
           SELECT coalesce(b.query_id, d.query_id) AS query_id,
             coalesce(b.doc_id, d.neighbor_id) AS doc_id,
             b.rank AS rs, d.rank AS rd
           FROM bmr b FULL OUTER JOIN cr d
             ON b.query_id = d.query_id AND b.doc_id = d.neighbor_id),
         g AS (
           SELECT query_id, doc_id,
             (rs IS NOT NULL) AS in_sparse, (rd IS NOT NULL) AS in_dense,
             coalesce(1.0 / (${Queries.RrfK0} + CAST(rs AS DOUBLE)), 0.0)
               + coalesce(1.0 / (${Queries.RrfK0} + CAST(rd AS DOUBLE)), 0.0)
               AS rrf
           FROM f)
         SELECT query_id, doc_id, in_sparse, in_dense, rrf,
           CAST(rank AS INT) AS rank
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY rrf DESC, doc_id) AS rank FROM g) r
         WHERE rank <= ${Queries.Bm25TopK}""",

    // perceptual hash per payload: these text payloads all take the
    // deterministic byte-sampling fallback ('opaque'); the real-image
    // path (imageio decode + box-average grid) is spec-covered with
    // actual PNGs, which DuckDB cannot decode
    "q_image_dhash" -> (s"""
         WITH $imageDhashCtes
         SELECT doc_id, dhash, 'opaque' AS decoder FROM sh"""),

    // perceptual near-dup pairs: 4×16-bit banding + capped buckets +
    // bit_count(xor) radius — the same candidate chain as the simhash64
    // oracle, over the dHash fingerprints
    "q_image_neardup" -> (s"""
         WITH $imageDhashCtes,
         bands AS (
           SELECT doc_id, dhash, b AS band,
             CAST((uv >> CAST(16 * b AS INT)) & 65535 AS BIGINT) AS bvv
           FROM sh, (SELECT unnest(generate_series(0, 3)) AS b) t),
         ok AS (SELECT band, bvv FROM bands GROUP BY band, bvv
                HAVING count(*) BETWEEN 2 AND ${Queries.ImageBucketCap}),
         inok AS (SELECT b.* FROM bands b JOIN ok USING (band, bvv)),
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.dhash AS sh_a, b.dhash AS sh_b
           FROM inok a JOIN inok b
             ON a.band = b.band AND a.bvv = b.bvv AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
         FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= ${Queries.ImageMaxHamming}"""),

    // audio envelope hash over the same seeded payloads (opaque fallback
    // path — real WAV/AIFF decode is spec-covered, like imageio)
    "q_audio_hash" -> (s"""
         WITH $audioHashCtes
         SELECT doc_id, ahash, 'opaque' AS decoder FROM ash"""),

    // envelope near-dup pairs: the same banded candidate chain as the
    // image/simhash planes, over the audio fingerprints
    "q_audio_neardup" -> (s"""
         WITH $audioHashCtes,
         bands AS (
           SELECT doc_id, ahash, b AS band,
             CAST((uv >> CAST(16 * b AS INT)) & 65535 AS BIGINT) AS bvv
           FROM ash, (SELECT unnest(generate_series(0, 3)) AS b) t),
         ok AS (SELECT band, bvv FROM bands GROUP BY band, bvv
                HAVING count(*) BETWEEN 2 AND ${Queries.AudioBucketCap}),
         inok AS (SELECT b.* FROM bands b JOIN ok USING (band, bvv)),
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.ahash AS sh_a, b.ahash AS sh_b
           FROM inok a JOIN inok b
             ON a.band = b.band AND a.bvv = b.bvv AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
         FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= ${Queries.AudioMaxHamming}"""),

    // learned BPE merge table: the unrolled training chain, one row per
    // round from its b{r} selection
    "q_bpe_vocab" -> (s"""
         WITH $bpeCtes
         SELECT * FROM (${(0 until Queries.BpeNumMerges).map(r =>
           s"SELECT CAST($r AS INT) AS merge_rank, a, b, a || b AS merged, " +
             s"c AS pair_count FROM b$r").mkString(" UNION ALL ")})
         ORDER BY merge_rank"""),

    // per-doc token counts under the trained vocabulary: corpus words
    // joined against the final segmentation state
    "q_bpe_token_count" -> (s"""
         WITH $bpeCtes,
         $bpeNsymCte,
         wc AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(ns.nsym) AS BIGINT) AS n_bpe_tokens
         FROM wc JOIN ns USING (word)
         GROUP BY doc_id"""),

    // sequence packing on the BPE counts: same prefix-sum semantics as
    // q_pack_sequences with the count column swapped
    "q_pack_sequences_bpe" -> (s"""
         WITH $bpeCtes,
         $bpeNsymCte,
         wc AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         t AS (
           SELECT doc_id, CAST(sum(ns.nsym) AS BIGINT) AS n_tokens
           FROM wc JOIN ns USING (word)
           GROUP BY doc_id),
         o AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS start_offset
           FROM t)
         SELECT doc_id, n_tokens, start_offset,
           CAST(FLOOR(start_offset / ${Queries.PackBudget}.0) AS BIGINT) AS seq_id
         FROM o"""),

    // sequence manifest: integer projections over the pack offsets —
    // intra-sequence position and the boundary-straddle flag
    "q_sequence_manifest" -> (s"""
         WITH t AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         o AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS start_offset
           FROM t),
         p AS (SELECT doc_id, n_tokens, start_offset,
             CAST(FLOOR(start_offset / ${Queries.PackBudget}.0) AS BIGINT) AS seq_id
           FROM o)
         SELECT seq_id, doc_id,
           CAST(start_offset - seq_id * ${Queries.PackBudget} AS BIGINT)
             AS offset_in_seq,
           n_tokens,
           (start_offset + n_tokens > (seq_id + 1) * ${Queries.PackBudget})
             AS spans_boundary
         FROM p"""),

    // IVF-PQ: the q_ivf_topk probe/assignment chain (n2/c/pc/qp) + PQ
    // code assignment per (vector, subspace) against the lowest-id
    // sub-codebooks + ADC table-lookup scoring (decimal-exact per-subspace
    // dots summed exactly — pool selection bit-identical to Spark) +
    // decimal-exact cosine rerank. The unrolled distance tables are the
    // `tab` CTE (one row per query × subspace × code).
    "q_ivf_pq_topk" -> {
      val M = Queries.PqM
      val sl = (v: String, s: String) =>
        s"list_slice($v, $s * (len($v) // $M) + 1, ($s + 1) * (len($v) // $M))"
      s"""WITH n2 AS (
           SELECT vec_id, embedding,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS nn
           FROM embeddings),
         c AS (
           SELECT vec_id AS centroid_id, embedding AS cv, nn AS cn FROM n2
           QUALIFY row_number() OVER (ORDER BY vec_id) <=
             CAST(ceil(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)),
         pc AS (
           SELECT vec_id AS neighbor_id, embedding AS nv, nn, centroid_id FROM (
             SELECT v.vec_id, v.embedding, v.nn, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 v.nn + c.cn - 2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
                   z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
                   AS DOUBLE), c.centroid_id) AS rn
             FROM n2 v, c) t
           WHERE rn = 1),
         qp AS (
           SELECT vec_id AS query_id, centroid_id FROM (
             SELECT v.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 v.nn + c.cn - 2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
                   z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
                   AS DOUBLE), c.centroid_id) AS rn
             FROM (SELECT * FROM n2 WHERE vec_id < ${Queries.AnnNumQueries}) v, c) t
           WHERE rn <= ${Queries.AnnNProbe}),
         ss AS (SELECT unnest(generate_series(0, ${M - 1})) AS s),
         cbv AS (
           SELECT vec_id AS cid, embedding AS cv0 FROM n2
           QUALIFY row_number() OVER (ORDER BY vec_id) <= ${Queries.PqK}),
         pcn AS (
           SELECT s, cid, ${sl("cv0", "s")} AS cv,
             CAST(list_sum(list_transform(${sl("cv0", "s")},
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS cn2
           FROM cbv, ss),
         csub AS (
           SELECT neighbor_id, centroid_id, s, ${sl("nv", "s")} AS sub,
             CAST(list_sum(list_transform(${sl("nv", "s")},
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) AS sn2
           FROM pc, ss),
         codes AS (
           SELECT neighbor_id, centroid_id, s, cid AS code FROM (
             SELECT cs.neighbor_id, cs.centroid_id, cs.s, p.cid,
               row_number() OVER (PARTITION BY cs.neighbor_id, cs.s ORDER BY
                 cs.sn2 + p.cn2 - 2.0 * CAST(list_sum(list_transform(list_zip(cs.sub, p.cv),
                   z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
                   AS DOUBLE), p.cid) AS rn
             FROM csub cs JOIN pcn p USING (s)) t
           WHERE rn = 1),
         qv0 AS (SELECT vec_id AS query_id, embedding AS qv, nn AS qn
                 FROM n2 WHERE vec_id < ${Queries.AnnNumQueries}),
         tab AS (
           SELECT q.query_id, p.s, p.cid AS code,
             CAST(list_sum(list_transform(list_zip(${sl("q.qv", "p.s")}, p.cv),
               z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
               AS DECIMAL(28,12)) AS td
           FROM qv0 q, pcn p),
         approx AS (
           SELECT qp.query_id, codes.neighbor_id, sum(tab.td) AS ascore
           FROM qp
           JOIN codes ON codes.centroid_id = qp.centroid_id
             AND codes.neighbor_id <> qp.query_id
           JOIN tab ON tab.query_id = qp.query_id AND tab.s = codes.s
             AND tab.code = codes.code
           GROUP BY 1, 2),
         pool AS (
           SELECT query_id, neighbor_id FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY ascore DESC, neighbor_id) AS prn
             FROM approx) t
           WHERE prn <= ${4 * Queries.AnnTopK}),
         rer AS (
           SELECT pool.query_id, pool.neighbor_id,
             CAST(list_sum(list_transform(list_zip(q.qv, pc.nv),
               z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(28,12))))
               AS DOUBLE) / (sqrt(q.qn) * sqrt(pc.nn)) AS cosine
           FROM pool
           JOIN qv0 q USING (query_id)
           JOIN pc ON pc.neighbor_id = pool.neighbor_id)
         SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id) AS rank
           FROM rer) r
         WHERE rank <= ${Queries.AnnTopK}"""
    },

    // commit-log plane: the 3-commit demo scenario (v1 append of
    // event_id%4∈{0,1}; v2 merge of {1,2} doubled; v3 merge of {2,3}
    // tripled) makes every manifest statistic a pure function of `events`
    "q_table_history" -> """
      WITH e AS (SELECT event_id % 4 AS m FROM events)
      SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS version, 'create' AS action,
               CAST(0 AS BIGINT) AS rows_inserted, CAST(0 AS BIGINT) AS rows_updated,
               CAST(0 AS BIGINT) AS rows_deleted, CAST(0 AS BIGINT) AS rows_total
        UNION ALL
        SELECT 1, 'append', (SELECT count(*) FROM e WHERE m < 2), 0, 0,
               (SELECT count(*) FROM e WHERE m < 2)
        UNION ALL
        SELECT 2, 'merge', (SELECT count(*) FROM e WHERE m = 2),
               (SELECT count(*) FROM e WHERE m = 1), 0,
               (SELECT count(*) FROM e WHERE m < 3)
        UNION ALL
        SELECT 3, 'merge', (SELECT count(*) FROM e WHERE m = 3),
               (SELECT count(*) FROM e WHERE m = 2), 0,
               (SELECT count(*) FROM e)
      ) ORDER BY version""",

    "q_cdf_read" -> """
      WITH e AS (SELECT *, event_id % 4 AS m FROM events)
      SELECT CAST(2 AS BIGINT) AS commit_version, 'insert' AS change_type,
             event_id, user_id, event_type, value * 2 AS value
        FROM e WHERE m = 2
      UNION ALL
      SELECT 2, 'update_preimage', event_id, user_id, event_type, value
        FROM e WHERE m = 1
      UNION ALL
      SELECT 2, 'update_postimage', event_id, user_id, event_type, value * 2
        FROM e WHERE m = 1
      UNION ALL
      SELECT 3, 'insert', event_id, user_id, event_type, value * 3
        FROM e WHERE m = 3
      UNION ALL
      SELECT 3, 'update_preimage', event_id, user_id, event_type, value * 2
        FROM e WHERE m = 2
      UNION ALL
      SELECT 3, 'update_postimage', event_id, user_id, event_type, value * 3
        FROM e WHERE m = 2""",

    // snapshot pinned at version 2: %4∈{0} original, {1,2} doubled
    "q_time_travel" -> """
      WITH e AS (SELECT *, event_id % 4 AS m FROM events)
      SELECT event_type, count(*) AS n,
             CAST(SUM(CAST(CASE WHEN m = 0 THEN value ELSE value * 2 END
               AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM e WHERE m < 3 GROUP BY event_type""",

    // streaming source -> writeStream.toTable epoch sink, then aggregate
    // the landed catalog table: same final contents as q_table_stream
    "q_table_sink" -> """
      WITH e AS (SELECT *, event_id % 4 AS m FROM events)
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(CASE WHEN m = 0 THEN value
                                WHEN m = 1 THEN value * 2
                                ELSE value * 3 END
               AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM e GROUP BY event_type""",

    // streaming DATA drain of the demo table: the initial snapshot pins
    // the head, so the result is the table's FINAL contents — m=0
    // original, m=1 first-merge *2, m∈{2,3} second-merge *3
    "q_table_stream" -> """
      WITH e AS (SELECT *, event_id % 4 AS m FROM events)
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(CASE WHEN m = 0 THEN value
                                WHEN m = 1 THEN value * 2
                                ELSE value * 3 END
               AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM e GROUP BY event_type""",

    // evolution demo: v1 append %4=0 (no score column — reads back NULL),
    // v2 mergeSchema append %4=1 with score=value*2, v3 rename value→amount
    "q_table_evolve" -> """
      WITH t AS (
        SELECT event_type, value AS amount, CAST(NULL AS DOUBLE) AS score
          FROM events WHERE event_id % 4 = 0
        UNION ALL
        SELECT event_type, value AS amount, value * 2 AS score
          FROM events WHERE event_id % 4 = 1
      )
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DOUBLE) AS sum_amount,
             count(score) AS n_score,
             CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
      FROM t GROUP BY event_type""",

    // drop demo: v1 append %4∈{0,1} with score=value*2, v2 dropColumn,
    // v3 evolved re-add score=value*3 for %4=2 — pre-drop rows must read
    // NULL score (retired physical data never resurfaces)
    "q_table_drop" -> """
      WITH t AS (
        SELECT event_type, value, CAST(NULL AS DOUBLE) AS score
          FROM events WHERE event_id % 4 < 2
        UNION ALL
        SELECT event_type, value, value * 3 AS score
          FROM events WHERE event_id % 4 = 2
      )
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             count(score) AS n_score,
             CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sum_score
      FROM t GROUP BY event_type""",

    // stats-pruned range read over the drop-demo table (%4 <= 2 rows):
    // result-identical to the plain filter
    "q_table_skip" -> """
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      WHERE event_id % 4 <= 2 AND value >= 50.0 AND value <= 100.0
      GROUP BY event_type""",

    // the same range read routed through the DSv2 `format("commitlog")`
    // reader with a natural .filter — must be hash-identical to
    // q_table_skip's explicit readRange
    "q_table_dsv2" -> """
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      WHERE event_id % 4 <= 2 AND value >= 50.0 AND value <= 100.0
      GROUP BY event_type""",

    // bloom-index point lookup: IN-list over event_id against the
    // 4-way interleaved bloom demo table — equal to the plain filter
    "q_table_bloom" -> """
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      WHERE event_id IN (SELECT (i * 199 + 7)::BIGINT FROM range(50) r(i))
      GROUP BY event_type""",

    // SQL MERGE INTO demo: target=%4<2, source=%3=0 with value*2+5;
    // matched rows update when the new value > 100, otherwise DELETE
    // gold view over the %4<2 commit-log table (late-binding SQL view)
    "q_table_view_sql" -> """
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events WHERE event_id % 4 < 2 GROUP BY event_type""",

    // _partition metadata column == the event_type partition value the
    // writer serialized, so the group-by is replayable from the raw table
    "q_table_meta_cols" -> """
      SELECT event_type AS part, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events WHERE event_id % 4 < 3 GROUP BY event_type""",

    // SQL UPDATE (value doubled+1 where id%3=0) then SQL DELETE of
    // id%5=4 (no V1 Filter form — the strategy path) over the %4<2 load
    "q_table_dml_sql" -> """
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(CASE WHEN event_id % 3 = 0 THEN value * 2 + 1
               ELSE value END AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      WHERE event_id % 4 < 2 AND NOT (event_id % 5 = 4)
      GROUP BY event_type""",

    // (a NULL-valued source row falls to DELETE — its update condition
    // is NULL); unmatched source rows insert
    "q_table_merge_sql" -> """
      WITH tgt AS (SELECT event_id, event_type, value FROM events
                   WHERE event_id % 4 < 2),
           src AS (SELECT event_id, event_type, value * 2 + 5 AS value
                   FROM events WHERE event_id % 3 = 0),
           kept AS (
             SELECT t.event_type,
                    CASE WHEN s.event_id IS NOT NULL
                              AND COALESCE(s.value > 100, FALSE)
                         THEN s.value ELSE t.value END AS value
             FROM tgt t LEFT JOIN src s ON t.event_id = s.event_id
             WHERE s.event_id IS NULL OR COALESCE(s.value > 100, FALSE)
           ),
           ins AS (
             SELECT s.event_type, s.value
             FROM src s LEFT JOIN tgt t ON t.event_id = s.event_id
             WHERE t.event_id IS NULL
           ),
           merged AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM merged GROUP BY event_type""",

    // storage-partitioned join: fact ⋈ per-day dim on the shared
    // partition key (both commitlog tables partitioned by day); the
    // Spark side runs key-grouped with zero shuffle under the join
    "q_table_spj" -> """
      WITH fact AS (SELECT event_id % 8 AS day, value FROM events),
           dim AS (SELECT event_id % 8 AS day,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS w
                   FROM events GROUP BY 1)
      SELECT fact.day AS day, count(*) AS n_rows,
             CAST(SUM(CAST(fact.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             MAX(dim.w) AS w_day
      FROM fact JOIN dim ON fact.day = dim.day
      GROUP BY fact.day""",

    // UPDATE demo: v1 append %4<2, v2 UPDATE value=value*2+1 WHERE id%3=0
    "q_table_update" -> """
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(CASE WHEN event_id % 3 = 0 THEN value * 2 + 1
               ELSE value END AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events WHERE event_id % 4 < 2 GROUP BY event_type""",

    // merge-on-read delete demo: v1 append %4<3, v2 deleteLazy(value<50) —
    // NULL-evaluating rows survive, like SQL DELETE
    "q_table_lazy_delete" -> """
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      WHERE event_id % 4 < 3 AND (NOT (value < 50) OR value IS NULL)
      GROUP BY event_type""",

    // shallow clone pinned at demo v2: identical to the time-travel state
    // (%4=0 original, {1,2} doubled), read through the clone's manifest
    "q_table_clone" -> """
      WITH e AS (SELECT *, event_id % 4 AS m FROM events)
      SELECT event_type, count(*) AS n,
             CAST(SUM(CAST(CASE WHEN m = 0 THEN value ELSE value * 2 END
               AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM e WHERE m < 3 GROUP BY event_type""",

    // checkpoint demo: 12 appends of event_id%12==i (version i+1) cross
    // the forced checkpoint at v10 — the v7 pin replays diffs from the
    // root, the latest resolves checkpoint@10 + 2 diffs
    "q_table_ckpt" -> """
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             'v7' AS snap
      FROM events WHERE event_id % 12 < 7 GROUP BY event_type
      UNION ALL
      SELECT event_type, count(*),
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 'latest'
      FROM events GROUP BY event_type""",

    // metadata-only aggregate over the checkpoint demo table (all events
    // rows): count/min/max answered from manifest stats, values pinned
    // against the raw table
    "q_table_agg" -> """
      SELECT count(*) AS n_rows, min(event_id) AS min_id,
             max(event_id) AS max_id, max(value) AS max_value
      FROM events""",

    // grouped metadata-only aggregate: GROUP BY the table's partition
    // column, answered from the manifest alone (zero data files read)
    "q_table_agg_group" -> """
      SELECT event_type, count(*) AS n_rows, min(event_id) AS min_id,
             max(value) AS max_value
      FROM events GROUP BY event_type""",

    // grouped metadata-only aggregate over a MULTI-COLUMN-partitioned
    // table: GROUP BY both partition columns, answered from the
    // manifest's per-file partition tuples (zero data files read)
    "q_table_multipart" -> """
      SELECT event_type, CAST(event_id % 4 AS BIGINT) AS bucket,
             count(*) AS n_rows, min(event_id) AS min_id,
             max(value) AS max_value
      FROM events GROUP BY 1, 2""",

    // lazy delete → Delta deletion-vector export → bridge read: the
    // DV-filtered scan must answer exactly like the raw data minus the
    // marked rows (mark predicate: event_id % 3 = 0)
    "q_delta_dv_read" -> """
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             min(event_id) AS min_id
      FROM events WHERE event_id % 3 <> 0 GROUP BY event_type""",

    // the CDF loop both ways: graft commits mirror as Delta cdc (+
    // derivable inserts), and the bridge READS the feed back like an
    // external Delta CDF consumer — two insert halves at versions 2/3,
    // one update's pre/post images at version 4 (value bumped by 1 on
    // event_id % 100 = 0)
    "q_delta_cdf_bridge" -> """
      SELECT event_id, event_type, value, 'insert' AS change_type,
             CAST(2 AS BIGINT) AS commit_version
      FROM events WHERE event_id % 2 = 0
      UNION ALL
      SELECT event_id, event_type, value, 'insert' AS change_type,
             CAST(3 AS BIGINT) AS commit_version
      FROM events WHERE event_id % 2 = 1
      UNION ALL
      SELECT event_id, event_type, value, 'update_preimage' AS change_type,
             CAST(4 AS BIGINT) AS commit_version
      FROM events WHERE event_id % 100 = 0
      UNION ALL
      SELECT event_id, event_type, value + 1 AS value,
             'update_postimage' AS change_type,
             CAST(4 AS BIGINT) AS commit_version
      FROM events WHERE event_id % 100 = 0""",

    // the STREAMING no-adoption CDF consumer over the same mirrored
    // log: a checkpointed format("delta-cdf") drain must land the
    // identical image multiset the batch bridge read serves
    "q_delta_cdf_stream" -> """
      SELECT event_id, event_type, value, 'insert' AS change_type,
             CAST(2 AS BIGINT) AS commit_version
      FROM events WHERE event_id % 2 = 0
      UNION ALL
      SELECT event_id, event_type, value, 'insert' AS change_type,
             CAST(3 AS BIGINT) AS commit_version
      FROM events WHERE event_id % 2 = 1
      UNION ALL
      SELECT event_id, event_type, value, 'update_preimage' AS change_type,
             CAST(4 AS BIGINT) AS commit_version
      FROM events WHERE event_id % 100 = 0
      UNION ALL
      SELECT event_id, event_type, value + 1 AS value,
             'update_postimage' AS change_type,
             CAST(4 AS BIGINT) AS commit_version
      FROM events WHERE event_id % 100 = 0""",

    // the composed CDF-driven Silver loop over a foreign log: two
    // checkpointed delta-cdf waves MERGE latest-wins into a commitlog
    // Silver — wave 1 lands %3=0 rows with +1 on %100=0 (the update
    // only matched rows already present, i.e. %3=0); wave 2 adds %3=1
    // rows and applies +2 on %100=1 to every present row
    "q_delta_silver_medallion" -> """
      SELECT event_id, event_type,
             value
               + CASE WHEN event_id % 100 = 0 AND event_id % 3 = 0
                      THEN 1.0 ELSE 0.0 END
               + CASE WHEN event_id % 100 = 1 THEN 2.0 ELSE 0.0 END
               AS value,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY event_id) AS INT) AS rn
      FROM events WHERE event_id % 3 IN (0, 1)""",

    // two-engine coexistence: a foreign Delta append pulls into the
    // commit log before graft's next commit — the final table holds
    // base (%5=1) ∪ foreign (%5=2) ∪ graft (%5=3) rows exactly
    "q_delta_reconcile" -> """
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             min(event_id) AS min_id
      FROM events WHERE event_id % 5 IN (1, 2, 3) GROUP BY event_type""",

    // adopt a Delta table CARRYING a live deletion vector (no purge):
    // the commitlog scan must answer exactly like the raw data minus
    // the DV-marked rows (event_id % 4 = 0)
    "q_delta_adopt_dv" -> """
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             min(event_id) AS min_id
      FROM events WHERE event_id % 4 <> 0 GROUP BY event_type""",

    // zero-copy CONVERT adoption of a plain-parquet events dump: the
    // adopted table must answer exactly like the raw data
    "q_table_convert" -> """
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             min(event_id) AS min_id
      FROM events WHERE event_id % 5 = 0 GROUP BY event_type""",

    // zero-copy CONVERT adoption of an existing DELTA table (partitionBy
    // layout, partition values sourced from the log → manifest-attached
    // at scan): grouped by the attached column, must answer exactly like
    // the raw data
    "q_table_convert_delta" -> """
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             min(event_id) AS min_id
      FROM events WHERE event_id % 7 = 0 GROUP BY event_type""",

    // GENERATED ALWAYS AS (CAST(ts AS DATE)) partition column, computed
    // at write because the batch omits it: grouping by the generated
    // value must answer exactly like deriving the date from raw data
    "q_table_generated" -> """
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             min(event_id) AS min_id
      FROM events GROUP BY 1""",

    // CDF bounded by TIMESTAMPS pinned at commit 2's instant: exactly
    // the second commit (odd event_ids) qualifies under Delta's
    // at-or-after / at-or-before rules
    "q_table_cdf_ts" -> """
      SELECT event_id, event_type, value, 'insert' AS change_type,
             CAST(2 AS BIGINT) AS commit_version
      FROM events WHERE event_id % 2 = 1""",

    // table-read CDF over the SQL-catalog demo: two INSERT INTO halves
    // (even event_ids at version 1, odd at version 2), all insert images
    "q_table_cdf" -> """
      SELECT event_id, event_type, value, 'insert' AS change_type,
             CAST(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT)
               AS commit_version
      FROM events""",

    // SQL-catalog demo: two INSERT INTO halves reassemble all of events
    "q_table_sql" -> """
      SELECT event_type, count(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type""",
  )
}
