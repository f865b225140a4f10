package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.views.Views

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every implemented operator from SURVEY.md §2 gets a named entry in
  * `queries`; where the semantics are ANSI-SQL-expressible, `oracleSql`
  * carries the DuckDB-equivalent SQL over the same parquet tables
  * (driver hash-compares the results). Column names are aliased
  * identically on both sides — the driver sorts columns by name.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Aggregates.q1Agg _),
    "q_scalar_min" -> (Aggregates.scalarMin _),
    "q_rollup" -> (Aggregates.qRollup _),
    "q_grouping_sets" -> (Aggregates.qGroupingSets _),
    "q_ntile" -> (Aggregates.qNtile _),
    "q_view_transactions" -> (Views.transactions _),
    // the scalable registered SQL surface: same rows as TRANSACTIONS,
    // two-level row_number, no single-partition window (the SQL text is
    // pure ANSI — the oracle runs the IDENTICAL string)
    "q_view_transactions_scaled" -> ((s: SparkSession, dir: String) => {
      graft.Tables.registerAll(s, dir)
      s.sql(Views.transactionsScaledSql)
    }),
    "q_view_retention" -> (Views.retention _),
    "q_view_auto_optiom" -> (Views.autoOptiom _),
    "q_clean_strip" -> (CleanOps.qCleanStrip _),
    "q_clean_nulls" -> (CleanOps.qCleanNulls _),
    "q_clean_datecoerce" -> (CleanOps.qCleanDatecoerce _),
    "q_clean_cast" -> (CleanOps.qCleanCast _),
    "q_merge" -> (MergeOps.qMerge _),
    "q_events_window" -> (Events.qEventsWindow _),
    "q_sessionize" -> (Events.qSessionize _),
    "q_json_props" -> (Events.qJsonProps _),
    "q_pivot" -> (Events.qPivot _),
    "q_quantiles" -> (Events.qQuantiles _),
    "q_funnel" -> (Events.qFunnel _),
    "q_cohort" -> (Events.qCohort _),
    "q_rolling_active" -> (Events.qRollingActive _),
    "q_funnel_conv" -> (Events.qFunnelConv _),
    "q_event_transitions" -> (Events.qEventTransitions _),
    "q_top_spenders" -> (Events.qTopSpenders _),
    "q_event_anomaly" -> (Events.qEventAnomaly _),
    "q_gap_fill" -> (Events.qGapFill _),
    "q_islands" -> (Events.qIslands _),
    "q_attribution" -> (Events.qAttribution _),
    "q_dedup_keep_best" -> (graft.ext.Dedup.qDedupKeepBest _),
    "q_dedup_methods" -> (graft.ext.Dedup.qDedupMethods _),
    "q_asof_join" -> (AsofJoin.qAsofJoin _),
    "q_range_join" -> (RangeJoin.qRangeJoin _),
    "q_topk" -> (SetSortOps.qTopk _),
    "q_union" -> (SetSortOps.qUnion _),
    "q_base64" -> (SetSortOps.qBase64 _),
    "q_anti_join" -> (SetSortOps.qAntiJoin _),
    "q_fuzzy_join" -> (FuzzyJoin.qFuzzyJoin _),
    "q_pagerank" -> (PageRank.qPagerank _),
    "q_triangles" -> (Triangles.qTriangles _),
    "q_label_prop" -> (LabelProp.qLabelProp _),
    "q_skyline" -> (Skyline.qSkyline _),
    "q_heavy_hitters" -> (HeavyHitters.qHeavyHitters _),
    "q_bfs" -> (Bfs.qBfs _),
    "q_scd2" -> (Scd2.qScd2 _),
    "q_cdc_apply" -> (CdcApply.qCdcApply _),
    "q_bm25" -> (graft.ext.Bm25.qBm25 _),
    "q_rolling_hll" -> (Events.qRollingHll _),
    "q_bloom_join" -> (BloomProbe.qBloomJoin _),
    "q_interval_join" -> (IntervalJoin.qIntervalJoin _),
    "q_path_trigrams" -> (Events.qPathTrigrams _),
    "q_cusum" -> (Events.qCusum _),
    "q_unpivot" -> (Events.qUnpivot _),
    "q_seasonal_naive" -> (Events.qSeasonalNaive _),
    "q_robust_z" -> (Events.qRobustZ _),
    "q_shortest_path" -> (ShortestPath.qShortestPath _),
    "q_weighted_median" -> (WeightedMedian.qWeightedMedian _),
    "q_mix_drift" -> (MixDrift.qMixDrift _),
    "q_pmi" -> (graft.ext.Collocations.qPmi _),
    "q_concurrency" -> (Concurrency.qConcurrency _),
    "q_assoc_rules" -> (AssocRules.qAssocRules _),
    "q_region_revenue" -> (Aggregates.qRegionRevenue _),
    "q_winsorize" -> (Aggregates.qWinsorize _),
    "q_zorder" -> (ZOrder.qZorder _),
    "q_edit_distance" -> (graft.ext.TextOps.qEditDistance _),
    "q_hash_sample" -> (graft.ext.TextOps.qHashSample _),
    "q_dedup_exact" -> (graft.ext.Dedup.qDedupExact _),
    "q_dedup_jaccard" -> (graft.ext.Dedup.qDedupJaccard _),
    "q_dedup_minhash" -> (graft.ext.Dedup.qDedupMinhash _),
    "q_dedup_simhash" -> (graft.ext.Dedup.qDedupSimhash _),
    "q_dedup_embed" -> (graft.ext.Dedup.qDedupEmbed _),
    "q_dup_clusters" -> (graft.ext.Dedup.qDupClusters _),
    "q_split_leakfree" -> (graft.ext.Dedup.qSplitLeakfree _),
    "q_decontaminate" -> (graft.ext.Dedup.qDecontaminate _),
    "q_contam_frac" -> (graft.ext.Dedup.qContamFrac _),
    "q_source_overlap" -> (graft.ext.Dedup.qSourceOverlap _),
    "q_pack" -> (graft.ext.TextOps.qPack _),
    "q_pack_boundaries" -> (graft.ext.TextOps.qPackBoundaries _),
    "q_pack_stats" -> (graft.ext.TextOps.qPackStats _),
    "q_bpe_stats" -> (graft.ext.Bpe.qBpeStats _),
    "q_manifest" -> (graft.ext.TextOps.qManifest _),
    "q_dataset_card" -> (graft.ext.TextOps.qDatasetCard _),
    "q_source_cards" -> (graft.ext.TextOps.qSourceCards _),
    "q_passage_dedup" -> (graft.ext.TextOps.qPassageDedup _),
    "q_substr_dedup" -> (graft.ext.TextOps.qSubstrDedup _),
    "q_curate_e2e" -> (graft.ext.TextOps.qCurate _),
    "q_curate_audit" -> (graft.ext.TextOps.qCurateAudit _),
    "q_curate_report" -> (graft.ext.TextOps.qCurateReport _),
    "q_snapshot_diff" -> (graft.ext.TextOps.qSnapshotDiff _),
    "q_stratified_sample" -> (graft.ext.TextOps.qStratifiedSample _),
    "q_mixture_sample" -> (graft.ext.TextOps.qMixtureSample _),
    "q_mixture_plan" -> (graft.ext.TextOps.qMixturePlan _),
    "q_temp_sample" -> (graft.ext.TextOps.qTempSample _),
    "q_shard_shuffle" -> (graft.ext.TextOps.qShardShuffle _),
    "q_text_stats" -> (graft.ext.TextOps.qTextStats _),
    "q_lang_id" -> (graft.ext.TextOps.qLangId _),
    "q_fingerprint" -> (graft.ext.TextOps.qFingerprint _),
    "q_winnow" -> (graft.ext.TextOps.qWinnow _),
    "q_tfidf" -> (graft.ext.TextOps.qTfIdf _),
    "q_quality_filter" -> (graft.ext.TextOps.qQualityFilter _),
    "q_pii_scrub" -> (graft.ext.TextOps.qPiiScrub _),
    "q_chunk" -> (graft.ext.TextOps.qChunk _),
    "q_rep_ratio" -> (graft.ext.TextOps.qRepRatio _),
    "q_group_cap" -> (graft.ext.TextOps.qGroupCap _),
    "q_vocab" -> (graft.ext.CorpusOps.qVocab _),
    "q_bpe_train" -> (graft.ext.Bpe.qBpeTrain _),
    "q_bpe_encode" -> (graft.ext.Bpe.qBpeEncode _),
    "q_bpe_tokenize" -> (graft.ext.Bpe.qBpeTokenize _),
    "q_bloom_novel" -> (graft.operators.BloomProbe.qBloomNovel _),
    "q_bloom_novel_det" -> (graft.operators.BloomProbe.qBloomNovelDet _),
    "q_classifier" -> (graft.ext.CorpusOps.qClassifier _),
    "q_classifier_train" -> (graft.ext.CorpusOps.qClassifierTrain _),
    "q_classifier_infer" -> (graft.ext.CorpusOps.qClassifierInfer _),
    "q_classifier_eval" -> (graft.ext.CorpusOps.qClassifierEval _),
    "q_calibration" -> (graft.ext.CorpusOps.qCalibration _),
    "q_quantile_norm" -> (graft.ext.CorpusOps.qQuantileNorm _),
    "q_boilerplate" -> (graft.ext.CorpusOps.qBoilerplate _),
    "q_lm_score" -> (graft.ext.CorpusOps.qLmScore _),
    "q_score_threshold" -> (graft.ext.CorpusOps.qScoreThreshold _),
    "q_dsir_weights" -> (graft.ext.CorpusOps.qDsirWeights _),
    "q_dsir_sample" -> (graft.ext.CorpusOps.qDsirSample _),
    "q_ann_brute" -> (graft.ext.Similarity.qAnnBrute _),
    "q_ann_cosine_by_id" -> (graft.ext.Similarity.qAnnCosineById _),
    "q_ann_lsh" -> (graft.ext.Similarity.qAnnLsh _),
    "q_ann_lsh_det" -> (graft.ext.Similarity.qAnnLshDet _),
    "q_ann_ivf" -> (graft.ext.Similarity.qAnnIvf _),
    "q_ann_pq" -> (graft.ext.Similarity.qAnnPq _),
    "q_ann_ivf_pq" -> (graft.ext.Similarity.qAnnIvfPq _),
    "q_kmeans" -> (graft.ext.KMeansOps.qKmeans _),
    "q_cluster_sample" -> (graft.ext.KMeansOps.qClusterSample _),
    "q_semdedup" -> (graft.ext.SemDedup.qSemDedup _),
    "q_semdedup_det" -> (graft.ext.SemDedup.qSemDedupDet _),
    "q_count_distinct" -> (graft.ext.Similarity.qCountDistinct _),
    "q_approx_distinct" -> (graft.ext.Similarity.qApproxDistinct _),
    "q_approx_distinct_det" -> (graft.ext.Similarity.qApproxDistinctDet _),
    "q_knn_probe" -> (graft.ext.Similarity.qKnnProbe _),
    "q_embed_prototype" -> (graft.ext.Similarity.qEmbedPrototype _),
    "q_ncm_predict" -> (graft.ext.Similarity.qNcmPredict _),
    "q_knn_probe_ann" -> (graft.ext.Similarity.qKnnProbeAnn _),
    "q_dq_profile" -> (DataQuality.qDqProfile _),
    "q_benford" -> (DataQuality.qBenford _),
    "q_dq_rules" -> (DataQuality.qDqRules _),
    "q_skew_profile" -> (DataQuality.qSkewProfile _),
    "q_acf" -> (Autocorr.qAcf _),
    "q_kcore" -> (KCore.qKcore _),
    "q_item_cf" -> (ItemCf.qItemCf _),
    "q_kmv_intersect" -> (KmvSetOps.qKmvIntersect _),
    "q_ewma" -> (Ewma.qEwma _),
    "q_weighted_sample" -> (WeightedSample.qWeightedSample _),
    "q_corr_matrix" -> (CorrMatrix.qCorrMatrix _),
    "q_seasonality" -> (Seasonality.qSeasonality _),
    "q_multimodal_decode" -> (graft.multimodal.Multimodal.qMultimodalDecode _),
    "q_frame_sample" -> (graft.multimodal.Multimodal.qFrameSample _),
    "q_frame_extract" -> (graft.multimodal.Multimodal.qFrameExtract _),
    "q_media_near_dup" -> (graft.multimodal.Multimodal.qMediaNearDup _),
    "q_media_near_dup_det" ->
      (graft.multimodal.Multimodal.qMediaNearDupDet _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Aggregates.q1AggSql,
    "q_scalar_min" -> Aggregates.scalarMinSql,
    "q_rollup" -> Aggregates.qRollupSql,
    "q_grouping_sets" -> Aggregates.qGroupingSetsSql,
    "q_ntile" -> Aggregates.qNtileSql,
    "q_view_transactions" -> Views.transactionsSql,
    "q_view_transactions_scaled" -> Views.transactionsScaledSql,
    "q_view_retention" -> Views.retentionSql,
    "q_view_auto_optiom" -> Views.autoOptiomSql,
    "q_clean_strip" -> CleanOps.qCleanStripSql,
    "q_clean_nulls" -> CleanOps.qCleanNullsSql,
    "q_clean_datecoerce" -> CleanOps.qCleanDatecoerceSql,
    "q_clean_cast" -> CleanOps.qCleanCastSql,
    "q_merge" -> MergeOps.qMergeSql,
    "q_events_window" -> Events.qEventsWindowSql,
    "q_sessionize" -> Events.qSessionizeSql,
    "q_json_props" -> Events.qJsonPropsSql,
    "q_pivot" -> Events.qPivotSql,
    "q_quantiles" -> Events.qQuantilesSql,
    "q_funnel" -> Events.qFunnelSql,
    "q_cohort" -> Events.qCohortSql,
    "q_rolling_active" -> Events.qRollingActiveSql,
    "q_funnel_conv" -> Events.qFunnelConvSql,
    "q_event_transitions" -> Events.qEventTransitionsSql,
    "q_top_spenders" -> Events.qTopSpendersSql,
    "q_event_anomaly" -> Events.qEventAnomalySql,
    "q_gap_fill" -> Events.qGapFillSql,
    "q_islands" -> Events.qIslandsSql,
    "q_attribution" -> Events.qAttributionSql,
    "q_dedup_keep_best" -> graft.ext.Dedup.qDedupKeepBestSql,
    "q_dedup_methods" -> graft.ext.Dedup.qDedupMethodsSql,
    "q_asof_join" -> AsofJoin.qAsofJoinSql,
    "q_range_join" -> RangeJoin.qRangeJoinSql,
    "q_topk" -> SetSortOps.qTopkSql,
    "q_union" -> SetSortOps.qUnionSql,
    "q_base64" -> SetSortOps.qBase64Sql,
    "q_anti_join" -> SetSortOps.qAntiJoinSql,
    "q_fuzzy_join" -> FuzzyJoin.qFuzzyJoinSql,
    "q_pagerank" -> PageRank.qPagerankSql,
    "q_triangles" -> Triangles.qTrianglesSql,
    "q_label_prop" -> LabelProp.qLabelPropSql,
    "q_skyline" -> Skyline.qSkylineSql,
    "q_heavy_hitters" -> HeavyHitters.qHeavyHittersSql,
    "q_bfs" -> Bfs.qBfsSql,
    "q_scd2" -> Scd2.qScd2Sql,
    "q_cdc_apply" -> CdcApply.qCdcApplySql,
    "q_bm25" -> graft.ext.Bm25.qBm25Sql,
    "q_rolling_hll" -> Events.qRollingHllSql,
    "q_bloom_join" -> BloomProbe.qBloomJoinSql,
    "q_interval_join" -> IntervalJoin.qIntervalJoinSql,
    "q_path_trigrams" -> Events.qPathTrigramsSql,
    "q_cusum" -> Events.qCusumSql,
    "q_unpivot" -> Events.qUnpivotSql,
    "q_seasonal_naive" -> Events.qSeasonalNaiveSql,
    "q_robust_z" -> Events.qRobustZSql,
    "q_shortest_path" -> ShortestPath.qShortestPathSql,
    "q_weighted_median" -> WeightedMedian.qWeightedMedianSql,
    "q_mix_drift" -> MixDrift.qMixDriftSql,
    "q_pmi" -> graft.ext.Collocations.qPmiSql,
    "q_concurrency" -> Concurrency.qConcurrencySql,
    "q_assoc_rules" -> AssocRules.qAssocRulesSql,
    "q_region_revenue" -> Aggregates.qRegionRevenueSql,
    "q_winsorize" -> Aggregates.qWinsorizeSql,
    "q_zorder" -> ZOrder.qZorderSql,
    "q_edit_distance" -> graft.ext.TextOps.qEditDistanceSql,
    "q_hash_sample" -> graft.ext.TextOps.qHashSampleSql,
    "q_dedup_exact" -> graft.ext.Dedup.qDedupExactSql,
    "q_dedup_jaccard" -> graft.ext.Dedup.qDedupJaccardSql,
    "q_dedup_minhash" -> graft.ext.Dedup.qDedupMinhashSql,
    "q_dedup_simhash" -> graft.ext.Dedup.qDedupSimhashSql,
    "q_dedup_embed" -> graft.ext.Dedup.qDedupEmbedSql,
    "q_dup_clusters" -> graft.ext.Dedup.qDupClustersSql,
    "q_split_leakfree" -> graft.ext.Dedup.qSplitLeakfreeSql,
    "q_decontaminate" -> graft.ext.Dedup.qDecontaminateSql,
    "q_contam_frac" -> graft.ext.Dedup.qContamFracSql,
    "q_source_overlap" -> graft.ext.Dedup.qSourceOverlapSql,
    "q_pack" -> graft.ext.TextOps.qPackSql,
    "q_pack_boundaries" -> graft.ext.TextOps.qPackBoundariesSql,
    "q_pack_stats" -> graft.ext.TextOps.qPackStatsSql,
    "q_bpe_stats" -> graft.ext.Bpe.qBpeStatsSql,
    "q_manifest" -> graft.ext.TextOps.qManifestSql,
    "q_dataset_card" -> graft.ext.TextOps.qDatasetCardSql,
    "q_source_cards" -> graft.ext.TextOps.qSourceCardsSql,
    "q_passage_dedup" -> graft.ext.TextOps.qPassageDedupSql,
    "q_substr_dedup" -> graft.ext.TextOps.qSubstrDedupSql,
    "q_curate_e2e" -> graft.ext.TextOps.qCurateSql,
    "q_curate_audit" -> graft.ext.TextOps.qCurateAuditSql,
    "q_curate_report" -> graft.ext.TextOps.qCurateReportSql,
    "q_snapshot_diff" -> graft.ext.TextOps.qSnapshotDiffSql,
    "q_stratified_sample" -> graft.ext.TextOps.qStratifiedSampleSql,
    "q_mixture_sample" -> graft.ext.TextOps.qMixtureSampleSql,
    "q_mixture_plan" -> graft.ext.TextOps.qMixturePlanSql,
    "q_temp_sample" -> graft.ext.TextOps.qTempSampleSql,
    "q_shard_shuffle" -> graft.ext.TextOps.qShardShuffleSql,
    "q_text_stats" -> graft.ext.TextOps.qTextStatsSql,
    "q_lang_id" -> graft.ext.TextOps.qLangIdSql,
    "q_fingerprint" -> graft.ext.TextOps.qFingerprintSql,
    "q_winnow" -> graft.ext.TextOps.qWinnowSql,
    "q_tfidf" -> graft.ext.TextOps.qTfIdfSql,
    "q_quality_filter" -> graft.ext.TextOps.qQualityFilterSql,
    "q_pii_scrub" -> graft.ext.TextOps.qPiiScrubSql,
    "q_chunk" -> graft.ext.TextOps.qChunkSql,
    "q_rep_ratio" -> graft.ext.TextOps.qRepRatioSql,
    "q_group_cap" -> graft.ext.TextOps.qGroupCapSql,
    "q_vocab" -> graft.ext.CorpusOps.qVocabSql,
    "q_bpe_train" -> graft.ext.Bpe.qBpeTrainSql,
    "q_bpe_encode" -> graft.ext.Bpe.qBpeEncodeSql,
    // the production broadcast-table tokenizer must count exactly like
    // the replace chain — SAME oracle text, independently hash-checked
    "q_bpe_tokenize" -> graft.ext.Bpe.qBpeEncodeSql,
    "q_bloom_novel_det" -> graft.operators.BloomProbe.qBloomNovelDetSql,
    "q_classifier" -> graft.ext.CorpusOps.qClassifierSql,
    "q_classifier_train" -> graft.ext.CorpusOps.qClassifierTrainSql,
    "q_classifier_infer" -> graft.ext.CorpusOps.qClassifierInferSql,
    "q_classifier_eval" -> graft.ext.CorpusOps.qClassifierEvalSql,
    "q_calibration" -> graft.ext.CorpusOps.qCalibrationSql,
    "q_quantile_norm" -> graft.ext.CorpusOps.qQuantileNormSql,
    "q_boilerplate" -> graft.ext.CorpusOps.qBoilerplateSql,
    "q_lm_score" -> graft.ext.CorpusOps.qLmScoreSql,
    "q_score_threshold" -> graft.ext.CorpusOps.qScoreThresholdSql,
    "q_dsir_weights" -> graft.ext.CorpusOps.qDsirWeightsSql,
    "q_dsir_sample" -> graft.ext.CorpusOps.qDsirSampleSql,
    "q_ann_brute" -> graft.ext.Similarity.qAnnBruteSql,
    "q_ann_cosine_by_id" -> graft.ext.Similarity.qAnnCosineByIdSql,
    "q_ann_lsh_det" -> graft.ext.Similarity.qAnnLshDetSql,
    "q_kmeans" -> graft.ext.KMeansOps.qKmeansSql,
    "q_cluster_sample" -> graft.ext.KMeansOps.qClusterSampleSql,
    "q_semdedup_det" -> graft.ext.SemDedup.qSemDedupDetSql,
    "q_count_distinct" -> graft.ext.Similarity.qCountDistinctSql,
    "q_approx_distinct_det" -> graft.ext.Similarity.qApproxDistinctDetSql,
    "q_knn_probe" -> graft.ext.Similarity.qKnnProbeSql,
    "q_embed_prototype" -> graft.ext.Similarity.qEmbedPrototypeSql,
    "q_ncm_predict" -> graft.ext.Similarity.qNcmPredictSql,
    "q_dq_profile" -> DataQuality.qDqProfileSql,
    "q_benford" -> DataQuality.qBenfordSql,
    "q_dq_rules" -> DataQuality.qDqRulesSql,
    "q_skew_profile" -> DataQuality.qSkewProfileSql,
    "q_acf" -> Autocorr.qAcfSql,
    "q_kcore" -> KCore.qKcoreSql,
    "q_item_cf" -> ItemCf.qItemCfSql,
    "q_kmv_intersect" -> KmvSetOps.qKmvIntersectSql,
    "q_ewma" -> Ewma.qEwmaSql,
    "q_weighted_sample" -> WeightedSample.qWeightedSampleSql,
    "q_corr_matrix" -> CorrMatrix.qCorrMatrixSql,
    "q_seasonality" -> Seasonality.qSeasonalitySql,
    "q_multimodal_decode" -> graft.multimodal.Multimodal.qMultimodalDecodeSql,
    "q_frame_sample" -> graft.multimodal.Multimodal.qFrameSampleSql,
    "q_frame_extract" -> graft.multimodal.Multimodal.qFrameExtractSql,
    "q_media_near_dup_det" ->
      graft.multimodal.Multimodal.qMediaNearDupDetSql
    // q_media_near_dup: feature extraction crosses the codec seam and
    // float folds (audio RMS, frame means) → rows-only; MultimodalSpec
    // recomputes every reported cosine. q_media_near_dup_det
    // (oracle-checked above) hash-checks the image modality's WHOLE
    // pipeline — real BMP codec round-trip, quantization, banding,
    // cosine threshold — via integer-exact feature arithmetic.
    // q_bloom_novel: bloom bit positions are engine-hash internals →
    // rows-only; BloomProbeSpec proves the one-sided contract (zero
    // false negatives, bounded false positives) and the plan (native
    // might_contain, no UDF). q_bloom_novel_det (oracle-checked above)
    // replays full bloom SEMANTICS — md5-derived bit positions, build,
    // probe, false positives included — in the driver gate.
    // q_bpe_train IS oracle-checked above — the iterative training
    // loop unrolls into generated per-round CTEs (qBpeTrainSql), the
    // winnow/simhash full-replay technique; BpeSpec additionally
    // replays it in driver-side Scala.
    // q_semdedup: verdict over seeded-kmeans cells (same posture as
    // q_ann_ivf) — SemDedupSpec proves survivor policy + the
    // no-surviving-duplicate-pair invariant against driver-side brute
    // force; q_semdedup_det (oracle-checked above) replays the WHOLE
    // pipeline — mining, contraction, survivor — under a
    // deterministic sign-bit quantizer.
    // q_approx_distinct: HLL register layout is engine-internal →
    // rows-only; q_approx_distinct_det (oracle-checked above) pins
    // approximate-distinct semantics via the KMV bottom-k sketch,
    // whose md5-hash state is engine-portable.
    // q_ann_lsh / q_ann_ivf / q_ann_pq / q_ann_ivf_pq / q_knn_probe_ann:
    // seeded-hash / sketch /
    // trained-model internals aren't portable SQL — driver records the
    // weaker rows-only MEMBERSHIP check; q_ann_lsh_det (oracle-checked
    // above) hash-checks the LSH serving pipeline — buckets, Hamming-1
    // probe shell, top-k — under a deterministic sign-bit bucket
    // function. Returned VALUES are still
    // oracle-verified: cosine is a pure function of vec_id, and
    // q_ann_cosine_by_id hash-checks the full (vec_id, cosine) table any
    // ANN row must come from; ExtSpec recomputes every cosine the
    // LSH/IVF paths actually return. (q_dedup_minhash's OUTPUT pair set
    // IS oracle-checked above via the rare-shingle candidate route, and
    // q_dedup_simhash is a FULL md5-Horner SQL replay.)
  )
}
