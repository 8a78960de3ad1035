package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SQL-expressible query has a DuckDB twin in [[oracleSql]]; output
  * column names AND dtypes are aligned on both sides (ints as BIGINT,
  * rounded doubles, deterministic total ORDER BY) so the driver's
  * sort-columns-then-hash compare is stable. ML-backed queries
  * (Word2Vec, MLlib LSH) are rows-only by design: their outputs are
  * run-dependent or engine-specific sketches (SURVEY.md §4.2, §5).
  */
object SparkEntry {

  /** Flagship: the reference's full pipeline — word counts ⋈ one global
    * Word2Vec model → (word, token, count, vector). sf0.001; driver
    * smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Embed.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // reference parity (word count / encode / format / vector math)
    "q01_wordcount"      -> (Parity.q01WordCount _),
    "q02_wordcount_topk" -> (Parity.q02WordCountTopK _),
    "q03_token_encode"   -> (Parity.q03TokenEncode _),
    "q04_flagship_format" -> (Parity.q04FlagshipFormat _),
    "q05_vector_mean"    -> (Parity.q05VectorMean _),
    "q06_cosine_pairs"   -> (Parity.q06CosinePairs _),
    // relational surface over the star schema
    "q10_pricing_summary" -> (Relational.q10PricingSummary _),
    "q11_join_dims"      -> (Relational.q11JoinDims _),
    "q12_top_revenue"    -> (Relational.q12TopRevenueOrders _),
    "q13_join_semi"      -> (Relational.q13JoinSemi _),
    "q14_join_anti"      -> (Relational.q14JoinAnti _),
    "q15_window_rank"    -> (Relational.q15WindowRank _),
    "q16_window_running" -> (Relational.q16WindowRunning _),
    "q17_rollup"         -> (Relational.q17Rollup _),
    "q18_setops"         -> (Relational.q18SetOps _),
    "q19_scalar_fns"     -> (Relational.q19ScalarFns _),
    "q20_json_events"    -> (Relational.q20JsonEvents _),
    "q21_time_window"    -> (Relational.q21TimeWindow _),
    "q22_range_join"     -> (Relational.q22RangeJoin _),
    "q23_distinct_agg"   -> (Relational.q23DistinctAgg _),
    "q24_topk_parts"     -> (Relational.q24TopKParts _),
    "q25_sessionize"     -> (Relational.q25Sessionize _),
    "q26_cube"           -> (Relational.q26Cube _),
    "q27_array_fns"      -> (Relational.q27ArrayFns _),
    "q28_map_fns"        -> (Relational.q28MapFns _),
    "q29_pivot"          -> (Relational.q29Pivot _),
    "q48_asof_join"      -> (AsOf.q48AsOfJoin _),
    "q51_percentiles"    -> (Relational.q51Percentiles _),
    "q51b_percentiles_approx" -> (Relational.q51bPercentilesApprox _),
    "q52_stats"          -> (Relational.q52Stats _),
    "q53_scalar_subquery" -> (Relational.q53ScalarSubquery _),
    "q54_grouping_sets"  -> (Relational.q54GroupingSets _),
    "q55_window_dist"    -> (Relational.q55WindowDistribution _),
    // training-data pipeline: dedup / similarity / text analysis
    "q30_dedup_exact"    -> (Dedup.q30ExactDedup _),
    "q31_minhash_sig"    -> (Dedup.q31MinHashSig _),
    "q32_simhash"        -> (Dedup.q32SimHash _),
    "q33_ngram_jaccard"  -> (Dedup.q33NgramJaccard _),
    "q49_embedding_neardup" -> (Dedup.q49EmbeddingNearDup _),
    "q68_dedup_clusters" -> (Dedup.q68DedupClusters _),
    "q86_hybrid_dedup"   -> (Dedup.q86HybridDedup _),
    "q34_knn_cosine"     -> (Similarity.q34KnnCosine _),
    "q61_knn_join"       -> (Similarity.q61KnnJoin _),
    "q95_bm25"           -> (Retrieval.q95Bm25 _),
    "q99_knn_label_eval" -> (Similarity.q99KnnLabelEval _),
    "q96_hybrid_rrf"     -> (Retrieval.q96HybridRrf _),
    "q35_lang_profile"   -> (TextAnalysis.q35LangProfile _),
    "q36_lang_id"        -> (TextAnalysis.q36LangId _),
    "q37_quality_score"  -> (TextAnalysis.q37QualityScore _),
    "q38_fingerprint"    -> (TextAnalysis.q38Fingerprint _),
    "q250_winnow_fingerprint" -> (TextAnalysis.q250WinnowFingerprint _),
    "q253_ols_quality"   -> (Stats.q253OlsQuality _),
    "q254_diff_in_diff"  -> (Stats.q254DiffInDiff _),
    "q258_holt_backtest" -> (Temporal.q258HoltBacktest _),
    "q267_cusum_changepoint" -> (Temporal.q267CusumChangepoint _),
    "q260_dispersion"    -> (Stats.q260DispersionIndex _),
    "q261_index_staleness" -> (KMeans.q261IndexStaleness _),
    "q262_ivf_served_store" -> (sources.IvfStore.q262IvfServedStore _),
    "q266_maintenance_policy" -> (KMeans.q266MaintenancePolicy _),
    "q263_incremental_reindex" -> (sources.IvfStore.q263IncrementalReindex _),
    "q268_retrain_act"   -> (sources.IvfStore.q268RetrainActStore _),
    "q269_rebuild_audit" -> (sources.IvfStore.q269RebuildAudit _),
    "q264_winnowed_dedup" -> (Dedup.q264WinnowedDedup _),
    // rows-only (the q89/q146 iterative-fit contract): the OPQ
    // alternation's SVD has no DuckDB replay
    "q265_opq_rotation"  -> (Quantize.q265OpqRotation _),
    "q47_edit_distance"  -> (TextAnalysis.q47EditDistance _),
    "q59_line_dedup"     -> (TextAnalysis.q59LineDedup _),
    "q62_corpus_split"   -> (TextAnalysis.q62CorpusSplit _),
    "q63_seq_packing"    -> (TextAnalysis.q63SequencePacking _),
    "q64_tfidf"          -> (TextAnalysis.q64TfIdf _),
    "q65_repetition"     -> (TextAnalysis.q65RepetitionFilter _),
    "q66_strat_sample"   -> (TextAnalysis.q66StratifiedSample _),
    "q97_weighted_sample" -> (TextAnalysis.q97WeightedSample _),
    "q98_snapshot_drift"  -> (TextAnalysis.q98SnapshotDrift _),
    "q106_snapshot_delta" -> (TextAnalysis.q106SnapshotDelta _),
    "q100_padding_waste"  -> (TextAnalysis.q100PaddingWaste _),
    "q67_source_cap"     -> (TextAnalysis.q67SourceCap _),
    "q69_pii_scrub"      -> (TextAnalysis.q69PiiScrub _),
    "q70_decontaminate"  -> (TextAnalysis.q70Decontaminate _),
    "q248_eval_containment" -> (TextAnalysis.q248EvalContainment _),
    "q72_funnel"         -> (operators.Funnel.q72Funnel _),
    "q71_unigram_logp"   -> (TextAnalysis.q71UnigramLogProb _),
    "q73_incr_dedup"     -> (Dedup.q73IncrementalDedup _),
    "q74_bigram_logp"    -> (TextAnalysis.q74BigramLogProb _),
    "q75_dup_fraction"   -> (TextAnalysis.q75DupFraction _),
    "q79_curriculum_bins" -> (TextAnalysis.q79CurriculumBins _),
    "q80_event_zscore"   -> (Relational.q80EventZscore _),
    "q101_retention_cohorts" -> (Relational.q101RetentionCohorts _),
    "q102_event_funnel"  -> (Relational.q102EventFunnel _),
    "q108_day_bounded_window" -> (Relational.q108DayBoundedWindow _),
    "q109_heavy_hitters" -> (HeavyHitters.q109HeavyHitters _),
    "q256_cms_freq"      -> (HeavyHitters.q256CmsFreq _),
    "q110_textrank"      -> (Graph.q110TextRank _),
    "q111_scd2"          -> (Temporal.q111Scd2 _),
    "q112_markov_transitions" -> (Temporal.q112MarkovTransitions _),
    "q113_ewma_anomaly"  -> (Temporal.q113EwmaAnomaly _),
    "q114_pq_codes"      -> (Quantize.q114PqCodes _),
    "q114b_pq_adc_topk"  -> (Quantize.q114bPqAdcTopK _),
    "q115_pq_rerank"     -> (Quantize.q115PqRerank _),
    "q116_kmeans_fit"    -> (KMeans.q116KmeansFit _),
    "q117_triangles"     -> (Graph.q117Triangles _),
    "q118_bloom_decontaminate" -> (TextAnalysis.q118BloomDecontaminate _),
    "q119_ivf_search"    -> (KMeans.q119IvfSearch _),
    "q120_source_divergence" -> (TextAnalysis.q120SourceDivergence _),
    "q121_sequence_match" -> (Temporal.q121SequenceMatch _),
    "q122_attribution"   -> (Temporal.q122Attribution _),
    "q123_fuzzy_names"   -> (Linkage.q123FuzzyNames _),
    "q124_market_basket" -> (Associations.q124MarketBasket _),
    "q125_seasonal_index" -> (Temporal.q125SeasonalIndex _),
    "q126_changepoint"   -> (Temporal.q126Changepoint _),
    "q127_conversion_latency" -> (Temporal.q127ConversionLatency _),
    "q128_label_prop"    -> (Graph.q128LabelProp _),
    "q129_interval_lookup" -> (Temporal.q129IntervalLookup _),
    "q130_profile"       -> (Profile.q130ProfileLineitem _),
    // rows-only by the q44/q51b sketch contract: HLL internals are
    // engine-specific; the rsd-bound-vs-exact contract is in QueriesSpec
    "q130b_profile_approx" -> (Profile.q130bProfileApprox _),
    "q131_merge_upsert"  -> (TextAnalysis.q131MergeUpsert _),
    "q132_ppr"           -> (Graph.q132PersonalizedPagerank _),
    "q133_top_paths"     -> (Temporal.q133TopPaths _),
    "q134_chi_square"    -> (Stats.q134ChiSquare _),
    "q135_corr_matrix"   -> (Stats.q135CorrMatrix _),
    "q136_mad_outliers"  -> (Stats.q136MadOutliers _),
    "q137_welch_ttest"   -> (Stats.q137WelchTtest _),
    "q138_skew_report"   -> (Stats.q138SkewReport _),
    "q139_ndcg_eval"     -> (Similarity.q139NdcgEval _),
    "q140_equidepth_hist" -> (Profile.q140EquiDepthHist _),
    "q140b_equidepth_approx" -> (Profile.q140bEquiDepthApprox _),
    "q141_hard_negatives" -> (Similarity.q141HardNegatives _),
    "q142_chunk_overlap"  -> (TextAnalysis.q142ChunkOverlap _),
    "q143_block_jackknife" -> (Stats.q143BlockJackknife _),
    "q144_quality_trend"  -> (Stats.q144QualityTrend _),
    // q145 oracle-checked since round 7 (unrolled Viterbi DP CTE);
    // q146 stays rows-only: EM training output (Unigram scaladoc)
    "q145_unigram_encode" -> (Unigram.q145UnigramEncode _),
    "q146_unigram_train"  -> (Unigram.q146UnigramTrain _),
    "q147_shortest_paths" -> (Graph.q147ShortestPaths _),
    "q148_ivf_recall"     -> (KMeans.q148IvfRecall _),
    "q149_multi_decontaminate" -> (TextAnalysis.q149MultiSuiteDecontaminate _),
    // rows-only: q89-model-derived output (QualityFilter scaladoc)
    "q150_calibration_curve" -> (QualityFilter.q150CalibrationCurve _),
    "q151_threshold_sweep" -> (QualityFilter.q151ThresholdSweep _),
    "q152_mrl_recall"     -> (Similarity.q152MrlRecall _),
    "q153_poisson_bootstrap" -> (Stats.q153PoissonBootstrap _),
    "q154_pmi_collocations" -> (TextAnalysis.q154PmiCollocations _),
    "q155_ab_fdr"         -> (Stats.q155AbFdr _),
    "q156_gap_fill"       -> (Temporal.q156GapFill _),
    "q157_session_window" -> (Temporal.q157SessionWindow _),
    "q158_diversity_sample" -> (KMeans.q158DiversitySample _),
    "q159_nfc_report"     -> (TextAnalysis.q159NfcReport _),
    "q160_source_emd"     -> (TextAnalysis.q160SourceEmd _),
    "q161_mmr_rerank"     -> (Similarity.q161MmrRerank _),
    "q162_session_concurrency" -> (Temporal.q162SessionConcurrency _),
    "q162b_concurrency_sharded" -> (Temporal.q162bSessionConcurrencySharded _),
    "q163_markov_attribution" -> (Temporal.q163MarkovAttribution _),
    "q164_shard_moves"    -> (Skew.q164ShardMoves _),
    "q165_heaps_curve"    -> (TextAnalysis.q165HeapsCurve _),
    "q166_audience_overlap" -> (Associations.q166AudienceOverlap _),
    "q167_loo_influence"  -> (Stats.q167LooInfluence _),
    "q168_vocab_coverage" -> (TextAnalysis.q168VocabCoverage _),
    "q169_setsim_join"    -> (Dedup.q169SetSimJoin _),
    "q170_join_card_est"  -> (Skew.q170JoinCardEst _),
    "q171_deepwalk"       -> (Graph.q171DeepWalk _),
    "q172_isotonic_fit"   -> (Stats.q172IsotonicFit _),
    "q173_survival_km"    -> (Temporal.q173SurvivalKm _),
    "q174_active_users"   -> (Temporal.q174ActiveUsers _),
    // rows-only: DataSketches HLL internals (the q44/q166b contract)
    "q174b_active_users_hll" -> (Temporal.q174bActiveUsersHll _),
    "q175_msprt"          -> (Stats.q175Msprt _),
    "q176_covariate_balance" -> (Stats.q176CovariateBalance _),
    "q177_centroid_geometry" -> (LinAlg.q177CentroidGeometry _),
    "q178_source_containment" -> (Dedup.q178SourceContainment _),
    "q179_dq_audit"       -> (Profile.q179DqAudit _),
    "q180_lexical_drift"  -> (TextAnalysis.q180LexicalDrift _),
    "q181_benford_audit"  -> (Profile.q181BenfordAudit _),
    "q182_theil_sen"      -> (Stats.q182TheilSen _),
    "q183_order_recon"    -> (Profile.q183OrderReconciliation _),
    "q184_debounce"       -> (Temporal.q184Debounce _),
    "q185_markov_eval"    -> (Temporal.q185MarkovEval _),
    "q186_lang_consistency" -> (TextAnalysis.q186LangConsistency _),
    "q187_conformal_gate" -> (TextAnalysis.q187ConformalGate _),
    "q188_zipf_fit"       -> (TextAnalysis.q188ZipfFit _),
    "q189_gini"           -> (Stats.q189GiniConcentration _),
    "q190_forecast_backtest" -> (Temporal.q190ForecastBacktest _),
    "q191_rater_agreement" -> (TextAnalysis.q191RaterAgreement _),
    "q192_k_anonymity"    -> (Profile.q192KAnonymity _),
    "q193_rfm_segments"   -> (Relational.q193RfmSegments _),
    "q194_column_entropy" -> (Profile.q194ColumnEntropy _),
    "q195_power_mde"      -> (Stats.q195PowerMde _),
    "q196_priority_sample" -> (TextAnalysis.q196PrioritySample _),
    "q197_inclusion_deps" -> (Profile.q197InclusionDeps _),
    "q198_assortativity"  -> (Graph.q198Assortativity _),
    "q199_embedding_health" -> (LinAlg.q199EmbeddingHealth _),
    "q200_journey_entropy" -> (Temporal.q200JourneyEntropy _),
    "q201_cluster_sizes"  -> (Dedup.q201ClusterSizes _),
    "q202_latency_ci"     -> (Temporal.q202LatencyCi _),
    "q203_banding_recall" -> (Dedup.q203BandingRecall _),
    "q204_canonical_election" -> (Dedup.q204CanonicalElection _),
    "q246_election_regret" -> (Dedup.q246ElectionRegret _),
    "q205_deletion_impact" -> (Profile.q205DeletionImpact _),
    "q206_retention_guardrail" -> (Stats.q206RetentionGuardrail _),
    "q207_effective_data" -> (TextAnalysis.q207EffectiveData _),
    "q208_modality_coverage" -> (Profile.q208ModalityCoverage _),
    "q209_funnel_ci"      -> (Relational.q209FunnelCi _),
    "q210_copy_flow"      -> (Dedup.q210CopyFlow _),
    "q211_truncation_loss" -> (TextAnalysis.q211TruncationLoss _),
    "q212_dedup_sensitivity" -> (Dedup.q212DedupSensitivity _),
    "q213_weighted_sample" -> (TextAnalysis.q213WeightedSample _),
    "q214_effective_mix"  -> (TextAnalysis.q214EffectiveMix _),
    "q215_clustering_coefficient" -> (Graph.q215ClusteringCoefficient _),
    "q216_cuped"          -> (Stats.q216Cuped _),
    "q217_mann_whitney"   -> (Stats.q217MannWhitney _),
    "q218_ks_test"        -> (Stats.q218KsTest _),
    "q219_eb_shrinkage"   -> (Stats.q219EbShrinkage _),
    "q220_autocorr"       -> (Stats.q220Autocorr _),
    "q221_bernstein_bounds" -> (Stats.q221BernsteinBounds _),
    "q222_banding_planner" -> (Dedup.q222BandingPlanner _),
    "q223_threshold_stability" -> (Dedup.q223ThresholdStability _),
    "q224_nprobe_sweep"   -> (KMeans.q224NprobeSweep _),
    "q242_k_sweep"        -> (KMeans.q242KSweep _),
    "q244_ivf_adc"        -> (Quantize.q244IvfAdc _),
    "q245_ivfpq_residual" -> (Quantize.q245IvfPqResidual _),
    "q247_residual_distortion" -> (Quantize.q247ResidualDistortion _),
    "q249_sq8_knn"        -> (Quantize.q249Sq8Knn _),
    "q251_balanced_pq"    -> (Quantize.q251BalancedPq _),
    "q255_kcenter"        -> (KMeans.q255KCenter _),
    "q257_cell_refined_blocking" -> (Dedup.q257CellRefinedBlocking _),
    "q259_group_kfold"    -> (Dedup.q259GroupKfold _),
    "q225_pq_distortion"  -> (Quantize.q225PqDistortion _),
    "q226_encoder_consistency" -> (Dedup.q226EncoderConsistency _),
    "q227_signal_agreement" -> (Dedup.q227SignalAgreement _),
    "q228_signal_mi"      -> (TextAnalysis.q228SignalMi _),
    "q229_good_turing"    -> (Profile.q229GoodTuring _),
    "q230_l_diversity"    -> (Profile.q230LDiversity _),
    "q252_t_closeness"    -> (Profile.q252TCloseness _),
    "q231_template_similarity" -> (TextAnalysis.q231TemplateSimilarity _),
    "q232_budget_allocator" -> (TextAnalysis.q232BudgetAllocator _),
    "q243_budget_sample"  -> (TextAnalysis.q243BudgetSample _),
    "q233_stationary_dist" -> (Temporal.q233StationaryDist _),
    "q234_k_core"         -> (Graph.q234KCore _),
    "q235_burstiness"     -> (Temporal.q235Burstiness _),
    "q236_type_cooccurrence" -> (Temporal.q236TypeCooccurrence _),
    "q237_quality_deciles" -> (TextAnalysis.q237QualityDeciles _),
    "q238_length_adjusted_quality" -> (TextAnalysis.q238LengthAdjustedQuality _),
    "q239_deseasonalized_anomaly" -> (Temporal.q239DeseasonalizedAnomaly _),
    "q240_daily_latency"  -> (Temporal.q240DailyLatency _),
    "q241_dup_trend"      -> (TextAnalysis.q241DupTrend _),
    "q81_dsir_weight"    -> (TextAnalysis.q81DsirWeight _),
    "q82_novelty"        -> (TextAnalysis.q82NgramNovelty _),
    "q83_domain_mix"     -> (TextAnalysis.q83DomainMix _),
    "q85_dup_spans"      -> (TextAnalysis.q85DupSpans _),
    "q88_source_report"  -> (TextAnalysis.q88SourceReport _),
    "q90_packing_manifest" -> (TextAnalysis.q90PackingManifest _),
    "q91_mix_sample"     -> (TextAnalysis.q91MixSample _),
    "q92_dsir_hashed"    -> (TextAnalysis.q92DsirHashed _),
    "q94_ngram_langid"   -> (TextAnalysis.q94NgramLangId _),
    "q94b_langid_seed"   -> (TextAnalysis.q94bLangIdSeed _),
    "q103b_covariance"   -> (LinAlg.q103bCovariance _),
    "q104_embedding_drift" -> (LinAlg.q104EmbeddingDrift _),
    "q105_whitened_neardup" -> (LinAlg.q105WhitenedNearDup _),
    "q107_pca_project"   -> (LinAlg.q107PcaProject _),
    "q76_quantize_int8"  -> (Quantize.q76QuantizeInt8 _),
    "q84_binary_quant_knn" -> (Quantize.q84BinaryQuantKnn _),
    "q77_minhash_calibration" -> (Dedup.q77MinhashCalibration _),
    "q78_semantic_prune" -> (Dedup.q78SemanticPrune _),
    "q39_multimodal_meta" -> (Multimodal.q39MultimodalMeta _),
    "q93_media_features" -> (Multimodal.q93MediaFeatures _),
    "q46_frame_sample"   -> (Multimodal.q46FrameSample _),
    "q60_chunk_dedup"    -> (Multimodal.q60ChunkDedup _),
    "q56_bpe_encode"     -> (Bpe.q56BpeEncode _),
    "q87_tokenizer_fertility" -> (Bpe.q87TokenizerFertility _),
    "q58_dropped_vocab"  -> (Embed.q58DroppedVocab _),
    "q45b_ivf_seeded_cells" -> (Similarity.q45bIvfSeededCells _),
    // rows-only (ML-backed / engine-specific, no SQL oracle)
    "q40_word2vec_vocab" -> (Embed.q40Word2VecVocab _),
    "q41_synonyms"       -> (Embed.q41Synonyms _),
    "q42_lsh_minhash"    -> (Dedup.q42MlMinHashLsh _),
    "q43_lsh_buckets"    -> (Similarity.q43LshBuckets _),
    "q44_approx_distinct" -> (Similarity.q44ApproxDistinct _),
    "q45_ivf_cells"      -> (Similarity.q45IvfCells _),
    "q89_quality_classifier" -> (QualityFilter.q89QualityClassifier _),
    "q103_pca_variance"  -> (LinAlg.q103PcaVariance _),
    "q57_bpe_train"      -> (Bpe.q57BpeTrain _),
    // rows-only: DataSketches HLL internals are engine-specific
    // (q44's contract); the spec bounds it against the exact q166
    "q166b_audience_overlap_hll" -> (Associations.q166bAudienceOverlapHll _),
    // custom UDAF — oracle-checked via the rounded-norm contract
    "q50_vector_mean_agg" -> (Parity.q50VectorMeanAgg _),
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL. Shared deterministic fragments mirror
  // graft.functions.Portable exactly (same constants 31/131/1000000007).
  // ---------------------------------------------------------------------

  /** DuckDB: reference tokenizer (lowercase, split \W+, alpha-only). */
  private def tok(textCol: String): String =
    s"""list_filter(regexp_split_to_array(lower($textCol), '\\W+'), w -> regexp_matches(w, '^[a-z]+$$'))"""

  /** DuckDB: polynomial char-code hash == Portable.tokenId. */
  private def tokenId(w: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length($w)+1), i -> CAST(ascii($w[i]) AS BIGINT))), (acc, c) -> (acc*31 + c) % 1000000007)"""

  /** DuckDB: rolling token-stream hash == Portable.fingerprint. */
  private def fingerprint(words: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($words, wrd -> ${tokenId("wrd")})), (acc2, h2) -> (acc2*131 + h2) % 1000000007)"""

  /** DuckDB: the simhash-band candidate CTE chain shared by q49/q61 —
    * embeddings → 4×8-bit band signatures (Dedup.simhashPlanes inlined
    * as ±1 literals) → capped buckets → distinct ordered candidate
    * pairs. Yields CTEs named e, sig, ub, sized, cand. */
  private def simhashCandCte: String = {
    val bandExprs = (0 until operators.Dedup.nBands).map { k =>
      val bits = (0 until operators.Dedup.bandBits).map { t =>
        val j = k * operators.Dedup.bandBits + t
        val wl = operators.Dedup.simhashPlanes(j)
          .map(w => if (w > 0) "1" else "-1").mkString("[", ",", "]")
        s"(CASE WHEN list_dot_product(v, $wl::DOUBLE[]) >= 0 THEN ${1L << t} ELSE 0 END)"
      }
      s"(${bits.mkString(" + ")}) AS band$k"
    }
    val unions = (0 until operators.Dedup.nBands)
      .map(k => s"SELECT vec_id, $k AS band, band$k AS val FROM sig")
      .mkString(" UNION ALL ")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |sig AS (SELECT vec_id, ${bandExprs.mkString(",\n        ")} FROM e),
       |ub AS ($unions),
       |sized AS (SELECT band, val FROM ub GROUP BY band, val
       |          HAVING count(*) BETWEEN 2 AND ${operators.Dedup.bucketCap}),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |         FROM ub a JOIN ub b USING (band, val) JOIN sized USING (band, val)
       |         WHERE a.vec_id < b.vec_id)""".stripMargin
  }

  // single source of truth: the operator-side marker set
  private val stoplist = TextAnalysis.stopwords.map(w => s"'$w'").mkString("(", ",", ")")

  /** DuckDB: sequential squared-L2 fold — same left-fold order as the
    * Spark side's `aggregate(zip_with(...))` (Quantize.sqDist), so the
    * unrounded doubles agree bit-for-bit (the q76 contract). */
  private def sqDistSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a)+1), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), (acc, xx) -> acc + xx)"

  /** Name of the final centroid CTE produced by [[kmeansCte]]. */
  private def kmeansLast: String = s"c${operators.KMeans.Iters}"

  /** DuckDB: one seeded-Lloyd CTE chain at cell count `k`, CTE names
    * prefixed with `p` — seeded centroids (vec_id &lt; k) → Iters
    * assign/update rounds → final assignment. Yields CTEs ${p}c0..
    * ${p}cIters, ${p}a1.., ${p}af; expects a shared `e` CTE upstream.
    * Every aN/cN is MATERIALIZED and references its predecessor once,
    * so the chain stays linear under CTE inlining (mirrors
    * KMeans.fit/assign). The empty prefix yields the q116/q119 chain
    * at the shipped K; q242 instantiates four prefixed chains. */
  /** `src` = the table the FIT iterates over (seeds + Lloyd rounds);
    * the final `af` assignment always serves the FULL `e` — identical
    * strings for the default src="e", and exactly the old-snapshot-
    * centroids-serving-the-grown-corpus shape q261 audits otherwise. */
  private def kmeansChain(k: Int, p: String, src: String = "e"): String = {
    val rounds = (1 to operators.KMeans.Iters).map { i =>
      s"""${p}a$i AS MATERIALIZED (SELECT vec_id, v, cluster, dist FROM (
         |    SELECT vec_id, v, cluster, dist,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rk
         |    FROM (SELECT $src.vec_id, $src.v, c.cluster,
         |                 round(${sqDistSql(s"$src.v", "c.cv")}, 6) AS dist
         |          FROM $src CROSS JOIN ${p}c${i - 1} c) s0) t WHERE rk = 1),
         |${p}m$i AS (SELECT cluster, list(m ORDER BY pos) AS cv2 FROM (
         |    SELECT cluster, pos, round(avg(x), 6) AS m FROM (
         |      SELECT cluster, unnest(range(1, len(v)+1)) AS pos, unnest(v) AS x
         |      FROM ${p}a$i) s0 GROUP BY cluster, pos) s1 GROUP BY cluster),
         |${p}c$i AS MATERIALIZED (SELECT c.cluster, coalesce(m.cv2, c.cv) AS cv
         |  FROM ${p}c${i - 1} c LEFT JOIN ${p}m$i m USING (cluster))""".stripMargin
    }.mkString(",\n")
    s"""${p}c0 AS MATERIALIZED (SELECT vec_id AS cluster, v AS cv FROM $src
       |  WHERE vec_id < $k),
       |$rounds,
       |${p}af AS MATERIALIZED (SELECT vec_id, cluster, dist FROM (
       |    SELECT vec_id, cluster, dist,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rk
       |    FROM (SELECT e.vec_id, c.cluster,
       |                 round(${sqDistSql("e.v", "c.cv")}, 6) AS dist
       |          FROM e CROSS JOIN ${p}c${operators.KMeans.Iters} c) s0) t WHERE rk = 1)""".stripMargin
  }

  /** DuckDB: the seeded-Lloyd CTE chain shared by q116/q119 —
    * embeddings → [[kmeansChain]] at the shipped K with no prefix.
    * Yields CTEs e, c0..cIters, a1..aIters, af. */
  private def kmeansCte: String =
    s"""e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${kmeansChain(operators.KMeans.K, "")}""".stripMargin

  /** DuckDB: the q232 capped-water-filling allocation chain (canonical
    * supply → sqrt-temperature targets → cap → one rebalance round),
    * ending in CTE `f6` with the unrounded alloc2 — shared by the q232
    * report and the q243 executor, mirroring the shared
    * `TextAnalysis.budgetAllocation` frame. `relative` = the q243
    * scale-relative budget (exact long total supply, cast, × 0.1);
    * false = the production 1e9 literal (q232). */
  private def budgetAllocCte(relative: Boolean): String = {
    val budget =
      if (relative) "CAST(sum(supply) OVER wa AS DOUBLE) * 0.1"
      else "1000000000.0"
    s"""per AS (SELECT source, sum(n_tokens * is_canonical) AS supply
      |  FROM (SELECT source, len(string_split(text, ' ')) AS n_tokens,
      |      CASE WHEN row_number() OVER
      |        (PARTITION BY md5(text) ORDER BY doc_id) = 1
      |        THEN 1 ELSE 0 END AS is_canonical
      |    FROM documents WHERE text IS NOT NULL) t GROUP BY 1),
      |f1 AS (SELECT source, supply,
      |    sum(sqrt(CAST(supply AS DOUBLE))) OVER wa AS z,
      |    $budget AS budget
      |  FROM per WINDOW wa AS (ORDER BY source
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
      |f2 AS (SELECT *, sqrt(CAST(supply AS DOUBLE)) / z AS wgt FROM f1),
      |f3 AS (SELECT *, wgt * budget AS target,
      |    least(CAST(supply AS DOUBLE), wgt * budget) AS alloc1
      |  FROM f2),
      |f4 AS (SELECT *,
      |    budget - sum(alloc1) OVER wa AS leftover,
      |    CASE WHEN alloc1 < CAST(supply AS DOUBLE) THEN 1 ELSE 0 END
      |      AS uncapped
      |  FROM f3 WINDOW wa AS (ORDER BY source
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
      |f5 AS (SELECT *,
      |    sum(CASE WHEN uncapped = 1 THEN wgt ELSE 0.0 END) OVER wa AS zu
      |  FROM f4 WINDOW wa AS (ORDER BY source
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
      |f6 AS (SELECT *, CASE WHEN uncapped = 1 AND zu > 0
      |    THEN least(CAST(supply AS DOUBLE), alloc1 + wgt / zu * leftover)
      |    ELSE alloc1 END AS alloc2 FROM f5)""".stripMargin
  }

  /** DuckDB: one q242 sweep block at cell count `k` — probe the
    * prefixed chain's cells at every nprobe, fold recall + scanned
    * totals over the query block (mirrors the per-K body of
    * KMeans.q242KSweep; expects shared CTEs e/q/pr/tn/nv upstream). */
  private def q242Block(k: Int): String = {
    val p = s"k${k}_"
    val last = s"${p}c${operators.KMeans.Iters}"
    s"""${p}mem AS (SELECT a.vec_id AS n_id, a.cluster, e.v AS nv
       |        FROM ${p}af a JOIN e ON e.vec_id = a.vec_id),
       |${p}csz AS (SELECT cluster, count(*) AS csz FROM ${p}af GROUP BY 1),
       |${p}qr AS (SELECT q_id, qv, cluster, crk FROM (
       |    SELECT q_id, qv, cluster, row_number() OVER
       |      (PARTITION BY q_id ORDER BY cdist, cluster) AS crk
       |    FROM (SELECT q.q_id, q.qv, c.cluster,
       |                 round(${sqDistSql("q.qv", "c.cv")}, 6) AS cdist
       |          FROM q CROSS JOIN $last c) s0) t WHERE crk <= ${operators.KMeans.ProbeSweep.max}),
       |${p}qc AS (SELECT pr.np, qr.q_id, qr.qv, qr.cluster
       |       FROM ${p}qr qr JOIN pr ON qr.crk <= pr.np),
       |${p}ivf AS (SELECT np, q_id, n_id FROM (
       |    SELECT qc.np, qc.q_id, m.n_id, row_number() OVER
       |      (PARTITION BY qc.np, qc.q_id ORDER BY
       |         round(${sqDistSql("qc.qv", "m.nv")}, 6), m.n_id) AS rank
       |    FROM ${p}mem m JOIN ${p}qc qc USING (cluster)
       |    WHERE m.n_id <> qc.q_id) t WHERE rank <= 10),
       |${p}ov AS (SELECT tn.np, CAST(count(i.n_id) AS BIGINT) AS n_overlap
       |       FROM tn LEFT JOIN ${p}ivf i
       |         ON i.np = tn.np AND i.q_id = tn.q_id AND i.n_id = tn.n_id
       |       GROUP BY 1),
       |${p}sc AS (SELECT np,
       |         CAST(sum(csz) - count(DISTINCT q_id) AS BIGINT) AS n_scanned
       |       FROM ${p}qc JOIN ${p}csz USING (cluster) GROUP BY 1),
       |${p}row AS (SELECT CAST($k AS BIGINT) AS k, sc.np AS nprobe,
       |         sc.n_scanned, ov.n_overlap,
       |         round(ov.n_overlap / ${operators.KMeans.EvalBlock * 10}.0, 4) AS recall_at_10,
       |         CAST(nv.n_vectors * $k * ${operators.KMeans.Iters} AS BIGINT)
       |           AS fit_dist_evals
       |       FROM ${p}sc sc JOIN ${p}ov ov ON ov.np = sc.np CROSS JOIN nv)""".stripMargin
  }

  /** DuckDB: the PQ code-assignment CTE chain shared by q114/q114b —
    * embeddings → per-subspace slices → seeded codebook (vec_id &lt;
    * PqK, the q45b rule) → rounded nearest-centroid codes. Yields CTEs
    * named e, subs, flat, cb, scored, codes (mirrors Quantize.pqCodes
    * constants PqM/PqK/subDim = 8/16/8). */
  private def pqCodesCte: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$pqTailCte""".stripMargin

  /** DuckDB: the full q244 probe→ADC→refine chain over fresh full-corpus
    * artifacts, emitting the refined top-10 rows — the shared oracle of
    * q262 (served from the persisted store) and q268 (served after the
    * stale-build → append → retrain lifecycle): both engine paths must
    * be answer-invariant to this store-free replay of the math. */
  private def ivfServedChainSql: String =
    s"""WITH $kmeansCte,
       |$pqTailCte,
       |qq AS (SELECT vec_id AS q_id, v AS qv FROM e
       |       WHERE vec_id < ${operators.KMeans.EvalBlock}),
       |qr AS (SELECT q_id, cluster FROM (
       |    SELECT q_id, cluster, row_number() OVER
       |      (PARTITION BY q_id ORDER BY cdist, cluster) AS crk
       |    FROM (SELECT qq.q_id, c.cluster,
       |                 round(${sqDistSql("qq.qv", "c.cv")}, 6) AS cdist
       |          FROM qq CROSS JOIN $kmeansLast c) s0) t
       |  WHERE crk <= ${operators.KMeans.Nprobe}),
       |cand AS (SELECT qr.q_id, a.vec_id AS n_id
       |         FROM qr JOIN af a USING (cluster) WHERE a.vec_id <> qr.q_id),
       |lut AS (SELECT f.vec_id AS q_id, f.sub, cb.code,
       |          round(${sqDistSql("f.sv", "cb.cv")}, 6) AS d
       |        FROM flat f JOIN cb ON cb.sub = f.sub
       |        WHERE f.vec_id < ${operators.KMeans.EvalBlock}),
       |adc AS (SELECT c.q_id, c.n_id, round(sum(l.d), 6) AS adc
       |        FROM cand c JOIN codes k ON k.vec_id = c.n_id
       |        JOIN lut l ON l.q_id = c.q_id AND l.sub = k.sub
       |          AND l.code = k.code
       |        GROUP BY 1, 2),
       |short AS (SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id, row_number() OVER
       |      (PARTITION BY q_id ORDER BY adc, n_id) AS ark
       |    FROM adc) t WHERE ark <= ${operators.Quantize.RefineR}),
       |res AS (SELECT q_id, rank, n_id, l2sq FROM (
       |    SELECT s.q_id, s.n_id,
       |           round(${sqDistSql("qq.qv", "e.v")}, 6) AS l2sq,
       |           row_number() OVER (PARTITION BY s.q_id ORDER BY
       |             round(${sqDistSql("qq.qv", "e.v")}, 6), s.n_id) AS rank
       |    FROM short s JOIN qq ON qq.q_id = s.q_id
       |    JOIN e ON e.vec_id = s.n_id) t WHERE rank <= 10)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, l2sq + 0.0 AS l2sq
       |FROM res ORDER BY q_id, rank""".stripMargin

  /** [[pqCodesCte]] minus its leading `e` CTE — for composing with
    * chains that already define `e` (q244 stacks it on [[kmeansCte]]). */
  private def pqTailCte: String =
    s"""subs AS (SELECT unnest(range(0, ${operators.Quantize.PqM})) AS sub),
       |flat AS (SELECT vec_id, sub, list_slice(v, sub * 8 + 1, sub * 8 + 8) AS sv
       |         FROM e CROSS JOIN subs),
       |cb AS (SELECT vec_id AS code, sub, sv AS cv FROM flat
       |       WHERE vec_id < ${operators.Quantize.PqK}),
       |scored AS (SELECT f.vec_id, f.sub, cb.code,
       |    round(${sqDistSql("f.sv", "cb.cv")}, 6) AS dist
       |  FROM flat f JOIN cb ON f.sub = cb.sub),
       |codes AS (SELECT vec_id, sub, code, dist FROM (
       |    SELECT vec_id, sub, code, dist,
       |           row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rk
       |    FROM scored) WHERE rk = 1)""".stripMargin

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops → driver
    * records a weaker rows-only check.
    *
    * ORACLE SQL TYPE RULES (learned the hard way — q63, round 2):
    * the driver's comparison frame hashes VALUES AND TYPES, and DuckDB
    * promotes integer aggregates beyond Spark's types. Always:
    *  1. CAST(sum(<int col>) ...) AS BIGINT — DuckDB promotes
    *     sum(BIGINT) to HUGEINT, which lands in the frame as float64
    *     and hash-mismatches even when every value is identical.
    *  2. Same for window sums: CAST(coalesce(sum(x) OVER (...),0) AS BIGINT),
    *     and for any column DERIVED from such a sum (a bin id computed
    *     from a cumsum inherits HUGEINT).
    *  3. count(*) is already BIGINT in both engines; no cast needed,
    *     but count(*) FILTER / arithmetic on counts follows rule 1.
    *  4. Spark double aggregates (avg, round(...,k)) match DuckDB's
    *     double — round BOTH sides to the same k decimals.
    *  5. Alias every computed column identically on both sides; the
    *     driver sorts columns by NAME before hashing.
    *  6. SIGNED ZERO (the round-8 q155 single-bit fail): any ROUNDED
    *     signed statistic that can land on zero from the negative side
    *     (t/z stats, slopes, deltas, correlations, SMDs) gets `+ 0.0`
    *     appended AFTER the round() on the DuckDB side. DuckDB's
    *     round() on DOUBLE preserves IEEE sign (round(-3e-5, 4) →
    *     −0.0, bits 0x8000…) while Spark's round() goes through
    *     BigDecimal which has no signed zero (+0.0). Values compare
    *     equal (pandas/NumPy treat −0.0 == 0.0 — which is exactly why
    *     this escaped the local gate twice) but the driver's hash sees
    *     the sign bit. IEEE −0.0 + 0.0 = +0.0, so the normalization is
    *     exact and value-preserving for every other input.
    *     tools/oracle_check.py is signbit-strict on float columns
    *     since round 9, so this class now fails locally — and DID:
    *     the sf0.1 sweep caught q81's dsir_weight (a rounded avg of
    *     signed log-ratios the candidate list missed) within hours of
    *     the gate landing; q92/q71/q74 (same family) normalized with
    *     it.
    *
    * ROUND-9 SIGNED-ZERO AUDIT (rule 6 sweep; q63→q129→q155 is the
    * same lesson at three depths, so every rounded signed statistic
    * was normalized at once rather than waiting for the next bit):
    * `+ 0.0` added to q06/q34/q61/q76/q84/q141 cos_sim, q52 corr,
    * q135 r, q177 cosine (signed cosines); q80 z, q137/q155 t_stat,
    * q176 smd (standardized stats); q144 slope, q167 slope_full/
    * slope_loo/influence, q182 ts_slope/ols_slope, q188 zipf_slope,
    * q198 assortativity (regression stats); q98 doc_log_ratio,
    * q104 mean_a/mean_b/mean_shift (embedding means), q113 dev,
    * q126 shift, q154 pmi, q175 delta/log_lambda, q127 latency
    * quantiles, q206 gap (retention-rate delta). Audited and left alone (provably non-negative or
    * never ±0.0): q49/q68/q86/q201/q203/q204/q212 cosines (≥0.45
    * thresholded), q139/q152/q96/q99 (cosines internal to ranks),
    * q143/q153 (means of strictly-positive value), q181/q183/q190/
    * q199 (abs/sqrt/χ²/ratios-of-nonneg), q202 (µs-integer deltas
    * can't round to −0.0). Round-9's own new queries carry the rule
    * from birth: q216 mean_cuped/var_cuped/var_reduction/theta,
    * q217 z, q220 acf1, q223 ari, q226 min_cos, q227 kappa,
    * q228 mi_nats, q235 burstiness, q236 pmi, q238 length_effect,
    * q239 z (the rest provably non-negative).
    *
    * ROUND-7 TYPE AUDIT (q129 repeated the q63 bug; swept all entries):
    * every `sum( ... ) OVER` in this map was checked — q129's `version`
    * cumsum is now CAST AS BIGINT (the one hash-fail of round 6); the
    * only two remaining uncast window sums are consumed internally and
    * never surface as output columns (q67 `total_tokens` is re-CAST at
    * the outer select; q64 `n_doc_tokens` only feeds a `* 1.0 /` float
    * division), so their HUGEINT promotion cannot reach the hash frame.
    * Plain GROUP-BY `sum(<int>)` outputs were already cast (rule 1).
    * tools/oracle_check.py is now dtype-strict (int-vs-float kinds), so
    * any future violation of rules 1-2 fails locally, not at the
    * driver. */
  private lazy val oracleBase: Map[String, String] = Map(
    "q01_wordcount" ->
      s"""SELECT word, count(*) AS cnt
         |FROM (SELECT unnest(${tok("text")}) AS word FROM documents)
         |GROUP BY word ORDER BY cnt DESC, word""".stripMargin,

    "q02_wordcount_topk" ->
      s"""SELECT word, count(*) AS cnt
         |FROM (SELECT unnest(${tok("text")}) AS word FROM documents)
         |GROUP BY word ORDER BY cnt DESC, word LIMIT 25""".stripMargin,

    "q03_token_encode" ->
      s"""WITH words AS (SELECT DISTINCT word FROM
         |  (SELECT unnest(${tok("text")}) AS word FROM documents))
         |SELECT word, ${tokenId("word")} AS token FROM words ORDER BY word""".stripMargin,

    "q04_flagship_format" ->
      s"""WITH wc AS (
         |  SELECT word, count(*) AS cnt
         |  FROM (SELECT unnest(${tok("text")}) AS word FROM documents) GROUP BY word),
         |t AS (SELECT word, ${tokenId("word")} AS token, cnt FROM wc)
         |SELECT word, token, cnt, word || ',' || token || ',' || cnt AS line
         |FROM t ORDER BY word""".stripMargin,

    "q05_vector_mean" ->
      """SELECT label, pos, round(avg(val), 6) AS avg_val
        |FROM (SELECT CAST(label AS BIGINT) AS label,
        |             CAST(unnest(range(len(embedding))) AS BIGINT) AS pos,
        |             unnest(CAST(embedding AS DOUBLE[])) AS val
        |      FROM embeddings)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "q06_cosine_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) + 0.0 AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
        |ORDER BY id_a""".stripMargin,

    // money sums on the exact 2-dp integer grid (the 100x sweep caught
    // the float-sum order divergence at 60M rows)
    "q10_pricing_summary" ->
      """WITH g AS (SELECT l_returnflag, l_linestatus,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS q2,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p2,
        |    CAST(round((1.0 - l_discount) * 100) AS BIGINT) AS d2
        |  FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'),
        |a AS (SELECT l_returnflag, l_linestatus,
        |    sum(CAST(q2 AS HUGEINT)) AS sq, sum(CAST(p2 AS HUGEINT)) AS sp,
        |    sum(CAST(p2 AS HUGEINT) * CAST(d2 AS HUGEINT)) AS sd,
        |    count(*) AS n_rows
        |  FROM g GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus,
        |  round(CAST(sq AS DOUBLE) / 100.0, 2) AS sum_qty,
        |  round(CAST(sp AS DOUBLE) / 100.0, 2) AS sum_base_price,
        |  round(CAST(sd AS DOUBLE) / 10000.0, 0) AS sum_disc_price,
        |  round(CAST(sq AS DOUBLE) / 100.0 / n_rows, 4) AS avg_qty,
        |  round(CAST(sp AS DOUBLE) / 100.0 / n_rows, 4) AS avg_price,
        |  n_rows
        |FROM a ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q11_join_dims" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |       round(sum(c_acctbal), 2) AS sum_acctbal, round(avg(c_acctbal), 4) AS avg_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q12_top_revenue" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 0) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |              JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'FURNITURE' AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |GROUP BY o_orderkey, o_date ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q13_join_semi" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n_with_orders
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    "q14_join_anti" ->
      """SELECT c_mktsegment, count(*) AS n_quiet, round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 350000.0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q15_window_rank" ->
      """SELECT custkey, top_orderkey, top_price FROM (
        |  SELECT o_custkey AS custkey, o_orderkey AS top_orderkey, o_totalprice AS top_price,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn = 1 ORDER BY custkey""".stripMargin,

    "q16_window_running" ->
      """SELECT o_custkey AS custkey, o_orderkey AS orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |       CAST(row_number() OVER w AS BIGINT) AS rn,
        |       lag(o_totalprice, 1) OVER w AS prev_price,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY custkey, orderkey""".stripMargin,

    "q17_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |       count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name) ORDER BY region, nation""".stripMargin,

    "q18_setops" ->
      """WITH cn AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer),
        |     sn AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
        |SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM cn UNION SELECT nationkey FROM sn) u
        |UNION ALL
        |SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn) i
        |UNION ALL
        |SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn) e
        |ORDER BY op, nationkey""".stripMargin,

    "q19_scalar_fns" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(month(o_orderdate) AS BIGINT) AS o_month,
        |       TRY_CAST(regexp_extract(o_orderpriority, '^(\d+)', 1) AS BIGINT) AS prio_num,
        |       CAST(length(o_orderstatus) AS BIGINT) AS status_len,
        |       upper(substring(o_orderpriority, 3, 20)) AS prio_name,
        |       round(log10(o_totalprice), 4) AS log_price,
        |       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q20_json_events" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       round(sum(value), 2) AS sum_value,
        |       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q21_time_window" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY day, event_type ORDER BY day, event_type""".stripMargin,

    // same window constants as the Spark side (Relational.Q108From/Until)
    "q108_day_bounded_window" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         |FROM events
         |WHERE ts >= TIMESTAMP '${graft.operators.Relational.Q108From}'
         |  AND ts < TIMESTAMP '${graft.operators.Relational.Q108Until}'
         |GROUP BY day, event_type ORDER BY day, event_type""".stripMargin,

    // MG shortlist is an implementation detail: any item above n/32 is
    // provably shortlisted (MisraGries scaladoc), so the declared rows
    // equal this exact groupBy + HAVING
    "q109_heavy_hitters" ->
      s"""WITH w AS (SELECT unnest(${tok("text")}) AS word FROM documents),
         |tot AS (SELECT count(*) AS n FROM w)
         |SELECT word, count(*) AS cnt
         |FROM w CROSS JOIN tot
         |GROUP BY word, tot.n
         |HAVING count(*) * 32 > tot.n
         |ORDER BY cnt DESC, word""".stripMargin,

    // Count-Min: row/width constants interpolated from the operator
    // (HeavyHitters.CmsRows/CmsWidth); cells and probes replay the same
    // ((h*a + b) % P) % width arithmetic, est = min over depth rows
    "q256_cms_freq" -> {
      val width = HeavyHitters.CmsWidth
      def cellRows(src: String, extra: String) = HeavyHitters.CmsRows.map {
        case (r, a, b) =>
          s"SELECT $extra$r AS r, ((h * $a + $b) % 1000000007) % $width AS bkt FROM $src"
      }.mkString(" UNION ALL ")
      s"""WITH w AS (SELECT unnest(${tok("text")}) AS word FROM documents),
         |th AS (SELECT word, ${tokenId("word")} AS h FROM w),
         |cellsrc AS (${cellRows("th", "")}),
         |cells AS (SELECT r, bkt, count(*) AS cnt FROM cellsrc GROUP BY 1, 2),
         |top AS (SELECT word, count(*) AS exact_count, max(h) AS h
         |        FROM th GROUP BY 1 ORDER BY exact_count DESC, word LIMIT 20),
         |probes AS (${cellRows("top", "word, exact_count, ")}),
         |est AS (SELECT p.word, max(p.exact_count) AS exact_count,
         |          min(c.cnt) AS cms_est
         |        FROM probes p JOIN cells c ON c.r = p.r AND c.bkt = p.bkt
         |        GROUP BY 1)
         |SELECT word, CAST(exact_count AS BIGINT) AS exact_count,
         |  CAST(cms_est AS BIGINT) AS cms_est,
         |  CAST(cms_est - exact_count AS BIGINT) AS overestimate,
         |  round(CAST(cms_est - exact_count AS DOUBLE) / exact_count, 6) AS rel_err
         |FROM est ORDER BY exact_count DESC, word""".stripMargin
    },

    // fixed-iteration PageRank unrolled to 10 chained CTEs (recursive
    // CTEs disallow aggregation in the recursive term). Each prK
    // references pr(K-1) exactly ONCE — the node set comes from the
    // constant deg table — so the chain stays linear even if the
    // engine inlines instead of materializing CTEs (a double reference
    // would re-evaluate the whole prefix 2^10 times). The teleport
    // constant is interpolated from ONE Scala computation and the 0.85
    // literal is CAST to DOUBLE so DuckDB never evaluates decimal
    // arithmetic the Spark plan did in binary doubles.
    "q110_textrank" -> {
      val tele = s"CAST(${1.0 - 0.85} AS DOUBLE)"
      val iters = (1 to 10).map { k =>
        s"""pr$k AS (SELECT dg.src AS id, $tele / nv.nv + CAST(0.85 AS DOUBLE) * coalesce(c.contrib, 0.0) AS r
           |  FROM deg dg CROSS JOIN nv
           |  LEFT JOIN (SELECT s.dst AS id, sum(p.r / d2.deg) AS contrib
           |             FROM sym s JOIN pr${k - 1} p ON p.id = s.src JOIN deg d2 ON d2.src = s.src
           |             GROUP BY s.dst) c ON c.id = dg.src)""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT doc_id, ${tok("text")} AS ws FROM documents),
         |pairs AS (SELECT p['w1'] AS w1, p['w2'] AS w2 FROM
         |  (SELECT unnest(list_transform(range(1, len(ws)),
         |     i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
         |   FROM t WHERE len(ws) >= 2)),
         |ed AS (SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
         |       FROM pairs WHERE w1 <> w2),
         |sym0 AS (SELECT a AS src, b AS dst FROM ed UNION SELECT b, a FROM ed),
         |sym AS MATERIALIZED (SELECT src, dst FROM sym0),
         |deg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM sym GROUP BY src),
         |nv AS MATERIALIZED (SELECT count(*) AS nv FROM deg),
         |pr0 AS (SELECT src AS id, CAST(1.0 AS DOUBLE) / nv.nv AS r FROM deg CROSS JOIN nv),
         |$iters
         |SELECT id AS word, round(r, 6) AS rank FROM pr10 ORDER BY rank DESC, word""".stripMargin
    },

    "q111_scd2" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |  CASE WHEN lag(event_type, 1) OVER w IS NULL
        |         OR lag(event_type, 1) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (SELECT user_id, ts, event_type,
        |  CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
        |  FROM m),
        |runs AS (SELECT user_id, version, event_type AS state,
        |           min(ts) AS from_ts, count(*) AS n_events
        |         FROM r GROUP BY user_id, version, event_type),
        |iv AS (SELECT user_id, version, state, from_ts, n_events,
        |         lead(from_ts, 1) OVER (PARTITION BY user_id ORDER BY version) AS to_ts
        |       FROM runs)
        |SELECT user_id, version, state,
        |       strftime(from_ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |       strftime(to_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
        |       n_events,
        |       CAST(CASE WHEN to_ts IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM iv ORDER BY user_id, version""".stripMargin,

    "q112_markov_transitions" ->
      """WITH t AS (SELECT user_id, event_type,
        |  lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |      FROM t WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type)
        |SELECT prev_type, next_type, n,
        |       round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS prob
        |FROM c ORDER BY prev_type, next_type""".stripMargin,

    // weights interpolated from Temporal.EwmaWeights (single source;
    // Double.toString round-trips) — see the q113 scaladoc
    "q113_ewma_anomaly" -> {
      val ls = (1 to 8).map(i => s"lag(x, $i) OVER w AS l$i").mkString(", ")
      val num = operators.Temporal.EwmaWeights.zipWithIndex.map { case (wt, i) =>
        s"CASE WHEN l${i + 1} IS NOT NULL THEN CAST($wt AS DOUBLE) * l${i + 1} ELSE 0.0 END"
      }.mkString(" + ")
      val den = operators.Temporal.EwmaWeights.zipWithIndex.map { case (wt, i) =>
        s"CASE WHEN l${i + 1} IS NOT NULL THEN CAST($wt AS DOUBLE) ELSE 0.0 END"
      }.mkString(" + ")
      s"""WITH daily AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
         |    round(sum(value), 6) AS x
         |  FROM events GROUP BY day, event_type),
         |lagd AS (SELECT day, event_type, x, $ls
         |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         |b AS (SELECT day, event_type, x,
         |        CASE WHEN ($den) > 0 THEN round(($num) / ($den), 6) END AS baseline
         |      FROM lagd),
         |d AS (SELECT day, event_type, x, baseline,
         |        CASE WHEN baseline IS NOT NULL THEN round(x - baseline, 6) + 0.0 END AS dev
         |      FROM b)
         |SELECT day, event_type, x, baseline, dev,
         |       CAST(CASE WHEN baseline IS NULL THEN 0
         |                 WHEN abs(dev) > CAST(0.25 AS DOUBLE) * greatest(baseline, CAST(1.0 AS DOUBLE))
         |                 THEN 1 ELSE 0 END AS BIGINT) AS is_spike
         |FROM d ORDER BY event_type, day""".stripMargin
    },

    "q114_pq_codes" ->
      s"""WITH $pqCodesCte
         |SELECT vec_id, sub, code, dist FROM codes ORDER BY vec_id, sub""".stripMargin,

    "q114b_pq_adc_topk" ->
      s"""WITH $pqCodesCte,
         |qf AS (SELECT vec_id AS q_id, sub, sv AS qsv FROM flat WHERE vec_id < 10),
         |lut AS (SELECT q.q_id, q.sub, cb.code,
         |          round(${sqDistSql("q.qsv", "cb.cv")}, 6) AS d
         |        FROM qf q JOIN cb ON q.sub = cb.sub),
         |adc AS (SELECT l.q_id, c.vec_id AS n_id, round(sum(l.d), 6) AS adc
         |        FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
         |        WHERE c.vec_id <> l.q_id
         |        GROUP BY l.q_id, c.vec_id),
         |rk AS (SELECT q_id, n_id, adc,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS BIGINT) AS rank
         |       FROM adc)
         |SELECT q_id, rank, n_id, adc FROM rk WHERE rank <= 10
         |ORDER BY q_id, rank""".stripMargin,

    "q115_pq_rerank" ->
      s"""WITH $pqCodesCte,
         |qf AS (SELECT vec_id AS q_id, sub, sv AS qsv FROM flat WHERE vec_id < 10),
         |lut AS (SELECT q.q_id, q.sub, cb.code,
         |          round(${sqDistSql("q.qsv", "cb.cv")}, 6) AS d
         |        FROM qf q JOIN cb ON q.sub = cb.sub),
         |adc AS (SELECT l.q_id, c.vec_id AS n_id, round(sum(l.d), 6) AS adc
         |        FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
         |        WHERE c.vec_id <> l.q_id
         |        GROUP BY l.q_id, c.vec_id),
         |short AS (SELECT q_id, n_id, adc FROM (
         |    SELECT q_id, n_id, adc,
         |           row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS adc_rank
         |    FROM adc) WHERE adc_rank <= 50),
         |ex AS (SELECT s.q_id, s.n_id, s.adc,
         |         round(${sqDistSql("eq.v", "en.v")}, 6) AS l2sq
         |       FROM short s JOIN e eq ON eq.vec_id = s.q_id
         |                    JOIN e en ON en.vec_id = s.n_id),
         |rk2 AS (SELECT q_id, n_id, l2sq, adc,
         |          CAST(row_number() OVER (PARTITION BY q_id ORDER BY l2sq, n_id) AS BIGINT) AS rank
         |        FROM ex)
         |SELECT q_id, rank, n_id, l2sq, adc FROM rk2 WHERE rank <= 10
         |ORDER BY q_id, rank""".stripMargin,

    // 3 unrolled Lloyd rounds (the q110 fixed-iteration rule); every
    // aK/cK is MATERIALIZED and references its predecessor once, so the
    // chain stays linear under CTE inlining. Centroid means round to 6
    // per round — the cross-engine sum-order contract.
    "q116_kmeans_fit" -> {
      s"""WITH $kmeansCte,
         |n3 AS (SELECT cluster,
         |         round(sqrt(list_reduce(list_prepend(0.0,
         |           list_transform(cv, x -> x * x)), (acc, xx) -> acc + xx)), 6) AS centroid_norm
         |       FROM $kmeansLast)
         |SELECT af.cluster, count(*) AS n_members,
         |       min(dist) AS min_dist, max(dist) AS max_dist, n3.centroid_norm
         |FROM af JOIN n3 USING (cluster)
         |GROUP BY af.cluster, n3.centroid_norm ORDER BY cluster""".stripMargin
    },

    // IVF probe over the q116 cells: nprobe nearest centroids per
    // query, exact rescore of their members only
    "q119_ivf_search" ->
      s"""WITH $kmeansCte,
         |mem AS (SELECT a.vec_id AS n_id, a.cluster, e.v AS nv
         |        FROM af a JOIN e ON e.vec_id = a.vec_id),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |qc AS (SELECT q_id, qv, cluster FROM (
         |    SELECT q_id, qv, cluster, row_number() OVER
         |      (PARTITION BY q_id ORDER BY cdist, cluster) AS crk
         |    FROM (SELECT q.q_id, q.qv, c.cluster,
         |                 round(${sqDistSql("q.qv", "c.cv")}, 6) AS cdist
         |          FROM q CROSS JOIN $kmeansLast c) s0) t
         |  WHERE crk <= ${operators.KMeans.Nprobe}),
         |ex AS (SELECT qc.q_id, m.n_id,
         |         round(${sqDistSql("qc.qv", "m.nv")}, 6) AS l2sq
         |       FROM mem m JOIN qc USING (cluster) WHERE m.n_id <> qc.q_id),
         |rk AS (SELECT q_id, n_id, l2sq,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY l2sq, n_id) AS BIGINT) AS rank
         |       FROM ex)
         |SELECT q_id, rank, n_id, l2sq FROM rk WHERE rank <= 10
         |ORDER BY q_id, rank""".stripMargin,

    // recall@10 of the q119 IVF pipeline vs exact brute-force ground
    // truth — both ranked lists rebuilt from the shared seeded-Lloyd
    // CTE chain, overlap counted per query
    "q148_ivf_recall" ->
      s"""WITH $kmeansCte,
         |mem AS (SELECT a.vec_id AS n_id, a.cluster, e.v AS nv
         |        FROM af a JOIN e ON e.vec_id = a.vec_id),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |qc AS (SELECT q_id, qv, cluster FROM (
         |    SELECT q_id, qv, cluster, row_number() OVER
         |      (PARTITION BY q_id ORDER BY cdist, cluster) AS crk
         |    FROM (SELECT q.q_id, q.qv, c.cluster,
         |                 round(${sqDistSql("q.qv", "c.cv")}, 6) AS cdist
         |          FROM q CROSS JOIN $kmeansLast c) s0) t
         |  WHERE crk <= ${operators.KMeans.Nprobe}),
         |ivf AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id, row_number() OVER
         |      (PARTITION BY q_id ORDER BY l2sq, n_id) AS rank
         |    FROM (SELECT qc.q_id, m.n_id,
         |                 round(${sqDistSql("qc.qv", "m.nv")}, 6) AS l2sq
         |          FROM mem m JOIN qc USING (cluster)
         |          WHERE m.n_id <> qc.q_id) s1) t WHERE rank <= 10),
         |truth AS (SELECT q_id, n_id FROM (
         |    SELECT q.q_id, e.vec_id AS n_id, row_number() OVER
         |      (PARTITION BY q.q_id ORDER BY
         |         round(${sqDistSql("q.qv", "e.v")}, 6), e.vec_id) AS rank
         |    FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id) t
         |  WHERE rank <= 10)
         |SELECT t.q_id, CAST(count(i.n_id) AS BIGINT) AS n_overlap,
         |       round(count(i.n_id) / 10.0, 4) AS recall_at_10
         |FROM truth t LEFT JOIN ivf i ON i.q_id = t.q_id AND i.n_id = t.n_id
         |GROUP BY t.q_id ORDER BY t.q_id""".stripMargin,

    // JS over the union support via the collapse-under-groupBy union
    // (see the operator scaladoc); ln() one-ulp absorbed by round 6
    "q120_source_divergence" ->
      s"""WITH w AS (SELECT source, unnest(${tok("text")}) AS word FROM documents),
         |wc AS (SELECT source, word, count(*) AS cnt FROM w GROUP BY source, word),
         |wp AS (SELECT source, word,
         |         CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY source) AS DOUBLE) AS p
         |       FROM wc),
         |srcs AS (SELECT DISTINCT source FROM wp),
         |halves AS (
         |  SELECT wp.source AS s1, s2.source AS s2, word, p, 0.0 AS q
         |  FROM wp CROSS JOIN srcs s2 WHERE wp.source < s2.source
         |  UNION ALL
         |  SELECT s1.source AS s1, wp.source AS s2, word, 0.0 AS p, p AS q
         |  FROM wp CROSS JOIN srcs s1 WHERE s1.source < wp.source),
         |merged AS (SELECT s1, s2, word, sum(p) AS p, sum(q) AS q
         |           FROM halves GROUP BY s1, s2, word),
         |terms AS (SELECT s1, s2,
         |    (CASE WHEN p > 0 THEN 0.5 * p * ln(2.0 * p / (p + q)) ELSE 0.0 END)
         |  + (CASE WHEN q > 0 THEN 0.5 * q * ln(2.0 * q / (p + q)) ELSE 0.0 END) AS term
         |  FROM merged)
         |SELECT s1, s2, round(sum(term), 6) AS js_divergence
         |FROM terms GROUP BY s1, s2 ORDER BY s1, s2""".stripMargin,

    "q121_sequence_match" ->
      """WITH p AS (SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS path
        |  FROM events WHERE event_type IS NOT NULL GROUP BY user_id)
        |SELECT user_id, CAST(length(path) AS BIGINT) AS n_events,
        |       CAST(len(regexp_extract_all(path, 'vc*p')) AS BIGINT) AS n_conversions
        |FROM p WHERE len(regexp_extract_all(path, 'vc*p')) > 0
        |ORDER BY user_id""".stripMargin,

    // the exclusive trailing frame makes "nearest preceding touch" one
    // window expression on both engines — no per-purchase history scan
    "q122_attribution" ->
      """WITH t AS (SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT coalesce(touch, 'direct') AS touch_type,
        |       count(*) AS n_purchases,
        |       round(CAST(sum(CAST(round(value * 1000) AS HUGEINT)) AS DOUBLE)
        |         / 1000.0, 6) AS credited_value
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY touch_type""".stripMargin,

    // integer edit distance — no rounding contract; block on the head
    // noun so the candidate join is an equi-join on both engines
    "q123_fuzzy_names" ->
      """WITH names AS (SELECT DISTINCT p_name AS name,
        |    list_extract(string_split(p_name, ' '), -1) AS block FROM part)
        |SELECT a.name AS name1, b.name AS name2,
        |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM names a JOIN names b ON a.block = b.block AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 3
        |ORDER BY name1, name2""".stripMargin,

    "q124_market_basket" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |    FROM lineitem JOIN part ON l_partkey = p_partkey),
        |tot AS (SELECT count(DISTINCT okey) AS n_orders FROM bi),
        |item AS (SELECT brand, count(*) AS cnt FROM bi GROUP BY brand),
        |pairs AS (SELECT a.brand AS b1, b.brand AS b2, count(*) AS n_pair
        |  FROM bi a JOIN bi b ON a.okey = b.okey AND a.brand < b.brand
        |  GROUP BY 1, 2)
        |SELECT b1, b2, n_pair,
        |       round(CAST(n_pair AS DOUBLE) / n_orders, 6) AS support,
        |       round(CAST(n_pair AS DOUBLE) * n_orders / (i1.cnt * i2.cnt), 6) AS lift
        |FROM pairs JOIN item i1 ON b1 = i1.brand JOIN item i2 ON b2 = i2.brand
        |CROSS JOIN tot ORDER BY b1, b2""".stripMargin,

    // frames must be FULL (7 rows) on both sides before a score exists;
    // daily sums and both means round at 6 dp (q113 convention)
    "q126_changepoint" ->
      """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |    round(sum(value), 6) AS x FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, x,
        |    CASE WHEN count(x) OVER lw = 7 THEN round(avg(x) OVER lw, 6) END AS left_mean,
        |    CASE WHEN count(x) OVER rw = 7 THEN round(avg(x) OVER rw, 6) END AS right_mean
        |  FROM d
        |  WINDOW lw AS (PARTITION BY event_type ORDER BY day
        |                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING),
        |         rw AS (PARTITION BY event_type ORDER BY day
        |                ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING))
        |SELECT event_type, day, x, left_mean, right_mean,
        |  CASE WHEN left_mean IS NOT NULL AND right_mean IS NOT NULL
        |       THEN round(right_mean - left_mean, 6) + 0.0 END AS shift,
        |  CAST(CASE WHEN left_mean IS NULL OR right_mean IS NULL THEN 0
        |            WHEN abs(round(right_mean - left_mean, 6)) >
        |                 0.25 * greatest(abs(left_mean), 1.0) THEN 1
        |            ELSE 0 END AS BIGINT) AS is_change
        |FROM w ORDER BY event_type, day""".stripMargin,

    // integer micros end to end (the q102 idiom); percentile inputs
    // round to 6 dp so quantile_cont interpolates identical doubles
    "q127_conversion_latency" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |fv AS (SELECT user_id, min(us) AS fv FROM ev
        |       WHERE event_type = 'view' GROUP BY user_id),
        |fp AS (SELECT ev.user_id, fv, min(us) AS fp FROM ev JOIN fv USING (user_id)
        |       WHERE event_type = 'purchase' AND us > fv GROUP BY ev.user_id, fv),
        |d AS (SELECT round((fp - fv) / 1000000.0, 6) AS delta_s FROM fp)
        |SELECT count(*) AS n_users,
        |       round(quantile_cont(delta_s, 0.25), 4) + 0.0 AS p25_s,
        |       round(quantile_cont(delta_s, 0.5), 4) + 0.0 AS median_s,
        |       round(quantile_cont(delta_s, 0.9), 4) + 0.0 AS p90_s
        |FROM d ORDER BY n_users""".stripMargin,

    // three unrolled sync rounds, each referencing its predecessor
    // once (the q110/q116 inlining rule); top-1 vote via row_number
    // with the (votes DESC, label ASC) deterministic tie order
    "q128_label_prop" -> {
      val rounds = (1 to 3).map { k =>
        s"""l$k AS MATERIALIZED (SELECT node, label FROM (
           |  SELECT s.src AS node, l.label, count(*) AS votes,
           |         row_number() OVER (PARTITION BY s.src
           |                            ORDER BY count(*) DESC, l.label) AS rn
           |  FROM sym s JOIN l${k - 1} l ON l.node = s.dst
           |  GROUP BY s.src, l.label)
           |WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT doc_id, ${tok("text")} AS ws FROM documents),
         |pairs AS (SELECT p['w1'] AS w1, p['w2'] AS w2 FROM
         |  (SELECT unnest(list_transform(range(1, len(ws)),
         |     i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
         |   FROM t WHERE len(ws) >= 2)),
         |ed AS (SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
         |       FROM pairs WHERE w1 <> w2),
         |sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM ed
         |                     UNION SELECT b, a FROM ed),
         |l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
         |$rounds
         |SELECT node AS word, label FROM l3 ORDER BY word""".stripMargin
    },

    // equi-join on user + range residual; intervals from NON-purchase
    // events only (q111's machinery on raw micros)
    "q129_interval_lookup" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |    FROM events WHERE event_type IS NOT NULL),
        |np AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |         OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM ev WHERE event_type <> 'purchase'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |v AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version FROM np),
        |iv AS (SELECT user_id, version, event_type AS state, min(us) AS from_us
        |       FROM v GROUP BY user_id, version, event_type),
        |iv2 AS (SELECT *, lead(from_us) OVER (PARTITION BY user_id ORDER BY version)
        |          AS to_us FROM iv),
        |p AS (SELECT user_id, event_id, epoch_us(ts) AS p_us, value FROM events
        |      WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, iv2.state, iv2.version,
        |       round(p.value, 6) AS value
        |FROM p JOIN iv2 ON p.user_id = iv2.user_id
        |  AND iv2.from_us <= p.p_us AND (iv2.to_us IS NULL OR p.p_us < iv2.to_us)
        |ORDER BY event_id""".stripMargin,

    // the oracle builds the revision DIRECTLY — the engine path goes
    // delta → change feed → MERGE; merge(old, delta(old→rev)) ≡ rev,
    // so the two independent computations must hash identically
    "q131_merge_upsert" ->
      """WITH rev AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000000000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0)
        |SELECT doc_id, md5(text) AS h, CAST(length(text) AS BIGINT) AS n_chars
        |FROM rev ORDER BY doc_id""".stripMargin,

    "q132_ppr" -> {
      val tele = s"CAST(${1.0 - 0.85} AS DOUBLE)"
      val iters = (1 to 10).map { k =>
        s"""pr$k AS (SELECT dg.src AS id,
           |    $tele * (CASE WHEN dg.src = (SELECT id FROM seed) THEN 1.0 ELSE 0.0 END)
           |  + CAST(0.85 AS DOUBLE) * coalesce(c.contrib, 0.0) AS r
           |  FROM deg dg
           |  LEFT JOIN (SELECT s.dst AS id, sum(p.r / d2.deg) AS contrib
           |             FROM sym s JOIN pr${k - 1} p ON p.id = s.src JOIN deg d2 ON d2.src = s.src
           |             GROUP BY s.dst) c ON c.id = dg.src)""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT doc_id, ${tok("text")} AS ws FROM documents),
         |pairs AS (SELECT p['w1'] AS w1, p['w2'] AS w2 FROM
         |  (SELECT unnest(list_transform(range(1, len(ws)),
         |     i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
         |   FROM t WHERE len(ws) >= 2)),
         |ed AS (SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
         |       FROM pairs WHERE w1 <> w2),
         |sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM ed
         |                     UNION SELECT b, a FROM ed),
         |deg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM sym GROUP BY src),
         |seed AS MATERIALIZED (SELECT min(src) AS id FROM sym),
         |pr0 AS (SELECT src AS id,
         |    CASE WHEN src = (SELECT id FROM seed) THEN 1.0 ELSE 0.0 END AS r FROM deg),
         |$iters
         |SELECT id AS word, round(r, 6) AS rank FROM pr10 ORDER BY rank DESC, word""".stripMargin
    },

    // unrolled Bellman-Ford (the q110/q132 fixed-iteration rule);
    // distances round at 6 dp per relaxation so both engines add
    // identical doubles round over round
    "q147_shortest_paths" -> {
      val rounds = (1 to 8).map { k =>
        s"""d$k AS (SELECT id, min(d) AS d FROM (
           |    SELECT id, d FROM d${k - 1}
           |    UNION ALL
           |    SELECT e.dst AS id, round(p.d + e.w, 6) AS d
           |    FROM d${k - 1} p JOIN wed e ON e.src = p.id) GROUP BY id)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT doc_id, ${tok("text")} AS ws FROM documents),
         |pairs AS (SELECT p['w1'] AS w1, p['w2'] AS w2 FROM
         |  (SELECT unnest(list_transform(range(1, len(ws)),
         |     i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
         |   FROM t WHERE len(ws) >= 2)),
         |pc AS (SELECT least(w1, w2) AS a, greatest(w1, w2) AS b,
         |    CAST(count(*) AS DOUBLE) AS cnt FROM pairs WHERE w1 <> w2
         |    GROUP BY 1, 2),
         |tot AS (SELECT sum(cnt) AS n FROM pc),
         |wed AS MATERIALIZED (
         |  SELECT a AS src, b AS dst, round(ln(1 + n / cnt), 6) AS w
         |  FROM pc CROSS JOIN tot
         |  UNION ALL
         |  SELECT b, a, round(ln(1 + n / cnt), 6) FROM pc CROSS JOIN tot),
         |seed AS (SELECT least(min(src), min(dst)) AS id FROM wed),
         |d0 AS (SELECT id, 0.0 AS d FROM seed),
         |$rounds
         |SELECT id AS word, round(d, 6) AS dist FROM d8
         |ORDER BY dist, word""".stripMargin
    },

    "q133_top_paths" ->
      """WITH p AS (SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS path
        |  FROM events WHERE event_type IS NOT NULL GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    // expected counts from the SAME integer cell table on both engines;
    // the term sum reassociates under the 6-dp grain (q120 precedent)
    "q134_chi_square" ->
      """WITH c AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS n
        |    FROM documents GROUP BY 1, 2),
        |tot AS (SELECT sum(n) AS t FROM c),
        |r AS (SELECT lang, sum(n) AS rn FROM c GROUP BY 1),
        |s AS (SELECT source, sum(n) AS sn FROM c GROUP BY 1)
        |SELECT round(sum((n - rn*sn/t) * (n - rn*sn/t) / (rn*sn/t)), 6) AS chi2,
        |       count(*) AS n_cells
        |FROM c JOIN r USING (lang) JOIN s USING (source) CROSS JOIN tot
        |ORDER BY chi2""".stripMargin,

    // 4 dp: co-moment summation order differs across engines at the
    // last ulp (the q52 moment contract)
    "q135_corr_matrix" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for (i <- cols.indices; j <- i + 1 until cols.length)
        yield (cols(i), cols(j))
      pairs.map { case (a, b) =>
        s"SELECT '$a' AS c1, '$b' AS c2, round(corr($a, $b), 4) + 0.0 AS r FROM lineitem"
      }.mkString("", "\nUNION ALL\n", "\nORDER BY c1, c2")
    },

    "q136_mad_outliers" ->
      """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |    round(sum(value), 6) AS x FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, round(quantile_cont(x, 0.5), 6) AS med
        |      FROM d GROUP BY 1),
        |a AS (SELECT d.event_type, round(quantile_cont(abs(x - med), 0.5), 6) AS mad
        |      FROM d JOIN m USING (event_type) GROUP BY 1)
        |SELECT d.event_type, day, x, med, mad,
        |       round(abs(x - med), 6) AS dev,
        |       CAST(CASE WHEN mad > 0 AND round(abs(x - med), 6) > 3.0 * mad
        |            THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        |FROM d JOIN m USING (event_type) JOIN a USING (event_type)
        |ORDER BY event_type, day""".stripMargin,

    // 4 dp on derived stats: the q52/q135 moment contract
    "q137_welch_ttest" ->
      """WITH g AS (SELECT event_type, CAST(count(value) AS DOUBLE) AS n,
        |    avg(value) AS m, var_samp(value) AS s2 FROM events
        |    WHERE event_type IN ('purchase', 'view') GROUP BY 1),
        |a AS (SELECT n AS n1, m AS m1, s2 AS v1 FROM g WHERE event_type = 'purchase'),
        |b AS (SELECT n AS n2, m AS m2, s2 AS v2 FROM g WHERE event_type = 'view')
        |SELECT CAST(n1 AS BIGINT) AS n_purchase, CAST(n2 AS BIGINT) AS n_view,
        |       round(m1, 4) AS mean_purchase, round(m2, 4) AS mean_view,
        |       round((m1 - m2) / sqrt(v1/n1 + v2/n2), 4) + 0.0 AS t_stat,
        |       round((v1/n1 + v2/n2) * (v1/n1 + v2/n2) /
        |             (v1*v1/(n1*n1*(n1-1)) + v2*v2/(n2*n2*(n2-1))), 4) AS welch_df
        |FROM a CROSS JOIN b ORDER BY n_purchase""".stripMargin,

    "q138_skew_report" -> {
      def one(rel: String, key: String): String =
        s"""SELECT '$rel' AS relation, '$key' AS key,
           |       CAST(sum(c) AS BIGINT) AS n_rows,
           |       CAST(count(*) AS BIGINT) AS n_keys,
           |       round((SELECT max(c) FROM (SELECT c FROM h ORDER BY c DESC, k LIMIT 10)) / sum(c), 6) AS top1_share,
           |       round((SELECT sum(c) FROM (SELECT c FROM h ORDER BY c DESC, k LIMIT 10)) / sum(c), 6) AS top10_share,
           |       CASE WHEN count(*) > 1
           |            THEN round((ln(sum(c)) - sum(c * ln(c)) / sum(c)) / ln(count(*)), 6)
           |            ELSE 0.0 END AS entropy_norm
           |FROM h"""
          .stripMargin
          .replace("FROM h", s"FROM (SELECT CAST($key AS VARCHAR) AS k, CAST(count(*) AS DOUBLE) AS c FROM $rel GROUP BY 1) h")
      Seq(one("events", "user_id"), one("events", "event_type"),
        one("lineitem", "l_suppkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY relation, key")
    },

    "q139_ndcg_eval" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |           CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |lc AS (SELECT label, count(*) - 1 AS n_rel FROM e GROUP BY 1),
        |sims AS (SELECT q.vec_id AS q_id, q.label AS true_label,
        |    CASE WHEN c.label = q.label THEN 1.0 ELSE 0.0 END AS rel, c.vec_id,
        |    round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
        |  FROM e c CROSS JOIN (SELECT * FROM e WHERE vec_id < 50) q
        |  WHERE c.vec_id <> q.vec_id),
        |top AS (SELECT *, row_number() OVER
        |    (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rk FROM sims),
        |d AS (SELECT q_id, true_label,
        |    sum(rel / log2(rk + 1)) AS dcg, CAST(sum(rel) AS BIGINT) AS n_hits
        |  FROM top WHERE rk <= 10 GROUP BY 1, 2),
        |s AS (SELECT unnest(generate_series(1, 10)) AS i),
        |i AS (SELECT d.q_id, sum(1.0 / log2(s.i + 1)) AS idcg
        |  FROM d JOIN lc ON lc.label = d.true_label
        |  JOIN s ON s.i <= least(lc.n_rel, 10)
        |  GROUP BY 1)
        |SELECT d.q_id AS vec_id, d.true_label, d.n_hits,
        |       round(d.dcg, 6) AS dcg, round(i.idcg, 6) AS idcg,
        |       round(d.dcg / i.idcg, 6) AS ndcg
        |FROM d JOIN i ON i.q_id = d.q_id
        |ORDER BY vec_id""".stripMargin,

    "q143_block_jackknife" ->
      """WITH cells AS (SELECT event_type, event_id % 32 AS block,
        |    sum(value) AS s, CAST(count(value) AS DOUBLE) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT event_type, sum(s) AS ts, sum(c) AS tc,
        |    count(*) AS n_blocks FROM cells GROUP BY 1),
        |loo AS (SELECT cells.event_type, n_blocks,
        |    (ts - s) / (tc - c) AS loo_mean
        |  FROM cells JOIN tot USING (event_type)),
        |v AS (SELECT event_type, first(n_blocks) AS k_blocks,
        |    var_pop(loo_mean) AS loo_var FROM loo GROUP BY 1)
        |SELECT v.event_type, k_blocks, round(ts / tc, 4) AS mean_value,
        |       round(sqrt((k_blocks - 1) * loo_var), 4) AS jackknife_se
        |FROM v JOIN tot USING (event_type)
        |WHERE k_blocks >= 2 ORDER BY event_type""".stripMargin,

    "q144_quality_trend" ->
      """WITH daily AS (SELECT source, CAST(doc_id // 20 AS BIGINT) AS day,
        |    round(avg(CAST(n_chars AS DOUBLE) /
        |              greatest(len(string_split(text, ' ')), 1)), 6) AS q
        |  FROM documents WHERE text IS NOT NULL AND length(text) > 0
        |  GROUP BY 1, 2)
        |SELECT source, count(*) AS n_days,
        |       round(regr_slope(q, day), 6) + 0.0 AS slope,
        |       round(regr_r2(q, day), 4) AS r2,
        |       round(avg(q), 6) AS mean_q
        |FROM daily GROUP BY source HAVING count(*) >= 2
        |ORDER BY source""".stripMargin,

    "q141_hard_negatives" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |           CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sims AS (SELECT q.vec_id AS q_id, q.label AS true_label,
        |    c.vec_id AS neg_id, c.label AS neg_label,
        |    round(list_cosine_similarity(q.v, c.v), 6) + 0.0 AS cos_sim
        |  FROM e c CROSS JOIN (SELECT * FROM e WHERE vec_id < 50) q
        |  WHERE c.vec_id <> q.vec_id AND c.label <> q.label),
        |ranked AS (SELECT *, CAST(row_number() OVER
        |    (PARTITION BY q_id ORDER BY cos_sim DESC, neg_id ASC) AS BIGINT) AS rk
        |  FROM sims)
        |SELECT q_id, true_label, neg_id, neg_label, cos_sim, rk
        |FROM ranked WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,

    // the constant 0..63 start series covers docs to ~9.6k chars (the
    // corpus maxes at 577); DuckDB 1.0 lacks lateral generate_series,
    // so the series is unconditioned and the ON-clause bounds it
    // the series bound is derived from the corpus (max n_chars), so a
    // longer future fixture grows the oracle's chunk list instead of
    // silently truncating it against the unbounded Spark generator
    "q142_chunk_overlap" ->
      """WITH s AS (SELECT unnest(generate_series(0,
        |      (SELECT CAST(greatest(max(n_chars) // 150, 0) AS INT) FROM documents))) AS i),
        |ch AS (SELECT d.doc_id, s.i + 1 AS chunk_idx,
        |    1 + s.i * 150 AS chunk_start,
        |    substring(d.text, 1 + s.i * 150, 200) AS c
        |  FROM documents d JOIN s ON 1 + s.i * 150 <= greatest(d.n_chars, 1))
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |       CAST(chunk_start AS BIGINT) AS chunk_start,
        |       CAST(length(c) AS BIGINT) AS chunk_len,
        |       md5(c) AS chunk_md5
        |FROM ch WHERE length(c) > 0
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    // q145: the Viterbi DP unrolled position-by-position (the q128/q132
    // fixed-iteration precedent): best(word, j) = max_i best(i) +
    // logp(word[i..j)) over i in [j-6, j-1], ties to the SMALLEST i
    // (= longest last piece, the Unigram.viterbi tie rule), then an
    // unrolled backtrace rebuilds the piece string front-to-back. The
    // vocab VALUES block is generated from the SAME frozen constants
    // the engine encodes with (Unigram.pretrainedPieces) — CAST AS
    // DOUBLE so DuckDB's exact-decimal literals don't change the
    // arithmetic (decimal→double conversion is correctly rounded, so
    // it equals the JVM's parse of the same 6-dp literal, and the DP
    // then adds the same doubles in the same order). Unroll bound: 12
    // positions ≥ the corpus max word length (UnigramSpec pins ≤ 12 so
    // a longer future fixture fails loudly instead of hash-diverging).
    "q145_unigram_encode" -> {
      val unrollLen = 12
      val vocabRows = graft.operators.Unigram.pretrainedPieces
        .map { case (p, lp) => s"('$p', CAST($lp AS DOUBLE))" }
        .mkString(",\n    ")
      val steps = (1 to unrollLen).map { j =>
        s"""s$j AS (SELECT word, j, score, back FROM (
           |    SELECT e.word, e.j, b.score + e.lp AS score, e.i AS back,
           |           row_number() OVER (PARTITION BY e.word
           |                              ORDER BY b.score + e.lp DESC, e.i ASC) AS rn
           |    FROM edge e JOIN b${j - 1} b ON b.word = e.word AND b.j = e.i
           |    WHERE e.j = $j) WHERE rn = 1),
           |b$j AS MATERIALIZED (SELECT * FROM b${j - 1} UNION ALL SELECT * FROM s$j)""".stripMargin
      }.mkString(",\n")
      val walks = (1 to unrollLen).map { k =>
        // NB: no line here may START with '|' after this stripMargin —
        // the outer template's stripMargin would strip it again
        s"""r$k AS MATERIALIZED (
           |  SELECT r.word, b.back AS j, r.score,
           |         substring(r.word, b.back + 1, r.j - b.back) ||
           |           CASE WHEN r.pieces = '' THEN '' ELSE ' ' END || r.pieces AS pieces,
           |         r.np + 1 AS np
           |  FROM r${k - 1} r JOIN b$unrollLen b ON b.word = r.word AND b.j = r.j
           |  WHERE r.j > 0
           |  UNION ALL
           |  SELECT word, j, score, pieces, np FROM r${k - 1} WHERE j = 0)""".stripMargin
      }.mkString(",\n")
      s"""WITH words AS MATERIALIZED (SELECT DISTINCT w AS word FROM
         |    (SELECT unnest(${tok("text")}) AS w FROM documents)),
         |vocab AS (SELECT * FROM (VALUES
         |    $vocabRows) v(piece, logp)),
         |edge AS MATERIALIZED (SELECT w.word, i.i, i.i + k.k AS j,
         |    coalesce(v.logp, CAST(-1e9 AS DOUBLE)) AS lp
         |  FROM words w
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${unrollLen - 1})) AS i) i
         |  CROSS JOIN (SELECT unnest(generate_series(1, 6)) AS k) k
         |  LEFT JOIN vocab v ON v.piece = substring(w.word, i.i + 1, k.k)
         |  WHERE i.i + k.k <= length(w.word)
         |    AND (v.logp IS NOT NULL OR k.k = 1)),
         |b0 AS (SELECT word, 0 AS j, CAST(0.0 AS DOUBLE) AS score,
         |       CAST(NULL AS INT) AS back FROM words),
         |$steps,
         |r0 AS (SELECT b.word, b.j, b.score, '' AS pieces, 0 AS np
         |       FROM b$unrollLen b JOIN words w
         |         ON w.word = b.word AND b.j = length(w.word)),
         |$walks
         |SELECT word, pieces, CAST(np AS BIGINT) AS n_pieces,
         |       round(score, 4) AS score
         |FROM r$unrollLen WHERE j = 0 ORDER BY word""".stripMargin
    },

    // truncated-dim cosine via list slices; truth = the width-64 rank
    "q152_mrl_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
        |wd AS (SELECT unnest([8, 16, 32, 64]) AS width),
        |sims AS (SELECT w.width, q.q_id, c.vec_id,
        |    round(list_cosine_similarity(q.qv[1:w.width], c.v[1:w.width]), 6) AS cos_sim
        |  FROM e c CROSS JOIN q CROSS JOIN wd w
        |  WHERE c.vec_id <> q.q_id),
        |top AS (SELECT width, q_id, vec_id, row_number() OVER
        |    (PARTITION BY width, q_id ORDER BY cos_sim DESC, vec_id ASC) AS rk
        |  FROM sims),
        |t10 AS MATERIALIZED (SELECT width, q_id, vec_id FROM top WHERE rk <= 10),
        |truth AS (SELECT q_id, vec_id FROM t10 WHERE width = 64)
        |SELECT CAST(c.width AS BIGINT) AS width, c.q_id AS vec_id,
        |       CAST(count(t.vec_id) AS BIGINT) AS n_overlap,
        |       round(count(t.vec_id) / 10.0, 4) AS recall
        |FROM (SELECT * FROM t10 WHERE width <> 64) c
        |LEFT JOIN truth t ON t.q_id = c.q_id AND t.vec_id = c.vec_id
        |GROUP BY c.width, c.q_id ORDER BY width, vec_id""".stripMargin,

    // derived randomness: hash -> uniform -> Poisson(1) CDF inversion,
    // identical integer/threshold arithmetic to the Spark plan
    "q153_poisson_bootstrap" ->
      """WITH base AS (SELECT event_type, event_id, value FROM events
        |      WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT unnest(generate_series(1, 200)) AS rep),
        |w AS (SELECT b.event_type, b.value, r.rep,
        |    CAST(((((b.event_id % 1000000007) * 1000003 % 1000000007
        |        + r.rep * 7919) % 1000000007)
        |      * 69069 % 1000000007) * 1000003 % 1000000007
        |      AS DOUBLE) / 1000000007.0 AS u
        |  FROM base b CROSS JOIN r),
        |k AS (SELECT event_type, rep, value,
        |    CASE WHEN u < 0.367879441171 THEN 0 WHEN u < 0.735758882343 THEN 1
        |         WHEN u < 0.919698602929 THEN 2 WHEN u < 0.981011843124 THEN 3
        |         WHEN u < 0.996340153173 THEN 4 WHEN u < 0.999405815182 THEN 5
        |         WHEN u < 0.999916758851 THEN 6 ELSE 7 END AS wt
        |  FROM w),
        |cells AS (SELECT event_type, rep, sum(wt * value) AS swv, sum(wt) AS sw,
        |       sum(value) AS sv, count(value) AS cnt FROM k GROUP BY 1, 2),
        |rm AS (SELECT event_type, sv, cnt,
        |       CASE WHEN sw > 0 THEN round(swv / sw, 6) END AS rep_mean FROM cells)
        |SELECT event_type, CAST(count(rep_mean) AS BIGINT) AS n_reps,
        |       round(sum(sv) / sum(cnt), 4) AS mean_value,
        |       round(stddev_samp(rep_mean), 4) AS boot_se,
        |       round(quantile_cont(rep_mean, 0.025), 4) AS ci_lo,
        |       round(quantile_cont(rep_mean, 0.975), 4) AS ci_hi
        |FROM rm GROUP BY event_type ORDER BY event_type""".stripMargin,

    // bigram histogram once; marginals re-aggregate it (q128's pair idiom)
    "q154_pmi_collocations" ->
      s"""WITH t AS (SELECT doc_id, ${tok("text")} AS ws FROM documents),
         |pairs AS (SELECT unnest(list_transform(range(1, len(ws)),
         |    i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
         |  FROM t WHERE len(ws) >= 2),
         |bi AS MATERIALIZED (SELECT p['w1'] AS w1, p['w2'] AS w2, count(*) AS c12
         |  FROM pairs GROUP BY 1, 2),
         |l AS (SELECT w1, sum(c12) AS c1 FROM bi GROUP BY 1),
         |r AS (SELECT w2, sum(c12) AS c2 FROM bi GROUP BY 1),
         |n AS (SELECT sum(c12) AS n_pairs FROM bi)
         |SELECT bi.w1, bi.w2, bi.c12 AS n,
         |       round(ln(CAST(bi.c12 AS DOUBLE) * CAST(n_pairs AS DOUBLE)
         |         / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))), 6) + 0.0 AS pmi
         |FROM bi JOIN l ON l.w1 = bi.w1 JOIN r ON r.w2 = bi.w2 CROSS JOIN n
         |WHERE bi.c12 >= 5
         |ORDER BY pmi DESC, bi.w1, bi.w2 LIMIT 20""".stripMargin,

    // complement moments from totals minus the type's own sums; p via
    // the A&S 7.1.26 erfc polynomial on the 4-dp t (identical literals
    // and association to the Spark plan); BH = reversed running min.
    // Moments accumulate on the EXACT 1e-3 integer grid (the
    // q161/q163 fixed-point rule) — HUGEINT sums here, decimal(38,0)
    // in Spark — so both engines derive identical doubles; float
    // Σvalue was accumulation-order-sensitive (the round-7 hash fail).
    // t_stat gets `+ 0.0` (type rule 6): the `error` group's unrounded
    // t is ≈ −3e−5, and DuckDB's round() on DOUBLE preserves the IEEE
    // sign (−0.0) while Spark's round() goes through BigDecimal (+0.0)
    // — values equal, hash bits differ (the round-8 single-bit fail)
    "q155_ab_fdr" ->
      """WITH e AS (SELECT event_type,
        |      CAST(round(value * 1000) AS BIGINT) AS v3
        |    FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |s AS (SELECT event_type, count(v3) AS cnt, sum(v3) AS s3,
        |      sum(v3 * v3) AS ss6 FROM e GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS tcnt, sum(s3) AS ts3, sum(ss6) AS tss6,
        |        count(*) AS m FROM s),
        |d AS (SELECT s.event_type, tot.m,
        |        CAST(cnt AS DOUBLE) AS n,
        |        CAST(s3 AS DOUBLE) / 1000.0 AS sv,
        |        CAST(ss6 AS DOUBLE) / 1000000.0 AS ss,
        |        CAST(tcnt AS DOUBLE) AS tn,
        |        CAST(ts3 AS DOUBLE) / 1000.0 AS ts,
        |        CAST(tss6 AS DOUBLE) / 1000000.0 AS tss
        |      FROM s CROSS JOIN tot),
        |j AS (SELECT event_type, n, m,
        |        sv / n AS m1,
        |        (ss - sv * sv / n) / (n - 1) AS v1,
        |        tn - n AS n2,
        |        (ts - sv) / (tn - n) AS m2,
        |        (tss - ss) - (ts - sv) * (ts - sv) / (tn - n) AS ss2c
        |      FROM d),
        |tt AS (SELECT event_type, CAST(n AS BIGINT) AS n_values, m,
        |         round((m1 - m2) / sqrt(v1 / n + ss2c / (n2 - 1) / n2), 4) + 0.0 AS t_stat
        |       FROM j),
        |xx AS (SELECT *, abs(t_stat) / sqrt(2.0) AS x,
        |         1.0 / (1.0 + 0.3275911 * (abs(t_stat) / sqrt(2.0))) AS kk FROM tt),
        |pp AS (SELECT *, round((((((1.061405429 * kk - 1.453152027) * kk)
        |         + 1.421413741) * kk - 0.284496736) * kk + 0.254829592) * kk
        |         * exp(-(x * x)), 6) AS p_value FROM xx),
        |rnk AS (SELECT *, row_number() OVER (ORDER BY p_value ASC, event_type ASC) AS rk
        |        FROM pp),
        |bh AS (SELECT *, round(least(min(p_value * m / rk) OVER
        |          (ORDER BY p_value ASC, event_type ASC
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 1.0), 6) AS p_bh
        |       FROM rnk)
        |SELECT event_type, n_values, t_stat, p_value, p_bh,
        |       CASE WHEN p_bh <= 0.05 THEN CAST(1 AS BIGINT)
        |            ELSE CAST(0 AS BIGINT) END AS significant
        |FROM bh ORDER BY event_type""".stripMargin,

    // dense calendar from each type's span; zero-fill + 7-day trail
    "q156_gap_fill" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |      round(sum(value), 6) AS x
        |    FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    GROUP BY 1, 2),
        |span AS (SELECT event_type, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1),
        |dense AS (SELECT event_type,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM span),
        |f AS (SELECT de.event_type, de.d, coalesce(da.x, 0.0) AS x,
        |        CASE WHEN da.x IS NULL THEN 1 ELSE 0 END AS filled
        |      FROM dense de LEFT JOIN daily da
        |        ON da.event_type = de.event_type AND da.d = de.d)
        |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, x,
        |       CAST(filled AS BIGINT) AS is_filled,
        |       round(avg(x) OVER (PARTITION BY event_type ORDER BY d
        |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS trail7
        |FROM f ORDER BY event_type, day""".stripMargin,

    // session_window's boundary rule, pinned by the q162 exact-gap
    // fixture: an event AT a session's exclusive end MERGES into it
    // (interval overlap at equality), so new-session is strict > on
    // raw micros — the same rule as q25
    "q157_session_window" ->
      """WITH ev AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us, value
        |    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |m AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |        OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |      FROM m)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        |       count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    // sweep line over q157's sessions: +1/-1 day-partitioned boundaries,
    // exact integer running sums (ends before starts at ties); day_max
    // CAST AS BIGINT against the HUGEINT window-sum promotion (q63 rule).
    // q162b (the hour-sharded physical form) is the SAME logical query
    // — it shares this oracle verbatim (assigned below the map).
    "q162_session_concurrency" ->
      """WITH ev AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us
        |    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |m AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |        OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM m),
        |sess AS (SELECT user_id, min(us) AS s_us, max(us) + 1800000000 AS e_us
        |         FROM s GROUP BY user_id, sid),
        |dys AS (SELECT user_id, s_us, e_us,
        |    CAST(unnest(generate_series(CAST(make_timestamp(s_us) AS DATE),
        |      CAST(make_timestamp(e_us - 1) AS DATE), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM sess),
        |segs AS (SELECT user_id, day,
        |    greatest(s_us, epoch_us(CAST(day AS TIMESTAMP))) AS seg_s,
        |    least(e_us, epoch_us(CAST(day AS TIMESTAMP)) + 86400000000) AS seg_e
        |  FROM dys
        |  WHERE greatest(s_us, epoch_us(CAST(day AS TIMESTAMP)))
        |      < least(e_us, epoch_us(CAST(day AS TIMESTAMP)) + 86400000000)),
        |b AS (SELECT day, seg_s AS us, 1 AS delta, 1 AS typ, user_id FROM segs
        |      UNION ALL
        |      SELECT day, seg_e AS us, -1 AS delta, 0 AS typ, user_id FROM segs),
        |r AS (SELECT day, us, typ,
        |        sum(delta) OVER (PARTITION BY day ORDER BY us, typ, user_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |      FROM b),
        |mx AS (SELECT day, max(run) AS day_max FROM r GROUP BY day)
        |SELECT strftime(r.day, '%Y-%m-%d') AS day,
        |       CAST(count(*) FILTER (WHERE typ = 1) AS BIGINT) AS n_sessions,
        |       CAST(mx.day_max AS BIGINT) AS max_concurrent,
        |       strftime(make_timestamp(min(us) FILTER (WHERE run = day_max)),
        |         '%Y-%m-%d %H:%M:%S') AS peak_at
        |FROM r JOIN mx USING (day)
        |GROUP BY r.day, mx.day_max ORDER BY day""".stripMargin,

    // V_i/N_i as grid count-if columns over the token stream and the
    // first-occurrence frame; integer checkpoint thresholds; log-log
    // regr fit rounded 4 (the q144 regr_slope precedent)
    "q165_heaps_curve" -> {
      val g = operators.TextAnalysis.HeapsGrid
      def th(i: Int) = s"d0 + ((d1 - d0) * $i) // $g"
      val nCols = (1 to g).map(i =>
        s"sum(CASE WHEN doc_id <= ${th(i)} THEN 1 ELSE 0 END) AS n$i").mkString(",\n|        ")
      val vCols = (1 to g).map(i =>
        s"sum(CASE WHEN fdoc <= ${th(i)} THEN 1 ELSE 0 END) AS v$i").mkString(",\n|        ")
      val nArr = (1 to g).map(i => s"n$i").mkString("[", ", ", "]")
      val vArr = (1 to g).map(i => s"v$i").mkString("[", ", ", "]")
      s"""WITH d AS (SELECT source, doc_id, ${tok("text")} AS ws FROM documents
         |    WHERE text IS NOT NULL AND source IS NOT NULL AND doc_id IS NOT NULL),
         |tk AS (SELECT source, doc_id, unnest(ws) AS word FROM d),
         |span AS (SELECT source, min(doc_id) AS d0, max(doc_id) AS d1
         |         FROM d GROUP BY 1),
         |n AS (SELECT tk.source,
         |        $nCols
         |      FROM tk JOIN span USING (source) GROUP BY 1),
         |f AS (SELECT source, word, min(doc_id) AS fdoc FROM tk GROUP BY 1, 2),
         |v AS (SELECT f.source,
         |        $vCols
         |      FROM f JOIN span USING (source) GROUP BY 1),
         |pts AS (SELECT source, i, nn, vv FROM (
         |    SELECT n.source, unnest(generate_series(1, $g)) AS i,
         |           unnest($nArr) AS nn, unnest($vArr) AS vv
         |    FROM n JOIN v USING (source)) t WHERE nn > 0 AND vv > 0),
         |fit AS (SELECT source, count(*) AS n_points,
         |          round(regr_slope(ln(vv), ln(nn)), 4) AS heaps_beta,
         |          round(regr_r2(ln(vv), ln(nn)), 4) AS fit_r2
         |        FROM pts GROUP BY 1),
         |tl AS (SELECT source,
         |         max(CASE WHEN i = $g THEN vv END)
         |           - max(CASE WHEN i = ${g - 1} THEN vv END) AS dv,
         |         max(CASE WHEN i = $g THEN nn END)
         |           - max(CASE WHEN i = ${g - 1} THEN nn END) AS dn,
         |         max(CASE WHEN i = $g THEN nn END) AS n_tokens,
         |         max(CASE WHEN i = $g THEN vv END) AS v_words
         |       FROM pts WHERE i >= ${g - 1} GROUP BY 1)
         |SELECT fit.source, CAST(n_points AS BIGINT) AS n_points,
         |       CAST(n_tokens AS BIGINT) AS n_tokens,
         |       CAST(v_words AS BIGINT) AS v_words, heaps_beta, fit_r2,
         |       CASE WHEN dn > 0 THEN round(CAST(dv AS DOUBLE) / CAST(dn AS DOUBLE), 6)
         |       END AS tail_novelty
         |FROM fit JOIN tl USING (source) ORDER BY source""".stripMargin
    },

    // rendezvous argmax = in-order fold with strict > (first-wins tie);
    // the q153 multiply-mod chain as the (key, shard) weight
    "q164_shard_moves" -> {
      val (n0, n1) = (operators.Skew.ShardsBefore, operators.Skew.ShardsAfter)
      def rdv(n: Int) =
        s"""list_reduce(list_prepend({'h': CAST(-1 AS BIGINT), 's': CAST(-1 AS BIGINT)},
           |      list_transform(range(0, $n), s -> {
           |        'h': (((doc_id % 1000000007) * 1000003 % 1000000007
           |              + s * 7919) % 1000000007) * 69069 % 1000000007,
           |        's': s})),
           |      (acc, x) -> CASE WHEN x['h'] > acc['h'] THEN x ELSE acc END)['s']"""
          .stripMargin
      s"""WITH a AS (SELECT doc_id,
         |    doc_id % $n0 AS mod_old, doc_id % $n1 AS mod_new,
         |    ${rdv(n0)} AS rdv_old,
         |    ${rdv(n1)} AS rdv_new
         |  FROM documents WHERE doc_id IS NOT NULL),
         |s AS (SELECT 'modulo' AS scheme, mod_old AS old_shard, mod_new AS new_shard
         |      FROM a
         |      UNION ALL
         |      SELECT 'rendezvous', rdv_old, rdv_new FROM a),
         |l AS (SELECT scheme, new_shard, count(*) AS n,
         |        sum(CASE WHEN old_shard <> new_shard THEN 1 ELSE 0 END) AS moved
         |      FROM s GROUP BY 1, 2)
         |SELECT scheme, CAST(sum(n) AS BIGINT) AS n_docs,
         |       CAST(sum(moved) AS BIGINT) AS n_moved,
         |       round(CAST(sum(moved) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
         |         AS moved_frac,
         |       CAST(min(n) AS BIGINT) AS min_shard_load,
         |       CAST(max(n) AS BIGINT) AS max_shard_load
         |FROM l GROUP BY scheme ORDER BY scheme""".stripMargin
    },

    // journeys split at purchases; MarkovIters unrolled power
    // iterations in EXACT 1e-6 integer fixed-point (integer sums
    // commute — no float-order hazard anywhere in the chain algebra)
    "q163_markov_attribution" -> {
      val iters = (2 to operators.Temporal.MarkovIters).map { k =>
        val p = k - 1
        s"""v$k AS MATERIALIZED (SELECT st.variant, st.s,
           |    (coalesce(pc.pi, 0) * 1000000 + coalesce(w.acc, 0) + 500000)
           |      // 1000000 AS vi
           |  FROM st LEFT JOIN pc ON pc.variant = st.variant AND pc.src = st.s
           |  LEFT JOIN (SELECT tm.variant, tm.src, sum(tm.pi * v$p.vi) AS acc
           |             FROM tm JOIN v$p ON v$p.variant = tm.variant
           |               AND v$p.s = tm.dst
           |             GROUP BY 1, 2) w
           |    ON w.variant = st.variant AND w.src = st.s)""".stripMargin
      }.mkString(",\n")
      val last = s"v${operators.Temporal.MarkovIters}"
      s"""WITH ev AS (SELECT user_id, event_id, ts, event_type AS t FROM events
         |    WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |      AND event_type IS NOT NULL),
         |j AS (SELECT *, coalesce(sum(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY user_id ORDER BY ts, event_id
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS jid
         |      FROM ev),
         |x AS (SELECT *, lag(t) OVER w AS prev, lead(t) OVER w AS nxt FROM j
         |      WINDOW w AS (PARTITION BY user_id, jid ORDER BY ts, event_id)),
         |cnt AS MATERIALIZED (SELECT src, dst, count(*) AS n FROM (
         |    SELECT coalesce(prev, 'START') AS src,
         |           CASE WHEN t = 'purchase' THEN 'CONV' ELSE t END AS dst FROM x
         |    UNION ALL
         |    SELECT t AS src, 'NULL' AS dst FROM x
         |    WHERE nxt IS NULL AND t <> 'purchase') GROUP BY 1, 2),
         |tt AS (SELECT src, sum(n) AS tot FROM cnt GROUP BY 1),
         |p AS MATERIALIZED (SELECT c.src, c.dst,
         |      (c.n * 2000000 + t.tot) // (2 * t.tot) AS pi
         |    FROM cnt c JOIN tt t USING (src)),
         |ch AS (SELECT DISTINCT s AS c FROM (
         |    SELECT src AS s FROM cnt UNION ALL SELECT dst FROM cnt)
         |  WHERE s NOT IN ('START', 'CONV', 'NULL', 'purchase')),
         |vr AS (SELECT c AS variant FROM ch UNION ALL SELECT 'FULL'),
         |st AS MATERIALIZED (SELECT v.variant, s.s FROM vr v CROSS JOIN
         |    (SELECT 'START' AS s UNION ALL SELECT c FROM ch) s
         |  WHERE s.s = 'START' OR s.s <> v.variant),
         |tm AS MATERIALIZED (SELECT v.variant, p.src, p.dst, p.pi FROM vr v JOIN p
         |    ON p.src <> v.variant AND p.dst <> v.variant),
         |pc AS (SELECT variant, src, pi FROM tm WHERE dst = 'CONV'),
         |v1 AS MATERIALIZED (SELECT st.variant, st.s,
         |    (coalesce(pc.pi, 0) * 1000000 + 500000) // 1000000 AS vi
         |  FROM st LEFT JOIN pc ON pc.variant = st.variant AND pc.src = st.s),
         |$iters,
         |bs AS (SELECT vi AS basei FROM $last WHERE variant = 'FULL' AND s = 'START'),
         |rm AS (SELECT variant AS channel, vi AS remi FROM $last
         |       WHERE s = 'START' AND variant <> 'FULL'),
         |ef AS (SELECT channel, remi, basei,
         |         CASE WHEN basei = 0 THEN 0
         |              ELSE ((basei - remi) * 2000000 + basei) // (2 * basei)
         |         END AS effi
         |       FROM rm CROSS JOIN bs),
         |se AS (SELECT greatest(sum(effi), 1) AS sume FROM ef),
         |nc AS (SELECT sum(n) AS nconv FROM cnt WHERE dst = 'CONV')
         |SELECT channel,
         |       CAST(basei AS DOUBLE) / 1000000.0 AS base_conv_p,
         |       CAST(remi AS DOUBLE) / 1000000.0 AS removed_conv_p,
         |       CAST(effi AS DOUBLE) / 1000000.0 AS removal_effect,
         |       round(CAST(effi AS DOUBLE) / CAST(sume AS DOUBLE), 6) AS attr_share,
         |       round(CAST(effi AS DOUBLE) / CAST(sume AS DOUBLE)
         |         * CAST(nconv AS DOUBLE), 4) AS credited_purchases
         |FROM ef CROSS JOIN se CROSS JOIN nc
         |ORDER BY channel""".stripMargin
    },

    // the q153 derived-randomness hash as the within-cluster pick key,
    // over the shared seeded-Lloyd assignment
    "q158_diversity_sample" ->
      s"""WITH $kmeansCte,
         |picks AS (SELECT cluster, vec_id, dist,
         |    CAST(row_number() OVER (PARTITION BY cluster ORDER BY
         |      ((vec_id % 1000000007) * 1000003 % 1000000007) * 69069 % 1000000007,
         |      vec_id) AS BIGINT) AS pick_rank
         |  FROM af)
         |SELECT cluster, pick_rank, vec_id, dist FROM picks
         |WHERE pick_rank <= ${operators.KMeans.SampleQuota}
         |ORDER BY cluster, pick_rank""".stripMargin,

    // both engines' nfc_normalize (DuckDB built-in; the engine's native
    // expression under the same name) on the same UTF-8 bytes
    "q159_nfc_report" ->
      """SELECT doc_id,
        |       CAST(CASE WHEN text <> nfc_normalize(text) THEN 1 ELSE 0 END AS BIGINT)
        |         AS is_changed,
        |       CAST(length(text) AS BIGINT) AS n_chars_raw,
        |       CAST(length(nfc_normalize(text)) AS BIGINT) AS n_chars_nfc,
        |       md5(nfc_normalize(text)) AS nfc_md5
        |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,

    // per-source length CDFs on the shared bin grid (last-value fill),
    // W1 = sum |cdf_a - cdf_b| * (lead(bin) - bin): the gap weight, not
    // a fixed width — the grid skips empty bins and a CDF difference
    // across a hole is the hole's worth of transport
    "q160_source_emd" -> {
      val bw = operators.TextAnalysis.EmdBinWidth
      val cap = operators.TextAnalysis.EmdMaxLen
      s"""WITH d AS (SELECT source, least(len(${tok("text")}), $cap) AS n
         |    FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         |h AS (SELECT source, (n // $bw) * $bw AS bin, count(*) AS c
         |      FROM d GROUP BY 1, 2),
         |cd AS (SELECT source, bin,
         |         CAST(sum(c) OVER (PARTITION BY source ORDER BY bin) AS DOUBLE)
         |           / sum(c) OVER (PARTITION BY source) AS cdf
         |       FROM h),
         |grid AS (SELECT DISTINCT bin FROM cd),
         |srcs AS (SELECT DISTINCT source FROM cd),
         |f AS (SELECT s.source, g.bin,
         |        coalesce(last_value(cd.cdf IGNORE NULLS) OVER
         |          (PARTITION BY s.source ORDER BY g.bin
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS cdf,
         |        coalesce(lead(g.bin) OVER
         |          (PARTITION BY s.source ORDER BY g.bin) - g.bin, 0) AS gap
         |      FROM srcs s CROSS JOIN grid g
         |      LEFT JOIN cd ON cd.source = s.source AND cd.bin = g.bin)
         |SELECT a.source AS source_a, b.source AS source_b,
         |       round(sum(abs(a.cdf - b.cdf) * a.gap), 6) AS emd_tokens
         |FROM f a JOIN f b ON a.bin = b.bin AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // greedy MMR unrolled as MmrK chained CTEs (the q110/q147
    // fixed-iteration rule): round r scores cand \ p(r-1) against the
    // accumulated picks. The score is EXACT fixed-point — 7·R − 3·S on
    // the 1e-6 similarity grid, displayed /1e7 — because a float
    // λ = 0.7 times a 6-dp rel lands on true decimal half-ways that
    // round() cannot settle identically across engines (the first run
    // of this oracle failed on one such cell).
    "q161_mmr_rerank" -> {
      import operators.Similarity.{MmrK, MmrLambdaNum, MmrBetaNum, MmrShortlist}
      val rounds = (2 to MmrK).map { r =>
        s"""m$r AS (SELECT c.q_id, c.vec_id, c.v, c.rel,
           |        $MmrLambdaNum * CAST(round(c.rel * 1000000) AS BIGINT)
           |          - $MmrBetaNum * max(CAST(round(
           |              round(list_cosine_similarity(c.v, p.v), 6) * 1000000)
           |              AS BIGINT)) AS mmr_i
           |      FROM cand c JOIN p${r - 1} p USING (q_id)
           |      WHERE NOT EXISTS (SELECT 1 FROM p${r - 1} x
           |        WHERE x.q_id = c.q_id AND x.vec_id = c.vec_id)
           |      GROUP BY c.q_id, c.vec_id, c.v, c.rel),
           |s$r AS MATERIALIZED (SELECT q_id, vec_id, v, rel,
           |        CAST($r AS BIGINT) AS sel_rank, mmr_i
           |      FROM (SELECT *, row_number() OVER
           |              (PARTITION BY q_id ORDER BY mmr_i DESC, vec_id) AS rk
           |            FROM m$r) WHERE rk = 1),
           |p$r AS MATERIALIZED (SELECT * FROM p${r - 1} UNION ALL SELECT * FROM s$r)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |sims AS (SELECT q_id, e.vec_id, e.v,
         |           round(list_cosine_similarity(qv, v), 6) AS rel
         |         FROM e CROSS JOIN q WHERE e.vec_id <> q_id),
         |cand AS MATERIALIZED (SELECT q_id, vec_id, v, rel FROM (
         |    SELECT *, row_number() OVER
         |      (PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rk
         |    FROM sims) WHERE rk <= $MmrShortlist),
         |p1 AS MATERIALIZED (SELECT q_id, vec_id, v, rel,
         |      CAST(1 AS BIGINT) AS sel_rank,
         |      $MmrLambdaNum * CAST(round(rel * 1000000) AS BIGINT) AS mmr_i
         |    FROM (SELECT *, row_number() OVER
         |            (PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rk
         |          FROM cand) WHERE rk = 1),
         |$rounds
         |SELECT q_id, sel_rank, vec_id, rel,
         |       CAST(mmr_i AS DOUBLE) / 10000000.0 AS mmr FROM p$MmrK
         |ORDER BY q_id, sel_rank""".stripMargin
    },

    "q140_equidepth_hist" ->
      """WITH b AS (SELECT list_transform(
        |    quantile_cont(l_extendedprice, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
        |    v -> round(v, 6)) AS bs FROM lineitem),
        |binned AS (SELECT l_extendedprice AS x,
        |    1 + len(list_filter(bs, v -> l_extendedprice > v)) AS bin
        |  FROM lineitem CROSS JOIN b)
        |SELECT bin, count(*) AS n, round(min(x), 2) AS lo,
        |       round(max(x), 2) AS hi, round(avg(x), 4) AS mean_x
        |FROM binned GROUP BY bin ORDER BY bin""".stripMargin,

    "q130_profile" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      cols.map { c =>
        s"""SELECT '$c' AS column_name,
           |  (SELECT count(*) FROM lineitem) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },

    // daily sums round to 6 dp BEFORE the dow mean (q113 convention);
    // DuckDB dayofweek is 0=Sunday, Spark's is 1=Sunday — shift here
    "q125_seasonal_index" ->
      """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |    round(sum(value), 6) AS x FROM events GROUP BY 1, 2),
        |s AS (SELECT *, CAST(dayofweek(CAST(day AS DATE)) + 1 AS BIGINT) AS dow FROM d)
        |SELECT event_type, day, dow, x,
        |       round(avg(x) OVER (PARTITION BY event_type, dow), 6) AS dow_mean,
        |       round(x / round(avg(x) OVER (PARTITION BY event_type, dow), 6), 6)
        |         AS seasonal_index
        |FROM s ORDER BY event_type, day""".stripMargin,

    // degree-ordered orientation: integer joins only, no rounding
    // contract; "orr" because OR is reserved
    "q117_triangles" ->
      s"""WITH t AS (SELECT doc_id, ${tok("text")} AS ws FROM documents),
         |pairs AS (SELECT p['w1'] AS w1, p['w2'] AS w2 FROM
         |  (SELECT unnest(list_transform(range(1, len(ws)),
         |     i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
         |   FROM t WHERE len(ws) >= 2)),
         |ed AS (SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
         |       FROM pairs WHERE w1 <> w2),
         |deg AS (SELECT id, count(*) AS deg FROM
         |  (SELECT a AS id FROM ed UNION ALL SELECT b FROM ed) s GROUP BY id),
         |orr AS MATERIALIZED (SELECT
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND ed.a < ed.b)
         |         THEN ed.a ELSE ed.b END AS src,
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND ed.a < ed.b)
         |         THEN ed.b ELSE ed.a END AS dst,
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND ed.a < ed.b)
         |         THEN db.deg ELSE da.deg END AS dst_deg
         |  FROM ed JOIN deg da ON da.id = ed.a JOIN deg db ON db.id = ed.b),
         |tri AS (SELECT o1.src AS u, o1.dst AS v, o2.dst AS w
         |        FROM orr o1 JOIN orr o2 ON o1.src = o2.src
         |         AND (o1.dst_deg < o2.dst_deg
         |              OR (o1.dst_deg = o2.dst_deg AND o1.dst < o2.dst))
         |        JOIN orr o3 ON o3.src = o1.dst AND o3.dst = o2.dst)
         |SELECT word, count(*) AS n_triangles FROM (
         |  SELECT u AS word FROM tri
         |  UNION ALL SELECT v FROM tri
         |  UNION ALL SELECT w FROM tri) s
         |GROUP BY word ORDER BY n_triangles DESC, word""".stripMargin,

    "q22_range_join" ->
      """SELECT o_orderpriority, count(*) AS n_fast_lines, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q23_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
        |       count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q24_topk_parts" ->
      """SELECT p_partkey, p_name, p_brand, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_partkey, p_name, p_brand ORDER BY sum_qty DESC, p_partkey LIMIT 15""".stripMargin,

    "q25_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, value,
        |         CAST(sum(CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END)
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, max(session_id) AS n_sessions, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    // money on the exact 2-dp grid — the cube's grand-total cell sums
    // the whole join (the q10 float-sum class, caught at 100x)
    "q26_cube" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n_orders,
        |       round(CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT))
        |         AS DOUBLE) / 100.0, 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderpriority)
        |ORDER BY segment, priority""".stripMargin,

    "q27_array_fns" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT vec_id,
        |       round(list_reduce(list_prepend(0.0, list_transform(v[1:8], x -> abs(x))), (a, b) -> a + b), 6) AS l1_head,
        |       round(list_reduce(list_prepend(0.0, list_transform(v, x -> least(greatest(x, -0.1), 0.1))), (a, b) -> a + b), 6) AS clipped_sum,
        |       CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos,
        |       round(list_min(v), 6) AS min_val,
        |       round(list_max(v), 6) AS max_val
        |FROM e ORDER BY vec_id""".stripMargin,

    "q28_map_fns" ->
      """WITH kv AS (
        |  SELECT key, TRY_CAST(json_extract_string(props, '/' || key) AS BIGINT) AS val
        |  FROM (SELECT props, unnest(json_keys(props)) AS key FROM events) t)
        |SELECT key, count(*) AS n, CAST(sum(val) AS BIGINT) AS sum_val,
        |       min(val) AS min_val, max(val) AS max_val
        |FROM kv GROUP BY key ORDER BY key""".stripMargin,

    "q29_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |       round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
        |       round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error,
        |       round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
        |       round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
        |       round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view
        |FROM events GROUP BY day ORDER BY day""".stripMargin,

    "q48_asof_join" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS asof_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id,
        |       strftime(r.o_orderdate, '%Y-%m-%d') AS asof_date,
        |       r.asof_orderkey
        |FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        |ORDER BY event_id""".stripMargin,

    "q30_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY content_hash ORDER BY canonical_id""".stripMargin,

    "q31_minhash_sig" -> {
      // band constants come from the operator (Dedup.minhashBands) so
      // the oracle can never drift from the implementation
      val mins = Dedup.minhashBands
        .map { case (band, a, b) => s"min((h * $a + $b) % 1000000007) AS m$band" }
        .mkString(",\n|  ")
      s"""WITH tok AS (SELECT DISTINCT doc_id, word FROM
         |  (SELECT doc_id, unnest(${tok("text")}) AS word FROM documents) t),
         |wh AS (SELECT doc_id, ${tokenId("word")} AS h FROM tok),
         |m AS (SELECT doc_id,
         |  $mins
         |  FROM wh GROUP BY doc_id)
         |SELECT doc_id, CAST(unnest(range(8)) AS BIGINT) AS band,
         |       unnest([m0, m1, m2, m3, m4, m5, m6, m7]) AS minhash
         |FROM m ORDER BY doc_id, band""".stripMargin
    },

    "q32_simhash" -> {
      val votes = (0 until 16).map(b =>
        s"sum(CASE WHEN CAST(floor(h / ${1L << b}) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS v$b")
        .mkString(",\n|  ")
      val simhash = (0 until 16).map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH tok AS (SELECT DISTINCT doc_id, word FROM
         |  (SELECT doc_id, unnest(${tok("text")}) AS word FROM documents) t),
         |wh AS (SELECT doc_id, ${tokenId("word")} AS h FROM tok),
         |v AS (SELECT doc_id,
         |  $votes
         |  FROM wh GROUP BY doc_id)
         |SELECT doc_id, CAST($simhash AS BIGINT) AS simhash
         |FROM v ORDER BY doc_id""".stripMargin
    },

    "q33_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(ws)-3, 1)+1),
        |         i -> array_to_string(ws[i:i+3], ' ')))) AS shingle FROM w),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |rare AS (SELECT sh.doc_id, sh.shingle FROM sh
        |         JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 50) r
        |         ON sh.shingle = r.shingle),
        |pairs AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter
        |          FROM rare x JOIN rare y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        |          GROUP BY id_a, id_b)
        |SELECT id_a, id_b, round(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
        |FROM pairs JOIN sizes sa ON pairs.id_a = sa.doc_id
        |           JOIN sizes sb ON pairs.id_b = sb.doc_id
        |ORDER BY jaccard DESC, id_a, id_b LIMIT 20""".stripMargin,

    "q51_percentiles" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |       round(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price,
        |       round(quantile_cont(l_discount, 0.25), 6) AS p25_discount
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q52_stats" ->
      """SELECT l_returnflag,
        |       round(stddev_samp(l_quantity), 4) AS sd_qty,
        |       round(var_samp(l_quantity), 2) AS var_qty,
        |       round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qty_price,
        |       round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q53_scalar_subquery" ->
      """SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey, c_acctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT round(avg(c2.c_acctbal) * 1.5, 2) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,

    "q54_grouping_sets" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |       count(*) AS n_customers, round(avg(c_acctbal), 4) AS avg_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (n_name))
        |ORDER BY region, nation""".stripMargin,

    "q55_window_dist" ->
      """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cume,
        |       first_value(o_totalprice) OVER wa AS first_price,
        |       last_value(o_totalprice) OVER wa AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       wa AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY custkey, orderkey""".stripMargin,

    // Blocked-exact near-dup: simhashCandCte inlines the SAME ±1
    // hyperplane literals the Spark side uses (Dedup.simhashPlanes), so
    // candidate generation — not just scoring — is reproduced exactly.
    // the q45b seed centroids are corpus ROWS (vec_id < 8), so both
    // engines score cosine against bit-identical doubles; min/max per
    // cell are summation-order-free (no q103b-class hash flake)
    "q45b_ivf_seeded_cells" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.cell,
        |         round(list_cosine_similarity(e.v, c.cv), 6) AS sim
        |  FROM e CROSS JOIN c),
        |assigned AS (
        |  SELECT vec_id, cell, sim,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rk
        |  FROM scored)
        |SELECT cell, count(*) AS n_vectors,
        |       round(min(sim), 6) AS min_sim, round(max(sim), 6) AS max_sim
        |FROM assigned WHERE rk = 1
        |GROUP BY cell ORDER BY cell""".stripMargin,

    "q49_embedding_neardup" ->
      s"""WITH $simhashCandCte,
         |scored AS (SELECT id_a, id_b,
         |                  round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
         |           FROM cand JOIN e ea ON ea.vec_id = cand.id_a
         |                     JOIN e eb ON eb.vec_id = cand.id_b)
         |SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.45
         |ORDER BY cos_sim DESC, id_a, id_b""".stripMargin,

    // PII scrub: pattern literals single-sourced from TextAnalysis
    // (backslashes pass through DuckDB single-quoted strings verbatim,
    // so the same Java/RE2-compatible pattern text serves both engines).
    "q69_pii_scrub" -> {
      val Seq((email, _), (phone, _), (ip, _)) = TextAnalysis.piiPatterns
      s"""SELECT doc_id,
         |       CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
         |       CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT) AS n_phones,
         |       CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ips,
         |       regexp_replace(regexp_replace(regexp_replace(text,
         |         '$email', '<EMAIL>', 'g'),
         |         '$phone', '<PHONE>', 'g'),
         |         '$ip', '<IP>', 'g') AS clean_text
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // Decontamination: 8-word shingles (ws[i:i+7] is inclusive — 8
    // elements), q62's bucket literals; eval docs excluded from output.
    "q70_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, text, ${tokenId("text")} % 100 AS bucket FROM documents),
         |w AS (SELECT doc_id, bucket, string_split(text, ' ') AS ws FROM d),
         |sh AS (SELECT doc_id, bucket, unnest(list_distinct(list_transform(range(1, greatest(len(ws)-7, 1)+1),
         |         i -> array_to_string(ws[i:i+7], ' ')))) AS shingle FROM w),
         |ev AS (SELECT DISTINCT shingle, 1 AS hit FROM sh WHERE bucket >= 95)
         |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |       CAST(coalesce(sum(ev.hit), 0) AS BIGINT) AS n_contaminated,
         |       CAST(CASE WHEN coalesce(sum(ev.hit), 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
         |FROM sh s LEFT JOIN ev USING (shingle)
         |WHERE s.bucket < 95
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // eval-side containment: q70's shingle machinery transposed —
    // per eval doc, the best-matching training doc and the asymmetric
    // containment |train ∩ eval| / |eval|, dirty at >= 0.8
    "q248_eval_containment" ->
      s"""WITH d AS (SELECT doc_id, text, ${tokenId("text")} % 100 AS bucket FROM documents),
         |w AS (SELECT doc_id, bucket, string_split(text, ' ') AS ws FROM d),
         |sh AS (SELECT doc_id, bucket, unnest(list_distinct(list_transform(range(1, greatest(len(ws)-7, 1)+1),
         |         i -> array_to_string(ws[i:i+7], ' ')))) AS shingle FROM w),
         |ev AS (SELECT doc_id AS eval_doc, shingle FROM sh WHERE bucket >= 95),
         |sz AS (SELECT eval_doc, count(*) AS n_eval_shingles FROM ev GROUP BY 1),
         |sj AS (SELECT ev.eval_doc, s.doc_id AS train_doc, count(*) AS n_shared
         |       FROM sh s JOIN ev ON s.shingle = ev.shingle
         |       WHERE s.bucket < 95 GROUP BY 1, 2),
         |b AS (SELECT eval_doc, train_doc, n_shared FROM (
         |    SELECT eval_doc, train_doc, n_shared, row_number() OVER
         |      (PARTITION BY eval_doc ORDER BY n_shared DESC, train_doc ASC) AS rk
         |    FROM sj) t WHERE rk = 1)
         |SELECT sz.eval_doc, CAST(sz.n_eval_shingles AS BIGINT) AS n_eval_shingles,
         |  b.train_doc AS best_train_doc,
         |  CAST(coalesce(b.n_shared, 0) AS BIGINT) AS n_shared,
         |  round(coalesce(b.n_shared, 0) / CAST(sz.n_eval_shingles AS DOUBLE), 6)
         |    AS containment,
         |  CAST(round(coalesce(b.n_shared, 0) / CAST(sz.n_eval_shingles AS DOUBLE), 6)
         |    >= 0.8 AS BIGINT) AS dirty
         |FROM sz LEFT JOIN b USING (eval_doc)
         |ORDER BY sz.eval_doc""".stripMargin,

    // q70's shingle machinery with suite tags; inner join ⇒ only
    // leaking (doc, suite) pairs reach the output
    "q149_multi_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, text, ${tokenId("text")} % 100 AS bucket FROM documents),
         |w AS (SELECT doc_id, bucket, string_split(text, ' ') AS ws FROM d),
         |sh AS (SELECT doc_id, bucket, unnest(list_distinct(list_transform(range(1, greatest(len(ws)-7, 1)+1),
         |         i -> array_to_string(ws[i:i+7], ' ')))) AS shingle FROM w),
         |ev AS (SELECT DISTINCT
         |         CASE WHEN bucket <= 96 THEN 'suite_a'
         |              WHEN bucket <= 98 THEN 'suite_b'
         |              ELSE 'suite_c' END AS suite, shingle
         |       FROM sh WHERE bucket >= 95)
         |SELECT s.doc_id, ev.suite, CAST(count(*) AS BIGINT) AS n_overlap
         |FROM sh s JOIN ev USING (shingle)
         |WHERE s.bucket < 95
         |GROUP BY 1, 2 ORDER BY doc_id, suite""".stripMargin,

    // the bloom is an implementation detail (no false negatives + exact
    // confirm ⇒ output equals the exact computation), so the oracle is
    // q70's exact SQL verbatim — the q109 sketch-shortlist contract
    "q118_bloom_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, text, ${tokenId("text")} % 100 AS bucket FROM documents),
         |w AS (SELECT doc_id, bucket, string_split(text, ' ') AS ws FROM d),
         |sh AS (SELECT doc_id, bucket, unnest(list_distinct(list_transform(range(1, greatest(len(ws)-7, 1)+1),
         |         i -> array_to_string(ws[i:i+7], ' ')))) AS shingle FROM w),
         |ev AS (SELECT DISTINCT shingle, 1 AS hit FROM sh WHERE bucket >= 95)
         |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |       CAST(coalesce(sum(ev.hit), 0) AS BIGINT) AS n_contaminated,
         |       CAST(CASE WHEN coalesce(sum(ev.hit), 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
         |FROM sh s LEFT JOIN ev USING (shingle)
         |WHERE s.bucket < 95
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // Unigram LM scoring: ln() in both engines; round(6) absorbs the
    // last-ulp differences of the two libm implementations.
    "q71_unigram_logp" ->
      s"""WITH words AS (SELECT doc_id, unnest(${tok("text")}) AS word FROM documents),
         |freq AS (SELECT word, count(*) AS cnt FROM words GROUP BY word),
         |t AS (SELECT sum(cnt) AS total FROM freq)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       round(avg(ln(cnt * 1.0 / total)), 6) + 0.0 AS avg_logp
         |FROM words JOIN freq USING (word) CROSS JOIN t
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Incremental ingest dedup: the shard (doc_id % 10 = 7) against the
    // corpus-index slice — same md5 contract as q30.
    "q73_incr_dedup" ->
      """WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
        |b AS (SELECT doc_id, h FROM d WHERE doc_id % 10 = 7),
        |c AS (SELECT h, min(doc_id) AS corpus_canonical FROM d WHERE doc_id % 10 <> 7 GROUP BY h),
        |bm AS (SELECT h, min(doc_id) AS batch_min FROM b GROUP BY h)
        |SELECT b.doc_id,
        |       CASE WHEN c.corpus_canonical IS NOT NULL THEN 'dup_corpus'
        |            WHEN b.doc_id > bm.batch_min THEN 'dup_batch'
        |            ELSE 'new' END AS status,
        |       coalesce(c.corpus_canonical, bm.batch_min) AS canonical_id
        |FROM b LEFT JOIN c USING (h) JOIN bm USING (h)
        |ORDER BY doc_id""".stripMargin,

    // Interpolated bigram LM: identical arithmetic order and literal
    // weights (0.9 / 0.1) on both engines; round(6) absorbs libm ulps
    // as in q71.
    "q74_bigram_logp" ->
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS ws FROM documents),
         |pr AS (SELECT doc_id, p['w1'] AS w1, p['w2'] AS w2 FROM
         |  (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
         |     i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
         |   FROM w WHERE len(ws) >= 2)),
         |words AS (SELECT unnest(${tok("text")}) AS word FROM documents),
         |uni AS (SELECT word, count(*) AS cnt1 FROM words GROUP BY word),
         |t AS (SELECT sum(cnt1) AS total FROM uni),
         |bi AS (SELECT w1, w2, count(*) AS cnt2 FROM pr GROUP BY w1, w2 HAVING count(*) >= 3)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_transitions,
         |       round(avg(ln(coalesce(cnt2 * 0.9 / u1.cnt1, 0.0) + 0.1 * u2.cnt1 / total)), 6) + 0.0 AS avg_logp
         |FROM pr LEFT JOIN bi USING (w1, w2)
         |JOIN uni u1 ON pr.w1 = u1.word
         |JOIN uni u2 ON pr.w2 = u2.word
         |CROSS JOIN t
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Corpus-wide duplication fraction: string shingles on the oracle
    // side vs native hashes on the Spark side (the q70 equivalence —
    // identical modulo an in-corpus xxhash64 collision).
    "q75_dup_fraction" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(ws)-7, 1)+1),
        |         i -> array_to_string(ws[i:i+7], ' ')))) AS shingle FROM w),
        |d AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
        |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |       CAST(sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |       round(sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_frac
        |FROM sh JOIN d USING (shingle)
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,

    // Curriculum bins: the explicit (rank-1)*n div total formula is the
    // shared cross-engine semantics (ntile's remainder rule differs);
    // the oracle may use a plain global row_number, the Spark plan
    // assembles the same rank scale-safely from a value histogram.
    "q79_curriculum_bins" ->
      s"""WITH d AS (SELECT doc_id, ${tok("text")} AS words FROM documents),
         |s AS (SELECT doc_id,
         |        CAST(len(words) AS BIGINT) AS n_tokens,
         |        round(CAST(len(list_distinct(words)) AS DOUBLE) / greatest(len(words), 1), 6) AS ttr,
         |        round(CAST(len(list_filter(words, w -> w IN $stoplist)) AS DOUBLE)
         |              / greatest(len(words), 1), 6) AS stop_share
         |      FROM d),
         |q AS (SELECT doc_id, n_tokens,
         |        round(least(ttr * 2.0, 1.0) * 0.5
         |              + CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 0.3 ELSE 0.0 END
         |              + least(stop_share * 3.0, 0.2), 6) AS quality
         |      FROM s),
         |r AS (SELECT n_tokens, quality,
         |        row_number() OVER (ORDER BY quality DESC, doc_id) AS rnk,
         |        count(*) OVER () AS total_docs,
         |        sum(n_tokens) OVER () AS total_tokens
         |      FROM q),
         |g AS (SELECT CAST((rnk - 1) * 10 // total_docs + 1 AS BIGINT) AS bin,
         |             count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |             round(avg(quality), 6) AS avg_quality,
         |             CAST(max(total_tokens) AS BIGINT) AS total_tokens
         |      FROM r GROUP BY 1)
         |SELECT bin, n_docs, sum_tokens, avg_quality,
         |       round(CAST(sum(sum_tokens) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         |             / total_tokens, 6) AS cum_token_share
         |FROM g ORDER BY bin""".stripMargin,

    // int8 quantization: every step (widen, abs-max, /127, floor(x+0.5),
    // clamp, dequant, sequential error fold) is the same IEEE op in the
    // same order on both engines — floor(x+0.5) instead of round()
    // because Spark/DuckDB rounding rules differ at .5 boundaries.
    "q76_quantize_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        greatest(list_aggregate(list_transform(v, x -> abs(x)), 'max'), 1e-12) / 127.0 AS scale
        |      FROM e),
        |d AS (SELECT vec_id, v, scale,
        |        list_transform(v, x -> CAST(greatest(-127.0, least(127.0, floor(x / scale + 0.5))) AS BIGINT) * scale) AS dq
        |      FROM s),
        |r AS (SELECT vec_id, scale, v, dq,
        |        list_reduce(list_prepend(0.0, list_transform(range(1, len(v)+1),
        |          i -> (v[i] - dq[i]) * (v[i] - dq[i]))), (acc, x) -> acc + x) AS sq_err
        |      FROM d)
        |SELECT vec_id, scale, round(sqrt(sq_err / len(v)), 6) AS rmse,
        |       round(list_cosine_similarity(v, dq), 6) + 0.0 AS cos_q
        |FROM r ORDER BY vec_id""".stripMargin,

    // MinHash calibration: q31's band constants + the exact word-set
    // Jaccard over adjacent-id pairs; est is an exact multiple of 1/8.
    "q77_minhash_calibration" -> {
      val mins = Dedup.minhashBands
        .map { case (band, a, b) => s"min((h * $a + $b) % 1000000007) AS m$band" }
        .mkString(",\n|    ")
      val eq = Dedup.minhashBands.indices
        .map(k => s"(CASE WHEN sa.m$k = sb.m$k THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH tok AS (SELECT DISTINCT doc_id, word FROM
         |  (SELECT doc_id, unnest(${tok("text")}) AS word FROM documents) t),
         |wh AS (SELECT doc_id, ${tokenId("word")} AS h FROM tok),
         |m AS (SELECT doc_id, count(*) AS n_words,
         |    $mins
         |  FROM wh GROUP BY doc_id),
         |i AS (SELECT a.doc_id AS id_a, count(*) AS n_inter
         |      FROM tok a JOIN tok b ON b.word = a.word AND b.doc_id = a.doc_id + 1
         |      GROUP BY 1),
         |p AS (SELECT sa.doc_id AS id_a, sb.doc_id AS id_b,
         |        round(coalesce(i.n_inter, 0) * 1.0
         |              / (sa.n_words + sb.n_words - coalesce(i.n_inter, 0)), 6) AS jaccard,
         |        ($eq) / 8.0 AS est
         |      FROM m sa JOIN m sb ON sa.doc_id + 1 = sb.doc_id
         |      LEFT JOIN i ON i.id_a = sa.doc_id)
         |SELECT id_a, id_b, jaccard, est, round(abs(jaccard - est), 6) AS abs_err
         |FROM p ORDER BY id_a""".stripMargin
    },

    // SemDeDup cluster-anchor prune: cell = the first 8-bit simhash
    // band (same ±1 hyperplane literals as q49's candidate CTE).
    "q78_semantic_prune" -> {
      val cell = (0 until operators.Dedup.bandBits).map { t =>
        val wl = operators.Dedup.simhashPlanes(t)
          .map(w => if (w > 0) "1" else "-1").mkString("[", ",", "]")
        s"(CASE WHEN list_dot_product(v, $wl::DOUBLE[]) >= 0 THEN ${1L << t} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sig AS (SELECT vec_id, v, CAST($cell AS BIGINT) AS cell FROM e),
         |anch AS (SELECT cell, min(vec_id) AS anchor_id FROM sig GROUP BY cell),
         |av AS (SELECT a.cell, a.anchor_id, s.v AS avec
         |       FROM anch a JOIN sig s ON s.vec_id = a.anchor_id)
         |SELECT s.vec_id, s.cell, av.anchor_id,
         |       round(list_cosine_similarity(s.v, av.avec), 6) AS cos_anchor,
         |       round(list_cosine_similarity(s.v, av.avec), 6) >= 0.45 AS is_dup
         |FROM sig s JOIN av USING (cell)
         |WHERE s.vec_id <> av.anchor_id
         |ORDER BY s.vec_id""".stripMargin
    },

    // Trailing z-score: identical exclusive frame and warm-up guards on
    // both engines; ties on ts broken by event_id (the q25 contract).
    // DSIR importance weights: string-keyed model twin of the Spark
    // plan; target add-one smoothing over the raw vocabulary. Sums of
    // counts CAST to BIGINT (oracle type rule 1).
    "q81_dsir_weight" ->
      s"""WITH d AS (SELECT doc_id, text, ${tokenId("text")} % 100 AS bucket FROM documents),
         |w AS (SELECT doc_id, bucket, unnest(${tok("text")}) AS word FROM d),
         |raw AS (SELECT word, count(*) AS cr FROM w GROUP BY word),
         |rawtot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, count(*) AS v FROM raw),
         |tgt AS (SELECT word, count(*) AS ct FROM w WHERE bucket >= 95 GROUP BY word),
         |tgttot AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS nt FROM tgt)
         |SELECT doc_id, count(*) AS n_tokens,
         |       round(avg(ln((coalesce(ct, 0) + 1.0) / (nt + v)) - ln(cr * 1.0 / nr)), 6)
         |         + 0.0 AS dsir_weight
         |FROM w JOIN raw USING (word) LEFT JOIN tgt USING (word)
         |CROSS JOIN rawtot CROSS JOIN tgttot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Hashed-feature DSIR: q81's score algebra over tokenId-bucketed
    // counts — the O(buckets) model form, fully oracle-reproducible
    // because the feature hash is the portable tokenId.
    "q92_dsir_hashed" ->
      s"""WITH d AS (SELECT doc_id, text, ${tokenId("text")} % 100 AS bucket FROM documents),
         |w0 AS (SELECT doc_id, bucket, unnest(${tok("text")}) AS word FROM d),
         |w AS (SELECT doc_id, bucket, ${tokenId("word")} % ${TextAnalysis.dsirHashBuckets} AS wb FROM w0),
         |raw AS (SELECT wb, count(*) AS cr FROM w GROUP BY wb),
         |rawtot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr FROM raw),
         |tgt AS (SELECT wb, count(*) AS ct FROM w WHERE bucket >= 95 GROUP BY wb),
         |tgttot AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS nt FROM tgt)
         |SELECT doc_id, count(*) AS n_tokens,
         |       round(avg(ln((coalesce(ct, 0) + 1.0) / (nt + ${TextAnalysis.dsirHashBuckets}))
         |                 - ln(cr * 1.0 / nr)), 6) + 0.0 AS dsir_weight
         |FROM w JOIN raw USING (wb) LEFT JOIN tgt USING (wb)
         |CROSS JOIN rawtot CROSS JOIN tgttot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Char-bigram language ID: dense (langs × vocab) smoothed model,
    // per-(doc, lang) log-likelihood sums rounded at 6 BEFORE the
    // argmax rank (the q71/q74 FP-sum contract), ties on model_lang.
    "q94_ngram_langid" ->
      """WITH b AS (SELECT doc_id, lang,
        |             unnest(list_transform(range(1, greatest(length(text) - 1, 1) + 1),
        |                    i -> CAST(ascii(text[i]) AS BIGINT) * 1114112 + CAST(ascii(text[i+1]) AS BIGINT))) AS bg
        |           FROM documents),
        |c AS (SELECT lang, bg, count(*) AS cnt FROM b GROUP BY lang, bg),
        |v AS (SELECT DISTINCT bg FROM c),
        |vs AS (SELECT count(*) AS vocab FROM v),
        |l AS (SELECT DISTINCT lang FROM c),
        |t AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY lang),
        |m AS (SELECT l.lang AS model_lang, v.bg,
        |        ln((coalesce(c.cnt, 0) + 1.0) / (t.tot + vs.vocab)) AS logp
        |      FROM v CROSS JOIN l
        |      LEFT JOIN c ON c.lang = l.lang AND c.bg = v.bg
        |      JOIN t ON t.lang = l.lang
        |      CROSS JOIN vs),
        |db AS (SELECT doc_id, lang, bg, count(*) AS n FROM b GROUP BY doc_id, lang, bg),
        |s AS (SELECT db.doc_id, db.lang, m.model_lang, round(sum(db.n * m.logp), 6) AS score
        |      FROM db JOIN m USING (bg) GROUP BY db.doc_id, db.lang, m.model_lang),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, model_lang) AS rk FROM s)
        |SELECT doc_id, lang, model_lang AS pred_lang, score,
        |       CAST(CASE WHEN model_lang = lang THEN 1 ELSE 0 END AS BIGINT) AS is_correct
        |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    // Seed-fit language ID: the q94 model CTE trains on the 30 % seed
    // (doc_id mod 10 < 3) while scoring covers every doc; bigrams
    // outside the seed vocabulary drop out of the inner probe join on
    // both engines identically.
    "q94b_langid_seed" ->
      """WITH b AS (SELECT doc_id, lang,
        |             unnest(list_transform(range(1, greatest(length(text) - 1, 1) + 1),
        |                    i -> CAST(ascii(text[i]) AS BIGINT) * 1114112 + CAST(ascii(text[i+1]) AS BIGINT))) AS bg
        |           FROM documents),
        |c AS (SELECT lang, bg, count(*) AS cnt FROM b WHERE doc_id % 10 < 3 GROUP BY lang, bg),
        |v AS (SELECT DISTINCT bg FROM c),
        |vs AS (SELECT count(*) AS vocab FROM v),
        |l AS (SELECT DISTINCT lang FROM c),
        |t AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY lang),
        |m AS (SELECT l.lang AS model_lang, v.bg,
        |        ln((coalesce(c.cnt, 0) + 1.0) / (t.tot + vs.vocab)) AS logp
        |      FROM v CROSS JOIN l
        |      LEFT JOIN c ON c.lang = l.lang AND c.bg = v.bg
        |      JOIN t ON t.lang = l.lang
        |      CROSS JOIN vs),
        |db AS (SELECT doc_id, lang, bg, count(*) AS n FROM b GROUP BY doc_id, lang, bg),
        |s AS (SELECT db.doc_id, db.lang, m.model_lang, round(sum(db.n * m.logp), 6) AS score
        |      FROM db JOIN m USING (bg) GROUP BY db.doc_id, db.lang, m.model_lang),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, model_lang) AS rk FROM s)
        |SELECT doc_id, lang, model_lang AS pred_lang, score,
        |       CAST(CASE WHEN model_lang = lang THEN 1 ELSE 0 END AS BIGINT) AS is_correct
        |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    // q103b_covariance is rows-only by contract (no oracle entry): the
    // tree-aggregated BLAS accumulation and DuckDB's sum order can land
    // a cell on opposite sides of the 6-dp rounding boundary, so a hash
    // gate on rounded cells is flaky by construction. LinAlgSpec checks
    // every cell against an independent driver-side computation at 1e-9
    // tolerance instead — a STRONGER check than the rounded hash.

    // Embedding-space drift: snapshots are the vec_id parity split (the
    // q98 convention); conditional aggregates (FILTER ↔ when()) over one
    // posexplode/unnest pass. All stats round at 6 (FP-sum contract);
    // mean_shift is computed from the UNrounded means on both engines.
    "q104_embedding_drift" ->
      """WITH e AS (SELECT vec_id % 2 = 0 AS a,
        |             unnest(range(1, len(embedding) + 1)) AS dim1,
        |             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
        |           FROM embeddings)
        |SELECT CAST(dim1 - 1 AS BIGINT) AS dim,
        |       round(avg(x) FILTER (WHERE a), 6) + 0.0 AS mean_a,
        |       round(avg(x) FILTER (WHERE NOT a), 6) + 0.0 AS mean_b,
        |       round(avg(x) FILTER (WHERE NOT a) - avg(x) FILTER (WHERE a), 6) + 0.0 AS mean_shift,
        |       round(var_samp(x) FILTER (WHERE a), 6) AS var_a,
        |       round(var_samp(x) FILTER (WHERE NOT a), 6) AS var_b
        |FROM e GROUP BY dim1 ORDER BY dim""".stripMargin,

    // N-gram novelty: string-shingle twin (the q75 pattern — only
    // equality semantics matter, so the oracle's strings and the
    // plan's 64-bit hashes agree on every count).
    "q82_novelty" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(ws)-7, 1)+1),
        |         i -> array_to_string(ws[i:i+7], ' ')))) AS shingle FROM w),
        |f AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle)
        |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |       CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |       round(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS novelty
        |FROM sh JOIN f USING (shingle)
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,

    // Domain mix: τ = 0.5 and the 1e9 budget are literals shared with
    // the Spark plan; identical operation order inside round().
    "q83_domain_mix" ->
      """WITH per AS (SELECT source, count(*) AS n_docs,
        |                    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |             FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |               sum(sqrt(n_tokens)) AS z FROM per)
        |SELECT source, n_docs, n_tokens,
        |       round(n_tokens * 1.0 / total_tokens, 6) AS share,
        |       round(sqrt(n_tokens) / z, 6) AS mix_weight,
        |       round(1e9 * (sqrt(n_tokens) / z) / n_tokens, 4) AS epochs_at_1b
        |FROM per CROSS JOIN tot ORDER BY source""".stripMargin,

    // Duplicated-substring spans: string-window twin of the Spark
    // plan's xxhash64 windows (the q75 equivalence); gaps-and-islands
    // runs over 0-based window positions, identical on both engines.
    "q85_dup_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |p0 AS (SELECT doc_id, ws, unnest(range(1, greatest(len(ws)-7, 1)+1)) AS i FROM w),
        |p AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx, array_to_string(ws[i:i+7], ' ') AS win FROM p0),
        |d AS (SELECT win, count(*) AS n_occ FROM p GROUP BY win),
        |f AS (SELECT p.doc_id, p.idx, (d.n_occ >= 2) AS dup FROM p JOIN d USING (win)),
        |r AS (SELECT doc_id, idx,
        |        idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS grp
        |      FROM f WHERE dup),
        |runs AS (SELECT doc_id, CAST(max(run_len) AS BIGINT) AS max_dup_run FROM (
        |           SELECT doc_id, grp, count(*) AS run_len FROM r GROUP BY doc_id, grp)
        |         GROUP BY doc_id),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        |               CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        |        FROM f GROUP BY doc_id)
        |SELECT a.doc_id, n_windows, n_dup,
        |       coalesce(max_dup_run, 0) AS max_dup_run,
        |       round(n_dup * 1.0 / n_windows, 6) AS dup_cover
        |FROM agg a LEFT JOIN runs USING (doc_id) ORDER BY a.doc_id""".stripMargin,

    // Binary-quantized retrieval: the sign-bit band fold is the same
    // sequential big-endian reduce on both engines (list_reduce with a
    // prepended 0 == Spark's aggregate with init 0); Hamming via
    // bit_count(xor), all rank ties broken on vec_id, cosines rounded
    // before ranking.
    "q84_binary_quant_knn" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sig AS (SELECT vec_id, v,
        |  list_reduce(list_prepend(0::BIGINT, list_transform(v[1:16],  x -> CASE WHEN x > 0 THEN 1::BIGINT ELSE 0::BIGINT END)), (a, b) -> a*2 + b) AS b0,
        |  list_reduce(list_prepend(0::BIGINT, list_transform(v[17:32], x -> CASE WHEN x > 0 THEN 1::BIGINT ELSE 0::BIGINT END)), (a, b) -> a*2 + b) AS b1,
        |  list_reduce(list_prepend(0::BIGINT, list_transform(v[33:48], x -> CASE WHEN x > 0 THEN 1::BIGINT ELSE 0::BIGINT END)), (a, b) -> a*2 + b) AS b2,
        |  list_reduce(list_prepend(0::BIGINT, list_transform(v[49:64], x -> CASE WHEN x > 0 THEN 1::BIGINT ELSE 0::BIGINT END)), (a, b) -> a*2 + b) AS b3
        |  FROM e),
        |q AS (SELECT vec_id AS q_id, v AS qv, b0 AS qb0, b1 AS qb1, b2 AS qb2, b3 AS qb3
        |      FROM sig WHERE vec_id < 10),
        |ham AS (SELECT q_id, s.vec_id AS n_id, qv, s.v,
        |          CAST(bit_count(xor(qb0, b0)) + bit_count(xor(qb1, b1))
        |             + bit_count(xor(qb2, b2)) + bit_count(xor(qb3, b3)) AS BIGINT) AS hamming
        |        FROM sig s CROSS JOIN q WHERE s.vec_id <> q_id),
        |short AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY hamming, n_id) AS hrank FROM ham),
        |resc AS (SELECT q_id, n_id, hamming,
        |           round(list_cosine_similarity(qv, v), 6) + 0.0 AS cos_sim
        |         FROM short WHERE hrank <= 30),
        |rr AS (SELECT q_id, n_id, hamming, cos_sim,
        |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS BIGINT) AS rank
        |       FROM resc),
        |truth AS (SELECT q_id, n_id FROM (
        |            SELECT q_id, e.vec_id AS n_id,
        |              row_number() OVER (PARTITION BY q_id ORDER BY round(list_cosine_similarity(qv, e.v), 6) DESC, e.vec_id) AS trank
        |            FROM e CROSS JOIN q WHERE e.vec_id <> q_id)
        |          WHERE trank <= 10)
        |SELECT rr.q_id, rr.rank, rr.n_id, rr.hamming, rr.cos_sim,
        |       CAST(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_exact_topk
        |FROM rr LEFT JOIN truth t ON rr.q_id = t.q_id AND rr.n_id = t.n_id
        |WHERE rr.rank <= 10 ORDER BY rr.q_id, rr.rank""".stripMargin,

    "q80_event_zscore" ->
      """WITH t AS (
        |  SELECT event_id, user_id, event_type, value,
        |         count(value) OVER w AS n_prev,
        |         avg(value) OVER w AS mu,
        |         stddev_samp(value) OVER w AS sigma
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, event_type, value,
        |       round(mu, 6) AS trailing_mean, n_prev,
        |       round((value - mu) / sigma, 4) + 0.0 AS z
        |FROM t
        |WHERE n_prev >= 10 AND sigma > 1e-12 AND abs((value - mu) / sigma) >= 2.5
        |ORDER BY event_id""".stripMargin,

    // The training-data funnel: the same flag algebra as the Spark
    // plan, stage by stage — rank-among-survivors via (pass DESC, id)
    // window ordering in both engines.
    "q72_funnel" -> {
      val rateCase = s"CASE lang ${TextAnalysis.sampleRatePerMille
        .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")} ELSE 0 END"
      s"""WITH base AS (SELECT doc_id, lang, source,
         |                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
         |                     md5(text) AS content_md5,
         |                     ${tokenId("text")} % 1000 AS bucket,
         |                     ${tokenId("text")} AS prio
         |              FROM documents),
         |tokq AS (SELECT doc_id,
         |                least(len(list_distinct(ws))*1.0/greatest(len(ws),1)*2, 1.0)*0.5
         |                + CASE WHEN len(ws) BETWEEN 20 AND 400 THEN 0.3 ELSE 0 END
         |                + least(len(list_filter(ws, w -> w IN $stoplist))*1.0/greatest(len(ws),1)*3, 0.2) AS qual
         |         FROM (SELECT doc_id, ${tok("text")} AS ws FROM documents)),
         |w2 AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |bgr AS (SELECT doc_id, words[i.i] || ' ' || words[i.i+1] AS bigram
         |        FROM w2, LATERAL (SELECT unnest(range(1, len(words))) AS i) i),
         |cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bgr GROUP BY doc_id, bigram),
         |rep AS (SELECT doc_id, sum(c) AS nb, count(*) AS nd, max(c) AS tc FROM cnt GROUP BY doc_id),
         |sig AS (SELECT b.*, (round(t.qual, 6) >= 0.6) AS s1,
         |               coalesce(r.tc*1.0/r.nb <= 0.1 AND 1 - r.nd*1.0/r.nb <= 0.1, FALSE) AS rep_keep
         |        FROM base b JOIN tokq t USING (doc_id) LEFT JOIN rep r USING (doc_id)),
         |s2s AS (SELECT *, (s1 AND rep_keep) AS s2 FROM sig),
         |s3s AS (SELECT *, (s2 AND row_number() OVER (PARTITION BY content_md5
         |                     ORDER BY CAST(s2 AS INT) DESC, doc_id) = 1) AS s3 FROM s2s),
         |s4s AS (SELECT *, (s3 AND bucket < $rateCase) AS s4 FROM s3s),
         |s5s AS (SELECT *, (s4 AND row_number() OVER (PARTITION BY source
         |                     ORDER BY CAST(s4 AS INT) DESC, prio, doc_id) <= 15) AS s5 FROM s4s)
         |SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name,
         |       CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_ws) AS BIGINT) AS n_tokens FROM s5s
         |UNION ALL SELECT 1, 'quality', CAST(count(*) FILTER (WHERE s1) AS BIGINT),
         |       CAST(coalesce(sum(n_ws) FILTER (WHERE s1), 0) AS BIGINT) FROM s5s
         |UNION ALL SELECT 2, 'repetition', CAST(count(*) FILTER (WHERE s2) AS BIGINT),
         |       CAST(coalesce(sum(n_ws) FILTER (WHERE s2), 0) AS BIGINT) FROM s5s
         |UNION ALL SELECT 3, 'dedup', CAST(count(*) FILTER (WHERE s3) AS BIGINT),
         |       CAST(coalesce(sum(n_ws) FILTER (WHERE s3), 0) AS BIGINT) FROM s5s
         |UNION ALL SELECT 4, 'sample', CAST(count(*) FILTER (WHERE s4) AS BIGINT),
         |       CAST(coalesce(sum(n_ws) FILTER (WHERE s4), 0) AS BIGINT) FROM s5s
         |UNION ALL SELECT 5, 'source_cap', CAST(count(*) FILTER (WHERE s5) AS BIGINT),
         |       CAST(coalesce(sum(n_ws) FILTER (WHERE s5), 0) AS BIGINT) FROM s5s
         |ORDER BY stage""".stripMargin
    },

    // Cluster resolution over the q49 pair graph. The oracle computes
    // components as a recursive transitive closure (min reachable id);
    // Spark computes them iteratively (Graph.connectedComponents) —
    // same fixpoint, different engines' natural idiom.
    "q68_dedup_clusters" ->
      s"""WITH RECURSIVE $simhashCandCte,
         |pairs AS (SELECT id_a, id_b
         |          FROM cand JOIN e ea ON ea.vec_id = cand.id_a
         |                    JOIN e eb ON eb.vec_id = cand.id_b
         |          WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.45),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (SELECT DISTINCT a, a FROM edges
         |                 UNION
         |                 SELECT ed.a, reach.r FROM edges ed JOIN reach ON reach.id = ed.b),
         |comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
         |sizes AS (SELECT cluster, count(*) AS n_members FROM comp GROUP BY cluster)
         |SELECT c.id AS vec_id, c.cluster, s.n_members,
         |       CAST(CASE WHEN c.id = c.cluster THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
         |FROM comp c JOIN sizes s USING (cluster)
         |ORDER BY cluster, vec_id""".stripMargin,

    // Multi-signal dedup resolution: the q33 text-edge CTEs (thresholded
    // at jaccard >= 0.5, no LIMIT) unioned with the q68 embedding edges,
    // transitive closure, plus per-cluster signal-provenance flags.
    "q86_hybrid_dedup" ->
      s"""WITH RECURSIVE $simhashCandCte,
         |epairs AS (SELECT id_a, id_b
         |           FROM cand JOIN e ea ON ea.vec_id = cand.id_a
         |                     JOIN e eb ON eb.vec_id = cand.id_b
         |           WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.45),
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(ws)-3, 1)+1),
         |         i -> array_to_string(ws[i:i+3], ' ')))) AS shingle FROM w),
         |shsizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |rare AS (SELECT sh.doc_id, sh.shingle FROM sh
         |         JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 50) r
         |         ON sh.shingle = r.shingle),
         |tpairs0 AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter
         |            FROM rare x JOIN rare y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |            GROUP BY id_a, id_b),
         |tpairs AS (SELECT id_a, id_b FROM tpairs0
         |           JOIN shsizes sa ON tpairs0.id_a = sa.doc_id
         |           JOIN shsizes sb ON tpairs0.id_b = sb.doc_id
         |           WHERE round(inter / (sa.n_sh + sb.n_sh - inter), 6) >= 0.5),
         |upairs AS (SELECT id_a, id_b, max(st) AS sig_text, max(se) AS sig_emb FROM (
         |             SELECT id_a, id_b, 1 AS st, 0 AS se FROM tpairs
         |             UNION ALL SELECT id_a, id_b, 0 AS st, 1 AS se FROM epairs)
         |           GROUP BY id_a, id_b),
         |edges AS (SELECT id_a AS a, id_b AS b FROM upairs
         |          UNION SELECT id_b, id_a FROM upairs),
         |reach(id, r) AS (SELECT DISTINCT a, a FROM edges
         |                 UNION
         |                 SELECT ed.a, reach.r FROM edges ed JOIN reach ON reach.id = ed.b),
         |comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
         |csizes AS (SELECT cluster, count(*) AS n_members FROM comp GROUP BY cluster),
         |flags AS (SELECT c.cluster, CAST(max(u.sig_text) AS BIGINT) AS has_text,
         |                 CAST(max(u.sig_emb) AS BIGINT) AS has_emb
         |          FROM upairs u JOIN comp c ON u.id_a = c.id GROUP BY c.cluster)
         |SELECT c.id AS doc_id, c.cluster, s.n_members,
         |       CAST(CASE WHEN c.id = c.cluster THEN 1 ELSE 0 END AS BIGINT) AS is_canonical,
         |       f.has_text, f.has_emb
         |FROM comp c JOIN csizes s USING (cluster) JOIN flags f USING (cluster)
         |ORDER BY cluster, doc_id""".stripMargin,

    // Blocked kNN join: same candidates, both orientations, per-vector
    // top-3 by (cos desc, n_id).
    "q61_knn_join" ->
      s"""WITH $simhashCandCte,
         |directed AS (SELECT id_a AS q_id, id_b AS n_id FROM cand
         |             UNION ALL SELECT id_b, id_a FROM cand),
         |scored AS (SELECT q_id, n_id,
         |                  round(list_cosine_similarity(a.v, b.v), 6) + 0.0 AS cos_sim
         |           FROM directed JOIN e a ON a.vec_id = q_id
         |                         JOIN e b ON b.vec_id = n_id),
         |ranked AS (SELECT q_id, n_id, cos_sim,
         |                  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS BIGINT) AS rank
         |           FROM scored)
         |SELECT q_id, n_id, cos_sim, rank FROM ranked WHERE rank <= 3
         |ORDER BY q_id, rank""".stripMargin,

    // BPE application in rank order == greedy lowest-rank-first (a
    // merge's sides always have lower ranks than the merge), so the
    // oracle is a chain of non-overlapping replaces over '<tok>'-wrapped
    // segmentations, one per frozen merge rule (Bpe.pretrainedMerges —
    // same constants, same order).
    "q56_bpe_encode" -> {
      val chain = operators.Bpe.pretrainedMerges.foldLeft(
        s"regexp_replace(word, '(.)', '<\\1>', 'g')") { case (acc, (l, r)) =>
          s"replace($acc, '<$l><$r>', '<$l$r>')"
      }
      s"""WITH words AS (SELECT DISTINCT unnest(${tok("text")}) AS word FROM documents),
         |seg AS (SELECT word, $chain AS s FROM words)
         |SELECT word,
         |       replace(replace(replace(s, '><', ' '), '<', ''), '>', '') AS tokens,
         |       CAST(length(s) - length(replace(s, '<', '')) AS BIGINT) AS n_tokens
         |FROM seg ORDER BY word""".stripMargin
    },

    // Tokenizer fertility: the q56 replace-chain encodes each DISTINCT
    // word; occurrences probe the encoded vocabulary — identical
    // per-distinct-word shape on both engines.
    "q87_tokenizer_fertility" -> {
      val chain = operators.Bpe.pretrainedMerges.foldLeft(
        s"regexp_replace(word, '(.)', '<\\1>', 'g')") { case (acc, (l, r)) =>
          s"replace($acc, '<$l><$r>', '<$l$r>')"
      }
      s"""WITH words AS (SELECT lang, unnest(${tok("text")}) AS word FROM documents),
         |dv AS (SELECT DISTINCT word FROM words),
         |enc AS (SELECT word,
         |          CAST(length(s) - length(replace(s, '<', '')) AS BIGINT) AS n_sub,
         |          CAST(length(word) AS BIGINT) AS n_chars
         |        FROM (SELECT word, $chain AS s FROM dv))
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(n_sub) AS BIGINT) AS n_subtokens,
         |       round(sum(n_sub) * 1.0 / count(*), 6) AS fertility,
         |       round(sum(n_chars) * 1.0 / sum(n_sub), 6) AS bytes_per_token
         |FROM words JOIN enc USING (word)
         |GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q58_dropped_vocab" ->
      s"""WITH wc AS (
         |  SELECT word, count(*) AS cnt
         |  FROM (SELECT unnest(${tok("text")}) AS word FROM documents) GROUP BY word)
         |SELECT word, cnt FROM wc
         |WHERE word NOT IN (SELECT word FROM wc WHERE cnt >= (SELECT max(cnt) FROM wc) * 0.05)
         |ORDER BY word""".stripMargin,

    // The custom UDAF's output CAN be oracle-checked even though double
    // addition is merge-order-sensitive: the declared output rounds the
    // mean's norm to 4 decimals, orders of magnitude above the ~1e-15
    // relative wobble of reassociated FP sums (q05 already proves
    // per-dimension avg parity at round-6). DuckDB computes the same
    // mean per (label, dim) and folds it to the norm.
    "q50_vector_mean_agg" ->
      """WITH x AS (SELECT CAST(label AS BIGINT) AS label,
        |                  CAST(unnest(range(len(embedding))) AS BIGINT) AS pos,
        |                  unnest(CAST(embedding AS DOUBLE[])) AS val
        |           FROM embeddings),
        |m AS (SELECT label, pos, avg(val) AS a FROM x GROUP BY label, pos),
        |agg AS (SELECT label, CAST(count(*) AS BIGINT) AS dim,
        |               round(sqrt(sum(a * a)), 4) AS mean_norm
        |        FROM m GROUP BY label),
        |c AS (SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vectors
        |      FROM embeddings GROUP BY 1)
        |SELECT c.label, c.n_vectors, agg.dim, agg.mean_norm
        |FROM c JOIN agg ON c.label = agg.label
        |ORDER BY c.label""".stripMargin,

    // Line dedup: first-occurrence keep decided by min(doc_id*1e5+idx);
    // DuckDB rebuilds cleaned text with an ordered, filtered string_agg.
    "q59_line_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |segs AS (SELECT doc_id, CAST(i.i AS BIGINT) AS seg_idx,
        |                array_to_string(words[i.i*10+1 : i.i*10+10], ' ') AS seg,
        |                doc_id * 100000 + CAST(i.i AS BIGINT) AS occ_key
        |         FROM w, LATERAL (SELECT unnest(range(CAST(ceil(len(words)/10.0) AS BIGINT))) AS i) i),
        |firsts AS (SELECT seg, min(occ_key) AS first_key, count(*) AS n_occ
        |           FROM segs GROUP BY seg),
        |marked AS (SELECT s.doc_id, s.seg_idx, s.seg,
        |                  (f.n_occ = 1 OR s.occ_key = f.first_key) AS keep
        |           FROM segs s JOIN firsts f USING (seg))
        |SELECT doc_id, count(*) AS n_segments,
        |       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped,
        |       coalesce(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE keep), '') AS clean_text
        |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q60_chunk_dedup" ->
      """WITH chunks AS (
        |  SELECT md5(substring(text, CAST(i.i AS INT), 64)) AS chunk_md5,
        |         length(substring(text, CAST(i.i AS INT), 64)) AS n_b
        |  FROM documents,
        |       LATERAL (SELECT unnest(range(1, greatest(n_chars, 1) + 1, 64)) AS i) i
        |  WHERE length(substring(text, CAST(i.i AS INT), 64)) > 0)
        |SELECT chunk_md5, CAST(count(*) AS BIGINT) AS n_refs,
        |       CAST(max(n_b) AS BIGINT) AS n_bytes,
        |       CAST((count(*) - 1) * max(n_b) AS BIGINT) AS bytes_saved
        |FROM chunks GROUP BY chunk_md5 HAVING count(*) >= 2
        |ORDER BY chunk_md5""".stripMargin,

    "q62_corpus_split" ->
      s"""SELECT split, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM (SELECT lang, n_chars,
         |             CASE WHEN ${tokenId("text")} % 100 < 90 THEN 'train'
         |                  WHEN ${tokenId("text")} % 100 < 95 THEN 'validation'
         |                  ELSE 'test' END AS split
         |      FROM documents)
         |GROUP BY split, lang ORDER BY split, lang""".stripMargin,

    "q63_seq_packing" ->
      """WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |                  doc_id // 100 AS shard
        |           FROM documents),
        |c AS (SELECT shard, n_tokens,
        |             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
        |      FROM d)
        |SELECT CAST(shard * 100000 + cum // 256 AS BIGINT) AS bin,
        |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1 ORDER BY bin""".stripMargin,

    // Packing manifest: q63's exclusive-cumsum frame + per-bin slot
    // rank and in-bin offset; identical straddle semantics.
    "q90_packing_manifest" ->
      """WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |                  doc_id // 100 AS shard
        |           FROM documents),
        |c AS (SELECT doc_id, n_tokens, shard,
        |             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
        |      FROM d),
        |b AS (SELECT doc_id, n_tokens,
        |             CAST(shard * 100000 + cum // 256 AS BIGINT) AS bin,
        |             CAST(cum % 256 AS BIGINT) AS bin_offset
        |      FROM c)
        |SELECT bin, CAST(row_number() OVER (PARTITION BY bin ORDER BY doc_id) AS BIGINT) AS slot,
        |       doc_id, bin_offset, n_tokens
        |FROM b ORDER BY bin, slot""".stripMargin,

    // Mix-plan execution: q83's temperature weights as per-source keep
    // rates against a 10%-of-corpus token budget, q66's content-hash
    // Bernoulli draw; floor() pins the ppm threshold on both engines.
    "q91_mix_sample" ->
      s"""WITH per AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
         |             FROM documents GROUP BY source),
         |tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
         |               sum(sqrt(src_tokens)) AS z FROM per),
         |rates AS (SELECT source,
         |            CAST(floor(least(1.0, (total_tokens * 0.1) * (sqrt(src_tokens) / z)
         |                 / src_tokens) * 1000000) AS BIGINT) AS rate_ppm
         |          FROM per CROSS JOIN tot),
         |d AS (SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |             ${tokenId("text")} % 1000000 AS bucket
         |      FROM documents)
         |SELECT doc_id, d.source, n_tokens, rate_ppm
         |FROM d JOIN rates ON d.source = rates.source
         |WHERE bucket < rate_ppm ORDER BY doc_id""".stripMargin,

    "q64_tfidf" ->
      s"""WITH words AS (SELECT doc_id, unnest(${tok("text")}) AS word FROM documents),
         |tf AS (SELECT doc_id, word, count(*) AS n_occ FROM words GROUP BY doc_id, word),
         |tf2 AS (SELECT doc_id, word, n_occ,
         |               sum(n_occ) OVER (PARTITION BY doc_id) AS n_doc_tokens FROM tf),
         |dfreq AS (SELECT word, count(DISTINCT doc_id) AS df FROM words GROUP BY word),
         |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
         |scored AS (SELECT doc_id, word,
         |                  round((n_occ * 1.0 / n_doc_tokens) * ln(n_docs * 1.0 / df), 6) AS tfidf
         |           FROM tf2 JOIN dfreq USING (word) CROSS JOIN n),
         |ranked AS (SELECT doc_id, word, tfidf,
         |                  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS BIGINT) AS rank
         |           FROM scored)
         |SELECT doc_id, word, tfidf, rank FROM ranked WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin,

    // Repetition filter: bigram multiset per doc; both engines drop
    // single-word docs (no bigrams) identically.
    "q65_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |bg AS (SELECT doc_id, words[i.i] || ' ' || words[i.i+1] AS bigram
        |       FROM w, LATERAL (SELECT unnest(range(1, len(words))) AS i) i),
        |cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram),
        |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |               CAST(count(*) AS BIGINT) AS n_distinct,
        |               CAST(max(c) AS BIGINT) AS top_cnt
        |        FROM cnt GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, n_distinct,
        |       round(top_cnt * 1.0 / n_bigrams, 6) AS top_bigram_frac,
        |       round(1 - n_distinct * 1.0 / n_bigrams, 6) AS dup_bigram_frac,
        |       CAST(CASE WHEN top_cnt * 1.0 / n_bigrams <= 0.1
        |                  AND 1 - n_distinct * 1.0 / n_bigrams <= 0.1
        |            THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM agg ORDER BY doc_id""".stripMargin,

    // Per-source report card: q37's rounded quality intermediates +
    // q65's bigram CTE + q30's md5, rolled up by source; the repetition
    // keep compares ROUNDED fractions at the 0.1 boundary (the q65
    // contract).
    "q88_source_report" ->
      s"""WITH d AS (SELECT doc_id, source, lang, text,
         |             string_split(text, ' ') AS ws, ${tok("text")} AS words FROM documents),
         |s AS (SELECT doc_id, source, lang, md5(text) AS h,
         |        CAST(len(ws) AS BIGINT) AS n_ws, len(words) AS n_alpha,
         |        round(CAST(len(list_distinct(words)) AS DOUBLE) / greatest(len(words), 1), 6) AS ttr,
         |        round(CAST(len(list_filter(words, w -> w IN $stoplist)) AS DOUBLE)
         |              / greatest(len(words), 1), 6) AS stop_share,
         |        ws FROM d),
         |q AS (SELECT doc_id, source, lang, h, n_ws,
         |        round(least(ttr * 2.0, 1.0) * 0.5
         |              + CASE WHEN n_alpha BETWEEN 20 AND 400 THEN 0.3 ELSE 0.0 END
         |              + least(stop_share * 3.0, 0.2), 6) AS quality
         |      FROM s),
         |bg AS (SELECT doc_id, ws[i.i] || ' ' || ws[i.i+1] AS bigram
         |       FROM s, LATERAL (SELECT unnest(range(1, len(ws))) AS i) i),
         |cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram),
         |rep AS (SELECT doc_id, sum(c) AS nb, count(*) AS nd, max(c) AS tc FROM cnt GROUP BY doc_id),
         |j AS (SELECT q.*,
         |        CASE WHEN rep.nb > 0 THEN 1 ELSE 0 END AS rep_eval,
         |        CASE WHEN rep.nb > 0 AND round(tc * 1.0 / nb, 6) <= 0.1
         |                  AND round(1 - nd * 1.0 / nb, 6) <= 0.1 THEN 1 ELSE 0 END AS rep_keep
         |      FROM q LEFT JOIN rep USING (doc_id))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |       CAST(sum(n_ws) AS BIGINT) AS n_tokens,
         |       round(avg(quality), 6) AS avg_quality,
         |       CAST(sum(rep_eval) AS BIGINT) AS n_rep_eval,
         |       CAST(sum(rep_keep) AS BIGINT) AS n_rep_keep,
         |       round(sum(rep_keep) * 1.0 / greatest(sum(rep_eval), 1), 6) AS rep_keep_rate,
         |       round(1 - count(DISTINCT h) * 1.0 / count(*), 6) AS dup_rate
         |FROM j GROUP BY source ORDER BY source""".stripMargin,

    // Stratified sample / source caps: the rate map and cap literal are
    // single-sourced from TextAnalysis so both engines see one truth.
    "q66_strat_sample" ->
      s"""WITH d AS (SELECT doc_id, lang, ${tokenId("text")} % 1000 AS bucket FROM documents)
         |SELECT doc_id, lang, bucket FROM d
         |WHERE bucket < CASE lang ${TextAnalysis.sampleRatePerMille
                .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")} ELSE 0 END
         |ORDER BY doc_id""".stripMargin,

    // Efraimidis–Spirakis keys ranked as ln(u)/w (same order as
    // u^(1/w), no cross-engine pow); u from the shared content hash.
    "q97_weighted_sample" ->
      s"""WITH d AS (SELECT doc_id, n_chars, ${tok("text")} AS words,
         |                  ${tokenId("text")} % 1000000 AS uh
         |           FROM documents),
         |s AS (SELECT doc_id, uh,
         |        CAST(len(words) AS BIGINT) AS n_tokens,
         |        round(CAST(len(list_distinct(words)) AS DOUBLE) / greatest(len(words), 1), 6) AS ttr,
         |        round(CAST(len(list_filter(words, w -> w IN $stoplist)) AS DOUBLE)
         |              / greatest(len(words), 1), 6) AS stop_share
         |      FROM d),
         |q AS (SELECT doc_id, uh,
         |        round(least(ttr * 2.0, 1.0) * 0.5
         |              + CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 0.3 ELSE 0.0 END
         |              + least(stop_share * 3.0, 0.2), 6) AS quality
         |      FROM s)
         |SELECT doc_id, quality, round(ln((uh + 1.0) / 1000000.0) / quality, 6) AS es_key
         |FROM q WHERE quality > 0
         |ORDER BY es_key DESC, doc_id LIMIT 20""".stripMargin,

    "q101_retention_cohorts" ->
      """WITH e AS (SELECT user_id, date_trunc('week', ts) AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, week FROM e),
        |c AS (SELECT cohort_week,
        |             CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
        |             CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |      FROM a JOIN f USING (user_id) GROUP BY cohort_week, week_offset),
        |s AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size FROM f GROUP BY cohort_week)
        |SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week, week_offset, n_active,
        |       cohort_size, round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
        |FROM c JOIN s USING (cohort_week) ORDER BY cohort_week, week_offset""".stripMargin,

    // timestamps compare as integer MICROSECONDS on both engines — the
    // parquet is nanosecond and a nanos-vs-micros comparison could order
    // two sub-microsecond events differently
    "q102_event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |t1 AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN t1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN t2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id),
        |n AS (SELECT (SELECT count(*) FROM t1) AS n1,
        |             (SELECT count(*) FROM t2) AS n2,
        |             (SELECT count(*) FROM t3) AS n3)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
        |         CAST(n1 AS BIGINT) AS n_users,
        |         CAST(CASE WHEN n1 > 0 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS conversion FROM n
        |  UNION ALL SELECT 2, 'click_after_view', CAST(n2 AS BIGINT),
        |         CAST(CASE WHEN n1 > 0 THEN round(CAST(n2 AS DOUBLE) / n1, 6) ELSE 0.0 END AS DOUBLE) FROM n
        |  UNION ALL SELECT 3, 'purchase_after_click', CAST(n3 AS BIGINT),
        |         CAST(CASE WHEN n2 > 0 THEN round(CAST(n3 AS DOUBLE) / n2, 6) ELSE 0.0 END AS DOUBLE) FROM n)
        |ORDER BY stage""".stripMargin,

    "q100_padding_waste" -> {
      val ladder = (4 to 20).map(1L << _)
      val caseExpr = ladder.map(b => s"WHEN n <= $b THEN $b").mkString(" ")
      s"""WITH d AS (SELECT greatest(CAST(len(string_split(text, ' ')) AS BIGINT), 1) AS n
         |           FROM documents),
         |b AS (SELECT n, CAST(CASE $caseExpr ELSE ${ladder.last} END AS BIGINT) AS bucket FROM d)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n) AS BIGINT) AS sum_tokens,
         |       CAST(count(*) * bucket AS BIGINT) AS padded_tokens,
         |       round(1.0 - CAST(sum(n) AS DOUBLE) / (count(*) * bucket), 6) AS waste
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    "q98_snapshot_drift" ->
      s"""WITH d AS (SELECT lang, source,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
         |             ${tokenId("text")} % 100 AS bucket
         |           FROM documents),
         |o AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs_old,
         |             CAST(sum(n_ws) AS BIGINT) AS n_tokens_old
         |      FROM d WHERE bucket < 50 GROUP BY lang, source),
         |n AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs_new,
         |             CAST(sum(n_ws) AS BIGINT) AS n_tokens_new
         |      FROM d WHERE bucket >= 50 GROUP BY lang, source),
         |ot AS (SELECT CAST(coalesce(sum(n_tokens_old), 0) AS BIGINT) AS tot_old FROM o),
         |nt AS (SELECT CAST(coalesce(sum(n_tokens_new), 0) AS BIGINT) AS tot_new FROM n),
         |oo AS (SELECT o.*, round(CAST(n_tokens_old AS DOUBLE) / greatest(tot_old, 1), 6) AS share_old
         |       FROM o CROSS JOIN ot),
         |nn AS (SELECT n.*, round(CAST(n_tokens_new AS DOUBLE) / greatest(tot_new, 1), 6) AS share_new
         |       FROM n CROSS JOIN nt)
         |SELECT coalesce(oo.lang, nn.lang) AS lang,
         |       coalesce(oo.source, nn.source) AS source,
         |       CAST(coalesce(n_docs_old, 0) AS BIGINT) AS n_docs_old,
         |       CAST(coalesce(n_docs_new, 0) AS BIGINT) AS n_docs_new,
         |       coalesce(share_old, 0.0) AS share_old,
         |       coalesce(share_new, 0.0) AS share_new,
         |       round(abs(coalesce(share_new, 0.0) - coalesce(share_old, 0.0)), 6) AS share_drift,
         |       round(ln((coalesce(n_docs_new, 0) + 1.0) / (coalesce(n_docs_old, 0) + 1.0)), 6) + 0.0 AS doc_log_ratio
         |FROM oo FULL OUTER JOIN nn ON oo.lang = nn.lang AND oo.source = nn.source
         |ORDER BY lang, source""".stripMargin,

    // Snapshot content delta: the synthetic revision (removals % 13,
    // rewrites % 7, re-crawls % 11 under +1e12 ids) derives identically
    // on both engines; md5 hex agrees cross-engine (the q30 contract).
    "q106_snapshot_delta" ->
      """WITH rev AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000000000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0),
        |a AS (SELECT doc_id, md5(text) AS h FROM documents),
        |b AS (SELECT doc_id, md5(text) AS h FROM rev),
        |j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |        CASE WHEN a.doc_id IS NULL THEN 'added'
        |             WHEN b.doc_id IS NULL THEN 'removed'
        |             WHEN a.h <> b.h THEN 'changed'
        |             ELSE 'unchanged' END AS status
        |      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT doc_id, status FROM j WHERE status <> 'unchanged'
        |ORDER BY doc_id, status""".stripMargin,

    "q67_source_cap" ->
      s"""WITH p AS (SELECT doc_id, source, n_chars, ${tokenId("text")} AS prio FROM documents),
         |r AS (SELECT source, n_chars,
         |             row_number() OVER (PARTITION BY source ORDER BY prio, doc_id) AS rk
         |      FROM p)
         |SELECT source, count(*) AS n_docs,
         |       CAST(count(*) FILTER (WHERE rk <= 15) AS BIGINT) AS n_kept,
         |       CAST(coalesce(sum(n_chars) FILTER (WHERE rk <= 15), 0) AS BIGINT) AS chars_kept
         |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q34_knn_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
        |scored AS (SELECT q_id, e.vec_id AS n_id,
        |                  round(list_cosine_similarity(qv, v), 6) + 0.0 AS cos_sim
        |           FROM e CROSS JOIN q WHERE e.vec_id <> q_id),
        |ranked AS (SELECT q_id, n_id, cos_sim,
        |                  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS BIGINT) AS rank
        |           FROM scored)
        |SELECT q_id, n_id, cos_sim, rank FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // BM25 and the Spark side share one parenthesization:
    // idf * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl)), summed left-assoc,
    // rounded AFTER the sum — same float op order in both engines.
    "q95_bm25" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(string_split(coalesce(text, ''), ' '), w -> w <> '')) AS DOUBLE) AS dl,
        |         CAST(len(list_filter(string_split(coalesce(text, ''), ' '), w -> w = 'spark')) AS DOUBLE) AS tf0,
        |         CAST(len(list_filter(string_split(coalesce(text, ''), ' '), w -> w = 'join')) AS DOUBLE) AS tf1,
        |         CAST(len(list_filter(string_split(coalesce(text, ''), ' '), w -> w = 'stream')) AS DOUBLE) AS tf2
        |  FROM documents),
        |s AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
        |             CAST(count(*) FILTER (WHERE tf0 > 0) AS DOUBLE) AS df0,
        |             CAST(count(*) FILTER (WHERE tf1 > 0) AS DOUBLE) AS df1,
        |             CAST(count(*) FILTER (WHERE tf2 > 0) AS DOUBLE) AS df2
        |      FROM d),
        |scored AS (
        |  SELECT doc_id, round(
        |      ln(1.0 + (n_docs - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS bm25
        |  FROM d CROSS JOIN s)
        |SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    "q96_hybrid_rrf" ->
      """WITH d AS (SELECT doc_id,
        |             list_distinct(list_filter(string_split(coalesce(text, ''), ' '), w -> w <> '')) AS tset
        |           FROM documents),
        |e AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT d.doc_id, tset, v FROM d JOIN e USING (doc_id)),
        |q AS (SELECT doc_id AS q_id, tset AS q_tset, v AS qv FROM c WHERE doc_id < 10),
        |sc AS (SELECT q_id, c.doc_id,
        |         round(list_cosine_similarity(qv, v), 6) AS cos_sim,
        |         round(CAST(len(list_intersect(tset, q_tset)) AS DOUBLE)
        |               / greatest(len(list_distinct(list_concat(tset, q_tset))), 1), 6) AS jaccard
        |       FROM c CROSS JOIN q WHERE c.doc_id <> q_id),
        |r AS (SELECT q_id, doc_id, cos_sim, jaccard,
        |        CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS r_dense,
        |        CAST(row_number() OVER (PARTITION BY q_id ORDER BY jaccard DESC, doc_id) AS BIGINT) AS r_lex
        |      FROM sc),
        |f AS (SELECT q_id, doc_id,
        |        round(1.0 / (60.0 + r_dense) + 1.0 / (60.0 + r_lex), 6) AS rrf, r_dense, r_lex
        |      FROM r),
        |ranked AS (SELECT q_id, doc_id, rrf, r_dense, r_lex,
        |             CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
        |           FROM f)
        |SELECT q_id, rank, doc_id, rrf, r_dense, r_lex
        |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    "q99_knn_label_eval" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |                  CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS true_label, v AS qv FROM e WHERE vec_id < 50),
        |scored AS (SELECT q_id, true_label, e.label, e.vec_id,
        |                  round(list_cosine_similarity(qv, v), 6) AS cos_sim
        |           FROM e CROSS JOIN q WHERE e.vec_id <> q_id),
        |nbr AS (SELECT * FROM (
        |          SELECT q_id, true_label, label,
        |                 row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rk
        |          FROM scored) WHERE rk <= 5),
        |votes AS (SELECT q_id, true_label, label, CAST(count(*) AS BIGINT) AS n_votes
        |          FROM nbr GROUP BY q_id, true_label, label),
        |pred AS (SELECT q_id, true_label, label, n_votes,
        |                row_number() OVER (PARTITION BY q_id ORDER BY n_votes DESC, label) AS vote_rank
        |         FROM votes)
        |SELECT q_id AS vec_id, true_label, label AS pred_label, n_votes,
        |       CAST(CASE WHEN label = true_label THEN 1 ELSE 0 END AS BIGINT) AS correct
        |FROM pred WHERE vote_rank = 1 ORDER BY vec_id""".stripMargin,

    "q35_lang_profile" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       round(avg(n_chars), 4) AS avg_chars, min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q36_lang_id" ->
      s"""WITH d AS (SELECT doc_id, ${tok("text")} AS words FROM documents),
         |s AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens,
         |       round(CAST(len(list_filter(words, w -> w IN $stoplist)) AS DOUBLE)
         |             / greatest(len(words), 1), 6) AS stop_ratio FROM d)
         |SELECT doc_id, n_tokens, stop_ratio,
         |       CASE WHEN stop_ratio >= 0.08 THEN 'en' ELSE 'unk' END AS pred_lang
         |FROM s ORDER BY doc_id""".stripMargin,

    "q37_quality_score" ->
      s"""WITH d AS (SELECT doc_id, n_chars, ${tok("text")} AS words FROM documents),
         |s AS (SELECT doc_id,
         |        CAST(len(words) AS BIGINT) AS n_tokens,
         |        CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
         |        round(CAST(len(list_distinct(words)) AS DOUBLE) / greatest(len(words), 1), 6) AS ttr,
         |        round(CAST(n_chars AS DOUBLE) / greatest(len(words), 1), 6) AS avg_token_len,
         |        round(CAST(len(list_filter(words, w -> w IN $stoplist)) AS DOUBLE)
         |              / greatest(len(words), 1), 6) AS stop_share
         |      FROM d)
         |SELECT doc_id, n_tokens, n_distinct, ttr, avg_token_len, stop_share,
         |       round(least(ttr * 2.0, 1.0) * 0.5
         |             + CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 0.3 ELSE 0.0 END
         |             + least(stop_share * 3.0, 0.2), 6) AS quality
         |FROM s ORDER BY doc_id""".stripMargin,

    // per-source OLS: the q37 feature grammar -> exact 1e-6 grid ints
    // -> HUGEINT Gram moments -> the SAME Cramer/R-squared expression
    // tree as the Spark side (doubles appear only after aggregation);
    // + 0.0 on every signed rounded output (Spark round is BigDecimal
    // +0.0, DuckDB round preserves IEEE -0.0)
    "q253_ols_quality" ->
      s"""WITH d AS (SELECT source, n_chars, ${tok("text")} AS words
         |  FROM documents WHERE text IS NOT NULL),
         |f AS (SELECT source,
         |        CAST(len(words) AS BIGINT) AS n_tokens,
         |        round(CAST(len(list_distinct(words)) AS DOUBLE)
         |          / greatest(len(words), 1), 6) AS ttr,
         |        round(CAST(len(list_filter(words, w -> w IN $stoplist)) AS DOUBLE)
         |          / greatest(len(words), 1), 6) AS stop_share
         |      FROM d),
         |g AS (SELECT source,
         |        CAST(round(ttr * 1000000) AS BIGINT) AS t,
         |        CAST(round(stop_share * 1000000) AS BIGINT) AS s,
         |        CAST(round(round(least(ttr * 2.0, 1.0) * 0.5
         |          + CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 0.3 ELSE 0.0 END
         |          + least(stop_share * 3.0, 0.2), 6) * 1000000) AS BIGINT) AS y
         |      FROM f),
         |m AS (SELECT source, count(*) AS n,
         |        sum(CAST(t AS HUGEINT)) AS st, sum(CAST(s AS HUGEINT)) AS ss,
         |        sum(CAST(y AS HUGEINT)) AS sy,
         |        sum(t * t) AS stt, sum(s * s) AS sss, sum(t * s) AS sts,
         |        sum(t * y) AS sty, sum(s * y) AS ssy, sum(y * y) AS syy
         |      FROM g GROUP BY 1),
         |u AS (SELECT source, CAST(n AS DOUBLE) AS n,
         |        CAST(st AS DOUBLE) / 1e6 AS st, CAST(ss AS DOUBLE) / 1e6 AS ss,
         |        CAST(sy AS DOUBLE) / 1e6 AS sy,
         |        CAST(stt AS DOUBLE) / 1e12 AS stt, CAST(sss AS DOUBLE) / 1e12 AS sss,
         |        CAST(sts AS DOUBLE) / 1e12 AS sts, CAST(sty AS DOUBLE) / 1e12 AS sty,
         |        CAST(ssy AS DOUBLE) / 1e12 AS ssy, CAST(syy AS DOUBLE) / 1e12 AS syy
         |      FROM m),
         |dets AS (SELECT *,
         |    n * (stt * sss - sts * sts) - st * (st * sss - sts * ss)
         |      + ss * (st * sts - stt * ss) AS det,
         |    sy * (stt * sss - sts * sts) - st * (sty * sss - sts * ssy)
         |      + ss * (sty * sts - stt * ssy) AS det0,
         |    n * (sty * sss - sts * ssy) - sy * (st * sss - sts * ss)
         |      + ss * (st * ssy - sty * ss) AS det1,
         |    n * (stt * ssy - sty * sts) - st * (st * ssy - sty * ss)
         |      + sy * (st * sts - stt * ss) AS det2
         |  FROM u),
         |sol AS (SELECT *,
         |    CASE WHEN det <> 0.0 THEN det0 / det END AS b0,
         |    CASE WHEN det <> 0.0 THEN det1 / det END AS b1,
         |    CASE WHEN det <> 0.0 THEN det2 / det END AS b2
         |  FROM dets),
         |fit AS (SELECT *,
         |    syy - b0 * sy - b1 * sty - b2 * ssy AS sse,
         |    syy - sy * sy / n AS sst
         |  FROM sol)
         |SELECT source, CAST(n AS BIGINT) AS n_docs,
         |  round(b0, 6) + 0.0 AS b_intercept,
         |  round(b1, 6) + 0.0 AS b_ttr,
         |  round(b2, 6) + 0.0 AS b_stop_share,
         |  CASE WHEN sst > 0 THEN round(1.0 - sse / sst, 6) + 0.0 END AS r2
         |FROM fit ORDER BY source""".stripMargin,

    "q38_fingerprint" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws, ${tok("text")} AS words FROM documents)
         |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_ws_tokens,
         |       CAST(len(words) AS BIGINT) AS n_alpha_tokens,
         |       ${fingerprint("words")} AS fp
         |FROM d ORDER BY doc_id""".stripMargin,

    // winnowed fingerprints: positional poly-131 gram hashes (the q38
    // chain, windowed — `gi` as the outer lambda var, the helpers' `i`/
    // `wrd` stay inner), per-w window-min selection, df<=50-capped pair
    // joins; w / window widths interpolated from TextAnalysis.WinnowWindows
    "q250_winnow_fingerprint" -> {
      val k = TextAnalysis.WinnowK
      val sigs = TextAnalysis.WinnowWindows.map { w =>
        s"""s$w AS (SELECT doc_id, gh,
           |  list_distinct(list_transform(range(1, greatest(len(gh)-$w+1, 1)+1),
           |    j -> list_aggregate(gh[j:j+${w - 1}], 'min'))) AS sig FROM g),
           |c$w AS (SELECT count(*) AS n_docs, sum(len(list_distinct(gh))) AS n_gram_hashes,
           |        sum(len(sig)) AS n_selected FROM s$w),
           |wf$w AS (SELECT s.doc_id, unnest(sig) AS h FROM s$w s),
           |wr$w AS (SELECT wf.doc_id, wf.h FROM wf$w wf JOIN rare USING (h)),
           |wn$w AS (SELECT count(*) AS n_winnow_pairs FROM (
           |  SELECT DISTINCT a.doc_id, b.doc_id
           |  FROM wr$w a JOIN wr$w b ON a.h = b.h AND a.doc_id < b.doc_id) t)""".stripMargin
      }.mkString(",\n")
      val rows = TextAnalysis.WinnowWindows.map { w =>
        s"""SELECT CAST($w AS BIGINT) AS w, CAST(n_docs AS BIGINT) AS n_docs,
           |  CAST(n_gram_hashes AS BIGINT) AS n_gram_hashes,
           |  CAST(n_selected AS BIGINT) AS n_selected,
           |  round(n_selected * 1.0 / n_gram_hashes, 6) AS keep_ratio,
           |  CAST(n_truth_pairs AS BIGINT) AS n_truth_pairs,
           |  CAST(n_winnow_pairs AS BIGINT) AS n_winnow_pairs,
           |  CASE WHEN n_truth_pairs > 0
           |    THEN round(n_winnow_pairs * 1.0 / n_truth_pairs, 6) END AS pair_recall
           |FROM c$w, wn$w, tn""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |g AS (SELECT doc_id, list_transform(range(1, greatest(len(ws)-${k - 1}, 1)+1),
         |  gi -> ${fingerprint(s"ws[gi:gi+${k - 1}]")}) AS gh FROM w),
         |f AS (SELECT doc_id, unnest(list_distinct(gh)) AS h FROM g),
         |rare AS (SELECT h FROM f GROUP BY h HAVING count(*) <= 50),
         |fr AS (SELECT f.doc_id, f.h FROM f JOIN rare USING (h)),
         |tn AS (SELECT count(*) AS n_truth_pairs FROM (
         |  SELECT DISTINCT a.doc_id, b.doc_id
         |  FROM fr a JOIN fr b ON a.h = b.h AND a.doc_id < b.doc_id) t),
         |$sigs
         |$rows
         |ORDER BY w""".stripMargin
    },

    "q47_edit_distance" ->
      """WITH d AS (SELECT doc_id,
        |  regexp_replace(substring(text, 1, 40), '[^\x20-\x7e]', '_', 'g') AS prefix
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
        |FROM d a JOIN d b ON a.doc_id + 1 = b.doc_id
        |ORDER BY id_a""".stripMargin,

    "q39_multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |       CAST(CASE WHEN octet_length(CAST(text AS BLOB)) > 0 THEN ascii(text[1]) ELSE -1 END AS BIGINT) AS first_byte,
        |       CAST(64 + octet_length(CAST(text AS BLOB)) % 512 AS BIGINT) AS width,
        |       CAST(64 + (octet_length(CAST(text AS BLOB)) * 31) % 512 AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Media resize + feature extraction: the q39 stub dims letterboxed
    // to a 224 budget (integer div on both engines) + code-point
    // moments from INTEGER sums; floor(x*1e6+0.5) is the q76 rounding
    // contract.
    "q93_media_features" ->
      """WITH d AS (SELECT doc_id, text,
        |             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS nb,
        |             CAST(length(text) AS BIGINT) AS nc
        |      FROM documents),
        |m AS (SELECT doc_id, nb AS n_bytes,
        |             CAST(64 + nb % 512 AS BIGINT) AS width,
        |             CAST(64 + (nb * 31) % 512 AS BIGINT) AS height,
        |             nc, text FROM d),
        |s AS (SELECT doc_id, n_bytes, width, height, nc,
        |        CAST(coalesce(list_sum(list_transform(range(1, nc + 1),
        |             i -> CAST(ascii(text[i]) AS BIGINT))), 0) AS BIGINT) AS sc,
        |        CAST(coalesce(list_sum(list_transform(range(1, nc + 1),
        |             i -> CAST(ascii(text[i]) AS BIGINT) * CAST(ascii(text[i]) AS BIGINT))), 0) AS BIGINT) AS sc2
        |      FROM m)
        |SELECT doc_id, n_bytes, width, height,
        |       CAST(CASE WHEN greatest(width, height) <= 224 THEN width
        |                 ELSE width * 224 // greatest(width, height) END AS BIGINT) AS out_w,
        |       CAST(CASE WHEN greatest(width, height) <= 224 THEN height
        |                 ELSE height * 224 // greatest(width, height) END AS BIGINT) AS out_h,
        |       floor((CASE WHEN nc > 0 THEN sc * 1.0 / nc ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS code_mean,
        |       floor((CASE WHEN nc > 0 THEN sc2 * 1.0 / nc
        |                  - (sc * 1.0 / nc) * (sc * 1.0 / nc) ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS code_var
        |FROM s ORDER BY doc_id""".stripMargin,

    "q46_frame_sample" ->
      s"""WITH d AS (SELECT doc_id,
         |  list_transform(range(1, greatest(n_chars - 15, 1)+1, 64), i -> substring(text, i, 16)) AS frames
         |  FROM documents WHERE n_chars >= 16)
         |SELECT doc_id, CAST(pos AS BIGINT) AS frame_idx, ${tokenId("frame")} AS frame_hash
         |FROM (SELECT doc_id, unnest(range(len(frames))) AS pos, unnest(frames) AS frame FROM d) t
         |ORDER BY doc_id, frame_idx""".stripMargin,

    // exact distinct-user pair counts from the (user, type) distinct
    // set; jaccard/lift derived from exact integers on both sides
    "q166_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events
        |    WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |singles AS (SELECT event_type, count(*) AS cnt FROM ut GROUP BY 1),
        |tot AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
        |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |            count(*) AS n_both
        |          FROM ut a JOIN ut b
        |            ON a.user_id = b.user_id AND a.event_type < b.event_type
        |          GROUP BY 1, 2)
        |SELECT type_a, type_b, sa.cnt AS users_a, sb.cnt AS users_b,
        |       n_both AS users_both,
        |       round(CAST(n_both AS DOUBLE)
        |         / CAST(sa.cnt + sb.cnt - n_both AS DOUBLE), 6) AS jaccard,
        |       round(CAST(n_both AS DOUBLE) * n_users
        |         / (CAST(sa.cnt AS DOUBLE) * CAST(sb.cnt AS DOUBLE)), 4) AS lift
        |FROM pairs JOIN singles sa ON sa.event_type = type_a
        |           JOIN singles sb ON sb.event_type = type_b
        |CROSS JOIN tot ORDER BY type_a, type_b""".stripMargin,

    // OLS sufficient statistics as exact integers (HUGEINT here,
    // decimal(38,0) in Spark — the q155 rule); LOO slope from
    // totals-minus-own, doubles derived at the last moment
    "q167_loo_influence" ->
      """WITH d AS (SELECT source,
        |      CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
        |      CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y
        |    FROM documents WHERE text IS NOT NULL AND length(text) > 0),
        |s AS (SELECT source, count(*) AS cnt, sum(x) AS sx, sum(y) AS sy,
        |      sum(x * y) AS sxy, sum(x * x) AS sxx FROM d GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS tcnt, sum(sx) AS tsx, sum(sy) AS tsy,
        |        sum(sxy) AS tsxy, sum(sxx) AS tsxx FROM s),
        |j AS (SELECT source, cnt,
        |        CAST(tcnt AS DOUBLE) AS fn, CAST(tsx AS DOUBLE) AS fsx,
        |        CAST(tsy AS DOUBLE) AS fsy, CAST(tsxy AS DOUBLE) AS fsxy,
        |        CAST(tsxx AS DOUBLE) AS fsxx,
        |        CAST(tcnt - cnt AS DOUBLE) AS ln2, CAST(tsx - sx AS DOUBLE) AS lsx,
        |        CAST(tsy - sy AS DOUBLE) AS lsy, CAST(tsxy - sxy AS DOUBLE) AS lsxy,
        |        CAST(tsxx - sxx AS DOUBLE) AS lsxx
        |      FROM s CROSS JOIN tot),
        |k AS (SELECT source, cnt,
        |        CASE WHEN fn * fsxx - fsx * fsx <> 0.0 THEN
        |          (fn * fsxy - fsx * fsy) / (fn * fsxx - fsx * fsx) END
        |          AS slope_full,
        |        CASE WHEN ln2 * lsxx - lsx * lsx <> 0.0 THEN
        |          (ln2 * lsxy - lsx * lsy) / (ln2 * lsxx - lsx * lsx) END
        |          AS slope_loo
        |      FROM j)
        |SELECT source, cnt AS n_docs, round(slope_full, 6) + 0.0 AS slope_full,
        |       round(slope_loo, 6) + 0.0 AS slope_loo,
        |       round(slope_loo - slope_full, 6) + 0.0 AS influence,
        |       CAST(row_number() OVER (ORDER BY abs(slope_loo - slope_full) DESC,
        |         source ASC) AS BIGINT) AS infl_rank
        |FROM k ORDER BY source""".stripMargin,

    // Zipf coverage curve: exact integer histogram + vocabulary-bounded
    // running sum (window sum CAST AS BIGINT — the q63 HUGEINT rule)
    "q168_vocab_coverage" -> {
      val cuts = operators.TextAnalysis.VocabCutoffs.mkString(", ")
      s"""WITH t AS (SELECT unnest(${tok("text")}) AS word FROM documents
         |    WHERE text IS NOT NULL),
         |h AS (SELECT word, count(*) AS cnt FROM t GROUP BY 1),
         |r AS (SELECT word, cnt,
         |        CAST(row_number() OVER (ORDER BY cnt DESC, word ASC) AS BIGINT) AS rk,
         |        CAST(sum(cnt) OVER (ORDER BY cnt DESC, word ASC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |      FROM h),
         |tot AS (SELECT max(cum) AS total, max(rk) AS n_types FROM r)
         |SELECT rk AS vocab_size, cum AS covered_tokens, total AS total_tokens,
         |       round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS coverage,
         |       round(CAST(total - cum AS DOUBLE) * 10000.0
         |         / CAST(total AS DOUBLE), 2) AS oov_per_10k
         |FROM r CROSS JOIN tot WHERE rk IN ($cuts) OR rk = n_types
         |ORDER BY vocab_size""".stripMargin
    },

    // BRUTE-FORCE twin of the prefix-filtered exact join: the oracle
    // proves COMPLETENESS (every τ-pair present), which is the whole
    // claim prefix filtering makes; string shingles here == hash
    // shingles there (equality-only use, the q33 precedent)
    "q169_setsim_join" -> {
      val tau = operators.Dedup.SetSimTau
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |    WHERE text IS NOT NULL),
         |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |         range(1, greatest(len(ws)-3, 1)+1),
         |         i -> array_to_string(ws[i:i+3], ' ')))) AS shingle FROM w),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |pairs AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter
         |          FROM sh x JOIN sh y
         |            ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2)
         |SELECT id_a, id_b, CAST(sa.n AS BIGINT) AS size_a,
         |       CAST(sb.n AS BIGINT) AS size_b, CAST(inter AS BIGINT) AS inter,
         |       round(inter / (sa.n + sb.n - inter), 6) AS jaccard
         |FROM pairs JOIN sizes sa ON id_a = sa.doc_id
         |           JOIN sizes sb ON id_b = sb.doc_id
         |WHERE inter / (sa.n + sb.n - inter) >= $tau
         |ORDER BY id_a, id_b""".stripMargin
    },

    // one CTE chain per join scenario (WITH inside a parenthesized
    // subquery), UNION ALL'd; mirrors Skew.q170JoinCardEst's estimator
    // algebra term for term — exact integer stats, doubles derived last
    "q170_join_card_est" -> {
      val hhN = operators.Skew.CardEstHH
      def sc(name: String, relA: String, relB: String): String =
        s"""(WITH ca AS (SELECT k, count(*) AS c FROM ($relA) WHERE k IS NOT NULL GROUP BY 1),
           |cb AS (SELECT k, count(*) AS c FROM ($relB) WHERE k IS NOT NULL GROUP BY 1),
           |sa AS (SELECT CAST(sum(c) AS BIGINT) AS na, count(*) AS da FROM ca),
           |sb AS (SELECT CAST(sum(c) AS BIGINT) AS nb, count(*) AS db FROM cb),
           |act AS (SELECT CAST(sum(ca.c * cb.c) AS BIGINT) AS actual_rows
           |        FROM ca JOIN cb USING (k)),
           |hha AS (SELECT k, c FROM ca ORDER BY c DESC, k ASC LIMIT $hhN),
           |hhb AS (SELECT k, c FROM cb ORDER BY c DESC, k ASC LIMIT $hhN),
           |hh AS (SELECT
           |    coalesce(CAST(sum(CASE WHEN a.c IS NOT NULL AND b.c IS NOT NULL
           |      THEN a.c * b.c END) AS BIGINT), 0) AS hh_prod,
           |    coalesce(CAST(sum(CASE WHEN a.c IS NOT NULL AND b.c IS NULL
           |      THEN a.c END) AS BIGINT), 0) AS hh_a_only,
           |    coalesce(CAST(sum(CASE WHEN b.c IS NOT NULL AND a.c IS NULL
           |      THEN b.c END) AS BIGINT), 0) AS hh_b_only,
           |    coalesce(CAST(sum(a.c) AS BIGINT), 0) AS hh_a_rows,
           |    coalesce(CAST(sum(b.c) AS BIGINT), 0) AS hh_b_rows,
           |    CAST(sum(CASE WHEN a.c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hha,
           |    CAST(sum(CASE WHEN b.c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hhb,
           |    CAST(sum(CASE WHEN a.c IS NOT NULL AND b.c IS NOT NULL
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_match
           |  FROM hha a FULL JOIN hhb b ON a.k = b.k),
           |est AS (SELECT '$name' AS join_name, na AS n_a, da AS ndv_a,
           |    nb AS n_b, db AS ndv_b, actual_rows,
           |    CAST(round(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
           |      / CAST(greatest(da, db) AS DOUBLE)) AS BIGINT) AS est_sysr,
           |    CAST(round(CAST(hh_prod AS DOUBLE)
           |      + CAST(hh_a_only AS DOUBLE) * (CASE WHEN db > n_hhb
           |          THEN CAST(nb - hh_b_rows AS DOUBLE) / CAST(db - n_hhb AS DOUBLE)
           |          ELSE 0.0 END)
           |      + CAST(hh_b_only AS DOUBLE) * (CASE WHEN da > n_hha
           |          THEN CAST(na - hh_a_rows AS DOUBLE) / CAST(da - n_hha AS DOUBLE)
           |          ELSE 0.0 END)
           |      + CAST(greatest(0, least(da, db) - (n_hha + n_hhb - n_match)) AS DOUBLE)
           |        * (CASE WHEN da > n_hha
           |            THEN CAST(na - hh_a_rows AS DOUBLE) / CAST(da - n_hha AS DOUBLE)
           |            ELSE 0.0 END)
           |        * (CASE WHEN db > n_hhb
           |            THEN CAST(nb - hh_b_rows AS DOUBLE) / CAST(db - n_hhb AS DOUBLE)
           |            ELSE 0.0 END)) AS BIGINT) AS est_hh
           |  FROM hh CROSS JOIN sa CROSS JOIN sb CROSS JOIN act)
           |SELECT join_name, n_a, ndv_a, n_b, ndv_b, actual_rows, est_sysr, est_hh,
           |       round(CAST(est_sysr - actual_rows AS DOUBLE) * 100.0
           |         / CAST(actual_rows AS DOUBLE), 2) AS err_sysr_pct,
           |       round(CAST(est_hh - actual_rows AS DOUBLE) * 100.0
           |         / CAST(actual_rows AS DOUBLE), 2) AS err_hh_pct
           |FROM est)""".stripMargin
      Seq(
        sc("events_self_type", "SELECT event_type AS k FROM events",
          "SELECT event_type AS k FROM events"),
        sc("events_self_user", "SELECT user_id AS k FROM events",
          "SELECT user_id AS k FROM events"),
        sc("orders_x_lineitem", "SELECT o_orderkey AS k FROM orders",
          "SELECT l_orderkey AS k FROM lineitem"),
        sc("part_x_lineitem", "SELECT p_partkey AS k FROM part",
          "SELECT l_partkey AS k FROM lineitem"))
        .map(q => s"SELECT * FROM $q")
        .mkString("", "\nUNION ALL\n", "\nORDER BY join_name")
    },

    // every walk transition replayed bit-for-bit: the multiply-mod
    // chooser (q153/q164 chain) mod out-degree lands in a successor's
    // cumulative-count interval; one unrolled CTE per step (the
    // q110/q147/q163 fixed-iteration rule)
    "q171_deepwalk" -> {
      val (ns, nw, nt) = (operators.Graph.WalkStarts,
        operators.Graph.WalksPerStart, operators.Graph.WalkSteps)
      def mm(key: String, salt: String): String =
        s"(((($key) % 1000000007) * 1000003 % 1000000007 + ($salt) * 7919) " +
          s"% 1000000007) * 69069 % 1000000007"
      val steps = (1 to nt).map { t =>
        val r = s"(${mm(tokenId("s.cur"), s"s.walk * 100 + $t")}) % e.tot"
        s"""s$t AS (SELECT s.start, s.walk, coalesce(e.u, s.cur) AS cur,
           |  CASE WHEN e.u IS NULL THEN s.path
           |       ELSE s.path || ' ' || e.u END AS path
           |FROM s${t - 1} s LEFT JOIN ed e ON e.v = s.cur
           |  AND $r >= e.cum - e.cnt AND $r < e.cum)""".stripMargin
      }.mkString(",\n")
      s"""WITH d AS (SELECT ${tok("text")} AS ws FROM documents
         |    WHERE text IS NOT NULL),
         |bg AS (SELECT unnest(list_transform(range(1, len(ws)),
         |         i -> {'v': ws[i], 'u': ws[i+1]})) AS p
         |       FROM d WHERE len(ws) >= 2),
         |e0 AS (SELECT p['v'] AS v, p['u'] AS u, count(*) AS cnt
         |       FROM bg GROUP BY 1, 2),
         |ed AS (SELECT v, u, cnt,
         |         CAST(sum(cnt) OVER (PARTITION BY v ORDER BY cnt DESC, u ASC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |         CAST(sum(cnt) OVER (PARTITION BY v) AS BIGINT) AS tot
         |       FROM e0),
         |tw AS (SELECT unnest(ws) AS word FROM d),
         |st AS (SELECT word AS start FROM (SELECT word, count(*) AS c FROM tw
         |        GROUP BY 1 ORDER BY c DESC, word ASC LIMIT $ns)),
         |s0 AS (SELECT start, CAST(unnest(range(0, $nw)) AS BIGINT) AS walk,
         |         start AS cur, start AS path FROM st),
         |$steps
         |SELECT start AS start_word, walk AS walk_id, path,
         |       CAST(len(string_split(path, ' ')) AS BIGINT) AS n_nodes
         |FROM s$nt ORDER BY start_word, walk_id""".stripMargin
    },

    // PAV via the minimax closed form over the O(bins) cell frame —
    // interval means from exact integer cumulative sums on both sides
    "q172_isotonic_fit" -> {
      val nb = operators.Stats.IsoBins
      s"""WITH sc AS (SELECT CAST(embedding[1] AS DOUBLE) AS s,
         |      CASE WHEN label = 1 THEN 1 ELSE 0 END AS pos
         |    FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0
         |      AND label IS NOT NULL),
         |span AS (SELECT min(s) AS lo, max(s) AS hi FROM sc),
         |b AS (SELECT CASE WHEN hi > lo THEN
         |        CAST(least(floor((s - lo) / ((hi - lo) / $nb)),
         |          CAST(${nb - 1} AS DOUBLE)) AS BIGINT)
         |        ELSE 0 END AS bin, pos, lo, hi
         |      FROM sc CROSS JOIN span),
         |g AS (SELECT bin, lo, hi, count(*) AS n,
         |        CAST(sum(pos) AS BIGINT) AS np FROM b GROUP BY 1, 2, 3),
         |idx AS (SELECT bin, lo, hi, n, np,
         |        CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS i,
         |        CAST(sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
         |          AND CURRENT ROW) AS BIGINT) AS cn,
         |        CAST(sum(np) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
         |          AND CURRENT ROW) AS BIGINT) AS cp
         |        FROM g),
         |jf AS (SELECT i AS j, cn - n AS cn0, cp - np AS cp0 FROM idx),
         |kf AS (SELECT i AS k, cn AS cnk, cp AS cpk FROM idx),
         |means AS (SELECT j, k,
         |            CAST(cpk - cp0 AS DOUBLE) / CAST(cnk - cn0 AS DOUBLE) AS m
         |          FROM jf CROSS JOIN kf WHERE j <= k),
         |peri AS (SELECT ii.i, means.j, means.m FROM means
         |         CROSS JOIN (SELECT i FROM idx) ii
         |         WHERE means.j <= ii.i AND means.k >= ii.i),
         |inner1 AS (SELECT i, j, min(m) AS mn FROM peri GROUP BY 1, 2),
         |iso AS (SELECT i, max(mn) AS iso FROM inner1 GROUP BY 1)
         |SELECT idx.i AS bin_idx,
         |       round(lo + CAST(bin AS DOUBLE) * ((hi - lo) / $nb), 6) AS s_lo,
         |       round(lo + CAST(bin + 1 AS DOUBLE) * ((hi - lo) / $nb), 6) AS s_hi,
         |       n, np AS positives,
         |       round(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
         |       round(iso.iso, 6) AS iso_rate
         |FROM idx JOIN iso ON idx.i = iso.i
         |ORDER BY bin_idx""".stripMargin
    },

    // KM survival: exact integer risk/event counts; Π(1−d/n) as
    // exp(Σ ln f) over the SAME ordered window both engines evaluate
    // sequentially; a zero factor short-circuits to exactly 0
    "q173_survival_km" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |oe AS (SELECT max(us) AS obs_end FROM ev),
        |fv AS (SELECT user_id, min(us) AS fv FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |fp AS (SELECT e.user_id, min(e.us) AS fp FROM ev e
        |       JOIN fv ON e.user_id = fv.user_id
        |       WHERE e.event_type = 'purchase' AND e.us > fv.fv GROUP BY 1),
        |subj AS (SELECT CAST(floor((CASE WHEN fp.fp IS NOT NULL THEN fp.fp - fv.fv
        |            ELSE oe.obs_end - fv.fv END) / 3600000000) AS BIGINT) AS t_h,
        |            CASE WHEN fp.fp IS NOT NULL THEN 1 ELSE 0 END AS ev
        |         FROM fv LEFT JOIN fp ON fv.user_id = fp.user_id CROSS JOIN oe),
        |g AS (SELECT t_h, CAST(sum(ev) AS BIGINT) AS n_events,
        |        CAST(sum(1 - ev) AS BIGINT) AS n_censored FROM subj GROUP BY 1),
        |r AS (SELECT *, CAST(sum(n_events + n_censored) OVER ()
        |        - coalesce(sum(n_events + n_censored) OVER (ORDER BY t_h
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS n_risk FROM g),
        |f AS (SELECT *, CAST(n_risk - n_events AS DOUBLE) / n_risk AS factor
        |      FROM r WHERE n_events > 0),
        |k AS (SELECT *, max(CASE WHEN factor <= 0 THEN 1 ELSE 0 END) OVER
        |        (ORDER BY t_h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS hit_zero,
        |        sum(CASE WHEN factor > 0 THEN ln(factor) ELSE 0 END) OVER
        |        (ORDER BY t_h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS lsum FROM f)
        |SELECT t_h AS t_hours, n_risk, n_events, n_censored,
        |       CASE WHEN hit_zero = 1 THEN 0.0 ELSE round(exp(lsum), 6) END AS surv
        |FROM k ORDER BY t_hours""".stripMargin,

    // rolling active users on integer epoch-days: each (user, active
    // day) row represents day d in the trailing window iff the user's
    // next active day is past d — one bounded explode, no day×history
    // join; counts are exact integers
    "q174_active_users" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |      CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d
        |    FROM events),
        |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM ud),
        |nx AS (SELECT user_id, d,
        |         lead(d) OVER (PARTITION BY user_id ORDER BY d) AS nxt,
        |         d1 FROM ud CROSS JOIN span),
        |wau AS (SELECT unnest(range(d, least(d + 6, coalesce(nxt - 1, d1), d1) + 1)) AS di
        |        FROM nx),
        |mau AS (SELECT unnest(range(d, least(d + 27, coalesce(nxt - 1, d1), d1) + 1)) AS di
        |        FROM nx),
        |wc AS (SELECT di, count(*) AS wau FROM wau GROUP BY 1),
        |mc AS (SELECT di, count(*) AS mau FROM mau GROUP BY 1),
        |dc AS (SELECT d AS di, count(*) AS dau FROM ud GROUP BY 1),
        |spine AS (SELECT unnest(range(d0, d1 + 1)) AS di FROM span)
        |SELECT strftime(DATE '1970-01-01' + CAST(spine.di AS INTEGER),
        |         '%Y-%m-%d') AS day,
        |       CAST(coalesce(dau, 0) AS BIGINT) AS dau,
        |       CAST(coalesce(wau, 0) AS BIGINT) AS wau,
        |       CAST(coalesce(mau, 0) AS BIGINT) AS mau,
        |       CASE WHEN coalesce(mau, 0) > 0 THEN
        |         round(CAST(coalesce(dau, 0) AS DOUBLE) / mau, 4) END AS stickiness
        |FROM spine LEFT JOIN dc ON spine.di = dc.di
        |  LEFT JOIN wc ON spine.di = wc.di
        |  LEFT JOIN mc ON spine.di = mc.di
        |ORDER BY day""".stripMargin,

    // mSPRT: cumulative moments on the exact 1e-3 integer grid (the
    // q155 rule — HUGEINT here, decimal(38,0) in Spark), the Λ closed
    // form with identical literals, always-valid p = running min of 1/Λ
    "q175_msprt" ->
      """WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
        |      ((user_id % 1000000007) * 1000003) % 1000000007 % 2 = 1 AS t,
        |      CAST(round(value * 1000) AS BIGINT) AS v3
        |    FROM events WHERE value IS NOT NULL),
        |daily AS (SELECT day,
        |      sum(CASE WHEN t THEN 1 ELSE 0 END) AS dn1,
        |      sum(CASE WHEN t THEN v3 ELSE 0 END) AS ds1,
        |      sum(CASE WHEN t THEN v3 * v3 ELSE 0 END) AS dq1,
        |      sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS dn2,
        |      sum(CASE WHEN NOT t THEN v3 ELSE 0 END) AS ds2,
        |      sum(CASE WHEN NOT t THEN v3 * v3 ELSE 0 END) AS dq2
        |    FROM e GROUP BY 1),
        |c AS (SELECT day,
        |       CAST(sum(dn1) OVER w AS BIGINT) AS n1,
        |       CAST(sum(dn2) OVER w AS BIGINT) AS n2,
        |       CAST(sum(ds1) OVER w AS DOUBLE) / 1000.0 AS s1,
        |       CAST(sum(dq1) OVER w AS DOUBLE) / 1000000.0 AS q1,
        |       CAST(sum(ds2) OVER w AS DOUBLE) / 1000.0 AS s2,
        |       CAST(sum(dq2) OVER w AS DOUBLE) / 1000000.0 AS q2
        |      FROM daily
        |      WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND CURRENT ROW)),
        |m AS (SELECT day, n1, n2,
        |        CAST(n1 AS DOUBLE) AS nd1, CAST(n2 AS DOUBLE) AS nd2,
        |        s1, q1, s2, q2 FROM c),
        |vv AS (SELECT *, CASE WHEN n1 >= 1 AND n2 >= 1
        |          THEN s1 / nd1 - s2 / nd2 END AS dd,
        |        CASE WHEN n1 >= 2 AND n2 >= 2 THEN
        |          (q1 - s1 * s1 / nd1) / (nd1 - 1) / nd1
        |          + (q2 - s2 * s2 / nd2) / (nd2 - 1) / nd2 END AS v
        |       FROM m),
        |lam AS (SELECT *, CASE WHEN v IS NOT NULL AND v > 0 THEN
        |          sqrt(v / (v + 0.01)) * exp(dd * dd * 0.01
        |            / (2.0 * v * (v + 0.01))) END AS lam FROM vv),
        |p AS (SELECT *, round(least(coalesce(min(1.0 / lam) OVER
        |        (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |        1.0), 1.0), 6) AS p_avi FROM lam)
        |SELECT day, n1 AS n_t, n2 AS n_c, round(dd, 6) + 0.0 AS delta,
        |       round(ln(lam), 6) + 0.0 AS log_lambda, p_avi,
        |       CAST(CASE WHEN p_avi <= 0.05 THEN 1 ELSE 0 END AS BIGINT)
        |         AS significant
        |FROM p ORDER BY day""".stripMargin,

    // covariate balance: per-user integer covariates on the ×1000 grid,
    // exact HUGEINT arm moments, SMD from identical integers
    "q176_covariate_balance" ->
      """WITH pu AS (SELECT user_id,
        |      ((user_id % 1000000007) * 1000003) % 1000000007 % 2 = 1 AS t,
        |      count(*) * 1000 AS n_events,
        |      sum(coalesce(CAST(round(value * 1000) AS BIGINT), 0)) AS value_sum,
        |      count(DISTINCT event_type) * 1000 AS n_types,
        |      count(DISTINCT CAST(ts AS DATE)) * 1000 AS n_days
        |    FROM events GROUP BY 1, 2),
        |long AS (
        |  SELECT t, 'n_events' AS covariate, n_events AS x3 FROM pu
        |  UNION ALL SELECT t, 'value_sum', value_sum FROM pu
        |  UNION ALL SELECT t, 'n_types', n_types FROM pu
        |  UNION ALL SELECT t, 'n_days', n_days FROM pu),
        |g AS (SELECT covariate,
        |       CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |       sum(CASE WHEN t THEN x3 ELSE 0 END) AS s_t,
        |       sum(CASE WHEN t THEN x3 * x3 ELSE 0 END) AS q_t,
        |       CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        |       sum(CASE WHEN NOT t THEN x3 ELSE 0 END) AS s_c,
        |       sum(CASE WHEN NOT t THEN x3 * x3 ELSE 0 END) AS q_c
        |      FROM long GROUP BY 1),
        |d AS (SELECT covariate, n_t, n_c,
        |        CAST(s_t AS DOUBLE) / 1000.0 / n_t AS m_t,
        |        CAST(s_c AS DOUBLE) / 1000.0 / n_c AS m_c,
        |        (CAST(q_t AS DOUBLE) / 1000000.0
        |          - (CAST(s_t AS DOUBLE) / 1000.0) * (CAST(s_t AS DOUBLE) / 1000.0)
        |            / n_t) / (n_t - 1) AS v_t,
        |        (CAST(q_c AS DOUBLE) / 1000000.0
        |          - (CAST(s_c AS DOUBLE) / 1000.0) * (CAST(s_c AS DOUBLE) / 1000.0)
        |            / n_c) / (n_c - 1) AS v_c
        |      FROM g),
        |s AS (SELECT covariate, n_t, n_c, round(m_t, 6) AS mean_t,
        |        round(m_c, 6) AS mean_c,
        |        CASE WHEN v_t + v_c > 0 THEN
        |          round((m_t - m_c) / sqrt((v_t + v_c) / 2.0), 4) + 0.0 END AS smd
        |      FROM d)
        |SELECT covariate, n_t, n_c, mean_t, mean_c, smd,
        |       CAST(CASE WHEN smd IS NOT NULL THEN
        |           CASE WHEN abs(smd) < 0.1 THEN 1 ELSE 0 END
        |         ELSE CASE WHEN mean_t = mean_c THEN 1 ELSE 0 END END
        |         AS BIGINT) AS balanced
        |FROM s ORDER BY covariate""".stripMargin,

    // centroid geometry: 6-dp centroids land on the ×10⁶ integer grid
    // (the q05 round + the q155 exact-sum rule), so dots/norms are
    // exact integers and only the final cosine is a double
    "q177_centroid_geometry" ->
      """WITH c AS (SELECT label, pos,
        |      CAST(round(round(avg(val), 6) * 1000000.0) AS BIGINT) AS v6
        |    FROM (SELECT CAST(label AS BIGINT) AS label,
        |            CAST(unnest(range(len(embedding))) AS BIGINT) AS pos,
        |            unnest(CAST(embedding AS DOUBLE[])) AS val
        |          FROM embeddings
        |          WHERE len(list_filter(embedding,
        |            x -> isnan(CAST(x AS DOUBLE)))) = 0)
        |    GROUP BY 1, 2),
        |n AS (SELECT label, sum(v6 * v6) AS nrm FROM c GROUP BY 1),
        |p AS (SELECT a.label AS label_a, b.label AS label_b,
        |        sum(a.v6 * b.v6) AS dot
        |      FROM c a JOIN c b ON a.pos = b.pos AND a.label <> b.label
        |      GROUP BY 1, 2),
        |s AS (SELECT label_a, label_b,
        |        round(CAST(dot AS DOUBLE)
        |          / sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)), 6)
        |          + 0.0 AS cosine
        |      FROM p JOIN n na ON p.label_a = na.label
        |        JOIN n nb ON p.label_b = nb.label)
        |SELECT label_a, label_b, cosine,
        |       CAST(row_number() OVER (PARTITION BY label_a
        |         ORDER BY cosine DESC, label_b ASC) AS BIGINT) AS rnk
        |FROM s ORDER BY label_a, rnk""".stripMargin,

    // source containment: the q33 shingle grammar at the source grain
    // (string shingles here mirror the native hash equality exactly)
    "q178_source_containment" ->
      """WITH w AS (SELECT source, string_split(text, ' ') AS ws
        |    FROM documents WHERE text IS NOT NULL),
        |sh0 AS (SELECT source,
        |         unnest(list_distinct(list_transform(
        |           range(1, greatest(len(ws)-3, 1)+1),
        |           i -> array_to_string(ws[i:i+3], ' ')))) AS shingle
        |       FROM w),
        |sh AS (SELECT DISTINCT source, shingle FROM sh0),
        |sizes AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1),
        |pairs AS (SELECT a.source AS src_a, b.source AS src_b,
        |            count(*) AS shared
        |          FROM sh a JOIN sh b
        |            ON a.shingle = b.shingle AND a.source < b.source
        |          GROUP BY 1, 2)
        |SELECT src_a, src_b, shared, sa.n_sh AS n_a, sb.n_sh AS n_b,
        |       round(CAST(shared AS DOUBLE) / sa.n_sh, 6) AS containment_ab,
        |       round(CAST(shared AS DOUBLE) / sb.n_sh, 6) AS containment_ba
        |FROM pairs JOIN sizes sa ON pairs.src_a = sa.source
        |  JOIN sizes sb ON pairs.src_b = sb.source
        |ORDER BY src_a, src_b""".stripMargin,

    // DQ audit: one conditional count per declared rule
    "q179_dq_audit" ->
      """WITH rules AS (
        |  SELECT 'fk_orders_customer' AS rule, 'orders' AS table_name,
        |    count(*) AS n_checked,
        |    coalesce(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END), 0)
        |      AS n_violations
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |  UNION ALL
        |  SELECT 'fk_lineitem_orders', 'lineitem', count(*),
        |    coalesce(sum(CASE WHEN oo.o_orderkey IS NULL THEN 1 ELSE 0 END), 0)
        |  FROM lineitem l LEFT JOIN orders oo ON l.l_orderkey = oo.o_orderkey
        |  UNION ALL
        |  SELECT 'lineitem_qty_in_range', 'lineitem', count(*),
        |    coalesce(sum(CASE WHEN l_quantity <= 0 OR l_quantity > 100
        |      THEN 1 ELSE 0 END), 0) FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_discount_in_range', 'lineitem', count(*),
        |    coalesce(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5
        |      THEN 1 ELSE 0 END), 0) FROM lineitem
        |  UNION ALL
        |  SELECT 'orders_price_positive', 'orders', count(*),
        |    coalesce(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END), 0)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'events_value_present', 'events', count(*),
        |    coalesce(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END), 0)
        |  FROM events
        |  UNION ALL
        |  SELECT 'events_ts_in_bounds', 'events', count(*),
        |    coalesce(sum(CASE WHEN ts IS NULL OR ts < TIMESTAMP '2020-01-01'
        |      OR ts >= TIMESTAMP '2030-01-01' THEN 1 ELSE 0 END), 0)
        |  FROM events
        |  UNION ALL
        |  SELECT 'documents_nchars_consistent', 'documents', count(*),
        |    coalesce(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END), 0)
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT rule, table_name, CAST(n_checked AS BIGINT) AS n_checked,
        |       CAST(n_violations AS BIGINT) AS n_violations,
        |       CASE WHEN n_checked > 0 THEN
        |         round(CAST(n_violations AS DOUBLE) / n_checked, 6) END
        |         AS violation_rate,
        |       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
        |         AS passed
        |FROM rules ORDER BY rule""".stripMargin,

    // lexical drift: q01 token grammar, split-half integer counts,
    // add-one-smoothed share ratio with identical literals
    "q180_lexical_drift" ->
      s"""WITH mid AS (SELECT CAST(floor((min(doc_id) + max(doc_id)) / 2) AS BIGINT) AS mid
         |    FROM documents WHERE text IS NOT NULL),
         |tokens AS (SELECT doc_id <= mid.mid AS early,
         |      unnest(${tok("text")}) AS word
         |    FROM documents CROSS JOIN mid WHERE text IS NOT NULL),
         |counts AS (SELECT word,
         |      CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS cnt_early,
         |      CAST(sum(CASE WHEN NOT early THEN 1 ELSE 0 END) AS BIGINT) AS cnt_late
         |    FROM tokens GROUP BY 1),
         |tot AS (SELECT sum(cnt_early) AS tot_early, sum(cnt_late) AS tot_late,
         |        count(*) AS v FROM counts)
         |SELECT word, cnt_early, cnt_late,
         |       round(CAST(cnt_early + 1 AS DOUBLE)
         |         / CAST(tot_early + v AS DOUBLE), 8) AS share_early,
         |       round(CAST(cnt_late + 1 AS DOUBLE)
         |         / CAST(tot_late + v AS DOUBLE), 8) AS share_late,
         |       round((CAST(cnt_late + 1 AS DOUBLE)
         |           / CAST(tot_late + v AS DOUBLE))
         |         / (CAST(cnt_early + 1 AS DOUBLE)
         |           / CAST(tot_early + v AS DOUBLE)), 4) AS lift
         |FROM counts CROSS JOIN tot
         |WHERE cnt_early + cnt_late >= 5
         |ORDER BY lift DESC, word LIMIT 20""".stripMargin,

    // Benford: leading digit from the INTEGER cent string (never
    // floor(x/10^floor(log10 x)) — exact-power-of-ten log hazard);
    // χ² folds over a digit-ORDERED window so the double sum is
    // sequential and engine-identical; log10 spelled ln/ln(10) to
    // mirror Spark's log(base, x) exactly
    "q181_benford_audit" ->
      """WITH u AS (
        |  SELECT 'o_totalprice' AS metric,
        |    CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
        |      1, 1) AS BIGINT) AS digit
        |  FROM orders WHERE o_totalprice > 0
        |  UNION ALL
        |  SELECT 'l_extendedprice',
        |    CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR),
        |      1, 1) AS BIGINT)
        |  FROM lineitem WHERE l_extendedprice > 0
        |  UNION ALL
        |  SELECT 'l_quantity',
        |    CAST(substr(CAST(CAST(round(l_quantity * 100) AS BIGINT) AS VARCHAR),
        |      1, 1) AS BIGINT)
        |  FROM lineitem WHERE l_quantity > 0),
        |g AS (SELECT metric, digit, count(*) AS n FROM u GROUP BY 1, 2),
        |w AS (SELECT metric, digit, CAST(n AS BIGINT) AS n,
        |        CAST(sum(n) OVER (PARTITION BY metric) AS BIGINT) AS total
        |      FROM g),
        |b AS (SELECT *, round(CAST(n AS DOUBLE) / total, 6) AS share,
        |        round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford
        |      FROM w)
        |SELECT metric, digit, n, share, benford,
        |       round(sum((n - total * benford) * (n - total * benford)
        |           / (total * benford)) OVER (PARTITION BY metric ORDER BY digit
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4)
        |         AS chi2
        |FROM b ORDER BY metric, digit""".stripMargin,

    // Theil-Sen: the pair frame is calendar-bounded (days², never the
    // corpus); slopes round to 6 dp before the exact median
    "q182_theil_sen" ->
      """WITH daily AS (SELECT event_type,
        |      CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
        |        AS d,
        |      round(sum(value), 6) AS x
        |    FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |    GROUP BY 1, 2),
        |s AS (SELECT a.event_type, round((b.x - a.x) / (b.d - a.d), 6) AS slope
        |      FROM daily a JOIN daily b
        |        ON a.event_type = b.event_type AND a.d < b.d),
        |o AS (SELECT event_type, count(*) AS n_days,
        |        round(regr_slope(x, d), 6) + 0.0 AS ols_slope FROM daily GROUP BY 1),
        |t AS (SELECT event_type, count(*) AS n_pairs,
        |        round(quantile_cont(slope, 0.5), 6) + 0.0 AS ts_slope FROM s GROUP BY 1)
        |SELECT t.event_type, CAST(n_days AS BIGINT) AS n_days,
        |       CAST(n_pairs AS BIGINT) AS n_pairs, ts_slope, ols_slope,
        |       round(abs(ts_slope - ols_slope), 6) AS divergence
        |FROM t JOIN o ON t.event_type = o.event_type
        |ORDER BY t.event_type""".stripMargin,

    // reconciliation: per-line charges land on the cent grid BEFORE
    // summing (exact integers; float-Σ-then-round is order-sensitive)
    "q183_order_recon" ->
      """WITH lt AS (SELECT l_orderkey,
        |      sum(CAST(round(l_extendedprice * (1.0 - l_discount)
        |        * (1.0 + l_tax) * 100) AS BIGINT)) AS line_cents
        |    FROM lineitem GROUP BY 1),
        |j AS (SELECT o_orderstatus,
        |        CAST(round(o_totalprice * 100) AS BIGINT) AS hdr_cents,
        |        lt.line_cents,
        |        CASE WHEN lt.line_cents IS NOT NULL THEN
        |          abs(CAST(round(o_totalprice * 100) AS BIGINT) - lt.line_cents)
        |        END AS adelta
        |      FROM orders LEFT JOIN lt ON orders.o_orderkey = lt.l_orderkey)
        |SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(CASE WHEN line_cents IS NOT NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_with_lines,
        |       CAST(coalesce(sum(CASE WHEN adelta > 1 THEN 1 ELSE 0 END), 0)
        |         AS BIGINT) AS n_mismatch,
        |       round(CAST(coalesce(sum(adelta), 0) AS DOUBLE) / 100.0, 2)
        |         AS sum_abs_delta,
        |       round(CAST(coalesce(max(adelta), 0) AS DOUBLE) / 100.0, 2)
        |         AS max_abs_delta
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // debounce: adjacent-gap bursts (the session_window rule at 6 h);
    // kept = first of burst; exact integer counts
    "q184_debounce" ->
      """WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us
        |    FROM events WHERE event_type IS NOT NULL),
        |l AS (SELECT event_type,
        |        CASE WHEN lag(us) OVER (PARTITION BY user_id, event_type
        |            ORDER BY us, event_id) IS NULL
        |          OR us - lag(us) OVER (PARTITION BY user_id, event_type
        |            ORDER BY us, event_id) > 21600000000
        |          THEN 1 ELSE 0 END AS kept
        |      FROM e)
        |SELECT event_type, count(*) AS n_events,
        |       CAST(sum(kept) AS BIGINT) AS n_kept,
        |       CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped,
        |       round(CAST(count(*) - sum(kept) AS DOUBLE) / count(*), 6)
        |         AS drop_rate
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,

    // Markov holdout eval: train/eval transition frames over disjoint
    // day ranges; argmax with the lexicographic tie-break
    "q185_markov_eval" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |      CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
        |        AS day
        |    FROM events WHERE event_type IS NOT NULL),
        |m AS (SELECT CAST(floor((min(day) + max(day)) / 2) AS BIGINT) AS mid
        |      FROM ev),
        |tr AS (SELECT prev_type, event_type AS next_type, count(*) AS cnt FROM (
        |        SELECT event_type, lag(event_type) OVER
        |          (PARTITION BY user_id ORDER BY us, event_id) AS prev_type
        |        FROM ev CROSS JOIN m WHERE day <= mid)
        |       WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |te AS (SELECT prev_type, event_type AS next_type, count(*) AS cnt FROM (
        |        SELECT event_type, lag(event_type) OVER
        |          (PARTITION BY user_id ORDER BY us, event_id) AS prev_type
        |        FROM ev CROSS JOIN m WHERE day > mid)
        |       WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |p AS (SELECT prev_type, next_type AS predicted_next FROM (
        |        SELECT *, row_number() OVER (PARTITION BY prev_type
        |          ORDER BY cnt DESC, next_type ASC) AS rk FROM tr)
        |      WHERE rk = 1)
        |SELECT te.prev_type, CAST(sum(cnt) AS BIGINT) AS n_eval,
        |       max(predicted_next) AS predicted_next,
        |       CAST(coalesce(sum(CASE WHEN next_type = predicted_next
        |         THEN cnt ELSE 0 END), 0) AS BIGINT) AS n_correct,
        |       round(CAST(coalesce(sum(CASE WHEN next_type = predicted_next
        |           THEN cnt ELSE 0 END), 0) AS DOUBLE) / sum(cnt), 6) AS accuracy
        |FROM te LEFT JOIN p ON te.prev_type = p.prev_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // lang consistency: q36's stopword rule vs the declared column,
    // scored on the detector's own en/not-en axis
    "q186_lang_consistency" ->
      s"""WITH d AS (SELECT source, lang, ${tok("text")} AS words
         |    FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT source, lang,
         |        round(CAST(len(list_filter(words, w -> w IN $stoplist)) AS DOUBLE)
         |          / greatest(len(words), 1), 6) >= 0.08 AS pred_en
         |      FROM d)
         |SELECT source, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_declared_en,
         |       CAST(sum(CASE WHEN pred_en THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_pred_en,
         |       CAST(sum(CASE WHEN (lang = 'en') <> pred_en THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_mismatch,
         |       round(CAST(sum(CASE WHEN (lang = 'en') <> pred_en THEN 1 ELSE 0 END)
         |         AS DOUBLE) / count(*), 6) AS mismatch_rate
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    // conformal gate: exact k-th order statistic from the bounded 6-dp
    // quality histogram (cum ≥ k first value), α = 0.1, strict < flag
    "q187_conformal_gate" ->
      s"""WITH d AS (SELECT doc_id, source, n_chars, ${tok("text")} AS words
         |    FROM documents WHERE text IS NOT NULL),
         |sc AS (SELECT doc_id, source,
         |        CAST(len(words) AS BIGINT) AS n_tokens,
         |        round(CAST(len(list_distinct(words)) AS DOUBLE)
         |          / greatest(len(words), 1), 6) AS ttr,
         |        round(CAST(len(list_filter(words, w -> w IN $stoplist)) AS DOUBLE)
         |          / greatest(len(words), 1), 6) AS stop_share
         |      FROM d),
         |s AS (SELECT doc_id, source,
         |        round(least(ttr * 2.0, 1.0) * 0.5
         |          + CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 0.3 ELSE 0.0 END
         |          + least(stop_share * 3.0, 0.2), 6) AS quality
         |      FROM sc),
         |hist AS (SELECT quality, count(*) AS c FROM s WHERE doc_id % 2 = 0
         |         GROUP BY 1),
         |h2 AS (SELECT *, sum(c) OVER (ORDER BY quality ROWS BETWEEN UNBOUNDED
         |          PRECEDING AND CURRENT ROW) AS cum,
         |          sum(c) OVER () AS n_cal FROM hist),
         |thr AS (SELECT quality AS threshold, CAST(n_cal AS BIGINT) AS n_cal
         |        FROM h2
         |        WHERE cum >= floor((n_cal + 1) * 0.1)
         |          AND cum - c < floor((n_cal + 1) * 0.1)
         |          AND floor((n_cal + 1) * 0.1) >= 1)
         |SELECT source, count(*) AS n_prod,
         |       CAST(sum(CASE WHEN quality < threshold THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_flagged,
         |       round(CAST(sum(CASE WHEN quality < threshold THEN 1 ELSE 0 END)
         |         AS DOUBLE) / count(*), 6) AS flag_rate,
         |       threshold, n_cal
         |FROM s CROSS JOIN thr WHERE doc_id % 2 = 1
         |GROUP BY source, threshold, n_cal ORDER BY source""".stripMargin,

    // regr_* on ≤200 ln values rounded 6/4 dp (the q144 contract)
    "q188_zipf_fit" ->
      s"""WITH h AS (SELECT source, word, count(*) AS cnt
         |  FROM (SELECT source, unnest(${tok("text")}) AS word
         |        FROM documents WHERE text IS NOT NULL)
         |  GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |          CAST(count(*) AS BIGINT) AS n_vocab FROM h GROUP BY 1),
         |r AS (SELECT source, word, cnt, row_number() OVER
         |        (PARTITION BY source ORDER BY cnt DESC, word) AS rk FROM h),
         |fit AS (SELECT source,
         |    round(regr_slope(ln(cnt), ln(rk)), 6) + 0.0 AS zipf_slope,
         |    round(regr_r2(ln(cnt), ln(rk)), 4) AS r2,
         |    max(CASE WHEN rk = 1 THEN word END) AS top_word,
         |    max(CASE WHEN rk = 1 THEN cnt END) AS top_cnt
         |  FROM r WHERE rk <= 200 GROUP BY 1)
         |SELECT f.source, n_tokens, n_vocab, zipf_slope, r2, top_word,
         |       round(CAST(top_cnt AS DOUBLE) / n_tokens, 6) AS top_share
         |FROM fit f JOIN tot t ON f.source = t.source
         |ORDER BY f.source""".stripMargin,

    // Gini from the value histogram: ranks of the c tied customers at
    // value v are cum0+1..cum0+c, so Σ i·x over them is exact integer
    // arithmetic (// = DuckDB integer division, mirroring Spark's DIV;
    // c(c+1) is even so the quotient is exact)
    "q189_gini" ->
      """WITH spend AS (SELECT o_custkey,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
        |  FROM orders GROUP BY 1),
        |j AS (SELECT n_name, v FROM spend
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |h AS (SELECT n_name, v, count(*) AS c FROM j GROUP BY 1, 2),
        |w AS (SELECT n_name, v, c,
        |    CAST(sum(c) OVER (PARTITION BY n_name ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) - c AS BIGINT) AS cum0 FROM h),
        |parts AS (SELECT n_name, c, v,
        |    v * (c * cum0 + (c * (c + 1)) // 2) AS iw FROM w),
        |agg AS (SELECT n_name, CAST(sum(c) AS BIGINT) AS n_customers,
        |    sum(v * c) AS s, sum(iw) AS t FROM parts GROUP BY 1)
        |SELECT n_name AS nation, n_customers,
        |       round(CAST(s AS DOUBLE) / 100.0, 2) AS total_rev,
        |       round((2.0 * CAST(t AS DOUBLE)
        |           - CAST(n_customers + 1 AS DOUBLE) * CAST(s AS DOUBLE))
        |         / (CAST(n_customers AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS gini
        |FROM agg ORDER BY nation""".stripMargin,

    // forecasts via calendar-keyed self-joins (day-1 / day-7), eval on
    // the strict second half; |Δ| and Δ² accumulate as exact integers.
    // Δ² factors cast HUGEINT BEFORE the multiply, mirroring the Spark
    // side's decimal(38,0) squares — at 100× y3 deltas reach ~3.7e9 and
    // the INT64 square overflowed (caught by the round-10 amp sweep)
    "q190_forecast_backtest" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
        |      AS day,
        |    CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS y3
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |mid AS (SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT) AS mid
        |        FROM daily),
        |ev AS (SELECT d.event_type, d.y3, f1.y3 AS f1, f7.y3 AS f7
        |  FROM daily d CROSS JOIN mid
        |  JOIN daily f1 ON f1.event_type = d.event_type AND f1.day = d.day - 1
        |  JOIN daily f7 ON f7.event_type = d.event_type AND f7.day = d.day - 7
        |  WHERE d.day > mid)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
        |  round(CAST(sum(abs(y3 - f1)) AS DOUBLE) / count(*) / 1000.0, 4)
        |    AS mae_naive,
        |  round(sqrt(CAST(sum(CAST(y3 - f1 AS HUGEINT) * CAST(y3 - f1 AS HUGEINT)) AS DOUBLE) / count(*))
        |    / 1000.0, 4) AS rmse_naive,
        |  round(CAST(sum(abs(y3 - f7)) AS DOUBLE) / count(*) / 1000.0, 4)
        |    AS mae_snaive,
        |  round(sqrt(CAST(sum(CAST(y3 - f7 AS HUGEINT) * CAST(y3 - f7 AS HUGEINT)) AS DOUBLE) / count(*))
        |    / 1000.0, 4) AS rmse_snaive,
        |  CASE WHEN sum(abs(y3 - f7)) < sum(abs(y3 - f1)) THEN 'seasonal_naive'
        |       WHEN sum(abs(y3 - f1)) < sum(abs(y3 - f7)) THEN 'naive'
        |       ELSE 'tie' END AS best_baseline
        |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,

    // κ from exact integer 2×2 cells — the only doubles are single
    // divisions of integers, identical expression tree both engines;
    // gates mirror q37 (quality ≥ 0.5) and q65 (rounded fracs ≤ 0.1)
    "q191_rater_agreement" ->
      s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws,
         |    ${tok("text")} AS words
         |  FROM documents
         |  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
         |q AS (SELECT doc_id, source,
         |    round(least(round(CAST(len(list_distinct(words)) AS DOUBLE)
         |        / greatest(len(words), 1), 6) * 2.0, 1.0) * 0.5
         |      + CASE WHEN len(words) BETWEEN 20 AND 400 THEN 0.3 ELSE 0.0 END
         |      + least(round(CAST(len(list_filter(words, w -> w IN $stoplist))
         |          AS DOUBLE) / greatest(len(words), 1), 6) * 3.0, 0.2), 6)
         |      AS quality
         |  FROM d),
         |bg AS (SELECT doc_id, ws[i.i] || ' ' || ws[i.i+1] AS bigram
         |       FROM d, LATERAL (SELECT unnest(range(1, len(ws))) AS i) i),
         |cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg
         |        GROUP BY doc_id, bigram),
         |rg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb,
         |         CAST(count(*) AS BIGINT) AS nd, CAST(max(c) AS BIGINT) AS tc
         |       FROM cnt GROUP BY 1),
         |g AS (SELECT q.source, (q.quality >= 0.5) AS a,
         |        (round(tc * 1.0 / nb, 6) <= 0.1
         |          AND round(1 - nd * 1.0 / nb, 6) <= 0.1) AS b
         |      FROM q JOIN rg ON q.doc_id = rg.doc_id),
         |cells AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n00
         |  FROM g GROUP BY 1),
         |k AS (SELECT *,
         |    CAST(n11 + n00 AS DOUBLE) / n_docs AS po,
         |    (CAST(n11 + n10 AS DOUBLE) / n_docs)
         |      * (CAST(n11 + n01 AS DOUBLE) / n_docs)
         |    + (1.0 - CAST(n11 + n10 AS DOUBLE) / n_docs)
         |      * (1.0 - CAST(n11 + n01 AS DOUBLE) / n_docs) AS pe
         |  FROM cells)
         |SELECT source, n_docs, n11, n10, n01, n00,
         |       round(po, 6) AS po, round(pe, 6) AS pe,
         |       CASE WHEN pe < 1.0 THEN round((po - pe) / (1.0 - pe), 6) END
         |         AS kappa
         |FROM k ORDER BY source""".stripMargin,

    "q192_k_anonymity" ->
      """WITH cls AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |    count(*) AS sz
        |  FROM customer GROUP BY 1, 2, 3),
        |x AS (SELECT sz, unnest([2, 5, 10, 20]) AS k FROM cls)
        |SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_classes_at_risk,
        |  CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
        |    AS n_rows_at_risk,
        |  round(CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS DOUBLE)
        |    / sum(sz), 6) AS risk_share
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,

    // quantile_cont == Spark percentile (linear interpolation, the
    // q140 cutpoint contract); boundaries rounded 6 dp pre-binning
    "q193_rfm_segments" ->
      """WITH rfm AS (SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_d,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |sc AS (SELECT *, CAST(datediff('day', last_d,
        |    (SELECT max(last_d) FROM rfm)) AS BIGINT) AS rec FROM rfm),
        |b AS (SELECT
        |    list_transform(quantile_cont(rec, [0.25, 0.5, 0.75]),
        |      x -> round(x, 6)) AS rb,
        |    list_transform(quantile_cont(freq, [0.25, 0.5, 0.75]),
        |      x -> round(x, 6)) AS fb,
        |    list_transform(quantile_cont(cents, [0.25, 0.5, 0.75]),
        |      x -> round(x, 6)) AS mb
        |  FROM sc),
        |cells AS (SELECT cents, rec,
        |    CAST(4 - len(list_filter(rb, bb -> rec > bb)) AS BIGINT) AS r_score,
        |    CAST(1 + len(list_filter(fb, bb -> freq > bb)) AS BIGINT) AS f_score,
        |    CAST(1 + len(list_filter(mb, bb -> cents > bb)) AS BIGINT) AS m_score
        |  FROM sc CROSS JOIN b)
        |SELECT r_score, f_score, m_score,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS segment_rev,
        |  round(avg(CAST(rec AS DOUBLE)), 2) AS avg_recency_days,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
        |         THEN 'champion'
        |       WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk_loyal'
        |       WHEN f_score >= 3 THEN 'loyal'
        |       WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
        |       ELSE 'regular' END AS label
        |FROM cells GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // entropy folds over a value-ORDERED window (the q181 sequential-
    // sum convention); log2 spelled ln/ln(2.0) both engines
    "q194_column_entropy" -> {
      def block(label: String, table: String, column: String) =
        s"""SELECT '$label' AS column_name, CAST(max(total) AS BIGINT) AS n_rows,
           |  CAST(count(*) AS BIGINT) AS n_distinct,
           |  round(max(h2), 6) AS entropy_bits,
           |  round(max(h2) / greatest(ln(CAST(count(*) AS DOUBLE)) / ln(2.0),
           |    1e-12), 6) AS norm_entropy,
           |  round(CAST(max(n) AS DOUBLE) / max(total), 6) AS top_share
           |FROM (SELECT v, n, total,
           |    sum(-(CAST(n AS DOUBLE) / total) * ln(CAST(n AS DOUBLE) / total)
           |        / ln(2.0)) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
           |        AND UNBOUNDED FOLLOWING) AS h2
           |  FROM (SELECT v, n, CAST(sum(n) OVER () AS BIGINT) AS total
           |    FROM (SELECT CAST($column AS VARCHAR) AS v, count(*) AS n
           |          FROM $table WHERE $column IS NOT NULL GROUP BY 1) hh) ww) ee
           |""".stripMargin
      Seq(
        block("documents.lang", "documents", "lang"),
        block("documents.source", "documents", "source"),
        block("events.event_type", "events", "event_type"),
        block("lineitem.l_returnflag", "lineitem", "l_returnflag"),
        block("orders.o_orderstatus", "orders", "o_orderstatus"),
        block("part.p_brand", "part", "p_brand"))
        .mkString("", "UNION ALL\n", "ORDER BY column_name")
    },

    // z constants as the same literal sum both engines square;
    // variance from the exact 1e-3 moments (q155)
    "q195_power_mde" ->
      """WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(round(value * 1000) AS BIGINT)) AS s3,
        |    sum(CAST(round(value * 1000) AS BIGINT)
        |      * CAST(round(value * 1000) AS BIGINT)) AS ss6,
        |    CAST(max(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)))
        |      - min(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) + 1
        |      AS BIGINT) AS n_days
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1),
        |d AS (SELECT event_type, n, n_days,
        |    CAST(s3 AS DOUBLE) / 1000.0 AS s,
        |    CAST(ss6 AS DOUBLE) / 1000000.0 AS ss,
        |    CAST(n AS DOUBLE) AS nd FROM m),
        |e AS (SELECT event_type, n, n_days,
        |    s / nd AS mean, (ss - s * s / nd) / (nd - 1) AS var,
        |    nd / n_days AS daily FROM d)
        |SELECT event_type, n AS n_values, n_days,
        |  round(mean, 4) AS mean_value, round(sqrt(var), 4) AS sd_value,
        |  round(daily, 2) AS daily_volume,
        |  CASE WHEN abs(mean) > 0 AND var > 0 THEN CAST(ceil(2.0
        |    * (2.0 * var * ((1.959964 + 0.841621) * (1.959964 + 0.841621))
        |       / ((mean * 0.01) * (mean * 0.01))) / daily) AS BIGINT) END
        |    AS days_1pct,
        |  CASE WHEN abs(mean) > 0 AND var > 0 THEN CAST(ceil(2.0
        |    * (2.0 * var * ((1.959964 + 0.841621) * (1.959964 + 0.841621))
        |       / ((mean * 0.02) * (mean * 0.02))) / daily) AS BIGINT) END
        |    AS days_2pct,
        |  CASE WHEN abs(mean) > 0 AND var > 0 THEN CAST(ceil(2.0
        |    * (2.0 * var * ((1.959964 + 0.841621) * (1.959964 + 0.841621))
        |       / ((mean * 0.05) * (mean * 0.05))) / daily) AS BIGINT) END
        |    AS days_5pct
        |FROM e ORDER BY event_type""".stripMargin,
    // bottom-k priority sample: md5 hex compares identically as text
    "q196_priority_sample" ->
      """WITH s AS (SELECT doc_id, source, lang,
        |    md5(CAST(doc_id AS VARCHAR) || ':' || text) AS pri
        |  FROM documents WHERE text IS NOT NULL),
        |k AS (SELECT * FROM s ORDER BY pri LIMIT 100)
        |SELECT CAST(row_number() OVER (ORDER BY pri) AS BIGINT) AS rank,
        |       doc_id, source, lang, pri
        |FROM k ORDER BY rank""".stripMargin,

    "q197_inclusion_deps" -> {
      def probe(rule: String, childTable: String, childCol: String,
                parentTable: String, parentCol: String) =
        s"""SELECT '$rule' AS candidate,
           |  CAST(count(*) AS BIGINT) AS n_child_distinct,
           |  CAST(sum(CASE WHEN p.pv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_contained
           |FROM (SELECT DISTINCT CAST($childCol AS BIGINT) AS v
           |      FROM $childTable WHERE $childCol IS NOT NULL) c
           |LEFT JOIN (SELECT DISTINCT CAST($parentCol AS BIGINT) AS pv
           |      FROM $parentTable WHERE $parentCol IS NOT NULL) p
           |  ON c.v = p.pv
           |""".stripMargin
      val probes = Seq(
        probe("lineitem.l_orderkey->orders.o_orderkey",
          "lineitem", "l_orderkey", "orders", "o_orderkey"),
        probe("lineitem.l_partkey->part.p_partkey",
          "lineitem", "l_partkey", "part", "p_partkey"),
        probe("orders.o_custkey->customer.c_custkey",
          "orders", "o_custkey", "customer", "c_custkey"),
        probe("customer.c_nationkey->nation.n_nationkey",
          "customer", "c_nationkey", "nation", "n_nationkey"),
        probe("orders.o_orderkey->lineitem.l_orderkey",
          "orders", "o_orderkey", "lineitem", "l_orderkey"),
        probe("events.user_id->customer.c_custkey",
          "events", "user_id", "customer", "c_custkey"),
        probe("documents.doc_id->embeddings.vec_id",
          "documents", "doc_id", "embeddings", "vec_id"))
        .mkString("WITH probes AS (\n", "UNION ALL\n", ")")
      s"""$probes
         |SELECT candidate, n_child_distinct, n_contained,
         |  round(CAST(n_contained AS DOUBLE) / n_child_distinct, 6)
         |    AS containment,
         |  CAST(CASE WHEN n_contained = n_child_distinct THEN 1 ELSE 0 END
         |    AS BIGINT) AS is_inclusion
         |FROM probes ORDER BY candidate""".stripMargin
    },

    // assortativity from exact integer degree moments (q110's edge
    // grammar; UNION ALL is safe — a<b makes directions disjoint)
    "q198_assortativity" ->
      s"""WITH t AS (SELECT doc_id, ${tok("text")} AS ws FROM documents),
         |pairs AS (SELECT p['w1'] AS w1, p['w2'] AS w2 FROM
         |  (SELECT unnest(list_transform(range(1, len(ws)),
         |     i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
         |   FROM t WHERE len(ws) >= 2)),
         |ed AS (SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
         |       FROM pairs WHERE w1 <> w2),
         |sym AS MATERIALIZED
         |  (SELECT a AS src, b AS dst FROM ed UNION ALL SELECT b, a FROM ed),
         |deg AS MATERIALIZED
         |  (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
         |j AS (SELECT d1.deg AS dx, d2.deg AS dy FROM sym s
         |      JOIN deg d1 ON s.src = d1.src JOIN deg d2 ON s.dst = d2.src),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m, sum(dx) AS sx,
         |         sum(dy) AS sy, sum(dx * dy) AS sxy,
         |         sum(dx * dx) AS sxx, sum(dy * dy) AS syy FROM j),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         |         CAST(max(deg) AS BIGINT) AS max_degree FROM deg),
         |calc AS (SELECT n_nodes, m, max_degree,
         |    CAST(m AS DOUBLE) AS md, CAST(sx AS DOUBLE) AS sxd,
         |    CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
         |    CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
         |  FROM mm CROSS JOIN nn)
         |SELECT n_nodes, CAST(m // 2 AS BIGINT) AS n_edges,
         |  CASE WHEN n_nodes > 0 THEN round(md / n_nodes, 4) END AS mean_degree,
         |  max_degree,
         |  CASE WHEN sqrt(md * sxxd - sxd * sxd)
         |         * sqrt(md * syyd - syd * syd) > 0
         |    THEN round((md * sxyd - sxd * syd)
         |      / (sqrt(md * sxxd - sxd * sxd)
         |         * sqrt(md * syyd - syd * syd)), 6) + 0.0 END AS assortativity
         |FROM calc ORDER BY n_nodes""".stripMargin,

    // per-element ×10⁶ grid (q177): all moments exact until the final
    // sqrt/divisions
    "q199_embedding_health" ->
      """WITH r AS (SELECT CAST(label AS BIGINT) AS label,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(round(x * 1000000.0) AS BIGINT)) AS v6
        |  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0
        |    AND len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)))) = 0),
        |rn AS (SELECT label, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(v6, v -> v * v)), (a, b) -> a + b) AS norm2 FROM r),
        |per AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
        |        sum(norm2) AS sn FROM rn GROUP BY 1),
        |cells AS (SELECT label, pos, sum(v) AS sp FROM
        |  (SELECT label, CAST(unnest(range(len(v6))) AS BIGINT) AS pos,
        |     unnest(v6) AS v FROM r) u
        |  GROUP BY 1, 2),
        |cn AS (SELECT label, sum(sp * sp) AS ssp FROM cells GROUP BY 1)
        |SELECT p.label, n_vectors,
        |  round(sqrt(CAST(sn AS DOUBLE) / n_vectors) / 1000000.0, 6)
        |    AS rms_norm,
        |  round(sqrt(CAST(ssp AS DOUBLE)) / n_vectors / 1000000.0, 6)
        |    AS centroid_norm,
        |  CASE WHEN sn > 0 THEN round(CAST(ssp AS DOUBLE)
        |    / (CAST(n_vectors AS DOUBLE) * CAST(sn AS DOUBLE)), 6) END
        |    AS anisotropy
        |FROM per p JOIN cn ON p.label = cn.label
        |ORDER BY p.label""".stripMargin,

    // entropy folds over a next_type-ORDERED window (the q181
    // convention); argmax ties break lexicographically (q185)
    "q200_journey_entropy" ->
      """WITH t AS (SELECT user_id, event_type,
        |  lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS prev_type
        |  FROM events WHERE event_type IS NOT NULL),
        |c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |      FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |w AS (SELECT prev_type, next_type, n,
        |        CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS total
        |      FROM c),
        |e AS (SELECT *, sum(-(CAST(n AS DOUBLE) / total)
        |          * ln(CAST(n AS DOUBLE) / total) / ln(2.0))
        |        OVER (PARTITION BY prev_type ORDER BY next_type
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |        AS h,
        |        row_number() OVER (PARTITION BY prev_type
        |          ORDER BY n DESC, next_type ASC) AS rk
        |      FROM w)
        |SELECT prev_type, CAST(max(total) AS BIGINT) AS n_transitions,
        |  CAST(count(*) AS BIGINT) AS n_next_types,
        |  round(max(h), 6) AS entropy_bits,
        |  round(max(h) / greatest(ln(CAST(count(*) AS DOUBLE)) / ln(2.0),
        |    1e-12), 6) AS norm_entropy,
        |  max(CASE WHEN rk = 1 THEN next_type END) AS top_next,
        |  round(CAST(max(n) AS DOUBLE) / max(total), 6) AS top_share
        |FROM e GROUP BY 1 ORDER BY prev_type""".stripMargin,

    // the q68 component CTEs + a size histogram + the singleton row
    // (vectors on no near-dup edge)
    "q201_cluster_sizes" ->
      s"""WITH RECURSIVE $simhashCandCte,
         |pairs AS (SELECT id_a, id_b
         |          FROM cand JOIN e ea ON ea.vec_id = cand.id_a
         |                    JOIN e eb ON eb.vec_id = cand.id_b
         |          WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.45),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (SELECT DISTINCT a, a FROM edges
         |                 UNION
         |                 SELECT ed.a, reach.r FROM edges ed
         |                 JOIN reach ON reach.id = ed.b),
         |comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
         |sizes AS (SELECT cluster, count(*) AS sz FROM comp GROUP BY cluster),
         |hist AS (SELECT CAST(sz AS BIGINT) AS cluster_size,
         |           CAST(count(*) AS BIGINT) AS n_clusters,
         |           CAST(sum(sz) AS BIGINT) AS n_docs
         |         FROM sizes GROUP BY 1),
         |sing AS (SELECT CAST((SELECT count(*) FROM embeddings)
         |           - (SELECT count(*) FROM comp) AS BIGINT) AS n1)
         |SELECT cluster_size, n_clusters, n_docs,
         |       CASE WHEN cluster_size >= 2 THEN n_docs - n_clusters
         |            ELSE CAST(0 AS BIGINT) END AS removable
         |FROM (SELECT CAST(1 AS BIGINT) AS cluster_size, n1 AS n_clusters,
         |        n1 AS n_docs FROM sing WHERE n1 > 0
         |      UNION ALL
         |      SELECT cluster_size, n_clusters, n_docs FROM hist) u
         |ORDER BY cluster_size""".stripMargin,

    // order-statistic CI over the bounded latency-value histogram
    // (q187's cumulative pick); ranks from exact n, one ceil each
    "q202_latency_ci" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |fv AS (SELECT user_id, min(us) AS fv FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |d AS (SELECT round((min(p.us) - fv.fv) / 1000000.0, 6) AS delta_s
        |      FROM ev p JOIN fv ON p.user_id = fv.user_id
        |      WHERE p.event_type = 'purchase' AND p.us > fv.fv
        |      GROUP BY p.user_id, fv.fv),
        |hist AS (SELECT delta_s, count(*) AS c FROM d GROUP BY 1),
        |h2 AS (SELECT delta_s, c,
        |         CAST(sum(c) OVER (ORDER BY delta_s
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |         CAST(sum(c) OVER () AS BIGINT) AS n
        |       FROM hist),
        |r AS (SELECT *, greatest(1,
        |          CAST(ceil(n * 0.5 - 1.959964 * sqrt(n * 0.25)) AS BIGINT))
        |          AS kl,
        |        (n + 1) // 2 AS km,
        |        least(n,
        |          CAST(ceil(n * 0.5 + 1.959964 * sqrt(n * 0.25)) AS BIGINT))
        |          AS ku
        |      FROM h2)
        |SELECT n AS n_users,
        |  max(CASE WHEN cum >= kl AND cum - c < kl THEN delta_s END) AS ci_lo_s,
        |  max(CASE WHEN cum >= km AND cum - c < km THEN delta_s END) AS median_s,
        |  max(CASE WHEN cum >= ku AND cum - c < ku THEN delta_s END) AS ci_hi_s,
        |  0.95 AS confidence
        |FROM r GROUP BY n ORDER BY n_users""".stripMargin,

    // banding recall vs an exact 200-anchor block; cosine rounded 6 dp
    // (the q49/q68 list_cosine_similarity contract)
    "q203_banding_recall" ->
      s"""WITH $simhashCandCte,
         |block AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 200),
         |truth AS (SELECT least(a.vec_id, b.vec_id) AS id_a,
         |    greatest(a.vec_id, b.vec_id) AS id_b,
         |    max(round(list_cosine_similarity(a.v, b.v), 6)) AS cos
         |  FROM block a JOIN e b ON a.vec_id <> b.vec_id
         |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.45
         |  GROUP BY 1, 2),
         |j AS (SELECT t.cos,
         |    CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS caught
         |  FROM truth t LEFT JOIN cand c
         |    ON t.id_a = c.id_a AND t.id_b = c.id_b),
         |x AS (SELECT cos, caught,
         |    CAST(unnest([0.45, 0.6, 0.75]) AS DOUBLE) AS tau FROM j)
         |SELECT tau, CAST(count(*) AS BIGINT) AS n_true,
         |  CAST(sum(caught) AS BIGINT) AS n_caught,
         |  round(CAST(sum(caught) AS DOUBLE) / count(*), 6) AS recall
         |FROM x WHERE cos >= tau GROUP BY 1 ORDER BY tau""".stripMargin,

    // q68's components + the q37 quality CTE + a NULLS LAST election
    "q204_canonical_election" ->
      s"""WITH RECURSIVE $simhashCandCte,
         |pairs AS (SELECT id_a, id_b
         |          FROM cand JOIN e ea ON ea.vec_id = cand.id_a
         |                    JOIN e eb ON eb.vec_id = cand.id_b
         |          WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.45),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (SELECT DISTINCT a, a FROM edges
         |                 UNION
         |                 SELECT ed.a, reach.r FROM edges ed
         |                 JOIN reach ON reach.id = ed.b),
         |comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
         |d AS (SELECT doc_id, n_chars, ${tok("text")} AS words
         |      FROM documents WHERE text IS NOT NULL),
         |q AS (SELECT doc_id,
         |    round(least(round(CAST(len(list_distinct(words)) AS DOUBLE)
         |        / greatest(len(words), 1), 6) * 2.0, 1.0) * 0.5
         |      + CASE WHEN len(words) BETWEEN 20 AND 400 THEN 0.3 ELSE 0.0 END
         |      + least(round(CAST(len(list_filter(words, w -> w IN $stoplist))
         |          AS DOUBLE) / greatest(len(words), 1), 6) * 3.0, 0.2), 6)
         |      AS quality
         |  FROM d),
         |m AS (SELECT c.id AS vec_id, c.cluster, q.quality
         |      FROM comp c LEFT JOIN q ON c.id = q.doc_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY cluster
         |        ORDER BY quality DESC NULLS LAST, vec_id ASC) AS rk FROM m)
         |SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
         |  max(CASE WHEN rk = 1 THEN vec_id END) AS canonical_vec,
         |  max(CASE WHEN rk = 1 THEN quality END) AS canonical_quality,
         |  round(max(quality) - min(quality), 6) AS quality_spread,
         |  CAST(sum(CASE WHEN rk = 1 AND vec_id = cluster THEN 1 ELSE 0 END)
         |    AS BIGINT) AS same_as_minid
         |FROM r GROUP BY 1 ORDER BY cluster""".stripMargin,

    // election regret: the q204 chain carrying n_tokens, grouped into
    // per-cluster regret + token bills of the min-id election
    "q246_election_regret" ->
      s"""WITH RECURSIVE $simhashCandCte,
         |pairs AS (SELECT id_a, id_b
         |          FROM cand JOIN e ea ON ea.vec_id = cand.id_a
         |                    JOIN e eb ON eb.vec_id = cand.id_b
         |          WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.45),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (SELECT DISTINCT a, a FROM edges
         |                 UNION
         |                 SELECT ed.a, reach.r FROM edges ed
         |                 JOIN reach ON reach.id = ed.b),
         |comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
         |d AS (SELECT doc_id, n_chars, ${tok("text")} AS words
         |      FROM documents WHERE text IS NOT NULL),
         |q AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens,
         |    round(least(round(CAST(len(list_distinct(words)) AS DOUBLE)
         |        / greatest(len(words), 1), 6) * 2.0, 1.0) * 0.5
         |      + CASE WHEN len(words) BETWEEN 20 AND 400 THEN 0.3 ELSE 0.0 END
         |      + least(round(CAST(len(list_filter(words, w -> w IN $stoplist))
         |          AS DOUBLE) / greatest(len(words), 1), 6) * 3.0, 0.2), 6)
         |      AS quality
         |  FROM d),
         |m AS (SELECT c.id AS vec_id, c.cluster, q.n_tokens, q.quality
         |      FROM comp c LEFT JOIN q ON c.id = q.doc_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY cluster
         |        ORDER BY quality DESC NULLS LAST, vec_id ASC) AS rk FROM m),
         |g AS (SELECT cluster, count(*) AS n_members,
         |        max(CASE WHEN vec_id = cluster THEN quality END) AS minid_quality,
         |        max(CASE WHEN rk = 1 THEN vec_id END) AS best_vec,
         |        max(CASE WHEN rk = 1 THEN quality END) AS best_quality,
         |        max(CASE WHEN vec_id = cluster THEN n_tokens END) AS kept_raw,
         |        sum(CASE WHEN vec_id <> cluster THEN n_tokens END) AS drop_raw
         |      FROM r GROUP BY 1)
         |SELECT cluster, n_members,
         |  CAST(best_vec <> cluster AS BIGINT) AS disagree,
         |  minid_quality, best_quality,
         |  round(best_quality - minid_quality, 6) AS regret,
         |  CAST(kept_raw AS BIGINT) AS tokens_kept_minid,
         |  CAST(drop_raw AS BIGINT) AS tokens_dropped_minid
         |FROM g ORDER BY cluster""".stripMargin,

    // deletion request set = principals ≡ 0 mod 97 (deterministic
    // stand-in for the legal queue); cascade via the forgotten
    // orderkey set
    "q205_deletion_impact" ->
      """WITH fo AS (SELECT DISTINCT o_orderkey FROM orders
        |            WHERE o_custkey % 97 = 0),
        |legs AS (
        |  SELECT 'customer' AS table_name, count(*) AS n_rows,
        |    CAST(sum(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_affected,
        |    CAST(1 AS BIGINT) AS cascade_depth FROM customer
        |  UNION ALL
        |  SELECT 'orders', count(*),
        |    CAST(sum(CASE WHEN o_custkey % 97 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT), CAST(1 AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'events', count(*),
        |    CAST(sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT), CAST(1 AS BIGINT) FROM events
        |  UNION ALL
        |  SELECT 'lineitem', count(*),
        |    CAST(sum(CASE WHEN fo.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT), CAST(2 AS BIGINT)
        |  FROM lineitem l LEFT JOIN fo ON l.l_orderkey = fo.o_orderkey)
        |SELECT table_name, n_rows, n_affected, cascade_depth,
        |  round(CAST(n_affected AS DOUBLE) / n_rows, 6) AS share
        |FROM legs ORDER BY table_name""".stripMargin,

    // the q175 arm split + right-censored week cohorts; (user, w0+off)
    // key probes into the distinct user-week frame
    "q206_retention_guardrail" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) // 7 AS week
        |  FROM events),
        |f AS (SELECT user_id, min(week) AS w0,
        |    ((user_id % 1000000007) * 1000003) % 1000000007 % 2 = 1 AS t
        |  FROM uw GROUP BY user_id),
        |hz AS (SELECT max(week) AS maxw FROM uw),
        |probes AS (SELECT f.user_id, f.t, f.w0 + o.off AS target, o.off
        |  FROM f CROSS JOIN hz
        |  CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS off) o
        |  WHERE f.w0 + o.off <= maxw),
        |r AS (SELECT p.t, p.off,
        |    CASE WHEN u.user_id IS NOT NULL THEN 1 ELSE 0 END AS retained
        |  FROM probes p LEFT JOIN uw u
        |    ON p.user_id = u.user_id AND p.target = u.week)
        |SELECT CAST(off AS BIGINT) AS week_offset,
        |  CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |  CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        |  round(CAST(sum(CASE WHEN t THEN retained ELSE 0 END) AS DOUBLE)
        |    / sum(CASE WHEN t THEN 1 ELSE 0 END), 6) AS rate_t,
        |  round(CAST(sum(CASE WHEN NOT t THEN retained ELSE 0 END) AS DOUBLE)
        |    / sum(CASE WHEN NOT t THEN 1 ELSE 0 END), 6) AS rate_c,
        |  round(CAST(sum(CASE WHEN t THEN retained ELSE 0 END) AS DOUBLE)
        |      / sum(CASE WHEN t THEN 1 ELSE 0 END)
        |    - CAST(sum(CASE WHEN NOT t THEN retained ELSE 0 END) AS DOUBLE)
        |      / sum(CASE WHEN NOT t THEN 1 ELSE 0 END), 6) + 0.0 AS gap
        |FROM r GROUP BY 1 ORDER BY week_offset""".stripMargin,

    "q207_effective_data" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id)
        |        AS rk FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_canonical,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(CASE WHEN rk = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
        |    AS effective_tokens,
        |  round(CAST(sum(CASE WHEN rk = 1 THEN n_tokens ELSE 0 END) AS DOUBLE)
        |    / sum(n_tokens), 6) AS effective_fraction
        |FROM r GROUP BY 1 ORDER BY source""".stripMargin,

    "q208_modality_coverage" ->
      """WITH v AS (SELECT DISTINCT vec_id FROM embeddings)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN v.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_embedded,
        |  round(CAST(sum(CASE WHEN v.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS coverage
        |FROM documents d LEFT JOIN v ON d.doc_id = v.vec_id
        |GROUP BY 1 ORDER BY source""".stripMargin,

    // Wilson intervals on the q102 exact funnel counts; z expression
    // (1.959964 * 1.959964) evaluated identically both engines
    "q209_funnel_ci" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |t1 AS (SELECT user_id, min(us) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN t1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t1 GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN t2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t2 GROUP BY 1),
        |row0 AS (SELECT (SELECT count(*) FROM t1) AS n1,
        |           (SELECT count(*) FROM t2) AS n2,
        |           (SELECT count(*) FROM t3) AS n3),
        |steps AS (
        |  SELECT CAST(1 AS BIGINT) AS step, 'click_after_view' AS step_name,
        |    CAST(n1 AS BIGINT) AS n_denom, CAST(n2 AS BIGINT) AS n_num
        |  FROM row0
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'purchase_after_click',
        |    CAST(n2 AS BIGINT), CAST(n3 AS BIGINT) FROM row0),
        |calc AS (SELECT *, CAST(n_denom AS DOUBLE) AS n,
        |    CAST(n_num AS DOUBLE) / CAST(n_denom AS DOUBLE) AS p
        |  FROM steps WHERE n_denom > 0)
        |SELECT step, step_name, n_denom, n_num, round(p, 6) AS rate,
        |  round((p + (1.959964 * 1.959964) / (2.0 * n))
        |      / (1.0 + (1.959964 * 1.959964) / n)
        |    - (1.959964 * sqrt(p * (1.0 - p) / n
        |        + (1.959964 * 1.959964) / (4.0 * n * n)))
        |      / (1.0 + (1.959964 * 1.959964) / n), 6) AS wilson_lo,
        |  round((p + (1.959964 * 1.959964) / (2.0 * n))
        |      / (1.0 + (1.959964 * 1.959964) / n)
        |    + (1.959964 * sqrt(p * (1.0 - p) / n
        |        + (1.959964 * 1.959964) / (4.0 * n * n)))
        |      / (1.0 + (1.959964 * 1.959964) / n), 6) AS wilson_hi
        |FROM calc ORDER BY step""".stripMargin,

    "q210_copy_flow" ->
      """WITH sh AS (SELECT DISTINCT source, md5(text) AS h
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  CAST(count(*) AS BIGINT) AS n_shared_hashes
        |FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
        |GROUP BY 1, 2
        |ORDER BY n_shared_hashes DESC, src_a, src_b""".stripMargin,

    "q211_truncation_loss" ->
      """WITH d AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL),
        |x AS (SELECT source, n_tokens,
        |    CAST(unnest([128, 512, 2048]) AS BIGINT) AS max_len FROM d)
        |SELECT source, max_len, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n_tokens > max_len THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_truncated,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(greatest(n_tokens - max_len, 0)) AS BIGINT) AS lost_tokens,
        |  round(CAST(sum(greatest(n_tokens - max_len, 0)) AS DOUBLE)
        |    / sum(n_tokens), 6) AS loss_share
        |FROM x GROUP BY 1, 2 ORDER BY source, max_len""".stripMargin,

    // one banding + rescoring pass (the q49 CTEs); the τ sweep is a
    // post-score predicate
    "q212_dedup_sensitivity" ->
      s"""WITH $simhashCandCte,
         |scored AS (SELECT cand.id_a, cand.id_b,
         |    round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
         |  FROM cand JOIN e ea ON ea.vec_id = cand.id_a
         |            JOIN e eb ON eb.vec_id = cand.id_b
         |  WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.45),
         |x AS (SELECT *, CAST(unnest([0.45, 0.6, 0.75]) AS DOUBLE) AS tau
         |      FROM scored),
         |m AS (SELECT tau, id_a, id_b, unnest([id_a, id_b]) AS member
         |      FROM x WHERE cos_sim >= tau)
         |SELECT tau, CAST(count(*) / 2 AS BIGINT) AS n_pairs,
         |  CAST(count(DISTINCT member) AS BIGINT) AS n_docs_affected
         |FROM m GROUP BY 1 ORDER BY tau""".stripMargin,

    // A-ES weighted sample: u from an EXPLICIT 12-hex-char polynomial
    // (no engine hex-parse builtin trusted); ln agrees bit-for-bit
    // (q154/q155 precedent)
    "q213_weighted_sample" -> {
      val uInt = (1 to 12).map { i =>
        s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * ${1L << (4 * (12 - i))}"
      }.mkString(" + ")
      s"""WITH s AS (SELECT doc_id, source, n_chars,
         |    md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h
         |  FROM documents WHERE text IS NOT NULL AND n_chars > 0),
         |kx AS (SELECT doc_id, source, n_chars,
         |    ln((($uInt) + 1.0) / 281474976710657.0) / n_chars AS key
         |  FROM s),
         |top AS (SELECT * FROM kx ORDER BY key DESC, doc_id LIMIT 100)
         |SELECT CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT)
         |    AS rank,
         |  doc_id, source, CAST(n_chars AS BIGINT) AS weight,
         |  round(key, 10) AS key
         |FROM top ORDER BY rank""".stripMargin
    },

    // the q83 temperature algebra on both raw and effective masses
    "q214_effective_mix" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id)
        |        AS rk FROM d),
        |per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN rk = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
        |      AS effective_tokens
        |  FROM r GROUP BY 1),
        |tot AS (SELECT sum(sqrt(n_tokens)) AS z_raw,
        |          sum(sqrt(effective_tokens)) AS z_eff FROM per)
        |SELECT source, n_tokens, effective_tokens,
        |  round(sqrt(n_tokens) / z_raw, 6) AS raw_weight,
        |  round(sqrt(effective_tokens) / z_eff, 6) AS effective_weight,
        |  round(sqrt(effective_tokens) / z_eff
        |    - sqrt(n_tokens) / z_raw, 6) AS weight_shift
        |FROM per CROSS JOIN tot ORDER BY source""".stripMargin,

    // q117's oriented enumeration + exact integer wedges
    "q215_clustering_coefficient" ->
      s"""WITH t AS (SELECT doc_id, ${tok("text")} AS ws FROM documents),
         |pairs AS (SELECT p['w1'] AS w1, p['w2'] AS w2 FROM
         |  (SELECT unnest(list_transform(range(1, len(ws)),
         |     i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
         |   FROM t WHERE len(ws) >= 2)),
         |ed AS (SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
         |       FROM pairs WHERE w1 <> w2),
         |deg AS (SELECT id, count(*) AS deg FROM
         |  (SELECT a AS id FROM ed UNION ALL SELECT b FROM ed) s GROUP BY id),
         |orr AS MATERIALIZED (SELECT
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND ed.a < ed.b)
         |         THEN ed.a ELSE ed.b END AS src,
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND ed.a < ed.b)
         |         THEN ed.b ELSE ed.a END AS dst,
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND ed.a < ed.b)
         |         THEN db.deg ELSE da.deg END AS dst_deg
         |  FROM ed JOIN deg da ON da.id = ed.a JOIN deg db ON db.id = ed.b),
         |tri AS (SELECT o1.src AS u, o1.dst AS v, o2.dst AS w
         |        FROM orr o1 JOIN orr o2 ON o1.src = o2.src
         |         AND (o1.dst_deg < o2.dst_deg
         |              OR (o1.dst_deg = o2.dst_deg AND o1.dst < o2.dst))
         |        JOIN orr o3 ON o3.src = o1.dst AND o3.dst = o2.dst),
         |wd AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         |         CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
         |       FROM deg),
         |tr AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM tri),
         |me AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM ed)
         |SELECT n_nodes, n_edges, n_triangles, n_wedges,
         |  CASE WHEN n_wedges > 0 THEN round(3.0 * CAST(n_triangles AS DOUBLE)
         |    / CAST(n_wedges AS DOUBLE), 6) END AS global_clustering
         |FROM wd CROSS JOIN tr CROSS JOIN me
         |ORDER BY n_nodes""".stripMargin,

    // CUPED: all moments exact 1e-3-grid integers (HUGEINT here,
    // decimal(38,0) in Spark); every variance ALGEBRAIC — never a
    // per-user residual double sum. θ pools arms; mid = the q190 split
    // diff-in-diff: the q216 per-user period totals + hash arm, paired
    // d = post − pre, Welch on d between arms (the q137 df tree);
    // + 0.0 on signed rounded outputs (Spark round is BigDecimal +0.0)
    "q254_diff_in_diff" ->
      """WITH ev AS (SELECT user_id,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
        |      AS day,
        |    CAST(round(value * 1000) AS BIGINT) AS v3
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL),
        |mid AS (SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT) AS mid
        |        FROM ev),
        |per AS (SELECT ((user_id % 1000000007) * 1000003) % 1000000007 % 2 = 1
        |          AS t,
        |        sum(CASE WHEN day <= mid THEN v3 ELSE 0 END) AS x3,
        |        sum(CASE WHEN day > mid THEN v3 ELSE 0 END) AS y3,
        |        sum(CASE WHEN day > mid THEN v3 ELSE 0 END)
        |          - sum(CASE WHEN day <= mid THEN v3 ELSE 0 END) AS d3
        |      FROM ev CROSS JOIN mid GROUP BY user_id),
        |arms AS (SELECT t, count(*) AS n,
        |    sum(x3) AS sx, sum(y3) AS sy, sum(d3) AS sd,
        |    sum(CAST(d3 AS HUGEINT) * CAST(d3 AS HUGEINT)) AS sdd
        |  FROM per GROUP BY 1),
        |row1 AS (SELECT
        |    sum(CASE WHEN t THEN n END) AS nt, sum(CASE WHEN NOT t THEN n END) AS nc,
        |    sum(CASE WHEN t THEN sx END) AS sxt, sum(CASE WHEN NOT t THEN sx END) AS sxc,
        |    sum(CASE WHEN t THEN sy END) AS syt, sum(CASE WHEN NOT t THEN sy END) AS syc,
        |    sum(CASE WHEN t THEN sd END) AS sdt, sum(CASE WHEN NOT t THEN sd END) AS sdc,
        |    sum(CASE WHEN t THEN sdd END) AS sddt, sum(CASE WHEN NOT t THEN sdd END) AS sddc
        |  FROM arms),
        |u AS (SELECT CAST(nt AS DOUBLE) AS nt, CAST(nc AS DOUBLE) AS nc,
        |    CAST(sxt AS DOUBLE) / 1000.0 AS sxt, CAST(sxc AS DOUBLE) / 1000.0 AS sxc,
        |    CAST(syt AS DOUBLE) / 1000.0 AS syt, CAST(syc AS DOUBLE) / 1000.0 AS syc,
        |    CAST(sdt AS DOUBLE) / 1000.0 AS sdt, CAST(sdc AS DOUBLE) / 1000.0 AS sdc,
        |    CAST(sddt AS DOUBLE) / 1000000.0 AS sddt,
        |    CAST(sddc AS DOUBLE) / 1000000.0 AS sddc
        |  FROM row1),
        |g AS (SELECT *,
        |    sdt / nt - sdc / nc AS did,
        |    CASE WHEN nt > 1 THEN (sddt - sdt * sdt / nt) / (nt - 1) END AS vt,
        |    CASE WHEN nc > 1 THEN (sddc - sdc * sdc / nc) / (nc - 1) END AS vc
        |  FROM u),
        |h AS (SELECT *, vt / nt + vc / nc AS se2 FROM g)
        |SELECT CAST(nt AS BIGINT) AS n_treat, CAST(nc AS BIGINT) AS n_ctrl,
        |  round(sxt / nt, 6) + 0.0 AS pre_mean_treat,
        |  round(syt / nt, 6) + 0.0 AS post_mean_treat,
        |  round(sxc / nc, 6) + 0.0 AS pre_mean_ctrl,
        |  round(syc / nc, 6) + 0.0 AS post_mean_ctrl,
        |  round(did, 6) + 0.0 AS did,
        |  CASE WHEN se2 > 0 THEN round(sqrt(se2), 6) + 0.0 END AS se,
        |  CASE WHEN se2 > 0 THEN round(did / sqrt(se2), 4) + 0.0 END AS t_stat,
        |  CASE WHEN se2 > 0 THEN round(se2 * se2 /
        |    (vt * vt / (nt * nt * (nt - 1)) + vc * vc / (nc * nc * (nc - 1))), 4)
        |    + 0.0 END AS welch_df
        |FROM h ORDER BY n_treat""".stripMargin,

    // dispersion index: zero days add nothing to the exact count
    // moments, only to the global span N — identical double trees
    // after the HUGEINT sums
    "q260_dispersion" ->
      """WITH ev AS (SELECT event_type,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
        |      AS day
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |span AS (SELECT max(day) - min(day) + 1 AS n_days FROM ev),
        |daily AS (SELECT event_type, day, count(*) AS c FROM ev GROUP BY 1, 2),
        |m AS (SELECT event_type, count(*) AS n_obs_days, sum(c) AS s1,
        |        sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s2
        |      FROM daily GROUP BY 1),
        |j AS (SELECT m.*, CAST(s.n_days AS BIGINT) AS n_days,
        |        CAST(s.n_days AS DOUBLE) AS nd
        |      FROM m CROSS JOIN span s),
        |k AS (SELECT *, CAST(s1 AS DOUBLE) / nd AS mean,
        |        CASE WHEN n_days > 1
        |          THEN (CAST(s2 AS DOUBLE) * nd
        |                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |               / (nd * (nd - 1)) END AS vr
        |      FROM j)
        |SELECT event_type, n_days, CAST(n_obs_days AS BIGINT) AS n_obs_days,
        |  CAST(s1 AS BIGINT) AS n_events,
        |  round(mean, 4) AS mean_daily,
        |  round(vr, 4) + 0.0 AS var_daily,
        |  CASE WHEN mean > 0 AND vr IS NOT NULL
        |    THEN round(vr / mean, 6) + 0.0 END AS dispersion,
        |  CASE WHEN mean > 0 AND vr IS NOT NULL
        |    THEN CAST(CASE WHEN vr / mean > 1.0 + 2.0 * sqrt(2.0 / (nd - 1))
        |              THEN 1 ELSE 0 END AS BIGINT) END AS overdispersed
        |FROM k ORDER BY event_type""".stripMargin,

    // Holt backtest: the same level/trend recurrence as the Spark fold,
    // replayed as a LINEAR recursive CTE keyed (event_type, rn) — one
    // reference to rec per step, aggregation-free recursive term; alpha/
    // beta and their complements interpolated from Temporal so the two
    // expression trees are literal-identical
    "q258_holt_backtest" -> {
      val a = Temporal.HoltAlpha
      val bta = Temporal.HoltBeta
      s"""WITH RECURSIVE daily AS (SELECT event_type,
         |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
         |      AS day,
         |    CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS DOUBLE) AS y
         |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
         |    AND ts IS NOT NULL
         |  GROUP BY 1, 2),
         |mid AS (SELECT CAST(floor((min(day) + max(day)) / 2) AS BIGINT) AS mid
         |        FROM daily),
         |rows0 AS (SELECT event_type, day, y,
         |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
         |  FROM daily),
         |rec AS (
         |  SELECT event_type, rn, day, y AS prev, y AS l,
         |         CAST(0 AS DOUBLE) AS b, CAST(0 AS DOUBLE) AS aeh,
         |         CAST(0 AS DOUBLE) AS aen, CAST(0 AS BIGINT) AS ne
         |  FROM rows0 WHERE rn = 1
         |  UNION ALL
         |  SELECT r.event_type, x.rn, x.day, x.y,
         |    $a * x.y + ${1 - a} * (r.l + r.b),
         |    $bta * (($a * x.y + ${1 - a} * (r.l + r.b)) - r.l) + ${1 - bta} * r.b,
         |    r.aeh + CASE WHEN x.day > m.mid
         |      THEN abs(x.y - (r.l + r.b)) ELSE 0 END,
         |    r.aen + CASE WHEN x.day > m.mid
         |      THEN abs(x.y - r.prev) ELSE 0 END,
         |    r.ne + CASE WHEN x.day > m.mid THEN 1 ELSE 0 END
         |  FROM rec r JOIN rows0 x
         |    ON x.event_type = r.event_type AND x.rn = r.rn + 1
         |  CROSS JOIN mid m),
         |fin AS (SELECT r.* FROM rec r
         |  JOIN (SELECT event_type, max(rn) AS mr FROM rec GROUP BY 1) q
         |    ON q.event_type = r.event_type AND q.mr = r.rn)
         |SELECT event_type, CAST(ne AS BIGINT) AS n_eval,
         |  CASE WHEN ne > 0 THEN round(aeh / ne / 1000.0, 4) + 0.0 END AS mae_holt,
         |  CASE WHEN ne > 0 THEN round(aen / ne / 1000.0, 4) + 0.0 END AS mae_naive,
         |  CASE WHEN aen > 0 THEN round(1.0 - aeh / aen, 6) + 0.0 END AS improvement,
         |  CASE WHEN ne = 0 THEN 'no_eval' WHEN aeh < aen THEN 'holt'
         |       WHEN aen < aeh THEN 'naive' ELSE 'tie' END AS best
         |FROM fin ORDER BY event_type""".stripMargin
    },

    // CUSUM change-point: pre-period moments from exact grid integers,
    // then Page's two-sided recurrence replayed as a LINEAR recursive
    // CTE keyed (type, rn) — the q258 pattern; sigma0 = 0 types emit
    // the 'flat' row without folding a divide-by-zero
    "q267_cusum_changepoint" -> {
      val k = Temporal.CusumK
      val h = Temporal.CusumH
      s"""WITH RECURSIVE daily AS (SELECT event_type,
         |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
         |      AS day,
         |    sum(CAST(round(value * 1000) AS BIGINT)) AS y3
         |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
         |    AND ts IS NOT NULL
         |  GROUP BY 1, 2),
         |mid AS (SELECT CAST(floor((min(day) + max(day)) / 2) AS BIGINT) AS mid
         |        FROM daily),
         |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
         |       FROM daily GROUP BY 1),
         |pre AS (SELECT event_type, count(*) AS n0,
         |    sum(CAST(y3 AS HUGEINT)) AS s1,
         |    sum(CAST(y3 AS HUGEINT) * CAST(y3 AS HUGEINT)) AS s2
         |  FROM daily CROSS JOIN mid WHERE day <= mid GROUP BY 1),
         |mo AS (SELECT event_type,
         |    CAST(s1 AS DOUBLE) / n0 / 1000.0 AS mu0,
         |    sqrt((CAST(s2 AS DOUBLE) * n0
         |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
         |      / (CAST(n0 AS DOUBLE) * n0)) / 1000.0 AS sig0
         |  FROM pre),
         |rows0 AS (SELECT d.event_type, d.day, d.y3, m.mu0, m.sig0,
         |    row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS rn
         |  FROM daily d JOIN mo m USING (event_type) WHERE m.sig0 > 0),
         |rec AS (
         |  SELECT event_type, rn, mu0, sig0,
         |    greatest(CAST(0 AS DOUBLE), (y3 / 1000.0 - mu0) / sig0 - $k) AS sp,
         |    greatest(CAST(0 AS DOUBLE), -(y3 / 1000.0 - mu0) / sig0 - $k) AS sn,
         |    CASE WHEN greatest(CAST(0 AS DOUBLE), (y3 / 1000.0 - mu0) / sig0 - $k) > $h
         |           OR greatest(CAST(0 AS DOUBLE), -(y3 / 1000.0 - mu0) / sig0 - $k) > $h
         |         THEN day ELSE CAST(-1 AS BIGINT) END AS fd,
         |    CASE WHEN greatest(CAST(0 AS DOUBLE), (y3 / 1000.0 - mu0) / sig0 - $k) > $h
         |         THEN CAST(1 AS BIGINT)
         |         WHEN greatest(CAST(0 AS DOUBLE), -(y3 / 1000.0 - mu0) / sig0 - $k) > $h
         |         THEN CAST(2 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS dir,
         |    greatest(CAST(0 AS DOUBLE), (y3 / 1000.0 - mu0) / sig0 - $k) AS mxp,
         |    greatest(CAST(0 AS DOUBLE), -(y3 / 1000.0 - mu0) / sig0 - $k) AS mxn
         |  FROM rows0 WHERE rn = 1
         |  UNION ALL
         |  SELECT r.event_type, x.rn, r.mu0, r.sig0,
         |    greatest(CAST(0 AS DOUBLE), r.sp + (x.y3 / 1000.0 - r.mu0) / r.sig0 - $k),
         |    greatest(CAST(0 AS DOUBLE), r.sn - (x.y3 / 1000.0 - r.mu0) / r.sig0 - $k),
         |    CASE WHEN r.fd >= 0 THEN r.fd
         |      WHEN greatest(CAST(0 AS DOUBLE), r.sp + (x.y3 / 1000.0 - r.mu0) / r.sig0 - $k) > $h
         |        OR greatest(CAST(0 AS DOUBLE), r.sn - (x.y3 / 1000.0 - r.mu0) / r.sig0 - $k) > $h
         |      THEN x.day ELSE CAST(-1 AS BIGINT) END,
         |    CASE WHEN r.fd >= 0 THEN r.dir
         |      WHEN greatest(CAST(0 AS DOUBLE), r.sp + (x.y3 / 1000.0 - r.mu0) / r.sig0 - $k) > $h
         |      THEN CAST(1 AS BIGINT)
         |      WHEN greatest(CAST(0 AS DOUBLE), r.sn - (x.y3 / 1000.0 - r.mu0) / r.sig0 - $k) > $h
         |      THEN CAST(2 AS BIGINT) ELSE CAST(0 AS BIGINT) END,
         |    greatest(r.mxp,
         |      greatest(CAST(0 AS DOUBLE), r.sp + (x.y3 / 1000.0 - r.mu0) / r.sig0 - $k)),
         |    greatest(r.mxn,
         |      greatest(CAST(0 AS DOUBLE), r.sn - (x.y3 / 1000.0 - r.mu0) / r.sig0 - $k))
         |  FROM rec r JOIN rows0 x
         |    ON x.event_type = r.event_type AND x.rn = r.rn + 1),
         |fin AS (SELECT r.* FROM rec r
         |  JOIN (SELECT event_type, max(rn) AS mr FROM rec GROUP BY 1) q
         |    ON q.event_type = r.event_type AND q.mr = r.rn)
         |SELECT f.event_type, nd.n_days,
         |  round(f.mu0, 6) + 0.0 AS mu0,
         |  round(f.sig0, 6) + 0.0 AS sigma0,
         |  CASE WHEN f.fd >= 0 THEN f.fd END AS first_alarm_day,
         |  CASE WHEN f.dir = 1 THEN 'up' WHEN f.dir = 2 THEN 'down'
         |       ELSE 'none' END AS alarm_dir,
         |  round(f.mxp, 6) + 0.0 AS max_cusum_up,
         |  round(f.mxn, 6) + 0.0 AS max_cusum_down
         |FROM fin f JOIN nd USING (event_type)
         |UNION ALL
         |SELECT m.event_type, nd.n_days,
         |  round(m.mu0, 6) + 0.0, round(m.sig0, 6) + 0.0,
         |  NULL, 'flat', NULL, NULL
         |FROM mo m JOIN nd USING (event_type) WHERE NOT (m.sig0 > 0)
         |ORDER BY event_type""".stripMargin
    },

    "q216_cuped" ->
      """WITH ev AS (SELECT user_id,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
        |      AS day,
        |    CAST(round(value * 1000) AS BIGINT) AS v3
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL),
        |mid AS (SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT) AS mid
        |        FROM ev),
        |per AS (SELECT ((user_id % 1000000007) * 1000003) % 1000000007 % 2 = 1
        |          AS t,
        |        sum(CASE WHEN day <= mid THEN v3 ELSE 0 END) AS x3,
        |        sum(CASE WHEN day > mid THEN v3 ELSE 0 END) AS y3
        |      FROM ev CROSS JOIN mid GROUP BY user_id),
        |arms AS (SELECT t, count(*) AS n,
        |    sum(x3) AS sx, sum(y3) AS sy,
        |    sum(CAST(x3 AS HUGEINT) * CAST(x3 AS HUGEINT)) AS sxx,
        |    sum(CAST(x3 AS HUGEINT) * CAST(y3 AS HUGEINT)) AS sxy,
        |    sum(CAST(y3 AS HUGEINT) * CAST(y3 AS HUGEINT)) AS syy
        |  FROM per GROUP BY 1),
        |tot AS (SELECT sum(n) AS gn, sum(sx) AS gsx, sum(sxx) AS gsxx,
        |        sum(sxy) AS gsxy, sum(sy) AS gsy FROM arms),
        |j AS (SELECT t, CAST(n AS DOUBLE) AS n,
        |    CAST(sx AS DOUBLE) / 1000.0 AS sxd,
        |    CAST(sy AS DOUBLE) / 1000.0 AS syd,
        |    CAST(sxx AS DOUBLE) / 1000000.0 AS sxxd,
        |    CAST(sxy AS DOUBLE) / 1000000.0 AS sxyd,
        |    CAST(syy AS DOUBLE) / 1000000.0 AS syyd,
        |    CAST(gn AS DOUBLE) AS gnd,
        |    CAST(gsx AS DOUBLE) / 1000.0 AS gsxd,
        |    CAST(gsy AS DOUBLE) / 1000.0 AS gsyd,
        |    CAST(gsxx AS DOUBLE) / 1000000.0 AS gsxxd,
        |    CAST(gsxy AS DOUBLE) / 1000000.0 AS gsxyd
        |  FROM arms CROSS JOIN tot),
        |k AS (SELECT t, n, sxd / n AS mx, syd / n AS my,
        |    CASE WHEN n > 1
        |      THEN (sxxd - sxd * sxd / n) / (n - 1) END AS vx,
        |    CASE WHEN n > 1
        |      THEN (syyd - syd * syd / n) / (n - 1) END AS vy,
        |    CASE WHEN n > 1
        |      THEN (sxyd - sxd * syd / n) / (n - 1) END AS cxy,
        |    gsxd / gnd AS gmx,
        |    CASE WHEN gnd > 1
        |      THEN (gsxxd - gsxd * gsxd / gnd) / (gnd - 1) END AS gvx,
        |    CASE WHEN gnd > 1
        |      THEN (gsxyd - gsxd * gsyd / gnd) / (gnd - 1) END AS gcxy
        |  FROM j),
        |f AS (SELECT *, CASE WHEN gvx > 0 THEN gcxy / gvx END AS theta FROM k)
        |SELECT CASE WHEN t THEN 'treatment' ELSE 'control' END AS arm,
        |  CAST(n AS BIGINT) AS n_users,
        |  round(my, 6) AS mean_y,
        |  round(CASE WHEN theta IS NOT NULL
        |    THEN my - theta * (mx - gmx) END, 6) + 0.0 AS mean_cuped,
        |  round(vy, 6) AS var_y,
        |  round(CASE WHEN theta IS NOT NULL
        |    THEN vy - 2.0 * theta * cxy + theta * theta * vx END, 6) + 0.0
        |    AS var_cuped,
        |  round(CASE WHEN theta IS NOT NULL AND vy > 0
        |    THEN 1.0 - (vy - 2.0 * theta * cxy + theta * theta * vx) / vy
        |    END, 6) + 0.0 AS var_reduction,
        |  round(theta, 6) + 0.0 AS theta
        |FROM f ORDER BY arm""".stripMargin,

    // Mann-Whitney: ×2-scaled midranks keep every intermediate an
    // exact integer over the O(|value grid|) histogram; z/p via the
    // q155 erfc polynomial with identical literals
    "q217_mann_whitney" ->
      """WITH h AS (SELECT CAST(round(value * 1000) AS BIGINT) AS v3,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n2
        |  FROM events WHERE value IS NOT NULL
        |    AND event_type IN ('purchase', 'view')
        |  GROUP BY 1),
        |c AS (SELECT *, coalesce(sum(n1 + n2) OVER (ORDER BY v3
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
        |      n1 + n2 AS tcell FROM h),
        |m AS (SELECT sum(n1) AS n1t, sum(n2) AS n2t,
        |    sum(CAST(n1 AS HUGEINT)
        |      * (CAST(below AS HUGEINT) * 2 + CAST(tcell AS HUGEINT) + 1))
        |      AS r1x2,
        |    sum(CAST(tcell AS HUGEINT) * CAST(tcell AS HUGEINT)
        |      * CAST(tcell AS HUGEINT) - CAST(tcell AS HUGEINT)) AS ties
        |  FROM c),
        |g AS (SELECT CAST(n1t AS DOUBLE) AS n1, CAST(n2t AS DOUBLE) AS n2,
        |    CAST(r1x2 AS DOUBLE) AS r1x2, CAST(ties AS DOUBLE) AS tsum FROM m),
        |u AS (SELECT n1, n2, r1x2 / 2.0 - n1 * (n1 + 1) / 2.0 AS u,
        |    n1 + n2 AS nn, tsum FROM g),
        |z0 AS (SELECT *, n1 * n2 / 2.0 AS mu,
        |    n1 * n2 / 12.0 * ((nn + 1) - tsum / (nn * (nn - 1))) AS varu FROM u),
        |zz AS (SELECT *, CASE WHEN varu > 0
        |    THEN round((u - mu) / sqrt(varu), 4) + 0.0 END AS z FROM z0),
        |p AS (SELECT *, abs(z) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS kk FROM zz)
        |SELECT CAST(n1 AS BIGINT) AS n_purchase, CAST(n2 AS BIGINT) AS n_view,
        |  round(u, 1) AS u_stat, z,
        |  round((((((1.061405429 * kk - 1.453152027) * kk) + 1.421413741) * kk
        |    - 0.284496736) * kk + 0.254829592) * kk * exp(-(x * x)), 6)
        |    AS p_value
        |FROM p ORDER BY n_purchase""".stripMargin,

    // KS: the sup runs over exact integers |c1·N2 − c2·N1| per grid
    // cell; argmax tie-break = lowest value
    "q218_ks_test" ->
      """WITH h AS (SELECT CAST(round(value * 1000) AS BIGINT) AS v3,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n2
        |  FROM events WHERE value IS NOT NULL
        |    AND event_type IN ('purchase', 'view')
        |  GROUP BY 1),
        |tot AS (SELECT sum(n1) AS n1t, sum(n2) AS n2t FROM h),
        |cum AS (SELECT v3, n1t, n2t,
        |    sum(CAST(n1 AS HUGEINT)) OVER w AS c1,
        |    sum(CAST(n2 AS HUGEINT)) OVER w AS c2
        |  FROM h CROSS JOIN tot
        |  WINDOW w AS (ORDER BY v3
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |d AS (SELECT *, abs(c1 * CAST(n2t AS HUGEINT)
        |    - c2 * CAST(n1t AS HUGEINT)) AS idiff FROM cum),
        |top AS (SELECT * FROM (SELECT *,
        |    row_number() OVER (ORDER BY idiff DESC, v3 ASC) AS rk FROM d)
        |  WHERE rk = 1),
        |sel AS (SELECT CAST(n1t AS BIGINT) AS n_purchase,
        |    CAST(n2t AS BIGINT) AS n_view,
        |    round(CAST(idiff AS DOUBLE)
        |      / (CAST(n1t AS DOUBLE) * CAST(n2t AS DOUBLE)), 6) AS d_stat,
        |    CAST(v3 AS DOUBLE) / 1000.0 AS at_value,
        |    round(1.358 * sqrt((CAST(n1t AS DOUBLE) + CAST(n2t AS DOUBLE))
        |      / (CAST(n1t AS DOUBLE) * CAST(n2t AS DOUBLE))), 6) AS crit_05
        |  FROM top)
        |SELECT n_purchase, n_view, d_stat, at_value, crit_05,
        |  CAST(CASE WHEN d_stat > crit_05 THEN 1 ELSE 0 END AS BIGINT)
        |    AS reject_05
        |FROM sel ORDER BY n_purchase""".stripMargin,

    // EB shrinkage: q37 quality on the 1e-6 grid -> exact per-source
    // moments; the two cross-source double folds run source-ORDERED
    // (the q181 sequential-sum convention)
    "q219_eb_shrinkage" -> {
      s"""WITH d AS (SELECT source, n_chars, ${tok("text")} AS words
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT source,
         |    CAST(len(words) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_distinct(words)) AS DOUBLE)
         |      / greatest(len(words), 1), 6) AS ttr,
         |    round(CAST(len(list_filter(words, w -> w IN $stoplist)) AS DOUBLE)
         |      / greatest(len(words), 1), 6) AS stop_share
         |  FROM d),
         |q AS (SELECT source, CAST(round(round(least(ttr * 2.0, 1.0) * 0.5
         |      + CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 0.3 ELSE 0.0 END
         |      + least(stop_share * 3.0, 0.2), 6) * 1000000) AS BIGINT) AS q6
         |  FROM s),
         |per AS (SELECT source, count(*) AS n, sum(q6) AS s,
         |    sum(CAST(q6 AS HUGEINT) * CAST(q6 AS HUGEINT)) AS ss
         |  FROM q GROUP BY 1),
         |w1 AS (SELECT source, n, s, ss,
         |    sum(n) OVER wa AS bign, count(*) OVER wa AS k,
         |    sum(s) OVER wa AS gs,
         |    sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) OVER wa AS sn2
         |  FROM per WINDOW wa AS (ORDER BY source
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
         |c AS (SELECT source, n,
         |    CAST(n AS DOUBLE) AS nd, CAST(s AS DOUBLE) / 1000000.0 AS sd,
         |    CAST(ss AS DOUBLE) / 1e12 AS ssd, CAST(bign AS DOUBLE) AS bnd,
         |    CAST(k AS DOUBLE) AS kd, CAST(gs AS DOUBLE) / 1000000.0 AS gsd,
         |    CAST(sn2 AS DOUBLE) AS sn2d
         |  FROM w1),
         |c2 AS (SELECT *, sd / nd AS m, gsd / bnd AS mu FROM c),
         |c3 AS (SELECT *,
         |    sum(ssd - sd * sd / nd) OVER wa AS wss,
         |    sum(nd * (m - mu) * (m - mu)) OVER wa AS bss
         |  FROM c2 WINDOW wa AS (ORDER BY source
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
         |c4 AS (SELECT *,
         |    CASE WHEN bnd > kd THEN wss / (bnd - kd) END AS sig2,
         |    CASE WHEN kd > 1 THEN bss / (kd - 1) END AS msb,
         |    CASE WHEN kd > 1
         |      THEN (bnd - sn2d / bnd) / (kd - 1) END AS n0 FROM c3),
         |c5 AS (SELECT *, CASE WHEN msb IS NOT NULL AND sig2 IS NOT NULL
         |    THEN greatest((msb - sig2) / n0, 0.0) END AS tau2 FROM c4),
         |c6 AS (SELECT *, CASE WHEN tau2 + sig2 / nd > 0
         |    THEN tau2 / (tau2 + sig2 / nd)
         |    ELSE CASE WHEN tau2 IS NOT NULL AND sig2 IS NOT NULL
         |      THEN 0.0 END END AS shrink FROM c5)
         |SELECT source, CAST(n AS BIGINT) AS n_docs,
         |  round(m, 6) AS raw_mean,
         |  round(mu + shrink * (m - mu), 6) AS shrunk_mean,
         |  round(shrink, 6) AS shrink_weight,
         |  round(tau2, 8) AS tau2
         |FROM c6 ORDER BY source""".stripMargin
    },

    // ACF1/DW from exact 1e-3-grid integer series moments (one
    // ordered-window pass); row lag over observed days (q126)
    "q220_autocorr" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    sum(CAST(round(value * 1000) AS BIGINT)) AS y3
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |l AS (SELECT event_type, d, y3,
        |    lag(y3) OVER (PARTITION BY event_type ORDER BY d) AS yl FROM daily),
        |m AS (SELECT event_type, count(*) AS n, sum(y3) AS s,
        |    sum(CAST(y3 AS HUGEINT) * CAST(y3 AS HUGEINT)) AS ss,
        |    sum(CASE WHEN yl IS NOT NULL
        |      THEN CAST(y3 AS HUGEINT) * CAST(yl AS HUGEINT)
        |      ELSE 0 END) AS sl,
        |    sum(CASE WHEN yl IS NOT NULL
        |      THEN (CAST(y3 AS HUGEINT) - CAST(yl AS HUGEINT))
        |         * (CAST(y3 AS HUGEINT) - CAST(yl AS HUGEINT))
        |      ELSE 0 END) AS sd2,
        |    min_by(y3, d) AS yfirst, max_by(y3, d) AS ylast
        |  FROM l GROUP BY 1),
        |c AS (SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |    CAST(n AS DOUBLE) AS nd,
        |    CAST(s AS DOUBLE) / 1000.0 AS sd,
        |    CAST(ss AS DOUBLE) / 1000000.0 AS ssd,
        |    CAST(sl AS DOUBLE) / 1000000.0 AS sld,
        |    CAST(sd2 AS DOUBLE) / 1000000.0 AS sd2d,
        |    CAST(yfirst AS DOUBLE) / 1000.0 AS y1,
        |    CAST(ylast AS DOUBLE) / 1000.0 AS yn
        |  FROM m WHERE n >= 3),
        |e AS (SELECT *, sd / nd AS ybar, ssd - sd * sd / nd AS css FROM c)
        |SELECT event_type, n_days,
        |  round(ybar, 4) AS mean_daily,
        |  round(CASE WHEN css > 0
        |    THEN (sld - ybar * (sd - y1) - ybar * (sd - yn)
        |      + (nd - 1) * ybar * ybar) / css END, 4) + 0.0 AS acf1,
        |  round(CASE WHEN css > 0 THEN sd2d / css END, 4) AS dw
        |FROM e ORDER BY event_type""".stripMargin,

    // empirical-Bernstein bounds: per-source closed-form arithmetic on
    // exact 1e-6-grid moments; ln(3/0.05) spelled ln(60.0) — 3.0/0.05
    // is NOT the exact double 60
    "q221_bernstein_bounds" -> {
      s"""WITH d AS (SELECT source, n_chars, ${tok("text")} AS words
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT source,
         |    CAST(len(words) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_distinct(words)) AS DOUBLE)
         |      / greatest(len(words), 1), 6) AS ttr,
         |    round(CAST(len(list_filter(words, w -> w IN $stoplist)) AS DOUBLE)
         |      / greatest(len(words), 1), 6) AS stop_share
         |  FROM d),
         |q AS (SELECT source, CAST(round(round(least(ttr * 2.0, 1.0) * 0.5
         |      + CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 0.3 ELSE 0.0 END
         |      + least(stop_share * 3.0, 0.2), 6) * 1000000) AS BIGINT) AS q6
         |  FROM s),
         |per AS (SELECT source, count(*) AS n, sum(q6) AS s,
         |    sum(CAST(q6 AS HUGEINT) * CAST(q6 AS HUGEINT)) AS ss
         |  FROM q GROUP BY 1),
         |c AS (SELECT source, CAST(n AS BIGINT) AS n_docs,
         |    CAST(n AS DOUBLE) AS nd,
         |    CAST(s AS DOUBLE) / 1000000.0 AS sd,
         |    CAST(ss AS DOUBLE) / 1e12 AS ssd
         |  FROM per WHERE n >= 2),
         |e AS (SELECT *, sd / nd AS m,
         |    (ssd - sd * sd / nd) / (nd - 1) AS v FROM c),
         |f AS (SELECT *, sqrt(2.0 * v * ln(60.0) / nd)
         |    + 3.0 * ln(60.0) / nd AS margin FROM e),
         |o AS (SELECT source, n_docs, round(m, 6) AS mean_q,
         |    round(v, 8) AS var_q,
         |    round(m - margin, 6) + 0.0 AS lb_95,
         |    round(m + margin, 6) AS ub_95 FROM f)
         |SELECT source, n_docs, mean_q, var_q, lb_95, ub_95,
         |  CAST(CASE WHEN ub_95 < 0.5 THEN 1 ELSE 0 END AS BIGINT)
         |    AS confidently_low
         |FROM o ORDER BY source""".stripMargin
    },

    // banding planner: powers as LEFT-ASSOC multiplication chains and
    // s* = exp(ln(1/b)/r) — cross-engine pow() bit-parity is NOT
    // established, ln/exp and products are. Generated from the same
    // Dedup.BandingConfigs constants as the Spark plan.
    "q222_banding_planner" -> {
      val blocks = operators.Dedup.BandingConfigs.map { case (b, r) =>
        val sr = Seq.fill(r)("s").mkString(" * ")
        val qb = Seq.fill(b)(s"(1.0 - $sr)").mkString(" * ")
        s"""SELECT CAST($b AS BIGINT) AS bands,
           |  CAST($r AS BIGINT) AS rows_per_band, s,
           |  round(1.0 - $qb, 6) AS p_collide,
           |  round(exp(ln(1.0 / $b) / ${r.toDouble}), 6) AS s_threshold
           |FROM grid""".stripMargin
      }
      s"""WITH grid AS (SELECT CAST(unnest(range(1, 20)) AS DOUBLE) / 20.0 AS s)
         |${blocks.mkString("\n", "\nUNION ALL\n", "\n")}
         |ORDER BY rows_per_band, s""".stripMargin
    },

    // threshold stability: the q201 recursive-closure pattern run at
    // BOTH taus on one scored pair set; pair-counting sums exact
    // (×2-scaled, HUGEINT); singleton-free contested universe by
    // documented scope
    "q223_threshold_stability" ->
      s"""WITH RECURSIVE $simhashCandCte,
         |p45 AS MATERIALIZED (SELECT id_a, id_b,
         |    round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
         |  FROM cand JOIN e ea ON ea.vec_id = cand.id_a
         |            JOIN e eb ON eb.vec_id = cand.id_b
         |  WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.45),
         |ed45 AS (SELECT id_a AS a, id_b AS b FROM p45
         |         UNION SELECT id_b, id_a FROM p45),
         |r45(id, r) AS (SELECT DISTINCT a, a FROM ed45
         |               UNION
         |               SELECT ed.a, r45.r FROM ed45 ed
         |               JOIN r45 ON r45.id = ed.b),
         |cl45 AS (SELECT id, min(r) AS c45 FROM r45 GROUP BY id),
         |p60 AS (SELECT id_a, id_b FROM p45 WHERE cos_sim >= 0.6),
         |ed60 AS (SELECT id_a AS a, id_b AS b FROM p60
         |         UNION SELECT id_b, id_a FROM p60),
         |r60(id, r) AS (SELECT DISTINCT a, a FROM ed60
         |               UNION
         |               SELECT ed.a, r60.r FROM ed60 ed
         |               JOIN r60 ON r60.id = ed.b),
         |cl60 AS (SELECT id, min(r) AS c60 FROM r60 GROUP BY id),
         |asg AS (SELECT cl45.id, cl45.c45, coalesce(cl60.c60, cl45.id) AS c60
         |        FROM cl45 LEFT JOIN cl60 ON cl60.id = cl45.id),
         |cells AS (SELECT c45, c60, count(*) AS nij FROM asg GROUP BY 1, 2),
         |sij AS (SELECT sum(CAST(nij AS HUGEINT) * (CAST(nij AS HUGEINT) - 1))
         |          AS sij2, sum(nij) AS n FROM cells),
         |sa AS (SELECT sum(CAST(ai AS HUGEINT) * (CAST(ai AS HUGEINT) - 1))
         |          AS sa2, count(*) AS k45
         |       FROM (SELECT c45, sum(nij) AS ai FROM cells GROUP BY 1)),
         |sb AS (SELECT sum(CAST(bj AS HUGEINT) * (CAST(bj AS HUGEINT) - 1))
         |          AS sb2, count(*) AS k60
         |       FROM (SELECT c60, sum(nij) AS bj FROM cells GROUP BY 1)),
         |np1 AS (SELECT count(*) AS n_pairs_045 FROM p45),
         |np2 AS (SELECT count(*) AS n_pairs_060 FROM p60),
         |base AS (SELECT CAST(coalesce(n, 0) AS BIGINT) AS n_vectors,
         |    n_pairs_045,
         |    n_pairs_060, CAST(k45 AS BIGINT) AS n_clusters_045,
         |    CAST(k60 AS BIGINT) AS n_clusters_060,
         |    CAST(coalesce(n, 0) AS DOUBLE) AS nd,
         |    CAST(sij2 AS DOUBLE) AS sij2d,
         |    CAST(sa2 AS DOUBLE) AS sa2d, CAST(sb2 AS DOUBLE) AS sb2d
         |  FROM sij CROSS JOIN sa CROSS JOIN sb
         |  CROSS JOIN np1 CROSS JOIN np2),
         |calc AS (SELECT *, nd * (nd - 1) AS rr FROM base),
         |calc2 AS (SELECT *, CASE WHEN rr > 0
         |    THEN sa2d / 2.0 * (sb2d / 2.0) / (rr / 2.0) END AS expected
         |  FROM calc),
         |calc3 AS (SELECT *, CASE WHEN expected IS NOT NULL
         |    THEN (sa2d / 2.0 + sb2d / 2.0) / 2.0 - expected END AS denom
         |  FROM calc2)
         |SELECT n_vectors, n_pairs_045, n_pairs_060, n_clusters_045,
         |  n_clusters_060,
         |  round(CASE WHEN rr > 0
         |    THEN (rr + 2.0 * sij2d - sa2d - sb2d) / rr END, 6) AS rand_index,
         |  round(CASE WHEN denom IS NOT NULL AND abs(denom) > 0
         |    THEN (sij2d / 2.0 - expected) / denom END, 6) + 0.0 AS ari
         |FROM calc3 ORDER BY n_vectors""".stripMargin,

    // nprobe sweep: the q148 CTEs with a probe-count series; nested
    // probe sets (crk <= np), one fit/truth shared across the sweep
    "q224_nprobe_sweep" ->
      s"""WITH $kmeansCte,
         |mem AS (SELECT a.vec_id AS n_id, a.cluster, e.v AS nv
         |        FROM af a JOIN e ON e.vec_id = a.vec_id),
         |csz AS (SELECT cluster, count(*) AS csz FROM af GROUP BY 1),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < ${operators.KMeans.EvalBlock}),
         |pr AS (SELECT CAST(unnest([${operators.KMeans.ProbeSweep.mkString(", ")}]) AS BIGINT) AS np),
         |qr AS (SELECT q_id, qv, cluster, crk FROM (
         |    SELECT q_id, qv, cluster, row_number() OVER
         |      (PARTITION BY q_id ORDER BY cdist, cluster) AS crk
         |    FROM (SELECT q.q_id, q.qv, c.cluster,
         |                 round(${sqDistSql("q.qv", "c.cv")}, 6) AS cdist
         |          FROM q CROSS JOIN $kmeansLast c) s0) t WHERE crk <= ${operators.KMeans.ProbeSweep.max}),
         |qc AS (SELECT pr.np, qr.q_id, qr.qv, qr.cluster
         |       FROM qr JOIN pr ON qr.crk <= pr.np),
         |ivf AS (SELECT np, q_id, n_id FROM (
         |    SELECT qc.np, qc.q_id, m.n_id, row_number() OVER
         |      (PARTITION BY qc.np, qc.q_id ORDER BY
         |         round(${sqDistSql("qc.qv", "m.nv")}, 6), m.n_id) AS rank
         |    FROM mem m JOIN qc USING (cluster)
         |    WHERE m.n_id <> qc.q_id) t WHERE rank <= 10),
         |truth AS (SELECT q_id, n_id FROM (
         |    SELECT q.q_id, e.vec_id AS n_id, row_number() OVER
         |      (PARTITION BY q.q_id ORDER BY
         |         round(${sqDistSql("q.qv", "e.v")}, 6), e.vec_id) AS rank
         |    FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id) t
         |  WHERE rank <= 10),
         |tn AS (SELECT pr.np, t.q_id, t.n_id FROM truth t CROSS JOIN pr),
         |ov AS (SELECT tn.np, tn.q_id,
         |         CAST(count(i.n_id) AS BIGINT) AS n_overlap
         |       FROM tn LEFT JOIN ivf i
         |         ON i.np = tn.np AND i.q_id = tn.q_id AND i.n_id = tn.n_id
         |       GROUP BY 1, 2),
         |sc AS (SELECT np, q_id, sum(csz) AS n_raw
         |       FROM qc JOIN csz USING (cluster) GROUP BY 1, 2)
         |SELECT sc.np AS nprobe, sc.q_id AS q_id,
         |  CAST(sc.n_raw - 1 AS BIGINT) AS n_scanned, ov.n_overlap,
         |  round(ov.n_overlap / 10.0, 4) AS recall_at_10
         |FROM sc JOIN ov ON ov.np = sc.np AND ov.q_id = sc.q_id
         |ORDER BY nprobe, sc.q_id""".stripMargin,

    // K sweep: four prefixed seeded-Lloyd chains over the shared e/q/
    // pr/tn/nv CTEs; per-(K, nprobe) totals from exact integers
    "q242_k_sweep" ->
      s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < ${operators.KMeans.EvalBlock}),
         |pr AS (SELECT CAST(unnest([${operators.KMeans.ProbeSweep.mkString(", ")}]) AS BIGINT) AS np),
         |nv AS (SELECT count(*) AS n_vectors FROM e),
         |truth AS MATERIALIZED (SELECT q_id, n_id FROM (
         |    SELECT q.q_id, e.vec_id AS n_id, row_number() OVER
         |      (PARTITION BY q.q_id ORDER BY
         |         round(${sqDistSql("q.qv", "e.v")}, 6), e.vec_id) AS rank
         |    FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id) t
         |  WHERE rank <= 10),
         |tn AS (SELECT pr.np, t.q_id, t.n_id FROM truth t CROSS JOIN pr),
         |${operators.KMeans.KSweep.map(k =>
             kmeansChain(k, s"k${k}_") + ",\n" + q242Block(k)).mkString(",\n")}
         |${operators.KMeans.KSweep.map(k =>
             s"SELECT * FROM k${k}_row").mkString("\nUNION ALL\n")}
         |ORDER BY k, nprobe""".stripMargin,

    // composed IVF+ADC+refine: the kmeans chain + the PQ tail over the
    // shared e; probe Nprobe cells, ADC-rank members, exact-rescore
    // top-RefineR; per-query recall + the codes/floats bill
    "q244_ivf_adc" ->
      s"""WITH $kmeansCte,
         |$pqTailCte,
         |qq AS (SELECT vec_id AS q_id, v AS qv FROM e
         |       WHERE vec_id < ${operators.KMeans.EvalBlock}),
         |qr AS (SELECT q_id, cluster FROM (
         |    SELECT q_id, cluster, row_number() OVER
         |      (PARTITION BY q_id ORDER BY cdist, cluster) AS crk
         |    FROM (SELECT qq.q_id, c.cluster,
         |                 round(${sqDistSql("qq.qv", "c.cv")}, 6) AS cdist
         |          FROM qq CROSS JOIN $kmeansLast c) s0) t
         |  WHERE crk <= ${operators.KMeans.Nprobe}),
         |cand AS (SELECT qr.q_id, a.vec_id AS n_id
         |         FROM qr JOIN af a USING (cluster) WHERE a.vec_id <> qr.q_id),
         |lut AS (SELECT f.vec_id AS q_id, f.sub, cb.code,
         |          round(${sqDistSql("f.sv", "cb.cv")}, 6) AS d
         |        FROM flat f JOIN cb ON cb.sub = f.sub
         |        WHERE f.vec_id < ${operators.KMeans.EvalBlock}),
         |adc AS (SELECT c.q_id, c.n_id, round(sum(l.d), 6) AS adc
         |        FROM cand c JOIN codes k ON k.vec_id = c.n_id
         |        JOIN lut l ON l.q_id = c.q_id AND l.sub = k.sub
         |          AND l.code = k.code
         |        GROUP BY 1, 2),
         |short AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id, row_number() OVER
         |      (PARTITION BY q_id ORDER BY adc, n_id) AS ark
         |    FROM adc) t WHERE ark <= ${operators.Quantize.RefineR}),
         |res AS (SELECT q_id, n_id FROM (
         |    SELECT s.q_id, s.n_id, row_number() OVER
         |      (PARTITION BY s.q_id ORDER BY
         |         round(${sqDistSql("qq.qv", "e.v")}, 6), s.n_id) AS rank
         |    FROM short s JOIN qq ON qq.q_id = s.q_id
         |    JOIN e ON e.vec_id = s.n_id) t WHERE rank <= 10),
         |truth AS (SELECT q_id, n_id FROM (
         |    SELECT qq.q_id, e.vec_id AS n_id, row_number() OVER
         |      (PARTITION BY qq.q_id ORDER BY
         |         round(${sqDistSql("qq.qv", "e.v")}, 6), e.vec_id) AS rank
         |    FROM e CROSS JOIN qq WHERE e.vec_id <> qq.q_id) t
         |  WHERE rank <= 10),
         |ov AS (SELECT t.q_id, CAST(count(r.n_id) AS BIGINT) AS n_overlap
         |       FROM truth t LEFT JOIN res r
         |         ON r.q_id = t.q_id AND r.n_id = t.n_id
         |       GROUP BY 1),
         |cs AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_candidates
         |       FROM cand GROUP BY 1)
         |SELECT cs.q_id, cs.n_candidates,
         |  CAST(cs.n_candidates * ${operators.Quantize.PqM} AS BIGINT)
         |    AS codes_scanned,
         |  CAST(least(cs.n_candidates, ${operators.Quantize.RefineR}) AS BIGINT)
         |    AS n_shortlist,
         |  CAST((least(cs.n_candidates, ${operators.Quantize.RefineR})
         |    + ${operators.KMeans.K}) * ${operators.Quantize.PqM * 8} AS BIGINT)
         |    AS floats_scanned,
         |  ov.n_overlap,
         |  round(ov.n_overlap / 10.0, 4) AS recall_at_10
         |FROM cs JOIN ov ON ov.q_id = cs.q_id
         |ORDER BY cs.q_id""".stripMargin,

    // residual-encoded IVF+PQ (FAISS by_residual): codebook over
    // v − centroid(cell), per-(query, probed cell) ADC tables; same
    // candidates and bill as q244 by construction, recall differs
    "q245_ivfpq_residual" ->
      s"""WITH $kmeansCte,
         |res AS MATERIALIZED (SELECT a.vec_id, a.cluster,
         |    list_transform(range(1, len(e.v)+1), i -> e.v[i] - c.cv[i]) AS r
         |  FROM af a JOIN e ON e.vec_id = a.vec_id
         |  JOIN $kmeansLast c ON c.cluster = a.cluster),
         |rsubs AS (SELECT unnest(range(0, ${operators.Quantize.PqM})) AS sub),
         |rflat AS (SELECT vec_id, sub, list_slice(r, sub * 8 + 1, sub * 8 + 8) AS sv
         |          FROM res CROSS JOIN rsubs),
         |rcb AS (SELECT vec_id AS code, sub, sv AS cv FROM rflat
         |        WHERE vec_id < ${operators.Quantize.PqK}),
         |rcodes AS MATERIALIZED (SELECT vec_id, sub, code FROM (
         |    SELECT f.vec_id, f.sub, cb.code, row_number() OVER
         |      (PARTITION BY f.vec_id, f.sub ORDER BY
         |         round(${sqDistSql("f.sv", "cb.cv")}, 6), cb.code) AS rk
         |    FROM rflat f JOIN rcb cb ON f.sub = cb.sub) t WHERE rk = 1),
         |qq AS (SELECT vec_id AS q_id, v AS qv FROM e
         |       WHERE vec_id < ${operators.KMeans.EvalBlock}),
         |qr AS (SELECT q_id, cluster, qrv FROM (
         |    SELECT qq.q_id, c.cluster, row_number() OVER
         |      (PARTITION BY qq.q_id ORDER BY
         |         round(${sqDistSql("qq.qv", "c.cv")}, 6), c.cluster) AS crk,
         |      list_transform(range(1, len(qq.qv)+1), i -> qq.qv[i] - c.cv[i]) AS qrv
         |    FROM qq CROSS JOIN $kmeansLast c) t
         |  WHERE crk <= ${operators.KMeans.Nprobe}),
         |lut AS (SELECT qr.q_id, qr.cluster, s.sub, cb.code,
         |          round(${sqDistSql(
                      "list_slice(qr.qrv, s.sub * 8 + 1, s.sub * 8 + 8)", "cb.cv")}, 6) AS d
         |        FROM qr CROSS JOIN rsubs s JOIN rcb cb ON cb.sub = s.sub),
         |cand AS (SELECT qr.q_id, qr.cluster, r.vec_id AS n_id
         |         FROM qr JOIN res r USING (cluster) WHERE r.vec_id <> qr.q_id),
         |adc AS (SELECT c.q_id, c.n_id, round(sum(l.d), 6) AS adc
         |        FROM cand c JOIN rcodes k ON k.vec_id = c.n_id
         |        JOIN lut l ON l.q_id = c.q_id AND l.cluster = c.cluster
         |          AND l.sub = k.sub AND l.code = k.code
         |        GROUP BY 1, 2),
         |short AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id, row_number() OVER
         |      (PARTITION BY q_id ORDER BY adc, n_id) AS ark
         |    FROM adc) t WHERE ark <= ${operators.Quantize.RefineR}),
         |rs AS (SELECT q_id, n_id FROM (
         |    SELECT s.q_id, s.n_id, row_number() OVER
         |      (PARTITION BY s.q_id ORDER BY
         |         round(${sqDistSql("qq.qv", "e.v")}, 6), s.n_id) AS rank
         |    FROM short s JOIN qq ON qq.q_id = s.q_id
         |    JOIN e ON e.vec_id = s.n_id) t WHERE rank <= 10),
         |truth AS (SELECT q_id, n_id FROM (
         |    SELECT qq.q_id, e.vec_id AS n_id, row_number() OVER
         |      (PARTITION BY qq.q_id ORDER BY
         |         round(${sqDistSql("qq.qv", "e.v")}, 6), e.vec_id) AS rank
         |    FROM e CROSS JOIN qq WHERE e.vec_id <> qq.q_id) t
         |  WHERE rank <= 10),
         |ov AS (SELECT t.q_id, CAST(count(r.n_id) AS BIGINT) AS n_overlap
         |       FROM truth t LEFT JOIN rs r
         |         ON r.q_id = t.q_id AND r.n_id = t.n_id
         |       GROUP BY 1),
         |cs AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_candidates
         |       FROM cand GROUP BY 1)
         |SELECT cs.q_id, cs.n_candidates,
         |  CAST(cs.n_candidates * ${operators.Quantize.PqM} AS BIGINT)
         |    AS codes_scanned,
         |  CAST(least(cs.n_candidates, ${operators.Quantize.RefineR}) AS BIGINT)
         |    AS n_shortlist,
         |  CAST((least(cs.n_candidates, ${operators.Quantize.RefineR})
         |    + ${operators.KMeans.K}) * ${operators.Quantize.PqM * 8} AS BIGINT)
         |    AS floats_scanned,
         |  ov.n_overlap,
         |  round(ov.n_overlap / 10.0, 4) AS recall_at_10
         |FROM cs JOIN ov ON ov.q_id = cs.q_id
         |ORDER BY cs.q_id""".stripMargin,

    // residual-vs-raw PQ distortion: the q225 MSE fold over both
    // codebooks (raw corpus slices vs residuals against the owning
    // IVF centroid) + the ratio — the mechanism behind q245's recall
    "q247_residual_distortion" ->
      s"""WITH $kmeansCte,
         |$pqTailCte,
         |res AS MATERIALIZED (SELECT a.vec_id,
         |    list_transform(range(1, len(e.v)+1), i -> e.v[i] - c.cv[i]) AS r
         |  FROM af a JOIN e ON e.vec_id = a.vec_id
         |  JOIN $kmeansLast c ON c.cluster = a.cluster),
         |rflat AS (SELECT vec_id, sub, list_slice(r, sub * 8 + 1, sub * 8 + 8) AS sv
         |          FROM res CROSS JOIN subs),
         |rcb AS (SELECT vec_id AS code, sub, sv AS cv FROM rflat
         |        WHERE vec_id < ${operators.Quantize.PqK}),
         |rcodes AS (SELECT vec_id, sub, code, dist FROM (
         |    SELECT f.vec_id, f.sub, cb.code,
         |           round(${sqDistSql("f.sv", "cb.cv")}, 6) AS dist,
         |           row_number() OVER (PARTITION BY f.vec_id, f.sub
         |             ORDER BY round(${sqDistSql("f.sv", "cb.cv")}, 6), cb.code) AS rk
         |    FROM rflat f JOIN rcb cb ON f.sub = cb.sub) t WHERE rk = 1),
         |ra AS (SELECT sub, count(*) AS n_vectors,
         |        round(CAST(sum(CAST(round(dist * 1000000) AS BIGINT)) AS DOUBLE)
         |          / count(*) / 1000000.0, 6) AS raw_mse
         |       FROM codes WHERE NOT isnan(dist) GROUP BY 1),
         |rb AS (SELECT sub,
         |        round(CAST(sum(CAST(round(dist * 1000000) AS BIGINT)) AS DOUBLE)
         |          / count(*) / 1000000.0, 6) AS res_mse
         |       FROM rcodes WHERE NOT isnan(dist) GROUP BY 1)
         |SELECT ra.sub, CAST(ra.n_vectors AS BIGINT) AS n_vectors,
         |  ra.raw_mse, rb.res_mse,
         |  CASE WHEN ra.raw_mse > 0
         |    THEN round(rb.res_mse / ra.raw_mse, 6) END AS mse_ratio
         |FROM ra JOIN rb ON ra.sub = rb.sub ORDER BY ra.sub""".stripMargin,

    // SQ8 serving rung: the q76 quantization grid (floor(x/scale+0.5),
    // clamp ±127, scale floored at 1e-12) + the q84 rank/truth chain —
    // asymmetric search: float query vs int8 reconstructions
    "q249_sq8_knn" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |           WHERE embedding IS NOT NULL AND len(embedding) > 0),
         |s AS (SELECT vec_id, v,
         |        greatest(list_aggregate(list_transform(v, x -> abs(x)), 'max'), 1e-12) / 127.0 AS scale
         |      FROM e),
         |d AS (SELECT vec_id AS n_id,
         |        list_transform(v, x -> CAST(greatest(-127.0, least(127.0, floor(x / scale + 0.5))) AS BIGINT) * scale) AS dq
         |      FROM s),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e
         |      WHERE vec_id < ${operators.KMeans.EvalBlock}),
         |ap AS (SELECT q_id, n_id, round(${sqDistSql("qv", "dq")}, 6) AS l2q
         |       FROM d CROSS JOIN q WHERE n_id <> q_id),
         |rk AS (SELECT q_id, n_id, l2q,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY l2q, n_id) AS BIGINT) AS rank
         |       FROM ap),
         |truth AS (SELECT q_id, n_id FROM (
         |            SELECT q_id, e.vec_id AS n_id,
         |              row_number() OVER (PARTITION BY q_id
         |                ORDER BY round(${sqDistSql("qv", "e.v")}, 6), e.vec_id) AS trank
         |            FROM e CROSS JOIN q WHERE e.vec_id <> q_id) t
         |          WHERE trank <= 10)
         |SELECT rk.q_id, rk.rank, rk.n_id, rk.l2q,
         |       CAST(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_exact_topk
         |FROM rk LEFT JOIN truth t ON rk.q_id = t.q_id AND rk.n_id = t.n_id
         |WHERE rk.rank <= 10 ORDER BY rk.q_id, rk.rank""".stripMargin,

    // cluster-aware k-fold: the q68 closure chain -> group fold = the
    // q216 arm hash on the cluster canonical, mod KFoldK; singletons
    // key on their own doc_id; audit over the O(clusters) multi frame
    "q259_group_kfold" -> {
      val k = operators.Dedup.KFoldK
      s"""WITH RECURSIVE $simhashCandCte,
         |pairs AS (SELECT id_a, id_b
         |          FROM cand JOIN e ea ON ea.vec_id = cand.id_a
         |                    JOIN e eb ON eb.vec_id = cand.id_b
         |          WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.45),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (SELECT DISTINCT a, a FROM edges
         |                 UNION
         |                 SELECT ed.a, reach.r FROM edges ed JOIN reach ON reach.id = ed.b),
         |comp AS (SELECT id, min(r) AS grp0 FROM reach GROUP BY id),
         |docs AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents WHERE text IS NOT NULL),
         |f AS (SELECT d.doc_id, d.n_tokens,
         |    coalesce(c.grp0, d.doc_id) AS grp,
         |    CASE WHEN c.grp0 IS NOT NULL THEN 1 ELSE 0 END AS clustered,
         |    ((coalesce(c.grp0, d.doc_id) % 1000000007) * 1000003)
         |      % 1000000007 % $k AS fold,
         |    ((d.doc_id % 1000000007) * 1000003) % 1000000007 % $k AS nfold
         |  FROM docs d LEFT JOIN comp c ON c.id = d.doc_id),
         |multi AS (SELECT grp, count(*) AS sz,
         |    count(DISTINCT fold) AS gdf, count(DISTINCT nfold) AS ndf
         |  FROM f GROUP BY grp HAVING count(*) >= 2),
         |aud AS (SELECT CAST(count(*) AS BIGINT) AS n_clusters_multi,
         |    CAST(coalesce(sum(CASE WHEN ndf > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
         |      AS n_split_naive,
         |    CAST(coalesce(sum(CASE WHEN gdf > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
         |      AS n_split_group,
         |    CAST(coalesce(sum(CASE WHEN ndf > 1 THEN sz ELSE 0 END), 0) AS BIGINT)
         |      AS n_docs_in_split_naive
         |  FROM multi)
         |SELECT f.fold, count(*) AS n_docs,
         |  CAST(sum(f.n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(sum(f.clustered) AS BIGINT) AS n_clustered_docs,
         |  a.n_clusters_multi, a.n_split_naive, a.n_split_group,
         |  a.n_docs_in_split_naive
         |FROM f CROSS JOIN aud a
         |GROUP BY f.fold, a.n_clusters_multi, a.n_split_naive,
         |         a.n_split_group, a.n_docs_in_split_naive
         |ORDER BY f.fold""".stripMargin
    },

    // cell-refined blocking audit: the shared simhash-candidate chain
    // (e, sig, ub, sized, cand) + the shared seeded-Lloyd chain (c0..af
    // — reuses the SAME e) -> one verdict frame -> one fold
    "q257_cell_refined_blocking" ->
      s"""WITH $simhashCandCte,
         |${kmeansChain(operators.KMeans.K, "")},
         |cc AS (SELECT
         |    CASE WHEN fa.cluster = fb.cluster THEN 1 ELSE 0 END AS same_cell,
         |    CASE WHEN round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.45
         |      THEN 1 ELSE 0 END AS is_dup
         |  FROM cand ca
         |  JOIN af fa ON fa.vec_id = ca.id_a
         |  JOIN af fb ON fb.vec_id = ca.id_b
         |  JOIN e ea ON ea.vec_id = ca.id_a
         |  JOIN e eb ON eb.vec_id = ca.id_b)
         |SELECT CAST(count(*) AS BIGINT) AS n_cand_band,
         |  CAST(sum(same_cell) AS BIGINT) AS n_cand_refined,
         |  round(CAST(sum(same_cell) AS DOUBLE) / count(*), 6) AS cand_kept_ratio,
         |  CAST(sum(is_dup) AS BIGINT) AS n_dups_band,
         |  CAST(sum(same_cell * is_dup) AS BIGINT) AS n_dups_refined,
         |  CAST(sum(is_dup) - sum(same_cell * is_dup) AS BIGINT) AS n_dups_lost,
         |  CASE WHEN sum(is_dup) > 0
         |    THEN round(CAST(sum(same_cell * is_dup) AS DOUBLE) / sum(is_dup), 6)
         |  END AS dup_kept_ratio
         |FROM cc ORDER BY n_cand_band""".stripMargin,

    // index staleness: two prefixed kmeans chains — the "o" chain's
    // Lloyd iterates the old id-range snapshot while its final `oaf`
    // assignment serves the FULL corpus (the kmeansChain src contract);
    // cell ids are seed lineages shared by both fits
    "q261_index_staleness" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |eold AS MATERIALIZED (SELECT * FROM e
         |  WHERE vec_id <= (SELECT max(vec_id) // 2 FROM e)),
         |${kmeansChain(operators.KMeans.K, "o", "eold")},
         |${kmeansChain(operators.KMeans.K, "", "e")},
         |j AS MATERIALIZED (SELECT s.vec_id, s.cluster AS sc, s.dist AS sd,
         |    f.cluster AS fc, f.dist AS fd
         |  FROM oaf s JOIN af f USING (vec_id)
         |  WHERE s.dist IS NOT NULL AND f.dist IS NOT NULL
         |    AND NOT isnan(s.dist) AND NOT isnan(f.dist)),
         |g AS (SELECT count(*) AS nv,
         |    sum(CASE WHEN sc <> fc THEN 1 ELSE 0 END) AS n_churned,
         |    sum(CAST(round(sd * 1000000) AS BIGINT)) AS ssd,
         |    sum(CAST(round(fd * 1000000) AS BIGINT)) AS sfd
         |  FROM j),
         |scx AS (SELECT sc AS cell, count(*) AS n_stale,
         |    round(CAST(sum(CAST(round(sd * 1000000) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 1000000.0, 6) AS mean_dist_stale
         |  FROM j GROUP BY 1),
         |fcx AS (SELECT fc AS cell, count(*) AS n_fresh,
         |    round(CAST(sum(CAST(round(fd * 1000000) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 1000000.0, 6) AS mean_dist_fresh
         |  FROM j GROUP BY 1)
         |SELECT coalesce(scx.cell, fcx.cell) AS cell,
         |  CAST(coalesce(scx.n_stale, 0) AS BIGINT) AS n_stale,
         |  scx.mean_dist_stale,
         |  CAST(coalesce(fcx.n_fresh, 0) AS BIGINT) AS n_fresh,
         |  fcx.mean_dist_fresh,
         |  CAST(g.n_churned AS BIGINT) AS n_churned,
         |  round(CAST(g.n_churned AS DOUBLE) / g.nv, 6) AS churn_share,
         |  round((CAST(g.ssd AS DOUBLE) / g.nv - CAST(g.sfd AS DOUBLE) / g.nv)
         |    / 1000000.0, 6) + 0.0 AS dist_delta
         |FROM scx FULL OUTER JOIN fcx ON fcx.cell = scx.cell CROSS JOIN g
         |ORDER BY cell""".stripMargin,

    // served-from-store IVF+ADC+refine: the q244 probe/ADC/refine chain
    // emitting the refined top-10 rows themselves — the oracle replays
    // the MATH over the embeddings table; the engine answers from the
    // cell-partitioned store, so the hash match proves the persisted
    // layout is answer-invariant (ScaleSpec separately proves it prunes)
    "q262_ivf_served_store" -> ivfServedChainSql,

    // retrain act: stale-build → append → RETRAIN (generation swap) →
    // serve. The retrained artifacts are re-fit on the store's full
    // postings = the full corpus, and the seeded fit/codebook are pure
    // functions of the vector SET — so the oracle is the very q262
    // chain (fresh artifacts over raw embeddings): two paths across
    // the store's whole mutation lifecycle, one answer. A retrain that
    // read a stale generation, lost an appended posting, or published
    // a partial tree breaks the hash
    "q268_retrain_act" -> ivfServedChainSql,

    // rebuild-equality audit: the q261 old-fit chain gives the per-cell
    // counts a CLEAN store must hold, and both diff columns are pinned
    // to literal zero — the engine's multiset compare must come back
    // empty for the hash to match
    "q269_rebuild_audit" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |eold AS MATERIALIZED (SELECT * FROM e
         |  WHERE vec_id <= (SELECT max(vec_id) // 2 FROM e)),
         |${kmeansChain(operators.KMeans.K, "o", "eold")}
         |SELECT cluster AS cell, CAST(count(*) AS BIGINT) AS n_stored,
         |  CAST(0 AS BIGINT) AS n_only_stored,
         |  CAST(0 AS BIGINT) AS n_only_rebuilt
         |FROM oaf GROUP BY cluster ORDER BY cell""".stripMargin,

    // incremental re-index: the q261 old-snapshot chain — centroids fit
    // on vec_id <= max/2 serve the FULL corpus (oaf) — aggregated per
    // cell with the before/added split on the id cutoff. The oracle
    // never sees the engine's store: a merge that lost, duplicated, or
    // misfiled a posting breaks the hash
    "q263_incremental_reindex" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |eold AS MATERIALIZED (SELECT * FROM e
         |  WHERE vec_id <= (SELECT max(vec_id) // 2 FROM e)),
         |${kmeansChain(operators.KMeans.K, "o", "eold")},
         |mx AS (SELECT max(vec_id) // 2 AS cutoff FROM e)
         |SELECT cluster AS cell,
         |  CAST(sum(CASE WHEN vec_id <= mx.cutoff THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_before,
         |  CAST(sum(CASE WHEN vec_id > mx.cutoff THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_added,
         |  CAST(count(*) AS BIGINT) AS n_after,
         |  round(CAST(sum(CASE WHEN vec_id > mx.cutoff THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 6) + 0.0 AS added_share
         |FROM oaf CROSS JOIN mx
         |GROUP BY cluster ORDER BY cell""".stripMargin,

    // maintenance policy: the q261 chains + a CASE-gated union — the
    // churn scalar picks which assignment's per-cell report is emitted,
    // mirroring the engine's append/retrain decision
    "q266_maintenance_policy" -> {
      val thr = operators.KMeans.ReindexChurnThreshold
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |eold AS MATERIALIZED (SELECT * FROM e
         |  WHERE vec_id <= (SELECT max(vec_id) // 2 FROM e)),
         |${kmeansChain(operators.KMeans.K, "o", "eold")},
         |${kmeansChain(operators.KMeans.K, "")},
         |j AS MATERIALIZED (SELECT s.vec_id, s.cluster AS sc, s.dist AS sd,
         |    f.cluster AS fc, f.dist AS fd
         |  FROM oaf s JOIN af f USING (vec_id)
         |  WHERE s.dist IS NOT NULL AND f.dist IS NOT NULL
         |    AND NOT isnan(s.dist) AND NOT isnan(f.dist)),
         |g AS (SELECT CAST(sum(CASE WHEN sc <> fc THEN 1 ELSE 0 END) AS DOUBLE)
         |        / count(*) AS churn FROM j),
         |chosen AS (
         |  SELECT sc AS cell, sd AS d FROM j WHERE (SELECT churn FROM g) <= $thr
         |  UNION ALL
         |  SELECT fc AS cell, fd AS d FROM j WHERE (SELECT churn FROM g) > $thr)
         |SELECT CASE WHEN (SELECT churn FROM g) > $thr
         |    THEN 'retrain' ELSE 'append' END AS decision,
         |  round((SELECT churn FROM g), 6) + 0.0 AS churn_share,
         |  cell, CAST(count(*) AS BIGINT) AS n_members,
         |  round(CAST(sum(CAST(round(d * 1000000) AS BIGINT)) AS DOUBLE)
         |    / count(*) / 1000000.0, 6) AS mean_dist
         |FROM chosen GROUP BY cell ORDER BY cell""".stripMargin
    },

    // winnowed dedup: the q250 gram/window-min chain at the shipped
    // w, df-capped inverted index on the SELECTED hashes, exact
    // Jaccard rescore of the candidates on full distinct-gram sets,
    // top-20 on the total (jaccard desc, id_a, id_b) order
    "q264_winnowed_dedup" -> {
      val k = operators.TextAnalysis.WinnowK
      val w = operators.Dedup.WinnowDedupW
      s"""WITH wds AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |g AS (SELECT doc_id, list_transform(range(1, greatest(len(ws)-${k - 1}, 1)+1),
         |  gi -> ${fingerprint(s"ws[gi:gi+${k - 1}]")}) AS gh FROM wds),
         |s AS MATERIALIZED (SELECT doc_id, list_distinct(gh) AS dg,
         |  list_distinct(list_transform(range(1, greatest(len(gh)-$w+1, 1)+1),
         |    j -> list_aggregate(gh[j:j+${w - 1}], 'min'))) AS sig FROM g),
         |wf AS (SELECT doc_id, unnest(sig) AS h FROM s),
         |rare AS (SELECT h FROM wf GROUP BY h
         |         HAVING count(*) BETWEEN 2 AND 50),
         |wr AS (SELECT wf.doc_id, wf.h FROM wf JOIN rare USING (h)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM wr a JOIN wr b ON a.h = b.h AND a.doc_id < b.doc_id),
         |j AS (SELECT id_a, id_b,
         |        len(list_intersect(sa.dg, sb.dg)) AS n_common,
         |        len(sa.dg) AS na, len(sb.dg) AS nb
         |      FROM cand JOIN s sa ON sa.doc_id = cand.id_a
         |      JOIN s sb ON sb.doc_id = cand.id_b)
         |SELECT id_a, id_b, CAST(n_common AS BIGINT) AS n_common,
         |  round(n_common * 1.0 / (na + nb - n_common), 6) AS jaccard
         |FROM j ORDER BY jaccard DESC, id_a, id_b LIMIT 20""".stripMargin
    },

    // k-center: the greedy farthest-point chain unrolled as KCenterK
    // chained CTEs — each round folds cover = least(cover, dist to the
    // newest pick) and takes the rounded-cover/vec_id argmax, exactly
    // the engine's incremental loop
    "q255_kcenter" -> {
      val k = operators.KMeans.KCenterK
      val steps = (1 until k).map { r =>
        // MATERIALIZED everywhere: picks are referenced by every later
        // exclusion list and the final row set, and cover frames chain —
        // inlined, the evaluation tree re-runs each prefix exponentially
        // (the q132 single-reference rule, enforced here by
        // materialization instead)
        val coverSrc =
          if (r == 1)
            s"""c1 AS MATERIALIZED (SELECT e.vec_id, e.v, round(${sqDistSql("e.v", "p.v")}, 6) AS cover
               |  FROM e CROSS JOIN p0 p)""".stripMargin
          else
            s"""c$r AS MATERIALIZED (SELECT c.vec_id, c.v,
               |    least(c.cover, round(${sqDistSql("c.v", "pv.v")}, 6)) AS cover
               |  FROM c${r - 1} c CROSS JOIN
               |    (SELECT e.v FROM e JOIN p${r - 1} q ON e.vec_id = q.vec_id) pv)""".stripMargin
        val excl = (0 until r).map(i => s"SELECT vec_id FROM p$i").mkString(" UNION ALL ")
        s"""$coverSrc,
           |p$r AS MATERIALIZED (SELECT vec_id, cover FROM c$r
           |  WHERE vec_id NOT IN ($excl)
           |    AND cover IS NOT NULL AND NOT isnan(cover)
           |  ORDER BY cover DESC, vec_id LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val rows = (Seq(
        "SELECT CAST(0 AS BIGINT) AS pick_round, (SELECT vec_id FROM p0) AS vec_id, CAST(NULL AS DOUBLE) AS radius") ++
        (1 until k).map(r =>
          s"SELECT CAST($r AS BIGINT), (SELECT vec_id FROM p$r), (SELECT cover FROM p$r)"))
        .mkString("\nUNION ALL\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |           WHERE embedding IS NOT NULL AND len(embedding) > 0),
         |p0 AS MATERIALIZED (SELECT vec_id, v FROM e
         |  WHERE vec_id = (SELECT min(vec_id) FROM e)),
         |$steps
         |$rows
         |ORDER BY pick_round""".stripMargin
    },

    // balanced-PQ: the per-dim variance KEY is an exact integer
    // (n·Σx̂² − (Σx̂)² on the floor-pinned 1e-6 grid — raw doubles can
    // land on .5 round edges, so floor(x·1e6 + 0.5) pins one semantics),
    // ranked DESC with j tie-break, snake-dealt; natural codes reuse
    // the q225 chain, balanced codes rebuild it on (bsub, slot)-ordered
    // slices; var sums fold over j-ORDERED windows (q194 convention)
    "q251_balanced_pq" -> {
      val m = operators.Quantize.PqM
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |           WHERE embedding IS NOT NULL AND len(embedding) = ${m * 8}),
         |$pqTailCte,
         |dims AS (SELECT CAST(unnest(range(${m * 8})) AS BIGINT) AS j),
         |fl AS (SELECT e.vec_id, d.j, e.v[d.j + 1] AS x FROM e CROSS JOIN dims d),
         |st AS (SELECT j, count(*) AS n,
         |         sum(CAST(floor(x * 1000000 + 0.5) AS HUGEINT)) AS s1,
         |         sum(CAST(floor(x * 1000000 + 0.5) AS BIGINT)
         |           * CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS s2
         |       FROM fl WHERE NOT isnan(x) GROUP BY 1),
         |mp AS (SELECT j, n, vkey, p, p // $m AS rnd, p % $m AS pos,
         |         CASE WHEN (p // $m) % 2 = 0 THEN p % $m
         |              ELSE ${m - 1} - (p % $m) END AS bsub,
         |         CAST(vkey AS DOUBLE) / (n * n) / 1e12 AS var_j
         |       FROM (SELECT j, n, s2 * n - s1 * s1 AS vkey,
         |               CAST(row_number() OVER (ORDER BY s2 * n - s1 * s1 DESC, j)
         |                 AS BIGINT) - 1 AS p
         |             FROM st) t),
         |bfl AS (SELECT f.vec_id, m.bsub AS sub, m.rnd AS slot, f.x
         |        FROM fl f JOIN mp m ON m.j = f.j),
         |bflat AS (SELECT vec_id, sub, list(x ORDER BY slot) AS sv
         |          FROM bfl GROUP BY 1, 2),
         |bcb AS (SELECT vec_id AS code, sub, sv AS cv FROM bflat
         |        WHERE vec_id < ${operators.Quantize.PqK}),
         |bscored AS (SELECT f.vec_id, f.sub, cb.code,
         |    round(${sqDistSql("f.sv", "cb.cv")}, 6) AS dist
         |  FROM bflat f JOIN bcb cb ON f.sub = cb.sub),
         |bcodes AS (SELECT vec_id, sub, code, dist FROM (
         |    SELECT vec_id, sub, code, dist,
         |           row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rk
         |    FROM bscored) WHERE rk = 1),
         |natm AS (SELECT sub, count(*) AS n_nat,
         |    round(CAST(sum(CAST(round(dist * 1000000) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 1000000.0, 6) AS nat_mse
         |  FROM codes WHERE NOT isnan(dist) GROUP BY 1),
         |balm AS (SELECT sub,
         |    round(CAST(sum(CAST(round(dist * 1000000) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 1000000.0, 6) AS bal_mse
         |  FROM bcodes WHERE NOT isnan(dist) GROUP BY 1),
         |natv AS (SELECT sub, round(max(vs), 6) AS var_sum_natural FROM (
         |    SELECT j // 8 AS sub, sum(var_j) OVER (PARTITION BY j // 8 ORDER BY j
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS vs
         |    FROM mp) t GROUP BY 1),
         |balv AS (SELECT sub, round(max(vs), 6) AS var_sum_balanced FROM (
         |    SELECT bsub AS sub, sum(var_j) OVER (PARTITION BY bsub ORDER BY j
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS vs
         |    FROM mp) t GROUP BY 1)
         |SELECT natm.sub, CAST(natm.n_nat AS BIGINT) AS n_vectors,
         |  natv.var_sum_natural, balv.var_sum_balanced,
         |  natm.nat_mse AS natural_mse, balm.bal_mse AS balanced_mse,
         |  CASE WHEN natm.nat_mse > 0
         |    THEN round(balm.bal_mse / natm.nat_mse, 6) END AS mse_ratio
         |FROM natm JOIN balm ON balm.sub = natm.sub
         |JOIN natv ON natv.sub = natm.sub JOIN balv ON balv.sub = natm.sub
         |ORDER BY natm.sub""".stripMargin
    },

    // PQ distortion: mean distances on the exact x1e6 grid (dist is
    // already 6-dp rounded); min/max/distinct order-independent
    "q225_pq_distortion" ->
      s"""WITH $pqCodesCte
         |SELECT sub, CAST(count(*) AS BIGINT) AS n_vectors,
         |  round(CAST(sum(CAST(round(dist * 1000000) AS BIGINT)) AS DOUBLE)
         |    / count(*) / 1000000.0, 6) AS mean_sqdist,
         |  max(dist) AS max_sqdist,
         |  CAST(count(DISTINCT code) AS BIGINT) AS n_codes_used
         |FROM codes WHERE NOT isnan(dist) GROUP BY sub ORDER BY sub""".stripMargin,

    // encoder consistency: q30 md5 groups -> consecutive-member pairs
    // (lead per hash, O(group) pairs) -> exact cosine cross-check
    "q226_encoder_consistency" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS h
        |  FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT source, doc_id AS id_a,
        |        lead(doc_id, 1) OVER (PARTITION BY h ORDER BY doc_id) AS id_b
        |      FROM d),
        |pp AS (SELECT source, id_a, id_b FROM p WHERE id_b IS NOT NULL),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sc AS (SELECT pp.source,
        |        round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
        |      FROM pp JOIN e ea ON ea.vec_id = pp.id_a
        |              JOIN e eb ON eb.vec_id = pp.id_b),
        |g AS (SELECT source, count(*) AS n_dup_pairs,
        |    CAST(sum(CASE WHEN cos_sim < 0.999 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_mismatch,
        |    min(cos_sim) + 0.0 AS min_cos
        |  FROM sc GROUP BY source)
        |SELECT source, n_dup_pairs, n_mismatch,
        |  round(CAST(n_mismatch AS DOUBLE) / n_dup_pairs, 6) AS mismatch_rate,
        |  min_cos
        |FROM g ORDER BY source""".stripMargin,

    // signal agreement: q49 candidate universe x (q31 MinHash verdict,
    // cosine verdict) -> one exact 2x2 -> kappa (the q191 algebra);
    // po/pe computed UNROUNDED for kappa, rounded only at output
    "q227_signal_agreement" -> {
      val mins = operators.Dedup.minhashBands
        .map { case (band, a, b) => s"min((h * $a + $b) % 1000000007) AS m$band" }
        .mkString(",\n|    ")
      val nEqual = operators.Dedup.minhashBands.indices
        .map(k => s"(CASE WHEN sa.m$k = sb.m$k THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $simhashCandCte,
         |sc AS (SELECT cand.id_a, cand.id_b,
         |        round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
         |      FROM cand JOIN e ea ON ea.vec_id = cand.id_a
         |                JOIN e eb ON eb.vec_id = cand.id_b),
         |tok2 AS (SELECT DISTINCT doc_id, word FROM
         |  (SELECT doc_id, unnest(${tok("text")}) AS word FROM documents) t),
         |wh AS (SELECT doc_id, ${tokenId("word")} AS h FROM tok2),
         |msig AS (SELECT doc_id,
         |    $mins
         |  FROM wh GROUP BY doc_id),
         |verd AS (SELECT (($nEqual) >= 2) AS a, (sc.cos_sim >= 0.45) AS b
         |      FROM sc JOIN msig sa ON sa.doc_id = sc.id_a
         |              JOIN msig sb ON sb.doc_id = sc.id_b),
         |cells AS (SELECT count(*) AS n_pairs,
         |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n10,
         |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n01,
         |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n00
         |  FROM verd),
         |k AS (SELECT *,
         |    CASE WHEN n_pairs > 0
         |      THEN CAST(n11 + n00 AS DOUBLE) / n_pairs END AS po,
         |    CASE WHEN n_pairs > 0 THEN
         |      (CAST(n11 + n10 AS DOUBLE) / n_pairs)
         |        * (CAST(n11 + n01 AS DOUBLE) / n_pairs)
         |      + (CAST(n01 + n00 AS DOUBLE) / n_pairs)
         |        * (CAST(n10 + n00 AS DOUBLE) / n_pairs)
         |    END AS pe FROM cells)
         |SELECT n_pairs, n11, n10, n01, n00,
         |  round(po, 6) AS po, round(pe, 6) AS pe,
         |  round(CASE WHEN pe < 1.0 THEN (po - pe) / (1.0 - pe) END, 6) + 0.0
         |    AS kappa
         |FROM k ORDER BY n_pairs""".stripMargin
    },

    // signal MI: buckets via integer // on the exact grids; the MI/chi2
    // double folds run (q_bucket, len_bucket)-ORDERED (q181)
    "q228_signal_mi" -> {
      s"""WITH d AS (SELECT n_chars, ${tok("text")} AS words
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT CAST(len(words) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_distinct(words)) AS DOUBLE)
         |      / greatest(len(words), 1), 6) AS ttr,
         |    round(CAST(len(list_filter(words, w -> w IN $stoplist)) AS DOUBLE)
         |      / greatest(len(words), 1), 6) AS stop_share
         |  FROM d),
         |q AS (SELECT n_tokens, CAST(round(round(least(ttr * 2.0, 1.0) * 0.5
         |      + CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 0.3 ELSE 0.0 END
         |      + least(stop_share * 3.0, 0.2), 6) * 1000000) AS BIGINT) AS q6
         |  FROM s),
         |cells AS (SELECT least(q6 // 100000, 9) AS q_bucket,
         |    least(n_tokens // 64, 9) AS len_bucket, count(*) AS n
         |  FROM q GROUP BY 1, 2),
         |dims AS (SELECT CAST(count(DISTINCT q_bucket) AS DOUBLE) AS kq,
         |    CAST(count(DISTINCT len_bucket) AS DOUBLE) AS kl FROM cells),
         |m1 AS (SELECT q_bucket, len_bucket, n, kq, kl,
         |    sum(n) OVER () AS bign,
         |    sum(n) OVER (PARTITION BY q_bucket) AS nq,
         |    sum(n) OVER (PARTITION BY len_bucket) AS nl
         |  FROM cells CROSS JOIN dims),
         |m2 AS (SELECT *, CAST(n AS DOUBLE) / bign AS p,
         |    CAST(nq AS DOUBLE) / bign AS pq,
         |    CAST(nl AS DOUBLE) / bign AS pl FROM m1),
         |m3 AS (SELECT *, p / (pq * pl) AS lift FROM m2),
         |m4 AS (SELECT *,
         |    sum(p * ln(lift)) OVER wa AS mi,
         |    sum((CAST(n AS DOUBLE) - pq * pl * bign)
         |      * (CAST(n AS DOUBLE) - pq * pl * bign)
         |      / (pq * pl * bign)) OVER wa AS chi2
         |  FROM m3 WINDOW wa AS (ORDER BY q_bucket, len_bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
         |SELECT CAST(q_bucket AS BIGINT) AS q_bucket,
         |  CAST(len_bucket AS BIGINT) AS len_bucket, n,
         |  round(p, 6) AS p, round(lift, 4) AS lift,
         |  round(mi, 6) + 0.0 AS mi_nats,
         |  round(CASE WHEN least(kq, kl) > 1
         |    THEN sqrt(chi2 / (bign * (least(kq, kl) - 1))) END, 4) AS cramers_v
         |FROM m4 ORDER BY q_bucket, len_bucket""".stripMargin
    },

    // Good-Turing: exact integer frequency-of-frequencies per source
    "q229_good_turing" ->
      s"""WITH wc AS (SELECT source, word, count(*) AS c FROM
         |  (SELECT source, unnest(${tok("text")}) AS word FROM documents) t
         |  GROUP BY 1, 2),
         |g AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    count(*) AS n_vocab,
         |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_singletons,
         |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_doubletons
         |  FROM wc GROUP BY 1)
         |SELECT source, n_tokens, n_vocab, n_singletons, n_doubletons,
         |  round(CASE WHEN n_tokens > 0
         |    THEN CAST(n_singletons AS DOUBLE) / n_tokens END, 6)
         |    AS unseen_mass,
         |  round(CASE WHEN n_doubletons > 0
         |    THEN CAST(n_vocab AS DOUBLE) + CAST(n_singletons AS DOUBLE)
         |      * CAST(n_singletons AS DOUBLE)
         |      / (2.0 * CAST(n_doubletons AS DOUBLE))
         |    ELSE CAST(n_vocab AS DOUBLE) END, 2) AS chao1_richness
         |FROM g ORDER BY source""".stripMargin,

    // l-diversity: the q192 class collapse + a distinct-sensitive count
    "q230_l_diversity" ->
      """WITH classes AS (SELECT c_nationkey,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |    count(*) AS sz, count(DISTINCT c_mktsegment) AS l
        |  FROM customer GROUP BY 1, 2),
        |x AS (SELECT sz, l, unnest([2, 3, 5]) AS l_bar FROM classes)
        |SELECT CAST(l_bar AS BIGINT) AS l_bar, count(*) AS n_classes,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN l < l_bar THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_classes_below,
        |  CAST(coalesce(sum(CASE WHEN l < l_bar THEN sz ELSE 0 END), 0)
        |    AS BIGINT) AS n_rows_at_risk,
        |  CAST(min(l) AS BIGINT) AS min_l,
        |  round(CAST(coalesce(sum(CASE WHEN l < l_bar THEN sz ELSE 0 END), 0)
        |    AS DOUBLE) / sum(sz), 6) AS risk_share
        |FROM x GROUP BY 1 ORDER BY l_bar""".stripMargin,

    // t-closeness: variational distance per QI class vs the global
    // segment distribution, folded over a segment-ORDERED window (the
    // q194 sequential-sum convention) so both engines add the same
    // doubles in the same order; zero cells materialized by the grid
    "q252_t_closeness" ->
      """WITH cust AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
        |  FROM customer),
        |gl AS (SELECT c_mktsegment, count(*) AS gn,
        |    (SELECT count(*) FROM cust) AS n_total
        |  FROM cust GROUP BY 1),
        |classes AS (SELECT c_nationkey, bal_band, count(*) AS sz
        |  FROM cust GROUP BY 1, 2),
        |cells AS (SELECT c_nationkey, bal_band, c_mktsegment, count(*) AS cn
        |  FROM cust GROUP BY 1, 2, 3),
        |grid AS (SELECT cl.c_nationkey, cl.bal_band, cl.sz, g.c_mktsegment,
        |    abs(CAST(coalesce(ce.cn, 0) AS DOUBLE) / cl.sz
        |        - CAST(g.gn AS DOUBLE) / g.n_total) AS ad
        |  FROM classes cl CROSS JOIN gl g
        |  LEFT JOIN cells ce ON ce.c_nationkey = cl.c_nationkey
        |    AND ce.bal_band = cl.bal_band AND ce.c_mktsegment = g.c_mktsegment),
        |tt AS (SELECT c_nationkey, bal_band, max(sz) AS sz, max(t) AS t FROM (
        |    SELECT c_nationkey, bal_band, sz,
        |      sum(ad) OVER (PARTITION BY c_nationkey, bal_band
        |        ORDER BY c_mktsegment
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) / 2.0 AS t
        |    FROM grid) s GROUP BY 1, 2),
        |x AS (SELECT sz, t, unnest([0.1, 0.2, 0.3]) AS t_bar FROM tt)
        |SELECT t_bar, count(*) AS n_classes,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN t > t_bar THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_classes_above,
        |  CAST(coalesce(sum(CASE WHEN t > t_bar THEN sz ELSE 0 END), 0)
        |    AS BIGINT) AS n_rows_at_risk,
        |  round(max(t), 6) AS max_t,
        |  round(CAST(coalesce(sum(CASE WHEN t > t_bar THEN sz ELSE 0 END), 0)
        |    AS DOUBLE) / sum(sz), 6) AS risk_share
        |FROM x GROUP BY 1 ORDER BY t_bar""".stripMargin,

    // template similarity: the q33 4-word string-shingle grammar
    // (mirrors the native hashes exactly), source-partitioned lead
    // adjacency, per-pair Jaccard on the 1e-6 grid before the mean
    "q231_template_similarity" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
        |  FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(ws)-3, 1)+1),
        |    i -> array_to_string(ws[i:i+3], ' ')))) AS shingle FROM w),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |adj AS (SELECT doc_id AS id_a, source, lead(doc_id, 1) OVER
        |    (PARTITION BY source ORDER BY doc_id) AS id_b FROM w),
        |adj2 AS (SELECT * FROM adj WHERE id_b IS NOT NULL),
        |inter AS (SELECT a.id_a, a.id_b, count(*) AS n_inter
        |  FROM adj2 a JOIN sh s1 ON s1.doc_id = a.id_a
        |              JOIN sh s2 ON s2.doc_id = a.id_b
        |                AND s2.shingle = s1.shingle
        |  GROUP BY 1, 2),
        |pairs AS (SELECT a.source,
        |    round(CAST(coalesce(i.n_inter, 0) AS DOUBLE)
        |      / (sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0)), 6) AS jac
        |  FROM adj2 a JOIN sizes sa ON sa.doc_id = a.id_a
        |              JOIN sizes sb ON sb.doc_id = a.id_b
        |              LEFT JOIN inter i
        |                ON i.id_a = a.id_a AND i.id_b = a.id_b),
        |g AS (SELECT source, count(*) AS n_pairs,
        |    sum(CAST(round(jac * 1000000) AS BIGINT)) AS sj6,
        |    max(jac) AS max_jaccard,
        |    CAST(sum(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_template_pairs
        |  FROM pairs GROUP BY 1)
        |SELECT source, n_pairs,
        |  round(CAST(sj6 AS DOUBLE) / n_pairs / 1000000.0, 6) AS mean_jaccard,
        |  max_jaccard, n_template_pairs
        |FROM g ORDER BY source""".stripMargin,

    // budget allocator: q207 canonical supply + q83 temperature targets
    // + one documented rebalance round; all folds source-ORDERED
    "q232_budget_allocator" ->
      s"""WITH ${budgetAllocCte(relative = false)}
        |SELECT source, CAST(supply AS BIGINT) AS supply_tokens,
        |  round(wgt, 6) AS mix_weight,
        |  round(target, 2) AS target_tokens,
        |  round(alloc2, 2) AS allocated_tokens,
        |  CAST(CASE WHEN alloc1 >= CAST(supply AS DOUBLE) THEN 1 ELSE 0 END
        |    AS BIGINT) AS capped,
        |  round(CASE WHEN supply > 0
        |    THEN alloc2 / CAST(supply AS DOUBLE) END, 4) AS epochs
        |FROM f6 ORDER BY source""".stripMargin,

    // budget-plan executor: q232's f6 allocation → per-source keep
    // rates (floor-pinned ppm, the q91 rule), content-hash Bernoulli
    // over CANONICAL docs only (the mass q232 budgeted)
    "q243_budget_sample" ->
      s"""WITH ${budgetAllocCte(relative = true)},
        |rates AS (SELECT source,
        |    CAST(floor(least(1.0, CASE WHEN supply > 0
        |        THEN alloc2 / CAST(supply AS DOUBLE) ELSE 0.0 END)
        |      * 1000000) AS BIGINT) AS rate_ppm
        |  FROM f6),
        |d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    ${tokenId("text")} % 1000000 AS bucket,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, d.source, n_tokens, rate_ppm
        |FROM d JOIN rates ON rates.source = d.source
        |WHERE rk = 1 AND bucket < rate_ppm
        |ORDER BY doc_id""".stripMargin,

    // stationary distribution: 10 unrolled power iterations, every
    // double fold over an ORDERED window (q181); P entries exact
    // n/total; dangling mass renormalized per round
    "q233_stationary_dist" -> {
      val n = operators.Temporal.StationaryIters
      val iters = (1 to n).map { i =>
        s"""t$i AS (SELECT p.next_type,
           |    sum(pi.pi * p.prob) OVER (PARTITION BY p.next_type
           |      ORDER BY p.prev_type
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           |      AS s,
           |    row_number() OVER (PARTITION BY p.next_type
           |      ORDER BY p.prev_type) AS rk
           |  FROM pp p JOIN pi${i - 1} pi ON pi.state = p.prev_type),
           |u$i AS (SELECT next_type AS state, s FROM t$i WHERE rk = 1),
           |pi$i AS (SELECT state, s / sum(s) OVER (ORDER BY state
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           |    AS pi
           |  FROM u$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH c0 AS (SELECT prev_type, event_type AS next_type, count(*) AS n
         |  FROM (SELECT event_type, lag(event_type, 1) OVER
         |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
         |    FROM events WHERE event_type IS NOT NULL) t
         |  WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         |states AS (SELECT DISTINCT prev_type AS state FROM c0),
         |cc AS (SELECT c0.* FROM c0 JOIN states ON states.state = c0.next_type),
         |pp AS (SELECT prev_type, next_type,
         |    CAST(n AS DOUBLE)
         |      / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS prob
         |  FROM cc),
         |pi0 AS (SELECT state,
         |    1.0 / (SELECT count(*) FROM states) AS pi FROM states),
         |$iters,
         |h0 AS (SELECT prev_type,
         |    sum(-prob * ln(prob) / ln(2.0)) OVER (PARTITION BY prev_type
         |      ORDER BY next_type
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS h,
         |    row_number() OVER (PARTITION BY prev_type ORDER BY next_type)
         |      AS rk
         |  FROM pp),
         |hh AS (SELECT prev_type AS state, h FROM h0 WHERE rk = 1),
         |fin AS (SELECT s.state, coalesce(p.pi, 0.0) AS pi,
         |    coalesce(hh.h, 0.0) AS h
         |  FROM states s LEFT JOIN pi$n p ON p.state = s.state
         |  LEFT JOIN hh ON hh.state = s.state),
         |fin2 AS (SELECT *, sum(pi * h) OVER (ORDER BY state
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         |    AS rate FROM fin)
         |SELECT state, round(pi, 6) AS pi, round(h, 6) AS h_bits,
         |  round(rate, 6) AS entropy_rate_bits
         |FROM fin2 ORDER BY state""".stripMargin
    },

    // k-core: fixed unrolled peels on the q198 bigram edge list;
    // every round MATERIALIZED so the chain stays linear
    "q234_k_core" -> {
      val chains = operators.Graph.CoreKs.map { k =>
        (1 to operators.Graph.CoreRounds).map { r =>
          s"""kp${k}_$r AS MATERIALIZED (SELECT id FROM (
             |    SELECT id, count(*) AS deg FROM (
             |      SELECT a AS id FROM e${k}_${r - 1}
             |      UNION ALL SELECT b FROM e${k}_${r - 1}) u
             |    GROUP BY 1) d WHERE deg >= $k),
             |e${k}_$r AS MATERIALIZED (SELECT e.a, e.b FROM e${k}_${r - 1} e
             |  JOIN kp${k}_$r ka ON ka.id = e.a
             |  JOIN kp${k}_$r kb ON kb.id = e.b)""".stripMargin
        }.mkString(",\n")
      }
      val seeds = operators.Graph.CoreKs
        .map(k => s"e${k}_0 AS (SELECT a, b FROM ed)").mkString(",\n")
      val finals = operators.Graph.CoreKs.map { k =>
        val last = s"e${k}_${operators.Graph.CoreRounds}"
        s"""SELECT CAST($k AS BIGINT) AS k,
           |  CAST((SELECT count(*) FROM (SELECT DISTINCT a AS id FROM $last
           |    UNION SELECT b FROM $last) nn) AS BIGINT) AS n_nodes,
           |  CAST((SELECT count(*) FROM $last) AS BIGINT) AS n_edges,
           |  CAST(coalesce((SELECT max(deg) FROM (
           |    SELECT id, count(*) AS deg FROM (
           |      SELECT a AS id FROM $last UNION ALL SELECT b FROM $last) u
           |    GROUP BY 1) d), 0) AS BIGINT) AS max_core_degree""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH t AS (SELECT doc_id, ${tok("text")} AS ws FROM documents),
         |prs AS (SELECT p['w1'] AS w1, p['w2'] AS w2 FROM
         |  (SELECT unnest(list_transform(range(1, len(ws)),
         |     i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
         |   FROM t WHERE len(ws) >= 2)),
         |ed AS MATERIALIZED (SELECT DISTINCT least(w1, w2) AS a,
         |    greatest(w1, w2) AS b FROM prs WHERE w1 <> w2),
         |$seeds,
         |${chains.mkString(",\n")}
         |$finals
         |ORDER BY k""".stripMargin
    },

    // burstiness: exact integer-microsecond gap moments per type
    "q235_burstiness" ->
      """WITH g AS (SELECT event_type,
        |    us - lag(us) OVER (PARTITION BY event_type ORDER BY us, event_id)
        |      AS gap
        |  FROM (SELECT event_type, event_id, epoch_us(ts) AS us FROM events
        |        WHERE event_type IS NOT NULL AND ts IS NOT NULL) t),
        |m AS (SELECT event_type, count(*) AS n_gaps, sum(gap) AS sg,
        |    sum(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS sgg
        |  FROM g WHERE gap IS NOT NULL GROUP BY 1),
        |c AS (SELECT event_type, CAST(n_gaps AS BIGINT) AS n_gaps,
        |    CAST(n_gaps AS DOUBLE) AS nd, CAST(sg AS DOUBLE) / 1000000.0 AS sgd,
        |    CAST(sgg AS DOUBLE) / 1e12 AS sggd
        |  FROM m WHERE n_gaps >= 2),
        |e AS (SELECT *, sgd / nd AS mean_s,
        |    (sggd - sgd * sgd / nd) / (nd - 1) AS v FROM c),
        |f AS (SELECT *, CASE WHEN mean_s > 0 AND v >= 0
        |    THEN sqrt(v) / mean_s END AS cv FROM e)
        |SELECT event_type, n_gaps, round(mean_s, 4) AS mean_gap_s,
        |  round(cv, 4) AS cv,
        |  round(CASE WHEN cv IS NOT NULL
        |    THEN (cv - 1.0) / (cv + 1.0) END, 4) + 0.0 AS burstiness
        |FROM f ORDER BY event_type""".stripMargin,

    // co-occurrence: distinct session-presence collapse; lift/PMI from
    // exact integer counts
    "q236_type_cooccurrence" ->
      """WITH pres AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d,
        |    event_type
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |ns AS (SELECT count(*) AS n_sessions FROM
        |  (SELECT DISTINCT user_id, d FROM pres) s),
        |per AS (SELECT event_type, count(*) AS n_t FROM pres GROUP BY 1),
        |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_both
        |  FROM pres a JOIN pres b ON a.user_id = b.user_id AND a.d = b.d
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |j AS (SELECT type_a, type_b, n_both, pa.n_t AS n_a, pb.n_t AS n_b,
        |    ns.n_sessions,
        |    CAST(n_both AS DOUBLE) * CAST(ns.n_sessions AS DOUBLE)
        |      / (CAST(pa.n_t AS DOUBLE) * CAST(pb.n_t AS DOUBLE)) AS l
        |  FROM pairs JOIN per pa ON pa.event_type = pairs.type_a
        |    JOIN per pb ON pb.event_type = pairs.type_b CROSS JOIN ns)
        |SELECT type_a, type_b, CAST(n_both AS BIGINT) AS n_both,
        |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(n_sessions AS BIGINT) AS n_sessions,
        |  round(l, 4) AS lift, round(ln(l), 6) + 0.0 AS pmi
        |FROM j ORDER BY type_a, type_b""".stripMargin,

    // quality deciles: exact order-statistic picks over the (source,
    // 1e-6 grid) histogram; ceil via (d*n+9) // 10
    "q237_quality_deciles" -> {
      s"""WITH d AS (SELECT source, n_chars, ${tok("text")} AS words
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT source,
         |    CAST(len(words) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_distinct(words)) AS DOUBLE)
         |      / greatest(len(words), 1), 6) AS ttr,
         |    round(CAST(len(list_filter(words, w -> w IN $stoplist)) AS DOUBLE)
         |      / greatest(len(words), 1), 6) AS stop_share
         |  FROM d),
         |q AS (SELECT source, CAST(round(round(least(ttr * 2.0, 1.0) * 0.5
         |      + CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 0.3 ELSE 0.0 END
         |      + least(stop_share * 3.0, 0.2), 6) * 1000000) AS BIGINT) AS q6
         |  FROM s),
         |hist AS (SELECT source, q6, count(*) AS cnt FROM q GROUP BY 1, 2),
         |c AS (SELECT source, q6, cnt,
         |    sum(cnt) OVER (PARTITION BY source ORDER BY q6
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    sum(cnt) OVER (PARTITION BY source) AS n
         |  FROM hist),
         |x AS (SELECT *, unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS decile FROM c),
         |y AS (SELECT *, (decile * n + 9) // 10 AS k FROM x)
         |SELECT source, CAST(decile AS BIGINT) AS decile,
         |  CAST(q6 AS DOUBLE) / 1000000.0 AS quality,
         |  CAST(n AS BIGINT) AS n_docs
         |FROM y WHERE cum >= k AND cum - cnt < k
         |ORDER BY source, decile""".stripMargin
    },

    // length-adjusted quality: direct standardization over the corpus
    // length mix, folds bucket-ORDERED per source (q181)
    "q238_length_adjusted_quality" -> {
      s"""WITH d AS (SELECT source, n_chars, ${tok("text")} AS words
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT source,
         |    CAST(len(words) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_distinct(words)) AS DOUBLE)
         |      / greatest(len(words), 1), 6) AS ttr,
         |    round(CAST(len(list_filter(words, w -> w IN $stoplist)) AS DOUBLE)
         |      / greatest(len(words), 1), 6) AS stop_share
         |  FROM d),
         |q AS (SELECT source, n_tokens,
         |    CAST(round(round(least(ttr * 2.0, 1.0) * 0.5
         |      + CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 0.3 ELSE 0.0 END
         |      + least(stop_share * 3.0, 0.2), 6) * 1000000) AS BIGINT) AS q6
         |  FROM s),
         |cells AS (SELECT source, least(n_tokens // 64, 9) AS lb,
         |    count(*) AS n, sum(q6) AS s6 FROM q GROUP BY 1, 2),
         |m1 AS (SELECT *, sum(n) OVER (PARTITION BY lb) AS nb,
         |    sum(n) OVER () AS bign FROM cells),
         |m2 AS (SELECT *, CAST(nb AS DOUBLE) / CAST(bign AS DOUBLE) AS wgt,
         |    CAST(s6 AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE) AS m FROM m1),
         |m3 AS (SELECT *, sum(wgt * m) OVER ws AS adj_num,
         |    sum(wgt) OVER ws AS adj_den,
         |    sum(n) OVER ws AS ns, sum(s6) OVER ws AS ss6,
         |    row_number() OVER (PARTITION BY source ORDER BY lb) AS rk
         |  FROM m2 WINDOW ws AS (PARTITION BY source ORDER BY lb
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
         |SELECT source, CAST(ns AS BIGINT) AS n_docs,
         |  round(CAST(ss6 AS DOUBLE) / 1000000.0 / CAST(ns AS DOUBLE), 6)
         |    AS raw_mean,
         |  round(CASE WHEN adj_den > 0 THEN adj_num / adj_den END, 6)
         |    AS adjusted_mean,
         |  round((CASE WHEN adj_den > 0 THEN adj_num / adj_den END)
         |    - CAST(ss6 AS DOUBLE) / 1000000.0 / CAST(ns AS DOUBLE), 6) + 0.0
         |    AS length_effect
         |FROM m3 WHERE rk = 1 ORDER BY source""".stripMargin
    },

    // deseasonalized anomalies: dow indexes from exact integer sums;
    // residual moments fold day-ORDERED per type (q181)
    "q239_deseasonalized_anomaly" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    sum(CAST(round(value * 1000) AS BIGINT)) AS y3
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |dd AS (SELECT *, dayofweek(d) AS dow FROM daily),
        |i1 AS (SELECT *,
        |    sum(y3) OVER (PARTITION BY event_type, dow) AS sdw,
        |    count(*) OVER (PARTITION BY event_type, dow) AS ndw,
        |    sum(y3) OVER (PARTITION BY event_type) AS st,
        |    count(*) OVER (PARTITION BY event_type) AS nt FROM dd),
        |i2 AS (SELECT *, CASE WHEN st > 0 THEN
        |    (CAST(sdw AS DOUBLE) / CAST(ndw AS DOUBLE))
        |      / (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)) END AS dow_index
        |  FROM i1),
        |i3 AS (SELECT *, CASE WHEN dow_index > 0
        |    THEN CAST(y3 AS DOUBLE) / 1000.0 / dow_index END AS adj FROM i2),
        |i4 AS (SELECT *, count(adj) OVER wz AS n, sum(adj) OVER wz AS sa,
        |    sum(adj * adj) OVER wz AS saa
        |  FROM i3 WINDOW wz AS (PARTITION BY event_type ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
        |i5 AS (SELECT *, sa / n AS mean_adj,
        |    CASE WHEN n > 1 THEN sqrt(greatest((saa - sa * sa / n) / (n - 1),
        |      0.0)) END AS sd_adj FROM i4),
        |i6 AS (SELECT *, round(CASE WHEN sd_adj > 0
        |    THEN (adj - mean_adj) / sd_adj END, 4) + 0.0 AS z FROM i5)
        |SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
        |  CAST(y3 AS DOUBLE) / 1000.0 AS value,
        |  round(dow_index, 4) AS dow_index,
        |  round(adj, 4) AS adjusted, z,
        |  CAST(CASE WHEN z IS NOT NULL AND abs(z) > 3.0 THEN 1 ELSE 0 END
        |    AS BIGINT) AS is_anomaly
        |FROM i6 ORDER BY event_type, day""".stripMargin,

    // daily latency percentiles: q127's per-user collapse keyed to the
    // purchase day; exact order-statistic picks per day histogram
    "q240_daily_latency" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_type
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |fv AS (SELECT user_id, min(us) AS fv FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |fp AS (SELECT e.user_id, fv.fv, min(e.us) AS fp
        |  FROM ev e JOIN fv ON fv.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.us > fv.fv GROUP BY 1, 2),
        |dl AS (SELECT CAST(make_timestamp(fp) AS DATE) AS day,
        |    round((fp - fv) / 1000000.0, 6) AS delta_s FROM fp),
        |hist AS (SELECT day, delta_s, count(*) AS cnt FROM dl GROUP BY 1, 2),
        |c AS (SELECT *, sum(cnt) OVER (PARTITION BY day ORDER BY delta_s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY day) AS n FROM hist),
        |k AS (SELECT *, (n + 1) // 2 AS k50, (9 * n + 9) // 10 AS k90 FROM c),
        |p50 AS (SELECT day, n, delta_s AS p50_s FROM k
        |  WHERE cum >= k50 AND cum - cnt < k50),
        |p90 AS (SELECT day, delta_s AS p90_s FROM k
        |  WHERE cum >= k90 AND cum - cnt < k90)
        |SELECT strftime(p50.day, '%Y-%m-%d') AS day,
        |  CAST(n AS BIGINT) AS n_conversions, p50_s, p90_s
        |FROM p50 JOIN p90 ON p90.day = p50.day
        |ORDER BY day""".stripMargin,

    // dup trend: deciles by integer DIV on the id range (no global
    // rank); first occurrence per md5 group
    "q241_dup_trend" ->
      """WITH d AS (SELECT doc_id, md5(text) AS h FROM documents
        |  WHERE text IS NOT NULL),
        |span AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM d),
        |x AS (SELECT doc_id, h, (hi - lo + 10) // 10 AS width, lo
        |      FROM d CROSS JOIN span),
        |y AS (SELECT least((doc_id - lo) // width, 9) AS decile,
        |    CASE WHEN row_number() OVER (PARTITION BY h ORDER BY doc_id) > 1
        |      THEN 1 ELSE 0 END AS is_dup
        |  FROM x)
        |SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_docs,
        |  CAST(sum(is_dup) AS BIGINT) AS n_dups,
        |  round(CAST(sum(is_dup) AS DOUBLE) / count(*), 6) AS dup_rate
        |FROM y GROUP BY 1 ORDER BY decile""".stripMargin,
  )

  /** q162b is the hour-sharded PHYSICAL form of q162 — identical
    * logical query and output, so it shares the oracle text verbatim
    * (the exact/exact sibling of the q130/q130b exact/sketch pattern). */
  def oracleSql: Map[String, String] =
    oracleBase + ("q162b_concurrency_sharded" ->
      oracleBase("q162_session_concurrency"))
}
