"""The engine's headline workload: named queries with DuckDB oracles.

Each entry is a Spark-first implementation (DataFrame API or Spark SQL
passthrough — both produce the same Catalyst plan) paired with an ANSI-SQL
oracle string that DuckDB runs over the same parquet tables. The driver
hash-compares both sides at sf0.01 (CORRECTNESS gate), and bench.py times
the Spark side at sf0.1.

Determinism conventions (so the value-hash matches across engines):
- double aggregations go through DECIMAL (exact, order-independent) and
  are cast back to DOUBLE — see functions.vector.exact_dot_product;
- every LIMIT has a total-order ORDER BY (unique tiebreaker);
- timestamps are output as formatted strings;
- column names are identical on both sides.
"""

from __future__ import annotations

from frontmatter_mcp_spark.workload.registry import QUERIES, Q

# importing the modules populates QUERIES
from frontmatter_mcp_spark.workload import relational  # noqa: E402,F401
from frontmatter_mcp_spark.workload import datapipe  # noqa: E402,F401
from frontmatter_mcp_spark.workload import streaming  # noqa: E402,F401

# The driver's CORRECTNESS gate hash-checks only the first 50 registry
# entries per round, so coverage is rotated. The order is DERIVED, not
# hand-listed: queries with no recorded green row ever come first (new
# queries land here automatically — nothing to remember), then queries
# whose implementation changed since their last green row, then everything
# else stalest-green-first. Rows-only queries (oracle=None) sort last —
# they would spend a window slot on a weaker check.
DRIVER_WINDOW = 50

# Last round each query had a driver-green CORRECTNESS row (rows + schema +
# hash all true). Updated each round from CORRECTNESS_r{N}.json. A query
# absent from this dict is treated as never-verified and jumps to the front
# of the window automatically.
_LAST_GREEN_ROUND: dict[str, int] = {
    # green in CORRECTNESS_r03.json, not in the r04 window
    **dict.fromkeys(
        [
            "q03_shipping_priority",
            "q04_priority_counts", "q05_region_revenue", "q06_forecast_revenue",
            "q07_top_orders_per_customer", "q08_running_totals",
            "q09_customer_setops", "q10_rollup_quantity", "q11_distinct_parts",
            "q12_part_strings", "q13_monthly_orders", "q14_json_events",
            "q15_word_counts", "q16_above_avg_orders", "q17_inactive_customers",
            "q18_asof_click_purchase", "q19_sessionization", "q20_event_pivot",
            "q21_cube_events", "q22_supplier_customer_nations",
            "q23_grouping_sets", "q24_quantity_percentiles",
            "q25_date_arithmetic", "q26_cdc_upsert", "q28_having_subquery",
            "q29_cheapest_part_per_brand", "q42_multimodal_features",
            "q46_group_concat", "q47_exists_with_agg", "q65_volume_shipping",
            "q66_market_share", "q67_top_supplier", "q68_bulk_suppliers",
            "q69_rich_inactive_customers", "q72_gapfill_hourly",
            "q73_retention_cohorts",
            "q78_salted_aggregation",
            "q88_quality_gate", "q89_event_spikes",
        ],
        3,
    ),
    # green in CORRECTNESS_r04.json (50/50 of the r04 window)
    **dict.fromkeys(
        [
            "q01_pricing_summary", "q02_top_orders", "q30_dedup_exact",
            "q31_minhash_signatures",
            "q34_simhash", "q35_text_profile",
            "q36_ann_bruteforce", "q37_ann_ivf",
            "q39_label_centroids", "q40_token_stats",
            "q41_window_fingerprint_pairs", "q43_ann_lsh", "q44_embed_vectors",
            "q45_semantic_search", "q48_kmeans_clusters", "q49_ann_ivf_kmeans",
            "q50_stream_tumbling", "q51_stream_sliding", "q52_stream_sessions",
            "q53_stream_dedup", "q54_stream_stateful_counters",
            "q55_stream_interval_join",
            "q57_hash_split_sample", "q58_tfidf_keywords",
            "q59_boilerplate_spans", "q60_decontamination",
            "q61_repetition_profile", "q62_normalize_text", "q63_vocab_coverage",
            "q64_embedding_quantize", "q71_dedup_report",
            "q77_power_iteration", "q79_doc_chunking",
            "q80_sequence_packing", "q81_ivf_partitioned",
            "q84_safety_profile", "q85_length_outliers",
        ],
        4,
    ),
    # green in CORRECTNESS_r05.json (50/50 of the r05 window)
    **dict.fromkeys(
        [
            "q101_pq_recall", "q102_ann_ndcg",
            "q103_temperature_mixture", "q105_bigram_lm_score",
            "q106_token_budget_mixture",
            "q108_record_linkage",
            "q110_shard_manifest", "q111_quality_classifier",
            "q115_pii_redaction",
            "q118_vocab_growth",
            "q121_store_roundtrip_search", "q122_image_ahash_dedup",
            "q123_wav_probe", "q124_duplication_ratio",
            "q125_deterministic_augmentation", "q127_raking_mixture", "q128_png_ahash_dedup",
            "q130_hard_negative_mining",
            "q134_bm25_topk", "q136_hll_distinct",
            "q138_jpeg_coeff_roundtrip",
            "q141_incremental_mv", "q142_zorder_layout",
            "q143_scd2_history", "q144_interval_islands", "q145_jl_projection",
            "q27_approx_stats",
            "q94_unigram_lm_score",
            "q95_training_manifest", "q98_pmi_merge_candidates", "q99_pq_adc_topk",
        ],
        5,
    ),
    # green in CORRECTNESS_r07.json (50/50 of the r07 window; round 6
    # artifacts were never recorded by the driver, so nothing maps to 6)
    **dict.fromkeys(
        [
            "q148_knn_classifier_eval",
            "q149_classifier_confusion", "q150_datacard",
            "q152_join_size_sketch",
            "q153_corpus_diff", "q156_bootstrap_ci", "q157_ab_test", "q160_hll_join_overlap",
            "q162_eb_shrinkage",
            "q163_unigram_tokenizer", "q166_kmv_setops",
            "q167_perplexity_buckets", "q168_compaction_plan",
            "q170_hash_sample_quantiles",
            "q171_curriculum_schedule", "q172_ewma_daily",
            "q173_skew_profile", "q174_interval_sweep", "q175_novelty_rate",
            "q176_holt_trend", "q177_ivfpq_topk", "q178_ivfpq_recall",
            "q179_psi_drift", "q180_embedding_isotropy",
            "q181_all_but_the_top", "q183_referential_integrity", "q184_equidepth_histogram",
            "q185_join_estimate_audit", "q312_product_profit", "q313_important_part_types",
            "q330_returned_item_revenue", "q331_ship_latency_priority",
            "q332_customer_order_distribution", "q333_promo_revenue_share",
            "q334_supplier_part_diversity", "q335_small_quantity_revenue",
            "q336_large_volume_orders", "q337_disjunctive_revenue",
        ],
        7,
    ),
    # green in CORRECTNESS_r08.json (50/50 of the r08 window)
    **dict.fromkeys(
        [
            "q104_stream_static_enrichment", "q112_stream_topk_trending",
            "q114_stream_model_scoring", "q133_stream_neardup_gate",
            "q139_stream_session_assembly", "q189_parse_quality",
            "q191_stream_skew_profile",
            "q192_cusum_changepoint", "q194_touch_attribution", "q196_zipf_fit",
            "q198_rfm_segments", "q200_volume_correlation", "q201_holt_winters", "q202_dp_release",
            "q203_ks_source_shift", "q204_experiment_readout",
            "q206_effective_tokens",
            "q207_order_asof_enrichment", "q209_km_survival", "q210_discount_elasticity",
            "q211_seqlen_sweep", "q212_cohort_ltv", "q213_gdpr_impact",
            "q214_kish_design_effect", "q215_interarrival_gamma",
            "q217_benford_audit", "q218_fulfillment_sla",
            "q219_behavior_diversity", "q220_session_entry_exit",
            "q221_concurrent_sessions", "q222_stream_cusum_alarm",
            "q223_embedding_drift", "q314_stream_misra_gries",
            "q327_wav_frame_features", "q341_stream_quantile_monitor",
            "q346_video_frame_sample", "q347_image_resize_probe",
        ],
        8,
    ),
    # green in CORRECTNESS_r09.json (50/50 of the r09 window)
    **dict.fromkeys(
        [
            "q226_watermark_sweep", "q227_revenue_concentration",
            "q228_epoch_shuffle_audit", "q229_conformal_calibration",
            "q230_rrf_fusion", "q231_hill_tail_index",
            "q232_quantile_normalize", "q233_water_filling",
            "q234_decayed_popularity", "q236_pareto_frontier", "q237_sample_size_planner",
            "q239_itemset_triples",
            "q240_stream_decayed_popularity", "q241_price_volume_bridge",
            "q243_degree_assortativity", "q246_hll_time_rollup", "q255_absorption_analysis",
            "q259_misra_gries", "q260_mmr_lambda_sweep", "q265_lof_outliers",
            "q266_trust_bfs_hops", "q267_content_defined_chunking",
            "q269_bloom_fpr_calibration", "q277_source_jsd_matrix", "q283_calibration_scalars",
            "q286_weighted_jaccard_pairs", "q292_dedup_roi",
            "q296_markov_entropy_rate",
            "q297_operating_point_sweep", "q304_cluster_lang_purity", "q315_voptimal_dp", "q316_skyline_4d", "q317_chow_at_binseg",
            "q318_vocab_budget_matrix", "q321_permutation_bh_fdr",
            "q338_harmonic_centrality", "q348_bandit_replay",
            "q353_keeper_quality_audit", "q358_next_event_eval",
            "q360_bbit_minhash", "q364_mg_head_drift",
        ],
        9,
    ),
    # green in CORRECTNESS_r10.json (48/50 of the r10 window; the two
    # reds q273/q279 were ROUND-of-double environment divergence, fixed
    # in r11 with floor fixed-point — absent here, they front-load)
    **dict.fromkeys(
        [
            "q242_seasonal_anomalies", "q244_embedding_norm_qc",
            "q247_anomaly_contributions", "q248_lead_lag_xcorr",
            "q249_lexical_richness", "q250_training_readiness",
            "q251_robust_means", "q252_theil_sen_trend",
            "q253_binseg_changepoint", "q254_bot_heuristics",
            "q256_novelty_curve", "q257_holt_winters_multiplicative",
            "q258_stream_precedence_matrix", "q261_skyline_3d",
            "q262_bm25f_topk", "q263_token_entropy",
            "q264_winnowing_fingerprints", "q268_markov_removal_attribution",
            "q271_continuation_pairs", "q272_self_bleu_diversity",
            "q274_heaps_extrapolation", "q275_rater_kappa",
            "q276_winnowing_pairs", "q278_stream_audience_entropy",
            "q280_edit_distance_verify", "q281_digit_normalized_dedup",
            "q282_sample_adequacy", "q284_diff_in_diff",
            "q285_capture_recapture", "q287_recursive_path_census",
            "q288_stream_template_gate", "q289_gopher_panel",
            "q290_source_jackknife", "q291_padding_waste",
            "q293_chow_break_test", "q294_seasonality_strength",
            "q298_exact_auc", "q299_annotation_batch",
            "q300_corpus_scorecard", "q301_stream_session_funnel",
            "q302_stream_typemix_drift", "q306_sampling_bias_audit",
            "q307_vocab_coverage_budget", "q308_lang_homophily",
            "q311_wordlen_shape_anomaly", "q319_mann_kendall",
            "q320_kruskal_wallis", "q322_k_anonymity_audit",
        ],
        10,
    ),
    # green in CORRECTNESS_r11.json (48/50 of the r11 window; the two
    # reds q273/q279 were DuckDB HUGEINT output columns hashing as
    # decimal128 vs Spark int64 — fixed in r12 with BIGINT casts and
    # absent here, so they front-load). Re-greened names moved here
    # from their old blocks (single-occurrence invariant).
    **dict.fromkeys(
        [
            "q100_dsir_resample", "q107_prototype_pruning",
            "q109_bitext_margin_mining", "q113_bpe_merge_loop",
            "q116_bpe_encode", "q32_lsh_candidates",
            "q33_ngram_jaccard_pairs", "q38_embedding_neardup",
            "q56_neardup_groups", "q70_incremental_dedup",
            "q74_event_funnel", "q75_minhash_calibration",
            "q76_kmeans_inertia", "q82_lsh_recall", "q83_mixture_quota",
            "q86_bloom_prefilter_dedup", "q87_containment_pairs",
            "q90_semantic_dedup", "q91_banding_sweep",
            "q92_stream_ingest_gate", "q323_dirichlet_ql_topk",
            "q324_isotonic_calibration", "q325_matryoshka_recall",
            "q326_rake_keywords", "q328_image_phash", "q329_ffd_packing",
            "q339_linear_cka", "q340_alignment_uniformity",
            "q342_friedman_test", "q343_ljung_box", "q344_hurst_exponent",
            "q345_rocchio_prf", "q349_threshold_percolation",
            "q350_learned_index_audit", "q351_stratified_ate",
            "q352_qq_table", "q354_front_coding_estimate",
            "q355_good_turing", "q356_posting_compression",
            "q357_overdispersion", "q359_dalenius_hodges",
            "q361_retrieval_mrr", "q362_variant_json_stats",
            "q363_langid_confusion", "q365_rocchio_sweep",
            "q366_inclusion_audit", "q368_oneway_anova",
            "q369_kll_quantiles",
        ],
        11,
    ),
    # green in CORRECTNESS_r12.json (50/50 of the r12 window: the 48
    # re-greened r12-modified entries moved here from their old blocks
    # (single-occurrence invariant) plus q273/q279, green for the first
    # time after the r12 BIGINT output-type fix).
    **dict.fromkeys(
        [
            "q117_classifier_calibration", "q119_fuzzy_decontamination",
            "q120_softdedup_weights", "q126_similarity_pagerank",
            "q129_sparse_tfidf_knn", "q131_softdedup_sample",
            "q132_countmin_heavy_hitters", "q135_connected_components",
            "q137_dup_window_ladder", "q140_column_stats",
            "q146_skipgram_pairs", "q147_cluster_cv_folds",
            "q151_composition_chi2", "q154_itemset_pairs",
            "q155_mad_anomalies", "q158_dow_seasonality",
            "q159_triangle_count", "q161_neyman_allocation",
            "q164_exact_dup_length", "q165_kcore_peeling",
            "q169_unigram_encode", "q182_dup_attribution",
            "q186_personalized_pagerank", "q187_partition_modularity",
            "q188_conversion_latency", "q190_sample_fence_gate",
            "q193_markov_transitions", "q195_readability",
            "q197_daily_value_bands", "q199_top_paths",
            "q205_crossentropy_matrix", "q208_tokenizer_bakeoff",
            "q216_volume_acf", "q224_mmr_rerank", "q225_precedence_matrix",
            "q235_null_census", "q238_pair_explanations",
            "q245_ann_cost_ledger", "q270_singlelink_cut_sweep",
            "q273_msprt_sequential_ab", "q279_voptimal_histogram",
            "q295_blocking_agreement", "q303_graph_diameter_sweep",
            "q305_dedup_funnel", "q309_stop_shingle_census",
            "q310_ensemble_verified_pairs", "q367_stream_mg_daily_heads",
            "q93_duplicate_span_removal", "q96_simhash_candidates",
            "q97_dsir_weights",
        ],
        12,
    ),
}


# Queries whose Spark plan or oracle changed since their last green row —
# once green they would otherwise sort by staleness and could fall outside
# the window exactly when they most need re-verification.
_MODIFIED_SINCE_GREEN: set[str] = {
    # (r12-modified entries re-greened by CORRECTNESS_r12 were cleared;
    # one entry per query — a pytest asserts no duplicates. Provenance
    # of each change is in git history / the OPTIMIZATION_r* logs.)
    #
    # r11 ROUND-of-double hazard sweep, displaced from the r12 window
    # by the 50-slot staleness policy (pre-validated 7/7 at all three
    # SFs in r12 — see OPTIMIZATION_r12.md "Driver-window composition"):
    "q280_edit_distance_verify",
    "q299_annotation_batch",
    "q360_bbit_minhash",
    "q268_markov_removal_attribution",
    "q284_diff_in_diff",
    # r12 overlap conversions displaced the same way:
    "q91_banding_sweep",
    "q353_keeper_quality_audit",
    # r13 optimization round: the q137/q164 dup-span collect_set fusion
    # gained the salted two-level skew guard (_salted_dup_members) —
    # same results (oracle re-PASSed at all three SFs this round), new
    # plan shape, so the driver window re-verifies both.
    "q137_dup_window_ladder",
    "q164_exact_dup_length",
    # r13: corpus-scale empty-partitionBy windows converted to the
    # two-phase total-order operator (operators/total_order.py) — same
    # results (oracle re-PASSed at all three SFs this round), new plan
    # shape (no single-partition Window over corpus-sized input):
    "q80_sequence_packing",
    "q171_curriculum_schedule",
    "q198_rfm_segments",
    "q227_revenue_concentration",
    "q228_epoch_shuffle_audit",
    "q232_quantile_normalize",
    "q236_pareto_frontier",
    "q250_training_readiness",
    "q298_exact_auc",
    "q366_inclusion_audit",
    "q369_kll_quantiles",
    # r13: q185 key-count pins converted to overlapped eager holds:
    "q185_join_estimate_audit",
    # r13: q270 dropped its single-consumer jac checkpoint:
    "q270_singlelink_cut_sweep",
    # r13: q349 dropped its single-consumer base pin:
    "q349_threshold_percolation",
}




# Never-verified queries the round-7 judge flagged as flagships that must
# not wait out the multi-round backlog drain (VERDICT r07 item 6). They
# jump the within-group registry-index ordering; once green they fall out
# of this set's effect automatically (the _LAST_GREEN_ROUND key dominates).
_WINDOW_PRIORITY: set[str] = {
    "q314_stream_misra_gries",
    "q327_wav_frame_features",
    "q341_stream_quantile_monitor",
    "q346_video_frame_sample",
    "q347_image_resize_probe",
    "q367_stream_mg_daily_heads",
}


def driver_window_order() -> list[str]:
    """All registered query names, window-priority first (derived).

    The final tiebreak is the NAME, not registration index: the r8
    per-family module split means import order is an artifact of module
    grouping, and coverage policy must not silently shift when a query
    moves between files.
    """

    def key(name: str):
        return (
            QUERIES[name].oracle is None,  # oracle-bearing first
            name in _LAST_GREEN_ROUND,  # never-verified first
            name not in _MODIFIED_SINCE_GREEN,  # then modified-since-green
            _LAST_GREEN_ROUND.get(name, 0),  # then stalest green first
            name not in _WINDOW_PRIORITY,  # judge-flagged flagships first
            name,  # deterministic within a group, file-layout-independent
        )

    return sorted(QUERIES, key=key)


def _reorder_for_driver_window() -> None:
    snapshot = {n: QUERIES[n] for n in driver_window_order()}
    QUERIES.clear()
    QUERIES.update(snapshot)


_reorder_for_driver_window()

__all__ = ["QUERIES", "Q"]
