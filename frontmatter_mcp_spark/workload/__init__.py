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
            "q73_retention_cohorts", "q74_event_funnel",
            "q75_minhash_calibration", "q78_salted_aggregation",
            "q88_quality_gate", "q89_event_spikes",
        ],
        3,
    ),
    # green in CORRECTNESS_r04.json (50/50 of the r04 window)
    **dict.fromkeys(
        [
            "q01_pricing_summary", "q02_top_orders", "q30_dedup_exact",
            "q31_minhash_signatures", "q32_lsh_candidates",
            "q33_ngram_jaccard_pairs", "q34_simhash", "q35_text_profile",
            "q36_ann_bruteforce", "q37_ann_ivf", "q38_embedding_neardup",
            "q39_label_centroids", "q40_token_stats",
            "q41_window_fingerprint_pairs", "q43_ann_lsh", "q44_embed_vectors",
            "q45_semantic_search", "q48_kmeans_clusters", "q49_ann_ivf_kmeans",
            "q50_stream_tumbling", "q51_stream_sliding", "q52_stream_sessions",
            "q53_stream_dedup", "q54_stream_stateful_counters",
            "q55_stream_interval_join", "q56_neardup_groups",
            "q57_hash_split_sample", "q58_tfidf_keywords",
            "q59_boilerplate_spans", "q60_decontamination",
            "q61_repetition_profile", "q62_normalize_text", "q63_vocab_coverage",
            "q64_embedding_quantize", "q70_incremental_dedup", "q71_dedup_report",
            "q76_kmeans_inertia", "q77_power_iteration", "q79_doc_chunking",
            "q80_sequence_packing", "q81_ivf_partitioned", "q82_lsh_recall",
            "q83_mixture_quota", "q84_safety_profile", "q85_length_outliers",
            "q86_bloom_prefilter_dedup", "q87_containment_pairs",
            "q90_semantic_dedup", "q91_banding_sweep", "q92_stream_ingest_gate",
        ],
        4,
    ),
    # green in CORRECTNESS_r05.json (50/50 of the r05 window)
    **dict.fromkeys(
        [
            "q100_dsir_resample", "q101_pq_recall", "q102_ann_ndcg",
            "q103_temperature_mixture", "q105_bigram_lm_score",
            "q106_token_budget_mixture", "q107_prototype_pruning",
            "q108_record_linkage", "q109_bitext_margin_mining",
            "q110_shard_manifest", "q111_quality_classifier",
            "q113_bpe_merge_loop", "q115_pii_redaction", "q116_bpe_encode",
            "q117_classifier_calibration", "q118_vocab_growth",
            "q119_fuzzy_decontamination", "q120_softdedup_weights",
            "q121_store_roundtrip_search", "q122_image_ahash_dedup",
            "q123_wav_probe", "q124_duplication_ratio",
            "q125_deterministic_augmentation", "q126_similarity_pagerank",
            "q127_raking_mixture", "q128_png_ahash_dedup",
            "q129_sparse_tfidf_knn", "q130_hard_negative_mining",
            "q131_softdedup_sample", "q132_countmin_heavy_hitters",
            "q134_bm25_topk", "q135_connected_components", "q136_hll_distinct",
            "q137_dup_window_ladder", "q138_jpeg_coeff_roundtrip",
            "q140_column_stats", "q141_incremental_mv", "q142_zorder_layout",
            "q143_scd2_history", "q144_interval_islands", "q145_jl_projection",
            "q146_skipgram_pairs", "q27_approx_stats",
            "q93_duplicate_span_removal", "q94_unigram_lm_score",
            "q95_training_manifest", "q96_simhash_candidates",
            "q97_dsir_weights", "q98_pmi_merge_candidates", "q99_pq_adc_topk",
        ],
        5,
    ),
    # green in CORRECTNESS_r07.json (50/50 of the r07 window; round 6
    # artifacts were never recorded by the driver, so nothing maps to 6)
    **dict.fromkeys(
        [
            "q147_cluster_cv_folds", "q148_knn_classifier_eval",
            "q149_classifier_confusion", "q150_datacard",
            "q151_composition_chi2", "q152_join_size_sketch",
            "q153_corpus_diff", "q154_itemset_pairs", "q155_mad_anomalies",
            "q156_bootstrap_ci", "q157_ab_test", "q158_dow_seasonality",
            "q159_triangle_count", "q160_hll_join_overlap",
            "q161_neyman_allocation", "q162_eb_shrinkage",
            "q163_unigram_tokenizer", "q164_exact_dup_length",
            "q165_kcore_peeling", "q166_kmv_setops",
            "q167_perplexity_buckets", "q168_compaction_plan",
            "q169_unigram_encode", "q170_hash_sample_quantiles",
            "q171_curriculum_schedule", "q172_ewma_daily",
            "q173_skew_profile", "q174_interval_sweep", "q175_novelty_rate",
            "q176_holt_trend", "q177_ivfpq_topk", "q178_ivfpq_recall",
            "q179_psi_drift", "q180_embedding_isotropy",
            "q181_all_but_the_top", "q182_dup_attribution",
            "q183_referential_integrity", "q184_equidepth_histogram",
            "q185_join_estimate_audit", "q186_personalized_pagerank",
            "q312_product_profit", "q313_important_part_types",
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
            "q139_stream_session_assembly", "q187_partition_modularity",
            "q188_conversion_latency", "q189_parse_quality",
            "q190_sample_fence_gate", "q191_stream_skew_profile",
            "q192_cusum_changepoint", "q193_markov_transitions",
            "q194_touch_attribution", "q195_readability", "q196_zipf_fit",
            "q197_daily_value_bands", "q198_rfm_segments", "q199_top_paths",
            "q200_volume_correlation", "q201_holt_winters", "q202_dp_release",
            "q203_ks_source_shift", "q204_experiment_readout",
            "q205_crossentropy_matrix", "q206_effective_tokens",
            "q207_order_asof_enrichment", "q208_tokenizer_bakeoff",
            "q209_km_survival", "q210_discount_elasticity",
            "q211_seqlen_sweep", "q212_cohort_ltv", "q213_gdpr_impact",
            "q214_kish_design_effect", "q215_interarrival_gamma",
            "q216_volume_acf", "q217_benford_audit", "q218_fulfillment_sla",
            "q219_behavior_diversity", "q220_session_entry_exit",
            "q221_concurrent_sessions", "q222_stream_cusum_alarm",
            "q223_embedding_drift", "q224_mmr_rerank",
            "q225_precedence_matrix", "q314_stream_misra_gries",
            "q327_wav_frame_features", "q341_stream_quantile_monitor",
            "q346_video_frame_sample", "q347_image_resize_probe",
            "q367_stream_mg_daily_heads",
        ],
        8,
    ),
}

# Queries whose Spark plan or oracle changed since their last green row —
# once green they would otherwise sort by staleness and could fall outside
# the window exactly when they most need re-verification.
_MODIFIED_SINCE_GREEN: set[str] = {
    # (q27's r5 bounded-error oracle went green in CORRECTNESS_r05 — cleared)
    # r5: persisted the shared clustered subplan (q91's fix applied to q90)
    "q90_semantic_dedup",
    # r5: label-propagation rounds now pin edges + per-round labels
    "q56_neardup_groups",
    # r5: blocked-pair cosine now precomputes per-vector norms
    "q38_embedding_neardup",
    # r5: sweep inputs now unpersisted after the final union materializes
    "q91_banding_sweep",
    # r5: ingestion gate state bounded by a watermark
    "q92_stream_ingest_gate",
    # r5: corpus/batch split now driven by the derived ingestion-batch column
    "q70_incremental_dedup",
    "q86_bloom_prefilter_dedup",
    # r5b: brute-force ground truth now pinned across the config branches
    "q82_lsh_recall",
    # r5b: two-phase scaffolding factored into _two_phase_prefix (results
    # byte-identical by construction; re-verify anyway)
    "q83_mixture_quota",
    # r8: MinHash-LSH band buckets now skew-capped (max_bucket=40, inert at
    # test SFs — max observed bucket is 16 at sf0.1 — but the plan changed;
    # every green consumer of lsh_candidate_pairs re-verifies)
    "q32_lsh_candidates",
    "q75_minhash_calibration",
    "q91_banding_sweep",
    "q126_similarity_pagerank",
    "q135_connected_components",
    "q159_triangle_count",
    "q165_kcore_peeling",
    "q186_personalized_pagerank",
    # r8: connected_components_star changed (large-star distinct dropped,
    # large held by persist not eager checkpoint, tag_cols generalization)
    # — every green consumer re-verifies (never-green consumers q270/
    # q349/q353/q187 front-load automatically)
    "q135_connected_components",
    # r8 final commits (bee0526/95741fc): shingle/span explode now held
    # once via operators.holds — green consumers of the changed subplan
    # re-verify (never-green consumers front-load automatically)
    "q33_ngram_jaccard_pairs",
    "q87_containment_pairs",
    "q119_fuzzy_decontamination",
    "q147_cluster_cv_folds",
    "q93_duplicate_span_removal",
    # r9: q74 re-planned — single-pass windowed funnel replaces the
    # three-scan join chain (BENCH_r08's one >2x flag)
    "q74_event_funnel",
    # r9: binary-search step checkpoints moved into the holds lifecycle
    # (eager + prompt release of the superseded step; no-leak sweep fix)
    "q164_exact_dup_length",
    # r9: dsir_resample skips the corpus-wide left join its filter
    # undid (oracle already read FROM agg); q97 refactored through the
    # shared _dsir_doc_agg core (same plan, re-verify anyway)
    "q100_dsir_resample",
    "q97_dsir_weights",
    # r9: LSH cap gains a materialize opt-out; q32 opts out (single
    # straight pipeline), q91/q280 rebaselined for the deliberate
    # skew-guard cost
    "q32_lsh_candidates",
    "q91_banding_sweep",
    # r9: remaining bare localCheckpoints converted to the holds
    # lifecycle (identical plans, tracked release; never-green
    # q266/q303/q338 front-load automatically)
    "q165_kcore_peeling",
    "q367_stream_mg_daily_heads",
    # r9b: MinHash-LSH + exact-Jaccard ensemble queries now share ONE
    # held shingle pass (ngram_jaccard_pairs_from_shingles), matching
    # their oracles' single sh CTE; never-green, so listing them here
    # fronts the re-planned trees into the next driver window
    "q295_blocking_agreement",
    "q305_dedup_funnel",
    "q310_ensemble_verified_pairs",
    # r9b: broadcast-total tables now eagerly held (the tot/cl branch
    # raced the output branch on a cold lazy cache and re-ran the whole
    # neardup pipeline); q304 also swaps the per-(group,lang) window for
    # a two-level aggregate — same integers, no window sort
    "q292_dedup_roi",
    "q304_cluster_lang_purity",
    # r9b: neardup_groups/fuzzy_decontaminate consumers switch
    # persist_fn from lazy pin to eager hold — concurrent branches of
    # one action raced to populate the cold persist cache and re-ran
    # the shared subplan per branch (measured 0.4-0.8x of best across
    # the family); green consumers re-verify
    "q56_neardup_groups",
    "q119_fuzzy_decontamination",
    "q120_softdedup_weights",
    "q131_softdedup_sample",
    "q147_cluster_cv_folds",
    # r9b: simhash signature persist switched to eager hold (same race)
    "q96_simhash_candidates",
    # r9b: remaining fan-out pins in these converted to eager holds
    # after per-query A/B probes (q187 0.58x of best; q265/q353/q360
    # 10-15%); q90/q133 probed too — wash, left on lazy pins
    "q187_partition_modularity",
    "q265_lof_outliers",
    "q353_keeper_quality_audit",
    "q360_bbit_minhash",
    # r9b: second A/B sweep — fan-out pins/persist hooks to eager holds
    # (q315 0.45x of best; q255 ~35%; q126/q283/q297 15%; q109/q186
    # 6-7%); q325/q339 probed flat and keep lazy pins
    "q109_bitext_margin_mining",
    "q126_similarity_pagerank",
    "q186_personalized_pagerank",
    "q255_absorption_analysis",
    "q283_calibration_scalars",
    "q297_operating_point_sweep",
    "q315_voptimal_dp",
    # r9b: bakeoff comparison table + vocab persist hooks to eager
    # holds (~45%); q148/q152/q181/q185/q235 probed flat-or-worse and
    # keep their lazy pins
    "q208_tokenizer_bakeoff",
    # r9b: third/fourth A/B sweep conversions (ADR-0007). q146's
    # recurring "contention" flag was actually this race — hold ends
    # it. q160/q166/q177/q178/q184/q238 probed flat and keep pins
    "q137_dup_window_ladder",
    "q140_column_stats",
    "q146_skipgram_pairs",
    "q154_itemset_pairs",
    "q229_conformal_calibration",
    "q245_ann_cost_ledger",
    "q246_hll_time_rollup",
    "q269_bloom_fpr_calibration",
    "q270_singlelink_cut_sweep",
    "q286_weighted_jaccard_pairs",
    # r9b: fifth sweep (q193 44%, q296 39%, q277 40%, q259 8%);
    # q111/q149/q180/q298/q326 probed flat and keep pins
    "q193_markov_transitions",
    "q259_misra_gries",
    "q277_source_jsd_matrix",
    "q296_markov_entropy_rate",
    # r9b: sixth sweep (q321 38%, q113 33%, q159 31%, q75 19%,
    # q97/q116/q309 ~13%, q117 6%); q163/q175/q264 flat-or-worse
    "q75_minhash_calibration",
    "q97_dsir_weights",
    "q113_bpe_merge_loop",
    "q116_bpe_encode",
    "q117_classifier_calibration",
    "q159_triangle_count",
    "q309_stop_shingle_census",
    "q321_permutation_bh_fdr",
    # r9b: seventh sweep (q267/q318 30%, q348 25%, q169 24%, q205 16%,
    # q239 8%); q105/q136/q167/q272/q366 flat and keep pins
    "q169_unigram_encode",
    "q205_crossentropy_matrix",
    "q239_itemset_triples",
    "q267_content_defined_chunking",
    "q318_vocab_budget_matrix",
    "q348_bandit_replay",
    # r9b: eighth sweep — the "iterative rounds are race-free" guess
    # was wrong (round 1 fans out over the edge pin): q364 34%, q338
    # 29%, q135 25%, q165 24%, q243 22%, q266 18%, q303 17%; q349 flat
    "q135_connected_components",
    "q165_kcore_peeling",
    "q243_degree_assortativity",
    "q266_trust_bfs_hops",
    "q303_graph_diameter_sweep",
    "q338_harmonic_centrality",
    "q364_mg_head_drift",
    # r9b: ninth (final) sweep (q358 37%, q224 32%, q316 27%, q161
    # 17%, q225 13%, q260 11%, q317 8%); q344 flat and keeps pins
    "q161_neyman_allocation",
    "q224_mmr_rerank",
    "q225_precedence_matrix",
    "q260_mmr_lambda_sweep",
    "q316_skyline_4d",
    "q317_chow_at_binseg",
    "q358_next_event_eval",
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
