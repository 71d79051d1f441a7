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
# entries per round, so coverage is rotated: queries that have never had a
# driver-verified row come first, then queries new this round, then a
# rotation of previously driver-green queries.  Rows-only queries (no
# DuckDB oracle: approx sketches, streaming) sort last — they would spend
# a window slot on a weaker check.
_DRIVER_PRIORITY: list[str] = [
    # never driver-checked as of CORRECTNESS_r01 (registered after slot 50)
    "q40_token_stats",
    "q41_window_fingerprint_pairs",
    "q42_multimodal_features",
    "q43_ann_lsh",
    "q44_embed_vectors",
    "q45_semantic_search",
    "q48_kmeans_clusters",
    "q49_ann_ivf_kmeans",
    "q56_neardup_groups",
    "q57_hash_split_sample",
    "q58_tfidf_keywords",
    "q59_boilerplate_spans",
    "q60_decontamination",
    "q61_repetition_profile",
    "q62_normalize_text",
    "q63_vocab_coverage",
    "q64_embedding_quantize",
    "q70_incremental_dedup",
    "q71_dedup_report",
    "q75_minhash_calibration",
    "q76_kmeans_inertia",
    "q77_power_iteration",
    "q79_doc_chunking",
    "q80_sequence_packing",
    # new this round
    "q81_ivf_partitioned",
    "q82_lsh_recall",
    "q83_mixture_quota",
    "q84_safety_profile",
    "q85_length_outliers",
    "q86_bloom_prefilter_dedup",
    "q87_containment_pairs",
    "q88_quality_gate",
    "q89_event_spikes",
    # rotation of driver-green round-1 queries (CORRECTNESS_r01 all-pass),
    # most-load-bearing first: the dedup/ANN datapipe block, then the
    # relational queries whose plans changed most recently
    "q30_dedup_exact",
    "q31_minhash_signatures",
    "q32_lsh_candidates",
    "q33_ngram_jaccard_pairs",
    "q34_simhash",
    "q35_text_profile",
    "q36_ann_bruteforce",
    "q37_ann_ivf",
    "q38_embedding_neardup",
    "q39_label_centroids",
    "q78_salted_aggregation",
    "q26_cdc_upsert",
    "q18_asof_click_purchase",
    "q19_sessionization",
    "q72_gapfill_hourly",
    "q73_retention_cohorts",
    "q74_event_funnel",
]


def _reorder_for_driver_window() -> None:
    in_priority = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    with_oracle = [
        n for n in QUERIES if n not in in_priority and QUERIES[n].oracle is not None
    ]
    rows_only = [
        n for n in QUERIES if n not in in_priority and QUERIES[n].oracle is None
    ]
    snapshot = {n: QUERIES[n] for n in in_priority + with_oracle + rows_only}
    QUERIES.clear()
    QUERIES.update(snapshot)


_reorder_for_driver_window()

__all__ = ["QUERIES", "Q"]
