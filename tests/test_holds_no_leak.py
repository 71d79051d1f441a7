"""Standing no-leak sweep for the pin()/hold() block lifecycle.

The q187 block-leak (round 8: an eager localCheckpoint's internal RDD is
unreachable from the Python DataFrame, so its blocks outlived the query)
was caught once by a targeted pytest. This sweep makes the invariant a
standing property: after running a representative query from every
workload family and then releasing (exactly what the registry does at
the next query invocation), the JVM persistent-RDD registry must be
EMPTY — no pinned input, no operator-internal checkpoint, may survive
its query. A new hold()/pin() call site that forgets the lifecycle
fails this test by construction.
"""

from __future__ import annotations

import os

import pytest

from frontmatter_mcp_spark.operators.holds import _persistent_ids
from frontmatter_mcp_spark.workload import QUERIES
from frontmatter_mcp_spark.workload.registry import release_pinned

SF_DIR = os.environ.get("SPARK_GRAFT_SF_TINY", "/root/testdata/sf0.001")

# One representative per family, biased toward the queries that exercise
# pin()/hold() the hardest (multi-consumer holds, LSH cap checkpoint,
# star-contraction round pins).
SWEEP = [
    "q02_top_orders",  # relational — no pins: guards the baseline itself
    "q32_lsh_candidates",  # dp_dedup — LSH skew cap's eager checkpoint
    "q33_ngram_jaccard_pairs",  # dp_dedup — held exploded shingle table
    "q93_duplicate_span_removal",  # dp_dedup — held exploded span table
    "q135_connected_components",  # dp_graph — star-contraction round pins
    "q90_semantic_dedup",  # dp_embed — pinned clustered subplan
    "q82_lsh_recall",  # dp_sampling/dedup — pinned ground truth across configs
    "q164_exact_dup_length",  # dp_dedup — binary-search pins + localCheckpoints
    "q100_dsir_resample",  # dp_sampling
    "q113_bpe_merge_loop",  # dp_tokenize — iterative merge loop pins
    "q201_holt_winters",  # dp_timeseries
    "q136_hll_distinct",  # dp_sketch
    "q111_quality_classifier",  # dp_eval/classifier
    "q123_wav_probe",  # dp_multimodal
    "q134_bm25_topk",  # dp_retrieval
    "q157_ab_test",  # dp_stats
    "q35_text_profile",  # dp_text
    "q65_volume_shipping",  # dp_business
    # r9 additions: every query whose bare localCheckpoint the first
    # sweep revision missed (converted to the holds lifecycle)
    "q165_kcore_peeling",  # dp_graph — per-(k, round) lazy checkpoints
    "q266_trust_bfs_hops",  # dp_graph — BFS rounds, prompt supersede
    "q303_graph_diameter_sweep",  # dp_graph — repeated BFS sweeps
    "q338_harmonic_centrality",  # dp_graph — hop-table rounds
    "q367_stream_mg_daily_heads",  # streaming — two-consumer head table
    # r9b additions: shared-shingle holds and broadcast-total holds
    "q295_blocking_agreement",  # dp_dedup — shared shingle hold (LSH+Jaccard)
    "q305_dedup_funnel",  # dp_dedup — shared shingle hold, six-stage union
    "q310_ensemble_verified_pairs",  # dp_dedup — shared shingle hold
    "q292_dedup_roi",  # dp_dedup — held broadcast-total group table
    "q304_cluster_lang_purity",  # dp_embed — held broadcast-total group table
    # r9b second/third sweep conversions (ADR-0007)
    "q147_cluster_cv_folds",  # dp_embed — held fold table + neardup holds
    "q187_partition_modularity",  # dp_graph — held edge/community tables
    "q208_tokenizer_bakeoff",  # dp_tokenize — held comparison + vocab hooks
    "q265_lof_outliers",  # dp_embed — held cl/knn/kd/lrd chain
    "q315_voptimal_dp",  # dp_sketch — held DP level tables
]

# ADVICE r9: hand-listing conversions misses the tail (sweeps 4-9 added
# ~30 more). Any plan change lands in _MODIFIED_SINCE_GREEN by policy, so
# derive the rest of the sweep from it — new hold conversions are swept
# automatically, with the hand-picked representatives above as the floor.
# (Entries leave _MODIFIED_SINCE_GREEN when re-greened by the driver; by
# then their holds have run clean through the full-registry oracle sweep,
# which now leak-checks every query — see tests/oracle_check.py.)
from frontmatter_mcp_spark.workload import _MODIFIED_SINCE_GREEN  # noqa: E402

SWEEP = sorted(set(SWEEP) | (_MODIFIED_SINCE_GREEN & set(QUERIES)))


@pytest.fixture(scope="module", autouse=True)
def _clean_slate(spark):
    # Anything persisted by earlier test modules is not this sweep's
    # business — clear it so the empty-registry assertion is attributable.
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in jmap.values():
        jrdd.unpersist(False)
    release_pinned()
    yield


@pytest.mark.parametrize("name", SWEEP)
def test_no_persistent_blocks_survive_query(spark, name):
    q = QUERIES[name]
    q.spark(spark, SF_DIR).collect()
    # the registry frees the previous query's working set at the NEXT
    # invocation; replay that lifecycle step explicitly
    release_pinned()
    leaked = _persistent_ids(spark)
    assert leaked == set(), (
        f"{name} leaked persistent RDD ids {sorted(leaked)} past "
        "release_pinned() — a pin() or hold() call site is missing the "
        "registry lifecycle"
    )
