"""Standing gate for ADR-0007: cold multi-consumer pins are the race.

Spark's lazy persist has no cross-task population lock, so a pinned
table consumed by 2+ branches of ONE action re-runs its upstream
pipeline once per cold branch (round-9's systemic finding; receipts in
SCALE.md). The r9b/r10 fixes were found by bench probes — this gate
makes the invariant structural: walk every workload query's optimized
plan and flag any InMemoryRelation that (a) appears 2+ times in the
final action's plan and (b) is still cold when the query function
returns (an eager hold, or a pin warmed by an intra-query action, is
safe by construction — it cannot race).

Queries on the allowlist below are audited keeps: each was A/B probed
(module-level pin->hold monkeypatch, bracketed min-of-3 at sf0.1) and
measured flat-to-worse when converted — their pinned tables are cheap
aggregates where the eager materialization job costs more than the
worst-case duplicate recompute. A NEW query (or a plan change) that
introduces cold fan-out fails this gate until it is either converted
to hold() or probed and added here with a receipt.
"""

from __future__ import annotations

from collections import Counter

import pytest

from frontmatter_mcp_spark.workload import QUERIES
from frontmatter_mcp_spark.workload.registry import release_pinned

# Audited keeps. Probe receipts (hold/pin min-of-3 ratio at sf0.1):
# r9b sweeps: q90 q105 q111 q133 q136 q148 q149 q152 q160 q163 q166
#   q167 q175 q177 q178 q180 q181 q184 q185 q235 q238 q264 q272 q298
#   q325 q326 q339 q344(pre-r10) q349 q366 — flat or worse (STATUS r9b).
# r10 batches 1-3: q295 1.20, q325 1.06, q109 1.24, q100 1.05, q324
#   0.98, q342 1.02, q306 0.98, q274 1.05, q298 1.14, q264 1.35, q261
#   1.02, q300 1.41, q272 0.95, q326 1.20, q350 0.93, q351 1.09, q355
#   0.98, q359 0.92, q366 0.91, q150 1.00, q156 0.95, q162 1.04, q98
#   1.01 — all within noise or regressions, pins kept deliberately.
#   (q359 was initially kept at 0.92, then converted after a second
#   independent probe confirmed the win: 0.89 min-of-4.)
# r13: q185 converted to overlapped eager holds (7.9 -> 5.7 s);
# q298/q366 removed — their total-order conversions hold() the
# multi-consumer table eagerly, so the cold fan-out is gone.
ALLOWED_COLD_FANOUT = {
    "q100_dsir_resample",
    "q105_bigram_lm_score",
    "q109_bitext_margin_mining",
    "q111_quality_classifier",
    "q136_hll_distinct",
    "q149_classifier_confusion",
    "q150_datacard",
    "q156_bootstrap_ci",
    "q160_hll_join_overlap",
    "q162_eb_shrinkage",
    "q163_unigram_tokenizer",
    "q166_kmv_setops",
    "q167_perplexity_buckets",
    "q175_novelty_rate",
    "q178_ivfpq_recall",
    "q180_embedding_isotropy",
    "q184_equidepth_histogram",
    "q238_pair_explanations",
    "q261_skyline_3d",
    "q264_winnowing_fingerprints",
    "q272_self_bleu_diversity",
    "q274_heaps_extrapolation",
    "q295_blocking_agreement",
    "q300_corpus_scorecard",
    "q306_sampling_bias_audit",
    "q324_isotonic_calibration",
    "q325_matryoshka_recall",
    "q326_rake_keywords",
    "q342_friedman_test",
    "q350_learned_index_audit",
    "q351_stratified_ate",
    "q355_good_turing",
    "q82_lsh_recall",
    "q90_semantic_dedup",
    # q91_banding_sweep removed r12: its lazy pins became eager holds
    # (overlap conversion), so the cold fan-out this list audits is gone.
    "q98_pmi_merge_candidates",
}

SF_DIR = "/root/testdata/sf0.001"


def cold_fanout_tables(df) -> dict[tuple, int]:
    """Cold InMemoryRelations appearing 2+ times in df's final plan.

    Keyed by (JVM identity hash of the cacheBuilder, cacheBuilder hash):
    the cache manager hands every occurrence of one cached relation the
    SAME CachedRDDBuilder instance (verified: q105's five occurrences
    share one instance even under withColumnRenamed views), so identity
    is the true equality; pairing it with hashCode makes the key
    collision-proof (r10 keyed by hashCode alone — two distinct
    single-use relations colliding there would miscount as one
    fanned-out relation). The relation's output string must NOT join
    the key: every occurrence carries fresh exprIds/renames, which
    would split a real fan-out into count-1 keys and mask it.
    A relation already materialized when the query function returns
    (isCachedColumnBuffersLoaded) is warm — populated by an intra-query
    action before the fan-out — and cannot race.
    """
    jvm = df.sparkSession._jvm
    plan = df._jdf.queryExecution().optimizedPlan()
    imrs = []
    stack = [plan]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "InMemoryRelation":
            cb = node.cacheBuilder()
            key = (
                jvm.java.lang.System.identityHashCode(cb),
                cb.hashCode(),
            )
            imrs.append((key, cb.isCachedColumnBuffersLoaded()))
        it = node.children().iterator()
        while it.hasNext():
            stack.append(it.next())
    counts = Counter(k for k, _ in imrs)
    return {
        k: n
        for k, n in counts.items()
        if n >= 2 and not all(loaded for kk, loaded in imrs if kk == k)
    }


@pytest.fixture(scope="module")
def flagged(spark) -> set[str]:
    out = set()
    for name, q in QUERIES.items():
        if cold_fanout_tables(q.spark(spark, SF_DIR)):
            out.add(name)
        release_pinned()
    return out


def test_no_unaudited_cold_fanout(flagged):
    new = sorted(flagged - ALLOWED_COLD_FANOUT)
    assert not new, (
        "queries with a cold multi-consumer pin in one action (ADR-0007 "
        f"race): {new} — convert the pin to hold() or A/B probe it and "
        "add it to ALLOWED_COLD_FANOUT with the receipt"
    )


def test_allowlist_is_not_stale(flagged):
    stale = sorted(ALLOWED_COLD_FANOUT - flagged)
    assert not stale, (
        f"allowlist entries that no longer have cold fan-out: {stale} — "
        "remove them so the audit trail stays exact"
    )
