"""Physical-plan quality gates — the 100 TB design assertions.

Correctness says what a query returns; these tests pin HOW Catalyst
executes it. Each assertion is a property that must survive a 100x-1000x
scale-up: filters reaching the parquet scan, column pruning, broadcast
(not shuffle) joins for dimension tables, top-k via TakeOrderedAndProject
(no global sort), and no Python UDFs anywhere in the relational surface.
"""

from __future__ import annotations

import re

import pytest

from frontmatter_mcp_spark.workload import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def assert_materialized(plan: str) -> None:
    """A shared subplan computed once shows as an InMemoryTableScan
    (lazy pin) or a Scan ExistingRDD of the checkpoint (eager hold,
    ADR-0007) — either proves the consumers read a materialization."""
    assert "InMemoryTableScan" in plan or "ExistingRDD" in plan, plan


def formatted_plan(spark, name: str) -> str:
    df = QUERIES[name].spark(spark, SF_DIR)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(jmode)


def test_q01_filter_pushed_to_scan(spark):
    plan = formatted_plan(spark, "q01_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached parquet


def test_q01_column_pruning(spark):
    plan = formatted_plan(spark, "q01_pricing_summary")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # 16-column table, 7-column read: pruning reached the scan
    assert "l_orderkey" not in read_cols and "l_partkey" not in read_cols
    assert {"l_quantity", "l_returnflag", "l_linestatus"} <= read_cols


def test_q01_partial_aggregation(spark):
    # map-side combine: two HashAggregate nodes around the exchange
    plan = formatted_plan(spark, "q01_pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_q06_all_filters_pushed(spark):
    plan = formatted_plan(spark, "q06_forecast_revenue")
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    for col in ["l_shipdate", "l_discount", "l_quantity"]:
        assert col in pushed


def test_q02_topk_avoids_global_sort(spark):
    plan = formatted_plan(spark, "q02_top_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no full sort stage for a LIMIT 10


def test_q03_dimension_broadcast(spark):
    # the filtered customer dim must broadcast, never shuffle
    plan = formatted_plan(spark, "q03_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_q05_snowflake_all_broadcast_dims(spark):
    plan = formatted_plan(spark, "q05_region_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q36_query_side_broadcast(spark):
    # 5 query vectors join the candidate scan: must be a broadcast NLJ,
    # never a shuffled cartesian
    plan = formatted_plan(spark, "q36_ann_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_q07_single_window_exchange(spark):
    # one shuffle on the partition key; the rank filter must not add more
    plan = formatted_plan(spark, "q07_top_orders_per_customer")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert re.search(r"Arguments: hashpartitioning\(o_custkey", plan)


# the two codec-certification queries are EXPLICIT Arrow-batched Python
# stages (real BMP/WAV codecs run in mapInPandas by design) — every
# other query in the q0/q1/q2 name range must stay JVM-side
_EXPLICIT_PYTHON_STAGES = {
    "q122_image_ahash_dedup",
    "q123_wav_probe",
    "q128_png_ahash_dedup",
    "q138_jpeg_coeff_roundtrip",
    # r10: the q3xx multimodal decode stages (Arrow-batched mapInPandas
    # over binary payloads — the documented Python boundary)
    "q327_wav_frame_features",
    "q328_image_phash",
    "q346_video_frame_sample",
    "q347_image_resize_probe",
    # r10: the q4x embed/multimodal stages the old q0/q1/q2-prefix sweep
    # never covered — embed() is the reference's pandas_udf surface
    # (A19), the feature decode is the same Arrow boundary as above
    "q42_multimodal_features",
    "q44_embed_vectors",
    "q45_semantic_search",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_relational_surface_has_no_python_udfs(spark, name):
    # the entire relational surface must stay JVM-side (codegen'd);
    # Python appears only in explicitly-Python stages (mapInPandas
    # decode). r10: extended from the q0/q1/q2 prefixes to ALL 369
    # queries (the q3xx tail was unswept), and a no-cartesian assert
    # added — a full-registry scan measured zero of either, so any
    # future hit is a regression, not a baseline. r11 (ADVICE r10): the
    # Python-boundary exemption no longer exempts the no-cartesian
    # invariant — every query's plan is cartesian-free, decode stages
    # included.
    plan = formatted_plan(spark, name)
    assert "CartesianProduct" not in plan
    if name not in _EXPLICIT_PYTHON_STAGES:
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "MapInPandas" not in plan


@pytest.mark.parametrize(
    "name", ["q30_dedup_exact", "q31_minhash_signatures", "q34_simhash", "q35_text_profile"]
)
def test_text_dedup_operators_are_jvm_side(spark, name):
    plan = formatted_plan(spark, name)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q64_quantize_encode_is_narrow(spark):
    # the encode pass must be a scan -> project map: no exchange, no
    # join — the dim stats ride in as literals
    plan = formatted_plan(spark, "q64_embedding_quantize")
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_q48_kmeans_assignment_is_narrow(spark):
    # final assignment: literal-centroid argmin, zero shuffle
    plan = formatted_plan(spark, "q48_kmeans_clusters")
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_q65_dims_broadcast_never_cartesian(spark):
    plan = formatted_plan(spark, "q65_volume_shipping")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q60_span_join_is_shuffle_not_broadcast(spark):
    # test-span set is corpus-sized: the contamination join must NOT
    # plan a broadcast of it at scale (here we assert it's a real join
    # over the span key, with partial aggregation after)
    plan = formatted_plan(spark, "q60_decontamination")
    assert "Join" in plan
    assert plan.count("HashAggregate") >= 2


def test_q62_normalize_is_narrow_map(spark):
    plan = formatted_plan(spark, "q62_normalize_text")
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_relational_surface_has_no_python_udfs_extended(spark):
    # the new relational queries stay fully JVM-side
    for name in [
        "q65_volume_shipping",
        "q66_market_share",
        "q67_top_supplier",
        "q68_bulk_suppliers",
        "q69_rich_inactive_customers",
        "q59_boilerplate_spans",
        "q60_decontamination",
        "q61_repetition_profile",
        "q62_normalize_text",
        "q63_vocab_coverage",
        "q64_embedding_quantize",
    ]:
        plan = formatted_plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_q79_chunking_is_narrow(spark):
    # chunking must stay transform+explode: no exchange anywhere
    plan = formatted_plan(spark, "q79_doc_chunking")
    assert "Exchange" not in plan, plan


def test_q39_centroid_mean_has_no_collect_list(spark):
    # the per-(label, dim) mean must be a map-side-combined sum, never a
    # collect_list buffer (a popular label at 100 TB OOMs an executor);
    # two HashAggregates = partial + final around the exchange
    plan = formatted_plan(spark, "q39_label_centroids")
    # the ONLY collect_list allowed is the dim-bounded array reassembly
    # in the final centroid build — the per-value mean aggregate must not
    # have one, so the sorted-fold marker array_sort(collect_list) is out
    assert "array_sort(collect_list" not in plan, plan
    assert plan.count("HashAggregate") >= 2


def test_kmeans_update_mean_has_no_collect_list(spark):
    # same property for the k-means centroid-update job (q48/q49/q76 path)
    from frontmatter_mcp_spark.operators.clustering import _assign_cid
    from frontmatter_mcp_spark.functions.vector import fixed_point_mean
    from frontmatter_mcp_spark.tables import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, SF_DIR, "embeddings")
    vecs = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents = [[0.0] * 64, [0.1] * 64]
    dims = _assign_cid(vecs, cents, "vec_id").select(
        "cid", F.posexplode("v").alias("pos", "val")
    )
    means = dims.groupBy("cid", "pos").agg(fixed_point_mean(F.col("val")).alias("mean_v"))
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = means._jdf.queryExecution().explainString(jmode)
    assert "collect_list" not in plan, plan
    assert plan.count("HashAggregate") >= 2  # map-side partials


def test_q78_salted_agg_two_phase(spark):
    # the salted aggregate still partial-aggregates map-side per phase
    plan = formatted_plan(spark, "q78_salted_aggregation")
    assert plan.count("HashAggregate") >= 3  # partials + salt phase + final


def test_q81_probe_scan_partition_pruned(spark):
    # the IVF probe over the label-partitioned store must prune at the
    # file index via dynamic partition pruning from the broadcast probe
    # set — only the probed cells' files are ever read; at 1000x the
    # store this is the difference between reading 2 cells and all of
    # them
    plan = formatted_plan(spark, "q81_ivf_partitioned")
    pruned_scans = [
        l for l in plan.splitlines()
        if "PartitionFilters" in l and "dynamicpruning" in l
    ]
    assert pruned_scans, plan


def test_q84_safety_profile_narrow_no_python(spark):
    # the safety profile must stay a pure codegen map: no exchange, no
    # Python worker — regex counters run inside the JVM scan stage
    plan = formatted_plan(spark, "q84_safety_profile")
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_q83_mixture_two_phase_rank(spark):
    # two-phase quota sampling: the big-side rank window must partition
    # by (stratum, md5-prefix) — a window keyed on the stratum alone
    # would sort a dominant stratum in ONE task at 100 TB — and the
    # offset table must come back via broadcast, never a shuffled join
    plan = formatted_plan(spark, "q83_mixture_quota")
    assert "Python" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # the row_number spec carries the sub-split key; the only other
    # window is the cumulative offset over the tiny counts aggregate
    rank_specs = re.findall(r"row_number\(\) windowspecdefinition\(([^)]*)", plan)
    assert rank_specs, plan
    for spec in rank_specs:
        assert "_pfx" in spec, (spec, plan)


def test_q85_stats_broadcast_back(spark):
    # the percentile fences join back via broadcast: the corpus is
    # scanned and filtered without a second shuffle
    plan = formatted_plan(spark, "q85_length_outliers")
    assert "BroadcastHashJoin" in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1, plan


def test_q86_bloom_prefilter_before_join(spark):
    # the bloom bit-set is a bounded aggregate broadcast as one row, and
    # incoming fingerprints are membership-filtered BEFORE the exact
    # fingerprint join — at scale the join shuffles candidate hits, not
    # the whole incoming batch
    plan = formatted_plan(spark, "q86_bloom_prefilter_dedup")
    assert "ObjectHashAggregate" in plan, plan  # collect_set bloom build
    assert "array_contains" in plan, plan  # k-position membership filter
    assert "BroadcastNestedLoopJoin" in plan, plan  # one-row bloom attach


def test_q88_quality_gate_one_scan_one_broadcast(spark):
    # the composite gate must not multiply corpus scans: all filters run
    # in one pass with the percentile stats broadcast back
    plan = formatted_plan(spark, "q88_quality_gate")
    assert "BroadcastHashJoin" in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1, plan
    assert "Python" not in plan, plan


def test_q90_semantic_dedup_pair_join_is_cluster_blocked(spark):
    # the cosine pair comparison must key on the learned cluster id —
    # a cartesian / nested-loop pair join would be all-pairs at scale
    plan = formatted_plan(spark, "q90_semantic_dedup")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert re.search(r"Left keys \[1\]: \[cluster#\d+\]", plan), plan


def test_q93_span_scrub_is_jvm_side_with_partial_aggs(spark):
    """Duplicate-span removal: pure codegen (no Python eval nodes), the
    duplicated-span aggregate combines map-side, and the doc rebuild is
    an aggregate — not a window (no per-doc sort exchange)."""
    plan = formatted_plan(spark, "q93_duplicate_span_removal")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # map-side partial counts
    assert "Window" not in plan  # rebuild is array_sort-in-agg, no window


def test_q94_unigram_lm_broadcasts_total_only(spark):
    """Unigram LM score: no Python, the corpus-total N rides in as a
    one-row broadcast (BroadcastNestedLoopJoin over a single-row agg is
    fine; a shuffle for one row is not), and the vocab join shuffles on
    the term key rather than broadcasting a corpus-sized side."""
    plan = formatted_plan(spark, "q94_unigram_lm_score")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_q95_manifest_composition_shape(spark):
    """The composed cleaning pipeline must not cost a new shuffle class
    over its stages run separately: no Python eval nodes, the per-source
    stats join is broadcast, no cartesian product, and partial
    aggregation feeds the fingerprint/span exchanges."""
    plan = formatted_plan(spark, "q95_training_manifest")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # stats/keepers/spans partials


def test_q97_dsir_single_explode_broadcast_ratio(spark):
    """DSIR weights: no Python eval nodes, the B-row log-ratio table and
    the one-row totals ride in as broadcasts (never a cartesian), and
    the (doc, bucket) tf aggregate is materialized (an eager hold since
    ADR-0007 — "Scan ExistingRDD" of the checkpoint; was a lazy pin's
    InMemoryTableScan) so the corpus token explode runs ONCE — its two
    consumers project differently and would otherwise each re-explode
    the corpus."""
    plan = formatted_plan(spark, "q97_dsir_weights")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # ratio table joins broadcast
    assert "CartesianProduct" not in plan
    # held tf aggregate: checkpoint scan (or cache scan, either proves
    # the explode is materialized once)
    assert "Scan ExistingRDD" in plan or "InMemoryTableScan" in plan
    # at most ONE feature explode in the final plan (zero when the
    # held tf aggregate absorbed it into the checkpoint job)
    assert len(re.findall(r"^\(\d+\) Generate", plan, re.M)) <= 1


def test_q98_pmi_topk_no_global_sort(spark):
    """PMI merge candidates: top-k is a TakeOrderedAndProject (no global
    sort materialized), no Python eval nodes, no cartesian, and the
    pinned unigram vocab (three consumers) is read from cache."""
    plan = formatted_plan(spark, "q98_pmi_merge_candidates")
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan  # pinned unigram counts


def test_q99_pq_adc_shape(spark):
    """PQ-ADC: the query side (with its precomputed distance table)
    broadcasts against the encoded corpus (BuildLeft — never a
    cartesian), encode/ADC are pure codegen (no Python eval), and the
    per-query top-k is pruned map-side by WindowGroupLimit so the single
    exchange only carries surviving candidates."""
    plan = formatted_plan(spark, "q99_pq_adc_topk")
    assert "BroadcastNestedLoopJoin Cross BuildLeft" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "WindowGroupLimit" in plan  # rank<=k pushed below the exchange
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1


def test_q100_dsir_resample_topk_shape(spark):
    """DSIR resampling: the Gumbel scoring is a narrow map over the
    weight plan (no Python eval), the selection is a
    TakeOrderedAndProject (no global sort), and the pinned (doc, bucket)
    tf aggregate is read from cache like q97."""
    plan = formatted_plan(spark, "q100_dsir_resample")
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan


def test_q101_pq_recall_shape(spark):
    """PQ recall calibration: both the exact and ADC sides broadcast the
    5-query side (never a cartesian), the exact top-k is pruned map-side
    by WindowGroupLimit, and everything stays JVM-side."""
    plan = formatted_plan(spark, "q101_pq_recall")
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q102_ndcg_broadcasts_small_sides(spark):
    """NDCG eval: the ranking is the q36 broadcast shape, the label
    histogram comes back as a broadcast join, nothing is a cartesian,
    and the whole metric pipeline stays JVM-side."""
    plan = formatted_plan(spark, "q102_ann_ndcg")
    assert "BroadcastNestedLoopJoin" in plan  # query-side broadcast rank
    assert "BroadcastHashJoin" in plan  # label histogram + top-k joins
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q103_temperature_mixture_broadcast_rates(spark):
    """Temperature mixture: the per-source rate table joins back as a
    broadcast (the corpus never shuffles for the keep decision), the
    one-row denominator rides a broadcast too, and everything is
    JVM-side codegen."""
    plan = formatted_plan(spark, "q103_temperature_mixture")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q105_bigram_lm_partial_aggs_no_python(spark):
    """Bigram LM score: pure codegen, the per-doc pair tf collapses
    map-side before the count joins (partial aggregation), the corpus
    total is a broadcast, never a cartesian."""
    plan = formatted_plan(spark, "q105_bigram_lm_score")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 4
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_q106_token_budget_two_phase_window(spark):
    """Token-budget mixture: the running-sum window must partition on
    the (stratum, prefix) sub-key — never the bare stratum, which would
    sort a dominant source in one task — and the prefix offsets come
    back as a broadcast."""
    plan = formatted_plan(spark, "q106_token_budget_mixture")
    assert re.search(r"windowspecdefinition\(source[^\n]*_pfx", plan), plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q107_prototype_distance_is_literal_centroid_map(spark):
    """Prototype pruning: the distance pass carries the centroids as
    plan literals (no centroid join/cartesian), and the only window
    partitions on the bounded cluster key."""
    plan = formatted_plan(spark, "q107_prototype_pruning")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert re.search(r"windowspecdefinition\(cluster", plan), plan


def test_q109_bitext_blocked_pairs_pinned(spark):
    """Bitext mining: the cross-side pair join is within-block (no
    cartesian), the pinned pair table serves the two k-NN windows and
    the margin join from cache, everything JVM-side, and the output is
    a TakeOrderedAndProject."""
    plan = formatted_plan(spark, "q109_bitext_margin_mining")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "InMemoryTableScan" in plan
    assert "TakeOrderedAndProject" in plan


def test_q110_shard_manifest_two_phase_rank(spark):
    """Shard manifest: the global rank must come from the prefix-bounded
    window (never a whole-corpus ROW_NUMBER in one task), the prefix
    offsets return as a broadcast, and everything stays JVM-side."""
    plan = formatted_plan(spark, "q110_shard_manifest")
    assert re.search(r"windowspecdefinition\(_pfx", plan), plan
    assert not re.search(r"windowspecdefinition\(\s*_w", plan)
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q111_classifier_broadcast_weights_no_python(spark):
    """Trained classifier: every weight/step table joins back as a
    broadcast (bucket key, <=64 rows), the gradient aggregates are
    map-side combined, the pinned tf table serves the iterations from
    cache, and no Python touches the hot path."""
    plan = formatted_plan(spark, "q111_quality_classifier")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2
    assert "InMemoryTableScan" in plan
    assert plan.count("HashAggregate") >= 4


def test_q113_bpe_loop_top_pair_broadcast(spark):
    """BPE loop: each step's top pair arrives as a 1-row broadcast
    (TakeOrderedAndProject, no global sort), pair counts aggregate
    map-side, the per-step sequence tables serve their three consumers
    from cache, and no Python in the loop."""
    plan = formatted_plan(spark, "q113_bpe_merge_loop")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert_materialized(plan)


def test_q115_redaction_is_narrow_scrub(spark):
    """PII redaction: a pure projection — no joins, no Python, and the
    only exchange is the small-fixture parallelism repartition (the
    rewrite itself adds zero shuffles)."""
    plan = formatted_plan(spark, "q115_pii_redaction")
    assert "Join" not in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q116_bpe_encode_broadcasts_vocab(spark):
    """BPE encode: the segmentation lengths reach the corpus token
    stream as a broadcast (never a shuffle join on the token key), the
    per-doc aggregate is map-side combined, and the merge loop's top
    pairs are TakeOrderedAndProject."""
    plan = formatted_plan(spark, "q116_bpe_encode")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_q117_calibration_single_extra_aggregate(spark):
    """Calibration: one corpus-sized aggregate on top of the scoring
    plan (10-bucket key, partial aggregation), weights still broadcast,
    no Python."""
    plan = formatted_plan(spark, "q117_classifier_calibration")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2
    assert plan.count("HashAggregate") >= 4


def test_q118_vocab_growth_first_appearance_shape(spark):
    """Vocab growth: the term first-appearance aggregate is map-side
    combined, per-bucket tables come back to the 10-row spine as
    broadcasts, and the cumulative window runs over the spine (decile
    order), never the data."""
    plan = formatted_plan(spark, "q118_vocab_growth")
    assert plan.count("BroadcastExchange") >= 3
    assert re.search(r"windowspecdefinition\(decile", plan), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q119_fuzzy_decon_cross_side_only(spark):
    """Fuzzy decontamination: the candidate join keys on (band, bucket)
    and the verify join on the shingle key — never a cartesian; the
    pinned shingle table serves signatures, df-cap and verify from
    cache; everything JVM-side with partial aggregation."""
    plan = formatted_plan(spark, "q119_fuzzy_decontamination")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert_materialized(plan)
    assert plan.count("HashAggregate") >= 4


def test_q120_softdedup_window_is_cluster_bounded(spark):
    """Soft dedup: the only window partitions on the cluster key
    (bounded groups, never the whole corpus in one task)."""
    plan = formatted_plan(spark, "q120_softdedup_weights")
    assert re.search(r"windowspecdefinition\(group_id", plan), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q124_duplication_ratio_one_fp_shuffle(spark):
    """Duplication ratio: document frequencies combine map-side on the
    fingerprint key and join back on it; the per-doc aggregate is
    partial; no Python anywhere."""
    plan = formatted_plan(spark, "q124_duplication_ratio")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 4
    assert "CartesianProduct" not in plan


def test_q125_augmentation_is_narrow(spark):
    """Deterministic augmentation: a pure projection — the index-aware
    dropout runs in codegen with no joins and no shuffle beyond the
    fixture repartition."""
    plan = formatted_plan(spark, "q125_deterministic_augmentation")
    assert "Join" not in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q126_pagerank_linear_iteration_chain(spark):
    """PageRank: edges/out-degrees served from cache across the three
    iterations, contribution sums map-side combined, the corpus count a
    1-row broadcast (never a real cartesian), no Python."""
    plan = formatted_plan(spark, "q126_similarity_pagerank")
    assert_materialized(plan)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 4


def test_q127_raking_runs_on_the_cell_table(spark):
    """Raking: exactly one corpus-sized aggregate (the cell counts,
    map-side combined); every IPF step then joins |langs| x |sources|
    rows — all JVM-side."""
    plan = formatted_plan(spark, "q127_raking_mixture")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("HashAggregate") >= 2


def test_q129_sparse_knn_df_cap_and_pinned_postings(spark):
    """Sparse k-NN: the df-capped posting table serves the norm and dot
    branches from cache, dots aggregate map-side, no Python, no
    cartesian — the posting-list join keys on the term."""
    plan = formatted_plan(spark, "q129_sparse_tfidf_knn")
    assert_materialized(plan)  # r10: postings are an eager hold now
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 4


def test_q130_hard_negatives_broadcast_query_side(spark):
    """Hard negatives: the 5-query side broadcasts into the candidate
    scan (label-inequality join -> broadcast NLJ, never a shuffled
    cartesian)."""
    plan = formatted_plan(spark, "q130_hard_negative_mining")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q131_softdedup_sample_topk_no_global_sort(spark):
    """Dedup-corrected sample: the selection is a TakeOrderedAndProject
    over the propagation plan — never a full corpus sort; the only
    windows partition on bounded keys."""
    plan = formatted_plan(spark, "q131_softdedup_sample")
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q132_cms_cells_broadcast_back(spark):
    """Count-Min: the 1024-cell sketch aggregate is map-side combined
    and broadcast back for the min-estimates; the pinned hashed table
    serves both branches; top-k via TakeOrderedAndProject."""
    plan = formatted_plan(spark, "q132_countmin_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert_materialized(plan)  # r10: hashed table is an eager hold now
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q134_bm25_broadcast_stats_no_python(spark):
    """BM25: the one-row corpus-stats table reaches the scoring join as
    a broadcast (never a shuffled cartesian), posting joins are hash
    joins, and the whole ranker is JVM-side."""
    plan = formatted_plan(spark, "q134_bm25_topk")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q136_hll_single_register_aggregate(spark):
    """Deterministic HLL: the corpus collapses map-side into 64
    registers (partial aggregation) and the distinct item table is
    served from cache for both the register and exact-count branches."""
    plan = formatted_plan(spark, "q136_hll_distinct")
    assert plan.count("HashAggregate") >= 2
    assert "InMemoryTableScan" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q137_ladder_rungs_reuse_pinned_survivors(spark):
    """Doubling ladder: every rung's survivor set is pinned (the next
    rung's semi-join and the level union both read cache) and the span
    exchanges carry md5 keys, not raw window strings."""
    plan = formatted_plan(spark, "q137_dup_window_ladder")
    assert_materialized(plan)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q140_column_stats_broadcast_histogram_pass(spark):
    """ANALYZE stats: the 4-row stats table broadcasts back onto the
    unpivoted scan for bucketing; the unpivot is served from cache for
    the stats/histogram/MCV branches."""
    plan = formatted_plan(spark, "q140_column_stats")
    assert "BroadcastHashJoin" in plan
    assert_materialized(plan)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q141_incremental_mv_merges_partials(spark):
    """Incremental MV: both snapshot and delta aggregate map-side
    before the merge aggregate — three aggregation stages, no join of
    raw fact rows."""
    plan = formatted_plan(spark, "q141_incremental_mv")
    assert plan.count("HashAggregate") >= 4  # 2x partial+final, merge
    assert "Join" not in plan.replace("BroadcastHashJoin", "")  # no fact join
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q142_zorder_single_corpus_exchange(spark):
    """Z-order: min/max stats one-row broadcast; the curve position and
    file id are a narrow codegen map; the only corpus shuffle is the
    16-group envelope aggregate."""
    plan = formatted_plan(spark, "q142_zorder_layout")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final envelope


def test_q143_scd2_single_exchange(spark):
    """SCD2 history: the collapse filter, both windows, and the version
    numbering all ride ONE exchange on user_id."""
    df = QUERIES["q143_scd2_history"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_q144_islands_single_exchange(spark):
    """Interval islands: running-max window, island numbering, and both
    aggregates share the supplier-key exchange (window keys are a
    superset prefix)."""
    df = QUERIES["q144_interval_islands"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q163_unigram_dp_all_catalyst(spark):
    """Unigram tokenizer: the Viterbi DP + backtrack folds are Catalyst
    expressions (no Python anywhere), the piece table arrives by
    broadcast, and no sort-merge join sneaks into the vocab pipeline."""
    df = QUERIES["q163_unigram_tokenizer"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_q166_kmv_sketch_joins_broadcast(spark):
    """KMV set ops: every join over sketch-/language-sized tables is a
    broadcast — no shuffle join anywhere (the only corpus-scale work is
    the distinct-token aggregate and the per-side window top-k)."""
    df = QUERIES["q166_kmv_setops"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q167_perplexity_no_python_single_window(spark):
    """CCNet buckets: per-language LM + tertile cut stay JVM-side; the
    NTILE cut is the only window."""
    df = QUERIES["q167_perplexity_buckets"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q168_compaction_single_source_exchange(spark):
    """Compaction planner: the cumsum window and the bin aggregate ride
    the source-key exchanges — no joins, no Python, <=3 exchanges
    (window partition, group-by re-key, final order)."""
    df = QUERIES["q168_compaction_plan"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 3, plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q190_sample_fence_broadcast_back(spark):
    """Sample-fence gate: fences broadcast back to the corpus (the q85
    shape), all counters JVM-side."""
    df = QUERIES["q190_sample_fence_gate"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q192_cusum_no_join_on_raw_events(spark):
    """CUSUM: the gap-fill join runs on the (type, day) aggregate, the
    fold is a Catalyst aggregate expression — no Python, and the only
    corpus-scale exchange is the day aggregate's."""
    df = QUERIES["q192_cusum_changepoint"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # partial aggregation on the events scan side
    assert plan.count("HashAggregate") >= 2


def test_q194_attribution_partial_aggs_no_python(spark):
    """Attribution: ranks per conversion, channel aggregate map-side
    combined, everything JVM-side."""
    df = QUERIES["q194_touch_attribution"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_q195_readability_is_narrow(spark):
    """Readability: a zero-exchange codegen projection."""
    df = QUERIES["q195_readability"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only exchange is ensure_parallelism's repartition of the
    # single-file scan — no shuffle introduced by the computation itself
    assert plan.count("Exchange") == 1 and "REPARTITION_BY_NUM" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q197_bands_broadcast_fences_no_resort(spark):
    """Value bands: the outlier pass joins broadcast fences — no
    correlated subquery, no second sort of the events table."""
    df = QUERIES["q197_daily_value_bands"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q199_top_paths_topk_no_global_sort(spark):
    """Top paths: the LIMIT 20 is TakeOrderedAndProject over the trigram
    aggregate, both LAGs share one window sort, and the pinned trigram
    table keeps the share denominator from re-running the corpus window
    pass (its pruned projection would not canonicalize for reuse)."""
    df = QUERIES["q199_top_paths"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert_materialized(plan)  # r10: eager hold now
    # both Window mentions sit under InMemoryRelation plan text — the
    # pass executes once; no third copy appears anywhere
    assert plan.count("Window") <= 2, plan


def test_q200_correlation_pair_join_on_bounded_series(spark):
    """Volume correlation: the self-join runs on the gap-filled
    (type, day) series, never on raw events — the events scan feeds
    exactly one aggregate subtree (reused), and the join keys are the
    bounded day axis."""
    df = QUERIES["q200_volume_correlation"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_runtime_bloom_filter_join_injection(spark):
    """Spark's runtime row-level filtering (InjectRuntimeFilter): a
    selective dimension filter turns into a bloom filter applied on the
    fact side BEFORE its shuffle — the engine-level realization of
    q86's hand-built bloom prefilter. The application-side threshold
    defaults to 10GB because the rewrite only pays at scale; at test
    scale we drop it to 0 to pin the mechanism (at 100 TB the default
    triggers naturally). Results must be identical either way."""
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_thr = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    p = spark.read.parquet(f"{SF_DIR}/part.parquet").filter("p_brand = 'Brand#13'")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        assert (
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
            == "true"
        )
        j = li.join(p, li.l_partkey == p.p_partkey).groupBy("p_brand").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        filtered = {(r.p_brand, r["count"]) for r in j.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_thr,
        )
    plain = {
        (r.p_brand, r["count"])
        for r in li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .count()
        .collect()
    }
    assert filtered == plain


def test_q205_crossentropy_pins_tf_and_broadcasts_totals(spark):
    """Cross-entropy matrix: the (source, term) tf table is pinned (three
    consumers), per-source totals and the vocab size ride in as
    broadcasts, everything JVM-side."""
    df = QUERIES["q205_crossentropy_matrix"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert_materialized(plan)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q208_bakeoff_single_corpus_explode(spark):
    """Tokenizer bake-off: the corpus token explode feeds ONE pinned
    word census; both induction chains and the comparison run at
    vocabulary scale (every Generate past the first sits under an
    InMemoryRelation or explodes vocab-sized arrays)."""
    df = QUERIES["q208_tokenizer_bakeoff"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert_materialized(plan)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q216_acf_pins_deviation_series(spark):
    """ACF: the deviation series feeds numerator and denominator —
    pinned so the events aggregate runs once; the lag join is on the
    bounded day index."""
    df = QUERIES["q216_volume_acf"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert_materialized(plan)  # r10: eager hold now
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q221_sweep_no_stabbing_join(spark):
    """Concurrent sessions: the sweep must not join sessions against an
    hour axis — boundary deltas + one running sum only."""
    df = QUERIES["q221_concurrent_sessions"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q259_misra_gries_jvm_side_single_corpus_explode(spark):
    plan = formatted_plan(spark, "q259_misra_gries")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the corpus-facing work is one bigram explode feeding the
    # (bucket, gram) aggregate; the folds run on aggregated state.
    # Formatted mode prints each node twice (tree + details): 4 nodes.
    assert plan.count("Generate") <= 8  # bigram explode + summary explodes
    assert "CartesianProduct" not in plan


def test_q260_mmr_sweep_no_cartesian_beyond_broadcast(spark):
    plan = formatted_plan(spark, "q260_mmr_lambda_sweep")
    # candidate fetch is the only corpus-facing stage: query side
    # broadcast (BroadcastNestedLoopJoin), never CartesianProduct
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q261_skyline_local_prune_then_broadcast_global(spark):
    plan = formatted_plan(spark, "q261_skyline_3d")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # global pass runs on the tiny candidate union — broadcast side
    assert "BroadcastNestedLoopJoin" in plan


def test_q262_bm25f_posting_joins_no_python(spark):
    plan = formatted_plan(spark, "q262_bm25f_topk")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_aqe_skew_join_split(spark):
    """AQE's OptimizeSkewedJoin: a sort-merge join with one hot key gets
    its oversized shuffle partition split into parallel subtasks at
    runtime — the engine-native answer to the skew q78 handles by
    hand-salting aggregations. Thresholds default to 256MB because the
    split only pays at scale; dropped here to pin the mechanism (a
    100 TB hot key trips the defaults naturally). Results must be
    identical with and without the rewrite. NOTE the rule pattern-matches
    SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) only — an aggregate
    between the sort and the stage (e.g. a distinct-built dim) defeats
    it, which is itself worth pinning as documentation."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "100",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "800",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "800",
    }
    old = {k: spark.conf.get(k) for k in confs}
    hot = F.when(F.col("id") < 250, 249)
    d1 = spark.range(0, 1000, 1, 10).select(
        hot.when(F.col("id") >= 750, 1000).otherwise(F.col("id")).alias("key1"),
        F.col("id").alias("value1"),
    )
    d2 = spark.range(0, 1000, 1, 10).select(
        hot.otherwise(F.col("id")).alias("key2"), F.col("id").alias("value2")
    )
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
        j = d1.join(d2, F.col("key1") == F.col("key2"))
        n_skew = j.count()
        jj = d1.join(d2, F.col("key1") == F.col("key2"))
        jj.collect()
        plan = jj._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert n_skew == d1.join(d2, F.col("key1") == F.col("key2")).count()


def test_q263_entropy_partial_aggregated_no_joins(spark):
    plan = formatted_plan(spark, "q263_token_entropy")
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") >= 2  # map-side combine
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q281_template_dedup_is_q30_shaped(spark):
    plan = formatted_plan(spark, "q281_digit_normalized_dedup")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # partial agg on the fp key
    assert "Join" not in plan, plan


def test_q289_gopher_panel_is_narrow(spark):
    # one narrow scan: no joins, no aggregation shuffle (the exchanges
    # present are ensure_parallelism's repartition and the final
    # orderBy's range partitioning)
    plan = formatted_plan(spark, "q289_gopher_panel")
    assert "Join" not in plan, plan
    assert "HashAggregate" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q291_padding_waste_no_python_no_cartesian_blowup(spark):
    plan = formatted_plan(spark, "q291_padding_waste")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only cross joins carry one-row aggregates
    assert "CartesianProduct" not in plan


def test_q284_did_single_day_aggregate(spark):
    plan = formatted_plan(spark, "q284_diff_in_diff")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_q287_executes_native_recursion(spark):
    """Spark 4.1's recursive CTE support: the path census must run
    through the engine's UnionLoop iterative execution — not a
    hand-unrolled chain — so recursion depth is a runtime property,
    bounded by spark.sql.cteRecursionLevelLimit."""
    df = QUERIES["q287_recursive_path_census"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "UnionLoop" in plan, plan[:2000]


def test_q315_voptimal_dp_broadcast_levels_no_python(spark):
    """The DP levels are O(days^2) broadcast range joins — never a
    shuffled cartesian — and the whole plan stays JVM-side."""
    plan = formatted_plan(spark, "q315_voptimal_dp")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the p.i < c.i level joins


def test_q316_skyline_4d_local_prune_then_broadcast_global(spark):
    plan = formatted_plan(spark, "q316_skyline_4d")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # global pass on candidates


def test_q319_mann_kendall_pairwise_is_day_bounded(spark):
    """The O(days^2) sign join runs on the pinned gap-filled axis
    (bounded), not on raw events; no Python, no cartesian."""
    plan = formatted_plan(spark, "q319_mann_kendall")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert_materialized(plan)  # the filled axis (r10: eager hold now)


def test_q321_permutation_nulls_built_in_one_exploded_pass(spark):
    """The 32-replicate null distribution is one exploded corpus pass
    (a single Generate feeding the (b, pseudo-group) aggregate), and
    the obs x null comparison joins the bounded stats tables only."""
    import re

    plan = formatted_plan(spark, "q321_permutation_bh_fdr")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # exactly ONE distinct explode node: repeats in the printout are the
    # pinned null-stats InMemoryRelation's build plan, not extra passes
    gen_ids = set(re.findall(r"Generate \((\d+)\)", plan))
    # held null-stats (ADR-0007): the explode runs inside the checkpoint
    # job, so the final plan may show zero Generate nodes
    assert len(gen_ids) <= 1, gen_ids


def test_q323_dirichlet_ql_posting_joins_no_python(spark):
    plan = formatted_plan(spark, "q323_dirichlet_ql_topk")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_q324_isotonic_grid_is_broadcast_only(spark):
    """The O(bins^3) PAVA grid joins broadcast the bin table — the
    corpus-facing work is one narrow aggregate."""
    plan = formatted_plan(spark, "q324_isotonic_calibration")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_q326_rake_no_python_no_cartesian(spark):
    plan = formatted_plan(spark, "q326_rake_keywords")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_q329_ffd_single_aggregate_no_joins(spark):
    """Both packing folds run on the per-source sorted token arrays —
    one corpus aggregate, zero joins, zero Python."""
    plan = formatted_plan(spark, "q329_ffd_packing")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    # 3 exchange nodes (tree + details prints each twice):
    # ensure_parallelism's repartition, the groupBy, the final sort
    assert plan.count("Exchange") <= 6


def test_q330_returned_items_pushdown_and_topk(spark):
    """The returnflag filter must reach the lineitem scan and the
    top-20 must be TakeOrderedAndProject, not a global sort."""
    plan = formatted_plan(spark, "q330_returned_item_revenue")
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan or (
        "EqualTo(l_returnflag,R)" in plan
    )


def test_q337_disjunctive_predicate_partial_pushdown(spark):
    """The OR-of-ANDs predicate: the size/brand legs are part-side, the
    quantity legs lineitem-side — Catalyst should still push an Or
    filter to at least one scan rather than evaluating everything
    post-join."""
    plan = formatted_plan(spark, "q337_disjunctive_revenue")
    assert "CartesianProduct" not in plan
    assert "PushedFilters" in plan


def test_q349_percolation_single_shingle_join(spark):
    """The percolation sweep must compute ONE df-capped shingle
    self-join feeding all thresholds (the pinned base), stay JVM-side,
    and never degrade to a cartesian."""
    import re

    plan = formatted_plan(spark, "q349_threshold_percolation")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_q353_keeper_quality_no_python_no_cartesian(spark):
    plan = formatted_plan(spark, "q353_keeper_quality_audit")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_q356_posting_compression_single_explode(spark):
    """One distinct (doc, term) explode feeds the gap window and both
    aggregates — no Python, no joins beyond none at all."""
    import re

    plan = formatted_plan(spark, "q356_posting_compression")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    gen_ids = set(re.findall(r"Generate \((\d+)\)", plan))
    assert len(gen_ids) == 1, gen_ids
    assert "Join" not in plan


def test_q358_next_event_model_joins_broadcast(spark):
    """The learned transition table and the baseline are bounded
    broadcasts into the test pairs — no shuffle join on the model."""
    plan = formatted_plan(spark, "q358_next_event_eval")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q360_bbit_no_python_no_cartesian(spark):
    plan = formatted_plan(spark, "q360_bbit_minhash")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_q362_executes_native_variant(spark):
    """The VARIANT pin: props must flow through parse_json ->
    variant_get in the physical plan (the binary VARIANT execution
    path), not a from_json struct fallback."""
    plan = formatted_plan(spark, "q362_variant_json_stats")
    low = plan.lower()
    assert "variant" in low, plan[:2000]
    assert "from_json" not in low


def test_q339_linear_cka_join_free_gram(spark):
    """VERDICT r07 #3 gate: the Gram moments must come from the
    per-vector outer-product map (chained generates + one partial-
    aggregated groupBy), NOT an exploded-dims self-join — the only
    joins allowed are the broadcasts of the 64-row marginals and the
    1-row count; nothing may shuffle n x d join inputs."""
    plan = formatted_plan(spark, "q339_linear_cka")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # two chained Generate stages (upper triangle) + the marginal explode
    assert plan.count("Generate") >= 2


def test_q74_funnel_single_pass_no_joins(spark):
    """r9 re-plan gate: the ordered funnel must be ONE windowed pass
    over events — no joins at all (the old shape re-scanned events per
    stage and shuffled three groupBy+join chains), exactly one shuffle
    of the event rows (the window partitioning, which the follow-up
    groupBy(user_id) must reuse), the event-type disjunction pushed to
    the parquet scan, and no Python anywhere."""
    plan = formatted_plan(spark, "q74_event_funnel")
    for join in ["SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"]:
        assert join not in plan, f"{join} in q74 plan"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan
    # exactly one row-distributing exchange (hashpartitioning on
    # user_id); the final count aggregate's single-partition exchange
    # is the only other one allowed
    hashparts = re.findall(r"hashpartitioning\(user_id", plan)
    assert len(hashparts) == 1, plan[:3000]
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "event_type" in pushed
