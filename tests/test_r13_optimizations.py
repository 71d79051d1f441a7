"""Focused tests for the r13 optimization-round changes.

Every optimization must keep query results bit-identical; each change
here pins its equivalence (or its concurrency invariant) independently
of the full oracle sweep.
"""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import functions as F

from frontmatter_mcp_spark.operators import holds
from frontmatter_mcp_spark.workload.dp_dedup import (
    _dup_span_members,
    _dup_span_members_1x,
)


# ---------------------------------------------------------------------------
# 1. q137/q164 skew guard: the row-based dup-span shape (dedup + window
#    count, no per-span doc array in any aggregation buffer) must equal
#    the r11 two-pass reference (distinct -> count -> join back) on a
#    synthetic hot span corpus.
# ---------------------------------------------------------------------------
@pytest.fixture()
def hot_span_corpus(spark):
    # one boilerplate span ("copy right footer gnu") shared by MANY docs
    # — the 100 TB skew shape — plus a within-doc repeat (doc 1) for the
    # distinct-per-doc rule and unique docs that must NOT vote
    n_hot = 500
    rows = [(i, f"unique{i} copy right footer gnu tail{i}") for i in range(n_hot)]
    rows += [
        (1000, "a b c d x a b c d"),  # within-doc repeated span
        (1001, "z a b c d y"),
        (1002, "solo text only here never shared"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(toks, n):
    return (
        toks.filter(F.size("w") >= n)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("w") - (n - 1))).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            F.md5(F.array_join(F.slice("w", F.col("i"), n), " ")).alias("sp"),
        )
    )


@pytest.mark.parametrize("n", [2, 4])
def test_dup_span_members_equals_two_pass(hot_span_corpus, n):
    toks = hot_span_corpus.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+", -1).alias("w")
    )
    spans = _spans(toks, n)
    # r11 two-pass reference
    spans_d = spans.distinct()
    dup_spans = (
        spans_d.groupBy("sp").agg(F.count("*").alias("c")).filter(F.col("c") >= 2)
    )
    ref_docs = {
        r.doc_id
        for r in spans_d.join(dup_spans, "sp").select("doc_id").distinct().collect()
    }
    ref_n_dup = dup_spans.count()
    # r13 row-based skew-guarded shapes (q137's two-exchange form and
    # q164's single-exchange form must BOTH match the reference)
    members = _dup_span_members(spans)
    got_docs = {r.doc_id for r in members.select("doc_id").distinct().collect()}
    got_n_dup = members.select("sp").distinct().count()
    assert got_docs == ref_docs
    assert got_n_dup == ref_n_dup
    m1x = _dup_span_members_1x(spans)
    got_docs_1x = {r.doc_id for r in m1x.select("doc_id").distinct().collect()}
    got_n_dup_1x = m1x.filter("is_leader").count()
    assert got_docs_1x == ref_docs
    assert got_n_dup_1x == ref_n_dup


def test_dup_span_members_plan_has_no_collect_set(hot_span_corpus):
    # the guard's whole point: a hot span must never materialize one
    # doc array in an aggregation buffer — member docs stay rows
    toks = hot_span_corpus.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+", -1).alias("w")
    )
    for shape in (_dup_span_members, _dup_span_members_1x):
        plan = shape(_spans(toks, 4))._jdf.queryExecution().toString()
        assert "collect_set" not in plan
        assert "windowspecdefinition" in plan.lower() or "Window" in plan


# ---------------------------------------------------------------------------
# 2. two-phase total-order operator (operators/total_order.py): every
#    derived quantity must be bit-identical to the single-partition
#    window reference, including ties, NULL frames, and NTILE remainder
#    buckets.
# ---------------------------------------------------------------------------
@pytest.fixture()
def ordered_values(spark):
    # ties on v (x % 17), unique tiebreaker id, negatives, clusters
    rows = [(i, (i * 37) % 17 - 5, float((i * 13) % 101)) for i in range(500)]
    return spark.createDataFrame(rows, "id long, v long, m double")


def test_two_phase_row_number_matches_window(ordered_values):
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.total_order import (
        with_global_row_number,
    )

    ref = ordered_values.select(
        "id", F.row_number().over(W.orderBy("v", "id")).cast("long").alias("rn")
    )
    got = with_global_row_number(
        ordered_values, [("v", True), ("id", True)], out="rn", parts=7
    ).select("id", "rn")
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0


def test_two_phase_row_number_desc_matches_window(ordered_values):
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.total_order import (
        with_global_row_number,
    )

    ref = ordered_values.select(
        "id",
        F.row_number()
        .over(W.orderBy(F.col("m").desc(), "id"))
        .cast("long")
        .alias("rn"),
    )
    got = with_global_row_number(
        ordered_values, [("m", False), ("id", True)], out="rn", parts=5
    ).select("id", "rn")
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0


def test_two_phase_rank_ties_matches_window(ordered_values):
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.total_order import (
        with_global_rank_ties,
    )

    ref = ordered_values.select(
        "id",
        F.rank().over(W.orderBy("v")).cast("long").alias("rk"),
        F.count("*").over(W.partitionBy("v")).cast("long").alias("nt"),
    )
    got = with_global_rank_ties(ordered_values, "v", parts=6).select(
        "id", "rk", "nt"
    )
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0


@pytest.mark.parametrize("total", [1, 3, 4, 5, 7, 23, 500])
def test_ntile_formula_matches_spark_ntile(spark, total):
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.total_order import ntile_from_rn

    df = spark.range(total).select(F.col("id"))
    for n in (3, 5, 10):
        ref = df.select(
            "id", F.ntile(n).over(W.orderBy("id")).cast("int").alias("b")
        )
        got = df.select(
            "id",
            ntile_from_rn(
                F.col("id") + 1, F.lit(total).cast("long"), n
            ).alias("b"),
        )
        assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0


@pytest.mark.parametrize("include_current", [True, False])
def test_two_phase_cumsum_matches_window(ordered_values, include_current):
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.total_order import with_global_cumagg

    end = W.currentRow if include_current else -1
    ref = ordered_values.select(
        "id",
        F.sum("m")
        .over(W.orderBy("v", "id").rowsBetween(W.unboundedPreceding, end))
        .alias("c"),
    )
    got = with_global_cumagg(
        ordered_values,
        [("v", True), ("id", True)],
        F.col("m"),
        agg="sum",
        out="c",
        include_current=include_current,
        parts=9,
    ).select("id", "c")
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0


def test_two_phase_cummax_exclusive_matches_window(ordered_values):
    # q236's shape: running MAX over everything STRICTLY BEFORE me —
    # the globally-first row's frame is empty and must stay NULL
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.total_order import with_global_cumagg

    ref = ordered_values.select(
        "id",
        F.max("m")
        .over(W.orderBy("v", "id").rowsBetween(W.unboundedPreceding, -1))
        .alias("c"),
    )
    got = with_global_cumagg(
        ordered_values,
        [("v", True), ("id", True)],
        F.col("m"),
        agg="max",
        out="c",
        include_current=False,
        parts=9,
    ).select("id", "c")
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0
    assert got.filter("c is null").count() == 1


def test_two_phase_custom_bucket_md5_prefix(spark):
    # md5-string order key with a hex-prefix bucket (the q171/q228
    # class): prefix order IS key order, so the bucket is monotone
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.total_order import (
        with_global_row_number,
    )

    df = spark.range(400).select(
        "id", F.md5(F.col("id").cast("string")).alias("k")
    )
    ref = df.select(
        "id", F.row_number().over(W.orderBy("k", "id")).cast("long").alias("rn")
    )
    got = with_global_row_number(
        df,
        [("k", True), ("id", True)],
        out="rn",
        bucket=F.conv(F.substring("k", 1, 2), 16, 10).cast("long"),
    ).select("id", "rn")
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0


def test_two_phase_plan_has_no_single_partition_window(ordered_values):
    from frontmatter_mcp_spark.operators.total_order import (
        with_global_rank_ties,
    )

    out = with_global_rank_ties(ordered_values, "v", parts=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every windowspecdefinition must carry a partition column; the
    # offsets window runs over <= parts rows (bounded, not corpus)
    import re

    for line in plan.split("\n"):
        if "windowspecdefinition(" not in line:
            continue
        for m in re.finditer(r"windowspecdefinition\(([^)]*?)specifiedwindowframe", line):
            first = m.group(1).split(",")[0].strip()
            if re.match(r"^[a-zA-Z_0-9#]+ (ASC|DESC)", first):
                assert "__bkt" in m.group(1) or "__bc" in line or "__bt" in line, line


def test_release_held_takes_lock_against_concurrent_builds(spark):
    """release_held pops under _HELD_LOCK, so a release racing a
    concurrent hold never observes the list mid-mutation and never
    loses a just-appended entry."""
    # Baseline BEFORE the churn: the session is shared across the whole
    # test run, so an earlier test's persisted RDD (a pin, a cached
    # fixture) may legitimately be present — assert we add nothing to
    # it, not that the session is globally empty.
    baseline = holds._persistent_ids(spark)
    stop = threading.Event()
    errs: list[BaseException] = []

    def builder() -> None:
        try:
            while not stop.is_set():
                holds.hold(spark.range(10), eager=True)
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    t = threading.Thread(target=builder)
    t.start()
    try:
        for _ in range(20):
            holds.release_held()
            time.sleep(0.01)
    finally:
        stop.set()
        t.join()
    holds.release_held()
    assert not errs
    assert not holds._HELD
    # nothing WE persisted is left: every appended entry was released
    assert holds._persistent_ids(spark) - baseline == set()


def test_overlap_max_concurrency_bounds_fanout(spark):
    """max_concurrency caps in-flight thunks; results stay in order."""
    running = 0
    peak = 0
    lock = threading.Lock()

    def thunk(i):
        def inner():
            nonlocal running, peak
            with lock:
                running += 1
                peak = max(peak, running)
            time.sleep(0.05)
            with lock:
                running -= 1
            return i

        return inner

    out = holds.overlap(*[thunk(i) for i in range(12)], max_concurrency=3)
    assert out == list(range(12))
    assert peak <= 3


def test_overlap_unbounded_default_unchanged(spark):
    out = holds.overlap(*[(lambda i=i: i * i) for i in range(5)])
    assert out == [0, 1, 4, 9, 16]
