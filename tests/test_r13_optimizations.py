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


def test_release_held_takes_lock_against_concurrent_builds(spark):
    """release_held pops under _HELD_LOCK, so a release racing a
    concurrent hold never observes the list mid-mutation and never
    loses a just-appended entry."""
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
    # nothing left persisted either: every appended entry was released
    assert holds._persistent_ids(spark) == set()


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
