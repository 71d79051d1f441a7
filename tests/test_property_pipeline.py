"""Property-based tests (hypothesis) for the training-pipeline operators.

Pure-Python reimplementations of each operator's contract are checked
against the Catalyst expressions on arbitrary inputs — same
cross-validation pattern as test_property_mutations.py.
"""

from __future__ import annotations

import json
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

words = st.text(alphabet="abcd", min_size=1, max_size=3)
texts = st.lists(words, min_size=0, max_size=12).map(" ".join)
vectors = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    min_size=2,
    max_size=6,
)


@given(st.lists(texts, min_size=1, max_size=6))
@settings(max_examples=25, deadline=None)
def test_normalize_matches_python(spark, docs):
    from frontmatter_mcp_spark.operators.text import NORMALIZE_STOPWORDS, normalize_text

    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], ["i", "t"])
    got = {
        r.i: r.norm
        for r in df.select("i", normalize_text(F.col("t")).alias("norm")).collect()
    }
    for i, t in enumerate(docs):
        expect = " ".join(
            w for w in t.lower().split() if w not in NORMALIZE_STOPWORDS
        )
        assert got[i] == expect


@given(st.lists(texts, min_size=2, max_size=6))
@settings(max_examples=15, deadline=None)
def test_boilerplate_spans_match_python(spark, docs):
    from frontmatter_mcp_spark.operators.dedup import boilerplate_spans

    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], ["doc_id", "text"])
    got = {
        r.span: (r.n_docs, r.first_doc_id)
        for r in boilerplate_spans(df, "doc_id", "text", span_n=2, min_docs=2).collect()
    }
    from collections import defaultdict

    span_docs = defaultdict(set)
    for i, t in enumerate(docs):
        w = t.split()
        for j in range(len(w) - 1):
            span_docs[" ".join(w[j : j + 2])].add(i)
    expect = {
        s: (len(ids), min(ids)) for s, ids in span_docs.items() if len(ids) >= 2
    }
    assert got == expect


@given(st.lists(vectors, min_size=2, max_size=5).filter(lambda vs: len({len(v) for v in vs}) == 1))
@settings(max_examples=15, deadline=None, derandomize=True)
def test_quantize_error_bounded_by_step(spark, vecs):
    from frontmatter_mcp_spark.operators.quantize import int8_quantize

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    rows = int8_quantize(df, "vec_id", "embedding").collect()
    dims = len(vecs[0])
    mins = [min(v[d] for v in vecs) for d in range(dims)]
    maxs = [max(v[d] for v in vecs) for d in range(dims)]
    # per-dim error < one step exactly; floating floor near a boundary can
    # cost a second step, so bound at 2 steps per dim
    bound = sum((2 * (mx - mn) / 255) ** 2 for mn, mx in zip(mins, maxs)) + 1e-9
    for r in rows:
        assert r.n_dims == dims
        assert 0.0 <= r.recon_err <= bound


@given(st.lists(texts, min_size=1, max_size=5), st.integers(min_value=0, max_value=4))
@settings(max_examples=10, deadline=None)
def test_decontaminate_flags_subset_of_train(spark, docs, n_test):
    from frontmatter_mcp_spark.operators.dedup import decontaminate

    rows = [
        (i, "test" if i < n_test else "train", t) for i, t in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "split", "text"])
    flagged = decontaminate(df, "doc_id", "text", "split", span_n=2).collect()
    train_ids = {i for i, s, _ in rows if s == "train"}
    for r in flagged:
        assert r.doc_id in train_ids and r.n_shared_spans >= 1
