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


def _py_tokens(text: str) -> list[str]:
    return [t for t in text.lower().strip().split() if t]


def _py_bucket(s: str, buckets: int) -> int:
    import hashlib

    h = hashlib.md5(s.encode()).hexdigest()
    val = 0
    for ch in h[:7]:
        val = val * 16 + "0123456789abcdef".index(ch)
    return val % buckets


@given(st.lists(st.tuples(texts, st.booleans()), min_size=1, max_size=6))
@settings(max_examples=20, deadline=None)
def test_dsir_weights_match_python(spark, docs):
    """Cross-validate the whole DSIR weight pipeline (hashed features,
    smoothed log-ratios, per-doc sums) against a pure-Python model."""
    from collections import Counter

    from frontmatter_mcp_spark.operators.text import dsir_weights

    B = 64
    rows = [(i, t, flag) for i, (t, flag) in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_t"])
    got = {
        r["doc_id"]: (r["n_features"], r["dsir_weight"])
        for r in dsir_weights(df, "doc_id", "text", F.col("is_t"), buckets=B).collect()
    }

    def feats(text):
        ws = _py_tokens(text)
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    raw, tgt = Counter(), Counter()
    for _, t, flag in rows:
        for f in feats(t):
            b = _py_bucket(f, B)
            raw[b] += 1
            if flag:
                tgt[b] += 1
    R, T = sum(raw.values()), sum(tgt.values())
    for i, t, _ in rows:
        fs = feats(t)
        if not fs:
            assert got[i] == (0, None)
            continue
        w = sum(
            math.log(tgt[_py_bucket(f, B)] + 1)
            - math.log(float(T + B))
            - math.log(raw[_py_bucket(f, B)] + 1)
            + math.log(float(R + B))
            for f in fs
        )
        assert got[i][0] == len(fs)
        assert got[i][1] == pytest.approx(round(w, 6), abs=2e-6)


@given(st.lists(texts, min_size=1, max_size=6))
@settings(max_examples=20, deadline=None)
def test_bigram_nll_matches_python(spark, docs):
    """Cross-validate the interpolated bigram LM against a pure-Python
    model: first token by unigram, token i>=2 by the 0.5/0.5 mix."""
    from collections import Counter

    from frontmatter_mcp_spark.operators.text import bigram_nll

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll_mean"])
        for r in bigram_nll(df, "doc_id", "text").collect()
    }
    c1, c2 = Counter(), Counter()
    for _, t in rows:
        ws = _py_tokens(t)
        c1.update(ws)
        c2.update(zip(ws, ws[1:]))
    N = sum(c1.values())
    for i, t in rows:
        ws = _py_tokens(t)
        if not ws:
            assert got[i] == (0, None)
            continue
        terms = [-math.log(c1[ws[0]] / N)]
        for a, b in zip(ws, ws[1:]):
            p = 0.5 * (c2[(a, b)] / c1[a]) + 0.5 * (c1[b] / N)
            terms.append(-math.log(p))
        assert got[i][0] == len(ws)
        assert got[i][1] == pytest.approx(round(sum(terms) / len(ws), 6), abs=2e-6)


def _py_bpe_rounds(word_counts: dict[str, int], iters: int):
    """Pure-Python replica of tokenize._bpe_loop (two-pass replace)."""
    seqs = {w: " ".join(w) for w in word_counts}
    merges = []
    for _step in range(iters):
        counts: dict[str, int] = {}
        for w, s in seqs.items():
            sym = s.split(" ")
            for a, b in zip(sym, sym[1:]):
                counts[f"{a} {b}"] = counts.get(f"{a} {b}", 0) + word_counts[w]
        if not counts:
            break
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        pr, c = top
        pat, rep = f" {pr} ", f" {pr.replace(' ', '')} "
        for w in seqs:
            s = f" {seqs[w]} ".replace(pat, rep).replace(pat, rep)
            seqs[w] = s.strip()
        n_symbols = len({t for s in seqs.values() for t in s.split(" ")})
        merges.append((pr, pr.replace(" ", ""), c, n_symbols))
    return merges, seqs


@given(
    st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=5),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=15, deadline=None)
def test_bpe_loop_matches_python(spark, word_counts):
    from frontmatter_mcp_spark.operators.tokenize import (
        bpe_merge_steps,
        bpe_segment_vocab,
    )

    iters = 2
    ref_merges, ref_seqs = _py_bpe_rounds(word_counts, iters)
    if len(ref_merges) < iters:
        return  # degenerate vocab (no pairs): loop contract not exercised
    df = spark.createDataFrame(list(word_counts.items()), "w string, wc long")
    got = sorted(
        bpe_merge_steps(df, "w", "wc", iters=iters).collect(), key=lambda r: r.step
    )
    assert [(r.pair, r.merged, r.pair_count, r.n_symbols) for r in got] == ref_merges
    seg = {r.w: r.seq for r in bpe_segment_vocab(df, "w", "wc", iters=iters).collect()}
    assert seg == ref_seqs


@given(
    st.lists(
        st.tuples(
            st.lists(st.text(alphabet="abcX", min_size=1, max_size=4), max_size=6).map(
                " ".join
            ),
            st.booleans(),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=15, deadline=None)
def test_classifier_matches_python_model(spark, docs):
    from test_classifier import _py_model

    from frontmatter_mcp_spark.operators.classifier import hashed_linear_scores

    fixture = [(i, text, int(y)) for i, (text, y) in enumerate(docs)]
    df = spark.createDataFrame(fixture, "doc_id long, text string, y int")
    got = {
        r.doc_id: (r.label, r.score_fx, r.prob)
        for r in hashed_linear_scores(
            df, "doc_id", "text", F.col("y"), buckets=16, iters=2
        ).collect()
    }
    assert got == _py_model(
        [(i, t.lower(), y) for i, t, y in fixture], buckets=16, iters=2
    )
