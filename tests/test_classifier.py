"""Unit tests for operators.classifier (trained hashed linear model)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from frontmatter_mcp_spark.operators import classifier as clf

_HEX = "0123456789abcdef"


def _py_bucket(tok: str, buckets: int) -> int:
    h = hashlib.md5(tok.encode()).hexdigest()
    val = 0
    for i in range(7):
        val = val * 16 + _HEX.index(h[i])
    return val % buckets


def _py_model(docs: list[tuple[int, str, int]], buckets: int, iters: int):
    """Pure-Python replica of hashed_linear_scores (same integer math)."""
    S, half = clf.SCALE, clf.SCALE // 2

    def fdiv(a: int, m: int) -> int:
        return (a - ((a % m) + m) % m) // m

    tf: dict[tuple[int, int], int] = {}
    for doc_id, text, _y in docs:
        for t in text.strip().lower().split():
            if t:
                key = (doc_id, _py_bucket(t, buckets))
                tf[key] = tf.get(key, 0) + 1
    y = {doc_id: yy for doc_id, _t, yy in docs}
    d = len(docs) * clf.LRINV

    w: dict[int, int] = {}
    seen_buckets = {b for (_doc, b) in tf}
    for it in range(iters):
        if it == 0:
            r = {doc: half - S * y[doc] for doc, _t, _y in docs}
        else:
            z = {doc: 0 for doc, _t, _y in docs}
            for (doc, b), c in tf.items():
                z[doc] += w.get(b, 0) * c
            r = {
                doc: max(0, min(S, half + fdiv(z[doc], clf.PDIV))) - S * y[doc]
                for doc in z
            }
        g = {b: 0 for b in seen_buckets}
        for (doc, b), c in tf.items():
            g[b] += r[doc] * c
        for b in seen_buckets:
            w[b] = w.get(b, 0) - fdiv(g[b], d)

    out = {}
    for doc, _t, yy in docs:
        z = sum(w.get(b, 0) * c for (dd, b), c in tf.items() if dd == doc)
        out[doc] = (yy, z, max(0, min(S, half + fdiv(z, clf.PDIV))) / S)
    return out


def _docs_fixture() -> list[tuple[int, str, int]]:
    pos_words = "alpha beta gamma delta"
    neg_words = "omega sigma theta kappa"
    docs = []
    for i in range(20):
        docs.append((i, f"{pos_words} {pos_words} common{i % 3}", 1))
        docs.append((100 + i, f"{neg_words} {neg_words} common{i % 3}", 0))
    return docs


def test_classifier_separates_and_matches_reference(spark):
    docs = _docs_fixture()
    df = spark.createDataFrame(docs, "doc_id long, text string, y int")
    out = clf.hashed_linear_scores(
        df, "doc_id", "text", F.col("y"), buckets=32, iters=2
    ).collect()
    got = {r.doc_id: (r.label, r.score_fx, r.prob) for r in out}

    ref = _py_model(docs, buckets=32, iters=2)
    assert got == ref  # bit-identical to the integer-math reference

    pos = [r for r in out if r.label == 1]
    neg = [r for r in out if r.label == 0]
    # the trained model separates the two vocabularies
    assert min(p.score_fx for p in pos) > max(n.score_fx for n in neg)
    assert min(p.prob for p in pos) > max(n.prob for n in neg)


def test_classifier_empty_docs_score_neutral(spark):
    df = spark.createDataFrame(
        [(1, "alpha alpha", 1), (2, "omega omega", 0), (3, "   ", 0)],
        "doc_id long, text string, y int",
    )
    out = {
        r.doc_id: r
        for r in clf.hashed_linear_scores(
            df, "doc_id", "text", F.col("y"), buckets=16, iters=2
        ).collect()
    }
    assert out[3].score_fx == 0
    assert out[3].prob == 0.5
    assert len(out) == 3
