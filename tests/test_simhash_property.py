"""Property test for the SimHash banding pigeonhole guarantee.

simhash_candidate_pairs claims: with ``max_hamming = bands - 1`` (the
defaults: 32 bits, 4 bands, Hamming <= 3), banding loses NOTHING versus
all-pairs — a pair within the Hamming budget differs in at most
bands - 1 slices, so it must agree exactly on at least one slice and is
found through that bucket. This pins the claim against a brute-force
all-pairs Hamming computation over randomized corpora (cap disabled),
both directions:

- completeness (the pigeonhole): every pair with hamming <= max_hamming
  is emitted;
- soundness (the verify filter): every emitted pair has
  hamming <= max_hamming, with the distance reported exactly.

Randomized docs draw from a SMALL word pool so near-misses actually
occur (uniform random text almost never lands within Hamming 3 of
another doc at 32 bits).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from frontmatter_mcp_spark.operators.dedup import simhash, simhash_candidate_pairs

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

corpora = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=8).map(" ".join),
    min_size=2,
    max_size=10,
)


def _brute_pairs(sigs: dict[int, str], max_hamming: int) -> dict[tuple, int]:
    out = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = sum(x != y for x, y in zip(sigs[a], sigs[b]))
            if d <= max_hamming:
                out[(a, b)] = d
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None)
@given(texts=corpora)
def test_banding_pigeonhole_no_false_negatives(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r.doc_id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    expected = _brute_pairs(sigs, max_hamming=3)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_candidate_pairs(
            df, "doc_id", "text", max_bucket=10**9
        ).collect()
    }
    # identical texts share a doc-level signature; candidate pairs are
    # over doc ids, so identical-text id pairs must appear at distance 0
    assert got == expected
