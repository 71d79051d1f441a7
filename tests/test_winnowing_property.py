"""Property test for the winnowing MATCH guarantee (Schleimer, Wilkerson,
Aiken 2003, "Winnowing: Local Algorithms for Document Fingerprinting").

q264 already asserts the per-doc coverage half (every window of W
consecutive k-grams contributes a fingerprint — its guarantee_ok flag is
oracle-checked). This test pins the cross-document half under the pair
query's documented policy (pairs must share >= _WIN_PAIR_MIN = 2
fingerprints, hub hashes df-capped):

A shared token run of length >= 2W + K - 1 with DISTINCT tokens contains
at least two non-overlapping windows that lie fully inside the run on
both documents. A fully-interior window sees the identical k-gram hash
sequence on both sides and the tie-break key (h*256 + distance from
window end) is window-relative, so both documents select the SAME
k-gram from it; two disjoint windows over distinct tokens select two
distinct k-grams. Hence the planted pair shares >= 2 fingerprints and
MUST be emitted.

Soundness is structural: fingerprints are k-gram hashes, so every
emitted pair must share at least one exact k-gram.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings, strategies as st

from frontmatter_mcp_spark.workload.dp_dedup import (
    _WIN_K,
    _WIN_W,
    _winnow_pairs_df,
)

POOL = [
    "red", "blue", "green", "gold", "iron", "salt", "wolf", "moon",
    "star", "leaf", "sand", "rain", "fire", "snow", "rock", "wave",
    "dust", "corn", "mist", "pine",
]
RUN_LEN = 2 * _WIN_W + _WIN_K - 1  # 11: two disjoint fully-interior windows


def _kgrams(text: str) -> set[str]:
    toks = text.lower().split()
    return {
        " ".join(toks[i : i + _WIN_K]) for i in range(len(toks) - _WIN_K + 1)
    }


@st.composite
def corpus_with_planted_pair(draw):
    # the planted run uses DISTINCT tokens so its k-grams are distinct
    # (identical-token runs collapse to ONE fingerprint by design and
    # are exact-dup territory, outside this guarantee)
    run = draw(
        st.lists(
            st.sampled_from(POOL), min_size=RUN_LEN, max_size=RUN_LEN + 3,
            unique=True,
        )
    )
    filler = st.lists(st.sampled_from(POOL), min_size=0, max_size=6)
    docs = [
        " ".join(draw(filler) + run + draw(filler)),
        " ".join(draw(filler) + run + draw(filler)),
    ]
    docs += draw(
        st.lists(
            st.lists(st.sampled_from(POOL), min_size=RUN_LEN, max_size=RUN_LEN + 8)
            .map(" ".join),
            min_size=0,
            max_size=3,
        )
    )
    return docs


@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None)
@given(texts=corpus_with_planted_pair())
def test_planted_shared_run_is_always_paired(spark, texts, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("winnow_sf")
    rows = [(i, t, "en", "synth", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp), "documents.parquet")
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in _winnow_pairs_df(spark, str(tmp)).select("id_a", "id_b").collect()
    }
    # completeness under the >= 2 shared fingerprints policy
    assert (0, 1) in pairs, (texts[0], texts[1], pairs)
    # soundness: every emitted pair shares at least one exact k-gram
    grams = {i: _kgrams(t) for i, t in enumerate(texts)}
    for a, b in pairs:
        assert grams[a] & grams[b], (a, b, texts[a], texts[b])
