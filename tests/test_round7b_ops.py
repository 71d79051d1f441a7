"""Property tests for the later round-7 operators: CDC edit locality,
Self-BLEU against a brute-force replica, weighted Jaccard against
set arithmetic, and the native-recursion path census against a Python
path DP."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
_HEX = "0123456789abcdef"


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip().lower()) if t]


def _hex48(s: str) -> int:
    h = hashlib.md5(s.encode()).hexdigest()
    v = 0
    for ch in h[:12]:
        v = v * 16 + _HEX.index(ch)
    return v


def _cdc_chunks(words: list[str], d: int = 32) -> list[list[str]]:
    chunks: list[list[str]] = [[]]
    for i, t in enumerate(words, start=1):
        if i >= 2 and _hex48(words[i - 2] + " " + t) % d == 0:
            chunks.append([])
        chunks[-1].append(t)
    return chunks


def test_cdc_boundaries_are_edit_local():
    """The content-defined-chunking claim: inserting one token moves
    only the boundaries in its neighborhood — chunks before and after
    the edit region are byte-identical (q79's fixed windows shift
    every downstream chunk instead)."""
    words = [f"w{_hex48(str(i)) % 97}" for i in range(400)]
    base = _cdc_chunks(words)
    edited = _cdc_chunks(words[:200] + ["INSERTED"] + words[200:])
    base_fps = {" ".join(c) for c in base}
    edited_fps = {" ".join(c) for c in edited}
    # every chunk fully before or after the edit neighborhood survives
    changed = base_fps.symmetric_difference(edited_fps)
    # the edit can touch at most the chunk containing position 200 on
    # each side (plus its successor if the boundary itself moved)
    assert len(changed) <= 6, changed
    # and most chunks are shared
    assert len(base_fps & edited_fps) >= len(base) - 3


def test_cdc_query_chunks_reassemble(spark):
    from frontmatter_mcp_spark.workload.datapipe import (
        q267_content_defined_chunking,
    )

    rows = {r.doc_id: r for r in
            q267_content_defined_chunking(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    for d in docs:
        w = _tokens(d.text)
        if not w:
            continue
        chunks = _cdc_chunks(w)
        r = rows[d.doc_id]
        assert r.n_tokens == len(w), d.doc_id
        assert r.n_chunks == len(chunks), d.doc_id
        assert r.max_chunk_tokens == max(len(c) for c in chunks), d.doc_id


def test_self_bleu_matches_bruteforce(spark):
    from frontmatter_mcp_spark.workload.datapipe import (
        _SB_SAMPLE,
        q272_self_bleu_diversity,
    )

    def bucket(key, buckets=1000):
        h = hashlib.md5(str(key).encode()).hexdigest()
        v = 0
        for ch in h[:7]:
            v = v * 16 + _HEX.index(ch)
        return v % buckets

    out = {r.doc_id: r for r in q272_self_bleu_diversity(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    sample = [(d.doc_id, _tokens(d.text)) for d in docs
              if bucket(d.doc_id) < _SB_SAMPLE]
    assert set(out) == {i for i, _ in sample}

    def grams(w, n):
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    for doc_id, w in sample:
        for n, (pcol,) in [(1, ("p1",)), (2, ("p2",))]:
            mine: dict[str, int] = {}
            for g in grams(w, n):
                mine[g] = mine.get(g, 0) + 1
            matched = 0
            for g, c in mine.items():
                best_other = 0
                for other_id, ow in sample:
                    if other_id == doc_id:
                        continue
                    best_other = max(best_other, grams(ow, n).count(g))
                matched += min(c, best_other)
            total = sum(mine.values())
            expect = round(matched / total, 6) if total else 0.0
            got = getattr(out[doc_id], pcol)
            assert abs(got - expect) < 1e-9, (doc_id, n, got, expect)


def test_weighted_jaccard_matches_set_arithmetic(spark):
    from frontmatter_mcp_spark.workload.datapipe import (
        _MAX_DF,
        q286_weighted_jaccard_pairs,
    )

    got = {
        (r.id_a, r.id_b): (r.iw, r.uw, r.weighted_jaccard)
        for r in q286_weighted_jaccard_pairs(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    sets = {}
    for d in docs:
        # q33's shingles: whitespace split of trim(text), 3-grams, distinct
        w = [t for t in re.split(r"\s+", d.text.strip()) if t]
        sets[d.doc_id] = {
            " ".join(w[i:i + 3]) for i in range(len(w) - 2)
        }
    df: dict[str, int] = {}
    for s in sets.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    nd = sum(1 for s in sets.values() if s)
    kept = {
        i: {g for g in s if df[g] <= _MAX_DF} for i, s in sets.items()
    }
    wt = {g: (nd * 16) // c for g, c in df.items()}
    ids = sorted(kept)
    expect = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            shared = kept[a] & kept[b]
            if not shared:
                continue
            iw = sum(wt[g] for g in shared)
            uw = sum(wt[g] for g in kept[a] | kept[b])
            if iw / uw >= 0.25:
                expect[(a, b)] = (iw, uw, round(iw / uw, 6))
    assert got == expect


def test_path_census_matches_python_dp(spark):
    from frontmatter_mcp_spark.workload.datapipe import (
        q287_recursive_path_census,
    )

    got = {(r.step, r.node): r.n_paths
           for r in q287_recursive_path_census(spark, SF).collect()}
    e = spark.read.parquet(f"{SF}/events.parquet").collect()
    seqs: dict[int, list] = {}
    for r in e:
        seqs.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    edges = set()
    for evs in seqs.values():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            edges.add((a[2], b[2]))
    counts = {("signup",): 1}
    expect = {(0, "signup"): 1}
    frontier = {"signup": 1}
    for step in range(1, 5):
        nxt: dict[str, int] = {}
        for node, n in frontier.items():
            for s, d in edges:
                if s == node:
                    nxt[d] = nxt.get(d, 0) + n
        for node, n in nxt.items():
            expect[(step, node)] = n
        frontier = nxt
    assert got == expect
