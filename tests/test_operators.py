"""Unit tests for the scale-out operators on synthetic inputs.

Mirrors the reference's test strategy (SURVEY §5: golden-less asserts on
operator results over inline records) but for the operators the reference
doesn't have: dedup recall/precision on planted near-duplicates, ANN
correctness vs brute force, text heuristics on known inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frontmatter_mcp_spark.operators import dedup as dd
from frontmatter_mcp_spark.operators import similarity as sim
from frontmatter_mcp_spark.operators import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    other = "completely different words about spark catalyst optimizer plans and shuffles everywhere"
    rows = [
        (1, base),
        (2, base),  # exact duplicate of 1
        (3, near),  # near duplicate of 1
        (4, other),
        (5, "tiny doc"),  # fewer than 3 tokens -> no shingles
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups(docs):
    groups = {r.content_fp: r for r in dd.exact_dedup_groups(docs, "doc_id", "text").collect()}
    sizes = sorted(r.n_docs for r in groups.values())
    assert sizes == [1, 1, 1, 2]
    dup = next(r for r in groups.values() if r.n_docs == 2)
    assert dup.keeper_id == 1


def test_minhash_lsh_finds_planted_neardup(docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in dd.lsh_candidate_pairs(docs, "doc_id", "text").collect()
    }
    # exact duplicates always collide in every band
    assert (1, 2) in pairs
    # the near-dup pair shares most shingles; with 4 bands it should collide
    assert (1, 3) in pairs or (2, 3) in pairs
    # unrelated docs must not be candidates
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_ngram_jaccard_exact_values(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.1).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical docs
    assert 0.5 < pairs[(1, 3)] < 1.0  # one word changed at the end


def test_simhash_identical_and_near(docs):
    sigs = {r.doc_id: r.simhash for r in dd.simhash(docs, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2]
    hamming_near = sum(a != b for a, b in zip(sigs[1], sigs[3]))
    hamming_far = sum(a != b for a, b in zip(sigs[1], sigs[4]))
    assert hamming_near < hamming_far


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "only two")], ["doc_id", "text"])
    out = df.select(dd.word_shingles(F.col("text")).alias("sh")).collect()
    assert out[0].sh == []


def test_cosine_topk_matches_bruteforce(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),  # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.5, 0.5, 0.0]),
        (4, [-1.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = df.filter("vec_id = 0").selectExpr("vec_id qid", "embedding qvec")
    c = df.filter("vec_id > 0").selectExpr("vec_id cid", "embedding cvec")
    out = sim.cosine_topk(q, c, k=4, query_vec="qvec", cand_vec="cvec").collect()
    order = [r.cid for r in sorted(out, key=lambda r: r.rank)]
    assert order == [1, 3, 2, 4]
    assert out[0].sim == pytest.approx(0.9 / (0.9**2 + 0.1**2) ** 0.5)


def test_ivf_topk_with_good_cells_matches_bruteforce(spark):
    # two well-separated clusters; IVF with nprobe=1 must find the
    # same neighbors as brute force for an in-cluster query
    rows = []
    for i in range(10):
        rows.append((i, [1.0 + 0.01 * i, 0.0], 0))
    for i in range(10, 20):
        rows.append((i, [0.0, 1.0 + 0.01 * i], 1))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = df.filter("vec_id = 0").selectExpr("vec_id qid", "embedding qvec")
    ivf = sim.ivf_topk(q, df, k=5, nprobe=1)
    got = {r.vec_id for r in ivf.collect()}
    assert got <= set(range(10))  # never crosses into the far cluster
    assert len(got) == 5


def test_lang_id_and_quality(spark):
    rows = [
        (1, "the cat and the dog walked to the park in the morning sun today yes"),
        (2, "el perro y el gato de la casa que corre en un parque los dias"),
        (3, "zzz qqq www"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    prof = {r.doc_id: r for r in tx.text_profile(df, "doc_id", "text").collect()}
    assert prof[1].lang_pred == "en"
    assert prof[2].lang_pred == "es"
    assert prof[3].lang_pred == "und"
    assert 0.0 <= prof[3].quality <= 1.0
    assert prof[1].n_tokens == 15


def test_bow_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta delta")],
        ["doc_id", "text"],
    )
    fps = {r.doc_id: r.bow_fp for r in df.select(
        F.col("doc_id"), tx.bow_fingerprint(F.col("text")).alias("bow_fp")
    ).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
