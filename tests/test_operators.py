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


# ---------------------------------------------------------------------------
# new training-pipeline operators: boilerplate, decontamination, repetition,
# normalization, quantization
# ---------------------------------------------------------------------------


def test_boilerplate_spans_finds_shared_template(spark):
    rows = [
        (1, "copyright acme corp all rights reserved unique alpha text"),
        (2, "copyright acme corp all rights reserved unique beta words"),
        (3, "completely unrelated document body with no template at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = {r.span: r for r in dd.boilerplate_spans(df, "doc_id", "text").collect()}
    assert "copyright acme corp all" in spans
    shared = spans["copyright acme corp all"]
    assert shared.n_docs == 2 and shared.first_doc_id == 1
    # nothing from the unrelated doc repeats
    assert all("unrelated" not in s for s in spans)


def test_decontaminate_flags_overlap_only(spark):
    rows = [
        (1, "train", "the secret benchmark question appears right here today"),
        (2, "train", "totally clean training document with original content"),
        (3, "test", "the secret benchmark question appears in the test set"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "split", "text"])
    flagged = {r.doc_id: r.n_shared_spans for r in
               dd.decontaminate(df, "doc_id", "text", "split").collect()}
    assert 1 in flagged and flagged[1] >= 1  # shares "the secret benchmark question"
    assert 2 not in flagged


def test_repetition_profile_degenerate_text(spark):
    rows = [
        (1, "spam spam spam spam"),
        (2, "all four words differ"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in tx.repetition_profile(df, "doc_id", "text").collect()}
    assert out[1].n_words == 4 and out[1].n_distinct_words == 1
    assert out[1].top_word_frac == 1.0 and out[1].top_bigram_frac == 1.0
    assert out[2].distinct_ratio == 1.0
    assert out[2].top_word_frac == 0.25
    assert out[2].n_bigrams == 3


def test_normalize_text_strips_stopwords_and_case(spark):
    df = spark.createDataFrame([(1, "  The   quick a  Fox  ")], ["doc_id", "text"])
    out = df.select(tx.normalize_text(F.col("text")).alias("norm")).collect()[0]
    assert out.norm == "quick fox"


def test_int8_quantize_roundtrip_properties(spark):
    from frontmatter_mcp_spark.operators import quantize as qz

    rows = [
        (1, [0.0, 10.0]),
        (2, [1.0, 20.0]),
        (3, [2.0, 30.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in qz.int8_quantize(df, "vec_id", "embedding").collect()}
    assert all(r.n_dims == 2 for r in out.values())
    # max quantization step is (max-min)/255; squared error per dim below step^2
    step0, step1 = 2.0 / 255, 20.0 / 255
    bound = step0**2 + step1**2
    assert all(0.0 <= r.recon_err <= bound for r in out.values())
    # distinct vectors get distinct codes
    assert len({r.codes_fp for r in out.values()}) == 3


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """click->purchase interval join: streaming result == batch range join."""
    import datetime as dt

    from frontmatter_mcp_spark.streaming import events as ev

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # (event_id, ts_nanos, user_id, event_type, value, props)
        (1, t0, 7, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=30), 7, "purchase", 5.0, "{}"),  # joins 1
        (3, t0 + dt.timedelta(hours=3), 7, "purchase", 5.0, "{}"),  # out of window
        (4, t0, 8, "purchase", 2.0, "{}"),  # other user, no click
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = ev.click_purchase_interval_join(
        df.selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    got = {(r.user_id, r.click_id, r.purchase_id) for r in out.collect()}
    assert got == {(7, 1, 2)}


def test_probe_buckets_radius_sets(spark):
    from frontmatter_mcp_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("0110",)], "b string")
    r1 = df.select(sim.probe_buckets(F.col("b"), 4, 1).alias("p")).collect()[0].p
    assert r1 == ["0110", "1110", "0010", "0100", "0111"]
    r0 = df.select(sim.probe_buckets(F.col("b"), 4, 0).alias("p")).collect()[0].p
    assert r0 == ["0110"]
    r2 = df.select(sim.probe_buckets(F.col("b"), 4, 2).alias("p")).collect()[0].p
    assert len(r2) == 1 + 4 + 6 and len(set(r2)) == 11  # all distinct


def test_multiprobe_lsh_recall_dominates_single(spark):
    from frontmatter_mcp_spark.operators import similarity as sim
    from frontmatter_mcp_spark.tables import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    single = sim.lsh_topk(q, c, dim=64, nbits=4, k=10, probe_radius=0)
    multi = sim.lsh_topk(q, c, dim=64, nbits=4, k=10, probe_radius=1)
    s_pairs = {(r.qid, r.cid) for r in single.collect()}
    m_pairs = {(r.qid, r.cid) for r in multi.collect()}
    # multi-probe candidates are a superset of the single-probe bucket's,
    # so its top-k can only be at-least-as-similar; and no duplicates
    assert len(m_pairs) == multi.count()
    assert multi.count() >= single.count()


def test_containment_catches_partial_copy_jaccard_misses(spark):
    from frontmatter_mcp_spark.operators import dedup as dd

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"word{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, quote), (2, quote + " " + filler)], "doc_id long, text string"
    )
    cont = dd.ngram_containment_pairs(df, "doc_id", "text", threshold=0.9, max_df=50)
    rows = cont.collect()
    assert len(rows) == 1 and rows[0].containment == 1.0  # quote fully contained
    jac = dd.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.4, max_df=50)
    assert jac.count() == 0  # union dominated by the long doc


def test_neardup_groups_isolated_and_chain(docs):
    """Labels propagate over the pair graph only: a planted dup chain
    collapses to its minimum id while isolated docs (the overwhelming
    majority at corpus scale — they never enter the propagation loop)
    keep their own id."""
    got = {
        r.doc_id: r.group_id
        for r in dd.neardup_groups(
            docs, "doc_id", "text", threshold=0.4, max_df=50, iters=3
        ).collect()
    }
    assert got[1] == got[2] == got[3] == 1  # dup chain -> min id
    assert got[4] == 4 and got[5] == 5  # isolated docs: own id
    assert set(got) == {1, 2, 3, 4, 5}  # every doc labeled exactly once


def test_remove_duplicate_spans_semantics(spark):
    """Duplicate-span scrub: positions covered by a cross-doc repeated
    4-gram are dropped, docs are rebuilt in token order, fully-scrubbed
    docs come back empty (not missing), short docs pass untouched."""
    from frontmatter_mcp_spark.operators.dedup import remove_duplicate_spans

    rows = [
        # docs 1 and 2 share the leading 4-token span; their tails differ
        (1, "all rights reserved worldwide alpha beta"),
        (2, "all rights reserved worldwide gamma"),
        # doc 3 is exactly the shared span -> fully scrubbed
        (3, "all rights reserved worldwide"),
        # doc 4: 3 tokens — too short to form a span, untouched
        (4, "tiny unique doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_tokens_kept, r.cleaned_text)
        for r in remove_duplicate_spans(df, "doc_id", "text", span_n=4).collect()
    }
    assert got == {
        1: (6, 2, "alpha beta"),
        2: (5, 1, "gamma"),
        3: (4, 0, ""),
        4: (3, 3, "tiny unique doc"),
    }


def test_simhash_candidate_pairs_banding_and_cap(spark):
    """SimHash banding: identical docs pair at Hamming 0 through any
    shared slice; unrelated docs don't qualify; and an oversized band
    bucket (here forced with max_bucket=1) drops its candidates — the
    skew guard — while identical signatures still pair through their
    OTHER shared slices only if those buckets survive."""
    from frontmatter_mcp_spark.operators.dedup import simhash_candidate_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),  # identical to 1
        (3, "totally different words entirely here unrelated content"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_candidate_pairs(df, "doc_id", "text").collect()
    }
    assert got.get((1, 2)) == 0
    assert all(3 not in pair or got[pair] <= 3 for pair in got)

    # cap of 1 drops every bucket the identical pair shares -> no pairs
    none = simhash_candidate_pairs(df, "doc_id", "text", max_bucket=1).collect()
    assert none == []


def test_lsh_bucket_cap_bounds_exact_dup_cluster(spark):
    """The MinHash-LSH skew guard: a large exact-duplicate cluster
    collides in EVERY band, so an uncapped join would emit
    bands * m^2 / 2 pairs (5e7 for the m=10^4 cluster below — the
    100 TB scale-killer VERDICT r07 flagged). With the cap the cluster's
    buckets are dropped before the self-join, candidates stay O(cap^2)
    per surviving bucket, and the planted near-dup pair OUTSIDE the
    mega-cluster is still found. The dropped mass is observable via
    lsh_oversized_buckets."""
    m = 10_000
    dup_text = "the quick brown fox jumps over the lazy dog near the river"
    spine = spark.range(m).select(
        (F.col("id") + 100).alias("doc_id"), F.lit(dup_text).alias("text")
    )
    extras = spark.createDataFrame(
        [
            (1, "spark catalyst optimizer rewrites logical plans into physical"),
            (2, "spark catalyst optimizer rewrites logical plans into physical ones"),
        ],
        ["doc_id", "text"],
    )
    df = spine.unionByName(extras)

    pairs = dd.lsh_candidate_pairs(df, "doc_id", "text").collect()
    # mega-cluster contributes nothing; only the small-bucket pair remains
    assert len(pairs) < 100, f"cap failed: {len(pairs)} pairs emitted"
    assert (1, 2) in {(r.id_a, r.id_b) for r in pairs}

    # the drop is accounted for, not silent: every band has one oversized
    # bucket holding the m duplicates
    sigs = dd.minhash_signatures(df, "doc_id", "text")
    dropped = dd.lsh_oversized_buckets(sigs, "doc_id").collect()
    assert len(dropped) == 4  # _BANDS buckets, one per band
    assert all(r["count"] == m for r in dropped)

    # uncapped path still available for bounded inputs
    uncapped = dd.candidate_pairs_from_signatures(
        sigs.filter(F.col("doc_id") < 110), "doc_id", max_bucket=None
    )
    assert uncapped.count() == 10 * 9 // 2 + 1


def test_dsir_weights_rank_target_like_docs_higher(spark):
    rows = [
        (1, "alpha beta alpha beta", "t"),
        (2, "alpha beta gamma", "t"),
        (3, "delta epsilon delta epsilon", "r"),
        (4, "alpha beta alpha", "r"),      # raw doc that LOOKS like target
        (5, "delta epsilon zeta", "r"),    # raw doc that looks raw
        (6, "", "r"),                      # no tokens
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "grp"])
    out = tx.dsir_weights(df, "doc_id", "text", target=F.col("grp") == "t")
    got = {r["doc_id"]: r for r in out.collect()}
    # feature count = unigram occurrences + adjacent bigram occurrences
    assert got[1]["n_features"] == 4 + 3
    assert got[6]["n_features"] == 0 and got[6]["dsir_weight"] is None
    # target-vocabulary docs outrank raw-vocabulary docs regardless of
    # their own label (that is the point of importance resampling)
    assert got[4]["dsir_weight"] > got[5]["dsir_weight"]
    assert got[1]["dsir_weight"] > got[3]["dsir_weight"]


def test_bigram_merge_candidates_pmi_math(spark):
    import math

    # "new york" always adjacent; "the" frequent and independent
    rows = [
        (1, "new york is the city"),
        (2, "new york has the docks"),
        (3, "the cat saw the dog"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tx.bigram_merge_candidates(df, "text", min_count=2, top_k=5).collect()
    top = out[0]
    assert (top["term_a"], top["term_b"]) == ("new", "york")
    n_total = 15  # token occurrences
    expect = round(
        math.log(2) + math.log(float(n_total)) - math.log(2) - math.log(2), 6
    )
    assert top["pmi"] == pytest.approx(expect, abs=1e-9)
    assert top["c_ab"] == 2 and top["c_a"] == 2 and top["c_b"] == 2
    # ranking is (pmi desc, term_a, term_b): every later row's key is >=
    keys = [(-r["pmi"], r["term_a"], r["term_b"]) for r in out]
    assert keys == sorted(keys)


def test_ann_ndcg_hand_computed(spark):
    import math

    # q [1,0] label A; candidates ranked c1 (A), c2 (B), c3 (A)
    q = spark.createDataFrame([(0, [1.0, 0.0], "A")], ["qid", "qvec", "qlabel"])
    c = spark.createDataFrame(
        [
            (10, [1.0, 0.0], "A"),
            (11, [0.9, 0.1], "B"),
            (12, [0.8, 0.2], "A"),
        ],
        ["cid", "cvec", "clabel"],
    )
    row = sim.ann_ndcg(q, c, k=3).collect()[0]
    dcg = round(1 / math.log2(2) + 0 / math.log2(3) + 1 / math.log2(4), 6)
    idcg = round(1 / math.log2(2) + 1 / math.log2(3), 6)
    assert row["n_rel"] == 2
    assert row["dcg"] == pytest.approx(dcg, abs=2e-6)
    assert row["idcg"] == pytest.approx(idcg, abs=2e-6)
    assert row["ndcg"] == pytest.approx(round(dcg / idcg, 6), abs=2e-6)


def test_ann_ndcg_no_relevant_label_is_null(spark):
    q = spark.createDataFrame([(0, [1.0, 0.0], "Z")], ["qid", "qvec", "qlabel"])
    c = spark.createDataFrame(
        [(10, [1.0, 0.0], "A"), (11, [0.5, 0.5], "B")],
        ["cid", "cvec", "clabel"],
    )
    row = sim.ann_ndcg(q, c, k=2).collect()[0]
    assert row["n_rel"] == 0
    assert row["idcg"] is None and row["ndcg"] is None


def test_bigram_nll_sees_phrases_unigram_cannot(spark):
    # two docs with IDENTICAL unigram counts; doc 1 repeats the phrase
    # "new york", doc 2 scrambles the pairing. The unigram model scores
    # them equally; the bigram model must score the phrased doc as more
    # predictable (lower mean NLL).
    rows = [
        (1, "new york new york new york"),
        (2, "new new york new york york"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uni = {r["doc_id"]: r["nll_mean"] for r in tx.unigram_nll(df, "doc_id", "text").collect()}
    big = {r["doc_id"]: r["nll_mean"] for r in tx.bigram_nll(df, "doc_id", "text").collect()}
    assert uni[1] == uni[2]
    assert big[1] < big[2]
    out = tx.bigram_nll(df, "doc_id", "text").collect()
    assert all(r["n_tokens"] == 6 for r in out)


def test_bigram_nll_edge_docs(spark):
    rows = [(1, ""), (2, "solo"), (3, "a b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in tx.bigram_nll(df, "doc_id", "text").collect()}
    assert got[1]["n_tokens"] == 0 and got[1]["nll_mean"] is None
    assert got[2]["n_tokens"] == 1  # unigram-only first token
    assert got[3]["n_tokens"] == 2


def test_record_linkage_blocking_and_verify(spark):
    rows = [
        (1, "Acme Corp", "US", "A"),
        (2, "Acme Crop", "US", "A"),   # lev 2 from Acme Corp, same block
        (3, "Acme Corp", "DE", "A"),   # identical name, DIFFERENT block
        (4, "Zeta Ltd", "US", "A"),    # same block, far name
        (5, "Acme Corp", "US", "B"),   # same nation, different segment
    ]
    df = spark.createDataFrame(rows, ["id", "name", "nation", "seg"])
    out = dd.record_linkage_pairs(
        df, "id", "name", block_cols=["nation", "seg"], max_lev=2
    ).collect()
    assert [(r["id_a"], r["id_b"], r["lev"]) for r in out] == [(1, 2, 2)]


def test_bitext_margin_demotes_hub_vectors(spark):
    """The margin criterion must rank a uniquely-matched pair above a
    hub pair: the hub's high k-NN average cancels its high raw cosine,
    while the unique match's lower k-NN average boosts its margin."""
    rows = [
        # (id, vec, cluster, side)
        (1, [1.0, 0.0], 0, 0),      # unique source
        (2, [0.7, 0.7], 0, 0),      # hub-ish source
        (11, [0.99, 0.14], 0, 1),   # unique match of 1
        (12, [0.70, 0.71], 0, 1),   # hub matches
        (13, [0.71, 0.70], 0, 1),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "cluster", "side"])
    out = sim.bitext_margin_pairs(
        df, "side", min_cos=0.1, k_nn=2, top_k=10
    ).collect()
    by_pair = {(r["id_a"], r["id_b"]): r["margin"] for r in out}
    assert out[0]["id_a"] == 1 and out[0]["id_b"] == 11  # unique pair wins
    assert by_pair[(1, 11)] > by_pair[(2, 12)] and by_pair[(1, 11)] > by_pair[(2, 13)]
    # raw cosine alone would NOT have ranked it first
    by_cos = sorted(out, key=lambda r: -r["cos"])
    assert (by_cos[0]["id_a"], by_cos[0]["id_b"]) != (1, 11)


def test_connected_components_star_resolves_long_chain(spark):
    """Star contraction must resolve a path graph of length 40 in its
    O(log n) round budget — the topology where fixed-iteration min-label
    propagation (neardup_groups' 3 rounds cover diameter ~2^3) stops
    early. Also: two separate components and a cycle keep distinct,
    correct minima."""
    from frontmatter_mcp_spark.operators import dedup as dd

    chain = [(i, i + 1) for i in range(100, 140)]         # path, min 100
    cycle = [(200, 201), (201, 202), (202, 200)]          # cycle, min 200
    pair = [(300, 301)]                                   # 2-node, min 300
    df = spark.createDataFrame(chain + cycle + pair, ["id_a", "id_b"])
    got = {
        r.node: r.component
        for r in dd.connected_components_star(df).collect()
    }
    assert {got[n] for n in range(100, 141)} == {100}
    assert {got[n] for n in (200, 201, 202)} == {200}
    assert got[300] == 300 and got[301] == 300
    assert len(got) == 41 + 3 + 2


def test_connected_components_star_matches_union_find(spark):
    """Property check: star contraction equals a driver-side union-find
    on pseudo-random graphs (deterministic seeds)."""
    import random

    from frontmatter_mcp_spark.operators import dedup as dd

    for seed in (1, 7, 23):
        rng = random.Random(seed)
        n = 60
        edges = sorted(
            {
                tuple(sorted((rng.randrange(n), rng.randrange(n))))
                for _ in range(45)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = {}
        nodes_in_edges = {x for e in edges for x in e}
        for x in nodes_in_edges:
            expect[x] = find(x)
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {
            r.node: r.component
            for r in dd.connected_components_star(df).collect()
        }
        assert got == expect, f"seed {seed}"


def test_bm25_matches_pure_python_reference(spark):
    """The q134 template must equal a from-scratch BM25 on a tiny corpus
    (independent of DuckDB)."""
    import math

    from frontmatter_mcp_spark.workload.datapipe import (
        _BM25_MAX_DF,
        _BM25_QUERY_MOD,
        _BM25_QUERY_TERMS,
        _BM25_SCALE,
        _bm25_sql,
    )

    docs = [
        (0, "apple banana cherry date egg fig grape honey extra words"),
        (3, "apple apple banana kiwi"),
        (7, "cherry date egg"),
        (50, "banana fig grape lemon mango nut orange pear quince"),
        (12, "apple banana cherry"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.createOrReplaceTempView("documents_bm25t")
    got = {
        (r.query_id, r.hit_id): (r.n_terms, r.score, r.rnk)
        for r in spark.sql(_bm25_sql("spark", "documents_bm25t")).collect()
    }

    toks = {i: t.lower().strip().split() for i, t in docs}
    dl = {i: len(w) for i, w in toks.items() if w}
    nd = len(dl)
    avgdl = sum(dl.values()) / nd
    tf: dict = {}
    for i, w in toks.items():
        for t in w:
            tf.setdefault((i, t), 0)
            tf[(i, t)] += 1
    dfreq: dict = {}
    for (i, t) in tf:
        dfreq[t] = dfreq.get(t, 0) + 1
    expect = {}
    for qid, text in docs:
        if qid % _BM25_QUERY_MOD:
            continue
        qterms = list(dict.fromkeys(toks[qid][:_BM25_QUERY_TERMS]))
        scores: dict = {}
        for t in qterms:
            if dfreq.get(t, 0) > _BM25_MAX_DF:
                continue
            for (i, tt), f in tf.items():
                if tt != t or i == qid:
                    continue
                idf = math.log(1 + (nd - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                g = (f * (1.2 + 1)) / (f + 1.2 * (1 - 0.75 + 0.75 * dl[i] / avgdl))
                nt, fx = scores.get(i, (0, 0))
                scores[i] = (nt + 1, fx + math.floor(idf * g * _BM25_SCALE))
        ranked = sorted(
            scores.items(), key=lambda kv: (-round(kv[1][1] / _BM25_SCALE, 4), kv[0])
        )
        for rnk, (i, (nt, fx)) in enumerate(ranked[:5], start=1):
            expect[(qid, i)] = (nt, round(fx / _BM25_SCALE, 4), rnk)
    assert got == expect
