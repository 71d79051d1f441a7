"""Semantic pillar tests (reference: tests/test_query.py:221-326,
tests/semantic/*): embed UDF, embedding column NULLs, cosine ranking,
differential indexing, model-change invalidation."""

from __future__ import annotations

from pathlib import Path

import pytest

from frontmatter_mcp_spark.engine import FrontmatterEngine
from frontmatter_mcp_spark.semantic.indexer import IndexerState
from frontmatter_mcp_spark.semantic.model import DeterministicHashEmbedder, EmbeddingModel
from frontmatter_mcp_spark.semantic.store import EmbeddingStore


@pytest.fixture()
def vault(tmp_path):
    (tmp_path / "spark.md").write_text(
        "---\ntitle: spark\n---\nspark catalyst optimizer shuffles partitions executors\n"
    )
    (tmp_path / "cooking.md").write_text(
        "---\ntitle: cooking\n---\nrecipe butter flour sugar oven baking bread\n"
    )
    (tmp_path / "spark2.md").write_text(
        "---\ntitle: spark2\n---\nspark catalyst optimizer partitions tuning\n"
    )
    return tmp_path


@pytest.fixture()
def engine(spark, vault, tmp_path):
    eng = FrontmatterEngine(
        spark, vault, semantic=True, cache_dir=tmp_path / "cache"
    )
    return eng


def test_hash_embedder_is_deterministic_and_normalized():
    m = DeterministicHashEmbedder(dim=64)
    v1, v2 = m.encode(["hello world"]), m.encode(["hello world"])
    assert v1 == v2
    norm = sum(x * x for x in v1[0]) ** 0.5
    assert norm == pytest.approx(1.0)


def test_index_lifecycle_and_similarity_ranking(engine):
    assert engine.index_status()["state"] == "idle"
    engine.indexer.start()
    engine.index_wait(60)
    status = engine.index_status()
    assert status["state"] == "ready"
    assert status["indexed_count"] == 3

    # cosine ranking: a spark-y query must rank spark docs above cooking
    out = engine.query(
        "**/*.md",
        """
        SELECT path,
               array_cosine_similarity(
                 CAST(embedding AS ARRAY<DOUBLE>),
                 CAST(embed('spark catalyst optimizer') AS ARRAY<DOUBLE>)) AS score
        FROM files
        WHERE embedding IS NOT NULL
        ORDER BY score DESC
        """,
    )
    ranked = [r["path"] for r in out["results"]]
    assert set(ranked[:2]) == {"spark.md", "spark2.md"}
    assert ranked[2] == "cooking.md"
    # 1 - array_cosine_distance must agree with array_cosine_similarity
    out2 = engine.query(
        "**/*.md",
        """
        SELECT path,
               1 - array_cosine_distance(
                 CAST(embedding AS ARRAY<DOUBLE>),
                 CAST(embed('spark catalyst optimizer') AS ARRAY<DOUBLE>)) AS score
        FROM files WHERE embedding IS NOT NULL ORDER BY score DESC
        """,
    )
    assert [r["path"] for r in out2["results"]] == ranked


def test_unindexed_file_has_null_embedding(engine, vault):
    engine.indexer.start()
    engine.index_wait(60)
    # new file after indexing -> embedding NULL (reference test_query.py:305-326)
    (vault / "new.md").write_text("---\ntitle: new\n---\nfresh body\n")
    out = engine.query(
        "**/*.md", "SELECT path FROM files WHERE embedding IS NULL"
    )
    assert [r["path"] for r in out["results"]] == ["new.md"]


def test_differential_reindex_only_stale(engine, vault, tmp_path):
    engine.indexer.start()
    engine.index_wait(60)
    store = engine.store
    before = {r.path: r.mtime for r in store.read().collect()}

    # touch one file with new content + bump mtime
    import os

    p = vault / "spark.md"
    p.write_text("---\ntitle: spark\n---\ncompletely new body text\n")
    st = p.stat()
    os.utime(p, (st.st_atime, st.st_mtime + 100))
    (vault / "cooking.md").unlink()  # deletion must drop the row

    engine.index_refresh()
    engine.index_wait(60)
    after = {r.path: r.mtime for r in store.read().collect()}
    assert "cooking.md" not in after
    assert after["spark.md"] > before["spark.md"]
    assert after["spark2.md"] == before["spark2.md"]  # untouched -> not re-encoded


def test_query_inspect_advertises_embedding_when_ready(engine):
    out0 = engine.query_inspect("**/*.md")
    assert "embedding" not in out0["schema"]
    engine.indexer.start()
    engine.index_wait(60)
    out1 = engine.query_inspect("**/*.md")
    assert out1["schema"]["embedding"] == {"type": "FLOAT[64]", "nullable": False}


def test_model_change_invalidates_store(spark, tmp_path):
    store = EmbeddingStore(spark, tmp_path / "c", "model-a", 64)
    df = spark.createDataFrame([("x.md", 1.0, [0.0] * 64)], store.read().schema)
    store.upsert(df)
    assert store.count() == 1
    # same model: survives reopen
    store2 = EmbeddingStore(spark, tmp_path / "c", "model-a", 64)
    assert store2.count() == 1
    # different model: cleared (reference cache model-change invalidation)
    store3 = EmbeddingStore(spark, tmp_path / "c", "model-b", 64)
    assert store3.count() == 0


def test_store_upsert_replaces_by_path(spark, tmp_path):
    store = EmbeddingStore(spark, tmp_path / "c", "m", 4)
    schema = store.read().schema
    store.upsert(spark.createDataFrame([("a", 1.0, [1.0] * 4)], schema))
    store.upsert(spark.createDataFrame([("a", 2.0, [2.0] * 4), ("b", 1.0, [3.0] * 4)], schema))
    rows = {r.path: (r.mtime, r.vector[0]) for r in store.read().collect()}
    assert rows == {"a": (2.0, 2.0), "b": (1.0, 3.0)}


def test_store_recovery_deletes_unreferenced_data(spark, tmp_path):
    """Every dir state a crashed commit can strand — stale staging, a
    generation renamed into place whose manifest flip never landed,
    retired dirs whose deletion crashed — is garbage the manifest does
    not reference; a reopen must remove it without changing the
    committed state."""
    import shutil

    store = EmbeddingStore(spark, tmp_path / "c", "m", 4)
    schema = store.read().schema
    store.upsert(spark.createDataFrame([("a", 1.0, [1.0] * 4)], schema))
    live_gen = next(iter(store.data_dir.glob("gen-*")))

    # crash window 1: staging dir written, rename never happened
    shutil.copytree(live_gen, store.data_dir / "gen-000099.staging")
    # crash window 2: generation renamed into place, manifest flip lost
    shutil.copytree(live_gen, store.data_dir / "gen-000098")

    store = EmbeddingStore(spark, tmp_path / "c", "m", 4)  # reopen recovers
    assert not (store.data_dir / "gen-000099.staging").exists()
    assert not (store.data_dir / "gen-000098").exists()
    assert {r.path for r in store.read().collect()} == {"a"}

    store.upsert(spark.createDataFrame([("b", 2.0, [2.0] * 4)], schema))
    assert {r.path for r in store.read().collect()} == {"a", "b"}


def test_store_multi_bucket_upsert_is_snapshot_isolated(spark, tmp_path):
    """The reference's single-file DB gives transactional upserts
    (cache.py:56-70,127-141); the manifest commit restores that across
    buckets: a reader plan resolved BEFORE a multi-bucket upsert reads
    the all-old snapshot even when collected after the commit (retired
    dirs live one commit of grace), and a plan resolved after reads
    all-new — never a mix."""
    store = EmbeddingStore(spark, tmp_path / "c", "m", 4)
    schema = store.read().schema
    rows_v1 = [(f"doc_{i}.md", 1.0, [1.0] * 4) for i in range(20)]
    store.upsert(spark.createDataFrame(rows_v1, schema))

    before = store.read()  # plan resolved against the pre-commit manifest
    rows_v2 = [(f"doc_{i}.md", 2.0, [2.0] * 4) for i in range(20)]
    store.upsert(spark.createDataFrame(rows_v2, schema))  # touches many buckets

    got_before = {r.mtime for r in before.collect()}
    assert got_before == {1.0}, "stale reader saw a mixed snapshot"
    got_after = {r.mtime for r in store.read().collect()}
    assert got_after == {2.0}


def test_store_upsert_rewrites_only_affected_buckets(spark, tmp_path):
    """The 100 TB refresh property: an upsert touching one path must
    leave every other bucket's files byte-untouched (no whole-store
    rewrite)."""
    store = EmbeddingStore(spark, tmp_path / "c", "m", 4)
    schema = store.read().schema
    rows = [(f"doc_{i}.md", 1.0, [float(i)] * 4) for i in range(40)]
    store.upsert(spark.createDataFrame(rows, schema))
    assert len(list(store.data_dir.rglob("bucket=*"))) > 5  # spread out

    from frontmatter_mcp_spark.semantic.store import N_BUCKETS, path_bucket
    from pyspark.sql import functions as F

    target_bucket = (
        spark.createDataFrame([("doc_7.md",)], "path string")
        .select(path_bucket(F.col("path")).alias("b"))
        .collect()[0]
        .b
    )
    before = {
        f: f.stat().st_mtime_ns
        for f in store.data_dir.rglob("*.parquet")
        if f"bucket={target_bucket}/" not in str(f)
    }
    store.upsert(spark.createDataFrame([("doc_7.md", 2.0, [9.0] * 4)], schema))
    after = {f: f.stat().st_mtime_ns for f in store.data_dir.rglob("*.parquet")}
    for f, mt in before.items():
        assert after[f] == mt, f"untouched bucket file rewritten: {f}"
    got = {r.path: r.mtime for r in store.read().collect()}
    assert got["doc_7.md"] == 2.0 and len(got) == 40


def test_embed_udf_registered(engine):
    row = engine.spark.sql("SELECT size(embed('hello world')) AS d").collect()[0]
    assert row.d == 64


def test_stream_index_vault_converges_and_updates(spark, vault, tmp_path):
    """Streaming index maintenance: the frontmatter stream source feeds
    the store via foreachBatch; after draining, the store equals the
    vault's embeddings, and an edited file (mtime advanced) re-indexes
    on the next drain while untouched files keep their vectors."""
    import os
    import time

    from frontmatter_mcp_spark.semantic.indexer import stream_index_vault

    model = DeterministicHashEmbedder(dim=16)
    store = EmbeddingStore(spark, tmp_path / "scache", model.name, 16)
    q = stream_index_vault(
        spark, vault, store, model, checkpoint_dir=tmp_path / "ckpt"
    )
    try:
        q.processAllAvailable()
        got = {r.path: (r.mtime, list(r.vector)) for r in store.read().collect()}
        assert set(got) == {"spark.md", "cooking.md", "spark2.md"}
        import numpy as np

        def f32(vec):  # the store column is array<float>
            return [float(np.float32(x)) for x in vec]

        expect_spark = model.encode(
            ["spark catalyst optimizer shuffles partitions executors"]
        )[0]
        assert got["spark.md"][1] == f32(expect_spark)

        # edit one file with a strictly later mtime
        p = vault / "cooking.md"
        p.write_text("---\ntitle: cooking\n---\nnew recipe entirely\n")
        later = time.time() + 5
        os.utime(p, (later, later))
        q.processAllAvailable()
        got2 = {r.path: (r.mtime, list(r.vector)) for r in store.read().collect()}
        assert got2["cooking.md"][1] == f32(model.encode(["new recipe entirely"])[0])
        assert got2["cooking.md"][0] > got["cooking.md"][0]
        assert got2["spark.md"] == got["spark.md"]  # untouched file unchanged
    finally:
        q.stop()
        q.awaitTermination()
