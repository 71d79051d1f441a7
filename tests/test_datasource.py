"""Tests for the `frontmatter` Python DataSource (Spark 4 API).

Covers the reference's scan contract re-expressed as a reader format:
union-of-keys schema (query.py:41-43), all-strings values + JSON arrays
(query.py:10-20, ADR-0006), relative path column (ADR-0007), malformed
files as rows-with-_error not failures (files.py:70-107), plus
source-specific behavior: partitioned reads and user-supplied schemas.
"""

from __future__ import annotations

import pytest

from frontmatter_mcp_spark.sources.datasource import FrontmatterDataSource


@pytest.fixture(scope="module")
def vault(tmp_path_factory):
    v = tmp_path_factory.mktemp("ds_vault")
    (v / "a.md").write_text(
        "---\ntitle: Alpha\ntags:\n  - x\n  - y\ndate: 2025-11-01\n---\nbody A"
    )
    (v / "sub").mkdir()
    (v / "sub" / "b.md").write_text("---\ntitle: Beta\nextra: 42\n---\nbody B")
    (v / "c.md").write_text("---\nbad: [unclosed\n---\nbody C")
    (v / "ignored.txt").write_text("not markdown")
    return v


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(FrontmatterDataSource)
    return spark


def _read(spark, vault, **options):
    r = spark.read.format("frontmatter")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(str(vault))


def test_union_schema_and_values(registered, vault):
    df = _read(registered, vault)
    rows = {r.path: r for r in df.collect()}
    assert set(rows) == {"a.md", "c.md", "sub/b.md"}  # relative paths, glob'd
    assert rows["a.md"].title == "Alpha"
    assert rows["a.md"].tags == '["x", "y"]'  # JSON-encoded array
    assert rows["sub/b.md"].extra == "42"  # int -> string
    assert rows["sub/b.md"].tags is None  # missing key -> NULL
    assert df.schema["path"].nullable is False


def test_malformed_file_is_error_row(registered, vault):
    rows = {r.path: r for r in _read(registered, vault).collect()}
    assert rows["c.md"]._error is not None and "c.md" in rows["c.md"]._error
    assert rows["a.md"]._error is None


def test_include_body_option(registered, vault):
    df = _read(registered, vault, includeBody="true")
    rows = {r.path: r for r in df.collect()}
    assert rows["a.md"]._body == "body A"
    assert "_body" not in _read(registered, vault).columns


def test_partitioned_read_covers_all_files(registered, vault):
    df = _read(registered, vault, numPartitions="3")
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 3


def test_user_schema_skips_inference(registered, vault):
    df = (
        registered.read.format("frontmatter")
        .schema("path string, title string, _error string")
        .load(str(vault))
    )
    assert df.columns == ["path", "title", "_error"]
    rows = {r.path: r.title for r in df.collect()}
    assert rows["a.md"] == "Alpha"


def test_sql_usable_as_table(registered, vault):
    _read(registered, vault).createOrReplaceTempView("vault_files")
    n = registered.sql(
        "SELECT COUNT(*) AS n FROM vault_files WHERE title IS NOT NULL"
    ).collect()[0].n
    assert n == 2


def test_ddl_temporary_view(registered, vault):
    """CREATE TEMPORARY VIEW ... USING frontmatter works end-to-end:
    options reach schema inference AND the scan (persistent catalog
    tables do not forward options in Spark's Python DataSource API —
    the reader raises a directed error for that case, below)."""
    registered.sql(
        "CREATE OR REPLACE TEMPORARY VIEW fm_ddl USING frontmatter "
        f"OPTIONS (path '{vault}')"
    )
    rows = registered.sql(
        "SELECT path, title FROM fm_ddl WHERE title IS NOT NULL ORDER BY path"
    ).collect()
    assert [r.title for r in rows] == ["Alpha", "Beta"]
    registered.catalog.dropTempView("fm_ddl")


def test_reader_missing_path_option_directed_error(registered):
    from frontmatter_mcp_spark.sources.datasource import FrontmatterReader

    with pytest.raises(ValueError, match="TEMPORARY VIEW"):
        FrontmatterReader({}, None)


def test_stream_reader_differential_batches(registered, tmp_path):
    """The streaming form emits only files whose mtime advanced — the
    reference's differential indexer rule (cache.py:160-177) as a
    Structured Streaming source. Mtimes are forced with os.utime so the
    batch boundaries are deterministic regardless of filesystem
    timestamp granularity or scheduler timing (the round-2/3 flake)."""
    import os

    v = tmp_path / "stream_vault"
    v.mkdir()
    (v / "a.md").write_text("---\ntitle: Alpha\n---\nA")
    (v / "b.md").write_text("---\ntitle: Beta\n---\nB")
    t0 = 1_700_000_000.0
    os.utime(v / "a.md", (t0, t0))
    os.utime(v / "b.md", (t0, t0))
    stream = registered.readStream.format("frontmatter").load(str(v))
    q = (
        stream.writeStream.format("memory")
        .queryName("ds_stream_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = sorted(r.path for r in registered.table("ds_stream_test").collect())
        assert first == ["a.md", "b.md"]
        (v / "a.md").write_text("---\ntitle: Alpha2\n---\nA2")
        (v / "c.md").write_text("---\ntitle: Gamma\n---\nC")
        os.utime(v / "a.md", (t0 + 10, t0 + 10))
        os.utime(v / "c.md", (t0 + 10, t0 + 10))
        q.processAllAvailable()
        rows = sorted(
            (r.path, r.title) for r in registered.table("ds_stream_test").collect()
        )
        # a.md re-emits with new content; b.md does NOT re-emit
        assert rows == [
            ("a.md", "Alpha"),
            ("a.md", "Alpha2"),
            ("b.md", "Beta"),
            ("c.md", "Gamma"),
        ]
    finally:
        q.stop()


def test_stream_offset_mtime_tie_semantics(tmp_path):
    """Offset boundary semantics, driven directly (no Spark): a file at
    exactly the watermark emits once and only once, and a NEW file
    landing in the same mtime tick as the watermark is not missed —
    the two failure modes of a bare max-mtime watermark."""
    import os

    from pyspark.sql import types as T

    from frontmatter_mcp_spark.sources.datasource import FrontmatterStreamReader

    v = tmp_path / "tie_vault"
    v.mkdir()
    t0 = 1_700_000_000.0
    for name in ("a.md", "b.md"):
        (v / name).write_text(f"---\ntitle: {name}\n---\nx")
        os.utime(v / name, (t0, t0))
    schema = T.StructType([T.StructField("path", T.StringType(), False)])
    r = FrontmatterStreamReader({"path": str(v)}, schema)

    files, off1 = r._snapshot(r.initialOffset())
    assert sorted(p.name for p, _ in files) == ["a.md", "b.md"]
    assert off1 == {"watermark": t0, "boundary": ["a.md", "b.md"]}

    # steady state: nothing new -> nothing emitted, offset unchanged
    files, off2 = r._snapshot(off1)
    assert files == [] and off2 == off1

    # a new file created in the SAME mtime tick as the watermark emits
    (v / "c.md").write_text("---\ntitle: c\n---\nx")
    os.utime(v / "c.md", (t0, t0))
    files, off3 = r._snapshot(off1)
    assert [p.name for p, _ in files] == ["c.md"]
    assert off3 == {"watermark": t0, "boundary": ["a.md", "b.md", "c.md"]}

    # ...and does not re-emit afterwards
    files, off4 = r._snapshot(off3)
    assert files == [] and off4 == off3

    # an edit past the watermark re-emits and resets the boundary
    (v / "a.md").write_text("---\ntitle: a2\n---\nx")
    os.utime(v / "a.md", (t0 + 5, t0 + 5))
    files, off5 = r._snapshot(off3)
    assert [p.name for p, _ in files] == ["a.md"]
    assert off5 == {"watermark": t0 + 5, "boundary": ["a.md"]}

    # replay of the committed range reproduces exactly that batch
    replay = list(r.readBetweenOffsets(off3, off5))
    assert [row[0] for row in replay] == ["a.md"]


def test_writer_roundtrip_lossless(registered, vault, tmp_path):
    """read -> write -> read round-trips records exactly (arrays return
    to YAML lists, bodies preserved) — the reference's file-rewrite sink
    (files.py:143-145) as a task-parallel write."""
    dst = tmp_path / "copy_vault"
    df = (
        registered.read.format("frontmatter")
        .option("includeBody", "true")
        .load(str(vault))
        .filter("_error IS NULL")
    )
    df.write.format("frontmatter").mode("overwrite").save(str(dst))
    back = (
        registered.read.format("frontmatter")
        .option("includeBody", "true")
        .load(str(dst))
    )
    orig = {r.path: (r.title, r.tags, r._body) for r in df.collect()}
    copied = {r.path: (r.title, r.tags, r._body) for r in back.collect()}
    assert copied == orig and len(copied) == 2


def test_writer_append_refuses_clobber(registered, vault, tmp_path):
    dst = tmp_path / "clobber_vault"
    df = (
        registered.read.format("frontmatter").load(str(vault)).filter("_error IS NULL")
    )
    df.write.format("frontmatter").mode("overwrite").save(str(dst))
    with pytest.raises(Exception, match="exists"):
        df.write.format("frontmatter").mode("append").save(str(dst))


def test_writer_rejects_escaping_path(registered, tmp_path):
    dst = tmp_path / "safe_vault"
    df = registered.createDataFrame([("../evil.md", "X")], "path string, title string")
    with pytest.raises(Exception, match="[Ee]scapes"):
        df.write.format("frontmatter").mode("overwrite").save(str(dst))


def test_stream_into_bucketed_embedding_store(registered, tmp_path):
    """End-to-end streaming ingestion: differential markdown stream ->
    foreachBatch encode -> bucket-incremental store upsert. Each
    micro-batch embeds ONLY mtime-advanced files, and the store merges
    them without rewriting untouched buckets — the streaming form of
    the reference's background indexer."""
    import time

    from frontmatter_mcp_spark.semantic.model import EmbeddingModel
    from frontmatter_mcp_spark.semantic.store import EmbeddingStore

    v = tmp_path / "vault"
    v.mkdir()
    for name, body in [("a.md", "alpha text"), ("b.md", "beta text")]:
        (v / name).write_text(f"---\nt: x\n---\n{body}")
    model = EmbeddingModel()
    store = EmbeddingStore(registered, tmp_path / "cache", model.name, model.get_dimension())
    seen_batches: list[list[str]] = []

    def ingest(batch_df, batch_id):
        rows = batch_df.select("path", "_mtime", "_body").collect()
        if not rows:
            return
        seen_batches.append(sorted(r.path for r in rows))
        vecs = model.encode([r._body or "" for r in rows])
        records = registered.createDataFrame(
            [(r.path, float(r._mtime), [float(x) for x in vec])
             for r, vec in zip(rows, vecs)],
            store.read().schema,
        )
        store.upsert(records)

    stream = (
        registered.readStream.format("frontmatter")
        .option("includeBody", "true")
        .load(str(v))
    )
    q = stream.writeStream.foreachBatch(ingest).start()
    try:
        q.processAllAvailable()
        assert store.count() == 2
        time.sleep(0.02)
        (v / "a.md").write_text("---\nt: x\n---\nalpha CHANGED")
        (v / "c.md").write_text("---\nt: x\n---\ngamma text")
        q.processAllAvailable()
    finally:
        q.stop()
    assert store.count() == 3
    # the post-edit batches carried exactly the changed + new file —
    # never b.md. (Micro-batch BOUNDARIES are not guaranteed: under
    # load the two files can arrive in separate batches, so assert on
    # the union, not per-batch contents — the per-batch form flaked
    # ~1-in-5 under suite load.)
    later = [p for b in seen_batches[1:] for p in b]
    assert sorted(set(later)) == ["a.md", "c.md"]
    assert len(later) == 2  # each advanced file emitted exactly once
    # the changed file's vector tracks the new body (store is float32)
    import numpy as np

    got = {r.path: r.vector for r in store.read().collect()}
    expect = [float(np.float32(x)) for x in model.encode(["alpha CHANGED"])[0]]
    assert got["a.md"] == expect


def test_path_filter_pushdown_prunes_listing(registered, vault):
    """Predicates on `path` must prune the file LISTING before any I/O:
    the reader accepts them in pushFilters and partitions() shrinks;
    results match the unpushed filter exactly."""
    from pyspark.sql import functions as F

    from frontmatter_mcp_spark.sources.datasource import FrontmatterReader

    df = _read(registered, vault).filter(F.col("path").startswith("sub/"))
    assert [r.path for r in df.collect()] == ["sub/b.md"]

    # unit: the reader really pruned (not Spark post-filtering)
    from pyspark.sql.datasource import IsNotNull, StringStartsWith

    reader = FrontmatterReader({"path": str(vault)}, _read(registered, vault).schema)
    leftover = list(
        reader.pushFilters(
            [StringStartsWith(("path",), "sub/"), IsNotNull(("title",))]
        )
    )
    assert [type(f).__name__ for f in leftover] == ["IsNotNull"]
    paths = [p for c in reader.partitions() for p in c.paths]
    assert len(paths) == 1 and paths[0].endswith("b.md")


def test_mtime_filter_pushdown_skips_unopened_files(registered, vault, tmp_path):
    """Range predicates on `_mtime` are decided from the stat alone —
    the changed-since-X incremental scan: files behind the cutoff are
    never opened (verified by making one unreadable after listing...
    here by counting rows and the pruned unit listing)."""
    import os

    from pyspark.sql import functions as F

    from frontmatter_mcp_spark.sources.datasource import FrontmatterReader

    v = tmp_path / "mt_vault"
    v.mkdir()
    (v / "old.md").write_text("---\nk: 1\n---\nx")
    (v / "new.md").write_text("---\nk: 2\n---\ny")
    os.utime(v / "old.md", (1_000, 1_000))
    os.utime(v / "new.md", (2_000_000_000, 2_000_000_000))

    df = _read(registered, v).filter(F.col("_mtime") > 1_000_000_000.0)
    assert [r.path for r in df.collect()] == ["new.md"]

    from pyspark.sql.datasource import GreaterThan

    reader = FrontmatterReader({"path": str(v)}, _read(registered, v).schema)
    leftover = list(reader.pushFilters([GreaterThan(("_mtime",), 1_000_000_000.0)]))
    assert leftover == []
    rows = [r for c in reader.partitions() for r in reader.read(c)]
    assert len(rows) == 1
