"""Model-based randomized testing of the bucket-incremental embedding
store: an arbitrary interleaving of upsert / delete / reopen must leave
the store exactly equal to a plain dict model applying the same
insert-or-replace / remove semantics (reference cache.py:127-141).
Spark actions per step make hypothesis impractical here; a seeded
random walk gives the same coverage reproducibly."""

from __future__ import annotations

import random

import pytest

from frontmatter_mcp_spark.semantic.store import EmbeddingStore

DIM = 4
PATHS = [f"doc_{i:02d}.md" for i in range(30)]  # collides across buckets


def _vec(seed: int) -> list[float]:
    # integer-valued components: exact under the store's float32 round-trip
    return [float(seed)] * DIM


@pytest.mark.parametrize("seed", [7, 23])
def test_store_matches_dict_model_under_random_ops(spark, tmp_path, seed):
    rng = random.Random(seed)
    store = EmbeddingStore(spark, tmp_path / "c", "m", DIM)
    schema = store.read().schema
    model: dict[str, tuple[float, list[float]]] = {}

    for step in range(12):
        op = rng.choice(["upsert", "upsert", "upsert", "delete", "reopen"])
        if op == "upsert":
            chosen = rng.sample(PATHS, rng.randint(1, 8))
            rows = [(p, float(step), _vec(step * 100 + i)) for i, p in enumerate(chosen)]
            store.upsert(spark.createDataFrame(rows, schema))
            for p, mt, v in rows:
                model[p] = (mt, v)
        elif op == "delete":
            chosen = rng.sample(PATHS, rng.randint(1, 6))
            store.delete(chosen)
            for p in chosen:
                model.pop(p, None)
        else:  # reopen: a fresh instance sees the same state
            store = EmbeddingStore(spark, tmp_path / "c", "m", DIM)

        got = {r.path: (r.mtime, list(r.vector)) for r in store.read().collect()}
        assert got == model, f"diverged at step {step} after {op}"

    assert store.count() == len(model)


def test_store_size_bounded_under_sustained_churn(spark, tmp_path):
    """A long-running writer must not strand live data across ever more
    generation dirs: with auto-compaction the on-disk generation count
    stays O(MAX_LIVE_GENERATIONS) however many commits have run, and
    the contents remain exactly the dict model throughout."""
    store = EmbeddingStore(spark, tmp_path / "churn", "m", DIM)
    store.MAX_LIVE_GENERATIONS = 3
    schema = store.read().schema
    model: dict[str, tuple[float, list[float]]] = {}

    for step in range(14):
        p = PATHS[step % 7]
        rows = [(p, float(step), _vec(step))]
        store.upsert(spark.createDataFrame(rows, schema))
        model[p] = (float(step), _vec(step))
        on_disk = len(list(store.data_dir.glob("gen-*")))
        # live gens <= 3 (compaction bound) plus at most a couple of
        # retired dirs inside their one-commit grace window
        assert on_disk <= 6, f"step {step}: {on_disk} generation dirs on disk"
        assert len(store.live_generations()) <= 3

    got = {r.path: (r.mtime, list(r.vector)) for r in store.read().collect()}
    assert got == model


def test_retention_grace_keeps_stale_reader_resolvable(spark, tmp_path):
    """retention_commits widens the snapshot-expiry grace: a reader that
    resolved the manifest N-1 commits ago must still find every file it
    plans to scan. With retention_commits=3 a snapshot survives two
    subsequent commits (and still sees its ORIGINAL values)."""
    store = EmbeddingStore(spark, tmp_path / "grace", "m", DIM, retention_commits=3)
    schema = store.read().schema
    store.upsert(spark.createDataFrame([("a.md", 1.0, _vec(1))], schema))

    snapshot = store.read()  # resolves the commit-1 manifest NOW, lazily
    store.upsert(spark.createDataFrame([("a.md", 2.0, _vec(2))], schema))
    store.upsert(spark.createDataFrame([("a.md", 3.0, _vec(3))], schema))

    got = [(r.path, r.mtime) for r in snapshot.collect()]
    assert got == [("a.md", 1.0)], got
    assert [(r.path, r.mtime) for r in store.read().collect()] == [("a.md", 3.0)]


def test_stranded_generation_does_not_wedge_commits(spark, tmp_path):
    """A crash between the staging rename and the manifest flip strands
    a fully-renamed generation dir while the manifest's counter never
    advanced. The NEXT commit in the same process computes the same gen
    name — os.replace onto the non-empty stranded dir used to raise
    ENOTEMPTY and wedge every write until reopen. The stranded dir is
    unreferenced by construction, so the commit must clear and proceed."""
    store = EmbeddingStore(spark, tmp_path / "wedge", "m", DIM)
    schema = store.read().schema
    store.upsert(spark.createDataFrame([("a.md", 1.0, _vec(1))], schema))

    m_gen = 1  # manifest gen after one commit
    stranded = store.data_dir / f"gen-{m_gen + 1:06d}"
    (stranded / "bucket=0").mkdir(parents=True)
    (stranded / "bucket=0" / "part-junk.parquet").write_text("junk")

    store.upsert(spark.createDataFrame([("b.md", 2.0, _vec(2))], schema))
    got = {r.path: r.mtime for r in store.read().collect()}
    assert got == {"a.md": 1.0, "b.md": 2.0}


def test_time_travel_within_retention(spark, tmp_path):
    """read(at_generation=G) resolves the store as of commit G while the
    snapshot's dirs survive the retention window, and raises a directed
    error once it has aged out — the scaled-down Iceberg snapshot log."""
    store = EmbeddingStore(spark, tmp_path / "tt", "m", DIM, retention_commits=2)
    schema = store.read().schema
    store.upsert(spark.createDataFrame([("a.md", 1.0, _vec(1))], schema))
    g1 = store.current_generation()
    store.upsert(spark.createDataFrame([("a.md", 2.0, _vec(2))], schema))

    old = [(r.path, r.mtime) for r in store.read(at_generation=g1).collect()]
    assert old == [("a.md", 1.0)]
    assert [(r.path, r.mtime) for r in store.read().collect()] == [("a.md", 2.0)]

    # two more commits age the g1 snapshot past retention_commits=2
    store.upsert(spark.createDataFrame([("a.md", 3.0, _vec(3))], schema))
    store.upsert(spark.createDataFrame([("a.md", 4.0, _vec(4))], schema))
    with pytest.raises(ValueError, match="retention window"):
        store.read(at_generation=g1)


def test_concurrent_writers_serialize_instead_of_losing_updates(spark, tmp_path):
    """Two writer handles upserting DIFFERENT paths in the SAME bucket
    concurrently: without the writer lock one read-merge-flip can build
    its merge from a manifest that predates the other's commit and
    silently drop that bucket's rows. The flock serializes the whole
    cycle, so every path must survive."""
    import hashlib
    import threading

    def bucket_of(path: str) -> int:
        return int(hashlib.md5(path.encode()).hexdigest()[:4], 16) % 64

    # find several distinct paths hashing into one bucket
    same_bucket = []
    i = 0
    while len(same_bucket) < 4:
        p = f"doc_{i}.md"
        if bucket_of(p) == bucket_of("doc_0.md"):
            same_bucket.append(p)
        i += 1

    a = EmbeddingStore(spark, tmp_path / "mw", "m", DIM)
    b = EmbeddingStore(spark, tmp_path / "mw", "m", DIM)
    schema = a.read().schema
    errs = []

    def write(store, paths, mt):
        try:
            rows = [(p, mt, _vec(int(mt))) for p in paths]
            store.upsert(spark.createDataFrame(rows, schema))
        except Exception as e:  # noqa: BLE001 - surface in main thread
            errs.append(e)

    t1 = threading.Thread(target=write, args=(a, same_bucket[:2], 1.0))
    t2 = threading.Thread(target=write, args=(b, same_bucket[2:], 2.0))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs

    got = {r.path for r in a.read().collect()}
    assert got == set(same_bucket), f"lost update: {set(same_bucket) - got}"


def test_vacuum_reclaims_after_lowering_retention(spark, tmp_path):
    """vacuum() prunes retired dirs and snapshot-log entries past the
    CURRENT policy without a new commit — the path for an operator who
    lowers retention_commits on an existing store (scheduled deletion
    only runs at commit time)."""
    store = EmbeddingStore(spark, tmp_path / "v", "m", DIM, retention_commits=5)
    schema = store.read().schema
    for step in range(4):
        store.upsert(spark.createDataFrame([("a.md", float(step), _vec(step))], schema))
    # retirements from commits 2-4 are all still inside the wide window
    assert len(list(store.data_dir.glob("gen-*"))) == 4

    lowered = EmbeddingStore(spark, tmp_path / "v", "m", DIM, retention_commits=1)
    removed = lowered.vacuum()
    assert removed >= 2
    assert len(list(lowered.data_dir.glob("gen-*"))) <= 2  # live + 1 grace
    assert [(r.path, r.mtime) for r in lowered.read().collect()] == [("a.md", 3.0)]
    history = sorted(p.name for p in lowered.history_dir.glob("manifest-*.json"))
    assert history == ["manifest-000003.json", "manifest-000004.json"]
    assert lowered.vacuum() == 0  # idempotent


def test_store_admin_cli_status_and_vacuum(spark, tmp_path, capsys):
    """The maintenance CLI: status is read-only and Spark-free, vacuum
    applies a lowered retention from the command line, and both emit one
    JSON line. Model/dim come from the store's own metadata.json (a CLI
    typo must never trigger the model-change wipe)."""
    import json

    from frontmatter_mcp_spark.semantic import store_admin

    d = tmp_path / "adm"
    store = EmbeddingStore(spark, d, "m", DIM, retention_commits=5)
    schema = store.read().schema
    for step in range(4):
        store.upsert(
            spark.createDataFrame([("a.md", float(step), _vec(step))], schema)
        )
    manifest_before = (d / "manifest.json").read_text()

    assert store_admin.main(["status", str(d)]) == 0
    st = json.loads(capsys.readouterr().out.strip())
    assert st["model"] == "m" and st["dim"] == DIM
    assert st["generation"] == 4 and st["on_disk_generation_dirs"] == 4
    # status never mutates the store
    assert (d / "manifest.json").read_text() == manifest_before

    assert store_admin.main(["vacuum", str(d), "--retention-commits", "1"]) == 0
    vc = json.loads(capsys.readouterr().out.strip())
    assert vc["removed_bucket_dirs"] >= 2
    assert vc["on_disk_generation_dirs"] <= 2
    # the data survives maintenance
    reopened = EmbeddingStore(spark, d, "m", DIM)
    assert [(r.path, r.mtime) for r in reopened.read().collect()] == [("a.md", 3.0)]

    # not-a-store: directed error, no wipe
    with pytest.raises(SystemExit, match="not an embedding store"):
        store_admin.main(["status", str(tmp_path / "nope")])


def test_same_instance_concurrent_threads_serialize(spark, tmp_path):
    """Two threads sharing ONE store instance must serialize through
    the flock — the re-entrancy depth is thread-local, so a sibling
    thread is NOT mistaken for a re-entrant call (which would let both
    run the read-merge-flip concurrently and drop same-bucket rows)."""
    import threading

    from frontmatter_mcp_spark.semantic.store import path_bucket as _pb

    def bucket_of(p):
        import hashlib

        return int(hashlib.md5(p.encode()).hexdigest()[:4], 16) % 64

    same_bucket, i = [], 0
    while len(same_bucket) < 4:
        p = f"doc_{i}.md"
        if bucket_of(p) == bucket_of("doc_0.md"):
            same_bucket.append(p)
        i += 1

    store = EmbeddingStore(spark, tmp_path / "mt", "m", DIM)
    schema = store.read().schema
    errs = []

    def write(paths, mt):
        try:
            rows = [(p, mt, _vec(int(mt))) for p in paths]
            store.upsert(spark.createDataFrame(rows, schema))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=write, args=(same_bucket[:2], 1.0))
    t2 = threading.Thread(target=write, args=(same_bucket[2:], 2.0))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    got = {r.path for r in store.read().collect()}
    assert got == set(same_bucket), f"lost update: {set(same_bucket) - got}"
