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
