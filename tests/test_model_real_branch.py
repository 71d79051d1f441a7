"""Real-model branch of EmbeddingModel, exercised via an injected fake
sentence_transformers module (the real library isn't in this container;
reference behavior at semantic/model.py:28-37, ADR-0009)."""

from __future__ import annotations

import sys
import types

import pytest

from frontmatter_mcp_spark.semantic.model import EmbeddingModel


class _FakeST:
    """Deterministic stand-in for sentence_transformers.SentenceTransformer."""

    dim = 8
    instances: list["_FakeST"] = []

    def __init__(self, model_name):
        self.model_name = model_name
        self.encode_calls: list[list[str]] = []
        _FakeST.instances.append(self)

    def get_sentence_embedding_dimension(self):
        return self.dim

    def encode(self, texts):
        import numpy as np

        self.encode_calls.append(list(texts))
        # row i = [len(text), i, 1...] as float32, like a real model's ndarray
        return np.array(
            [[float(len(t)), float(i)] + [1.0] * (self.dim - 2) for i, t in enumerate(texts)],
            dtype=np.float32,
        )


@pytest.fixture()
def fake_st(monkeypatch):
    mod = types.ModuleType("sentence_transformers")
    mod.SentenceTransformer = _FakeST
    monkeypatch.setitem(sys.modules, "sentence_transformers", mod)
    _FakeST.instances.clear()
    yield mod


def test_real_branch_loads_model_lazily(fake_st):
    m = EmbeddingModel(model_name="cl-nagoya/ruri-v3-30m")
    assert _FakeST.instances == []  # nothing loaded yet
    assert m.get_dimension() == 8  # dimension discovered from the model
    assert len(_FakeST.instances) == 1  # loaded exactly once
    assert _FakeST.instances[0].model_name == "cl-nagoya/ruri-v3-30m"
    assert m.name == "cl-nagoya/ruri-v3-30m"  # model-name metadata
    m.encode(["x"])
    assert len(_FakeST.instances) == 1  # cached across calls


def test_real_branch_encode_batching_and_types(fake_st):
    m = EmbeddingModel(model_name="some/model")
    out = m.encode(["hello", "worldly"])
    st = _FakeST.instances[0]
    assert st.encode_calls == [["hello", "worldly"]]  # one batched call
    assert len(out) == 2 and all(len(v) == 8 for v in out)
    # ndarray rows converted to plain python float lists (pickle-able
    # into pandas UDF closures)
    assert all(type(x) is float for v in out for x in v)
    assert out[0][0] == 5.0 and out[1][0] == 7.0
    assert out[0][1] == 0.0 and out[1][1] == 1.0


def test_no_model_name_uses_hash_embedder_even_when_lib_present(fake_st):
    m = EmbeddingModel()
    assert m.get_dimension() == 64
    assert m.name.startswith("hash-embedder")
    assert _FakeST.instances == []


@pytest.fixture()
def fake_ruri(monkeypatch):
    # Defined INSIDE the fixture on purpose: test modules are not
    # importable from executor workers, so the class must be local for
    # cloudpickle to serialize engine closures holding it BY VALUE.
    class _FakeRuri:
        """256-dim stand-in honoring the reference's ruri-v3-30m
        contract (ADR-0009: dim 256): deterministic, similarity-
        preserving (delegates to the hash embedder), float32 ndarray
        output like the real library."""

        dim = 256

        def __init__(self, model_name):
            from frontmatter_mcp_spark.semantic.model import DeterministicHashEmbedder

            self.model_name = model_name
            self._h = DeterministicHashEmbedder(self.dim)

        def get_sentence_embedding_dimension(self):
            return self.dim

        def encode(self, texts):
            import numpy as np

            return np.array(self._h.encode(list(texts)), dtype=np.float32)

    mod = types.ModuleType("sentence_transformers")
    mod.SentenceTransformer = _FakeRuri
    monkeypatch.setitem(sys.modules, "sentence_transformers", mod)
    yield mod


def test_real_model_dim256_plumbing_end_to_end(spark, tmp_path, fake_ruri):
    """The reference's real-model path end-to-end (its test at
    tests/semantic/test_model.py:23-78: dim contract + similar-text
    ranking), with the library faked at dim 256: the dimension must
    flow through store metadata, indexed vectors, the schema
    advertisement, and cosine ranking must put same-topic docs first."""
    import json

    from frontmatter_mcp_spark.engine import FrontmatterEngine

    vault = tmp_path / "vault"
    vault.mkdir()
    (vault / "spark.md").write_text(
        "---\ntitle: spark\n---\nspark catalyst optimizer shuffles partitions\n"
    )
    (vault / "cooking.md").write_text(
        "---\ntitle: cooking\n---\nrecipe butter flour sugar oven baking\n"
    )
    eng = FrontmatterEngine(
        spark,
        vault,
        semantic=True,
        cache_dir=tmp_path / "cache",
        model=EmbeddingModel(model_name="cl-nagoya/ruri-v3-30m"),
    )
    assert eng.model.name == "cl-nagoya/ruri-v3-30m"
    assert eng.model.get_dimension() == 256

    eng.indexer.start()
    eng.index_wait(60)

    meta = json.loads((tmp_path / "cache" / "metadata.json").read_text())
    assert meta == {"model": "cl-nagoya/ruri-v3-30m", "dim": 256}
    vecs = {r.path: r.vector for r in eng.store.read().collect()}
    assert len(vecs) == 2 and all(len(v) == 256 for v in vecs.values())

    inspect = eng.query_inspect("**/*.md")
    assert inspect["schema"]["embedding"]["type"] == "FLOAT[256]"

    out = eng.query(
        "**/*.md",
        """
        SELECT path,
               array_cosine_similarity(
                 CAST(embedding AS ARRAY<DOUBLE>),
                 CAST(embed('spark catalyst optimizer') AS ARRAY<DOUBLE>)) AS score
        FROM files WHERE embedding IS NOT NULL ORDER BY score DESC
        """,
    )
    assert [r["path"] for r in out["results"]] == ["spark.md", "cooking.md"]
    assert len(out["results"][0]) == 2


def test_missing_lib_falls_back_to_hash_embedder(monkeypatch):
    monkeypatch.setitem(sys.modules, "sentence_transformers", None)  # forces ImportError
    m = EmbeddingModel(model_name="some/model")
    assert m.name.startswith("hash-embedder")
    assert m.get_dimension() == 64
    vecs = m.encode(["deterministic text"])
    assert len(vecs) == 1 and len(vecs[0]) == 64


# ---------------------------------------------------------------------------
# Opt-in tests against the REAL sentence-transformers library (reference
# pyproject.toml:62-65 'slow' marker; tests/semantic/test_model.py:23-78).
# This container doesn't ship the package, so they skip here — but where it
# exists (pip install '.[semantic]') they exercise the genuine import-try
# branch of EmbeddingModel._load end-to-end, so that branch is never
# permanently dead code. Run with: pytest -m slow
# ---------------------------------------------------------------------------
_has_st = True
try:  # pragma: no cover - environment probe
    import sentence_transformers  # type: ignore  # noqa: F401
except ImportError:
    _has_st = False

# all-MiniLM-L6-v2: the smallest widely-mirrored sentence-transformers
# model — the point is exercising the real branch, not the reference's
# Japanese-tuned default (whose contract the dim-256 fake covers above)
_REAL_MODEL = "sentence-transformers/all-MiniLM-L6-v2"


@pytest.mark.slow
@pytest.mark.skipif(not _has_st, reason="sentence-transformers not installed")
class TestRealSentenceTransformers:
    def test_dimension_and_encode_shapes(self):
        m = EmbeddingModel(model_name=_REAL_MODEL)
        dim = m.get_dimension()
        assert isinstance(dim, int) and dim > 0
        out = m.encode(["hello world", "goodbye"])
        assert len(out) == 2 and all(len(v) == dim for v in out)
        assert all(type(x) is float for v in out for x in v)

    def test_similar_texts_rank_higher(self):
        m = EmbeddingModel(model_name=_REAL_MODEL)

        def cos(a, b):
            num = sum(x * y for x, y in zip(a, b))
            den = (sum(x * x for x in a) * sum(y * y for y in b)) ** 0.5
            return num / den

        e1, e2, e3 = m.encode(
            ["I feel great today", "I am feeling well today", "I studied programming"]
        )
        assert cos(e1, e2) > cos(e1, e3)
