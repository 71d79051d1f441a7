"""Embedding model wrapper (reference: semantic/model.py:10-64).

The reference lazily loads a sentence-transformers model
(cl-nagoya/ruri-v3-30m, dim 256, ADR-0009). That stack isn't in this
container, so the default is a **deterministic hash embedder**: a real
sentence-transformers model is used when the library is importable, and
the hash embedder otherwise. The hash embedder is not semantically
meaningful but is deterministic, cheap, pickle-able (ships inside a
pandas UDF closure to executors), and preserves one useful property for
tests: texts sharing more tokens get higher cosine similarity.
"""

from __future__ import annotations

import hashlib
import math


class DeterministicHashEmbedder:
    """Bag-of-tokens hash embedding: each token adds an md5-derived
    pseudo-random pattern; the sum is L2-normalized.

    Dimension i's contribution for a token comes from byte (i % 16) of
    md5(f"{token}|{i // 16}") — chunk-KEYED hashes rather than digest
    chaining, so the exact computation is re-expressible in any SQL
    engine with md5/substr (the q44 oracle recomputes it bit-for-bit in
    DuckDB). All arithmetic is sequential double folds in a fixed order.
    """

    def __init__(self, dim: int = 64) -> None:
        self.dim = dim
        self.name = f"hash-embedder-v2-{dim}"
        # token -> float64[dim] pattern. Tokens repeat heavily across a
        # corpus, so memoizing the md5-derived pattern removes almost all
        # hashing from the hot path (the real-model analogue: an
        # embedding cache). Bounded to keep executor memory flat.
        self._memo: dict[str, "object"] = {}

    def encode(self, texts: list[str]) -> list[list[float]]:
        return [self._encode_one(t) for t in texts]

    def _token_pattern(self, tok: str):
        import numpy as np

        v = self._memo.get(tok)
        if v is None:
            n_chunks = (self.dim + 15) // 16
            parts = []
            for c in range(n_chunks):
                d = hashlib.md5(f"{tok}|{c}".encode()).digest()
                parts.append(
                    np.frombuffer(d, dtype=np.uint8)[: min(16, self.dim - c * 16)]
                )
            # same per-element ops as the scalar form: byte/255.0 - 0.5
            v = np.concatenate(parts).astype(np.float64) / 255.0 - 0.5
            if len(self._memo) > 200_000:
                self._memo.clear()
            self._memo[tok] = v
        return v

    def _encode_one(self, text: str) -> list[float]:
        import numpy as np

        toks = text.lower().split()
        acc = np.zeros(self.dim, dtype=np.float64)
        for tok in toks:  # token order == text order, sequential fold
            acc = acc + self._token_pattern(tok)
        vec = acc.tolist()
        norm = math.sqrt(sum(v * v for v in vec))
        if norm > 0:
            return (acc / norm).tolist()
        return vec

    def get_dimension(self) -> int:
        return self.dim


class EmbeddingModel:
    """Lazy-loading model facade. Prefers sentence-transformers when the
    package exists (reference behavior); falls back to the deterministic
    hash embedder. ``encode``/``get_dimension`` mirror the reference API."""

    def __init__(self, model_name: str | None = None, dim: int = 64) -> None:
        self.model_name = model_name
        self._dim = dim
        self._impl = None

    def _load(self):
        if self._impl is None:
            if self.model_name:
                try:
                    from sentence_transformers import SentenceTransformer  # type: ignore

                    st = SentenceTransformer(self.model_name)

                    class _STWrap:
                        dim = st.get_sentence_embedding_dimension()
                        name = self.model_name

                        def encode(self, texts):
                            return [list(map(float, v)) for v in st.encode(texts)]

                        def get_dimension(self):
                            return self.dim

                    self._impl = _STWrap()
                    return self._impl
                except ImportError:
                    pass
            self._impl = DeterministicHashEmbedder(self._dim)
        return self._impl

    @property
    def name(self) -> str:
        return self._load().name

    def encode(self, texts: list[str]) -> list[list[float]]:
        return self._load().encode(texts)

    def get_dimension(self) -> int:
        return self._load().get_dimension()
