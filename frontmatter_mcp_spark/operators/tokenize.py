"""Token counting and order-sensitive fingerprinting for corpus pipelines.

- ``bpe_ish_token_count``: a BPE-flavored tokenizer approximation — the
  regex splits letter runs, short digit runs, and punctuation runs the
  way byte-pair encoders tend to, giving a far better token estimate
  than whitespace counting (~chars/4 heuristic is also provided).
- ``rolling_hash``: a polynomial rolling hash over the token stream
  (order-SENSITIVE, unlike text.bow_fingerprint) — the building block of
  content-defined chunking / shift-resistant fingerprints.

Everything is a Catalyst expression; the hash primitives are md5-derived
so an external SQL oracle can recompute them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# letter runs (with optional apostrophe suffix), 1-3 digit runs, runs of
# other non-space symbols — a GPT-2-ish pre-tokenization shape
BPE_ISH_PATTERN = r"[A-Za-z]+(?:'[a-z]+)?|[0-9]{1,3}|[^\sA-Za-z0-9]+"

_HEX = "0123456789abcdef"
MOD = 1_000_000_007
BASE = 31


def bpe_ish_token_count(text: Column) -> Column:
    """Count BPE-ish tokens (JVM regexp, no UDF)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def char_estimate_token_count(text: Column) -> Column:
    """The classic ~4-chars-per-token estimate."""
    return F.ceil(F.length(text) / 4).cast("int")


def _token_value(tok: Column) -> Column:
    """First 8 hex digits of md5(token) as a 32-bit int, built from
    engine-portable primitives (instr over the hex alphabet)."""
    h = F.md5(tok)
    val = F.lit(0).cast("long")
    for i in range(1, 9):
        digit = F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1
        val = val * 16 + digit
    return val


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash over whitespace tokens:
    acc = (acc * BASE + md5_32(token)) mod MOD. Order-sensitive."""
    toks = F.filter(F.split(F.trim(text), r"\s+", -1), lambda t: t != "")
    vals = F.transform(toks, _token_value)
    return F.aggregate(
        vals, F.lit(0).cast("long"), lambda acc, v: (acc * BASE + v) % MOD
    )


def window_fingerprints(text: Column, window: int = 8) -> Column:
    """Rolling fingerprints of sliding token windows: hash of each
    `window`-token span. The shift-resistant dedup primitive (two docs
    sharing any window fingerprint share a `window`-token run verbatim).
    Span construction reuses the CSE-safe shifted-slice zip (see
    dedup.word_shingles for why not per-index element_at)."""
    from frontmatter_mcp_spark.operators.dedup import word_shingles

    spans = word_shingles(text, n=window)
    return F.transform(spans, lambda s: F.substring(F.md5(s), 1, 16))
