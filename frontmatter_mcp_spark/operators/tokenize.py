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


def bpe_merge_steps(
    words,
    word_col: str = "w",
    count_col: str = "wc",
    iters: int = 3,
    persist_fn=lambda d: d,
):
    """Iterative BPE vocabulary induction over a (word, count) table: the
    training loop whose single-step scoring is text.bigram_merge_candidates.

    Each word starts as its character sequence; every step (1) counts
    adjacent symbol pairs weighted by word frequency, (2) picks the top
    pair (count desc, pair asc — a total order), (3) merges it everywhere
    via a TWO-PASS left-to-right literal replace on the space-joined
    symbol string (pass 2 catches occurrences whose leading space was
    consumed by pass 1 — an engine-portable approximation of greedy BPE;
    both engines' `replace` scan identically, so the oracle replay is
    byte-exact). Emits one row per step: the merged pair, its count, and
    the corpus-wide distinct-symbol count after the merge.

    Scale shape: the loop runs over the VOCABULARY (|distinct words|,
    not the corpus — the corpus is touched once by the caller's word
    count). Per step: one explode + map-side-combined pair aggregate,
    a 1-row top-pair broadcast, and a narrow merge projection. Each
    step's sequence table feeds three consumers (next pair count, merge,
    symbol census) — pass ``persist_fn`` to materialize it once.

    Returns (step, pair, merged, pair_count, n_symbols).
    """
    rows: list = []
    _bpe_loop(words, word_col, count_col, iters, persist_fn, rows, keep_word=False)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def bpe_segment_vocab(
    words,
    word_col: str = "w",
    count_col: str = "wc",
    iters: int = 3,
    persist_fn=lambda d: d,
):
    """The APPLY side of BPE training: run the same merge loop as
    ``bpe_merge_steps`` (bit-identical pair choices) and return the
    final (word, seq) segmentation table — the vocabulary artifact a
    tokenizer joins against the corpus token stream to encode it."""
    return _bpe_loop(
        words, word_col, count_col, iters, persist_fn, stats_rows=None, keep_word=True
    )


def unigram_induce(
    words,
    word_col: str = "w",
    count_col: str = "wc",
    max_piece: int = 3,
    vocab_size: int = 200,
    top: int = 50,
    persist_fn=lambda d: d,
):
    """SentencePiece-style unigram-LM tokenizer induction (hard-EM, one
    E+M round) with a fully INTEGER objective so both engines agree
    bit-for-bit — the engine-portable tie-break story that true
    log-probability EM lacks (libm `ln` differs in the last ulp across
    engines, and a tokenizer's argmax segmentation is exactly the kind
    of computation where one ulp flips a token boundary).

    Pipeline (all Catalyst, zero Python in the hot path):
    1. candidate pieces: every substring of length 1..max_piece of every
       vocabulary word, frequency-weighted; the top ``vocab_size``
       multi-char pieces (freq DESC, piece ASC — a total order) plus ALL
       single characters (guarantees every word segments).
    2. E-step: per-word optimal segmentation by dynamic programming over
       character positions — objective lexicographic
       (fewest tokens, then max total piece frequency, then longest
       final piece): integers only, so the DP argmin is exact. The DP
       runs as one F.aggregate fold per word (array-of-states
       accumulator), piece costs looked up in a per-word map built by a
       broadcast join against the piece table.
    3. backtrack: a second fold walks the stored back-pointers to emit
       the chosen pieces.
    4. M-step: piece counts re-estimated from the Viterbi segmentations
       (sum of word frequencies over uses).

    Scale shape: the loop-free DP runs over the VOCABULARY (distinct
    words), never the corpus; the piece table is a broadcast; the only
    shuffles are vocabulary-sized aggregates (candidate counting, the
    per-word cost-map regroup, the M-step count). The corpus is touched
    once, by the caller's word count.

    Returns (piece, piece_len, est_count, vocab_rank) — the ``top``
    re-estimated pieces.
    """
    from pyspark.sql import Window

    seg = unigram_segment_vocab(
        words, word_col, count_col, max_piece, vocab_size, persist_fn
    )
    used = seg.select("wc", F.explode("ps").alias("piece"))
    est = used.groupBy("piece").agg(F.sum("wc").cast("long").alias("est_count"))
    ranked = est.orderBy(F.col("est_count").desc(), "piece").limit(top)
    win = Window.orderBy(F.col("est_count").desc(), "piece")
    return ranked.select(
        "piece",
        F.length("piece").cast("int").alias("piece_len"),
        "est_count",
        F.row_number().over(win).cast("int").alias("vocab_rank"),
    )


def unigram_segment_vocab(
    words,
    word_col: str = "w",
    count_col: str = "wc",
    max_piece: int = 3,
    vocab_size: int = 200,
    persist_fn=lambda d: d,
):
    """The E-step of ``unigram_induce`` as a reusable artifact: per-word
    Viterbi-optimal segmentation under the integer objective, returned
    as (w, wc, ps: array<string>) — the vocabulary table a tokenizer
    joins against the corpus token stream to encode it (the unigram
    counterpart of ``bpe_segment_vocab``)."""
    K = max_piece
    base = persist_fn(
        words.select(
            F.col(word_col).alias("w"), F.col(count_col).cast("long").alias("wc")
        )
    )
    # every (position, piece-length) substring occurrence, frequency-weighted
    occ = (
        base.select(
            "w", "wc", F.explode(F.sequence(F.lit(1), F.length("w"))).alias("t")
        )
        .select(
            "w",
            "wc",
            "t",
            F.explode(F.array(*[F.lit(k) for k in range(1, K + 1)])).alias("k"),
        )
        .filter(F.col("t") >= F.col("k"))
        .withColumn(
            "piece", F.col("w").substr(F.col("t") - F.col("k") + 1, F.col("k"))
        )
    )
    freqs = occ.groupBy("piece").agg(F.sum("wc").cast("long").alias("freq"))
    chars = freqs.filter(F.length("piece") == 1)
    multi = (
        freqs.filter(F.length("piece") > 1)
        .orderBy(F.col("freq").desc(), "piece")
        .limit(vocab_size)
    )
    pieces = chars.unionAll(multi)
    # per-word cost map: (t * (K+1) + k) -> piece frequency; pieces
    # outside the vocabulary simply have no entry (NULL lookup = invalid)
    cm = (
        occ.join(F.broadcast(pieces), "piece")
        .select(
            "w",
            "wc",
            (F.col("t") * (K + 1) + F.col("k")).cast("int").alias("key"),
            F.col("freq").alias("value"),
        )
        .groupBy("w", "wc")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("key", "value"))
            ).alias("cm")
        )
    )

    def better_or_tie(c, b):
        # c beats-or-ties b under (tokens ASC, sumfreq DESC); called with
        # c's k greater than b's, so a tie also replaces (back DESC)
        return (c["tokens"] < b["tokens"]) | (
            (c["tokens"] == b["tokens"]) & (c["sumfreq"] >= b["sumfreq"])
        )

    def dp_step(acc, t):
        best = None
        for k in range(1, K + 1):
            f = F.element_at(F.col("cm"), (t * (K + 1) + F.lit(k)).cast("int"))
            # acc element i holds the state of position i-1; clamp the
            # index so the k > t branch (discarded by `valid`) never
            # feeds element_at a non-positive index
            prev_idx = F.when(t >= F.lit(k), t - F.lit(k) + 1).otherwise(F.lit(1))
            prev = F.element_at(acc, prev_idx)
            c = F.struct(
                (prev["tokens"] + 1).cast("int").alias("tokens"),
                (prev["sumfreq"] + f).cast("long").alias("sumfreq"),
                F.lit(k).cast("int").alias("back"),
            )
            if best is None:
                best = c  # k=1 always valid: single chars are always in vocab
            else:
                valid = (t >= F.lit(k)) & f.isNotNull()
                best = F.when(valid & better_or_tie(c, best), c).otherwise(best)
        return F.concat(acc, F.array(best))

    dp_init = F.array(
        F.struct(
            F.lit(0).cast("int").alias("tokens"),
            F.lit(0).cast("long").alias("sumfreq"),
            F.lit(0).cast("int").alias("back"),
        )
    )
    with_dp = cm.withColumn(
        "dp", F.aggregate(F.sequence(F.lit(1), F.length("w")), dp_init, dp_step)
    )

    def bt_step(acc, _):
        pos = acc["pos"]
        back = F.element_at(F.col("dp"), pos + 1)["back"]
        # prepend: the walk runs right-to-left, so prepending yields the
        # segmentation in word order
        nxt = F.struct(
            (pos - back).cast("int").alias("pos"),
            F.concat(
                F.array(F.col("w").substr(pos - back + 1, back)), acc["ps"]
            ).alias("ps"),
        )
        return F.when(pos > 0, nxt).otherwise(acc)

    bt_init = F.struct(
        F.length("w").cast("int").alias("pos"),
        F.array().cast("array<string>").alias("ps"),
    )
    return with_dp.select(
        "w",
        "wc",
        F.aggregate(
            F.sequence(F.lit(1), F.length("w")),
            bt_init,
            bt_step,
            lambda acc: acc["ps"],
        ).alias("ps"),
    )


def _bpe_loop(
    words,
    word_col: str,
    count_col: str,
    iters: int,
    persist_fn,
    stats_rows: list | None,
    keep_word: bool,
):
    """Shared BPE merge loop. Appends per-step stat rows to
    ``stats_rows`` when given; returns the final sequence table
    (with the word column when ``keep_word``).

    Assumes the vocabulary still contains at least one adjacent pair at
    every step (true for any natural corpus and iters in the hundreds);
    a fully-merged vocabulary would make the 1-row top-pair table empty
    and the cross join would propagate the empty set."""
    from pyspark.sql import functions as F

    carry = [F.col(word_col).alias("w")] if keep_word else []
    seq = persist_fn(
        words.select(
            *carry,
            F.col(count_col).alias("wc"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.length(word_col)),
                    lambda i: F.substr(F.col(word_col), i, F.lit(1)),
                ),
            ).alias("seq"),
        )
    )
    keep_cols = (["w"] if keep_word else []) + ["wc"]
    for step in range(1, iters + 1):
        sym = F.split(F.col("seq"), " ", -1)
        sz = F.size(sym)
        pairs = F.zip_with(
            F.slice(sym, 1, sz - 1),
            F.slice(sym, 2, sz - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        counts = (
            seq.select("wc", F.explode(pairs).alias("pr"))
            .groupBy("pr")
            .agg(F.sum("wc").cast("long").alias("c"))
        )
        top = counts.orderBy(F.col("c").desc(), F.col("pr")).limit(1)
        pat = F.concat(F.lit(" "), F.col("pr"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.replace(F.col("pr"), F.lit(" "), F.lit("")), F.lit(" "))
        padded = F.concat(F.lit(" "), F.col("seq"), F.lit(" "))
        merged_seq = F.trim(F.replace(F.replace(padded, pat, rep), pat, rep))
        nxt = seq.crossJoin(F.broadcast(top)).select(
            *keep_cols, merged_seq.alias("seq")
        )
        nxt = persist_fn(nxt) if step < iters else nxt
        if stats_rows is not None:
            census = nxt.select(
                F.explode(F.split(F.col("seq"), " ", -1)).alias("s")
            ).agg(F.count_distinct("s").cast("int").alias("n_symbols"))
            stats_rows.append(
                top.crossJoin(F.broadcast(census)).select(
                    F.lit(step).alias("step"),
                    F.col("pr").alias("pair"),
                    F.replace(F.col("pr"), F.lit(" "), F.lit("")).alias("merged"),
                    F.col("c").alias("pair_count"),
                    "n_symbols",
                )
            )
        seq = nxt
    return seq
