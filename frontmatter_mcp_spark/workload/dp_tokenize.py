"""Tokenizer family: BPE and unigram training/encoding, vocabulary budgets, sequence packing and length economics.

Split out of workload/datapipe.py (round 8, VERDICT r07 item 7); the
aggregator module re-exports every name so existing imports keep
working. Queries register into workload.registry.QUERIES at import.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from frontmatter_mcp_spark.functions import vector
from frontmatter_mcp_spark.operators import dedup as dd
from frontmatter_mcp_spark.operators import similarity as sim
from frontmatter_mcp_spark.operators import text as tx
from frontmatter_mcp_spark.operators import tokenize as tk
from frontmatter_mcp_spark.sources import multimodal as mm
from frontmatter_mcp_spark import tables
from frontmatter_mcp_spark.tables import ensure_parallelism, load_table
from frontmatter_mcp_spark.operators.holds import hold, overlap
from frontmatter_mcp_spark.workload.registry import pin, register

# ---------------------------------------------------------------------------
# q63 — vocabulary build with cumulative coverage (tokenizer prep)
# ---------------------------------------------------------------------------
@register(
    "q63_vocab_coverage",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    words AS (SELECT unnest(w) AS term FROM toks),
    counts AS (SELECT term, COUNT(*) AS cnt FROM words GROUP BY 1),
    tot AS (SELECT SUM(cnt) AS total FROM counts)
    SELECT term, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS INT) AS rank,
           CAST(SUM(cnt) OVER (ORDER BY cnt DESC, term ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_cnt,
           round(CAST(SUM(cnt) OVER (ORDER BY cnt DESC, term ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE) / (SELECT total FROM tot), 6) AS coverage
    FROM counts
    """,
    doc="vocabulary building: global term frequencies with cumulative "
    "corpus coverage (how big a vocab covers X% of tokens). The window "
    "is over the AGGREGATED vocab (small), not the corpus",
)
def q63_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(tx.tokens(F.lower(F.col("text")))).alias("term"))
    counts = words.groupBy("term").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    # single-partition window: safe because it runs over the aggregated
    # vocabulary (|vocab| rows), not the token stream
    w = W.orderBy(F.desc("cnt"), F.asc("term")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "term",
            "cnt",
            F.row_number().over(w).cast("int").alias("rank"),
            F.sum("cnt").over(w).alias("cum_cnt"),
            F.round(
                F.sum("cnt").over(w).cast("double") / F.col("total"), 6
            ).alias("coverage"),
        )
    )

# ---------------------------------------------------------------------------
# q79 — document chunking: overlapping token windows (RAG/packing prep)
# ---------------------------------------------------------------------------
_CHUNK_SIZE = 32

_CHUNK_STRIDE = 24

_CHUNK_MIN = 8


@register(
    "q79_doc_chunking",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST((s - 1) / {_CHUNK_STRIDE} AS INT) AS chunk_idx,
             w[s : s + {_CHUNK_SIZE - 1}] AS chunk
      FROM toks, UNNEST(generate_series(1, len(w), {_CHUNK_STRIDE})) AS t(s)
    )
    SELECT doc_id, chunk_idx,
           CAST(len(chunk) AS INT) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_fp
    FROM chunks WHERE len(chunk) >= {_CHUNK_MIN}
    """,
    doc=f"document chunking for retrieval/packing: overlapping windows of "
    f"{_CHUNK_SIZE} tokens at stride {_CHUNK_STRIDE} (tail chunks under "
    f"{_CHUNK_MIN} tokens dropped); a narrow transform+explode, no shuffle",
)
def q79_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(toks), F.lit(_CHUNK_STRIDE)),
        lambda s: F.slice(toks, s, _CHUNK_SIZE),
    )
    return (
        d.select(F.col("doc_id"), F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .filter(F.size("chunk") >= _CHUNK_MIN)
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size("chunk").alias("n_tokens"),
            F.md5(F.array_join("chunk", " ")).alias("chunk_fp"),
        )
    )

# ---------------------------------------------------------------------------
# q80 — sequence packing: cumulative-sum bin assignment
# ---------------------------------------------------------------------------
_PACK_CAPACITY = 2048


@register(
    "q80_sequence_packing",
    f"""
    WITH toks AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_tokens) / {_PACK_CAPACITY}.0) AS INT) AS bin
      FROM toks
    )
    SELECT bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed GROUP BY 1
    """,
    doc=f"sequence packing: docs assigned to {_PACK_CAPACITY}-token training "
    "bins by exclusive cumulative sum in doc_id order. The global window "
    "is the deterministic spec; at 100 TB the same rule runs per "
    "partition range (sortWithinPartitions + per-range offsets)",
)
def q80_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.total_order import with_global_cumagg

    d = load_table(spark, sf_dir, "documents")
    # The global cumulative sum was a corpus-wide single-partition
    # window. Two-phase running sum instead: the doc_id bounds pass is
    # column-pruned (no tokenization), so tokenization runs twice
    # (offsets + local) — measured cheaper at sf0.1 than a pin
    # (ADR-0007 cold fan-out race) or an eager hold; the running sum (doc_id interpolation
    # buckets + broadcast per-bucket token offsets) is byte-identical.
    toks = d.select("doc_id", F.size(tx.tokens(F.col("text"))).alias("n_tokens"))
    packed = with_global_cumagg(
        toks, [("doc_id", True)], F.col("n_tokens"), agg="sum", out="__cum"
    ).select(
        "doc_id",
        "n_tokens",
        F.floor((F.col("__cum") - F.col("n_tokens")) / float(_PACK_CAPACITY))
        .cast("int")
        .alias("bin"),
    )
    return packed.groupBy("bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )

# ---------------------------------------------------------------------------
# q113 — BPE training loop: iterative merge induction (q98 scores ONE step;
# this runs the loop that actually builds the vocabulary)
# ---------------------------------------------------------------------------
_BPE_ITERS = 3

def _bpe_chain_ctes(iters: int) -> list[str]:
    """The shared merge-chain CTEs (replay of tokenize._bpe_loop): doc
    tokens, word counts, char-split s0, then a (pair-count, top-1,
    merged-sequence) triple per step. The word rides along through every
    s{t} so the apply side (q116) can join the final segmentation back
    to the corpus token stream."""
    mrg = "replace(pr, ' ', '')"

    def merge_expr(src: str) -> str:
        one = f"replace(' ' || {src} || ' ', ' ' || pr || ' ', ' ' || {mrg} || ' ')"
        return f"trim(replace({one}, ' ' || pr || ' ', ' ' || {mrg} || ' '))"

    ctes = [
        """toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                    x -> x <> '')) AS t
      FROM documents
    )""",
        """words AS (
      SELECT t AS w, CAST(COUNT(*) AS BIGINT) AS wc
      FROM toks WHERE regexp_matches(t, '^[a-z]+$') GROUP BY t
    )""",
        """s0 AS (
      SELECT w, wc,
             array_to_string(list_transform(generate_series(1, length(w)),
                                            i -> substr(w, i, 1)), ' ') AS seq
      FROM words
    )""",
    ]
    for t in range(1, iters + 1):
        p = t - 1
        ctes += [
            f"""c{t} AS (
      SELECT pr, CAST(SUM(wc) AS BIGINT) AS c FROM (
        SELECT wc, sym[i] || ' ' || sym[i + 1] AS pr
        FROM (SELECT wc, string_split(seq, ' ') AS sym FROM s{p}) q,
             UNNEST(generate_series(1, len(sym) - 1)) AS u(i)
        WHERE len(sym) >= 2
      ) GROUP BY pr
    )""",
            f"t{t} AS (SELECT pr, c FROM c{t} ORDER BY c DESC, pr LIMIT 1)",
            f"""s{t} AS (
      SELECT w, wc, {merge_expr('seq')} AS seq FROM s{p} CROSS JOIN t{t}
    )""",
        ]
    return ctes

def _bpe_merge_sql(iters: int = _BPE_ITERS) -> str:
    """Replay of tokenize.bpe_merge_steps: the shared chain plus a
    (symbol-census, stat-row) CTE pair per step."""
    mrg = "replace(pr, ' ', '')"
    ctes = _bpe_chain_ctes(iters)
    for t in range(1, iters + 1):
        ctes += [
            f"""v{t} AS (
      SELECT CAST(COUNT(DISTINCT s) AS INT) AS n_symbols
      FROM (SELECT unnest(string_split(seq, ' ')) AS s FROM s{t})
    )""",
            f"""r{t} AS (
      SELECT CAST({t} AS INT) AS step, pr AS pair, {mrg} AS merged,
             c AS pair_count, n_symbols
      FROM t{t} CROSS JOIN v{t}
    )""",
        ]
    joined = ",\n    ".join(ctes)
    union = "\n    UNION ALL ".join(f"SELECT * FROM r{t}" for t in range(1, iters + 1))
    return f"""
    WITH {joined}
    {union}
    """


@register(
    "q113_bpe_merge_loop",
    _bpe_merge_sql(),
    doc="BPE vocabulary induction LOOP: words start as character "
    "sequences; each step counts frequency-weighted adjacent symbol "
    "pairs, merges the top pair corpus-wide (two-pass left-to-right "
    "literal replace — engine-portable greedy), and reports the merge + "
    "post-merge symbol census. The loop runs over the VOCABULARY, not "
    "the corpus (one corpus pass builds the word counts); per step: one "
    "map-side-combined pair aggregate, a 1-row top-pair broadcast, a "
    "narrow merge projection. Oracle replays every step as CTEs",
)
def q113_bpe_merge_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    words = (
        d.select(F.explode(toks).alias("t"))
        .filter(F.col("t").rlike("^[a-z]+$"))
        .groupBy(F.col("t").alias("w"))
        .agg(F.count("*").cast("long").alias("wc"))
    )
    return tk.bpe_merge_steps(words, "w", "wc", iters=_BPE_ITERS, persist_fn=hold)

# ---------------------------------------------------------------------------
# q116 — BPE ENCODE: tokenize the corpus with the learned vocabulary
# (q113 trains the merges; this applies them — the tokenizer stage)
# ---------------------------------------------------------------------------
def _bpe_encode_sql(iters: int = _BPE_ITERS) -> str:
    joined = ",\n    ".join(
        _bpe_chain_ctes(iters)
        + [
            "wt AS (SELECT doc_id, t FROM toks WHERE regexp_matches(t, '^[a-z]+$'))",
            f"""sl AS (
      SELECT w, CAST(len(string_split(seq, ' ')) AS BIGINT) AS sl FROM s{iters}
    )""",
            """agg AS (
      SELECT wt.doc_id, CAST(COUNT(*) AS INT) AS n_words,
             CAST(SUM(sl.sl) AS BIGINT) AS n_bpe_tokens
      FROM wt JOIN sl ON sl.w = wt.t GROUP BY wt.doc_id
    )""",
        ]
    )
    return f"""
    WITH {joined}
    SELECT d.doc_id, COALESCE(agg.n_words, 0) AS n_words,
           COALESCE(agg.n_bpe_tokens, 0) AS n_bpe_tokens,
           CASE WHEN agg.n_words IS NULL THEN NULL
                ELSE CAST(agg.n_bpe_tokens AS DOUBLE) / agg.n_words END
             AS tokens_per_word
    FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
    """


@register(
    "q116_bpe_encode",
    _bpe_encode_sql(),
    doc="tokenizer APPLY stage: the corpus encoded under the q113-"
    "trained BPE vocabulary — per-document word count, post-merge "
    "subword token count, and fertility (tokens per word, the metric "
    "tokenizer training optimizes). The merge loop reruns over the "
    "vocabulary (bit-identical pair choices to q113), the final "
    "segmentation lengths broadcast back onto the corpus token stream, "
    "and the per-doc aggregate is map-side combined — the corpus is "
    "scanned, never shuffled at token granularity beyond the doc key",
)
def q116_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    wt = d.select("doc_id", F.explode(toks).alias("t")).filter(
        F.col("t").rlike("^[a-z]+$")
    )
    words = wt.groupBy(F.col("t").alias("w")).agg(
        F.count("*").cast("long").alias("wc")
    )
    seg = tk.bpe_segment_vocab(words, "w", "wc", iters=_BPE_ITERS, persist_fn=hold)
    sl = seg.select(
        "w", F.size(F.split(F.col("seq"), " ", -1)).cast("long").alias("sl")
    )
    agg = (
        wt.join(F.broadcast(sl), wt["t"] == sl["w"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_words"),
            F.sum("sl").cast("long").alias("n_bpe_tokens"),
        )
    )
    return (
        d.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0).cast("long")).alias("n_bpe_tokens"),
            (F.col("n_bpe_tokens").cast("double") / F.col("n_words")).alias(
                "tokens_per_word"
            ),
        )
    )

# ---------------------------------------------------------------------------
# q118 — vocabulary growth curve (Heaps' law audit): distinct-term count
# as the corpus grows, via the first-appearance trick
# ---------------------------------------------------------------------------
_GROWTH_DECILES = 10

def _vocab_growth_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    k = _GROWTH_DECILES
    return f"""
    WITH b AS (
      SELECT doc_id, {hash_bucket_sql('doc_id', k)} AS bk,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    tok AS (SELECT bk, unnest(w) AS t FROM b),
    per_bucket AS (
      SELECT bk, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok GROUP BY bk
    ),
    docs_per_bucket AS (
      SELECT bk, CAST(COUNT(*) AS BIGINT) AS n_docs FROM b GROUP BY bk
    ),
    firsts AS (
      SELECT b_min AS bk, CAST(COUNT(*) AS BIGINT) AS n_new FROM (
        SELECT t, MIN(bk) AS b_min FROM tok GROUP BY t
      ) GROUP BY b_min
    ),
    spine AS (SELECT i AS decile FROM UNNEST(generate_series(0, {k - 1})) AS g(i))
    SELECT CAST(decile AS INT) AS decile,
           CAST(SUM(COALESCE(d.n_docs, 0)) OVER w AS BIGINT) AS n_docs_cum,
           CAST(SUM(COALESCE(p.n_tok, 0)) OVER w AS BIGINT) AS n_tokens_cum,
           CAST(SUM(COALESCE(f.n_new, 0)) OVER w AS BIGINT) AS vocab_cum,
           CAST(SUM(COALESCE(f.n_new, 0)) OVER w AS DOUBLE)
             / SUM(COALESCE(p.n_tok, 0)) OVER w AS type_token_ratio
    FROM spine
    LEFT JOIN docs_per_bucket d ON d.bk = decile
    LEFT JOIN per_bucket p ON p.bk = decile
    LEFT JOIN firsts f ON f.bk = decile
    WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


@register(
    "q118_vocab_growth",
    _vocab_growth_sql(),
    doc="vocabulary growth curve (Heaps'-law audit — the dedup/"
    "diversity health check run before tokenizer training): cumulative "
    "docs, tokens, distinct terms, and type-token ratio over ten "
    "deterministic hash-sample deciles. The FIRST-APPEARANCE trick "
    "makes it one pass: each term aggregates to its minimum decile "
    "(map-side combined), so the curve needs no per-prefix rescans; "
    "the cumulative window runs over the 10-row spine, never the data",
)
def q118_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    k = _GROWTH_DECILES
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    b = d.select(hash_bucket(F.col("doc_id"), k).alias("bk"), toks.alias("w"))
    tok = b.select("bk", F.explode("w").alias("t"))
    per_bucket = tok.groupBy("bk").agg(F.count("*").cast("long").alias("n_tok"))
    docs_per_bucket = b.groupBy("bk").agg(F.count("*").cast("long").alias("n_docs"))
    firsts = (
        tok.groupBy("t")
        .agg(F.min("bk").alias("bk"))
        .groupBy("bk")
        .agg(F.count("*").cast("long").alias("n_new"))
    )
    spine = d.sparkSession.range(k).select(F.col("id").cast("int").alias("decile"))
    joined = (
        spine.join(F.broadcast(docs_per_bucket), spine["decile"] == docs_per_bucket["bk"], "left")
        .drop("bk")
        .join(F.broadcast(per_bucket), spine["decile"] == per_bucket["bk"], "left")
        .drop("bk")
        .join(F.broadcast(firsts), spine["decile"] == firsts["bk"], "left")
        .drop("bk")
    )
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    n_tok_cum = F.sum(F.coalesce("n_tok", F.lit(0))).over(w)
    vocab_cum = F.sum(F.coalesce("n_new", F.lit(0))).over(w)
    return joined.select(
        "decile",
        F.sum(F.coalesce("n_docs", F.lit(0))).over(w).cast("long").alias("n_docs_cum"),
        n_tok_cum.cast("long").alias("n_tokens_cum"),
        vocab_cum.cast("long").alias("vocab_cum"),
        (vocab_cum.cast("double") / n_tok_cum).alias("type_token_ratio"),
    )

# ---------------------------------------------------------------------------
# q163 — unigram-LM tokenizer induction (SentencePiece-style hard-EM):
# the second tokenizer-training algorithm next to q113's BPE merge loop
# ---------------------------------------------------------------------------
_UNI_MAXW = 10  # words longer than this are excluded from the study

_UNI_MAXP = 3  # max piece length

_UNI_VOCAB = 200  # multi-char candidate pieces kept

_UNI_TOP = 50  # re-estimated pieces reported

def _unigram_chain_ctes(
    maxw: int = _UNI_MAXW,
    maxp: int = _UNI_MAXP,
    vocab: int = _UNI_VOCAB,
) -> list[str]:
    """The shared unigram-tokenizer CTE chain (replay of
    tokenize.unigram_segment_vocab): corpus tokens, word counts,
    candidate-piece selection, the per-position Viterbi DP unrolled into
    one CTE per character position (argmin via ROW_NUMBER over the
    integer objective), and the back-pointer walk likewise — ending at
    bt{maxw} = (w, wc, ps). The train side (q163) appends the M-step
    count; the apply side (q169) joins the segmentation lengths back to
    the corpus token stream."""
    ks = ", ".join(str(k) for k in range(1, maxp + 1))
    ctes = [
        """toks AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                    x -> x <> '')) AS t
      FROM documents
    )""",
        f"""words AS MATERIALIZED (
      SELECT t AS w, CAST(COUNT(*) AS BIGINT) AS wc
      FROM toks
      WHERE regexp_matches(t, '^[a-z]+$') AND length(t) <= {maxw}
      GROUP BY t
    )""",
        f"""occ AS MATERIALIZED (
      SELECT w, wc, t.t AS t, k.k AS k, substr(w, t.t - k.k + 1, k.k) AS piece
      FROM words,
           UNNEST(generate_series(1, length(w))) AS t(t),
           UNNEST([{ks}]) AS k(k)
      WHERE t.t >= k.k
    )""",
        """freqs AS MATERIALIZED (
      SELECT piece, CAST(SUM(wc) AS BIGINT) AS freq FROM occ GROUP BY piece
    )""",
        f"""pieces AS MATERIALIZED (
      SELECT piece, freq FROM freqs WHERE length(piece) = 1
      UNION ALL
      SELECT piece, freq FROM (
        SELECT piece, freq FROM freqs WHERE length(piece) > 1
        ORDER BY freq DESC, piece LIMIT {vocab}
      )
    )""",
        """wpk AS MATERIALIZED (
      SELECT occ.w, occ.t, occ.k, p.freq AS f
      FROM occ JOIN pieces p ON p.piece = occ.piece
    )""",
        """dp0 AS MATERIALIZED (
      SELECT w, wc, CAST(0 AS INT) AS tokens, CAST(0 AS BIGINT) AS sumfreq,
             CAST(0 AS INT) AS back
      FROM words
    )""",
    ]
    for t in range(1, maxw + 1):
        branches = []
        for k in range(1, min(maxp, t) + 1):
            branches.append(
                f"""SELECT p.w, p.wc, CAST(p.tokens + 1 AS INT) AS tokens,
               CAST(p.sumfreq + c.f AS BIGINT) AS sumfreq, CAST(c.k AS INT) AS back
        FROM dp{t - k} p JOIN wpk c ON c.w = p.w AND c.t = {t} AND c.k = {k}"""
            )
        union = "\n        UNION ALL ".join(branches)
        ctes.append(
            f"""dp{t} AS MATERIALIZED (
      SELECT w, wc, tokens, sumfreq, back FROM (
        SELECT cand.*, ROW_NUMBER() OVER (
          PARTITION BY w ORDER BY tokens, sumfreq DESC, back DESC) AS rn
        FROM ({union}) cand
      ) WHERE rn = 1
    )"""
        )
    dpall = "\n      UNION ALL ".join(
        f"SELECT w, CAST({t} AS INT) AS pos, back FROM dp{t}"
        for t in range(1, maxw + 1)
    )
    ctes.append(f"""dpall AS MATERIALIZED (
      {dpall}
    )""")
    ctes.append(
        """bt0 AS MATERIALIZED (
      SELECT w, wc, CAST(length(w) AS INT) AS pos, CAST([] AS VARCHAR[]) AS ps
      FROM words
    )"""
    )
    for i in range(1, maxw + 1):
        ctes.append(
            f"""bt{i} AS MATERIALIZED (
      SELECT b.w, b.wc,
             CAST(CASE WHEN b.pos > 0 THEN b.pos - d.back ELSE b.pos END AS INT) AS pos,
             CASE WHEN b.pos > 0
                  THEN list_prepend(substr(b.w, b.pos - d.back + 1, d.back), b.ps)
                  ELSE b.ps END AS ps
      FROM bt{i - 1} b LEFT JOIN dpall d ON d.w = b.w AND d.pos = b.pos
    )"""
        )
    return ctes

def _unigram_sql(
    maxw: int = _UNI_MAXW,
    maxp: int = _UNI_MAXP,
    vocab: int = _UNI_VOCAB,
    top: int = _UNI_TOP,
) -> str:
    ctes = _unigram_chain_ctes(maxw, maxp, vocab)
    ctes.append(
        f"""est AS MATERIALIZED (
      SELECT piece, CAST(SUM(wc) AS BIGINT) AS est_count
      FROM (SELECT wc, unnest(ps) AS piece FROM bt{maxw})
      GROUP BY piece
    )"""
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT piece, CAST(length(piece) AS INT) AS piece_len, est_count,
           CAST(ROW_NUMBER() OVER (ORDER BY est_count DESC, piece) AS INT)
             AS vocab_rank
    FROM (SELECT * FROM est ORDER BY est_count DESC, piece LIMIT {top})
    """


@register(
    "q163_unigram_tokenizer",
    _unigram_sql(),
    doc="unigram-LM tokenizer induction (SentencePiece hard-EM, one E+M "
    "round) with a fully integer objective — fewest tokens, then max "
    "total piece frequency, then longest final piece — so the Viterbi "
    "DP argmin is exact and engine-portable (log-prob EM would hinge on "
    "libm ln's last ulp). Candidate pieces are the top frequency-ranked "
    "substrings plus all single chars; the DP is one Catalyst aggregate "
    "fold per WORD (vocabulary-sized, never corpus-sized), piece costs "
    "arrive via one broadcast join, and the M-step recount is a "
    "vocabulary-sized aggregate. Oracle unrolls the DP and the "
    "back-pointer walk into one CTE per character position",
)
def q163_unigram_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    words = (
        d.select(F.explode(toks).alias("t"))
        .filter(F.col("t").rlike("^[a-z]+$") & (F.length("t") <= _UNI_MAXW))
        .groupBy(F.col("t").alias("w"))
        .agg(F.count("*").cast("long").alias("wc"))
    )
    return tk.unigram_induce(
        words,
        "w",
        "wc",
        max_piece=_UNI_MAXP,
        vocab_size=_UNI_VOCAB,
        top=_UNI_TOP,
        persist_fn=pin,
    )

# ---------------------------------------------------------------------------
# q169 — unigram-tokenizer ENCODE: the corpus tokenized under the
# q163-induced vocabulary (the apply stage, pairing with q163 exactly
# as q116's BPE encode pairs with q113's merge loop) — emits the
# fertility metric that lets the two tokenizer families be compared
# ---------------------------------------------------------------------------
def _unigram_encode_sql(
    maxw: int = _UNI_MAXW, maxp: int = _UNI_MAXP, vocab: int = _UNI_VOCAB
) -> str:
    ctes = _unigram_chain_ctes(maxw, maxp, vocab)
    ctes += [
        f"""wt AS MATERIALIZED (
      SELECT doc_id, t FROM toks
      WHERE regexp_matches(t, '^[a-z]+$') AND length(t) <= {maxw}
    )""",
        f"""sl AS MATERIALIZED (
      SELECT w, CAST(len(ps) AS BIGINT) AS sl FROM bt{maxw}
    )""",
        """agg AS MATERIALIZED (
      SELECT wt.doc_id, CAST(COUNT(*) AS INT) AS n_words,
             CAST(SUM(sl.sl) AS BIGINT) AS n_pieces
      FROM wt JOIN sl ON sl.w = wt.t GROUP BY wt.doc_id
    )""",
    ]
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT d.doc_id, COALESCE(agg.n_words, 0) AS n_words,
           COALESCE(agg.n_pieces, 0) AS n_pieces,
           CASE WHEN agg.n_words IS NULL THEN NULL
                ELSE CAST(agg.n_pieces AS DOUBLE) / agg.n_words END
             AS pieces_per_word
    FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
    """


@register(
    "q169_unigram_encode",
    _unigram_encode_sql(),
    doc="unigram-tokenizer APPLY stage: every in-domain corpus word "
    "(lowercase alpha, <= 10 chars) encoded under the q163-induced "
    "vocabulary — per-document word count, Viterbi piece count, and "
    "fertility (pieces per word), directly comparable to q116's BPE "
    "fertility. The Viterbi DP reruns over the VOCABULARY "
    "(bit-identical segmentations to q163), per-word piece counts "
    "broadcast back onto the corpus token stream, and the per-doc "
    "aggregate is map-side combined — the corpus is scanned, never "
    "shuffled at token granularity beyond the doc key",
)
def q169_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    wt = (
        d.select("doc_id", F.explode(toks).alias("t"))
        .filter(F.col("t").rlike("^[a-z]+$") & (F.length("t") <= _UNI_MAXW))
    )
    words = wt.groupBy(F.col("t").alias("w")).agg(
        F.count("*").cast("long").alias("wc")
    )
    seg = tk.unigram_segment_vocab(
        words, "w", "wc", max_piece=_UNI_MAXP, vocab_size=_UNI_VOCAB, persist_fn=hold
    )
    sl = seg.select("w", F.size("ps").cast("long").alias("sl"))
    agg = (
        wt.join(F.broadcast(sl), wt["t"] == sl["w"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_words"),
            F.sum("sl").cast("long").alias("n_pieces"),
        )
    )
    return (
        d.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_pieces", F.lit(0).cast("long")).alias("n_pieces"),
            (F.col("n_pieces").cast("double") / F.col("n_words")).alias(
                "pieces_per_word"
            ),
        )
    )

# ---------------------------------------------------------------------------
# q206 — effective token budget: the number every pretraining plan
# actually needs — per-source tokens BEFORE and AFTER exact dedup
# (q30's global keeper rule), with the duplication inflation factor.
# The raw token count overstates a crawl's worth; this is the data
# card's "how much unique signal is really here" line
# ---------------------------------------------------------------------------
@register(
    "q206_effective_tokens",
    r"""
    WITH t AS (
      SELECT doc_id, source, md5(text) AS fp,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    keepers AS (SELECT MIN(doc_id) AS doc_id FROM t GROUP BY fp)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS raw_tokens,
           CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS kept_docs,
           CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN n_tokens ELSE 0 END)
                AS BIGINT) AS effective_tokens,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE)
                 / SUM(CASE WHEN k.doc_id IS NOT NULL THEN n_tokens
                            ELSE 0 END), 6) AS inflation
    FROM t LEFT JOIN keepers k ON k.doc_id = t.doc_id
    GROUP BY source ORDER BY source
    """,
    doc="per-source effective token budget after exact dedup: q30's "
    "global keeper rule (MIN doc_id per content fingerprint — a "
    "duplicate spanning sources credits only the keeper's source), "
    "raw vs effective token sums, and the inflation factor raw/"
    "effective. One scan computes fingerprints and token counts, one "
    "fp aggregate picks keepers, one semi-join-shaped left join marks "
    "them — all counters map-side combined. The inflation column is "
    "what turns a '2T tokens crawled' claim into the number the "
    "training-compute plan can use",
)
def q206_effective_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    t = d.select(
        "doc_id",
        "source",
        F.md5("text").alias("fp"),
        F.size(
            F.filter(F.split(F.trim(F.col("text")), r"\s+", -1), lambda x: x != F.lit(""))
        )
        .cast("long")
        .alias("n_tokens"),
    )
    keepers = t.groupBy("fp").agg(F.min("doc_id").alias("kid"))
    marked = t.join(
        keepers, t["doc_id"] == keepers["kid"], "left"
    )
    kept = F.col("kid").isNotNull()
    return (
        marked.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("raw_tokens"),
            F.sum(kept.cast("long")).cast("long").alias("kept_docs"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("effective_tokens"),
        )
        .withColumn(
            "inflation",
            F.round(
                F.col("raw_tokens").cast("double") / F.col("effective_tokens"), 6
            ),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# q208 — tokenizer bake-off: the q113/q116 BPE family and the q163/q169
# unigram family trained exactly as their own queries train them, then
# compared head-to-head on the common word domain — weighted fertility,
# segmentation agreement, and piece-inventory overlap. The decision
# artifact a tokenizer selection actually needs, and the first query to
# run BOTH induction chains in one plan
# ---------------------------------------------------------------------------
def _bakeoff_sql() -> str:
    import re as _re

    uni = _unigram_chain_ctes()
    # the BPE chain's `toks` is identical to the unigram chain's (reuse
    # it); its `words` differs (no length cap) — namespace it to bwords
    bpe = [
        _re.sub(r"\bwords\b", "bwords", c) for c in _bpe_chain_ctes(_BPE_ITERS)[1:]
    ]
    ctes = uni + bpe
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined},
    j AS (
      SELECT u.w, u.wc, b.seq, u.ps
      FROM bt{_UNI_MAXW} u JOIN s{_BPE_ITERS} b ON b.w = u.w
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_common_words,
             CAST(SUM(wc) AS BIGINT) AS total_wc,
             CAST(SUM(wc * len(string_split(seq, ' '))) AS BIGINT) AS bt,
             CAST(SUM(wc * len(ps)) AS BIGINT) AS ut,
             CAST(SUM(CASE WHEN len(string_split(seq, ' ')) = len(ps)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_same_len,
             CAST(SUM(CASE WHEN seq = array_to_string(ps, ' ')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_same_seg
      FROM j
    ),
    pb AS (SELECT DISTINCT unnest(string_split(seq, ' ')) AS p FROM j),
    pu AS (SELECT DISTINCT unnest(ps) AS p FROM j),
    pc AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pb) AS n_bpe_pieces,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM pu) AS n_uni_pieces,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM pb JOIN pu USING (p)) AS n_shared_pieces
    )
    SELECT n_common_words, total_wc,
           ROUND(CAST(bt AS DOUBLE) / total_wc, 6) AS bpe_fertility,
           ROUND(CAST(ut AS DOUBLE) / total_wc, 6) AS uni_fertility,
           n_same_len, n_same_seg,
           n_bpe_pieces, n_uni_pieces, n_shared_pieces
    FROM m CROSS JOIN pc
    """


@register(
    "q208_tokenizer_bakeoff",
    _bakeoff_sql(),
    doc="tokenizer bake-off on the common word domain (lowercase alpha "
    "<= 10 chars): the BPE merge chain (trained on its own uncapped "
    "word census, bit-identical to q113/q116) and the unigram Viterbi "
    "chain (bit-identical to q163/q169) segment the same words; the "
    "report compares frequency-weighted fertility, how often the two "
    "families agree on piece COUNT and on the exact segmentation, and "
    "the used-piece inventory overlap. Both vocab pipelines run over "
    "the word census (corpus touched once for the shared token "
    "explode); the comparison join and piece aggregates are vocab-"
    "sized. One row out",
)
def q208_tokenizer_bakeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    wt = d.select(F.explode(toks).alias("t")).filter(F.col("t").rlike("^[a-z]+$"))
    words = hold(
        wt.groupBy(F.col("t").alias("w")).agg(F.count("*").cast("long").alias("wc"))
    )
    # the two tokenizer trainings are independent serial job chains off
    # the held words table (BPE: one eager checkpoint per merge step;
    # unigram: its own build jobs) — overlapped so the training phase
    # costs the slower tokenizer, not the sum (guide §2.6); hold_ids
    # attribution is per-checkpoint-exact so concurrent holds are safe
    bseg, useg = overlap(
        lambda: tk.bpe_segment_vocab(
            words, "w", "wc", iters=_BPE_ITERS, persist_fn=hold
        ),
        lambda: tk.unigram_segment_vocab(
            words.filter(F.length("w") <= _UNI_MAXW),
            "w",
            "wc",
            max_piece=_UNI_MAXP,
            vocab_size=_UNI_VOCAB,
            persist_fn=hold,
        ),
    )
    j = hold(
        useg.select("w", "wc", "ps").join(bseg.select("w", "seq"), "w")
    )
    bl = F.size(F.split(F.col("seq"), " ", -1))
    ul = F.size("ps")
    m = j.agg(
        F.count("*").cast("long").alias("n_common_words"),
        F.sum("wc").cast("long").alias("total_wc"),
        F.sum(F.col("wc") * bl).cast("long").alias("bt"),
        F.sum(F.col("wc") * ul).cast("long").alias("ut"),
        F.sum((bl == ul).cast("int")).cast("long").alias("n_same_len"),
        F.sum((F.col("seq") == F.array_join("ps", " ")).cast("int"))
        .cast("long")
        .alias("n_same_seg"),
    )
    pb = j.select(F.explode(F.split("seq", " ", -1)).alias("p")).distinct()
    pu = j.select(F.explode("ps").alias("p")).distinct()
    pc = (
        pb.agg(F.count("*").cast("long").alias("n_bpe_pieces"))
        .crossJoin(F.broadcast(pu.agg(F.count("*").cast("long").alias("n_uni_pieces"))))
        .crossJoin(
            F.broadcast(
                pb.join(pu, "p").agg(
                    F.count("*").cast("long").alias("n_shared_pieces")
                )
            )
        )
    )
    return m.crossJoin(F.broadcast(pc)).select(
        "n_common_words",
        "total_wc",
        F.round(F.col("bt").cast("double") / F.col("total_wc"), 6).alias(
            "bpe_fertility"
        ),
        F.round(F.col("ut").cast("double") / F.col("total_wc"), 6).alias(
            "uni_fertility"
        ),
        "n_same_len",
        "n_same_seg",
        "n_bpe_pieces",
        "n_uni_pieces",
        "n_shared_pieces",
    )

# ---------------------------------------------------------------------------
# q211 — context-length planning sweep: for each candidate max_seq_len,
# the padding waste, truncation loss, and utilization of one-doc-per-
# sequence batching, against the concat-packing lower bound (q80's
# rule) — the numbers that decide a training run's sequence length.
# One corpus scan; the config dimension is a 4-element literal explode
# ---------------------------------------------------------------------------
_SEQLEN_CONFIGS = [256, 512, 1024, 2048]


@register(
    "q211_seqlen_sweep",
    rf"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n
      FROM documents
    ),
    conf AS (SELECT unnest([{", ".join(str(c) for c in _SEQLEN_CONFIGS)}]) AS cap),
    swept AS (
      SELECT c.cap,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(t.n) AS BIGINT) AS total_tokens,
             CAST(SUM(CASE WHEN t.n <= c.cap THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fit,
             CAST(SUM(CASE WHEN t.n < c.cap THEN c.cap - t.n ELSE 0 END)
                  AS BIGINT) AS pad_tokens,
             CAST(SUM(CASE WHEN t.n > c.cap THEN t.n - c.cap ELSE 0 END)
                  AS BIGINT) AS truncated_tokens,
             CAST(SUM(CASE WHEN t.n < c.cap THEN t.n ELSE c.cap END) AS BIGINT)
               AS used_tokens
      FROM toks t CROSS JOIN conf c
      GROUP BY 1
    )
    SELECT cap, n_docs, total_tokens, n_fit, pad_tokens, truncated_tokens,
           ROUND(CAST(used_tokens AS DOUBLE) / (CAST(cap AS DOUBLE) * n_docs), 6)
             AS utilization,
           CAST(CAST(CEIL(CAST(total_tokens AS DOUBLE) / cap) AS BIGINT)
                AS BIGINT) AS packed_bins,
           ROUND(CAST(n_docs AS DOUBLE)
                 / CAST(CEIL(CAST(total_tokens AS DOUBLE) / cap) AS BIGINT), 6)
             AS packing_gain
    FROM swept ORDER BY cap
    """,
    doc="context-length sweep over {256,512,1024,2048}: per candidate "
    "cap, how many documents fit whole, the padding tokens burned and "
    "the tail tokens lost by one-doc-per-sequence batching, its "
    "utilization, and the q80 concat-packing bin count "
    "(ceil(total/cap)) with the sequences-saved gain factor — the "
    "planning table that picks a training run's sequence length "
    "before anyone pays for it. All counters exact integers, "
    "map-side combined over one token-count scan crossed with a "
    "4-row literal config table",
)
def q211_seqlen_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    # pinned: projection collapse would otherwise push the tokenize
    # under the config cross join and re-split every text 4x
    toks = pin(
        d.select(F.size(tx.tokens(F.col("text"))).cast("long").alias("n"))
    )
    conf = spark.createDataFrame(
        [(c,) for c in _SEQLEN_CONFIGS], "cap int"
    )
    t, c = F.col("n"), F.col("cap")
    swept = (
        toks.crossJoin(F.broadcast(conf))
        .groupBy("cap")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(t).cast("long").alias("total_tokens"),
            F.sum((t <= c).cast("int")).cast("long").alias("n_fit"),
            F.sum(F.when(t < c, c - t).otherwise(0)).cast("long").alias("pad_tokens"),
            F.sum(F.when(t > c, t - c).otherwise(0))
            .cast("long")
            .alias("truncated_tokens"),
            F.sum(F.when(t < c, t).otherwise(c)).cast("long").alias("used_tokens"),
        )
    )
    bins = F.ceil(F.col("total_tokens").cast("double") / F.col("cap")).cast("long")
    return swept.select(
        "cap",
        "n_docs",
        "total_tokens",
        "n_fit",
        "pad_tokens",
        "truncated_tokens",
        F.round(
            F.col("used_tokens").cast("double")
            / (F.col("cap").cast("double") * F.col("n_docs")),
            6,
        ).alias("utilization"),
        bins.alias("packed_bins"),
        F.round(F.col("n_docs").cast("double") / bins, 6).alias("packing_gain"),
    ).orderBy("cap")

# ---------------------------------------------------------------------------
# q291 — padding-waste audit: what fraction of a training batch is
# pad tokens under three batching strategies — one global bucket
# (pad everything to the corpus max), power-of-two length buckets,
# and exact 64-token bins — the throughput number that decides
# whether a loader needs q80's sequence packing at all. Pure integer
# accounting: waste = sum(bucket_ceiling - len).
# ---------------------------------------------------------------------------
@register(
    "q291_padding_waste",
    r"""
    WITH lens AS (
      SELECT CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                   x -> x <> '')) AS BIGINT) AS n
      FROM documents
    ),
    nz AS (SELECT n FROM lens WHERE n > 0),
    mx AS (SELECT MAX(n) AS gmax, CAST(SUM(n) AS BIGINT) AS total,
                  CAST(COUNT(*) AS BIGINT) AS nd FROM nz),
    pow2 AS (
      SELECT n, CASE WHEN n = 1 THEN 1
                     ELSE (CAST(1 AS BIGINT) << length(bin(n - 1))) END AS cap
      FROM nz
    ),
    bin64 AS (
      SELECT n, ((n + 63) // 64) * 64 AS cap FROM nz
    ),
    s AS (
      SELECT 'global_max' AS strategy,
             (SELECT CAST(SUM(m.gmax - z.n) AS BIGINT)
              FROM nz z CROSS JOIN mx m) AS pad_tokens
      UNION ALL
      SELECT 'pow2_buckets', CAST(SUM(cap - n) AS BIGINT) FROM pow2
      UNION ALL
      SELECT 'bin64', CAST(SUM(cap - n) AS BIGINT) FROM bin64
    )
    SELECT s.strategy, m.nd AS n_docs, m.total AS real_tokens, s.pad_tokens,
           ROUND(CAST(s.pad_tokens AS DOUBLE)
                 / (m.total + s.pad_tokens), 6) AS waste_fraction
    FROM s CROSS JOIN mx m
    ORDER BY s.strategy
    """,
    doc="padding-waste comparison across batching strategies: pad-to-"
    "corpus-max vs power-of-two length buckets vs exact 64-token "
    "bins — pad tokens and the wasted fraction of every compute "
    "batch, the number that justifies (or spares) q80's packing "
    "machinery. pow2 ceilings via 2^ceil(log2 n): exact powers of "
    "two are exact in doubles and ceil snaps to the integer exponent, "
    "so the BIGINT cast is stable on both engines; 64-bins are pure "
    "integer arithmetic. One scan, three cheap aggregates",
)
def q291_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    # r10 ADR-0007 tail sweep: the length table feeds the max/total
    # aggregate plus three padding-strategy branches and the output
    # crossJoin — five cold consumers in one action; eager hold probed
    # -25% (0.97->0.73 min-of-3)
    nz = hold(d.select(F.size(w).cast("long").alias("n")).filter(F.col("n") > 0))
    mx = nz.agg(
        F.max("n").alias("gmax"),
        F.sum("n").cast("long").alias("total"),
        F.count("*").cast("long").alias("nd"),
    )
    g = (
        nz.crossJoin(F.broadcast(mx))
        .agg(F.sum(F.col("gmax") - F.col("n")).cast("long").alias("pad_tokens"))
        .select(F.lit("global_max").alias("strategy"), "pad_tokens")
    )
    p2 = nz.select(
        "n",
        # exact integer ceiling power of two: 1 << bitlength(n-1);
        # the ln/log2 route can flip ceil() across engines by 1 ulp
        # at exact powers of two
        F.when(F.col("n") == 1, F.lit(1).cast("long"))
        .otherwise(
            F.expr("shiftleft(cast(1 as bigint), length(bin(n - 1)))")
        )
        .alias("cap"),
    ).agg(F.sum(F.col("cap") - F.col("n")).cast("long").alias("pad_tokens")).select(
        F.lit("pow2_buckets").alias("strategy"), "pad_tokens"
    )
    b64 = nz.select(
        "n", (F.expr("((n + 63) div 64) * 64")).alias("cap")
    ).agg(F.sum(F.col("cap") - F.col("n")).cast("long").alias("pad_tokens")).select(
        F.lit("bin64").alias("strategy"), "pad_tokens"
    )
    s = g.unionAll(p2).unionAll(b64)
    return (
        s.crossJoin(F.broadcast(mx))
        .select(
            "strategy",
            F.col("nd").alias("n_docs"),
            F.col("total").alias("real_tokens"),
            "pad_tokens",
            F.round(
                F.col("pad_tokens").cast("double")
                / (F.col("total") + F.col("pad_tokens")),
                6,
            ).alias("waste_fraction"),
        )
        .orderBy("strategy")
    )

# ---------------------------------------------------------------------------
# q307 — coverage vocabulary budget: the smallest top-K vocabulary
# covering 95% / 99% of corpus token mass, per language — the inverse
# of q63's fixed-K coverage and the number a tokenizer budget (q113/
# q163 vocab sizes, q211 context planning) is actually set from.
# Rank by (count desc, term) total order; the cut is the first rank
# whose running mass crosses the integer threshold mass*p (exact
# cross-multiplication, no percent floats).
# ---------------------------------------------------------------------------
@register(
    "q307_vocab_coverage_budget",
    r"""
    WITH words AS (
      SELECT lang, unnest(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS t
      FROM documents
    ),
    v AS (SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM words GROUP BY 1, 2),
    r AS (
      SELECT lang, c,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY c DESC, t) AS rk,
             SUM(c) OVER (PARTITION BY lang
                          ORDER BY c DESC, t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(c) OVER (PARTITION BY lang) AS total,
             COUNT(*) OVER (PARTITION BY lang) AS vocab
      FROM v
    )
    SELECT lang,
           CAST(MAX(vocab) AS BIGINT) AS vocab_size,
           CAST(MAX(total) AS BIGINT) AS n_tokens,
           CAST(MIN(CASE WHEN cum * 100 >= total * 95 THEN rk END) AS BIGINT)
             AS k_for_95pct,
           CAST(MIN(CASE WHEN cum * 100 >= total * 99 THEN rk END) AS BIGINT)
             AS k_for_99pct,
           ROUND(CAST(MIN(CASE WHEN cum * 100 >= total * 95 THEN rk END)
                      AS DOUBLE) / MAX(vocab), 6) AS frac_95
    FROM r GROUP BY lang
    ORDER BY lang
    """,
    doc="per-language vocabulary budget: the smallest top-K (by count, "
    "term tie-break) covering 95% and 99% of token mass — thresholds "
    "as exact integer cross-multiplications cum*100 >= total*p, so no "
    "float percent ever exists. frac_95 near 1 means a flat "
    "distribution where truncated vocabularies hemorrhage coverage; "
    "near 0 means a tiny head suffices. One vocab aggregate + one "
    "per-language window",
)
def q307_vocab_coverage_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    v = (
        d.select("lang", F.explode(wcol).alias("t"))
        .groupBy("lang", "t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    ow = W.partitionBy("lang").orderBy(F.col("c").desc(), "t")
    r = v.select(
        "lang",
        "c",
        F.row_number().over(ow).alias("rk"),
        F.sum("c").over(ow.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.sum("c").over(W.partitionBy("lang")).alias("total"),
        F.count("*").over(W.partitionBy("lang")).alias("vocab"),
    )
    return (
        r.groupBy("lang")
        .agg(
            F.max("vocab").cast("long").alias("vocab_size"),
            F.max("total").cast("long").alias("n_tokens"),
            F.min(
                F.when(F.col("cum") * 100 >= F.col("total") * 95, F.col("rk"))
            )
            .cast("long")
            .alias("k_for_95pct"),
            F.min(
                F.when(F.col("cum") * 100 >= F.col("total") * 99, F.col("rk"))
            )
            .cast("long")
            .alias("k_for_99pct"),
        )
        .select(
            "lang",
            "vocab_size",
            "n_tokens",
            "k_for_95pct",
            "k_for_99pct",
            F.round(
                F.col("k_for_95pct").cast("double") / F.col("vocab_size"), 6
            ).alias("frac_95"),
        )
        .orderBy("lang")
    )

# ---------------------------------------------------------------------------
# q318 — vocabulary budget MATRIX: q307's smallest-top-K coverage
# budget computed per (source, language) cell and scored against the
# language's POOLED budget — the number that says whether sources
# within a language share vocabulary (cell budgets comparable to the
# pooled budget) or each source pays for its own head (cell budgets
# summing to multiples of pooled). Thresholds stay exact integer
# cross-multiplications; the pooled side is a per-language rollup of
# the same (lang, term) counts, broadcast into the matrix.
# ---------------------------------------------------------------------------
@register(
    "q318_vocab_budget_matrix",
    r"""
    WITH words AS (
      SELECT source, lang, unnest(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS t
      FROM documents
    ),
    v AS (SELECT source, lang, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM words GROUP BY 1, 2, 3),
    r AS (
      SELECT source, lang,
             ROW_NUMBER() OVER (PARTITION BY source, lang
                                ORDER BY c DESC, t) AS rk,
             SUM(c) OVER (PARTITION BY source, lang
                          ORDER BY c DESC, t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(c) OVER (PARTITION BY source, lang) AS total,
             COUNT(*) OVER (PARTITION BY source, lang) AS vocab
      FROM v
    ),
    cell AS (
      SELECT source, lang,
             CAST(MAX(vocab) AS BIGINT) AS vocab_size,
             CAST(MAX(total) AS BIGINT) AS n_tokens,
             CAST(MIN(CASE WHEN cum * 100 >= total * 95 THEN rk END)
                  AS BIGINT) AS k_for_95pct,
             CAST(MIN(CASE WHEN cum * 100 >= total * 99 THEN rk END)
                  AS BIGINT) AS k_for_99pct
      FROM r GROUP BY 1, 2
    ),
    lv AS (SELECT lang, t, CAST(SUM(c) AS BIGINT) AS c FROM v GROUP BY 1, 2),
    lr AS (
      SELECT lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, t) AS rk,
             SUM(c) OVER (PARTITION BY lang ORDER BY c DESC, t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(c) OVER (PARTITION BY lang) AS total
      FROM lv
    ),
    pooled AS (
      SELECT lang,
             CAST(MIN(CASE WHEN cum * 100 >= total * 95 THEN rk END)
                  AS BIGINT) AS k95_pooled
      FROM lr GROUP BY 1
    )
    SELECT c.source, c.lang, c.n_tokens, c.vocab_size,
           c.k_for_95pct, c.k_for_99pct, p.k95_pooled,
           ROUND(CAST(c.k_for_95pct AS DOUBLE) / p.k95_pooled, 6)
             AS budget_vs_pooled
    FROM cell c JOIN pooled p USING (lang)
    ORDER BY c.source, c.lang
    """,
    doc="per-(source, language) vocabulary budget matrix: the smallest "
    "top-K covering 95%/99% of the cell's token mass (exact integer "
    "cross-multiplied thresholds, (count desc, term) rank — q307's "
    "machinery with the source axis added), each cell scored against "
    "the language's POOLED 95% budget. budget_vs_pooled near "
    "(cell tokens / lang tokens)-independent constants means sources "
    "share one head vocabulary; cells rivaling the pooled budget on a "
    "fraction of the mass mean per-source vocabularies that a shared "
    "tokenizer will underserve. One (source, lang, term) aggregate + "
    "two window passes; the pooled side is a rollup of the same "
    "counts, broadcast into the matrix",
)
def q318_vocab_budget_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    v = hold(
        d.select("source", "lang", F.explode(wcol).alias("t"))
        .groupBy("source", "lang", "t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    ow = W.partitionBy("source", "lang").orderBy(F.col("c").desc(), "t")
    r = v.select(
        "source",
        "lang",
        F.row_number().over(ow).alias("rk"),
        F.sum("c").over(ow.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.sum("c").over(W.partitionBy("source", "lang")).alias("total"),
        F.count("*").over(W.partitionBy("source", "lang")).alias("vocab"),
    )
    cell = r.groupBy("source", "lang").agg(
        F.max("vocab").cast("long").alias("vocab_size"),
        F.max("total").cast("long").alias("n_tokens"),
        F.min(F.when(F.col("cum") * 100 >= F.col("total") * 95, F.col("rk")))
        .cast("long")
        .alias("k_for_95pct"),
        F.min(F.when(F.col("cum") * 100 >= F.col("total") * 99, F.col("rk")))
        .cast("long")
        .alias("k_for_99pct"),
    )
    lv = v.groupBy("lang", "t").agg(F.sum("c").cast("long").alias("c"))
    low = W.partitionBy("lang").orderBy(F.col("c").desc(), "t")
    lr = lv.select(
        "lang",
        F.row_number().over(low).alias("rk"),
        F.sum("c").over(low.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.sum("c").over(W.partitionBy("lang")).alias("total"),
    )
    pooled = lr.groupBy("lang").agg(
        F.min(F.when(F.col("cum") * 100 >= F.col("total") * 95, F.col("rk")))
        .cast("long")
        .alias("k95_pooled")
    )
    return (
        cell.join(F.broadcast(pooled), "lang")
        .select(
            "source",
            "lang",
            "n_tokens",
            "vocab_size",
            "k_for_95pct",
            "k_for_99pct",
            "k95_pooled",
            F.round(
                F.col("k_for_95pct").cast("double") / F.col("k95_pooled"), 6
            ).alias("budget_vs_pooled"),
        )
        .orderBy("source", "lang")
    )

# ---------------------------------------------------------------------------
# q354 — front-coding (prefix-compression) estimate of the term
# dictionary: over the sorted vocabulary, each term's longest common
# prefix with its predecessor is byte-for-byte savings in a
# front-coded dictionary block — the storage audit behind every
# inverted-index/dictionary-encoding decision (q58/q129/q134 all
# carry a term dictionary at scale). LCP via the monotone prefix-
# equality count (exact integers; prefix equality only ever flips
# once, so the count IS the LCP).
# ---------------------------------------------------------------------------
@register(
    "q354_front_coding_estimate",
    r"""
    WITH v AS (
      SELECT DISTINCT unnest(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS t
      FROM documents
    ),
    s AS (
      SELECT t, LAG(t) OVER (ORDER BY t) AS prev FROM v
    ),
    l AS (
      SELECT t, prev,
             CASE WHEN prev IS NULL THEN 0
                  ELSE len([i FOR i IN generate_series(1,
                         LEAST(len(t), len(prev)))
                       IF substr(t, 1, i) = substr(prev, 1, i)])
             END AS lcp
      FROM s
    ),
    g AS (
      SELECT substr(t, 1, 1) AS first_char,
             CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(SUM(length(t)) AS BIGINT) AS raw_bytes,
             CAST(SUM(lcp) AS BIGINT) AS saved_bytes
      FROM l GROUP BY 1
    )
    SELECT first_char, n_terms, raw_bytes, saved_bytes,
           raw_bytes - saved_bytes AS coded_bytes,
           ROUND(CAST(saved_bytes AS DOUBLE) / raw_bytes, 6) AS savings
    FROM g
    ORDER BY first_char
    """,
    doc="front-coding storage estimate of the term dictionary: over "
    "the sorted vocabulary each term's LCP with its predecessor is "
    "the bytes a front-coded block elides — LCP computed as the "
    "monotone prefix-equality count (prefix equality flips exactly "
    "once down the positions, so the count is the LCP; pure integer, "
    "both engines). Per-first-character rows show where the savings "
    "concentrate — the dictionary-encoding audit for the inverted "
    "indexes q58/q129/q134/q345 would persist at scale. One vocab "
    "aggregate + one ordered window",
)
def q354_front_coding_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    v = d.select(F.explode(wcol).alias("t")).distinct()
    s = v.select("t", F.lag("t").over(W.orderBy("t")).alias("prev"))
    # dynamic-length substr only exists in expression form
    lcp = F.when(F.col("prev").isNull(), F.lit(0)).otherwise(
        F.expr(
            "size(filter(transform(sequence(1, least(length(t), "
            "length(prev))), i -> substr(t, 1, i) = substr(prev, 1, i)), "
            "x -> x))"
        )
    )
    l = s.select("t", lcp.alias("lcp"))
    g = l.groupBy(F.substring("t", 1, 1).alias("first_char")).agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum(F.length("t")).cast("long").alias("raw_bytes"),
        F.sum("lcp").cast("long").alias("saved_bytes"),
    )
    return g.select(
        "first_char",
        "n_terms",
        "raw_bytes",
        "saved_bytes",
        (F.col("raw_bytes") - F.col("saved_bytes")).alias("coded_bytes"),
        F.round(
            F.col("saved_bytes").cast("double") / F.col("raw_bytes"), 6
        ).alias("savings"),
    ).orderBy("first_char")
