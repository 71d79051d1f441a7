"""Dedup family: exact/MinHash-LSH/SimHash/n-gram near-dup detection, span removal, decontamination, winnowing, blocking and linkage.

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
from frontmatter_mcp_spark.workload.dp_shared import (
    _BANDS,
    _GUMBEL_SPAN,
    _JACCARD_THRESHOLD,
    _KMEANS_ITERS,
    _KMEANS_K,
    _LP_ITERS,
    _LSH_DIM,
    _LSH_NBITS,
    _MAX_DF,
    _NUM_HASHES,
    _SHINGLES_CTE,
    _SPANS_CTE,
    _SPAN_N,
    _duck_cos,
    _duck_lsh_bucket,
    _hash_bucket_duck,
    _kmeans_ctes,
    _neardup_groups_sql,
    _sig_exprs,
)

def _minhash_sig_sql() -> str:
    return f"""
    WITH {_SHINGLES_CTE}
    SELECT doc_id, CAST(COUNT(*) AS INT) AS n_shingles,
           {_sig_exprs()}
    FROM sh GROUP BY doc_id
    """

# ---------------------------------------------------------------------------
# q30 — exact dedup: content-hash groups
# ---------------------------------------------------------------------------
@register(
    "q30_dedup_exact",
    """
    SELECT md5(text) AS content_fp, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_id
    FROM documents GROUP BY 1
    """,
    doc="exact dedup: md5 groupBy (one shuffle on a 16-byte key)",
)
def q30_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup_groups(d, "doc_id", "text").withColumnRenamed(
        "keeper_doc_id", "keeper_id"
    )

# ---------------------------------------------------------------------------
# q31 — minhash signatures (engine-portable keyed-md5 minhash)
# ---------------------------------------------------------------------------
@register(
    "q31_minhash_signatures",
    _minhash_sig_sql(),
    doc="MinHash signatures: k keyed-md5 min-hashes over word-3gram shingles",
)
def q31_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.minhash_signatures(d, "doc_id", "text", num_hashes=_NUM_HASHES)

# ---------------------------------------------------------------------------
# q32 — LSH candidate pairs (band-bucket collision join)
# ---------------------------------------------------------------------------
def _lsh_pairs_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bb AS ({band_rows})
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """


@register(
    "q32_lsh_candidates",
    _lsh_pairs_sql(),
    doc="MinHash-LSH: near-dup candidate pairs via band-bucket collisions "
    "(shuffle is O(corpus) on the bucket key, never all-pairs)",
)
def q32_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.lsh_candidate_pairs(
        d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS,
        materialize=False,  # single straight pipeline — exchange reuse suffices
    )


@register(
    "q33_ngram_jaccard_pairs",
    f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
    f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
          WHERE dfreq.df_count <= {_MAX_DF}),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_common,
           FLOOR((n_common * 1.0 / (sa.set_size + sb.set_size - n_common))
                 * 1000000e0) / 1000000e0 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_common * 1.0 / (sa.set_size + sb.set_size - n_common) >= {_JACCARD_THRESHOLD}
    """,
    doc="exact n-gram Jaccard pairs >= 0.4 (df-capped shingle self-join)",
)
def q33_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.ngram_jaccard_pairs(
        d, "doc_id", "text", threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF
    )

# ---------------------------------------------------------------------------
# q87 — exact n-gram containment pairs (partial-copy detector)
# ---------------------------------------------------------------------------
_CONTAINMENT_THRESHOLD = 0.5


@register(
    "q87_containment_pairs",
    f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
    f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
          WHERE dfreq.df_count <= {_MAX_DF}),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_common,
           FLOOR((n_common * 1.0 / least(sa.set_size, sb.set_size))
                 * 1000000e0) / 1000000e0 AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_common * 1.0 / least(sa.set_size, sb.set_size) >= {_CONTAINMENT_THRESHOLD}
    """,
    doc="partial-copy detector: |A∩B| / min(|A|,|B|) >= 0.5 — catches a "
    "paragraph quoted inside a longer doc, which Jaccard scores near zero; "
    "same df-capped single-shuffle shingle pipeline as q33",
)
def q87_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.ngram_containment_pairs(
        d, "doc_id", "text", threshold=_CONTAINMENT_THRESHOLD, max_df=_MAX_DF
    )

# ---------------------------------------------------------------------------
# q34 — SimHash signatures
# ---------------------------------------------------------------------------
_SIMHASH_BITS = 32

def _simhash_sql() -> str:
    # bit j = hex digit j of one md5 per token (matches dedup.simhash)
    bit_cases = ", ".join(
        f"""CASE WHEN list_sum(list_transform(toks, t ->
             CASE WHEN substr(md5(t), {j + 1}, 1) >= '8' THEN 1 ELSE -1 END)) > 0
           THEN '1' ELSE '0' END"""
        for j in range(_SIMHASH_BITS)
    )
    return f"""
    SELECT doc_id, concat({bit_cases}) AS simhash
    FROM (SELECT doc_id, list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
          FROM documents)
    """


@register(
    "q34_simhash",
    _simhash_sql(),
    doc="SimHash: 32-bit per-doc signature from keyed-md5 bit votes (narrow map)",
)
def q34_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.simhash(d, "doc_id", "text", bits=_SIMHASH_BITS)

# ---------------------------------------------------------------------------
# q96 — SimHash banding candidates + Hamming verify (q34's blocking step)
# ---------------------------------------------------------------------------
_SIMHASH_BANDS = 4

_SIMHASH_MAX_HAMMING = 3

_SIMHASH_MAX_BUCKET = 40

def _simhash_pairs_sql() -> str:
    rpb = _SIMHASH_BITS // _SIMHASH_BANDS
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, substr(simhash, {b * rpb + 1}, {rpb}) AS slice"
        " FROM sigs"
        for b in range(_SIMHASH_BANDS)
    )
    hamming = " + ".join(
        f"CASE WHEN substr(sa.simhash, {j + 1}, 1) <> substr(sb.simhash, {j + 1}, 1)"
        " THEN 1 ELSE 0 END"
        for j in range(_SIMHASH_BITS)
    )
    return f"""
    WITH sigs AS ({_simhash_sql()}),
    banded_all AS ({band_rows}),
    small AS (
      SELECT band, slice FROM banded_all GROUP BY 1, 2
      HAVING COUNT(*) <= {_SIMHASH_MAX_BUCKET}
    ),
    banded AS (SELECT banded_all.* FROM banded_all JOIN small USING (band, slice)),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM banded x JOIN banded y
        ON x.band = y.band AND x.slice = y.slice AND x.doc_id < y.doc_id
    )
    SELECT id_a, id_b, CAST(({hamming}) AS INT) AS hamming
    FROM cand
    JOIN sigs sa ON sa.doc_id = id_a
    JOIN sigs sb ON sb.doc_id = id_b
    WHERE ({hamming}) <= {_SIMHASH_MAX_HAMMING}
    """


@register(
    "q96_simhash_candidates",
    _simhash_pairs_sql(),
    doc="SimHash banding candidates + full-width Hamming verify — the "
    "blocking step q34's signatures feed (SimHash's analogue of q32's "
    "MinHash-LSH banding). Pigeonhole-complete among surviving buckets "
    "(4 bands, max Hamming 3: a qualifying pair must share an exact "
    "8-bit slice); oversized band buckets are dropped pre-join (the "
    "df-cap discipline — identical-signature mega-clusters are q30's "
    "job), bounding candidates to O(buckets x cap^2)",
)
def q96_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.simhash_candidate_pairs(
        d,
        "doc_id",
        "text",
        bits=_SIMHASH_BITS,
        bands=_SIMHASH_BANDS,
        max_hamming=_SIMHASH_MAX_HAMMING,
        max_bucket=_SIMHASH_MAX_BUCKET,
        persist_fn=hold,
    )

# ---------------------------------------------------------------------------
# q41 — sliding-window fingerprints: shift-resistant overlap pairs
# ---------------------------------------------------------------------------
@register(
    "q41_window_fingerprint_pairs",
    """
    WITH fps AS (
      SELECT DISTINCT doc_id, substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                                      w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' ||
                                      w[i+6] || ' ' || w[i+7]), 1, 16) AS fp
      FROM (SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS w
            FROM documents),
           UNNEST(generate_series(1, len(w) - 7)) AS t(i)
      WHERE len(w) >= 8
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_windows
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
    doc="shift-resistant near-dup: docs sharing verbatim 8-token runs "
    "(rolling window fingerprints joined on the hash key)",
)
def q41_window_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    fps = d.select(
        "doc_id", F.explode(tk.window_fingerprints(F.col("text"), window=8)).alias("fp")
    )
    a = fps.withColumnRenamed("doc_id", "id_a")
    b = fps.withColumnRenamed("doc_id", "id_b")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_windows"))
    )

def _lsh_sql() -> str:
    planes = sim.hyperplanes(_LSH_DIM, _LSH_NBITS)
    bits = []
    for plane in planes:
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        dot = (
            f"list_sum([CAST(e[i] AS DOUBLE) * ({arr}::DOUBLE[])[i] "
            f"FOR i IN generate_series(1, len(e))])"
        )
        bits.append(f"CASE WHEN {dot} > 0 THEN '1' ELSE '0' END")
    bucket = "concat(" + ", ".join(bits) + ")"
    return f"""
    WITH b AS (
      SELECT vec_id, embedding, {bucket.replace('e[i]', 'embedding[i]').replace('len(e)', 'len(embedding)')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, embedding AS qvec, bucket FROM b WHERE vec_id < 5),
    c AS (SELECT vec_id AS cid, embedding AS cvec, bucket FROM b WHERE vec_id >= 5),
    pairs AS (
      SELECT q.qid, q.bucket, c.cid, {_duck_cos('q.qvec', 'c.cvec')} AS sim
      FROM q JOIN c ON q.bucket = c.bucket
    ),
    ranked AS (
      SELECT qid, bucket, cid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rank
      FROM pairs
    )
    SELECT qid, bucket, cid, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 10
    """


@register(
    "q43_ann_lsh",
    _lsh_sql(),
    doc="random-hyperplane LSH ANN: deterministic md5-derived planes, "
    "bucket join instead of full scan (bucket-pruned at scale)",
)
def q43_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    out = sim.lsh_topk(q, c, dim=_LSH_DIM, nbits=_LSH_NBITS, k=10)
    return out.withColumn("rank", F.col("rank").cast("int"))

def _duck_probe_list(bucket: str, nbits: int, radius: int) -> str:
    """DuckDB list of the bucket plus every Hamming-distance<=radius
    flip — mirrors similarity.probe_buckets (same combination order)."""
    from itertools import combinations

    def flipped(positions: tuple[int, ...]) -> str:
        chars = []
        for j in range(1, nbits + 1):
            ch = f"substr({bucket}, {j}, 1)"
            if (j - 1) in positions:
                ch = f"(CASE WHEN {ch} = '1' THEN '0' ELSE '1' END)"
            chars.append(ch)
        return " || ".join(chars)

    variants = [bucket]
    for r in range(1, radius + 1):
        variants.extend(flipped(c) for c in combinations(range(nbits), r))
    return "list_value(" + ", ".join(variants) + ")"

# the calibration matrix: bucket width x probe radius. Wider codes make
# emptier buckets (cheaper probes, worse single-probe recall) which
# larger radii claw back — the measurement that picks the operating
# point before a 100 TB rollout.
_LSH_RECALL_CONFIGS = [
    ("nbits4_r0", 4, 0),
    ("nbits4_r1", 4, 1),
    ("nbits6_r1", 6, 1),
    ("nbits6_r2", 6, 2),
]

def _lsh_recall_sql() -> str:
    blocks = []
    selects = []
    for tag, nbits, radius in _LSH_RECALL_CONFIGS:
        blocks.append(
            f"""b_{tag} AS (
      SELECT vec_id, embedding, {_duck_lsh_bucket('embedding', nbits)} AS bucket
      FROM embeddings
    ),
    probes_{tag} AS (
      SELECT qid, qvec, probe
      FROM (SELECT vec_id AS qid, embedding AS qvec, bucket
            FROM b_{tag} WHERE vec_id < 5) q,
           UNNEST({_duck_probe_list('bucket', nbits, radius)}) AS t(probe)
    ),
    got_{tag} AS (
      SELECT qid, cid FROM (
        SELECT p.qid, c.cid,
               ROW_NUMBER() OVER (PARTITION BY p.qid
                                  ORDER BY {_duck_cos('p.qvec', 'c.cvec')} DESC, c.cid ASC) AS rank
        FROM probes_{tag} p
        JOIN (SELECT vec_id AS cid, embedding AS cvec, bucket
              FROM b_{tag} WHERE vec_id >= 5) c
          ON p.probe = c.bucket
      ) WHERE rank <= 10
    ),
    hits_{tag} AS (
      SELECT t.qid, COUNT(*) AS n FROM truth t JOIN got_{tag} g
        ON t.qid = g.qid AND t.cid = g.cid GROUP BY t.qid
    )"""
        )
        selects.append(
            f"""SELECT '{tag}' AS method, q.qid,
           CAST(COALESCE(h.n, 0) AS INT) AS n_hits,
           COALESCE(h.n, 0) / 10.0 AS recall_at_10
    FROM (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 5) q
    LEFT JOIN hits_{tag} h ON q.qid = h.qid"""
        )
    return (
        """
    WITH q0 AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
    c0 AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id >= 5),
    truth AS (
      SELECT qid, cid FROM (
        SELECT q0.qid, c0.cid,
               ROW_NUMBER() OVER (PARTITION BY q0.qid
                                  ORDER BY """
        + _duck_cos("q0.qvec", "c0.cvec")
        + """ DESC, c0.cid ASC) AS rank
        FROM q0, c0
      ) WHERE rank <= 10
    ),
    """
        + ",\n    ".join(blocks)
        + "\n    "
        + "\n    UNION ALL\n    ".join(selects)
    )


@register(
    "q82_lsh_recall",
    _lsh_recall_sql(),
    doc="ANN recall calibration matrix: (bucket width x Hamming probe "
    "radius) scored against brute-force ground truth per query — wider "
    "codes make emptier buckets, larger radii claw recall back; the "
    "measurement that picks the (nbits, probe_radius) operating point "
    "before a 100 TB rollout",
)
def q82_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    # the brute-force ground truth feeds all four config branches — the
    # unioned plan would recompute the 5 x corpus cosine ranking once
    # per branch (the q91 lesson); the pinned table is |queries| x k rows
    truth = pin(sim.cosine_topk(q, c, k=10).select("qid", "cid"))
    qids = q.select("qid")
    outs = []
    for method, nbits, radius in _LSH_RECALL_CONFIGS:
        got = sim.lsh_topk(
            q, c, dim=_LSH_DIM, nbits=nbits, k=10, probe_radius=radius
        ).select("qid", "cid")
        hits = truth.join(got, ["qid", "cid"]).groupBy("qid").agg(
            F.count("*").alias("n")
        )
        outs.append(
            qids.join(hits, "qid", "left").select(
                F.lit(method).alias("method"),
                "qid",
                F.coalesce(F.col("n"), F.lit(0)).cast("int").alias("n_hits"),
                (F.coalesce(F.col("n"), F.lit(0)) / F.lit(10.0)).alias("recall_at_10"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@register(
    "q59_boilerplate_spans",
    f"""
    WITH {_SPANS_CTE}
    SELECT span, CAST(COUNT(*) AS INT) AS n_docs, MIN(doc_id) AS first_doc_id
    FROM sp GROUP BY 1 HAVING COUNT(*) >= 2
    """,
    doc="boilerplate detection: word 4-gram spans repeated across >= 2 "
    "docs (headers/footers/templates a cleaning pass strips); shuffle "
    "carries one row per distinct (span, doc)",
)
def q59_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.boilerplate_spans(d, "doc_id", "text", span_n=_SPAN_N, min_docs=2)

# ---------------------------------------------------------------------------
# q60 — train/test decontamination scan (benchmark-leakage n-gram overlap)
# ---------------------------------------------------------------------------
@register(
    "q60_decontamination",
    f"""
    WITH {_SPANS_CTE},
    splits AS (
      SELECT doc_id,
             CASE WHEN {_hash_bucket_duck('doc_id')} < 800 THEN 'train'
                  WHEN {_hash_bucket_duck('doc_id')} < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    test_spans AS (
      SELECT DISTINCT span FROM sp JOIN splits USING (doc_id) WHERE split = 'test'
    )
    SELECT sp.doc_id, CAST(COUNT(*) AS INT) AS n_shared_spans
    FROM sp JOIN splits USING (doc_id) JOIN test_spans USING (span)
    WHERE split = 'train'
    GROUP BY 1
    """,
    doc="decontamination: train docs sharing any word 4-gram with the "
    "held-out test split (hash-bucket split, q57's rule); one shuffle on "
    "the span key, never broadcast (test spans are corpus-sized)",
)
def q60_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators import sampling as smp

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id").withColumn(
        "split", smp.assign_split(F.col("doc_id"))
    )
    return dd.decontaminate(d, "doc_id", "text", "split", span_n=_SPAN_N)

# ---------------------------------------------------------------------------
# q93 — duplicate-span REMOVAL: scrub repeated spans, keep the documents
# (the rewrite counterpart of q59's detection — ExactSubstr-style dedup)
# ---------------------------------------------------------------------------
@register(
    "q93_duplicate_span_removal",
    f"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                  FROM documents),
    tok AS (SELECT doc_id, i - 1 AS pos, w[i] AS token
            FROM toks, UNNEST(generate_series(1, len(w))) AS t(i)),
    sp AS (SELECT doc_id, i - 1 AS start,
                  w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS span
           FROM toks, UNNEST(generate_series(1, len(w) - 3)) AS t(i)
           WHERE len(w) >= 4),
    dup AS (SELECT span FROM (SELECT DISTINCT doc_id, span FROM sp)
            GROUP BY span HAVING COUNT(*) >= 2),
    cov AS (SELECT DISTINCT sp.doc_id, start + j AS pos
            FROM sp JOIN dup USING (span),
                 UNNEST(generate_series(0, {_SPAN_N - 1})) AS u(j)),
    kept AS (SELECT t.doc_id, t.pos, t.token FROM tok t
             LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
             WHERE c.pos IS NULL),
    reb AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens_kept,
                   string_agg(token, ' ' ORDER BY pos) AS cleaned_text
            FROM kept GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(len(string_split_regex(trim(d.text), '\\s+')) AS INT) AS n_tokens,
           COALESCE(reb.n_tokens_kept, 0) AS n_tokens_kept,
           COALESCE(reb.cleaned_text, '') AS cleaned_text
    FROM documents d LEFT JOIN reb ON reb.doc_id = d.doc_id
    """,
    doc="ExactSubstr-style duplicate-span removal (Lee et al. 2022, the "
    "scrub variant of q59): token positions covered by a word 4-gram "
    "span occurring in >= 2 distinct docs are dropped and every doc is "
    "rebuilt from its surviving tokens in order — integer/string math "
    "only, so the rewrite is hash-verified cross-engine. One "
    "groupBy(span) with map-side partials + one span-key join + one "
    "per-doc rebuild with an array_sort (no window exchange)",
)
def q93_duplicate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.remove_duplicate_spans(d, "doc_id", "text", span_n=_SPAN_N, min_docs=2)

# ---------------------------------------------------------------------------
# q61 — Gopher-style repetition / quality signals per document
# ---------------------------------------------------------------------------
@register(
    "q61_repetition_profile",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    words AS (SELECT doc_id, unnest(w) AS wd FROM toks),
    wc AS (SELECT doc_id, wd, COUNT(*) AS c FROM words GROUP BY 1, 2),
    ws AS (
      SELECT doc_id, CAST(SUM(c) AS INT) AS n_words,
             CAST(COUNT(*) AS INT) AS n_distinct_words,
             CAST(MAX(c) AS INT) AS top_word_count
      FROM wc GROUP BY 1
    ),
    bg AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] AS b
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2
    ),
    bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    bs AS (
      SELECT doc_id, CAST(SUM(c) AS INT) AS n_bigrams,
             CAST(MAX(c) AS INT) AS top_bigram_count
      FROM bc GROUP BY 1
    )
    SELECT ws.doc_id, n_words, n_distinct_words,
           round(CAST(n_distinct_words AS DOUBLE) / n_words, 6) AS distinct_ratio,
           round(CAST(top_word_count AS DOUBLE) / n_words, 6) AS top_word_frac,
           COALESCE(n_bigrams, 0) AS n_bigrams,
           round(CAST(top_bigram_count AS DOUBLE) / n_bigrams, 6) AS top_bigram_frac
    FROM ws LEFT JOIN bs USING (doc_id)
    """,
    doc="Gopher-style repetition signals: top-word / top-bigram token "
    "fractions + lexical diversity per doc (integer counts, single "
    "divisions - engine-portable)",
)
def q61_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return tx.repetition_profile(d, "doc_id", "text")

# ---------------------------------------------------------------------------
# q70 — incremental ingestion dedup: new batch vs existing corpus
# ---------------------------------------------------------------------------
@register(
    "q70_incremental_dedup",
    f"""
    WITH tagged AS (
      SELECT doc_id, text, {tables.ingest_batch_sql('doc_id')} AS batch
      FROM documents
    ),
    exact_hit AS (
      SELECT DISTINCT i.doc_id
      FROM tagged i JOIN tagged e
        ON e.batch = 'existing' AND i.batch = 'incoming'
       AND md5(e.text) = md5(i.text)
    ),
    toks AS (SELECT doc_id, batch, string_split_regex(trim(text), '\\s+') AS w FROM tagged),
    sh AS (
      SELECT DISTINCT doc_id, batch, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
      WHERE len(w) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    inter AS (
      SELECT i.doc_id, i_sz.set_size AS size_i, e_sz.set_size AS size_e, COUNT(*) AS n_common
      FROM sh i
      JOIN sh e ON e.shingle = i.shingle AND e.batch = 'existing' AND i.batch = 'incoming'
      JOIN sizes i_sz ON i_sz.doc_id = i.doc_id
      JOIN sizes e_sz ON e_sz.doc_id = e.doc_id
      GROUP BY 1, 2, 3
    ),
    near_hit AS (
      SELECT DISTINCT doc_id FROM inter
      WHERE n_common * 1.0 / (size_i + size_e - n_common) >= 0.6
    )
    SELECT t.doc_id,
           CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN nh.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'new' END AS verdict
    FROM tagged t
    LEFT JOIN exact_hit ex ON ex.doc_id = t.doc_id
    LEFT JOIN near_hit nh ON nh.doc_id = t.doc_id
    WHERE t.batch = 'incoming'
    """,
    doc="incremental ingestion: each incoming-batch doc gets a verdict "
    "against the existing corpus - exact_dup (content hash), near_dup "
    "(3-gram Jaccard >= 0.6 against any existing doc), or new. The "
    "existing side is never rescanned per doc: one hash join + one "
    "shingle join, both on corpus-sized keys. The corpus/batch split "
    "comes from the loader's ingest_batch column "
    "(tables.load_documents_batched), not a per-query filter",
)
def q70_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(tables.load_documents_batched(spark, sf_dir), "doc_id")
    tagged = d.withColumn("batch", F.col("ingest_batch"))
    incoming = tagged.filter(F.col("batch") == "incoming")
    existing = tagged.filter(F.col("batch") == "existing")
    exact_hit = (
        incoming.alias("i")
        .join(
            existing.alias("e"),
            F.md5(F.col("e.text")) == F.md5(F.col("i.text")),
            "left_semi",
        )
        .select(F.col("doc_id"))
        .distinct()
    )
    sh = tagged.select(
        F.col("doc_id"),
        "batch",
        F.explode(dd.word_shingles(F.col("text"), 3)).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    i_sh = sh.filter(F.col("batch") == "incoming").select(
        F.col("doc_id").alias("i_id"), "shingle"
    )
    e_sh = sh.filter(F.col("batch") == "existing").select(
        F.col("doc_id").alias("e_id"), "shingle"
    )
    inter = (
        i_sh.join(e_sh, "shingle")
        .join(sizes.select(F.col("doc_id").alias("i_id"), F.col("set_size").alias("size_i")), "i_id")
        .join(sizes.select(F.col("doc_id").alias("e_id"), F.col("set_size").alias("size_e")), "e_id")
        .groupBy("i_id", "size_i", "size_e")
        .agg(F.count("*").alias("n_common"))
    )
    near_hit = (
        inter.filter(
            F.col("n_common")
            / (F.col("size_i") + F.col("size_e") - F.col("n_common"))
            >= 0.6
        )
        .select(F.col("i_id").alias("doc_id"))
        .distinct()
    )
    return (
        incoming.select("doc_id")
        .join(exact_hit.withColumn("is_exact", F.lit(1)), "doc_id", "left")
        .join(near_hit.withColumn("is_near", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact").isNotNull(), "exact_dup")
            .when(F.col("is_near").isNotNull(), "near_dup")
            .otherwise("new")
            .alias("verdict"),
        )
    )

# ---------------------------------------------------------------------------
# q71 — dedup report: duplicate-cluster size histogram + ratios
# ---------------------------------------------------------------------------
@register(
    "q71_dedup_report",
    """
    WITH groups AS (
      SELECT md5(text) AS fp, COUNT(*) AS n_docs FROM documents GROUP BY 1
    )
    SELECT n_docs AS cluster_size,
           COUNT(*) AS n_clusters,
           CAST(n_docs * COUNT(*) AS BIGINT) AS n_documents,
           CAST(CAST((n_docs - 1) * COUNT(*) AS BIGINT) AS DOUBLE)
             / (SELECT COUNT(*) FROM documents) AS removable_frac
    FROM groups GROUP BY n_docs
    """,
    doc="dedup reporting: histogram of exact-duplicate cluster sizes and "
    "the removable fraction per size - the summary a pipeline operator "
    "reads before deciding thresholds",
)
def q71_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no ensure_parallelism: two cheap aggregates whose own shuffle
    # already spreads the work — the pre-spread repartition cost 3x more
    # than it won here (measured vs BENCH_r01)
    d = load_table(spark, sf_dir, "documents")
    total = d.agg(F.count("*").alias("n_total"))
    groups = d.groupBy(F.md5("text").alias("fp")).agg(F.count("*").alias("n_docs"))
    return (
        groups.groupBy(F.col("n_docs").alias("cluster_size"))
        .agg(F.count("*").alias("n_clusters"))
        .crossJoin(F.broadcast(total))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).cast("bigint").alias("n_documents"),
            (
                ((F.col("cluster_size") - 1) * F.col("n_clusters")).cast("bigint").cast("double")
                / F.col("n_total")
            ).alias("removable_frac"),
        )
    )

# ---------------------------------------------------------------------------
# q75 — MinHash estimator calibration: estimated vs exact Jaccard per
# LSH candidate pair
# ---------------------------------------------------------------------------
def _minhash_calibration_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    agree = " + ".join(
        f"CASE WHEN a.sig_{h} = b.sig_{h} THEN 1 ELSE 0 END" for h in range(_NUM_HASHES)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bb AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b, ({agree}) * 1.0 / {_NUM_HASHES} AS est_jaccard
      FROM cand c JOIN sigs a ON a.doc_id = c.id_a JOIN sigs b ON b.doc_id = c.id_b
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT e.id_a, e.id_b,
           FLOOR(e.est_jaccard * 1000000e0) / 1000000e0 AS est_jaccard,
           FLOOR((COALESCE(i.n_common, 0) * 1.0
                 / (sa.set_size + sb.set_size - COALESCE(i.n_common, 0)))
                 * 1000000e0) / 1000000e0 AS exact_jaccard,
           FLOOR(abs(e.est_jaccard
                 - COALESCE(i.n_common, 0) * 1.0
                   / (sa.set_size + sb.set_size - COALESCE(i.n_common, 0)))
                 * 1000000e0) / 1000000e0 AS abs_err
    FROM est e
    LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
    JOIN sizes sa ON sa.doc_id = e.id_a
    JOIN sizes sb ON sb.doc_id = e.id_b
    """


@register(
    "q75_minhash_calibration",
    _minhash_calibration_sql(),
    doc="estimator calibration: per LSH candidate pair, the MinHash "
    "Jaccard estimate (signature agreement fraction) next to the exact "
    "Jaccard computed only for those pairs - the exact pass is "
    "candidate-restricted, never an uncapped all-pairs self-join",
)
def q75_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE shingle subplan and ONE signature aggregation feed every stage:
    # the signatures are consumed by the estimate join (twice), the
    # candidate generation, and the set sizes (n_shingles IS the set size,
    # so the separate size aggregation is gone). The signature table is
    # doc-count-sized (8 x 16-char sigs per doc — KBs per million docs),
    # so it is pinned: column pruning gives each consumer a different
    # aggregate schema, which defeats exchange reuse, and without the
    # cache the whole shingle->md5->aggregate pipeline would run once per
    # consumer (the round-1 formulation measured ~3x the work). hold()
    # releases the blocks at the next query invocation (registry.py).
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    sh = d.select(
        F.col("doc_id"), F.explode(dd.word_shingles(F.col("text"), 3)).alias("shingle")
    )
    sigs = hold(dd.minhash_signatures_from_shingles(sh, "doc_id", "shingle", _NUM_HASHES))
    cand = dd.candidate_pairs_from_signatures(sigs, "doc_id", _NUM_HASHES, _BANDS)
    a = sigs.select(
        F.col("doc_id").alias("id_a"),
        F.col("n_shingles").alias("size_a"),
        *[F.col(f"sig_{h}").alias(f"a_sig_{h}") for h in range(_NUM_HASHES)],
    )
    b = sigs.select(
        F.col("doc_id").alias("id_b"),
        F.col("n_shingles").alias("size_b"),
        *[F.col(f"sig_{h}").alias(f"b_sig_{h}") for h in range(_NUM_HASHES)],
    )
    agree = sum(
        F.when(F.col(f"a_sig_{h}") == F.col(f"b_sig_{h}"), 1).otherwise(0)
        for h in range(_NUM_HASHES)
    )
    est = cand.join(a, "id_a").join(b, "id_b").select(
        "id_a",
        "id_b",
        "size_a",
        "size_b",
        (agree * F.lit(1.0) / _NUM_HASHES).alias("est_jaccard"),
    )
    inter = (
        cand.join(
            sh.select(F.col("doc_id").alias("id_a"), "shingle"), "id_a"
        )
        .join(sh.select(F.col("doc_id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    nc = F.coalesce(F.col("n_common"), F.lit(0))
    exact = nc * F.lit(1.0) / (F.col("size_a") + F.col("size_b") - nc)
    return (
        est.join(inter, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            vector.floor_quant(F.col("est_jaccard")).alias("est_jaccard"),
            vector.floor_quant(exact).alias("exact_jaccard"),
            vector.floor_quant(
                F.abs(F.col("est_jaccard") - exact)
            ).alias("abs_err"),
        )
    )

# ---------------------------------------------------------------------------
# q90 — SemDeDup-style semantic dedup: k-means blocking + cosine pruning
# ---------------------------------------------------------------------------
_SEMDEDUP_THRESHOLD = 0.3


@register(
    "q90_semantic_dedup",
    f"""
    WITH {_kmeans_ctes()},
    assign AS (SELECT vec_id, CAST(cid AS INT) AS cluster FROM a{_KMEANS_ITERS}),
    dropped AS (
      SELECT DISTINCT y.vec_id
      FROM assign x
      JOIN assign y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      JOIN embeddings a ON a.vec_id = x.vec_id
      JOIN embeddings b ON b.vec_id = y.vec_id
      WHERE {_duck_cos('a.embedding', 'b.embedding')} >= {_SEMDEDUP_THRESHOLD}
    )
    SELECT s.vec_id, s.cluster,
           s.vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
    FROM assign s
    """,
    doc="SemDeDup-style semantic dedup (cluster-then-prune): k-means "
    "clusters block the cosine comparison, then any vector with a "
    "smaller-id cluster-mate above the similarity threshold is pruned "
    "(the transitive-prune variant — deterministic and engine-portable, "
    "unlike greedy keeper chains). At 100 TB, k scales with the corpus "
    "so cluster blocks stay bounded; the pair join is within-block only, "
    "never all-pairs — the same blocking discipline as q38, with the "
    "blocking learned by q48's quantizer instead of given",
)
def q90_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.clustering import kmeans_assign

    e = load_table(spark, sf_dir, "embeddings")
    assign = kmeans_assign(e, k=_KMEANS_K, iters=_KMEANS_ITERS)
    # clustered feeds BOTH the blocked pair join and the final label
    # join-back; column pruning gives the two consumers different subplans,
    # so without the pin the scan+assignment runs twice (the exact shape
    # q91 fixed — measured ~1.8x before the persist). Doc-count-sized.
    clustered = pin(e.select("vec_id", "embedding").join(assign, "vec_id"))
    pairs = sim.neardup_pairs_by_cosine(
        clustered, threshold=_SEMDEDUP_THRESHOLD, block_col="cluster"
    )
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return (
        clustered.select("vec_id", "cluster")
        .join(dropped.withColumn("__d", F.lit(1)), "vec_id", "left")
        .select("vec_id", "cluster", F.col("__d").isNull().alias("kept"))
    )

# ---------------------------------------------------------------------------
# q91 — MinHash-LSH banding sweep: (bands x rows) scored vs exact Jaccard
# ---------------------------------------------------------------------------
# more bands = lower collision bar per band (higher recall, more false
# candidates); fewer bands = stricter (cheaper verify pass, misses
# borderline pairs). The S-curve operating point, measured — the banding
# complement of q82's (nbits x radius) matrix for hyperplane LSH.
_BAND_SWEEP = [("bands2_rows4", 2), ("bands4_rows2", 4), ("bands8_rows1", 8)]

def _banding_sweep_sql() -> str:
    blocks, selects = [], []
    for tag, bands in _BAND_SWEEP:
        rows = _NUM_HASHES // bands
        band_rows = " UNION ALL ".join(
            "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
                b=b,
                parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
            )
            for b in range(bands)
        )
        blocks.append(
            f"""bb_{tag} AS ({band_rows}),
    cand_{tag} AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bb_{tag} a JOIN bb_{tag} b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )"""
        )
        selects.append(
            f"""SELECT '{tag}' AS method,
           CAST((SELECT COUNT(*) FROM cand_{tag}) AS INT) AS n_candidates,
           CAST((SELECT COUNT(*) FROM truth) AS INT) AS n_truth,
           CAST((SELECT COUNT(*) FROM truth t JOIN cand_{tag} c
                 ON t.id_a = c.id_a AND t.id_b = c.id_b) AS INT) AS n_caught,
           (SELECT COUNT(*) FROM truth t JOIN cand_{tag} c
            ON t.id_a = c.id_a AND t.id_b = c.id_b) * CAST(1.0 AS DOUBLE)
             / nullif((SELECT COUNT(*) FROM truth), 0) AS recall,
           (SELECT COUNT(*) FROM truth t JOIN cand_{tag} c
            ON t.id_a = c.id_a AND t.id_b = c.id_b) * CAST(1.0 AS DOUBLE)
             / nullif((SELECT COUNT(*) FROM cand_{tag}), 0) AS precision"""
        )
    return (
        f"""
    WITH {_SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
    f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
          WHERE dfreq.df_count <= {_MAX_DF}),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common * 1.0 / (sa.set_size + sb.set_size - n_common)
            >= {_JACCARD_THRESHOLD}
    ),
    """
        + ",\n    ".join(blocks)
        + "\n    "
        + "\n    UNION ALL\n    ".join(selects)
    )


@register(
    "q91_banding_sweep",
    _banding_sweep_sql(),
    doc="MinHash-LSH banding sweep: candidate recall/precision per "
    "(bands x rows) config vs the exact df-capped Jaccard ground truth "
    "— ONE signature subplan feeds every config (ReuseExchange), the "
    "S-curve measurement that picks the banding before a 100 TB dedup",
)
def q91_banding_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both shared inputs are materialized eagerly (the q75 lesson): the
    # banding branches project different sig columns, which defeats
    # exchange canonicalization, so without the cache the
    # shingle->md5->aggregate pipeline runs once per band branch and the
    # expensive df-capped Jaccard self-join once per config (measured
    # ~2x total). Both tables are tiny: doc-count-sized sigs,
    # pair-count-sized truth. r12: sigs/truth build as ONE overlapped
    # pair of jobs, and the three per-config cap checkpoints (which all
    # read the held sigs) run overlapped too (guide §2.6) — eager holds
    # instead of the old lazy pins, because concurrent branches racing
    # a cold lazy pin would each recompute it (ADR-0007).
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    sigs, truth = overlap(
        lambda: hold(
            dd.minhash_signatures(d, "doc_id", "text", num_hashes=_NUM_HASHES)
        ),
        lambda: hold(
            dd.ngram_jaccard_pairs(
                d, "doc_id", "text", threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF
            ).select("id_a", "id_b")
        ),
    )
    # materialize=True (default): each config's cand feeds TWO
    # consumers (the count aggregate and the caught join) — without
    # the eager hold both re-run the anti-join + self-join from the
    # held sigs table (r9 triage measured 7.9s vs 6.7s held). The
    # per-config cap work itself (drops shuffle + materialization)
    # is deliberate skew-guard cost, rebaselined epoch 9 like q280.
    cands = overlap(
        *[
            (
                lambda bands=bands: dd.candidate_pairs_from_signatures(
                    sigs, "doc_id", _NUM_HASHES, bands
                )
            )
            for _, bands in _BAND_SWEEP
        ]
    )
    outs = []
    for (method, bands), cand in zip(_BAND_SWEEP, cands):
        caught = truth.join(cand, ["id_a", "id_b"])
        outs.append(
            cand.agg(F.count("*").cast("int").alias("n_candidates"))
            .crossJoin(truth.agg(F.count("*").cast("int").alias("n_truth")))
            .crossJoin(caught.agg(F.count("*").cast("int").alias("n_caught")))
            .select(
                F.lit(method).alias("method"),
                "n_candidates",
                "n_truth",
                "n_caught",
                F.expr("CAST(n_caught AS DOUBLE) / nullif(n_truth, 0)").alias("recall"),
                F.expr(
                    "CAST(n_caught AS DOUBLE) / nullif(n_candidates, 0)"
                ).alias("precision"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out

# ---------------------------------------------------------------------------
# q108 — blocked record linkage: entity resolution on structured rows
# ---------------------------------------------------------------------------
_LINK_MAX_LEV = 2


@register(
    "q108_record_linkage",
    f"""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS lev
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= {_LINK_MAX_LEV}
    """,
    doc="blocked record linkage (Fellegi-Sunter blocking+verify, the "
    "entity-resolution counterpart of the text dedup family): candidate "
    "pairs only within (nation, segment) blocks — an equi-join, never "
    "all-pairs — verified by Levenshtein on the name (integer DP, "
    "bit-portable). Blocking-key selectivity is the scale lever, the "
    "analogue of the shingle df-cap",
)
def q108_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = ensure_parallelism(load_table(spark, sf_dir, "customer"), "c_custkey")
    return dd.record_linkage_pairs(
        c, "c_custkey", "c_name",
        block_cols=["c_nationkey", "c_mktsegment"], max_lev=_LINK_MAX_LEV,
    )

# ---------------------------------------------------------------------------
# q119 — FUZZY decontamination: MinHash-LSH candidates across the
# train/benchmark boundary + exact-Jaccard verify (q60 catches verbatim
# overlap; this catches paraphrased/near-duplicate leakage)
# ---------------------------------------------------------------------------
_FUZZY_DECON_THRESHOLD = 0.4

def _fuzzy_decon_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    thr = _FUZZY_DECON_THRESHOLD
    return f"""
    WITH {_SHINGLES_CTE},
    fl AS (SELECT doc_id, {hash_bucket_sql('doc_id', 20)} = 0 AS bench
           FROM documents),
    sigs AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_shingles, {_sig_exprs()}
             FROM sh GROUP BY doc_id),
    bb AS ({band_rows}),
    bbf AS (SELECT bb.doc_id, band, bucket, bench FROM bb JOIN fl USING (doc_id)),
    cand AS (
      SELECT DISTINCT t.doc_id AS train_id, s.doc_id AS bench_id
      FROM bbf t JOIN bbf s ON t.band = s.band AND t.bucket = s.bucket
      WHERE NOT t.bench AND s.bench
    ),
    dfreq AS (SELECT shingle, COUNT(*) AS dfc FROM sh GROUP BY 1),
    capped AS (
      SELECT sh.doc_id, sh.shingle, fl.bench
      FROM sh JOIN dfreq USING (shingle) JOIN fl USING (doc_id)
      WHERE dfc <= {_MAX_DF}
    ),
    ft AS (SELECT doc_id AS train_id, shingle FROM capped
           WHERE NOT bench AND doc_id IN (SELECT train_id FROM cand)),
    fs AS (SELECT doc_id AS bench_id, shingle FROM capped
           WHERE bench AND doc_id IN (SELECT bench_id FROM cand)),
    inter AS (
      SELECT ft.train_id, fs.bench_id, COUNT(*) AS n_common
      FROM ft JOIN fs USING (shingle)
      GROUP BY 1, 2
    )
    SELECT i.train_id, i.bench_id, CAST(i.n_common AS BIGINT) AS n_common,
           FLOOR((i.n_common * 1.0 / (sa.n_shingles + sb.n_shingles - i.n_common))
                 * 1000000e0) / 1000000e0 AS jaccard
    FROM inter i
    JOIN cand USING (train_id, bench_id)
    JOIN sigs sa ON sa.doc_id = i.train_id
    JOIN sigs sb ON sb.doc_id = i.bench_id
    WHERE i.n_common * 1.0 / (sa.n_shingles + sb.n_shingles - i.n_common) >= {thr}
    """


@register(
    "q119_fuzzy_decontamination",
    _fuzzy_decon_sql(),
    doc="fuzzy benchmark decontamination (the PaLM/GPT-style near-dup "
    "leakage scan): a 5% hash-designated benchmark side, MinHash-LSH "
    "candidates restricted CROSS-side (train x bench per band bucket — "
    "never train x train), df-capped exact-Jaccard verify on candidate "
    "ids only, re-filtered against the candidate set. One shared "
    "shingle subplan (pinned) feeds signatures, df-cap, and verify",
)
def q119_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.fuzzy_decontaminate(
        d,
        "doc_id",
        "text",
        bench=hash_bucket(F.col("doc_id"), 20) == 0,
        num_hashes=_NUM_HASHES,
        bands=_BANDS,
        threshold=_FUZZY_DECON_THRESHOLD,
        max_df=_MAX_DF,
        persist_fn=hold,
    )

# ---------------------------------------------------------------------------
# q120 — soft dedup: duplicate-cluster-aware sampling weights
# (keep every copy, downweight by cluster size — the alternative to
# q56's hard keeper selection when provenance diversity matters)
# ---------------------------------------------------------------------------
@register(
    "q120_softdedup_weights",
    f"""
    SELECT doc_id, group_id,
           CAST(COUNT(*) OVER (PARTITION BY group_id) AS INT) AS group_size,
           CAST(1 AS DOUBLE) / COUNT(*) OVER (PARTITION BY group_id) AS weight,
           doc_id = group_id AS keeper
    FROM ({_neardup_groups_sql()}) g
    """,
    doc="soft dedup: every document keeps a sampling weight 1/|its "
    "near-dup cluster| (and the min-label keeper flag) instead of being "
    "dropped — total cluster mass stays 1, so the training distribution "
    "is dedup-corrected while provenance diversity survives. One "
    "bounded window (cluster key) on top of the q56 label-propagation "
    "plan; the weight is a single double division, bit-identical "
    "cross-engine",
)
def q120_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    groups = dd.neardup_groups(
        d, "doc_id", "text",
        threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF, iters=_LP_ITERS,
        persist_fn=hold,
    )
    size = F.count("*").over(W.partitionBy("group_id"))
    return groups.select(
        "doc_id",
        "group_id",
        size.cast("int").alias("group_size"),
        (F.lit(1).cast("double") / size).alias("weight"),
        (F.col("doc_id") == F.col("group_id")).alias("keeper"),
    )

# ---------------------------------------------------------------------------
# q124 — per-document duplication ratio: what fraction of a document's
# verbatim 8-token runs occur in OTHER documents (the Lee-et-al-style
# memorization-risk score; q41 finds the pairs, q59 the spans — this is
# the per-doc FILTER signal)
# ---------------------------------------------------------------------------
@register(
    "q124_duplication_ratio",
    """
    WITH fps AS (
      SELECT DISTINCT doc_id, substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                                      w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' ||
                                      w[i+6] || ' ' || w[i+7]), 1, 16) AS fp
      FROM (SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS w
            FROM documents),
           UNNEST(generate_series(1, len(w) - 7)) AS t(i)
      WHERE len(w) >= 8
    ),
    docfreq AS (SELECT fp, COUNT(*) AS nd FROM fps GROUP BY fp),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS INT) AS n_windows,
             CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS INT) AS n_shared
      FROM fps JOIN docfreq USING (fp) GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(n_windows, 0) AS n_windows,
           COALESCE(n_shared, 0) AS n_shared,
           CASE WHEN n_windows IS NULL THEN NULL
                ELSE CAST(n_shared AS DOUBLE) / n_windows END AS dup_ratio
    FROM documents d LEFT JOIN per_doc USING (doc_id)
    """,
    doc="per-document duplication ratio: the fraction of a doc's "
    "distinct verbatim 8-token windows that also appear in at least "
    "one other document — the per-doc memorization-risk filter signal "
    "(threshold it to drop mostly-duplicated docs while q56/q120 handle "
    "whole-document clusters). One fingerprint shuffle (map-side "
    "combined document frequencies joined back on the hash key), then "
    "a map-side per-doc aggregate",
)
def q124_duplication_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    fps = d.select(
        "doc_id", F.explode(tk.window_fingerprints(F.col("text"), window=8)).alias("fp")
    )
    docfreq = fps.groupBy("fp").agg(F.count("*").alias("nd"))
    per_doc = (
        fps.join(docfreq, "fp")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_windows"),
            F.sum((F.col("nd") > 1).cast("int")).cast("int").alias("n_shared"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.col("n_shared").cast("double") / F.col("n_windows")).alias("dup_ratio"),
        )
    )

# ---------------------------------------------------------------------------
# q131 — dedup-corrected sampling: weighted reservoir sampling WITHOUT
# replacement (A-ES / Efraimidis-Spirakis) over the q120 soft-dedup
# weights — pick a training subset in which every near-dup CLUSTER
# carries total mass 1, with derandomized keys so reruns and the oracle
# agree exactly (q100's Gumbel discipline applied to weighted sampling)
# ---------------------------------------------------------------------------
_SOFTSAMPLE_K = 100

def _softdedup_sample_sql() -> str:
    u = f"(({_hash_bucket_duck('doc_id', _GUMBEL_SPAN)} + 0.5) / {float(_GUMBEL_SPAN)!r})"
    return f"""
    WITH g AS ({_neardup_groups_sql()}),
    sized AS (
      SELECT doc_id, group_id,
             CAST(COUNT(*) OVER (PARTITION BY group_id) AS INT) AS group_size
      FROM g
    ),
    keyed AS (
      SELECT doc_id, group_id, group_size,
             ROUND(ln({u}) * group_size, 6) AS sample_key
      FROM sized
    )
    SELECT doc_id, group_id, group_size, sample_key
    FROM keyed ORDER BY sample_key DESC, doc_id LIMIT {_SOFTSAMPLE_K}
    """


@register(
    "q131_softdedup_sample",
    _softdedup_sample_sql(),
    doc="dedup-corrected training subset: Efraimidis-Spirakis weighted "
    "sampling without replacement (key = ln(u)^(1/w) in log space = "
    "ln(u) * cluster_size, u derandomized from md5(doc_id)) over the "
    "q120 soft-dedup weights — a cluster of 10 near-dups gets the same "
    "total selection mass as a unique document, so the sample is "
    "dedup-corrected WITHOUT dropping provenance. One narrow map + "
    "TakeOrderedAndProject over the q56 propagation plan",
)
def q131_softdedup_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    groups = dd.neardup_groups(
        d, "doc_id", "text",
        threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF, iters=_LP_ITERS,
        persist_fn=hold,
    )
    gs = F.count("*").over(W.partitionBy("group_id")).cast("int")
    u = (hash_bucket(F.col("doc_id"), _GUMBEL_SPAN) + F.lit(0.5)) / F.lit(
        float(_GUMBEL_SPAN)
    )
    keyed = groups.select(
        "doc_id",
        "group_id",
        gs.alias("group_size"),
        F.round(F.log(u) * gs, 6).alias("sample_key"),
    )
    return keyed.orderBy(F.col("sample_key").desc(), "doc_id").limit(_SOFTSAMPLE_K)

# ---------------------------------------------------------------------------
# q137 — per-document longest duplicated window via a doubling ladder
# (the variable-length upgrade over the fixed-n span family: q59
# detects 4-gram spans, q93 scrubs them, q124 ratios them; this
# measures HOW LONG the verbatim overlap runs — the ExactSubstr length
# signal of Lee et al. without a distributed suffix array)
# ---------------------------------------------------------------------------
_LADDER = [4, 8, 16, 32, 64]

# Skew guard for the r12 collect_set fusion (q137/q164): a span shared
# by k docs used to concentrate a k-element set in ONE aggregation
# buffer on one reducer key — fine at sf0.1 (k is tiny) but the §5
# memory / §2.5 skew class at 100 TB, where a boilerplate span
# (header/footer/license block) is shared by millions of docs.
# Aggregation buffers holding arrays do not spill element-wise; window
# row buffers do (ExternalAppendOnlyUnsafeRowArray spills a partition's
# current key group to disk past the spill threshold), so the guarded
# shape keeps member docs as ROWS: dedup (sp, doc_id) in a hash
# aggregate (partial map-side, perfectly spread over both columns),
# then COUNT(*) OVER (PARTITION BY sp) — the distinct-doc vote — with a
# hot span's rows buffered spillably inside one window key group
# instead of one unbounded in-memory array. Measured at sf0.1 (rung
# n=4, min-of-3): fused 0.79 s, this shape 0.69 s (parity), the salted
# two-level collect_set alternative 1.20 s (its second aggregate
# re-runs the corpus-sized final merge) — receipts in
# OPTIMIZATION_r13.md.


def _dup_span_members(spans: DataFrame, with_leader: bool = False) -> DataFrame:
    """(sp, doc_id) rows of spans held by >=2 distinct docs.

    Exact: dropDuplicates collapses within-doc repeats (the
    distinct-per-doc voting rule), so the per-span window count IS the
    distinct-doc count. One corpus pass — the explode below `spans` is
    evaluated once; no doc array is ever materialized per span.

    ``with_leader`` adds an ``is_leader`` flag (the member with the
    span's min doc_id), computed by the SAME unordered window spec so
    it shares the one WindowExec — a consumer that needs the dup-SPAN
    count (q164's probe trace) counts leader rows with a plain filter
    instead of paying a distinct exchange per probe.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("sp")
    dd = spans.dropDuplicates(["sp", "doc_id"])
    dd = dd.withColumn("nd", F.count("*").over(w))
    if with_leader:
        dd = dd.withColumn(
            "is_leader", F.col("doc_id") == F.min("doc_id").over(w)
        )
    cols = ["sp", "doc_id"] + (["is_leader"] if with_leader else [])
    return dd.filter(F.col("nd") >= 2).select(*cols)


def _dup_span_members_1x(spans: DataFrame) -> DataFrame:
    """Single-exchange variant of _dup_span_members, with is_leader.

    Same exact semantics (distinct-per-doc votes, >=2-doc spans, member
    rows), but everything runs inside ONE exchange on sp: first
    occurrences are marked with lag over (sp ORDER BY doc_id) — a
    within-doc repeat sorts adjacent and is lag-equal — and the
    distinct-doc count is a window sum of those marks. q164 runs 11
    binary-search probes of 2 actions each, so per-probe STAGE count
    dominates its collapsed-set tail; this form keeps the r12 fused
    shape's one corpus exchange (measured 1.24 s vs fused 1.21 s on the
    head-probe scale; the two-exchange dedup form measured 1.31 s and
    cost 1.2x on the full query). Skew guard holds: a hot span's rows
    land in one window key group, which WindowExec buffers spillably —
    never an unbounded in-memory array.
    """
    from pyspark.sql import Window

    w_ord = Window.partitionBy("sp").orderBy("doc_id")
    w_all = Window.partitionBy("sp")
    rn = F.row_number().over(w_ord)
    lagd = F.lag("doc_id").over(w_ord)
    marked = spans.select(
        "sp",
        "doc_id",
        (rn == 1).alias("is_leader"),
        (lagd.isNull() | (lagd != F.col("doc_id"))).alias("first_occ"),
    )
    return (
        marked.withColumn(
            "nd", F.sum(F.col("first_occ").cast("int")).over(w_all)
        )
        .filter((F.col("nd") >= 2) & F.col("first_occ"))
        .select("sp", "doc_id", "is_leader")
    )


def _dup_ladder_sql() -> str:
    ctes = [
        "toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w "
        "FROM documents)"
    ]
    prev_src = "toks"
    levels = []
    for n in _LADDER:
        s, d = f"s{n}", f"d{n}"
        ctes.append(
            f"""{s} AS (
      SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+{n - 1}], ' ')) AS sp
      FROM {prev_src}, UNNEST(generate_series(1, len(w) - {n - 1})) AS t(i)
      WHERE len(w) >= {n}
    )"""
        )
        ctes.append(
            f"""{d} AS (
      SELECT DISTINCT doc_id FROM {s}
      WHERE sp IN (SELECT sp FROM {s} GROUP BY sp HAVING COUNT(*) >= 2)
    )"""
        )
        levels.append(f"SELECT doc_id, {n} AS lvl FROM {d}")
        prev_src = f"(SELECT toks.* FROM toks JOIN {d} USING (doc_id))"
    lvl_union = " UNION ALL ".join(levels)
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH {cte_block},
    lv AS ({lvl_union}),
    best AS (SELECT doc_id, MAX(lvl) AS mx FROM lv GROUP BY 1)
    SELECT t.doc_id, CAST(len(t.w) AS INT) AS n_tokens,
           CAST(COALESCE(b.mx, 0) AS INT) AS max_dup_window
    FROM toks t LEFT JOIN best b USING (doc_id)
    """


@register(
    "q137_dup_window_ladder",
    _dup_ladder_sql(),
    doc="per-document longest cross-doc duplicated window at power-of-2 "
    "resolution (doubling ladder 4..64): each rung explodes windows ONLY "
    "for documents that passed the previous rung — a shared 2n-window "
    "implies a shared n-window, so the candidate set shrinks "
    "geometrically and the total shuffle is O(tokens of still-duplicated "
    "docs) per rung, never 5x the corpus. The variable-length "
    "ExactSubstr signal (Lee et al.) without a suffix array; spans "
    "distinct-per-doc before the count so within-doc repeats don't vote",
)
def q137_dup_window_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+", -1).alias("w")
    )
    cur = toks
    level_tables = []
    for n in _LADDER:
        spans = (
            cur.filter(F.size("w") >= n)
            .select(
                "doc_id",
                F.explode(F.sequence(F.lit(1), F.size("w") - (n - 1))).alias("i"),
                "w",
            )
            .select(
                "doc_id",
                # md5 the window BEFORE the shuffle: a 64-token span is
                # ~400 bytes, its hash 32 — the aggregate exchange
                # carries the hash only (engine-portable, so the
                # oracle hashes identically)
                F.md5(F.array_join(F.slice("w", F.col("i"), n), " ")).alias("sp"),
            )
        )
        # ONE corpus pass per rung (r12): collect_set(doc_id) both
        # dedups within-doc repeats (the old pre-aggregate DISTINCT)
        # and keeps the member docs, so the docs-holding-a-dup-span set
        # falls out of the same aggregate that counts votes — the old
        # shape recomputed the explode+distinct a second time to join
        # spans back against dup_spans. r13: row-based skew-guarded form
        # (_dup_span_members) so a boilerplate span shared by millions
        # of docs cannot concentrate one unbounded doc array in a
        # single aggregation buffer (guide §2.5/§5); equivalence and
        # the spill bound are argued at the helper.
        dup_docs = hold(
            _dup_span_members(spans).select("doc_id").distinct()
        )
        level_tables.append(dup_docs.withColumn("lvl", F.lit(n)))
        cur = toks.join(dup_docs, "doc_id")
    lv = level_tables[0]
    for t in level_tables[1:]:
        lv = lv.unionAll(t)
    best = lv.groupBy("doc_id").agg(F.max("lvl").alias("mx"))
    return toks.join(best, "doc_id", "left").select(
        "doc_id",
        F.size("w").cast("int").alias("n_tokens"),
        F.coalesce("mx", F.lit(0)).cast("int").alias("max_dup_window"),
    )

# ---------------------------------------------------------------------------
# q142 — Z-order (Morton) data layout: the multi-column clustering
# primitive behind Delta/Iceberg OPTIMIZE ZORDER. Rows are laid out
# along an interleaved-bit curve over (l_partkey, l_suppkey) and cut
# into 16 "files"; the output is the per-file min/max envelope of BOTH
# columns — the zone-map metric that decides how many files a
# two-predicate scan can skip. Everything is exact integer arithmetic
# from ONE template (q127 discipline), so the layout hash-verifies.
# ---------------------------------------------------------------------------
_Z_BITS = 16

_Z_FILES = 16

def _zorder_sql(table: str, idiv: str) -> str:
    # 16-bit normalized rank per column, then bit interleave: exact
    # integer ops only (the scale product fits int64: values < 2^31)
    def norm(v: str, mn: str, mx: str) -> str:
        return (
            f"CASE WHEN {mx} = {mn} THEN 0 ELSE "
            f"((({v} - {mn}) * {(1 << _Z_BITS) - 1}) {idiv} ({mx} - {mn})) END"
        )

    interleave = " + ".join(
        f"((xn {idiv} {1 << i}) % 2) * {1 << (2 * i)} "
        f"+ ((yn {idiv} {1 << i}) % 2) * {1 << (2 * i + 1)}"
        for i in range(_Z_BITS)
    )
    file_width = (1 << (2 * _Z_BITS)) // _Z_FILES
    return f"""
    WITH st AS (
      SELECT CAST(MIN(l_partkey) AS BIGINT) AS pmin, CAST(MAX(l_partkey) AS BIGINT) AS pmax,
             CAST(MIN(l_suppkey) AS BIGINT) AS smin, CAST(MAX(l_suppkey) AS BIGINT) AS smax
      FROM {table}
    ),
    nrm AS (
      SELECT CAST(l_partkey AS BIGINT) AS pk, CAST(l_suppkey AS BIGINT) AS sk,
             {norm('CAST(l_partkey AS BIGINT)', 'st.pmin', 'st.pmax')} AS xn,
             {norm('CAST(l_suppkey AS BIGINT)', 'st.smin', 'st.smax')} AS yn
      FROM {table} CROSS JOIN st
    ),
    z AS (SELECT pk, sk, ({interleave}) AS zval FROM nrm),
    f AS (SELECT pk, sk, CAST(zval {idiv} {file_width} AS INT) AS file_id FROM z)
    SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(pk) AS part_lo, MAX(pk) AS part_hi,
           MIN(sk) AS supp_lo, MAX(sk) AS supp_hi
    FROM f GROUP BY 1
    """


@register(
    "q142_zorder_layout",
    _zorder_sql("lineitem", "//"),
    doc="Z-order (Morton) multi-column clustering over (l_partkey, "
    "l_suppkey): 16-bit normalized ranks bit-interleaved into a 32-bit "
    "curve position, rows cut into 16 equal curve ranges ('files'), and "
    "the per-file min/max envelope of BOTH columns emitted — the "
    "zone-map quality a two-predicate scan skips files by (linear "
    "layout keys one column tight and the other full-range; the curve "
    "bounds both). Exact integer arithmetic from one SQL template; the "
    "only corpus shuffle is the final 16-group aggregate, min/max stats "
    "are a one-row broadcast",
)
def q142_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q142")
    return spark.sql(_zorder_sql("lineitem_q142", " div "))

# ---------------------------------------------------------------------------
# q164 — EXACT corpus-wide longest duplicated window length by binary
# search: the arbitrary-length completion of q137's power-of-2 ladder
# (ExactSubstr's length statistic, Lee et al., without a suffix array)
# ---------------------------------------------------------------------------
_EXD_MAX = 96  # search space [0, _EXD_MAX]

# probe = min(binary midpoint, 2*max(lo, 2)): doubling from below until
# the first miss, pure binary afterwards — one formula, no phase flag.
# Worst case 5 doubling probes (4..64) + 6 binary probes ([64,96] is 33
# wide), so 11 fixed steps always converge; early-converged steps
# re-probe lo over the tiny candidate set (no-ops, pennies)
_EXD_STEPS = 11

def _exact_dup_sql(maxn: int = _EXD_MAX, steps: int = _EXD_STEPS) -> str:
    """Replay of the driver-side binary search: one (probe, dup-count,
    state, candidate-set) CTE group per step, MATERIALIZED so the
    candidate-doc chain doesn't inline exponentially."""
    ctes = [
        """toks AS MATERIALIZED (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    )""",
        f"st0 AS MATERIALIZED (SELECT CAST(0 AS INT) AS lo, CAST({maxn} AS INT) AS hi)",
        "cand0 AS MATERIALIZED (SELECT doc_id FROM documents)",
    ]
    traces = []
    for i in range(1, steps + 1):
        p = i - 1
        ctes += [
            f"""mid{i} AS MATERIALIZED (
      SELECT CAST(GREATEST(LEAST((lo + hi + 1) // 2, 2 * GREATEST(lo, 2)), 1)
                  AS INT) AS m
      FROM st{p}
    )""",
            f"""dup{i} AS MATERIALIZED (
      SELECT sp, CAST(COUNT(*) AS BIGINT) AS nd FROM (
        SELECT DISTINCT t.doc_id, md5(array_to_string(t.w[q.i : q.i + m.m - 1], ' ')) AS sp
        FROM toks t
        JOIN cand{p} c ON c.doc_id = t.doc_id
        CROSS JOIN mid{i} m,
        UNNEST(generate_series(1, len(t.w) - m.m + 1)) AS q(i)
        WHERE len(t.w) >= m.m
      ) GROUP BY sp HAVING COUNT(*) >= 2
    )""",
            f"""n{i} AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dup{i})""",
            f"""st{i} AS MATERIALIZED (
      SELECT CASE WHEN n.n > 0 THEN m.m ELSE s.lo END AS lo,
             CASE WHEN n.n > 0 THEN s.hi ELSE m.m - 1 END AS hi
      FROM st{p} s, mid{i} m, n{i} n
    )""",
            f"""cand{i} AS MATERIALIZED (
      SELECT DISTINCT t.doc_id
      FROM toks t JOIN cand{p} c ON c.doc_id = t.doc_id
      CROSS JOIN mid{i} m, n{i} n,
      UNNEST(generate_series(1, len(t.w) - m.m + 1)) AS q(i)
      WHERE n.n > 0 AND len(t.w) >= m.m
        AND md5(array_to_string(t.w[q.i : q.i + m.m - 1], ' '))
              IN (SELECT sp FROM dup{i})
      UNION ALL
      SELECT c.doc_id FROM cand{p} c CROSS JOIN n{i} n WHERE n.n = 0
    )""",
        ]
        traces.append(
            f"""SELECT CAST({i} AS INT) AS step, m.m AS probe_len, n.n AS n_dup_spans,
             CAST(CASE WHEN n.n > 0 THEN 1 ELSE 0 END AS INT) AS went_up,
             s.lo AS lo_after, s.hi AS hi_after
      FROM mid{i} m, n{i} n, st{i} s"""
        )
    cte_block = ",\n    ".join(ctes)
    union = "\n    UNION ALL ".join(traces)
    return f"""
    WITH {cte_block}
    {union}
    ORDER BY step
    """


@register(
    "q164_exact_dup_length",
    _exact_dup_sql(),
    doc="EXACT longest cross-document duplicated window length (token "
    "count) by a doubling-capped binary search over [0, 96]: probe "
    "length = min(binary midpoint, 2*max(lo,2)), so the search doubles "
    "from 4 while it keeps hitting and turns into pure binary search "
    "after the first miss — the full-corpus probes only ever use SHORT "
    "windows (a naive midpoint-first search md5'd 48-token windows over "
    "the whole corpus and measured 123s at sf0.1; this shape is ~25x "
    "cheaper), and by the time lengths grow the candidate-doc set has "
    "collapsed to the docs still holding a duplicate (lossless: a "
    "longer shared window implies the shorter one). Windows md5 before "
    "the shuffle; 11 fixed probes emit the full trace — lo_after of the "
    "last row is the exact answer; early convergence makes the spare "
    "probes tiny re-probes of lo. Driver holds two integers. "
    "r10 floor check: per-step profile (sf0.1, host 1.05x off peak) = "
    "1.2s/1.2s for the two corpus-scale probes (mid 4/8), then 0.4-0.7s "
    "x9 late probes that are pure 3-job overhead on a collapsed "
    "candidate set; answer saturates the 96 cap so all 11 probes hit. "
    "Eagerly holding the per-step span table (one explode+distinct, two "
    "cached consumers) measured 10% SLOWER warm in a bracketed A/B "
    "(6.55s vs 5.95s min-of-3): the count and candidate-join consumers "
    "run serially — no ADR-0007 race — and recomputing the codegen "
    "explode over pinned toks beats writing 10M span rows to block "
    "storage. On a cluster whose input is NOT executor-cached the same "
    "hold wins; local bench keeps the recompute",
)
def q164_exact_dup_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.holds import hold_ids, release_ids

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = pin(
        d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+", -1).alias("w"))
    )
    cand = toks.select("doc_id")
    cand_ids: list[int] = []
    lo, hi = 0, _EXD_MAX
    trace = []
    for step in range(1, _EXD_STEPS + 1):
        mid = max(min((lo + hi + 1) // 2, 2 * max(lo, 2)), 1)
        spans = (
            toks.join(cand, "doc_id")
            .filter(F.size("w") >= mid)
            .select(
                "doc_id",
                F.explode(F.sequence(F.lit(1), F.size("w") - (mid - 1))).alias("i"),
                "w",
            )
            .select(
                "doc_id",
                # xxhash64, not md5: only the per-step DUPLICATED-SPAN
                # COUNT enters the result (and the oracle compare), so
                # any collision-free hash yields the identical trace —
                # and this one is JVM-native, no hex encode. The oracle
                # keeps md5; both sides count the same distinct spans.
                F.xxhash64(F.array_join(F.slice("w", F.col("i"), mid), " ")).alias(
                    "sp"
                ),
            )
        )
        # ONE corpus pass per probe (r12): collect_set(doc_id) replaces
        # the pre-aggregate DISTINCT (within-doc repeats collapse inside
        # the set) and keeps the member docs, so the next candidate set
        # reads out of the SAME pinned aggregate instead of re-running
        # the explode to join spans back against dup — the old shape
        # paid 2 corpus explode passes per probe (the dup count and the
        # candidate join), exactly the cost the step profile showed
        # (1.2s x2 head probes). dup rows are only the >=2-doc spans,
        # so the pinned footprint stays tiny. r13: row-based
        # skew-guarded form (_dup_span_members) — no per-span doc array
        # in any aggregation buffer (guide §2.5/§5); dup now holds
        # (sp, doc_id, is_leader) member rows, so the dup-span count is
        # a leader-row count (no per-probe distinct exchange) and
        # candidates read the doc_id column. The single-exchange form
        # keeps the probe's stage count at the r12 level (see helper).
        dup = pin(_dup_span_members_1x(spans))
        n = dup.filter("is_leader").count()
        if n > 0:
            # localCheckpoint, not pin: 11 steps each referencing the
            # previous candidate set through spans+dup nests the logical
            # plan O(2^steps) deep — at 7 steps analysis was slow, at 11
            # even building the plan STRING overflowed the heap. The
            # checkpoint makes each round's candidate set a leaf (the
            # q165/q135 lesson). Held through the holds registry so the
            # superseded step's blocks free NOW and the last step's at
            # the next query (the no-leak sweep caught the bare
            # localCheckpoint leaking all 10 step RDDs for the session).
            # Eager: the new candidate set must materialize BEFORE the
            # old one — whose lineage the previous checkpoint truncated —
            # is unpersisted; the work is identical either way (the
            # checkpoint is a plan leaf, so the next count couldn't have
            # fused past it).
            new_cand, new_ids = hold_ids(
                dup.select("doc_id").distinct(),
                eager=True,
            )
            release_ids(spark, cand_ids)
            cand, cand_ids = new_cand, new_ids
            lo = mid
        else:
            hi = mid - 1
        trace.append((step, mid, n, 1 if n > 0 else 0, lo, hi))
    return spark.createDataFrame(
        trace,
        "step int, probe_len int, n_dup_spans bigint, went_up int, "
        "lo_after int, hi_after int",
    )

# ---------------------------------------------------------------------------
# q168 — small-file compaction planner: the lakehouse maintenance op
# next to z-order layout (q142), SCD2 (q143) and incremental MV (q141)
# ---------------------------------------------------------------------------
_COMPACT_TARGET = 65536  # target bytes per compacted output file


@register(
    "q168_compaction_plan",
    f"""
    WITH sized AS (
      SELECT source, doc_id, n_chars,
             COALESCE(SUM(n_chars) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      FROM documents
    ),
    binned AS (
      SELECT source, doc_id, n_chars,
             CAST(prior // {_COMPACT_TARGET} AS INT) AS bin
      FROM sized
    )
    SELECT source, bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_chars) AS BIGINT) AS bytes,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / {_COMPACT_TARGET}, 4)
             AS fill_ratio
    FROM binned GROUP BY source, bin
    ORDER BY source, bin
    """,
    doc="small-file compaction planner: treats each document as an "
    "input file of n_chars bytes and assigns per-source compaction "
    "bins by the cumulative-sum next-fit rule (bin = floor(bytes "
    "before me / target)) — the same parallel bin rule as q80's "
    "sequence packing, so the plan needs one window cumsum per "
    "source, no sequential driver loop (first-fit-decreasing would "
    "serialize; next-fit overshoots a bin by at most one file, the "
    "standard trade for a fully parallel planner). Emits the "
    "compaction manifest: files, bytes, id range, fill ratio per bin",
)
def q168_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    win = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.floor(
            F.coalesce(F.sum("n_chars").over(win), F.lit(0)) / _COMPACT_TARGET
        )
        .cast("int")
        .alias("bin"),
    )
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("n_chars").cast("long").alias("bytes"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
            F.round(
                F.sum("n_chars").cast("double") / _COMPACT_TARGET, 4
            ).alias("fill_ratio"),
        )
        .orderBy("source", "bin")
    )

# ---------------------------------------------------------------------------
# q182 — cross-source duplication attribution: WHICH sources duplicate
# WHICH — the provenance matrix behind q30's exact-dup groups and
# q124's corpus-level ratio (mirror-heavy source pairs jump out)
# ---------------------------------------------------------------------------
@register(
    "q182_dup_attribution",
    """
    WITH fp AS (
      SELECT DISTINCT md5(text) AS fp, source FROM documents
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS shared_contents
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_contents FROM fp GROUP BY 1
    )
    SELECT p.source_a, p.source_b, p.shared_contents,
           ta.n_contents AS n_a, tb.n_contents AS n_b,
           ROUND(CAST(p.shared_contents AS DOUBLE)
                 / LEAST(ta.n_contents, tb.n_contents), 6) AS containment
    FROM pairs p
    JOIN tot ta ON ta.source = p.source_a
    JOIN tot tb ON tb.source = p.source_b
    ORDER BY source_a, source_b
    """,
    doc="cross-source duplication attribution matrix: distinct content "
    "fingerprints per source self-joined on the 16-byte hash (source "
    "pairs ordered a<b), with pairwise containment = shared / "
    "min(|a|,|b|) — the provenance report that turns q30's dup groups "
    "into an actionable 'source X mirrors source Y' decision. The join "
    "carries only distinct (fp, source) rows — content-group-sized, "
    "never corpus-sized — and fans out only where a fingerprint "
    "genuinely spans sources; totals broadcast back onto the "
    "|sources|^2-bounded pair table",
)
def q182_dup_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -18% (0.83->0.68)
    fp = hold(d.select(F.md5("text").alias("fp"), "source").distinct())
    a = fp.select(F.col("fp"), F.col("source").alias("source_a"))
    b = fp.select(F.col("fp"), F.col("source").alias("source_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("shared_contents"))
    )
    tot = fp.groupBy("source").agg(F.count("*").cast("long").alias("n_contents"))
    return (
        pairs.join(
            F.broadcast(tot.select(F.col("source").alias("source_a"),
                                   F.col("n_contents").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(tot.select(F.col("source").alias("source_b"),
                                   F.col("n_contents").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared_contents",
            "n_a",
            "n_b",
            F.round(
                F.col("shared_contents").cast("double")
                / F.least("n_a", "n_b"),
                6,
            ).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )

# ---------------------------------------------------------------------------
# q264 — winnowing fingerprint selection (Schleimer et al. 2003, the
# MOSS algorithm): from every window of W consecutive k-gram hashes
# keep the RIGHTMOST minimum — the position-robust fingerprint scheme
# whose guarantee (every window contributes, so no gap between chosen
# positions exceeds W) is what q41's fixed-stride fingerprints lack.
# The rightmost-argmin is one integer MIN: key = h*256 + (window_end
# - j), so smaller hash wins and ties fall to the larger position —
# no argmax_by/min_by portability surface at all.
# ---------------------------------------------------------------------------
_WIN_K = 4  # tokens per k-gram

_WIN_W = 4  # k-grams per window

def _hex48_duck(expr: str) -> str:
    v = "CAST(0 AS BIGINT)"
    for i in range(1, 13):
        v = (
            f"({v}) * 16 + (strpos('0123456789abcdef', "
            f"substr(md5({expr}), {i}, 1)) - 1)"
        )
    return f"({v})"

def _winnow_fp_ctes() -> str:
    """CTE chain toks..fp shared by q264 (per-doc report) and q276
    (cross-doc candidate pairs)."""
    k, w = _WIN_K, _WIN_W
    kgram = " || ' ' || ".join(f"w[i+{j}]" for j in range(k)).replace(
        "w[i+0]", "w[i]"
    )
    return f"""toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    kg AS MATERIALIZED (
      SELECT doc_id, len(w) - {k} + 1 AS m, i,
             {_hex48_duck(kgram)} AS h
      FROM toks, UNNEST(generate_series(1, len(w) - {k} + 1)) AS g(i)
      WHERE len(w) >= {k + w - 1}
    ),
    wins AS (
      SELECT doc_id, p, i AS j, h
      FROM kg, UNNEST(generate_series(GREATEST(1, i - {w} + 1),
                                      LEAST(i, m - {w} + 1))) AS gp(p)
    ),
    sel AS (
      SELECT doc_id, p,
             MIN(h * 256 + (p + {w} - 1 - j)) AS key
      FROM wins GROUP BY 1, 2
    ),
    fp AS (
      SELECT DISTINCT doc_id, p + {w} - 1 - (key % 256) AS j, key // 256 AS h
      FROM sel
    )"""

def _winnow_sql() -> str:
    w = _WIN_W
    return f"""
    WITH {_winnow_fp_ctes()},
    g AS (
      SELECT doc_id, j,
             j - LAG(j) OVER (PARTITION BY doc_id ORDER BY j) AS gap
      FROM fp
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
             CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap,
             CAST(MIN(j) AS BIGINT) AS first_j,
             CAST(MAX(j) AS BIGINT) AS last_j
      FROM g GROUP BY 1
    ),
    md AS (SELECT DISTINCT doc_id, m FROM kg)
    SELECT a.doc_id, CAST(md.m AS BIGINT) AS n_kgrams, a.n_fingerprints,
           ROUND(CAST(a.n_fingerprints AS DOUBLE) / (md.m - {w} + 1), 6)
             AS density,
           a.max_gap,
           CAST(a.max_gap <= {w} AND a.first_j <= {w}
                AND a.last_j >= md.m - {w} + 1 AS INT) AS guarantee_ok
    FROM agg a JOIN md ON md.doc_id = a.doc_id
    ORDER BY a.doc_id
    """


@register(
    "q264_winnowing_fingerprints",
    _winnow_sql(),
    doc="winnowing fingerprint selection over token 4-gram hashes "
    "(48-bit md5-derived), window W=4, rightmost-min tie-break encoded "
    "as MIN(h*256 + distance-from-window-end) — pure integer math both "
    "engines evaluate identically. Per doc: fingerprint count, density "
    "(the paper's expected 2/(W+1) reference point), the max gap "
    "between chosen positions, and the winnowing GUARANTEE as a "
    "hash-checked boolean (no uncovered window: max_gap <= W and both "
    "boundary windows covered). Docs shorter than K+W-1 tokens have no "
    "full window and drop. The fingerprints are what a plagiarism/"
    "near-dup index stores at 64x compression vs all k-grams; corpus "
    "work is one explode to W rows per k-gram + two aggregates — "
    "no joins until the doc-level report",
)
def q264_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    k, w = _WIN_K, _WIN_W
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    toks = d.select("doc_id", wcol.alias("w")).filter(F.size("w") >= k + w - 1)
    kgram_parts = lambda i: F.concat_ws(
        " ", *[F.element_at(F.col("w"), (i + j).cast("int")) for j in range(k)]
    )
    kg = pin(
        toks.select(
            "doc_id",
            (F.size("w") - k + 1).cast("long").alias("m"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - k + 1),
                    lambda i: F.struct(
                        i.cast("long").alias("i"),
                        F.conv(F.substring(F.md5(kgram_parts(i)), 1, 12), 16, 10)
                        .cast("long")
                        .alias("h"),
                    ),
                )
            ).alias("e"),
        ).select("doc_id", "m", F.col("e.i").alias("i"), F.col("e.h").alias("h"))
    )
    wins = kg.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.greatest(F.lit(1).cast("long"), F.col("i") - w + 1),
                F.least(F.col("i"), F.col("m") - w + 1),
            )
        ).alias("p"),
        F.col("i").alias("j"),
        "h",
    )
    sel = wins.groupBy("doc_id", "p").agg(
        F.min(F.col("h") * 256 + (F.col("p") + w - 1 - F.col("j"))).alias("key")
    )
    fp = sel.select(
        "doc_id",
        (F.col("p") + w - 1 - F.col("key") % 256).alias("j"),
        # integer div, not /: key reaches 2^56 and double division
        # would round above 2^53 (DuckDB's // is exact)
        F.expr("key div 256").alias("h"),
    ).distinct()
    g = fp.select(
        "doc_id",
        "j",
        (
            F.col("j")
            - F.lag("j").over(W.partitionBy("doc_id").orderBy("j"))
        ).alias("gap"),
    )
    agg = g.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_fingerprints"),
        F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias("max_gap"),
        F.min("j").cast("long").alias("first_j"),
        F.max("j").cast("long").alias("last_j"),
    )
    md = kg.select("doc_id", "m").distinct()
    return (
        agg.join(md, "doc_id")
        .select(
            "doc_id",
            F.col("m").cast("long").alias("n_kgrams"),
            "n_fingerprints",
            F.round(
                F.col("n_fingerprints").cast("double") / (F.col("m") - w + 1), 6
            ).alias("density"),
            "max_gap",
            (
                (F.col("max_gap") <= w)
                & (F.col("first_j") <= w)
                & (F.col("last_j") >= F.col("m") - w + 1)
            )
            .cast("int")
            .alias("guarantee_ok"),
        )
        .orderBy("doc_id")
    )

# ---------------------------------------------------------------------------
# q267 — content-defined chunking (the rsync/LBFS/restic boundary
# rule): a chunk break falls BEFORE token i wherever the 48-bit hash
# of the preceding bigram is 0 mod D — boundaries move WITH content,
# so an insertion re-chunks only its neighborhood, where q79's fixed
# windows shift every downstream chunk. The storage-dedup view of the
# corpus: chunk fingerprints shared across documents are bytes a
# dedup store writes once.
# ---------------------------------------------------------------------------
_CDC_D = 32  # expected chunk length in tokens

def _cdc_sql() -> str:
    h = _hex48_duck("w[i-1] || ' ' || w[i]")
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    pos AS MATERIALIZED (
      SELECT doc_id, i, w[i] AS t,
             CASE WHEN i >= 2 AND ({h}) % {_CDC_D} = 0
                  THEN 1 ELSE 0 END AS brk
      FROM toks, UNNEST(generate_series(1, len(w))) AS g(i)
    ),
    ck AS (
      SELECT doc_id, i, t,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS chunk
      FROM pos
    ),
    chunks AS MATERIALIZED (
      SELECT doc_id, chunk, CAST(COUNT(*) AS BIGINT) AS n_toks,
             md5(string_agg(t, ' ' ORDER BY i)) AS fp
      FROM ck GROUP BY 1, 2
    ),
    share AS (SELECT fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
              FROM chunks GROUP BY 1)
    SELECT c.doc_id,
           CAST(SUM(c.n_toks) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(MAX(c.n_toks) AS BIGINT) AS max_chunk_tokens,
           ROUND(CAST(SUM(c.n_toks) AS DOUBLE) / COUNT(*), 6)
             AS mean_chunk_tokens,
           CAST(SUM(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS shared_chunks
    FROM chunks c JOIN share s ON s.fp = c.fp
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """


@register(
    "q267_content_defined_chunking",
    _cdc_sql(),
    doc="content-defined chunking over token streams: break before "
    "token i iff hash48(bigram ending at i) = 0 mod 32 (expected "
    "32-token chunks, boundaries a local edit cannot shift globally), "
    "chunk fingerprints via md5 of the joined tokens, and per doc the "
    "chunk count/size profile plus how many of its chunks appear in "
    "at least one OTHER document — the dedup-store view (shared "
    "chunks are stored once). No min/max chunk clamp (stated "
    "honestly; production CDC adds one against pathological runs). "
    "One explode + one window + two aggregates; the share join is on "
    "the chunk-hash key, O(chunks)",
)
def q267_content_defined_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    toks = d.select("doc_id", wcol.alias("w"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.element_at(F.col("w"), (F.col("i") - 1).cast("int")),
                    F.lit(" "),
                    F.element_at(F.col("w"), F.col("i").cast("int")),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    pos = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("w"))).alias("i"),
        "w",
    ).select(
        "doc_id",
        "i",
        F.element_at(F.col("w"), F.col("i").cast("int")).alias("t"),
        F.when((F.col("i") >= 2) & (h % _CDC_D == 0), 1).otherwise(0).alias("brk"),
    )
    ck = pos.withColumn(
        "chunk",
        F.sum("brk").over(
            W.partitionBy("doc_id").orderBy("i").rowsBetween(
                W.unboundedPreceding, 0
            )
        ),
    )
    chunks = hold(
        ck.groupBy("doc_id", "chunk").agg(
            F.count("*").cast("long").alias("n_toks"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("i", "t"))),
                        lambda s: s["t"],
                    ),
                    " ",
                )
            ).alias("fp"),
        )
    )
    share = chunks.groupBy("fp").agg(
        F.count_distinct("doc_id").cast("long").alias("nd")
    )
    return (
        chunks.join(share, "fp")
        .groupBy("doc_id")
        .agg(
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_chunks"),
            F.max("n_toks").cast("long").alias("max_chunk_tokens"),
            F.round(
                F.sum("n_toks").cast("double") / F.count("*"), 6
            ).alias("mean_chunk_tokens"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("shared_chunks"),
        )
        .orderBy("doc_id")
    )

# ---------------------------------------------------------------------------
# q276 — winnowing candidate pairs: documents sharing >= 2 selected
# fingerprints (distinct hashes, hub hashes df-capped) — MOSS's
# actual matching step on top of q264's selection, and the third
# blocking family beside MinHash-LSH (q32) and SimHash bands (q96):
# winnowing candidates carry POSITIONS, so a hit localizes the
# shared passage instead of just naming the pair.
# ---------------------------------------------------------------------------
_WIN_PAIR_MAXDF = 50

_WIN_PAIR_MIN = 2

def _winnow_pairs_sql() -> str:
    return f"""
    WITH {_winnow_fp_ctes()},
    fph AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM fp),
    hdf AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM fph GROUP BY 1),
    keep AS (SELECT f.doc_id, f.h FROM fph f JOIN hdf USING (h)
             WHERE hdf.df <= {_WIN_PAIR_MAXDF}),
    nfp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp
            FROM fph GROUP BY 1),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM keep a JOIN keep b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT s.id_a, s.id_b, s.n_shared, na.n_fp AS n_fp_a, nb.n_fp AS n_fp_b,
           ROUND(CAST(s.n_shared AS DOUBLE) / LEAST(na.n_fp, nb.n_fp), 6)
             AS score
    FROM shared s
    JOIN nfp na ON na.doc_id = s.id_a
    JOIN nfp nb ON nb.doc_id = s.id_b
    WHERE s.n_shared >= {_WIN_PAIR_MIN}
    ORDER BY s.id_a, s.id_b
    """

def _winnow_pairs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    k, w = _WIN_K, _WIN_W
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    toks = d.select("doc_id", wcol.alias("w")).filter(F.size("w") >= k + w - 1)
    kgram_parts = lambda i: F.concat_ws(
        " ", *[F.element_at(F.col("w"), (i + j).cast("int")) for j in range(k)]
    )
    kg = toks.select(
        "doc_id",
        (F.size("w") - k + 1).cast("long").alias("m"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - k + 1),
                lambda i: F.struct(
                    i.cast("long").alias("i"),
                    F.conv(F.substring(F.md5(kgram_parts(i)), 1, 12), 16, 10)
                    .cast("long")
                    .alias("h"),
                ),
            )
        ).alias("e"),
    ).select("doc_id", "m", F.col("e.i").alias("i"), F.col("e.h").alias("h"))
    wins = kg.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.greatest(F.lit(1).cast("long"), F.col("i") - w + 1),
                F.least(F.col("i"), F.col("m") - w + 1),
            )
        ).alias("p"),
        F.col("i").alias("j"),
        "h",
    )
    sel = wins.groupBy("doc_id", "p").agg(
        F.min(F.col("h") * 256 + (F.col("p") + w - 1 - F.col("j"))).alias("key")
    )
    # r10 ADR-0007 tail sweep: fph fans out to the df-cap join's two
    # pair branches plus the per-doc fingerprint counts — five cold
    # consumers in one action; eager hold probed -12% (1.32->1.16)
    fph = hold(
        sel.select("doc_id", F.expr("key div 256").alias("h")).distinct()
    )
    hdf = fph.groupBy("h").agg(F.count("*").cast("long").alias("df"))
    keep = fph.join(hdf.filter(F.col("df") <= _WIN_PAIR_MAXDF), "h").select(
        "doc_id", "h"
    )
    nfp = fph.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_fp"))
    a = keep.select(F.col("doc_id").alias("id_a"), "h")
    b = keep.select(F.col("doc_id").alias("id_b"), F.col("h").alias("hb"))
    shared = (
        a.join(b, (F.col("h") == F.col("hb")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _WIN_PAIR_MIN)
    )
    na = nfp.select(F.col("doc_id").alias("id_a"), F.col("n_fp").alias("n_fp_a"))
    nb = nfp.select(F.col("doc_id").alias("id_b"), F.col("n_fp").alias("n_fp_b"))
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            F.round(
                F.col("n_shared").cast("double")
                / F.least(F.col("n_fp_a"), F.col("n_fp_b")),
                6,
            ).alias("score"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "q276_winnowing_pairs",
    _winnow_pairs_sql(),
    doc="winnowing-fingerprint candidate pairs (the MOSS matching "
    "step): distinct selected hashes per doc, hub hashes dropped at "
    "df>50 (the q33 stop-shingle discipline applied to fingerprints), "
    "pairs sharing >= 2 fingerprints scored by shared/min(doc "
    "fingerprints) — a containment-flavored score on the 64x-"
    "compressed index, never the raw k-gram sets. The join shuffles "
    "O(selected fingerprints), bounded per hash by the df-cap",
)
def q276_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _winnow_pairs_df(spark, sf_dir)

# ---------------------------------------------------------------------------
# q280 — edit-distance verification of LSH candidates: the third
# verification metric for near-dup candidates after Jaccard (q33,
# order-free) and containment (q87, length-free) — LEVENSHTEIN keeps
# order AND position, so a doc with the same vocabulary reshuffled
# scores high Jaccard but low edit similarity. Both engines ship an
# exact integer levenshtein; it is O(len^2) per pair, which is
# precisely why it only ever runs on the LSH-bounded candidate set,
# never the corpus.
# ---------------------------------------------------------------------------
def _edit_verify_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bb AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    txt AS (SELECT doc_id, trim(lower(text)) AS t,
                   length(trim(lower(text))) AS n
            FROM documents),
    scored AS (
      SELECT c.id_a, c.id_b,
             CAST(levenshtein(ta.t, tb.t) AS BIGINT) AS edit_dist,
             CAST(GREATEST(ta.n, tb.n) AS BIGINT) AS max_len
      FROM cand c
      JOIN txt ta ON ta.doc_id = c.id_a
      JOIN txt tb ON tb.doc_id = c.id_b
    )
    SELECT id_a, id_b, edit_dist, max_len,
           FLOOR((1e0 - CAST(edit_dist AS DOUBLE) / max_len)
                 * 1000000e0) / 1000000e0 AS edit_similarity,
           CAST(edit_dist * 10 <= max_len AS INT) AS verified_90
    FROM scored
    ORDER BY id_a, id_b
    """


@register(
    "q280_edit_distance_verify",
    _edit_verify_sql(),
    doc="Levenshtein verification of the MinHash-LSH candidate pairs: "
    "exact character edit distance (both engines' built-in integer "
    "DP), similarity 1 - dist/max_len, and a 90%-similarity verdict "
    "as the exact integer cross-multiplication dist*10 <= max_len. "
    "Order- and position-sensitive where Jaccard (q33) is order-free "
    "and containment (q87) is length-free — shuffled-vocabulary fakes "
    "fail here. O(len^2) per pair is affordable ONLY on the "
    "LSH-bounded candidate set; the plan touches the corpus once for "
    "signatures and once for the two text lookups",
)
def q280_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    cand = dd.lsh_candidate_pairs(
        d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS
    )
    txt = d.select(
        "doc_id",
        F.trim(F.lower(F.col("text"))).alias("t"),
        F.length(F.trim(F.lower(F.col("text")))).alias("n"),
    )
    ta = txt.select(
        F.col("doc_id").alias("id_a"), F.col("t").alias("tA"), F.col("n").alias("nA")
    )
    tb = txt.select(
        F.col("doc_id").alias("id_b"), F.col("t").alias("tB"), F.col("n").alias("nB")
    )
    scored = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("tA", "tB").cast("long").alias("edit_dist"),
            F.greatest("nA", "nB").cast("long").alias("max_len"),
        )
    )
    return scored.select(
        "id_a",
        "id_b",
        "edit_dist",
        "max_len",
        vector.floor_quant(
            1.0 - F.col("edit_dist").cast("double") / F.col("max_len")
        ).alias("edit_similarity"),
        (F.col("edit_dist") * 10 <= F.col("max_len")).cast("int").alias(
            "verified_90"
        ),
    ).orderBy("id_a", "id_b")

# ---------------------------------------------------------------------------
# q281 — digit-normalized (template) dedup: documents identical up to
# NUMBERS — timestamps, IDs, counters — are one template stamped many
# times; exact dedup (q30) misses them because every stamp hashes
# differently. Fingerprint md5(text with digit runs collapsed to #),
# group, and report the template families exact dedup could not see.
# ---------------------------------------------------------------------------
@register(
    "q281_digit_normalized_dedup",
    """
    WITH fp AS (
      SELECT doc_id, md5(text) AS raw_fp,
             md5(regexp_replace(text, '[0-9]+', '#', 'g')) AS norm_fp
      FROM documents
    ),
    fam AS (
      SELECT norm_fp,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT raw_fp) AS BIGINT) AS n_raw_variants,
             MIN(doc_id) AS keeper_id
      FROM fp GROUP BY 1
    )
    SELECT keeper_id, n_docs, n_raw_variants,
           CAST(n_docs - 1 AS BIGINT) AS n_removable,
           CAST(n_raw_variants > 1 AS INT) AS template_family
    FROM fam
    WHERE n_docs > 1
    ORDER BY n_docs DESC, keeper_id
    """,
    doc="template dedup by digit normalization: collapse every digit "
    "run to '#', fingerprint, group — families with n_raw_variants > 1 "
    "are templates stamped with different numbers, invisible to q30's "
    "exact hash and cheap enough to run before any MinHash machinery "
    "(one narrow map + one fingerprint aggregate, the q30 shuffle "
    "profile exactly). keeper = min doc_id, the q56 convention",
)
def q281_digit_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    fp = d.select(
        "doc_id",
        F.md5("text").alias("raw_fp"),
        F.md5(F.regexp_replace("text", "[0-9]+", "#")).alias("norm_fp"),
    )
    fam = fp.groupBy("norm_fp").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("raw_fp").cast("long").alias("n_raw_variants"),
        F.min("doc_id").alias("keeper_id"),
    )
    return (
        fam.filter(F.col("n_docs") > 1)
        .select(
            "keeper_id",
            "n_docs",
            "n_raw_variants",
            (F.col("n_docs") - 1).cast("long").alias("n_removable"),
            (F.col("n_raw_variants") > 1).cast("int").alias("template_family"),
        )
        .orderBy(F.col("n_docs").desc(), "keeper_id")
    )

# ---------------------------------------------------------------------------
# q286 — rarity-weighted Jaccard: plain Jaccard (q33) lets fifty
# shared boilerplate shingles outvote one shared rare passage; here
# every kept shingle carries an integer rarity weight (N*16)//df —
# monotone in inverse document frequency with NO ln, so the weighted
# intersection and union are exact BIGINTs and the score is one final
# division. Stop-shingles (df > cap) are excluded from numerator AND
# denominator — standard stopword semantics, stated in the contract.
# ---------------------------------------------------------------------------
_WJ_THRESHOLD = "0.25e0"

def _weighted_jaccard_sql() -> str:
    return f"""
    WITH {_SHINGLES_CTE},
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM sh),
    dfreq AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
              FROM sh GROUP BY 1),
    wsh AS (
      SELECT sh.doc_id, sh.shingle, (nd.n * 16) // dfreq.df AS w
      FROM sh JOIN dfreq USING (shingle) CROSS JOIN nd
      WHERE dfreq.df <= {_MAX_DF}
    ),
    sizes AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS tw
              FROM wsh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(SUM(a.w) AS BIGINT) AS iw,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM wsh a JOIN wsh b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_common, iw,
           sa.tw + sb.tw - iw AS uw,
           ROUND(CAST(iw AS DOUBLE) / (sa.tw + sb.tw - iw), 6)
             AS weighted_jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(iw AS DOUBLE) / (sa.tw + sb.tw - iw) >= {_WJ_THRESHOLD}
    ORDER BY id_a, id_b
    """


@register(
    "q286_weighted_jaccard_pairs",
    _weighted_jaccard_sql(),
    doc="rarity-weighted Jaccard pairs >= 0.25 over the df-capped "
    "shingle space: weight (N*16)//df is an exact integer IDF "
    "surrogate (no ln, so weights can never flip on a 1-ulp "
    "boundary); weighted intersection / weighted union with both "
    "sums BIGINT-exact, one double division at the end. A pair "
    "sharing one rare passage now outranks a pair sharing generic "
    "glue — the ranking plain q33 inverts on boilerplate-heavy "
    "corpora. Same O(n) df-capped self-join shuffle profile as q33",
)
def q286_weighted_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    sh = d.select(
        "doc_id", F.explode(dd.word_shingles(F.col("text"), 3)).alias("shingle")
    )
    nd = sh.select("doc_id").distinct().count()
    dfreq = sh.groupBy("shingle").agg(F.count("*").cast("long").alias("df"))
    wsh = hold(
        sh.join(dfreq.filter(F.col("df") <= _MAX_DF), "shingle").select(
            "doc_id", "shingle", F.expr(f"({nd} * 16) div df").alias("w")
        )
    )
    sizes = wsh.groupBy("doc_id").agg(F.sum("w").cast("long").alias("tw"))
    a = wsh.select(F.col("doc_id").alias("id_a"), "shingle", F.col("w").alias("wa"))
    b = wsh.select(F.col("doc_id").alias("id_b"), F.col("shingle").alias("sh2"))
    inter = (
        a.join(b, (F.col("shingle") == F.col("sh2")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum("wa").cast("long").alias("iw"),
            F.count("*").cast("long").alias("n_common"),
        )
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("tw").alias("twa"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("tw").alias("twb"))
    uw = F.col("twa") + F.col("twb") - F.col("iw")
    wj = F.col("iw").cast("double") / uw
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(wj >= 0.25)
        .select(
            "id_a",
            "id_b",
            "n_common",
            "iw",
            uw.cast("long").alias("uw"),
            F.round(wj, 6).alias("weighted_jaccard"),
        )
        .orderBy("id_a", "id_b")
    )

# ---------------------------------------------------------------------------
# q292 — dedup ROI: near-dup clusters ranked by the TOKENS a dedup
# pass would free (non-keeper members' token mass) — the number that
# turns q56's group labels into a prioritized work queue and a
# storage/compute forecast. Keeper = min doc id (the group label
# itself, q56's convention), so freed = cluster total minus keeper.
# ---------------------------------------------------------------------------
def _dedup_roi_sql() -> str:
    return f"""
    WITH grp AS MATERIALIZED ({_neardup_groups_sql()}),
    toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                  x -> x <> '')) AS BIGINT) AS n_tok
      FROM documents
    ),
    cl AS (
      SELECT g.group_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(t.n_tok) AS BIGINT) AS tokens_total,
             CAST(SUM(CASE WHEN g.doc_id <> g.group_id THEN t.n_tok
                           ELSE 0 END) AS BIGINT) AS tokens_freed
      FROM grp g JOIN toks t USING (doc_id)
      GROUP BY 1 HAVING COUNT(*) > 1
    ),
    tot AS (
      SELECT CAST(COALESCE(SUM(tokens_freed), 0) AS BIGINT) AS freed_all,
             (SELECT CAST(SUM(n_tok) AS BIGINT) FROM toks) AS corpus_tokens
      FROM cl
    )
    SELECT c.group_id AS keeper_id, c.n_docs, c.tokens_total, c.tokens_freed,
           t.freed_all, ROUND(CAST(t.freed_all AS DOUBLE)
                              / t.corpus_tokens, 6) AS corpus_freed_frac
    FROM cl c CROSS JOIN tot t
    ORDER BY c.tokens_freed DESC, c.group_id
    LIMIT 20
    """


@register(
    "q292_dedup_roi",
    _dedup_roi_sql(),
    doc="dedup return-on-investment: the q56 near-dup clusters ranked "
    "by tokens freed if only the keeper (min doc id) survives — "
    "top-20 work queue plus the corpus-level freed fraction riding "
    "on every row. The triage view that decides whether a dedup pass "
    "pays for its shuffle at all. Adds one token scan + one "
    "group-keyed aggregate on top of the q56 propagation plan",
)
def q292_dedup_roi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    grp = dd.neardup_groups(
        d, "doc_id", "text",
        threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF, iters=_LP_ITERS,
        persist_fn=hold,
    )
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    toks = pin(d.select("doc_id", F.size(w).cast("long").alias("n_tok")))
    cl = (
        grp.join(toks, "doc_id")
        .groupBy("group_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tokens_total"),
            F.sum(
                F.when(F.col("doc_id") != F.col("group_id"), F.col("n_tok"))
                .otherwise(0)
            )
            .cast("long")
            .alias("tokens_freed"),
        )
        .filter(F.col("n_docs") > 1)
    )
    # eager hold: cl feeds BOTH the broadcast total and the output rows;
    # un-materialized, the two branches re-run the group pipeline (the
    # q304 broadcast-total race, measured ~2x on this query)

    cl = hold(cl)
    tot = cl.agg(
        F.coalesce(F.sum("tokens_freed"), F.lit(0)).cast("long").alias("freed_all")
    ).crossJoin(
        F.broadcast(toks.agg(F.sum("n_tok").cast("long").alias("corpus_tokens")))
    )
    return (
        cl.crossJoin(F.broadcast(tot))
        .select(
            F.col("group_id").alias("keeper_id"),
            "n_docs",
            "tokens_total",
            "tokens_freed",
            "freed_all",
            F.round(
                F.col("freed_all").cast("double") / F.col("corpus_tokens"), 6
            ).alias("corpus_freed_frac"),
        )
        .orderBy(F.col("tokens_freed").desc(), "keeper_id")
        .limit(20)
    )

# ---------------------------------------------------------------------------
# q295 — blocking-method agreement: MinHash-LSH (q32) and SimHash
# banding (q96) hunt the same near-dup pairs with different hash
# geometry — this scores BOTH candidate sets against the exact-
# Jaccard truth (q33's >= 0.4 pairs) and against each other, the
# audit that says whether running two blockers buys recall or only
# compute. Per method: candidates, hits, precision, recall; plus the
# candidate-set Jaccard between the methods on every row.
# ---------------------------------------------------------------------------
def _blocking_agreement_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM msigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    msigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    mbb AS ({band_rows}),
    mh AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM mbb a JOIN mbb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    sh2 AS MATERIALIZED (
      SELECT DISTINCT id_a, id_b FROM ({_simhash_pairs_sql()})
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
    fkeep AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
              WHERE dfreq.df_count <= {_MAX_DF}),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM fkeep a JOIN fkeep b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS MATERIALIZED (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common * 1.0 / (sa.set_size + sb.set_size - n_common)
            >= {_JACCARD_THRESHOLD}
    ),
    nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
    ov AS (
      SELECT CAST((SELECT COUNT(*) FROM mh JOIN sh2 USING (id_a, id_b))
                  AS BIGINT) AS n_both,
             CAST((SELECT COUNT(*) FROM mh) AS BIGINT) AS n_mh,
             CAST((SELECT COUNT(*) FROM sh2) AS BIGINT) AS n_sh
    ),
    rowsq AS (
      SELECT 'minhash_lsh' AS method,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM mh) AS n_candidates,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM mh JOIN truth USING (id_a, id_b)) AS n_hits
      UNION ALL
      SELECT 'simhash_bands',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM sh2),
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM sh2 JOIN truth USING (id_a, id_b))
    )
    SELECT r.method, r.n_candidates, t.n_truth, r.n_hits,
           ROUND(CAST(r.n_hits AS DOUBLE) / r.n_candidates, 6) AS precision,
           ROUND(CAST(r.n_hits AS DOUBLE) / t.n_truth, 6) AS recall,
           ROUND(CAST(o.n_both AS DOUBLE)
                 / (o.n_mh + o.n_sh - o.n_both), 6) AS method_overlap
    FROM rowsq r CROSS JOIN nt t CROSS JOIN ov o
    ORDER BY r.method
    """


@register(
    "q295_blocking_agreement",
    _blocking_agreement_sql(),
    doc="cross-method blocking audit: MinHash-LSH vs SimHash-band "
    "candidate pairs scored against exact-Jaccard truth (precision / "
    "recall per method) and against each other (candidate-set "
    "Jaccard) — low overlap with comparable recall means the two "
    "geometries catch DIFFERENT pairs and an ensemble pays; high "
    "overlap means the second blocker is pure cost. All set algebra "
    "on bounded candidate tables; the corpus pays the q32 + q96 + "
    "q33 plans it already runs",
)
def q295_blocking_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    # ONE shingle pass for both the MinHash signatures and the exact-
    # Jaccard truth — the oracle SQL above declares a single shared sh
    # CTE; the held exploded table makes the Spark plan match it instead
    # of tokenizing the corpus once per machinery. r12: the shingle
    # hold and SimHash's construction-time signature hold are
    # independent eager jobs — built overlapped (guide §2.6).
    sh, sh2 = overlap(
        lambda: hold(
            d.select(
                F.col("doc_id"),
                F.explode(dd.word_shingles(F.col("text"))).alias("shingle"),
            )
        ),
        lambda: pin(
            dd.simhash_candidate_pairs(
                d,
                "doc_id",
                "text",
                bits=_SIMHASH_BITS,
                bands=_SIMHASH_BANDS,
                max_hamming=_SIMHASH_MAX_HAMMING,
                max_bucket=_SIMHASH_MAX_BUCKET,
                persist_fn=hold,
            ).select("id_a", "id_b").distinct()
        ),
    )
    mh = pin(
        dd.candidate_pairs_from_signatures(
            dd.minhash_signatures_from_shingles(
                sh, "doc_id", "shingle", _NUM_HASHES
            ),
            "doc_id",
            _NUM_HASHES,
            _BANDS,
        ).select("id_a", "id_b").distinct()
    )
    truth = pin(
        dd.ngram_jaccard_pairs_from_shingles(
            sh, "doc_id", "shingle", threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF
        ).select("id_a", "id_b")
    )
    nt = truth.agg(F.count("*").cast("long").alias("n_truth"))
    n_both = mh.join(sh2, ["id_a", "id_b"]).agg(
        F.count("*").cast("long").alias("n_both")
    )
    n_mh = mh.agg(F.count("*").cast("long").alias("n_mh"))
    n_sh = sh2.agg(F.count("*").cast("long").alias("n_sh"))
    ov = (
        n_both.crossJoin(F.broadcast(n_mh)).crossJoin(F.broadcast(n_sh))
    )
    r1 = (
        mh.join(truth, ["id_a", "id_b"])
        .agg(F.count("*").cast("long").alias("n_hits"))
        .crossJoin(F.broadcast(n_mh.withColumnRenamed("n_mh", "n_candidates")))
        .select(F.lit("minhash_lsh").alias("method"), "n_candidates", "n_hits")
    )
    r2 = (
        sh2.join(truth, ["id_a", "id_b"])
        .agg(F.count("*").cast("long").alias("n_hits"))
        .crossJoin(F.broadcast(n_sh.withColumnRenamed("n_sh", "n_candidates")))
        .select(F.lit("simhash_bands").alias("method"), "n_candidates", "n_hits")
    )
    return (
        r1.unionAll(r2)
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(ov))
        .select(
            "method",
            "n_candidates",
            "n_truth",
            "n_hits",
            F.round(
                F.col("n_hits").cast("double") / F.col("n_candidates"), 6
            ).alias("precision"),
            F.round(F.col("n_hits").cast("double") / F.col("n_truth"), 6).alias(
                "recall"
            ),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_mh") + F.col("n_sh") - F.col("n_both")),
                6,
            ).alias("method_overlap"),
        )
        .orderBy("method")
    )

# ---------------------------------------------------------------------------
# q305 — dedup funnel ledger: one row per stage of the dedup
# pipeline — exact-hash dups, digit-template families, MinHash-LSH
# candidates, SimHash candidates, winnowing candidates, exact-Jaccard
# verified pairs — each with its pair/group count and the survivor
# ratio against the all-pairs ceiling n(n-1)/2. The funnel view that
# shows WHERE candidate mass dies, stitched from six certified
# machineries in one plan.
# ---------------------------------------------------------------------------
def _dedup_funnel_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM msigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    exact AS (
      SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS cnt
      FROM (SELECT md5(text) AS fp, CAST(COUNT(*) AS BIGINT) AS c
            FROM documents GROUP BY 1) WHERE c > 1
    ),
    tmpl AS (
      SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS cnt
      FROM (SELECT md5(regexp_replace(text, '[0-9]+', '#', 'g')) AS nfp,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM documents GROUP BY 1) WHERE c > 1
    ),
    msigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    mbb AS ({band_rows}),
    mh AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT DISTINCT a.doc_id, b.doc_id
        FROM mbb a JOIN mbb b ON a.band = b.band AND a.bucket = b.bucket
        WHERE a.doc_id < b.doc_id
      )
    ),
    sh_cnt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT DISTINCT id_a, id_b FROM ({_simhash_pairs_sql()})
      )
    ),
    wn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM ({_winnow_pairs_sql()})
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
    fk AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
           WHERE dfreq.df_count <= {_MAX_DF}),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM fk a JOIN fk b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common * 1.0 / (sa.set_size + sb.set_size - n_common)
            >= {_JACCARD_THRESHOLD}
    ),
    stages AS (
      SELECT 1 AS stage, 'exact_hash_pairs' AS name,
             (SELECT cnt FROM exact) AS n_pairs
      UNION ALL SELECT 2, 'template_pairs', (SELECT cnt FROM tmpl)
      UNION ALL SELECT 3, 'minhash_lsh_candidates', (SELECT cnt FROM mh)
      UNION ALL SELECT 4, 'simhash_candidates', (SELECT cnt FROM sh_cnt)
      UNION ALL SELECT 5, 'winnowing_candidates', (SELECT cnt FROM wn)
      UNION ALL SELECT 6, 'jaccard_verified', (SELECT cnt FROM verified)
    )
    SELECT s.stage, s.name, s.n_pairs,
           FLOOR((CAST(s.n_pairs AS DOUBLE)
                 / (CAST(t.n AS DOUBLE) * (t.n - 1) / 2e0))
                 * 1000000000e0) / 1000000000e0
             AS all_pairs_fraction
    FROM stages s CROSS JOIN nd t
    ORDER BY s.stage
    """


@register(
    "q305_dedup_funnel",
    _dedup_funnel_sql(),
    doc="the dedup candidate funnel in one table: exact-hash duplicate "
    "pairs, digit-template pairs, MinHash-LSH candidates, SimHash "
    "candidates, winnowing candidates, and exact-Jaccard verified "
    "pairs — each as a count and as a fraction of the n(n-1)/2 "
    "all-pairs ceiling, the single view that shows where candidate "
    "mass dies and which blocker over- or under-generates. Six "
    "certified machineries composed; every stage keeps its own "
    "bounded shuffle profile",
)
def q305_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce


    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    # stages 3 (MinHash-LSH) and 6 (exact Jaccard) share ONE held
    # shingle pass — mirrors the oracle's single sh CTE. r12: the two
    # construction-time eager holds (shingle pass here, SimHash's
    # signature table inside stage 4) are independent, so they build
    # overlapped (guide §2.6) instead of as two serialized jobs.
    shingles, simhash_stage = overlap(
        lambda: hold(
            d.select(
                F.col("doc_id"),
                F.explode(dd.word_shingles(F.col("text"))).alias("shingle"),
            )
        ),
        lambda: dd.simhash_candidate_pairs(
            d,
            "doc_id",
            "text",
            bits=_SIMHASH_BITS,
            bands=_SIMHASH_BANDS,
            max_hamming=_SIMHASH_MAX_HAMMING,
            max_bucket=_SIMHASH_MAX_BUCKET,
            persist_fn=hold,
        )
        .select("id_a", "id_b")
        .distinct(),
    )

    def cnt_df(df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("cnt"))

    def pair_count_from_groups(col) -> DataFrame:
        fam = d.select(col.alias("k")).groupBy("k").agg(
            F.count("*").cast("long").alias("c")
        )
        return fam.filter(F.col("c") > 1).agg(
            F.coalesce(F.sum(F.expr("c * (c - 1) div 2")), F.lit(0))
            .cast("long")
            .alias("cnt")
        )

    # Six independent machineries, ONE job: each stage reduces to a
    # single-row count aggregate, and the union of those aggregates
    # lets Spark schedule the six branch DAGs concurrently instead of
    # paying six serialized driver actions (the r9 re-shape; the
    # operators' internal eager holds still materialize their shared
    # tables once at construction). The winnow helper is the plain
    # function, NOT the registered wrapper: invoking a registry entry
    # mid-query would release_pinned() this query's own pins.
    stages = [
        (1, "exact_hash_pairs", pair_count_from_groups(F.md5("text"))),
        (
            2,
            "template_pairs",
            pair_count_from_groups(F.md5(F.regexp_replace("text", "[0-9]+", "#"))),
        ),
        (
            3,
            "minhash_lsh_candidates",
            cnt_df(
                dd.candidate_pairs_from_signatures(
                    dd.minhash_signatures_from_shingles(
                        shingles, "doc_id", "shingle", _NUM_HASHES
                    ),
                    "doc_id",
                    _NUM_HASHES,
                    _BANDS,
                )
                .select("id_a", "id_b")
                .distinct()
            ),
        ),
        (4, "simhash_candidates", cnt_df(simhash_stage)),
        (5, "winnowing_candidates", cnt_df(_winnow_pairs_df(spark, sf_dir))),
        (
            6,
            "jaccard_verified",
            cnt_df(
                dd.ngram_jaccard_pairs_from_shingles(
                    shingles,
                    "doc_id",
                    "shingle",
                    threshold=_JACCARD_THRESHOLD,
                    max_df=_MAX_DF,
                )
            ),
        ),
    ]
    unioned = reduce(
        DataFrame.unionAll,
        [
            c.select(F.lit(s).alias("stage"), F.lit(name).alias("name"), "cnt")
            for s, name, c in stages
        ],
    ).crossJoin(F.broadcast(d.agg(F.count("*").cast("long").alias("n"))))
    collected = unioned.collect()
    nd = collected[0]["n"]
    ceiling = float(nd) * (nd - 1) / 2.0
    import math

    # floor-quantize (not half-up round): Python floor(x*1e9+0.5) vs
    # DuckDB ROUND are different algorithms on the same double — the
    # q279 driver-red class (r11 audit); floor of the identically-
    # computed ratio is bit-exact on both engines
    out = [
        (r["stage"], r["name"], int(r["cnt"]),
         math.floor(r["cnt"] / ceiling * 1e9) / 1e9)
        for r in collected
    ]
    return spark.createDataFrame(
        out, "stage int, name string, n_pairs long, all_pairs_fraction double"
    ).orderBy("stage")

# ---------------------------------------------------------------------------
# q309 — stop-shingle census: the receipt for the df-cap discipline
# every pair operator here relies on — the shingles the cap drops,
# and the pair mass df*(df-1)/2 each WOULD have pushed through the
# self-join. The top offenders plus, on every row, the total pairs
# avoided and the all-pairs ceiling fraction: the difference between
# the O(n) pipeline that runs and the O(n^2) one that doesn't.
# ---------------------------------------------------------------------------
@register(
    "q309_stop_shingle_census",
    f"""
    WITH {_SHINGLES_CTE},
    dfreq AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
              FROM sh GROUP BY 1),
    dropped AS (SELECT shingle, df, df * (df - 1) // 2 AS pairs_avoided
                FROM dfreq WHERE df > {_MAX_DF}),
    tot AS (
      SELECT CAST(COALESCE(SUM(pairs_avoided), 0) AS BIGINT) AS avoided_all,
             CAST(COUNT(*) AS BIGINT) AS n_dropped,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM dfreq) AS vocab,
             (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM sh) AS nd
      FROM dropped
    )
    SELECT d.shingle, d.df, CAST(d.pairs_avoided AS BIGINT) AS pairs_avoided,
           t.n_dropped, t.avoided_all,
           ROUND(CAST(t.avoided_all AS DOUBLE)
                 / (CAST(t.nd AS DOUBLE) * (t.nd - 1) / 2e0), 6)
             AS ceiling_fraction,
           ROUND(CAST(t.n_dropped AS DOUBLE) / t.vocab, 6)
             AS dropped_vocab_frac
    FROM dropped d CROSS JOIN tot t
    ORDER BY d.df DESC, d.shingle
    LIMIT 20
    """,
    doc="stop-shingle census: the shingles the df-cap (>{cap}) drops "
    "before the pair self-join, each with the df*(df-1)/2 pair mass "
    "it would have generated — top-20 offenders with the corpus-level "
    "pairs-avoided total and its fraction of the all-pairs ceiling on "
    "every row. This table IS the scalability argument for q33/q87/"
    "q286: the cap converts a quadratic blowup into bounded work, and "
    "here is exactly how much. One shingle aggregate".format(
        cap=_MAX_DF
    ),
)
def q309_stop_shingle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    sh = d.select(
        "doc_id", F.explode(dd.word_shingles(F.col("text"), 3)).alias("shingle")
    )
    sh = hold(sh)
    dfreq = sh.groupBy("shingle").agg(F.count("*").cast("long").alias("df"))
    dropped = dfreq.filter(F.col("df") > _MAX_DF).select(
        "shingle", "df", F.expr("df * (df - 1) div 2").alias("pairs_avoided")
    )
    # nd/vocab ride the final action as broadcast one-row aggregates
    # instead of two serialized driver count() jobs (guide §5 "no
    # driver loops in query paths"); the ceiling arithmetic stays the
    # same IEEE double ops (long->double conversion is exact below
    # 2^53), so every output bit is unchanged
    tot = (
        dropped.agg(
            F.coalesce(F.sum("pairs_avoided"), F.lit(0))
            .cast("long")
            .alias("avoided_all"),
            F.count("*").cast("long").alias("n_dropped"),
        )
        .crossJoin(
            sh.select("doc_id").distinct().agg(F.count("*").alias("nd"))
        )
        .crossJoin(dfreq.agg(F.count("*").alias("vocab")))
    )
    ceiling = F.col("nd").cast("double") * (F.col("nd") - F.lit(1)) / F.lit(2.0)
    return (
        dropped.crossJoin(F.broadcast(tot))
        .select(
            "shingle",
            "df",
            F.col("pairs_avoided").cast("long").alias("pairs_avoided"),
            "n_dropped",
            "avoided_all",
            F.round(F.col("avoided_all").cast("double") / ceiling, 6).alias(
                "ceiling_fraction"
            ),
            F.round(
                F.col("n_dropped").cast("double") / F.col("vocab"), 6
            ).alias("dropped_vocab_frac"),
        )
        .orderBy(F.col("df").desc(), "shingle")
        .limit(20)
    )

# ---------------------------------------------------------------------------
# q310 — ensemble verified near-dup pairs: candidates from ANY of the
# three blockers (MinHash-LSH, SimHash bands, winnowing), verified
# ONCE by exact Jaccard — the production composition q295's agreement
# audit argues for, with per-pair provenance flags showing which
# blocker(s) found it and the ensemble recall against the full
# verified truth on every row.
# ---------------------------------------------------------------------------
def _ensemble_pairs_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM msigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    msigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    mbb AS ({band_rows}),
    mh AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM mbb a JOIN mbb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    sh2 AS MATERIALIZED (
      SELECT DISTINCT id_a, id_b FROM ({_simhash_pairs_sql()})
    ),
    wn AS MATERIALIZED (
      SELECT id_a, id_b FROM ({_winnow_pairs_sql()})
    ),
    cand AS MATERIALIZED (
      SELECT id_a, id_b FROM mh
      UNION SELECT id_a, id_b FROM sh2
      UNION SELECT id_a, id_b FROM wn
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
    fk AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
           WHERE dfreq.df_count <= {_MAX_DF}),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM fk a JOIN fk b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS MATERIALIZED (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common * 1.0 / (sa.set_size + sb.set_size - n_common)
            >= {_JACCARD_THRESHOLD}
    ),
    verified AS (
      SELECT c.id_a, c.id_b FROM cand c JOIN truth t USING (id_a, id_b)
    ),
    stats AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM verified) AS n_verified,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth
    )
    SELECT v.id_a, v.id_b,
           CAST(EXISTS (SELECT 1 FROM mh m
                        WHERE m.id_a = v.id_a AND m.id_b = v.id_b) AS INT)
             AS via_minhash,
           CAST(EXISTS (SELECT 1 FROM sh2 s
                        WHERE s.id_a = v.id_a AND s.id_b = v.id_b) AS INT)
             AS via_simhash,
           CAST(EXISTS (SELECT 1 FROM wn w
                        WHERE w.id_a = v.id_a AND w.id_b = v.id_b) AS INT)
             AS via_winnowing,
           ROUND(CAST(st.n_verified AS DOUBLE) / st.n_truth, 6)
             AS ensemble_recall
    FROM verified v CROSS JOIN stats st
    ORDER BY v.id_a, v.id_b
    """


@register(
    "q310_ensemble_verified_pairs",
    _ensemble_pairs_sql(),
    doc="the production near-dup pipeline: union of MinHash-LSH, "
    "SimHash-band, and winnowing candidates, verified ONCE by exact "
    "Jaccard >= 0.4 — each surviving pair carries provenance flags "
    "(which blockers found it) and the ensemble's recall against the "
    "full verified truth. The composition q295's agreement numbers "
    "justify; verification cost is paid on the union, not per "
    "blocker. Every stage keeps its own bounded shuffle",
)
def q310_ensemble_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")

    # r10 ADR-0007 tail sweep: the four candidate/truth tables fan out
    # across the verify join, three broadcast flag joins and the stats
    # branch of ONE action — eager holds, probed -7% (8.21->7.61 min-of-3).
    # r12: the three blocker chains are independent, so their eager hold
    # jobs run overlapped (guide §2.6) — the build phase costs the
    # slowest chain, not the sum (10.0 -> 5.2 s min-of-3, rows identical).
    def _minhash_chain():
        # ONE shingle pass shared by the MinHash blocker and the exact-
        # Jaccard verifier (the oracle's single sh CTE) — winnowing and
        # SimHash keep their own feature spaces (positional k-grams /
        # token hashes), so only these two stages share.
        sh = hold(
            d.select(
                F.col("doc_id"),
                F.explode(dd.word_shingles(F.col("text"))).alias("shingle"),
            )
        )
        return overlap(
            lambda: hold(
                dd.candidate_pairs_from_signatures(
                    dd.minhash_signatures_from_shingles(
                        sh, "doc_id", "shingle", _NUM_HASHES
                    ),
                    "doc_id",
                    _NUM_HASHES,
                    _BANDS,
                ).select("id_a", "id_b").distinct()
            ),
            lambda: hold(
                dd.ngram_jaccard_pairs_from_shingles(
                    sh, "doc_id", "shingle",
                    threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF,
                ).select("id_a", "id_b")
            ),
        )

    (mh, truth), sh2, wn = overlap(
        _minhash_chain,
        lambda: hold(
            dd.simhash_candidate_pairs(
                d,
                "doc_id",
                "text",
                bits=_SIMHASH_BITS,
                bands=_SIMHASH_BANDS,
                max_hamming=_SIMHASH_MAX_HAMMING,
                max_bucket=_SIMHASH_MAX_BUCKET,
                persist_fn=hold,
            ).select("id_a", "id_b").distinct()
        ),
        lambda: hold(_winnow_pairs_df(spark, sf_dir).select("id_a", "id_b")),
    )
    cand = mh.union(sh2).union(wn).distinct()
    verified = cand.join(truth, ["id_a", "id_b"])
    stats = (
        verified.agg(F.count("*").cast("long").alias("n_verified"))
        .crossJoin(
            F.broadcast(truth.agg(F.count("*").cast("long").alias("n_truth")))
        )
    )
    flag = lambda df, name: df.select(
        "id_a", "id_b", F.lit(1).alias(name)
    )
    return (
        verified.join(F.broadcast(flag(mh, "via_minhash")), ["id_a", "id_b"], "left")
        .join(F.broadcast(flag(sh2, "via_simhash")), ["id_a", "id_b"], "left")
        .join(F.broadcast(flag(wn, "via_winnowing")), ["id_a", "id_b"], "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "id_a",
            "id_b",
            F.coalesce("via_minhash", F.lit(0)).cast("int").alias("via_minhash"),
            F.coalesce("via_simhash", F.lit(0)).cast("int").alias("via_simhash"),
            F.coalesce("via_winnowing", F.lit(0))
            .cast("int")
            .alias("via_winnowing"),
            F.round(
                F.col("n_verified").cast("double") / F.col("n_truth"), 6
            ).alias("ensemble_recall"),
        )
        .orderBy("id_a", "id_b")
    )

# ---------------------------------------------------------------------------
# q349 — dedup-threshold percolation: how the near-dup component
# structure changes as the exact-Jaccard edge threshold sweeps
# 50/70/90% — the operational dial behind every dedup rollout (too
# low and the corpus percolates into one giant cluster that a keeper
# rule then guts; too high and template families survive). Edges are
# integer cross-multiplications (n_common*100 >= t*union) on the
# df-capped shingle join computed ONCE; per threshold the exact
# component fixpoint.
# ---------------------------------------------------------------------------
_PERC_THRESHOLDS = [50, 70, 90]

def _percolation_sql() -> str:
    blocks, rows = [], []
    for t in _PERC_THRESHOLDS:
        blocks.append(
            f"""e{t} AS (SELECT id_a AS a, id_b AS b FROM base
               WHERE n_common * 100 >= {t} * un),
    bi{t} AS (SELECT a, b FROM e{t} UNION SELECT b, a FROM e{t}),
    r{t}(node, lbl) AS (
      SELECT DISTINCT a, a FROM bi{t}
      UNION
      SELECT bi{t}.a, r{t}.lbl FROM r{t} JOIN bi{t} ON bi{t}.b = r{t}.node
    ),
    c{t} AS (SELECT node, MIN(lbl) AS comp FROM r{t} GROUP BY 1),
    cs{t} AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS cs
              FROM c{t} GROUP BY 1),
    s{t} AS (
      SELECT {t} AS threshold_pct,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM e{t}) AS n_edges,
             CAST(COALESCE(SUM(cs), 0) AS BIGINT) AS n_nodes_in_edges,
             CAST(COUNT(*) AS BIGINT) AS n_edge_components,
             CAST(COALESCE(MAX(cs), 0) AS BIGINT) AS max_cs
      FROM cs{t}
    )"""
        )
        rows.append(
            f"SELECT threshold_pct, n_edges, n_nodes_in_edges, "
            f"n_edge_components, "
            f"nd.nd - n_nodes_in_edges + n_edge_components AS n_components_total, "
            f"GREATEST(max_cs, CASE WHEN nd.nd > n_nodes_in_edges "
            f"THEN 1 ELSE 0 END) AS largest_component "
            f"FROM s{t} CROSS JOIN nd"
        )
    blocks_sql = ",\n    ".join(blocks)
    rows_sql = " UNION ALL ".join(rows)
    return f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS set_size
              FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
    f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
          WHERE dfreq.df_count <= {_MAX_DF}),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    base AS (
      SELECT id_a, id_b, n_common,
             sa.set_size + sb.set_size - n_common AS un
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
    {blocks_sql}
    SELECT * FROM ({rows_sql})
    ORDER BY threshold_pct
    """


@register(
    "q349_threshold_percolation",
    _percolation_sql(),
    doc="dedup-threshold percolation sweep: exact-Jaccard edges at "
    "50/70/90% (integer cross-multiplication n_common*100 >= t*union "
    "on the ONE df-capped shingle self-join) and, per threshold, the "
    "exact component census — edges, edge-graph components, total "
    "components including singletons, and the largest cluster. The "
    "dial chart that picks a production near-dup threshold: the "
    "largest-component column shows exactly where the corpus "
    "percolates into a giant cluster. Spark resolves each "
    "threshold's components with the O(log n) star contraction "
    "(q135's machinery) on the shared pinned edge base; the oracle "
    "replays each fixpoint via recursive CTE",
)
def q349_threshold_percolation(spark: SparkSession, sf_dir: str) -> DataFrame:

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    # eager hold — the three-consumer shingle shape (ngram_jaccard_pairs)
    sh = hold(
        d.select(
            "doc_id", F.explode(dd.word_shingles(F.col("text"), 3)).alias("shingle")
        )
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("set_size"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df_count"))
    filtered = sh.join(dfreq.filter(F.col("df_count") <= _MAX_DF), "shingle")
    a = filtered.select(F.col("doc_id").alias("id_a"), "shingle")
    b = filtered.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("set_size").alias("size_b"))
    # NOT pinned: base has exactly one consumer (the tagged pin's
    # materialization), so caching it only paid an InMemoryRelation
    # round-trip on the pair-scale self-join output — the largest
    # intermediate of the query. Interleaved min-of-3 A/B at sf0.1:
    # 12.2 s pinned vs 7.1 s without, rows identical.
    base = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            (F.col("size_a") + F.col("size_b") - F.col("n_common")).alias("un"),
        )
    )
    ndocs = d.agg(F.count("*").cast("long").alias("nd"))
    ts = spark.createDataFrame(
        [(int(t),) for t in _PERC_THRESHOLDS], "threshold_pct int"
    )
    # all three thresholded edge sets contract in ONE tagged star loop
    # (q270 discipline): max(rounds over thresholds) driver iterations
    tagged = pin(
        base.crossJoin(F.broadcast(ts))
        .filter(F.col("n_common") * 100 >= F.col("threshold_pct") * F.col("un"))
        .select("threshold_pct", "id_a", "id_b")
    )
    comp = dd.connected_components_star(tagged, tag_cols=("threshold_pct",))
    cs = comp.groupBy("threshold_pct", "component").agg(
        F.count("*").cast("long").alias("cs")
    )
    s = cs.groupBy("threshold_pct").agg(
        F.sum("cs").cast("long").alias("n_nodes_in_edges"),
        F.count("*").cast("long").alias("n_edge_components"),
        F.max("cs").cast("long").alias("max_cs"),
    )
    ne = tagged.groupBy("threshold_pct").agg(
        F.count("*").cast("long").alias("n_edges")
    )
    # left joins from the threshold list so an edgeless cut still emits
    return (
        ts.join(ne, "threshold_pct", "left")
        .join(s, "threshold_pct", "left")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "threshold_pct",
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            F.coalesce("n_nodes_in_edges", F.lit(0))
            .cast("long")
            .alias("n_nodes_in_edges"),
            F.coalesce("n_edge_components", F.lit(0))
            .cast("long")
            .alias("n_edge_components"),
            (
                F.col("nd")
                - F.coalesce("n_nodes_in_edges", F.lit(0))
                + F.coalesce("n_edge_components", F.lit(0))
            ).alias("n_components_total"),
            F.greatest(
                F.coalesce("max_cs", F.lit(0)).cast("long"),
                (F.col("nd") > F.coalesce("n_nodes_in_edges", F.lit(0))).cast(
                    "long"
                ),
            ).alias("largest_component"),
        )
        .orderBy("threshold_pct")
    )

# ---------------------------------------------------------------------------
# q353 — keeper-quality audit of the near-dup clusters: the standard
# keeper rule (min doc_id — q56/q120/q95 all use it) is arbitrary;
# this scores every multi-member component's keeper against its best
# member on lexical richness (distinct-term count, integer) and
# reports the regret — the number that justifies (or retires) a
# quality-aware keeper rule. Components via the exact star-
# contraction fixpoint; quality from one (doc, term) aggregate.
# ---------------------------------------------------------------------------
def _keeper_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bb AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    bi AS (SELECT a, b FROM cand UNION SELECT b, a FROM cand),
    reach(node, lbl) AS (
      SELECT DISTINCT a, a FROM bi
      UNION
      SELECT bi.a, reach.lbl FROM reach JOIN bi ON bi.b = reach.node
    ),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY 1),
    qual AS (
      SELECT doc_id, CAST(COUNT(DISTINCT t) AS BIGINT) AS q
      FROM (SELECT doc_id, unnest(list_filter(
              string_split_regex(trim(lower(text)), '\\s+'),
              x -> x <> '')) AS t
            FROM documents)
      GROUP BY 1
    ),
    m AS (
      SELECT c.component, c.node, q.q
      FROM comp c JOIN qual q ON q.doc_id = c.node
    ),
    agg AS (
      SELECT component,
             CAST(COUNT(*) AS BIGINT) AS comp_size,
             CAST(MIN(node) AS BIGINT) AS keeper,
             CAST(MAX(q) AS BIGINT) AS best_quality,
             MIN(CASE WHEN rn = 1 THEN node END) AS best_doc
      FROM (SELECT m.*, ROW_NUMBER() OVER (PARTITION BY component
                        ORDER BY q DESC, node) AS rn FROM m)
      GROUP BY 1
    )
    SELECT a.component, a.comp_size, a.keeper,
           kq.q AS keeper_quality, a.best_doc, a.best_quality,
           a.best_quality - kq.q AS quality_regret,
           CAST(a.keeper = a.best_doc AS INT) AS keeper_is_best
    FROM agg a JOIN qual kq ON kq.doc_id = a.keeper
    WHERE a.comp_size >= 2
    ORDER BY a.component
    """


@register(
    "q353_keeper_quality_audit",
    _keeper_sql(),
    doc="keeper-quality audit: for every multi-member near-dup "
    "component (exact star-contraction fixpoint over the LSH "
    "candidate graph), compare the min-doc-id keeper every dedup "
    "stage uses (q56/q95/q120) against the member with the highest "
    "lexical richness (distinct-term count — integer, no float "
    "quality model), reporting the regret and whether the arbitrary "
    "rule happened to pick the best. Non-zero regret mass is the "
    "case for a quality-aware keeper; zero says the cheap rule is "
    "fine. Component machinery + one (doc, term) aggregate + "
    "component-bounded joins",
)
def q353_keeper_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    # r12: the LSH edge table and the per-doc richness aggregate are
    # independent — their eager holds build overlapped (guide §2.6);
    # the star contraction (which uses the per-round hold_ids
    # lifecycle) stays serial after the barrier.
    edges, qual = overlap(
        lambda: hold(
            dd.lsh_candidate_pairs(
                d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS
            )
        ),
        lambda: hold(
            d.select("doc_id", F.explode(wcol).alias("t"))
            .groupBy("doc_id")
            .agg(F.countDistinct("t").cast("long").alias("q"))
        ),
    )
    comp = dd.connected_components_star(edges)
    m = comp.select(F.col("node"), "component").join(
        qual, F.col("node") == qual["doc_id"]
    )
    agg = (
        m.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("component").orderBy(F.col("q").desc(), "node")
            ),
        )
        .groupBy("component")
        .agg(
            F.count("*").cast("long").alias("comp_size"),
            F.min("node").cast("long").alias("keeper"),
            F.max("q").cast("long").alias("best_quality"),
            F.min(F.when(F.col("rn") == 1, F.col("node"))).alias("best_doc"),
        )
        .filter(F.col("comp_size") >= 2)
    )
    kq = qual.select(
        F.col("doc_id").alias("keeper"), F.col("q").alias("keeper_quality")
    )
    return (
        agg.join(F.broadcast(kq), "keeper")
        .select(
            "component",
            "comp_size",
            "keeper",
            "keeper_quality",
            "best_doc",
            "best_quality",
            (F.col("best_quality") - F.col("keeper_quality")).alias(
                "quality_regret"
            ),
            (F.col("keeper") == F.col("best_doc")).cast("int").alias(
                "keeper_is_best"
            ),
        )
        .orderBy("component")
    )

# ---------------------------------------------------------------------------
# q360 — b-bit MinHash (Li & Koenig 2010): store only the LOWEST BIT
# of each minhash and estimate Jaccard from bit agreement — 1/64th
# the signature storage of q31's 16-hex-char signatures. For 1-bit
# hashes E[agreement] = (1 + J)/2, so J_hat = 2A/k - 1; the estimate
# is scored against exact Jaccard on the LSH candidate pairs with
# both the absolute error and the theoretical standard error riding
# along. Bits are exact integer parities of the md5 minhashes; only
# the final estimate divides.
# ---------------------------------------------------------------------------
def _bbit_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    bit_exprs = ", ".join(
        f"strpos('13579bdf', substr(sig_{h}, 16, 1)) > 0 AS bit_{h}"
        for h in range(_NUM_HASHES)
    )
    agree = " + ".join(
        f"CASE WHEN a.bit_{h} = b.bit_{h} THEN 1 ELSE 0 END"
        for h in range(_NUM_HASHES)
    )
    k = _NUM_HASHES
    return f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS set_size
              FROM sh GROUP BY 1),
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bits AS (SELECT doc_id, {bit_exprs} FROM sigs),
    bb AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    est AS (
      SELECT c.id_a, c.id_b,
             CAST({agree} AS BIGINT) AS n_agree
      FROM cand c
      JOIN bits a ON a.doc_id = c.id_a
      JOIN bits b ON b.doc_id = c.id_b
    )
    SELECT e.id_a, e.id_b, e.n_agree,
           FLOOR((2e0 * e.n_agree / {k} - 1) * 1000000e0) / 1000000e0
             AS j_bbit,
           FLOOR((CAST(COALESCE(i.n_common, 0) AS DOUBLE)
                 / (sa.set_size + sb.set_size - COALESCE(i.n_common, 0)))
                 * 1000000e0) / 1000000e0 AS j_exact,
           FLOOR(ABS(2e0 * e.n_agree / {k} - 1
                 - CAST(COALESCE(i.n_common, 0) AS DOUBLE)
                   / (sa.set_size + sb.set_size - COALESCE(i.n_common, 0)))
                 * 1000000e0) / 1000000e0 AS abs_err,
           FLOOR((2e0 * sqrt(0.25e0 / {k})) * 1000000e0) / 1000000e0
             AS theoretical_se
    FROM est e
    LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
    JOIN sizes sa ON sa.doc_id = e.id_a
    JOIN sizes sb ON sb.doc_id = e.id_b
    ORDER BY e.id_a, e.id_b
    """


@register(
    "q360_bbit_minhash",
    _bbit_sql(),
    doc="b-bit MinHash Jaccard estimation (Li & Koenig, b=1): keep "
    "only each minhash's lowest bit (parity of the last hex digit — "
    "1/64th of q31's signature bytes), estimate J = 2*agreement/k - 1 "
    "over the LSH candidate pairs, and score it against exact Jaccard "
    "with the absolute error and the theoretical binomial standard "
    "error 2*sqrt(0.25/k) beside it — the storage-accuracy dial "
    "between q31's full signatures and nothing, and the k-budget "
    "chart for a 100 TB signature store. Bits are exact integer "
    "parities; agreement counts exact; one division per estimate",
)
def q360_bbit_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = _NUM_HASHES
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    sh = d.select(
        "doc_id", F.explode(dd.word_shingles(F.col("text"), 3)).alias("shingle")
    )
    sh = hold(sh)
    sizes = sh.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("set_size")
    )
    sigs = dd.minhash_signatures_from_shingles(
        sh, "doc_id", shingle_col="shingle", num_hashes=k
    )
    bits = sigs.select(
        "doc_id",
        *[
            (
                F.instr(F.lit("13579bdf"), F.substring(f"sig_{h}", 16, 1)) > 0
            ).alias(f"bit_{h}")
            for h in range(k)
        ],
    )
    cand = dd.candidate_pairs_from_signatures(sigs, "doc_id", bands=_BANDS)
    b2 = sh.select(F.col("doc_id").alias("id_b2"), "shingle")
    inter = (
        sh.join(b2, "shingle")
        .filter(F.col("doc_id") < F.col("id_b2"))
        .groupBy(
            F.col("doc_id").alias("ia"), F.col("id_b2").alias("ib")
        )
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    ba = bits.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"bit_{h}").alias(f"a_{h}") for h in range(k)],
    )
    bbt = bits.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"bit_{h}").alias(f"b_{h}") for h in range(k)],
    )
    agree = None
    for h in range(k):
        term = (F.col(f"a_{h}") == F.col(f"b_{h}")).cast("int")
        agree = term if agree is None else agree + term
    est = (
        cand.join(F.broadcast(ba), "id_a")
        .join(F.broadcast(bbt), "id_b")
        .select("id_a", "id_b", agree.cast("long").alias("n_agree"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("set_size").alias("size_b"))
    j_bbit = 2.0 * F.col("n_agree") / k - 1
    j_exact = F.coalesce("n_common", F.lit(0)).cast("double") / (
        F.col("size_a") + F.col("size_b") - F.coalesce("n_common", F.lit(0))
    )
    return (
        est.join(
            inter,
            (F.col("ia") == F.col("id_a")) & (F.col("ib") == F.col("id_b")),
            "left",
        )
        .join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_agree",
            vector.floor_quant(j_bbit).alias("j_bbit"),
            vector.floor_quant(j_exact).alias("j_exact"),
            vector.floor_quant(F.abs(j_bbit - j_exact)).alias("abs_err"),
            vector.floor_quant(
                F.lit(2.0) * F.sqrt(F.lit(0.25) / k)
            ).alias("theoretical_se"),
        )
        .orderBy("id_a", "id_b")
    )
