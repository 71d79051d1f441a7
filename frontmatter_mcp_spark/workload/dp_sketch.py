"""Mergeable-sketch family: HLL, KMV, CountMin, Misra-Gries, Bloom, histograms and cardinality/quantile estimation audits.

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
from frontmatter_mcp_spark.operators.holds import hold
from frontmatter_mcp_spark.workload.registry import pin, register
from frontmatter_mcp_spark.workload.dp_shared import (
    _BLOOM_K,
    _BLOOM_M,
    _HSQ_RATE,
    _JSZ_DEPTH,
    _JSZ_WIDTH,
    _SHINGLES_CTE,
    _hash_bucket_duck,
)

def _bloom_positions(fp: Column) -> Column:
    """k bit positions from non-overlapping 8-hex-digit slices of the md5
    fingerprint — engine-portable (no internal hash functions)."""
    return F.array(
        *[
            (F.conv(F.substring(fp, 1 + 8 * i, 8), 16, 10).cast("long") % _BLOOM_M).cast(
                "int"
            )
            for i in range(_BLOOM_K)
        ]
    )


@register(
    "q86_bloom_prefilter_dedup",
    f"""
    WITH tagged AS (
      SELECT doc_id, md5(text) AS fp, {{b}} AS batch
      FROM documents
    )
    SELECT DISTINCT i.doc_id
    FROM tagged i JOIN tagged e ON i.fp = e.fp
    WHERE i.batch = 'incoming' AND e.batch = 'existing'
    """.format(b=tables.ingest_batch_sql("doc_id")),
    doc="incremental exact dedup with a bloom prefilter: the existing "
    "batch's fingerprints build a compact bit-position set (bounded "
    "collect_set <= M, broadcast as one row); incoming docs failing ANY "
    "of the k membership bits never reach the join shuffle. The exact "
    "fingerprint join then removes bloom false positives, so the result "
    "is identical to the plain exact join (the oracle) — at 100 TB the "
    "bloom turns a full-corpus shuffle into a shuffle of candidate hits. "
    "The corpus/batch split comes from the loader's ingest_batch column "
    "(tables.load_documents_batched), not a per-query filter",
)
def q86_bloom_prefilter_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(tables.load_documents_batched(spark, sf_dir), "doc_id")
    tagged = d.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.col("ingest_batch").alias("batch"),
    )
    existing = tagged.filter(F.col("batch") == "existing")
    incoming = tagged.filter(F.col("batch") == "incoming")
    bloom = (
        existing.select(F.explode(_bloom_positions(F.col("fp"))).alias("p"))
        .agg(F.collect_set("p").alias("bits"))
    )
    prefiltered = incoming.crossJoin(F.broadcast(bloom)).filter(
        F.forall(
            _bloom_positions(F.col("fp")), lambda p: F.array_contains(F.col("bits"), p)
        )
    )
    return (
        prefiltered.join(existing.select("fp"), "fp", "left_semi")
        .select("doc_id")
        .distinct()
    )

# ---------------------------------------------------------------------------
# q132 — Count-Min sketch heavy hitters: the streaming-sketch building
# block, built DETERMINISTICALLY (md5-derived hash rows), so unlike
# engine-native sketches (q27) both engines compute identical cells and
# the estimate property (est >= true, bounded overestimate) is
# hash-verified exactly
# ---------------------------------------------------------------------------
_CMS_DEPTH = 4

_CMS_WIDTH = 256

_CMS_TOPK = 20

def _cms_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    col = hash_bucket_sql("CAST(r AS VARCHAR) || '|' || t", _CMS_WIDTH)
    return f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                    x -> x <> '')) AS t
      FROM documents
    ),
    tf AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
    hashed AS (
      SELECT t, c, r, {col} AS col
      FROM tf CROSS JOIN UNNEST(generate_series(0, {_CMS_DEPTH - 1})) AS g(r)
    ),
    cells AS (SELECT r, col, CAST(SUM(c) AS BIGINT) AS v FROM hashed GROUP BY 1, 2),
    est AS (
      SELECT h.t, h.c, MIN(cells.v) AS est
      FROM hashed h JOIN cells ON cells.r = h.r AND cells.col = h.col
      GROUP BY 1, 2
    )
    SELECT t AS token, c AS true_count, est AS cms_estimate,
           est - c AS overestimate
    FROM est ORDER BY est DESC, t LIMIT {_CMS_TOPK}
    """


@register(
    "q132_countmin_heavy_hitters",
    _cms_sql(),
    doc="Count-Min sketch heavy hitters over the token stream: a "
    "4 x 256 sketch whose hash rows are md5-derived (deterministic, so "
    "the whole sketch — cells, min-estimates, the est >= true "
    "overestimate property — hash-matches across engines exactly, "
    "unlike engine-native sketches). The sketch aggregate is map-side "
    "combined into 1024 cells and broadcast back for estimates; the "
    "exact counts ride along here as the audit column — at true "
    "stream scale only the sketch survives",
)
def q132_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    tf = (
        d.select(F.explode(toks).alias("t"))
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    rr = d.sparkSession.range(_CMS_DEPTH).select(F.col("id").cast("int").alias("r"))
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -20% (0.64->0.51)
    hashed = hold(
        tf.crossJoin(F.broadcast(rr)).select(
            "t",
            "c",
            "r",
            hash_bucket(
                F.concat(F.col("r").cast("string"), F.lit("|"), F.col("t")), _CMS_WIDTH
            ).alias("col"),
        )
    )
    cells = hashed.groupBy("r", "col").agg(F.sum("c").cast("long").alias("v"))
    est = (
        hashed.join(F.broadcast(cells), ["r", "col"])
        .groupBy("t", "c")
        .agg(F.min("v").alias("est"))
    )
    return (
        est.select(
            F.col("t").alias("token"),
            F.col("c").alias("true_count"),
            F.col("est").alias("cms_estimate"),
            (F.col("est") - F.col("c")).alias("overestimate"),
        )
        .orderBy(F.col("cms_estimate").desc(), "token")
        .limit(_CMS_TOPK)
    )

# ---------------------------------------------------------------------------
# q136 — deterministic HyperLogLog: the distinct-count sketch built from
# md5-derived registers (the q132 discipline applied to HLL), so the
# register table, the harmonic sum, and the estimate all hash-verify
# across engines — unlike engine-native approx_count_distinct (q27,
# bounded-error booleans only)
# ---------------------------------------------------------------------------
_HLL_M = 64  # registers (p = 6)

_HLL_RHO_BITS = 48  # leading-zero probe width (hex digits 8..19)

_HLL_FX = 1 << 49  # exact harmonic sum: sum of 2^(49 - rho) BIGINTs

def _hll_estimate_expr(sum_fx: str, zeros: str) -> str:
    """The shared double-arithmetic estimate — identical text both
    engines (alpha_64 * m^2 / harmonic_sum, with the small-range
    linear-counting correction). The harmonic sum arrives as an exact
    BIGINT (sum of 2^(49-rho)), so the only engine-wobbly op is ln()
    in the correction branch, absorbed by round-4 (q94 discipline)."""
    m = _HLL_M
    # e0-suffixed literals parse as DOUBLE in BOTH engines; bare 0.7213
    # is a DECIMAL literal whose division rules differ cross-engine
    # (measured: 15867.6944 vs 15867.6886 from identical registers)
    raw = (
        f"(0.7213e0 / (1e0 + 1.079e0 / {m})) * {m} * {m} "
        f"/ (CAST({sum_fx} AS DOUBLE) / {float(_HLL_FX)})"
    )
    return (
        f"round(CASE WHEN ({raw}) <= 2.5e0 * {m} AND {zeros} > 0 "
        f"THEN {m} * ln(CAST({m} AS DOUBLE) / {zeros}) "
        f"ELSE ({raw}) END, 4)"
    )

def _hll_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    idx = hash_bucket_sql("t", _HLL_M)
    # 48-bit probe value from md5 hex digits 8..19 (strpos digit fold —
    # the hash_bucket portability trick)
    v = "CAST(0 AS BIGINT)"
    for i in range(8, 20):
        v = (
            f"({v}) * 16 + (strpos('0123456789abcdef', "
            f"substr(md5(CAST(t AS VARCHAR)), {i}, 1)) - 1)"
        )
    rho = (
        f"CASE WHEN ({v}) = 0 THEN {_HLL_RHO_BITS + 1} "
        f"ELSE {_HLL_RHO_BITS} - length(bin({v})) + 1 END"
    )
    est = _hll_estimate_expr("s.sum_fx", "s.zeros")
    return f"""
    WITH {_SHINGLES_CTE},
    items AS (SELECT DISTINCT shingle AS t FROM sh),
    regs AS (
      SELECT {idx} AS reg, CAST(MAX({rho}) AS INT) AS rho
      FROM items GROUP BY 1
    ),
    s AS (
      SELECT CAST(SUM(CAST(POW(2, 49 - rho) AS BIGINT)) AS BIGINT)
               + CAST(({_HLL_M} - COUNT(*)) AS BIGINT) * {_HLL_FX} AS sum_fx,
             CAST({_HLL_M} - COUNT(*) AS INT) AS zeros,
             md5(string_agg(reg || ':' || rho, '|' ORDER BY reg)) AS register_fp
      FROM regs
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM items)
    SELECT n.n_exact, s.zeros, s.sum_fx, s.register_fp,
           {est} AS estimate,
           ABS({est} - n.n_exact) / n.n_exact <= 0.39 AS within_3sigma
    FROM s CROSS JOIN n
    """


@register(
    "q136_hll_distinct",
    _hll_sql(),
    doc="deterministic HyperLogLog distinct-count sketch over the corpus "
    "shingle set (word 3-grams — thousands of distinct items, the "
    "sketch's real operating range; the raw vocabulary is ~31 tokens): "
    "md5-derived register index (6 bits) + leading-zero rank "
    "over a 48-bit md5 probe, so the full register table (fingerprinted), "
    "the exact-BIGINT harmonic sum (sum of 2^(49-rho) — no double "
    "accumulation), the estimate, and its 3-sigma bound vs the exact "
    "count all hash-verify across engines — the cross-engine-checkable "
    "counterpart of q27's engine-native approx_count_distinct. One "
    "corpus explode, map-side combine into 64 registers",
)
def q136_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = pin(
        d.select(F.explode(dd.word_shingles(F.col("text"), 3)).alias("t")).distinct()
    )
    h = F.md5(F.col("t").cast("string"))
    v = F.lit(0).cast("long")
    for i in range(8, 20):
        v = v * 16 + (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1
        )
    rho = F.when(v == 0, F.lit(_HLL_RHO_BITS + 1)).otherwise(
        F.lit(_HLL_RHO_BITS) - F.length(F.bin(v)) + 1
    )
    regs = (
        toks.select(hash_bucket(F.col("t"), _HLL_M).alias("reg"), rho.alias("__rho"))
        .groupBy("reg")
        .agg(F.max("__rho").cast("int").alias("rho"))
    )
    s = regs.agg(
        (
            F.sum(F.pow(F.lit(2), F.lit(49) - F.col("rho")).cast("long")).cast("long")
            + (F.lit(_HLL_M) - F.count("*")).cast("long") * F.lit(_HLL_FX)
        ).alias("sum_fx"),
        (F.lit(_HLL_M) - F.count("*")).cast("int").alias("zeros"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("reg", "rho"))),
                    lambda r: F.concat(
                        r.reg.cast("string"), F.lit(":"), r.rho.cast("string")
                    ),
                ),
                "|",
            )
        ).alias("register_fp"),
    )
    n = toks.agg(F.count("*").cast("long").alias("n_exact"))
    est = _hll_estimate_expr("sum_fx", "zeros")
    return (
        s.crossJoin(F.broadcast(n))
        .selectExpr(
            "n_exact",
            "zeros",
            "sum_fx",
            "register_fp",
            f"{est} AS estimate",
            f"ABS({est} - n_exact) / n_exact <= 0.39 AS within_3sigma",
        )
    )

def _join_size_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    col = hash_bucket_sql("CAST(r AS VARCHAR) || '|' || CAST(k AS VARCHAR)", _JSZ_WIDTH)
    return f"""
    WITH a AS (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
               FROM orders GROUP BY 1),
    b AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
          FROM lineitem GROUP BY 1),
    truth AS (SELECT CAST(SUM(a.c * b.c) AS BIGINT) AS true_size
              FROM a JOIN b USING (k)),
    ca AS (SELECT r, {col} AS col, CAST(SUM(c) AS BIGINT) AS v
           FROM a CROSS JOIN UNNEST(generate_series(0, {_JSZ_DEPTH - 1})) AS g(r)
           GROUP BY 1, 2),
    cb AS (SELECT r, {col} AS col, CAST(SUM(c) AS BIGINT) AS v
           FROM b CROSS JOIN UNNEST(generate_series(0, {_JSZ_DEPTH - 1})) AS g(r)
           GROUP BY 1, 2),
    rows_ AS (SELECT ca.r, CAST(SUM(ca.v * cb.v) AS BIGINT) AS ip
              FROM ca JOIN cb ON ca.r = cb.r AND ca.col = cb.col
              GROUP BY 1),
    est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_size FROM rows_)
    SELECT t.true_size, e.est_size,
           e.est_size >= t.true_size AS is_overestimate,
           round(CAST(e.est_size - t.true_size AS DOUBLE) / t.true_size, 6)
             AS rel_overestimate
    FROM truth t CROSS JOIN est e
    """


@register(
    "q152_join_size_sketch",
    _join_size_sql(),
    doc="join-size estimation from Count-Min sketches (AGMS inner "
    "product): |orders join lineitem| estimated as the min over 4 "
    "md5-derived sketch rows of the 256-cell inner product — the "
    "optimizer-statistics trick that prices a join from two tiny "
    "sketches instead of executing it. Each side collapses map-side to "
    "1024 cells; the inner product is a broadcast join of two "
    "sketch-sized tables; the hard est>=true overestimate property "
    "ships as a hash-checked boolean next to the exact join size",
)
def q152_join_size_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    o = load_table(spark, sf_dir, "orders").groupBy(
        F.col("o_orderkey").alias("k")
    ).agg(F.count("*").cast("long").alias("c"))
    ln = load_table(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("k")
    ).agg(F.count("*").cast("long").alias("c"))
    truth = o.join(ln.withColumnRenamed("c", "cb"), "k").agg(
        F.sum(F.col("c") * F.col("cb")).cast("long").alias("true_size")
    )
    rr = o.sparkSession.range(_JSZ_DEPTH).select(F.col("id").cast("int").alias("r"))

    def sketch(side: DataFrame) -> DataFrame:
        return (
            side.crossJoin(F.broadcast(rr))
            .select(
                "r",
                hash_bucket(
                    F.concat(
                        F.col("r").cast("string"), F.lit("|"), F.col("k").cast("string")
                    ),
                    _JSZ_WIDTH,
                ).alias("col"),
                "c",
            )
            .groupBy("r", "col")
            .agg(F.sum("c").cast("long").alias("v"))
        )

    ca = sketch(o)
    cb = sketch(ln).withColumnRenamed("v", "vb")
    est = (
        ca.join(F.broadcast(cb), ["r", "col"])
        .groupBy("r")
        .agg(F.sum(F.col("v") * F.col("vb")).cast("long").alias("ip"))
        .agg(F.min("ip").cast("long").alias("est_size"))
    )
    return truth.crossJoin(F.broadcast(est)).selectExpr(
        "true_size",
        "est_size",
        "est_size >= true_size AS is_overestimate",
        "round(CAST(est_size - true_size AS DOUBLE) / true_size, 6)"
        " AS rel_overestimate",
    )

# ---------------------------------------------------------------------------
# q160 — HLL register MERGE for distinct-key overlap: per-side register
# tables (q136 machinery) combine by elementwise MAX into the UNION
# sketch — the mergeability that makes HLL the engine-standard distinct
# counter (partial aggregates union exactly like this) — and the
# intersection estimate follows by inclusion-exclusion. Pairs with
# q152: CMS prices the JOIN SIZE, HLL prices the DISTINCT overlap.
# ---------------------------------------------------------------------------
def _hll_regs_sql(src: str, key: str) -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    idx = hash_bucket_sql("t", _HLL_M)
    v = "CAST(0 AS BIGINT)"
    for i in range(8, 20):
        v = (
            f"({v}) * 16 + (strpos('0123456789abcdef', "
            f"substr(md5(CAST(t AS VARCHAR)), {i}, 1)) - 1)"
        )
    rho = (
        f"CASE WHEN ({v}) = 0 THEN {_HLL_RHO_BITS + 1} "
        f"ELSE {_HLL_RHO_BITS} - length(bin({v})) + 1 END"
    )
    return (
        f"SELECT {idx} AS reg, CAST(MAX({rho}) AS INT) AS rho "
        f"FROM (SELECT DISTINCT CAST({key} AS VARCHAR) AS t FROM {src}) "
        f"GROUP BY 1"
    )

def _hll_est_from_regs(regs: str) -> str:
    sum_fx = (
        f"(SELECT CAST(SUM(CAST(POW(2, 49 - rho) AS BIGINT)) AS BIGINT)"
        f" + CAST(({_HLL_M} - COUNT(*)) AS BIGINT) * {_HLL_FX} FROM {regs})"
    )
    zeros = f"(SELECT CAST({_HLL_M} - COUNT(*) AS INT) FROM {regs})"
    return _hll_estimate_expr(sum_fx, zeros)


@register(
    "q160_hll_join_overlap",
    f"""
    WITH ra AS ({_hll_regs_sql('orders', 'o_custkey')}),
    rb AS ({_hll_regs_sql('customer', 'c_custkey')}),
    ru AS (
      SELECT reg, CAST(MAX(rho) AS INT) AS rho
      FROM (SELECT reg, rho FROM ra UNION ALL SELECT reg, rho FROM rb)
      GROUP BY 1
    ),
    truth AS (
      SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd_a,
             (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) FROM customer) AS nd_b,
             (SELECT CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
              FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)
               AS nd_overlap
      FROM orders
    )
    SELECT t.nd_a, t.nd_b, t.nd_overlap,
           {_hll_est_from_regs('ra')} AS est_a,
           {_hll_est_from_regs('rb')} AS est_b,
           {_hll_est_from_regs('ru')} AS est_union,
           round({_hll_est_from_regs('ra')} + {_hll_est_from_regs('rb')}
                 - {_hll_est_from_regs('ru')}, 4) AS est_overlap
    FROM truth t
    """,
    doc="HLL register MERGE for distinct-key join overlap: per-side "
    "register tables (the q136 sketch) combine by elementwise MAX into "
    "the exact union sketch — the mergeability property that makes HLL "
    "the engine-standard distinct counter — and |A intersect B| follows "
    "by inclusion-exclusion, all hash-verified next to the exact "
    "counts. Pairs with q152: CMS prices the join SIZE, HLL prices the "
    "DISTINCT overlap; both from sketch-sized state",
)
def q160_hll_join_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    def regs(df, key):
        t = df.select(F.col(key).cast("string").alias("t")).distinct()
        h = F.md5(F.col("t"))
        v = F.lit(0).cast("long")
        for i in range(8, 20):
            v = v * 16 + (
                F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1
            )
        rho = F.when(v == 0, F.lit(_HLL_RHO_BITS + 1)).otherwise(
            F.lit(_HLL_RHO_BITS) - F.length(F.bin(v)) + 1
        )
        return (
            t.select(hash_bucket(F.col("t"), _HLL_M).alias("reg"), rho.alias("__rho"))
            .groupBy("reg")
            .agg(F.max("__rho").cast("int").alias("rho"))
        )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ra = pin(regs(o, "o_custkey"))
    rb = pin(regs(c, "c_custkey"))
    ru = (
        ra.unionAll(rb).groupBy("reg").agg(F.max("rho").cast("int").alias("rho"))
    )

    def est(regs_df):
        s = regs_df.agg(
            (
                F.sum(F.pow(F.lit(2), F.lit(49) - F.col("rho")).cast("long"))
                .cast("long")
                + (F.lit(_HLL_M) - F.count("*")).cast("long") * F.lit(_HLL_FX)
            ).alias("sum_fx"),
            (F.lit(_HLL_M) - F.count("*")).cast("int").alias("zeros"),
        )
        return s.selectExpr(
            f"{_hll_estimate_expr('sum_fx', 'zeros')} AS e"
        )

    ea = est(ra).withColumnRenamed("e", "est_a")
    eb = est(rb).withColumnRenamed("e", "est_b")
    eu = est(ru).withColumnRenamed("e", "est_union")
    truth = (
        o.agg(F.countDistinct("o_custkey").cast("long").alias("nd_a"))
        .crossJoin(
            F.broadcast(
                c.agg(F.countDistinct("c_custkey").cast("long").alias("nd_b"))
            )
        )
        .crossJoin(
            F.broadcast(
                o.join(c, o.o_custkey == c.c_custkey)
                .agg(F.countDistinct("o_custkey").cast("long").alias("nd_overlap"))
            )
        )
    )
    return (
        truth.crossJoin(F.broadcast(ea))
        .crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .selectExpr(
            "nd_a", "nd_b", "nd_overlap", "est_a", "est_b", "est_union",
            "round(est_a + est_b - est_union, 4) AS est_overlap",
        )
    )

# ---------------------------------------------------------------------------
# q166 — KMV / bottom-k (theta) sketch set operations over per-language
# vocabularies: the third mergeable-sketch family next to HLL (q136/
# q160 — distinct + inclusion-exclusion overlap) and CMS (q132/q152 —
# frequencies + join size). Theta sketches estimate the INTERSECTION
# directly (count common hashes under the union threshold), which
# inclusion-exclusion cannot do without compounding two errors.
# ---------------------------------------------------------------------------
_KMV_K = 64

_KMV_REF_LANG = "en"

def _kmv_fold_spark(h):
    """First 13 hex digits of an md5 as a 52-bit long (exact in a
    double, so hash -> (0,1) division is bit-identical cross-engine)."""
    from frontmatter_mcp_spark.operators.sampling import _HEX

    val = F.lit(0).cast("long")
    for i in range(1, 14):
        val = val * 16 + (F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1)
    return val

def _kmv_fold_sql(h: str) -> str:
    from frontmatter_mcp_spark.operators.sampling import _HEX

    expr = "CAST(0 AS BIGINT)"
    for i in range(1, 14):
        expr = f"({expr}) * 16 + (strpos('{_HEX}', substr({h}, {i}, 1)) - 1)"
    return f"({expr})"

def _kmv_sql(k: int = _KMV_K, ref: str = _KMV_REF_LANG) -> str:
    two52 = float(2**52)
    return f"""
    WITH wh AS MATERIALIZED (
      SELECT DISTINCT lang, md5(t) AS h FROM (
        SELECT lang,
               unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                      x -> x <> '')) AS t
        FROM documents
      ) WHERE regexp_matches(t, '^[a-z]+$')
    ),
    ex AS MATERIALIZED (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM wh GROUP BY lang
    ),
    sk AS MATERIALIZED (
      SELECT lang, h FROM (
        SELECT lang, h, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rn
        FROM wh
      ) WHERE rn <= {k}
    ),
    side AS MATERIALIZED (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS scnt, MAX(h) AS smax
      FROM sk GROUP BY lang
    ),
    pairu AS MATERIALIZED (
      SELECT pl, h FROM (
        SELECT lang AS pl, h FROM sk WHERE lang <> '{ref}'
        UNION
        SELECT o.lang AS pl, s.h
        FROM sk s CROSS JOIN (SELECT lang FROM ex WHERE lang <> '{ref}') o
        WHERE s.lang = '{ref}'
      )
    ),
    ustats AS MATERIALIZED (
      SELECT pl, CAST(COUNT(*) AS BIGINT) AS ucnt, MAX(h) AS theta_h FROM (
        SELECT pl, h, ROW_NUMBER() OVER (PARTITION BY pl ORDER BY h) AS rn
        FROM pairu
      ) WHERE rn <= {k} GROUP BY pl
    ),
    common AS MATERIALIZED (
      SELECT b.lang AS pl, b.h
      FROM (SELECT h FROM sk WHERE lang = '{ref}') a
      JOIN (SELECT lang, h FROM sk WHERE lang <> '{ref}') b ON b.h = a.h
    ),
    cstats AS MATERIALIZED (
      SELECT u.pl,
             CAST(COALESCE(SUM(CASE WHEN u.ucnt < {k} OR c.h < u.theta_h
                                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS ccnt
      FROM ustats u LEFT JOIN common c ON c.pl = u.pl
      GROUP BY u.pl
    ),
    exinter AS MATERIALIZED (
      SELECT b.lang AS pl, CAST(COUNT(*) AS BIGINT) AS xi
      FROM (SELECT h FROM wh WHERE lang = '{ref}') a
      JOIN (SELECT lang, h FROM wh WHERE lang <> '{ref}') b ON b.h = a.h
      GROUP BY b.lang
    )
    SELECT u.pl AS lang_b,
           ea.n AS n_a, eb.n AS n_b, COALESCE(xi.xi, 0) AS inter_exact,
           round(CASE WHEN sa.scnt = {k}
                 THEN ({k} - 1) / ({_kmv_fold_sql('sa.smax')} / {two52})
                 ELSE CAST(sa.scnt AS DOUBLE) END, 4) AS est_a,
           round(CASE WHEN sb.scnt = {k}
                 THEN ({k} - 1) / ({_kmv_fold_sql('sb.smax')} / {two52})
                 ELSE CAST(sb.scnt AS DOUBLE) END, 4) AS est_b,
           round(CASE WHEN u.ucnt = {k}
                 THEN ({k} - 1) / ({_kmv_fold_sql('u.theta_h')} / {two52})
                 ELSE CAST(u.ucnt AS DOUBLE) END, 4) AS union_est,
           round(CASE WHEN u.ucnt = {k}
                 THEN cs.ccnt / ({_kmv_fold_sql('u.theta_h')} / {two52})
                 ELSE CAST(cs.ccnt AS DOUBLE) END, 4) AS inter_est,
           round(CAST(COALESCE(xi.xi, 0) AS DOUBLE)
                 / (ea.n + eb.n - COALESCE(xi.xi, 0)), 6) AS jaccard_exact
    FROM ustats u
    JOIN cstats cs ON cs.pl = u.pl
    JOIN side sa ON sa.lang = '{ref}'
    JOIN side sb ON sb.lang = u.pl
    JOIN ex ea ON ea.lang = '{ref}'
    JOIN ex eb ON eb.lang = u.pl
    LEFT JOIN exinter xi ON xi.pl = u.pl
    ORDER BY lang_b
    """


@register(
    "q166_kmv_setops",
    _kmv_sql(),
    doc="KMV/bottom-k (theta) sketch set operations: per-language "
    "vocabulary sketches are the k lexicographically-smallest md5s "
    "(hex order IS 128-bit numeric order, so selection never leaves "
    "strings); union sketch = bottom-k of the merged sketches, distinct "
    "estimate = (k-1)/theta with theta folded to 52 bits (exact in a "
    "double, bit-identical division cross-engine), and the DIRECT "
    "intersection estimate = common sketch hashes under theta / theta — "
    "the operation HLL inclusion-exclusion (q160) can only approximate "
    "by compounding two errors. Exact counts ride along as calibration "
    "columns (the q82 pattern). Sketch build is one window top-k per "
    "side over the distinct-token table; everything after operates on "
    "k-row sketches — at 100 TB the sketches are partial-aggregable "
    "and the exact calibration columns are the part you would drop",
)
def q166_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    k, ref = _KMV_K, _KMV_REF_LANG
    two52 = float(2**52)
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    wh = pin(
        d.select("lang", F.explode(toks).alias("t"))
        .filter(F.col("t").rlike("^[a-z]+$"))
        .select("lang", F.md5("t").alias("h"))
        .distinct()
    )
    ex = wh.groupBy("lang").agg(F.count("*").cast("long").alias("n"))
    win = Window.partitionBy("lang").orderBy("h")
    sk = pin(
        wh.withColumn("rn", F.row_number().over(win)).filter(F.col("rn") <= k)
        .select("lang", "h")
    )
    side = sk.groupBy("lang").agg(
        F.count("*").cast("long").alias("scnt"), F.max("h").alias("smax")
    )
    others = ex.filter(F.col("lang") != ref).select(F.col("lang").alias("pl"))
    pairu = (
        sk.filter(F.col("lang") != ref)
        .select(F.col("lang").alias("pl"), "h")
        .union(
            sk.filter(F.col("lang") == ref)
            .crossJoin(F.broadcast(others))
            .select("pl", "h")
        )
        .distinct()
    )
    uwin = Window.partitionBy("pl").orderBy("h")
    ustats = (
        pairu.withColumn("rn", F.row_number().over(uwin)).filter(F.col("rn") <= k)
        .groupBy("pl")
        .agg(F.count("*").cast("long").alias("ucnt"), F.max("h").alias("theta_h"))
    )
    common = (
        sk.filter(F.col("lang") == ref)
        .select("h")
        .join(sk.filter(F.col("lang") != ref).select(F.col("lang").alias("pl"), "h"), "h")
    )
    cstats = (
        ustats.join(F.broadcast(common), "pl", "left")
        .groupBy("pl", "ucnt", "theta_h")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("ucnt") < k) | (F.col("h") < F.col("theta_h")), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("ccnt")
        )
    )
    exinter = (
        wh.filter(F.col("lang") == ref)
        .select("h")
        .join(wh.filter(F.col("lang") != ref).select(F.col("lang").alias("pl"), "h"), "h")
        .groupBy("pl")
        .agg(F.count("*").cast("long").alias("xi"))
    )

    def est(scnt, smax):
        return F.round(
            F.when(
                scnt == k, (k - 1) / (_kmv_fold_spark(smax) / F.lit(two52))
            ).otherwise(scnt.cast("double")),
            4,
        )

    sa = F.broadcast(side.filter(F.col("lang") == ref).select(
        F.col("scnt").alias("scnt_a"), F.col("smax").alias("smax_a")
    ))
    sb = side.select(
        F.col("lang").alias("pl"),
        F.col("scnt").alias("scnt_b"),
        F.col("smax").alias("smax_b"),
    )
    ea = F.broadcast(ex.filter(F.col("lang") == ref).select(F.col("n").alias("n_a")))
    eb = ex.select(F.col("lang").alias("pl"), F.col("n").alias("n_b"))
    return (
        cstats.join(F.broadcast(sb), "pl")
        .join(F.broadcast(eb), "pl")
        .join(F.broadcast(exinter), "pl", "left")
        .crossJoin(sa)
        .crossJoin(ea)
        .select(
            F.col("pl").alias("lang_b"),
            "n_a",
            "n_b",
            F.coalesce("xi", F.lit(0)).cast("long").alias("inter_exact"),
            est(F.col("scnt_a"), F.col("smax_a")).alias("est_a"),
            est(F.col("scnt_b"), F.col("smax_b")).alias("est_b"),
            est(F.col("ucnt"), F.col("theta_h")).alias("union_est"),
            F.round(
                F.when(
                    F.col("ucnt") == k,
                    F.col("ccnt") / (_kmv_fold_spark(F.col("theta_h")) / F.lit(two52)),
                ).otherwise(F.col("ccnt").cast("double")),
                4,
            ).alias("inter_est"),
            F.round(
                F.coalesce("xi", F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce("xi", F.lit(0))),
                6,
            ).alias("jaccard_exact"),
        )
        .orderBy("lang_b")
    )

_HSQ_PS = [0.25, 0.5, 0.75, 0.9375]  # binary fractions: interpolation exact

def _hsq_sql() -> str:
    b = _hash_bucket_duck("doc_id")
    est_cols = ", ".join(
        f"quantile_cont(n_chars, {p!r}) FILTER (WHERE {b} < {_HSQ_RATE}) AS est_p{i}"
        for i, p in enumerate(_HSQ_PS)
    )
    ex_cols = ", ".join(
        f"quantile_cont(n_chars, {p!r}) AS ex_p{i}" for i, p in enumerate(_HSQ_PS)
    )
    err_cols = ", ".join(
        f"round(abs(est_p{i} - ex_p{i}), 4) AS err_p{i}" for i in range(len(_HSQ_PS))
    )
    out_cols = ", ".join(
        f"round(est_p{i}, 4) AS est_p{i}, round(ex_p{i}, 4) AS exact_p{i}"
        for i in range(len(_HSQ_PS))
    )
    return f"""
    WITH stats AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(COUNT(*) FILTER (WHERE {b} < {_HSQ_RATE}) AS BIGINT) AS n_sample,
             {est_cols},
             {ex_cols}
      FROM documents GROUP BY source
    )
    SELECT source, n_total, n_sample, {out_cols}, {err_cols}
    FROM stats ORDER BY source
    """


@register(
    "q170_hash_sample_quantiles",
    _hsq_sql(),
    doc="engine-portable distributed quantile summary: a deterministic "
    "5% md5-bucket Bernoulli sample per source (mergeable — the union "
    "of per-partition samples is the sample of the union, the property "
    "that makes it a summary and not just a sample) feeding exact "
    "interpolated quantiles at binary fractions, reported against the "
    "full-data truth with absolute errors. Complements q27: that "
    "checks Spark's own approx_percentile within published bounds "
    "(rows-only hash); this one hash-verifies EXACTLY because both "
    "engines draw the identical sample. One scan, one map-side-"
    "combined aggregate; at 100 TB the sample aggregate is the only "
    "memory-resident state and the exact columns are the part you drop",
)
def q170_hash_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    in_sample = hash_bucket(F.col("doc_id"), 1000) < _HSQ_RATE
    aggs = [
        F.count("*").cast("long").alias("n_total"),
        F.sum(in_sample.cast("long")).cast("long").alias("n_sample"),
    ]
    sampled = F.when(in_sample, F.col("n_chars"))
    for i, p in enumerate(_HSQ_PS):
        aggs.append(F.percentile(sampled, F.lit(p)).alias(f"est_raw{i}"))
        aggs.append(F.percentile("n_chars", F.lit(p)).alias(f"ex_raw{i}"))
    stats = d.groupBy("source").agg(*aggs)
    cols = ["source", "n_total", "n_sample"]
    for i in range(len(_HSQ_PS)):
        cols.append(F.round(F.col(f"est_raw{i}"), 4).alias(f"est_p{i}"))
        cols.append(F.round(F.col(f"ex_raw{i}"), 4).alias(f"exact_p{i}"))
    for i in range(len(_HSQ_PS)):
        cols.append(
            F.round(F.abs(F.col(f"est_raw{i}") - F.col(f"ex_raw{i}")), 4).alias(
                f"err_p{i}"
            )
        )
    return stats.select(*cols).orderBy("source")

# ---------------------------------------------------------------------------
# q175 — novelty rate: the memorization-risk metric beside q60's
# decontamination DECISION — for every held-out document, what fraction
# of its 8-token windows never occurs in the training split
# ---------------------------------------------------------------------------
_NOV_N = 8

def _novelty_sql(n: int = _NOV_N) -> str:
    b = _hash_bucket_duck("doc_id")
    return f"""
    WITH toks AS (
      SELECT doc_id, {b} AS bucket, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ),
    sp AS (
      SELECT doc_id, bucket,
             md5(array_to_string(w[i : i + {n - 1}], ' ')) AS fp
      FROM toks, UNNEST(generate_series(1, len(w) - {n - 1})) AS t(i)
      WHERE len(w) >= {n}
    ),
    train_fp AS (SELECT DISTINCT fp FROM sp WHERE bucket < 800),
    test_sp AS (SELECT doc_id, fp FROM sp WHERE bucket >= 900),
    scored AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(SUM(CASE WHEN tr.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
      FROM test_sp t LEFT JOIN train_fp tr ON tr.fp = t.fp
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_windows, n_novel,
           ROUND(CAST(n_novel AS DOUBLE) / n_windows, 6) AS novelty_rate
    FROM scored ORDER BY doc_id
    """


@register(
    "q175_novelty_rate",
    _novelty_sql(),
    doc="memorization-risk novelty rate: every 8-token window of every "
    "held-out (hash-bucket >= 900) document checked against the "
    "distinct window set of the training split (bucket < 800) — "
    "novelty = the fraction a model could not have copied verbatim. "
    "q60 makes the binary keep/drop decision; this measures HOW novel "
    "each eval document is (near-zero rates flag eval sets that leak). "
    "Windows md5 to 32 bytes BEFORE the shuffle, the train set "
    "deduplicates before the join, and the test side is a ~10% slice — "
    "the anti-join shape (left join + NULL count) carries O(test "
    "windows + distinct train windows), never the corpus pair product",
)
def q175_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    n = _NOV_N
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = d.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), 1000).alias("bucket"),
        F.split(F.trim(F.col("text")), r"\s+", -1).alias("w"),
    )
    sp = (
        toks.filter(F.size("w") >= n)
        .select(
            "doc_id",
            "bucket",
            F.explode(F.sequence(F.lit(1), F.size("w") - (n - 1))).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            "bucket",
            F.md5(F.array_join(F.slice("w", F.col("i"), n), " ")).alias("fp"),
        )
    )
    sp = pin(sp)
    train_fp = sp.filter(F.col("bucket") < 800).select("fp").distinct()
    test_sp = sp.filter(F.col("bucket") >= 900).select("doc_id", "fp")
    scored = (
        test_sp.join(
            train_fp.withColumn("seen", F.lit(1)), "fp", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return scored.select(
        "doc_id",
        "n_windows",
        "n_novel",
        F.round(F.col("n_novel").cast("double") / F.col("n_windows"), 6).alias(
            "novelty_rate"
        ),
    ).orderBy("doc_id")

# ---------------------------------------------------------------------------
# q184 — equi-depth histogram (the optimizer-statistics histogram Spark
# and every warehouse actually keeps — q140 built the equi-WIDTH kind):
# per numeric column, 8 boundaries at binary-fraction percentiles and
# the realized bucket occupancy (ties make real equi-depth buckets
# unequal — the report shows exactly how unequal)
# ---------------------------------------------------------------------------
_EQD_PS = [i / 8 for i in range(1, 9)]  # binary fractions: exact cross-engine

_EQD_COLS = ["l_quantity", "l_extendedprice", "l_discount"]

def _equidepth_sql() -> str:
    ps = ", ".join(repr(p) for p in _EQD_PS)
    unpivot = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS DOUBLE) AS val FROM lineitem"
        for c in _EQD_COLS
    )
    return f"""
    WITH vals AS MATERIALIZED ({unpivot}),
    bnds AS MATERIALIZED (
      SELECT col, quantile_cont(val, [{ps}]) AS b FROM vals GROUP BY col
    ),
    bucketed AS (
      SELECT v.col, len(list_filter(b.b, x -> x < v.val)) + 1 AS bucket, b.b
      FROM vals v JOIN bnds b ON b.col = v.col
    )
    SELECT col, CAST(bucket AS INT) AS bucket,
           ROUND(CASE WHEN bucket = 1 THEN NULL ELSE b[bucket - 1] END, 6) AS lo,
           ROUND(b[bucket], 6) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM bucketed
    GROUP BY col, bucket, b
    ORDER BY col, bucket
    """


@register(
    "q184_equidepth_histogram",
    _equidepth_sql(),
    doc="equi-depth histogram for optimizer statistics: per numeric "
    "lineitem column, boundaries at the 1/8..8/8 percentiles (binary "
    "fractions, so Spark percentile == DuckDB quantile_cont bit-"
    "exactly) and the realized occupancy per bucket — heavy value ties "
    "(l_quantity has 50 distinct values) visibly overfill buckets, "
    "which is the property selectivity estimators must model. Two "
    "passes over one unpivoted scan: a per-column percentile aggregate "
    "(3 groups), boundaries broadcast back, bucket index = count of "
    "boundaries strictly below the value (an 8-element array scan in "
    "codegen), map-side-combined occupancy count",
)
def q184_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    vals = None
    for c in _EQD_COLS:
        part = li.select(
            F.lit(c).alias("col"), F.col(c).cast("double").alias("val")
        )
        vals = part if vals is None else vals.unionAll(part)
    vals = pin(vals)
    bnds = vals.groupBy("col").agg(
        F.percentile("val", F.array(*[F.lit(p) for p in _EQD_PS])).alias("b")
    )
    bucketed = vals.join(F.broadcast(bnds), "col").select(
        "col",
        (F.size(F.filter("b", lambda x: x < F.col("val"))) + 1).alias("bucket"),
        "b",
    )
    return (
        bucketed.groupBy("col", "bucket", "b")
        .agg(F.count("*").cast("long").alias("n_rows"))
        .select(
            "col",
            F.col("bucket").cast("int").alias("bucket"),
            F.round(
                F.when(
                    F.col("bucket") > 1, F.element_at("b", F.col("bucket") - 1)
                ),
                6,
            ).alias("lo"),
            F.round(F.element_at("b", F.col("bucket")), 6).alias("hi"),
            "n_rows",
        )
        .orderBy("col", "bucket")
    )

# ---------------------------------------------------------------------------
# q246 — sketch ROLLUP up the time hierarchy: per-day HLL registers of
# distinct users merged into monthly and total registers by
# elementwise MAX — months and the grand total cost NO rescan of the
# events table, the exact warehouse pattern that makes sketches (not
# counts) the thing you materialize. Exact audit columns ride along
# ---------------------------------------------------------------------------
def _hll_rollup_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    idx = hash_bucket_sql("t", _HLL_M)
    v = "CAST(0 AS BIGINT)"
    for i in range(8, 20):
        v = (
            f"({v}) * 16 + (strpos('0123456789abcdef', "
            f"substr(md5(CAST(t AS VARCHAR)), {i}, 1)) - 1)"
        )
    rho = (
        f"CASE WHEN ({v}) = 0 THEN {_HLL_RHO_BITS + 1} "
        f"ELSE {_HLL_RHO_BITS} - length(bin({v})) + 1 END"
    )
    est = _hll_estimate_expr("s.sum_fx", "s.zeros")
    lvl_sum = f"""
      SELECT period,
             CAST(SUM(CAST(POW(2, 49 - rho) AS BIGINT)) AS BIGINT)
               + CAST(({_HLL_M} - COUNT(*)) AS BIGINT) * {_HLL_FX} AS sum_fx,
             CAST({_HLL_M} - COUNT(*) AS INT) AS zeros
    """
    return f"""
    WITH items AS (
      SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) AS day, user_id AS t
      FROM events
    ),
    dayregs AS (
      SELECT day, {idx} AS reg, CAST(MAX({rho}) AS INT) AS rho
      FROM items GROUP BY 1, 2
    ),
    daysum AS ({lvl_sum.replace('period', "strftime(day, '%Y-%m-%d') AS period")}
      FROM dayregs GROUP BY day),
    monregs AS (
      SELECT strftime(day, '%Y-%m') AS mon, reg, CAST(MAX(rho) AS INT) AS rho
      FROM dayregs GROUP BY 1, 2
    ),
    monsum AS ({lvl_sum.replace('period', 'mon AS period')}
      FROM monregs GROUP BY mon),
    totregs AS (SELECT reg, CAST(MAX(rho) AS INT) AS rho
                FROM dayregs GROUP BY 1),
    totsum AS ({lvl_sum.replace('period', "'ALL' AS period")}
      FROM totregs GROUP BY 1=1),
    dayex AS (SELECT strftime(day, '%Y-%m-%d') AS period,
                     CAST(COUNT(DISTINCT t) AS BIGINT) AS n_exact
              FROM items GROUP BY 1),
    monex AS (SELECT strftime(day, '%Y-%m') AS period,
                     CAST(COUNT(DISTINCT t) AS BIGINT) AS n_exact
              FROM items GROUP BY 1),
    totex AS (SELECT 'ALL' AS period,
                     CAST(COUNT(DISTINCT t) AS BIGINT) AS n_exact FROM items),
    lv AS (
      SELECT 'day' AS level, s.period, s.sum_fx, s.zeros, e.n_exact
      FROM daysum s JOIN dayex e USING (period)
      UNION ALL
      SELECT 'month', s.period, s.sum_fx, s.zeros, e.n_exact
      FROM monsum s JOIN monex e USING (period)
      UNION ALL
      SELECT 'total', s.period, s.sum_fx, s.zeros, e.n_exact
      FROM totsum s JOIN totex e USING (period)
    )
    SELECT level, period, n_exact, s.zeros, s.sum_fx,
           {est} AS estimate,
           ABS({est} - n_exact) / n_exact <= 0.39 AS within_3sigma
    FROM lv s
    ORDER BY level, period
    """


@register(
    "q246_hll_time_rollup",
    _hll_rollup_sql(),
    doc="mergeable-sketch rollup: per-day HLL registers of distinct "
    "users (q136's deterministic md5 construction), merged into "
    "monthly and grand-total registers by elementwise MAX — the "
    "month/total estimates NEVER rescan events, which is the entire "
    "reason a warehouse materializes sketches instead of counts "
    "(distincts don't add; registers do merge). Exact per-level "
    "audits and 3-sigma bounds ride along as the columns a real "
    "deployment drops. One events scan, day-register state is "
    "|days| x 64 integers",
)
def q246_hll_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    e = load_table(spark, sf_dir, "events")
    items = hold(
        e.select(
            F.date_trunc("day", "ts").alias("day"), F.col("user_id").alias("t")
        ).distinct()
    )
    h = F.md5(F.col("t").cast("string"))
    v = F.lit(0).cast("long")
    for i in range(8, 20):
        v = v * 16 + (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1
        )
    rho = F.when(v == 0, F.lit(_HLL_RHO_BITS + 1)).otherwise(
        F.lit(_HLL_RHO_BITS) - F.length(F.bin(v)) + 1
    )
    dayregs = hold(
        items.select(
            "day", hash_bucket(F.col("t"), _HLL_M).alias("reg"), rho.alias("__rho")
        )
        .groupBy("day", "reg")
        .agg(F.max("__rho").cast("int").alias("rho"))
    )

    def lvl_sum(regs, period_col):
        return regs.groupBy(period_col.alias("period")).agg(
            (
                F.sum(
                    F.pow(F.lit(2), F.lit(49) - F.col("rho")).cast("long")
                ).cast("long")
                + (F.lit(_HLL_M) - F.count("*")).cast("long") * F.lit(_HLL_FX)
            ).alias("sum_fx"),
            (F.lit(_HLL_M) - F.count("*")).cast("int").alias("zeros"),
        )

    daysum = lvl_sum(dayregs, F.date_format("day", "yyyy-MM-dd"))
    monregs = dayregs.groupBy(
        F.date_format("day", "yyyy-MM").alias("mon"), "reg"
    ).agg(F.max("rho").cast("int").alias("rho"))
    monsum = lvl_sum(monregs, F.col("mon"))
    totregs = dayregs.groupBy("reg").agg(F.max("rho").cast("int").alias("rho"))
    totsum = lvl_sum(totregs.withColumn("k", F.lit("ALL")), F.col("k"))
    dayex = items.groupBy(
        F.date_format("day", "yyyy-MM-dd").alias("period")
    ).agg(F.countDistinct("t").cast("long").alias("n_exact"))
    monex = items.groupBy(
        F.date_format("day", "yyyy-MM").alias("period")
    ).agg(F.countDistinct("t").cast("long").alias("n_exact"))
    totex = items.agg(
        F.lit("ALL").alias("period"),
        F.countDistinct("t").cast("long").alias("n_exact"),
    )
    lv = (
        daysum.join(dayex, "period").withColumn("level", F.lit("day"))
        .unionByName(
            monsum.join(monex, "period").withColumn("level", F.lit("month"))
        )
        .unionByName(
            totsum.join(totex, "period").withColumn("level", F.lit("total"))
        )
    )
    m = _HLL_M
    raw = (
        F.lit(0.7213 / (1.0 + 1.079 / m))
        * m
        * m
        / (F.col("sum_fx").cast("double") / float(_HLL_FX))
    )
    est = F.round(
        F.when(
            (raw <= 2.5 * m) & (F.col("zeros") > 0),
            m * F.log(F.lit(float(m)) / F.col("zeros")),
        ).otherwise(raw),
        4,
    )
    return lv.select(
        "level",
        "period",
        "n_exact",
        "zeros",
        "sum_fx",
        est.alias("estimate"),
        (F.abs(est - F.col("n_exact")) / F.col("n_exact") <= 0.39).alias(
            "within_3sigma"
        ),
    ).orderBy("level", "period")

# ---------------------------------------------------------------------------
# q256 — diminishing-novelty curve: simulate ingesting the corpus in
# ten deterministic waves and measure, per wave, how many documents
# are content-NOVEL vs already seen in earlier waves — the marginal
# value-of-more-data curve that decides when another crawl batch
# stops paying (doc-level complement of q175's n-gram novelty)
# ---------------------------------------------------------------------------
def _novelty_curve_sql() -> str:
    b = _hash_bucket_duck("doc_id", 10)
    return f"""
    WITH t AS (
      SELECT doc_id, md5(text) AS fp, {b} AS wave FROM documents
    ),
    firsts AS (
      SELECT fp, MIN(wave * 10000000000 + doc_id) AS fk FROM t GROUP BY fp
    ),
    marked AS (
      SELECT t.wave,
             CASE WHEN t.wave * 10000000000 + t.doc_id = f.fk
                  THEN 1 ELSE 0 END AS novel
      FROM t JOIN firsts f ON f.fp = t.fp
    ),
    per AS (
      SELECT wave, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(novel) AS BIGINT) AS n_novel
      FROM marked GROUP BY 1
    )
    SELECT CAST(wave AS INT) AS wave, n_docs, n_novel,
           ROUND(1e0 - CAST(n_novel AS DOUBLE) / n_docs, 6) AS dup_rate,
           CAST(SUM(n_novel) OVER (ORDER BY wave
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_unique
    FROM per ORDER BY wave
    """


@register(
    "q256_novelty_curve",
    _novelty_curve_sql(),
    doc="ingestion-wave novelty curve: documents assigned to ten "
    "deterministic md5 waves, each content fingerprint credited as "
    "novel exactly once — at its first (wave, doc_id) occurrence "
    "(one integer composite key, collision-free since doc_id < 1e10) "
    "— yielding per-wave dup rates and the cumulative unique count. "
    "A flattening cum_unique curve is the 'more crawl buys less' "
    "signal that caps acquisition spend. One fingerprint aggregate + "
    "one join; the curve is 10 rows",
)
def q256_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.md5("text").alias("fp"),
        hash_bucket(F.col("doc_id"), 10).alias("wave"),
    )
    key = F.col("wave").cast("long") * 10_000_000_000 + F.col("doc_id")
    firsts = t.select("fp", key.alias("k")).groupBy("fp").agg(
        F.min("k").alias("fk")
    )
    marked = t.join(firsts, "fp").select(
        "wave", (key == F.col("fk")).cast("int").alias("novel")
    )
    per = marked.groupBy("wave").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("novel").cast("long").alias("n_novel"),
    )
    return per.select(
        F.col("wave").cast("int").alias("wave"),
        "n_docs",
        "n_novel",
        F.round(1.0 - F.col("n_novel").cast("double") / F.col("n_docs"), 6).alias(
            "dup_rate"
        ),
        F.sum("n_novel")
        .over(W.orderBy("wave").rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_unique"),
    ).orderBy("wave")

# ---------------------------------------------------------------------------
# q259 — Misra-Gries frequent-items summaries, the FOURTH sketch family
# (beside CMS q132, HLL q136, KMV q166) — and the one whose summary
# CONTENTS depend on processing order, which is why it was deferred:
# the cross-engine answer is to PIN the order. Per doc-hash bucket
# (the map-side substream), a weighted MG fold over that bucket's
# token-bigram histogram in bigram order; then one merge fold over the
# per-bucket summaries in (bucket, bigram) order. Every step is the
# classic insert: bump on match, append under capacity, else subtract
# the (k+1)-entry minimum from all and drop zeros — identical branch
# logic on both engines, so the summaries are bit-identical. Merging
# valid sub-summaries preserves the MG guarantee with the error budget
# doubled: est <= true <= est + 2N/(k+1) (Agarwal et al., Mergeable
# Summaries) — both bounds ride along as hash-checked booleans against
# the exact counts.
# ---------------------------------------------------------------------------
_MG_K = 16  # summary capacity

_MG_BUCKETS = 16  # map-side substreams

def _mg_insert_duck(S: str, xt: str, xc: str) -> str:
    ap = f"list_append({S}, struct_pack(t := {xt}, c := {xc}))"
    delta = f"list_aggregate(list_transform({ap}, z -> z.c), 'min')"
    return f"""CASE
      WHEN len(list_filter({S}, e -> e.t = {xt})) > 0
      THEN list_transform({S}, e -> CASE WHEN e.t = {xt}
             THEN struct_pack(t := e.t, c := e.c + {xc}) ELSE e END)
      WHEN len({S}) < {_MG_K} THEN {ap}
      ELSE list_filter(list_transform({ap},
             e -> struct_pack(t := e.t, c := e.c - {delta})), e -> e.c > 0)
    END"""

def _mg_insert_col(S, x, k: int):
    """Weighted Misra-Gries insert as a Catalyst array-fold step: bump on
    match, append under capacity, else subtract the (k+1)-entry minimum
    from all and drop zeros — the exact column-side twin of
    :func:`_mg_insert_duck` (shared by q259's batch folds and q314's
    streaming-summary merge)."""
    matched = F.exists(S, lambda e: e["t"] == x["t"])
    bumped = F.transform(
        S,
        lambda e: F.when(
            e["t"] == x["t"],
            F.struct(e["t"].alias("t"), (e["c"] + x["c"]).alias("c")),
        ).otherwise(e),
    )
    ap = F.concat(S, F.array(F.struct(x["t"].alias("t"), x["c"].alias("c"))))
    delta = F.array_min(F.transform(ap, lambda z: z["c"]))
    dec = F.filter(
        F.transform(
            ap,
            lambda e: F.struct(e["t"].alias("t"), (e["c"] - delta).alias("c")),
        ),
        lambda e: e["c"] > 0,
    )
    return F.when(matched, bumped).when(F.size(S) < k, ap).otherwise(dec)

def _mg_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    bucket = hash_bucket_sql("doc_id", _MG_BUCKETS)
    empty = "CAST([] AS STRUCT(t VARCHAR, c BIGINT)[])"
    kp1 = _MG_K + 1
    return f"""
    WITH RECURSIVE toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    grams AS MATERIALIZED (
      SELECT {bucket} AS bucket, w[i] || ' ' || w[i+1] AS t
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS g(i)
      WHERE len(w) >= 2
    ),
    hist AS MATERIALIZED (SELECT bucket, t, CAST(COUNT(*) AS BIGINT) AS c
             FROM grams GROUP BY 1, 2),
    items AS MATERIALIZED (
      SELECT bucket, t, c,
             CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY t) AS INT)
               AS idx
      FROM hist
    ),
    fold AS (
      SELECT DISTINCT bucket, 0 AS i, {empty} AS S FROM items
      UNION ALL
      SELECT f.bucket, f.i + 1, {_mg_insert_duck("f.S", "x.t", "x.c")}
      FROM fold f JOIN items x ON x.bucket = f.bucket AND x.idx = f.i + 1
    ),
    bsum AS (
      SELECT f.bucket, f.S
      FROM fold f
      JOIN (SELECT bucket, MAX(idx) AS mx FROM items GROUP BY 1) m
        ON m.bucket = f.bucket AND f.i = m.mx
    ),
    entries AS (
      SELECT bucket, unnest(S) AS e FROM bsum
    ),
    mitems AS MATERIALIZED (
      SELECT e.t AS t, e.c AS c,
             CAST(ROW_NUMBER() OVER (ORDER BY bucket, e.t) AS INT) AS idx
      FROM entries
    ),
    mfold AS (
      SELECT 0 AS i, {empty} AS S
      UNION ALL
      SELECT f.i + 1, {_mg_insert_duck("f.S", "x.t", "x.c")}
      FROM mfold f JOIN mitems x ON x.idx = f.i + 1
    ),
    final AS (
      SELECT S FROM mfold WHERE i = (SELECT MAX(idx) FROM mitems)
    ),
    summ AS (SELECT unnest(S) AS e FROM final),
    truth AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS true_c
              FROM grams GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM grams)
    SELECT s.e.t AS gram, s.e.c AS est_c, tr.true_c,
           CAST((2 * tot.n) // {kp1} AS BIGINT) AS err_bound,
           CAST(s.e.c <= tr.true_c AS INT) AS lower_ok,
           CAST(tr.true_c - s.e.c <= (2 * tot.n) // {kp1} AS INT) AS upper_ok,
           CAST(s.e.c > tot.n // {kp1} AS INT) AS guaranteed_frequent,
           CAST(ROW_NUMBER() OVER (ORDER BY s.e.c DESC, s.e.t) AS INT) AS rank
    FROM summ s JOIN truth tr ON tr.t = s.e.t CROSS JOIN tot
    ORDER BY rank
    """


@register(
    "q259_misra_gries",
    _mg_sql(),
    doc="mergeable Misra-Gries frequent-bigram summaries with a PINNED "
    "merge order: per doc-hash bucket a weighted MG(k=16) fold over the "
    "bucket's bigram histogram in bigram order (the map-side summary an "
    "executor computes per partition at 100 TB without holding the "
    "vocabulary), then one merge fold over the 16 bucket summaries in "
    "(bucket, bigram) order — contents of an MG summary depend on "
    "processing order, so pinning both folds makes the whole sketch "
    "bit-identical across engines, which HLL/CMS/KMV got for free from "
    "order-independence. Two-level merging doubles the error budget: "
    "est <= true <= est + 2N/(k+1), both asserted as hash-checked "
    "booleans against the exact histogram (q166's calibration "
    "discipline). On this deliberately flat synthetic corpus nothing "
    "clears the N/(k+1) guaranteed-frequent bar — the flag column "
    "shows it honestly; on a Zipfian stream the same plan surfaces the "
    "head. Corpus work: one explode + one (bucket, bigram) aggregate; "
    "each fold is O(distinct items) with a <=k-entry accumulator",
)
def q259_misra_gries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    k = _MG_K

    def insert(S, x):
        return _mg_insert_col(S, x, k)

    empty = F.array().cast("array<struct<t:string,c:bigint>>")
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    toks = d.select(
        hash_bucket(F.col("doc_id"), _MG_BUCKETS).alias("bucket"), w.alias("w")
    ).filter(F.size("w") >= 2)
    grams = hold(
        toks.select(
            "bucket",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 1),
                    lambda i: F.concat(
                        F.element_at(F.col("w"), i.cast("int")),
                        F.lit(" "),
                        F.element_at(F.col("w"), (i + 1).cast("int")),
                    ),
                )
            ).alias("t"),
        )
    )
    hist = grams.groupBy("bucket", "t").agg(F.count("*").cast("long").alias("c"))
    per_bucket = hist.groupBy("bucket").agg(
        F.sort_array(F.collect_list(F.struct("t", "c"))).alias("items")
    )
    bsum = per_bucket.select(
        "bucket", F.aggregate("items", empty, insert).alias("S")
    )
    entries = bsum.select("bucket", F.explode("S").alias("e")).select(
        "bucket", F.col("e.t").alias("t"), F.col("e.c").alias("c")
    )
    merged = entries.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("bucket", "t", "c"))),
            lambda s: F.struct(s["t"].alias("t"), s["c"].alias("c")),
        ).alias("mitems")
    ).select(F.aggregate("mitems", empty, insert).alias("S"))
    summ = merged.select(F.explode("S").alias("e")).select(
        F.col("e.t").alias("gram"), F.col("e.c").alias("est_c")
    )
    truth = grams.groupBy("t").agg(F.count("*").cast("long").alias("true_c"))
    tot = grams.agg(F.count("*").cast("long").alias("n"))
    kp1 = k + 1
    return (
        truth.join(F.broadcast(summ), truth["t"] == summ["gram"])
        .crossJoin(F.broadcast(tot))
        .select(
            "gram",
            "est_c",
            "true_c",
            F.expr(f"cast((2 * n) div {kp1} as bigint)").alias("err_bound"),
            (F.col("est_c") <= F.col("true_c")).cast("int").alias("lower_ok"),
            (
                F.col("true_c") - F.col("est_c")
                <= F.expr(f"(2 * n) div {kp1}")
            )
            .cast("int")
            .alias("upper_ok"),
            (F.col("est_c") > F.expr(f"n div {kp1}"))
            .cast("int")
            .alias("guaranteed_frequent"),
            F.row_number()
            .over(W.orderBy(F.col("est_c").desc(), "gram"))
            .cast("int")
            .alias("rank"),
        )
        .orderBy("rank")
    )

def _bloom_fpr_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    wave = hash_bucket_sql("doc_id", 10)
    keys = [hash_bucket_sql(f"fp || '|{i}'", _BLOOM_M) for i in range(_BLOOM_K)]
    pos_rows = " UNION ALL ".join(
        f"SELECT {kexpr} AS pos FROM members" for kexpr in keys
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT fp, {kexpr} AS pos FROM probes" for kexpr in keys
    )
    m, k = _BLOOM_M, _BLOOM_K
    return f"""
    WITH fps AS MATERIALIZED (
      SELECT md5(text) AS fp, {wave} AS wave FROM documents
    ),
    members AS MATERIALIZED (SELECT DISTINCT fp FROM fps WHERE wave < 8),
    probes AS MATERIALIZED (
      SELECT DISTINCT fp FROM fps p WHERE wave >= 8
        AND NOT EXISTS (SELECT 1 FROM members m WHERE m.fp = p.fp)
    ),
    bits AS MATERIALIZED (SELECT DISTINCT pos FROM ({pos_rows})),
    pp AS (SELECT DISTINCT fp, pos FROM ({probe_pos})),
    hits AS (
      SELECT pp.fp, CAST(COUNT(b.pos) AS BIGINT) AS nhit,
             CAST(COUNT(*) AS BIGINT) AS npos
      FROM pp LEFT JOIN bits b ON b.pos = pp.pos
      GROUP BY pp.fp
    ),
    agg AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM members) AS n_members,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set,
             CAST(COUNT(*) AS BIGINT) AS n_probes,
             CAST(SUM(CASE WHEN nhit = npos THEN 1 ELSE 0 END) AS BIGINT)
               AS false_positives
      FROM hits
    )
    SELECT n_members, bits_set, n_probes, false_positives,
           ROUND(CAST(bits_set AS DOUBLE) / {m}, 6) AS fill_ratio,
           ROUND(CAST(false_positives AS DOUBLE) / n_probes, 6)
             AS realized_fpr,
           ROUND(CAST(bits_set AS DOUBLE) / {m}
                 * (CAST(bits_set AS DOUBLE) / {m})
                 * (CAST(bits_set AS DOUBLE) / {m}), 6) AS fill_fpr,
           ROUND((1e0 - exp(-({k}e0 * n_members) / {m}e0))
                 * (1e0 - exp(-({k}e0 * n_members) / {m}e0))
                 * (1e0 - exp(-({k}e0 * n_members) / {m}e0)), 6)
             AS theoretical_fpr
    FROM agg
    """


@register(
    "q269_bloom_fpr_calibration",
    _bloom_fpr_sql(),
    doc="Bloom false-positive audit: an m=4096-bit, k=3 filter built "
    "from md5-derived positions over the existing-corpus fingerprints "
    "(waves 0-7), probed with the genuinely novel wave-8/9 "
    "fingerprints (anti-joined so every probe is a true non-member). "
    "Outputs the set-bit census, realized FPR, the fill-ratio^k exact "
    "upper view, and the textbook (1 - e^(-kn/m))^k — cubes by "
    "multiplication, never pow(); exp's 1-ulp class is absorbed by "
    "the 6-decimal round (q94 discipline). The calibration that sizes "
    "q86's prefilter before anyone trusts its shuffle savings. One "
    "fingerprint scan; every join is on bit positions or fingerprints",
)
def q269_bloom_fpr_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    m, k = _BLOOM_M, _BLOOM_K
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    fps = d.select(
        F.md5("text").alias("fp"), hash_bucket(F.col("doc_id"), 10).alias("wave")
    )
    members = hold(fps.filter(F.col("wave") < 8).select("fp").distinct())
    probes = (
        fps.filter(F.col("wave") >= 8)
        .select("fp")
        .distinct()
        .join(members, "fp", "left_anti")
    )
    pos_of = lambda i: hash_bucket(
        F.concat(F.col("fp"), F.lit(f"|{i}")), m
    ).alias("pos")
    bits = None
    for i in range(k):
        part = members.select(pos_of(i))
        bits = part if bits is None else bits.union(part)
    bits = hold(bits.distinct())
    pp = None
    for i in range(k):
        part = probes.select("fp", pos_of(i))
        pp = part if pp is None else pp.union(part)
    pp = pp.distinct()
    hits = (
        pp.join(
            F.broadcast(bits.withColumnRenamed("pos", "bpos")),
            F.col("pos") == F.col("bpos"),
            "left",
        )
        .groupBy("fp")
        .agg(
            F.count("bpos").cast("long").alias("nhit"),
            F.count("*").cast("long").alias("npos"),
        )
    )
    nm = members.agg(F.count("*").cast("long").alias("n_members"))
    nb = bits.agg(F.count("*").cast("long").alias("bits_set"))
    agg = (
        hits.agg(
            F.count("*").cast("long").alias("n_probes"),
            F.sum(F.when(F.col("nhit") == F.col("npos"), 1).otherwise(0))
            .cast("long")
            .alias("false_positives"),
        )
        .crossJoin(F.broadcast(nm))
        .crossJoin(F.broadcast(nb))
    )
    fill = F.col("bits_set").cast("double") / m
    t = 1.0 - F.exp(-(F.lit(float(k)) * F.col("n_members")) / float(m))
    return agg.select(
        "n_members",
        "bits_set",
        "n_probes",
        "false_positives",
        F.round(fill, 6).alias("fill_ratio"),
        F.round(F.col("false_positives").cast("double") / F.col("n_probes"), 6)
        .alias("realized_fpr"),
        F.round(fill * fill * fill, 6).alias("fill_fpr"),
        F.round(t * t * t, 6).alias("theoretical_fpr"),
    )

# ---------------------------------------------------------------------------
# q274 — Heaps-law fit + crawl extrapolation: q256 measured the
# novelty curve; this PRICES the next crawl — fit unique(n) = K*n^b
# by log-log OLS over the ten cumulative wave points (the q196 OLS
# discipline), then extrapolate to a 10x crawl and report the
# predicted unique yield and marginal novelty rate. The quantified
# "more crawl buys less" answer an acquisition budget actually needs.
# ---------------------------------------------------------------------------
def _heaps_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    wave = hash_bucket_sql("doc_id", 10)
    return f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, md5(text) AS fp, {wave} AS wave FROM documents
    ),
    firsts AS (
      SELECT fp, MIN(CAST(wave AS BIGINT) * 10000000000 + doc_id) AS fk
      FROM t GROUP BY 1
    ),
    marked AS (
      SELECT t.wave,
             CASE WHEN CAST(t.wave AS BIGINT) * 10000000000 + t.doc_id = f.fk
                  THEN 1 ELSE 0 END AS novel
      FROM t JOIN firsts f ON f.fp = t.fp
    ),
    per AS (
      SELECT wave, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(novel) AS BIGINT) AS n_novel
      FROM marked GROUP BY 1
    ),
    curve AS MATERIALIZED (
      SELECT wave,
             CAST(SUM(n_docs) OVER (ORDER BY wave
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_docs,
             CAST(SUM(n_novel) OVER (ORDER BY wave
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_unique
      FROM per
    ),
    pts AS (
      SELECT CAST(ln(CAST(cum_docs AS DOUBLE)) AS DECIMAL(28,12)) AS x,
             CAST(ln(CAST(cum_unique AS DOUBLE)) AS DECIMAL(28,12)) AS y,
             CAST(ln(CAST(cum_docs AS DOUBLE)) * ln(CAST(cum_unique AS DOUBLE))
                  AS DECIMAL(28,12)) AS xy,
             CAST(ln(CAST(cum_docs AS DOUBLE)) * ln(CAST(cum_docs AS DOUBLE))
                  AS DECIMAL(28,12)) AS xx
      FROM curve
    ),
    fit AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(xy) AS DOUBLE) AS sxy, CAST(SUM(xx) AS DOUBLE) AS sxx
      FROM pts
    ),
    co AS MATERIALIZED (
      SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta,
             (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
               AS lnk
      FROM fit
    ),
    tot AS (SELECT MAX(cum_docs) AS nd, MAX(cum_unique) AS nu FROM curve)
    SELECT c.wave AS point, c.cum_docs, c.cum_unique,
           ROUND(exp(co.lnk + co.beta * ln(CAST(c.cum_docs AS DOUBLE))), 4)
             AS fitted_unique,
           ROUND(co.beta, 6) AS heaps_beta
    FROM curve c CROSS JOIN co
    UNION ALL
    SELECT 99 AS point, t.nd * 10 AS cum_docs, NULL AS cum_unique,
           ROUND(exp(co.lnk + co.beta * ln(CAST(t.nd AS DOUBLE) * 10e0)), 4)
             AS fitted_unique,
           ROUND(co.beta, 6) AS heaps_beta
    FROM tot t CROSS JOIN co
    ORDER BY point
    """


@register(
    "q274_heaps_extrapolation",
    _heaps_sql(),
    doc="Heaps-law crawl pricing: the q256 cumulative (docs, unique "
    "fingerprints) curve fitted as unique = K * n^beta by log-log OLS "
    "(DECIMAL-quantized ln terms, q196 discipline), each wave point "
    "reported observed-vs-fitted, plus the point=99 extrapolation row "
    "predicting unique yield at a 10x crawl — beta near 1 means crawl "
    "more, beta near 0 means the well is dry. exp/ln wobble absorbed "
    "by rounding (4 decimals on the fitted counts). One fingerprint "
    "aggregate; the fit runs on ten points",
)
def q274_heaps_extrapolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.md5("text").alias("fp"),
        hash_bucket(F.col("doc_id"), 10).alias("wave"),
    )
    key = F.col("wave").cast("long") * 10_000_000_000 + F.col("doc_id")
    firsts = t.select("fp", key.alias("k")).groupBy("fp").agg(
        F.min("k").alias("fk")
    )
    marked = t.join(firsts, "fp").select(
        "wave", (key == F.col("fk")).cast("int").alias("novel")
    )
    per = marked.groupBy("wave").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("novel").cast("long").alias("n_novel"),
    )
    cw = W.orderBy("wave").rowsBetween(W.unboundedPreceding, 0)
    curve = pin(
        per.select(
            "wave",
            F.sum("n_docs").over(cw).cast("long").alias("cum_docs"),
            F.sum("n_novel").over(cw).cast("long").alias("cum_unique"),
        )
    )
    x = F.log(F.col("cum_docs").cast("double"))
    y = F.log(F.col("cum_unique").cast("double"))
    fit = curve.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x.cast("decimal(28,12)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(28,12)")).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(28,12)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(28,12)")).cast("double").alias("sxx"),
    )
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    co = F.broadcast(
        fit.select(
            beta.alias("beta"),
            ((F.col("sy") - beta * F.col("sx")) / F.col("n")).alias("lnk"),
        )
    )
    obs = curve.crossJoin(co).select(
        F.col("wave").cast("int").alias("point"),
        "cum_docs",
        "cum_unique",
        F.round(
            F.exp(F.col("lnk") + F.col("beta") * F.log(F.col("cum_docs").cast("double"))),
            4,
        ).alias("fitted_unique"),
        F.round("beta", 6).alias("heaps_beta"),
    )
    tot = curve.agg(
        F.max("cum_docs").alias("nd"), F.max("cum_unique").alias("nu")
    )
    ext = tot.crossJoin(co).select(
        F.lit(99).alias("point"),
        (F.col("nd") * 10).cast("long").alias("cum_docs"),
        F.lit(None).cast("long").alias("cum_unique"),
        F.round(
            F.exp(
                F.col("lnk")
                + F.col("beta") * F.log(F.col("nd").cast("double") * 10.0)
            ),
            4,
        ).alias("fitted_unique"),
        F.round("beta", 6).alias("heaps_beta"),
    )
    return obs.unionAll(ext).orderBy("point")

def _vopt_sql() -> str:
    return """
    WITH daily AS MATERIALIZED (
      SELECT time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    idx AS MATERIALIZED (
      SELECT day, n, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
      FROM daily
    ),
    pre AS MATERIALIZED (
      SELECT i, day, n,
             SUM(n) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS s,
             SUM(n * n) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS ss
      FROM idx
    ),
    nn AS (SELECT MAX(i) AS n_days FROM pre),
    cuts AS (
      SELECT a.i AS j1, b.i AS j2, c.i AS j3, t.n_days
      FROM pre a, pre b, pre c, nn t
      WHERE a.i < b.i AND b.i < c.i AND c.i < t.n_days
    ),
    seg AS (
      SELECT j1, j2, j3, n_days,
             ((SELECT ss FROM pre WHERE i = j1)
              - ((SELECT s FROM pre WHERE i = j1)
                 * (SELECT s FROM pre WHERE i = j1)) // j1)
             + ((SELECT ss FROM pre WHERE i = j2)
                - (SELECT ss FROM pre WHERE i = j1)
                - (((SELECT s FROM pre WHERE i = j2)
                    - (SELECT s FROM pre WHERE i = j1))
                   * ((SELECT s FROM pre WHERE i = j2)
                      - (SELECT s FROM pre WHERE i = j1))) // (j2 - j1))
             + ((SELECT ss FROM pre WHERE i = j3)
                - (SELECT ss FROM pre WHERE i = j2)
                - (((SELECT s FROM pre WHERE i = j3)
                    - (SELECT s FROM pre WHERE i = j2))
                   * ((SELECT s FROM pre WHERE i = j3)
                      - (SELECT s FROM pre WHERE i = j2))) // (j3 - j2))
             + ((SELECT ss FROM pre WHERE i = n_days)
                - (SELECT ss FROM pre WHERE i = j3)
                - (((SELECT s FROM pre WHERE i = n_days)
                    - (SELECT s FROM pre WHERE i = j3))
                   * ((SELECT s FROM pre WHERE i = n_days)
                      - (SELECT s FROM pre WHERE i = j3))) // (n_days - j3))
               AS cost
      FROM cuts
    ),
    best AS MATERIALIZED (
      SELECT j1, j2, j3, n_days, cost
      FROM seg ORDER BY cost, j1, j2, j3 LIMIT 1
    ),
    bounds AS (
      SELECT 1 AS bin, 1 AS lo, j1 AS hi, cost, n_days FROM best
      UNION ALL SELECT 2, j1 + 1, j2, cost, n_days FROM best
      UNION ALL SELECT 3, j2 + 1, j3, cost, n_days FROM best
      UNION ALL SELECT 4, j3 + 1, n_days, cost, n_days FROM best
    ),
    ew AS (
      SELECT CAST(SUM(sse) AS BIGINT) AS ew_cost FROM (
        SELECT SUM(b.n * b.n) - (SUM(b.n) * SUM(b.n)) // COUNT(*) AS sse
        FROM pre b CROSS JOIN nn t
        GROUP BY (((b.i - 1) * 4) // t.n_days)
      )
    )
    SELECT bo.bin,
           strftime((SELECT day FROM pre WHERE i = bo.lo),
                    '%Y-%m-%d') AS day_start,
           strftime((SELECT day FROM pre WHERE i = bo.hi),
                    '%Y-%m-%d') AS day_end,
           CAST(bo.hi - bo.lo + 1 AS BIGINT) AS n_days,
           CAST((SELECT s FROM pre WHERE i = bo.hi)
             - COALESCE((SELECT s FROM pre WHERE i = bo.lo - 1), 0)
             AS BIGINT) AS total_events,
           CAST(bo.cost AS BIGINT) AS vopt_cost_fx,
           e.ew_cost AS equiwidth_cost_fx,
           CAST((e.ew_cost - bo.cost) * 1000000 // e.ew_cost AS BIGINT)
             AS error_reduction_ppm
    FROM bounds bo CROSS JOIN ew e
    ORDER BY bo.bin
    """


@register(
    "q279_voptimal_histogram",
    _vopt_sql(),
    doc="V-optimal histogram (B=4) of the daily event-volume series: "
    "exhaustive search over (j1<j2<j3) cuts minimizing the exact "
    "integer sum of within-bin SSE terms SS - floor(S^2/len), with "
    "the (cost, cuts) lexicographic tie-break identical on both "
    "engines; reports each optimal bin's span/mass/cost beside the "
    "equi-width layout's cost and the error reduction bought as a "
    "pure-integer ppm floor division ((ew-cost)*1e6 // ew) — r10 "
    "proved ROUND-of-double diverges across DuckDB builds. The "
    "corpus pays one day aggregate; the O(days^3) search runs on the "
    "bounded day axis (driver-side in Spark, the q268 pattern)",
)
def q279_voptimal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("day")
        .collect()
    )
    days = [r.day for r in daily]
    xs = [r.n for r in daily]
    N = len(xs)
    s = [0] * (N + 1)
    ss = [0] * (N + 1)
    for i in range(1, N + 1):
        s[i] = s[i - 1] + xs[i - 1]
        ss[i] = ss[i - 1] + xs[i - 1] * xs[i - 1]

    def sse(lo: int, hi: int) -> int:  # 1-based inclusive
        ln = hi - lo + 1
        sg = s[hi] - s[lo - 1]
        return (ss[hi] - ss[lo - 1]) - (sg * sg) // ln

    best = None
    for j1 in range(1, N - 2):
        c1 = sse(1, j1)
        for j2 in range(j1 + 1, N - 1):
            c2 = c1 + sse(j1 + 1, j2)
            for j3 in range(j2 + 1, N):
                cost = c2 + sse(j2 + 1, j3) + sse(j3 + 1, N)
                key = (cost, j1, j2, j3)
                if best is None or key < best:
                    best = key
    cost, j1, j2, j3 = best
    # equi-width layout on the day index: bin_no = ((i-1)*4)//N
    ew_cost = 0
    groups: dict[int, list[int]] = {}
    for i in range(1, N + 1):
        groups.setdefault(((i - 1) * 4) // N, []).append(i)
    for g in groups.values():
        ew_cost += sse(g[0], g[-1])
    bounds = [(1, 1, j1), (2, j1 + 1, j2), (3, j2 + 1, j3), (4, j3 + 1, N)]
    # error reduction as pure-integer ppm floor division: bit-identical
    # on every engine, unlike ROUND-of-double (r10 driver-red class).
    rows = [
        (
            b,
            days[lo - 1].strftime("%Y-%m-%d"),
            days[hi - 1].strftime("%Y-%m-%d"),
            hi - lo + 1,
            s[hi] - s[lo - 1],
            cost,
            ew_cost,
            (ew_cost - cost) * 1000000 // ew_cost,
        )
        for b, lo, hi in bounds
    ]
    return spark.createDataFrame(
        rows,
        "bin int, day_start string, day_end string, n_days long, "
        "total_events long, vopt_cost_fx long, equiwidth_cost_fx long, "
        "error_reduction_ppm long",
    ).orderBy("bin")

# ---------------------------------------------------------------------------
# q285 — capture-recapture corpus-size estimation (Lincoln-Petersen
# with the Chapman correction): two INDEPENDENT deterministic md5
# samples of document fingerprints; the overlap rate estimates the
# total DISTINCT content population — the survey-statistics answer to
# "how big is the deduplicated web" that needs two cheap samples
# instead of a full q30 pass, with the exact answer riding along as
# calibration (q166 discipline).
# ---------------------------------------------------------------------------
def _caprecap_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    b1 = hash_bucket_sql("fp || '|s1'", 1000)
    b2 = hash_bucket_sql("fp || '|s2'", 1000)
    return f"""
    WITH fps AS MATERIALIZED (
      SELECT DISTINCT md5(text) AS fp FROM documents
    ),
    marks AS (
      SELECT fp, CAST({b1} < 200 AS INT) AS in1, CAST({b2} < 200 AS INT) AS in2
      FROM fps
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
             CAST(SUM(in1) AS BIGINT) AS n1,
             CAST(SUM(in2) AS BIGINT) AS n2,
             CAST(SUM(in1 * in2) AS BIGINT) AS m
      FROM marks
    )
    SELECT n_true, n1, n2, m,
           CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS chapman_est,
           ROUND(CAST(n1 AS DOUBLE) * n2 / m, 4) AS lincoln_petersen_est,
           ROUND(ABS(CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS DOUBLE)
                     - n_true) / n_true, 6) AS chapman_rel_err,
           CAST(ABS(CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS DOUBLE)
                    - n_true) / n_true <= 0.15e0 AS INT) AS within_15pct
    FROM agg
    """


@register(
    "q285_capture_recapture",
    _caprecap_sql(),
    doc="capture-recapture estimate of the distinct-content population: "
    "two independent 20% md5 samples of document fingerprints (keyed "
    "with different salts, so membership is independent), overlap m, "
    "Chapman estimator (n1+1)(n2+1)/(m+1) - 1 in exact integer floor "
    "division beside the raw Lincoln-Petersen ratio — the two-cheap-"
    "passes population estimate, with the exact distinct count and "
    "relative error as hash-checked calibration columns. One "
    "fingerprint scan, one aggregate, no joins",
)
def q285_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    fps = d.select(F.md5("text").alias("fp")).distinct()
    marks = fps.select(
        (hash_bucket(F.concat(F.col("fp"), F.lit("|s1")), 1000) < 200)
        .cast("int")
        .alias("in1"),
        (hash_bucket(F.concat(F.col("fp"), F.lit("|s2")), 1000) < 200)
        .cast("int")
        .alias("in2"),
    )
    agg = marks.agg(
        F.count("*").cast("long").alias("n_true"),
        F.sum("in1").cast("long").alias("n1"),
        F.sum("in2").cast("long").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).cast("long").alias("m"),
    )
    chapman = F.expr("((n1 + 1) * (n2 + 1)) div (m + 1) - 1")
    rel_err = F.abs(chapman.cast("double") - F.col("n_true")) / F.col("n_true")
    return agg.select(
        "n_true",
        "n1",
        "n2",
        "m",
        chapman.cast("long").alias("chapman_est"),
        F.round(F.col("n1").cast("double") * F.col("n2") / F.col("m"), 4).alias(
            "lincoln_petersen_est"
        ),
        F.round(rel_err, 6).alias("chapman_rel_err"),
        (rel_err <= 0.15).cast("int").alias("within_15pct"),
    )

# ---------------------------------------------------------------------------
# q315 — V-optimal histogram by DYNAMIC PROGRAMMING (B=6): the drop-in
# q279's doc promised for B or N beyond exhaustive-search scale. The
# classic opt[b][i] = min_j opt[b-1][j] + sse(j+1..i) recurrence
# unrolls into B-1 DECLARATIVE level joins (each an O(N^2) range join
# on the bounded day axis), so BOTH engines run the identical plan —
# no driver-side loop (q279) and no recursion. Segment costs are the
# exact integer SS - floor(S^2/len) form; argmins are pinned by the
# (cost, j) lexicographic order, so the whole DP table is
# bit-identical across engines.
# ---------------------------------------------------------------------------
_VOPT_DP_B = 6

def _vopt_dp_sql() -> str:
    B = _VOPT_DP_B

    def seg_cost(p: str, c: str) -> str:
        return (
            f"({c}.ss - {p}.ss) - (({c}.s - {p}.s) * ({c}.s - {p}.s))"
            f" // ({c}.i - {p}.i)"
        )

    lvls = [
        "lvl1 AS (SELECT i, s, ss, ss - (s * s) // i AS cost,"
        " CAST(0 AS BIGINT) AS prev FROM pre)"
    ]
    for b in range(2, B + 1):
        where = (
            f"WHERE c.i >= {b}"
            if b < B
            else "WHERE c.i = (SELECT nd FROM nn)"
        )
        cost = f"p.cost + {seg_cost('p', 'c')}"
        lvls.append(
            f"""lvl{b} AS (
      SELECT i, s, ss, cost, prev FROM (
        SELECT c.i, c.s, c.ss, {cost} AS cost, p.i AS prev,
               ROW_NUMBER() OVER (PARTITION BY c.i
                                  ORDER BY {cost}, p.i) AS rn
        FROM pre c JOIN lvl{b - 1} p ON p.i < c.i
        {where}
      ) WHERE rn = 1
    )"""
        )
    backs = [f"b{B} AS (SELECT i, prev, cost FROM lvl{B})"]
    for b in range(B - 1, 0, -1):
        backs.append(
            f"b{b} AS (SELECT l.i, l.prev FROM lvl{b} l "
            f"JOIN b{b + 1} t ON l.i = t.prev)"
        )
    bins_rows = " UNION ALL ".join(
        f"SELECT {b} AS bin, prev + 1 AS lo, i AS hi FROM b{b}"
        for b in range(1, B + 1)
    )
    bin_s = (
        "(SELECT s FROM pre WHERE i = b.hi)"
        " - COALESCE((SELECT s FROM pre WHERE i = b.lo - 1), 0)"
    )
    bin_ss = (
        "(SELECT ss FROM pre WHERE i = b.hi)"
        " - COALESCE((SELECT ss FROM pre WHERE i = b.lo - 1), 0)"
    )
    lvls_sql = ",\n    ".join(lvls)
    backs_sql = ",\n    ".join(backs)
    return f"""
    WITH daily AS MATERIALIZED (
      SELECT time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    pre AS MATERIALIZED (
      SELECT day, n,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
             CAST(SUM(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS s,
             CAST(SUM(n * n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND CURRENT ROW) AS BIGINT) AS ss
      FROM daily
    ),
    nn AS (SELECT MAX(i) AS nd FROM pre),
    {lvls_sql},
    {backs_sql},
    bins AS ({bins_rows}),
    out AS MATERIALIZED (
      SELECT b.bin,
             (SELECT day FROM pre WHERE i = b.lo) AS day_lo,
             (SELECT day FROM pre WHERE i = b.hi) AS day_hi,
             CAST(b.hi - b.lo + 1 AS BIGINT) AS n_days,
             CAST({bin_s} AS BIGINT) AS total_events,
             CAST({bin_ss} - ({bin_s}) * ({bin_s}) // (b.hi - b.lo + 1)
                  AS BIGINT) AS bin_sse_fx
      FROM bins b
    ),
    ew AS (
      SELECT CAST(SUM(sse) AS BIGINT) AS ew_cost FROM (
        SELECT SUM(b.n * b.n) - (SUM(b.n) * SUM(b.n)) // COUNT(*) AS sse
        FROM pre b CROSS JOIN nn t
        GROUP BY (((b.i - 1) * {B}) // t.nd)
      )
    )
    SELECT o.bin, strftime(o.day_lo, '%Y-%m-%d') AS day_start,
           strftime(o.day_hi, '%Y-%m-%d') AS day_end,
           o.n_days, o.total_events, o.bin_sse_fx,
           t.cost AS vopt_cost_fx, e.ew_cost AS equiwidth_cost_fx,
           ROUND(1e0 - CAST(t.cost AS DOUBLE) / e.ew_cost, 6)
             AS error_reduction,
           CAST((SELECT SUM(bin_sse_fx) FROM out) = t.cost AS INT)
             AS dp_consistent
    FROM out o CROSS JOIN b{B} t CROSS JOIN ew e
    ORDER BY o.bin
    """


@register(
    "q315_voptimal_dp",
    _vopt_dp_sql(),
    doc="V-optimal histogram (B=6) by dynamic programming: the "
    "opt[b][i] = min_j opt[b-1][j] + sse(j+1..i) recurrence unrolled "
    "into B-1 declarative level joins over the prefix-sum day table — "
    "the scale path q279's exhaustive (j1<j2<j3) search cannot take "
    "(O(N^2 B) vs O(N^B)), with NO driver-side loop: both engines run "
    "the identical join plan. Segment costs are exact integer "
    "SS - floor(S^2/len); every argmin is pinned by (cost, j), so the "
    "full DP table and the backtracked cut set are bit-identical "
    "across engines. dp_consistent asserts sum(bin SSE) == DP optimum "
    "as a hash-checked invariant; error_reduction scores the layout "
    "against equi-width. The corpus pays one day aggregate; each DP "
    "level is an O(days^2) broadcast range join",
)
def q315_voptimal_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    B = _VOPT_DP_B
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    wo = W.orderBy("day")
    pre = hold(
        daily.select(
            "day",
            "n",
            F.row_number().over(wo).cast("long").alias("i"),
            F.sum("n")
            .over(wo.rowsBetween(W.unboundedPreceding, 0))
            .cast("long")
            .alias("s"),
            F.sum(F.col("n") * F.col("n"))
            .over(wo.rowsBetween(W.unboundedPreceding, 0))
            .cast("long")
            .alias("ss"),
        )
    )
    nn = pre.agg(F.max("i").alias("nd"))

    levels: list[DataFrame] = [
        hold(
            pre.select(
                "i",
                "s",
                "ss",
                (F.col("ss") - F.expr("(s * s) div i")).alias("cost"),
                F.lit(0).cast("long").alias("prev"),
            )
        )
    ]
    for b in range(2, B + 1):
        p = levels[-1].select(
            F.col("i").alias("pi"),
            F.col("s").alias("ps"),
            F.col("ss").alias("pss"),
            F.col("cost").alias("pcost"),
        )
        j = pre.select("i", "s", "ss").join(
            F.broadcast(p), F.col("pi") < F.col("i")
        )
        cost = F.col("pcost") + (
            F.col("ss")
            - F.col("pss")
            - F.expr("((s - ps) * (s - ps)) div (i - pi)")
        )
        if b < B:
            j = j.filter(F.col("i") >= b)
        else:
            j = j.join(F.broadcast(nn), F.col("i") == F.col("nd")).drop("nd")
        ranked = j.select(
            "i", "s", "ss", cost.alias("cost"), F.col("pi").alias("prev")
        ).withColumn(
            "rn",
            F.row_number().over(W.partitionBy("i").orderBy("cost", "prev")),
        )
        levels.append(hold(ranked.filter(F.col("rn") == 1).drop("rn")))

    # backtrack the prev pointers declaratively (each step a 1-row join)
    total = levels[B - 1].select("i", "prev", F.col("cost").alias("vcost"))
    picked = [total.select("i", "prev")]  # bin B
    for b in range(B - 1, 0, -1):
        sel = picked[-1].select(F.col("prev").alias("sel"))
        picked.append(
            levels[b - 1]
            .join(F.broadcast(sel), F.col("i") == F.col("sel"))
            .select("i", "prev")
        )
    bins = None
    for k, dfk in enumerate(picked):  # picked[0] is bin B, last is bin 1
        binno = B - k
        part = dfk.select(
            F.lit(binno).alias("bin"),
            (F.col("prev") + 1).alias("lo"),
            F.col("i").alias("hi"),
        )
        bins = part if bins is None else bins.unionByName(part)

    hi = pre.select(
        F.col("i").alias("hi"),
        F.col("day").alias("day_hi"),
        F.col("s").alias("s_hi"),
        F.col("ss").alias("ss_hi"),
    )
    lo0 = pre.select(
        F.col("i").alias("lo0"),
        F.col("s").alias("s_lo0"),
        F.col("ss").alias("ss_lo0"),
    )
    lod = pre.select(F.col("i").alias("lo"), F.col("day").alias("day_lo"))
    out = (
        bins.join(F.broadcast(hi), "hi")
        .join(F.broadcast(lod), "lo")
        .withColumn("lo0", F.col("lo") - 1)
        .join(F.broadcast(lo0), "lo0", "left")
        .select(
            "bin",
            "day_lo",
            "day_hi",
            (F.col("hi") - F.col("lo") + 1).cast("long").alias("n_days"),
            (F.col("s_hi") - F.coalesce("s_lo0", F.lit(0)))
            .cast("long")
            .alias("total_events"),
            (
                F.col("ss_hi")
                - F.coalesce("ss_lo0", F.lit(0))
                - F.expr(
                    "((s_hi - coalesce(s_lo0, 0)) *"
                    " (s_hi - coalesce(s_lo0, 0))) div (hi - lo + 1)"
                )
            )
            .cast("long")
            .alias("bin_sse_fx"),
        )
    )
    out = hold(out)
    ew = (
        pre.crossJoin(F.broadcast(nn))
        .groupBy(F.expr(f"((i - 1) * {B}) div nd").alias("g"))
        .agg(
            (
                F.sum(F.col("n") * F.col("n"))
                - F.expr("(sum(n) * sum(n)) div count(*)")
            ).alias("sse")
        )
        .agg(F.sum("sse").cast("long").alias("ew_cost"))
    )
    consist = out.agg(F.sum("bin_sse_fx").alias("sum_sse"))
    return (
        out.crossJoin(F.broadcast(total.select("vcost")))
        .crossJoin(F.broadcast(ew))
        .crossJoin(F.broadcast(consist))
        .select(
            "bin",
            F.date_format("day_lo", "yyyy-MM-dd").alias("day_start"),
            F.date_format("day_hi", "yyyy-MM-dd").alias("day_end"),
            "n_days",
            "total_events",
            "bin_sse_fx",
            F.col("vcost").alias("vopt_cost_fx"),
            F.col("ew_cost").alias("equiwidth_cost_fx"),
            F.round(
                F.lit(1.0) - F.col("vcost").cast("double") / F.col("ew_cost"),
                6,
            ).alias("error_reduction"),
            (F.col("sum_sse") == F.col("vcost")).cast("int").alias(
                "dp_consistent"
            ),
        )
        .orderBy("bin")
    )

# ---------------------------------------------------------------------------
# q350 — learned-index audit (RMI-style): fit the key -> position CDF
# of the orders primary key with per-segment linear models (16
# equi-count segments) and report each segment's maximum prediction
# error — the number that sizes a learned index's search window (and
# says whether the key layout is learnable at all). OLS moments are
# exact BIGINTs over positions and 2^20-scaled key offsets; errors
# are integer-exact after one floored prediction per row.
# ---------------------------------------------------------------------------
_LIDX_SEGS = 16


@register(
    "q350_learned_index_audit",
    f"""
    WITH keys AS (
      SELECT o_orderkey AS k,
             CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT) AS pos,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM orders
    ),
    seg AS (
      SELECT k, pos, ((pos - 1) * {_LIDX_SEGS}) // n AS s FROM keys
    ),
    mom AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(k) AS BIGINT) AS k0,
             CAST(SUM(k - (SELECT MIN(k) FROM seg s2 WHERE s2.s = seg.s))
                  AS BIGINT) AS sx,
             CAST(SUM(pos) AS BIGINT) AS sy,
             CAST(SUM((k - (SELECT MIN(k) FROM seg s2 WHERE s2.s = seg.s))
                      * pos) AS BIGINT) AS sxy,
             CAST(SUM((k - (SELECT MIN(k) FROM seg s2 WHERE s2.s = seg.s))
                      * (k - (SELECT MIN(k) FROM seg s2 WHERE s2.s = seg.s)))
                  AS BIGINT) AS sxx
      FROM seg GROUP BY s
    ),
    fit AS (
      SELECT s, n, k0,
             CASE WHEN n * sxx - sx * sx = 0 THEN 0e0
                  ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
             CAST(sy AS DOUBLE) / n AS my, CAST(sx AS DOUBLE) / n AS mx
      FROM mom
    ),
    err AS (
      SELECT g.s, f.n, f.k0,
             CAST(MAX(ABS(g.pos - CAST(FLOOR(f.my + f.slope
                  * ((g.k - f.k0) - f.mx) + 0.5e0) AS BIGINT))) AS BIGINT)
               AS max_err,
             CAST(SUM(ABS(g.pos - CAST(FLOOR(f.my + f.slope
                  * ((g.k - f.k0) - f.mx) + 0.5e0) AS BIGINT))) AS BIGINT)
               AS sum_err
      FROM seg g JOIN fit f ON f.s = g.s
      GROUP BY 1, 2, 3
    )
    SELECT CAST(s AS INT) AS segment, n AS n_keys, k0 AS first_key,
           max_err, ROUND(CAST(sum_err AS DOUBLE) / n, 6) AS mean_err,
           CAST(max_err <= 64 AS INT) AS window64_ok
    FROM err
    ORDER BY segment
    """,
    doc="learned-index (RMI-style) audit of the orders key layout: 16 "
    "equi-count segments, per segment an OLS line key -> position "
    "(moments exact BIGINTs over min-key-anchored offsets — no "
    "overflow, no float mean), predictions floored half-up, and the "
    "max/mean absolute position error per segment — max_err IS the "
    "binary-search window a learned index would need, and "
    "window64_ok <= 64 marks segments where model-guided lookup beats "
    "a b-tree page walk. The optimizer-facing cousin of q140's "
    "histogram stats and q142's layout audit. One window pass + one "
    "segment aggregate",
)
def q350_learned_index_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    keys = o.select(
        F.col("o_orderkey").alias("k"),
        F.row_number().over(W.orderBy("o_orderkey")).cast("long").alias("pos"),
        F.count("*").over(W.partitionBy()).cast("long").alias("n"),
    )
    seg = pin(
        keys.select(
            "k", "pos", F.expr(f"((pos - 1) * {_LIDX_SEGS}) div n").alias("s")
        )
    )
    k0s = seg.groupBy("s").agg(F.min("k").alias("k0"))
    segk = seg.join(F.broadcast(k0s), "s").select(
        "s", "pos", "k", (F.col("k") - F.col("k0")).alias("x"), "k0"
    )
    segk = pin(segk)
    mom = segk.groupBy("s").agg(
        F.count("*").cast("long").alias("n"),
        F.min("k0").cast("long").alias("k0"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("pos").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("pos")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    fit = mom.select(
        "s",
        F.col("n").alias("fn"),
        F.col("k0").alias("fk0"),
        F.when(det == 0, F.lit(0.0))
        .otherwise(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / det.cast("double")
        )
        .alias("slope"),
        (F.col("sy").cast("double") / F.col("n")).alias("my"),
        (F.col("sx").cast("double") / F.col("n")).alias("mx"),
    )
    pred = F.floor(
        F.col("my")
        + F.col("slope") * (F.col("x").cast("double") - F.col("mx"))
        + 0.5
    ).cast("long")
    err = (
        segk.join(F.broadcast(fit), "s")
        .select("s", "fn", "fk0", F.abs(F.col("pos") - pred).alias("ae"))
        .groupBy("s", "fn", "fk0")
        .agg(
            F.max("ae").cast("long").alias("max_err"),
            F.sum("ae").cast("long").alias("sum_err"),
        )
    )
    return err.select(
        F.col("s").cast("int").alias("segment"),
        F.col("fn").alias("n_keys"),
        F.col("fk0").alias("first_key"),
        "max_err",
        F.round(F.col("sum_err").cast("double") / F.col("fn"), 6).alias(
            "mean_err"
        ),
        (F.col("max_err") <= 64).cast("int").alias("window64_ok"),
    ).orderBy("segment")

# ---------------------------------------------------------------------------
# q355 — Good-Turing unseen-mass estimate: per language, the
# frequency-of-frequencies table (N_r = how many terms occur exactly
# r times), the Good-Turing unseen-probability mass p0 = N1/N, and
# the adjusted counts r* = (r+1) N_{r+1}/N_r for the small-r rows
# where the estimator matters — the coverage number behind q274's
# Heaps extrapolation (how much vocabulary a crawl has NOT seen) and
# the smoothing constant every n-gram LM (q94/q105/q167) implicitly
# fixes. All counts exact integers; r* one division, rounded.
# ---------------------------------------------------------------------------
@register(
    "q355_good_turing",
    r"""
    WITH words AS (
      SELECT lang, unnest(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS t
      FROM documents
    ),
    v AS (SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM words GROUP BY 1, 2),
    ff AS (
      SELECT lang, c AS r, CAST(COUNT(*) AS BIGINT) AS n_r
      FROM v GROUP BY 1, 2
    ),
    tot AS (
      SELECT lang, CAST(SUM(r * n_r) AS BIGINT) AS n_tokens,
             CAST(SUM(n_r) AS BIGINT) AS vocab
      FROM ff GROUP BY 1
    )
    SELECT f.lang, CAST(f.r AS BIGINT) AS r, f.n_r,
           t.n_tokens, t.vocab,
           ROUND(CAST(f.n_r AS DOUBLE) * f.r / t.n_tokens, 6) AS mass_share,
           ROUND(CASE WHEN f.r = 1
                      THEN CAST(f.n_r AS DOUBLE) / t.n_tokens END, 6)
             AS p0_unseen,
           ROUND((f.r + 1e0) * nx.n_r / f.n_r, 6) AS r_star
    FROM ff f
    JOIN tot t USING (lang)
    LEFT JOIN ff nx ON nx.lang = f.lang AND nx.r = f.r + 1
    WHERE f.r <= 5
    ORDER BY f.lang, f.r
    """,
    doc="Good-Turing frequency-of-frequencies per language: N_r for "
    "r <= 5, the unseen-mass estimate p0 = N1/N (the probability the "
    "NEXT token is a never-seen type — the coverage number q274's "
    "Heaps curve extrapolates), and the adjusted count "
    "r* = (r+1)N_{r+1}/N_r that every smoothed LM effectively uses. "
    "Singleton-heavy languages (high p0) are where q167's perplexity "
    "buckets and q94's LM scores are least trustworthy. All counts "
    "exact integers from one vocab aggregate; r*/p0 one division "
    "each",
)
def q355_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    ff = pin(
        v.groupBy("lang", F.col("c").alias("r")).agg(
            F.count("*").cast("long").alias("n_r")
        )
    )
    tot = ff.groupBy("lang").agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n_tokens"),
        F.sum("n_r").cast("long").alias("vocab"),
    )
    nx = ff.select(
        F.col("lang").alias("nlang"),
        (F.col("r") - 1).alias("nr"),
        F.col("n_r").alias("n_next"),
    )
    return (
        ff.filter(F.col("r") <= 5)
        .join(F.broadcast(tot), "lang")
        .join(
            F.broadcast(nx),
            (F.col("nlang") == F.col("lang")) & (F.col("nr") == F.col("r")),
            "left",
        )
        .select(
            "lang",
            F.col("r").cast("long").alias("r"),
            "n_r",
            "n_tokens",
            "vocab",
            F.round(
                F.col("n_r").cast("double") * F.col("r") / F.col("n_tokens"), 6
            ).alias("mass_share"),
            F.round(
                F.when(
                    F.col("r") == 1,
                    F.col("n_r").cast("double") / F.col("n_tokens"),
                ),
                6,
            ).alias("p0_unseen"),
            F.round(
                (F.col("r") + F.lit(1.0)) * F.col("n_next") / F.col("n_r"), 6
            ).alias("r_star"),
        )
        .orderBy("lang", "r")
    )

# ---------------------------------------------------------------------------
# q364 — frequent-user CHANGE detection via mergeable Misra-Gries
# summaries: build the q259-discipline MG(16) head over per-user
# event counts for the FIRST and SECOND time halves independently
# (same pinned two-level fold: per user-hash bucket in user order,
# then merge in (bucket, user) order), and diff the heads — who
# entered, who left, how the estimates moved — with each half's MG
# bounds hash-checked against its exact counts. This is the job the
# sketch family exists for at 100 TB: yesterday's summaries are
# retained (k*buckets entries), today's merge against them, and the
# head diff costs O(k) — no second pass over history.
# ---------------------------------------------------------------------------
_MGD_BUCKETS = 4

def _mg_drift_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    bucket = hash_bucket_sql("user_id", _MGD_BUCKETS)
    empty = "CAST([] AS STRUCT(t VARCHAR, c BIGINT)[])"
    kp1 = _MG_K + 1
    return f"""
    WITH RECURSIVE cutoff AS (
      SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS cut
      FROM events
    ),
    ev AS (
      SELECT CASE WHEN epoch_us(e.ts) <= c.cut THEN 1 ELSE 2 END AS half,
             CAST(e.user_id AS VARCHAR) AS t
      FROM events e CROSS JOIN cutoff c
    ),
    hist AS MATERIALIZED (
      SELECT half, {bucket.replace("user_id", "t")} AS bucket, t,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM ev GROUP BY 1, 2, 3
    ),
    items AS MATERIALIZED (
      SELECT half, bucket, t, c,
             CAST(ROW_NUMBER() OVER (PARTITION BY half, bucket ORDER BY t)
                  AS INT) AS idx
      FROM hist
    ),
    fold AS (
      SELECT DISTINCT half, bucket, 0 AS i, {empty} AS S FROM items
      UNION ALL
      SELECT f.half, f.bucket, f.i + 1, {_mg_insert_duck("f.S", "x.t", "x.c")}
      FROM fold f JOIN items x
        ON x.half = f.half AND x.bucket = f.bucket AND x.idx = f.i + 1
    ),
    bsum AS (
      SELECT f.half, f.bucket, f.S
      FROM fold f
      JOIN (SELECT half, bucket, MAX(idx) AS mx FROM items GROUP BY 1, 2) m
        ON m.half = f.half AND m.bucket = f.bucket AND f.i = m.mx
    ),
    entries AS (SELECT half, bucket, unnest(S) AS e FROM bsum),
    mitems AS MATERIALIZED (
      SELECT half, e.t AS t, e.c AS c,
             CAST(ROW_NUMBER() OVER (PARTITION BY half
                                     ORDER BY bucket, e.t) AS INT) AS idx
      FROM entries
    ),
    mfold AS (
      SELECT DISTINCT half, 0 AS i, {empty} AS S FROM mitems
      UNION ALL
      SELECT f.half, f.i + 1, {_mg_insert_duck("f.S", "x.t", "x.c")}
      FROM mfold f JOIN mitems x ON x.half = f.half AND x.idx = f.i + 1
    ),
    summ AS (
      SELECT f.half, unnest(f.S) AS e
      FROM mfold f
      JOIN (SELECT half, MAX(idx) AS mx FROM mitems GROUP BY 1) m
        ON m.half = f.half AND f.i = m.mx
    ),
    heads AS (
      SELECT half, e.t AS user_key, e.c AS est FROM summ
    ),
    truth AS (
      SELECT half, t AS user_key, CAST(SUM(c) AS BIGINT) AS true_c
      FROM hist GROUP BY 1, 2
    ),
    tot AS (SELECT half, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY 1),
    u AS (
      SELECT COALESCE(h1.user_key, h2.user_key) AS user_key,
             COALESCE(h1.est, 0) AS est_1, COALESCE(h2.est, 0) AS est_2
      FROM (SELECT user_key, est FROM heads WHERE half = 1) h1
      FULL OUTER JOIN (SELECT user_key, est FROM heads WHERE half = 2) h2
        ON h2.user_key = h1.user_key
    )
    SELECT CAST(u.user_key AS BIGINT) AS user_id,
           u.est_1, u.est_2,
           COALESCE(t1.true_c, 0) AS true_1, COALESCE(t2.true_c, 0) AS true_2,
           u.est_2 - u.est_1 AS est_delta,
           COALESCE(t2.true_c, 0) - COALESCE(t1.true_c, 0) AS true_delta,
           CASE WHEN u.est_1 = 0 THEN 'entered'
                WHEN u.est_2 = 0 THEN 'left'
                ELSE 'stayed' END AS head_status,
           CAST((u.est_1 = 0 OR (u.est_1 <= COALESCE(t1.true_c, 0)
                 AND COALESCE(t1.true_c, 0) - u.est_1
                     <= (2 * n1.n) // {kp1}))
                AND (u.est_2 = 0 OR (u.est_2 <= COALESCE(t2.true_c, 0)
                 AND COALESCE(t2.true_c, 0) - u.est_2
                     <= (2 * n2.n) // {kp1})) AS INT) AS bounds_ok
    FROM u
    LEFT JOIN truth t1 ON t1.half = 1 AND t1.user_key = u.user_key
    LEFT JOIN truth t2 ON t2.half = 2 AND t2.user_key = u.user_key
    CROSS JOIN (SELECT n FROM tot WHERE half = 1) n1
    CROSS JOIN (SELECT n FROM tot WHERE half = 2) n2
    ORDER BY user_id
    """


@register(
    "q364_mg_head_drift",
    _mg_drift_sql(),
    doc="frequent-user change detection with mergeable Misra-Gries "
    "heads: MG(16) summaries over per-user event counts built "
    "independently for the first and second time halves (the q259 "
    "pinned two-level fold per half — per user-hash bucket in user "
    "order, merged in (bucket, user) order), then the head DIFF: who "
    "entered, who left, estimate and exact-count deltas, with both "
    "halves' MG bounds hash-checked. This is the sketch family's "
    "production job: retained O(k) summaries make the day-over-day "
    "heavy-hitter diff free of any second pass over history. The "
    "half boundary is the exact integer epoch-microsecond midpoint. "
    "Corpus pays one (half, user) aggregate; folds run on "
    "substream-bounded histograms",
)
def q364_mg_head_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    k = _MG_K
    kp1 = k + 1
    e = load_table(spark, sf_dir, "events")
    cut = e.agg(
        F.expr(
            "(unix_micros(cast(min(ts) as timestamp))"
            " + unix_micros(cast(max(ts) as timestamp))) div 2"
        ).alias(
            "cut"
        )
    )
    ev = e.crossJoin(F.broadcast(cut)).select(
        F.when(
            F.expr("unix_micros(cast(ts as timestamp))") <= F.col("cut"), 1
        )
        .otherwise(2)
        .alias("half"),
        F.col("user_id").cast("string").alias("t"),
    )
    hist = hold(
        ev.withColumn("bucket", hash_bucket(F.col("t"), _MGD_BUCKETS))
        .groupBy("half", "bucket", "t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    empty = F.array().cast("array<struct<t:string,c:bigint>>")
    per_bucket = hist.groupBy("half", "bucket").agg(
        F.sort_array(F.collect_list(F.struct("t", "c"))).alias("items")
    )
    bsum = per_bucket.select(
        "half",
        "bucket",
        F.aggregate(
            "items", empty, lambda S, x: _mg_insert_col(S, x, k)
        ).alias("S"),
    )
    entries = bsum.select("half", "bucket", F.explode("S").alias("e")).select(
        "half", "bucket", F.col("e.t").alias("t"), F.col("e.c").alias("c")
    )
    merged = entries.groupBy("half").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("bucket", "t", "c"))),
            lambda s: F.struct(s["t"].alias("t"), s["c"].alias("c")),
        ).alias("mitems")
    ).select(
        "half",
        F.aggregate(
            "mitems", empty, lambda S, x: _mg_insert_col(S, x, k)
        ).alias("S"),
    )
    heads = merged.select("half", F.explode("S").alias("e")).select(
        "half", F.col("e.t").alias("user_key"), F.col("e.c").alias("est")
    )
    truth = hist.groupBy("half", F.col("t").alias("user_key")).agg(
        F.sum("c").cast("long").alias("true_c")
    )
    tot = hist.groupBy("half").agg(F.sum("c").cast("long").alias("n"))
    h1 = heads.filter(F.col("half") == 1).select(
        F.col("user_key").alias("u1"), F.col("est").alias("est_1")
    )
    h2 = heads.filter(F.col("half") == 2).select(
        F.col("user_key").alias("u2"), F.col("est").alias("est_2")
    )
    u = h1.join(h2, F.col("u1") == F.col("u2"), "full_outer").select(
        F.coalesce("u1", "u2").alias("user_key"),
        F.coalesce("est_1", F.lit(0)).alias("est_1"),
        F.coalesce("est_2", F.lit(0)).alias("est_2"),
    )
    t1 = truth.filter(F.col("half") == 1).select(
        F.col("user_key").alias("tk1"), F.col("true_c").alias("true_1")
    )
    t2 = truth.filter(F.col("half") == 2).select(
        F.col("user_key").alias("tk2"), F.col("true_c").alias("true_2")
    )
    n1 = tot.filter(F.col("half") == 1).select(F.col("n").alias("n1"))
    n2 = tot.filter(F.col("half") == 2).select(F.col("n").alias("n2"))
    j = (
        u.join(F.broadcast(t1), F.col("tk1") == F.col("user_key"), "left")
        .join(F.broadcast(t2), F.col("tk2") == F.col("user_key"), "left")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "user_key",
            "est_1",
            "est_2",
            F.coalesce("true_1", F.lit(0)).alias("true_1"),
            F.coalesce("true_2", F.lit(0)).alias("true_2"),
            "n1",
            "n2",
        )
    )
    b1 = (F.col("est_1") == 0) | (
        (F.col("est_1") <= F.col("true_1"))
        & (F.col("true_1") - F.col("est_1") <= F.expr(f"(2 * n1) div {kp1}"))
    )
    b2 = (F.col("est_2") == 0) | (
        (F.col("est_2") <= F.col("true_2"))
        & (F.col("true_2") - F.col("est_2") <= F.expr(f"(2 * n2) div {kp1}"))
    )
    return j.select(
        F.col("user_key").cast("long").alias("user_id"),
        "est_1",
        "est_2",
        "true_1",
        "true_2",
        (F.col("est_2") - F.col("est_1")).alias("est_delta"),
        (F.col("true_2") - F.col("true_1")).alias("true_delta"),
        F.when(F.col("est_1") == 0, "entered")
        .when(F.col("est_2") == 0, "left")
        .otherwise("stayed")
        .alias("head_status"),
        (b1 & b2).cast("int").alias("bounds_ok"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# q369 — KLL/MRL mergeable quantile sketch: the fifth mergeable-summary
# family member (MG q259, HLL q136, KMV q166, CountMin q132 exist).
# Reference scope: quantile statistics over vault fields; re-expressed
# as the distributed summary a 100 TB engine actually ships.
# ---------------------------------------------------------------------------
_KLL_QK = 32
_KLL_QBUCKETS = 8
_KLL_QLEVELS = 8  # supports k * 2**levels = 8192 rows/bucket (65k docs)
_KLL_QPS = [0.25, 0.5, 0.75, 0.9375]  # binary fractions: exact both engines


def _kll_sql() -> str:
    from frontmatter_mcp_spark.operators.kll import kll_compact_sql

    b = _hash_bucket_duck("doc_id", _KLL_QBUCKETS)
    phase1 = kll_compact_sql(_KLL_QK, _KLL_QLEVELS, "base", "s", "p1")
    phase2 = kll_compact_sql(_KLL_QK, _KLL_QLEVELS, "p1g", "g", "merged")
    ps = ", ".join(f"({p!r})" for p in _KLL_QPS)
    return f"""
    WITH base AS (
      SELECT {b} AS bucket, n_chars AS value, doc_id AS id,
             0 AS lvl, FALSE AS done
      FROM documents
    ),
    {phase1},
    p1g AS (SELECT 0 AS bucket, value, id, lvl, FALSE AS done FROM p1),
    {phase2},
    summary AS (
      SELECT value, id, CAST(POW(2, lvl) AS BIGINT) AS w FROM merged
    ),
    tot AS (
      SELECT CAST(SUM(w) AS BIGINT) AS total_weight,
             CAST(COUNT(*) AS BIGINT) AS summary_items
      FROM summary
    ),
    cum AS (
      SELECT value, w,
             SUM(w) OVER (ORDER BY value, id ROWS UNBOUNDED PRECEDING) AS cumw
      FROM summary
    ),
    qs AS (SELECT CAST(p AS DOUBLE) AS p FROM (VALUES {ps}) AS v(p)),
    est AS (
      SELECT q.p, t.total_weight, t.summary_items,
             CAST(MIN(c.value) AS BIGINT) AS est_value
      FROM qs q
      CROSS JOIN tot t
      JOIN cum c ON c.cumw >= CEIL(q.p * t.total_weight)
      GROUP BY q.p, t.total_weight, t.summary_items
    ),
    exact_rn AS (
      SELECT n_chars AS value,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM documents
    ),
    ex AS (
      SELECT q.p, CAST(MIN(e.value) AS BIGINT) AS exact_value
      FROM qs q JOIN exact_rn e ON e.rn >= CEIL(q.p * e.n)
      GROUP BY q.p
    )
    SELECT est.p, est.est_value, ex.exact_value,
           CAST(ABS(est.est_value - ex.exact_value) AS BIGINT) AS abs_err,
           est.total_weight, est.summary_items
    FROM est JOIN ex ON est.p = ex.p
    ORDER BY est.p
    """


@register(
    "q369_kll_quantiles",
    _kll_sql(),
    doc="KLL/MRL mergeable quantile sketch (Karnin-Lang-Liberty FOCS'16 "
    "compactor hierarchy, derandomized per ADR-0004: the even/odd coin "
    "is an md5 bit of (bucket, level, count), so DuckDB replays the "
    "identical sketch bit-for-bit). Phase 1 builds one sketch per md5 "
    "bucket (the per-executor-partition stand-in); phase 2 unions the "
    "per-bucket summaries AT THEIR LEVELS and recompacts with one "
    "global bucket — the merge operation that makes this a summary, "
    "not a sample (contrast q170: Bernoulli sample; q27: Spark's own "
    "approx_percentile, rows-only). Quantile estimate = first summary "
    "value whose cumulative weight reaches ceil(p*W); compaction "
    "preserves weight exactly, so W equals the input count. Execution "
    "is kll_compact_grouped: ONE shuffle of the (bucket, value, id) "
    "triple keyed by content bucket, then the whole hierarchy runs as "
    "a local numpy loop per bucket (Arrow in, O(k*levels) summary "
    "out) — at 100 TB the bucket count is sized so a bucket's slice "
    "fits an executor, and the merge phase touches only "
    "buckets*k*levels rows; the exact-rank audit columns (one global "
    "row_number) are the part you drop at scale, exactly as in q170",
)
def q369_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from frontmatter_mcp_spark.operators.kll import kll_compact_grouped
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        hash_bucket(F.col("doc_id"), _KLL_QBUCKETS).alias("bucket"),
        F.col("n_chars").alias("value"),
        F.col("doc_id").alias("id"),
        F.lit(0).alias("lvl"),
    )
    p1 = kll_compact_grouped(base, k=_KLL_QK, levels=_KLL_QLEVELS)
    merged = kll_compact_grouped(
        p1.select(F.lit(0).alias("bucket"), "value", "id", "lvl"),
        k=_KLL_QK,
        levels=_KLL_QLEVELS,
    )
    summary = merged.select(
        "value", "id", F.pow(F.lit(2.0), F.col("lvl")).cast("long").alias("w")
    )
    tot = summary.agg(
        F.sum("w").cast("long").alias("total_weight"),
        F.count("*").cast("long").alias("summary_items"),
    )
    cumw = (
        Window.orderBy("value", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = summary.select("value", "w", F.sum("w").over(cumw).alias("cumw"))
    qs = spark.createDataFrame([(p,) for p in _KLL_QPS], "p double")
    est = (
        qs.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(cum),
            F.col("cumw") >= F.ceil(F.col("p") * F.col("total_weight")),
        )
        .groupBy("p", "total_weight", "summary_items")
        .agg(F.min("value").cast("long").alias("est_value"))
    )
    # The exact-rank reference was a corpus-wide single-partition window
    # plus a >= theta join that emits O(n) rows per quantile. The
    # two-phase rank parallelizes the sort, and because value is
    # non-decreasing in rn, MIN(value | rn >= t) IS the value at rn = t
    # — an equi-join on the target rank (|qs| rows out, no fan-out).
    from frontmatter_mcp_spark.operators.total_order import (
        with_global_row_number,
    )

    exact_rn = with_global_row_number(
        d.select(F.col("n_chars").alias("value"), "doc_id"),
        [("value", True), ("doc_id", True)],
        out="rn",
        total_out="n",
    ).select("value", "rn", "n")
    ex = (
        qs.join(exact_rn, F.col("rn") == F.ceil(F.col("p") * F.col("n")))
        .groupBy("p")
        .agg(F.min("value").cast("long").alias("exact_value"))
    )
    return (
        est.join(ex, "p")
        .select(
            "p",
            "est_value",
            "exact_value",
            F.abs(F.col("est_value") - F.col("exact_value"))
            .cast("long")
            .alias("abs_err"),
            "total_weight",
            "summary_items",
        )
        .orderBy("p")
    )
