"""Business-analytics family: warehouse-operations queries over the TPC-H-ish tables (lifecycle, layout, integrity, sessions, revenue).

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
    _JSZ_DEPTH,
    _JSZ_WIDTH,
    _MKV_SCALE,
    _hash_bucket_duck,
)

# ---------------------------------------------------------------------------
# q125 — deterministic augmentation: hash-derived token dropout.
# Augmentation at pipeline scale must be REPRODUCIBLE (reruns/backfills
# produce byte-identical augmented corpora) — so the "randomness" is a
# pure function of (doc, position), the df.sample anti-pattern note in
# operators.sampling applied to data augmentation.
# ---------------------------------------------------------------------------
@register(
    "q125_deterministic_augmentation",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
      FROM documents
    ),
    kept AS (
      SELECT doc_id, i, w[i] AS t
      FROM toks, UNNEST(generate_series(1, len(w))) AS u(i)
      WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)), 1, 1)
            <> '0'
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS INT) AS n_kept,
             md5(string_agg(t, ' ' ORDER BY i)) AS aug_fp
      FROM kept GROUP BY doc_id
    )
    SELECT toks.doc_id, CAST(len(w) AS INT) AS n_tokens,
           COALESCE(agg.n_kept, 0) AS n_kept, agg.aug_fp
    FROM toks LEFT JOIN agg ON agg.doc_id = toks.doc_id
    """,
    doc="reproducible data augmentation: ~1/16 token dropout where the "
    "drop decision is md5(doc, position) — reruns and backfills emit "
    "byte-identical augmented text (verified by the full augmented-"
    "text fingerprint), unlike RNG-seeded augmentation whose output "
    "shifts with partitioning. A narrow zero-shuffle projection (the "
    "index-aware filter lambda runs inside codegen)",
)
def q125_deterministic_augmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+", -1), lambda t: t != ""
    )
    keep = lambda t, i: F.substring(  # noqa: E731
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), i.cast("string"))),
        1,
        1,
    ) != "0"
    kept = F.filter(toks, keep)
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(kept).cast("int").alias("n_kept"),
        F.when(F.size(kept) > 0, F.md5(F.concat_ws(" ", kept))).alias("aug_fp"),
    )

# ---------------------------------------------------------------------------
# q140 — ANALYZE-style column statistics (the CBO stats collector every
# engine ships): per numeric column one-pass base stats, an equi-width
# 8-bucket histogram on the observed range, and the top-3 most common
# values — the inputs a cost-based optimizer uses for selectivity and
# the inputs a data engineer reads before trusting a table
# ---------------------------------------------------------------------------
_STATS_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

_HIST_BUCKETS = 8

def _stats_bucket_expr(v: str, mn: str, mx: str) -> str:
    """Shared bucket arithmetic — identical text both engines so the
    IEEE float ops and the floor land identically."""
    b = _HIST_BUCKETS
    return (
        f"CASE WHEN {mx} = {mn} THEN 0 ELSE "
        f"LEAST(CAST(FLOOR(({v} - {mn}) / (({mx} - {mn}) / {b})) AS INT), {b - 1}) "
        f"END"
    )

def _colstats_sql() -> str:
    longs = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS DOUBLE) AS v FROM lineitem"
        for c in _STATS_COLS
    )
    bucket = _stats_bucket_expr("l.v", "s.min_v", "s.max_v")
    return f"""
    WITH long AS ({longs}),
    stats AS (
      SELECT col, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_null,
             CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv,
             MIN(v) AS min_v, MAX(v) AS max_v
      FROM long GROUP BY 1
    ),
    bucketed AS (
      SELECT l.col, {bucket} AS b
      FROM long l JOIN stats s USING (col) WHERE l.v IS NOT NULL
    ),
    hist AS (
      SELECT col, string_agg(b || ':' || c, ',' ORDER BY b) AS histogram
      FROM (SELECT col, b, CAST(COUNT(*) AS BIGINT) AS c FROM bucketed GROUP BY 1, 2)
      GROUP BY 1
    ),
    vc AS (
      SELECT col, CAST(CAST(v AS DECIMAL(18,2)) AS VARCHAR) AS vs, COUNT(*) AS c
      FROM long WHERE v IS NOT NULL GROUP BY 1, 2
    ),
    mcv AS (
      SELECT col, string_agg(vs || ':' || c, ',' ORDER BY rnk) AS top_values
      FROM (SELECT col, vs, c,
                   ROW_NUMBER() OVER (PARTITION BY col ORDER BY c DESC, vs) AS rnk
            FROM vc)
      WHERE rnk <= 3 GROUP BY 1
    )
    SELECT s.col, s.n, s.n_null, s.ndv, s.min_v, s.max_v, h.histogram, m.top_values
    FROM stats s JOIN hist h USING (col) JOIN mcv m USING (col)
    """


@register(
    "q140_column_stats",
    _colstats_sql(),
    doc="ANALYZE-style column statistics over lineitem's numeric columns: "
    "count/nulls/exact NDV/min/max in one unpivoted scan, an equi-width "
    "8-bucket histogram on the observed range (two-pass: the 4-row stats "
    "table broadcasts back for bucketing — the standard ANALYZE shape), "
    "and the top-3 most common values with a total-order tiebreak. The "
    "CBO selectivity inputs every engine ships; bucket arithmetic shared "
    "verbatim with the oracle so float edges land identically, MCV "
    "values decimal-formatted (double->string is not cross-engine "
    "stable)",
)
def q140_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ln = load_table(spark, sf_dir, "lineitem")
    stack_args = ", ".join(
        f"'{c}', CAST({c} AS DOUBLE)" for c in _STATS_COLS
    )
    long = ln.selectExpr(
        f"stack({len(_STATS_COLS)}, {stack_args}) AS (col, v)"
    )
    long = hold(long)
    stats = long.groupBy("col").agg(
        F.count("*").cast("long").alias("n"),
        (F.count("*") - F.count("v")).cast("long").alias("n_null"),
        F.countDistinct("v").cast("long").alias("ndv"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    joined = long.filter(F.col("v").isNotNull()).join(
        F.broadcast(stats.select("col", "min_v", "max_v")), "col"
    )
    bucket = F.expr(_stats_bucket_expr("v", "min_v", "max_v"))
    hist = (
        joined.select("col", bucket.alias("b"))
        .groupBy("col", "b")
        .agg(F.count("*").cast("long").alias("c"))
        .groupBy("col")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("b", "c"))),
                    lambda s: F.concat(
                        s.b.cast("string"), F.lit(":"), s.c.cast("string")
                    ),
                ),
                ",",
            ).alias("histogram")
        )
    )
    vc = (
        long.filter(F.col("v").isNotNull())
        .select("col", F.col("v").cast("decimal(18,2)").cast("string").alias("vs"))
        .groupBy("col", "vs")
        .agg(F.count("*").alias("c"))
    )
    rnk = W.partitionBy("col").orderBy(F.col("c").desc(), "vs")
    mcv = (
        vc.withColumn("rnk", F.row_number().over(rnk))
        .filter(F.col("rnk") <= 3)
        .groupBy("col")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rnk", "vs", "c"))),
                    lambda s: F.concat(s.vs, F.lit(":"), s.c.cast("string")),
                ),
                ",",
            ).alias("top_values")
        )
    )
    return stats.join(hist, "col").join(mcv, "col").select(
        "col", "n", "n_null", "ndv", "min_v", "max_v", "histogram", "top_values"
    )

# ---------------------------------------------------------------------------
# q141 — incremental materialized-view maintenance: the MV is refreshed
# by MERGING partial aggregates of the old snapshot and the new delta
# instead of recomputing over the full table — the core mechanism of
# every incremental-refresh system (sums/counts merge; avg derives).
# The oracle recomputes the view directly over the whole table, so the
# hash compare IS the incremental == full-recompute proof.
# ---------------------------------------------------------------------------
_MV_DELTA_CUTOFF = "1998-09-01"


@register(
    "q141_incremental_mv",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
    FROM lineitem
    GROUP BY 1, 2
    """,
    doc="incremental materialized-view maintenance: the Spark side "
    "builds the MV from the pre-cutoff snapshot's partial aggregates "
    "MERGED with the delta batch's partial aggregates (sum+sum, "
    "count+count, avg re-derived — the algebraic-aggregate merge rule "
    "every incremental refresh engine implements); the oracle computes "
    "the view directly over the full table, so hash equality proves "
    "incremental == recompute. DECIMAL-exact sums; at scale the "
    "snapshot side is the stored MV, so refresh cost is O(delta), not "
    "O(table)",
)
def q141_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ln = load_table(spark, sf_dir, "lineitem")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s_price"),
            F.count("*").cast("long").alias("n"),
        )
    # the stored-MV side (everything before the cutoff) and the newly
    # ingested delta; in production `old` is read back from the MV
    # table, not recomputed — the merge below is the refresh operation
    old = partial(ln.filter(F.col("l_shipdate") < F.lit(_MV_DELTA_CUTOFF)))
    delta = partial(ln.filter(F.col("l_shipdate") >= F.lit(_MV_DELTA_CUTOFF)))
    merged = (
        old.unionAll(delta)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("s_qty").alias("s_qty"),
            F.sum("s_price").alias("s_price"),
            F.sum("n").alias("n"),
        )
    )
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        F.col("s_qty").cast("double").alias("sum_qty"),
        F.col("s_price").cast("double").alias("sum_price"),
        F.col("n").cast("long").alias("n_rows"),
        (F.col("s_qty").cast("double") / F.col("n")).alias("avg_qty"),
    )

# ---------------------------------------------------------------------------
# q143 — SCD type-2 dimension history: turn a change stream into
# validity intervals (the warehouse-standard slowly-changing-dimension
# build; q26's CDC upsert keeps only latest state — this keeps the full
# history a point-in-time join needs). Consecutive duplicate states are
# collapsed first (a change event that doesn't change the tracked
# attribute must not open a new version).
# ---------------------------------------------------------------------------
@register(
    "q143_scd2_history",
    """
    WITH c AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, ts, event_id, event_type FROM c
      WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    v AS (
      SELECT user_id, event_type AS status, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS version
      FROM changes
    )
    SELECT user_id, status,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           COALESCE(strftime(valid_to, '%Y-%m-%d %H:%M:%S.%f'), 'current')
             AS valid_to,
           CAST(version AS INT) AS version,
           valid_to IS NULL AS is_current
    FROM v
    """,
    doc="SCD type-2 dimension history from a change stream: per-user "
    "event-type runs collapsed (no-op changes open no version), then "
    "validity intervals via LEAD with a total-order tiebreak — "
    "valid_to of the latest version is NULL/'current'. The full-history "
    "complement of q26's keep-latest CDC upsert; the whole build is two "
    "windows over ONE exchange on user_id (plan: single Sort+Window "
    "chain, no extra shuffle)",
)
def q143_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "ts", "event_id", "event_type")
    )
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    v = changes.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts").alias("vf"),
        F.lead("ts").over(w2).alias("vt"),
        F.row_number().over(w2).cast("int").alias("version"),
    )
    return v.select(
        "user_id",
        "status",
        F.date_format("vf", fmt).alias("valid_from"),
        F.coalesce(F.date_format("vt", fmt), F.lit("current")).alias("valid_to"),
        "version",
        F.col("vt").isNull().alias("is_current"),
    )

# ---------------------------------------------------------------------------
# q144 — interval merging (gaps-and-islands): per supplier, overlapping
# [shipdate, receiptdate] windows coalesced into islands — the classic
# coverage/merge problem behind SLA windows, maintenance calendars, and
# validity-interval dedup. One window chain on a single exchange.
# ---------------------------------------------------------------------------
@register(
    "q144_interval_islands",
    """
    WITH iv AS (
      SELECT l_suppkey AS sk, CAST(l_shipdate AS DATE) AS s,
             CAST(l_shipdate AS DATE) + CAST(l_quantity AS INT) AS e,
             l_orderkey AS ok, l_linenumber AS ln
      FROM lineitem
    ),
    m AS (
      SELECT sk, s, e, ok, ln,
             MAX(e) OVER (PARTITION BY sk ORDER BY s, e, ok, ln
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_e
      FROM iv
    ),
    g AS (
      SELECT sk, s, e, ok, ln,
             CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END
               AS is_new
      FROM m
    ),
    agg AS (
      SELECT sk, island, MIN(s) AS island_start, MAX(e) AS island_end,
             COUNT(*) AS n_iv
      FROM (SELECT sk, s, e,
                   SUM(is_new) OVER (PARTITION BY sk ORDER BY s, e, ok, ln
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS island
            FROM g)
      GROUP BY 1, 2
    )
    SELECT sk AS suppkey,
           CAST(COUNT(*) AS INT) AS n_islands,
           CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
           CAST(SUM(date_diff('day', island_start, island_end) + 1) AS BIGINT)
             AS covered_days,
           CAST(MAX(n_iv) AS BIGINT) AS max_island_size
    FROM agg GROUP BY 1
    """,
    doc="gaps-and-islands interval merge: per supplier the overlapping "
    "[shipdate, shipdate + quantity days] windows coalesce into islands via the "
    "running-max-end rule (new island iff start > max of all previous "
    "ends — handles nested intervals that LAG alone gets wrong), then "
    "per-supplier island count, total covered days, and largest island. "
    "Total-order window keys throughout; the whole build is one "
    "exchange on the supplier key",
)
def q144_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    iv = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("sk"),
        F.col("l_shipdate").cast("date").alias("s"),
        # the synthetic lineitem carries no receiptdate: derive a
        # deterministic interval end (ship + quantity days) so islands
        # genuinely overlap
        F.date_add(F.col("l_shipdate").cast("date"), F.col("l_quantity").cast("int")).alias("e"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
    )
    order = [F.col("s"), F.col("e"), F.col("ok"), F.col("ln")]
    w_prev = (
        W.partitionBy("sk").orderBy(*order).rowsBetween(W.unboundedPreceding, -1)
    )
    g = iv.withColumn("prev_max_e", F.max("e").over(w_prev)).withColumn(
        "is_new",
        (
            F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e"))
        ).cast("int"),
    )
    w_run = (
        W.partitionBy("sk")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    isl = g.withColumn("island", F.sum("is_new").over(w_run))
    agg = isl.groupBy("sk", "island").agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
        F.count("*").alias("n_iv"),
    )
    return agg.groupBy("sk").agg(
        F.count("*").cast("int").alias("n_islands"),
        F.sum("n_iv").cast("long").alias("n_intervals"),
        F.sum(F.datediff("island_end", "island_start") + 1)
        .cast("long")
        .alias("covered_days"),
        F.max("n_iv").cast("long").alias("max_island_size"),
    ).withColumnRenamed("sk", "suppkey")

# ---------------------------------------------------------------------------
# q154 — frequent itemset pairs (the Apriori/FP-growth first pass):
# parts co-occurring in the same order with support and lift — the
# market-basket primitive. The pair join is keyed on the order
# (bounded basket size caps the fanout), never part x part.
# ---------------------------------------------------------------------------
_MB_MIN_SUPPORT = 3

_MB_TOPK = 20


@register(
    "q154_itemset_pairs",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    norders AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM items),
    freq AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY 1),
    pairs AS (
      SELECT a.pk AS pk_a, b.pk AS pk_b, CAST(COUNT(*) AS BIGINT) AS support
      FROM items a JOIN items b ON b.ok = a.ok AND a.pk < b.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= {_MB_MIN_SUPPORT}
    ),
    scored AS (
      SELECT pk_a, pk_b, support,
             round(CAST(support AS DOUBLE) * n.n / (fa.c * fb.c), 6) AS lift
      FROM pairs
      JOIN freq fa ON fa.pk = pk_a
      JOIN freq fb ON fb.pk = pk_b
      CROSS JOIN norders n
    )
    SELECT pk_a, pk_b, support, lift
    FROM scored
    ORDER BY support DESC, pk_a, pk_b LIMIT {_MB_TOPK}
    """,
    doc="frequent itemset pairs (market-basket / Apriori first pass): "
    "parts co-occurring in an order, support-thresholded, with the lift "
    "ratio against independent part frequencies — co-purchase mining. "
    "The pair join keys on the ORDER (bounded basket size caps fanout "
    "at |basket|^2, never part x part); per-part frequencies broadcast "
    "back; top-k via TakeOrderedAndProject with a total-order tiebreak",
)
def q154_itemset_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = hold(
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    norders = items.agg(F.countDistinct("ok").cast("long").alias("n"))
    freq = items.groupBy("pk").agg(F.count("*").cast("long").alias("c"))
    a = items.select("ok", F.col("pk").alias("pk_a"))
    b = items.select("ok", F.col("pk").alias("pk_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pk_a") < F.col("pk_b"))
        .groupBy("pk_a", "pk_b")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= _MB_MIN_SUPPORT)
    )
    fa = freq.select(F.col("pk").alias("pk_a"), F.col("c").alias("ca"))
    fb = freq.select(F.col("pk").alias("pk_b"), F.col("c").alias("cb"))
    scored = (
        pairs.join(fa, "pk_a")
        .join(fb, "pk_b")
        .crossJoin(F.broadcast(norders))
        .select(
            "pk_a", "pk_b", "support",
            F.round(
                F.col("support").cast("double") * F.col("n")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("support").desc(), "pk_a", "pk_b"
    ).limit(_MB_TOPK)

# ---------------------------------------------------------------------------
# q174 — active-interval sweep: "how many shipments are in flight on
# each day" is a point-in-interval RANGE JOIN (days x intervals) that
# naive engines answer with an O(n*m) theta join; the sweep turns it
# into +1/-1 boundary events and one cumulative sum — the q144 islands
# trick applied to global interval stabbing
# ---------------------------------------------------------------------------
@register(
    "q174_interval_sweep",
    """
    WITH bounds AS (
      SELECT l_shipdate AS day, 1 AS delta FROM lineitem
      UNION ALL
      SELECT l_shipdate + CAST(l_quantity AS INT) * INTERVAL '1 day'
               + INTERVAL '1 day', -1
      FROM lineitem
    ),
    daily AS (
      SELECT CAST(day AS DATE) AS day,
             CAST(SUM(delta) AS BIGINT) AS delta,
             CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS starts
      FROM bounds GROUP BY 1
    ),
    swept AS (
      SELECT day, starts,
             CAST(SUM(delta) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS active
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, starts, active
    FROM swept ORDER BY day
    """,
    doc="global interval stabbing by sweep: every lineitem [shipdate, "
    "shipdate + quantity days] transit interval (the q144 windows) "
    "becomes a +1 at start and a -1 past its end, "
    "daily deltas aggregate map-side, and ONE running sum over the "
    "bounded day axis yields the active-shipment count for every day — "
    "O(n + days) against the O(n * days) point-in-interval range join a "
    "naive plan would produce (Spark has no range-join optimizer rule; "
    "this rewrite IS the optimization). The day axis is bounded, so the "
    "final single-partition window is over thousands of rows no matter "
    "the corpus size; everything corpus-sized happens in the partial "
    "aggregate",
)
def q174_interval_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.select(
        F.col("l_shipdate").alias("day"), F.lit(1).alias("delta")
    ).unionAll(
        li.select(
            F.date_add("l_shipdate", F.col("l_quantity").cast("int") + 1).alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    daily = bounds.groupBy("day").agg(
        F.sum("delta").cast("long").alias("delta"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("starts"),
    )
    win = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "starts",
        F.sum("delta").over(win).cast("long").alias("active"),
    ).orderBy("day")

# ---------------------------------------------------------------------------
# q183 — referential-integrity audit: the other half of ANALYZE next to
# q140's column stats — does every child row have its parent?
# ---------------------------------------------------------------------------
@register(
    "q183_referential_integrity",
    """
    WITH checks AS (
      SELECT 'lineitem.l_orderkey -> orders' AS fk,
             CAST(COUNT(*) AS BIGINT) AS n_child,
             CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphans
      FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
      UNION ALL
      SELECT 'orders.o_custkey -> customer',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
      UNION ALL
      SELECT 'customer.c_nationkey -> nation',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
      UNION ALL
      SELECT 'supplier.s_nationkey -> nation',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM supplier s LEFT JOIN nation n ON n.n_nationkey = s.s_nationkey
      UNION ALL
      SELECT 'nation.n_regionkey -> region',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM nation n LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
    )
    SELECT fk, n_child, n_orphans,
           ROUND(CAST(n_orphans AS DOUBLE) / n_child, 6) AS orphan_rate,
           CAST(n_orphans = 0 AS INT) AS intact
    FROM checks ORDER BY fk
    """,
    doc="referential-integrity audit over the star schema's five FK "
    "edges: child count, orphan count (parent key missing), orphan "
    "rate, and the pass verdict — the data-quality gate every "
    "warehouse load runs beside column stats (q140). Each check is a "
    "left join counting parent NULLs; the three dimension parents "
    "broadcast, the orders parent join is the only key shuffle, and "
    "orphan counting is map-side combined (at scale: left ANTI join + "
    "count is equivalent and prunes matched rows earlier; the LEFT "
    "JOIN form keeps child counting in the same pass)",
)
def q183_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    def check(name, child, ck, parent, pk, bcast):
        p = parent.select(pk)
        if bcast:
            p = F.broadcast(p)
        return (
            child.select(F.col(ck))
            .join(p, child[ck] == p[pk], "left")
            .agg(
                F.lit(name).alias("fk"),
                F.count("*").cast("long").alias("n_child"),
                F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_orphans"),
            )
        )

    checks = (
        check("lineitem.l_orderkey -> orders", li, "l_orderkey", o, "o_orderkey", False)
        .unionAll(check("orders.o_custkey -> customer", o, "o_custkey", c, "c_custkey", False))
        .unionAll(check("customer.c_nationkey -> nation", c, "c_nationkey", n, "n_nationkey", True))
        .unionAll(check("supplier.s_nationkey -> nation", s, "s_nationkey", n, "n_nationkey", True))
        .unionAll(check("nation.n_regionkey -> region", n, "n_regionkey", r, "r_regionkey", True))
    )
    return checks.select(
        "fk",
        "n_child",
        "n_orphans",
        F.round(F.col("n_orphans").cast("double") / F.col("n_child"), 6).alias(
            "orphan_rate"
        ),
        (F.col("n_orphans") == 0).cast("int").alias("intact"),
    ).orderBy("fk")

# ---------------------------------------------------------------------------
# q185 — join-estimate audit across the schema's FK edges: the AGMS
# sketch estimate (q152's machinery) AND the classic uniform NDV
# formula |A||B| / max(ndv_a, ndv_b) scored against the true join
# size on every edge — the report that shows WHERE the textbook
# formula breaks (skewed keys) and the sketch holds
# ---------------------------------------------------------------------------
_JEA_EDGES = [
    ("lineitem*orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders*customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer*nation", "customer", "c_nationkey", "nation", "n_nationkey"),
]

def _join_audit_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    col = hash_bucket_sql(
        "CAST(r AS VARCHAR) || '|' || CAST(k AS VARCHAR)", _JSZ_WIDTH
    )
    ctes, rows = [], []
    for i, (name, ta, ka, tb, kb) in enumerate(_JEA_EDGES):
        ctes += [
            f"""a{i} AS MATERIALIZED (
      SELECT {ka} AS k, CAST(COUNT(*) AS BIGINT) AS c FROM {ta} GROUP BY 1
    )""",
            f"""b{i} AS MATERIALIZED (
      SELECT {kb} AS k, CAST(COUNT(*) AS BIGINT) AS c FROM {tb} GROUP BY 1
    )""",
            f"""stats{i} AS MATERIALIZED (
      SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM a{i}) AS n_a,
             (SELECT CAST(SUM(c) AS BIGINT) FROM b{i}) AS n_b,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM a{i}) AS ndv_a,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM b{i}) AS ndv_b,
             (SELECT CAST(COALESCE(SUM(a{i}.c * b{i}.c), 0) AS BIGINT)
              FROM a{i} JOIN b{i} USING (k)) AS true_size
    )""",
            f"""ca{i} AS MATERIALIZED (
      SELECT r, {col} AS col, CAST(SUM(c) AS BIGINT) AS v
      FROM a{i} CROSS JOIN UNNEST(generate_series(0, {_JSZ_DEPTH - 1})) AS g(r)
      GROUP BY 1, 2
    )""",
            f"""cb{i} AS MATERIALIZED (
      SELECT r, {col} AS col, CAST(SUM(c) AS BIGINT) AS v
      FROM b{i} CROSS JOIN UNNEST(generate_series(0, {_JSZ_DEPTH - 1})) AS g(r)
      GROUP BY 1, 2
    )""",
            f"""est{i} AS MATERIALIZED (
      SELECT CAST(MIN(ip) AS BIGINT) AS cms_est FROM (
        SELECT ca{i}.r, CAST(SUM(ca{i}.v * cb{i}.v) AS BIGINT) AS ip
        FROM ca{i} JOIN cb{i} ON ca{i}.r = cb{i}.r AND ca{i}.col = cb{i}.col
        GROUP BY 1
      )
    )""",
        ]
        rows.append(
            f"""SELECT '{name}' AS edge, s.true_size, e.cms_est,
             CAST(s.n_a * s.n_b // GREATEST(s.ndv_a, s.ndv_b) AS BIGINT)
               AS ndv_est,
             ROUND(CAST(e.cms_est - s.true_size AS DOUBLE)
                   / s.true_size, 6) AS cms_rel_err,
             ROUND(CAST(s.n_a * s.n_b // GREATEST(s.ndv_a, s.ndv_b)
                        - s.true_size AS DOUBLE) / s.true_size, 6)
               AS ndv_rel_err
      FROM stats{i} s, est{i} e"""
        )
    cte_block = ",\n    ".join(ctes)
    union = "\n    UNION ALL ".join(rows)
    return f"""
    WITH {cte_block}
    {union}
    ORDER BY edge
    """


@register(
    "q185_join_estimate_audit",
    _join_audit_sql(),
    doc="join-size estimate audit over three FK edges: the AGMS/CMS "
    "sketch inner product (q152's estimator, guaranteed >= truth) and "
    "the classic uniform formula n_a*n_b/max(ndv) (what rule-based "
    "optimizers use without histograms) both scored against the exact "
    "join size — the uniform formula is exact on perfectly uniform "
    "FKs and drifts on skewed ones, which is precisely the evidence "
    "for keeping sketches in optimizer statistics. Per edge: two "
    "key-count aggregates, 1024-cell sketches, one sketch-sized inner "
    "product; the true size is the audit column a production "
    "optimizer never computes",
)
def q185_join_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.holds import overlap
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    rr = spark.range(_JSZ_DEPTH).select(F.col("id").cast("int").alias("r"))

    # The six per-edge key-count aggregates each feed FOUR consumers
    # (stats, NDV, true-size join, sketch). As lazy pins they re-ran
    # cold once per consumer branch (the audited ADR-0007 keep); built
    # as eager holds from overlapped threads the independent aggregate
    # DAGs back-fill each other (guide §2.6) and every consumer reads
    # the checkpoint: 7.9 -> 5.7 s min-of-3, rows identical.
    def keycounts(table: str, key: str):
        return lambda: hold(
            load_table(spark, sf_dir, table)
            .groupBy(F.col(key).alias("k"))
            .agg(F.count("*").cast("long").alias("c"))
        )

    held = overlap(
        *[
            thunk
            for _, ta, ka, tb, kb in _JEA_EDGES
            for thunk in (keycounts(ta, ka), keycounts(tb, kb))
        ]
    )

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

    out = None
    for i, (name, ta, ka, tb, kb) in enumerate(_JEA_EDGES):
        a, b = held[2 * i], held[2 * i + 1]
        stats = (
            a.agg(
                F.sum("c").cast("long").alias("n_a"),
                F.count("*").cast("long").alias("ndv_a"),
            )
            .crossJoin(
                F.broadcast(
                    b.agg(
                        F.sum("c").cast("long").alias("n_b"),
                        F.count("*").cast("long").alias("ndv_b"),
                    )
                )
            )
            .crossJoin(
                F.broadcast(
                    a.join(b.withColumnRenamed("c", "cb"), "k").agg(
                        F.coalesce(F.sum(F.col("c") * F.col("cb")), F.lit(0))
                        .cast("long")
                        .alias("true_size")
                    )
                )
            )
        )
        est = (
            sketch(a)
            .join(F.broadcast(sketch(b).withColumnRenamed("v", "vb")), ["r", "col"])
            .groupBy("r")
            .agg(F.sum(F.col("v") * F.col("vb")).cast("long").alias("ip"))
            .agg(F.min("ip").cast("long").alias("cms_est"))
        )
        ndv_est = F.floor(
            F.col("n_a") * F.col("n_b") / F.greatest("ndv_a", "ndv_b")
        ).cast("long")
        row = stats.crossJoin(F.broadcast(est)).select(
            F.lit(name).alias("edge"),
            "true_size",
            "cms_est",
            ndv_est.alias("ndv_est"),
            F.round(
                (F.col("cms_est") - F.col("true_size")).cast("double")
                / F.col("true_size"),
                6,
            ).alias("cms_rel_err"),
            F.round(
                (ndv_est - F.col("true_size")).cast("double") / F.col("true_size"),
                6,
            ).alias("ndv_rel_err"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("edge")

# ---------------------------------------------------------------------------
# q188 — conversion-latency statistics: q18's as-of join finds WHICH
# click preceded each purchase; this measures HOW LONG attribution
# took — the funnel-latency layer (exact integer microsecond deltas,
# binary-fraction percentiles)
# ---------------------------------------------------------------------------
@register(
    "q188_conversion_latency",
    """
    WITH pairs AS (
      SELECT p.user_id, epoch_us(p.ts) - epoch_us(c.ts) AS lat_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(lat_us) AS BIGINT) AS min_us,
           CAST(FLOOR(quantile_cont(lat_us, 0.5) * 16e0) AS BIGINT)
             AS p50_us_fx16,
           CAST(FLOOR(quantile_cont(lat_us, 0.75) * 16e0) AS BIGINT)
             AS p75_us_fx16,
           CAST(FLOOR(quantile_cont(lat_us, 0.9375) * 16e0) AS BIGINT)
             AS p94_us_fx16,
           CAST(MAX(lat_us) AS BIGINT) AS max_us
    FROM pairs
    """,
    doc="conversion-latency profile over the click->purchase as-of "
    "pairs (attributed purchases only — the ASOF INNER form): exact "
    "integer microsecond deltas, interpolated percentiles at binary "
    "fractions (Spark percentile == DuckDB quantile_cont bit-exactly). "
    "Percentiles are emitted as 16ths-fixed-point BIGINTs: a binary-"
    "fraction interpolation of integers is an exact dyadic double, so "
    "x*16 and its floor are bit-identical everywhere, while the old "
    "ROUND(x, 4) asked for decimals the double cannot hold at ~1e11 us "
    "magnitudes (ulp(x*1e4) ~ 0.5 — the r11 boundary audit flagged all "
    "three sites at 0.4-1.7 ulp from a rounding boundary). Spark side "
    "reuses q18's union+window as-of rewrite, then one global "
    "aggregate; at scale the percentile becomes approx and the rest is "
    "unchanged",
)
def q188_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    tagged = e.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pairs = (
        tagged.withColumn(
            "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
        )
        .filter((F.col("is_purchase") == 1) & F.col("last_click_ts").isNotNull())
        .select(
            "user_id",
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("last_click_ts").cast("timestamp"))
            ).alias("lat_us"),
        )
    )
    return pairs.agg(
        F.count("*").cast("long").alias("n_conversions"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.min("lat_us").cast("long").alias("min_us"),
        F.floor(F.percentile("lat_us", F.lit(0.5)) * 16.0)
        .cast("long")
        .alias("p50_us_fx16"),
        F.floor(F.percentile("lat_us", F.lit(0.75)) * 16.0)
        .cast("long")
        .alias("p75_us_fx16"),
        F.floor(F.percentile("lat_us", F.lit(0.9375)) * 16.0)
        .cast("long")
        .alias("p94_us_fx16"),
        F.max("lat_us").cast("long").alias("max_us"),
    )

_MKV_ITERS = 6

def _markov_sql(iters: int = _MKV_ITERS, s: int = _MKV_SCALE) -> str:
    ctes = [
        """pairs AS (
      SELECT user_id, event_type AS dst,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS src
      FROM events
    )""",
        """trans AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pairs WHERE src IS NOT NULL GROUP BY 1, 2
    )""",
        "rowtot AS (SELECT src, CAST(SUM(cnt) AS BIGINT) AS tot FROM trans GROUP BY 1)",
        f"""tfx AS (
      SELECT t.src, t.dst, (t.cnt * {s}) // r.tot AS p_fx
      FROM trans t JOIN rowtot r USING (src)
    )""",
        "types AS (SELECT DISTINCT event_type FROM events)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM types)",
        f"""pi0 AS (
      SELECT event_type, CAST({s} AS BIGINT) // n AS pi FROM types CROSS JOIN nn
    )""",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""pi{t} AS (
      SELECT ty.event_type, COALESCE(c.m, CAST(0 AS BIGINT)) AS pi
      FROM types ty LEFT JOIN (
        SELECT t.dst, CAST(SUM(p.pi * t.p_fx // {s}) AS BIGINT) AS m
        FROM tfx t JOIN pi{t - 1} p ON p.event_type = t.src
        GROUP BY t.dst
      ) c ON c.dst = ty.event_type
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined},
    top AS (
      SELECT src, dst, p_fx,
             ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY p_fx DESC, dst) AS rn
      FROM tfx
    )
    SELECT ty.event_type,
           CAST(COALESCE(r.tot, 0) AS BIGINT) AS n_out,
           CAST(COALESCE(sp.p_fx, 0) AS BIGINT) AS self_p_fx,
           tp.dst AS top_next, tp.p_fx AS top_next_p_fx,
           CAST(p.pi AS BIGINT) AS pi_fx
    FROM types ty
    LEFT JOIN rowtot r ON r.src = ty.event_type
    LEFT JOIN (SELECT src, p_fx FROM tfx WHERE src = dst) sp
           ON sp.src = ty.event_type
    LEFT JOIN (SELECT src, dst, p_fx FROM top WHERE rn = 1) tp
           ON tp.src = ty.event_type
    JOIN pi{iters} p ON p.event_type = ty.event_type
    ORDER BY ty.event_type
    """


@register(
    "q193_markov_transitions",
    _markov_sql(),
    doc="first-order Markov model of user behavior: adjacent event pairs "
    "per user (one LAG window over (ts, event_id) total order) fold into "
    "a |types|^2 transition matrix; probabilities are 2^30 fixed point "
    "((cnt*S)//row_total, exact BIGINTs) and the stationary distribution "
    "runs 6 power iterations in the same floor-division arithmetic — "
    "each iteration one tiny matrix-vector join replayed verbatim in an "
    "oracle CTE (the q126 discipline; dangling mass drops, which is "
    "deterministic on both engines). Output per type: out-volume, "
    "self-loop probability, argmax next type, stationary mass. The "
    "corpus pays one window pass + one pair aggregate; everything "
    "iterative runs on the types-sized matrix",
)
def q193_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    s = _MKV_SCALE
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    ).filter(F.col("src").isNotNull())
    trans = pairs.groupBy("src", "dst").agg(F.count("*").cast("long").alias("cnt"))
    rowtot = trans.groupBy("src").agg(F.sum("cnt").cast("long").alias("tot"))
    tfx = hold(
        trans.join(rowtot, "src").select(
            "src", "dst", F.expr(f"(cnt * {s}) div tot").alias("p_fx")
        )
    )
    types = e.select("event_type").distinct()
    nn = types.agg(F.count("*").cast("long").alias("n"))
    pi = types.crossJoin(F.broadcast(nn)).select(
        "event_type", F.expr(f"cast({s} as bigint) div n").alias("pi")
    )
    for _ in range(_MKV_ITERS):
        contrib = (
            tfx.join(pi, tfx["src"] == pi["event_type"])
            .groupBy("dst")
            .agg(F.sum(F.expr(f"(pi * p_fx) div {s}")).cast("long").alias("m"))
        )
        pi = types.join(
            contrib, types["event_type"] == contrib["dst"], "left"
        ).select("event_type", F.coalesce("m", F.lit(0).cast("long")).alias("pi"))
    top_w = W.partitionBy("src").orderBy(F.col("p_fx").desc(), "dst")
    top = (
        tfx.withColumn("rn", F.row_number().over(top_w))
        .filter(F.col("rn") == 1)
        .select("src", F.col("dst").alias("top_next"), F.col("p_fx").alias("top_next_p_fx"))
    )
    selfp = tfx.filter(F.col("src") == F.col("dst")).select(
        "src", F.col("p_fx").alias("self_raw")
    )
    return (
        types.join(rowtot, types["event_type"] == rowtot["src"], "left")
        .drop(rowtot["src"])
        .join(selfp, types["event_type"] == selfp["src"], "left")
        .drop(selfp["src"])
        .join(top, types["event_type"] == top["src"], "left")
        .drop(top["src"])
        .join(pi, "event_type")
        .select(
            "event_type",
            F.coalesce("tot", F.lit(0).cast("long")).alias("n_out"),
            F.coalesce("self_raw", F.lit(0).cast("long")).alias("self_p_fx"),
            "top_next",
            "top_next_p_fx",
            F.col("pi").alias("pi_fx"),
        )
        .orderBy("event_type")
    )

# ---------------------------------------------------------------------------
# q198 — RFM customer segmentation: the canonical BI cohort cut —
# recency / frequency / monetary quintiles under total orders, with the
# standard named segments. Quintile cuts are NTILE under a total order
# (metric, then custkey), monetary is decimal-exact, recency is integer
# days vs the corpus horizon — every cut deterministic cross-engine
# ---------------------------------------------------------------------------
@register(
    "q198_rfm_segments",
    """
    WITH horizon AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
    rfm AS (
      SELECT o_custkey AS custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)), maxd)
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS monetary
      FROM orders CROSS JOIN horizon
      GROUP BY o_custkey, maxd
    ),
    scored AS (
      SELECT custkey, recency_days, n_orders, monetary,
             NTILE(5) OVER (ORDER BY recency_days, custkey) AS r_q,
             NTILE(5) OVER (ORDER BY n_orders DESC, custkey) AS f_q,
             NTILE(5) OVER (ORDER BY monetary DESC, custkey) AS m_q
      FROM rfm
    )
    SELECT custkey, CAST(recency_days AS INT) AS recency_days, n_orders,
           ROUND(monetary, 4) AS monetary,
           CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
           CAST(m_q AS INT) AS m_q,
           CASE
             WHEN r_q = 1 AND f_q <= 2 THEN 'champion'
             WHEN f_q <= 2 THEN 'loyal'
             WHEN r_q = 1 AND f_q >= 4 THEN 'new'
             WHEN r_q >= 4 AND f_q >= 4 THEN 'hibernating'
             WHEN r_q >= 4 THEN 'at_risk'
             ELSE 'regular'
           END AS segment
    FROM scored
    """,
    doc="RFM segmentation over orders: per-customer recency (integer "
    "days vs the corpus max date — one broadcast one-row horizon), "
    "frequency, and decimal-exact monetary value, cut into quintiles "
    "by NTILE under (metric, custkey) total orders, then the standard "
    "champion/loyal/new/at-risk/hibernating labeling. One orders "
    "shuffle on custkey; the three NTILEs share one customer-sized "
    "sort each — at 100 TB the quintile boundaries come from the q83 "
    "two-phase rank instead of a global NTILE, same cut points",
)
def q198_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators import total_order as _to
    from frontmatter_mcp_spark.operators.total_order import (
        ntile_from_rn,
        with_global_row_number,
    )

    o = load_table(spark, sf_dir, "orders")
    horizon = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    rfm = (
        o.crossJoin(F.broadcast(horizon))
        .groupBy(F.col("o_custkey").alias("custkey"), "maxd")
        .agg(
            F.datediff(F.max("maxd"), F.max(F.to_date("o_orderdate"))).alias(
                "recency_days"
            ),
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("monetary"),
        )
        .drop("maxd")
    )
    # The three NTILE(5) cuts ran as ONE customer-sized sort each in a
    # single task as empty-partitionBy windows. Instead: unpivot every
    # customer into (metric, value) rows with the value sign-normalized
    # to the requested direction, rank ALL THREE metrics in ONE
    # two-phase pass (monotone bucket = metric block * parts + the
    # metric's own min/max interpolation), recover the per-metric rank
    # as rn - (metric-1)*N (each block holds exactly N customers), and
    # pivot the quintiles back in one customer-keyed aggregate.
    rfm = hold(rfm)
    parts = _to._n_buckets(rfm)
    bounds = rfm.agg(
        F.min("recency_days").cast("double").alias("__mn1"),
        F.max("recency_days").cast("double").alias("__mx1"),
        F.min(-F.col("n_orders")).cast("double").alias("__mn2"),
        F.max(-F.col("n_orders")).cast("double").alias("__mx2"),
        F.min(-F.col("monetary")).alias("__mn3"),
        F.max(-F.col("monetary")).alias("__mx3"),
    )
    stacked = rfm.select(
        "custkey",
        "recency_days",
        "n_orders",
        "monetary",
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("m"),
                    F.col("recency_days").cast("double").alias("v"),
                ),
                F.struct(
                    F.lit(2).alias("m"),
                    (-F.col("n_orders")).cast("double").alias("v"),
                ),
                F.struct(
                    F.lit(3).alias("m"), (-F.col("monetary")).alias("v")
                ),
            )
        ).alias("__s"),
    ).select("*", F.col("__s.m").alias("__m"), F.col("__s.v").alias("__v"))
    stacked = stacked.crossJoin(F.broadcast(bounds))
    in_metric = _to._bucket_expr(
        F.col("__v"),
        F.when(F.col("__m") == 1, F.col("__mn1"))
        .when(F.col("__m") == 2, F.col("__mn2"))
        .otherwise(F.col("__mn3")),
        F.when(F.col("__m") == 1, F.col("__mx1"))
        .when(F.col("__m") == 2, F.col("__mx2"))
        .otherwise(F.col("__mx3")),
        parts,
        True,
    )
    ranked = with_global_row_number(
        stacked,
        [("__m", True), ("__v", True), ("custkey", True)],
        out="__rn",
        bucket=(F.col("__m").cast("long") - 1) * parts + in_metric,
        total_out="__tot3",
    )
    n_cust = (F.col("__tot3") / 3).cast("long")
    q = ntile_from_rn(
        F.col("__rn") - (F.col("__m").cast("long") - 1) * n_cust, n_cust, 5
    )
    scored = ranked.groupBy("custkey").agg(
        F.first("recency_days").alias("recency_days"),
        F.first("n_orders").alias("n_orders"),
        F.first("monetary").alias("monetary"),
        F.max(F.when(F.col("__m") == 1, q)).alias("r_q"),
        F.max(F.when(F.col("__m") == 2, q)).alias("f_q"),
        F.max(F.when(F.col("__m") == 3, q)).alias("m_q"),
    )
    seg = (
        F.when((F.col("r_q") == 1) & (F.col("f_q") <= 2), "champion")
        .when(F.col("f_q") <= 2, "loyal")
        .when((F.col("r_q") == 1) & (F.col("f_q") >= 4), "new")
        .when((F.col("r_q") >= 4) & (F.col("f_q") >= 4), "hibernating")
        .when(F.col("r_q") >= 4, "at_risk")
        .otherwise("regular")
    )
    return scored.select(
        "custkey",
        F.col("recency_days").cast("int").alias("recency_days"),
        "n_orders",
        F.round("monetary", 4).alias("monetary"),
        F.col("r_q").cast("int").alias("r_q"),
        F.col("f_q").cast("int").alias("f_q"),
        F.col("m_q").cast("int").alias("m_q"),
        seg.alias("segment"),
    )

# ---------------------------------------------------------------------------
# q199 — top behavioral paths: the most common 3-step event sequences
# per user (the "what do users actually do" path-analysis view that
# complements q193's one-step transition matrix and q74's fixed-target
# funnel) — two LAG windows, one trigram aggregate, total-order top-k
# ---------------------------------------------------------------------------
@register(
    "q199_top_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type AS t3,
             LAG(event_type, 1) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t2,
             LAG(event_type, 2) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t1
      FROM events
    ),
    tri AS (
      SELECT t1 || ' > ' || t2 || ' > ' || t3 AS path,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM seq WHERE t1 IS NOT NULL GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM tri)
    SELECT path, n, n_users, ROUND(CAST(n AS DOUBLE) / total, 6) AS share
    FROM tri CROSS JOIN tot
    ORDER BY n DESC, path LIMIT 20
    """,
    doc="top-20 three-step user paths: trigrams of each user's event "
    "sequence under the (ts, event_id) total order (two LAGs share one "
    "window sort), aggregated with distinct-user support and share of "
    "all trigrams, top-k under (count desc, path) total order. One "
    "user-keyed window pass, one |types|^3-bounded aggregate, "
    "TakeOrderedAndProject for the limit",
)
def q199_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("t3"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.lag("event_type", 2).over(w).alias("t1"),
    ).filter(F.col("t1").isNotNull())
    # tri feeds two consumers with different projections (the share
    # denominator prunes n_users), so without a pin the corpus window
    # pass runs twice — the q75/q90 lesson
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -16% (0.65->0.55)
    tri = hold(
        seq.groupBy(F.concat_ws(" > ", "t1", "t2", "t3").alias("path")).agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )
    tot = tri.agg(F.sum("n").cast("long").alias("total"))
    return (
        tri.crossJoin(F.broadcast(tot))
        .select(
            "path",
            "n",
            "n_users",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
        )
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )

# ---------------------------------------------------------------------------
# q207 — cross-table AS-OF enrichment: every order annotated with the
# customer's most recent event STRICTLY before the order timestamp —
# the feature-engineering join (behavioral recency at decision time)
# done with the q18/q188 union+window rewrite instead of a per-row
# subquery: one shuffle on the user key, one ordered window pass
# ---------------------------------------------------------------------------
@register(
    "q207_order_asof_enrichment",
    """
    WITH u AS (
      SELECT user_id AS k, ts, 1 AS kind, event_type, event_id,
             CAST(NULL AS BIGINT) AS okey
      FROM events
      UNION ALL
      SELECT o_custkey, o_orderdate, 0, CAST(NULL AS VARCHAR),
             CAST(NULL AS BIGINT), o_orderkey
      FROM orders
    ),
    w AS (
      SELECT k, ts, kind, okey,
             last_value(event_type IGNORE NULLS) OVER
               (PARTITION BY k ORDER BY ts, kind, COALESCE(event_id, okey)
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_type,
             last_value(CASE WHEN kind = 1 THEN epoch_us(ts) END IGNORE NULLS)
               OVER
               (PARTITION BY k ORDER BY ts, kind, COALESCE(event_id, okey)
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_us
      FROM u
    )
    SELECT okey AS o_orderkey, k AS custkey,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS order_ts,
           last_type,
           CAST(CASE WHEN last_us IS NOT NULL
                     THEN (epoch_us(ts) - last_us) // 60000000 END AS BIGINT)
             AS gap_minutes
    FROM w WHERE kind = 0
    """,
    doc="as-of join ACROSS tables (orders x events on the shared user "
    "key): each order picks up the type and integer-minute recency of "
    "the customer's latest strictly-earlier event via the union+window "
    "rewrite — order rows sort BEFORE events at equal timestamps "
    "(kind 0 < 1), so same-instant events are excluded by "
    "construction, and last_value IGNORE NULLS carries the event "
    "state forward. One exchange on the user key, one window pass, "
    "no per-row subquery and no range join — the q18 discipline "
    "generalized to two tables. Customers with no prior events get "
    "NULLs (left-join semantics for free)",
)
def q207_order_asof_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    u = e.select(
        F.col("user_id").alias("k"),
        "ts",
        F.lit(1).alias("kind"),
        "event_type",
        "event_id",
        F.lit(None).cast("long").alias("okey"),
    ).unionAll(
        o.select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("ts"),
            F.lit(0).alias("kind"),
            F.lit(None).cast("string").alias("event_type"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("o_orderkey").alias("okey"),
        )
    )
    win = (
        W.partitionBy("k")
        .orderBy("ts", "kind", F.coalesce("event_id", "okey"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w = u.select(
        "k",
        "ts",
        "kind",
        "okey",
        F.last("event_type", ignorenulls=True).over(win).alias("last_type"),
        F.last(
            F.when(F.col("kind") == 1, F.unix_micros(F.col("ts").cast("timestamp"))),
            ignorenulls=True,
        )
        .over(win)
        .alias("last_us"),
    )
    return w.filter(F.col("kind") == 0).select(
        F.col("okey").alias("o_orderkey"),
        F.col("k").alias("custkey"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("order_ts"),
        "last_type",
        F.when(
            F.col("last_us").isNotNull(),
            F.expr(
                "(unix_micros(cast(ts as timestamp)) - last_us) div 60000000"
            ),
        )
        .cast("long")
        .alias("gap_minutes"),
    )

# ---------------------------------------------------------------------------
# q210 — discount elasticity per brand: grouped OLS of quantity on
# discount over the lineitem facts — the classic "does discounting
# move volume" BI regression. Discounts are two-decimal and quantities
# integral, so every moment sum is EXACT in DECIMAL (no ln, no
# quantization loss — unlike q196's log-log fit); only the final
# closed-form slope touches doubles
# ---------------------------------------------------------------------------
@register(
    "q210_discount_elasticity",
    """
    WITH t AS (
      SELECT p.p_brand AS brand,
             CAST(l.l_discount AS DECIMAL(8,2)) AS x,
             CAST(l.l_quantity AS DECIMAL(8,2)) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    agg AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM t GROUP BY 1
    )
    SELECT brand, n,
           ROUND(sy / n, 6) AS mean_qty,
           ROUND(sx / n, 6) AS mean_discount,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept,
           ROUND(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (sx / n)
                 / (sy / n), 6) AS elasticity_at_mean
    FROM agg ORDER BY brand
    """,
    doc="grouped OLS of l_quantity on l_discount per part brand: the "
    "dimension join broadcasts, the five moment sums are map-side-"
    "combined DECIMAL aggregates (two-decimal discounts and integral "
    "quantities are exact in decimal — the sums carry NO float error, "
    "so this regression needs none of q196's quantization), and "
    "slope/intercept/point elasticity are one identical double chain. "
    "One fact scan, one brand-keyed exchange of 5 numbers per brand",
)
def q210_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    t = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        F.col("p_brand").alias("brand"),
        F.col("l_discount").cast("decimal(8,2)").alias("x"),
        F.col("l_quantity").cast("decimal(8,2)").alias("y"),
    )
    agg = t.groupBy("brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return agg.select(
        "brand",
        "n",
        F.round(sy / n, 6).alias("mean_qty"),
        F.round(sx / n, 6).alias("mean_discount"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(slope * (sx / n) / (sy / n), 6).alias("elasticity_at_mean"),
    ).orderBy("brand")

# ---------------------------------------------------------------------------
# q212 — cohort LTV curves: users grouped by entry month, purchase
# revenue accumulated by months-since-entry — the lifetime-value view
# that q73's retention counts lack a money dimension for. Month deltas
# are exact integer arithmetic (y*12+m), revenue sums decimal-exact,
# the cumulative curve one bounded window per cohort
# ---------------------------------------------------------------------------
@register(
    "q212_cohort_ltv",
    """
    WITH entry AS (
      SELECT user_id,
             MIN(CAST(date_part('year', ts) AS BIGINT) * 12
                 + CAST(date_part('month', ts) AS BIGINT)) AS m0
      FROM events GROUP BY 1
    ),
    sizes AS (SELECT m0, CAST(COUNT(*) AS BIGINT) AS n_users FROM entry GROUP BY 1),
    rev AS (
      SELECT e.m0,
             CAST(date_part('year', p.ts) AS BIGINT) * 12
               + CAST(date_part('month', p.ts) AS BIGINT) - e.m0 AS k,
             CAST(SUM(CAST(p.value AS DECIMAL(18,6))) AS DECIMAL(28,6))
               AS revenue
      FROM events p JOIN entry e USING (user_id)
      WHERE p.event_type = 'purchase'
      GROUP BY 1, 2
    ),
    curve AS (
      SELECT m0, k, revenue,
             SUM(revenue) OVER (PARTITION BY m0 ORDER BY k
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM rev
    )
    SELECT CAST(m0 // 12 AS INT) AS cohort_year,
           CAST(m0 % 12 + 1 AS INT) AS cohort_month,
           CAST(k AS INT) AS months_since,
           s.n_users,
           ROUND(CAST(revenue AS DOUBLE), 4) AS revenue,
           ROUND(CAST(cum AS DOUBLE), 4) AS cum_revenue,
           ROUND(CAST(cum AS DOUBLE) / s.n_users, 6) AS ltv_per_user
    FROM curve JOIN sizes s USING (m0)
    ORDER BY m0, k
    """,
    doc="cohort lifetime-value accumulation: entry month per user (an "
    "exact y*12+m integer, no interval arithmetic to disagree on), "
    "purchase revenue per (cohort, months-since) in decimal-exact "
    "sums, cumulated by one window over the bounded month axis, and "
    "normalized per cohort user. Note month-0 is the acquisition "
    "month. Corpus pays one user aggregate + one revenue aggregate; "
    "the curve runs on |cohorts| x |months| rows",
)
def q212_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    mexpr = (F.year("ts").cast("long") * 12 + F.month("ts").cast("long"))
    entry = e.groupBy("user_id").agg(F.min(mexpr).alias("m0"))
    sizes = entry.groupBy("m0").agg(F.count("*").cast("long").alias("n_users"))
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(entry, "user_id")
        .groupBy("m0", (mexpr - F.col("m0")).alias("k"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .alias("revenue")
        )
    )
    curve = rev.select(
        "m0",
        "k",
        "revenue",
        F.sum("revenue")
        .over(W.partitionBy("m0").orderBy("k").rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
    )
    return (
        curve.join(sizes, "m0")
        .select(
            F.expr("m0 div 12").cast("int").alias("cohort_year"),
            (F.col("m0") % 12 + 1).cast("int").alias("cohort_month"),
            F.col("k").cast("int").alias("months_since"),
            "n_users",
            F.round(F.col("revenue").cast("double"), 4).alias("revenue"),
            F.round(F.col("cum").cast("double"), 4).alias("cum_revenue"),
            F.round(F.col("cum").cast("double") / F.col("n_users"), 6).alias(
                "ltv_per_user"
            ),
        )
        .orderBy("cohort_year", "cohort_month", "months_since")
    )

# ---------------------------------------------------------------------------
# q218 — fulfillment SLA trends: ship-delay percentiles and on-time
# rate per order month — the supply-chain counterpart of q197's value
# bands. Delays are exact integer days; percentiles interpolate at
# binary fractions; the month axis bounds every group
# ---------------------------------------------------------------------------
@register(
    "q218_fulfillment_sla",
    """
    WITH d AS (
      SELECT strftime(time_bucket(INTERVAL '1 month', o.o_orderdate), '%Y-%m')
               AS order_month,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS delay_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT order_month,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           quantile_cont(delay_days, 0.5e0) AS p50_delay,
           quantile_cont(delay_days, 0.75e0) AS p75_delay,
           quantile_cont(delay_days, 0.9375e0) AS p94_delay,
           CAST(MAX(delay_days) AS INT) AS max_delay,
           ROUND(CAST(SUM(CASE WHEN delay_days <= 30 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS on_time_30d
    FROM d GROUP BY order_month ORDER BY order_month
    """,
    doc="order-to-ship SLA per order month: integer-day delays "
    "(order date to each lineitem's ship date), exact interpolated "
    "delay percentiles at binary fractions (0.5/0.75/15/16), the max, "
    "and the 30-day on-time rate. The orderkey join is the only "
    "corpus exchange (fact-to-fact — sort-merge at scale, exactly as "
    "TPC-H plans it); the month axis bounds the output. The dashboard "
    "that catches a fulfillment regression the week it starts",
)
def q218_fulfillment_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "order_month"
        ),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "delay_days"
        ),
    )
    return (
        d.groupBy("order_month")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.percentile("delay_days", F.lit(0.5)).alias("p50_delay"),
            F.percentile("delay_days", F.lit(0.75)).alias("p75_delay"),
            F.percentile("delay_days", F.lit(0.9375)).alias("p94_delay"),
            F.max("delay_days").cast("int").alias("max_delay"),
            F.round(
                F.sum((F.col("delay_days") <= 30).cast("int")).cast("double")
                / F.count("*"),
                6,
            ).alias("on_time_30d"),
        )
        .orderBy("order_month")
    )

# ---------------------------------------------------------------------------
# q219 — behavioral diversity profile: per-user Gini-Simpson diversity
# of the event-type mix (1 - sum p_i^2), bucketed into a population
# histogram. The exact-rational alternative to a Shannon-entropy
# profile — no ln anywhere, so the statistic is a pure integer ratio
# ---------------------------------------------------------------------------
@register(
    "q219_behavior_diversity",
    """
    WITH uc AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    u AS (
      SELECT user_id,
             CAST(SUM(c) AS BIGINT) AS total,
             CAST(SUM(c * c) AS BIGINT) AS s2,
             CAST(COUNT(*) AS INT) AS n_types
      FROM uc GROUP BY 1
    ),
    d AS (
      SELECT user_id, n_types, total,
             1e0 - CAST(s2 AS DOUBLE) / (CAST(total AS DOUBLE) * total)
               AS diversity
      FROM u
    )
    SELECT CAST(FLOOR(diversity * 10e0) AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(total) AS BIGINT) AS n_events,
           ROUND(MIN(diversity), 6) AS min_diversity,
           ROUND(MAX(diversity), 6) AS max_diversity,
           ROUND(CAST(SUM(CAST(n_types AS BIGINT)) AS DOUBLE) / COUNT(*), 6)
             AS mean_types
    FROM d GROUP BY 1 ORDER BY 1
    """,
    doc="Gini-Simpson behavioral diversity per user (1 - sum(c_i^2)/"
    "T^2 — the collision-probability complement, exact integer "
    "numerators, no ln), histogrammed into diversity deciles with "
    "user/event mass and mean type breadth per bucket. decile 0 = "
    "single-minded users, 7+ = uniform across all five types (max "
    "diversity 0.8). Two map-side-combined aggregates sharing the "
    "user key; the floor(d*10) bucketing is deterministic because "
    "diversity is an exact double ratio of integers",
)
def q219_behavior_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    uc = e.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    u = uc.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
        F.count("*").cast("int").alias("n_types"),
    )
    d = u.select(
        "n_types",
        "total",
        (
            1.0
            - F.col("s2").cast("double")
            / (F.col("total").cast("double") * F.col("total"))
        ).alias("diversity"),
    )
    return (
        d.groupBy(F.floor(F.col("diversity") * 10.0).cast("int").alias("decile"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("total").cast("long").alias("n_events"),
            F.round(F.min("diversity"), 6).alias("min_diversity"),
            F.round(F.max("diversity"), 6).alias("max_diversity"),
            F.round(
                F.sum(F.col("n_types").cast("long")).cast("double") / F.count("*"),
                6,
            ).alias("mean_types"),
        )
        .orderBy("decile")
    )

# ---------------------------------------------------------------------------
# q220 — session entry/exit matrix: where sessions start, where they
# die, and how often they bounce — the web-analytics flow view built
# on q19/q52's 30-minute gap sessionization. One window chain shares
# the user-key sort; the matrix is |types|^2-bounded
# ---------------------------------------------------------------------------
@register(
    "q220_session_entry_exit",
    """
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess
      FROM g
    ),
    marked AS (
      SELECT DISTINCT user_id, sess,
             FIRST_VALUE(event_type) OVER w AS entry_type,
             LAST_VALUE(event_type) OVER w AS exit_type,
             COUNT(*) OVER w AS n_events
      FROM s
      WINDOW w AS (PARTITION BY user_id, sess ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT entry_type, exit_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6) AS mean_events
    FROM marked GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="session flow matrix: 30-minute gap sessionization (the q19/"
    "q52 rule, same (ts, event_id) total order), each session's entry "
    "and exit event types from one full-frame window, then the "
    "|types|^2 matrix of session counts, single-event bounces, and "
    "mean session depth. The sessionize and mark windows share the "
    "user-key exchange; the distinct collapses to one row per "
    "session before the bounded matrix aggregate",
)
def q220_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            (us - F.lag(us).over(ow) > 1_800_000_000)
            | F.lag("ts").over(ow).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    s = g.withColumn(
        "sess", F.sum("is_new").over(ow.rowsBetween(W.unboundedPreceding, 0))
    )
    fw = (
        W.partitionBy("user_id", "sess")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    marked = s.select(
        "user_id",
        "sess",
        F.first("event_type").over(fw).alias("entry_type"),
        F.last("event_type").over(fw).alias("exit_type"),
        F.count("*").over(fw).alias("n_events"),
    ).distinct()
    return (
        marked.groupBy("entry_type", "exit_type")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum((F.col("n_events") == 1).cast("int"))
            .cast("long")
            .alias("n_bounces"),
            F.round(
                F.sum("n_events").cast("double") / F.count("*"), 6
            ).alias("mean_events"),
        )
        .orderBy("entry_type", "exit_type")
    )

# ---------------------------------------------------------------------------
# q221 — concurrent-session load curve: how many 30-minute-gap
# sessions are simultaneously open in each hour — q174's +1/-1 sweep
# applied to DERIVED intervals (the q220 sessions), i.e. the capacity-
# planning number a connection-pool or serving tier is sized from
# ---------------------------------------------------------------------------
@register(
    "q221_concurrent_sessions",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess
      FROM g
    ),
    spans AS (
      SELECT user_id, sess,
             time_bucket(INTERVAL '1 hour', MIN(ts)) AS h0,
             time_bucket(INTERVAL '1 hour',
                         MAX(ts) + INTERVAL '30 minutes') + INTERVAL '1 hour'
               AS h1
      FROM s GROUP BY 1, 2
    ),
    bounds AS (
      SELECT h0 AS hour, 1 AS delta FROM spans
      UNION ALL
      SELECT h1, -1 FROM spans
    ),
    hourly AS (
      SELECT hour, CAST(SUM(delta) AS BIGINT) AS delta,
             CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS starts
      FROM bounds GROUP BY 1
    )
    SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour, starts,
           CAST(SUM(delta) OVER (ORDER BY hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS active
    FROM hourly ORDER BY hour
    """,
    doc="hourly concurrent-session curve: sessions from the q19/q52 "
    "30-minute gap rule become [first event hour, last event + 30min "
    "hour] intervals, each contributing +1/-1 boundary deltas, and "
    "ONE running sum over the bounded hour axis yields simultaneous "
    "open sessions — O(sessions + hours) against the O(sessions x "
    "hours) stabbing join a naive plan writes (the q174 rewrite over "
    "derived intervals). Peak `active` is the serving-capacity "
    "number. One user-key window chain + one session aggregate; the "
    "final window runs over hours only",
)
def q221_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (us - F.lag(us).over(ow) > 1_800_000_000)
            | F.lag("ts").over(ow).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    s = g.withColumn(
        "sess", F.sum("is_new").over(ow.rowsBetween(W.unboundedPreceding, 0))
    )
    spans = s.groupBy("user_id", "sess").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        (
            F.date_trunc(
                "hour", F.max("ts") + F.expr("interval 30 minutes")
            )
            + F.expr("interval 1 hour")
        ).alias("h1"),
    )
    bounds = spans.select(F.col("h0").alias("hour"), F.lit(1).alias("delta")).unionAll(
        spans.select(F.col("h1").alias("hour"), F.lit(-1).alias("delta"))
    )
    hourly = bounds.groupBy("hour").agg(
        F.sum("delta").cast("long").alias("delta"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("starts"),
    )
    return hourly.select(
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "starts",
        F.sum("delta")
        .over(W.orderBy("hour").rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("active"),
    ).orderBy("hour")

# ---------------------------------------------------------------------------
# q225 — precedence matrix: for every event-type pair (a, b), in how
# many sessions does a occur strictly before b — the any-gap ordering
# signal q199's adjacent trigrams cannot see, and the lift against
# the independence baseline. First-occurrence times make it one
# bounded comparison per (session, pair), never a pair scan of events
# ---------------------------------------------------------------------------
# Shared with q258 (the streaming twin): the batch fixpoint both the
# q225 plan and the streaming session-window pipeline must reproduce.
PRECEDENCE_ORACLE_SQL = """
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess
      FROM g
    ),
    firsts AS (
      SELECT user_id, sess, event_type, ts, event_id FROM (
        SELECT user_id, sess, event_type, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, sess, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM s
      ) WHERE rn = 1
    ),
    nsess AS (SELECT CAST(COUNT(DISTINCT (user_id, sess)) AS BIGINT) AS ns
              FROM firsts),
    occ AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sessions
            FROM firsts GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS before_type, b.event_type AS after_type,
             CAST(COUNT(*) AS BIGINT) AS n_precede
      FROM firsts a JOIN firsts b
        ON a.user_id = b.user_id AND a.sess = b.sess
       AND a.event_type <> b.event_type
       AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
      GROUP BY 1, 2
    )
    SELECT p.before_type, p.after_type, p.n_precede,
           oa.n_sessions AS n_before, ob.n_sessions AS n_after,
           ROUND(CAST(p.n_precede AS DOUBLE) * t.ns
                 / (CAST(oa.n_sessions AS DOUBLE) * ob.n_sessions), 6)
             AS lift
    FROM pairs p
    JOIN occ oa ON oa.event_type = p.before_type
    JOIN occ ob ON ob.event_type = p.after_type
    CROSS JOIN nsess t
    ORDER BY p.before_type, p.after_type
    """


@register(
    "q225_precedence_matrix",
    PRECEDENCE_ORACLE_SQL,
    doc="session precedence matrix: per (session, type) FIRST "
    "occurrence under the (ts, event_id) total order, then one |types|^2-bounded self-join per session "
    "counting strict a-before-b precedences, with lift = P(a<b) / "
    "(P(a)P(b)) against session-level independence. The any-gap "
    "ordering view that complements q199 (adjacent steps) and q193 "
    "(one-step transitions). Corpus pays the q19 sessionize chain + "
    "one (session, type) aggregate; the pair join runs on at most "
    "|types| rows per session",
)
def q225_precedence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            (us - F.lag(us).over(ow) > 1_800_000_000)
            | F.lag("ts").over(ow).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    s = g.withColumn(
        "sess", F.sum("is_new").over(ow.rowsBetween(W.unboundedPreceding, 0))
    )
    fw = W.partitionBy("user_id", "sess", "event_type").orderBy(
        "ts", "event_id"
    )
    firsts = hold(
        s.withColumn("rn", F.row_number().over(fw))
        .filter(F.col("rn") == 1)
        .select("user_id", "sess", "event_type", "ts", "event_id")
    )
    nsess = firsts.select("user_id", "sess").distinct().agg(
        F.count("*").cast("long").alias("ns")
    )
    occ = firsts.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    a = firsts.select(
        "user_id",
        "sess",
        F.col("event_type").alias("before_type"),
        F.col("ts").alias("ta"),
        F.col("event_id").alias("ia"),
    )
    b = firsts.select(
        F.col("user_id").alias("u2"),
        F.col("sess").alias("s2"),
        F.col("event_type").alias("after_type"),
        F.col("ts").alias("tb"),
        F.col("event_id").alias("ib"),
    )
    pairs = (
        a.join(
            b,
            (F.col("user_id") == F.col("u2"))
            & (F.col("sess") == F.col("s2"))
            & (F.col("before_type") != F.col("after_type"))
            & (
                (F.col("ta") < F.col("tb"))
                | ((F.col("ta") == F.col("tb")) & (F.col("ia") < F.col("ib")))
            ),
        )
        .groupBy("before_type", "after_type")
        .agg(F.count("*").cast("long").alias("n_precede"))
    )
    oa = occ.select(
        F.col("event_type").alias("before_type"),
        F.col("n_sessions").alias("n_before"),
    )
    ob = occ.select(
        F.col("event_type").alias("after_type"),
        F.col("n_sessions").alias("n_after"),
    )
    return (
        pairs.join(F.broadcast(oa), "before_type")
        .join(F.broadcast(ob), "after_type")
        .crossJoin(F.broadcast(nsess))
        .select(
            "before_type",
            "after_type",
            "n_precede",
            "n_before",
            "n_after",
            F.round(
                F.col("n_precede").cast("double") * F.col("ns")
                / (F.col("n_before").cast("double") * F.col("n_after")),
                6,
            ).alias("lift"),
        )
        .orderBy("before_type", "after_type")
    )

# ---------------------------------------------------------------------------
# q226 — watermark planning sweep: the observed-lateness table that
# picks a streaming watermark BEFORE deploying one — per candidate
# delay bound, how many events would arrive too late, at what rate,
# and how many event-time windows they would have corrected. Arrival
# lateness is derandomized from the event id (the q92/q125 md5
# discipline: 10% of events late, uniform 0-119 minutes)
# ---------------------------------------------------------------------------
_WM_CANDIDATES = [5, 15, 30, 60, 120]

def _watermark_sql() -> str:
    late_sel = _hash_bucket_duck("event_id", 1000)
    late_amt = _hash_bucket_duck("event_id || 'd'", 120)
    caps = ", ".join(str(w) for w in _WM_CANDIDATES)
    return f"""
    WITH lat AS (
      SELECT event_id, ts,
             CASE WHEN {late_sel} < 100 THEN {late_amt} ELSE 0 END AS delay_min
      FROM events
    ),
    w AS (SELECT unnest([{caps}]) AS wm),
    swept AS (
      SELECT w.wm,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN delay_min > w.wm THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
             CAST(COUNT(DISTINCT CASE WHEN delay_min > w.wm
                  THEN time_bucket(INTERVAL '1 hour', ts) END) AS BIGINT)
               AS n_windows_affected,
             CAST(MAX(delay_min) AS INT) AS max_delay
      FROM lat CROSS JOIN w
      GROUP BY 1
    )
    SELECT wm AS watermark_minutes, n_events, n_late,
           ROUND(CAST(n_late AS DOUBLE) / n_events, 6) AS late_rate,
           n_windows_affected, max_delay
    FROM swept ORDER BY wm
    """


@register(
    "q226_watermark_sweep",
    _watermark_sql(),
    doc="streaming watermark sizing from the lateness distribution: "
    "per candidate bound (5/15/30/60/120 min), the events that would "
    "be dropped as too-late, the late rate, and the distinct "
    "event-time hours those stragglers belong to (the state the "
    "watermark would have had to keep open). Lateness is md5-derived "
    "(10% late, uniform 0-119 min) so both engines see the identical "
    "arrival process; in production the delay column is observed "
    "arrival_ts - event_ts and the same one-scan sweep applies. All "
    "counters map-side combined over one scan x 5-row config table",
)
def q226_watermark_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    e = load_table(spark, sf_dir, "events")
    delay = F.when(
        hash_bucket(F.col("event_id"), 1000) < 100,
        hash_bucket(F.concat(F.col("event_id").cast("string"), F.lit("d")), 120),
    ).otherwise(0)
    lat = pin(
        e.select("ts", delay.alias("delay_min"))
    )
    w = spark.createDataFrame([(c,) for c in _WM_CANDIDATES], "wm int")
    late = F.col("delay_min") > F.col("wm")
    swept = (
        lat.crossJoin(F.broadcast(w))
        .groupBy("wm")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(late.cast("int")).cast("long").alias("n_late"),
            F.countDistinct(F.when(late, F.date_trunc("hour", "ts")))
            .cast("long")
            .alias("n_windows_affected"),
            F.max("delay_min").cast("int").alias("max_delay"),
        )
    )
    return swept.select(
        F.col("wm").alias("watermark_minutes"),
        "n_events",
        "n_late",
        F.round(F.col("n_late").cast("double") / F.col("n_events"), 6).alias(
            "late_rate"
        ),
        "n_windows_affected",
        "max_delay",
    ).orderBy("watermark_minutes")

# ---------------------------------------------------------------------------
# q227 — revenue concentration (Lorenz deciles): what share of total
# revenue the top-k% of customers carry — the whale-dependence view
# next to q173's per-key Gini. Decile cuts by NTILE under a total
# order, revenue decimal-exact, shares one double chain
# ---------------------------------------------------------------------------
@register(
    "q227_revenue_concentration",
    """
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6))
               AS rev
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT o_custkey, rev,
             NTILE(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
      FROM cust
    ),
    tot AS (SELECT CAST(SUM(rev) AS DECIMAL(28,6)) AS total FROM cust),
    d AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(rev) AS DECIMAL(28,6)) AS rev
      FROM ranked GROUP BY 1
    )
    SELECT CAST(decile AS INT) AS decile, n_customers,
           ROUND(CAST(rev AS DOUBLE), 4) AS revenue,
           ROUND(CAST(rev AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
           ROUND(CAST(SUM(rev) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / CAST(total AS DOUBLE), 6) AS cum_share
    FROM d CROSS JOIN tot ORDER BY decile
    """,
    doc="customer revenue Lorenz table: per-customer decimal-exact "
    "revenue, NTILE(10) deciles under (revenue desc, custkey) total "
    "order, per-decile share and the cumulative concentration curve "
    "(decile 1 cum_share is 'top-10% carries X%'). One custkey "
    "aggregate + one customer-sized sort; at 100 TB the decile "
    "boundaries come from the q83 two-phase rank",
)
def q227_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.total_order import (
        ntile_from_rn,
        with_global_row_number,
    )

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("decimal(28,6)")
        .alias("rev")
    )
    # NTILE(10) over every customer is a single-task sort as a plain
    # window; pin the customer table once and derive the decile from
    # the two-phase global rank + exact NTILE formula instead.
    cust = hold(cust)
    ranked = with_global_row_number(
        cust,
        [("rev", False), ("o_custkey", True)],
        out="__rn",
        total_out="__n",
    ).select("rev", ntile_from_rn(F.col("__rn"), F.col("__n"), 10).alias("decile"))
    tot = cust.agg(F.sum("rev").cast("decimal(28,6)").alias("total"))
    d = ranked.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("rev").cast("decimal(28,6)").alias("rev"),
    )
    cum = F.sum("rev").over(
        W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        d.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_customers",
            F.round(F.col("rev").cast("double"), 4).alias("revenue"),
            F.round(
                F.col("rev").cast("double") / F.col("total").cast("double"), 6
            ).alias("share"),
            F.round(
                cum.cast("double") / F.col("total").cast("double"), 6
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )

# ---------------------------------------------------------------------------
# q236 — Pareto frontier (skyline): the documents no other document
# dominates on (longer, higher lexical diversity) — the classic
# skyline operator, which Spark lacks natively, rewritten for 2D as
# ONE sort + ONE running-max window instead of the O(n^2) dominance
# self-join a naive plan writes
# ---------------------------------------------------------------------------
@register(
    "q236_pareto_frontier",
    r"""
    WITH m AS (
      SELECT doc_id, n_chars,
             CAST(len(list_distinct(list_filter(
               string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')))
               AS BIGINT) AS n_distinct_terms
      FROM documents
    ),
    swept AS (
      SELECT doc_id, n_chars, n_distinct_terms,
             MAX(n_distinct_terms) OVER (
               ORDER BY n_chars DESC, n_distinct_terms DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_seen
      FROM m
    )
    SELECT doc_id, n_chars, n_distinct_terms
    FROM swept
    WHERE best_seen IS NULL OR n_distinct_terms > best_seen
    ORDER BY n_chars DESC, doc_id
    """,
    doc="2D skyline over (n_chars, distinct-term count): a document is "
    "on the frontier iff no other document is at least as long AND "
    "strictly more lexically diverse — computed by sorting on the "
    "first criterion and keeping rows that beat the running max of "
    "the second (exact integers; the (n_chars desc, diversity desc, "
    "doc_id) total order makes equal-length groups resolve "
    "deterministically: only a group's best survives, and ties on "
    "both criteria keep the first doc_id). O(n log n) against the "
    "O(n^2) dominance join; the window is one global sort, which at "
    "100 TB becomes the q83 two-phase range sort with per-range "
    "running-max carry",
)
def q236_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    m = d.select(
        "doc_id",
        "n_chars",
        F.size(
            F.array_distinct(
                F.filter(
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
                    lambda x: x != F.lit(""),
                )
            )
        )
        .cast("long")
        .alias("n_distinct_terms"),
    )
    # The exclusive running max is the 2D skyline sweep; as a plain
    # empty-partitionBy window it funnels every document through one
    # task. Two-phase running max instead: the bounds pass is column-
    # pruned to n_chars (no tokenization), so the term-diversity UDF
    # chain runs twice (offsets + sweep) — measured cheaper at sf0.1
    # than either a pin (ADR-0007 cold fan-out race) or an eager hold: per-bucket local sweep +
    # broadcast per-bucket prefix maxima, null-exact on the first row.
    from frontmatter_mcp_spark.operators.total_order import with_global_cumagg

    swept = with_global_cumagg(
        m,
        [("n_chars", False), ("n_distinct_terms", False), ("doc_id", True)],
        F.col("n_distinct_terms"),
        agg="max",
        out="best_seen",
        include_current=False,
    )
    return (
        swept.filter(
            F.col("best_seen").isNull()
            | (F.col("n_distinct_terms") > F.col("best_seen"))
        )
        .select("doc_id", "n_chars", "n_distinct_terms")
        .orderBy(F.col("n_chars").desc(), "doc_id")
    )

# ---------------------------------------------------------------------------
# q235 — data-quality census across EVERY table in the catalog: null /
# blank / distinct counts per column, generated from one shared spec
# so the Spark plan and the oracle can never disagree about what was
# profiled. The first page of every data-platform quality report
# ---------------------------------------------------------------------------
_CENSUS_SPEC: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "n"), ("r_name", "s")],
    "nation": [("n_nationkey", "n"), ("n_name", "s"), ("n_regionkey", "n")],
    "customer": [
        ("c_custkey", "n"), ("c_name", "s"), ("c_nationkey", "n"),
        ("c_acctbal", "n"), ("c_mktsegment", "s"),
    ],
    "supplier": [("s_suppkey", "n"), ("s_name", "s"), ("s_nationkey", "n")],
    "part": [
        ("p_partkey", "n"), ("p_name", "s"), ("p_brand", "s"),
        ("p_type", "s"), ("p_size", "n"), ("p_retailprice", "n"),
    ],
    "orders": [
        ("o_orderkey", "n"), ("o_custkey", "n"), ("o_orderstatus", "s"),
        ("o_totalprice", "n"), ("o_orderdate", "t"), ("o_orderpriority", "s"),
    ],
    "lineitem": [
        ("l_orderkey", "n"), ("l_partkey", "n"), ("l_suppkey", "n"),
        ("l_quantity", "n"), ("l_extendedprice", "n"), ("l_discount", "n"),
        ("l_returnflag", "s"), ("l_shipdate", "t"),
    ],
    "events": [
        ("event_id", "n"), ("ts", "t"), ("user_id", "n"),
        ("event_type", "s"), ("value", "n"), ("props", "s"),
    ],
    "documents": [
        ("doc_id", "n"), ("text", "s"), ("lang", "s"),
        ("source", "s"), ("n_chars", "n"),
    ],
    "embeddings": [("vec_id", "n"), ("label", "n")],
}

def _census_sql() -> str:
    parts = []
    for t, cols in _CENSUS_SPEC.items():
        aggs = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
        rows = []
        for c, kind in cols:
            aggs.append(
                f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
                f" AS nn_{c}"
            )
            aggs.append(f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}")
            blank = (
                f"CAST(SUM(CASE WHEN trim({c}) = '' THEN 1 ELSE 0 END) AS BIGINT)"
                if kind == "s"
                else "CAST(0 AS BIGINT)"
            )
            aggs.append(f"{blank} AS nb_{c}")
            rows.append(
                f"SELECT '{t}' AS table_name, '{c}' AS column_name, n_rows,"
                f" nn_{c} AS n_null, nb_{c} AS n_blank, nd_{c} AS n_distinct"
                f" FROM agg_{t}"
            )
        parts.append((f"agg_{t} AS (SELECT {', '.join(aggs)} FROM {t})", rows))
    ctes = ",\n    ".join(p[0] for p in parts)
    unions = "\n      UNION ALL ".join(r for p in parts for r in p[1])
    return f"""
    WITH {ctes}
    SELECT * FROM ({unions})
    ORDER BY table_name, column_name
    """


@register(
    "q235_null_census",
    _census_sql(),
    doc="whole-catalog data-quality census: per (table, column), row "
    "count, NULLs, blank strings, and exact distinct counts — "
    "generated from ONE column spec shared with the Spark builder, so "
    "the profile and its oracle cannot drift. Counters are grouped into "
    "column groups of <=3 per scan (disjoint column sets, so parquet "
    "pruning keeps total I/O near one full-width pass) and the group "
    "aggregates run overlapped; the result is columns-sized. The "
    "report that catches a silently-nulled upstream field the day it "
    "happens; at 100 TB swap the exact distincts for q136's HLL "
    "registers, same shape",
)
def q235_null_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.holds import overlap

    # r12: the one-action union of 10 expand-heavy aggregates executed
    # its branches effectively serially, and the widest table (lineitem,
    # 8 distinct-count groups) pushed a 9-way Expand of every column
    # through a 3-partition scan. Split each table's counters into
    # column groups of <=3 (each COUNT(DISTINCT) Expand then carries
    # only its own group's columns, and parquet pruning makes the extra
    # scans read disjoint column sets — guide §2 "shuffle fewer bytes")
    # and run the group aggregates overlapped (guide §2.6 — the census
    # costs the slowest group, not the sum). Each collected row is a
    # ONE-ROW aggregate — the k-row collect class this workload already
    # accepts (q164's trace, k-means steps); the counters are computed
    # by the identical expressions, just in narrower aggregates, so
    # every output value is unchanged. Measured 5.42 -> 2.24 s at sf0.1
    # (hold-and-union assembly measured 3.46 s — the 17 checkpoint
    # materializations plus the union job cost more than they save).
    grp_n = 3
    specs: list[tuple[str, list[tuple[str, str]]]] = []
    for t, cols in _CENSUS_SPEC.items():
        for i in range(0, len(cols), grp_n):
            specs.append((t, cols[i : i + grp_n]))

    def build(t: str, grp: list[tuple[str, str]]):
        df = load_table(spark, sf_dir, t)
        aggs = [F.count("*").cast("long").alias("n_rows")]
        for c, kind in grp:
            aggs.append(
                F.sum(F.col(c).isNull().cast("int")).cast("long").alias(f"nn_{c}")
            )
            aggs.append(F.countDistinct(c).cast("long").alias(f"nd_{c}"))
            blank = (
                F.sum((F.trim(F.col(c)) == "").cast("int")).cast("long")
                if kind == "s"
                else F.lit(0).cast("long")
            )
            aggs.append(blank.alias(f"nb_{c}"))
        return df.agg(*aggs).collect()[0]

    # bound fan-out: the thunk count is data-spec-proportional (~20 for
    # the current census), so cap concurrent collect jobs rather than
    # submitting one unbounded thread per column group
    group_rows = overlap(
        *[(lambda tt=t, gg=g: build(tt, gg)) for t, g in specs],
        max_concurrency=8,
    )
    data = []
    for (t, grp), r in zip(specs, group_rows):
        for c, _ in grp:
            data.append(
                (t, c, r["n_rows"], r[f"nn_{c}"], r[f"nb_{c}"], r[f"nd_{c}"])
            )
    out = spark.createDataFrame(
        data,
        "table_name string, column_name string, n_rows long, "
        "n_null long, n_blank long, n_distinct long",
    )
    return out.orderBy("table_name", "column_name")

# ---------------------------------------------------------------------------
# q239 — frequent triples: which THREE event types co-occur in one
# session beyond what their singles predict — the k=3 extension of
# q154's pair itemsets, feasible exactly because the per-session
# distinct-type set is bounded (the 3-subsets are generated from the
# session's own type set, never by a corpus three-way self-join)
# ---------------------------------------------------------------------------
@register(
    "q239_itemset_triples",
    """
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess
      FROM g
    ),
    items AS (SELECT DISTINCT user_id, sess, event_type FROM s),
    nsess AS (SELECT CAST(COUNT(DISTINCT (user_id, sess)) AS BIGINT) AS ns
              FROM items),
    singles AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM items GROUP BY 1
    ),
    triples AS (
      SELECT a.event_type AS t1, b.event_type AS t2, c.event_type AS t3,
             CAST(COUNT(*) AS BIGINT) AS n_sessions
      FROM items a
      JOIN items b ON b.user_id = a.user_id AND b.sess = a.sess
                  AND b.event_type > a.event_type
      JOIN items c ON c.user_id = a.user_id AND c.sess = a.sess
                  AND c.event_type > b.event_type
      GROUP BY 1, 2, 3
    )
    SELECT t.t1, t.t2, t.t3, t.n_sessions,
           ROUND(CAST(t.n_sessions AS DOUBLE) / x.ns, 6) AS support,
           ROUND(CAST(t.n_sessions AS DOUBLE) * x.ns * x.ns
                 / (CAST(s1.n AS DOUBLE) * s2.n * s3.n), 6) AS lift
    FROM triples t
    JOIN singles s1 ON s1.event_type = t.t1
    JOIN singles s2 ON s2.event_type = t.t2
    JOIN singles s3 ON s3.event_type = t.t3
    CROSS JOIN nsess x
    ORDER BY t.t1, t.t2, t.t3
    """,
    doc="k=3 frequent itemsets over session type-sets: all ordered "
    "triples t1<t2<t3 counted by two self-joins on the (session, "
    "type) distinct set — bounded at C(|types|,3) rows per session, "
    "never a corpus-scale three-way join — with support and the "
    "three-way lift n*N^2/(n1*n2*n3) against session-level "
    "independence. The q154 basket analysis one order higher; the "
    "sessionize chain is shared with q220/q225",
)
def q239_itemset_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            (us - F.lag(us).over(ow) > 1_800_000_000)
            | F.lag("ts").over(ow).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    s = g.withColumn(
        "sess", F.sum("is_new").over(ow.rowsBetween(W.unboundedPreceding, 0))
    )
    items = hold(s.select("user_id", "sess", "event_type").distinct())
    nsess = items.select("user_id", "sess").distinct().agg(
        F.count("*").cast("long").alias("ns")
    )
    singles = items.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    a = items.select("user_id", "sess", F.col("event_type").alias("t1"))
    b = items.select(
        F.col("user_id").alias("u2"), F.col("sess").alias("s2"),
        F.col("event_type").alias("t2"),
    )
    c = items.select(
        F.col("user_id").alias("u3"), F.col("sess").alias("s3"),
        F.col("event_type").alias("t3"),
    )
    triples = (
        a.join(
            b,
            (F.col("user_id") == F.col("u2"))
            & (F.col("sess") == F.col("s2"))
            & (F.col("t2") > F.col("t1")),
        )
        .join(
            c,
            (F.col("user_id") == F.col("u3"))
            & (F.col("sess") == F.col("s3"))
            & (F.col("t3") > F.col("t2")),
        )
        .groupBy("t1", "t2", "t3")
        .agg(F.count("*").cast("long").alias("n_sessions"))
    )
    s1 = singles.select(F.col("event_type").alias("t1"), F.col("n").alias("n1"))
    s2_ = singles.select(F.col("event_type").alias("t2"), F.col("n").alias("n2"))
    s3_ = singles.select(F.col("event_type").alias("t3"), F.col("n").alias("n3"))
    return (
        triples.join(F.broadcast(s1), "t1")
        .join(F.broadcast(s2_), "t2")
        .join(F.broadcast(s3_), "t3")
        .crossJoin(F.broadcast(nsess))
        .select(
            "t1",
            "t2",
            "t3",
            "n_sessions",
            F.round(F.col("n_sessions").cast("double") / F.col("ns"), 6).alias(
                "support"
            ),
            F.round(
                F.col("n_sessions").cast("double") * F.col("ns") * F.col("ns")
                / (F.col("n1").cast("double") * F.col("n2") * F.col("n3")),
                6,
            ).alias("lift"),
        )
        .orderBy("t1", "t2", "t3")
    )

# ---------------------------------------------------------------------------
# q254 — bot heuristics: users flagged by the composite every abuse
# team starts from — extreme volume (MAD fence over per-user counts),
# collapsed behavioral diversity (q219's Gini-Simpson), and
# machine-regular inter-arrival gaps (MAD-to-median ratio of the
# user's own gap series). Exact integer/rational signals throughout
# ---------------------------------------------------------------------------
@register(
    "q254_bot_heuristics",
    """
    WITH ue AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    u AS (
      SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
             1e0 - CAST(SUM(c * c) AS DOUBLE)
                   / (CAST(SUM(c) AS DOUBLE) * SUM(c)) AS diversity
      FROM ue GROUP BY 1
    ),
    vol AS (
      SELECT CAST(median(n_events) AS DOUBLE) AS med FROM u
    ),
    volmad AS (
      SELECT CAST(median(ABS(u.n_events - v.med)) AS DOUBLE) AS mad,
             MAX(v.med) AS med
      FROM u CROSS JOIN vol v GROUP BY ()
    ),
    gaps AS (
      SELECT user_id,
             (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)) // 60000000 AS g
      FROM events
    ),
    greg AS (
      SELECT user_id,
             CAST(median(g) AS DOUBLE) AS med_gap,
             CAST(median(ABS(g - (SELECT median(g2.g) FROM gaps g2
                                  WHERE g2.user_id = gaps.user_id
                                    AND g2.g IS NOT NULL))) AS DOUBLE)
               AS mad_gap,
             CAST(COUNT(g) AS BIGINT) AS n_gaps
      FROM gaps WHERE g IS NOT NULL GROUP BY user_id
    )
    SELECT u.user_id, u.n_events,
           ROUND(u.diversity, 6) AS diversity,
           ROUND(g.med_gap, 4) AS median_gap_min,
           ROUND(g.mad_gap, 4) AS gap_mad,
           CAST(u.n_events > v.med + 5e0 * v.mad AS INT) AS volume_flag,
           CAST(u.diversity < 0.2e0 AND u.n_events >= 10 AS INT)
             AS monotony_flag,
           CAST(g.n_gaps >= 10 AND g.med_gap > 0
                AND g.mad_gap / g.med_gap < 0.1e0 AS INT) AS regularity_flag,
           CAST(u.n_events > v.med + 5e0 * v.mad AS INT)
             + CAST(u.diversity < 0.2e0 AND u.n_events >= 10 AS INT)
             + CAST(g.n_gaps >= 10 AND g.med_gap > 0
                    AND g.mad_gap / g.med_gap < 0.1e0 AS INT) AS bot_score
    FROM u
    JOIN greg g ON g.user_id = u.user_id
    CROSS JOIN volmad v
    WHERE CAST(u.n_events > v.med + 5e0 * v.mad AS INT)
        + CAST(u.diversity < 0.2e0 AND u.n_events >= 10 AS INT)
        + CAST(g.n_gaps >= 10 AND g.med_gap > 0
               AND g.mad_gap / g.med_gap < 0.1e0 AS INT) >= 1
    ORDER BY u.user_id
    """,
    doc="composite bot screen: per-user event volume against the "
    "population MAD fence, Gini-Simpson behavioral diversity under "
    "0.2 (single-minded automation), and inter-arrival regularity "
    "(per-user gap MAD under 10% of the median gap — humans are "
    "bursty, schedulers are not), emitted as three flags plus their "
    "sum for users tripping any. Medians over integers interpolate "
    "one exact midpoint; everything else is integer ratios. One "
    "(user, type) aggregate + one user-keyed gap window + tiny "
    "broadcast fences",
)
def q254_bot_heuristics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    ue = e.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    u = ue.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        (
            1.0
            - F.sum(F.col("c") * F.col("c")).cast("double")
            / (F.sum("c").cast("double") * F.sum("c"))
        ).alias("diversity"),
    )
    vol = u.agg(F.median("n_events").cast("double").alias("med"))
    volmad = (
        u.crossJoin(F.broadcast(vol))
        .agg(
            F.median(F.abs(F.col("n_events") - F.col("med")))
            .cast("double")
            .alias("mad"),
            F.max("med").alias("med"),
        )
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select("user_id", us.alias("us"), F.lag(us).over(ow).alias("p"))
        .filter(F.col("p").isNotNull())
        .select("user_id", F.expr("(us - p) div 60000000").alias("g"))
    )
    greg = gaps.groupBy("user_id").agg(
        F.median("g").cast("double").alias("med_gap"),
        F.count("*").cast("long").alias("n_gaps"),
    )
    gmad = (
        gaps.join(greg.select("user_id", "med_gap"), "user_id")
        .groupBy("user_id")
        .agg(
            F.median(F.abs(F.col("g") - F.col("med_gap")))
            .cast("double")
            .alias("mad_gap")
        )
    )
    j = (
        u.join(greg, "user_id")
        .join(gmad, "user_id")
        .crossJoin(F.broadcast(volmad))
    )
    vflag = (F.col("n_events") > F.col("med") + 5.0 * F.col("mad")).cast("int")
    mflag = ((F.col("diversity") < 0.2) & (F.col("n_events") >= 10)).cast("int")
    rflag = (
        (F.col("n_gaps") >= 10)
        & (F.col("med_gap") > 0)
        & (F.col("mad_gap") / F.col("med_gap") < 0.1)
    ).cast("int")
    return (
        j.filter(vflag + mflag + rflag >= 1)
        .select(
            "user_id",
            "n_events",
            F.round("diversity", 6).alias("diversity"),
            F.round("med_gap", 4).alias("median_gap_min"),
            F.round("mad_gap", 4).alias("gap_mad"),
            vflag.alias("volume_flag"),
            mflag.alias("monotony_flag"),
            rflag.alias("regularity_flag"),
            (vflag + mflag + rflag).alias("bot_score"),
        )
        .orderBy("user_id")
    )

# ---------------------------------------------------------------------------
# q261 — 3D skyline: q236's sort+running-max rewrite is 2D-only (a
# running max is a total order; three criteria are a partial order),
# so the 3D frontier uses the block-nested-loop shape — a LOCAL
# skyline per doc-hash bucket (each bucket a O(|bucket|^2) dominance
# anti-join — the per-partition prune an executor runs map-side),
# then the exact global frontier over the surviving candidates
# (skylines are distributive: the global skyline is a subset of the
# union of local skylines). Pure set semantics — no processing order
# anywhere, unlike q259's MG folds.
# ---------------------------------------------------------------------------
def _skyline3_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    bucket = hash_bucket_sql("doc_id", 16)
    dom = (
        "b.d1 >= a.d1 AND b.d2 >= a.d2 AND b.d3 >= a.d3 "
        "AND (b.d1 > a.d1 OR b.d2 > a.d2 OR b.d3 > a.d3)"
    )
    return f"""
    WITH m AS MATERIALIZED (
      SELECT doc_id, {bucket} AS bucket,
             n_chars AS d1,
             CAST(len(list_distinct(list_filter(
               string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')))
               AS BIGINT) AS d2,
             CAST(list_aggregate(list_transform(list_filter(
               string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''),
               x -> length(x)), 'max') AS BIGINT) AS d3
      FROM documents
    ),
    local AS MATERIALIZED (
      SELECT a.* FROM m a
      WHERE NOT EXISTS (
        SELECT 1 FROM m b WHERE b.bucket = a.bucket AND {dom}
      )
    )
    SELECT a.doc_id, a.d1 AS n_chars, a.d2 AS n_distinct_terms,
           a.d3 AS max_token_len
    FROM local a
    WHERE NOT EXISTS (SELECT 1 FROM local b WHERE {dom})
    ORDER BY a.d1 DESC, a.d2 DESC, a.d3 DESC, a.doc_id
    """


@register(
    "q261_skyline_3d",
    _skyline3_sql(),
    doc="3D Pareto frontier over (length, lexical diversity, longest "
    "token): the documents no other document weakly dominates on all "
    "three with at least one strict — q236's 2D running-max rewrite "
    "cannot express a 3-criteria partial order, so this is the "
    "distributed block-nested-loop skyline: per-bucket local frontier "
    "(each bucket one bounded O(b^2) dominance anti-join, the map-side "
    "prune), then the exact global anti-join over the tiny candidate "
    "union — sound because any global-skyline point is also a local-"
    "skyline point in its own bucket. All-integer criteria, set "
    "semantics (no order dependence). Corpus pays one narrow "
    "projection + one bucket-keyed self-join; the global pass runs on "
    "candidates only",
)
def q261_skyline_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    m = pin(
        d.select(
            "doc_id",
            hash_bucket(F.col("doc_id"), 16).alias("bucket"),
            F.col("n_chars").alias("d1"),
            F.size(F.array_distinct(w)).cast("long").alias("d2"),
            F.array_max(F.transform(w, lambda x: F.length(x)))
            .cast("long")
            .alias("d3"),
        )
    )

    def dominated_by(a, b):
        return (
            (b["d1"] >= a["d1"])
            & (b["d2"] >= a["d2"])
            & (b["d3"] >= a["d3"])
            & ((b["d1"] > a["d1"]) | (b["d2"] > a["d2"]) | (b["d3"] > a["d3"]))
        )

    mb = m.select(
        F.col("bucket").alias("bb"),
        F.col("d1").alias("bd1"),
        F.col("d2").alias("bd2"),
        F.col("d3").alias("bd3"),
    )
    b = F.struct(
        F.col("bd1").alias("d1"), F.col("bd2").alias("d2"), F.col("bd3").alias("d3")
    )
    a = F.struct(F.col("d1"), F.col("d2"), F.col("d3"))
    local = m.join(
        mb,
        (F.col("bucket") == F.col("bb")) & dominated_by(a, b),
        "left_anti",
    )
    lb = local.select(
        F.col("d1").alias("bd1"), F.col("d2").alias("bd2"), F.col("d3").alias("bd3")
    )
    sky = local.join(F.broadcast(lb), dominated_by(a, b), "left_anti")
    return sky.select(
        "doc_id",
        F.col("d1").alias("n_chars"),
        F.col("d2").alias("n_distinct_terms"),
        F.col("d3").alias("max_token_len"),
    ).orderBy(
        F.col("n_chars").desc(),
        F.col("n_distinct_terms").desc(),
        F.col("max_token_len").desc(),
        "doc_id",
    )

# ---------------------------------------------------------------------------
# q271 — continuation pairs: document A's token SUFFIX equals document
# B's PREFIX — the signature of one source text split across crawl
# records / shard boundaries, which no symmetric dedup op here flags
# (Jaccard/containment score low for a thin overlap, and q59's spans
# don't say "B continues A"). Seeded by an equi-join on the 3-token
# boundary gram, then the maximal overlap measured per candidate pair
# (capped at 16 tokens) by direct token-slice equality.
# ---------------------------------------------------------------------------
_CONT_SEED = 3

_CONT_MAX = 16

def _continuation_sql() -> str:
    k = _CONT_SEED
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    hb AS MATERIALIZED (
      SELECT doc_id, w, len(w) AS n,
             array_to_string(w[1:{k}], ' ') AS head,
             array_to_string(w[len(w)-{k}+1:], ' ') AS tail
      FROM toks WHERE len(w) >= {k} * 2
    ),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.w AS wa, a.n AS na, b.w AS wb, b.n AS nb
      FROM hb a JOIN hb b ON a.tail = b.head AND a.doc_id <> b.doc_id
    ),
    ov AS (
      SELECT id_a, id_b, wb,
             list_max([CASE WHEN wa[na-m+1:] = wb[1:m] THEN m END
                       FOR m IN generate_series({k},
                           LEAST({_CONT_MAX}, LEAST(na, nb)))]) AS overlap
      FROM cand
    )
    SELECT id_a, id_b, CAST(overlap AS BIGINT) AS overlap_tokens,
           array_to_string(wb[1:overlap], ' ') AS overlap_text
    FROM ov WHERE overlap IS NOT NULL
    ORDER BY id_a, id_b
    """


@register(
    "q271_continuation_pairs",
    _continuation_sql(),
    doc="shard-boundary continuation detection: pairs where doc A's "
    "token suffix equals doc B's prefix — seeded by one equi-join on "
    "the 3-token boundary gram (O(docs) shuffle on a tiny key), then "
    "the MAXIMAL overlap per candidate measured by token-slice "
    "equality up to 16 tokens. The asymmetric 'B continues A' signal "
    "that symmetric Jaccard/containment scores near zero; downstream "
    "a pipeline stitches such pairs back into one document before "
    "training (split articles otherwise truncate context mid-"
    "sentence). Candidate volume is collision-bounded; full token "
    "arrays ride only on candidate rows",
)
def q271_continuation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = _CONT_SEED
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    hb = (
        d.select("doc_id", wcol.alias("w"))
        .filter(F.size("w") >= k * 2)
        .select(
            "doc_id",
            "w",
            F.size("w").alias("n"),
            F.array_join(F.slice("w", 1, k), " ").alias("head"),
            F.array_join(
                F.slice(F.col("w"), F.size("w") - k + 1, k), " "
            ).alias("tail"),
        )
    )
    a = hb.select(
        F.col("doc_id").alias("id_a"),
        F.col("w").alias("wa"),
        F.col("n").alias("na"),
        "tail",
    )
    b = hb.select(
        F.col("doc_id").alias("id_b"),
        F.col("w").alias("wb"),
        F.col("n").alias("nb"),
        F.col("head").alias("headb"),
    )
    cand = a.join(
        b, (F.col("tail") == F.col("headb")) & (F.col("id_a") != F.col("id_b"))
    )
    overlap = F.array_max(
        F.filter(
            F.transform(
                F.sequence(
                    F.lit(k), F.least(F.lit(_CONT_MAX), F.least("na", "nb"))
                ),
                lambda m: F.when(
                    F.slice(F.col("wa"), F.col("na") - m + 1, m)
                    == F.slice(F.col("wb"), F.lit(1), m),
                    m,
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )
    return (
        cand.select("id_a", "id_b", "wb", overlap.alias("overlap"))
        .filter(F.col("overlap").isNotNull())
        .select(
            "id_a",
            "id_b",
            F.col("overlap").cast("long").alias("overlap_tokens"),
            F.array_join(
                F.slice(F.col("wb"), F.lit(1), F.col("overlap")), " "
            ).alias("overlap_text"),
        )
        .orderBy("id_a", "id_b")
    )

# ---------------------------------------------------------------------------
# q316 — 4D skyline: q261's block-nested-loop frontier extended to a
# four-criteria partial order, with the fourth axis (peak term
# repetition) deliberately ANTI-correlated with the second (distinct
# terms) so the frontier is a genuine trade-off surface, not a
# correlated ridge. All four criteria come from one token explode +
# one (doc, term) aggregate; the dominance machinery (per-bucket
# local anti-join, exact global pass over the candidate union) is
# dimension-generic — this is the "already generalizes" claim of the
# q261 design, demonstrated.
# ---------------------------------------------------------------------------
def _skyline4_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    bucket = hash_bucket_sql("doc_id", 16)
    dom = (
        "b.d1 >= a.d1 AND b.d2 >= a.d2 AND b.d3 >= a.d3 AND b.d4 >= a.d4 "
        "AND (b.d1 > a.d1 OR b.d2 > a.d2 OR b.d3 > a.d3 OR b.d4 > a.d4)"
    )
    return f"""
    WITH words AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(trim(lower(text)), '\\s+'),
               x -> x <> '')) AS t
      FROM documents
    ),
    tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
           FROM words GROUP BY 1, 2),
    feat AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS d2,
             CAST(MAX(length(t)) AS BIGINT) AS d3,
             CAST(MAX(c) AS BIGINT) AS d4
      FROM tf GROUP BY 1
    ),
    m AS MATERIALIZED (
      SELECT d.doc_id, {bucket.replace('doc_id', 'd.doc_id')} AS bucket,
             d.n_chars AS d1, f.d2, f.d3, f.d4
      FROM documents d JOIN feat f ON f.doc_id = d.doc_id
    ),
    local AS MATERIALIZED (
      SELECT a.* FROM m a
      WHERE NOT EXISTS (
        SELECT 1 FROM m b WHERE b.bucket = a.bucket AND {dom}
      )
    )
    SELECT a.doc_id, a.d1 AS n_chars, a.d2 AS n_distinct_terms,
           a.d3 AS max_token_len, a.d4 AS peak_term_count
    FROM local a
    WHERE NOT EXISTS (SELECT 1 FROM local b WHERE {dom})
    ORDER BY a.d1 DESC, a.d2 DESC, a.d3 DESC, a.d4 DESC, a.doc_id
    """


@register(
    "q316_skyline_4d",
    _skyline4_sql(),
    doc="4D Pareto frontier over (length, lexical diversity, longest "
    "token, peak term repetition): no other document weakly dominates "
    "on all four with one strict. Extends q261's block-nested-loop "
    "machinery to a four-criteria partial order — per doc-hash bucket "
    "a local dominance anti-join (the map-side prune), then the exact "
    "global anti-join over the candidate union, sound because "
    "skylines are distributive over partitions. The fourth axis "
    "(max within-doc term count) anti-correlates with diversity, so "
    "the frontier is a real trade-off surface; skyline cardinality "
    "growing with dimension is visible against q261. One token "
    "explode + one (doc, term) aggregate feeds all four criteria",
)
def q316_skyline_4d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    tf = (
        d.select("doc_id", F.explode(w).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    feat = tf.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("d2"),
        F.max(F.length("t")).cast("long").alias("d3"),
        F.max("c").cast("long").alias("d4"),
    )
    m = hold(
        d.select("doc_id", F.col("n_chars").alias("d1"))
        .join(feat, "doc_id")
        .select(
            "doc_id",
            hash_bucket(F.col("doc_id"), 16).alias("bucket"),
            "d1",
            "d2",
            "d3",
            "d4",
        )
    )

    def dominated_by(a, b):
        weak = (
            (b["d1"] >= a["d1"])
            & (b["d2"] >= a["d2"])
            & (b["d3"] >= a["d3"])
            & (b["d4"] >= a["d4"])
        )
        strict = (
            (b["d1"] > a["d1"])
            | (b["d2"] > a["d2"])
            | (b["d3"] > a["d3"])
            | (b["d4"] > a["d4"])
        )
        return weak & strict

    mb = m.select(
        F.col("bucket").alias("bb"),
        F.col("d1").alias("bd1"),
        F.col("d2").alias("bd2"),
        F.col("d3").alias("bd3"),
        F.col("d4").alias("bd4"),
    )
    b = F.struct(
        F.col("bd1").alias("d1"),
        F.col("bd2").alias("d2"),
        F.col("bd3").alias("d3"),
        F.col("bd4").alias("d4"),
    )
    a = F.struct(F.col("d1"), F.col("d2"), F.col("d3"), F.col("d4"))
    local = m.join(
        mb,
        (F.col("bucket") == F.col("bb")) & dominated_by(a, b),
        "left_anti",
    )
    lb = local.select(
        F.col("d1").alias("bd1"),
        F.col("d2").alias("bd2"),
        F.col("d3").alias("bd3"),
        F.col("d4").alias("bd4"),
    )
    sky = local.join(F.broadcast(lb), dominated_by(a, b), "left_anti")
    return sky.select(
        "doc_id",
        F.col("d1").alias("n_chars"),
        F.col("d2").alias("n_distinct_terms"),
        F.col("d3").alias("max_token_len"),
        F.col("d4").alias("peak_term_count"),
    ).orderBy(
        F.col("n_chars").desc(),
        F.col("n_distinct_terms").desc(),
        F.col("max_token_len").desc(),
        F.col("peak_term_count").desc(),
        "doc_id",
    )

# ---------------------------------------------------------------------------
# q329 — First-Fit-Decreasing sequence packing vs q80's next-fit: the
# classic 11/9-OPT bin-packing heuristic as a per-source Catalyst
# array fold (docs sorted by (tokens desc, doc_id), accumulator = the
# list of open-bin loads, each step placing into the FIRST bin that
# fits) beside the next-fit rule computed from the same order — how
# many 2048-token training shards the better heuristic saves.
# ---------------------------------------------------------------------------
_PACK_CAP = 2048


@register(
    "q329_ffd_packing",
    rf"""
    WITH docs AS (
      SELECT source, doc_id,
             CAST(LEAST(len(list_filter(
               string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')),
               {_PACK_CAP}) AS BIGINT) AS tok
      FROM documents
    ),
    ordered AS (
      SELECT source,
             list(tok ORDER BY tok DESC, doc_id) AS toks
      FROM docs GROUP BY 1
    ),
    ffd AS (
      SELECT source, toks,
             list_reduce(
               list_prepend(CAST([] AS BIGINT[]), list_transform(toks, x -> CAST([x] AS BIGINT[]))),
               (acc, x) -> CASE
                 WHEN len([i FOR i IN generate_series(1, len(acc))
                           IF acc[i] + x[1] <= {_PACK_CAP}]) > 0
                 THEN list_transform(acc, (v, i) -> CASE
                        WHEN i = [j FOR j IN generate_series(1, len(acc))
                                  IF acc[j] + x[1] <= {_PACK_CAP}][1]
                        THEN v + x[1] ELSE v END)
                 ELSE list_append(acc, x[1])
               END
             ) AS bins
      FROM ordered
    ),
    nf AS (
      SELECT source,
             list_reduce(
               list_prepend(CAST([0] AS BIGINT[]), list_transform(toks, x -> CAST([x] AS BIGINT[]))),
               (acc, x) -> CASE
                 WHEN acc[len(acc)] + x[1] <= {_PACK_CAP}
                 THEN list_concat(acc[1:len(acc)-1], [acc[len(acc)] + x[1]])
                 ELSE list_append(acc, x[1])
               END
             ) AS bins
      FROM ordered
    ),
    stats AS (
      SELECT f.source,
             CAST(len(f.bins) AS BIGINT) AS bins_ffd,
             CAST(len(n.bins) AS BIGINT) AS bins_nextfit,
             CAST(list_sum(f.bins) AS BIGINT) AS total_tokens
      FROM ffd f JOIN nf n USING (source)
    )
    SELECT source, total_tokens, bins_ffd, bins_nextfit,
           bins_nextfit - bins_ffd AS bins_saved,
           total_tokens * 1000000 // (bins_ffd * {_PACK_CAP})
             AS util_ffd_ppm,
           total_tokens * 1000000 // (bins_nextfit * {_PACK_CAP})
             AS util_nextfit_ppm
    FROM stats
    ORDER BY source
    """,
    doc="First-Fit-Decreasing sequence packing per source (2048-token "
    "bins, docs clamped to the cap and ordered (tokens desc, doc_id)): "
    "the accumulator is the open-bin load list, each fold step places "
    "into the first fitting bin or opens one — the 11/9-OPT classic "
    "as a declarative array fold on BOTH engines (DuckDB list_reduce "
    "with a list accumulator, Spark F.aggregate), next to the next-fit "
    "rule q80 uses, with bins saved and utilization for each as pure-"
    "integer ppm floor division (the ROUND form landed on exact .5e-6 "
    "boundaries — r11 audit). The "
    "fold is O(docs x open bins) per source on sorted arrays; at "
    "100 TB the same fold runs per (source, shard-of-source) with a "
    "final merge, trading a bounded packing slack for parallelism",
)
def q329_ffd_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    docs = d.select(
        "source",
        "doc_id",
        F.least(F.size(wcol).cast("long"), F.lit(_PACK_CAP).cast("long")).alias(
            "tok"
        ),
    )
    ordered = docs.groupBy("source").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("tok"), F.col("doc_id"))),
                asc=False,
            ),
            lambda s: s["tok"],
        ).alias("toks")
    )
    cap = F.lit(_PACK_CAP).cast("long")
    empty = F.array().cast("array<bigint>")

    def ffd_step(acc, x):
        # NB: F.sequence(1, size(acc)) would DESCEND ([1, 0]) on an empty
        # accumulator (Spark infers step -1), so fit positions come from
        # an index transform instead — empty acc -> empty candidate list
        fits = F.filter(
            F.transform(
                acc, lambda v, i: F.when(v + x <= cap, i + 1).otherwise(F.lit(0))
            ),
            lambda y: y > 0,
        )
        first = F.element_at(fits, 1)
        placed = F.transform(
            acc,
            lambda v, i: F.when(i + 1 == first, v + x).otherwise(v),
        )
        return F.when(F.size(fits) > 0, placed).otherwise(
            F.concat(acc, F.array(x))
        )

    def nf_step(acc, x):
        last = F.element_at(acc, F.size(acc))
        return F.when(
            last + x <= cap,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(last + x)
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    stats = ordered.select(
        "source",
        F.aggregate("toks", empty, ffd_step).alias("fbins"),
        F.aggregate(
            "toks", F.array(F.lit(0).cast("bigint")), nf_step
        ).alias("nbins"),
    ).select(
        "source",
        F.size("fbins").cast("long").alias("bins_ffd"),
        F.size("nbins").cast("long").alias("bins_nextfit"),
        F.aggregate(
            "fbins", F.lit(0).cast("bigint"), lambda a, b: a + b
        ).alias("total_tokens"),
    )
    return stats.select(
        "source",
        "total_tokens",
        "bins_ffd",
        "bins_nextfit",
        (F.col("bins_nextfit") - F.col("bins_ffd")).alias("bins_saved"),
        # utilization as pure-integer ppm floor division (`div` keeps it
        # in BIGINT — no double rounding): the ROUND form landed on
        # exact .5e-6 boundaries at sf0.01 (r11 boundary audit).
        # Scale bound: total_tokens * 1e6 stays in BIGINT only while
        # per-source token mass < 2^63/1e6 ~ 9.2e12 tokens (~9 PB of
        # 1-byte tokens per source) — far above the 100 TB design
        # point, but past it non-ANSI Spark wraps silently while the
        # DuckDB oracle promotes to HUGEINT and keeps going (they
        # diverge instead of failing together). If the corpus ever
        # approaches the bound, cast total_tokens to DECIMAL(38,0)
        # before scaling on BOTH engines.
        F.expr(
            f"total_tokens * 1000000L div (bins_ffd * {_PACK_CAP})"
        ).alias("util_ffd_ppm"),
        F.expr(
            f"total_tokens * 1000000L div (bins_nextfit * {_PACK_CAP})"
        ).alias("util_nextfit_ppm"),
    ).orderBy("source")

# ---------------------------------------------------------------------------
# q362 — VARIANT semi-structured access (Spark 4 engine surface): the
# events props JSON is parsed ONCE into the binary VARIANT type and
# fielded with variant_get path access — the lakehouse-era
# replacement for per-query from_json schemas (q14's approach needs
# the schema up front; VARIANT defers it to access time and keeps
# the binary form shreddable). The oracle reads the same paths with
# DuckDB's JSON extraction; a plan gate pins the VariantGet
# execution. Aggregates are exact integers.
# ---------------------------------------------------------------------------
@register(
    "q362_variant_json_stats",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           ROUND(CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                      AS DOUBLE)
                 / COUNT(CAST(json_extract(props, '$.k') AS BIGINT)), 6)
             AS mean_k
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    doc="semi-structured VARIANT access (Spark 4 engine surface): "
    "props parsed once with parse_json into the binary VARIANT form "
    "and fielded via try_variant_get('$.k') — the schema-on-access "
    "path that replaces q14's schema-up-front from_json for evolving "
    "event payloads (and the form engines shred into columns at "
    "scale). Per-type missing-key counts and exact integer k moments; "
    "oracle = DuckDB JSON path extraction of the same fields. The "
    "engine-feature pin for the VARIANT execution path beside q287's "
    "native recursion and the AQE/bloom/DPP pins",
)
def q362_variant_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    v = e.select("event_type", k.alias("k"))
    return (
        v.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("k").isNull().cast("int"))
            .cast("long")
            .alias("n_missing_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(
                F.sum("k").cast("double") / F.count("k"), 6
            ).alias("mean_k"),
        )
        .orderBy("event_type")
    )
