"""Streaming workload entries: Structured Streaming vs batch-SQL oracles.

Each query runs a real Structured Streaming job (file source -> windowed
aggregation -> memory sink, driven to completion synchronously) and the
oracle recomputes the same windows in batch SQL — streaming-batch
equivalence is exactly what Spark's unified model promises, so the
driver's hash-compare doubles as a semantics check of our windowing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from frontmatter_mcp_spark.streaming import events as ev
from frontmatter_mcp_spark.workload.registry import register

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"


@register(
    "q50_stream_tumbling",
    """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Structured Streaming tumbling 1h window counts == batch time_bucket",
)
def q50_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    out = ev.run_stream_to_batch(ev.tumbling_counts(stream), "stream_tumbling_out")
    return out.select(
        F.date_format(F.col("window.start"), _TS_FMT).alias("window_start"),
        "event_type",
        "n",
        "total_value",
    )


@register(
    "q51_stream_sliding",
    """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts) - o.off * INTERVAL '1 hour',
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n
    FROM events, UNNEST([0, 1]) AS o(off)
    GROUP BY 1
    """,
    doc="Structured Streaming sliding 2h/1h window counts == batch window expansion",
)
def q51_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    out = ev.run_stream_to_batch(ev.sliding_counts(stream), "stream_sliding_out")
    return out.select(
        F.date_format(F.col("window.start"), _TS_FMT).alias("window_start"),
        "n",
    )


@register(
    "q53_stream_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="streaming dropDuplicates with watermark == batch DISTINCT on the keys",
)
def q53_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    # watermarked stream dedup: state for a key can be dropped once the
    # watermark passes it; output only the keys (which row "wins" inside a
    # micro-batch is nondeterministic by design)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(
        ["user_id", "event_type"]
    )
    with ev._stream_state_partitions(spark):
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_dedup_out")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    return spark.table("stream_dedup_out").select("user_id", "event_type").distinct()


@register(
    "q54_stream_stateful_counters",
    """
    SELECT user_id, COUNT(*) AS n_events,
           MIN(event_id) AS first_event_id,
           MAX(event_id) AS last_event_id
    FROM events GROUP BY user_id
    """,
    doc="custom stateful operator (applyInPandasWithState per-user state "
    "machine) == batch aggregate at stream end",
)
def q54_stream_stateful_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    out = ev.stateful_user_counters(stream)
    with ev._stream_state_partitions(spark):
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("stream_stateful_out")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    # update mode can emit a row per micro-batch per key: keep the final
    # (maximal) state per user
    latest = spark.table("stream_stateful_out")
    return latest.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.min("first_event_id").alias("first_event_id"),
        F.max("last_event_id").alias("last_event_id"),
    )


@register(
    "q52_stream_sessions",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM g
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sess
    """,
    doc="Structured Streaming session_window(30m) == batch gap-based sessionization",
)
def q52_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    out = ev.run_stream_to_batch(ev.session_counts(stream), "stream_sessions_out")
    return out.select(
        "user_id",
        F.date_format(F.col("session_window.start"), _TS_FMT_US).alias("session_start"),
        F.date_format(F.col("session_window.end"), _TS_FMT_US).alias("session_end"),
        "n_events",
    )


@register(
    "q55_stream_interval_join",
    """
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '1 hour'
    """,
    doc="watermarked stream-stream interval join (clicks -> purchases "
    "within 1h, same user) == batch time-range self-join",
)
def q55_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    joined = ev.click_purchase_interval_join(stream, horizon="1 hour")
    with ev._stream_state_partitions(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_interval_join_out")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    return spark.table("stream_interval_join_out").select(
        "user_id", "click_id", "purchase_id"
    )


def _ingest_gate_sql() -> str:
    from frontmatter_mcp_spark.workload.dp_shared import _MIN_TOKENS, _PII_PATTERNS

    pii = (
        f"len(regexp_extract_all(text, '{_PII_PATTERNS['n_emails']}')) * 5"
        f" + len(regexp_extract_all(text, '{_PII_PATTERNS['n_long_digit_runs']}')) * 3"
        f" + len(regexp_extract_all(text, '{_PII_PATTERNS['n_phones']}')) * 4"
    )
    return f"""
    WITH u AS (
      SELECT DISTINCT source, md5(text) AS fp,
             ({pii}) = 0
             AND len(list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t <> '')) >= {_MIN_TOKENS} AS keep
      FROM documents
    )
    SELECT source, CAST(COUNT(*) AS INT) AS n_unique,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS INT) AS n_kept
    FROM u GROUP BY source
    """


@register(
    "q92_stream_ingest_gate",
    _ingest_gate_sql(),
    doc="streaming ingestion gate: per-source dedup (first-seen content "
    "fp) + quality verdicts + running counts in ONE streaming pass "
    "(dropDuplicates chained into an aggregation — two stateful "
    "operators) == batch DISTINCT + GROUP BY",
)
def q92_stream_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.streaming import ingest
    from frontmatter_mcp_spark.workload.dp_shared import _MIN_TOKENS, _PII_PATTERNS

    t = F.col("text")
    risk = (
        F.regexp_count(t, F.lit(_PII_PATTERNS["n_emails"])) * 5
        + F.regexp_count(t, F.lit(_PII_PATTERNS["n_long_digit_runs"])) * 3
        + F.regexp_count(t, F.lit(_PII_PATTERNS["n_phones"])) * 4
    )
    n_tokens = F.size(
        F.filter(F.split(F.trim(t), r"\s+", -1), lambda x: x != F.lit(""))
    )
    keep = (risk == 0) & (n_tokens >= _MIN_TOKENS)
    stream = ingest.read_documents_stream(spark, sf_dir)
    # The synthetic table has no arrival time, so one is DERIVED
    # deterministically (doc_id mod 1h of seconds past a fixed epoch).
    # The span (<=1h) is far inside the 24h retention, so every duplicate
    # pair is deduped and the result equals the batch DISTINCT oracle —
    # while the query itself runs the bounded-state operator
    # (dropDuplicatesWithinWatermark) a real deployment needs.
    stream = stream.withColumn(
        "arrival_ts",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") % 3600),
    )
    stats = ingest.unique_content_stats(stream, keep, ts_col="arrival_ts")
    return ev.run_stream_to_batch(stats, "stream_ingest_gate_out").select(
        "source", "n_unique", "n_kept"
    )


@register(
    "q104_stream_static_enrichment",
    """
    SELECT strftime(time_bucket(INTERVAL '1 hour', e.ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           c.c_mktsegment AS segment,
           COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1, 2
    """,
    doc="stream-STATIC enrichment join: events stream x broadcast "
    "customer-segment dimension (stateless join — no stream-join "
    "state), then watermarked tumbling aggregation per (window, "
    "segment) == batch join + time_bucket. The production shape for "
    "attaching reference data to a stream without a shuffle",
)
def q104_stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.tables import load_table

    stream = ev.read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    out = ev.run_stream_to_batch(
        ev.enriched_segment_counts(stream, dim), "stream_enrich_out"
    )
    return out.select(
        F.date_format(F.col("window.start"), _TS_FMT).alias("window_start"),
        "segment",
        "n",
        "total_value",
    )


@register(
    "q112_stream_topk_trending",
    """
    WITH c AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS w, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT w, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY w ORDER BY n DESC, event_type) AS rnk
      FROM c
    )
    SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start, rnk, event_type, n
    FROM r WHERE rnk <= 2
    """,
    doc="streaming trending top-k: watermarked 1-day tumbling counts per "
    "event type (the stateful streaming stage), then the per-window "
    "top-2 rank with a total-order tiebreak — the trending-topics shape. "
    "The rank runs on the window-count AGGREGATE (|windows| x |types| "
    "rows, not the event stream); a production deploy ranks per trigger "
    "inside foreachBatch. == batch time_bucket + ROW_NUMBER",
)
def q112_stream_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    stream = ev.read_events_stream(spark, sf_dir)
    out = ev.run_stream_to_batch(
        ev.tumbling_counts(stream, "1 day"), "stream_topk_out"
    )
    counts = out.select(
        F.date_format(F.col("window.start"), _TS_FMT).alias("window_start"),
        "event_type",
        "n",
    )
    rnk_w = W.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(rnk_w))
        .filter(F.col("rnk") <= 2)
        .select("window_start", "rnk", "event_type", "n")
    )


def _neardup_gate_sql() -> str:
    from frontmatter_mcp_spark.workload.dp_shared import _BANDS, _NUM_HASHES, _SHINGLES_CTE, _sig_exprs

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
    owners AS (SELECT band, bucket, MIN(doc_id) AS owner FROM bb GROUP BY 1, 2)
    SELECT bb.doc_id,
           CAST(SUM(CASE WHEN bb.doc_id > o.owner THEN 1 ELSE 0 END) AS INT)
             AS n_band_hits,
           SUM(CASE WHEN bb.doc_id > o.owner THEN 1 ELSE 0 END) > 0 AS is_neardup
    FROM bb JOIN owners o ON bb.band = o.band AND bb.bucket = o.bucket
    GROUP BY 1
    """


@register(
    "q133_stream_neardup_gate",
    _neardup_gate_sql(),
    doc="streaming NEAR-duplicate gate: per-row MinHash signatures (batch-"
    "identical keyed-md5 definition), LSH band buckets, and a per-bucket "
    "owner state machine (applyInPandasWithState under an event-time "
    "timeout — state is O(buckets per retention window)); a document is "
    "flagged the moment it shares any band bucket with an earlier arrival. "
    "The fuzzy counterpart of q92's exact-fingerprint gate. == batch rule "
    "doc_id > MIN(doc_id) over the doc's band buckets",
)
def q133_stream_neardup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.streaming import ingest

    stream = ingest.read_documents_stream(spark, sf_dir)
    # derived deterministic arrival (same recipe as q92): span <= 1h, far
    # inside the 24h retention, so no state evicts and the result equals
    # the batch owner rule — while the query exercises the bounded-state
    # operator a real deployment needs
    stream = stream.withColumn(
        "arrival_ts",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") % 3600),
    )
    hits = ingest.neardup_band_hits(
        stream, "doc_id", "text", ts_col="arrival_ts", retention="24 hours"
    )
    with ev._stream_state_partitions(spark):
        q = (
            hits.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_neardup_out")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    per_band = spark.table("stream_neardup_out")
    return per_band.groupBy("doc_id").agg(
        F.sum(F.col("hit").cast("int")).cast("int").alias("n_band_hits"),
        (F.sum(F.col("hit").cast("int")) > 0).alias("is_neardup"),
    )


def _stream_scoring_sql() -> str:
    from frontmatter_mcp_spark.workload.dp_eval import _classifier_sql

    return f"""
    SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN s.score_fx >= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass,
           CAST(SUM(s.score_fx) AS BIGINT) AS sum_score_fx
    FROM ({_classifier_sql()}) s JOIN documents d ON s.doc_id = d.doc_id
    GROUP BY d.source
    """


@register(
    "q114_stream_model_scoring",
    _stream_scoring_sql(),
    doc="streaming model inference: the q111 classifier is trained in "
    "BATCH, its 64-entry weight table is collected and carried into the "
    "document STREAM as a plan-literal map (the literal-centroid "
    "discipline applied to model serving), and each arriving document "
    "is scored by a narrow zero-join fold — then a per-source running "
    "(n_docs, n_pass, sum_score) aggregation. The batch-train -> "
    "broadcast -> stream-score loop every production quality gate runs. "
    "== the batch classifier replay joined back to sources",
)
def q114_stream_model_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators import classifier as clf
    from frontmatter_mcp_spark.streaming import ingest
    from frontmatter_mcp_spark.tables import load_table

    from frontmatter_mcp_spark.workload.registry import pin

    batch = load_table(spark, sf_dir, "documents")
    w_rows = clf.train_weights(
        batch,
        "doc_id",
        "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=64,
        iters=2,
        persist_fn=pin,
    ).collect()
    weights = {r.b: r.w for r in w_rows}

    stream = ingest.read_documents_stream(spark, sf_dir)
    scored = stream.select(
        "source", clf.literal_score_expr("text", weights, buckets=64).alias("z")
    )
    agg = scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("z") >= 0).cast("int")).cast("long").alias("n_pass"),
        F.sum("z").cast("long").alias("sum_score_fx"),
    )
    return ev.run_stream_to_batch(agg, "stream_scoring_out").select(
        "source", "n_docs", "n_pass", "sum_score_fx"
    )


@register(
    "q139_stream_session_assembly",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM g
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sess
    """,
    doc="custom session assembly on the Spark 4 transformWithState API "
    "(StatefulProcessor + typed ValueState + event-time timers — the "
    "arbitrary-payload upgrade over session_window q52 and the successor "
    "of applyInPandasWithState q54): per-user sessions folded in state, "
    "snapshot rows emitted per batch, state evicted by a gap timer; the "
    "keep-maximal post-fold makes the stream-end result equal batch "
    "gap-sessionization == the q52 CTE with raw MAX(ts) session ends",
)
def q139_stream_session_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    out = ev.session_assembly(stream)
    with ev._stream_state_partitions(spark):
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_session_assembly_out")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    snap = spark.table("stream_session_assembly_out")
    final = snap.groupBy("user_id", "start_us").agg(
        F.max("last_us").alias("last_us"), F.max("n_events").alias("n_events")
    )
    return final.select(
        "user_id",
        F.date_format(F.timestamp_micros(F.col("start_us")), _TS_FMT_US).alias(
            "session_start"
        ),
        F.date_format(F.timestamp_micros(F.col("last_us")), _TS_FMT_US).alias(
            "session_end"
        ),
        "n_events",
    )


@register(
    "q191_stream_skew_profile",
    """
    WITH uc AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS w, event_type, user_id,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT w, event_type, cnt,
             ROW_NUMBER() OVER (PARTITION BY w, event_type
                                ORDER BY cnt, user_id) AS ra,
             ROW_NUMBER() OVER (PARTITION BY w, event_type
                                ORDER BY cnt DESC, user_id DESC) AS rd
      FROM uc
    ),
    prof AS (
      SELECT w, event_type,
             CAST(SUM(cnt) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(ra * cnt) AS BIGINT) AS weighted,
             CAST(SUM(CASE WHEN rd = 1 THEN cnt ELSE 0 END) AS BIGINT) AS top1,
             CAST(SUM(CASE WHEN rd <= 10 THEN cnt ELSE 0 END) AS BIGINT) AS top10
      FROM ranked GROUP BY 1, 2
    )
    SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           n_events, n_users,
           ROUND(CAST(top1 AS DOUBLE) / n_events, 6) AS top1_share,
           ROUND(CAST(top10 AS DOUBLE) / n_events, 6) AS top10_share,
           ROUND(2e0 * weighted / (CAST(n_users AS DOUBLE) * n_events)
                 - (n_users + 1e0) / n_users, 6) AS gini,
           CAST(top1 * n_users > 4 * n_events AS INT) AS skewed
    FROM prof ORDER BY window_start, event_type
    """,
    doc="streaming twin of q173's key-skew profiler: the stateful "
    "streaming stage is a watermarked 1-day tumbling aggregation per "
    "(window, event_type, user) — the only corpus-sized state, bounded "
    "by the watermark — and the skew statistics (exact-integer Gini, "
    "top-1/top-10 load shares, the q78 salting trigger) run on that "
    "AGGREGATE (|windows| x |types| x |active users| rows, not the "
    "event stream), exactly as a production deploy computes them per "
    "trigger in foreachBatch (the q112 discipline). The per-window "
    "verdicts are the live dashboard that tells an operator WHEN a key "
    "went hot, not just that it is hot overall. == batch time_bucket + "
    "the q173 grouped-data Gini formula",
)
def q191_stream_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    stream = ev.read_events_stream(spark, sf_dir)
    per_user = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), "event_type", "user_id")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    uc = ev.run_stream_to_batch(per_user, "stream_skew_out").select(
        F.date_format(F.col("window.start"), _TS_FMT).alias("window_start"),
        "event_type",
        "user_id",
        "cnt",
    )
    wa = W.partitionBy("window_start", "event_type").orderBy("cnt", "user_id")
    wd = W.partitionBy("window_start", "event_type").orderBy(
        F.col("cnt").desc(), F.col("user_id").desc()
    )
    ranked = uc.select(
        "window_start",
        "event_type",
        "cnt",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    prof = ranked.groupBy("window_start", "event_type").agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_users"),
        F.sum(F.col("ra") * F.col("cnt")).cast("long").alias("weighted"),
        F.sum(F.when(F.col("rd") == 1, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("top1"),
        F.sum(F.when(F.col("rd") <= 10, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("top10"),
    )
    return prof.select(
        "window_start",
        "event_type",
        "n_events",
        "n_users",
        F.round(F.col("top1").cast("double") / F.col("n_events"), 6).alias(
            "top1_share"
        ),
        F.round(F.col("top10").cast("double") / F.col("n_events"), 6).alias(
            "top10_share"
        ),
        F.round(
            2.0 * F.col("weighted")
            / (F.col("n_users").cast("double") * F.col("n_events"))
            - (F.col("n_users") + 1.0) / F.col("n_users"),
            6,
        ).alias("gini"),
        (F.col("top1") * F.col("n_users") > 4 * F.col("n_events"))
        .cast("int")
        .alias("skewed"),
    ).orderBy("window_start", "event_type")


@register(
    "q222_stream_cusum_alarm",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type,
             list(struct_pack(day := strftime(day, '%Y-%m-%d'), n := n)
                  ORDER BY day) AS xs,
             CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1
    ),
    folded AS (
      SELECT event_type, n_days, total,
        list_reduce(
          list_prepend(
            struct_pack(max_s := CAST(0 AS BIGINT),
                        first_alarm := CAST(NULL AS VARCHAR),
                        n_alarms := CAST(0 AS BIGINT),
                        day := CAST(NULL AS VARCHAR),
                        d := CAST(0 AS BIGINT),
                        s := CAST(0 AS BIGINT)),
            list_transform(xs, x -> struct_pack(
              max_s := CAST(0 AS BIGINT),
              first_alarm := CAST(NULL AS VARCHAR),
              n_alarms := CAST(0 AS BIGINT),
              day := x.day,
              d := x.n * n_days - total - total // 4,
              s := CAST(0 AS BIGINT)))),
          (a, b) -> struct_pack(
            max_s := GREATEST(a.max_s,
                              GREATEST(CAST(0 AS BIGINT), a.s + b.d)),
            first_alarm := CASE
              WHEN a.first_alarm IS NULL
               AND GREATEST(CAST(0 AS BIGINT), a.s + b.d) > 3 * total
              THEN b.day ELSE a.first_alarm END,
            n_alarms := a.n_alarms + CASE
              WHEN GREATEST(CAST(0 AS BIGINT), a.s + b.d) > 3 * total
              THEN 1 ELSE 0 END,
            day := b.day,
            d := b.d,
            s := GREATEST(CAST(0 AS BIGINT), a.s + b.d))) AS r
      FROM series
    )
    SELECT event_type, CAST(n_days AS INT) AS n_days, total AS total_events,
           (r).max_s AS max_cusum,
           (r).first_alarm AS first_alarm_day,
           CAST((r).n_alarms AS INT) AS n_alarms
    FROM folded ORDER BY event_type
    """,
    doc="streaming drift alarm: q192's exact-integer one-sided CUSUM "
    "run on the output of a watermarked 1-day tumbling count — the "
    "stateful streaming stage holds only (window, type) counts "
    "(bounded by the watermark) and the fold runs per trigger on the "
    "windows-sized aggregate (the q191 foreachBatch discipline). "
    "Observed windows only — a silent day emits no window in a "
    "stream, so unlike batch q192 the detector sees arrival gaps "
    "only when a count row exists; the batch oracle folds the same "
    "observed-day series. == q192's arithmetic minus the gap fill",
)
def q222_stream_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    counts = ev.tumbling_counts(stream, "1 day")
    out = ev.run_stream_to_batch(counts, "stream_cusum_out")
    daily = out.select(
        "event_type",
        F.date_format(F.col("window.start"), "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n"),
    )
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "n"))).alias("xs"),
        F.sum("n").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_days"),
    )
    zero = F.lit(0).cast("long")
    elems = F.transform(
        "xs",
        lambda x: F.struct(
            x["day"].alias("day"),
            (
                x["n"] * F.col("n_days") - F.col("total") - F.expr("total div 4")
            ).alias("d"),
        ),
    )
    init = F.struct(
        zero.alias("max_s"),
        F.lit(None).cast("string").alias("first_alarm"),
        zero.alias("n_alarms"),
        F.lit(None).cast("string").alias("day"),
        zero.alias("d"),
        zero.alias("s"),
    )

    def merge(a, b):
        s_new = F.greatest(zero, a["s"] + b["d"])
        alarm = s_new > 3 * F.col("total")
        return F.struct(
            F.greatest(a["max_s"], s_new).alias("max_s"),
            F.when(a["first_alarm"].isNull() & alarm, b["day"])
            .otherwise(a["first_alarm"])
            .alias("first_alarm"),
            (a["n_alarms"] + F.when(alarm, 1).otherwise(0)).alias("n_alarms"),
            b["day"].alias("day"),
            b["d"].alias("d"),
            s_new.alias("s"),
        )

    folded = series.select(
        "event_type",
        F.col("n_days").cast("int").alias("n_days"),
        F.col("total").alias("total_events"),
        F.aggregate(elems, init, merge).alias("r"),
    )
    return folded.select(
        "event_type",
        "n_days",
        "total_events",
        F.col("r")["max_s"].alias("max_cusum"),
        F.col("r")["first_alarm"].alias("first_alarm_day"),
        F.col("r")["n_alarms"].cast("int").alias("n_alarms"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q258 — streaming twin of q225's precedence matrix: session assembly
# is the stateful streaming stage (session_window + collect_list,
# state bounded per open session by the gap/watermark), and the
# |types|^2-bounded precedence/lift math runs on the EMITTED sessions
# per trigger — the q112/q191 foreachBatch discipline. The oracle is
# byte-identical to q225's batch SQL: streaming session assembly must
# reproduce the batch sessionization fixpoint exactly.
# ---------------------------------------------------------------------------
def _precedence_oracle() -> str:
    from frontmatter_mcp_spark.workload.dp_business import PRECEDENCE_ORACLE_SQL

    return PRECEDENCE_ORACLE_SQL


@register(
    "q258_stream_precedence_matrix",
    _precedence_oracle(),
    doc="streaming precedence matrix: the stateful stage is session "
    "assembly — session_window(30m) + collect_list, state bounded per "
    "OPEN session (a closed session's rows leave state at emission) — "
    "and the precedence/lift computation runs on the emitted sessions: "
    "per-session FIRST occurrence per type under the (ts, event_id) "
    "total order, one |types|-per-session self-join, lift vs "
    "session-level independence. Oracle = q225's batch SQL verbatim, "
    "so the driver's hash gate proves streaming session assembly "
    "reproduces the batch sessionization fixpoint — the q52 "
    "equivalence promise extended to a downstream analytic",
)
def q258_stream_precedence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    sessions = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.collect_list(F.struct("ts", "event_id", "event_type")).alias("evs")
        )
    )
    out = ev.run_stream_to_batch(sessions, "stream_precedence_out")
    # per-trigger (foreachBatch) analytics on the emitted sessions: the
    # event stream never re-enters a shuffle — only session rows do
    exploded = out.select(
        F.col("session_window.start").alias("sess_start"),
        "user_id",
        F.explode("evs").alias("e"),
    )
    firsts = exploded.groupBy(
        "user_id", "sess_start", F.col("e.event_type").alias("event_type")
    ).agg(F.min(F.struct(F.col("e.ts"), F.col("e.event_id"))).alias("first"))
    nsess = (
        firsts.select("user_id", "sess_start")
        .distinct()
        .agg(F.count("*").cast("long").alias("ns"))
    )
    occ = firsts.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    a = firsts.select(
        "user_id",
        "sess_start",
        F.col("event_type").alias("before_type"),
        F.col("first.ts").alias("ta"),
        F.col("first.event_id").alias("ia"),
    )
    b = firsts.select(
        F.col("user_id").alias("u2"),
        F.col("sess_start").alias("s2"),
        F.col("event_type").alias("after_type"),
        F.col("first.ts").alias("tb"),
        F.col("first.event_id").alias("ib"),
    )
    pairs = (
        a.join(
            b,
            (F.col("user_id") == F.col("u2"))
            & (F.col("sess_start") == F.col("s2"))
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
# q278 — streaming audience-entropy monitor: per (1-day window, type),
# the Shannon entropy of the USER activity distribution and its
# exp(H) "effective audience" — the concentration dashboard dual to
# q191's Gini/top-share (entropy reads evenness, Gini reads
# inequality; an incident that swaps the whole audience for three
# bots moves both, a slow consolidation moves entropy first). Same
# state discipline: the watermarked (window, type, user) count is the
# only stateful stage; the entropy runs per trigger on the aggregate.
# ---------------------------------------------------------------------------
@register(
    "q278_stream_audience_entropy",
    """
    WITH uc AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS w, event_type, user_id,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2, 3
    ),
    h AS (
      SELECT w, event_type,
             CAST(SUM(cnt) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(CAST(cnt * ln(CAST(cnt AS DOUBLE)) AS DECIMAL(28,12)))
                  AS DOUBLE) AS clnc
      FROM uc GROUP BY 1, 2
    )
    SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           n_events, n_users,
           ROUND(ln(CAST(n_events AS DOUBLE)) - clnc / n_events, 6) + 0e0
             AS entropy,
           ROUND(exp(ln(CAST(n_events AS DOUBLE)) - clnc / n_events), 4)
             AS effective_users
    FROM h ORDER BY window_start, event_type
    """,
    doc="streaming audience-concentration monitor: watermarked 1-day "
    "tumbling (window, type, user) counts — the only stateful stage, "
    "bounded by the watermark — then per trigger the Shannon entropy "
    "of the activity distribution (DECIMAL-quantized c*ln c terms, "
    "q263 discipline) and exp(H) as the effective audience size. "
    "effective_users collapsing toward 1 while n_events holds is the "
    "bot-concentration alarm q254 screens for in batch. == batch "
    "time_bucket + the same aggregate entropy",
)
def q278_stream_audience_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    per_user = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), "event_type", "user_id")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    uc = ev.run_stream_to_batch(per_user, "stream_entropy_out").select(
        F.date_format(F.col("window.start"), _TS_FMT).alias("window_start"),
        "event_type",
        "cnt",
    )
    h = uc.groupBy("window_start", "event_type").agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_users"),
        F.sum(
            (F.col("cnt") * F.log(F.col("cnt").cast("double"))).cast(
                "decimal(28,12)"
            )
        )
        .cast("double")
        .alias("clnc"),
    )
    ent = F.log(F.col("n_events").cast("double")) - F.col("clnc") / F.col(
        "n_events"
    )
    return h.select(
        "window_start",
        "event_type",
        "n_events",
        "n_users",
        (F.round(ent, 6) + F.lit(0.0)).alias("entropy"),
        F.round(F.exp(ent), 4).alias("effective_users"),
    ).orderBy("window_start", "event_type")


# ---------------------------------------------------------------------------
# q288 — streaming TEMPLATE gate: q281's digit-normalized dedup as an
# ingestion operator — the stream is deduped on (source, md5(text
# with digit runs collapsed)), so the thousandth stamp of a template
# never reaches downstream state; per source the surviving template
# count and how many templates carry digit slots. Bounded state via
# dropDuplicatesWithinWatermark (q92's discipline); the digit-slot
# flag is a pure function of the NORMALIZED text, identical for every
# variant of a family, so the output is deterministic even though the
# surviving row is not.
# ---------------------------------------------------------------------------
@register(
    "q288_stream_template_gate",
    """
    WITH t AS (
      SELECT DISTINCT source,
             md5(regexp_replace(text, '[0-9]+', '#', 'g')) AS nfp,
             CASE WHEN regexp_replace(text, '[0-9]+', '#', 'g') LIKE '%#%'
                  THEN 1 ELSE 0 END AS has_digits
      FROM documents
    )
    SELECT source, CAST(COUNT(*) AS INT) AS n_templates,
           CAST(SUM(has_digits) AS INT) AS n_digit_templates
    FROM t GROUP BY source
    """,
    doc="streaming template-dedup gate: documents deduped on (source, "
    "digit-normalized fingerprint) under a 24h watermark "
    "(dropDuplicatesWithinWatermark — state bounded by retention, the "
    "q92 discipline), then per-source counts of surviving templates "
    "and of templates containing digit slots — the stream-side "
    "version of q281 that stops template storms AT INGESTION instead "
    "of in a batch sweep. == batch DISTINCT on the normalized key",
)
def q288_stream_template_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.streaming import ingest

    stream = ingest.read_documents_stream(spark, sf_dir)
    stream = stream.withColumn(
        "arrival_ts",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") % 3600),
    )
    norm = F.regexp_replace("text", "[0-9]+", "#")
    u = (
        stream.select(
            "source",
            F.md5(norm).alias("nfp"),
            norm.contains("#").cast("int").alias("has_digits"),
            "arrival_ts",
        )
        .withWatermark("arrival_ts", "24 hours")
        .dropDuplicatesWithinWatermark(["source", "nfp"])
    )
    stats = u.groupBy("source").agg(
        F.count("*").cast("int").alias("n_templates"),
        F.sum("has_digits").cast("int").alias("n_digit_templates"),
    )
    return ev.run_stream_to_batch(stats, "stream_template_gate_out").select(
        "source", "n_templates", "n_digit_templates"
    )


# ---------------------------------------------------------------------------
# q301 — streaming session funnel: per session_window, did the user
# progress signup -> click -> purchase in ORDER (first occurrences
# strictly increasing under the (ts, event_id) total order) — the
# real-time stage-reach dashboard of q74's batch funnel, on the q258
# session-assembly machinery (collect_list is the only stateful
# stage; step logic runs per trigger on emitted sessions).
# ---------------------------------------------------------------------------
@register(
    "q301_stream_session_funnel",
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
    firsts AS (
      SELECT user_id, sess, event_type,
             MIN(ROW(ts, event_id)) AS fk
      FROM s WHERE event_type IN ('signup', 'click', 'purchase')
      GROUP BY 1, 2, 3
    ),
    w AS (
      SELECT user_id, sess,
             MAX(CASE WHEN event_type = 'signup' THEN fk END) AS f1,
             MAX(CASE WHEN event_type = 'click' THEN fk END) AS f2,
             MAX(CASE WHEN event_type = 'purchase' THEN fk END) AS f3
      FROM firsts GROUP BY 1, 2
    ),
    staged AS (
      SELECT CASE
               WHEN f1 IS NOT NULL AND f2 IS NOT NULL AND f3 IS NOT NULL
                    AND f1 < f2 AND f2 < f3 THEN 3
               WHEN f1 IS NOT NULL AND f2 IS NOT NULL AND f1 < f2 THEN 2
               WHEN f1 IS NOT NULL THEN 1
               ELSE 0 END AS stage
      FROM w
    )
    SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM staged GROUP BY 1 ORDER BY stage
    """,
    doc="streaming ordered funnel per session: stage = how far the "
    "signup -> click -> purchase chain progressed with first "
    "occurrences strictly increasing under the (ts, event_id) total "
    "order (stage 0 = no signup at all). Session assembly is the only "
    "stateful streaming stage (session_window + collect_list, q258's "
    "machinery); the step logic runs on emitted sessions per trigger. "
    "Oracle = batch sessionization computing the same fixpoint",
)
def q301_stream_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    sessions = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.collect_list(F.struct("ts", "event_id", "event_type")).alias("evs")
        )
    )
    out = ev.run_stream_to_batch(sessions, "stream_funnel_out")
    exploded = out.select(
        F.col("session_window.start").alias("sess_start"),
        "user_id",
        F.explode("evs").alias("e"),
    ).filter(F.col("e.event_type").isin("signup", "click", "purchase"))
    firsts = exploded.groupBy(
        "user_id", "sess_start", F.col("e.event_type").alias("event_type")
    ).agg(F.min(F.struct(F.col("e.ts"), F.col("e.event_id"))).alias("fk"))
    w = firsts.groupBy("user_id", "sess_start").agg(
        F.max(F.when(F.col("event_type") == "signup", F.col("fk"))).alias("f1"),
        F.max(F.when(F.col("event_type") == "click", F.col("fk"))).alias("f2"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("fk"))).alias("f3"),
    )
    stage = (
        F.when(
            F.col("f1").isNotNull()
            & F.col("f2").isNotNull()
            & F.col("f3").isNotNull()
            & (F.col("f1") < F.col("f2"))
            & (F.col("f2") < F.col("f3")),
            3,
        )
        .when(
            F.col("f1").isNotNull()
            & F.col("f2").isNotNull()
            & (F.col("f1") < F.col("f2")),
            2,
        )
        .when(F.col("f1").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        w.select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# q302 — streaming type-mix drift: Jensen-Shannon divergence between
# each day's event-type distribution and the PREVIOUS day's — the
# "did traffic change shape overnight" monitor (volume can hold
# steady while composition flips; q222's CUSUM sees only totals).
# The stateful stage is the watermarked (window, type) count (q191
# discipline); the JSD between consecutive windows runs per trigger
# on the |days| x |types| aggregate.
# ---------------------------------------------------------------------------
@register(
    "q302_stream_typemix_drift",
    """
    WITH uc AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS w, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT w FROM uc),
    pairs AS (
      SELECT d.w, u.event_type,
             COALESCE(cur.n, 0) AS n_cur, COALESCE(prv.n, 0) AS n_prv
      FROM days d
      CROSS JOIN (SELECT DISTINCT event_type FROM uc) u
      LEFT JOIN uc cur ON cur.w = d.w AND cur.event_type = u.event_type
      LEFT JOIN uc prv ON prv.w = d.w - INTERVAL '1 day'
                      AND prv.event_type = u.event_type
    ),
    tot AS (
      SELECT w, CAST(SUM(n_cur) AS BIGINT) AS t_cur,
             CAST(SUM(n_prv) AS BIGINT) AS t_prv
      FROM pairs GROUP BY 1
    ),
    contrib AS (
      SELECT p.w,
             CAST(CASE WHEN p.n_cur > 0 THEN
               0.5e0 * (CAST(p.n_cur AS DOUBLE) / t.t_cur)
               * ln((CAST(p.n_cur AS DOUBLE) / t.t_cur)
                    / ((CAST(p.n_cur AS DOUBLE) / t.t_cur
                        + CAST(p.n_prv AS DOUBLE) / t.t_prv) / 2e0))
               ELSE 0e0 END AS DECIMAL(28,12)) AS ja,
             CAST(CASE WHEN p.n_prv > 0 THEN
               0.5e0 * (CAST(p.n_prv AS DOUBLE) / t.t_prv)
               * ln((CAST(p.n_prv AS DOUBLE) / t.t_prv)
                    / ((CAST(p.n_cur AS DOUBLE) / t.t_cur
                        + CAST(p.n_prv AS DOUBLE) / t.t_prv) / 2e0))
               ELSE 0e0 END AS DECIMAL(28,12)) AS jb
      FROM pairs p JOIN tot t USING (w)
      WHERE t.t_prv > 0
    )
    SELECT strftime(w, '%Y-%m-%d') AS day,
           ROUND(CAST(SUM(ja) + SUM(jb) AS DOUBLE), 6) AS jsd_nats,
           CAST(CAST(SUM(ja) + SUM(jb) AS DOUBLE) > 0.05e0 AS INT)
             AS drift_alarm
    FROM contrib GROUP BY w
    ORDER BY day
    """,
    doc="streaming composition-drift monitor: per day-window, the "
    "Jensen-Shannon divergence between that window's event-type mix "
    "and the previous window's (q277's term discipline — DECIMAL-"
    "quantized conditional contributions, zero-probability sides "
    "contribute zero), with a 0.05-nat alarm — catches shape changes "
    "total-volume monitors miss. Streaming state is the watermarked "
    "1-day (window, type) count only; the consecutive-window compare "
    "runs per trigger on the aggregate (q191/q112 discipline). First "
    "day has no predecessor and drops",
)
def q302_stream_typemix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    per = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    uc = ev.run_stream_to_batch(per, "stream_typemix_out").select(
        F.col("window.start").alias("w"), "event_type", "n"
    )
    days = uc.select("w").distinct()
    types = uc.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    cur = uc.select(
        F.col("w").alias("wc"), F.col("event_type").alias("tc"), F.col("n").alias("n_cur")
    )
    prv = uc.select(
        F.col("w").alias("wp"), F.col("event_type").alias("tp"), F.col("n").alias("n_prv")
    )
    pairs = (
        grid.join(
            cur,
            (F.col("w") == F.col("wc")) & (F.col("event_type") == F.col("tc")),
            "left",
        )
        .join(
            prv,
            (F.col("w") == F.col("wp") + F.expr("interval 1 day"))
            & (F.col("event_type") == F.col("tp")),
            "left",
        )
        .select(
            "w",
            "event_type",
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
            F.coalesce("n_prv", F.lit(0)).alias("n_prv"),
        )
    )
    tot = pairs.groupBy("w").agg(
        F.sum("n_cur").cast("long").alias("t_cur"),
        F.sum("n_prv").cast("long").alias("t_prv"),
    )
    j = pairs.join(tot, "w").filter(F.col("t_prv") > 0)
    pc = F.col("n_cur").cast("double") / F.col("t_cur")
    pp = F.col("n_prv").cast("double") / F.col("t_prv")
    m = (pc + pp) / 2.0
    ja = F.when(F.col("n_cur") > 0, 0.5 * pc * F.log(pc / m)).otherwise(
        F.lit(0.0)
    ).cast("decimal(28,12)")
    jb = F.when(F.col("n_prv") > 0, 0.5 * pp * F.log(pp / m)).otherwise(
        F.lit(0.0)
    ).cast("decimal(28,12)")
    out = (
        j.select("w", ja.alias("ja"), jb.alias("jb"))
        .groupBy("w")
        .agg((F.sum("ja") + F.sum("jb")).cast("double").alias("jsd"))
    )
    return out.select(
        F.date_format("w", "yyyy-MM-dd").alias("day"),
        F.round("jsd", 6).alias("jsd_nats"),
        (F.col("jsd") > 0.05).cast("int").alias("drift_alarm"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# q314 — STREAMING Misra-Gries: the deferred fourth-sketch-family
# streaming twin. Per gram-hash shard a bounded (<=k) MG summary lives
# in applyInPandasWithState — state is O(k * shards) BY CONSTRUCTION,
# no watermark needed, which is the entire point of a mergeable
# summary on an unbounded stream. The order blocker q259 solved for
# batch is solved the same way here: each micro-batch's shard rows are
# histogram-aggregated and folded in GRAM ORDER with the identical
# weighted insert, and the local harness's arrival is deterministic
# (one file -> one micro-batch), so the fold sequence — hence the
# summary — is bit-identical to the oracle's replay; under arbitrary
# re-batching the contents may shift but the hash-checked MG bounds
# hold for ANY fold sequence (a multi-batch pytest exercises that).
# ---------------------------------------------------------------------------
_MG_SHARDS = 8


def _mg_stream_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql
    from frontmatter_mcp_spark.workload.dp_sketch import _MG_K, _mg_insert_duck

    shard = hash_bucket_sql("t", _MG_SHARDS)
    empty = "CAST([] AS STRUCT(t VARCHAR, c BIGINT)[])"
    kp1 = _MG_K + 1
    return f"""
    WITH RECURSIVE toks AS MATERIALIZED (
      SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    grams AS MATERIALIZED (
      SELECT w[i] || ' ' || w[i+1] AS t
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS g(i)
      WHERE len(w) >= 2
    ),
    hist AS MATERIALIZED (
      SELECT {shard} AS shard, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM grams GROUP BY 1, 2
    ),
    items AS MATERIALIZED (
      SELECT shard, t, c,
             CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY t) AS INT)
               AS idx
      FROM hist
    ),
    fold AS (
      SELECT DISTINCT shard, 0 AS i, {empty} AS S FROM items
      UNION ALL
      SELECT f.shard, f.i + 1, {_mg_insert_duck("f.S", "x.t", "x.c")}
      FROM fold f JOIN items x ON x.shard = f.shard AND x.idx = f.i + 1
    ),
    ssum AS (
      SELECT f.shard, f.S
      FROM fold f
      JOIN (SELECT shard, MAX(idx) AS mx FROM items GROUP BY 1) m
        ON m.shard = f.shard AND f.i = m.mx
    ),
    entries AS (SELECT shard, unnest(S) AS e FROM ssum),
    mitems AS MATERIALIZED (
      SELECT e.t AS t, e.c AS c,
             CAST(ROW_NUMBER() OVER (ORDER BY shard, e.t) AS INT) AS idx
      FROM entries
    ),
    mfold AS (
      SELECT 0 AS i, {empty} AS S
      UNION ALL
      SELECT f.i + 1, {_mg_insert_duck("f.S", "x.t", "x.c")}
      FROM mfold f JOIN mitems x ON x.idx = f.i + 1
    ),
    final AS (SELECT S FROM mfold WHERE i = (SELECT MAX(idx) FROM mitems)),
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
    "q314_stream_misra_gries",
    _mg_stream_sql(),
    doc="STREAMING Misra-Gries frequent-bigram summaries: per gram-hash "
    "shard a bounded (<=16 entry) MG summary maintained in "
    "applyInPandasWithState — state O(k * shards) BY CONSTRUCTION on an "
    "unbounded stream, no watermark required (the mergeable-summary "
    "property q259 certified for batch, now as ingestion "
    "infrastructure). Micro-batch folds are pinned in gram order with "
    "the identical weighted insert, so under the harness's "
    "deterministic single-batch arrival the shard summaries are "
    "bit-identical to the oracle's replayed folds; the final merge "
    "(shard, gram order, same insert) doubles the error budget to "
    "2N/(k+1), and both bounds ride along as hash-checked booleans "
    "against the exact histogram. Under arbitrary re-batching the "
    "summary contents may shift but the checked bounds hold for ANY "
    "fold sequence — a multi-batch pytest exercises eviction-and-"
    "refold. The corpus pays one stateless explode; per shard the "
    "state op is O(batch distinct grams) with a <=k accumulator",
)
def q314_stream_misra_gries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.streaming import ingest
    from frontmatter_mcp_spark.tables import ensure_parallelism, load_table
    from frontmatter_mcp_spark.workload.dp_sketch import _MG_K, _mg_insert_col

    stream = ingest.read_documents_stream(spark, sf_dir)
    summ_stream = ingest.misra_gries_summaries(
        stream, k=_MG_K, shards=_MG_SHARDS
    )
    with ev._stream_state_partitions(spark):
        q = (
            summ_stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_mg_out")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    raw = spark.table("stream_mg_out")
    latest = (
        raw.withColumn("mx", F.max("n_folds").over(W.partitionBy("shard")))
        .filter(F.col("n_folds") == F.col("mx"))
        .select("shard", "t", "c")
    )
    empty = F.array().cast("array<struct<t:string,c:bigint>>")
    merged = (
        latest.agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("shard", "t", "c"))),
                lambda s: F.struct(s["t"].alias("t"), s["c"].alias("c")),
            ).alias("mitems")
        )
        .select(
            F.aggregate(
                "mitems", empty, lambda S, x: _mg_insert_col(S, x, _MG_K)
            ).alias("S")
        )
    )
    summ = merged.select(F.explode("S").alias("e")).select(
        F.col("e.t").alias("gram"), F.col("e.c").alias("est_c")
    )
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    grams = (
        d.select(w.alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 1),
                    lambda i: F.concat(
                        F.element_at(F.col("w"), i.cast("int")),
                        F.lit(" "),
                        F.element_at(F.col("w"), (i + 1).cast("int")),
                    ),
                )
            ).alias("t")
        )
    )
    truth = grams.groupBy("t").agg(F.count("*").cast("long").alias("true_c"))
    tot = grams.agg(F.count("*").cast("long").alias("n"))
    kp1 = _MG_K + 1
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


# ---------------------------------------------------------------------------
# q341 — streaming quantile monitor: per 1-day window, p50/p90/p99 of
# the event value estimated from the md5-designated 5% sample (q170's
# engine-portable mergeable-quantile discipline, now as a live
# dashboard feed) — the windowed aggregate carries the FULL count but
# only the sampled values, so state per window is 5% of the window,
# and both engines draw the identical sample so the estimates
# hash-verify exactly.
# ---------------------------------------------------------------------------
def _stream_quantiles_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    bucket = hash_bucket_sql("event_id", 100)

    def q_at(p: int) -> str:
        return (
            f"ROUND(sv[GREATEST(1, (len(sv) * {p} + 99) // 100)], 6)"
        )

    return f"""
    WITH d AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS day, value,
             CASE WHEN {bucket} < 5 THEN value END AS sval
      FROM events
    ),
    w AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events,
             list_sort([x FOR x IN list(sval) IF x IS NOT NULL]) AS sv
      FROM d GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS window_day,
           n_events, CAST(len(sv) AS BIGINT) AS n_sampled,
           CASE WHEN len(sv) > 0 THEN {q_at(50)} END AS p50,
           CASE WHEN len(sv) > 0 THEN {q_at(90)} END AS p90,
           CASE WHEN len(sv) > 0 THEN {q_at(99)} END AS p99
    FROM w ORDER BY window_day
    """


@register(
    "q341_stream_quantile_monitor",
    _stream_quantiles_sql(),
    doc="streaming per-day value-quantile monitor: one watermarked "
    "1-day windowed aggregate carries the full event count plus a "
    "collect_list of ONLY the md5-designated 5% sample (state per "
    "window bounded at 5%), and p50/p90/p99 come from the sorted "
    "sample at the exact integer rank ceil(n*p/100) — q170's "
    "engine-portable quantile-estimation discipline as live "
    "monitoring infrastructure: both engines draw the identical "
    "sample, so the estimates hash-verify (where a t-digest or KLL "
    "would be engine-private). == batch per-day replay of the same "
    "sample rule",
)
def q341_stream_quantile_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    stream = ev.read_events_stream(spark, sf_dir)
    sval = F.when(hash_bucket(F.col("event_id"), 100) < 5, F.col("value"))
    agg = (
        stream.withColumn("sval", sval)
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sort_array(F.collect_list("sval")).alias("sv"),
        )
    )
    out = ev.run_stream_to_batch(agg, "stream_quantile_out")

    def q_at(p: int):
        idx = F.greatest(
            F.lit(1), F.expr(f"(size(sv) * {p} + 99) div 100").cast("int")
        )
        return F.when(
            F.size("sv") > 0, F.round(F.element_at("sv", idx), 6)
        )

    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd").alias("window_day"),
        "n_events",
        F.size("sv").cast("long").alias("n_sampled"),
        q_at(50).alias("p50"),
        q_at(90).alias("p90"),
        q_at(99).alias("p99"),
    ).orderBy("window_day")


# ---------------------------------------------------------------------------
# q367 — streaming daily heavy-hitter LEDGER: the q314 machinery with
# a time axis (per (event-time day, user-hash shard) MG(16) state,
# watermark-timed eviction of closed windows) feeding the q364 head
# diff day-over-day — who entered each day's heavy-user head, who
# left, and how estimates moved, at O(k) per day with NO pass over
# history. The live dashboard the mergeable-sketch family exists for.
# ---------------------------------------------------------------------------
_MGW_SHARDS = 4


def _mg_daily_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql
    from frontmatter_mcp_spark.workload.dp_sketch import _MG_K, _mg_insert_duck

    bucket = hash_bucket_sql("t", _MGW_SHARDS)
    empty = "CAST([] AS STRUCT(t VARCHAR, c BIGINT)[])"
    return f"""
    WITH RECURSIVE ev AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS win,
             CAST(user_id AS VARCHAR) AS t
      FROM events
    ),
    hist AS MATERIALIZED (
      SELECT win, {bucket} AS bucket, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM ev GROUP BY 1, 2, 3
    ),
    items AS MATERIALIZED (
      SELECT win, bucket, t, c,
             CAST(ROW_NUMBER() OVER (PARTITION BY win, bucket ORDER BY t)
                  AS INT) AS idx
      FROM hist
    ),
    fold AS (
      SELECT DISTINCT win, bucket, 0 AS i, {empty} AS S FROM items
      UNION ALL
      SELECT f.win, f.bucket, f.i + 1, {_mg_insert_duck("f.S", "x.t", "x.c")}
      FROM fold f JOIN items x
        ON x.win = f.win AND x.bucket = f.bucket AND x.idx = f.i + 1
    ),
    bsum AS (
      SELECT f.win, f.bucket, f.S
      FROM fold f
      JOIN (SELECT win, bucket, MAX(idx) AS mx FROM items GROUP BY 1, 2) m
        ON m.win = f.win AND m.bucket = f.bucket AND f.i = m.mx
    ),
    entries AS (SELECT win, bucket, unnest(S) AS e FROM bsum),
    mitems AS MATERIALIZED (
      SELECT win, e.t AS t, e.c AS c,
             CAST(ROW_NUMBER() OVER (PARTITION BY win
                                     ORDER BY bucket, e.t) AS INT) AS idx
      FROM entries
    ),
    mfold AS (
      SELECT DISTINCT win, 0 AS i, {empty} AS S FROM mitems
      UNION ALL
      SELECT f.win, f.i + 1, {_mg_insert_duck("f.S", "x.t", "x.c")}
      FROM mfold f JOIN mitems x ON x.win = f.win AND x.idx = f.i + 1
    ),
    heads AS (
      SELECT f.win, e.t AS user_key, e.c AS est
      FROM (SELECT f.win, unnest(f.S) AS e
            FROM mfold f
            JOIN (SELECT win, MAX(idx) AS mx FROM mitems GROUP BY 1) m
              ON m.win = f.win AND f.i = m.mx) f(win, e)
    ),
    days AS (SELECT DISTINCT win FROM heads),
    cur AS (
      SELECT h.win, h.user_key, h.est,
             COALESCE(p.est, 0) AS prev_est
      FROM heads h
      LEFT JOIN heads p
        ON p.win = h.win - INTERVAL '1 day' AND p.user_key = h.user_key
    ),
    gone AS (
      SELECT d.win, p.user_key, CAST(0 AS BIGINT) AS est, p.est AS prev_est
      FROM heads p
      JOIN days d ON d.win = p.win + INTERVAL '1 day'
      WHERE NOT EXISTS (SELECT 1 FROM heads h
                        WHERE h.win = d.win AND h.user_key = p.user_key)
    ),
    u AS (SELECT * FROM cur UNION ALL SELECT * FROM gone)
    SELECT strftime(win, '%Y-%m-%d') AS day,
           CAST(user_key AS BIGINT) AS user_id,
           est, prev_est, est - prev_est AS est_delta,
           CASE WHEN prev_est = 0 THEN 'entered'
                WHEN est = 0 THEN 'left'
                ELSE 'stayed' END AS head_status
    FROM u
    ORDER BY day, user_id
    """


@register(
    "q367_stream_mg_daily_heads",
    _mg_daily_sql(),
    doc="streaming daily heavy-hitter ledger: per (event-time day, "
    "user-hash shard) MG(16) state in applyInPandasWithState (q314's "
    "pinned folds with a time axis; closed windows evict via "
    "watermark-armed event-time timers, so state is O(k x shards x "
    "open windows)), shard summaries merged per day in (shard, user) "
    "order, and consecutive days' heads diffed — entered/left/stayed "
    "with estimate deltas, the O(k)-per-day dashboard q364 computes "
    "as a one-shot batch. == the oracle's replayed per-day folds and "
    "LAG-style day join",
)
def q367_stream_mg_daily_heads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.streaming import ingest
    from frontmatter_mcp_spark.workload.dp_sketch import _MG_K, _mg_insert_col

    stream = ev.read_events_stream(spark, sf_dir)
    summ = ingest.misra_gries_windowed(
        stream, ts_col="ts", item_col="user_id", k=_MG_K, shards=_MGW_SHARDS
    )
    with ev._stream_state_partitions(spark):
        q = (
            summ.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_mg_daily_out")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    raw = spark.table("stream_mg_daily_out")
    latest = (
        raw.withColumn(
            "mx", F.max("n_folds").over(W.partitionBy("win", "shard"))
        )
        .filter(F.col("n_folds") == F.col("mx"))
        .select("win", "shard", "t", "c")
    )
    empty = F.array().cast("array<struct<t:string,c:bigint>>")
    heads = (
        latest.groupBy("win")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("shard", "t", "c"))),
                lambda s: F.struct(s["t"].alias("t"), s["c"].alias("c")),
            ).alias("mitems")
        )
        .select(
            "win",
            F.aggregate(
                "mitems", empty, lambda S, x: _mg_insert_col(S, x, _MG_K)
            ).alias("S"),
        )
        .select("win", F.explode("S").alias("e"))
        .select("win", F.col("e.t").alias("user_key"), F.col("e.c").alias("est"))
    )
    # held through the registry so the checkpoint's blocks free at the
    # next query invocation (the bare localCheckpoint leaked them for
    # the session — ADR-0006); the checkpoint itself stays: heads feeds
    # both the day-over-day self-join sides below
    from frontmatter_mcp_spark.operators.holds import hold as _hold

    heads = _hold(heads)
    prev = heads.select(
        (F.col("win") + F.expr("interval 1 day")).alias("win"),
        F.col("user_key").alias("puser"),
        F.col("est").alias("prev_est"),
    )
    cur = heads.join(
        prev,
        (heads["win"] == prev["win"]) & (F.col("user_key") == F.col("puser")),
        "left",
    ).select(
        heads["win"],
        "user_key",
        "est",
        F.coalesce("prev_est", F.lit(0)).cast("long").alias("prev_est"),
    )
    days = heads.select("win").distinct()
    gone = (
        prev.join(days, "win")
        .join(
            heads.select(
                F.col("win").alias("hwin"), F.col("user_key").alias("huser")
            ),
            (F.col("hwin") == F.col("win")) & (F.col("huser") == F.col("puser")),
            "left_anti",
        )
        .select(
            "win",
            F.col("puser").alias("user_key"),
            F.lit(0).cast("long").alias("est"),
            F.col("prev_est").cast("long").alias("prev_est"),
        )
    )
    u = cur.unionByName(gone)
    return u.select(
        F.date_format("win", "yyyy-MM-dd").alias("day"),
        F.col("user_key").cast("long").alias("user_id"),
        "est",
        "prev_est",
        (F.col("est") - F.col("prev_est")).alias("est_delta"),
        F.when(F.col("prev_est") == 0, "entered")
        .when(F.col("est") == 0, "left")
        .otherwise("stayed")
        .alias("head_status"),
    ).orderBy("day", "user_id")
