"""Time-series family: smoothing, seasonality, changepoints, autocorrelation and trend tests over the events/orders tables.

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

# ---------------------------------------------------------------------------
# q158 — day-of-week seasonality profile: per event type, each
# weekday's traffic as an index against the type's own mean — the
# calendar-shape fingerprint behind staffing, alert baselines (q89/
# q155 thresholds should season), and synthetic-data realism checks.
# ---------------------------------------------------------------------------
@register(
    "q158_dow_seasonality",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    dow AS (
      SELECT event_type, dayofweek(d) + 1 AS dw,
             CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type,
             CAST(SUM(n_events) AS BIGINT) AS tot_events,
             CAST(SUM(n_days) AS BIGINT) AS tot_days
      FROM dow GROUP BY 1
    )
    SELECT dow.event_type, CAST(dw AS INT) AS dow, n_events, n_days,
           round((CAST(n_events AS DOUBLE) / n_days)
                 / (CAST(tot_events AS DOUBLE) / tot_days), 6)
             AS seasonality_index
    FROM dow JOIN base ON base.event_type = dow.event_type
    """,
    doc="day-of-week seasonality: per event type, each weekday's mean "
    "daily traffic indexed against the type's own overall mean — the "
    "calendar fingerprint that alert baselines (q89/q155) should season "
    "by. DuckDB dayofweek+1 == Spark dayofweek (the documented dialect "
    "identity); two bounded-key aggregates over the tiny daily table",
)
def q158_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -16% (0.40->0.34)
    daily = hold(
        ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("d")
        ).agg(F.count("*").cast("long").alias("n"))
    )
    dow = daily.groupBy(
        "event_type", F.dayofweek("d").cast("int").alias("dow")
    ).agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_days"),
    )
    base = dow.groupBy("event_type").agg(
        F.sum("n_events").cast("long").alias("tot_events"),
        F.sum("n_days").cast("long").alias("tot_days"),
    )
    return dow.join(F.broadcast(base), "event_type").selectExpr(
        "event_type", "dow", "n_events", "n_days",
        "round((CAST(n_events AS DOUBLE) / n_days)"
        " / (CAST(tot_events AS DOUBLE) / tot_days), 6) AS seasonality_index",
    )

# ---------------------------------------------------------------------------
# q172 — EWMA daily smoothing + one-step forecast error: the
# exponential-smoothing primitive next to the windowed z-score (q89),
# MAD (q155) and day-of-week seasonality (q158). The fold is strictly
# sequential in day order, so both engines execute the IDENTICAL IEEE
# operation sequence — the only way a recursive filter can hash-match
# cross-engine (a closed-form pow() rewrite would hinge on libm)
# ---------------------------------------------------------------------------
@register(
    "q172_ewma_daily",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type, list(CAST(n AS DOUBLE) ORDER BY day) AS xs
      FROM daily GROUP BY event_type
    ),
    folded AS (
      -- err_sum is packed BEFORE level on purpose: DuckDB's list_reduce
      -- evaluates struct_pack fields against an in-place accumulator, so
      -- a field reading a.level must come before the field writing it
      SELECT event_type, CAST(len(xs) AS INT) AS n_days,
             list_reduce(
               list_transform(xs, x -> struct_pack(
                 err_sum := 0e0, level := x, cnt := CAST(0 AS BIGINT), x := x)),
               (a, b) -> struct_pack(
                 err_sum := a.err_sum + abs(b.x - a.level),
                 level := a.level * 0.75e0 + b.x * 0.25e0,
                 cnt := a.cnt + 1,
                 x := b.x)) AS r
      FROM series
    )
    SELECT event_type, n_days,
           ROUND((r).level, 6) AS ewma_level,
           CASE WHEN (r).cnt > 0
                THEN ROUND((r).err_sum / (r).cnt, 6) ELSE NULL END AS mae_1step
    FROM folded ORDER BY event_type
    """,
    doc="EWMA (alpha=1/4, a dyadic constant — the multiply-add sequence "
    "is exact-identical cross-engine) over per-type daily counts, "
    "seeded by the first day, emitting the final smoothed level (= the "
    "flat next-day forecast) and the mean absolute one-step forecast "
    "error accumulated along the fold. One events scan, one day "
    "aggregate, then per-type sequential folds over day-count arrays — "
    "the time dimension is bounded (days, not rows), so the collected "
    "series stays tiny no matter the corpus size; a recursive filter "
    "cannot be parallelized past that without changing its arithmetic",
)
def q172_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "n"))),
            lambda s: s["n"].cast("double"),
        ).alias("xs")
    )
    first = F.element_at("xs", 1)
    init = F.struct(
        first.alias("level"),
        F.lit(0.0).alias("err_sum"),
        F.lit(0).cast("long").alias("cnt"),
        first.alias("x"),
    )
    rest = F.slice("xs", 2, F.greatest(F.size("xs") - 1, F.lit(0)))
    folded = series.select(
        "event_type",
        F.size("xs").cast("int").alias("n_days"),
        F.aggregate(
            rest,
            init,
            lambda a, b: F.struct(
                (a["level"] * 0.75 + b * 0.25).alias("level"),
                (a["err_sum"] + F.abs(b - a["level"])).alias("err_sum"),
                (a["cnt"] + 1).alias("cnt"),
                b.alias("x"),
            ),
        ).alias("r"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.round(F.col("r")["level"], 6).alias("ewma_level"),
        F.when(
            F.col("r")["cnt"] > 0, F.round(F.col("r")["err_sum"] / F.col("r")["cnt"], 6)
        ).alias("mae_1step"),
    ).orderBy("event_type")

# ---------------------------------------------------------------------------
# q176 — Holt linear-trend smoothing: q172's EWMA upgraded with a trend
# recursion (the forecast is level + trend, not flat). Two coupled
# recursions defeat the q172 struct-pack ordering trick (the trend
# update needs BOTH the new and the old level), so the oracle replays
# the fold with a recursive CTE instead — the q135 precedent
# ---------------------------------------------------------------------------
@register(
    "q176_holt_trend",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type, list(CAST(n AS DOUBLE) ORDER BY day) AS xs
      FROM daily GROUP BY event_type
    ),
    holt AS (
      SELECT event_type, xs, 1 AS i, xs[1] AS level, 0e0 AS trend, 0e0 AS err
      FROM series
      UNION ALL
      SELECT event_type, xs, i + 1,
             0.25e0 * xs[i+1] + 0.75e0 * (level + trend),
             0.125e0 * ((0.25e0 * xs[i+1] + 0.75e0 * (level + trend)) - level)
               + 0.875e0 * trend,
             err + abs(xs[i+1] - (level + trend))
      FROM holt WHERE i < len(xs)
    )
    SELECT event_type, CAST(len(xs) AS INT) AS n_days,
           ROUND(level, 6) AS level,
           ROUND(trend, 6) AS trend,
           ROUND(level + trend, 6) AS forecast_next,
           CASE WHEN len(xs) > 1
                THEN ROUND(err / (len(xs) - 1), 6) ELSE NULL END AS mae_1step
    FROM holt WHERE i = len(xs)
    ORDER BY event_type
    """,
    doc="Holt double exponential smoothing (alpha=1/4, beta=1/8 — dyadic "
    "constants, exact-identical multiply-add sequences) over per-type "
    "daily counts: level AND trend recursions folded strictly in day "
    "order, one-step forecasts scored along the way, next-day forecast "
    "= level + trend (q172's flat forecast plus slope). Same scale "
    "shape as q172: corpus work is one day aggregate; the sequential "
    "fold runs over bounded day-count arrays. Oracle replays the fold "
    "via recursive CTE because the coupled recursions read both the "
    "old and new level in one step",
)
def q176_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "n"))),
            lambda s: s["n"].cast("double"),
        ).alias("xs")
    )
    first = F.element_at("xs", 1)
    init = F.struct(
        first.alias("level"),
        F.lit(0.0).alias("trend"),
        F.lit(0.0).alias("err"),
    )
    rest = F.slice("xs", 2, F.greatest(F.size("xs") - 1, F.lit(0)))

    def step(a, x):
        new_level = 0.25 * x + 0.75 * (a["level"] + a["trend"])
        return F.struct(
            new_level.alias("level"),
            (0.125 * (new_level - a["level"]) + 0.875 * a["trend"]).alias("trend"),
            (a["err"] + F.abs(x - (a["level"] + a["trend"]))).alias("err"),
        )

    folded = series.select(
        "event_type",
        F.size("xs").cast("int").alias("n_days"),
        F.aggregate(rest, init, step).alias("r"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.round(F.col("r")["level"], 6).alias("level"),
        F.round(F.col("r")["trend"], 6).alias("trend"),
        F.round(F.col("r")["level"] + F.col("r")["trend"], 6).alias("forecast_next"),
        F.when(
            F.col("n_days") > 1,
            F.round(F.col("r")["err"] / (F.col("n_days") - 1), 6),
        ).alias("mae_1step"),
    ).orderBy("event_type")

# ---------------------------------------------------------------------------
# q192 — CUSUM change-point detection over per-type daily volumes: the
# page-one drift detector (did this event type's rate shift upward, and
# WHEN) in exact integer arithmetic — scaled by n_days so the reference
# mean needs no division, folded sequentially over the bounded day axis
# ---------------------------------------------------------------------------
@register(
    "q192_cusum_changepoint",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    axis AS (
      SELECT event_type, unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
      FROM spans
    ),
    filled AS (
      SELECT a.event_type, a.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n
      FROM axis a LEFT JOIN daily d
        ON d.event_type = a.event_type AND d.day = a.day
    ),
    series AS (
      SELECT event_type,
             list(struct_pack(day := strftime(day, '%Y-%m-%d'), n := n)
                  ORDER BY day) AS xs,
             CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM filled GROUP BY 1
    ),
    folded AS (
      -- every field recomputes s_new from the OLD a.s and s is packed
      -- LAST, so DuckDB's in-place struct_pack evaluation and Spark's
      -- functional fold see identical values at every step
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
           ROUND(CAST(total AS DOUBLE) / n_days, 4) AS mean_daily,
           (r).max_s AS max_cusum,
           (r).first_alarm AS first_alarm_day,
           CAST((r).n_alarms AS INT) AS n_alarms
    FROM folded ORDER BY event_type
    """,
    doc="one-sided CUSUM drift detection per event type: daily counts on "
    "a gap-filled day axis (missing days count 0 — a detector that skips "
    "quiet days is blind to outages), deviations scaled by n_days so the "
    "reference mean and the 25% allowance stay exact BIGINTs (x*n_days - "
    "total - total//4), folded as S_t = max(0, S_{t-1} + d_t) with alarm "
    "threshold 3*mean-days. Emits the max statistic, the FIRST alarm day "
    "(the change-point estimate), and the alarm-day count. One events "
    "scan, one day aggregate; the fold runs over the bounded day axis, "
    "so the collected series is O(days) no matter the corpus size",
)
def q192_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    spans = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    axis = spans.select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    filled = axis.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0).cast("long")).alias("n")
    )
    series = filled.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "n"))).alias("xs"),
        F.sum("n").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_days"),
    )
    zero = F.lit(0).cast("long")
    elems = F.transform(
        "xs",
        lambda x: F.struct(
            F.date_format(x["day"], "yyyy-MM-dd").alias("day"),
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
        "n_days",
        "total",
        F.aggregate(elems, init, merge).alias("r"),
    )
    return folded.select(
        "event_type",
        F.col("n_days").cast("int").alias("n_days"),
        F.col("total").alias("total_events"),
        F.round(F.col("total").cast("double") / F.col("n_days"), 4).alias(
            "mean_daily"
        ),
        F.col("r")["max_s"].alias("max_cusum"),
        F.col("r")["first_alarm"].alias("first_alarm_day"),
        F.col("r")["n_alarms"].cast("int").alias("n_alarms"),
    ).orderBy("event_type")

# ---------------------------------------------------------------------------
# q197 — daily value distribution bands: the box-plot time series
# (p25/p50/p75 + IQR whiskers + outlier count per day per type) that
# every metrics dashboard draws — exact interpolated percentiles at
# binary fractions (cross-engine bit-identical), decimal-exact means
# ---------------------------------------------------------------------------
@register(
    "q197_daily_value_bands",
    """
    WITH d AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day, value
      FROM events
    ),
    bands AS (
      SELECT event_type, day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             quantile_cont(value, 0.25e0) AS p25,
             quantile_cont(value, 0.5e0) AS p50,
             quantile_cont(value, 0.75e0) AS p75
      FROM d GROUP BY 1, 2
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
           CAST(FLOOR((sum_value / n) * 1000000e0) AS BIGINT) AS mean_value_fx,
           ROUND(p25, 6) AS p25, ROUND(p50, 6) AS p50, ROUND(p75, 6) AS p75,
           ROUND(p75 - p25, 6) AS iqr,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM d x
            WHERE x.event_type = bands.event_type AND x.day = bands.day
              AND (x.value < p25 - 1.5e0 * (p75 - p25)
                   OR x.value > p75 + 1.5e0 * (p75 - p25))) AS n_outliers
    FROM bands ORDER BY event_type, day
    """,
    doc="box-plot bands per (event type, day): exact interpolated "
    "quartiles at binary fractions, decimal-exact mean, IQR, and the "
    "Tukey 1.5*IQR outlier count (computed by a second pass against "
    "the per-group fences — in Spark one broadcast join back, not a "
    "correlated subquery). The day axis bounds every group; both "
    "scans are map-side-combined aggregates over the same shuffle key",
)
def q197_daily_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = e.select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    bands = d.groupBy("event_type", "day").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        F.percentile("value", F.lit(0.25)).alias("p25"),
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.75)).alias("p75"),
    )
    fences = bands.select(
        "event_type",
        "day",
        (F.col("p25") - 1.5 * (F.col("p75") - F.col("p25"))).alias("lo"),
        (F.col("p75") + 1.5 * (F.col("p75") - F.col("p25"))).alias("hi"),
    )
    outliers = (
        d.join(F.broadcast(fences), ["event_type", "day"])
        .filter((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("long").alias("n_outliers"))
    )
    return (
        bands.join(outliers, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            # 1e-6 floor fixed-point: the ROUND form hit an exact .5
            # boundary at sf0.01 (r11 boundary audit receipt)
            F.floor((F.col("sum_value") / F.col("n")) * 1000000.0)
            .cast("long")
            .alias("mean_value_fx"),
            F.round("p25", 6).alias("p25"),
            F.round("p50", 6).alias("p50"),
            F.round("p75", 6).alias("p75"),
            F.round(F.col("p75") - F.col("p25"), 6).alias("iqr"),
            F.coalesce("n_outliers", F.lit(0).cast("long")).alias("n_outliers"),
        )
        .orderBy("event_type", "day")
    )

# ---------------------------------------------------------------------------
# q200 — co-movement matrix: Pearson correlation of daily volumes
# between every event-type pair (do errors spike with purchases?) on a
# shared gap-filled day axis. Every moment sum is an exact BIGINT (the
# inputs are integer counts), and the final correlation is one double
# expression whose only rounding ops (cast, sqrt, divide) are IEEE
# correctly-rounded — bit-identical cross-engine with no libm exposure
# ---------------------------------------------------------------------------
@register(
    "q200_volume_correlation",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    axis AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day FROM span
    ),
    types AS (SELECT DISTINCT event_type FROM daily),
    filled AS (
      SELECT t.event_type, a.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n
      FROM types t CROSS JOIN axis a
      LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = a.day
    ),
    pairs AS (
      SELECT x.event_type AS type_a, y.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(x.n) AS BIGINT) AS sx, CAST(SUM(y.n) AS BIGINT) AS sy,
             CAST(SUM(x.n * y.n) AS BIGINT) AS sxy,
             CAST(SUM(x.n * x.n) AS BIGINT) AS sxx,
             CAST(SUM(y.n * y.n) AS BIGINT) AS syy
      FROM filled x JOIN filled y
        ON x.day = y.day AND x.event_type < y.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, CAST(nd AS INT) AS n_days,
           ROUND(CAST(nd * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(nd * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(nd * syy - sy * sy AS DOUBLE))), 6) AS corr
    FROM pairs ORDER BY type_a, type_b
    """,
    doc="daily-volume correlation matrix across event types: counts on "
    "a shared gap-filled day axis (a type silent on a day is 0, not "
    "absent — dropping those days would bias every correlation toward "
    "+1), all five moment sums exact BIGINTs, Pearson r as one "
    "cast/sqrt/divide chain (IEEE correctly-rounded ops only). One "
    "events scan + one day aggregate; the pair join runs on the "
    "|types| x |days| bounded series, never on raw events",
)
def q200_volume_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    axis = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    types = daily.select("event_type").distinct()
    filled = (
        types.crossJoin(axis)
        .join(daily, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("n", F.lit(0).cast("long")).alias("n"))
    )
    x = filled.select(
        F.col("event_type").alias("type_a"), "day", F.col("n").alias("xn")
    )
    y = filled.select(
        F.col("event_type").alias("type_b"), "day", F.col("n").alias("yn")
    )
    pairs = (
        x.join(y, "day")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").cast("long").alias("nd"),
            F.sum("xn").cast("long").alias("sx"),
            F.sum("yn").cast("long").alias("sy"),
            F.sum(F.col("xn") * F.col("yn")).cast("long").alias("sxy"),
            F.sum(F.col("xn") * F.col("xn")).cast("long").alias("sxx"),
            F.sum(F.col("yn") * F.col("yn")).cast("long").alias("syy"),
        )
    )
    nd, sx, sy = F.col("nd"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return pairs.select(
        "type_a",
        "type_b",
        nd.cast("int").alias("n_days"),
        F.round(
            (nd * sxy - sx * sy).cast("double")
            / (
                F.sqrt((nd * sxx - sx * sx).cast("double"))
                * F.sqrt((nd * syy - sy * sy).cast("double"))
            ),
            6,
        ).alias("corr"),
    ).orderBy("type_a", "type_b")

# ---------------------------------------------------------------------------
# q201 — Holt-Winters additive seasonal smoothing (period 7): the
# forecasting-family completion (q172 level, q176 level+trend, now
# level+trend+weekly seasonality). All smoothing constants are dyadic
# (1/4, 1/8), so the multiply-add chains are exact-identical IEEE;
# the oracle replays the TRIPLE coupled recursion (the struct_pack
# in-place trick cannot express it) as a recursive CTE carrying the
# seasonal state as a LIST column
# ---------------------------------------------------------------------------
@register(
    "q201_holt_winters",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type, list(CAST(n AS DOUBLE) ORDER BY day) AS xs
      FROM daily GROUP BY event_type
      HAVING COUNT(*) >= 8
    ),
    init AS (
      SELECT event_type, xs,
             ((((((xs[1] + xs[2]) + xs[3]) + xs[4]) + xs[5]) + xs[6]) + xs[7])
               / 7e0 AS lvl0
      FROM series
    ),
    hw AS (
      SELECT event_type, xs, 7 AS i, lvl0 AS level, 0e0 AS trend, 0e0 AS err,
             [xs[j] - lvl0 FOR j IN generate_series(1, 7)] AS seas
      FROM init
      UNION ALL
      SELECT event_type, xs, i + 1,
             0.25e0 * (xs[i+1] - seas[(i % 7) + 1])
               + 0.75e0 * (level + trend),
             0.125e0 * ((0.25e0 * (xs[i+1] - seas[(i % 7) + 1])
                         + 0.75e0 * (level + trend)) - level)
               + 0.875e0 * trend,
             err + abs(xs[i+1] - (level + trend + seas[(i % 7) + 1])),
             list_transform(seas, (s, j) -> CASE WHEN j = (i % 7) + 1
               THEN 0.25e0 * (xs[i+1]
                              - (0.25e0 * (xs[i+1] - seas[(i % 7) + 1])
                                 + 0.75e0 * (level + trend)))
                    + 0.75e0 * s
               ELSE s END)
      FROM hw WHERE i < len(xs)
    )
    SELECT event_type, CAST(len(xs) AS INT) AS n_days,
           ROUND(level, 6) AS level,
           ROUND(trend, 6) AS trend,
           ROUND(level + trend + seas[(len(xs) % 7) + 1], 6) AS forecast_next,
           ROUND(list_aggregate(seas, 'max') - list_aggregate(seas, 'min'), 6)
             AS season_spread,
           ROUND(err / (len(xs) - 7), 6) AS mae_1step
    FROM hw WHERE i = len(xs)
    ORDER BY event_type
    """,
    doc="Holt-Winters additive smoothing with weekly seasonality over "
    "per-type daily counts: level/trend/seasonal states initialized "
    "from the first week (level = first-week mean in one fixed "
    "left-associated chain, seasonal = deviations from it), then the "
    "triple coupled recursion folded strictly in day order with dyadic "
    "alpha=gamma=1/4, beta=1/8 — one-step forecast errors scored along "
    "the fold, next-day forecast = level + trend + the next slot's "
    "seasonal, plus the seasonal amplitude (spread). Corpus work is one "
    "day aggregate; the fold is O(days). Types with under 8 days drop "
    "(no week to initialize from) — deterministic on both engines",
)
def q201_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    series = (
        daily.groupBy("event_type")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("day", "n"))),
                lambda s: s["n"].cast("double"),
            ).alias("xs")
        )
        .filter(F.size("xs") >= 8)
    )
    x = [F.element_at("xs", j) for j in range(1, 8)]
    lvl0 = (
        ((((((x[0] + x[1]) + x[2]) + x[3]) + x[4]) + x[5]) + x[6]) / 7.0
    )
    seas0 = F.transform(F.slice("xs", 1, 7), lambda s: s - lvl0)
    init = F.struct(
        lvl0.alias("level"),
        F.lit(0.0).alias("trend"),
        F.lit(0.0).alias("err"),
        seas0.alias("seas"),
    )
    days = F.transform(
        F.sequence(F.lit(8), F.size("xs")),
        lambda i: F.struct(
            i.alias("i"), F.element_at(F.col("xs"), i.cast("int")).alias("x")
        ),
    )

    def step(a, b):
        slot1 = ((b["i"] - 1) % 7 + 1).cast("int")  # 1-based seasonal slot
        sv = F.element_at(a["seas"], slot1)
        new_level = 0.25 * (b["x"] - sv) + 0.75 * (a["level"] + a["trend"])
        new_trend = 0.125 * (new_level - a["level"]) + 0.875 * a["trend"]
        new_err = a["err"] + F.abs(b["x"] - (a["level"] + a["trend"] + sv))
        new_seas = F.transform(
            a["seas"],
            lambda s, j: F.when(
                j == (b["i"] - 1) % 7,  # Spark transform index is 0-based
                0.25 * (b["x"] - new_level) + 0.75 * s,
            ).otherwise(s),
        )
        return F.struct(
            new_level.alias("level"),
            new_trend.alias("trend"),
            new_err.alias("err"),
            new_seas.alias("seas"),
        )

    folded = series.select(
        "event_type",
        F.size("xs").cast("int").alias("n_days"),
        F.aggregate(days, init, step).alias("r"),
    )
    r = F.col("r")
    return folded.select(
        "event_type",
        "n_days",
        F.round(r["level"], 6).alias("level"),
        F.round(r["trend"], 6).alias("trend"),
        F.round(
            r["level"]
            + r["trend"]
            + F.element_at(r["seas"], (F.col("n_days") % 7 + 1).cast("int")),
            6,
        ).alias("forecast_next"),
        F.round(F.array_max(r["seas"]) - F.array_min(r["seas"]), 6).alias(
            "season_spread"
        ),
        F.round(r["err"] / (F.col("n_days") - 7), 6).alias("mae_1step"),
    ).orderBy("event_type")

# ---------------------------------------------------------------------------
# q215 — inter-arrival burstiness per event type: per-user gaps between
# consecutive same-type events, their exact integer moments, and the
# Gamma method-of-moments fit (shape < 1 = bursty, > 1 = regular) —
# the renewal-process view that complements q209's first-passage curve
# ---------------------------------------------------------------------------
@register(
    "q215_interarrival_gamma",
    """
    WITH gaps AS (
      SELECT event_type,
             (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id))) // 60000000 AS x
      FROM events
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM gaps WHERE x IS NOT NULL GROUP BY 1
    )
    SELECT event_type, n,
           ROUND(CAST(sx AS DOUBLE) / n, 6) AS mean_minutes,
           ROUND((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                 / (CAST(n AS DOUBLE) * (n - 1)), 6) AS var_minutes,
           ROUND((CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
                 / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                    / (CAST(n AS DOUBLE) * (n - 1))), 6) AS gamma_shape,
           ROUND(((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                  / (CAST(n AS DOUBLE) * (n - 1)))
                 / (CAST(sx AS DOUBLE) / n), 6) AS gamma_scale,
           CAST((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                / (CAST(n AS DOUBLE) * (n - 1))
                > (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
                AS INT) AS bursty
    FROM m WHERE n > 1 ORDER BY event_type
    """,
    doc="renewal statistics per event type: integer-minute inter-"
    "arrival gaps per (user, type) from one LAG window, exact BIGINT "
    "first/second moments, then the Gamma method-of-moments fit "
    "(shape = mean^2/var, scale = var/mean) and the burstiness "
    "verdict (var > mean^2 i.e. CV > 1 — shape < 1, clumped arrivals; "
    "an exponential process has shape exactly 1). One window pass "
    "sharing the (user, type) exchange, one map-side-combined moment "
    "aggregate, |types| rows out",
)
def q215_interarrival_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g0 = e.select("event_type", us.alias("us"), F.lag(us).over(w).alias("prev_us"))
    gaps = g0.select(
        "event_type",
        F.when(
            F.col("prev_us").isNotNull(),
            F.expr("(us - prev_us) div 60000000"),
        ).alias("x"),
    )
    m = (
        gaps.filter(F.col("x").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        )
        .filter(F.col("n") > 1)
    )
    n = F.col("n")
    sxd, sxxd = F.col("sx").cast("double"), F.col("sxx").cast("double")
    mean = sxd / n
    var = (n * sxxd - sxd * F.col("sx")) / (n.cast("double") * (n - 1))
    return m.select(
        "event_type",
        "n",
        F.round(mean, 6).alias("mean_minutes"),
        F.round(var, 6).alias("var_minutes"),
        F.round(mean * mean / var, 6).alias("gamma_shape"),
        F.round(var / mean, 6).alias("gamma_scale"),
        (var > mean * mean).cast("int").alias("bursty"),
    ).orderBy("event_type")

# ---------------------------------------------------------------------------
# q216 — autocorrelation of daily volumes (lags 1..7): the "is there
# weekly structure / how persistent are shocks" diagnostic that picks
# between q172/q176/q201's smoothers. Deviations are scaled by n_days
# so every cross-product sum is an exact BIGINT on both engines; only
# the final ratio is a double
# ---------------------------------------------------------------------------
_ACF_MAX_LAG = 7


@register(
    "q216_volume_acf",
    f"""
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    axis AS (
      SELECT event_type, unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
      FROM spans
    ),
    filled AS (
      SELECT a.event_type, a.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n,
             CAST(ROW_NUMBER() OVER (PARTITION BY a.event_type ORDER BY a.day)
                  AS BIGINT) AS i
      FROM axis a LEFT JOIN daily d
        ON d.event_type = a.event_type AND d.day = a.day
    ),
    tot AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS nd
      FROM filled GROUP BY 1
    ),
    dev AS (
      SELECT f.event_type, f.i, f.n * t.nd - t.s AS d, t.nd
      FROM filled f JOIN tot t USING (event_type)
    ),
    lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
    num AS (
      SELECT a.event_type, l.lag,
             CAST(SUM(a.d * b.d) AS BIGINT) AS num
      FROM dev a
      JOIN lags l ON TRUE
      JOIN dev b ON b.event_type = a.event_type AND b.i = a.i + l.lag
      GROUP BY 1, 2
    ),
    den AS (
      SELECT event_type, CAST(SUM(d * d) AS BIGINT) AS den, MAX(nd) AS nd
      FROM dev GROUP BY 1
    )
    SELECT n.event_type, CAST(n.lag AS INT) AS lag, CAST(d.nd AS INT) AS n_days,
           ROUND(CAST(n.num AS DOUBLE) / d.den, 6) AS acf
    FROM num n JOIN den d USING (event_type)
    ORDER BY n.event_type, n.lag
    """,
    doc="sample autocorrelation of per-type daily counts at lags 1-7 "
    "on the gap-filled day axis: deviations scaled by n_days "
    "(n_t*N - S, exact BIGINTs — no float mean to disagree on), "
    "lagged cross-products summed exactly via a self-join on the "
    "bounded day index, normalized by the lag-0 sum of squares (the "
    "standard biased ACF estimator). A near-1 lag-7 value is the "
    "weekly-seasonality trigger for q201. All iteration-free: one "
    "events scan, then |types| x |days| x 7 bounded work",
)
def q216_volume_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    spans = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    axis = spans.select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    filled = (
        axis.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
        )
        .withColumn(
            "i",
            F.row_number()
            .over(W.partitionBy("event_type").orderBy("day"))
            .cast("long"),
        )
    )
    tot = filled.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("s"), F.count("*").cast("long").alias("nd")
    )
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -21% (0.75->0.60)
    dev = hold(
        filled.join(tot, "event_type").select(
            "event_type",
            "i",
            (F.col("n") * F.col("nd") - F.col("s")).alias("d"),
            "nd",
        )
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = dev.select("event_type", "i", F.col("d").alias("da"))
    b = dev.select(
        F.col("event_type").alias("et2"), F.col("i").alias("i2"), F.col("d").alias("db")
    )
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("et2") == F.col("event_type"))
            & (F.col("i2") == F.col("i") + F.col("lag")),
        )
        .groupBy("event_type", "lag")
        .agg(F.sum(F.col("da") * F.col("db")).cast("long").alias("num"))
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.col("d") * F.col("d")).cast("long").alias("den"),
        F.max("nd").alias("nd"),
    )
    return (
        num.join(den, "event_type")
        .select(
            "event_type",
            F.col("lag").cast("int").alias("lag"),
            F.col("nd").cast("int").alias("n_days"),
            F.round(F.col("num").cast("double") / F.col("den"), 6).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )

# ---------------------------------------------------------------------------
# q234 — time-decayed popularity ranking: event-type scores under a
# 7-day half-life, the ranking every "trending now" surface uses —
# with dyadic per-week decay (2^-weeks is an EXACT double), the
# whole score is deterministic without a single libm call
# ---------------------------------------------------------------------------
@register(
    "q234_decayed_popularity",
    """
    WITH horizon AS (SELECT MAX(time_bucket(INTERVAL '1 day', ts)) AS d1
                     FROM events),
    daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.event_type, d.n,
             date_diff('day', CAST(d.day AS DATE), CAST(h.d1 AS DATE)) AS age,
             CAST(d.n AS DOUBLE)
               / CAST(1 << LEAST(date_diff('day', CAST(d.day AS DATE),
                                           CAST(h.d1 AS DATE)) // 7, 62)
                      AS DOUBLE) AS term
      FROM daily d CROSS JOIN horizon h
    )
    SELECT event_type,
           CAST(SUM(n) AS BIGINT) AS raw_count,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE), 6)
             AS decayed_score,
           CAST(ROW_NUMBER() OVER (
             ORDER BY SUM(CAST(term AS DECIMAL(28,12))) DESC, event_type)
             AS INT) AS rank
    FROM scored GROUP BY event_type
    ORDER BY rank
    """,
    doc="half-life popularity: daily counts decayed by 2^-(age//7) — "
    "a dyadic factor, so n/2^k is exact in doubles and the "
    "DECIMAL-quantized sum is order-independent; ranking by the "
    "decayed score with a type tiebreak. A freshly-hot type outranks "
    "a historically-bigger but stale one — the recency ranking raw "
    "counts can't express. One day aggregate + a types-sized window; "
    "the decay is a shift, never exp()",
)
def q234_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    horizon = e.agg(F.max(F.date_trunc("day", "ts")).alias("d1"))
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("long").alias("n"))
    scored = (
        daily.crossJoin(F.broadcast(horizon))
        .withColumn(
            "k",
            F.least(
                F.expr("datediff(to_date(d1), to_date(day)) div 7").cast("int"),
                F.lit(62),
            ),
        )
        .select(
            "event_type",
            "n",
            F.expr(
                "cast(n as double) / cast(shiftleft(cast(1 as bigint), k) as double)"
            ).alias("term"),
        )
    )
    agg = scored.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("raw_count"),
        F.sum(F.col("term").cast("decimal(28,12)")).alias("sd"),
    )
    return agg.select(
        "event_type",
        "raw_count",
        F.round(F.col("sd").cast("double"), 6).alias("decayed_score"),
        F.row_number()
        .over(W.orderBy(F.col("sd").desc(), "event_type"))
        .cast("int")
        .alias("rank"),
    ).orderBy("rank")


@register(
    "q240_stream_decayed_popularity",
    """
    WITH horizon AS (SELECT MAX(time_bucket(INTERVAL '1 day', ts)) AS d1
                     FROM events),
    daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.event_type, d.n,
             date_diff('day', CAST(d.day AS DATE), CAST(h.d1 AS DATE)) AS age,
             CAST(d.n AS DOUBLE)
               / CAST(1 << LEAST(date_diff('day', CAST(d.day AS DATE),
                                           CAST(h.d1 AS DATE)) // 7, 62)
                      AS DOUBLE) AS term
      FROM daily d CROSS JOIN horizon h
    )
    SELECT event_type,
           CAST(SUM(n) AS BIGINT) AS raw_count,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE), 6)
             AS decayed_score,
           CAST(ROW_NUMBER() OVER (
             ORDER BY SUM(CAST(term AS DECIMAL(28,12))) DESC, event_type)
             AS INT) AS rank
    FROM scored GROUP BY event_type
    ORDER BY rank
    """,
    doc="streaming twin of q234's half-life popularity: the stateful "
    "stage is the watermarked 1-day tumbling count (state bounded by "
    "the watermark), and the dyadic decay + ranking run per trigger "
    "on the windows-sized aggregate (the q191/q222 foreachBatch "
    "discipline) — a live 'trending now' ranking whose scores are "
    "bit-identical to the batch recompute. == q234's batch oracle",
)
def q240_stream_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.streaming import events as ev

    stream = ev.read_events_stream(spark, sf_dir)
    out = ev.run_stream_to_batch(
        ev.tumbling_counts(stream, "1 day"), "stream_decay_out"
    )
    daily = out.select(
        "event_type",
        F.col("window.start").alias("day"),
        F.col("n").cast("long").alias("n"),
    )
    horizon = daily.agg(F.max("day").alias("d1"))
    scored = (
        daily.crossJoin(F.broadcast(horizon))
        .withColumn(
            "k",
            F.least(
                F.expr("datediff(to_date(d1), to_date(day)) div 7").cast("int"),
                F.lit(62),
            ),
        )
        .select(
            "event_type",
            "n",
            F.expr(
                "cast(n as double) / cast(shiftleft(cast(1 as bigint), k) as double)"
            ).alias("term"),
        )
    )
    agg = scored.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("raw_count"),
        F.sum(F.col("term").cast("decimal(28,12)")).alias("sd"),
    )
    return agg.select(
        "event_type",
        "raw_count",
        F.round(F.col("sd").cast("double"), 6).alias("decayed_score"),
        F.row_number()
        .over(W.orderBy(F.col("sd").desc(), "event_type"))
        .cast("int")
        .alias("rank"),
    ).orderBy("rank")

# ---------------------------------------------------------------------------
# q241 — price-volume decomposition: WHY did each brand's revenue move
# between 1995 and 1996 — the volume effect ((q2-q1) at old unit
# price) vs the price effect (new volume times the unit-price change),
# which sum EXACTLY to the revenue delta (algebraic identity, checked
# as an output column). The FP&A bridge chart as a query
# ---------------------------------------------------------------------------
@register(
    "q241_price_volume_bridge",
    """
    WITH y AS (
      SELECT p.p_brand AS brand,
             CAST(date_part('year', o.o_orderdate) AS INT) AS yr,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               AS rev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE date_part('year', o.o_orderdate) IN (1995, 1996)
      GROUP BY 1, 2
    ),
    w AS (
      SELECT a.brand, a.qty AS q1, a.rev AS r1, b.qty AS q2, b.rev AS r2
      FROM y a JOIN y b ON a.brand = b.brand AND a.yr = 1995 AND b.yr = 1996
    )
    SELECT brand,
           ROUND(r1, 4) + 0e0 AS rev_1995, ROUND(r2, 4) + 0e0 AS rev_1996,
           ROUND(r2 - r1, 4) + 0e0 AS delta,
           ROUND((q2 - q1) * (r1 / q1), 4) + 0e0 AS volume_effect,
           ROUND(q2 * (r2 / q2 - r1 / q1), 4) + 0e0 AS price_effect,
           ROUND((r2 - r1) - ((q2 - q1) * (r1 / q1) + q2 * (r2 / q2 - r1 / q1)),
                 4) + 0e0 AS residual
    FROM w WHERE q1 > 0 AND q2 > 0
    ORDER BY brand
    """,
    doc="revenue bridge per brand between 1995 and 1996: decimal-exact "
    "yearly quantity and revenue, unit prices as their ratio, volume "
    "effect (q2-q1)*u1 and price effect q2*(u2-u1) — algebraically "
    "these sum to the delta, and the residual column proves it "
    "(vanishes up to the display rounding; both engines evaluate the "
    "identical double chain). One fact scan + broadcast dims, "
    "brand-sized everything after; the 'why did the number move' "
    "report every finance review opens with",
)
def q241_price_volume_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    y = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(F.year("o_orderdate").isin(1995, 1996))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("rev"),
        )
    )
    a = y.filter(F.col("yr") == 1995).select(
        "brand", F.col("qty").alias("q1"), F.col("rev").alias("r1")
    )
    b = y.filter(F.col("yr") == 1996).select(
        F.col("brand").alias("b2"), F.col("qty").alias("q2"), F.col("rev").alias("r2")
    )
    w = a.join(b, a["brand"] == b["b2"]).filter(
        (F.col("q1") > 0) & (F.col("q2") > 0)
    )
    q1, r1, q2, r2 = F.col("q1"), F.col("r1"), F.col("q2"), F.col("r2")
    vol = (q2 - q1) * (r1 / q1)
    price = q2 * (r2 / q2 - r1 / q1)
    # + 0.0 normalizes IEEE negative zero (a -1e-9 residual rounds to
    # -0.0 on one engine and 0.0 on the other)
    return w.select(
        "brand",
        (F.round(r1, 4) + 0.0).alias("rev_1995"),
        (F.round(r2, 4) + 0.0).alias("rev_1996"),
        (F.round(r2 - r1, 4) + 0.0).alias("delta"),
        (F.round(vol, 4) + 0.0).alias("volume_effect"),
        (F.round(price, 4) + 0.0).alias("price_effect"),
        (F.round((r2 - r1) - (vol + price), 4) + 0.0).alias("residual"),
    ).orderBy("brand")

# ---------------------------------------------------------------------------
# q242 — seasonality-adjusted anomalies: daily volumes scored against
# their own day-of-week baseline (q158's seasonality REMOVED before
# q155's MAD rule runs) — the detector that doesn't page on every
# weekend dip. All integer: residuals scaled by the per-dow count,
# MAD per type via exact integer medians of scaled residuals
# ---------------------------------------------------------------------------
@register(
    "q242_seasonal_anomalies",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    dowbase AS (
      SELECT event_type, dayofweek(day) AS dow,
             CAST(SUM(n) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS k
      FROM daily GROUP BY 1, 2
    ),
    resid AS (
      SELECT d.event_type, d.day, d.n,
             d.n * b.k - b.s AS r_scaled, b.k
      FROM daily d JOIN dowbase b
        ON b.event_type = d.event_type AND b.dow = dayofweek(d.day)
    ),
    mad AS (
      SELECT event_type,
             CAST(median(ABS(r_scaled)) AS DOUBLE) AS mad_scaled
      FROM resid GROUP BY 1
    )
    SELECT r.event_type, strftime(r.day, '%Y-%m-%d') AS day, r.n,
           ROUND(CAST(r.r_scaled AS DOUBLE) / r.k, 4) AS residual,
           ROUND(CAST(ABS(r.r_scaled) AS DOUBLE) / m.mad_scaled, 4)
             AS mad_score
    FROM resid r JOIN mad m ON m.event_type = r.event_type
    WHERE m.mad_scaled > 0
      AND CAST(ABS(r.r_scaled) AS DOUBLE) / m.mad_scaled > 5e0
    ORDER BY r.event_type, day
    """,
    doc="seasonal-residual anomaly detection: each (type, day) count's "
    "deviation from its own day-of-week mean as the exact integer "
    "n*k - s (scaled by the dow-group size so no float mean exists), "
    "then a per-type MAD rule on the scaled residuals — medians of "
    "integers interpolate at most at .5, exact on both engines — "
    "flagging days beyond 5 MADs. Removing the weekly baseline first "
    "is what separates 'Tuesday spike' from 'weekend as usual', the "
    "failure mode of the raw q155 rule on seasonal series. Two "
    "bounded aggregates + one join on the (type, dow) table",
)
def q242_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    dow = F.dayofweek("day")
    base = daily.groupBy("event_type", dow.alias("dow")).agg(
        F.sum("n").cast("long").alias("s"), F.count("*").cast("long").alias("k")
    )
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -22% (0.97->0.76)
    resid = hold(
        daily.join(
            base,
            (daily["event_type"] == base["event_type"]) & (dow == base["dow"]),
        )
        .drop(base["event_type"])
        .select(
            "event_type",
            "day",
            "n",
            (F.col("n") * F.col("k") - F.col("s")).alias("r_scaled"),
            "k",
        )
    )
    mad = resid.groupBy("event_type").agg(
        F.median(F.abs("r_scaled")).cast("double").alias("mad_scaled")
    )
    return (
        resid.join(
            mad.filter(F.col("mad_scaled") > 0).withColumnRenamed(
                "event_type", "et2"
            ),
            F.col("event_type") == F.col("et2"),
        )
        .filter(
            F.abs("r_scaled").cast("double") / F.col("mad_scaled") > 5.0
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.round(F.col("r_scaled").cast("double") / F.col("k"), 4).alias(
                "residual"
            ),
            F.round(
                F.abs("r_scaled").cast("double") / F.col("mad_scaled"), 4
            ).alias("mad_score"),
        )
        .orderBy("event_type", "day")
    )

# ---------------------------------------------------------------------------
# q252 — Theil-Sen robust trend: the median of all pairwise slopes of
# each type's daily series — the trend estimate one crazy outage day
# cannot drag (unlike q176/q210's least squares). Pairwise slopes are
# exact rationals evaluated identically; the O(days^2) pair set is
# bounded because the time axis is days, not rows
# ---------------------------------------------------------------------------
@register(
    "q252_theil_sen_trend",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, n,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS i
      FROM daily
    ),
    slopes AS (
      SELECT a.event_type,
             CAST(b.n - a.n AS DOUBLE) / (b.i - a.i) AS s
      FROM idx a JOIN idx b
        ON b.event_type = a.event_type AND b.i > a.i
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CAST(median(s) AS DOUBLE), 6) AS theil_sen_slope,
           ROUND(CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS frac_rising
    FROM slopes GROUP BY event_type ORDER BY event_type
    """,
    doc="Theil-Sen slope per event type over observed daily counts: "
    "every day-pair's slope (integer difference ratios — exact "
    "rationals in doubles), the median slope (interpolating one exact "
    "IEEE midpoint at most), and the fraction of rising pairs (a "
    "Mann-Kendall-style direction signal). Breakdown point 29% vs "
    "OLS's zero: one corrupted day moves q176's fit but not this. "
    "The pair join is |days|^2-bounded per type after one day "
    "aggregate of the corpus",
)
def q252_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -22% (0.52->0.40)
    idx = hold(
        daily.select(
            "event_type",
            "n",
            F.row_number()
            .over(W.partitionBy("event_type").orderBy("day"))
            .cast("long")
            .alias("i"),
        )
    )
    a = idx.select("event_type", F.col("n").alias("na"), F.col("i").alias("ia"))
    b = idx.select(
        F.col("event_type").alias("et2"),
        F.col("n").alias("nb"),
        F.col("i").alias("ib"),
    )
    slopes = a.join(
        b, (F.col("event_type") == F.col("et2")) & (F.col("ib") > F.col("ia"))
    ).select(
        "event_type",
        ((F.col("nb") - F.col("na")).cast("double") / (F.col("ib") - F.col("ia"))).alias(
            "s"
        ),
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.median("s").cast("double"), 6).alias("theil_sen_slope"),
            F.round(
                F.sum((F.col("s") > 0).cast("int")).cast("double") / F.count("*"),
                6,
            ).alias("frac_rising"),
        )
        .orderBy("event_type")
    )

# ---------------------------------------------------------------------------
# q253 — change-point localization by binary segmentation: the single
# split of each type's gap-filled daily series that maximizes the
# between-segment sum of squares — WHERE the level shifted, the
# complement of q192's CUSUM (which says THAT and roughly when it
# drifted). Scores are integer-cross-multiplied before one double
# division, argmax under a (score, day) total order
# ---------------------------------------------------------------------------
@register(
    "q253_binseg_changepoint",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    axis AS (
      SELECT event_type, unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
      FROM spans
    ),
    filled AS (
      SELECT a.event_type, a.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n
      FROM axis a LEFT JOIN daily d
        ON d.event_type = a.event_type AND d.day = a.day
    ),
    cum AS (
      SELECT event_type, day, n,
             CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS s1,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS k,
             CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS s,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nt
      FROM filled
    ),
    scored AS (
      SELECT event_type, day, k, s1, s, nt,
             CAST((s1 * nt - s * k) * (s1 * nt - s * k) AS DOUBLE)
               / (CAST(k AS DOUBLE) * (nt - k) * nt * nt) AS bss,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY
               CAST((s1 * nt - s * k) * (s1 * nt - s * k) AS DOUBLE)
                 / (CAST(k AS DOUBLE) * (nt - k) * nt * nt) DESC, day)
               AS rn
      FROM cum WHERE k < nt
    )
    SELECT event_type,
           strftime(day + INTERVAL '1 day', '%Y-%m-%d') AS shift_day,
           CAST(nt AS INT) AS n_days,
           ROUND(CAST(s1 AS DOUBLE) / k, 6) AS mean_before,
           ROUND(CAST(s - s1 AS DOUBLE) / (nt - k), 6) AS mean_after,
           ROUND(CAST(s - s1 AS DOUBLE) / (nt - k)
                 - CAST(s1 AS DOUBLE) / k, 6) AS level_shift,
           ROUND(bss, 6) AS bss_score
    FROM scored WHERE rn = 1 ORDER BY event_type
    """,
    doc="binary-segmentation change-point per type: one prefix-sum "
    "window gives every candidate split's between-segment score "
    "(s1*N - S*k cross-multiplied as exact BIGINTs, squared, one "
    "double division), argmax under (score desc, day) picks the "
    "boundary, and the output names the first day of the NEW level "
    "with both segment means and the shift. CUSUM (q192) alarms; "
    "this localizes — together they are the drift post-mortem. All "
    "work beyond the day aggregate is O(days) per type",
)
def q253_binseg_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    spans = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    axis = spans.select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    filled = axis.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0).cast("long")).alias("n")
    )
    wp = W.partitionBy("event_type")
    cum = filled.select(
        "event_type",
        "day",
        F.sum("n")
        .over(wp.orderBy("day").rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("s1"),
        F.row_number().over(wp.orderBy("day")).cast("long").alias("k"),
        F.sum("n").over(wp).cast("long").alias("s"),
        F.count("*").over(wp).cast("long").alias("nt"),
    ).filter(F.col("k") < F.col("nt"))
    num = (F.col("s1") * F.col("nt") - F.col("s") * F.col("k"))
    bss = (num * num).cast("double") / (
        F.col("k").cast("double")
        * (F.col("nt") - F.col("k"))
        * F.col("nt")
        * F.col("nt")
    )
    scored = cum.withColumn("bss", bss).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.col("bss").desc(), "day")
        ),
    )
    return (
        scored.filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format(
                F.col("day") + F.expr("interval 1 day"), "yyyy-MM-dd"
            ).alias("shift_day"),
            F.col("nt").cast("int").alias("n_days"),
            F.round(F.col("s1").cast("double") / F.col("k"), 6).alias(
                "mean_before"
            ),
            F.round(
                (F.col("s") - F.col("s1")).cast("double")
                / (F.col("nt") - F.col("k")),
                6,
            ).alias("mean_after"),
            F.round(
                (F.col("s") - F.col("s1")).cast("double")
                / (F.col("nt") - F.col("k"))
                - F.col("s1").cast("double") / F.col("k"),
                6,
            ).alias("level_shift"),
            F.round("bss", 6).alias("bss_score"),
        )
        .orderBy("event_type")
    )

# ---------------------------------------------------------------------------
# q257 — Holt-Winters MULTIPLICATIVE seasonality: the variant q201's
# additive model cannot express — seasonal swings that scale with the
# level (a type that doubles its volume doubles its weekend dip).
# Same fold discipline as q201: dyadic constants, strictly sequential
# day-ordered recursion, every arithmetic op IEEE (+ * / abs — division
# is correctly rounded, unlike pow), so both engines produce
# bit-identical doubles without a single libm call.
# ---------------------------------------------------------------------------
@register(
    "q257_holt_winters_multiplicative",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type, list(CAST(n AS DOUBLE) ORDER BY day) AS xs
      FROM daily GROUP BY event_type
      HAVING COUNT(*) >= 8
    ),
    init AS (
      SELECT event_type, xs,
             ((((((xs[1] + xs[2]) + xs[3]) + xs[4]) + xs[5]) + xs[6]) + xs[7])
               / 7e0 AS lvl0
      FROM series
    ),
    hw AS (
      SELECT event_type, xs, 7 AS i, lvl0 AS level, 0e0 AS trend, 0e0 AS err,
             [xs[j] / lvl0 FOR j IN generate_series(1, 7)] AS seas
      FROM init
      UNION ALL
      SELECT event_type, xs, i + 1,
             0.25e0 * (xs[i+1] / seas[(i % 7) + 1])
               + 0.75e0 * (level + trend),
             0.125e0 * ((0.25e0 * (xs[i+1] / seas[(i % 7) + 1])
                         + 0.75e0 * (level + trend)) - level)
               + 0.875e0 * trend,
             err + abs(xs[i+1] - (level + trend) * seas[(i % 7) + 1]),
             list_transform(seas, (s, j) -> CASE WHEN j = (i % 7) + 1
               THEN 0.25e0 * (xs[i+1]
                              / (0.25e0 * (xs[i+1] / seas[(i % 7) + 1])
                                 + 0.75e0 * (level + trend)))
                    + 0.75e0 * s
               ELSE s END)
      FROM hw WHERE i < len(xs)
    )
    SELECT event_type, CAST(len(xs) AS INT) AS n_days,
           ROUND(level, 6) AS level,
           ROUND(trend, 6) AS trend,
           ROUND((level + trend) * seas[(len(xs) % 7) + 1], 6) AS forecast_next,
           ROUND(list_aggregate(seas, 'max') / list_aggregate(seas, 'min'), 6)
             AS season_ratio,
           ROUND(err / (len(xs) - 7), 6) AS mae_1step
    FROM hw WHERE i = len(xs)
    ORDER BY event_type
    """,
    doc="Holt-Winters multiplicative smoothing with weekly seasonality "
    "over per-type daily counts — seasonal factors are RATIOS to the "
    "level (initialized as first-week xs/level ratios), so the model "
    "fits series whose weekly swing grows with volume, where q201's "
    "additive offsets lag. Updates: level = a*(x/seas) + "
    "(1-a)*(level+trend), seas = g*(x/new_level) + (1-g)*seas, with "
    "dyadic a=g=1/4, b=1/8; one-step errors scored against "
    "(level+trend)*seas along the fold; season_ratio = max/min factor "
    "(peak-to-trough multiplier). Daily counts are >= 1 so every "
    "divisor stays positive. Corpus work is one day aggregate; the "
    "fold is O(days) per type — identical shuffle profile to q201",
)
def q257_holt_winters_multiplicative(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    series = (
        daily.groupBy("event_type")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("day", "n"))),
                lambda s: s["n"].cast("double"),
            ).alias("xs")
        )
        .filter(F.size("xs") >= 8)
    )
    x = [F.element_at("xs", j) for j in range(1, 8)]
    lvl0 = ((((((x[0] + x[1]) + x[2]) + x[3]) + x[4]) + x[5]) + x[6]) / 7.0
    seas0 = F.transform(F.slice("xs", 1, 7), lambda s: s / lvl0)
    init = F.struct(
        lvl0.alias("level"),
        F.lit(0.0).alias("trend"),
        F.lit(0.0).alias("err"),
        seas0.alias("seas"),
    )
    days = F.transform(
        F.sequence(F.lit(8), F.size("xs")),
        lambda i: F.struct(
            i.alias("i"), F.element_at(F.col("xs"), i.cast("int")).alias("x")
        ),
    )

    def step(a, b):
        slot1 = ((b["i"] - 1) % 7 + 1).cast("int")  # 1-based seasonal slot
        sv = F.element_at(a["seas"], slot1)
        new_level = 0.25 * (b["x"] / sv) + 0.75 * (a["level"] + a["trend"])
        new_trend = 0.125 * (new_level - a["level"]) + 0.875 * a["trend"]
        new_err = a["err"] + F.abs(b["x"] - (a["level"] + a["trend"]) * sv)
        new_seas = F.transform(
            a["seas"],
            lambda s, j: F.when(
                j == (b["i"] - 1) % 7,  # Spark transform index is 0-based
                0.25 * (b["x"] / new_level) + 0.75 * s,
            ).otherwise(s),
        )
        return F.struct(
            new_level.alias("level"),
            new_trend.alias("trend"),
            new_err.alias("err"),
            new_seas.alias("seas"),
        )

    folded = series.select(
        "event_type",
        F.size("xs").cast("int").alias("n_days"),
        F.aggregate(days, init, step).alias("r"),
    )
    r = F.col("r")
    return folded.select(
        "event_type",
        "n_days",
        F.round(r["level"], 6).alias("level"),
        F.round(r["trend"], 6).alias("trend"),
        F.round(
            (r["level"] + r["trend"])
            * F.element_at(r["seas"], (F.col("n_days") % 7 + 1).cast("int")),
            6,
        ).alias("forecast_next"),
        F.round(F.array_max(r["seas"]) / F.array_min(r["seas"]), 6).alias(
            "season_ratio"
        ),
        F.round(r["err"] / (F.col("n_days") - 7), 6).alias("mae_1step"),
    ).orderBy("event_type")

# ---------------------------------------------------------------------------
# q293 — Chow structural-break test: the FORMAL version of what q192
# (CUSUM) detects and q253 (binseg) localizes — fit OLS trends to the
# two halves of each type's daily series and to the pooled series,
# and report the F-statistic for "did the trend break at the
# midpoint". RSS values come from exact integer moment sums (q196
# discipline), so the only doubles are the final divisions.
# ---------------------------------------------------------------------------
@register(
    "q293_chow_break_test",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS x,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
      FROM daily
    ),
    seg AS (
      SELECT event_type,
             CASE WHEN x * 2 <= nd THEN 1 ELSE 2 END AS half,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM idx GROUP BY 1, 2
    ),
    rss AS (
      SELECT event_type, half, n,
             (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) / n
             - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * sxx
                                       - CAST(sx AS DOUBLE) * sx)) AS ss
      FROM seg
    ),
    pooled AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM idx GROUP BY 1
    ),
    prss AS (
      SELECT event_type, n,
             (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) / n
             - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * sxx
                                       - CAST(sx AS DOUBLE) * sx)) AS ss
      FROM pooled
    ),
    halves AS (
      SELECT event_type,
             SUM(CASE WHEN half = 1 THEN ss END) AS ss1,
             SUM(CASE WHEN half = 2 THEN ss END) AS ss2
      FROM rss GROUP BY 1
    )
    SELECT p.event_type, CAST(p.n AS INT) AS n_days,
           ROUND(p.ss, 4) AS rss_pooled,
           ROUND(h.ss1 + h.ss2, 4) AS rss_split,
           ROUND(((p.ss - h.ss1 - h.ss2) / 2e0)
                 / ((h.ss1 + h.ss2) / (p.n - 4e0)), 6) AS chow_f,
           CAST(p.n - 4 AS INT) AS df2
    FROM prss p JOIN halves h USING (event_type)
    ORDER BY p.event_type
    """,
    doc="Chow test for a trend break at each type's series midpoint: "
    "per-half and pooled OLS residual sums of squares from exact "
    "BIGINT moments (RSS = (n*Syy - Sy^2)/n - (n*Sxy - Sx*Sy)^2 / "
    "(n*(n*Sxx - Sx^2)) — one algebraic form, both engines), then "
    "F = ((RSSp - RSS1 - RSS2)/2) / ((RSS1+RSS2)/(n-4)) with df2 "
    "reported so a reader applies their own critical value — the "
    "formal complement of q192's CUSUM alarm and q253's binseg "
    "localization. One day aggregate + two moment aggregates",
)
def q293_chow_break_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("y")
    )
    idx = daily.select(
        "event_type",
        "y",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("x"),
        F.count("*").over(W.partitionBy("event_type")).cast("long").alias("nd"),
    )

    def moments(df, extra):
        return df.groupBy("event_type", *extra).agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )

    def ss():
        n = F.col("n").cast("double")
        return (n * F.col("syy") - F.col("sy").cast("double") * F.col("sy")) / n - (
            (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            * (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
        ) / (n * (n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")))

    seg = moments(
        idx.withColumn(
            "half", F.when(F.col("x") * 2 <= F.col("nd"), 1).otherwise(2)
        ),
        ["half"],
    ).withColumn("ss", ss())
    halves = seg.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 1, F.col("ss"))).alias("ss1"),
        F.sum(F.when(F.col("half") == 2, F.col("ss"))).alias("ss2"),
    )
    pooled = moments(idx, []).withColumn("ss", ss())
    return (
        pooled.join(halves, "event_type")
        .select(
            "event_type",
            F.col("n").cast("int").alias("n_days"),
            F.round("ss", 4).alias("rss_pooled"),
            F.round(F.col("ss1") + F.col("ss2"), 4).alias("rss_split"),
            F.round(
                ((F.col("ss") - F.col("ss1") - F.col("ss2")) / 2.0)
                / ((F.col("ss1") + F.col("ss2")) / (F.col("n") - 4.0)),
                6,
            ).alias("chow_f"),
            (F.col("n") - 4).cast("int").alias("df2"),
        )
        .orderBy("event_type")
    )

# ---------------------------------------------------------------------------
# q294 — seasonality strength (eta-squared): what fraction of each
# type's daily-volume variance the day-of-week explains — the scalar
# that says whether q158's dow means matter and whether q201/q257's
# seasonal machinery is warranted, computed as a pure variance
# decomposition in exact integer moments (between-group SS over
# total SS, both as n-scaled integers so no float mean ever exists).
# ---------------------------------------------------------------------------
@register(
    "q294_seasonality_strength",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(dayofweek(time_bucket(INTERVAL '1 day', ts)) + 1 AS INT)
               AS dow,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(y) AS BIGINT) AS sg
      FROM daily GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s, CAST(SUM(y * y) AS BIGINT) AS ss
      FROM daily GROUP BY 1
    ),
    bg AS (
      SELECT g.event_type,
             CAST(SUM((g.sg * g.sg) // g.ng) AS BIGINT) AS sum_sq_over_n
      FROM g GROUP BY 1
    )
    SELECT t.event_type, CAST(t.n AS INT) AS n_days,
           ROUND((CAST(bg.sum_sq_over_n AS DOUBLE)
                  - CAST(t.s AS DOUBLE) * t.s / t.n)
                 / (t.ss - CAST(t.s AS DOUBLE) * t.s / t.n), 6)
             AS eta_squared,
           CAST((CAST(bg.sum_sq_over_n AS DOUBLE)
                 - CAST(t.s AS DOUBLE) * t.s / t.n)
                / (t.ss - CAST(t.s AS DOUBLE) * t.s / t.n) >= 0.2e0 AS INT)
             AS seasonal
    FROM t JOIN bg USING (event_type)
    ORDER BY t.event_type
    """,
    doc="day-of-week seasonality strength per type: eta^2 = "
    "between-dow sum of squares over total sum of squares on daily "
    "volumes — between-SS via the exact integer sum of floor(Sg^2/ng) "
    "(one floor per dow group, identical both engines), total-SS from "
    "BIGINT moments; one final double chain. eta^2 >= 0.2 flags types "
    "where the q201/q257 seasonal models earn their complexity; near "
    "zero says a flat q176 trend suffices. The dow label uses "
    "DuckDB's dayofweek+1 == Spark's dayofweek convention (the "
    "established shim) and is a GROUP KEY only",
)
def q294_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("long").alias("y")).withColumn(
        "dow", F.dayofweek("day").cast("int")
    )
    g = daily.groupBy("event_type", "dow").agg(
        F.count("*").cast("long").alias("ng"),
        F.sum("y").cast("long").alias("sg"),
    )
    t = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
    )
    bg = g.groupBy("event_type").agg(
        F.sum(F.expr("(sg * sg) div ng")).cast("long").alias("sum_sq_over_n")
    )
    num = F.col("sum_sq_over_n").cast("double") - F.col("s").cast("double") * F.col(
        "s"
    ) / F.col("n")
    den = F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n")
    return (
        t.join(bg, "event_type")
        .select(
            "event_type",
            F.col("n").cast("int").alias("n_days"),
            F.round(num / den, 6).alias("eta_squared"),
            (num / den >= 0.2).cast("int").alias("seasonal"),
        )
        .orderBy("event_type")
    )

# ---------------------------------------------------------------------------
# q317 — Chow test AT the binseg-chosen breakpoint: q293 tests the
# series MIDPOINT (a hypothesis nobody chose); this composes q253's
# localization (argmax between-segment SS on the gap-filled axis,
# integer cross-multiplied scores) with q293's F machinery — the two
# OLS fits split at the DETECTED break, candidate splits restricted
# to k in [3, n-3] so each segment carries the 3+ points a trend fit
# needs. The post-mortem pipeline in one query: locate, then test.
# ---------------------------------------------------------------------------
_CHOW_RSS = (
    "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) / n"
    " - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    "    * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))"
    "   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * sxx"
    "                           - CAST(sx AS DOUBLE) * sx))"
)


@register(
    "q317_chow_at_binseg",
    f"""
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    axis AS (
      SELECT event_type, unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
      FROM spans
    ),
    filled AS (
      SELECT a.event_type, a.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n
      FROM axis a LEFT JOIN daily d
        ON d.event_type = a.event_type AND d.day = a.day
    ),
    cum AS (
      SELECT event_type, day, n,
             CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS s1,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS k,
             CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS s,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nt
      FROM filled
    ),
    pick AS (
      SELECT event_type, k AS kstar, day, nt FROM (
        SELECT event_type, k, day, nt,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY
                 CAST((s1 * nt - s * k) * (s1 * nt - s * k) AS DOUBLE)
                   / (CAST(k AS DOUBLE) * (nt - k) * nt * nt) DESC, day)
                 AS rn
        FROM cum WHERE k >= 3 AND k <= nt - 3
      ) WHERE rn = 1
    ),
    idx AS (
      SELECT c.event_type, c.k AS x, c.n AS y, p.kstar
      FROM cum c JOIN pick p USING (event_type)
    ),
    seg AS (
      SELECT event_type,
             CASE WHEN x <= kstar THEN 1 ELSE 2 END AS half,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM idx GROUP BY 1, 2
    ),
    rss AS (SELECT event_type, half, {_CHOW_RSS} AS ss FROM seg),
    halves AS (
      SELECT event_type,
             SUM(CASE WHEN half = 1 THEN ss END) AS ss1,
             SUM(CASE WHEN half = 2 THEN ss END) AS ss2
      FROM rss GROUP BY 1
    ),
    pooled AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM idx GROUP BY 1
    ),
    prss AS (SELECT event_type, n, {_CHOW_RSS} AS ss FROM pooled)
    SELECT p.event_type,
           strftime(k.day + INTERVAL '1 day', '%Y-%m-%d') AS break_day,
           CAST(k.kstar AS INT) AS k_star,
           CAST(p.n AS INT) AS n_days,
           ROUND(p.ss, 4) AS rss_pooled,
           ROUND(h.ss1 + h.ss2, 4) AS rss_split,
           ROUND(CASE WHEN h.ss1 + h.ss2 > 0e0 THEN
                   ((p.ss - h.ss1 - h.ss2) / 2e0)
                   / ((h.ss1 + h.ss2) / (p.n - 4e0)) END, 6) AS chow_f,
           CAST(p.n - 4 AS INT) AS df2
    FROM prss p
    JOIN halves h USING (event_type)
    JOIN pick k USING (event_type)
    ORDER BY p.event_type
    """,
    doc="Chow structural-break F-test AT the binseg-detected "
    "breakpoint: q253's argmax between-segment score (exact BIGINT "
    "cross-multiplication, (score desc, day) tie-break) picks k* on "
    "the gap-filled daily axis with candidates restricted to "
    "[3, n-3] so both OLS fits have 3+ points, then q293's F "
    "machinery tests the split-at-k* trends against the pooled fit "
    "(RSS from exact integer moments, one double chain; F NULL when "
    "the split fits perfectly). Locate-then-test in one plan — the "
    "statistically honest version of testing an arbitrary midpoint. "
    "One day aggregate + windows + two moment aggregates, all "
    "O(days) per type",
)
def q317_chow_at_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    spans = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    axis = spans.select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    filled = axis.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0).cast("long")).alias("n")
    )
    wp = W.partitionBy("event_type")
    cum = hold(
        filled.select(
            "event_type",
            "day",
            "n",
            F.sum("n")
            .over(wp.orderBy("day").rowsBetween(W.unboundedPreceding, 0))
            .cast("long")
            .alias("s1"),
            F.row_number().over(wp.orderBy("day")).cast("long").alias("k"),
            F.sum("n").over(wp).cast("long").alias("s"),
            F.count("*").over(wp).cast("long").alias("nt"),
        )
    )
    num = F.col("s1") * F.col("nt") - F.col("s") * F.col("k")
    bss = (num * num).cast("double") / (
        F.col("k").cast("double")
        * (F.col("nt") - F.col("k"))
        * F.col("nt")
        * F.col("nt")
    )
    pick = (
        cum.filter((F.col("k") >= 3) & (F.col("k") <= F.col("nt") - 3))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("event_type").orderBy(bss.desc(), "day")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("k").alias("kstar"), "day", "nt")
    )
    idx = cum.join(
        F.broadcast(pick.select("event_type", "kstar")), "event_type"
    ).select(
        "event_type", F.col("k").alias("x"), F.col("n").alias("y"), "kstar"
    )

    def moments(df, extra):
        return df.groupBy("event_type", *extra).agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )

    def ss():
        n = F.col("n").cast("double")
        return (n * F.col("syy") - F.col("sy").cast("double") * F.col("sy")) / n - (
            (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            * (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
        ) / (n * (n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")))

    seg = moments(
        idx.withColumn(
            "half", F.when(F.col("x") <= F.col("kstar"), 1).otherwise(2)
        ),
        ["half"],
    ).withColumn("ss", ss())
    halves = seg.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 1, F.col("ss"))).alias("ss1"),
        F.sum(F.when(F.col("half") == 2, F.col("ss"))).alias("ss2"),
    )
    pooled = moments(idx, []).withColumn("ss", ss())
    chow = F.when(
        F.col("ss1") + F.col("ss2") > 0.0,
        ((F.col("ss") - F.col("ss1") - F.col("ss2")) / 2.0)
        / ((F.col("ss1") + F.col("ss2")) / (F.col("n") - 4.0)),
    )
    return (
        pooled.join(halves, "event_type")
        .join(F.broadcast(pick), "event_type")
        .select(
            "event_type",
            F.date_format(
                F.col("day") + F.expr("interval 1 day"), "yyyy-MM-dd"
            ).alias("break_day"),
            F.col("kstar").cast("int").alias("k_star"),
            F.col("n").cast("int").alias("n_days"),
            F.round("ss", 4).alias("rss_pooled"),
            F.round(F.col("ss1") + F.col("ss2"), 4).alias("rss_split"),
            F.round(chow, 6).alias("chow_f"),
            (F.col("n") - 4).cast("int").alias("df2"),
        )
        .orderBy("event_type")
    )

# ---------------------------------------------------------------------------
# q343 — Ljung-Box whiteness test over q216's ACF lags: is the daily
# series white noise, or is there structure worth a model? Q_LB =
# n(n+2) sum_k rho_k^2/(n-k) — each rho is one double division of
# exact BIGINT sums (q216's n-scaled deviations), each term is
# floored into 2^40 fixed point so the lag sum is an exact BIGINT
# (7 doubles summed in GROUP BY order would not be), one final chain.
# ---------------------------------------------------------------------------
_LB_FX = 1 << 40


@register(
    "q343_ljung_box",
    f"""
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    axis AS (
      SELECT event_type, unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
      FROM spans
    ),
    filled AS (
      SELECT a.event_type, a.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n,
             CAST(ROW_NUMBER() OVER (PARTITION BY a.event_type ORDER BY a.day)
                  AS BIGINT) AS i
      FROM axis a LEFT JOIN daily d
        ON d.event_type = a.event_type AND d.day = a.day
    ),
    tot AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS nd
      FROM filled GROUP BY 1
    ),
    dev AS (
      SELECT f.event_type, f.i, f.n * t.nd - t.s AS d, t.nd
      FROM filled f JOIN tot t USING (event_type)
    ),
    lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
    num AS (
      SELECT a.event_type, l.lag, a.nd,
             CAST(SUM(a.d * b.d) AS BIGINT) AS num
      FROM dev a
      JOIN lags l ON TRUE
      JOIN dev b ON b.event_type = a.event_type AND b.i = a.i + l.lag
      GROUP BY 1, 2, 3
    ),
    den AS (
      SELECT event_type, CAST(SUM(d * d) AS BIGINT) AS den
      FROM dev GROUP BY 1
    ),
    terms AS (
      SELECT n.event_type, n.nd,
             CAST(SUM(CAST(FLOOR((CAST(n.num AS DOUBLE) / d.den)
                    * (CAST(n.num AS DOUBLE) / d.den)
                    / (n.nd - n.lag) * {_LB_FX}) AS BIGINT)) AS BIGINT)
               AS t_fx
      FROM num n JOIN den d USING (event_type)
      GROUP BY 1, 2
    )
    SELECT event_type, CAST(nd AS INT) AS n_days,
           {_ACF_MAX_LAG} AS max_lag,
           ROUND(CAST(nd AS DOUBLE) * (nd + 2) * t_fx / {_LB_FX}, 6)
             AS q_ljung_box,
           CAST(CAST(nd AS DOUBLE) * (nd + 2) * t_fx / {_LB_FX}
                > 14.067140e0 AS INT) AS reject_white_noise
    FROM terms
    ORDER BY event_type
    """,
    doc="Ljung-Box whiteness test per type over the first 7 "
    "autocorrelations: rho_k = exact-BIGINT lagged cross-product over "
    "the exact lag-0 sum (q216's n-scaled deviation discipline), each "
    "rho_k^2/(n-k) term floored into 2^40 fixed point so the 7-term "
    "sum is an exact BIGINT (a bare double sum would be order-"
    "dependent), Q = n(n+2) * sum, rejected against the chi2(7) 5% "
    "critical value 14.067 as a hash-checked boolean. The formal "
    "gate on q216's eyeballed ACF and the whiteness check q172/q176 "
    "residual analysis needs. Work: q216's plan + a 7-row fold",
)
def q343_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    spans = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    axis = spans.select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    filled = axis.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("n", F.lit(0).cast("long")).alias("n"),
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("i"),
    )
    tot = filled.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("s"),
        F.count("*").cast("long").alias("nd"),
    )
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -19% (0.89->0.72)
    dev = hold(
        filled.join(F.broadcast(tot), "event_type").select(
            "event_type",
            "i",
            (F.col("n") * F.col("nd") - F.col("s")).alias("d"),
            "nd",
        )
    )
    lags = dev.sparkSession.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").alias("lag")
    )
    b = dev.select(
        F.col("event_type").alias("bet"),
        F.col("i").alias("bi"),
        F.col("d").alias("bd"),
    )
    num = (
        dev.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("bet") == F.col("event_type"))
            & (F.col("bi") == F.col("i") + F.col("lag")),
        )
        .groupBy("event_type", "lag", "nd")
        .agg(F.sum(F.col("d") * F.col("bd")).cast("long").alias("num"))
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.col("d") * F.col("d")).cast("long").alias("den")
    )
    rho = F.col("num").cast("double") / F.col("den")
    terms = (
        num.join(F.broadcast(den), "event_type")
        .groupBy("event_type", "nd")
        .agg(
            F.sum(
                F.floor(rho * rho / (F.col("nd") - F.col("lag")) * _LB_FX)
                .cast("long")
            )
            .cast("long")
            .alias("t_fx")
        )
    )
    qlb = (
        F.col("nd").cast("double")
        * (F.col("nd") + 2)
        * F.col("t_fx")
        / _LB_FX
    )
    return terms.select(
        "event_type",
        F.col("nd").cast("int").alias("n_days"),
        F.lit(_ACF_MAX_LAG).alias("max_lag"),
        F.round(qlb, 6).alias("q_ljung_box"),
        (qlb > 14.067140).cast("int").alias("reject_white_noise"),
    ).orderBy("event_type")

# ---------------------------------------------------------------------------
# q344 — Hurst exponent by rescaled-range (R/S) analysis: is the
# daily event volume mean-reverting (H < 0.5), a random walk (0.5),
# or long-range persistent (H > 0.5) — the memory diagnostic q216's
# short-lag ACF cannot see. Per dyadic scale the block R/S reduces to
# R_scaled * sqrt(s) / sqrt(sum z^2) with z = s*y - sum(y) exact
# integers (no float mean), block values floored into 2^30 fixed
# point for an order-free mean, and the log-log OLS slope runs on
# 2^20-floored ln values so every OLS moment is an exact BIGINT.
# ---------------------------------------------------------------------------
_HURST_SCALES = [4, 8, 16]

_HURST_FX = 1 << 30

_HURST_LFX = 1 << 20

def _hurst_sql() -> str:
    scales = ", ".join(str(s) for s in _HURST_SCALES)
    return f"""
    WITH daily AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS nd
      FROM daily
    ),
    sc AS (SELECT unnest([{scales}]) AS s),
    blk AS (
      SELECT sc.s, (i.i - 1) // sc.s AS b, i.i, i.y
      FROM idx i CROSS JOIN sc
      WHERE (i.i - 1) // sc.s < i.nd // sc.s
    ),
    bsum AS (
      SELECT s, b, CAST(SUM(y) AS BIGINT) AS sb FROM blk GROUP BY 1, 2
    ),
    z AS (
      SELECT blk.s, blk.b, blk.i, blk.s * blk.y - bs.sb AS z
      FROM blk JOIN bsum bs ON bs.s = blk.s AND bs.b = blk.b
    ),
    cum AS (
      SELECT s, b, z,
             CAST(SUM(z) OVER (PARTITION BY s, b ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS c
      FROM z
    ),
    rs AS (
      SELECT s, b,
             CAST(MAX(c) - MIN(c) AS BIGINT) AS r_scaled,
             CAST(SUM(z * z) AS BIGINT) AS ssz
      FROM cum GROUP BY 1, 2
    ),
    rsv AS (
      SELECT s,
             CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(CAST(FLOOR(CAST(r_scaled AS DOUBLE) * sqrt(CAST(s AS DOUBLE))
                  / sqrt(CAST(ssz AS DOUBLE)) * {_HURST_FX}) AS BIGINT))
                  AS BIGINT) AS rs_fx
      FROM rs WHERE ssz > 0 GROUP BY 1
    ),
    pts AS (
      SELECT s, n_blocks,
             CAST(rs_fx AS DOUBLE) / n_blocks / {_HURST_FX} AS mean_rs,
             CAST(FLOOR(ln(CAST(s AS DOUBLE)) * {_HURST_LFX}) AS BIGINT) AS x,
             CAST(FLOOR(ln(CAST(rs_fx AS DOUBLE) / n_blocks / {_HURST_FX})
                        * {_HURST_LFX}) AS BIGINT) AS y
      FROM rsv
    ),
    ols AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts
    ),
    h AS (
      SELECT CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS hurst
      FROM ols
    )
    SELECT p.s AS scale_days, p.n_blocks, ROUND(p.mean_rs, 6) AS mean_rs,
           ROUND(h.hurst, 6) AS hurst,
           CAST(h.hurst > 0.55e0 AS INT) AS persistent
    FROM pts p CROSS JOIN h
    ORDER BY p.s
    """


@register(
    "q344_hurst_exponent",
    _hurst_sql(),
    doc="Hurst exponent of the daily volume series by rescaled-range "
    "analysis over block scales 4/8/16 days: per block R/S = "
    "R_scaled * sqrt(s)/sqrt(sum z^2) where z = s*y - sum(y) keeps "
    "deviations exact integers (no float mean), cumulative deviations "
    "are exact window sums, per-block values floored into 2^30 fixed "
    "point for an order-free scale mean, and H is the log-log OLS "
    "slope over 2^20-floored ln points (all OLS moments exact "
    "BIGINTs). H near 0.5 = random walk; > 0.55 flagged persistent "
    "(long-range memory that invalidates q156's iid bootstrap CIs). "
    "One day rollup + bounded block windows",
)
def q344_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("y")
    )
    idx = daily.select(
        "y",
        F.row_number().over(W.orderBy("day")).cast("long").alias("i"),
        F.count("*").over(W.partitionBy()).cast("long").alias("nd"),
    )
    sc = idx.sparkSession.createDataFrame(
        [(s,) for s in _HURST_SCALES], "s long"
    )
    blk = (
        idx.crossJoin(F.broadcast(sc))
        .filter(
            F.expr("(i - 1) div s") < F.expr("nd div s")
        )
        .select("s", F.expr("(i - 1) div s").alias("b"), "i", "y")
    )
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -10% (0.86->0.77)
    blk = hold(blk)
    bsum = blk.groupBy("s", "b").agg(F.sum("y").cast("long").alias("sb"))
    z = blk.join(F.broadcast(bsum), ["s", "b"]).select(
        "s", "b", "i", (F.col("s") * F.col("y") - F.col("sb")).alias("z")
    )
    cum = z.select(
        "s",
        "b",
        "z",
        F.sum("z")
        .over(
            W.partitionBy("s", "b")
            .orderBy("i")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        .cast("long")
        .alias("c"),
    )
    rs = cum.groupBy("s", "b").agg(
        (F.max("c") - F.min("c")).cast("long").alias("r_scaled"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("ssz"),
    )
    rs_val = (
        F.col("r_scaled").cast("double")
        * F.sqrt(F.col("s").cast("double"))
        / F.sqrt(F.col("ssz").cast("double"))
    )
    rsv = (
        rs.filter(F.col("ssz") > 0)
        .groupBy("s")
        .agg(
            F.count("*").cast("long").alias("n_blocks"),
            F.sum(F.floor(rs_val * _HURST_FX).cast("long"))
            .cast("long")
            .alias("rs_fx"),
        )
    )
    mean_rs = F.col("rs_fx").cast("double") / F.col("n_blocks") / _HURST_FX
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -10% (0.86->0.77)
    pts = hold(
        rsv.select(
            "s",
            "n_blocks",
            mean_rs.alias("mean_rs"),
            F.floor(F.log(F.col("s").cast("double")) * _HURST_LFX)
            .cast("long")
            .alias("x"),
            F.floor(F.log(mean_rs) * _HURST_LFX).cast("long").alias("y"),
        )
    )
    ols = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    h = ols.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        ).alias("hurst")
    )
    return (
        pts.crossJoin(F.broadcast(h))
        .select(
            F.col("s").alias("scale_days"),
            "n_blocks",
            F.round("mean_rs", 6).alias("mean_rs"),
            F.round("hurst", 6).alias("hurst"),
            (F.col("hurst") > 0.55).cast("int").alias("persistent"),
        )
        .orderBy("scale_days")
    )
