"""Model-eval family: classifier training/calibration/evaluation, experiments, attribution and data-value analyses.

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
    _ABS_STEPS,
    _BM25_SCALE,
    _MKV_SCALE,
    _SHINGLES_CTE,
    _duck_cos,
    _hash_bucket_duck,
    _kish_sql,
)

# ---------------------------------------------------------------------------
# q111 — trained quality classifier: hashed-feature linear model, batch GD
# (the DCLM/CCNet model-based filter, trained inside the engine)
# ---------------------------------------------------------------------------
_CLF_BUCKETS = 64

_CLF_ITERS = 2

def _cfdiv(a: str, m: str) -> str:
    """Exact floor division in portable SQL (numerator made divisible)."""
    return f"CAST((({a}) - (((({a}) % ({m})) + ({m})) % ({m}))) / ({m}) AS BIGINT)"

def _classifier_sql(
    buckets: int = _CLF_BUCKETS, iters: int = _CLF_ITERS, train_where: str = ""
) -> str:
    """Replay of operators.classifier.hashed_linear_scores: every GD
    iteration is a (gradient, weights) CTE pair over the same tf table.
    With ``train_where``, the GRADIENT/label/count side restricts to the
    matching documents (proper training split) while the tf features and
    the final scoring cover the whole corpus — the q229 conformal shape;
    the default emits the exact historical full-corpus SQL (q111/q114)."""
    from frontmatter_mcp_spark.operators.classifier import LRINV, PDIV, SCALE
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    s, half = SCALE, SCALE // 2
    tw = f" WHERE {train_where}" if train_where else ""
    ctes = [
        """toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                            x -> x <> '')) AS t
      FROM documents
    )""",
        f"""tf AS (
      SELECT doc_id, {hash_bucket_sql('t', buckets)} AS b,
             CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2
    )""",
        f"""lab AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
      FROM documents{tw}
    )""",
        f"nn AS (SELECT CAST(COUNT(*) * {LRINV} AS BIGINT) AS d FROM documents{tw})",
        # iteration 1: w = 0, so the residual is S/2 - S*y directly
        f"""g1 AS (
      SELECT b, CAST(SUM(({half} - {s} * y) * tf) AS BIGINT) AS g
      FROM tf JOIN lab USING (doc_id) GROUP BY b
    )""",
        f"w1 AS (SELECT b, -{_cfdiv('g', 'd')} AS w FROM g1 CROSS JOIN nn)",
    ]
    for i in range(2, iters + 1):
        p = i - 1
        ctes += [
            f"""z{p} AS (
      SELECT doc_id, CAST(SUM(w * tf) AS BIGINT) AS z
      FROM tf JOIN w{p} USING (b) GROUP BY doc_id
    )""",
            f"""p{p} AS (
      SELECT lab.doc_id, y,
             LEAST({s}, GREATEST(0, {half} + {_cfdiv('COALESCE(z, 0)', str(PDIV))})) AS p
      FROM lab LEFT JOIN z{p} ON lab.doc_id = z{p}.doc_id
    )""",
            f"""g{i} AS (
      SELECT b, CAST(SUM((p - {s} * y) * tf) AS BIGINT) AS g
      FROM tf JOIN p{i - 1} ON tf.doc_id = p{i - 1}.doc_id GROUP BY b
    )""",
            f"""w{i} AS (
      SELECT w{p}.b, w{p}.w - {_cfdiv('g', 'd')} AS w
      FROM w{p} JOIN g{i} ON w{p}.b = g{i}.b CROSS JOIN nn
    )""",
        ]
    ctes.append(
        f"""zf AS (
      SELECT doc_id, CAST(SUM(w * tf) AS BIGINT) AS z
      FROM tf JOIN w{iters} USING (b) GROUP BY doc_id
    )"""
    )
    final_lab = "lab"
    if train_where:
        ctes.append(
            """alllab AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
      FROM documents
    )"""
        )
        final_lab = "alllab"
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT {final_lab}.doc_id, CAST(y AS INT) AS label,
           CAST(COALESCE(z, 0) AS BIGINT) AS score_fx,
           CAST(LEAST({s}, GREATEST(0, {half} + {_cfdiv('COALESCE(z, 0)', str(PDIV))}))
                AS DOUBLE) / {s} AS prob
    FROM {final_lab} LEFT JOIN zf ON {final_lab}.doc_id = zf.doc_id
    """


@register(
    "q111_quality_classifier",
    _classifier_sql(),
    doc="model-based quality filter, TRAINED in-engine (DCLM/CCNet "
    "recipe): batch gradient descent on hashed bag-of-words features "
    "separating the curated-positive set (here lang='en'; in production "
    "a reference corpus), then every document scored by the trained "
    "weights. All math is fixed-point integer (hard-sigmoid, exact "
    "floor-division updates), so training is bit-identical across "
    "engines and the oracle replays each GD step as a CTE pair. One "
    "corpus shuffle per iteration (map-side-combined 64-bucket gradient "
    "aggregate); weight tables are 64-row broadcasts; the tf table is "
    "pinned across its 2*iters+1 consumers",
)
def q111_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.classifier import hashed_linear_scores

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return hashed_linear_scores(
        d,
        "doc_id",
        "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=_CLF_BUCKETS,
        iters=_CLF_ITERS,
        persist_fn=pin,
    )

# ---------------------------------------------------------------------------
# q117 — classifier calibration: reliability table for the q111 model
# (the eval stage that decides whether the filter's threshold is usable)
# ---------------------------------------------------------------------------
def _calibration_sql() -> str:
    from frontmatter_mcp_spark.operators.classifier import SCALE

    return f"""
    SELECT CAST(LEAST(9, FLOOR(prob * 10)) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN (score_fx >= 0) = (label = 1) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CAST(prob * {SCALE} AS BIGINT)) AS DOUBLE)
             / (COUNT(*) * {SCALE}) AS mean_prob
    FROM ({_classifier_sql()}) s
    GROUP BY 1
    """


@register(
    "q117_classifier_calibration",
    _calibration_sql(),
    doc="model calibration / reliability table for the trained q111 "
    "filter: documents bucketed by predicted probability (10 bins), "
    "per-bin positive rate, accuracy, and mean predicted probability — "
    "the eval a production gate runs before trusting a threshold. The "
    "mean aggregates the INTEGER fixed-point probabilities (order-"
    "independent, exact) with ONE final double division; a 10-row "
    "output from one corpus-sized aggregate on top of the scoring plan",
)
def q117_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.classifier import SCALE, hashed_linear_scores

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    scored = hashed_linear_scores(
        d,
        "doc_id",
        "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=_CLF_BUCKETS,
        iters=_CLF_ITERS,
        persist_fn=hold,
    )
    correct = (F.col("score_fx") >= 0) == (F.col("label") == 1)
    return (
        scored.groupBy(
            F.least(F.lit(9), F.floor(F.col("prob") * 10)).cast("int").alias("bucket")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("label").cast("long").alias("n_pos"),
            F.sum(correct.cast("int")).cast("long").alias("n_correct"),
            (
                F.sum((F.col("prob") * SCALE).cast("long")).cast("double")
                / (F.count("*") * SCALE)
            ).alias("mean_prob"),
        )
    )

# ---------------------------------------------------------------------------
# q148 — k-NN classifier evaluation over the embedding space: each held
# query vector is labeled by the majority label of its 5 nearest
# neighbors (cosine, ties to the smaller label) and scored against its
# true label — the standard probe for "does this embedding space
# separate my classes" before training anything on it.
# ---------------------------------------------------------------------------
@register(
    "q148_knn_classifier_eval",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec, label AS true_label
               FROM embeddings WHERE vec_id % 10 = 0),
    c AS (SELECT vec_id AS cid, embedding AS cvec, label AS clabel
          FROM embeddings WHERE vec_id % 10 <> 0),
    pairs AS (
      SELECT qid, true_label, cid, clabel, {_duck_cos('qvec', 'cvec')} AS sim
      FROM q, c
    ),
    top5 AS (
      SELECT qid, true_label, clabel
      FROM (SELECT qid, true_label, clabel,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid)
                     AS rnk
            FROM pairs)
      WHERE rnk <= 5
    ),
    votes AS (
      SELECT qid, true_label, clabel, COUNT(*) AS v FROM top5 GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT qid, true_label, clabel AS predicted
      FROM (SELECT qid, true_label, clabel,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY v DESC, clabel)
                     AS r
            FROM votes)
      WHERE r = 1
    )
    SELECT true_label AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           round(CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM pred GROUP BY 1
    """,
    doc="k-NN classifier probe of the embedding space: 10% held-out "
    "query vectors labeled by the majority label of their 5 exact-cosine "
    "nearest neighbors (vote ties to the smaller label, rank ties to the "
    "smaller id), per-class accuracy against the true labels — the "
    "does-the-space-separate-classes check run before training an "
    "embedding-based filter. Query side broadcasts into one candidate "
    "scan (q36 shape); both rankings are windows over bounded keys",
)
def q148_knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("true_label"),
    )
    c = e.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cvec"),
        F.col("label").alias("clabel"),
    )
    # the top-5 table is bounded (5 x |queries|): IT is the broadcast
    # side of the corpus-label join, never the corpus
    top5 = c.select("cid", "clabel").join(
        F.broadcast(
            sim.cosine_topk(q, c, k=5).join(
                F.broadcast(q.select("qid", "true_label")), "qid"
            )
        ),
        "cid",
    )
    votes = top5.groupBy("qid", "true_label", "clabel").agg(
        F.count("*").alias("v")
    )
    r = W.partitionBy("qid").orderBy(F.col("v").desc(), "clabel")
    pred = (
        votes.withColumn("r", F.row_number().over(r))
        .filter(F.col("r") == 1)
        .select("qid", "true_label", F.col("clabel").alias("predicted"))
    )
    correct = F.sum(
        (F.col("predicted") == F.col("true_label")).cast("int")
    ).cast("long")
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count("*").cast("long").alias("n_queries"),
        correct.alias("n_correct"),
        F.round(correct.cast("double") / F.count("*"), 6).alias("accuracy"),
    )

# ---------------------------------------------------------------------------
# q149 — confusion matrix + precision/recall/F1 for the trained q111
# quality classifier (q117 gives calibration; this gives the
# thresholded operating point — the numbers a gate owner actually signs
# off on before turning the filter loose on a corpus)
# ---------------------------------------------------------------------------
def _confusion_sql() -> str:
    return f"""
    WITH s AS ({_classifier_sql()}),
    c AS (
      SELECT CAST(SUM(CASE WHEN label = 1 AND score_fx >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN label = 0 AND score_fx >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN label = 1 AND score_fx < 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN label = 0 AND score_fx < 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM s
    )
    SELECT tp, fp, fn, tn,
           round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_,
           round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_,
           round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) AS f1,
           round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy
    FROM c
    """


@register(
    "q149_classifier_confusion",
    _confusion_sql(),
    doc="confusion matrix + precision/recall/F1/accuracy for the q111 "
    "trained quality filter at the score>=0 operating point — the "
    "sign-off numbers for a model-based gate (q117 covers calibration). "
    "One extra 4-counter aggregate over the bit-exact replayed scores; "
    "ratios are identical double expressions rounded to 6",
)
def q149_classifier_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.classifier import hashed_linear_scores

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    s = hashed_linear_scores(
        d, "doc_id", "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=_CLF_BUCKETS, iters=_CLF_ITERS, persist_fn=pin,
    )
    pred = F.col("score_fx") >= 0
    pos = F.col("label") == 1
    c = s.agg(
        F.sum((pos & pred).cast("int")).cast("long").alias("tp"),
        F.sum((~pos & pred).cast("int")).cast("long").alias("fp"),
        F.sum((pos & ~pred).cast("int")).cast("long").alias("fn"),
        F.sum((~pos & ~pred).cast("int")).cast("long").alias("tn"),
    )
    return c.selectExpr(
        "tp", "fp", "fn", "tn",
        "round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_",
        "round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_",
        "round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) AS f1",
        "round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy",
    )

# ---------------------------------------------------------------------------
# q157 — A/B experiment readout: users hash-split into two arms, per-arm
# purchase conversion, and the two-proportion z statistic with pooled
# standard error — the experimentation primitive. The normal CDF (erf)
# is NOT cross-engine portable, so the readout ships the z value and
# the |z| > 1.96 verdict, not a p-value.
# ---------------------------------------------------------------------------
def _ab_test_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    arm = f"CASE WHEN {hash_bucket_sql('user_id', 2)} = 0 THEN 'A' ELSE 'B' END"
    return f"""
    WITH u AS (
      SELECT user_id, {arm} AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY 1
    ),
    arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS conv
      FROM u GROUP BY 1
    ),
    wide AS (
      SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS na,
             MAX(CASE WHEN arm = 'A' THEN conv END) AS ca,
             MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
             MAX(CASE WHEN arm = 'B' THEN conv END) AS cb
      FROM arms
    )
    SELECT na, ca, nb, cb,
           round(CAST(ca AS DOUBLE) / na, 6) AS rate_a,
           round(CAST(cb AS DOUBLE) / nb, 6) AS rate_b,
           round(CASE WHEN ca + cb = 0 OR ca + cb = na + nb THEN NULL ELSE (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb)) * (1e0 - CAST(ca + cb AS DOUBLE) / (na + nb)) * (1e0 / na + 1e0 / nb)) END, 6) AS z,
           COALESCE(ABS(CASE WHEN ca + cb = 0 OR ca + cb = na + nb THEN NULL ELSE (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb)) * (1e0 - CAST(ca + cb AS DOUBLE) / (na + nb)) * (1e0 / na + 1e0 / nb)) END) > 1.96e0, FALSE) AS significant
    FROM wide
    """


@register(
    "q157_ab_test",
    _ab_test_sql(),
    doc="A/B experiment readout: users md5-hash-split into two arms, "
    "per-arm purchase conversion, two-proportion z with pooled standard "
    "error, and the |z| > 1.96 verdict. erf (the normal CDF) is not "
    "correctly-rounded cross-engine, so the readout ships z itself — "
    "which is all a dashboard thresholds anyway. One user-key aggregate "
    "+ a 2-row pivot",
)
def q157_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
        )
        .withColumn(
            "arm",
            F.when(hash_bucket(F.col("user_id"), 2) == 0, "A").otherwise("B"),
        )
    )
    arms = u.groupBy("arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("cb"),
    )
    # degenerate arms (0% or 100% pooled conversion) have zero pooled
    # variance: z is undefined (and Spark ANSI raises on the division)
    z = (
        "CASE WHEN ca + cb = 0 OR ca + cb = na + nb THEN NULL ELSE "
        "(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)"
        " / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))"
        " * (1e0 - CAST(ca + cb AS DOUBLE) / (na + nb))"
        " * (1e0 / na + 1e0 / nb)) END"
    )
    return wide.selectExpr(
        "na", "ca", "nb", "cb",
        "round(CAST(ca AS DOUBLE) / na, 6) AS rate_a",
        "round(CAST(cb AS DOUBLE) / nb, 6) AS rate_b",
        f"round({z}, 6) AS z".format(z=z),
        f"COALESCE(ABS({z}) > 1.96e0, FALSE) AS significant".format(z=z),
    )

# ---------------------------------------------------------------------------
# q194 — multi-touch conversion attribution: every purchase distributes
# one unit of credit over the user's preceding touches inside a 3-day
# horizon under three standard models (first-touch / last-touch /
# linear), in exact integer credit units so the division leaves no
# float residue (the remainder goes to the last touch by rule)
# ---------------------------------------------------------------------------
_ATTR_SCALE = 2**20

_ATTR_TOUCH_TYPES = ("click", "view", "signup")

def _attribution_sql(s: int = _ATTR_SCALE) -> str:
    touch_in = ", ".join(f"'{t}'" for t in _ATTR_TOUCH_TYPES)
    return f"""
    WITH conv AS (
      SELECT event_id AS conv_id, user_id, ts AS conv_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT event_id AS touch_id, user_id, ts, event_type
      FROM events WHERE event_type IN ({touch_in})
    ),
    pairs AS (
      SELECT c.conv_id, t.touch_id, t.event_type, t.ts
      FROM conv c JOIN touch t ON t.user_id = c.user_id
       AND t.ts < c.conv_ts AND t.ts >= c.conv_ts - INTERVAL '3 days'
    ),
    ranked AS (
      SELECT conv_id, touch_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY conv_id
                                ORDER BY ts, touch_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY conv_id
                                ORDER BY ts DESC, touch_id DESC) AS rn_last,
             COUNT(*) OVER (PARTITION BY conv_id) AS n_t
      FROM pairs
    ),
    credits AS (
      SELECT event_type, touch_id, conv_id,
             {s} // n_t
               + CASE WHEN rn_last = 1 THEN {s} % n_t ELSE 0 END AS c_lin,
             CASE WHEN rn_first = 1 THEN {s} ELSE 0 END AS c_first,
             CASE WHEN rn_last = 1 THEN {s} ELSE 0 END AS c_last
      FROM ranked
    )
    SELECT event_type,
           CAST(COUNT(DISTINCT touch_id) AS BIGINT) AS n_touch_events,
           CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_conversions,
           CAST(SUM(c_lin) AS BIGINT) AS credit_linear,
           CAST(SUM(c_first) AS BIGINT) AS credit_first,
           CAST(SUM(c_last) AS BIGINT) AS credit_last
    FROM credits GROUP BY 1 ORDER BY 1
    """


@register(
    "q194_touch_attribution",
    _attribution_sql(),
    doc="multi-touch attribution over the click/view/signup -> purchase "
    "funnel: per conversion, the user's touches in the trailing 3 days "
    "ranked under a (ts, event_id) total order; linear credit is "
    "S//n with the integer remainder assigned to the LAST touch (sums "
    "are exactly S per attributed conversion — no float residue to "
    "drift cross-engine), first/last-touch get the whole unit. The "
    "pair join is user-keyed with a bounded time horizon (the q55 "
    "interval-join shape — at 100 TB this runs as the watermarked "
    "stream-stream join, state bounded by the 3-day horizon); ranks "
    "run per conversion, aggregation is map-side combined per channel",
)
def q194_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    s = _ATTR_SCALE
    e = load_table(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
    )
    touch = e.filter(F.col("event_type").isin(*_ATTR_TOUCH_TYPES)).select(
        F.col("event_id").alias("touch_id"), "user_id", "ts", "event_type"
    )
    pairs = conv.join(touch, "user_id").filter(
        (F.col("ts") < F.col("conv_ts"))
        & (F.col("ts") >= F.col("conv_ts") - F.expr("interval 3 days"))
    )
    ranked = pairs.select(
        "conv_id",
        "touch_id",
        "event_type",
        F.row_number()
        .over(W.partitionBy("conv_id").orderBy("ts", "touch_id"))
        .alias("rn_first"),
        F.row_number()
        .over(
            W.partitionBy("conv_id").orderBy(
                F.col("ts").desc(), F.col("touch_id").desc()
            )
        )
        .alias("rn_last"),
        F.count("*").over(W.partitionBy("conv_id")).alias("n_t"),
    )
    credits = ranked.select(
        "event_type",
        "touch_id",
        "conv_id",
        (
            F.expr(f"{s} div n_t")
            + F.when(F.col("rn_last") == 1, F.lit(s) % F.col("n_t")).otherwise(0)
        ).alias("c_lin"),
        F.when(F.col("rn_first") == 1, F.lit(s)).otherwise(0).alias("c_first"),
        F.when(F.col("rn_last") == 1, F.lit(s)).otherwise(0).alias("c_last"),
    )
    return (
        credits.groupBy("event_type")
        .agg(
            F.countDistinct("touch_id").cast("long").alias("n_touch_events"),
            F.countDistinct("conv_id").cast("long").alias("n_conversions"),
            F.sum("c_lin").cast("long").alias("credit_linear"),
            F.sum("c_first").cast("long").alias("credit_first"),
            F.sum("c_last").cast("long").alias("credit_last"),
        )
        .orderBy("event_type")
    )

# ---------------------------------------------------------------------------
# q204 — experiment readout: the end-to-end A/B analysis every product
# team runs — deterministic hash assignment (the q57 split machinery),
# per-variant click->purchase conversion, and the two-proportion z-test
# verdict (q157's arithmetic) in one declarative plan
# ---------------------------------------------------------------------------
def _experiment_sql() -> str:
    b = _hash_bucket_duck("user_id", 2)
    return f"""
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN {b} = 0 THEN 'A' ELSE 'B' END AS variant,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS purchased
      FROM events GROUP BY 1, 2
    ),
    v AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(clicked) AS BIGINT) AS n_clicked,
             CAST(SUM(CASE WHEN clicked = 1 AND purchased = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
      FROM assigned GROUP BY 1
    ),
    w AS (
      SELECT
        MAX(CASE WHEN variant = 'A' THEN n_users END) AS users_a,
        MAX(CASE WHEN variant = 'A' THEN n_clicked END) AS clicked_a,
        MAX(CASE WHEN variant = 'A' THEN n_converted END) AS converted_a,
        MAX(CASE WHEN variant = 'B' THEN n_users END) AS users_b,
        MAX(CASE WHEN variant = 'B' THEN n_clicked END) AS clicked_b,
        MAX(CASE WHEN variant = 'B' THEN n_converted END) AS converted_b
      FROM v
    )
    SELECT users_a, clicked_a, converted_a, users_b, clicked_b, converted_b,
           ROUND(CAST(converted_a AS DOUBLE) / clicked_a, 6) AS rate_a,
           ROUND(CAST(converted_b AS DOUBLE) / clicked_b, 6) AS rate_b,
           -- a pooled rate of exactly 0 or 1 has zero variance: no test
           CASE WHEN converted_a + converted_b > 0
                 AND converted_a + converted_b < clicked_a + clicked_b
                THEN ROUND((CAST(converted_a AS DOUBLE) / clicked_a
                            - CAST(converted_b AS DOUBLE) / clicked_b)
                     / sqrt((CAST(converted_a + converted_b AS DOUBLE)
                             / (clicked_a + clicked_b))
                            * (1e0 - CAST(converted_a + converted_b AS DOUBLE)
                                     / (clicked_a + clicked_b))
                            * (1e0 / clicked_a + 1e0 / clicked_b)), 6)
           END AS z,
           CASE WHEN converted_a + converted_b > 0
                 AND converted_a + converted_b < clicked_a + clicked_b
                THEN CAST(ABS((CAST(converted_a AS DOUBLE) / clicked_a
                          - CAST(converted_b AS DOUBLE) / clicked_b)
                         / sqrt((CAST(converted_a + converted_b AS DOUBLE)
                                 / (clicked_a + clicked_b))
                                * (1e0 - CAST(converted_a + converted_b AS DOUBLE)
                                         / (clicked_a + clicked_b))
                                * (1e0 / clicked_a + 1e0 / clicked_b))) > 1.96e0
                     AS INT)
                ELSE 0 END AS significant_05
    FROM w
    """


@register(
    "q204_experiment_readout",
    _experiment_sql(),
    doc="A/B experiment readout in one plan: users assigned to variants "
    "by the deterministic md5 bucket (the q57 split — assignment "
    "reproducible across engines and reruns), per-variant click->"
    "purchase conversion among clickers, and the pooled two-proportion "
    "z-test with the alpha=0.05 verdict (q157's IEEE sqrt/divide "
    "chain). One user-keyed aggregate + one 2-row pivot — at 100 TB "
    "the only shuffle is the per-user collapse, which AQE coalesces",
)
def q204_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    e = load_table(spark, sf_dir, "events")
    assigned = e.groupBy(
        "user_id",
        F.when(hash_bucket(F.col("user_id"), 2) == 0, "A")
        .otherwise("B")
        .alias("variant"),
    ).agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("clicked"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("purchased"),
    )
    v = assigned.groupBy("variant").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("clicked").cast("long").alias("n_clicked"),
        F.sum(((F.col("clicked") == 1) & (F.col("purchased") == 1)).cast("int"))
        .cast("long")
        .alias("n_converted"),
    )
    w = v.agg(
        *[
            F.max(F.when(F.col("variant") == var, F.col(c))).alias(
                f"{out}_{var.lower()}"
            )
            for var in ("A", "B")
            for c, out in [
                ("n_users", "users"),
                ("n_clicked", "clicked"),
                ("n_converted", "converted"),
            ]
        ]
    )
    ca, cb = F.col("converted_a").cast("double"), F.col("converted_b").cast("double")
    ka, kb = F.col("clicked_a"), F.col("clicked_b")
    rate_a, rate_b = ca / ka, cb / kb
    pool = (ca + cb) / (ka + kb)
    # a pooled rate of exactly 0 or 1 has zero variance: no test
    nondegenerate = (
        (F.col("converted_a") + F.col("converted_b") > 0)
        & (F.col("converted_a") + F.col("converted_b") < ka + kb)
    )
    z = F.when(
        nondegenerate,
        (rate_a - rate_b)
        / F.sqrt(pool * (1.0 - pool) * (1.0 / ka + 1.0 / kb)),
    )
    return w.select(
        "users_a",
        "clicked_a",
        "converted_a",
        "users_b",
        "clicked_b",
        "converted_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round(z, 6).alias("z"),
        F.coalesce((F.abs(z) > 1.96).cast("int"), F.lit(0)).alias(
            "significant_05"
        ),
    )

# ---------------------------------------------------------------------------
# q229 — split-conformal calibration of the q111 quality classifier:
# train on split 0, take the ceil((n+1)*0.9)-quantile nonconformity
# threshold from split 1's positives (a pure ORDER STATISTIC — integer
# rank, no interpolation, exact fixed-point scores), then audit the
# marginal coverage guarantee on held-out split 2. The distribution-
# free "is my filter's confidence honest" check, entirely in-engine
# ---------------------------------------------------------------------------
def _conformal_sql() -> str:
    split = _hash_bucket_duck("doc_id", 3)
    clf = _classifier_sql(train_where=f"{split} = 0")
    return f"""
    WITH clf AS ({clf}),
    tagged AS (
      SELECT c.doc_id, c.label, c.score_fx, {split} AS split
      FROM clf c
    ),
    cal AS (
      SELECT score_fx,
             CAST(ROW_NUMBER() OVER (ORDER BY score_fx DESC, doc_id)
                  AS BIGINT) AS rn,
             CAST(COUNT(*) OVER () AS BIGINT) AS n_cal
      FROM tagged WHERE split = 1 AND label = 1
    ),
    thr AS (
      SELECT n_cal,
             (9 * (n_cal + 1) + 9) // 10 AS k,
             MAX(CASE WHEN rn = (9 * (n_cal + 1) + 9) // 10
                      THEN score_fx END) AS t
      FROM cal GROUP BY n_cal
    ),
    ev AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n_eval,
        CAST(SUM(label) AS BIGINT) AS n_eval_pos,
        CAST(SUM(CASE WHEN label = 1
                       AND (t.t IS NULL OR score_fx >= t.t)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        CAST(SUM(CASE WHEN t.t IS NULL OR score_fx >= t.t
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
      FROM tagged CROSS JOIN thr t WHERE split = 2
    )
    SELECT t.n_cal AS n_cal_pos, CAST(t.k AS BIGINT) AS k_rank,
           t.t AS threshold_fx,
           e.n_eval, e.n_eval_pos,
           ROUND(CAST(e.n_covered AS DOUBLE) / e.n_eval_pos, 6) AS coverage,
           ROUND(CAST(e.n_selected AS DOUBLE) / e.n_eval, 6) AS selection_rate
    FROM thr t CROSS JOIN ev e
    """


@register(
    "q229_conformal_calibration",
    _conformal_sql(),
    doc="split-conformal prediction audit over the in-engine trained "
    "quality classifier: a 3-way md5 split (train / calibrate / "
    "evaluate), the q111 GD training restricted to split 0 via the "
    "parameterized replay (features and scoring still cover the whole "
    "corpus), the conformal threshold as the k = ceil(0.9*(n+1))-th "
    "LARGEST calibration-positive score (an exact integer-rank order "
    "statistic over exact fixed-point scores — if k exceeds n_cal the "
    "set is everything, the textbook rule), and held-out coverage + "
    "selection rate on split 2. Conformal's marginal-coverage "
    "guarantee makes `coverage` land near 0.9 for ANY score "
    "distribution — the honesty check for every model-based filter "
    "in this workload. Adds one rank over calibration positives and "
    "two counters to q111's training cost",
)
def q229_conformal_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators import classifier as clf
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    split = hash_bucket(F.col("doc_id"), 3)
    w_rows = clf.train_weights(
        d.filter(split == 0),
        "doc_id",
        "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=_CLF_BUCKETS,
        iters=_CLF_ITERS,
        persist_fn=hold,
    ).collect()
    weights = {r.b: r.w for r in w_rows}
    scored = hold(
        d.select(
            "doc_id",
            split.alias("split"),
            (F.col("lang") == "en").cast("long").alias("label"),
            clf.literal_score_expr("text", weights, buckets=_CLF_BUCKETS).alias(
                "score_fx"
            ),
        )
    )
    cal = scored.filter((F.col("split") == 1) & (F.col("label") == 1)).select(
        "doc_id", "score_fx"
    )
    ncal = cal.agg(F.count("*").cast("long").alias("n_cal"))
    ranked = cal.select(
        "score_fx",
        F.row_number()
        .over(W.orderBy(F.col("score_fx").desc(), "doc_id"))
        .cast("long")
        .alias("rn"),
    )
    k = F.expr("(9 * (n_cal + 1) + 9) div 10")
    thr = (
        ranked.crossJoin(F.broadcast(ncal))
        .groupBy("n_cal")
        .agg(
            F.max(F.when(F.col("rn") == k, F.col("score_fx"))).alias("t"),
        )
        .select("n_cal", F.expr("(9 * (n_cal + 1) + 9) div 10").alias("k"), "t")
    )
    ev = (
        scored.filter(F.col("split") == 2)
        .crossJoin(F.broadcast(thr.select("t")))
        .agg(
            F.count("*").cast("long").alias("n_eval"),
            F.sum("label").cast("long").alias("n_eval_pos"),
            F.sum(
                F.when(
                    (F.col("label") == 1)
                    & (F.col("t").isNull() | (F.col("score_fx") >= F.col("t"))),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
            F.sum(
                F.when(
                    F.col("t").isNull() | (F.col("score_fx") >= F.col("t")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_selected"),
        )
    )
    return (
        thr.crossJoin(F.broadcast(ev))
        .select(
            F.col("n_cal").alias("n_cal_pos"),
            F.col("k").cast("long").alias("k_rank"),
            F.col("t").alias("threshold_fx"),
            "n_eval",
            "n_eval_pos",
            F.round(
                F.col("n_covered").cast("double") / F.col("n_eval_pos"), 6
            ).alias("coverage"),
            F.round(
                F.col("n_selected").cast("double") / F.col("n_eval"), 6
            ).alias("selection_rate"),
        )
    )

# ---------------------------------------------------------------------------
# q238 — duplicate-pair explanations: the top near-dup pairs WITH the
# evidence a human reviewer needs — shared-shingle counts, Jaccard,
# and three deterministically-sampled common shingles quoted inline.
# Dedup verdicts that can be audited get trusted; opaque ones get
# re-litigated forever
# ---------------------------------------------------------------------------
_EXPLAIN_TOPK = 10


@register(
    "q238_pair_explanations",
    f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
    f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
          WHERE dfreq.df_count <= {{maxdf}}),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT id_a, id_b, n_common,
             FLOOR((n_common * 1.0 / (sa.set_size + sb.set_size - n_common))
                   * 1000000e0) / 1000000e0 AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    ),
    top AS (
      SELECT id_a, id_b, n_common, jaccard FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY jaccard DESC, id_a, id_b) AS rn
        FROM scored
      ) WHERE rn <= {_EXPLAIN_TOPK}
    ),
    ev AS (
      SELECT t.id_a, t.id_b, a2.shingle,
             ROW_NUMBER() OVER (PARTITION BY t.id_a, t.id_b
               ORDER BY md5(a2.shingle), a2.shingle) AS srn
      FROM top t
      JOIN f a2 ON a2.doc_id = t.id_a
      JOIN f b2 ON b2.doc_id = t.id_b AND b2.shingle = a2.shingle
    ),
    quoted AS (
      SELECT id_a, id_b,
             string_agg(shingle, ' | ' ORDER BY md5(shingle), shingle)
               AS evidence
      FROM ev WHERE srn <= 3 GROUP BY 1, 2
    )
    SELECT t.id_a, t.id_b, t.n_common, t.jaccard, q.evidence
    FROM top t JOIN quoted q ON q.id_a = t.id_a AND q.id_b = t.id_b
    ORDER BY t.jaccard DESC, t.id_a, t.id_b
    """.replace("{maxdf}", "50"),
    doc="explainable dedup: the top-10 verified pairs by exact df-"
    "capped Jaccard (the q33 machinery) each annotated with three "
    "md5-sampled common shingles quoted verbatim — the audit record "
    "reviewers and takedown processes need next to a bare score. "
    "Evidence joins run only for the 10 selected pairs; shingle "
    "sampling is deterministic (md5 then text order), so the whole "
    "explanation table hash-verifies",
)
def q238_pair_explanations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    sh = d.select(
        "doc_id", F.explode(dd.word_shingles(F.col("text"), 3)).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df_count"))
    f = pin(sh.join(dfreq.filter(F.col("df_count") <= 50), "shingle"))
    a = f.select(F.col("doc_id").alias("id_a"), "shingle")
    b = f.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("set_size").alias("size_b"))
    scored = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            vector.floor_quant(
                F.col("n_common").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    top = pin(
        scored.withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.col("jaccard").desc(), "id_a", "id_b")),
        )
        .filter(F.col("rn") <= _EXPLAIN_TOPK)
        .drop("rn")
    )
    a2 = f.select(F.col("doc_id").alias("id_a"), "shingle")
    b2 = f.select(F.col("doc_id").alias("idb2"), F.col("shingle").alias("sh_b"))
    ev = (
        top.select("id_a", "id_b")
        .join(a2, "id_a")
        .join(
            b2,
            (F.col("id_b") == F.col("idb2")) & (F.col("shingle") == F.col("sh_b")),
        )
        .select(F.col("id_a").alias("ea"), F.col("id_b").alias("eb"), "shingle")
    )
    quoted = (
        ev.withColumn(
            "srn",
            F.row_number().over(
                W.partitionBy("ea", "eb").orderBy(F.md5("shingle"), "shingle")
            ),
        )
        .filter(F.col("srn") <= 3)
        .groupBy("ea", "eb")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.md5("shingle").alias("h"), "shingle"))
                    ),
                    lambda s: s["shingle"],
                ),
                " | ",
            ).alias("evidence")
        )
    )
    return (
        top.join(
            quoted,
            (top["id_a"] == quoted["ea"]) & (top["id_b"] == quoted["eb"]),
        )
        .select("id_a", "id_b", "n_common", "jaccard", "evidence")
        .orderBy(F.col("jaccard").desc(), "id_a", "id_b")
    )

# ---------------------------------------------------------------------------
# q250 — training-readiness gate: CI for the corpus. Five cheap audit
# signals this workload certifies individually — dup inflation (q206),
# mixture design effect (q214), epoch-shuffle decorrelation (q228),
# max cross-source KS drift (q203), and the hapax floor (q249) —
# recomputed in ONE plan as named verdicts plus the overall PASS bit
# that a pipeline can block a training launch on
# ---------------------------------------------------------------------------
def _readiness_sql() -> str:
    kish = _kish_sql("documents", "//")
    return rf"""
    WITH tok AS (
      SELECT doc_id, md5(text) AS fp,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n
      FROM documents
    ),
    keep AS (SELECT MIN(doc_id) AS kid FROM tok GROUP BY fp),
    infl AS (
      SELECT CAST(SUM(n) AS DOUBLE)
             / SUM(CASE WHEN k.kid IS NOT NULL THEN n ELSE 0 END) AS inflation
      FROM tok LEFT JOIN keep k ON k.kid = tok.doc_id
    ),
    kish AS (SELECT deff FROM ({kish})),
    ranks AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY md5('e1|' || CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS r1,
             CAST(ROW_NUMBER() OVER (
               ORDER BY md5('e2|' || CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS r2
      FROM documents
    ),
    rho AS (
      SELECT ABS(1e0 - 6e0 * SUM((r1 - r2) * (r1 - r2))
                 / (CAST(COUNT(*) AS DOUBLE)
                    * (CAST(COUNT(*) AS DOUBLE) * COUNT(*) - 1e0))) AS a,
             3e0 / sqrt(CAST(COUNT(*) AS DOUBLE)) AS bound
      FROM ranks
    ),
    src AS (
      SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM src GROUP BY 1),
    vals AS (SELECT DISTINCT n_chars AS v FROM documents),
    saxis AS (
      SELECT t.source, t.n, a.v, COALESCE(s.c, CAST(0 AS BIGINT)) AS cv
      FROM stot t CROSS JOIN vals a
      LEFT JOIN src s ON s.source = t.source AND s.n_chars = a.v
    ),
    scum AS (
      SELECT source, n, v,
             CAST(SUM(cv) OVER (PARTITION BY source ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cc
      FROM saxis
    ),
    ksmax AS (
      SELECT MAX(CAST(ABS(a.cc * b.n - b.cc * a.n) AS DOUBLE)
                 / (CAST(a.n AS DOUBLE) * b.n)) AS d
      FROM scum a JOIN scum b ON a.v = b.v AND a.source < b.source
    ),
    hap AS (
      SELECT CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS hapax
      FROM (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM (
          SELECT unnest(list_filter(string_split_regex(trim(lower(text)),
                        '\s+'), x -> x <> '')) AS term
          FROM documents
        ) GROUP BY term
      )
    )
    SELECT ROUND(i.inflation, 4) AS dup_inflation,
           CAST(i.inflation <= 1.5e0 AS INT) AS dup_ok,
           ROUND(k.deff, 4) AS mixture_deff,
           CAST(k.deff <= 2e0 AS INT) AS mixture_ok,
           ROUND(r.a, 6) AS shuffle_abs_rho,
           CAST(r.a < r.bound AS INT) AS shuffle_ok,
           ROUND(m.d, 6) AS max_ks_drift,
           CAST(m.d <= 0.3e0 AS INT) AS drift_ok,
           ROUND(h.hapax, 6) AS hapax_frac,
           CAST(h.hapax >= 0.05e0 AS INT) AS richness_ok,
           CAST(i.inflation <= 1.5e0 AND k.deff <= 2e0 AND r.a < r.bound
                AND m.d <= 0.3e0 AND h.hapax >= 0.05e0 AS INT) AS ready
    FROM infl i CROSS JOIN kish k CROSS JOIN rho r
    CROSS JOIN ksmax m CROSS JOIN hap h
    """


@register(
    "q250_training_readiness",
    _readiness_sql(),
    doc="the launch gate: five independently-certified audit rules "
    "(q206 dup inflation <= 1.5, q214 Kish design effect <= 2, q228 "
    "epoch-shuffle |rho| under 3/sqrt(n), q203 max cross-source KS "
    "drift <= 0.3, q249 hapax fraction >= 0.05) recomputed in one "
    "declarative plan as named verdict bits plus the overall `ready` "
    "flag — continuous integration for the corpus itself, the row a "
    "training launch blocks on. Each signal keeps its certified "
    "shape (fingerprint aggregate, IPF chain, rank windows, bounded "
    "KS axis, vocab aggregate); the gate is their one-row cross join",
)
def q250_training_readiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents_q250")
    # signal 1: dup inflation (q206 rule)
    tok = d.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.size(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+", -1),
                lambda x: x != F.lit(""),
            )
        )
        .cast("long")
        .alias("n"),
    )
    keep = tok.groupBy("fp").agg(F.min("doc_id").alias("kid"))
    infl = (
        tok.join(keep, tok["doc_id"] == keep["kid"], "left")
        .agg(
            (
                F.sum("n").cast("double")
                / F.sum(F.when(F.col("kid").isNotNull(), F.col("n")).otherwise(0))
            ).alias("inflation")
        )
    )
    # signal 2: Kish design effect over the raking weights (q214 chain)
    kish = spark.sql(_kish_sql("documents_q250", " div ")).select("deff")
    # signal 3: epoch-shuffle decorrelation (q228 rule)
    key = lambda e: F.md5(  # noqa: E731
        F.concat(F.lit(e + "|"), F.col("doc_id").cast("string"))
    )

    # q228's rule, q228's fix: both epoch ranks in ONE two-phase pass
    # (unpivot to (epoch, md5 key) rows, epoch-block + 2-hex-prefix
    # monotone bucket, per-epoch rank = rn - (epoch-1)*N, pivot back)
    # instead of two corpus-wide single-partition windows.
    from frontmatter_mcp_spark.operators.total_order import (
        hex_prefix_bucket,
        with_global_row_number,
    )

    stacked = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("e"), key("e1").alias("ok")),
                F.struct(F.lit(2).alias("e"), key("e2").alias("ok")),
            )
        ).alias("__s"),
    ).select("doc_id", F.col("__s.e").alias("__e"), F.col("__s.ok").alias("__ok"))
    ranked = with_global_row_number(
        stacked,
        [("__e", True), ("__ok", True), ("doc_id", True)],
        out="__rn",
        bucket=(F.col("__e").cast("long") - 1) * 256
        + hex_prefix_bucket(F.col("__ok")),
        total_out="__tot2",
    )
    n_docs = (F.col("__tot2") / 2).cast("long")
    erank = F.col("__rn") - (F.col("__e").cast("long") - 1) * n_docs
    ranks = ranked.groupBy("doc_id").agg(
        F.max(F.when(F.col("__e") == 1, erank)).alias("r1"),
        F.max(F.when(F.col("__e") == 2, erank)).alias("r2"),
    )
    nd = F.count("*").cast("double")
    rho = ranks.agg(
        F.abs(
            1.0
            - 6.0
            * F.sum((F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2")))
            / (nd * (nd * F.count("*") - 1.0))
        ).alias("a"),
        (3.0 / F.sqrt(nd)).alias("bound"),
    )
    # signal 4: max cross-source KS drift (q203 machinery, max only)
    src = d.groupBy("source", "n_chars").agg(F.count("*").cast("long").alias("c"))
    stot = src.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    vals = d.select(F.col("n_chars").alias("v")).distinct()
    saxis = (
        stot.select(F.col("source").alias("s"), "n")
        .crossJoin(vals)
        .join(
            src.select(
                F.col("source").alias("s2"), F.col("n_chars").alias("v2"), "c"
            ),
            (F.col("s") == F.col("s2")) & (F.col("v") == F.col("v2")),
            "left",
        )
        .select(
            F.col("s").alias("source"),
            "n",
            "v",
            F.coalesce("c", F.lit(0)).cast("long").alias("cv"),
        )
    )
    scum = saxis.select(
        "source",
        "n",
        "v",
        F.sum("cv")
        .over(
            W.partitionBy("source").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
        )
        .cast("long")
        .alias("cc"),
    )
    a = scum.select(
        F.col("source").alias("sa"), F.col("n").alias("na"), "v",
        F.col("cc").alias("ca"),
    )
    b = scum.select(
        F.col("source").alias("sb"), F.col("n").alias("nb"),
        F.col("v").alias("vb"), F.col("cc").alias("cb"),
    )
    ksmax = (
        a.join(b, (F.col("v") == F.col("vb")) & (F.col("sa") < F.col("sb")))
        .agg(
            F.max(
                F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
                .cast("double")
                / (F.col("na").cast("double") * F.col("nb"))
            ).alias("d")
        )
    )
    # signal 5: hapax floor (q249 rule, global)
    vocab = d.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
                lambda x: x != F.lit(""),
            )
        ).alias("term")
    ).groupBy("term").agg(F.count("*").cast("long").alias("c"))
    hap = vocab.agg(
        (
            F.sum((F.col("c") == 1).cast("int")).cast("double") / F.count("*")
        ).alias("hapax")
    )
    row = (
        infl.crossJoin(F.broadcast(kish))
        .crossJoin(F.broadcast(rho))
        .crossJoin(F.broadcast(ksmax))
        .crossJoin(F.broadcast(hap))
    )
    ready = (
        (F.col("inflation") <= 1.5)
        & (F.col("deff") <= 2.0)
        & (F.col("a") < F.col("bound"))
        & (F.col("d") <= 0.3)
        & (F.col("hapax") >= 0.05)
    )
    return row.select(
        F.round("inflation", 4).alias("dup_inflation"),
        (F.col("inflation") <= 1.5).cast("int").alias("dup_ok"),
        F.round("deff", 4).alias("mixture_deff"),
        (F.col("deff") <= 2.0).cast("int").alias("mixture_ok"),
        F.round("a", 6).alias("shuffle_abs_rho"),
        (F.col("a") < F.col("bound")).cast("int").alias("shuffle_ok"),
        F.round("d", 6).alias("max_ks_drift"),
        (F.col("d") <= 0.3).cast("int").alias("drift_ok"),
        F.round("hapax", 6).alias("hapax_frac"),
        (F.col("hapax") >= 0.05).cast("int").alias("richness_ok"),
        ready.cast("int").alias("ready"),
    )

# ---------------------------------------------------------------------------
# q268 — Markov removal-effect attribution (Anderl et al.): each
# channel's value is how much total conversion DROPS when the channel
# is deleted from the journey graph (paths through it fail) — the
# counterfactual attribution that first/last/linear (q194) cannot
# express (a middle channel that never touches the conversion edge
# still carries mass). Start distribution = each user's first event;
# the q255 truncated absorption recursion runs once on the full chain
# and once per removed channel on the filtered matrix, all in the
# same 2^30 fixed-point floor arithmetic. Channels are enumerated
# statically (the fixture's event universe is stable across SFs, the
# 'purchase' convention used since q74).
# ---------------------------------------------------------------------------
_RE_CHANNELS = ["click", "error", "signup", "view"]  # transient states

def _removal_sql(T: int = _ABS_STEPS, s: int = _MKV_SCALE) -> str:
    ctes = [
        """pairs AS MATERIALIZED (
      SELECT user_id, ts, event_id, event_type AS dst,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS src
      FROM events
    )""",
        """trans AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pairs WHERE src IS NOT NULL GROUP BY 1, 2
    )""",
        "rowtot AS (SELECT src, CAST(SUM(cnt) AS BIGINT) AS tot FROM trans GROUP BY 1)",
        f"""tfx AS MATERIALIZED (
      SELECT t.src, t.dst, (t.cnt * {s}) // r.tot AS p_fx
      FROM trans t JOIN rowtot r USING (src)
    )""",
        """firsts AS (
      SELECT event_type FROM (
        SELECT event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn = 1
    )""",
        f"""pi0 AS MATERIALIZED (
      SELECT event_type,
             (CAST(COUNT(*) AS BIGINT) * {s})
               // (SELECT COUNT(*) FROM firsts) AS w_fx
      FROM firsts GROUP BY 1
    )""",
        "types AS MATERIALIZED (SELECT DISTINCT event_type FROM events)",
    ]
    variants = [("full", None)] + [(f"rm_{c}", c) for c in _RE_CHANNELS]
    for vname, rm in variants:
        drop = "" if rm is None else f" AND src <> '{rm}' AND dst <> '{rm}'"
        tyf = "" if rm is None else f" WHERE event_type <> '{rm}'"
        ctes.append(
            f"""a_{vname}_0 AS (
      SELECT event_type, CAST(0 AS BIGINT) AS p_abs FROM types{tyf}
    )"""
        )
        for t in range(1, T + 1):
            ctes.append(
                f"""a_{vname}_{t} AS (
      SELECT ty.event_type,
             COALESCE(d.direct, CAST(0 AS BIGINT))
               + COALESCE(c.carry, CAST(0 AS BIGINT)) AS p_abs
      FROM (SELECT event_type FROM types{tyf}) ty
      LEFT JOIN (
        SELECT src AS event_type, p_fx AS direct FROM tfx
        WHERE dst = 'purchase' AND src <> 'purchase'{drop}
      ) d ON d.event_type = ty.event_type
      LEFT JOIN (
        SELECT t.src AS event_type,
               CAST(SUM(t.p_fx * a.p_abs // {s}) AS BIGINT) AS carry
        FROM tfx t JOIN a_{vname}_{t - 1} a ON a.event_type = t.dst
        WHERE t.dst <> 'purchase' AND t.src <> 'purchase'{drop}
        GROUP BY t.src
      ) c ON c.event_type = ty.event_type
    )"""
            )
        start_drop = "" if rm is None else f" AND p.event_type <> '{rm}'"
        ctes.append(
            f"""conv_{vname} AS (
      SELECT (SELECT COALESCE(MAX(w_fx), 0) FROM pi0
              WHERE event_type = 'purchase')
             + COALESCE(CAST(SUM(p.w_fx * a.p_abs // {s}) AS BIGINT), 0)
               AS conv_fx
      FROM pi0 p JOIN a_{vname}_{T} a ON a.event_type = p.event_type
      WHERE p.event_type <> 'purchase'{start_drop}
    )"""
        )
    union = "\n    UNION ALL\n    ".join(
        f"SELECT '{c}' AS channel, (SELECT conv_fx FROM conv_rm_{c}) AS conv_removed_fx"
        for c in _RE_CHANNELS
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined},
    rem AS ({union})
    SELECT r.channel,
           COALESCE(p.w_fx, 0) AS start_share_fx,
           f.conv_fx AS conv_full_fx,
           r.conv_removed_fx,
           (f.conv_fx - r.conv_removed_fx) * 1000000 // f.conv_fx
             AS removal_effect_ppm,
           CAST(ROW_NUMBER() OVER (
             ORDER BY f.conv_fx - r.conv_removed_fx DESC, r.channel) AS INT)
             AS rank
    FROM rem r
    CROSS JOIN conv_full f
    LEFT JOIN pi0 p ON p.event_type = r.channel
    ORDER BY rank
    """


@register(
    "q268_markov_removal_attribution",
    _removal_sql(),
    doc="Markov removal-effect attribution: conversion mass = sum over "
    "start states (each user's first event) of the 8-step truncated "
    "absorption probability into 'purchase'; each channel's effect = "
    "1 - conv(without the channel)/conv(full), where removal deletes "
    "the state (transitions into it are lost paths, starts at it are "
    "lost users) — the counterfactual credit q194's positional rules "
    "cannot see. One window pass + one pair aggregate over events; "
    "five |types|^2 fixed-point recursions (full + one per removed "
    "channel), every iteration replayed as an oracle CTE in identical "
    "floor arithmetic. Ranked by absolute conversion drop",
)
def q268_markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    s = _MKV_SCALE
    T = _ABS_STEPS
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    ).filter(F.col("src").isNotNull())
    trans = pairs.groupBy("src", "dst").agg(F.count("*").cast("long").alias("cnt"))
    rowtot = trans.groupBy("src").agg(F.sum("cnt").cast("long").alias("tot"))
    firsts = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    # the transition-matrix and initial-distribution collects are
    # independent aggregates — overlapped so the driver pays one round
    # trip of wall-clock, not two serialized jobs (guide §2.6)
    tfx_rows, pi0_rows = overlap(
        lambda: (
            trans.join(rowtot, "src")
            .select("src", "dst", F.expr(f"(cnt * {s}) div tot").alias("p_fx"))
            .collect()
        ),
        lambda: firsts.groupBy("event_type")
        .agg(F.count("*").cast("long").alias("cnt"))
        .collect(),
    )
    types = sorted({r.src for r in tfx_rows} | {r.dst for r in tfx_rows}
                   | {r.event_type for r in pi0_rows})
    # the recursion runs on the |types|^2 matrix — driver state, exact
    # integers (Python // == SQL // on the nonnegative fixed points)
    nuser = sum(r.cnt for r in pi0_rows)
    pi0 = {r.event_type: (r.cnt * s) // nuser for r in pi0_rows}
    tfx = {(r.src, r.dst): r.p_fx for r in tfx_rows}

    def conv(rm: str | None) -> int:
        keep = [t for t in types if t != rm]
        p_abs = {t: 0 for t in keep}
        for _ in range(T):
            nxt = {}
            for i in keep:
                if i == "purchase":
                    nxt[i] = 0
                    continue
                direct = tfx.get((i, "purchase"), 0)
                carry = sum(
                    (tfx[(i, j)] * p_abs[j]) // s
                    for j in keep
                    if j != "purchase" and (i, j) in tfx
                )
                nxt[i] = direct + carry
            p_abs = nxt
        total = pi0.get("purchase", 0)
        total += sum(
            (pi0[i] * p_abs[i]) // s
            for i in keep
            if i != "purchase" and i in pi0
        )
        return total

    full = conv(None)
    rows = []
    for c in _RE_CHANNELS:
        removed = conv(c)
        rows.append((c, pi0.get(c, 0), full, removed))
    rows.sort(key=lambda r: (-(r[2] - r[3]), r[0]))
    # removal effect as pure-integer ppm floor division (the q279
    # discipline): Python floor(x*1e6+0.5) vs DuckDB ROUND are
    # different algorithms — the r10 driver-red class.
    # Guard the ppm division's cross-engine precondition (ADR-0008
    # "Division semantics"): Python // floors toward -inf while
    # DuckDB // and Spark div truncate toward zero, so the operators
    # only agree for non-negative numerators; and conv_fx = 0 would
    # error asymmetrically. Both are structurally impossible here —
    # removal drops non-negative terms from a monotone fold, so
    # 0 <= removed <= full — but fail loudly rather than diverge if
    # the invariant is ever broken.
    assert full > 0, "q268: zero conversion mass — ppm undefined"
    assert all(0 <= r_ <= f_ for _, _, f_, r_ in rows), (
        "q268: removal increased fixed-point conversion — "
        "ppm floor-vs-truncate divergence hazard"
    )
    out = [
        (
            c,
            share,
            f_,
            r_,
            (f_ - r_) * 1000000 // f_,
            rank + 1,
        )
        for rank, (c, share, f_, r_) in enumerate(rows)
    ]
    return spark.createDataFrame(
        out,
        "channel string, start_share_fx long, conv_full_fx long, "
        "conv_removed_fx long, removal_effect_ppm long, rank int",
    ).orderBy("rank")

# ---------------------------------------------------------------------------
# q273 — always-valid sequential A/B test (mSPRT, Johari et al. —
# the "peeking problem" fix): q157's fixed-horizon z-test is only
# valid if you look once; a live dashboard looks every day, so this
# computes the mixture likelihood ratio per day over the cumulative
# two-proportion stream and the always-valid p-value = running min of
# 1/Lambda — valid at EVERY stopping time. Users hash-assigned to
# arms; trials are user-days, success = a purchase that day.
# ---------------------------------------------------------------------------
_MSPRT_TAU2 = "0.01e0"  # mixture variance

def _msprt_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    arm = f"CASE WHEN {hash_bucket_sql('user_id', 2)} = 0 THEN 'A' ELSE 'B' END"
    t2 = _MSPRT_TAU2
    return f"""
    WITH ud AS (
      SELECT user_id, time_bucket(INTERVAL '1 day', ts) AS day,
             {arm} AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1, 2
    ),
    daily AS (
      SELECT day, arm, CAST(COUNT(*) AS BIGINT) AS t_cnt,
             CAST(SUM(conv) AS BIGINT) AS s_cnt
      FROM ud GROUP BY 1, 2
    ),
    cum AS (
      -- CAST back to BIGINT: DuckDB promotes windowed SUM(BIGINT) to
      -- HUGEINT (int128), which crosses Arrow as decimal128(38,0) and
      -- hash-mismatches Spark's int64 at the driver boundary (r11
      -- verdict). Values are user-day counts, far below 2^63.
      SELECT day, arm,
             CAST(SUM(t_cnt) OVER (PARTITION BY arm ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n,
             CAST(SUM(s_cnt) OVER (PARTITION BY arm ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS s
      FROM daily
    ),
    wide AS (
      SELECT a.day, a.n AS n_a, a.s AS s_a, b.n AS n_b, b.s AS s_b
      FROM cum a JOIN cum b ON a.day = b.day AND a.arm = 'A' AND b.arm = 'B'
    ),
    stat AS (
      SELECT day, n_a, s_a, n_b, s_b,
             CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b AS theta,
             (CAST(s_a + s_b AS DOUBLE) / (n_a + n_b))
               * (1e0 - CAST(s_a + s_b AS DOUBLE) / (n_a + n_b))
               * (1e0 / n_a + 1e0 / n_b) AS v
      FROM wide
    ),
    lam AS (
      SELECT day, n_a, s_a, n_b, s_b, theta, v,
             sqrt(v / (v + {t2}))
               * exp((theta * theta) * {t2} / (2e0 * v * (v + {t2}))) AS lambda
      FROM stat WHERE v > 0e0
    ),
    pv AS (
      SELECT day, n_a, s_a, n_b, s_b, theta, lambda,
             LEAST(1e0, MIN(1e0 / lambda) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS p_always
      FROM lam
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n_a, s_a, n_b, s_b,
           CAST(FLOOR(theta * 1000000e0) AS BIGINT) AS theta_fx,
           CAST(FLOOR(lambda * 1000000e0) AS BIGINT) AS lambda_fx,
           CAST(FLOOR(p_always * 1000000e0) AS BIGINT) AS p_always_fx,
           CAST(CAST(FLOOR(p_always * 1000000e0) AS BIGINT) < 50000 AS INT)
             AS reject_05
    FROM pv ORDER BY day
    """


@register(
    "q273_msprt_sequential_ab",
    _msprt_sql(),
    doc="mixture SPRT always-valid A/B readout: per day, the "
    "cumulative two-proportion stream (users md5-split into arms, "
    "trials = user-days, success = purchase), the mixture likelihood "
    "ratio Lambda = sqrt(V/(V+tau^2)) * exp(theta^2 tau^2 / "
    "(2V(V+tau^2))), and the always-valid p = min(1, running min of "
    "1/Lambda) with the 0.05 rejection flag — the dashboard that a "
    "team may peek at daily without inflating false positives, which "
    "q157's fixed-horizon z-test forbids. Zero-variance warmup days "
    "drop. Outputs are floor-based 1e-6 fixed-point BIGINTs (the _fx "
    "discipline): r10 proved ROUND-of-double diverges across DuckDB/"
    "libm builds (driver-red, local-green), while FLOOR(x*1e6) of the "
    "same IEEE double is a single bit-identical primitive on both "
    "engines; reject_05 derives from the fixed-point value so the "
    "flag can never disagree with the hashed column. One user-day "
    "aggregate + one |days|-sized window chain",
)
def q273_msprt_sequential_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    e = load_table(spark, sf_dir, "events")
    arm = F.when(hash_bucket(F.col("user_id"), 2) == 0, "A").otherwise("B")
    ud = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        )
    ).select("user_id", "day", arm.alias("arm"), "conv")
    daily = ud.groupBy("day", "arm").agg(
        F.count("*").cast("long").alias("t_cnt"),
        F.sum("conv").cast("long").alias("s_cnt"),
    )
    cw = W.partitionBy("arm").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        "arm",
        F.sum("t_cnt").over(cw).alias("n"),
        F.sum("s_cnt").over(cw).alias("s"),
    )
    a = cum.filter(F.col("arm") == "A").select(
        "day", F.col("n").alias("n_a"), F.col("s").alias("s_a")
    )
    b = cum.filter(F.col("arm") == "B").select(
        F.col("day").alias("day_b"),
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
    )
    wide = a.join(b, F.col("day") == F.col("day_b")).drop("day_b")
    theta = F.col("s_a").cast("double") / F.col("n_a") - F.col("s_b").cast(
        "double"
    ) / F.col("n_b")
    pooled = (F.col("s_a") + F.col("s_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    v = pooled * (1.0 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    t2 = 0.01
    stat = wide.select(
        "day", "n_a", "s_a", "n_b", "s_b", theta.alias("theta"), v.alias("v")
    ).filter(F.col("v") > 0.0)
    lam = stat.select(
        "day",
        "n_a",
        "s_a",
        "n_b",
        "s_b",
        "theta",
        (
            F.sqrt(F.col("v") / (F.col("v") + t2))
            * F.exp(
                (F.col("theta") * F.col("theta"))
                * t2
                / (2.0 * F.col("v") * (F.col("v") + t2))
            )
        ).alias("lambda"),
    )
    pw = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    pv = lam.withColumn(
        "p_always", F.least(F.lit(1.0), F.min(1.0 / F.col("lambda")).over(pw))
    )
    p_fx = F.floor(F.col("p_always") * 1000000.0).cast("long")
    return pv.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_a",
        "s_a",
        "n_b",
        "s_b",
        F.floor(F.col("theta") * 1000000.0).cast("long").alias("theta_fx"),
        F.floor(F.col("lambda") * 1000000.0).cast("long").alias("lambda_fx"),
        p_fx.alias("p_always_fx"),
        (p_fx < 50000).cast("int").alias("reject_05"),
    ).orderBy("day")

# ---------------------------------------------------------------------------
# q283 — scalar calibration metrics (ECE / MCE / Brier) for the q111
# trained filter: q117 prints the reliability TABLE; this is the
# number a model card quotes. With fixed-point probabilities the ECE
# collapses to an exact integer: sum over bins of |n_pos*S - sum p_fx|
# all over N*S — no per-bin float means at all; Brier's numerator is
# the exact BIGINT sum of (p_fx - y*S)^2.
# ---------------------------------------------------------------------------
def _ece_sql() -> str:
    from frontmatter_mcp_spark.operators.classifier import SCALE

    return f"""
    WITH scored AS ({_classifier_sql()}),
    fx AS (
      SELECT CAST(LEAST(9, FLOOR(prob * 10)) AS INT) AS bucket,
             CAST(prob * {SCALE} AS BIGINT) AS pfx,
             CAST(label AS BIGINT) AS y
      FROM scored
    ),
    bins AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(ABS(SUM(y) * {SCALE} - SUM(pfx)) AS BIGINT) AS diff_fx
      FROM fx GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((pfx - y * {SCALE}) * (pfx - y * {SCALE})) AS BIGINT)
               AS brier_fx
      FROM fx
    )
    SELECT t.n, CAST(COUNT(*) AS INT) AS n_bins,
           ROUND(CAST(SUM(b.diff_fx) AS DOUBLE) / (t.n * {SCALE}), 6) AS ece,
           ROUND(MAX(CAST(b.diff_fx AS DOUBLE) / b.nb) / {SCALE}, 6) AS mce,
           ROUND(CAST(t.brier_fx AS DOUBLE)
                 / (t.n * CAST({SCALE} AS DOUBLE) * {SCALE}), 6) AS brier
    FROM bins b CROSS JOIN tot t
    GROUP BY t.n, t.brier_fx
    """


@register(
    "q283_calibration_scalars",
    _ece_sql(),
    doc="expected / maximum calibration error and Brier score for the "
    "q111 classifier over the q117 bins: ECE = sum_b |n_pos_b*S - "
    "sum p_fx_b| / (N*S) — an exact integer numerator because the "
    "probabilities are already fixed-point; MCE takes the worst bin "
    "(max of per-bin rationals as IEEE doubles); Brier = exact "
    "sum (p_fx - y*S)^2 over N*S^2. One scoring pass + a 10-row "
    "bin aggregate; the scalars a model card quotes beside q117's "
    "table and q149's confusion matrix",
)
def q283_calibration_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.classifier import SCALE, hashed_linear_scores

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    scored = hashed_linear_scores(
        d,
        "doc_id",
        "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=_CLF_BUCKETS,
        iters=_CLF_ITERS,
        persist_fn=hold,
    )
    fx = scored.select(
        F.least(F.lit(9), F.floor(F.col("prob") * 10)).cast("int").alias("bucket"),
        (F.col("prob") * SCALE).cast("long").alias("pfx"),
        F.col("label").cast("long").alias("y"),
    )
    bins = fx.groupBy("bucket").agg(
        F.count("*").cast("long").alias("nb"),
        F.abs(F.sum("y") * SCALE - F.sum("pfx")).cast("long").alias("diff_fx"),
    )
    tot = fx.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("pfx") - F.col("y") * SCALE) * (F.col("pfx") - F.col("y") * SCALE))
        .cast("long")
        .alias("brier_fx"),
    )
    return (
        bins.crossJoin(F.broadcast(tot))
        .groupBy("n", "brier_fx")
        .agg(
            F.count("*").cast("int").alias("n_bins"),
            F.round(
                F.sum("diff_fx").cast("double") / (F.col("n") * F.lit(SCALE)), 6
            ).alias("ece"),
            F.round(
                F.max(F.col("diff_fx").cast("double") / F.col("nb")) / SCALE, 6
            ).alias("mce"),
            F.round(
                F.col("brier_fx").cast("double")
                / (F.col("n") * float(SCALE) * SCALE),
                6,
            ).alias("brier"),
        )
        .select("n", "n_bins", "ece", "mce", "brier")
    )

# ---------------------------------------------------------------------------
# q284 — difference-in-differences: the causal-inference workhorse —
# treatment series vs control series, before vs after an intervention
# day, the DiD estimate = (T_post - T_pre) - (C_post - C_pre) in
# DAILY MEANS, with the parallel-trends diagnostic (pre-period slope
# gap) that decides whether the design is believable. Means are
# exact-integer cross-multiplications until one final double cast.
# The intervention day is the series midpoint (deterministic).
# ---------------------------------------------------------------------------
@register(
    "q284_diff_in_diff",
    """
    WITH daily AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY 1, 2
    ),
    axis AS (
      SELECT day, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
             (SELECT COUNT(DISTINCT day) FROM daily) AS nd
      FROM (SELECT DISTINCT day FROM daily)
    ),
    cells AS (
      SELECT CASE WHEN d.event_type = 'click' THEN 1 ELSE 0 END AS treated,
             CASE WHEN a.i * 2 > a.nd THEN 1 ELSE 0 END AS post,
             CAST(SUM(d.n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily d JOIN axis a USING (day)
      GROUP BY 1, 2
    ),
    w AS (
      SELECT
        MAX(CASE WHEN treated = 1 AND post = 1 THEN total END) AS t1,
        MAX(CASE WHEN treated = 1 AND post = 1 THEN n_days END) AS t1n,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN total END) AS t0,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN n_days END) AS t0n,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN total END) AS c1,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN n_days END) AS c1n,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN total END) AS c0,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN n_days END) AS c0n
      FROM cells
    ),
    pre AS (
      SELECT CASE WHEN d.event_type = 'click' THEN 1 ELSE 0 END AS treated,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a.i) AS BIGINT) AS sx, CAST(SUM(d.n) AS BIGINT) AS sy,
             CAST(SUM(a.i * d.n) AS BIGINT) AS sxy,
             CAST(SUM(a.i * a.i) AS BIGINT) AS sxx
      FROM daily d JOIN axis a USING (day)
      WHERE a.i * 2 <= a.nd
      GROUP BY 1
    ),
    slopes AS (
      SELECT
        MAX(CASE WHEN treated = 1 THEN
          CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) END)
          AS slope_t,
        MAX(CASE WHEN treated = 0 THEN
          CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) END)
          AS slope_c
      FROM pre
    )
    SELECT
      ROUND(CAST(w.t0 AS DOUBLE) / w.t0n, 6) AS treated_pre_mean,
      ROUND(CAST(w.t1 AS DOUBLE) / w.t1n, 6) AS treated_post_mean,
      ROUND(CAST(w.c0 AS DOUBLE) / w.c0n, 6) AS control_pre_mean,
      ROUND(CAST(w.c1 AS DOUBLE) / w.c1n, 6) AS control_post_mean,
      ROUND((CAST(w.t1 AS DOUBLE) / w.t1n - CAST(w.t0 AS DOUBLE) / w.t0n)
            - (CAST(w.c1 AS DOUBLE) / w.c1n - CAST(w.c0 AS DOUBLE) / w.c0n), 6)
        + 0e0 AS did_estimate,
      ROUND(s.slope_t - s.slope_c, 6) + 0e0 AS pretrend_slope_gap
    FROM w CROSS JOIN slopes s
    """,
    doc="difference-in-differences on daily volumes: 'click' treated vs "
    "'view' control, intervention at the day-axis midpoint; DiD = "
    "(post-pre) mean change in treatment minus the same in control, "
    "plus the pre-period OLS slope GAP between arms — the parallel-"
    "trends check that makes or breaks the design (exact-integer "
    "moment sums, one double division each, q196 discipline). One day "
    "aggregate + 4-cell algebra",
)
def q284_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type").isin("click", "view"))
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    days = daily.select("day").distinct()
    nd = days.count()
    axis = days.select(
        "day", F.row_number().over(W.orderBy("day")).cast("long").alias("i")
    )
    j = daily.join(F.broadcast(axis), "day").select(
        (F.col("event_type") == "click").cast("int").alias("treated"),
        (F.col("i") * 2 > nd).cast("int").alias("post"),
        "i",
        "n",
    )
    cells = j.groupBy("treated", "post").agg(
        F.sum("n").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_days"),
    )
    w = cells.agg(
        *[
            F.max(
                F.when(
                    (F.col("treated") == t) & (F.col("post") == p), F.col(c)
                )
            ).alias(f"{name}{suffix}")
            for t, p, name in [(1, 1, "t1"), (1, 0, "t0"), (0, 1, "c1"), (0, 0, "c0")]
            for c, suffix in [("total", ""), ("n_days", "n")]
        ]
    )
    pre = (
        j.filter(F.col("i") * 2 <= nd)
        .groupBy("treated")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("i").cast("long").alias("sx"),
            F.sum("n").cast("long").alias("sy"),
            F.sum(F.col("i") * F.col("n")).cast("long").alias("sxy"),
            F.sum(F.col("i") * F.col("i")).cast("long").alias("sxx"),
        )
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    slopes = pre.agg(
        F.max(F.when(F.col("treated") == 1, slope)).alias("slope_t"),
        F.max(F.when(F.col("treated") == 0, slope)).alias("slope_c"),
    )
    tpre = F.col("t0").cast("double") / F.col("t0n")
    tpost = F.col("t1").cast("double") / F.col("t1n")
    cpre = F.col("c0").cast("double") / F.col("c0n")
    cpost = F.col("c1").cast("double") / F.col("c1n")
    return (
        w.crossJoin(F.broadcast(slopes))
        .select(
            F.round(tpre, 6).alias("treated_pre_mean"),
            F.round(tpost, 6).alias("treated_post_mean"),
            F.round(cpre, 6).alias("control_pre_mean"),
            F.round(cpost, 6).alias("control_post_mean"),
            # + 0.0 normalizes IEEE signed zero: DuckDB ROUND keeps
            # -0.0 for a tiny negative difference, Spark's BigDecimal
            # round has no signed zero — the canonical hash separates
            # them (caught by the r11 full sf0.1 sweep)
            (F.round((tpost - tpre) - (cpost - cpre), 6) + F.lit(0.0)).alias(
                "did_estimate"
            ),
            (
                F.round(F.col("slope_t") - F.col("slope_c"), 6) + F.lit(0.0)
            ).alias("pretrend_slope_gap"),
        )
    )

# ---------------------------------------------------------------------------
# q297 — classifier operating-point sweep: precision/recall/F1 and
# Youden's J at every decile score threshold of the q111 trained
# filter, with the F1-argmax flagged — the missing step between
# q117's calibration table and a production cutoff. Counts per
# threshold come from ONE cumulative pass over the score-bucket
# histogram (suffix sums), never a per-threshold rescan.
# ---------------------------------------------------------------------------
def _opsweep_sql() -> str:
    return f"""
    WITH scored AS ({_classifier_sql()}),
    b AS (
      SELECT CAST(LEAST(9, FLOOR(prob * 10)) AS INT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(label) AS BIGINT) AS pos
      FROM scored GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_all, CAST(SUM(pos) AS BIGINT) AS p_all
      FROM b
    ),
    thresh AS (
      SELECT t.thr,
             CAST(COALESCE(SUM(b.n), 0) AS BIGINT) AS pred_pos,
             CAST(COALESCE(SUM(b.pos), 0) AS BIGINT) AS tp
      FROM (SELECT UNNEST(generate_series(0, 9)) AS thr) t
      LEFT JOIN b ON b.bucket >= t.thr
      GROUP BY t.thr
    )
    SELECT CAST(t.thr AS INT) AS threshold_decile,
           t.pred_pos, t.tp,
           ROUND(CASE WHEN t.pred_pos > 0
                      THEN CAST(t.tp AS DOUBLE) / t.pred_pos ELSE 0e0 END, 6)
             AS precision,
           ROUND(CAST(t.tp AS DOUBLE) / x.p_all, 6) AS recall,
           ROUND(CASE WHEN t.tp > 0 THEN
             2e0 * (CAST(t.tp AS DOUBLE) / t.pred_pos)
                 * (CAST(t.tp AS DOUBLE) / x.p_all)
             / (CAST(t.tp AS DOUBLE) / t.pred_pos
                + CAST(t.tp AS DOUBLE) / x.p_all) ELSE 0e0 END, 6) AS f1,
           ROUND(CAST(t.tp AS DOUBLE) / x.p_all
                 - CAST(t.pred_pos - t.tp AS DOUBLE) / (x.n_all - x.p_all), 6)
             AS youden_j
    FROM thresh t CROSS JOIN tot x
    ORDER BY threshold_decile
    """


@register(
    "q297_operating_point_sweep",
    _opsweep_sql(),
    doc="threshold sweep for the q111 quality filter: at each decile "
    "cutoff, predicted-positive and true-positive counts by SUFFIX "
    "SUMS over the 10-bucket score histogram (one corpus pass total), "
    "then precision/recall/F1/Youden's J as final double chains — the "
    "operating-point table that turns q117's calibration into an "
    "actual production cutoff. Zero-prediction edge rows pin their "
    "ratios to 0 on both engines",
)
def q297_operating_point_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.classifier import hashed_linear_scores

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    scored = hashed_linear_scores(
        d,
        "doc_id",
        "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=_CLF_BUCKETS,
        iters=_CLF_ITERS,
        persist_fn=hold,
    )
    b = scored.groupBy(
        F.least(F.lit(9), F.floor(F.col("prob") * 10)).cast("int").alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("label").cast("long").alias("pos"),
    )
    tot = b.agg(
        F.sum("n").cast("long").alias("n_all"),
        F.sum("pos").cast("long").alias("p_all"),
    )
    thr = spark.range(0, 10).select(F.col("id").cast("int").alias("thr"))
    thresh = (
        thr.join(F.broadcast(b), F.col("bucket") >= F.col("thr"), "left")
        .groupBy("thr")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("pred_pos"),
            F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("tp"),
        )
    )
    prec = F.when(
        F.col("pred_pos") > 0,
        F.col("tp").cast("double") / F.col("pred_pos"),
    ).otherwise(F.lit(0.0))
    rec = F.col("tp").cast("double") / F.col("p_all")
    return (
        thresh.crossJoin(F.broadcast(tot))
        .select(
            F.col("thr").cast("int").alias("threshold_decile"),
            "pred_pos",
            "tp",
            F.round(prec, 6).alias("precision"),
            F.round(rec, 6).alias("recall"),
            F.round(
                F.when(
                    F.col("tp") > 0, 2.0 * prec * rec / (prec + rec)
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("f1"),
            F.round(
                rec
                - (F.col("pred_pos") - F.col("tp")).cast("double")
                / (F.col("n_all") - F.col("p_all")),
                6,
            ).alias("youden_j"),
        )
        .orderBy("threshold_decile")
    )

# ---------------------------------------------------------------------------
# q298 — exact AUC by rank statistics (Mann-Whitney U): the
# threshold-free companion to q297's operating points — computed on
# the fixed-point scores with AVERAGE ranks for ties, so U and
# AUC*2*n1*n0 are exact integers (ties come in integer multiples of
# 1/2, absorbed by doubling) and the only double is the final ratio.
# ---------------------------------------------------------------------------
def _auc_sql() -> str:
    return f"""
    WITH scored AS ({_classifier_sql()}),
    r AS (
      SELECT label, score_fx,
             RANK() OVER (ORDER BY score_fx) AS rk,
             COUNT(*) OVER (PARTITION BY score_fx) AS nt
      FROM scored
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN label = 1
                           THEN 2 * rk + nt - 1 ELSE 0 END) AS BIGINT)
               AS rank2_pos,
             CAST(SUM(label) AS BIGINT) AS n1,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM r
    )
    SELECT n1, n - n1 AS n0,
           CAST(rank2_pos - n1 * (n1 + 1) AS BIGINT) AS u2,
           ROUND(CAST(rank2_pos - n1 * (n1 + 1) AS DOUBLE)
                 / (2e0 * n1 * (n - n1)), 6) AS auc
    FROM s
    """


@register(
    "q298_exact_auc",
    _auc_sql(),
    doc="exact ROC AUC for the q111 filter via the Mann-Whitney rank "
    "sum: average ranks under ties expressed as the integer "
    "2*rank + ties - 1 (doubled midrank), so the U statistic is an "
    "exact BIGINT — U2 = 2*sum(midranks of positives) - 2*n1(n1+1)/2 "
    "— and AUC = U2 / (2 n1 n0) is one double division. The "
    "threshold-free number beside q297's per-cutoff table; one global "
    "sort-rank window over the scored corpus (at 100 TB: the q83 "
    "two-phase rank)",
)
def q298_exact_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.classifier import hashed_linear_scores
    from frontmatter_mcp_spark.operators.total_order import with_global_rank_ties

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    scored = hashed_linear_scores(
        d,
        "doc_id",
        "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=_CLF_BUCKETS,
        iters=_CLF_ITERS,
        persist_fn=pin,
    )
    # RANK over the whole scored corpus was a single-partition window;
    # the two-phase rank recovers RANK and the tie count from a
    # (bucket, score)-keyed window on the same bucketed sort. The
    # 2-column projection is checkpointed once so the rank's bound and
    # offset passes reread it instead of re-running the classifier's
    # scoring join per consumer (measured 2x+ without it).
    from frontmatter_mcp_spark.operators.holds import hold

    r = with_global_rank_ties(
        hold(scored.select("label", "score_fx")),
        "score_fx",
        rank_out="rk",
        ties_out="nt",
    )
    s = r.agg(
        F.sum(
            F.when(F.col("label") == 1, 2 * F.col("rk") + F.col("nt") - 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("rank2_pos"),
        F.sum("label").cast("long").alias("n1"),
        F.count("*").cast("long").alias("n"),
    )
    u2 = F.col("rank2_pos") - F.col("n1") * (F.col("n1") + 1)
    return s.select(
        "n1",
        (F.col("n") - F.col("n1")).alias("n0"),
        u2.cast("long").alias("u2"),
        F.round(
            u2.cast("double") / (2.0 * F.col("n1") * (F.col("n") - F.col("n1"))),
            6,
        ).alias("auc"),
    )

# ---------------------------------------------------------------------------
# q324 — isotonic regression (PAVA) as a calibration map: the
# monotone-fit machinery every probability calibrator (Zadrozny/Elkan
# isotonic calibration) runs on reliability bins — computed NOT by the
# sequential pool-adjacent-violators loop (whose while-merge is
# inexpressible in one SQL lambda) but by the CLOSED FORM
# fitted[i] = max_{j<=i} min_{k>=i} avg(y[j..k]), which is fully
# declarative: one O(bins^3) grid over prefix sums. floor() commutes
# with min and max, so the 2^30 fixed-point fit is EXACTLY
# floor(2^30 * true_fit) — integer-identical on both engines.
# ---------------------------------------------------------------------------
_ISO_BINS = 12


@register(
    "q324_isotonic_calibration",
    f"""
    WITH mx AS (
      SELECT CAST(MAX(n_chars) AS BIGINT) AS mc FROM documents
    ),
    b AS (
      SELECT CAST((d.n_chars * {_ISO_BINS}) // (m.mc + 1) AS INT) AS bin,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents d CROSS JOIN mx m
    ),
    bins AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS w,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM b GROUP BY 1
    ),
    pre AS (
      SELECT bin, w, pos,
             CAST(ROW_NUMBER() OVER (ORDER BY bin) AS BIGINT) AS i,
             CAST(SUM(w) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cw,
             CAST(SUM(pos) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) AS BIGINT) AS cp
      FROM bins
    ),
    grid AS (
      SELECT i.i, j.i AS j, k.i AS k,
             ((k.cp - COALESCE(jm.cp, 0)) * {_BM25_SCALE})
               // (k.cw - COALESCE(jm.cw, 0)) AS avg_fx
      FROM pre i
      JOIN pre j ON j.i <= i.i
      JOIN pre k ON k.i >= i.i
      LEFT JOIN pre jm ON jm.i = j.i - 1
    ),
    inner_min AS (
      SELECT i, j, MIN(avg_fx) AS min_fx FROM grid GROUP BY 1, 2
    ),
    fit AS (
      SELECT i, MAX(min_fx) AS iso_fx FROM inner_min GROUP BY 1
    )
    SELECT p.bin, p.w AS n_docs, p.pos AS n_positive,
           ROUND(CAST(p.pos AS DOUBLE) / p.w, 6) AS raw_rate,
           f.iso_fx,
           ROUND(CAST(f.iso_fx AS DOUBLE) / {_BM25_SCALE}, 6) AS iso_rate,
           CAST(f.iso_fx >= COALESCE(LAG(f.iso_fx) OVER (ORDER BY p.bin),
                                     f.iso_fx) AS INT) AS monotone_ok
    FROM pre p JOIN fit f ON f.i = p.i
    ORDER BY p.bin
    """,
    doc="isotonic regression (the PAVA calibration map) over "
    "length-band reliability bins: P(lang='en' | n_chars band) fitted "
    "monotone via the closed form fitted[i] = max_(j<=i) min_(k>=i) "
    "avg(y[j..k]) — the declarative O(bins^3) grid over prefix sums "
    "that replaces the sequential pool-adjacent-violators while-loop "
    "SQL lambdas cannot express. floor commutes with min and max, so "
    "the 2^30 fixed-point fit is exactly floor(2^30 * true_fit): "
    "integer-identical both engines, with monotone_ok = 1 riding "
    "along as the hash-checked invariant. The machinery a q117-style "
    "reliability table feeds when raw bin rates must become a "
    "monotone calibration function. Corpus pays one narrow aggregate; "
    "the grid is bins^3 rows",
)
def q324_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    mx = d.agg(F.max("n_chars").cast("long").alias("mc"))
    b = d.crossJoin(F.broadcast(mx)).select(
        F.expr(f"cast((n_chars * {_ISO_BINS}) div (mc + 1) as int)").alias(
            "bin"
        ),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    bins = b.groupBy("bin").agg(
        F.count("*").cast("long").alias("w"),
        F.sum("y").cast("long").alias("pos"),
    )
    wo = W.orderBy("bin")
    pre = pin(
        bins.select(
            "bin",
            "w",
            "pos",
            F.row_number().over(wo).cast("long").alias("i"),
            F.sum("w")
            .over(wo.rowsBetween(W.unboundedPreceding, 0))
            .cast("long")
            .alias("cw"),
            F.sum("pos")
            .over(wo.rowsBetween(W.unboundedPreceding, 0))
            .cast("long")
            .alias("cp"),
        )
    )
    pi = pre.select(F.col("i").alias("ii"))
    pj = pre.select(F.col("i").alias("j"))
    pk = pre.select(
        F.col("i").alias("k"), F.col("cw").alias("kcw"), F.col("cp").alias("kcp")
    )
    pjm = pre.select(
        F.col("i").alias("jm"), F.col("cw").alias("jcw"), F.col("cp").alias("jcp")
    )
    grid = (
        pi.join(F.broadcast(pj), F.col("j") <= F.col("ii"))
        .join(F.broadcast(pk), F.col("k") >= F.col("ii"))
        .join(F.broadcast(pjm), F.col("jm") == F.col("j") - 1, "left")
        .select(
            "ii",
            "j",
            F.expr(
                f"((kcp - coalesce(jcp, 0)) * {_BM25_SCALE})"
                " div (kcw - coalesce(jcw, 0))"
            ).alias("avg_fx"),
        )
    )
    fit = (
        grid.groupBy("ii", "j")
        .agg(F.min("avg_fx").alias("min_fx"))
        .groupBy("ii")
        .agg(F.max("min_fx").alias("iso_fx"))
    )
    return (
        pre.join(F.broadcast(fit), pre["i"] == fit["ii"])
        .select(
            "bin",
            F.col("w").alias("n_docs"),
            F.col("pos").alias("n_positive"),
            F.round(F.col("pos").cast("double") / F.col("w"), 6).alias(
                "raw_rate"
            ),
            "iso_fx",
            F.round(F.col("iso_fx").cast("double") / _BM25_SCALE, 6).alias(
                "iso_rate"
            ),
            (
                F.col("iso_fx")
                >= F.coalesce(
                    F.lag("iso_fx").over(W.orderBy("bin")), F.col("iso_fx")
                )
            )
            .cast("int")
            .alias("monotone_ok"),
        )
        .orderBy("bin")
    )

# ---------------------------------------------------------------------------
# q358 — next-event prediction eval under a TEMPORAL split: train the
# q193-style transition argmax on the first 21 days, score it on the
# remainder against the majority-class baseline — the time-respecting
# train/test protocol every sequence model needs (a random split
# leaks the future; q228 audits exactly that for epochs). Predictions
# are argmax under the (count desc, type) total order; accuracies are
# exact integer ratios.
# ---------------------------------------------------------------------------
@register(
    "q358_next_event_eval",
    """
    WITH b AS (
      SELECT MIN(ts) + INTERVAL '21 days' AS cut FROM events
    ),
    tr AS (
      SELECT user_id, ts, event_id, event_type
      FROM events CROSS JOIN b WHERE ts < b.cut
    ),
    te AS (
      SELECT user_id, ts, event_id, event_type
      FROM events CROSS JOIN b WHERE ts >= b.cut
    ),
    trp AS (
      SELECT prev, event_type AS nxt FROM (
        SELECT event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM tr
      ) WHERE prev IS NOT NULL
    ),
    model AS (
      SELECT prev, nxt AS pred FROM (
        SELECT prev, nxt, COUNT(*) AS c,
               ROW_NUMBER() OVER (PARTITION BY prev
                                  ORDER BY COUNT(*) DESC, nxt) AS rn
        FROM trp GROUP BY prev, nxt
      ) WHERE rn = 1
    ),
    base AS (
      SELECT event_type AS pred FROM (
        SELECT event_type, COUNT(*) AS c,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type) AS rn
        FROM tr GROUP BY 1
      ) WHERE rn = 1
    ),
    tep AS (
      SELECT prev, event_type AS nxt FROM (
        SELECT event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM te
      ) WHERE prev IS NOT NULL
    ),
    scored AS (
      SELECT t.prev, t.nxt, m.pred, bs.pred AS base_pred
      FROM tep t
      LEFT JOIN model m ON m.prev = t.prev
      CROSS JOIN base bs
    )
    SELECT prev,
           CAST(COUNT(*) AS BIGINT) AS n_test_pairs,
           CAST(SUM(CASE WHEN nxt = pred THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           ROUND(CAST(SUM(CASE WHEN nxt = pred THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS accuracy,
           ROUND(CAST(SUM(CASE WHEN nxt = base_pred THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS baseline_accuracy
    FROM scored
    GROUP BY prev
    ORDER BY prev
    """,
    doc="next-event prediction evaluated under a TEMPORAL split: the "
    "first-21-days transition matrix's per-state argmax (the (count "
    "desc, type) total order — q193's model as a predictor) scored on "
    "held-out later pairs against the majority-class baseline, per "
    "previous-event state. Time-respecting evaluation (a random split "
    "would leak the future — the leakage q228 audits); accuracies are "
    "exact integer ratios. Beats-baseline rows are the states where "
    "sequence structure is real. Two LAG windows + two bounded "
    "model joins",
)
def q358_next_event_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    b = e.agg(
        (F.min("ts") + F.expr("interval 21 days")).alias("cut")
    )
    ec = hold(e.crossJoin(F.broadcast(b)))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")

    def pairs(df):
        return (
            df.select(
                "event_type", F.lag("event_type").over(w).alias("prev")
            )
            .filter(F.col("prev").isNotNull())
            .select("prev", F.col("event_type").alias("nxt"))
        )

    trp = pairs(ec.filter(F.col("ts") < F.col("cut")))
    tep = pairs(ec.filter(F.col("ts") >= F.col("cut")))
    model = (
        trp.groupBy("prev", "nxt")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("prev").orderBy(F.col("c").desc(), "nxt")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("prev", F.col("nxt").alias("pred"))
    )
    base = (
        ec.filter(F.col("ts") < F.col("cut"))
        .groupBy("event_type")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.col("c").desc(), "event_type")),
        )
        .filter(F.col("rn") == 1)
        .select(F.col("event_type").alias("base_pred"))
    )
    scored = tep.join(F.broadcast(model), "prev", "left").crossJoin(
        F.broadcast(base)
    )
    return (
        scored.groupBy("prev")
        .agg(
            F.count("*").cast("long").alias("n_test_pairs"),
            F.sum((F.col("nxt") == F.col("pred")).cast("int"))
            .cast("long")
            .alias("n_correct"),
            F.round(
                F.sum((F.col("nxt") == F.col("pred")).cast("int")).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("accuracy"),
            F.round(
                F.sum((F.col("nxt") == F.col("base_pred")).cast("int")).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("baseline_accuracy"),
        )
        .orderBy("prev")
    )
