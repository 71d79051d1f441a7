"""Property test for q74's single-pass windowed funnel semantics.

The r9 re-plan computes the ordered signup -> first-click-after ->
first-purchase-after funnel with running window mins instead of the
reference three-stage join chain (events scanned once, not three
times). The equivalence argument is subtle — a stage-k event at time t
qualifies iff t is strictly greater than the per-user GLOBAL stage-(k-1)
minimum, and the running min over rows with ts <= t equals that global
minimum exactly when the global minimum is <= t — so this test pins it
against an independent brute-force per-user reference over randomized
event sets, including the adversarial cases: ties at the same timestamp,
stage events BEFORE the signup, users missing stages entirely, and
duplicate timestamps within a stage.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F
from pyspark.sql import Window

BASE = datetime.datetime(2024, 1, 1)
TYPES = ["signup", "click", "purchase", "other"]


def _brute_funnel(events):
    """Reference: the oracle's three-stage global-min chain, per user."""
    users = {}
    for uid, etype, ts in events:
        users.setdefault(uid, []).append((etype, ts))
    n_s = n_c = n_p = 0
    for evs in users.values():
        signups = [t for e, t in evs if e == "signup"]
        if not signups:
            continue
        n_s += 1
        s0 = min(signups)
        clicks = [t for e, t in evs if e == "click" and t > s0]
        if not clicks:
            continue
        n_c += 1
        c0 = min(clicks)
        purchases = [t for e, t in evs if e == "purchase" and t > c0]
        if purchases:
            n_p += 1
    return n_s, n_c, n_p


def _spark_funnel(spark, events):
    """The q74 plan shape on an in-memory frame (same window logic)."""
    rows = [
        (uid, etype, BASE + datetime.timedelta(seconds=ts))
        for uid, etype, ts in events
    ]
    e = spark.createDataFrame(
        rows, "user_id int, event_type string, ts timestamp"
    ).filter(F.col("event_type").isin("signup", "click", "purchase"))
    w = Window.partitionBy("user_id").orderBy("ts")
    signup_min = F.min(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(w)
    staged = e.withColumn(
        "click_q_ts",
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > signup_min),
            F.col("ts"),
        ),
    )
    click_min = F.min("click_q_ts").over(w)
    staged = staged.withColumn(
        "purchase_q",
        (F.col("event_type") == "purchase") & (F.col("ts") > click_min),
    )
    per_user = staged.groupBy("user_id").agg(
        F.max(F.col("event_type") == "signup").alias("has_signup"),
        F.max(F.col("click_q_ts").isNotNull()).alias("has_click"),
        F.max("purchase_q").alias("has_purchase"),
    )
    row = per_user.agg(
        F.count_if("has_signup").alias("n_signup"),
        F.count_if("has_click").alias("n_click_after"),
        F.count_if("has_purchase").alias("n_purchase_after"),
    ).collect()[0]
    return row.n_signup, row.n_click_after, row.n_purchase_after


event_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # few users -> dense collisions
        st.sampled_from(TYPES),
        st.integers(min_value=0, max_value=20),  # coarse ts -> frequent ties
    ),
    min_size=1,
    max_size=30,
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=25, deadline=None)
@given(events=event_lists)
def test_windowed_funnel_matches_bruteforce(spark, events):
    assert _spark_funnel(spark, events) == _brute_funnel(events)


def test_windowed_funnel_tie_edges(spark):
    """Hand-picked adversarial cases the random search might miss."""
    cases = [
        # click exactly AT the signup instant does not qualify
        [(1, "signup", 5), (1, "click", 5), (1, "purchase", 6)],
        # click BEFORE signup doesn't count, later click does
        [(1, "click", 1), (1, "signup", 2), (1, "click", 3), (1, "purchase", 4)],
        # purchase exactly AT the first qualifying click does not qualify
        [(1, "signup", 1), (1, "click", 2), (1, "purchase", 2)],
        # purchase after a NON-qualifying click only
        [(1, "signup", 3), (1, "click", 1), (1, "purchase", 5)],
        # second signup later must not reset the funnel
        [(1, "signup", 1), (1, "click", 2), (1, "signup", 9), (1, "purchase", 3)],
    ]
    for events in cases:
        assert _spark_funnel(spark, events) == _brute_funnel(events), events
