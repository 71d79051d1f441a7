"""Focused tests for the r12 optimization-round rewrites.

Each optimization must keep results bit-identical; these tests pin the
equivalences independently of the (slower) full oracle sweep:

1. array_lit / array_lit_int build the SAME literal values as the
   per-element F.lit path (bit-compared as IEEE doubles).
2. The q137/q164 collect_set fusion yields exactly the two-pass
   (distinct -> count -> join-back) dup-doc set and dup-span count.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from frontmatter_mcp_spark.functions.vector import array_lit, array_lit_int


def _bits(x: float) -> bytes:
    return struct.pack(">d", float(x))


TRICKY = [
    0.0, -0.0, 1.0, -1.5, 1e-07, 1e16, 2**-49, 5e-324,
    1.7976931348623157e308, 3.141592653589793, -2.2250738585072014e-308,
    0.1 + 0.2, 1 / 3, -1e-300,
]


def test_array_lit_bits_equal_f_lit(spark):
    df = spark.range(1)
    a = df.select(F.array(*[F.lit(float(x)) for x in TRICKY]).alias("v")).first().v
    b = df.select(array_lit(TRICKY).alias("v")).first().v
    assert len(a) == len(b)
    assert all(_bits(p) == _bits(q) for p, q in zip(a, b))


def test_array_lit_nested_and_specials(spark):
    rows = [TRICKY[:7], TRICKY[7:14]]
    df = spark.range(1)
    a = (
        df.select(
            F.array(*[F.array(*[F.lit(float(x)) for x in r]) for r in rows]).alias("v")
        )
        .first()
        .v
    )
    b = df.select(array_lit(rows).alias("v")).first().v
    assert all(
        _bits(p) == _bits(q) for ra, rb in zip(a, b) for p, q in zip(ra, rb)
    )
    s = df.select(
        array_lit([float("nan"), float("inf"), float("-inf")]).alias("v")
    ).first().v
    assert s[0] != s[0] and s[1] == float("inf") and s[2] == float("-inf")


def test_array_lit_int_types_and_values(spark):
    df = spark.range(1)
    ints = df.select(array_lit_int([0, -5, 63]).alias("v"))
    assert ints.schema["v"].dataType.simpleString() == "array<int>"
    assert ints.first().v == [0, -5, 63]
    longs = df.select(array_lit_int([2**40, -7], suffix="L").alias("v"))
    assert longs.schema["v"].dataType.simpleString() == "array<bigint>"
    assert longs.first().v == [2**40, -7]


@pytest.fixture()
def span_corpus(spark):
    # within-doc repeated span ("a b c d" twice in doc 1) exercises the
    # distinct-per-doc rule the collect_set must preserve
    rows = [
        (1, "a b c d x a b c d"),
        (2, "z a b c d y"),
        (3, "q w e r t y u i"),
        (4, "q w e r nope"),
        (5, "solo text only here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(toks, n):
    return (
        toks.filter(F.size("w") >= n)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("w") - (n - 1))).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            F.md5(F.array_join(F.slice("w", F.col("i"), n), " ")).alias("sp"),
        )
    )


@pytest.mark.parametrize("n", [2, 4])
def test_collect_set_fusion_equals_two_pass(span_corpus, n):
    toks = span_corpus.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+", -1).alias("w")
    )
    spans = _spans(toks, n)
    # r11 two-pass reference: distinct -> count -> join back
    spans_d = spans.distinct()
    dup_spans = (
        spans_d.groupBy("sp").agg(F.count("*").alias("c")).filter(F.col("c") >= 2)
    )
    ref_docs = {
        r.doc_id
        for r in spans_d.join(dup_spans, "sp").select("doc_id").distinct().collect()
    }
    ref_n_dup = dup_spans.count()
    # r12 fused aggregate
    fused = (
        spans.groupBy("sp")
        .agg(F.collect_set("doc_id").alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    got_docs = {
        r.doc_id
        for r in fused.select(F.explode("docs").alias("doc_id")).distinct().collect()
    }
    assert got_docs == ref_docs
    assert fused.count() == ref_n_dup


# ---------------------------------------------------------------------------
# 3. ensure_parallelism scan partition-count cache (tables._SCAN_PARTS_CACHE)
# ---------------------------------------------------------------------------
SF_SMALL = "/root/testdata/sf0.001"


def test_scan_parts_cache_matches_raw_probe(spark):
    from frontmatter_mcp_spark import tables

    for name in ["documents", "orders", "events", "lineitem"]:
        df = tables.load_table(spark, SF_SMALL, name)
        raw = df._jdf.queryExecution().toRdd().getNumPartitions()
        key_col = df.columns[0]
        out = tables.ensure_parallelism(df, key_col)
        target = spark.sparkContext.defaultParallelism
        # decision identical to the raw probe's
        got = out._jdf.queryExecution().toRdd().getNumPartitions()
        expect = raw if raw >= target else target
        assert got == expect, (name, raw, got, expect)
        # and the cache now holds the raw count for this layout
        scan_key = df._fm_scan_key
        hits = [v for k, v in tables._SCAN_PARTS_CACHE.items() if k[:2] == scan_key]
        assert raw in hits


def test_scan_parts_cache_key_includes_split_confs(spark):
    from frontmatter_mcp_spark import tables

    df = tables.load_table(spark, SF_SMALL, "documents")
    tables.ensure_parallelism(df, "doc_id")
    before = len(tables._SCAN_PARTS_CACHE)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64MB")
        df2 = tables.load_table(spark, SF_SMALL, "documents")
        tables.ensure_parallelism(df2, "doc_id")
        # a changed split conf may not reuse the old entry
        assert len(tables._SCAN_PARTS_CACHE) == before + 1
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_derived_frames_fall_back_to_raw_probe(spark):
    from frontmatter_mcp_spark import tables

    d = tables.load_table(spark, SF_SMALL, "documents").select("doc_id")
    assert getattr(d, "_fm_scan_key", None) is None
    out = tables.ensure_parallelism(d, "doc_id")
    assert out.count() == tables.load_table(spark, SF_SMALL, "documents").count()


# ---------------------------------------------------------------------------
# 4. overlap() — concurrent independent build jobs (guide §2.6)
# ---------------------------------------------------------------------------
def test_overlap_returns_results_in_order(spark):
    from frontmatter_mcp_spark.operators.holds import overlap

    r = overlap(
        lambda: spark.range(10).count(),
        lambda: "plain-value",
        lambda: spark.range(3).count(),
    )
    assert r == [10, "plain-value", 3]


def test_overlap_propagates_exceptions(spark):
    from frontmatter_mcp_spark.operators.holds import overlap

    class Boom(RuntimeError):
        pass

    def bad():
        raise Boom("inner failure")

    with pytest.raises(Boom, match="inner failure"):
        overlap(lambda: spark.range(5).count(), bad)


def test_overlap_holds_track_all_ids_and_release(spark):
    """Concurrent holds must never lose an RDD id: every held block is
    released by release_held() even when the registry diffs interleave
    (duplicate attribution is tolerated, missing attribution is not)."""
    from frontmatter_mcp_spark.operators import holds

    holds.release_held()
    before = holds._persistent_ids(spark)
    dfs = holds.overlap(
        *[
            (lambda i=i: holds.hold(spark.range(100 + i).selectExpr("id", "id * 2 AS d")))
            for i in range(4)
        ]
    )
    # all four checkpoints computed and usable
    assert [df.count() for df in dfs] == [100, 101, 102, 103]
    created = holds._persistent_ids(spark) - before
    assert created, "eager holds should have registered persistent RDDs"
    tracked = {i for _, ids in holds._HELD for i in ids}
    assert created <= tracked, "a concurrently-held RDD id was not tracked"
    holds.release_held()
    assert not (holds._persistent_ids(spark) & created)

def test_hold_ids_attribution_is_exact_under_overlap(spark):
    """hold_ids reads each checkpoint's RDD id off its own LogicalRDD
    plan node, so a loop running inside overlap() can release its own
    superseded rounds without freeing a neighbour's live blocks."""
    from frontmatter_mcp_spark.operators import holds

    holds.release_held()
    out = holds.overlap(
        *[
            (lambda i=i: holds.hold_ids(spark.range(50 + i).selectExpr("id", "id * 3 AS t")))
            for i in range(4)
        ]
    )
    ids = [rec for _, rec in out]
    # exactly one persistent RDD per localCheckpoint, no cross-attribution
    assert all(len(rec) == 1 for rec in ids)
    flat = [r for rec in ids for r in rec]
    assert len(set(flat)) == 4
    # each id really is that DataFrame's own checkpoint RDD
    for df, rec in out:
        assert int(df._jdf.queryExecution().analyzed().rdd().id()) == rec[0]
    # releasing one thread's ids leaves the neighbours usable
    holds.release_ids(spark, ids[0])
    assert [df.count() for df, _ in out[1:]] == [51, 52, 53]
    holds.release_held()

# ---------------------------------------------------------------------------
# 5. q235 census restructure — overlapped column-group aggregates must
#    reproduce the one-action union census value-for-value
# ---------------------------------------------------------------------------
def test_q235_grouped_census_equals_reference(spark):
    from frontmatter_mcp_spark.tables import load_table
    from frontmatter_mcp_spark.workload import QUERIES
    from frontmatter_mcp_spark.workload.dp_business import _CENSUS_SPEC

    sf_dir = "/root/testdata/sf0.001"
    got = QUERIES["q235_null_census"].spark(spark, sf_dir).collect()

    # reference: the pre-r12 shape — per-table single aggregates over the
    # full column list, assembled into (table, column) rows
    ref = []
    for t, cols in _CENSUS_SPEC.items():
        df = load_table(spark, sf_dir, t)
        aggs = [F.count("*").cast("long").alias("n_rows")]
        for c, kind in cols:
            aggs.append(
                F.sum(F.col(c).isNull().cast("int")).cast("long").alias(f"nn_{c}")
            )
            aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"nd_{c}"))
            blank = (
                F.sum((F.trim(F.col(c)) == "").cast("int")).cast("long")
                if kind == "s"
                else F.lit(0).cast("long")
            )
            aggs.append(blank.alias(f"nb_{c}"))
        r = df.agg(*aggs).collect()[0]
        for c, _ in cols:
            ref.append((t, c, r["n_rows"], r[f"nn_{c}"], r[f"nb_{c}"], r[f"nd_{c}"]))
    ref.sort(key=lambda x: (x[0], x[1]))

    assert [
        (r.table_name, r.column_name, r.n_rows, r.n_null, r.n_blank, r.n_distinct)
        for r in got
    ] == ref
