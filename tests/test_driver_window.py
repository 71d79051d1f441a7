"""Guards for the derived driver-correctness-window rotation.

The external gate hash-checks only the first DRIVER_WINDOW registry
entries per round, so registration order IS coverage policy. These tests
make silent coverage loss impossible: a new query, a modified query, or a
never-verified query that fails to land inside the window fails the suite.
"""

from __future__ import annotations

from frontmatter_mcp_spark import workload
from frontmatter_mcp_spark.workload import (
    _LAST_GREEN_ROUND,
    _MODIFIED_SINCE_GREEN,
    DRIVER_WINDOW,
    QUERIES,
    driver_window_order,
)


def _window() -> list[str]:
    return list(QUERIES)[:DRIVER_WINDOW]


def test_registry_order_matches_derived_order():
    assert list(QUERIES) == driver_window_order()


def test_window_is_full_and_oracle_bearing():
    window = _window()
    assert len(window) == DRIVER_WINDOW
    for name in window:
        assert QUERIES[name].oracle is not None, (
            f"{name} occupies a window slot but only gets a rows-only check"
        )


def test_never_verified_queries_lead_the_window():
    """Never-verified oracle-bearing queries must occupy a contiguous
    prefix of the registry. When there are more of them than window
    slots (a round that added >50 queries), the overflow must sit
    DIRECTLY after the window so it front-loads the next round — the
    multi-round drain is by construction, not by luck."""
    never = [n for n in QUERIES if n not in _LAST_GREEN_ROUND and QUERIES[n].oracle]
    head = list(QUERIES)[: len(never)]
    assert sorted(head) == sorted(never), (
        "never-verified queries are not a contiguous registry prefix: "
        f"{sorted(set(never) - set(head))}"
    )


def test_modified_queries_are_inside_the_window():
    """Modified-since-green queries come right after never-verified
    ones; only never-verified overflow may displace them from the
    window itself."""
    order = list(QUERIES)
    never = {n for n in QUERIES if n not in _LAST_GREEN_ROUND and QUERIES[n].oracle}
    displaced = sorted(_MODIFIED_SINCE_GREEN - set(_window()))
    modified = {n for n in _MODIFIED_SINCE_GREEN if n in QUERIES}
    if len(never) + len(modified) <= DRIVER_WINDOW:
        assert not displaced, (
            f"modified-since-green queries outside the window: {displaced}"
        )
    else:
        # overflow round: every modified entry must still sort before
        # all green-and-unmodified entries
        last_modified = max(
            order.index(n) for n in _MODIFIED_SINCE_GREEN if n in QUERIES
        )
        first_settled = min(
            (
                order.index(n)
                for n in order
                if n in _LAST_GREEN_ROUND
                and n not in _MODIFIED_SINCE_GREEN
                and QUERIES[n].oracle
            ),
            default=len(order),
        )
        assert last_modified < first_settled, (
            "a green-and-unmodified query outranks a modified one"
        )


def test_modified_since_green_literal_has_no_duplicates():
    """ADVICE r9: a set literal silently absorbs duplicate names, which
    makes the re-baseline list impossible to audit (is this entry new
    this round, or a leftover?). Parse the source and assert each name
    appears exactly once in the literal — and the same for each
    dict.fromkeys list feeding _LAST_GREEN_ROUND."""
    import ast
    import collections

    src = ast.parse(open(workload.__file__).read())
    for node in ast.walk(src):
        target = None
        if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            target = node.target.id
        elif isinstance(node, ast.Assign) and isinstance(node.targets[0], ast.Name):
            target = node.targets[0].id
        if target == "_MODIFIED_SINCE_GREEN":
            names = [
                e.value for e in node.value.elts if isinstance(e, ast.Constant)
            ]
            dupes = [n for n, c in collections.Counter(names).items() if c > 1]
            assert not dupes, f"duplicate _MODIFIED_SINCE_GREEN entries: {dupes}"
        if target == "_LAST_GREEN_ROUND":
            for lst in ast.walk(node.value):
                if isinstance(lst, ast.List):
                    names = [
                        e.value for e in lst.elts if isinstance(e, ast.Constant)
                    ]
                    dupes = [
                        n for n, c in collections.Counter(names).items() if c > 1
                    ]
                    assert not dupes, f"duplicate _LAST_GREEN_ROUND entries: {dupes}"


def test_green_history_names_are_real_queries():
    ghosts = sorted(set(_LAST_GREEN_ROUND) - set(QUERIES))
    ghosts += sorted(_MODIFIED_SINCE_GREEN - set(QUERIES))
    assert not ghosts, f"green-history entries for unregistered queries: {ghosts}"


def test_every_query_outside_the_window_was_green_once():
    # the only acceptable reasons to sit outside the window: a recorded
    # green row, no oracle at all (weaker rows-only check), or being
    # never-verified OVERFLOW queued directly behind the window (>50 new
    # queries in one round — drains across rounds because never-verified
    # entries always sort first)
    order = list(QUERIES)
    never_prefix = sum(
        1 for n in order if n not in _LAST_GREEN_ROUND and QUERIES[n].oracle
    )
    overflow_zone = set(order[DRIVER_WINDOW : max(never_prefix, DRIVER_WINDOW)])
    unverified = [
        n
        for n in order[DRIVER_WINDOW:]
        if QUERIES[n].oracle is not None
        and n not in _LAST_GREEN_ROUND
        and n not in overflow_zone
    ]
    assert not unverified, (
        f"oracle-bearing queries that would never be verified: {unverified}"
    )


def test_streaming_queries_carry_oracles_into_this_round_window():
    # round-3 policy: the six streaming queries have never had a driver row;
    # they must occupy window slots until CORRECTNESS records them green
    streaming = [n for n in QUERIES if n.startswith("q5") and "stream" in n]
    assert len(streaming) == 6
    window = set(_window())
    outside = [n for n in streaming if n not in window and n not in _LAST_GREEN_ROUND]
    assert not outside, f"never-verified streaming queries outside window: {outside}"


def test_reorder_is_idempotent():
    before = list(QUERIES)
    workload._reorder_for_driver_window()
    assert list(QUERIES) == before


def test_pinned_blocks_release_at_next_query(spark):
    """registry.pin() lifecycle end-to-end: a query that pins shared
    subplans (q91) leaves its cached blocks in executor storage after
    materialization — the returned DataFrame needed them — and the NEXT
    query invocation releases them, so storage never accumulates across
    a full bench session."""
    from frontmatter_mcp_spark.workload import QUERIES

    sf = "/root/testdata/sf0.001"
    sc = spark.sparkContext._jsc.sc()
    # other components cache legitimately (engine snapshot cache), so
    # compare against a baseline instead of asserting global emptiness
    baseline = {i.id() for i in sc.getRDDStorageInfo()}
    QUERIES["q91_banding_sweep"].spark(spark, sf).collect()
    after_q91 = {i.id() for i in sc.getRDDStorageInfo()}
    assert after_q91 - baseline  # q91's pins still resident

    QUERIES["q01_pricing_summary"].spark(spark, sf).collect()
    after_next = {i.id() for i in sc.getRDDStorageInfo()}
    assert not (after_next - baseline)  # released on next invocation
