"""Focused tests for the r13 optimization-round changes.

Every optimization must keep query results bit-identical; each change
here pins its equivalence (or its concurrency invariant) independently
of the full oracle sweep.
"""

from __future__ import annotations

import threading
import time

from frontmatter_mcp_spark.operators import holds


def test_release_held_takes_lock_against_concurrent_builds(spark):
    """release_held pops under _HELD_LOCK, so a release racing a
    concurrent hold never observes the list mid-mutation and never
    loses a just-appended entry."""
    stop = threading.Event()
    errs: list[BaseException] = []

    def builder() -> None:
        try:
            while not stop.is_set():
                holds.hold(spark.range(10), eager=True)
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    t = threading.Thread(target=builder)
    t.start()
    try:
        for _ in range(20):
            holds.release_held()
            time.sleep(0.01)
    finally:
        stop.set()
        t.join()
    holds.release_held()
    assert not errs
    assert not holds._HELD
    # nothing left persisted either: every appended entry was released
    assert holds._persistent_ids(spark) == set()


def test_overlap_max_concurrency_bounds_fanout(spark):
    """max_concurrency caps in-flight thunks; results stay in order."""
    running = 0
    peak = 0
    lock = threading.Lock()

    def thunk(i):
        def inner():
            nonlocal running, peak
            with lock:
                running += 1
                peak = max(peak, running)
            time.sleep(0.05)
            with lock:
                running -= 1
            return i

        return inner

    out = holds.overlap(*[thunk(i) for i in range(12)], max_concurrency=3)
    assert out == list(range(12))
    assert peak <= 3


def test_overlap_unbounded_default_unchanged(spark):
    out = holds.overlap(*[(lambda i=i: i * i) for i in range(5)])
    assert out == [0, 1, 4, 9, 16]
