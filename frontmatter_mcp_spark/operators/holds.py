"""Session-lifetime tracking for operator-internal materializations.

Operators sometimes must cut a plan's lineage with an eager
``localCheckpoint`` (the capped LSH band table) — blocks the OPERATOR
allocates but cannot free through the DataFrame API: the checkpoint's
internal RDD is not reachable from Python (``df.rdd`` wraps a derived
RDD, so ``df.rdd.unpersist()`` frees nothing), and a persist+count
stand-in measured 2.7x slower on q187 (an InMemoryRelation over the
adaptive broadcast plan loses whole-stage codegen on every consumer).
So ``hold`` checkpoints and records the checkpoint's RDD ids by
diffing the JVM's persistent-RDD registry around the call; release
unpersists those ids through the registry. The workload registry
frees everything tracked here at the next query invocation
(registry.release_pinned) — one query's working set in executor
storage, never a whole bench session's.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_HELD: list[tuple[object, list[int]]] = []
_HELD_LOCK = threading.Lock()


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def hold(df: DataFrame, eager: bool = True) -> DataFrame:
    """Checkpoint df; track the checkpoint's RDD ids for release.

    Queries build serially in this engine (driver, bench, oracle
    harness), so the registry diff attributes new ids unambiguously.
    ``eager=False`` defers block materialization to the first action
    but still registers (and therefore still tracks) the RDD now.
    """
    df, _ = hold_ids(df, eager=eager)
    return df


def hold_ids(df: DataFrame, eager: bool = True) -> tuple[DataFrame, list[int]]:
    """hold(), but also hand the recorded ids back to the caller.

    For iterate-until-converged loops (star contraction, binary-search
    probes) where round N's checkpoint supersedes round N-1's: the
    caller frees the superseded round NOW via release_ids() instead of
    accumulating O(rounds) edge lists in executor storage until the
    next query invocation.

    Id attribution is exact, not inferred: ``Dataset.localCheckpoint``
    persists precisely one RDD — the internal row RDD the returned
    Dataset's ``LogicalRDD`` plan node wraps — so the id is read off the
    checkpointed plan itself. That makes the recorded list correct even
    when several holds run concurrently (``overlap``): a loop can free
    its own superseded rounds without ever touching a neighbour's
    blocks. The registry-diff fallback (exact only for serial builds)
    remains for plan-shape drift.
    """
    spark = df.sparkSession
    before = _persistent_ids(spark)
    df = df.localCheckpoint(eager=eager)
    try:
        new_ids = [int(df._jdf.queryExecution().analyzed().rdd().id())]
    except Exception:  # noqa: BLE001 — internals drift; diff is the old path
        new_ids = sorted(_persistent_ids(spark) - before)
    if new_ids:
        with _HELD_LOCK:
            _HELD.append((spark, new_ids))
    return df, new_ids


def release_ids(spark, ids: list[int]) -> None:
    """Free specific held ids immediately (superseded loop rounds)."""
    if not ids:
        return
    wanted = set(ids)
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd_id in ids:
            jrdd = jmap.get(rdd_id)
            if jrdd is not None:
                jrdd.unpersist(False)
    except Exception:  # noqa: BLE001 — best-effort block cleanup
        pass
    # RDD ids are unique per SparkContext (one per process), so matching
    # on ids alone is unambiguous
    with _HELD_LOCK:
        _HELD[:] = [
            (s, remaining)
            for s, rec in _HELD
            if (remaining := [r for r in rec if r not in wanted])
        ]


def overlap(*thunks, max_concurrency: int | None = None):
    """Run independent build thunks concurrently; return results in order.

    Spark's scheduler happily runs several jobs at once inside one
    application — actions are only sequential because driver code calls
    them sequentially (optimization guide §2.6). A query that builds
    several independent held tables (e.g. the MinHash / SimHash /
    winnowing blockers of an ensemble) pays one serialized eager
    ``localCheckpoint`` job per table; submitting those builds from
    threads lets the independent DAGs back-fill each other's stragglers,
    so the build phase costs the slowest chain instead of the sum
    (q310 measured 10.0 s -> 5.2 s min-of-3, identical rows).

    Thread-safety of the hold tracking: ``hold_ids`` reads each
    checkpoint's RDD id off the returned plan's own ``LogicalRDD`` node,
    so attribution is exact under concurrency — ``hold`` users and
    ``hold_ids``/``release_ids`` loop users (star contraction) are both
    safe inside ``overlap``; the shared ``_HELD`` list is lock-guarded.

    Exceptions re-raise in the caller (first one wins). Results are
    plain DataFrames/values, deterministic regardless of completion
    order, so query output is unchanged by construction.

    ``max_concurrency`` bounds the number of thunks submitting Spark
    jobs at once (a semaphore, so results still come back in order).
    Callers with a data-proportional thunk count (q235's column-group
    census) pass it so driver fan-out stays bounded rather than
    proportional to spec size; the default (None) keeps the historical
    all-at-once behaviour for small fixed fan-outs.
    """
    import threading

    from pyspark import inheritable_thread_target

    results = [None] * len(thunks)
    errs: list[BaseException] = []
    gate = (
        threading.Semaphore(max_concurrency)
        if max_concurrency and max_concurrency > 0
        else None
    )

    def runner(i, fn):
        def inner() -> None:
            try:
                if gate is None:
                    results[i] = fn()
                else:
                    with gate:
                        results[i] = fn()
            except BaseException as e:  # noqa: BLE001 — re-raised below
                errs.append(e)

        return inner

    threads = [
        threading.Thread(target=inheritable_thread_target(runner(i, fn)))
        for i, fn in enumerate(thunks)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]
    return results


def release_held() -> None:
    while True:
        # hold_ids appends under _HELD_LOCK; take the same lock here so a
        # release racing a concurrent build (overlap) can never observe
        # the list mid-mutation. The unpersist itself runs outside the
        # lock — it is a JVM call and must not serialize builders.
        with _HELD_LOCK:
            if not _HELD:
                return
            spark, ids = _HELD.pop()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rdd_id in ids:
                jrdd = jmap.get(rdd_id)
                if jrdd is not None:
                    jrdd.unpersist(False)
        except Exception:  # noqa: BLE001 — best-effort block cleanup
            pass
