"""Array mutation semantics as Catalyst column expressions.

These are the *logical* (DataFrame) forms of the reference's five batch
array operators (server.py:311-660) — used for bulk transforms over the
files table; the filesystem write-back tools in engine.py apply the same
semantics per file via mutations.py. The tricky ones are first-occurrence
remove/replace: Spark's ``array_remove`` drops ALL occurrences, so we
build first-occurrence variants from ``array_position`` + slicing.

All operate on ``array<string>`` columns (the JSON-decoded frontmatter
arrays) and are pure JVM expressions — safe in a 100 TB map stage.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def array_add(col: Column, value: Column, allow_duplicates: bool = False) -> Column:
    """Append; create [v] when NULL; skip duplicates unless allowed
    (reference batch_array_add, server.py:311-377)."""
    appended = F.concat(col, F.array(value))
    if allow_duplicates:
        exists_case = appended
    else:
        exists_case = F.when(F.array_contains(col, value), col).otherwise(appended)
    return F.when(col.isNull(), F.array(value)).otherwise(exists_case)


def array_remove_first(col: Column, value: Column) -> Column:
    """Remove the FIRST occurrence only (list.remove semantics,
    reference server.py:380-442; Spark's array_remove drops all)."""
    pos = F.array_position(col, value)  # 1-based; 0 when absent
    removed = F.concat(
        F.slice(col, F.lit(1), (pos - 1).cast("int")),
        F.slice(col, (pos + 1).cast("int"), F.greatest(F.size(col) - pos, F.lit(0)).cast("int")),
    )
    return F.when(col.isNull() | (pos == 0), col).otherwise(removed)


def array_replace_first(col: Column, old: Column, new: Column) -> Column:
    """Replace the FIRST occurrence of old with new (server.py:445-510)."""
    pos = F.array_position(col, old)
    replaced = F.transform(
        col, lambda x, i: F.when(i == (pos - 1).cast("int"), new).otherwise(x)
    )
    return F.when(col.isNull() | (pos == 0), col).otherwise(replaced)


def array_sorted(col: Column, reverse: bool = False) -> Column:
    """Sort asc/desc (server.py:513-588)."""
    return F.sort_array(col, asc=not reverse)


def array_unique(col: Column) -> Column:
    """Dedupe preserving first-occurrence order — array_distinct matches
    the reference's dict.fromkeys semantics (server.py:646)."""
    return F.array_distinct(col)
