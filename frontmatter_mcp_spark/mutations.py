"""Per-file array mutation semantics (reference server.py:311-660).

Pure functions over raw (YAML-decoded) metadata values; engine.py wires
them to the batch tool surface with the warnings/partial-success
contract. Each returns (new_value, changed, warning) where warning is
None unless the operation must be skipped with a message.

Semantics pinned by the reference tests (FIXTURES.md F6):
- add: create [v] when missing; skip duplicate unless allow_duplicates;
  a list value is appended as ONE element, not flattened;
- remove/replace: FIRST occurrence only (list.remove semantics);
- sort: skip when len <= 1 or already sorted;
- unique: preserve first-occurrence order (dict.fromkeys);
- any op on a non-array existing value: skip with a warning.
"""

from __future__ import annotations

from typing import Any

MutationResult = tuple[Any, bool, str | None]


def _non_array_warning(path: str, prop: str, value: Any) -> str:
    return f"Property '{prop}' in {path} is not an array (got {type(value).__name__})"


def add_value(
    current: Any, value: Any, *, path: str, prop: str, allow_duplicates: bool = False
) -> MutationResult:
    if current is None:
        return [value], True, None
    if not isinstance(current, list):
        return current, False, _non_array_warning(path, prop, current)
    if not allow_duplicates and value in current:
        return current, False, None
    return current + [value], True, None


def remove_value(current: Any, value: Any, *, path: str, prop: str) -> MutationResult:
    if current is None:
        return current, False, None
    if not isinstance(current, list):
        return current, False, _non_array_warning(path, prop, current)
    if value not in current:
        return current, False, None
    out = list(current)
    out.remove(value)  # first occurrence, the pinned semantics
    return out, True, None


def replace_value(
    current: Any, old: Any, new: Any, *, path: str, prop: str
) -> MutationResult:
    if current is None:
        return current, False, None
    if not isinstance(current, list):
        return current, False, _non_array_warning(path, prop, current)
    if old not in current:
        return current, False, None
    out = list(current)
    out[out.index(old)] = new  # first occurrence
    return out, True, None


def sort_values(current: Any, *, path: str, prop: str, reverse: bool = False) -> MutationResult:
    if current is None:
        return current, False, None
    if not isinstance(current, list):
        return current, False, _non_array_warning(path, prop, current)
    if len(current) <= 1:
        return current, False, None
    try:
        out = sorted(current, reverse=reverse)
    except TypeError as e:
        return current, False, f"Cannot sort '{prop}' in {path}: {e}"
    if out == current:
        return current, False, None
    return out, True, None


def unique_values(current: Any, *, path: str, prop: str) -> MutationResult:
    if current is None:
        return current, False, None
    if not isinstance(current, list):
        return current, False, _non_array_warning(path, prop, current)
    # dict.fromkeys preserves first-occurrence order but needs hashables;
    # fall back to a list scan when elements are unhashable (nested lists)
    try:
        out = list(dict.fromkeys(current))
    except TypeError:
        out = []
        for v in current:
            if v not in out:
                out.append(v)
    if out == current:
        return current, False, None
    return out, True, None
