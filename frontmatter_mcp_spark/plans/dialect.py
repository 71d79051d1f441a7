"""DuckDB-dialect shim for the *documented* query surface.

The reference forwards user SQL verbatim to DuckDB (query.py:72); we
forward to Spark SQL. Spark natively parses almost everything the
reference documents (SELECT/WHERE/GROUP BY/JOIN/ORDER BY/LIMIT/LIKE/
IS NULL/TRY_CAST/aliases), and sqlfuncs registers the DuckDB function
names (list_contains, array_cosine_similarity, ...). What remains are
two syntactic DuckDB-isms exercised by the reference's README/tests
(SURVEY §2.B B10/B11):

1. ``from_json(col, '["VARCHAR"]')`` — DuckDB schema-hint strings.
   Spark wants a DDL type: rewrite to ``from_json(col, 'array<string>')``.
2. comma-UNNEST laterals: ``FROM files, UNNEST(expr) AS t(tag)`` —
   rewrite to ``FROM files LATERAL VIEW explode(expr) t AS tag``.

The rewrites are deliberately conservative token-level transforms of
exactly these documented constructs; any other SQL passes through
untouched so Catalyst sees the user's query as-is.
"""

from __future__ import annotations

import re

# '["VARCHAR"]' / '[""]' / '["INTEGER"]' ... -> Spark DDL array types
_JSON_HINT_TYPES = {
    "VARCHAR": "string",
    "TEXT": "string",
    "INTEGER": "int",
    "INT": "int",
    "BIGINT": "bigint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "BOOLEAN": "boolean",
    "": "string",
}

_JSON_HINT_RE = re.compile(r"""'\[\s*"([A-Za-z]*)"\s*\]'""")

# FROM <table>, UNNEST(<expr>) AS <alias>(<col>)
_UNNEST_RE = re.compile(
    r",\s*UNNEST\s*\((?P<expr>[^()]*(?:\([^()]*(?:\([^()]*\)[^()]*)*\)[^()]*)*)\)\s+AS\s+(?P<tab>\w+)\s*\(\s*(?P<col>\w+)\s*\)",
    re.IGNORECASE,
)


def _rewrite_json_hint(sql: str) -> str:
    def repl(m: re.Match) -> str:
        duck_t = m.group(1).upper()
        spark_t = _JSON_HINT_TYPES.get(duck_t)
        if spark_t is None:
            return m.group(0)  # unknown hint: leave untouched
        return f"'array<{spark_t}>'"

    return _JSON_HINT_RE.sub(repl, sql)


def _rewrite_comma_unnest(sql: str) -> str:
    return _UNNEST_RE.sub(
        lambda m: f" LATERAL VIEW explode({m.group('expr')}) {m.group('tab')} AS {m.group('col')}",
        sql,
    )


def translate(sql: str) -> str:
    """Apply the documented DuckDB-ism rewrites; everything else passes
    through to Spark SQL verbatim."""
    return _rewrite_comma_unnest(_rewrite_json_hint(sql))
