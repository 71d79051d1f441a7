"""DuckDB-oracle harness for the frontmatter `files` table itself.

This is the reference's exact architecture run side-by-side: the same
vault's parsed records go into (a) our Spark engine and (b) an in-memory
DuckDB `files` table built the way the reference builds it
(all-strings columns, reference query.py:23-59). Each SQL statement —
written in the DUCKDB dialect the reference documents — must produce
identical canonicalized results from both engines. This validates
string-compare semantics, NULL handling, the dialect shim (from_json
hints, comma-UNNEST, NULLS LAST), and the registered DuckDB-name
functions end-to-end.
"""

from __future__ import annotations

import duckdb
import pytest

from frontmatter_mcp_spark.engine import FrontmatterEngine
from frontmatter_mcp_spark.files import collect_files, parse_files
from tests.oracle_check import canonicalize

VAULT_FILES = {
    "a.md": "---\ndate: 2025-11-27\ntags:\n  - python\n  - mcp\nsummary: A summary\npriority: 3\n---\nBody A\n",
    "b.md": "---\ndate: 2025-11-26\ntags:\n  - duckdb\npriority: 1\n---\nBody B\n",
    "subdir/c.md": "---\ndate: 2025-11-25\ntags:\n  - python\npriority: 2\n---\nBody C\n",
    "d.md": "---\ndate: <% tp.date.now(\"YYYY-MM-DD\") %>\ntags:\n  - template\n---\n",
    "e.md": "---\ndate: 2025-12-01\nsummary: null\nvalue: 42\n---\n",
    "f.md": "---\nvalue: true\ntags: []\n---\n",
}

# the documented DuckDB-dialect surface, as a user of the reference
# would write it (README.md:99-113, 293-310; tests/test_query.py)
QUERIES = [
    "SELECT * FROM files",
    "SELECT path, date FROM files WHERE date >= '2025-11-26' ORDER BY date DESC",
    "SELECT path FROM files WHERE summary IS NULL ORDER BY path",
    "SELECT path FROM files WHERE summary IS NOT NULL",
    "SELECT COUNT(*) AS n FROM files",
    "SELECT COUNT(date) AS n_dates, COUNT(DISTINCT priority) AS n_prios FROM files",
    'SELECT path FROM files WHERE list_contains(from_json(tags, \'["VARCHAR"]\'), \'python\') ORDER BY path',
    """SELECT tag, COUNT(*) AS count
       FROM files, UNNEST(from_json(tags, '["VARCHAR"]')) AS t(tag)
       GROUP BY tag ORDER BY count DESC, tag""",
    "SELECT path FROM files WHERE date LIKE '2025-%' ORDER BY date LIMIT 3",
    "SELECT path, TRY_CAST(value AS INT) AS v FROM files",
    "SELECT path, TRY_CAST(priority AS INT) * 10 AS p10 FROM files WHERE priority IS NOT NULL",
    "SELECT priority, COUNT(*) AS n FROM files GROUP BY priority",
    # ORDER BY with NULLs present: the shim must reproduce DuckDB's
    # NULLS LAST default for ascending sorts
    "SELECT path, summary FROM files ORDER BY summary, path",
    "SELECT path, date FROM files ORDER BY date, path",
    "SELECT upper(path) AS up, length(path) AS lp FROM files",
    "SELECT substr(date, 1, 7) AS month, COUNT(*) AS n FROM files WHERE date IS NOT NULL GROUP BY 1",
    "SELECT a.path, b.path AS other FROM files a JOIN files b ON a.priority = b.priority AND a.path < b.path",
    "SELECT path FROM files WHERE priority IN ('1', '3') ORDER BY path",
    "SELECT COALESCE(summary, 'none') AS s, COUNT(*) AS n FROM files GROUP BY 1",
    "SELECT MIN(date) AS first_date, MAX(date) AS last_date FROM files WHERE date LIKE '2025-%'",
]


@pytest.fixture(scope="module")
def vault(tmp_path_factory):
    root = tmp_path_factory.mktemp("files_oracle_vault")
    for rel, content in VAULT_FILES.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    return root


@pytest.fixture(scope="module")
def engine(spark, vault):
    return FrontmatterEngine(spark, vault)


@pytest.fixture(scope="module")
def duck(vault):
    """Build the DuckDB `files` table exactly as the reference does:
    union-of-keys all-string columns from the parsed records."""
    records, warnings = parse_files(collect_files(vault, "**/*.md"), vault)
    assert not warnings
    rows = [r.record() for r in records]
    keys = ["path"] + sorted({k for r in rows for k in r} - {"path"})
    con = duckdb.connect()
    cols = ", ".join(f'"{k}" VARCHAR' for k in keys)
    con.sql(f"CREATE TABLE files ({cols})")
    for r in rows:
        con.execute(
            f"INSERT INTO files VALUES ({', '.join('?' for _ in keys)})",
            [r.get(k) for k in keys],
        )
    return con


@pytest.mark.parametrize("sql", QUERIES)
def test_files_sql_matches_duckdb(engine, duck, sql):
    ours = engine.query("**/*.md", sql)
    s_cols, s_vals = canonicalize(
        ours["columns"], [tuple(row[c] for c in ours["columns"]) for row in ours["results"]]
    )
    res = duck.sql(sql)
    d_cols, d_vals = canonicalize([d[0] for d in res.description], res.fetchall())
    assert s_cols == d_cols
    assert s_vals == d_vals
