"""End-to-end engine.query tests over a tmp vault (reference:
tests/test_query.py + tests/test_server.py, fixtures FIXTURES.md F1-F5)."""

from __future__ import annotations

import pytest

from frontmatter_mcp_spark.engine import FrontmatterEngine


@pytest.fixture()
def vault(tmp_path):
    (tmp_path / "subdir").mkdir()
    (tmp_path / "a.md").write_text(
        "---\ndate: 2025-11-27\ntags:\n  - python\n  - mcp\nsummary: A summary\n---\nBody A\n"
    )
    (tmp_path / "b.md").write_text("---\ndate: 2025-11-26\ntags:\n  - duckdb\n---\nBody B\n")
    (tmp_path / "subdir" / "c.md").write_text(
        "---\ndate: 2025-11-25\ntags:\n  - python\n---\nBody C\n"
    )
    return tmp_path


@pytest.fixture()
def engine(spark, vault):
    return FrontmatterEngine(spark, vault)


def test_select_star(engine):
    out = engine.query("**/*.md", "SELECT * FROM files")
    assert out["row_count"] == 3
    assert set(out["columns"]) == {"path", "date", "tags", "summary"}
    assert "warnings" not in out


def test_projection_and_string_date_filter(engine):
    # B2/B3: all-strings model makes date >= '...' a lexicographic compare
    out = engine.query(
        "**/*.md",
        "SELECT path, date FROM files WHERE date >= '2025-11-26' ORDER BY date DESC",
    )
    assert [r["path"] for r in out["results"]] == ["a.md", "b.md"]


def test_missing_key_is_null(engine):
    # F3: files lacking a key get NULL
    out = engine.query("**/*.md", "SELECT path FROM files WHERE summary IS NULL ORDER BY path")
    assert [r["path"] for r in out["results"]] == ["b.md", "subdir/c.md"]


def test_from_json_list_contains_duckdb_dialect(engine):
    # B10/B12: DuckDB schema-hint + list_contains must work unchanged
    out = engine.query(
        "**/*.md",
        "SELECT path FROM files WHERE list_contains(from_json(tags, '[\"VARCHAR\"]'), 'python') ORDER BY path",
    )
    assert [r["path"] for r in out["results"]] == ["a.md", "subdir/c.md"]


def test_comma_unnest_tag_counts(engine):
    # B11: the reference README's comma-UNNEST lateral (README.md:304-310)
    out = engine.query(
        "**/*.md",
        """
        SELECT tag, COUNT(*) AS count
        FROM files, UNNEST(from_json(tags, '["VARCHAR"]')) AS t(tag)
        GROUP BY tag ORDER BY count DESC, tag
        """,
    )
    assert out["results"][0] == {"tag": "python", "count": 2}
    assert {r["tag"] for r in out["results"]} == {"python", "mcp", "duckdb"}


def test_count_star(engine):
    out = engine.query("**/*.md", "SELECT COUNT(*) AS n FROM files")
    assert out["results"][0]["n"] == 3


def test_like_and_limit(engine):
    out = engine.query(
        "**/*.md",
        "SELECT path FROM files WHERE date LIKE '2025-%' ORDER BY date DESC LIMIT 2",
    )
    assert [r["path"] for r in out["results"]] == ["a.md", "b.md"]


def test_empty_glob_gives_path_only_table(engine):
    # reference query.py:36-38: empty match -> table with only path
    out = engine.query("*.nomatch", "SELECT * FROM files")
    assert out["row_count"] == 0
    assert out["columns"] == ["path"]


def test_mixed_type_column_string_monomorphism(spark, tmp_path):
    # F4: raw YAML types all become str()
    vals = {
        "a.md": ("string", "string"),
        "b.md": ("42", "42"),
        "c.md": ("3.14", "3.14"),
        "d.md": ("true", "True"),
        "e.md": ("[x, y]", '["x", "y"]'),
    }
    for name, (raw, _) in vals.items():
        (tmp_path / name).write_text(f"---\nvalue: {raw}\n---\n")
    eng = FrontmatterEngine(spark, tmp_path)
    out = eng.query("*.md", "SELECT path, value FROM files ORDER BY path")
    got = {r["path"]: r["value"] for r in out["results"]}
    assert got == {name: expect for name, (_, expect) in vals.items()}


def test_templater_strings_dont_break_queries(spark, tmp_path):
    # F5 / ADR-0005: template literals coexist with ISO dates
    (tmp_path / "t.md").write_text('---\ndate: <% tp.date.now("YYYY-MM-DD") %>\n---\n')
    (tmp_path / "d.md").write_text("---\ndate: 2025-11-26\n---\n")
    eng = FrontmatterEngine(spark, tmp_path)
    out = eng.query(
        "*.md",
        "SELECT path FROM files WHERE date LIKE '2025-%' AND date >= '2025-11-26'",
    )
    assert [r["path"] for r in out["results"]] == ["d.md"]


def test_malformed_file_warning_contract(spark, tmp_path):
    # F7: bad YAML -> query succeeds for others + one warning naming the file
    (tmp_path / "good.md").write_text("---\ntitle: ok\n---\n")
    (tmp_path / "bad.md").write_text("---\ninvalid: [unclosed\n---\n")
    eng = FrontmatterEngine(spark, tmp_path)
    out = eng.query("*.md", "SELECT path FROM files")
    assert out["row_count"] == 1
    assert len(out["warnings"]) == 1 and "bad.md" in out["warnings"][0]


def test_try_cast(engine):
    out = engine.query(
        "**/*.md",
        "SELECT path, TRY_CAST(summary AS INT) AS s_int FROM files WHERE path = 'a.md'",
    )
    assert out["results"][0]["s_int"] is None


def test_snapshot_cache_reused_and_invalidated(engine, vault):
    out1 = engine.query("**/*.md", "SELECT COUNT(*) AS n FROM files")
    key1 = engine._snapshot_key
    engine.query("**/*.md", "SELECT path FROM files")
    assert engine._snapshot_key is key1  # unchanged vault -> same snapshot
    (vault / "d.md").write_text("---\ndate: 2025-12-01\n---\n")
    out2 = engine.query("**/*.md", "SELECT COUNT(*) AS n FROM files")
    assert out2["results"][0]["n"] == out1["results"][0]["n"] + 1


def test_query_inspect_empty_vault(spark, tmp_path):
    eng = FrontmatterEngine(spark, tmp_path)
    out = eng.query_inspect("**/*.md")
    assert out["file_count"] == 0
    assert out["schema"] == {"path": {"type": "string", "nullable": False}}


def test_order_by_null_placement_matches_duckdb(engine):
    # DuckDB sorts NULLS LAST on ASC; the dialect shim makes Spark agree
    out = engine.query("**/*.md", "SELECT path, summary FROM files ORDER BY summary")
    assert out["results"][0]["summary"] == "A summary"
    assert out["results"][-1]["summary"] is None


def test_query_inspect_schema(engine):
    out = engine.query_inspect("**/*.md")
    assert out["file_count"] == 3
    schema = out["schema"]
    assert schema["path"] == {"type": "string", "nullable": False}
    assert schema["tags"]["type"] == "array"
    assert schema["date"]["type"] == "string"
    assert schema["date"]["nullable"] is False
    assert schema["summary"]["nullable"] is True
    assert "A summary" in schema["summary"]["examples"]


def test_frontmatter_key_named_path_single_column(spark, tmp_path):
    """A frontmatter key literally named 'path' must not create a second
    ambiguous 'path' column; the metadata value wins per-file (the
    reference's dict-update precedence)."""
    (tmp_path / "a.md").write_text("---\npath: custom/value\nk: 1\n---\nA\n")
    (tmp_path / "b.md").write_text("---\nk: 2\n---\nB\n")
    eng = FrontmatterEngine(spark, tmp_path)
    out = eng.query("*.md", "SELECT path, k FROM files ORDER BY k")
    assert out["columns"].count("path") == 1
    assert [r["path"] for r in out["results"]] == ["custom/value", "b.md"]


def test_wide_vault_projects_only_referenced_keys(spark, tmp_path):
    """SURVEY §7.4 scale guard: a vault whose key union exceeds
    wide_schema_limit must not build a thousands-of-columns view —
    each query projects only the keys it references (plus path), while
    SELECT * still returns the full width."""
    for i in range(30):
        (tmp_path / f"f{i:02d}.md").write_text(
            f"---\nkey_{i:02d}: v{i}\nshared: s{i}\n---\nbody\n"
        )
    eng = FrontmatterEngine(spark, tmp_path, wide_schema_limit=10)
    out = eng.query("*.md", "SELECT path, key_07 FROM files WHERE key_07 IS NOT NULL")
    assert out["results"] == [{"path": "f07.md", "key_07": "v7"}]
    # the registered view carried only the referenced keys
    narrow_cols = set(spark.table("files").columns)
    assert narrow_cols == {"path", "key_07"}  # unreferenced keys not pivoted
    # SELECT * still yields every key as a column
    out = eng.query("*.md", "SELECT * FROM files")
    assert len(out["columns"]) == 32  # path + 30 key_NN + shared
    # under the limit: behavior unchanged (full pivot cached)
    eng2 = FrontmatterEngine(spark, tmp_path, wide_schema_limit=100)
    out = eng2.query("*.md", "SELECT path FROM files ORDER BY path LIMIT 1")
    assert out["results"] == [{"path": "f00.md"}]
    assert len(spark.table("files").columns) == 32


def test_max_rows_caps_result_with_warning(spark, vault):
    """Driver-OOM escape hatch: with max_rows set, an over-cap result is
    streamed (toLocalIterator), truncated, and flagged; the default
    engine keeps the reference's collect-everything contract."""
    eng = FrontmatterEngine(spark, vault, max_rows=2)
    out = eng.query("**/*.md", "SELECT path FROM files ORDER BY path")
    assert out["row_count"] == 2
    assert [r["path"] for r in out["results"]] == ["a.md", "b.md"]
    assert any("max_rows=2" in w for w in out["warnings"])

    # under the cap: no truncation, no warning
    out2 = eng.query("**/*.md", "SELECT path FROM files WHERE path = 'a.md'")
    assert out2["row_count"] == 1 and "warnings" not in out2


def test_max_rows_from_settings(spark, vault, monkeypatch):
    from frontmatter_mcp_spark.settings import Settings

    s = Settings.from_env(
        {"FRONTMATTER_BASE_DIR": str(vault), "FRONTMATTER_MAX_ROWS": "1"}
    )
    eng = FrontmatterEngine.from_settings(spark, s)
    out = eng.query("**/*.md", "SELECT path FROM files ORDER BY path")
    assert out["row_count"] == 1
    assert any("max_rows=1" in w for w in out["warnings"])
