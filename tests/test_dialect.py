"""Dialect shim unit tests (plans/dialect.py)."""

from __future__ import annotations

from frontmatter_mcp_spark.plans.dialect import translate


def test_json_hint_varchar():
    assert (
        translate("SELECT from_json(tags, '[\"VARCHAR\"]') FROM files")
        == "SELECT from_json(tags, 'array<string>') FROM files"
    )


def test_json_hint_empty_string():
    assert "array<string>" in translate("from_json(x, '[\"\"]')")


def test_json_hint_integer():
    assert "array<int>" in translate("from_json(x, '[\"INTEGER\"]')")


def test_comma_unnest_rewrite():
    sql = 'SELECT tag FROM files, UNNEST(from_json(tags, \'["VARCHAR"]\')) AS t(tag)'
    out = translate(sql)
    assert "LATERAL VIEW explode(from_json(tags, 'array<string>')) t AS tag" in out
    assert ", UNNEST" not in out


def test_plain_sql_untouched():
    sql = "SELECT path, COUNT(*) FROM files WHERE date >= '2025-01-01' GROUP BY path"
    assert translate(sql) == sql


def test_unknown_hint_untouched():
    sql = "SELECT from_json(x, '[\"STRUCTY\"]') FROM files"
    assert translate(sql) == sql
