"""Parse/update/cache layer tests (reference: tests/test_files.py)."""

from __future__ import annotations

import json
import os

import pytest

from frontmatter_mcp_spark import files as fm


def write(p, text):
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(text, encoding="utf-8")


def test_split_frontmatter_basic():
    head, body = fm.split_frontmatter("---\ntitle: x\n---\nBody here\n")
    assert head == "title: x"
    assert body == "Body here\n"


def test_split_frontmatter_absent():
    head, body = fm.split_frontmatter("No frontmatter\n")
    assert head is None
    assert body == "No frontmatter\n"


def test_serialize_value_contract():
    # ADR-0005/0006: None -> NULL, list -> JSON, else str()
    assert fm.serialize_value(None) is None
    assert fm.serialize_value([1, "a"]) == '[1, "a"]'
    assert fm.serialize_value(True) == "True"
    assert fm.serialize_value(42) == "42"
    assert fm.serialize_value(3.14) == "3.14"
    assert fm.serialize_value("s") == "s"


def test_parse_file_record(tmp_path):
    write(tmp_path / "a.md", "---\ndate: 2025-11-27\ntags:\n  - python\n  - mcp\n---\nBody\n")
    parsed = fm.parse_file(tmp_path / "a.md", tmp_path)
    rec = parsed.record()
    assert rec["path"] == "a.md"
    assert rec["date"] == "2025-11-27"
    assert json.loads(rec["tags"]) == ["python", "mcp"]
    assert parsed.body.strip() == "Body"


def test_parse_files_malformed_yaml_warning(tmp_path):
    # FIXTURES F7: one bad file among good ones -> one warning, others parse
    write(tmp_path / "good.md", "---\ntitle: ok\n---\n")
    write(tmp_path / "bad.md", "---\ninvalid: [unclosed\n---\n")
    records, warnings = fm.parse_files(
        fm.collect_files(tmp_path, "*.md"), tmp_path, fm.FileRecordCache()
    )
    assert [r.path for r in records] == ["good.md"]
    assert len(warnings) == 1 and "bad.md" in warnings[0]


def test_mtime_cache_hit_and_invalidate(tmp_path):
    write(tmp_path / "a.md", "---\nk: v1\n---\n")
    cache = fm.FileRecordCache()
    paths = fm.collect_files(tmp_path, "*.md")
    r1, _ = fm.parse_files(paths, tmp_path, cache)
    assert r1[0].metadata["k"] == "v1"
    # rewriting with a forced different mtime must re-parse
    write(tmp_path / "a.md", "---\nk: v2\n---\n")
    import os

    st = (tmp_path / "a.md").stat()
    os.utime(tmp_path / "a.md", (st.st_atime, st.st_mtime + 10))
    r2, _ = fm.parse_files(fm.collect_files(tmp_path, "*.md"), tmp_path, cache)
    assert r2[0].metadata["k"] == "v2"


def test_update_file_set_unset_precedence(tmp_path):
    write(tmp_path / "a.md", "---\nkeep: kept\ndrop: old\n---\nBody\n")
    out = fm.update_file(
        tmp_path / "a.md", tmp_path, set_props={"drop": "new", "added": 1}, unset_props=["drop"]
    )
    # unset wins over set for the same key (reference files.py:130-140)
    assert "drop" not in out["frontmatter"]
    assert out["frontmatter"]["added"] == 1
    reparsed = fm.parse_file(tmp_path / "a.md", tmp_path)
    assert reparsed.metadata == {"keep": "kept", "added": 1}
    assert reparsed.body.strip() == "Body"


def test_update_noop_set_still_rewrites(tmp_path):
    # reference files.py:142-145 writes whenever set/unset is provided —
    # a no-op set renormalizes the YAML and bumps mtime
    write(tmp_path / "a.md", "---\nk:    v\n---\nBody\n")
    st0 = (tmp_path / "a.md").stat()
    os.utime(tmp_path / "a.md", (st0.st_atime, st0.st_mtime - 10))
    before_mtime = (tmp_path / "a.md").stat().st_mtime
    fm.update_file(tmp_path / "a.md", tmp_path, set_props={"k": "v"})
    assert (tmp_path / "a.md").stat().st_mtime > before_mtime
    assert "k: v" in (tmp_path / "a.md").read_text()
    # but with neither set nor unset, nothing is written
    st1 = (tmp_path / "a.md").stat()
    os.utime(tmp_path / "a.md", (st1.st_atime, st1.st_mtime - 10))
    before_mtime = (tmp_path / "a.md").stat().st_mtime
    fm.update_file(tmp_path / "a.md", tmp_path)
    assert (tmp_path / "a.md").stat().st_mtime == before_mtime


def test_update_creates_frontmatter_when_absent(tmp_path):
    write(tmp_path / "a.md", "Just a body\n")
    fm.update_file(tmp_path / "a.md", tmp_path, set_props={"title": "t"})
    reparsed = fm.parse_file(tmp_path / "a.md", tmp_path)
    assert reparsed.metadata == {"title": "t"}
    assert "Just a body" in reparsed.body


def test_resolve_path_escape_rejected(tmp_path):
    write(tmp_path / "a.md", "x")
    with pytest.raises(ValueError, match="escapes"):
        fm.resolve_path(tmp_path, "../outside.md")
    with pytest.raises(FileNotFoundError):
        fm.resolve_path(tmp_path, "missing.md")
    assert fm.resolve_path(tmp_path, "a.md").name == "a.md"


def test_dump_round_trip_preserves_key_order(tmp_path):
    meta = {"z": 1, "a": 2, "m": [1, 2]}
    text = fm.dump_document(meta, "Body\n")
    doc = fm.parse_document(text)
    assert doc["metadata"] == meta
    assert list(doc["metadata"]) == ["z", "a", "m"]
