"""Env-var settings layer (reference settings.py:12-51,
dependencies.py:19-46; test shapes from reference tests/test_settings.py)."""

from __future__ import annotations

import pytest

from frontmatter_mcp_spark.settings import (
    DEFAULT_EMBEDDING_MODEL,
    Settings,
    get_settings,
    reset_settings,
)


def test_base_dir_required():
    with pytest.raises(ValueError, match="FRONTMATTER_BASE_DIR"):
        Settings.from_env({})


def test_defaults_and_derived(tmp_path):
    s = Settings.from_env({"FRONTMATTER_BASE_DIR": str(tmp_path)})
    assert s.base_dir == tmp_path.resolve()
    assert s.enable_semantic is False
    assert s.embedding_model == DEFAULT_EMBEDDING_MODEL
    assert s.cache_dir == tmp_path.resolve() / ".frontmatter-mcp"


def test_missing_base_dir_raises(tmp_path):
    s = Settings.from_env({"FRONTMATTER_BASE_DIR": str(tmp_path / "nope")})
    with pytest.raises(RuntimeError, match="does not exist"):
        _ = s.base_dir


def test_overrides(tmp_path):
    s = Settings.from_env(
        {
            "FRONTMATTER_BASE_DIR": str(tmp_path),
            "FRONTMATTER_ENABLE_SEMANTIC": "true",
            "FRONTMATTER_EMBEDDING_MODEL": "custom/model",
            "FRONTMATTER_CACHE_DIR": str(tmp_path / "cache"),
        }
    )
    assert s.enable_semantic is True
    assert s.embedding_model == "custom/model"
    assert s.cache_dir == tmp_path / "cache"


@pytest.mark.parametrize(
    ("raw", "expected"),
    [("1", True), ("YES", True), ("on", True), ("0", False), ("False", False), ("", False)],
)
def test_bool_parsing(tmp_path, raw, expected):
    s = Settings.from_env(
        {"FRONTMATTER_BASE_DIR": str(tmp_path), "FRONTMATTER_ENABLE_SEMANTIC": raw}
    )
    assert s.enable_semantic is expected


def test_bool_parse_garbage_rejected(tmp_path):
    with pytest.raises(ValueError, match="cannot parse"):
        Settings.from_env(
            {"FRONTMATTER_BASE_DIR": str(tmp_path), "FRONTMATTER_ENABLE_SEMANTIC": "maybe"}
        )


def test_max_rows_garbage_names_the_var(tmp_path):
    with pytest.raises(ValueError, match="FRONTMATTER_MAX_ROWS.*'lots'"):
        Settings.from_env(
            {"FRONTMATTER_BASE_DIR": str(tmp_path), "FRONTMATTER_MAX_ROWS": "lots"}
        )


def test_singleton_reads_process_env(tmp_path, monkeypatch):
    monkeypatch.setenv("FRONTMATTER_BASE_DIR", str(tmp_path))
    reset_settings()
    try:
        assert get_settings() is get_settings()
        assert get_settings().base_dir == tmp_path.resolve()
    finally:
        reset_settings()


def test_engine_constructible_from_env_alone(spark, tmp_path, monkeypatch):
    """A27 parity: the reference server builds its whole tool surface
    from FRONTMATTER_* env vars; from_settings is the same path."""
    from frontmatter_mcp_spark.engine import FrontmatterEngine

    (tmp_path / "a.md").write_text("---\ntitle: via-env\n---\nBody\n")
    monkeypatch.setenv("FRONTMATTER_BASE_DIR", str(tmp_path))
    reset_settings()
    try:
        eng = FrontmatterEngine.from_settings(spark)
        out = eng.query("*.md", "SELECT title FROM files")
        assert out["results"] == [{"title": "via-env"}]
        assert eng.semantic_enabled is False
    finally:
        reset_settings()


def test_engine_semantic_from_env(spark, tmp_path, monkeypatch):
    from frontmatter_mcp_spark.engine import FrontmatterEngine

    (tmp_path / "a.md").write_text("---\ntitle: t\n---\nSome body\n")
    monkeypatch.setenv("FRONTMATTER_BASE_DIR", str(tmp_path))
    monkeypatch.setenv("FRONTMATTER_ENABLE_SEMANTIC", "1")
    monkeypatch.setenv("FRONTMATTER_CACHE_DIR", str(tmp_path / ".cache"))
    reset_settings()
    try:
        eng = FrontmatterEngine.from_settings(spark)
        assert eng.semantic_enabled is True
        assert eng.indexer is not None
        assert eng.store is not None
        assert eng.store.store_dir == tmp_path / ".cache"
    finally:
        reset_settings()


def test_direct_and_env_construction_agree_on_default_cache_dir(
    spark, tmp_path, monkeypatch
):
    """VERDICT r07 nit: Engine(cache_dir=None) and from_settings() must
    default the semantic cache to the SAME directory name — the
    reference's `.frontmatter-mcp` (reference settings.py:8), shared
    via settings.DEFAULT_CACHE_DIR_NAME."""
    from frontmatter_mcp_spark.engine import FrontmatterEngine
    from frontmatter_mcp_spark.settings import DEFAULT_CACHE_DIR_NAME

    (tmp_path / "a.md").write_text("---\ntitle: t\n---\nbody\n")
    direct = FrontmatterEngine(spark, tmp_path, semantic=True)

    monkeypatch.setenv("FRONTMATTER_BASE_DIR", str(tmp_path))
    monkeypatch.setenv("FRONTMATTER_ENABLE_SEMANTIC", "1")
    monkeypatch.delenv("FRONTMATTER_CACHE_DIR", raising=False)
    reset_settings()
    try:
        from_env = FrontmatterEngine.from_settings(spark)
        assert DEFAULT_CACHE_DIR_NAME == ".frontmatter-mcp"
        assert direct.store.store_dir == from_env.store.store_dir
    finally:
        reset_settings()
