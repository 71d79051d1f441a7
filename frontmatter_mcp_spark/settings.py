"""Application settings loaded from environment variables.

Mirrors the reference's pydantic-settings layer (reference
settings.py:12-51) without the pydantic dependency: the same four
FRONTMATTER_* variables, the same derived properties (resolved
``base_dir`` that must exist, ``cache_dir`` defaulting under the vault),
and the same cached-singleton accessor the DI layer exposes (reference
dependencies.py:19-46). ``FrontmatterEngine.from_settings`` consumes
this, so the engine is constructible from the environment alone, exactly
like the reference server process.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path

DEFAULT_CACHE_DIR_NAME = ".frontmatter-mcp"
DEFAULT_EMBEDDING_MODEL = "cl-nagoya/ruri-v3-30m"

_TRUE_VALUES = {"1", "true", "yes", "on", "t", "y"}
_FALSE_VALUES = {"0", "false", "no", "off", "f", "n", ""}


def _parse_bool(raw: str, var: str) -> bool:
    lowered = raw.strip().lower()
    if lowered in _TRUE_VALUES:
        return True
    if lowered in _FALSE_VALUES:
        return False
    raise ValueError(f"{var}: cannot parse {raw!r} as a boolean")


@dataclass(frozen=True)
class Settings:
    """Application settings (reference settings.py:12-51)."""

    frontmatter_base_dir: Path
    frontmatter_enable_semantic: bool = False
    frontmatter_embedding_model: str = DEFAULT_EMBEDDING_MODEL
    frontmatter_cache_dir: Path | None = None
    # Spark-side extension (not in the reference, which collects every
    # result into its process): cap on rows returned by the query tool.
    # None preserves the reference contract exactly.
    frontmatter_max_rows: int | None = None

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "Settings":
        env = os.environ if env is None else env
        base = env.get("FRONTMATTER_BASE_DIR")
        if not base:
            raise ValueError("FRONTMATTER_BASE_DIR environment variable is required")
        cache = env.get("FRONTMATTER_CACHE_DIR")
        max_rows_raw = env.get("FRONTMATTER_MAX_ROWS", "").strip()
        if max_rows_raw:
            try:
                max_rows = int(max_rows_raw)
            except ValueError:
                raise ValueError(
                    f"FRONTMATTER_MAX_ROWS: cannot parse {max_rows_raw!r} as an integer"
                ) from None
        else:
            max_rows = None
        return cls(
            frontmatter_base_dir=Path(base),
            frontmatter_enable_semantic=_parse_bool(
                env.get("FRONTMATTER_ENABLE_SEMANTIC", "false"),
                "FRONTMATTER_ENABLE_SEMANTIC",
            ),
            frontmatter_embedding_model=env.get(
                "FRONTMATTER_EMBEDDING_MODEL", DEFAULT_EMBEDDING_MODEL
            ),
            frontmatter_cache_dir=Path(cache) if cache else None,
            frontmatter_max_rows=max_rows,
        )

    @property
    def base_dir(self) -> Path:
        """Base directory for markdown files; must exist (reference
        settings.py:24-29)."""
        base_dir = self.frontmatter_base_dir.resolve()
        if not base_dir.is_dir():
            raise RuntimeError(f"Base directory does not exist: {base_dir}")
        return base_dir

    @property
    def enable_semantic(self) -> bool:
        return self.frontmatter_enable_semantic

    @property
    def embedding_model(self) -> str:
        return self.frontmatter_embedding_model

    @property
    def max_rows(self) -> int | None:
        return self.frontmatter_max_rows

    @property
    def cache_dir(self) -> Path:
        """Cache directory for the embedding store (reference
        settings.py:41-46)."""
        if self.frontmatter_cache_dir:
            return self.frontmatter_cache_dir
        return self.base_dir / DEFAULT_CACHE_DIR_NAME


_settings_cache: Settings | None = None


def get_settings() -> Settings:
    """Cached settings singleton (reference dependencies.py:20-26)."""
    global _settings_cache
    if _settings_cache is None:
        _settings_cache = Settings.from_env()
    return _settings_cache


def reset_settings() -> None:
    """Reset the singleton — test hook (reference dependencies.py:50-55)."""
    global _settings_cache
    _settings_cache = None
