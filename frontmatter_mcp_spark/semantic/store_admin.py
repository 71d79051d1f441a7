"""Maintenance CLI for the embedding store.

The store's scheduled deletions run only at commit time, so a store
whose writers stopped (or whose operator lowered ``retention_commits``
after the fact) holds reclaimable space until someone runs maintenance.
This is that someone:

    python -m frontmatter_mcp_spark.semantic.store_admin status  STORE_DIR
    python -m frontmatter_mcp_spark.semantic.store_admin vacuum  STORE_DIR [--retention-commits N]
    python -m frontmatter_mcp_spark.semantic.store_admin compact STORE_DIR [--max-live-gens N] [--retention-commits N]

Each command prints ONE JSON line (machine-consumable, cron-friendly).
``status`` is read-only (manifest/metadata inspection — no Spark, no
recovery pass); ``vacuum`` is filesystem-only (no Spark session);
``compact`` builds a local Spark session because it rewrites bucket
parquet. The model name and dimension are read from the store's own
``metadata.json`` — never passed on the command line — so a typo cannot
trigger the model-change invalidation wipe.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _load_meta(store_dir: Path) -> dict:
    meta_path = store_dir / "metadata.json"
    if not meta_path.exists():
        raise SystemExit(
            f"error: {store_dir} is not an embedding store "
            f"(missing {meta_path.name})"
        )
    return json.loads(meta_path.read_text())


def _open_store(store_dir: Path, retention_commits: int, spark=None):
    from frontmatter_mcp_spark.semantic.store import EmbeddingStore

    meta = _load_meta(store_dir)
    return EmbeddingStore(
        spark,
        store_dir,
        model_name=meta["model"],
        dim=meta["dim"],
        retention_commits=retention_commits,
    )


def _status(store_dir: Path) -> dict:
    """Read-only: manifest + metadata + on-disk shape, no store instance
    (instantiating would run the recovery pass and rewrite metadata)."""
    meta = _load_meta(store_dir)
    try:
        manifest = json.loads((store_dir / "manifest.json").read_text())
    except (OSError, ValueError):
        manifest = {"gen": 0, "buckets": {}, "retired": []}
    data_dir = store_dir / "embeddings.parquet"
    on_disk_gens = (
        sorted(d.name for d in data_dir.glob("gen-*")) if data_dir.exists() else []
    )
    history = store_dir / "manifests"
    return {
        "model": meta["model"],
        "dim": meta["dim"],
        "generation": int(manifest["gen"]),
        "live_buckets": len(manifest["buckets"]),
        "live_generations": sorted(set(manifest["buckets"].values())),
        "retired_bucket_dirs": len(manifest["retired"]),
        "on_disk_generation_dirs": len(on_disk_gens),
        "history_snapshots": len(list(history.glob("manifest-*.json")))
        if history.exists()
        else 0,
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="store_admin", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("status", help="read-only store summary")
    sp.add_argument("store_dir", type=Path)

    vp = sub.add_parser("vacuum", help="prune retirements past retention now")
    vp.add_argument("store_dir", type=Path)
    vp.add_argument("--retention-commits", type=int, default=1)

    cp = sub.add_parser("compact", help="fold old-generation buckets together")
    cp.add_argument("store_dir", type=Path)
    cp.add_argument("--max-live-gens", type=int, default=None)
    cp.add_argument("--retention-commits", type=int, default=1)

    args = p.parse_args(argv)

    if args.cmd == "status":
        out = {"cmd": "status", **_status(args.store_dir)}
    elif args.cmd == "vacuum":
        store = _open_store(args.store_dir, args.retention_commits)
        removed = store.vacuum()
        out = {
            "cmd": "vacuum",
            "removed_bucket_dirs": removed,
            **_status(args.store_dir),
        }
    else:  # compact
        from frontmatter_mcp_spark.session import get_spark

        spark = get_spark(app_name="store_admin")
        store = _open_store(args.store_dir, args.retention_commits, spark=spark)
        ran = store.compact(max_live_gens=args.max_live_gens)
        out = {"cmd": "compact", "compacted": ran, **_status(args.store_dir)}

    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
