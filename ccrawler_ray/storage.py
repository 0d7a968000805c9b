"""Storage seam: Lance-style dataset directories on a Parquet backend.

``north_rule`` names Lance tables; no lance wheel exists on this sealed
image (SURVEY.md §0.3), so every call site goes through this seam: a
*dataset directory* of fragment files plus a JSON manifest written
last (write-temp + atomic rename). The Lance backend is a drop-in
replacement when the wheel exists — checkpoint/resume semantics are
defined on the manifest, not the file format.

Checkpoint layout (SURVEY.md §4.5):
    <root>/gen=N/frontier/*.parquet
    <root>/gen=N/seen/shard=K.parquet
    <root>/gen=N/domain_state/part=K.parquet
    <root>/gen=N/docs_out/*.parquet
    <root>/gen=N/metrics.parquet
    <root>/gen=N/MANIFEST.json          # written LAST → marks gen valid
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

BACKEND = "parquet"  # | "lance" (when the wheel exists)

MANIFEST_NAME = "MANIFEST.json"


def write_table(table: pa.Table, path: str | Path) -> None:
    """Atomic single-file write (temp + rename)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def write_bytes(data: bytes, path: str | Path) -> None:
    """Atomic single-file binary write (temp + rename) — filter
    snapshots in approx seen-membership mode."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    os.replace(tmp, path)


def read_bytes(path: str | Path) -> bytes:
    return Path(path).read_bytes()


def read_table(path: str | Path) -> pa.Table:
    return pq.read_table(path)


def write_manifest(gen_dir: str | Path, manifest: dict) -> None:
    """Written LAST: its presence marks the checkpoint generation valid."""
    gen_dir = Path(gen_dir)
    gen_dir.mkdir(parents=True, exist_ok=True)
    tmp = gen_dir / (MANIFEST_NAME + ".tmp")
    tmp.write_text(json.dumps(manifest, indent=1, sort_keys=True))
    os.replace(tmp, gen_dir / MANIFEST_NAME)


def read_manifest(gen_dir: str | Path) -> dict | None:
    p = Path(gen_dir) / MANIFEST_NAME
    if not p.exists():
        return None
    return json.loads(p.read_text())


def latest_valid_generation(root: str | Path) -> int | None:
    """Highest gen=N directory with a manifest AND intact state dumps
    (generations whose state was GC'd are outputs-only, not resumable)."""
    root = Path(root)
    if not root.exists():
        return None
    gens = []
    for d in root.iterdir():
        if d.is_dir() and d.name.startswith("gen=") and (d / MANIFEST_NAME).exists():
            man = read_manifest(d) or {}
            if not man.get("state_gc"):
                gens.append(int(d.name.split("=", 1)[1]))
    return max(gens) if gens else None


def clear_generation(root: str | Path, generation: int) -> None:
    """Remove a partial (manifest-less or superseded) generation dir."""
    d = Path(root) / f"gen={generation}"
    if d.exists():
        shutil.rmtree(d)


STATE_DIRS = ("frontier", "seen", "domain_state")


def gc_checkpoints(root: str | Path, keep_last: int = 2) -> list[int]:
    """Retention for long crawls: drop the heavy STATE dumps (frontier/
    seen/domain_state) of all but the newest ``keep_last`` valid
    generations; partial (manifest-less) dirs are removed entirely.
    docs_out / crawl_order / metrics / manifest are OUTPUT data and are
    kept for every generation (resume needs only the latest state but
    all outputs). Returns the generations whose state was collected."""
    root = Path(root)
    if not root.exists():
        return []
    valid: list[int] = []
    touched: list[int] = []
    for d in root.iterdir():
        if not (d.is_dir() and d.name.startswith("gen=")):
            continue
        g = int(d.name.split("=", 1)[1])
        if (d / MANIFEST_NAME).exists():
            valid.append(g)
        else:
            shutil.rmtree(d)
            touched.append(g)
    for g in sorted(valid)[:-keep_last] if keep_last else sorted(valid):
        gen_dir = root / f"gen={g}"
        changed = False
        for sub in STATE_DIRS:
            if (gen_dir / sub).exists():
                shutil.rmtree(gen_dir / sub)
                changed = True
        if changed:
            man = read_manifest(gen_dir) or {}
            man["state_gc"] = True
            write_manifest(gen_dir, man)
            touched.append(g)
    return sorted(touched)


def dataset_files(dir_path: str | Path) -> list[str]:
    d = Path(dir_path)
    if not d.exists():
        return []
    return sorted(str(p) for p in d.rglob("*.parquet"))
