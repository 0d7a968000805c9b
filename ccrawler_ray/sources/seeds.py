"""S1 — seed-list reader: text/JSON-lines seed files → ordered seed
URLs. Order matters (it defines seed ord_keys), so the read preserves
file order (``preserve_order`` on the read context; a single seed file
is one block, so order is stable by construction)."""

from __future__ import annotations

import json
from pathlib import Path


def read_seed_file(path: str | Path) -> tuple[str, ...]:
    """One URL per line, or JSON lines ({"url": ...}), or a JSON array.
    Blank lines and '#' comments skipped. Order preserved."""
    text = Path(path).read_text()
    stripped = text.lstrip()
    if stripped.startswith("["):
        return tuple(json.loads(text))
    seeds: list[str] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("{"):
            seeds.append(json.loads(line)["url"])
        else:
            seeds.append(line)
    return tuple(seeds)


def read_seeds_ds(path: str | Path) -> tuple[str, ...]:
    """Ray Data variant for very large seed lists: read_text with
    preserved order → frontier candidate rows. Falls back to the local
    reader for single files (same result, no cluster round-trip)."""
    import ray.data
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        ds = ray.data.read_text(str(path))
        urls = [
            r["text"].strip()
            for r in ds.iter_rows()
            if r["text"].strip() and not r["text"].startswith("#")
        ]
        return tuple(urls)
    finally:
        ctx.execution_options.preserve_order = prev
