"""JSONL document source/sink — the interchange analog of the
reference's JSON document store (ccrawler kept pages as MongoDB
documents; SURVEY.md §0.1 — reconstructed [B]): newline-delimited
JSON with one document object per line, readable by any tool.

The sink shards output (one file per input block) so a re-run can
resume per shard; the source reads the shard directory back as a
streaming Dataset and casts to the canonical documents schema — JSON
carries no type information, so the cast is explicit and validated.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ccrawler_ray.scale import read_docs

DOC_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
    ("n_chars", pa.int64()),
])


def write_docs_jsonl(ds: "ray.data.Dataset", out_dir: str) -> None:
    """Shard the documents Dataset to ``out_dir`` as JSONL, one file
    per block (resumable: finished shards can be skipped)."""
    ds.write_json(out_dir)


def read_docs_jsonl(path: str) -> "ray.data.Dataset":
    """Read a JSONL shard directory back as a documents Dataset with
    the canonical column order and types."""

    def cast(t: pa.Table) -> pa.Table:
        if not t.num_rows:    # zero-row blocks can carry empty schemas
            return DOC_SCHEMA.empty_table()
        cols = [t.column(f.name).cast(f.type) for f in DOC_SCHEMA]
        return pa.Table.from_arrays(cols, schema=DOC_SCHEMA)

    return ray.data.read_json(path).map_batches(cast, batch_format="pyarrow")


def io_jsonl_roundtrip(sf_dir: str):
    """(lang, n_docs, sum_chars): documents → JSONL shards under /tmp
    → read back → rollup. Exercises the full sink+source path; the
    rollup equals the same aggregate over the original parquet, which
    is the SQL oracle."""
    import hashlib
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from ray.data.aggregate import Count, Sum

    docs = read_docs(sf_dir)
    key = hashlib.blake2b(f"{sf_dir}|{os.getpid()}".encode(),
                          digest_size=6).hexdigest()
    from ccrawler_ray.scale import prune_scratch
    prune_scratch()
    out = Path(tempfile.gettempdir()) / f"ccrawler_ray_jsonl_{key}"
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    write_docs_jsonl(docs, str(out))
    back = read_docs_jsonl(str(out))
    return back.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))
