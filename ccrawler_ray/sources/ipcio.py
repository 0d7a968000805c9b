"""Arrow IPC (Feather v2) document source/sink — the third interchange
format beside JSONL (`sources/jsonl.py`) and CSV (`sources/csvio.py`).

Ray Data has no built-in IPC reader/writer, so this module is the
custom-datasource demonstration: the sink shards the Dataset to one
``.arrow`` file per input block via per-block remote tasks (written
``.tmp`` + atomic rename, so a re-run skips finished shards — the same
resumability contract as the partitioned parquet sink), and the source
streams the shard directory back through ``read_binary_files`` +
``pyarrow.ipc`` decode inside ``map_batches`` (the file bytes travel
as one Arrow binary cell; decode is zero-copy over that buffer).

IPC preserves Arrow types exactly — unlike CSV there is no declared
cast on read, only a schema CHECK: a shard whose embedded schema
drifted from ``DOC_SCHEMA`` fails loudly instead of silently casting.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray
import ray.data

from ccrawler_ray.scale import read_docs
from ccrawler_ray.sources.jsonl import DOC_SCHEMA


@ray.remote
def _write_shard(block, path: str) -> int:
    """Write one block as an IPC file — atomic: tmp + rename. A shard
    that already exists is a finished write from a previous run and is
    kept (resume skips it)."""
    if os.path.exists(path):
        return 0
    t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(
        block, preserve_index=False)
    t = t.select([f.name for f in DOC_SCHEMA]).cast(DOC_SCHEMA)
    tmp = f"{path}.tmp.{os.getpid()}"
    with pa.OSFile(tmp, "wb") as f:
        with pa.ipc.new_file(f, DOC_SCHEMA) as w:
            w.write_table(t)
    os.replace(tmp, path)
    return t.num_rows


def write_docs_ipc(ds: "ray.data.Dataset", out_dir: str) -> int:
    """Shard ``ds`` to ``out_dir`` as Arrow IPC files, one per block.

    Shard names are the block INDEX (stable for a deterministic
    pipeline re-run over the same input), and each write is
    tmp+rename-atomic, so a rerun after a partial failure rewrites
    only the missing shards. Block refs are consumed from the
    materialized Dataset — bytes never pass through the driver."""
    os.makedirs(out_dir, exist_ok=True)
    mat = ds.materialize()
    writes = []
    i = 0
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if not meta.num_rows:
                continue
            path = os.path.join(out_dir, f"shard-{i:05d}.arrow")
            writes.append(_write_shard.remote(ref, path))
            i += 1
    return int(sum(ray.get(writes)))


def read_docs_ipc(path: str) -> "ray.data.Dataset":
    """Read an IPC shard directory back as a streaming documents
    Dataset. Each file decodes inside ``map_batches`` (per-worker,
    zero-copy over the file-bytes buffer); the embedded schema is
    CHECKED against ``DOC_SCHEMA`` — IPC carries exact types, so any
    mismatch is corruption, not a cast opportunity."""
    files = ray.data.read_binary_files(path, file_extensions=["arrow"])

    def decode(t: pa.Table) -> pa.Table:
        tabs = []
        for buf in t.column("bytes"):
            r = pa.ipc.open_file(pa.BufferReader(buf.as_buffer()))
            tab = r.read_all()
            if tab.schema != DOC_SCHEMA:
                raise ValueError(
                    f"IPC shard schema drift: {tab.schema} != DOC_SCHEMA")
            tabs.append(tab)
        return (pa.concat_tables(tabs) if tabs
                else DOC_SCHEMA.empty_table())

    return files.map_batches(decode, batch_format="pyarrow")


def io_ipc_roundtrip(sf_dir: str):
    """(lang, n_docs, sum_chars, min_doc, max_doc): documents → IPC
    shards under /tmp → read back → rollup by lang. The rollup equals
    the same aggregate over the original parquet (the SQL oracle), and
    the second write pass over the already-committed directory must
    write 0 rows — the resume contract, asserted in-query."""
    import hashlib
    import shutil
    import tempfile
    from pathlib import Path

    from ray.data.aggregate import Count, Max, Min, Sum

    docs = read_docs(sf_dir)
    # pid in the key: concurrent sessions must not rmtree each other
    key = hashlib.blake2b(f"{sf_dir}|{os.getpid()}".encode(),
                          digest_size=6).hexdigest()
    from ccrawler_ray.scale import prune_scratch
    prune_scratch()
    out = Path(tempfile.gettempdir()) / f"ccrawler_ray_ipc_{key}"
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    n = write_docs_ipc(docs, str(out))
    again = write_docs_ipc(read_docs(sf_dir), str(out))
    if n <= 0 or again != 0:
        raise AssertionError(
            f"IPC sink resume contract violated: first={n} rerun={again}")
    back = read_docs_ipc(str(out))
    return back.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
        Min("doc_id", alias_name="min_doc"),
        Max("doc_id", alias_name="max_doc"),
    )
