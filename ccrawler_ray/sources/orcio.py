"""ORC document source/sink — the columnar-interchange format beside
Parquet, JSONL (`sources/jsonl.py`), CSV (`sources/csvio.py`) and
Arrow IPC (`sources/ipcio.py`). Hive/Trino warehouses still hand data
over as ORC, so the engine reads and writes it.

Ray Data has no built-in ORC reader/writer; same custom-datasource
shape as the IPC pair: the sink shards the Dataset to one ``.orc``
file per input block via per-block remote tasks (written ``.tmp`` +
atomic rename — a re-run skips finished shards, the resumability
contract shared with the partitioned parquet sink), and the source
streams the shard directory back through ``read_binary_files`` +
``pyarrow.orc`` decode inside ``map_batches``.

ORC's type system is close to Arrow's but not identical (it has no
distinction between ``string`` and ``large_string``, and nullability
is not round-tripped), so the source applies a DECLARED cast to
``DOC_SCHEMA`` — like the CSV reader, never schema inference.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray
import ray.data

from ccrawler_ray.scale import read_docs
from ccrawler_ray.sources.jsonl import DOC_SCHEMA


@ray.remote
def _write_shard_orc(block, path: str) -> int:
    """Write one block as an ORC file — atomic: tmp + rename. A shard
    that already exists is a finished write from a previous run and is
    kept (resume skips it)."""
    import pyarrow.orc as po

    if os.path.exists(path):
        return 0
    t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(
        block, preserve_index=False)
    t = t.select([f.name for f in DOC_SCHEMA]).cast(DOC_SCHEMA)
    tmp = f"{path}.tmp.{os.getpid()}"
    po.write_table(t, tmp, compression="zstd")
    os.replace(tmp, path)
    return t.num_rows


def write_docs_orc(ds: "ray.data.Dataset", out_dir: str) -> int:
    """Shard ``ds`` to ``out_dir`` as ORC files, one per block.

    Shard names are the block INDEX (stable for a deterministic
    pipeline re-run over the same input); each write is
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
            path = os.path.join(out_dir, f"shard-{i:05d}.orc")
            writes.append(_write_shard_orc.remote(ref, path))
            i += 1
    return int(sum(ray.get(writes)))


def read_docs_orc(path: str) -> "ray.data.Dataset":
    """Read an ORC shard directory back as a streaming documents
    Dataset. Each file decodes inside ``map_batches`` (per-worker,
    over the file-bytes buffer); the decoded table is CAST to
    ``DOC_SCHEMA`` — ORC's looser type system (string width,
    nullability) makes this the declared-cast path, not a check."""
    files = ray.data.read_binary_files(path, file_extensions=["orc"])

    def decode(t: pa.Table) -> pa.Table:
        import pyarrow.orc as po

        tabs = []
        for buf in t.column("bytes"):
            tab = po.ORCFile(pa.BufferReader(buf.as_buffer())).read()
            tabs.append(tab.select([f.name for f in DOC_SCHEMA])
                        .cast(DOC_SCHEMA))
        return (pa.concat_tables(tabs) if tabs
                else DOC_SCHEMA.empty_table())

    return files.map_batches(decode, batch_format="pyarrow")


def io_orc_roundtrip(sf_dir: str):
    """(lang, source, n_docs, sum_chars, max_doc): documents → ORC
    shards under /tmp → read back → rollup by (lang, source). The
    rollup equals the same aggregate over the original parquet (the
    SQL oracle), and the second write pass over the already-committed
    directory must write 0 rows — the resume contract, asserted
    in-query."""
    import hashlib
    import shutil
    import tempfile
    from pathlib import Path

    from ray.data.aggregate import Count, Max, Sum

    docs = read_docs(sf_dir)
    # pid in the key: concurrent sessions must not rmtree each other
    key = hashlib.blake2b(f"{sf_dir}|{os.getpid()}".encode(),
                          digest_size=6).hexdigest()
    from ccrawler_ray.scale import prune_scratch
    prune_scratch()
    out = Path(tempfile.gettempdir()) / f"ccrawler_ray_orc_{key}"
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    n = write_docs_orc(docs, str(out))
    again = write_docs_orc(read_docs(sf_dir), str(out))
    if n <= 0 or again != 0:
        raise AssertionError(
            f"ORC sink resume contract violated: first={n} rerun={again}")
    back = read_docs_orc(str(out))
    return back.groupby(["lang", "source"]).aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
        Max("doc_id", alias_name="max_doc"),
    )
