"""CSV document source/sink — the flat-file interchange path next to
the JSONL one (`sources/jsonl.py`). The reference kept documents in a
JSON document store (SURVEY.md §0.1 — reconstructed [B]); CSV is the
other format every downstream tool reads, so the engine offers both.

Same contract as the JSONL pair: the sink shards output (one file per
input block, resumable per shard); the source reads the shard
directory back as a streaming Dataset with an explicit, validated
cast — CSV carries no type information, so every column type is
declared on read rather than inferred. Text cells are quoted by the
Arrow writer as needed and the reader accepts quoted embedded
newlines, so arbitrary document text round-trips.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data

from ccrawler_ray.scale import read_docs

from ccrawler_ray.sources.jsonl import DOC_SCHEMA


def write_docs_csv(ds: "ray.data.Dataset", out_dir: str) -> None:
    """Shard the documents Dataset to ``out_dir`` as CSV, one file per
    block (resumable: finished shards can be skipped on a re-run)."""
    ds.write_csv(out_dir)


def read_docs_csv(path: str) -> "ray.data.Dataset":
    """Read a CSV shard directory back as a documents Dataset.

    Types are DECLARED (`convert_options.column_types`), never
    inferred — a shard whose sampled rows happen to look numeric must
    not change the schema. ``strings_can_be_null=False`` keeps empty
    text cells as ``""`` (the parquet source has no null text), and
    ``newlines_in_values`` lets quoted text cells span lines.
    """
    column_types = {f.name: f.type for f in DOC_SCHEMA}
    ds = ray.data.read_csv(
        path,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=pacsv.ConvertOptions(column_types=column_types,
                                             strings_can_be_null=False),
    )

    def cast(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return DOC_SCHEMA.empty_table()
        cols = [t.column(f.name).cast(f.type) for f in DOC_SCHEMA]
        return pa.Table.from_arrays(cols, schema=DOC_SCHEMA)

    return ds.map_batches(cast, batch_format="pyarrow")


def io_csv_roundtrip(sf_dir: str):
    """(source, n_docs, sum_chars, min_doc, max_doc): documents → CSV
    shards under /tmp → read back → rollup by source. Exercises the
    full sink+source path; the rollup equals the same aggregate over
    the original parquet, which is the SQL oracle."""
    import hashlib
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from ray.data.aggregate import Count, Max, Min, Sum

    docs = read_docs(sf_dir)
    # pid in the key: two concurrent sessions (bench + pytest) on the
    # same fixture must not rmtree each other's scratch dir mid-read
    key = hashlib.blake2b(f"{sf_dir}|{os.getpid()}".encode(),
                          digest_size=6).hexdigest()
    from ccrawler_ray.scale import prune_scratch
    prune_scratch()
    out = Path(tempfile.gettempdir()) / f"ccrawler_ray_csv_{key}"
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    write_docs_csv(docs, str(out))
    back = read_docs_csv(str(out))
    return back.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
        Min("doc_id", alias_name="min_doc"),
        Max("doc_id", alias_name="max_doc"),
    )
