"""Span-level operators over the INTERLEAVED corpus — the
list<struct<kind,text,media_ref,offset>> payload the engine crawls
(BASELINE.json input_hint). The explode is zero-copy Arrow offsets
math (pyarrow list_flatten / list_value_length), never Python rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_BLOCK_ROWS = 512


def corpus_dataset(sf_dir: str) -> "ray.data.Dataset":
    """The deterministic interleaved corpus as a Dataset, sliced into
    blocks on the driver (map parallelism == block count)."""
    from ccrawler_ray.sources.corpus import corpus_from_documents

    t = corpus_from_documents(f"{sf_dir}/documents.parquet")
    return ray.data.from_arrow(
        [t.slice(o, _BLOCK_ROWS) for o in range(0, t.num_rows, _BLOCK_ROWS)])


def spans_rollup(sf_dir: str):
    """(kind, n_spans, n_docs, sum_text_len, n_media_refs): per span
    kind across the interleaved corpus. Per-batch partials (docs never
    span batches, so per-batch distinct docs sum to the global count);
    the shuffle moves one row per (block, kind)."""
    from ray.data.aggregate import Sum

    ds = corpus_dataset(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        lens = pc.list_value_length(spans).to_numpy().astype(np.int64)
        kind = np.asarray(flat.field("kind").to_pylist(), dtype=object)
        tlen = pc.utf8_length(flat.field("text")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        has_ref = (pc.utf8_length(flat.field("media_ref"))
                   .to_numpy(zero_copy_only=False) > 0)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        kinds, inv = np.unique(kind, return_inverse=True)
        n_spans = np.bincount(inv, minlength=len(kinds)).astype(np.int64)
        sum_len = np.zeros(len(kinds), dtype=np.int64)
        np.add.at(sum_len, inv, tlen)
        n_refs = np.zeros(len(kinds), dtype=np.int64)
        np.add.at(n_refs, inv, has_ref.astype(np.int64))
        # distinct docs per kind within the batch
        dk = np.unique(doc_idx * np.int64(len(kinds)) + inv)
        n_docs = np.bincount((dk % len(kinds)).astype(np.int64),
                             minlength=len(kinds)).astype(np.int64)
        return pa.table({"kind": pa.array(list(kinds), pa.string()),
                         "n_spans": pa.array(n_spans),
                         "n_docs": pa.array(n_docs),
                         "sum_text_len": pa.array(sum_len),
                         "n_media_refs": pa.array(n_refs)})

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "kind").aggregate(Sum("n_spans", alias_name="n_spans"),
                          Sum("n_docs", alias_name="n_docs"),
                          Sum("sum_text_len", alias_name="sum_text_len"),
                          Sum("n_media_refs", alias_name="n_media_refs"))
