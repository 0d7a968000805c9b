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


def spans_line_dedup(sf_dir: str):
    """(doc_id, n_spans, n_kept, n_dropped): C4-style SPAN-level exact
    dedup over the interleaved corpus — a text span is DROPPED when an
    identical text occurred earlier in global (doc_id, span_idx) order
    (lexicographic doc_id); the first occurrence is kept. Docs with no
    nonempty text span emit no row.

    Distributed shape: Arrow explode (offsets math, hash per span via
    the frozen blake2b-8 formula shared with the serial mirror) → ONE
    coarse-salted shuffle on ``hash % k`` — every span of a given text
    lands in one group, so the winner rule is decided locally by a
    single lexsort — → per-(group, doc) drop/count PARTIALS (each span
    is in exactly one hash group, so the partial span counts sum to
    the per-doc totals; no separate counting pass over the corpus) →
    salted per-doc sum. Only hashes and doc keys cross the shuffles;
    span text never leaves its explode task.
    """
    from ccrawler_ray.functions.dedup import word_hashes
    from ccrawler_ray.scale import coarse_salt_k

    salt_k = coarse_salt_k()  # pinned on the driver: every row must agree
    ds = corpus_dataset(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        lens = pc.list_value_length(spans).to_numpy().astype(np.int64)
        is_text = pc.and_(
            pc.equal(flat.field("kind"), "text"),
            pc.greater(pc.utf8_length(flat.field("text")), 0),
        ).to_numpy(zero_copy_only=False)
        doc_all = np.repeat(np.arange(len(lens)), lens)
        keep = np.nonzero(is_text)[0]
        if not len(keep):
            return pa.schema([("h", pa.uint64()), ("doc_id", pa.string()),
                              ("span_idx", pa.int64()),
                              ("h_salt", pa.int32())]).empty_table()
        dk = doc_all[keep]
        # span_idx = rank among the doc's qualifying spans (dk is
        # non-decreasing, so a segment-reset arange is one subtract)
        starts = np.r_[0, np.cumsum(np.bincount(dk, minlength=len(lens)))[:-1]]
        span_idx = np.arange(len(dk)) - starts[dk]
        h = word_hashes(
            flat.field("text").take(pa.array(keep)).to_pylist())
        dids = batch.column("doc_id").take(pa.array(dk))
        return pa.table({
            "h": pa.array(h),
            "doc_id": dids,
            "span_idx": pa.array(span_idx.astype(np.int64)),
            "h_salt": pa.array((h % np.uint64(salt_k)).astype(np.int32)),
        })

    part_fields = [("doc_id", pa.string()), ("n_spans", pa.int64()),
                   ("n_dropped", pa.int64())]

    def per_hash_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(part_fields).empty_table()
        h = t.column("h").to_numpy(zero_copy_only=False)
        sidx = t.column("span_idx").to_numpy(zero_copy_only=False)
        udoc, dcode = np.unique(
            np.asarray(t.column("doc_id").to_pylist(), dtype=object),
            return_inverse=True)
        order = np.lexsort((sidx, dcode, h))  # np.unique codes are
        # lexicographically ordered, so dcode order == doc_id order
        hs = h[order]
        dropped = np.r_[False, hs[1:] == hs[:-1]]
        n_spans = np.bincount(dcode, minlength=len(udoc))
        n_drop = np.bincount(dcode[order][dropped], minlength=len(udoc))
        return pa.table({"doc_id": pa.array(list(udoc), pa.string()),
                         "n_spans": pa.array(n_spans.astype(np.int64)),
                         "n_dropped": pa.array(n_drop.astype(np.int64))})

    def add_doc_salt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("d_salt", pa.array([], pa.int32()))
        dh = word_hashes(t.column("doc_id").to_pylist())
        return t.append_column(
            "d_salt", pa.array((dh % np.uint64(salt_k)).astype(np.int32)))

    out_fields = part_fields[:2] + [("n_kept", pa.int64()),
                                    ("n_dropped", pa.int64())]

    def per_doc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(out_fields).empty_table()
        udoc, dcode = np.unique(
            np.asarray(t.column("doc_id").to_pylist(), dtype=object),
            return_inverse=True)
        ns = np.zeros(len(udoc), dtype=np.int64)
        nd = np.zeros(len(udoc), dtype=np.int64)
        np.add.at(ns, dcode, t.column("n_spans").to_numpy())
        np.add.at(nd, dcode, t.column("n_dropped").to_numpy())
        return pa.table({"doc_id": pa.array(list(udoc), pa.string()),
                         "n_spans": pa.array(ns),
                         "n_kept": pa.array(ns - nd),
                         "n_dropped": pa.array(nd)})

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("h_salt").map_groups(per_hash_group,
                                          batch_format="pyarrow")
            .map_batches(add_doc_salt, batch_format="pyarrow")
            .groupby("d_salt").map_groups(per_doc, batch_format="pyarrow"))


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
