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


def corpus_dataset(sf_dir: str, with_row_no: bool = False) -> "ray.data.Dataset":
    """The deterministic interleaved corpus as a DISTRIBUTED Dataset:
    pruned read_parquet over documents → map_batches lift (block count
    from parquet metadata; the corpus never materializes on the
    driver) → union with the tiny robots block. Memoized per
    (sf_dir, row_no) and session — every spans_* consumer shares ONE
    lift (object-store blocks, no worker/driver heap state)."""
    from ccrawler_ray.memo import memo_ds
    from ccrawler_ray.sources.corpus import corpus_dataset as _build

    return memo_ds(
        ("corpus_ds", sf_dir, with_row_no),
        lambda: _build(f"{sf_dir}/documents.parquet",
                       with_row_no=with_row_no, block_rows=_BLOCK_ROWS))


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


# ---------------------------------------------------------------------------
# Multimodal sequence packing — the training-batch builder for an
# INTERLEAVED text+media corpus (MMC4/Chameleon-style): a text span
# costs its whitespace-token count, a media span a fixed placeholder
# budget, and documents are concatenated in corpus row order then
# chunked into fixed-capacity bins. Same two-pass distributed prefix
# sum as o10_pack_sequences (pass 1: per-bucket cost sums — a
# driver-sized offset table; pass 2: in-bucket exact cumsum), so no
# global sort and no full materialization on one worker. All costs
# are exact integers ⇒ bitwise equal to the serial mirror.
# ---------------------------------------------------------------------------

MEDIA_TOKENS = 64
SPANS_PACK_CAPACITY = 512


def span_costs(kinds: np.ndarray, texts: list,
               media_tokens: int = MEDIA_TOKENS) -> np.ndarray:
    """FROZEN per-span token cost (shared engine/mirror): a text span
    costs whitespace-separator count + 1 (the token_count rule), a
    media span costs the fixed placeholder budget."""
    import polars as pl

    seps = pl.Series(texts).str.count_matches(r"\s+").to_numpy()
    cost = (seps + 1).astype(np.int64)
    return np.where(kinds == "media", np.int64(media_tokens), cost)


def _doc_pack_rows(batch: pa.Table,
                   media_tokens: int) -> tuple[np.ndarray, np.ndarray]:
    """(n_tokens, n_media) per doc of one corpus block — shared by the
    engine cost map and the serial mirror (same explode, same frozen
    cost rule)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    lens = pc.list_value_length(spans).to_numpy().astype(np.int64)
    kinds = np.asarray(flat.field("kind").to_pylist(), dtype=object)
    costs = span_costs(kinds, flat.field("text").to_pylist(), media_tokens)
    doc_idx = np.repeat(np.arange(len(lens)), lens)
    n_tokens = np.zeros(len(lens), dtype=np.int64)
    np.add.at(n_tokens, doc_idx, costs)
    n_media = np.zeros(len(lens), dtype=np.int64)
    np.add.at(n_media, doc_idx, (kinds == "media").astype(np.int64))
    return n_tokens, n_media


def spans_pack_multimodal(sf_dir: str, capacity: int = SPANS_PACK_CAPACITY,
                          media_tokens: int = MEDIA_TOKENS,
                          n_buckets: int = 256):
    """(doc_id, n_tokens, n_media, bin_id, bin_off, end_bin): where
    each interleaved document's token+media budget lands when the
    corpus is concatenated in row order and chunked into
    ``capacity``-token training bins."""
    import pandas as pd

    from ccrawler_ray.sources.corpus import NUM_HOSTS, _contiguous_rows

    # global corpus row count from parquet METADATA (robots prefix +
    # one row per document); the corpus itself stays distributed —
    # row_no is attached inside the lift (robots 0..22, 23 + doc_id).
    n = NUM_HOSTS + _contiguous_rows(f"{sf_dir}/documents.parquet")
    ds = corpus_dataset(sf_dir, with_row_no=True)
    width = max((n + n_buckets - 1) // n_buckets, 1)

    def cost_rows(batch: pa.Table) -> pa.Table:
        n_tokens, n_media = _doc_pack_rows(batch, media_tokens)
        row_no = batch.column("row_no").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "row_no": pa.array(row_no),
            "n_tokens": pa.array(n_tokens),
            "n_media": pa.array(n_media),
            "bkt": pa.array((row_no // width).astype(np.int32))})

    rows = ds.map_batches(cost_rows, batch_format="pyarrow").materialize()

    # pass 1: per-bucket token sums → exclusive prefix (driver-sized)
    def partial(t: pa.Table) -> pa.Table:
        ub, inv = np.unique(
            t.column("bkt").to_numpy(zero_copy_only=False),
            return_inverse=True)
        ssum = np.zeros(len(ub), dtype=np.int64)
        np.add.at(ssum, inv,
                  t.column("n_tokens").to_numpy(zero_copy_only=False))
        return pa.table({"bkt": pa.array(ub.astype(np.int64)),
                         "s": pa.array(ssum)})

    pdf = (rows.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("bkt", as_index=False)["s"].sum()
           .sort_values("bkt"))
    pdf["off"] = pdf["s"].cumsum() - pdf["s"]
    offsets = dict(zip(pdf["bkt"].astype(int), pdf["off"].astype(int)))

    cap = np.int64(capacity)

    def pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.string()), ("n_tokens", pa.int64()),
                 ("n_media", pa.int64()), ("bin_id", pa.int64()),
                 ("bin_off", pa.int64()),
                 ("end_bin", pa.int64())]).empty_table()
        order = np.argsort(
            t.column("row_no").to_numpy(zero_copy_only=False),
            kind="stable")
        t = t.take(pa.array(order))
        tok = t.column("n_tokens").to_numpy(zero_copy_only=False)
        base = offsets[int(t.column("bkt")[0].as_py())]
        pre = base + np.cumsum(tok) - tok
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(tok.astype(np.int64)),
            "n_media": t.column("n_media"),
            "bin_id": pa.array(pre // cap),
            "bin_off": pa.array(pre % cap),
            "end_bin": pa.array((pre + tok - 1) // cap)})

    return rows.groupby("bkt").map_groups(pack, batch_format="pyarrow")


def spans_integrity_report(sf_dir: str):
    """ONE row — the north-rule per-row invariant (kind, text,
    media_ref, order) checked DISTRIBUTEDLY over the whole interleaved
    corpus, plus the interleaving structure a multimodal packer sizes
    against:

    (n_docs, n_spans, n_offset_violations, n_ref_violations,
     tt, tm, mt, mm)

    * offset violation — a span whose ``offset`` is not strictly
      greater than its predecessor's within the document (the ORDER
      leg of the invariant); expected 0 on a well-formed corpus.
    * ref violation — a text span carrying a media_ref, or a media
      span without one (the media_ref discipline leg); expected 0.
    * tt/tm/mt/mm — adjacent-pair kind transitions (text→text,
      text→media, …): the interleaving profile.

    Per-batch partials only (docs never span the driver-sliced
    blocks); the reduce is a driver-side sum of |blocks| tiny rows.
    """
    import pandas as pd

    ds = corpus_dataset(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        lens = pc.list_value_length(spans).to_numpy().astype(np.int64)
        kind = np.asarray(flat.field("kind").to_pylist(), dtype=object)
        off = flat.field("offset").to_numpy(zero_copy_only=False)
        has_ref = (pc.utf8_length(flat.field("media_ref"))
                   .to_numpy(zero_copy_only=False) > 0)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        is_media = kind == "media"
        ref_bad = int((has_ref != is_media).sum())
        same_doc = np.r_[False, doc_idx[1:] == doc_idx[:-1]]
        off_bad = int((same_doc & np.r_[False, off[1:] <= off[:-1]]).sum())
        pair = same_doc[1:] if len(kind) else np.empty(0, bool)
        a = is_media[:-1][pair].astype(np.int64) if len(kind) else []
        b = is_media[1:][pair].astype(np.int64) if len(kind) else []
        code = np.asarray(a) * 2 + np.asarray(b)
        trans = np.bincount(code.astype(np.int64), minlength=4)
        return pa.table({
            "n_docs": pa.array([int((lens > 0).sum())], pa.int64()),
            "n_spans": pa.array([len(kind)], pa.int64()),
            "n_offset_violations": pa.array([off_bad], pa.int64()),
            "n_ref_violations": pa.array([ref_bad], pa.int64()),
            "tt": pa.array([int(trans[0])], pa.int64()),
            "tm": pa.array([int(trans[1])], pa.int64()),
            "mt": pa.array([int(trans[2])], pa.int64()),
            "mm": pa.array([int(trans[3])], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame([parts.sum(axis=0).astype("int64")]).reset_index(
        drop=True)
