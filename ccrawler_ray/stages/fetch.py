"""Fetch stage (M6/A5/J1): resolve admitted frontier URLs against the
interleaved-docs corpus — the simulated web.

``FetchActor`` is a callable class → Ray actor pool via
``map_batches(FetchActor, concurrency=N)``: the corpus lookup index is
built ONCE per actor in ``__init__`` from an object-store reference
(``ray.put`` of the corpus Arrow table — zero-copy shared on a node),
then every batch is a vectorized take.

Scale path (100 TB corpus): the in-actor index is replaced by a keyed
lookup into Lance (take-by-key on a secondary index) or by the
broadcast-admitted semi-join over a corpus scan
(:func:`fetch_via_semi_join` below) — the admitted set per generation
is bounded by the global budget and is ALWAYS the small side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ccrawler_ray.spec import (
    FETCHED_SCHEMA,
    STATUS_TRANSIENT,
    as_single_array,
    hash64_batch,
)


def prepare_fetch_data(corpus: pa.Table):
    """Build the lookup-ready corpus arrays ONCE on the driver and
    ``ray.put`` them. Workers read them zero-copy from the object
    store. (Doing the combine/concat per worker caused a 40× allocator
    contention slowdown with 32 concurrent 150 MB copies — measured.)
    """
    spans = as_single_array(corpus.column("spans"))
    empty = pa.array([[]], type=spans.type)
    spans_plus = pa.concat_arrays([spans, empty])  # sentinel row for 404 takes
    doc_ids = as_single_array(corpus.column("doc_id"))
    return ray.put(
        {"spans": spans_plus, "doc_ids": doc_ids, "miss_idx": len(spans_plus) - 1}
    )


def _batch_retries(batch: pa.Table) -> np.ndarray:
    if "retries" in batch.column_names:
        return batch.column("retries").to_numpy(zero_copy_only=False).astype(np.int32)
    return np.zeros(batch.num_rows, dtype=np.int32)


def _transient_fail_mask(canons: list[str], retries: np.ndarray,
                         failure_rate: float) -> np.ndarray:
    """Vectorized spec.fetch_fails_transiently: a given (canon, attempt)
    fails deterministically; the retry redraws."""
    keys = [f"{c}#{int(r)}" for c, r in zip(canons, retries)]
    draws = hash64_batch(keys, seed=1299) % np.uint64(1_000_000)
    # float RHS, NOT int(rate*1e6): the scalar spec compares against
    # the float product (0.1*1e6 == 100000.00000000001), so truncating
    # here would fork engine vs spec on boundary draws
    return draws.astype(np.float64) < failure_rate * 1_000_000


class FetchActor:
    def __init__(self, fetch_ref, delays_ref, failure_rate: float = 0.0):
        data = ray.get(fetch_ref)  # zero-copy plasma read
        self.spans = data["spans"]
        self.doc_ids = data["doc_ids"]
        self.miss_idx = data["miss_idx"]
        self.delays: dict[str, int] = ray.get(delays_ref)
        self.failure_rate = failure_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch.column("host").to_pylist()
        qpos = batch.column("queue_pos").to_numpy(zero_copy_only=False)
        gens = batch.column("fetch_generation").to_numpy(zero_copy_only=False)
        n = batch.num_rows
        retries = _batch_retries(batch)
        # vectorized corpus lookup (Arrow hash join kernel, no python dict)
        idx = pc.index_in(as_single_array(batch.column("canon")),
                          value_set=self.doc_ids)
        miss = pc.is_null(idx).to_numpy(zero_copy_only=False)
        status = np.where(miss, 404, 200).astype(np.int32)
        take_idx = pc.fill_null(pc.cast(idx, pa.int64()), self.miss_idx).to_numpy(
            zero_copy_only=False
        ).copy()
        if self.failure_rate > 0.0:
            canons = batch.column("canon").to_pylist()
            failed = _transient_fail_mask(canons, retries, self.failure_rate) & ~miss
            status[failed] = STATUS_TRANSIENT
            take_idx[failed] = self.miss_idx  # no payload on a failed fetch
        delays = np.fromiter((self.delays.get(h, 0) for h in hosts), dtype=np.int64, count=n)
        # virtual clock (spec.fetch_virtual_ts_us, vectorized)
        ts = gens.astype(np.int64) * 1_000_000 + qpos.astype(np.int64) * (1 + delays) * 1_000
        spans = self.spans.take(pa.array(take_idx))
        return pa.Table.from_arrays(
            [
                batch.column("canon"),
                batch.column("host"),
                pa.array(status),
                spans,
                pa.array(gens.astype(np.int32)),
                batch.column("queue_pos"),
                batch.column("ord_key"),
                batch.column("depth"),
                pa.array(ts, type=pa.int64()),
                pa.array(retries),
            ],
            schema=FETCHED_SCHEMA,
        )


def fetch_via_semi_join(corpus_ds, admitted_table: pa.Table, delays: dict,
                        failure_rate: float = 0.0):
    """Scale-path fetch: broadcast the (small) admitted set, stream the
    corpus once, and semi-join on doc_id == canon inside map_batches.
    Misses (404s) are computed driver-side as admitted ∖ hits
    (:func:`semi_join_misses`).

    Returns (hits Dataset with FETCHED_SCHEMA columns, admitted_table).
    """
    # The pc.index_in probe below takes the FIRST matching admitted row;
    # that is only correct because admitted canons are unique (D1 dedup
    # upstream). Enforce the invariant here rather than assume it — a
    # duplicate-canon admission would silently corrupt queue_pos /
    # generation metadata on fetched rows. One hash pass, per generation.
    n_canon = admitted_table.num_rows
    if n_canon and pc.count_distinct(
            as_single_array(admitted_table.column("canon"))).as_py() != n_canon:
        raise ValueError(
            "fetch_via_semi_join: admitted 'canon' column has duplicates; "
            "the first-match probe requires unique canons")
    adm_ref = ray.put(admitted_table)
    delays_ref = ray.put(delays)

    def probe(batch: pa.Table) -> pa.Table:
        adm: pa.Table = ray.get(adm_ref)
        dl: dict = ray.get(delays_ref)
        # vectorized semi-join: pc.index_in (C++ hash probe) instead of
        # a per-batch python dict over the FULL admitted set — the dict
        # rebuild was O(|admitted|) per corpus batch, ruinous once the
        # corpus streams in many blocks (admitted canons are unique, so
        # first-match semantics are identical)
        idx = pc.index_in(as_single_array(batch.column("doc_id")),
                          value_set=as_single_array(adm.column("canon")))
        valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        if not valid.any():
            # NB pa.table({}, schema=...) raises on a non-empty schema —
            # every no-hit corpus batch lands here at scale
            return FETCHED_SCHEMA.empty_table()
        bidx = pa.array(np.flatnonzero(valid), type=pa.int64())
        aidx = idx.filter(pa.array(valid))
        sub_a = adm.take(aidx)
        canons = sub_a.column("canon").to_pylist()
        hosts = sub_a.column("host").to_pylist()
        qpos = sub_a.column("queue_pos").to_numpy(zero_copy_only=False).astype(np.int64)
        gens = sub_a.column("fetch_generation").to_numpy(zero_copy_only=False).astype(np.int64)
        retries = _batch_retries(sub_a)
        dls = np.fromiter((dl.get(h, 0) for h in hosts), dtype=np.int64, count=len(hosts))
        ts = gens * 1_000_000 + qpos * (1 + dls) * 1_000
        n = len(bidx)
        status = np.full(n, 200, dtype=np.int32)
        spans = as_single_array(batch.column("spans")).take(bidx)
        if failure_rate > 0.0:
            failed = _transient_fail_mask(canons, retries, failure_rate)
            status[failed] = STATUS_TRANSIENT
            if failed.any():  # no payload on a failed fetch
                empty = pa.array([[]] * int(failed.sum()), type=spans.type)
                merged = pa.concat_arrays([spans, empty])
                slot = np.arange(n)  # failed rows -> their empty slot
                slot[failed] = n + np.arange(int(failed.sum()))
                spans = merged.take(pa.array(slot, type=pa.int64()))
        return pa.Table.from_arrays(
            [
                sub_a.column("canon"),
                sub_a.column("host"),
                pa.array(status),
                spans,
                pa.array(gens.astype(np.int32)),
                sub_a.column("queue_pos"),
                sub_a.column("ord_key"),
                sub_a.column("depth"),
                pa.array(ts, type=pa.int64()),
                pa.array(retries),
            ],
            schema=FETCHED_SCHEMA,
        )

    return corpus_ds.map_batches(probe, batch_format="pyarrow"), admitted_table


def semi_join_misses(admitted_table: pa.Table, hit_canons: set, delays: dict) -> pa.Table:
    """404 rows for the semi-join path: admitted ∖ hits, with the same
    virtual-clock timestamps the in-actor path assigns."""
    canons = admitted_table.column("canon").to_pylist()
    mask = np.array([c not in hit_canons for c in canons], dtype=bool)
    sub = admitted_table.filter(pa.array(mask))
    n = sub.num_rows
    hosts = sub.column("host").to_pylist()
    qpos = sub.column("queue_pos").to_numpy(zero_copy_only=False).astype(np.int64)
    gens = sub.column("fetch_generation").to_numpy(zero_copy_only=False).astype(np.int64)
    dls = np.fromiter((delays.get(h, 0) for h in hosts), dtype=np.int64, count=n)
    ts = gens * 1_000_000 + qpos * (1 + dls) * 1_000
    empty_spans = pa.array([[]] * n, type=FETCHED_SCHEMA.field("spans").type)
    return pa.Table.from_arrays(
        [
            sub.column("canon"),
            sub.column("host"),
            pa.array(np.full(n, 404, dtype=np.int32)),
            empty_spans,
            pa.array(gens.astype(np.int32)),
            sub.column("queue_pos"),
            sub.column("ord_key"),
            sub.column("depth"),
            pa.array(ts, type=pa.int64()),
            pa.array(_batch_retries(sub)),
        ],
        schema=FETCHED_SCHEMA,
    )
