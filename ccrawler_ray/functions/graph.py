"""Iterative link-graph analytics (PageRank) as a Ray Data pipeline.

The operator runs over any ``(src, dst, outdeg)`` edge Dataset; the
``queries()`` entry instantiates it on a deterministic preferential-
attachment graph derived from the documents table (the crawl corpus's
own href expander has uniform in-degree by construction, which would
make PageRank trivially flat).

Graph spec (FROZEN — mirrored bit-for-bit in serial_ref.link_pagerank):
  node i in 0..n-1; for i > 0 the raw targets are
  ``splitmix64(4*i + k) % i`` for k in 1..3, deduplicated in k order;
  node 0 has no outlinks (the dangling node). Links point strictly to
  lower ids, so old pages accumulate in-links like the real web.

PageRank runs in exact int64 micro-units (U = 1e12): teleport, damping
and per-edge contributions are all floor-divided integers, so block
summation order cannot change the result — the distributed run is
bitwise equal to the serial oracle at any partitioning.

Scale notes: the rank vector is driver/worker-resident by design
(n × 8 bytes — fine to ~1e8 nodes; beyond that the same iteration
works with ranks sharded by the dst hash instead of broadcast). Edges
are materialized ONCE and re-scanned per iteration (the legitimate
iterative-reuse case); per-block partials are pre-aggregated sparse
(dst, contrib) pairs, so driver traffic per iteration is
O(min(n, block_edges) × num_blocks), never O(edges).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ccrawler_ray.scale import join_partitions, read_docs

_U = 10**12          # rank mass scale (micro-micro units)
_DAMP_NUM = 85       # damping 0.85 as an exact rational 85/100
_DAMP_DEN = 100


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wrapping)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def pagerank_edges(sf_dir: str):
    """Deterministic preferential-attachment edge Dataset
    ``(src, dst, outdeg)`` over the documents table (doc_id column
    only — column-pruned read). Node 0 emits no edges."""
    ds = read_docs(sf_dir, ["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ids = ids[ids > 0].astype(np.int64)
        if not len(ids):
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "outdeg": pa.array([], pa.int64())})
        u = ids.astype(np.uint64)
        t1 = (_splitmix64(u * np.uint64(4) + np.uint64(1)) % u).astype(np.int64)
        t2 = (_splitmix64(u * np.uint64(4) + np.uint64(2)) % u).astype(np.int64)
        t3 = (_splitmix64(u * np.uint64(4) + np.uint64(3)) % u).astype(np.int64)
        keep2 = t2 != t1
        keep3 = (t3 != t1) & (t3 != t2)
        od = 1 + keep2.astype(np.int64) + keep3.astype(np.int64)
        src = np.concatenate([ids, ids[keep2], ids[keep3]])
        dst = np.concatenate([t1, t2[keep2], t3[keep3]])
        odeg = np.concatenate([od, od[keep2], od[keep3]])
        return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                         "outdeg": pa.array(odeg)})

    return ds.map_batches(edges, batch_format="pyarrow")


def link_pagerank(sf_dir: str, iters: int = 10, k_top: int = 100
                  ) -> pd.DataFrame:
    """Exact-integer PageRank over the frozen preferential graph.

    Returns the top ``k_top`` nodes as (doc_id, rank_u, rank) ordered
    by rank_u desc, doc_id asc — rank_u is the exact int64 mass,
    rank = rank_u / 1e12 for readability.
    """
    n = read_docs(sf_dir, ["doc_id"]).count()
    edges = pagerank_edges(sf_dir).materialize()

    r = np.full(n, _U // n, dtype=np.int64)
    for _ in range(iters):
        ref = ray.put(r)

        def contrib(batch: pa.Table, _ref=ref) -> pa.Table:
            rr = ray.get(_ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            od = batch.column("outdeg").to_numpy(zero_copy_only=False)
            c = (np.int64(_DAMP_NUM) * rr[src]) // (np.int64(_DAMP_DEN) * od)
            uniq, inv = np.unique(dst, return_inverse=True)
            s = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(s, inv, c)
            return pa.table({"dst": pa.array(uniq), "c": pa.array(s)})

        # node 0 is the only dangling node by the frozen graph spec
        dang_u = int(r[0])
        base_u = ((_DAMP_DEN - _DAMP_NUM) * _U) // (_DAMP_DEN * n) + \
            (_DAMP_NUM * dang_u) // (_DAMP_DEN * n)
        r_new = np.full(n, base_u, dtype=np.int64)
        for b in edges.map_batches(
                contrib, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            np.add.at(r_new,
                      b.column("dst").to_numpy(zero_copy_only=False),
                      b.column("c").to_numpy(zero_copy_only=False))
        r = r_new

    out = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "rank_u": r})
    out = out.sort_values(["rank_u", "doc_id"],
                          ascending=[False, True]).head(k_top)
    out["rank"] = out["rank_u"] / float(_U)
    return out.reset_index(drop=True)


def link_triangles(sf_dir: str, k_top: int = 100):
    """Triangle counting over the frozen link graph, each triangle
    attributed to its highest-id vertex (the apex whose two out-edges
    form the wedge — exactly-once by construction, since edges point
    strictly to lower ids).

    Scale shape: the wedge table is <= 3 rows/node (out-degree <= 3)
    and joins the canonical edge table with a hash-partitioned
    ``Dataset.join`` on (lo, hi) — no adjacency broadcast, no driver
    materialization; both sides stream from the same pruned read.
    Returns the top ``k_top`` apexes as (doc_id, n_tri) ordered by
    n_tri desc, doc_id asc.
    """
    edges = pagerank_edges(sf_dir)

    def canon(batch: pa.Table) -> pa.Table:
        # dst < src always: canonical undirected key is (dst, src)
        return pa.table({"lo": batch.column("dst"),
                         "hi": batch.column("src")})

    edge_keys = edges.map_batches(canon, batch_format="pyarrow")

    def wedges(batch: pa.Table) -> pa.Table:
        # recompute each node's <=3 deduped targets from the frozen
        # spec — a node's wedge set is derived wholly inside its own
        # row, so no batch/block boundary can split it
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ids = ids[ids > 0].astype(np.int64)
        apex_l, lo_l, hi_l = [], [], []
        if len(ids):
            u = ids.astype(np.uint64)
            t1 = (_splitmix64(u * np.uint64(4) + np.uint64(1)) % u
                  ).astype(np.int64)
            t2 = (_splitmix64(u * np.uint64(4) + np.uint64(2)) % u
                  ).astype(np.int64)
            t3 = (_splitmix64(u * np.uint64(4) + np.uint64(3)) % u
                  ).astype(np.int64)
            keep2 = t2 != t1
            keep3 = (t3 != t1) & (t3 != t2)
            for a, b, sel in ((t1, t2, keep2), (t1, t3, keep3),
                              (t2, t3, keep2 & keep3)):
                if sel.any():
                    apex_l.append(ids[sel])
                    lo_l.append(np.minimum(a[sel], b[sel]))
                    hi_l.append(np.maximum(a[sel], b[sel]))
        if not apex_l:
            return pa.table({"apex": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"apex": pa.array(np.concatenate(apex_l)),
                         "lo": pa.array(np.concatenate(lo_l)),
                         "hi": pa.array(np.concatenate(hi_l))})

    docs = read_docs(sf_dir, ["doc_id"])
    wedge_ds = docs.map_batches(wedges, batch_format="pyarrow")
    # scrub schema-less zero-row blocks before the hash join (tiny
    # inputs — see dedup.nonempty_blocks); both sides are narrow int64
    from ccrawler_ray.functions.dedup import nonempty_blocks

    wedge_ds = nonempty_blocks(wedge_ds.materialize(), pa.schema(
        [("apex", pa.int64()), ("lo", pa.int64()), ("hi", pa.int64())]))
    edge_keys = nonempty_blocks(edge_keys.materialize(), pa.schema(
        [("lo", pa.int64()), ("hi", pa.int64())]))
    tri = wedge_ds.join(edge_keys, join_type="inner", num_partitions=join_partitions(),
                        on=("lo", "hi"))
    counts = tri.groupby("apex").count()

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("apex"),
                         "n_tri": pc.cast(batch.column("count()"),
                                          pa.int64())})

    out = counts.map_batches(rename, batch_format="pyarrow")
    return out.sort(["n_tri", "doc_id"],
                    descending=[True, False]).limit(k_top)


# ---------------------------------------------------------------------------
# Connected components over a SPARSE subset of the link graph. The
# full preferential graph is ONE component by construction (every
# node i>0 links to some j<i), so components are made non-trivial by
# a FROZEN edge-thinning rule mirrored bit-for-bit in
# serial_ref.link_components: the k-th candidate edge of node i
# survives iff splitmix64(8i + k) % keep_mod == 0. Labels come from
# the shared dedup.cc_labels machinery — union-find in one task below
# the driver threshold, distributed min-label propagation above.
# ---------------------------------------------------------------------------


def sparse_link_edges(sf_dir: str, keep_mod: int = 4):
    """(doc_a, doc_b) edge Dataset: the pagerank graph's candidate
    targets thinned by the frozen keep rule. Duplicate edges are
    harmless for CC and not deduplicated."""
    ds = read_docs(sf_dir, ["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ids = ids[ids > 0].astype(np.int64)
        out_a, out_b = [], []
        if len(ids):
            u = ids.astype(np.uint64)
            for k in (1, 2, 3):
                t = (_splitmix64(u * np.uint64(4) + np.uint64(k))
                     % u).astype(np.int64)
                keep = (_splitmix64(u * np.uint64(8) + np.uint64(k))
                        % np.uint64(keep_mod)) == 0
                out_a.append(ids[keep])
                out_b.append(t[keep])
        a = (np.concatenate(out_a) if out_a else np.empty(0, np.int64))
        b = (np.concatenate(out_b) if out_b else np.empty(0, np.int64))
        return pa.table({"doc_a": pa.array(a.astype(np.int64)),
                         "doc_b": pa.array(b.astype(np.int64))})

    return ds.map_batches(edges, batch_format="pyarrow")


def link_components(sf_dir: str, keep_mod: int = 4, max_rounds: int = 32,
                    cc_driver_threshold: int = 5_000_000):
    """(doc_id, component, is_rep): connected components of the
    sparse link graph; component = min doc_id, is_rep marks it."""
    from ccrawler_ray.functions.dedup import cc_labels

    pairs = sparse_link_edges(sf_dir, keep_mod).materialize()
    nodes = read_docs(sf_dir, ["doc_id"])
    lab = cc_labels(pairs, nodes, max_rounds, cc_driver_threshold)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "component": t.column("cluster_rep"),
                         "is_rep": t.column("keep")})

    return lab.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# HITS hubs/authorities over the frozen preferential graph. The
# simultaneous-update variant (a_new from h_old AND h_new from a_old
# in the same iteration) so ONE pass over the edge table per
# iteration produces both partials. All mass is exact int64: the
# per-iteration renormalization is the FROZEN integer rule
# scale_q = max(1, total // U); v = v // scale_q, which keeps every
# value within a few U without a 128-bit multiply, so block summation
# order cannot change the result — bitwise equal to the serial mirror
# (serial_ref.link_hits) at any partitioning.
#
# Scale shape: identical to link_pagerank — hub/auth vectors are
# driver/worker-resident (2 × n × 8 bytes, fine to ~1e8 nodes; shard
# by dst hash beyond), edges materialized ONCE and re-scanned, and
# per-block partials are pre-aggregated sparse (node, contrib) pairs.
# ---------------------------------------------------------------------------


def link_hits(sf_dir: str, iters: int = 10, k_top: int = 100
              ) -> pd.DataFrame:
    """Exact-integer HITS. Returns the top ``k_top`` nodes as
    (doc_id, auth_u, hub_u, authority, hub) ordered by auth_u desc,
    doc_id asc; authority/hub are the /1e12 readable floats."""
    n = read_docs(sf_dir, ["doc_id"]).count()
    edges = pagerank_edges(sf_dir).materialize()

    h = np.full(n, _U // n, dtype=np.int64)
    a = np.full(n, _U // n, dtype=np.int64)
    for _ in range(iters):
        ref = ray.put((h, a))

        def contrib(batch: pa.Table, _ref=ref) -> pa.Table:
            hh, aa = ray.get(_ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            # authority partial: h_old mass flows src -> dst
            ud, invd = np.unique(dst, return_inverse=True)
            sa = np.zeros(len(ud), dtype=np.int64)
            np.add.at(sa, invd, hh[src])
            # hub partial: a_old mass flows dst -> src
            us, invs = np.unique(src, return_inverse=True)
            sh = np.zeros(len(us), dtype=np.int64)
            np.add.at(sh, invs, aa[dst])
            return pa.table({
                "node": pa.array(np.concatenate([ud, us])),
                "a_c": pa.array(np.concatenate(
                    [sa, np.zeros(len(us), np.int64)])),
                "h_c": pa.array(np.concatenate(
                    [np.zeros(len(ud), np.int64), sh]))})

        a_new = np.zeros(n, dtype=np.int64)
        h_new = np.zeros(n, dtype=np.int64)
        for b in edges.map_batches(
                contrib, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            node = b.column("node").to_numpy(zero_copy_only=False)
            np.add.at(a_new, node,
                      b.column("a_c").to_numpy(zero_copy_only=False))
            np.add.at(h_new, node,
                      b.column("h_c").to_numpy(zero_copy_only=False))
        for v in (a_new, h_new):
            scale_q = max(1, int(v.sum()) // _U)
            if scale_q > 1:
                np.floor_divide(v, scale_q, out=v)
        a, h = a_new, h_new

    out = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "auth_u": a, "hub_u": h})
    out = out.sort_values(["auth_u", "doc_id"],
                          ascending=[False, True]).head(k_top)
    out["authority"] = out["auth_u"] / float(_U)
    out["hub"] = out["hub_u"] / float(_U)
    return out.reset_index(drop=True)
