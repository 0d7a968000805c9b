"""Similarity search over an embedding column (list<float>).

* ``ann_topk_cosine`` — brute-force cosine top-k: numpy matmul per
  batch against a broadcast query matrix, per-batch partial top-k,
  small final reduce. The exact baseline (oracle-checkable in DuckDB
  via list_cosine_similarity + row_number).
* ``ann_lsh_topk`` — random-hyperplane LSH bucketing: the scale path.
  Each vector is probed only against its bucket; recall vs the exact
  baseline is asserted in tests, not assumed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ccrawler_ray.scale import read_embeddings

_EMPTY_SCORES = {
    "query_id": pd.Series(dtype="int64"),
    "vec_id": pd.Series(dtype="int64"),
    "cos": pd.Series(dtype="float64"),
}


def _empty_scores() -> pd.DataFrame:
    return pd.DataFrame(_EMPTY_SCORES)


def _empty_scores_t() -> pa.Table:
    return pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()),
                      ("cos", pa.float64())]).empty_table()


def _emb_matrix(t: pa.Table) -> np.ndarray:
    """Arrow embedding column -> (n, dim) float64 matrix without the
    pandas object-array round trip (np.stack over per-row numpy
    objects was the dominant cost of every embedding scan)."""
    from ccrawler_ray.spec import as_single_array

    emb = as_single_array(t.column("embedding"))
    return np.asarray(emb.flatten(), dtype=np.float64).reshape(len(emb), -1)



def _query_matrix(sf_dir: str, num_queries: int):
    """ONLY the query rows (vec_id < num_queries) reach the driver —
    a filtered, column-pruned read (the r1 full-table _load_matrix was
    a driver OOM at scale)."""
    df = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < num_queries,
    ).to_pandas()
    df = df.sort_values("vec_id")
    ids = df["vec_id"].to_numpy()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


_BLOCK_CAP = 64


def _block_top_idx(c: np.ndarray, v: np.ndarray,
                   cap: int = _BLOCK_CAP) -> np.ndarray:
    """Indices of the block's top-cap candidates in the EXACT final
    order key (cos desc, vec_id asc). A bare argpartition keeps an
    arbitrary subset of a tie plateau at the cutoff and can drop the
    smallest vec_ids the oracle's ORDER BY would rank."""
    if not len(c):
        return np.empty(0, dtype=np.int64)
    return np.lexsort((v, -c))[: min(len(c), cap)]


def _brute_topk(ds, q_ref, k: int):
    """Shared brute-force scorer: per-batch normalized matmul against
    the broadcast queries, exact-ordered per-block candidate cap,
    small final reduce. q_ref holds (qids, qlabels-or-None, qn); when
    labels are present each query only scores same-label candidates."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_scores_t()
        qids_, qlabels_, qn_ = ray.get(q_ref)
        m = _emb_matrix(t)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        vids = t.column("vec_id").to_numpy(zero_copy_only=False)
        labels = (t.column("label").to_numpy(zero_copy_only=False)
                  if qlabels_ is not None else None)
        cos = qn_ @ m.T  # (nq, batch)
        out_q, out_v, out_c = [], [], []
        for qi, qid in enumerate(qids_):
            mask = vids != qid  # exclude self
            if labels is not None:
                mask &= labels == qlabels_[qi]
            c = cos[qi][mask]
            v = vids[mask]
            idx = _block_top_idx(c, v)
            if len(idx):
                out_q.append(np.full(len(idx), qid, dtype=np.int64))
                out_v.append(v[idx].astype(np.int64))
                out_c.append(c[idx])
        if not out_q:
            return _empty_scores_t()
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "cos": pa.array(np.concatenate(out_c))})

    return _topk_reduce(ds.map_batches(partial, batch_format="pyarrow"), k)


def ann_topk_cosine(sf_dir: str, num_queries: int = 5, k: int = 5):
    """Exact top-k cosine neighbors (excluding self) for the query set
    ``vec_id < num_queries``; ties broken by vec_id asc.

    Streams the corpus in batches; each batch computes its partial
    scores vs the broadcast queries; a final small reduce merges
    top-k — the corpus is never materialized on one worker.
    """
    qids, qm = _query_matrix(sf_dir, num_queries)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_ref = ray.put((qids, None, qn))
    ds = read_embeddings(sf_dir, ["vec_id", "embedding"])
    return _brute_topk(ds, q_ref, k)


def ann_range_search(sf_dir: str, num_queries: int = 8,
                     threshold: float = 0.25):
    """RANGE search: every neighbor within a cosine radius
    (``cos >= threshold``, excluding self) for the query set
    ``vec_id < num_queries`` — the radius-query sibling of
    ``ann_topk_cosine``.

    Pure scan shape: each batch computes its slice of the (nq × n)
    cosine matrix against the broadcast normalized queries and emits
    only the passing rows — no shuffle, no top-k reduce state; the
    result IS the filter's output stream, so it scales as a single
    map over the corpus. The threshold compares the ROUNDED (4 dp)
    value so the kept set is reproducible across kernels (numpy here,
    DuckDB's list_cosine_similarity in the oracle) whose raw results
    may differ in the last ulp.
    """
    qids, qm = _query_matrix(sf_dir, num_queries)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_ref = ray.put((qids, qn))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_scores_t()
        qids_, qn_ = ray.get(q_ref)
        m = _emb_matrix(t)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        vids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cos = np.round(qn_ @ m.T, 4)  # (nq, batch)
        hit = (cos >= threshold) & (vids[None, :] != qids_[:, None])
        qi, ci = np.nonzero(hit)
        return pa.table({
            "query_id": pa.array(qids_[qi].astype(np.int64)),
            "vec_id": pa.array(vids[ci]),
            "cos": pa.array(cos[qi, ci]),
        })

    ds = read_embeddings(sf_dir, ["vec_id", "embedding"])
    return ds.map_batches(partial, batch_format="pyarrow")


def ann_filtered_topk(sf_dir: str, num_queries: int = 5, k: int = 5):
    """Metadata-FILTERED exact top-k cosine: each query's candidates
    are restricted to vectors sharing its ``label`` (same-category
    search — the standard filtered-vector-search feature).

    The filter is pushed INTO the read: the corpus scan carries
    ``label isin(query labels)`` so row groups with no eligible label
    never leave storage; the residual per-query equality test is a
    vectorized mask inside the batch. Same partial-topk + small-reduce
    shape as ann_topk_cosine.
    """
    qdf = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filter=pc.field("vec_id") < num_queries,
    ).to_pandas().sort_values("vec_id")
    qids = qdf["vec_id"].to_numpy()
    qlabels = qdf["label"].to_numpy()
    qm = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_ref = ray.put((qids, qlabels, qn))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filter=pc.field("label").isin(np.unique(qlabels).tolist()),
    )
    return _brute_topk(ds, q_ref, k)


def _topk_final(df: pd.DataFrame, k: int) -> pd.DataFrame:
    if len(df) == 0:  # dtyped empty: keeps the executor schema stable
        out = _empty_scores()
        out["rank"] = pd.Series(dtype="int64")
        return out
    df = df.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    return df.assign(
        rank=np.arange(1, len(df) + 1, dtype=np.int64),
        cos=np.round(df["cos"].to_numpy(), 4),
        query_id=df["query_id"].astype(np.int64),
        vec_id=df["vec_id"].astype(np.int64),
    )


def _topk_reduce(partials, k: int, dedup: bool = False):
    """Final per-query top-k over the (small by construction) partial
    score stream: one single-block reduce — the partials are bounded by
    n_blocks × n_queries × 64 rows, so a distributed groupby sort here
    would only manufacture empty partitions (and executor schema-warn
    noise) for no parallelism."""

    def reduce_all(df: pd.DataFrame) -> pd.DataFrame:
        if dedup:
            df = df.drop_duplicates(["query_id", "vec_id"])
        parts = [
            _topk_final(g, k)
            for _, g in df.groupby("query_id", sort=True)
        ]
        if not parts:
            return _topk_final(df, k)
        return pd.concat(parts, ignore_index=True)

    return partials.repartition(1).map_batches(
        reduce_all, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization — the memory-bandwidth scale path FAISS
# calls SQ: normalized vectors quantized per-dimension to uint8, the
# score an EXACT int64 dot product of the quantized codes. At 100 TB
# this is the 8x-smaller-index / int-SIMD variant of the brute scan;
# per-dim min/max is a distributed Min/Max aggregate over dim-keyed
# partial rows (one row per (block, dim) crosses the wire — never
# vectors). Exact-int scores ⇒ top-k is partitioning-independent and
# bitwise equal to the serial mirror.
# ---------------------------------------------------------------------------

SQ_LEVELS = 255


def _sq_quantize(m: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """FROZEN SQ8 rule (shared engine/mirror): rows must already be
    L2-normalized; per-dim affine map to [0, 255], floor, clip."""
    rng = mx - mn
    s = np.where(rng > 0, np.float64(SQ_LEVELS) / rng, 0.0)
    q = np.floor((m - mn[None, :]) * s[None, :])
    return np.clip(q, 0, SQ_LEVELS).astype(np.int64)


def _sq_minmax(ds, dim: int):
    """Distributed per-dim min/max of the L2-NORMALIZED corpus."""
    from ray.data.aggregate import Max, Min

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("d", pa.int64()), ("mn", pa.float64()),
                              ("mx", pa.float64())]).empty_table()
        m = _emb_matrix(t)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        return pa.table({"d": pa.array(np.arange(dim, dtype=np.int64)),
                         "mn": pa.array(m.min(axis=0)),
                         "mx": pa.array(m.max(axis=0))})

    pdf = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("d").aggregate(Min("mn", alias_name="mn"),
                                   Max("mx", alias_name="mx"))
           .to_pandas().sort_values("d"))  # dim rows
    return pdf["mn"].to_numpy(), pdf["mx"].to_numpy()


def ann_sq_topk(sf_dir: str, num_queries: int = 5, k: int = 5):
    """(query_id, vec_id, qdot, rank): top-k neighbors by exact int64
    dot product of SQ8-quantized normalized vectors (self excluded;
    ties by vec_id asc)."""
    qids, qm = _query_matrix(sf_dir, num_queries)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    ds = read_embeddings(sf_dir, ["vec_id", "embedding"])
    dim = qm.shape[1]
    mn, mx = _sq_minmax(ds, dim)
    qq = _sq_quantize(qn, mn, mx)
    ref = ray.put((qids, qq, mn, mx))

    empty = {"query_id": pd.Series(dtype="int64"),
             "vec_id": pd.Series(dtype="int64"),
             "qdot": pd.Series(dtype="int64")}

    empty_t = pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()),
                         ("qdot", pa.int64())]).empty_table()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_t
        qids_, qq_, mn_, mx_ = ray.get(ref)
        m = _emb_matrix(t)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        mq = _sq_quantize(m, mn_, mx_)
        vids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        dots = qq_ @ mq.T  # (nq, batch) exact int64
        oq, ov, od = [], [], []
        for qi, qid in enumerate(qids_):
            mask = vids != qid
            d, v = dots[qi][mask], vids[mask]
            idx = np.lexsort((v, -d))[: min(len(d), _BLOCK_CAP)]
            if len(idx):
                oq.append(np.full(len(idx), qid, dtype=np.int64))
                ov.append(v[idx])
                od.append(d[idx].astype(np.int64))
        if not oq:
            return empty_t
        return pa.table({"query_id": pa.array(np.concatenate(oq)),
                         "vec_id": pa.array(np.concatenate(ov)),
                         "qdot": pa.array(np.concatenate(od))})

    def reduce_all(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for _, g in df.groupby("query_id", sort=True):
            g = g.sort_values(["qdot", "vec_id"],
                              ascending=[False, True]).head(k)
            parts.append(g.assign(
                rank=np.arange(1, len(g) + 1, dtype=np.int64)))
        if not parts:
            out = pd.DataFrame(empty)
            out["rank"] = pd.Series(dtype="int64")
            return out
        return pd.concat(parts, ignore_index=True)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(reduce_all, batch_format="pandas", batch_size=None))


# Quantization scale for k-means partial sums: per-element int64
# micro-sums make the merged centroid independent of block order /
# summation association, so the distributed result is BITWISE equal to
# the serial differential oracle (serial_ref.kmeans_centroids).
KMEANS_QSCALE = float(1 << 24)


def kmeans_centroids(sf_dir: str, k: int = 16, iters: int = 5, seed: int = 42):
    """Deterministic Lloyd's k-means over the embedding column,
    expressed scale-correctly: per-iteration assignment + partial
    (count, quantized int64 sum) per cluster inside map_batches, merged
    driver-side (centroids are tiny; vectors are never gathered).
    Trained once per (params, session) — ann_ivf_topk, ann_ivf_pq and
    ann_recall_report all share the quantizer (ccrawler_ray.memo)."""
    from ccrawler_ray.memo import memo_val

    return memo_val(("kmeans_cents", sf_dir, k, iters, seed),
                    lambda: _kmeans_centroids(sf_dir, k, iters, seed))


def _kmeans_centroids(sf_dir: str, k: int, iters: int, seed: int):
    ds = read_embeddings(sf_dir, ["vec_id", "embedding"]).materialize()
    # deterministic init: the k vectors with smallest vec_id — a
    # distributed sort+limit moves k rows, never the whole table
    init = ds.sort("vec_id").limit(k).to_pandas()
    cents = np.stack(init["embedding"].to_numpy()).astype(np.float64)
    for _ in range(iters):
        c_ref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            clus, ns, vsums = [], [], []
            if t.num_rows:
                m = _emb_matrix(t)
                d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                a = d.argmin(axis=1)
                q = np.round(m * KMEANS_QSCALE).astype(np.int64)
                for ci in np.unique(a):
                    sel = a == ci
                    clus.append(int(ci))
                    ns.append(int(sel.sum()))
                    vsums.append(q[sel].sum(axis=0))
            if not clus:
                return pa.schema([("cluster", pa.int64()),
                                  ("n", pa.int64()),
                                  ("vsum", pa.list_(pa.int64()))]
                                 ).empty_table()
            dim_ = len(vsums[0])
            offs = np.arange(0, (len(vsums) + 1) * dim_, dim_,
                             dtype=np.int32)
            return pa.table({
                "cluster": pa.array(clus, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "vsum": pa.ListArray.from_arrays(
                    pa.array(offs),
                    pa.array(np.concatenate(vsums), pa.int64()))})

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        new = cents.copy()
        for ci, g in parts.groupby("cluster"):
            n = g["n"].sum()
            if n:
                isum = np.sum(
                    np.stack([np.asarray(v, dtype=np.int64) for v in g["vsum"]]),
                    axis=0,
                )
                new[ci] = isum / (KMEANS_QSCALE * n)
        cents = new
    return cents


def ann_ivf_topk(sf_dir: str, num_queries: int = 5, k: int = 5,
                 n_clusters: int = 16, n_probe: int = 4, seed: int = 42):
    """IVF approximate top-k: k-means coarse quantizer; each query is
    compared only against vectors whose cluster is among its n_probe
    nearest centroids. Partitioning assumption: a cluster's members fit
    a worker (rebalance with more clusters when skewed)."""
    cents = kmeans_centroids(sf_dir, k=n_clusters, seed=seed)
    qids, qm = _query_matrix(sf_dir, num_queries)
    qnorm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    qd = ((cents[None, :, :] - qm[:, None, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd, axis=1)[:, :n_probe]           # (nq, n_probe)
    q_ref = ray.put((qids, qnorm, cents, probes))
    ds = read_embeddings(sf_dir, ["vec_id", "embedding"])

    def search(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_scores_t()
        qids, qn, c, pr = ray.get(q_ref)
        m = _emb_matrix(t)
        d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        vids = t.column("vec_id").to_numpy(zero_copy_only=False)
        oq, ov, oc = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.isin(assign, pr[qi]) & (vids != qid)
            if mask.any():
                oq.append(np.full(int(mask.sum()), qid, dtype=np.int64))
                ov.append(vids[mask].astype(np.int64))
                oc.append(mn[mask] @ qn[qi])
        if not oq:
            return _empty_scores_t()
        return pa.table({"query_id": pa.array(np.concatenate(oq)),
                         "vec_id": pa.array(np.concatenate(ov)),
                         "cos": pa.array(np.concatenate(oc))})

    cands = ds.map_batches(search, batch_format="pyarrow")
    return _topk_reduce(cands, k)


def ann_lsh_topk(sf_dir: str, num_queries: int = 5, k: int = 5,
                 num_planes: int = 6, num_tables: int = 8, seed: int = 42):
    """LSH-bucketed approximate top-k: random-hyperplane signatures
    (num_tables independent tables of num_planes bits); a query is
    compared only against vectors sharing a bucket in ANY table.

    Partitioning assumption: one bucket's members fit a worker — holds
    when num_planes splits the corpus ~2^planes ways; skewed buckets
    would be re-split by another plane in a deeper variant.
    """
    qids, qm = _query_matrix(sf_dir, num_queries)
    dim = qm.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim))
    qnorm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_ref = ray.put((qids, qnorm, planes))
    ds = read_embeddings(sf_dir, ["vec_id", "embedding"])

    def bucketize(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return _empty_scores_t()
        qids, qn, pl = ray.get(q_ref)
        m = _emb_matrix(tb)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        vids = tb.column("vec_id").to_numpy(zero_copy_only=False)
        qsig = (np.einsum("tpd,qd->tqp", pl, qn) > 0)      # (T, nq, P)
        vsig = (np.einsum("tpd,nd->tnp", pl, m) > 0)       # (T, n, P)
        weights = 1 << np.arange(qsig.shape[2])
        qb = (qsig * weights).sum(axis=2)                  # (T, nq)
        vb = (vsig * weights).sum(axis=2)                  # (T, n)
        oq, ov, oc = [], [], []
        for t in range(qb.shape[0]):
            for qi, qid in enumerate(qids):
                mask = (vb[t] == qb[t, qi]) & (vids != qid)
                if mask.any():
                    oq.append(np.full(int(mask.sum()), qid, dtype=np.int64))
                    ov.append(vids[mask].astype(np.int64))
                    oc.append(m[mask] @ qn[qi])
        if not oq:
            return _empty_scores_t()
        # in-block exactly-once: first table wins per (query, vec)
        q_a = np.concatenate(oq)
        v_a = np.concatenate(ov)
        c_a = np.concatenate(oc)
        key = q_a * (int(vids.max()) + 1) + v_a
        first = np.sort(np.unique(key, return_index=True)[1])
        return pa.table({"query_id": pa.array(q_a[first]),
                         "vec_id": pa.array(v_a[first]),
                         "cos": pa.array(c_a[first])})

    cands = ds.map_batches(bucketize, batch_format="pyarrow")
    return _topk_reduce(cands, k, dedup=True)


# ---------------------------------------------------------------------------
# Product quantization ANN — the compressed-domain scale path: vectors
# live in the index as M_SUB uint8 codes (8 B vs 512 B raw, 64×), so
# a 100 TB embedding corpus's PQ index fits the object store. Codebook
# training is per-subspace Lloyd's with the same quantized-int64
# partial sums as kmeans_centroids (order-independent merge ⇒ the
# serial mirror reproduces centroids, codes and ADC distances
# bitwise). Search is asymmetric distance computation: per query one
# (M_SUB × PQ_K) table, per vector M_SUB table lookups — no float
# math against raw vectors at query time.
# ---------------------------------------------------------------------------

PQ_SUBS = 8
PQ_K = 16


def _pq_codebooks(ds, dim: int, iters: int = 5,
                  train_mod: int = 1) -> np.ndarray:
    """(PQ_SUBS, PQ_K, dim//PQ_SUBS) codebooks; init = subvectors of
    the PQ_K smallest vec_ids (sort+limit moves PQ_K rows).

    train_mod > 1 trains on the deterministic subsample
    vec_id % train_mod == 0 — the production practice at corpus scale
    (quantizers train on ~1e6 vectors, never the full 1e10; passes
    over the training set shrink by the same factor). Encoding always
    covers every vector. The subsample is id-derived, so the serial
    mirror reproduces it exactly."""
    if train_mod > 1:
        def keep(t: pa.Table) -> pa.Table:
            vids = t.column("vec_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(vids % train_mod == 0))

        ds = ds.map_batches(keep, batch_format="pyarrow").materialize()
    sub = dim // PQ_SUBS
    init = ds.sort("vec_id").limit(PQ_K).to_pandas()
    base = np.stack(init["embedding"].to_numpy()).astype(np.float64)
    cents = np.stack(
        [base[:, s * sub:(s + 1) * sub] for s in range(PQ_SUBS)])
    for _ in range(iters):
        c_ref = ray.put(cents)

        def partial(t: pa.Table, _c_ref=c_ref) -> pa.Table:
            c = ray.get(_c_ref)
            subs, clus, ns, vsums = [], [], [], []
            if t.num_rows:
                m = _emb_matrix(t)
                for s in range(PQ_SUBS):
                    ms = m[:, s * sub:(s + 1) * sub]
                    d = ((ms[:, None, :] - c[s][None, :, :]) ** 2).sum(axis=2)
                    a = d.argmin(axis=1)
                    q = np.round(ms * KMEANS_QSCALE).astype(np.int64)
                    for ci in np.unique(a):
                        sel = a == ci
                        subs.append(s)
                        clus.append(int(ci))
                        ns.append(int(sel.sum()))
                        vsums.append(q[sel].sum(axis=0))
            if not subs:
                return pa.schema([("sub", pa.int64()),
                                  ("cluster", pa.int64()),
                                  ("n", pa.int64()),
                                  ("vsum", pa.list_(pa.int64()))]
                                 ).empty_table()
            flat = np.concatenate(vsums)
            offs = np.arange(0, (len(vsums) + 1) * sub, sub, dtype=np.int32)
            return pa.table({
                "sub": pa.array(subs, pa.int64()),
                "cluster": pa.array(clus, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "vsum": pa.ListArray.from_arrays(
                    pa.array(offs), pa.array(flat, pa.int64()))})

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        new = cents.copy()
        for (s, ci), g in parts.groupby(["sub", "cluster"]):
            n = g["n"].sum()
            if n:
                isum = np.sum(np.stack(
                    [np.asarray(v, dtype=np.int64) for v in g["vsum"]]),
                    axis=0)
                new[int(s)][int(ci)] = isum / (KMEANS_QSCALE * n)
        cents = new
    return cents


def ann_pq_topk(sf_dir: str, num_queries: int = 5, k: int = 5,
                iters: int = 5, train_mod: int = 1):
    """Approximate top-k by PQ/ADC distance (asc, ties vec_id asc) for
    the query set vec_id < num_queries, self excluded. Returns
    (query_id, vec_id, adist, rank)."""
    qids, qm = _query_matrix(sf_dir, num_queries)
    dim = qm.shape[1]
    sub = dim // PQ_SUBS
    ds = read_embeddings(sf_dir, ["vec_id", "embedding"]).materialize()
    from ccrawler_ray.memo import memo_val

    # train once per (params, session) — ann_recall_report reuses
    cents = memo_val(("pq_books", sf_dir, iters, train_mod),
                     lambda: _pq_codebooks(ds, dim, iters=iters,
                                           train_mod=train_mod))
    c_ref = ray.put(cents)

    def encode(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        if t.num_rows == 0:
            return pa.schema([("vec_id", pa.int64()),
                              ("codes", pa.binary())]).empty_table()
        m = _emb_matrix(t)
        codes = np.empty((len(m), PQ_SUBS), dtype=np.uint8)
        for s in range(PQ_SUBS):
            ms = m[:, s * sub:(s + 1) * sub]
            d = ((ms[:, None, :] - c[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d.argmin(axis=1).astype(np.uint8)
        buf = codes.tobytes()
        return pa.table({
            "vec_id": t.column("vec_id").cast(pa.int64()),
            "codes": pa.array([buf[i * PQ_SUBS:(i + 1) * PQ_SUBS]
                               for i in range(len(m))], pa.binary())})

    enc = ds.map_batches(encode, batch_format="pyarrow").materialize()

    # per-query ADC tables: T[q, s, c] = ||q_s - cent[s, c]||^2.
    # codebook width is cents.shape[1] == min(PQ_K, train rows) — the
    # serial mirror's tm[:PQ_K] init imposes the same rule
    T = np.empty((len(qids), PQ_SUBS, cents.shape[1]), dtype=np.float64)
    for s in range(PQ_SUBS):
        qs = qm[:, s * sub:(s + 1) * sub]
        T[:, s, :] = ((qs[:, None, :] - cents[s][None, :, :]) ** 2).sum(axis=2)
    t_ref = ray.put((qids, T))
    srange = np.arange(PQ_SUBS)

    def search(t: pa.Table) -> pa.Table:
        qids_, T_ = ray.get(t_ref)
        if t.num_rows == 0:
            return pa.schema([("query_id", pa.int64()),
                              ("vec_id", pa.int64()),
                              ("adist", pa.float64())]).empty_table()
        from ccrawler_ray.spec import as_single_array

        codes = np.frombuffer(
            b"".join(as_single_array(t.column("codes")).to_pylist()),
            dtype=np.uint8).reshape(t.num_rows, PQ_SUBS)
        vids = t.column("vec_id").to_numpy(zero_copy_only=False)
        oq, ov, od = [], [], []
        for qi, qid in enumerate(qids_):
            dist = T_[qi][srange[None, :], codes].sum(axis=1)
            mask = vids != qid
            d, v = dist[mask], vids[mask]
            idx = np.lexsort((v, d))[:k]   # (adist asc, vec_id asc)
            oq.append(np.full(len(idx), qid, dtype=np.int64))
            ov.append(v[idx].astype(np.int64))
            od.append(d[idx])
        return pa.table({"query_id": pa.array(np.concatenate(oq)),
                         "vec_id": pa.array(np.concatenate(ov)),
                         "adist": pa.array(np.concatenate(od))})

    cands = enc.map_batches(search, batch_format="pyarrow")

    def reduce_all(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for _, g in df.groupby("query_id", sort=True):
            g = g.sort_values(["adist", "vec_id"]).head(k)
            parts.append(g.assign(
                rank=np.arange(1, len(g) + 1, dtype=np.int64)))
        if not parts:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "vec_id": pd.Series(dtype="int64"),
                                 "adist": pd.Series(dtype="float64"),
                                 "rank": pd.Series(dtype="int64")})
        return pd.concat(parts)

    return cands.repartition(1).map_batches(reduce_all,
                                            batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF-PQ — the composition production ANN indexes (FAISS-style) run at
# corpus scale: a coarse k-means quantizer routes each vector to an
# inverted list, PQ codes its RESIDUAL (v - centroid) in 8 bytes, and a
# query scans only its n_probe nearest lists with per-list ADC tables.
# Both trainers use the quantized-int64 partial-sum rule, so cluster
# assignments, residual codebooks, codes and ADC distances are bitwise
# reproducible under any partitioning (serial mirror: serial_ref).
# ---------------------------------------------------------------------------


def _ivfpq_index(sf_dir: str, dim: int, n_clusters: int, iters: int,
                 train_mod: int):
    """IVF-PQ index build shared by `ann_ivf_pq` (in-session) and
    `ann_index_roundtrip` (persisted to parquet): coarse k-means
    router, residual-PQ codebooks (session-memoized), and the
    encoded (vec_id, cluster, codes) inverted-list dataset."""
    sub = dim // PQ_SUBS
    cents = kmeans_centroids(sf_dir, k=n_clusters)
    c_ref = ray.put(cents)
    ds = read_embeddings(sf_dir, ["vec_id", "embedding"])

    def to_residual(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([
                ("vec_id", pa.int64()), ("cluster", pa.int64()),
                ("embedding", pa.list_(pa.float64()))]).empty_table()
        c = ray.get(c_ref)
        m = _emb_matrix(t)
        d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        r = m - c[a]
        offs = np.arange(0, (len(m) + 1) * m.shape[1], m.shape[1],
                         dtype=np.int32)
        return pa.table({
            "vec_id": t.column("vec_id").cast(pa.int64()),
            "cluster": pa.array(a.astype(np.int64)),
            "embedding": pa.ListArray.from_arrays(
                pa.array(offs), pa.array(r.ravel(), pa.float64()))})

    from ccrawler_ray.memo import memo_ds, memo_val

    res = memo_ds(("ivfpq_res", sf_dir, n_clusters),
                  lambda: ds.map_batches(to_residual, batch_format="pyarrow"))

    # residual-PQ training once per (params, session); the key carries
    # the coarse-quantizer params because the residuals depend on them
    pq_cents = memo_val(
        ("ivfpq_books", sf_dir, n_clusters, iters, train_mod),
        lambda: _pq_codebooks(res, dim, iters=iters, train_mod=train_mod))
    p_ref = ray.put(pq_cents)

    def encode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([
                ("vec_id", pa.int64()), ("cluster", pa.int64()),
                ("codes", pa.binary())]).empty_table()
        p = ray.get(p_ref)
        m = _emb_matrix(t)
        codes = np.empty((len(m), PQ_SUBS), dtype=np.uint8)
        for s in range(PQ_SUBS):
            ms = m[:, s * sub:(s + 1) * sub]
            d = ((ms[:, None, :] - p[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d.argmin(axis=1).astype(np.uint8)
        buf = codes.tobytes()
        return pa.table({
            "vec_id": t.column("vec_id").cast(pa.int64()),
            "cluster": t.column("cluster").cast(pa.int64()),
            "codes": pa.array([buf[i * PQ_SUBS:(i + 1) * PQ_SUBS]
                               for i in range(len(m))], pa.binary())})

    enc = res.map_batches(encode, batch_format="pyarrow")
    return cents, pq_cents, enc


def _cumcount_by(sorted_keys: np.ndarray) -> np.ndarray:
    """Position within each contiguous run of equal keys (input must
    be grouped/sorted by key)."""
    n = len(sorted_keys)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.r_[0, np.flatnonzero(np.diff(sorted_keys)) + 1]
    sizes = np.diff(np.r_[starts, n])
    return np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)



def _ivfpq_search(enc, cents, pq_cents, qids, qm, k: int,
                  n_probe: int):
    """Probe the encoded inverted lists: per-(query, probed-list)
    ADC tables broadcast once, distributed candidate scan, ONE
    driver-sized top-k reduce. Shared verbatim by the in-session
    and reloaded-index paths — same kernel, bitwise-same answer."""
    sub = qm.shape[1] // PQ_SUBS
    # probed lists + per-(query, list) ADC tables on the RESIDUAL
    # query: r_qc = q - coarse_centroid[c]
    qd = ((cents[None, :, :] - qm[:, None, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd, axis=1)[:, :n_probe]          # (nq, n_probe)
    # codebook width min(PQ_K, residual-train rows), as in the mirror
    T = np.empty((len(qids), n_probe, PQ_SUBS, pq_cents.shape[1]),
                 dtype=np.float64)
    for qi in range(len(qids)):
        for pi, c in enumerate(probes[qi]):
            r = qm[qi] - cents[c]
            for s in range(PQ_SUBS):
                T[qi, pi, s, :] = (
                    (r[s * sub:(s + 1) * sub][None, :]
                     - pq_cents[s]) ** 2).sum(axis=1)
    t_ref = ray.put((qids, probes, T))
    srange = np.arange(PQ_SUBS)

    def search(t: pa.Table) -> pa.Table:
        empty = pa.schema([("query_id", pa.int64()),
                           ("vec_id", pa.int64()),
                           ("adist", pa.float64())]).empty_table()
        if t.num_rows == 0:
            return empty
        from ccrawler_ray.spec import as_single_array

        qids_, pr, T_ = ray.get(t_ref)
        codes = np.frombuffer(
            b"".join(as_single_array(t.column("codes")).to_pylist()),
            dtype=np.uint8).reshape(t.num_rows, PQ_SUBS)
        vids = t.column("vec_id").to_numpy(zero_copy_only=False)
        clus = t.column("cluster").to_numpy(zero_copy_only=False)
        oq, ov, od = [], [], []
        for qi, qid in enumerate(qids_):
            for pi, c in enumerate(pr[qi]):
                mask = (clus == c) & (vids != qid)
                if not mask.any():
                    continue
                dist = T_[qi, pi][srange[None, :], codes[mask]].sum(axis=1)
                oq.append(np.full(int(mask.sum()), qid, dtype=np.int64))
                ov.append(vids[mask].astype(np.int64))
                od.append(dist)
        if not oq:
            return empty
        q_a, v_a, d_a = (np.concatenate(oq), np.concatenate(ov),
                         np.concatenate(od))
        # per-query (adist asc, vec_id asc) block head(k)
        order = np.lexsort((v_a, d_a, q_a))   # group by query for head
        q_a, v_a, d_a = q_a[order], v_a[order], d_a[order]
        keep = _cumcount_by(q_a) < k
        return pa.table({"query_id": pa.array(q_a[keep]),
                         "vec_id": pa.array(v_a[keep]),
                         "adist": pa.array(d_a[keep])})

    cands = enc.map_batches(search, batch_format="pyarrow")

    def reduce_all(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for _, g in df.groupby("query_id", sort=True):
            g = g.sort_values(["adist", "vec_id"]).head(k)
            parts.append(g.assign(
                rank=np.arange(1, len(g) + 1, dtype=np.int64)))
        if not parts:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "vec_id": pd.Series(dtype="int64"),
                                 "adist": pd.Series(dtype="float64"),
                                 "rank": pd.Series(dtype="int64")})
        return pd.concat(parts)

    return cands.repartition(1).map_batches(reduce_all,
                                            batch_format="pandas")


def ann_ivf_pq(sf_dir: str, num_queries: int = 5, k: int = 5,
               n_clusters: int = 16, n_probe: int = 4, iters: int = 5,
               train_mod: int = 2):
    """Approximate top-k by residual-PQ ADC distance over the n_probe
    nearest inverted lists. Returns (query_id, vec_id, adist, rank)."""
    qids, qm = _query_matrix(sf_dir, num_queries)
    cents, pq_cents, enc = _ivfpq_index(sf_dir, qm.shape[1],
                                        n_clusters, iters, train_mod)
    return _ivfpq_search(enc, cents, pq_cents, qids, qm, k, n_probe)


def ann_index_roundtrip(sf_dir: str, num_queries: int = 5, k: int = 5,
                        n_clusters: int = 16, n_probe: int = 4,
                        iters: int = 5, train_mod: int = 2,
                        num_partitions: int = 8):
    """Persistent IVF-PQ ANN index + cross-run probe.

    The trained artifacts (coarse centroids + residual-PQ codebooks)
    are written atomically as npy-bytes rows; the encoded
    (vec_id, cluster, codes) inverted lists are a partition-committed
    parquet keyed by coarse cluster (`sinks/partitioned.py`
    manifest-last commit — a rerun skips committed partitions,
    asserted in-query). The RELOADED index answers the same probes
    through the same `_ivfpq_search` kernel as `ann_ivf_pq`, so the
    rows — and the bitwise serial mirror — are identical: persistence
    changes WHERE the lists come from, never the answer."""
    import hashlib
    import io
    import os
    import shutil
    import tempfile
    from pathlib import Path

    import pyarrow.parquet as pq_

    from ccrawler_ray.sinks.partitioned import (read_partitioned,
                                                write_partitioned)

    qids, qm = _query_matrix(sf_dir, num_queries)
    cents, pq_cents, enc = _ivfpq_index(sf_dir, qm.shape[1],
                                        n_clusters, iters, train_mod)
    # pid in the key: concurrent sessions must not rmtree each other
    from ccrawler_ray.scale import prune_scratch
    prune_scratch()
    key = hashlib.blake2b(f"{sf_dir}|{os.getpid()}".encode(),
                          digest_size=6).hexdigest()
    root = Path(tempfile.gettempdir()) / f"ccrawler_ray_annidx_{key}"
    if root.exists():
        shutil.rmtree(root)
    root.mkdir(parents=True)

    def npy_bytes(a: np.ndarray) -> bytes:
        b = io.BytesIO()
        np.save(b, a)
        return b.getvalue()

    art = pa.table({
        "name": pa.array(["cents", "pq_cents"], pa.string()),
        "data": pa.array([npy_bytes(cents), npy_bytes(pq_cents)],
                         pa.binary())})
    tmp = root / "_artifacts.parquet.tmp"
    pq_.write_table(art, tmp)
    os.replace(tmp, root / "artifacts.parquet")  # atomic: commit LAST

    lists_dir = root / "lists"
    write_partitioned(enc, lists_dir, key_col="cluster",
                      num_partitions=num_partitions)
    again = write_partitioned(enc, lists_dir, key_col="cluster",
                              num_partitions=num_partitions)
    assert not again["written"], "rerun must skip committed partitions"

    art2 = pq_.read_table(root / "artifacts.parquet")
    blobs = dict(zip(art2.column("name").to_pylist(),
                     art2.column("data").to_pylist()))
    cents2 = np.load(io.BytesIO(blobs["cents"]))
    pq_cents2 = np.load(io.BytesIO(blobs["pq_cents"]))
    loaded = read_partitioned(lists_dir)

    def sel(t: pa.Table) -> pa.Table:
        # explicit columns: part=K dirs infer a hive partition column
        return pa.table({"vec_id": t.column("vec_id").cast(pa.int64()),
                         "cluster": t.column("cluster").cast(pa.int64()),
                         "codes": t.column("codes").cast(pa.binary())})

    return _ivfpq_search(loaded.map_batches(sel, batch_format="pyarrow"),
                         cents2, pq_cents2, qids, qm, k, n_probe)


def ann_recall_report(sf_dir: str, num_queries: int = 5, k: int = 5):
    """(method, n_hits, n_possible, recall): fraction of the exact
    brute-force top-k neighbor pairs each approximate index recovers —
    the quality gauge an ANN deployment monitors next to its latency.
    Each leg's result is the pipeline's own Dataset collapsed to its
    (query, vec) pair set (num_queries × k rows — driver-sized by
    construction); recall is floor-scaled to 4 decimals. Methods:
    lsh, ivf, pq, ivf_pq, sq, nsw — every approximate family in-tree."""
    def pairs(ds) -> set:
        df = ds if isinstance(ds, pd.DataFrame) else ds.to_pandas()
        return set(zip(df["query_id"].astype(int), df["vec_id"].astype(int)))

    exact = pairs(ann_topk_cosine(sf_dir, num_queries, k))
    legs = {
        "ivf": ann_ivf_topk(sf_dir, num_queries, k),
        "ivf_pq": ann_ivf_pq(sf_dir, num_queries, k),
        "lsh": ann_lsh_topk(sf_dir, num_queries, k),
        "pq": ann_pq_topk(sf_dir, num_queries, k),
        "sq": ann_sq_topk(sf_dir, num_queries, k),
        "nsw": ann_nsw_topk(sf_dir, num_queries, k),
    }
    rows = []
    denom = max(len(exact), 1)
    for method in sorted(legs):
        hits = len(pairs(legs[method]) & exact)
        rows.append((method, hits, len(exact),
                     float(np.floor(hits * 10_000.0 / denom) / 10_000)))
    tbl = pa.table({
        "method": pa.array([r[0] for r in rows], pa.string()),
        "n_hits": pa.array([r[1] for r in rows], pa.int64()),
        "n_possible": pa.array([r[2] for r in rows], pa.int64()),
        "recall": pa.array([r[3] for r in rows], pa.float64())})
    return ray.data.from_arrow(tbl)


# ---------------------------------------------------------------------------
# Distributed exact PCA over the embedding column. The Gram matrix is
# accumulated in EXACT integers: vectors quantize to int64 at
# PCA_QSCALE (|x| <= ~1, d = 64 -> per-batch q.T @ q is far from
# int64 overflow), per-batch partials reduce inside a 16-way salted
# groupby with PYTHON-INT sums (unbounded, so no row count can
# overflow), and the per-salt totals ship to the driver as signed
# hi/lo int64 limbs. The eigen-decomposition itself runs on the
# driver over the exact covariance via the FROZEN pca_finish below —
# shared by import with serial_ref.embedding_pca, so engine and
# mirror are bitwise equal iff the distributed integer Gram is exact
# (the differential).
# ---------------------------------------------------------------------------

PCA_QSCALE = float(1 << 20)
_PCA_SALTS = 16


def pca_finish(n: int, svec: list, gram_u: list, d: int) -> "pd.DataFrame":
    """FROZEN finish: exact-integer covariance numerators
    (n*G_jk - s_j*s_k as Python ints), one correctly-rounded
    big-int -> float64 conversion each, one division by the exact
    denominator, np.linalg.eigh, outputs rounded to 9 decimals.
    gram_u is the upper triangle of the raw Gram in row-major
    np.triu_indices order."""
    C = np.empty((d, d), dtype=np.float64)
    den = float(PCA_QSCALE) * float(PCA_QSCALE) * float(n) * float(n)
    iu = np.triu_indices(d)
    for t, (j, k) in enumerate(zip(iu[0], iu[1])):
        num = n * gram_u[t] - svec[j] * svec[k]
        C[j, k] = C[k, j] = float(num) / den
    evals = np.linalg.eigh(C)[0][::-1]  # descending
    tot = float(evals.sum())
    evr = evals / tot
    cum = np.cumsum(evr)
    return pd.DataFrame({
        "component": np.arange(1, d + 1, dtype=np.int64),
        "eigenvalue": np.round(evals, 9),
        "explained_var": np.round(evr, 9),
        "cum_var": np.round(cum, 9)})


def embedding_pca(sf_dir: str) -> "pd.DataFrame":
    """(component, eigenvalue, explained_var, cum_var): PCA spectrum
    of the embedding table's covariance, components ordered by
    eigenvalue descending."""
    ds = read_embeddings(sf_dir, ["vec_id", "embedding"])
    probe = ds.take(1)
    d = len(probe[0]["embedding"]) if probe else 0
    if not d:
        return pd.DataFrame({"component": pd.Series(dtype="int64"),
                             "eigenvalue": pd.Series(dtype="float64"),
                             "explained_var": pd.Series(dtype="float64"),
                             "cum_var": pd.Series(dtype="float64")})
    iu = np.triu_indices(d)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("salt", pa.int64()), ("n", pa.int64()),
                              ("svec", pa.list_(pa.int64())),
                              ("gram", pa.list_(pa.int64()))]
                             ).empty_table()
        m = _emb_matrix(t)
        q = np.round(m * PCA_QSCALE).astype(np.int64)
        g = q.T @ q
        sv = q.sum(axis=0)
        gr = g[iu]
        return pa.table({
            "salt": pa.array(
                [int(t.column("vec_id")[0].as_py()) % _PCA_SALTS],
                pa.int64()),
            "n": pa.array([t.num_rows], pa.int64()),
            "svec": pa.ListArray.from_arrays(
                pa.array(np.array([0, len(sv)], dtype=np.int32)),
                pa.array(sv, pa.int64())),
            "gram": pa.ListArray.from_arrays(
                pa.array(np.array([0, len(gr)], dtype=np.int32)),
                pa.array(gr, pa.int64()))})

    def per_salt(g: pd.DataFrame) -> pd.DataFrame:
        # Python-int exact accumulation; signed hi/lo int64 limbs out
        n = int(sum(int(x) for x in g["n"]))
        sv = [0] * d
        gr = [0] * len(iu[0])
        for svec, gram in zip(g["svec"], g["gram"]):
            for i, x in enumerate(svec):
                sv[i] += int(x)
            for i, x in enumerate(gram):
                gr[i] += int(x)
        return pd.DataFrame({
            "n": [n],
            "svec_hi": [[v >> 32 for v in sv]],
            "svec_lo": [[v & 0xFFFFFFFF for v in sv]],
            "gram_hi": [[v >> 32 for v in gr]],
            "gram_lo": [[v & 0xFFFFFFFF for v in gr]]})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("salt").map_groups(per_salt, batch_format="pandas")
             .to_pandas())
    n = int(parts["n"].astype(object).sum())
    svec = [0] * d
    gram = [0] * len(iu[0])
    for row in parts.itertuples():
        for i in range(d):
            svec[i] += (int(row.svec_hi[i]) << 32) + int(row.svec_lo[i])
        for i in range(len(gram)):
            gram[i] += (int(row.gram_hi[i]) << 32) + int(row.gram_lo[i])
    return pca_finish(n, svec, gram, d)


# ---------------------------------------------------------------------------
# cluster_kmeans: the clustering surface behind dedup_semantic / IVF,
# exposed directly — per-cluster size + EXACT inertia.
# ---------------------------------------------------------------------------


def cluster_kmeans(sf_dir: str, n_clusters: int = 16, iters: int = 5):
    """Per-cluster k-means summary over the embedding column: cluster
    id, member count, exact inertia (sum of squared distances to the
    centroid). The shared memoized quantizer trains once per session
    (kmeans_centroids — same artifact IVF/SemDeDup use); the summary
    pass is SHUFFLE-FREE: per-batch argmin assignment + (count,
    quantized int64 distance sum) partials — ≤ k rows per block reach
    the driver, vectors never move. Each squared distance quantizes
    to micro-units BEFORE summation, so the total is an exact int64
    and block order cannot change the bits (bitwise mirror:
    serial_ref.cluster_kmeans)."""
    cents = kmeans_centroids(sf_dir, k=n_clusters, iters=iters)
    c_ref = ray.put(cents)
    ds = read_embeddings(sf_dir, ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("cluster", pa.int64()), ("n", pa.int64()),
                              ("dq", pa.int64())]).empty_table()
        c = ray.get(c_ref)
        m = _emb_matrix(t)
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        dq = np.round(d2[np.arange(len(m)), a] * 1e6).astype(np.int64)
        cl, inv = np.unique(a, return_inverse=True)
        dsum = np.zeros(len(cl), dtype=np.int64)
        np.add.at(dsum, inv, dq)           # exact int64 accumulation
        return pa.table({"cluster": pa.array(cl.astype(np.int64)),
                         "n": pa.array(np.bincount(inv).astype(np.int64)),
                         "dq": pa.array(dsum)})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({"cluster": pd.Series(dtype="int64"),
                             "n_members": pd.Series(dtype="int64"),
                             "inertia": pd.Series(dtype="float64")})
    agg = parts.groupby("cluster", as_index=False).sum()
    return pd.DataFrame({
        "cluster": agg["cluster"].astype(np.int64),
        "n_members": agg["n"].astype(np.int64),
        "inertia": agg["dq"].astype(np.float64) / 1e6,
    })


# ---------------------------------------------------------------------------
# knn_graph: exact k-NN graph over the embedding column — the
# neighbor structure SemDeDup-style curation, graph-based ANN indexes
# and label propagation all start from.
# ---------------------------------------------------------------------------


def knn_graph(sf_dir: str, k: int = 5):
    """Memoized per (sf_dir, k, session): ann_nsw_topk navigates the
    same graph the query entry returns."""
    from ccrawler_ray.memo import memo_ds

    return memo_ds(("knn_graph", sf_dir, k), lambda: _knn_graph(sf_dir, k))


def _knn_graph(sf_dir: str, k: int = 5):
    """For every vector, its ``k`` nearest neighbors by cosine (self
    excluded): (vec_id, rank 1..k, nbr_id, cos). One Ray task per
    QUERY block streams the candidate blocks one object ref at a time
    (bounded memory at any n) keeping a running top-k, so no shuffle
    happens and the driver sees only the final n×k rows. Selection
    compares the 4-dp-ROUNDED cosine with nbr_id ascending as the
    tie-break — the ann_range_search reproducibility rule (a last-ulp
    BLAS difference cannot flip the neighbor set) — packed into ONE
    int64 sort key, so the whole selection is integer math. Bitwise
    mirror: serial_ref.knn_graph."""
    from ccrawler_ray.functions.dedup import (_embedding_dim, _stamp_schema,
                                              as_single_array)

    fields = [("vec_id", pa.int64()), ("rank", pa.int64()),
              ("nbr_id", pa.int64()), ("cos", pa.float64())]
    ds = read_embeddings(sf_dir, ["vec_id", "embedding"])
    dim = _embedding_dim(ds)
    if dim is None:
        return ray.data.from_arrow(pa.schema(fields).empty_table())

    def normalize(batch: pa.Table) -> pa.Table:
        emb = as_single_array(batch.column("embedding"))
        m = np.asarray(emb.flatten(), dtype=np.float64).reshape(-1, dim)
        if batch.num_rows:
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
        return pa.table(
            {"vec_id": batch.column("vec_id"),
             "norm": pa.FixedSizeListArray.from_arrays(
                 pa.array(m.ravel(), pa.float64()), dim)})

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nblocks = max(4, 2 * ncpu)
    norm = ds.map_batches(normalize, batch_format="pyarrow") \
             .repartition(nblocks).materialize()
    refs = norm.to_arrow_refs()
    kk = int(k)
    _INF = np.int64(2**62)              # worse than any real key

    @ray.remote
    def query_block(tq: pa.Table, cand_refs: list) -> pa.Table:
        # repartition pads with EMPTY blocks whose schema is dropped
        if "vec_id" not in tq.column_names or tq.num_rows == 0:
            return pa.schema(fields).empty_table()
        qi = tq.column("vec_id").to_numpy(zero_copy_only=False)
        qm = np.asarray(
            as_single_array(tq.column("norm")).flatten()).reshape(-1, dim)
        nq = len(qi)
        if nq == 0:
            return pa.schema(fields).empty_table()
        best = np.full((nq, kk), _INF, dtype=np.int64)
        for r in cand_refs:
            tc = ray.get(r)             # one candidate block at a time
            if "vec_id" not in tc.column_names or tc.num_rows == 0:
                continue
            ci = tc.column("vec_id").to_numpy(zero_copy_only=False)
            cm = np.asarray(
                as_single_array(tc.column("norm")).flatten()).reshape(-1, dim)
            qcos = np.round(qm @ cm.T * 1e4).astype(np.int64)
            # key = (-rounded_cos, nbr_id) packed into one int64:
            # cos desc then id asc, pure integer comparison
            key = (np.int64(10_000) - qcos) * np.int64(1) * np.int64(2**33) \
                + ci[None, :]
            key[qi[:, None] == ci[None, :]] = _INF      # self
            merged = np.concatenate([best, key], axis=1)
            take = min(kk, merged.shape[1])
            part = np.partition(merged, take - 1, axis=1)[:, :kk]
            best = part
        best.sort(axis=1)
        real = best < _INF
        n_per = real.sum(axis=1)
        flat = best[real]
        vec = np.repeat(qi, n_per)
        ranks = (np.arange(real.shape[1], dtype=np.int64)[None, :] + 1)
        ranks = np.broadcast_to(ranks, real.shape)[real]
        nbr = (flat & np.int64(2**33 - 1)).astype(np.int64)
        qc = np.int64(10_000) - (flat >> np.int64(33))
        return pa.table({"vec_id": pa.array(vec.astype(np.int64)),
                         "rank": pa.array(ranks),
                         "nbr_id": pa.array(nbr),
                         "cos": pa.array(qc.astype(np.float64) / 1e4)})

    out = [query_block.remote(r, list(refs)) for r in refs]
    return _stamp_schema(ray.data.from_arrow_refs(out), pa.schema(fields))


# ---------------------------------------------------------------------------
# Graph-navigation ANN (NSW-style): greedy best-first beam search over
# the exact kNN graph — the HNSW-family serving pattern, complementing
# the scan (brute/SQ), hash (LSH) and coarse-quantizer (IVF/PQ)
# families. The searcher is an ACTOR-POOL stage: each actor is an
# index REPLICA that assembles its adjacency + vector state ONCE in
# __init__ from the materialized graph's object-store blocks (driver
# moves refs, never edge bytes) and serves query batches from RAM —
# exactly how production graph-ANN replicas deploy. Scale path beyond
# one replica's RAM: IVF-shard the corpus and run one NSW per shard
# (both building blocks are in-tree).
#
# Determinism: all comparisons use the packed integer key
# (10000 − round(cos·1e4))·2^33 + vec_id — cos desc, id asc, no float
# ties — so the walk's expansion order, stop rule and final top-k are
# partitioning- and BLAS-independent; the walk kernel (`nsw_search`)
# is SHARED BY IMPORT with serial_ref.ann_nsw_topk, which feeds it the
# serially-built graph — bitwise equal iff the distributed graph and
# normalization are exact (the differential, both already pinned).
# ---------------------------------------------------------------------------


def nsw_search(qids: np.ndarray, qm: np.ndarray, ids: np.ndarray,
               m: np.ndarray, nbr_pos: list, entry_pos: int,
               ef: int, k: int) -> pd.DataFrame:
    """Frozen best-first beam search (HNSW searchLayer over one
    layer). ``nbr_pos[i]`` lists neighbor POSITIONS of position i
    (bidirectional, deduped); keys are the packed int64 (cos desc,
    id asc) — unique per vector, so heap order is total and the
    result is deterministic for ANY tie pattern."""
    import heapq

    rows = []
    for qi, qv in zip(qids, qm):
        def key_of(pos_arr: np.ndarray) -> np.ndarray:
            qcos = np.round(m[pos_arr] @ qv * 1e4).astype(np.int64)
            return (np.int64(10_000) - qcos) * np.int64(2**33) + ids[pos_arr]

        ek = int(key_of(np.array([entry_pos]))[0])
        cand = [(ek, entry_pos)]                 # min-heap: best first
        top = [(-ek, entry_pos)]                 # max-heap of ef best
        visited = {entry_pos}
        while cand:
            ckey, cpos = heapq.heappop(cand)
            if len(top) == ef and ckey > -top[0][0]:
                break
            fresh = [p for p in nbr_pos[cpos] if p not in visited]
            if not fresh:
                continue
            visited.update(fresh)
            fkeys = key_of(np.asarray(fresh, dtype=np.int64))
            for fk, fp in zip(fkeys, fresh):
                fk = int(fk)
                if len(top) < ef or fk < -top[0][0]:
                    heapq.heappush(cand, (fk, fp))
                    heapq.heappush(top, (-fk, fp))
                    if len(top) > ef:
                        heapq.heappop(top)
        # self is excluded from the RESULT (the ann_* convention) but
        # stays in the walk — it is the best possible waypoint
        best = [kv for kv in sorted(-t[0] for t in top)
                if int(kv & np.int64(2**33 - 1)) != int(qi)][:k]
        for r, kv in enumerate(best, 1):
            rows.append((int(qi), r, int(kv & np.int64(2**33 - 1)),
                         float(np.int64(10_000) - (kv >> np.int64(33))) / 1e4))
    return pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "cos"])


def adjacency_from_edges(ids: np.ndarray, src: np.ndarray,
                         dst: np.ndarray) -> list:
    """Bidirectional position adjacency from (vec_id → nbr_id) edges:
    both directions, deduped, ascending — the frozen assembly rule
    shared by the engine replicas and the serial mirror."""
    pos = {int(v): i for i, v in enumerate(ids)}
    sp = np.fromiter((pos[int(v)] for v in src), np.int64, count=len(src))
    dp = np.fromiter((pos[int(v)] for v in dst), np.int64, count=len(dst))
    a = np.concatenate([np.stack([sp, dp]), np.stack([dp, sp])], axis=1)
    order = np.lexsort((a[1], a[0]))
    s, d = a[0][order], a[1][order]
    keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
    s, d = s[keep], d[keep]
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    bounds = np.r_[starts, len(s)]
    out: list = [np.empty(0, np.int64)] * len(ids)
    for i, st in enumerate(starts):
        out[int(s[st])] = d[st:bounds[i + 1]]
    return out


class NSWSearcher:
    """Index replica: adjacency + normalized vectors assembled once
    per actor from object-store refs (graph) and a direct parquet read
    (vectors) — zero driver bytes, the stateful-stage pattern."""

    def __init__(self, sf_dir: str, edge_refs: list, ef: int, k: int):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        self.ids = ids[order].astype(np.int64)
        from ccrawler_ray.functions.dedup import as_single_array

        mat = np.asarray(as_single_array(t.column("embedding")).flatten(),
                         dtype=np.float64).reshape(len(ids), -1)[order]
        self.m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        tabs = []
        for b in ray.get(list(edge_refs)):
            # _stamp_schema appends one typed empty PANDAS block
            if isinstance(b, pd.DataFrame):
                b = pa.Table.from_pandas(b, preserve_index=False)
            if b.num_rows:
                tabs.append(b.select(["vec_id", "nbr_id"]))
        edges = pa.concat_tables(tabs)
        self.nbr = adjacency_from_edges(
            self.ids,
            edges.column("vec_id").to_numpy(zero_copy_only=False),
            edges.column("nbr_id").to_numpy(zero_copy_only=False))
        self.entry = 0                      # position of min vec_id
        self.ef, self.k = ef, k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        qids = df["vec_id"].to_numpy()
        qm = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        return nsw_search(qids, qm, self.ids, self.m, self.nbr,
                          self.entry, self.ef, self.k)


def ann_nsw_topk(sf_dir: str, num_queries: int = 5, k: int = 5,
                 graph_k: int = 5, ef: int = 32):
    """(query_id, rank, vec_id, cos): NSW greedy beam search over the
    exact kNN graph, served by an actor-pool of index replicas."""
    knn = knn_graph(sf_dir, graph_k)        # memoized, materialized
    if knn.count() == 0:
        return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64"),
                             "vec_id": pd.Series(dtype="int64"),
                             "cos": pd.Series(dtype="float64")})
    edge_refs = knn.to_arrow_refs()
    queries = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < num_queries)
    return queries.map_batches(
        NSWSearcher, batch_format="pandas", concurrency=2,
        fn_constructor_kwargs={"sf_dir": sf_dir, "edge_refs": edge_refs,
                               "ef": ef, "k": k})


# ---------------------------------------------------------------------------
# Hybrid lexical+vector search — the RAG-style retrieval fusion: BM25
# over the text column fused with cosine similarity over the embedding
# column. Two narrow legs (the shared bm25 tf/dl leg at doc
# cardinality, a one-pass cosine scan at vector cardinality) meet in a
# size-seamed int64 join; text and vectors never cross a shuffle.
# Frozen semantics (shared with the serial mirror, bitwise): bm25
# score via the frozen _bm25_score_cols kernel; cos ROUNDED to 4 dp
# (the ann_range_search reproducibility convention); hybrid =
# 0.5*(bm25/(1+bm25)) + 0.5*cos4; top-k by (hybrid desc, doc_id asc).
# ---------------------------------------------------------------------------

HYBRID_TERMS = ("join", "merge", "sort", "fast")
HYBRID_QVEC_N = 8      # query vector = mean of embeddings vec_id < N
HYBRID_K = 20


def hybrid_qvec(sf_dir: str, n: int = HYBRID_QVEC_N) -> np.ndarray:
    """FROZEN query vector: the normalized mean of the first ``n``
    embeddings (a pruned n-row read — never the full table)."""
    _, qm = _query_matrix(sf_dir, n)
    q = qm.astype(np.float64).mean(axis=0)
    return q / np.linalg.norm(q)


def ann_hybrid_search(sf_dir: str, terms: tuple = HYBRID_TERMS,
                      k: int = HYBRID_K, qvec_n: int = HYBRID_QVEC_N):
    """(doc_id, bm25, cos, hybrid, rank): top-k docs by the fused
    lexical+vector score, over docs that have an embedding
    (vec_id == doc_id on the conformance tables)."""
    from ccrawler_ray.functions.text import (
        _bm25_score_cols, bm25_idf_stats, bm25_tf_dl_ds)
    from ccrawler_ray.relational import _join_auto, _rows_hint, _typed

    m = len(terms)
    inter = bm25_tf_dl_ds(sf_dir, terms)
    n_docs, total_len, idf = bm25_idf_stats(inter, m)
    qn_ref = ray.put(hybrid_qvec(sf_dir, qvec_n))

    def bm25_all(batch: pa.Table) -> pa.Table:
        dids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        dl = batch.column("dl").to_numpy(zero_copy_only=False)
        tf = np.stack([batch.column(f"tf_{j}").to_numpy(zero_copy_only=False)
                       for j in range(m)], axis=1)
        s = _bm25_score_cols(tf, dl, idf, n_docs, total_len)
        return pa.table({
            "doc_id": pa.array(np.r_[dids, [-1]].astype(np.int64)),
            "bm25": pa.array(np.r_[s, [0.0]])})

    scores = inter.map_batches(bm25_all, batch_format="pyarrow")

    def cos_leg(t: pa.Table) -> pa.Table:
        qn = ray.get(qn_ref)
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([-1], pa.int64()),
                             "cos": pa.array([0.0])})
        mm = _emb_matrix(t)
        mm /= np.linalg.norm(mm, axis=1, keepdims=True)
        cos4 = np.round(mm @ qn, 4)
        vids = t.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(np.r_[vids, [-1]].astype(np.int64)),
            "cos": pa.array(np.r_[cos4, [0.0]])})

    vecs = read_embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(
        cos_leg, batch_format="pyarrow")
    joined = _join_auto(scores, vecs, "doc_id", "vec_id",
                        _rows_hint(sf_dir, "embeddings"))

    def fuse(t: pa.Table) -> pa.Table:
        m = t.column("doc_id").to_numpy(zero_copy_only=False) >= 0
        b = t.column("bm25").to_numpy(zero_copy_only=False)[m] \
            .astype(np.float64)
        c = t.column("cos").to_numpy(zero_copy_only=False)[m] \
            .astype(np.float64)
        return pa.table({
            "doc_id": pa.array(t.column("doc_id").to_numpy(
                zero_copy_only=False)[m].astype(np.int64)),
            "bm25": pa.array(b), "cos": pa.array(c),
            "hybrid": pa.array(0.5 * (b / (1.0 + b)) + 0.5 * c)})

    out = (joined.map_batches(fuse, batch_format="pyarrow")
           .sort(["hybrid", "doc_id"], descending=[True, False]).limit(k))

    def ranked(t: pa.Table) -> pa.Table:
        return t.append_column("rank", pa.array(
            np.arange(1, t.num_rows + 1, dtype=np.int64)))

    # one block after limit(k) → the rank assignment is global
    return _typed(out.repartition(1).map_batches(ranked, batch_format="pyarrow"),
                  [("doc_id", pa.int64()), ("bm25", pa.float64()),
                   ("cos", pa.float64()), ("hybrid", pa.float64()),
                   ("rank", pa.int64())])
