"""Mergeable-sketch operators: the scale-path answers to exact wide
aggregations (SURVEY.md §2 training-data toolkit).

Both sketches here are ORDER-INDEPENDENT merges (register max / bin
sum), so the distributed result is bitwise equal to the serial mirror
in ``serial_ref`` no matter how Ray schedules or sizes blocks — the
property that makes them oracle-checkable. The pattern: map_batches
partials (one small fixed-size state per block), single-block reduce
(state is KB-sized — the whole point of a sketch), driver never sees
row-level data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ccrawler_ray.scale import read_docs, sized_read

from ccrawler_ray.spec import hash64_batch

HLL_P = 12                      # 2^12 = 4096 registers, ~1.6% std err
HLL_M = 1 << HLL_P
HLL_SEED = 31


def _hll_alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(keys: np.ndarray) -> np.ndarray:
    """(HLL_M,) uint8 register array for a batch of string keys."""
    h = hash64_batch([str(k) for k in keys.tolist()], seed=HLL_SEED)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = h << np.uint64(HLL_P)            # remaining 64-P bits, left-aligned
    # rho = leading-zero count of w within 64-P bits, +1; w==0 → max
    nz = w != 0
    lz = np.full(len(h), 64 - HLL_P, dtype=np.int64)
    # float64 log2 is exact for the leading-bit position of a uint64
    # except above 2^53 — use bit-length via conversion loop-free:
    # position of highest set bit = 63 - floor(log2(w)) is unsafe for
    # w near 2^64; instead shift down to 32-bit halves
    hi = (w >> np.uint64(32)).astype(np.uint32)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    bl_hi = np.zeros(len(h), dtype=np.int64)
    bl_lo = np.zeros(len(h), dtype=np.int64)
    m_hi = hi != 0
    m_lo = lo != 0
    bl_hi[m_hi] = np.floor(np.log2(hi[m_hi].astype(np.float64))).astype(np.int64) + 1
    bl_lo[m_lo] = np.floor(np.log2(lo[m_lo].astype(np.float64))).astype(np.int64) + 1
    bitlen = np.where(m_hi, bl_hi + 32, bl_lo)     # bits in w
    lz[nz] = 64 - bitlen[nz]
    rho = np.minimum(lz + 1, 64 - HLL_P + 1).astype(np.uint8)
    regs = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> int:
    """Classic HLL estimator + linear-counting small-range correction,
    floored to int (identical arithmetic in serial_ref)."""
    m = float(HLL_M)
    est = _hll_alpha(HLL_M) * m * m / np.sum(
        np.power(2.0, -regs.astype(np.float64))
    )
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return int(np.floor(est))


def g5_hll_distinct(sf_dir: str):
    """Approximate distinct users per event_type via HyperLogLog —
    the shuffle-free scale path beside exact ``g4_distinct_counts``:
    only 4 KiB of registers per (block, type) moves, never user ids."""
    ds = sized_read(f"{sf_dir}/events.parquet", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ue = np.unique(et)
        return pa.table({
            "event_type": pa.array(ue),
            "regs": pa.array([hll_registers(uid[et == e]).tobytes()
                              for e in ue], pa.binary())})

    def reduce_all(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        blobs = t.column("regs").to_pylist()
        out_e, out_n = [], []
        for e in np.unique(et):
            regs = np.zeros(HLL_M, dtype=np.uint8)
            for b in np.asarray(blobs, dtype=object)[et == e]:
                regs = np.maximum(regs, np.frombuffer(b, dtype=np.uint8))
            out_e.append(e)
            out_n.append(int(hll_estimate(regs)))
        return pa.table({"event_type": pa.array(out_e, pa.string()),
                         "est_users": pa.array(out_n, pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(reduce_all, batch_format="pyarrow")
    )


QUANT_BINS = 8192
QUANTS = (0.5, 0.9, 0.99)


def g7_quantile_hist(sf_dir: str):
    """Approximate quantiles of o_totalprice via a fixed-bin histogram
    — quantiles WITHOUT a global sort: an exact min/max pass sizes the
    bins, per-block bincounts merge by addition (order-independent),
    and the quantile is the upper edge of the first bin whose
    cumulative count reaches q*n. Error <= one bin width (tested)."""
    ds = sized_read(f"{sf_dir}/orders.parquet", ["o_totalprice"])
    lohi = ds.aggregate(ray.data.aggregate.Min("o_totalprice"),
                        ray.data.aggregate.Max("o_totalprice"))
    lo, hi = float(lohi["min(o_totalprice)"]), float(lohi["max(o_totalprice)"])
    width = (hi - lo) / QUANT_BINS or 1.0

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)             .astype(np.float64)
        b = np.minimum(((v - lo) / width).astype(np.int64), QUANT_BINS - 1)
        counts = np.bincount(b, minlength=QUANT_BINS).astype(np.int64)
        return pa.table({"counts": pa.array([counts.tobytes()],
                                            pa.binary())})

    def reduce_all(t: pa.Table) -> pa.Table:
        total = np.zeros(QUANT_BINS, dtype=np.int64)
        for b in t.column("counts").to_pylist():
            total += np.frombuffer(b, dtype=np.int64)
        cum = np.cumsum(total)
        n = int(cum[-1])
        qs, vals = [], []
        for q in QUANTS:
            bin_i = int(np.searchsorted(cum, int(np.ceil(q * n))))
            qs.append(q)
            vals.append(float(np.round(lo + (bin_i + 1) * width, 4)))
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "est_value": pa.array(vals, pa.float64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(reduce_all, batch_format="pyarrow")
    )


def g8_grouped_quantiles(sf_dir: str):
    """Per-event_type approximate value quantiles via per-group
    histograms — the grouped form of g7: one exact min/max pass sizes
    shared bins, per-block (group, bincount) partials merge by
    addition, one small reduce answers every group's quantiles."""
    ds = sized_read(f"{sf_dir}/events.parquet", ["event_type", "value"])
    lohi = ds.aggregate(ray.data.aggregate.Min("value"),
                        ray.data.aggregate.Max("value"))
    lo, hi = float(lohi["min(value)"]), float(lohi["max(value)"])
    width = (hi - lo) / QUANT_BINS or 1.0

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False)             .astype(np.float64)
        ue = np.unique(et)
        blobs = []
        for e in ue:
            v = val[et == e]
            b = np.minimum(((v - lo) / width).astype(np.int64),
                           QUANT_BINS - 1)
            blobs.append(np.bincount(b, minlength=QUANT_BINS)
                         .astype(np.int64).tobytes())
        return pa.table({"event_type": pa.array(ue),
                         "counts": pa.array(blobs, pa.binary())})

    def reduce_all(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        blobs = np.asarray(t.column("counts").to_pylist(), dtype=object)
        out_e, out_q, out_v = [], [], []
        for e in np.unique(et):
            total = np.zeros(QUANT_BINS, dtype=np.int64)
            for b in blobs[et == e]:
                total += np.frombuffer(b, dtype=np.int64)
            cum = np.cumsum(total)
            n = int(cum[-1])
            for q in QUANTS:
                bin_i = int(np.searchsorted(cum, int(np.ceil(q * n))))
                out_e.append(e)
                out_q.append(q)
                out_v.append(float(np.round(lo + (bin_i + 1) * width, 4)))
        return pa.table({"event_type": pa.array(out_e, pa.string()),
                         "q": pa.array(out_q, pa.float64()),
                         "est_value": pa.array(out_v, pa.float64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(reduce_all, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# G11: count-min sketch term-frequency estimation — the fixed-memory
# scale path beside exact o7_wordcount_topk. Per-block partial = one
# D×W int64 counter matrix (32 KiB) built with bincount; merge is
# elementwise addition (order-independent ⇒ bitwise equal to the
# serial mirror at any partitioning); point queries never touch rows.
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 1024
# fixed query set: frequent terms + one absent probe ("zeppelin") to
# show the sketch's one-sided error (estimate >= truth, 0 only if no
# colliding mass)
CMS_TERMS = ("join", "hash", "row", "batch", "scan", "vector", "spark",
             "zeppelin")


def cms_cols(whs: np.ndarray, row: int) -> np.ndarray:
    """FROZEN column map (mirrored in serial_ref.g11_countmin_est):
    splitmix64(word_hash + row + 1) mod W."""
    from ccrawler_ray.functions.graph import _splitmix64

    return (_splitmix64(whs + np.uint64(row + 1))
            % np.uint64(CMS_W)).astype(np.int64)


def g11_countmin_est(sf_dir: str):
    """Estimated global counts for the fixed CMS_TERMS query set via a
    merged count-min sketch over all document terms."""
    from ccrawler_ray.functions.dedup import word_hashes

    ds = read_docs(sf_dir, ["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        flat = [w for t in batch.column("text").to_pylist()
                for w in t.split()]
        cms = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        if flat:
            whs = word_hashes(flat)
            for r in range(CMS_D):
                cms[r] = np.bincount(cms_cols(whs, r), minlength=CMS_W)
        return pa.table({"cms": pa.array([cms.tobytes()], pa.binary())})

    def reduce_all(t: pa.Table) -> pa.Table:
        cms = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        for b in t.column("cms").to_pylist():
            cms += np.frombuffer(b, dtype=np.int64).reshape(CMS_D, CMS_W)
        qh = word_hashes(list(CMS_TERMS))
        est = np.min(
            np.stack([cms[r, cms_cols(qh, r)] for r in range(CMS_D)]),
            axis=0)
        return pa.table({"term": pa.array(list(CMS_TERMS), pa.string()),
                         "est_n": pa.array(est.astype(np.int64))})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(reduce_all, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# G16: exact heavy hitters, two narrow passes, NO term shuffle — the
# scale pattern for "which tokens dominate the corpus" (vocabulary
# pruning, stop-list induction, contamination tokens). The result is
# EXACT, so the oracle is plain SQL.
# ---------------------------------------------------------------------------

HH_K = 32    # report terms with cnt * HH_K > total tokens (> 1/32 mass)


def g16_heavy_hitters(sf_dir: str, k: int = HH_K):
    """(term, cnt): every term whose exact corpus count satisfies
    cnt * k > total_tokens.

    Pass 1 prunes per block: a globally heavy term must be locally
    heavy (cnt_b * k > n_b) in >= 1 block — otherwise summing the
    per-block bounds gives cnt * k <= n, contradiction — so the union
    of local heavy hitters (< k terms per block by construction) is a
    complete candidate superset; only those terms reach the driver.
    Pass 2 broadcasts the candidate list (ray.put once) and reduces
    per-block exact candidate counts + block token totals — an
    order-independent int64 merge — then filters exactly.
    """
    import ray

    ds = read_docs(sf_dir, ["text"])

    def local_heavy(batch: pa.Table) -> pa.Table:
        flat = [w for t in batch.column("text").to_pylist()
                for w in t.split()]
        if not flat:
            return pa.table({"term": pa.array([], pa.string())})
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        keep = cnt * k > len(flat)
        return pa.table({"term": pa.array(uniq[keep], pa.string())})

    cand_df = ds.map_batches(local_heavy, batch_format="pyarrow").to_pandas()
    # zero local heavies anywhere (legal: a flat term distribution at
    # large blocks) → Ray drops the empty blocks' schema entirely
    cand = (np.unique(cand_df["term"].to_numpy())
            if "term" in cand_df.columns else np.empty(0, dtype=object))
    cand_ref = ray.put(cand)

    def count_partial(batch: pa.Table) -> pd.DataFrame:
        # SPARSE partials — (candidate index, count) pairs for the
        # candidates actually present in the batch plus one idx=-1 row
        # carrying the block token total, so reduce volume is linear in
        # occurrences, not |candidates| x |blocks|
        cl = ray.get(cand_ref)
        flat = [w for t in batch.column("text").to_pylist()
                for w in t.split()]
        idx = np.array([-1], dtype=np.int64)
        cnt = np.array([len(flat)], dtype=np.int64)
        if flat and len(cl):
            codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
            bc = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
            pos = pd.Index(cl).get_indexer(uniq)
            m = pos >= 0
            idx = np.r_[pos[m], idx]
            cnt = np.r_[bc[m], cnt]
        return pd.DataFrame({"idx": idx, "cnt": cnt})

    def reduce_all(t: pa.Table) -> pa.Table:
        cl = ray.get(cand_ref)
        sel = t.column("idx").to_numpy(zero_copy_only=False)
        cn = t.column("cnt").to_numpy(zero_copy_only=False)
        n = int(cn[sel < 0].sum())
        tot = np.zeros(len(cl), dtype=np.int64)
        m = sel >= 0
        np.add.at(tot, sel[m], cn[m])
        keep = tot * k > n
        return pa.table({"term": pa.array(cl[keep].tolist(), pa.string()),
                         "cnt": pa.array(tot[keep].astype(np.int64))})

    return (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(reduce_all, batch_format="pyarrow")
    )
