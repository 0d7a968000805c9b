"""Serial, Ray-free differential oracles for the non-SQL-expressible
queries (sketches, ANN, stateful crawl).

Each function recomputes its query's result with a straight-line
single-process implementation — same frozen primitives (seeded hash /
permutation formulas, spec functions) but none of the distributed
machinery (no Ray, no shuffles, no actor pools, no blocking/banding) —
so a comparison against the Ray pipeline exercises exactly the
distribution logic. This mirrors the tests/refsim.py strategy
(SURVEY.md §5.2); here the results are rendered as self-contained
DuckDB ``VALUES`` SQL via :func:`values_sql` so the driver's standard
rows/schema/value-hash machinery applies (VERDICT r1 §Next-round #9).

The oracle scale factor is fixed by the driver contract (sf=0.01);
override with ``GRAFT_ORACLE_SF_DIR`` when experimenting locally.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

def oracle_sf_dir() -> str:
    """Resolved at call time so tests can point the oracles at a
    different scale factor via GRAFT_ORACLE_SF_DIR."""
    return os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


_M61 = (1 << 61) - 1


# ---------------------------------------------------------------------------
# SQL rendering
# ---------------------------------------------------------------------------


def values_sql(df: pd.DataFrame, types: dict[str, str]) -> str:
    """Render a small DataFrame as self-contained DuckDB SQL
    (``SELECT ... FROM (VALUES ...)``) with explicit casts — no
    filesystem or view dependencies, so it runs under any DuckDB
    configuration the driver uses."""
    cols = list(df.columns)

    def lit(v, t: str) -> str:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "NULL"
        if t == "VARCHAR":
            return "'" + str(v).replace("'", "''") + "'"
        if t == "DOUBLE":
            # Bare decimal literals go through DuckDB's DECIMAL parser
            # and can land 1 ulp off; the VARCHAR->DOUBLE cast uses the
            # exact round-trip float parser (repr is shortest-roundtrip).
            return f"CAST('{float(v)!r}' AS DOUBLE)"
        if t == "BOOLEAN":
            return "true" if v else "false"
        return str(int(v))

    if not len(df):
        sel = ", ".join(f"CAST(NULL AS {types[c]}) AS {c}" for c in cols)
        return f"SELECT {sel} WHERE FALSE"
    rows = ",".join(
        "(" + ",".join(lit(v, types[c]) for v, c in zip(r, cols)) + ")"
        for r in df.itertuples(index=False, name=None)
    )
    casts = ", ".join(f"CAST({c} AS {types[c]}) AS {c}" for c in cols)
    return f"SELECT {casts} FROM (VALUES {rows}) AS t({', '.join(cols)})"


# ---------------------------------------------------------------------------
# shared frozen primitives (formula-identical to the engine, by design)
# ---------------------------------------------------------------------------


def _docs(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return t.column("doc_id").to_pylist(), t.column("text").to_pylist()


def _embeddings(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
    ids = df["vec_id"].to_numpy()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


def _whash(w: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"
    )


def _word_hash_set(text: str) -> np.ndarray:
    return np.array(sorted(_whash(w) for w in set(text.split())), dtype=np.uint64)


def _minhash_params(num_perm: int = 64, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M61, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _M61, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _minhash_sig(hs: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(hs) == 0:
        return np.full(len(a), _M61, dtype=np.uint64)
    return ((a[:, None] * hs[None, :] + b[:, None]) % np.uint64(_M61)).min(axis=1)


def _fnv_band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    r = len(sig) // bands
    chunks = sig[: bands * r].reshape(bands, r)
    h = np.full(bands, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for j in range(r):
        h = (h ^ chunks[:, j]) * prime
    return h


# ---------------------------------------------------------------------------
# text references
# ---------------------------------------------------------------------------


def doc_fingerprint(sf_dir: str | None = None, k: int = 8) -> pd.DataFrame:
    sf_dir = sf_dir or oracle_sf_dir()
    ids, texts = _docs(sf_dir)
    fps = []
    for text in texts:
        words = text.split()
        if len(words) < k:
            shingles = [" ".join(words)]
        else:
            shingles = [" ".join(words[i: i + k]) for i in range(len(words) - k + 1)]
        fps.append(min(_whash(s) for s in shingles))
    return pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                         "fingerprint": np.array(fps, dtype=np.uint64)})


# ---------------------------------------------------------------------------
# sketch dedup references (all-pairs serial — no banding, no shuffles)
# ---------------------------------------------------------------------------


def _simhash(hs: np.ndarray) -> int:
    if len(hs) == 0:
        return 0
    # int64 vote math: uint64 bit counts would WRAP negative votes to
    # huge positives (>0 spuriously true) — the r1 engine had exactly
    # that bug; the signed form is the correct simhash
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    votes = bits.sum(axis=0) * 2 - len(hs)
    out = np.uint64(0)
    for b in np.nonzero(votes > 0)[0]:
        out |= np.uint64(1) << np.uint64(b)
    return int(out)


def dedup_simhash(sf_dir: str | None = None, max_hamming: int = 3) -> pd.DataFrame:
    sf_dir = sf_dir or oracle_sf_dir()
    ids, texts = _docs(sf_dir)
    sh = np.array([_simhash(_word_hash_set(t)) for t in texts], dtype=np.uint64)
    ids = np.array(ids, dtype=np.int64)
    order = np.argsort(ids)
    ids, sh = ids[order], sh[order]
    ia, ib = np.triu_indices(len(ids), k=1)
    x = sh[ia] ^ sh[ib]
    from ccrawler_ray.functions.dedup import _popcount64
    ham = _popcount64(np.asarray(x, dtype=np.uint64))
    m = ham <= max_hamming
    return pd.DataFrame({"doc_a": ids[ia[m]], "doc_b": ids[ib[m]],
                         "hamming": ham[m].astype(np.int64)})


def _lsh_candidates(sigs: np.ndarray, bands: int) -> set[tuple[int, int]]:
    """Index pairs sharing >= 1 band bucket (FNV band hashes)."""
    n = len(sigs)
    bh = np.stack([_fnv_band_hashes(sigs[i], bands) for i in range(n)])
    pairs: set[tuple[int, int]] = set()
    for b in range(bands):
        buckets: dict[int, list[int]] = {}
        for i, h in enumerate(bh[:, b]):
            buckets.setdefault(int(h), []).append(i)
        for members in buckets.values():
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    pairs.add((members[x], members[y]))
    return pairs


def _doc_signatures(sf_dir: str, num_perm: int):
    ids, texts = _docs(sf_dir)
    a, b = _minhash_params(num_perm)
    wsets = [_word_hash_set(t) for t in texts]
    sigs = np.stack([_minhash_sig(h, a, b) for h in wsets])
    return np.array(ids, dtype=np.int64), wsets, sigs


def dedup_minhash_lsh(sf_dir: str | None = None, num_perm: int = 64,
                      bands: int = 16, threshold: float = 0.8) -> pd.DataFrame:
    sf_dir = sf_dir or oracle_sf_dir()
    ids, _, sigs = _doc_signatures(sf_dir, num_perm)
    rows = []
    for i, j in _lsh_candidates(sigs, bands):
        est = float((sigs[i] == sigs[j]).mean())
        if est >= threshold:
            a, b = int(ids[i]), int(ids[j])
            rows.append((min(a, b), max(a, b), float(np.round(est, 4))))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_jaccard"]) \
        if rows else pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})


def dedup_lsh_verified(sf_dir: str | None = None, num_perm: int = 64,
                       bands: int = 16, threshold: float = 0.8) -> pd.DataFrame:
    sf_dir = sf_dir or oracle_sf_dir()
    ids, wsets, sigs = _doc_signatures(sf_dir, num_perm)
    sets = [frozenset(w.tolist()) for w in wsets]
    rows = []
    for i, j in _lsh_candidates(sigs, bands):
        inter = len(sets[i] & sets[j])
        union = len(sets[i]) + len(sets[j]) - inter
        jac = inter / union if union else 0.0
        if jac >= threshold:
            a, b = int(ids[i]), int(ids[j])
            rows.append((min(a, b), max(a, b), float(np.floor(jac * 10000) / 10000)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]) \
        if rows else pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})


def _pair_doc_rollup(pairs: pd.DataFrame, metric: str,
                     out_metric: str) -> pd.DataFrame:
    """Shared rollup rule for pair-stream queries (kept in lockstep
    with functions.dedup._pairs_doc_rollup): per doc, the number of
    pairs touching it and the max metric. Metrics are already rounded/
    floor-scaled to 4 decimals upstream, so max is bitwise-stable."""
    if not len(pairs):
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_pairs": pd.Series(dtype="int64"),
                             out_metric: pd.Series(dtype="float64")})
    long = pd.DataFrame({
        "doc_id": np.concatenate([pairs["doc_a"].to_numpy(),
                                  pairs["doc_b"].to_numpy()]).astype(np.int64),
        metric: np.concatenate([pairs[metric].to_numpy()] * 2)})
    g = long.groupby("doc_id", as_index=False).agg(
        n_pairs=(metric, "size"), **{out_metric: (metric, "max")})
    return g.astype({"doc_id": "int64", "n_pairs": "int64"})


def dedup_minhash_lsh_rollup(sf_dir: str | None = None, num_perm: int = 64,
                             bands: int = 16, threshold: float = 0.8
                             ) -> pd.DataFrame:
    """Mirror of the sink-or-rollup query surface: per-doc rollup of
    the LSH candidate pair stream."""
    return _pair_doc_rollup(
        dedup_minhash_lsh(sf_dir, num_perm, bands, threshold),
        "est_jaccard", "max_est_jaccard")


def dedup_lsh_verified_rollup(sf_dir: str | None = None, num_perm: int = 64,
                              bands: int = 16, threshold: float = 0.8
                              ) -> pd.DataFrame:
    return _pair_doc_rollup(
        dedup_lsh_verified(sf_dir, num_perm, bands, threshold),
        "jaccard", "max_jaccard")


def dedup_containment(sf_dir: str | None = None, num_perm: int = 64,
                      bands: int = 16, threshold: float = 0.8
                      ) -> pd.DataFrame:
    """Serial mirror of functions.dedup.dedup_containment — same
    LSH candidate set, exact |A∩B| / min(|A|,|B|) filter."""
    sf_dir = sf_dir or oracle_sf_dir()
    ids, wsets, sigs = _doc_signatures(sf_dir, num_perm)
    sets = [frozenset(w.tolist()) for w in wsets]
    rows = []
    for i, j in _lsh_candidates(sigs, bands):
        inter = len(sets[i] & sets[j])
        denom = min(len(sets[i]), len(sets[j]))
        c = inter / denom if denom else 0.0
        if c >= threshold:
            a, b = int(ids[i]), int(ids[j])
            rows.append((min(a, b), max(a, b),
                         float(np.floor(c * 10000) / 10000)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "containment"]) \
        if rows else pd.DataFrame(
            {"doc_a": [], "doc_b": [], "containment": []})


# ---------------------------------------------------------------------------
# ANN references
# ---------------------------------------------------------------------------


def _topk(rows: pd.DataFrame, k: int) -> pd.DataFrame:
    out = []
    for qid, g in rows.groupby("query_id", sort=True):
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        out.append(g.assign(
            rank=np.arange(1, len(g) + 1, dtype=np.int64),
            cos=np.round(g["cos"].to_numpy(), 4),
            query_id=g["query_id"].astype(np.int64),
            vec_id=g["vec_id"].astype(np.int64),
        ))
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        {"query_id": [], "vec_id": [], "cos": [], "rank": []}
    )


def ann_lsh_topk(sf_dir: str | None = None, num_queries: int = 5, k: int = 5,
                 num_planes: int = 6, num_tables: int = 8, seed: int = 42):
    sf_dir = sf_dir or oracle_sf_dir()
    ids, mat = _embeddings(sf_dir)
    dim = mat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim))
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    weights = 1 << np.arange(num_planes)
    sig = (np.einsum("tpd,nd->tnp", planes, norm) > 0)
    buckets = (sig * weights).sum(axis=2)                  # (T, n)
    qmask = ids < num_queries
    rows = []
    for qi in np.nonzero(qmask)[0]:
        qid = int(ids[qi])
        cand = np.zeros(len(ids), dtype=bool)
        for t in range(num_tables):
            cand |= buckets[t] == buckets[t, qi]
        cand[qi] = False
        cand &= ids != qid
        if cand.any():
            rows.append(pd.DataFrame(
                {"query_id": qid, "vec_id": ids[cand],
                 "cos": norm[cand] @ norm[qi]}
            ))
    rows = pd.concat(rows, ignore_index=True) if rows else pd.DataFrame(
        {"query_id": [], "vec_id": [], "cos": []}
    )
    return _topk(rows, k)


def kmeans_centroids(sf_dir: str | None = None, k: int = 16, iters: int = 5):
    """Serial Lloyd's with the engine's order-insensitive quantized
    int64 partial sums (similarity.KMEANS_QSCALE) — bitwise equal."""
    sf_dir = sf_dir or oracle_sf_dir()
    from ccrawler_ray.functions.similarity import KMEANS_QSCALE

    ids, mat = _embeddings(sf_dir)
    cents = mat[np.argsort(ids)][:k].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        new = cents.copy()
        q = np.round(mat * KMEANS_QSCALE).astype(np.int64)
        for ci in range(len(cents)):
            sel = assign == ci
            n = int(sel.sum())
            if n:
                new[ci] = q[sel].sum(axis=0) / (KMEANS_QSCALE * n)
        cents = new
    return cents


def ann_ivf_topk(sf_dir: str | None = None, num_queries: int = 5, k: int = 5,
                 n_clusters: int = 16, n_probe: int = 4):
    sf_dir = sf_dir or oracle_sf_dir()
    ids, mat = _embeddings(sf_dir)
    cents = kmeans_centroids(sf_dir, k=n_clusters)
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    qmask = ids < num_queries
    qd = ((cents[None, :, :] - mat[qmask][:, None, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd, axis=1)[:, :n_probe]
    rows = []
    for qi, row_i in enumerate(np.nonzero(qmask)[0]):
        qid = int(ids[row_i])
        mask = np.isin(assign, probes[qi]) & (ids != qid)
        if mask.any():
            rows.append(pd.DataFrame(
                {"query_id": qid, "vec_id": ids[mask],
                 "cos": norm[mask] @ norm[row_i]}
            ))
    rows = pd.concat(rows, ignore_index=True) if rows else pd.DataFrame(
        {"query_id": [], "vec_id": [], "cos": []}
    )
    return _topk(rows, k)


# ---------------------------------------------------------------------------
# multimodal reference (fake decode is deterministic by construction)
# ---------------------------------------------------------------------------


def decode_media_meta(sf_dir: str | None = None) -> pd.DataFrame:
    sf_dir = sf_dir or oracle_sf_dir()
    ids, texts = _docs(sf_dir)
    rows = []
    for i, text in zip(ids, texts):
        payload = text.encode("utf-8")
        mt = "image" if i % 2 == 0 else "audio"
        h = hashlib.blake2b(payload, digest_size=4).digest()
        rows.append((int(i), mt, len(payload), 64 + h[0],
                     64 + h[1] if mt == "image" else 1, "fake"))
    return pd.DataFrame(
        rows, columns=["doc_id", "media_type", "n_bytes", "width", "height", "decoder"]
    )


# ---------------------------------------------------------------------------
# crawl reference (tests/refsim.py — the executable serial oracle)
# ---------------------------------------------------------------------------


def crawl_docs_out(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial refsim crawl with the _crawl_docs_out config — the
    crawl-order audit columns."""
    sf_dir = sf_dir or oracle_sf_dir()
    import importlib.util
    from pathlib import Path

    from ccrawler_ray.config import CrawlConfig
    from ccrawler_ray.sources.corpus import corpus_from_documents, default_seeds

    import sys

    p = Path(__file__).resolve().parent.parent / "tests" / "refsim.py"
    spec = importlib.util.spec_from_file_location("ccrawler_refsim_oracle", p)
    refsim = importlib.util.module_from_spec(spec)
    # dataclass processing requires the module registered in sys.modules
    sys.modules[spec.name] = refsim
    spec.loader.exec_module(refsim)

    corpus = corpus_from_documents(f"{sf_dir}/documents.parquet")
    cfg = CrawlConfig(
        seeds=default_seeds(4),
        max_generations=4,
        per_host_budget_per_generation=8,
        global_budget_per_generation=200,
        num_seen_shards=4,
        num_politeness_partitions=2,
    )
    sim = refsim.simulate(refsim.corpus_to_dict(corpus), cfg)
    df = pd.DataFrame(
        sim.crawl_order,
        columns=["generation", "host", "queue_pos", "ord_key", "canon", "status"],
    )
    return df.astype({"generation": np.int32, "queue_pos": np.int32,
                      "status": np.int32})


def dedup_clusters(sf_dir: str | None = None, num_perm: int = 64,
                   bands: int = 16, threshold: float = 0.8) -> pd.DataFrame:
    """Union-find over the serial verified pairs → per-doc component
    representative (min doc_id) — the oracle for the distributed
    min-label-propagation CC."""
    sf_dir = sf_dir or oracle_sf_dir()
    pairs = dedup_lsh_verified(sf_dir, num_perm, bands, threshold)
    ids, _ = _docs(sf_dir)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict[int, int] = {}
    for i in ids:
        r = find(int(i))
        comp_min[r] = min(comp_min.get(r, int(i)), int(i))
    rows = [(int(i), comp_min[find(int(i))]) for i in ids]
    df = pd.DataFrame(rows, columns=["doc_id", "cluster_rep"])
    df["keep"] = df["doc_id"] == df["cluster_rep"]
    return df


def o3_sample_hash(sf_dir: str | None = None, fraction: float = 0.05) -> pd.DataFrame:
    """Deterministic hash-draw sample (same frozen hash64 formula the
    engine uses — validates the distributed plumbing)."""
    sf_dir = sf_dir or oracle_sf_dir()
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    ids = t.column("doc_id").to_pylist()
    langs = t.column("lang").to_pylist()
    bar = int(fraction * 10_000)
    rows = []
    for i, lang in zip(ids, langs):
        h = int.from_bytes(
            hashlib.blake2b(str(i).encode(), digest_size=8,
                            key=(77).to_bytes(8, "little")).digest(), "little"
        )
        if h % 10_000 < bar:
            rows.append((int(i), lang))
    return pd.DataFrame(rows, columns=["doc_id", "lang"])


def dedup_embedding_lsh(sf_dir: str | None = None, threshold: float = 0.4,
                        num_planes: int = 4, num_tables: int = 16,
                        seed: int = 42) -> pd.DataFrame:
    """Serial mirror of functions.dedup.dedup_embedding_lsh: identical
    hyperplane bucketing; a pair is emitted iff it shares a bucket in
    >= 1 table AND cos >= threshold (first-collision placement does not
    change the output SET, only where the engine emits it)."""
    sf_dir = sf_dir or oracle_sf_dir()
    ids, mat = _embeddings(sf_dir)
    dim = mat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim))
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    weights = (1 << np.arange(num_planes)).astype(np.int64)
    sig = np.einsum("tpd,nd->tnp", planes, norm) > 0
    buckets = (sig * weights).sum(axis=2)                  # (T, n)
    order = np.argsort(ids)
    ids_s, norm_s = ids[order], norm[order]
    b_s = buckets[:, order]
    ia, ib = np.triu_indices(len(ids_s), k=1)
    collide = (b_s[:, ia] == b_s[:, ib]).any(axis=0)
    cos = (norm_s[ia] * norm_s[ib]).sum(axis=1)
    keep = collide & (cos >= threshold)
    return pd.DataFrame(
        {"vec_a": ids_s[ia[keep]].astype(np.int64),
         "vec_b": ids_s[ib[keep]].astype(np.int64),
         "cos": np.round(cos[keep], 4)}
    )


def g5_hll_distinct(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial HLL mirror — the register/estimator formulas are imported
    from the engine (functions.sketch); register max over the whole
    key set equals any per-block merge, so this is bitwise equal."""
    from ccrawler_ray.functions.sketch import hll_estimate, hll_registers

    sf_dir = sf_dir or oracle_sf_dir()
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_type", "user_id"]).to_pandas()
    rows = []
    for et, g in t.groupby("event_type", sort=True):
        rows.append((et, hll_estimate(hll_registers(g["user_id"].to_numpy()))))
    return pd.DataFrame(rows, columns=["event_type", "est_users"]).astype(
        {"est_users": "int64"}
    )


def g7_quantile_hist(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial histogram-quantile mirror (same bins, same edges)."""
    from ccrawler_ray.functions.sketch import QUANT_BINS, QUANTS

    sf_dir = sf_dir or oracle_sf_dir()
    v = pq.read_table(f"{sf_dir}/orders.parquet",
                      columns=["o_totalprice"]).column("o_totalprice") \
          .to_numpy(zero_copy_only=False).astype(np.float64)
    lo, hi = float(v.min()), float(v.max())
    width = (hi - lo) / QUANT_BINS or 1.0
    b = np.minimum(((v - lo) / width).astype(np.int64), QUANT_BINS - 1)
    cum = np.cumsum(np.bincount(b, minlength=QUANT_BINS).astype(np.int64))
    n = int(cum[-1])
    rows = [(q, np.round(lo + (int(np.searchsorted(cum, int(np.ceil(q * n)))) + 1)
                         * width, 4)) for q in QUANTS]
    return pd.DataFrame(rows, columns=["q", "est_value"])


def o4_stratified_sample(sf_dir: str | None = None, n_per_lang: int = 20,
                         seed: int = 99) -> pd.DataFrame:
    """Serial mirror of the deterministic hash-rank stratified sample:
    per lang, the n docs with the smallest seeded hash64(doc_id)."""
    sf_dir = sf_dir or oracle_sf_dir()
    from ccrawler_ray.spec import hash64_batch

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "lang"]).to_pandas()
    t["draw"] = hash64_batch([str(i) for i in t["doc_id"]], seed=seed)
    out = []
    for lang, g in t.groupby("lang", sort=True):
        g = g.sort_values(["draw", "doc_id"]).head(n_per_lang)
        out.append(g[["doc_id", "lang"]])
    return pd.concat(out, ignore_index=True).astype({"doc_id": "int64"})


def g8_grouped_quantiles(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial per-group histogram-quantile mirror (same shared bins)."""
    from ccrawler_ray.functions.sketch import QUANT_BINS, QUANTS

    sf_dir = sf_dir or oracle_sf_dir()
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_type", "value"]).to_pandas()
    v_all = t["value"].to_numpy(dtype=np.float64)
    lo, hi = float(v_all.min()), float(v_all.max())
    width = (hi - lo) / QUANT_BINS or 1.0
    rows = []
    for et, g in t.groupby("event_type", sort=True):
        v = g["value"].to_numpy(dtype=np.float64)
        b = np.minimum(((v - lo) / width).astype(np.int64), QUANT_BINS - 1)
        cum = np.cumsum(np.bincount(b, minlength=QUANT_BINS).astype(np.int64))
        n = int(cum[-1])
        for q in QUANTS:
            bin_i = int(np.searchsorted(cum, int(np.ceil(q * n))))
            rows.append((et, q, np.round(lo + (bin_i + 1) * width, 4)))
    return pd.DataFrame(rows, columns=["event_type", "q", "est_value"])


def dedup_ngram_spans(sf_dir: str | None = None, n: int = 5,
                      min_docs: int = 2) -> pd.DataFrame:
    """Serial mirror of functions.dedup.dedup_ngram_spans: same rolling
    polynomial hash (base 0x9E3779B97F4A7C15 mod 2^64 over blake2b word
    hashes), straight-line Counters instead of the salted shuffles."""
    from collections import Counter

    ids, texts = _docs(sf_dir or oracle_sf_dir())
    mod = 1 << 64
    pows = [pow(0x9E3779B97F4A7C15, n - 1 - j, mod) for j in range(n)]
    per_doc: list[tuple[int, Counter]] = []
    docs_with_hash: Counter = Counter()
    for did, t in zip(ids, texts):
        hs = [_whash(w) for w in t.split()]
        c: Counter = Counter()
        for i in range(len(hs) - n + 1):
            v = 0
            for j in range(n):
                v = (v + hs[i + j] * pows[j]) % mod
            c[v] += 1
        if c:
            per_doc.append((did, c))
            for h in c:
                docs_with_hash[h] += 1
    rows = []
    for did, c in per_doc:
        tot = sum(c.values())
        dup = sum(k for h, k in c.items() if docs_with_hash[h] >= min_docs)
        rows.append((did, tot, dup, (dup * 10_000 // tot) / 10_000.0))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_windows", "dup_windows", "dup_ratio"])


def o6_weighted_sample(sf_dir: str | None = None, n: int = 50,
                       seed: int = 123) -> pd.DataFrame:
    """Serial Efraimidis–Spirakis mirror (same hash64(doc_id) draw and
    u^(1/w) key formula as relational.o6_weighted_sample)."""
    sf_dir = sf_dir or oracle_sf_dir()
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "lang", "n_chars"]).to_pandas()
    key = seed.to_bytes(8, "little")
    h = np.array(
        [int.from_bytes(
            hashlib.blake2b(str(i).encode(), digest_size=8, key=key).digest(),
            "little") for i in t["doc_id"]], dtype=np.uint64)
    u = (h.astype(np.float64) + 1.0) / 2.0 ** 64
    w = np.maximum(t["n_chars"].to_numpy(), 1).astype(np.float64)
    t = t.assign(key=u ** (1.0 / w))
    out = t.sort_values(["key", "doc_id"], ascending=[False, True]).head(n)
    return out[["doc_id", "lang", "n_chars"]].reset_index(drop=True)


def char_entropy(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial mirror of functions.text.char_entropy — identical
    histogram (sorted codepoints) and summation order, so the doubles
    are bitwise equal to the engine's."""
    ids, texts = _docs(sf_dir or oracle_sf_dir())
    rows = []
    for did, text in zip(ids, texts):
        cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        if not len(cps):
            rows.append((did, 0, 0, 0.0))
            continue
        _, counts = np.unique(cps, return_counts=True)
        p = counts / float(len(cps))
        ent = float(np.floor(-(p * np.log2(p)).sum() * 10_000) / 10_000)
        rows.append((did, len(cps), len(counts), ent))
    return pd.DataFrame(rows,
                        columns=["doc_id", "n_cp", "n_unique_cp", "entropy"])


def mix_interleave(sf_dir: str | None = None, seed: int | None = None) -> pd.DataFrame:
    """Serial mirror of pipelines.mix.mix_interleave — same frozen
    hash/weight/priority formulas (spec.hash64_batch, mix_weights),
    one flat lexsort instead of the bucket-offset machinery, so the
    comparison exercises exactly the distributed numbering."""
    from ccrawler_ray.pipelines.mix import MIX_SEED, mix_weights
    from ccrawler_ray.spec import hash64_batch

    t = pq.read_table(f"{sf_dir or oracle_sf_dir()}/documents.parquet",
                      columns=["doc_id", "source"])
    ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    sources = np.asarray(t.column("source").to_pylist(), dtype=object)
    h = hash64_batch([str(i) for i in ids],
                     seed=MIX_SEED if seed is None else seed)
    u = (h.astype(np.float64) + 1.0) / 2.0 ** 64
    pri = -np.log(u) / mix_weights(sources)
    order = np.lexsort((ids, pri))
    return pd.DataFrame({"pos": np.arange(1, len(ids) + 1, dtype=np.int64),
                         "doc_id": ids[order],
                         "source": sources[order],
                         "pri": pri[order]})


def repetition_stats(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial mirror of functions.text.repetition_stats — same word
    hashes (_whash == word_hashes formula), same mixing constant and
    floor-scaled integer ratios, so every double is bitwise equal."""
    from ccrawler_ray.functions.text import (REP_DUP5_MAX, REP_TOP2_MAX,
                                             _REP_C1)

    ids, texts = _docs(sf_dir or oracle_sf_dir())
    C = np.uint64(_REP_C1)
    pows = tuple(np.uint64(pow(_REP_C1, p, 1 << 64))
                 for p in (4, 3, 2, 1)) + (np.uint64(1),)
    rows = []
    for did, text in zip(ids, texts):
        h = np.array([_whash(w) for w in text.split()], dtype=np.uint64)
        n = len(h)
        if n == 0:
            rows.append((did, 0, 0.0, 0.0, 0.0, True))
            continue
        dupw = float(np.floor((n - len(np.unique(h))) * 10_000.0 / n)
                     / 10_000)
        if n >= 2:
            _, c2 = np.unique(h[:-1] * C + h[1:], return_counts=True)
            top2 = float(np.floor(int(c2.max()) * 10_000.0 / (n - 1))
                         / 10_000)
        else:
            top2 = 0.0
        if n >= 5:
            g = h[: n - 4] * pows[0]
            for j, p in enumerate(pows[1:], start=1):
                g = g + h[j: n - 5 + j + 1] * p
            _, c5 = np.unique(g, return_counts=True)
            dup5 = float(np.floor(int(c5[c5 >= 2].sum()) * 10_000.0
                                  / (n - 4)) / 10_000)
        else:
            dup5 = 0.0
        keep = top2 <= REP_TOP2_MAX and dup5 <= REP_DUP5_MAX
        rows.append((did, n, dupw, top2, dup5, keep))
    return pd.DataFrame(rows, columns=["doc_id", "n_words",
                                       "dup_word_frac", "top_bigram_frac",
                                       "dup_5gram_frac", "keep"])


def source_sketch_sim(sf_dir: str | None = None,
                      num_perm: int = 128) -> pd.DataFrame:
    """Serial mirror of functions.dedup.source_sketch_sim — per-source
    union word set, the SAME hash family and signature kernel by
    import, same floor-scaled estimate."""
    from ccrawler_ray.functions.dedup import (_minhash_params, _signature,
                                              word_hashes)

    a, b = _minhash_params(num_perm)
    d = sf_dir or oracle_sf_dir()
    t = pq.read_table(f"{d}/documents.parquet", columns=["text", "source"])
    words_by_src: dict[str, set] = {}
    for text, src in zip(t.column("text").to_pylist(),
                         t.column("source").to_pylist()):
        words_by_src.setdefault(src, set()).update(text.split())
    srcs = sorted(words_by_src)
    sigs = {s: _signature(word_hashes(list(words_by_src[s])), a, b)
            for s in srcs}
    rows = []
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            matches = int((sigs[srcs[i]] == sigs[srcs[j]]).sum())
            est = np.floor(matches * 10_000.0 / num_perm) / 10_000
            rows.append((srcs[i], srcs[j], matches, float(est)))
    return pd.DataFrame(rows, columns=["source_a", "source_b",
                                       "sig_matches", "est_jaccard"])


def zipf_fit(sf_dir: str | None = None, top_v: int | None = None) -> pd.DataFrame:
    """Serial mirror of functions.text.zipf_fit — full serial word
    counts per source, same top-V count multiset (tie-invariant), same
    frozen quantized-log finish by import."""
    from collections import Counter

    from ccrawler_ray.functions.text import ZIPF_TOP_V, zipf_finish

    top_v = top_v or ZIPF_TOP_V
    d = sf_dir or oracle_sf_dir()
    t = pq.read_table(f"{d}/documents.parquet", columns=["text", "source"])
    by_src: dict[str, Counter] = {}
    for text, src in zip(t.column("text").to_pylist(),
                         t.column("source").to_pylist()):
        by_src.setdefault(src, Counter()).update(text.split())
    rows = []
    for src in sorted(by_src):
        cnts = np.array(sorted(by_src[src].values(), reverse=True)[:top_v],
                        dtype=np.int64)
        v, slope, intercept = zipf_finish(cnts)
        rows.append((src, v, slope, intercept))
    return pd.DataFrame(rows, columns=["source", "v", "slope", "intercept"])


def pmi_topk(sf_dir: str | None = None, k: int = 20,
             min_count: int | None = None) -> pd.DataFrame:
    """Serial mirror of functions.text.pmi_topk — full serial unigram/
    bigram counts, same frozen PMI kernel by import, same sort keys."""
    from collections import Counter

    from ccrawler_ray.functions.text import PMI_MIN_COUNT, pmi_score

    min_count = min_count or PMI_MIN_COUNT
    _, texts = _docs(sf_dir or oracle_sf_dir())
    uni: Counter = Counter()
    bi: Counter = Counter()
    for text in texts:
        toks = text.split()
        uni.update(toks)
        bi.update(zip(toks[:-1], toks[1:]))
    total = sum(uni.values())
    rows = [(w1, w2, c) for (w1, w2), c in bi.items() if c >= min_count]
    if not rows:
        return pd.DataFrame({"w1": pd.Series(dtype="object"),
                             "w2": pd.Series(dtype="object"),
                             "c_xy": pd.Series(dtype="int64"),
                             "pmi": pd.Series(dtype="float64")})
    df = pd.DataFrame(rows, columns=["w1", "w2", "c_xy"])
    df["c_xy"] = df["c_xy"].astype(np.int64)
    cx = np.array([uni[w] for w in df["w1"]], dtype=np.int64)
    cy = np.array([uni[w] for w in df["w2"]], dtype=np.int64)
    df["pmi"] = pmi_score(df["c_xy"].to_numpy(), cx, cy, total)
    df = df.sort_values(["pmi", "w1", "w2"],
                        ascending=[False, True, True]).head(k)
    return df.reset_index(drop=True)


def search_phrase(sf_dir: str | None = None, t1: str | None = None,
                  t2: str | None = None) -> pd.DataFrame:
    """Serial mirror of functions.text.search_phrase — same whitespace
    tokenization, same all-occurrences adjacency rule."""
    from ccrawler_ray.functions.text import PHRASE_T1, PHRASE_T2

    t1, t2 = t1 or PHRASE_T1, t2 or PHRASE_T2
    ids, texts = _docs(sf_dir or oracle_sf_dir())
    rows = []
    for did, text in zip(ids, texts):
        toks = text.split()
        n = sum(1 for i in range(len(toks) - 1)
                if toks[i] == t1 and toks[i + 1] == t2)
        if n:
            rows.append((did, n))
    return pd.DataFrame(rows, columns=["doc_id", "n_hits"])


def gopher_quality(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial mirror of functions.text.gopher_quality — same frozen
    patterns and integer rule set (imported, not re-stated); counts
    via Python re instead of polars' rust-regex (equality pinned by
    tests/test_text_kernels.py on adversarial strings)."""
    import re

    from ccrawler_ray.functions.text import (GOPHER_ALPHA_WORD_RE,
                                             GOPHER_BULLET_RE,
                                             GOPHER_ELLIPSIS_RE,
                                             GOPHER_NONSPACE_RE,
                                             GOPHER_STOPWORDS,
                                             GOPHER_SYM_RE, GOPHER_WORD_RE,
                                             _gopher_flags)

    ids, texts = _docs(sf_dir or oracle_sf_dir())
    word_re = re.compile(GOPHER_WORD_RE)
    ns_re = re.compile(GOPHER_NONSPACE_RE)
    alpha_re = re.compile(GOPHER_ALPHA_WORD_RE)
    sym_re = re.compile(GOPHER_SYM_RE)
    bullet_re = re.compile(GOPHER_BULLET_RE)
    ell_re = re.compile(GOPHER_ELLIPSIS_RE)
    stop_res = [re.compile(rf"\b{w}\b") for w in GOPHER_STOPWORDS]
    rows = []
    for did, text in zip(ids, texts):
        n_words = len(word_re.findall(text))
        n_ns = len(ns_re.findall(text))
        alpha = len(alpha_re.findall(text))
        syms = len(sym_re.findall(text))
        bullets = len(bullet_re.findall(text))
        ells = len(ell_re.findall(text))
        n_lines = text.count("\n") + 1
        stop_hits = sum(1 for r in stop_res if r.search(text))
        mwl_q = n_ns * 10_000 // max(n_words, 1)
        flags = _gopher_flags(n_words, mwl_q, syms, bullets, ells,
                              n_lines, alpha, stop_hits)
        rows.append((did, n_words, mwl_q / 10_000.0, stop_hits,
                     *[bool(x) for x in flags]))
    return pd.DataFrame(rows, columns=[
        "doc_id", "n_words", "mean_word_len", "stop_hits", "f_words",
        "f_mwl", "f_symbol", "f_bullet", "f_ellipsis", "f_alpha",
        "f_stop", "keep"])


def decontaminate_overlap(sf_dir: str | None = None, n: int = 5,
                          min_overlap: int = 2,
                          bench_mod: int = 97) -> pd.DataFrame:
    """Serial mirror of functions.dedup.decontaminate_overlap: same
    rolling window hashes; the eval n-gram set is a plain Python set."""
    ids, texts = _docs(sf_dir or oracle_sf_dir())
    mod = 1 << 64
    pows = [pow(0x9E3779B97F4A7C15, n - 1 - j, mod) for j in range(n)]

    def whashes(text: str) -> set:
        hs = [_whash(w) for w in text.split()]
        out = set()
        for i in range(len(hs) - n + 1):
            v = 0
            for j in range(n):
                v = (v + hs[i + j] * pows[j]) % mod
            out.add(v)
        return out

    bench: set = set()
    for did, t in zip(ids, texts):
        if did % bench_mod == 0:
            bench |= whashes(t)
    rows = []
    for did, t in zip(ids, texts):
        if did % bench_mod == 0:
            continue
        ws = whashes(t)
        ov = len(ws & bench)
        rows.append((did, len(ws), ov, ov >= min_overlap))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_windows", "n_overlap", "contaminated"])


def _splitmix64_int(x: int) -> int:
    """Scalar splitmix64 (Python ints, wrapping at 2^64) — independent
    implementation of functions.graph._splitmix64's frozen spec."""
    mask = (1 << 64) - 1
    z = (x + 0x9E3779B97F4A7C15) & mask
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
    return z ^ (z >> 31)


def link_pagerank(sf_dir: str | None = None, iters: int = 10,
                  k_top: int = 100) -> pd.DataFrame:
    """Serial mirror of functions.graph.link_pagerank — same frozen
    graph spec and exact int64 iteration, but built with Python ints
    and dicts (genuinely independent: integer math is associative, so
    the two implementations must agree bit-for-bit)."""
    ids, _ = _docs(sf_dir or oracle_sf_dir())
    n = len(ids)
    U = 10**12
    targets: dict[int, list[int]] = {}
    for i in range(1, n):
        ts: list[int] = []
        for kk in (1, 2, 3):
            t = _splitmix64_int(4 * i + kk) % i
            if t not in ts:
                ts.append(t)
        targets[i] = ts
    r = [U // n] * n
    for _ in range(iters):
        dang = r[0]
        base = (15 * U) // (100 * n) + (85 * dang) // (100 * n)
        new = [base] * n
        for s, ts in targets.items():
            c = (85 * r[s]) // (100 * len(ts))
            for d in ts:
                new[d] += c
        r = new
    out = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "rank_u": np.asarray(r, dtype=np.int64)})
    out = out.sort_values(["rank_u", "doc_id"],
                          ascending=[False, True]).head(k_top)
    out["rank"] = out["rank_u"] / float(U)
    return out.reset_index(drop=True)


def link_hits(sf_dir: str | None = None, iters: int = 10,
              k_top: int = 100) -> pd.DataFrame:
    """Serial mirror of functions.graph.link_hits — same frozen graph
    spec, simultaneous int64 update and scale_q = max(1, total // U)
    renormalization, built with Python ints and dicts (independent:
    integer math is associative, so the implementations must agree
    bit-for-bit)."""
    ids, _ = _docs(sf_dir or oracle_sf_dir())
    n = len(ids)
    U = 10**12
    targets: dict[int, list[int]] = {}
    for i in range(1, n):
        ts: list[int] = []
        for kk in (1, 2, 3):
            t = _splitmix64_int(4 * i + kk) % i
            if t not in ts:
                ts.append(t)
        targets[i] = ts
    h = [U // n] * n
    a = [U // n] * n
    for _ in range(iters):
        a_new = [0] * n
        h_new = [0] * n
        for s, ts in targets.items():
            for d in ts:
                a_new[d] += h[s]
                h_new[s] += a[d]
        for v in (a_new, h_new):
            scale_q = max(1, sum(v) // U)
            if scale_q > 1:
                for i in range(n):
                    v[i] //= scale_q
        a, h = a_new, h_new
    out = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "auth_u": np.asarray(a, dtype=np.int64),
                        "hub_u": np.asarray(h, dtype=np.int64)})
    out = out.sort_values(["auth_u", "doc_id"],
                          ascending=[False, True]).head(k_top)
    out["authority"] = out["auth_u"] / float(U)
    out["hub"] = out["hub_u"] / float(U)
    return out.reset_index(drop=True)


def search_bm25(sf_dir: str | None = None,
                terms: tuple = ("join", "vector", "spark", "fast"),
                k: int = 20) -> pd.DataFrame:
    """Serial mirror of functions.text.search_bm25 — identical frozen
    op order (_bm25_score_cols), exact-integer inputs, so the float64
    scores are bitwise equal to the engine's."""
    ids, texts = _docs(sf_dir or oracle_sf_dir())
    m = len(terms)
    tf = np.zeros((len(ids), m), dtype=np.int64)
    dl = np.zeros(len(ids), dtype=np.int64)
    for i, t in enumerate(texts):
        ws = t.split()
        dl[i] = len(ws)
        for j, term in enumerate(terms):
            tf[i, j] = ws.count(term)
    n_docs, total_len = len(ids), int(dl.sum())
    dfreq = (tf > 0).sum(axis=0).astype(np.int64)
    idf = np.log((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
    dln = dl.astype(np.float64) * float(n_docs) / float(total_len)
    den_base = 1.2 * (1.0 - 0.75 + 0.75 * dln)
    s = np.zeros(len(ids), dtype=np.float64)
    for j in range(m):
        tfj = tf[:, j].astype(np.float64)
        s += idf[j] * (tfj * (1.2 + 1.0)) / (tfj + den_base)
    keep = s > 0.0
    out = pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64)[keep],
                        "score": s[keep]})
    out = out.sort_values(["score", "doc_id"],
                          ascending=[False, True]).head(k)
    out = out.reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def g11_countmin_est(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial mirror of functions.sketch.g11_countmin_est — one global
    Counter pass, counts added at the same frozen splitmix64 columns
    (integer sums are order-independent, so bitwise equal)."""
    from collections import Counter

    from ccrawler_ray.functions.sketch import CMS_D, CMS_TERMS, CMS_W

    _, texts = _docs(sf_dir or oracle_sf_dir())
    mask = (1 << 64) - 1
    counts = Counter(w for t in texts for w in t.split())
    cms = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for w, c in counts.items():
        wh = _whash(w)
        for r in range(CMS_D):
            cms[r, _splitmix64_int((wh + r + 1) & mask) % CMS_W] += c
    rows = []
    for term in CMS_TERMS:
        wh = _whash(term)
        est = min(cms[r, _splitmix64_int((wh + r + 1) & mask) % CMS_W]
                  for r in range(CMS_D))
        rows.append((term, int(est)))
    return pd.DataFrame(rows, columns=["term", "est_n"])


def spans_pack_multimodal(sf_dir: str | None = None,
                          capacity: int | None = None) -> pd.DataFrame:
    """Serial mirror of functions.spans.spans_pack_multimodal — same
    corpus lift, same frozen per-span cost rule and explode kernel by
    import, one serial cumsum over the full row order."""
    from ccrawler_ray.functions.spans import (MEDIA_TOKENS,
                                              SPANS_PACK_CAPACITY,
                                              _doc_pack_rows)
    from ccrawler_ray.sources.corpus import corpus_from_documents

    capacity = capacity or SPANS_PACK_CAPACITY
    d = sf_dir or oracle_sf_dir()
    t = corpus_from_documents(f"{d}/documents.parquet")
    n_tokens, n_media = _doc_pack_rows(t, MEDIA_TOKENS)
    pre = np.cumsum(n_tokens) - n_tokens
    cap = np.int64(capacity)
    return pd.DataFrame({
        "doc_id": t.column("doc_id").to_pylist(),
        "n_tokens": n_tokens,
        "n_media": n_media,
        "bin_id": pre // cap,
        "bin_off": pre % cap,
        "end_bin": (pre + n_tokens - 1) // cap})


def ann_sq_topk(sf_dir: str | None = None, num_queries: int = 5,
                k: int = 5) -> pd.DataFrame:
    """Serial mirror of functions.similarity.ann_sq_topk — same frozen
    SQ8 quantization rule by import over the full normalized matrix
    (per-dim min/max are order-independent), same exact int64 dots."""
    from ccrawler_ray.functions.similarity import _sq_quantize

    ids, mat = _embeddings(sf_dir or oracle_sf_dir())
    mat = mat.astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    mn, mx = mat.min(axis=0), mat.max(axis=0)
    q = _sq_quantize(mat, mn, mx)
    rows = []
    for qid in range(num_queries):
        qv = q[ids == qid][0]
        dots = q @ qv
        mask = ids != qid
        g = pd.DataFrame({"query_id": np.int64(qid), "vec_id": ids[mask],
                          "qdot": dots[mask]})
        g = g.sort_values(["qdot", "vec_id"],
                          ascending=[False, True]).head(k)
        rows.append(g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64)))
    return pd.concat(rows).reset_index(drop=True)


def ann_pq_topk(sf_dir: str | None = None, num_queries: int = 5,
                k: int = 5, iters: int = 5,
                train_mod: int = 1) -> pd.DataFrame:
    """Serial mirror of functions.similarity.ann_pq_topk — identical
    quantized-int64 codebook training on the same deterministic
    vec_id % train_mod subsample, encoding and ADC lookups, so
    distances are bitwise equal."""
    from ccrawler_ray.functions.similarity import PQ_K, PQ_SUBS

    ids, mat = _embeddings(sf_dir or oracle_sf_dir())
    mat = mat.astype(np.float64)
    dim = mat.shape[1]
    sub = dim // PQ_SUBS
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    train_sel = None if train_mod <= 1 else (ids % train_mod == 0)
    cents, codes = _pq_train_encode(mat, iters, train_sel=train_sel)
    srange = np.arange(PQ_SUBS)
    rows = []
    for qid in range(num_queries):
        qv = mat[ids == qid][0]
        T = np.empty((PQ_SUBS, PQ_K), dtype=np.float64)
        for s in range(PQ_SUBS):
            T[s] = ((qv[s * sub:(s + 1) * sub][None, :]
                     - cents[s]) ** 2).sum(axis=1)
        dist = T[srange[None, :], codes].sum(axis=1)
        mask = ids != qid
        g = pd.DataFrame({"query_id": np.int64(qid), "vec_id": ids[mask],
                          "adist": dist[mask]})
        g = g.sort_values(["adist", "vec_id"]).head(k)
        rows.append(g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64)))
    return pd.concat(rows).reset_index(drop=True)


def _pq_train_encode(mat: np.ndarray, iters: int,
                     train_sel: np.ndarray | None = None):
    """Serial PQ codebook training + encoding over rows already in
    vec_id order — same quantized-int64 update rule as the engine's
    _pq_codebooks, so (cents, codes) are bitwise equal. ``train_sel``
    restricts TRAINING to a row subset (the engine's deterministic
    vec_id % train_mod subsample); encoding always covers every row."""
    from ccrawler_ray.functions.similarity import KMEANS_QSCALE, PQ_K, PQ_SUBS

    dim = mat.shape[1]
    sub = dim // PQ_SUBS
    tm = mat if train_sel is None else mat[train_sel]
    base = tm[:PQ_K]
    cents = np.stack(
        [base[:, s * sub:(s + 1) * sub] for s in range(PQ_SUBS)])
    for _ in range(iters):
        new = cents.copy()
        for s in range(PQ_SUBS):
            ms = tm[:, s * sub:(s + 1) * sub]
            d = ((ms[:, None, :] - cents[s][None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for ci in np.unique(a):
                sel = np.round(ms[a == ci] * KMEANS_QSCALE).astype(np.int64)
                new[s][ci] = sel.sum(axis=0) / (KMEANS_QSCALE
                                                * int((a == ci).sum()))
        cents = new
    codes = np.empty((len(mat), PQ_SUBS), dtype=np.uint8)
    for s in range(PQ_SUBS):
        ms = mat[:, s * sub:(s + 1) * sub]
        d = ((ms[:, None, :] - cents[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d.argmin(axis=1).astype(np.uint8)
    return cents, codes


def ann_ivf_pq(sf_dir: str | None = None, num_queries: int = 5,
               k: int = 5, n_clusters: int = 16, n_probe: int = 4,
               iters: int = 5, train_mod: int = 2) -> pd.DataFrame:
    """Serial mirror of functions.similarity.ann_ivf_pq: coarse
    k-means (shared bitwise trainer), residual PQ, n_probe inverted
    lists, ADC distances — bitwise equal to the engine."""
    from ccrawler_ray.functions.similarity import PQ_K, PQ_SUBS

    ids, mat = _embeddings(sf_dir or oracle_sf_dir())
    mat = mat.astype(np.float64)
    dim = mat.shape[1]
    sub = dim // PQ_SUBS
    coarse = kmeans_centroids(sf_dir, k=n_clusters, iters=5)
    d = ((mat[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    resid = mat - coarse[assign]
    order = np.argsort(ids)
    ids, resid, assign = ids[order], resid[order], assign[order]
    train_sel = None if train_mod <= 1 else (ids % train_mod == 0)
    pq_cents, codes = _pq_train_encode(resid, iters, train_sel=train_sel)
    srange = np.arange(PQ_SUBS)
    rows = []
    for qid in range(num_queries):
        qv = mat[order][ids == qid][0]
        qd = ((coarse - qv[None, :]) ** 2).sum(axis=1)
        probes = np.argsort(qd)[:n_probe]
        got = []
        for c in probes:
            mask = (assign == c) & (ids != qid)
            if not mask.any():
                continue
            r = qv - coarse[c]
            T = np.empty((PQ_SUBS, PQ_K), dtype=np.float64)
            for s in range(PQ_SUBS):
                T[s] = ((r[s * sub:(s + 1) * sub][None, :]
                         - pq_cents[s]) ** 2).sum(axis=1)
            got.append(pd.DataFrame(
                {"query_id": np.int64(qid), "vec_id": ids[mask],
                 "adist": T[srange[None, :], codes[mask]].sum(axis=1)}))
        g = (pd.concat(got).sort_values(["adist", "vec_id"]).head(k)
             if got else pd.DataFrame(
                 {"query_id": pd.Series(dtype="int64"),
                  "vec_id": pd.Series(dtype="int64"),
                  "adist": pd.Series(dtype="float64")}))
        rows.append(g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64)))
    return pd.concat(rows).reset_index(drop=True)


def link_triangles(sf_dir: str | None = None, k_top: int = 100
                   ) -> pd.DataFrame:
    """Serial mirror of functions.graph.link_triangles — same frozen
    graph; triangles found by set lookup over the canonical undirected
    edge set, attributed to the highest-id vertex."""
    ids, _ = _docs(sf_dir or oracle_sf_dir())
    n = len(ids)
    targets: dict[int, list[int]] = {}
    edges: set[tuple[int, int]] = set()
    for i in range(1, n):
        ts: list[int] = []
        for kk in (1, 2, 3):
            t = _splitmix64_int(4 * i + kk) % i
            if t not in ts:
                ts.append(t)
        targets[i] = ts
        for t in ts:
            edges.add((min(i, t), max(i, t)))
    counts: dict[int, int] = {}
    for apex, ts in targets.items():
        for x in range(len(ts)):
            for y in range(x + 1, len(ts)):
                a, b = ts[x], ts[y]
                if (min(a, b), max(a, b)) in edges:
                    counts[apex] = counts.get(apex, 0) + 1
    out = pd.DataFrame(sorted(counts.items()),
                       columns=["doc_id", "n_tri"]).astype("int64")
    return (out.sort_values(["n_tri", "doc_id"],
                            ascending=[False, True])
            .head(k_top).reset_index(drop=True))


def dedup_semantic(sf_dir: str | None = None, n_clusters: int = 16,
                   threshold: float = 0.9) -> pd.DataFrame:
    """Serial mirror of functions.dedup.dedup_semantic — shared
    bitwise k-means, same vec_id-ordered greedy leader scan and the
    same gemv shapes, so keep flags and max_cos are bitwise equal."""
    ids, mat = _embeddings(sf_dir or oracle_sf_dir())
    mat = mat.astype(np.float64)
    cents = kmeans_centroids(sf_dir, k=n_clusters)
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    rows = []
    for c in np.unique(assign):
        sel = np.nonzero(assign == c)[0]
        order = sel[np.argsort(ids[sel])]
        m = mat[order]
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        kept_rows: list[int] = []
        for i in range(len(m)):
            if kept_rows:
                mc = float((m[kept_rows] @ m[i]).max())
                keep = mc < threshold
                out_mc = float(np.round(mc, 4))  # same rounding kernel
                # as the engine's np.round over the max_cos array
            else:
                keep, out_mc = True, -1.0
            if keep:
                kept_rows.append(i)
            rows.append((int(ids[order[i]]), int(c), keep, out_mc))
    out = pd.DataFrame(rows, columns=["vec_id", "cluster", "keep",
                                      "max_cos"])
    return out.sort_values("vec_id").reset_index(drop=True)


def corpus_prep_stats(sf_dir: str | None = None, min_tokens: int = 20,
                      max_upper: float = 0.3, max_dup: float = 0.5,
                      threshold: float = 0.8, bench_mod: int = 13
                      ) -> pd.DataFrame:
    """Serial mirror of pipelines.mix.corpus_prep_stats: every filter
    leg recomputed serially (quality + frozen model from the same
    formulas, spans/decontaminate/clusters from their serial mirrors),
    intersected, rolled up per language."""
    import re

    from ccrawler_ray.functions.text import MODEL_WEIGHTS

    sf = sf_dir or oracle_sf_dir()
    df = pq.read_table(
        f"{sf}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars"]).to_pandas()
    tok = df["text"].map(
        lambda t: len(re.findall(r"\s+", t)) + 1).to_numpy(np.int64)
    nup = df["text"].map(
        lambda t: len(re.findall(r"[A-Z]", t))).to_numpy(np.int64)
    ndig = df["text"].map(
        lambda t: len(re.findall(r"[0-9]", t))).to_numpy(np.int64)
    nch = df["n_chars"].to_numpy(np.int64)
    upper_ratio = np.floor(nup * 10000.0 / np.maximum(nch, 1)) / 10000
    w = MODEL_WEIGHTS
    logit = (w["w_tokens"] * tok + w["w_chars"] * nch
             + w["w_upper"] * nup + w["w_digits"] * ndig + w["bias"])
    ok = pd.Series((tok >= min_tokens) & (upper_ratio <= max_upper)
                   & (logit >= 0), index=df["doc_id"].to_numpy())

    spans = dedup_ngram_spans(sf)
    s_ok = set(spans.loc[spans["dup_ratio"] <= max_dup, "doc_id"])
    dec = decontaminate_overlap(sf, bench_mod=bench_mod)
    c_ok = set(dec.loc[~dec["contaminated"], "doc_id"])
    clus = dedup_clusters(sf, threshold=threshold)
    k_ok = set(clus.loc[clus["keep"], "doc_id"])

    df = df.assign(n_tokens=tok)
    keep = (ok.to_numpy()
            & df["doc_id"].isin(s_ok).to_numpy()
            & df["doc_id"].isin(c_ok).to_numpy()
            & df["doc_id"].isin(k_ok).to_numpy())
    kept = df[keep]
    out = kept.groupby("lang", as_index=False).agg(
        n_docs=("n_tokens", "size"), sum_tokens=("n_tokens", "sum"))
    return out.astype({"n_docs": "int64", "sum_tokens": "int64"}
                      ).sort_values("lang").reset_index(drop=True)


def dedup_containment_stats(sf_dir: str | None = None, num_perm: int = 64,
                            bands: int = 16, threshold: float = 0.8
                            ) -> pd.DataFrame:
    """Serial mirror of functions.dedup.dedup_containment_stats —
    rollup of the serial pair set."""
    pairs = dedup_containment(sf_dir, num_perm, bands, threshold)
    if not len(pairs):
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_pairs": pd.Series(dtype="int64"),
                             "max_containment": pd.Series(dtype="float64")})
    both = pd.DataFrame({
        "doc_id": np.concatenate([pairs["doc_a"].to_numpy(),
                                  pairs["doc_b"].to_numpy()]),
        "c": np.concatenate([pairs["containment"].to_numpy()] * 2)})
    g = both.groupby("doc_id", as_index=False).agg(
        n_pairs=("c", "size"), max_containment=("c", "max"))
    return (g.astype({"doc_id": "int64", "n_pairs": "int64"})
            .sort_values("doc_id").reset_index(drop=True))


def lm_perplexity(sf_dir: str | None = None,
                  xent_max: float | None = None) -> pd.DataFrame:
    """Serial mirror of functions.text.lm_perplexity: unigram/bigram
    counts built with plain Python dicts over the same training split,
    scored through the SAME frozen kernel (_lm_doc_xent) — doubles are
    bitwise equal iff the distributed training reproduced these counts
    exactly (the differential)."""
    from ccrawler_ray.functions.text import (LM_TRAIN_KEEP, LM_TRAIN_MOD,
                                             LM_XENT_MAX, _REP_C1,
                                             _lm_doc_xent)

    if xent_max is None:
        xent_max = LM_XENT_MAX
    ids, texts = _docs(sf_dir or oracle_sf_dir())
    uni: dict[int, int] = {}
    bi: dict[int, int] = {}
    mod = 1 << 64
    for did, text in zip(ids, texts):
        if did % LM_TRAIN_MOD >= LM_TRAIN_KEEP:
            continue
        hs = [_whash(w) for w in text.split()]
        for x in hs:
            uni[x] = uni.get(x, 0) + 1
        for a, b in zip(hs, hs[1:]):
            k = (a * _REP_C1 + b) % mod
            bi[k] = bi.get(k, 0) + 1

    def arrays(d: dict[int, int]):
        ks = np.array(sorted(d), dtype=np.uint64)
        cs = np.array([d[int(k)] for k in ks], dtype=np.int64)
        return ks, cs

    uni_k, uni_c = arrays(uni)
    bi_k, bi_c = arrays(bi)
    n_tokens, vocab = int(uni_c.sum()), len(uni_k)
    rows = []
    for did, text in zip(ids, texts):
        h = np.array([_whash(w) for w in text.split()], dtype=np.uint64)
        xe = _lm_doc_xent(h, uni_k, uni_c, bi_k, bi_c, n_tokens, vocab)
        rows.append((did, len(h), xe, xe <= xent_max))
    return pd.DataFrame(rows, columns=["doc_id", "n_words", "xent", "keep"])


def dedup_incremental(sf_dir: str | None = None, num_perm: int = 64,
                      bands: int = 16, threshold: float = 0.8,
                      new_mod: int = 5) -> pd.DataFrame:
    """Serial mirror of functions.dedup.dedup_incremental: every NEW
    doc (doc_id % new_mod == 0) scanned against every BASE doc — a
    band-hash collision in ANY band plus raw signature-agreement
    >= threshold qualifies; dup_of is the smallest qualifying base id
    and est_jaccard the (rounded) agreement with exactly that base."""
    ids, texts = _docs(sf_dir or oracle_sf_dir())
    a, b = _minhash_params(num_perm)
    sigs = np.stack([_minhash_sig(_word_hash_set(t), a, b) for t in texts])
    bh = np.stack([_fnv_band_hashes(s, bands) for s in sigs])
    ids = np.asarray(ids, dtype=np.int64)
    is_new = (ids % new_mod) == 0
    base_ids, base_sig, base_bh = ids[~is_new], sigs[~is_new], bh[~is_new]
    rows = []
    for i in np.flatnonzero(is_new):
        collide = (bh[i][None, :] == base_bh).any(axis=1)
        est = (sigs[i][None, :] == base_sig).mean(axis=1)
        qual = collide & (est >= threshold)
        if not qual.any():
            continue
        j = np.flatnonzero(qual)[np.argmin(base_ids[qual])]
        rows.append((int(ids[i]), int(base_ids[j]),
                     float(np.round(est[j], 4))))
    return pd.DataFrame(rows, columns=["doc_id", "dup_of", "est_jaccard"])


def media_dedup_near(sf_dir: str | None = None,
                     max_hamming: int = 3) -> pd.DataFrame:
    """Serial mirror of functions.multimodal.media_dedup_near: same
    frozen byte-shingle SimHash formula (distinct zero-padded LE
    windows, splitmix64 mix, votes>0 bit rule) computed with
    independent serial code, then BRUTE-FORCE all-pairs hamming —
    the engine's pigeonhole blocking guarantees identical pairs."""
    from ccrawler_ray.functions.multimodal import MEDIA_SHINGLE_BYTES

    ids, texts = _docs(sf_dir or oracle_sf_dir())
    W = MEDIA_SHINGLE_BYTES
    sims = np.zeros(len(ids), dtype=np.uint64)
    for i, t in enumerate(texts):
        p = t.encode("utf-8")
        if len(p) == 0:
            continue
        if len(p) < W:
            sset = {int.from_bytes(p, "little")}
        else:
            sset = {int.from_bytes(p[j:j + W], "little")
                    for j in range(len(p) - W + 1)}
        hs = np.fromiter((_splitmix64_int(s) for s in sset),
                         dtype=np.uint64, count=len(sset))
        bits = np.unpackbits(hs.view(np.uint8).reshape(len(hs), 8),
                             axis=1, bitorder="little").astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(hs)
        on = np.flatnonzero(votes > 0)
        sims[i] = np.uint64(sum(1 << int(b) for b in on))
    ids = np.asarray(ids, dtype=np.int64)
    ia, ib = np.triu_indices(len(ids), k=1)
    x = sims[ia] ^ sims[ib]
    ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                        axis=1).sum(axis=1).astype(np.int64)
    m = ham <= max_hamming
    return pd.DataFrame({"doc_a": ids[ia][m], "doc_b": ids[ib][m],
                         "hamming": ham[m]})


def w11_ewma(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial mirror of relational.w11_ewma: plain per-user Python
    recurrence y[i] = EWMA_ALPHA*x[i] + EWMA_BETA*y[i-1] over the same
    (ts, event_id) order — identical two multiplies + one add, so
    doubles are bitwise equal."""
    from ccrawler_ray.relational import EWMA_ALPHA, EWMA_BETA

    t = pq.read_table(f"{(sf_dir or oracle_sf_dir())}/events.parquet",
                      columns=["event_id", "user_id", "ts", "value"])
    df = (t.to_pandas().sort_values(["user_id", "ts", "event_id"])
          .reset_index(drop=True))
    a, b = np.float64(EWMA_ALPHA), np.float64(EWMA_BETA)
    out = np.empty(len(df), dtype=np.float64)
    prev_u, prev_y = None, None
    for i, (u, x) in enumerate(zip(df["user_id"].to_numpy(),
                                   df["value"].to_numpy())):
        if u != prev_u:
            y = np.float64(x)
        else:
            y = a * np.float64(x) + b * prev_y
        out[i] = y
        prev_u, prev_y = u, y
    return pd.DataFrame({"event_id": df["event_id"].to_numpy(),
                         "user_id": df["user_id"].to_numpy(),
                         "value": df["value"].to_numpy(),
                         "ewma": out})


def spans_line_dedup(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial mirror of functions.spans.spans_line_dedup: iterate docs
    in lexicographic doc_id order with a seen-hash set — identical to
    the engine's min-(doc_id, span_idx) winner rule (same blake2b-8
    span hash)."""
    from ccrawler_ray.sources.corpus import corpus_from_documents

    sf = sf_dir or oracle_sf_dir()
    t = corpus_from_documents(f"{sf}/documents.parquet")
    docs = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("spans").to_pylist()))
    seen: set[int] = set()
    rows = []
    for did, spans in docs:
        n = kept = 0
        for s in spans:
            if s["kind"] != "text" or not s["text"]:
                continue
            n += 1
            h = _whash(s["text"])
            if h not in seen:
                seen.add(h)
                kept += 1
        if n:
            rows.append((did, n, kept, n - kept))
    return pd.DataFrame(rows, columns=["doc_id", "n_spans", "n_kept",
                                       "n_dropped"])


def spans_rollup(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial mirror of functions.spans.spans_rollup: plain Python
    loop over the same deterministic interleaved corpus."""
    from ccrawler_ray.sources.corpus import corpus_from_documents

    sf = sf_dir or oracle_sf_dir()
    t = corpus_from_documents(f"{sf}/documents.parquet")
    agg: dict[str, list] = {}
    for spans in t.column("spans").to_pylist():
        seen_kinds = set()
        for s in spans:
            a = agg.setdefault(s["kind"], [0, 0, 0, 0])
            a[0] += 1
            a[2] += len(s["text"])
            a[3] += 1 if s["media_ref"] else 0
            seen_kinds.add(s["kind"])
        for k in seen_kinds:
            agg[k][1] += 1
    rows = [(k, a[0], a[1], a[2], a[3]) for k, a in sorted(agg.items())]
    return pd.DataFrame(rows, columns=["kind", "n_spans", "n_docs",
                                       "sum_text_len", "n_media_refs"])


def ann_recall_report(sf_dir: str | None = None, num_queries: int = 5,
                      k: int = 5) -> pd.DataFrame:
    """Serial mirror of functions.similarity.ann_recall_report: the
    same pair-set recall over the serial ANN mirrors (each bitwise
    equal to its engine pipeline, so the recalls are exact)."""
    sf = sf_dir or oracle_sf_dir()
    def pairs(df: pd.DataFrame) -> set:
        return set(zip(df["query_id"].astype(int), df["vec_id"].astype(int)))

    # exact brute-force baseline (same normalize+matmul float ops as
    # the engine's ann_topk_cosine — 64-length dots are order-free)
    ids, mat = _embeddings(sf)
    n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    exact = set()
    for qi in np.flatnonzero(ids < num_queries):
        cos = n[qi] @ n.T
        mask = ids != ids[qi]
        order = np.lexsort((ids[mask], -cos[mask]))[:k]
        for j in np.flatnonzero(mask)[order]:
            exact.add((int(ids[qi]), int(ids[j])))
    legs = {"ivf": ann_ivf_topk(sf, num_queries, k),
            "ivf_pq": ann_ivf_pq(sf, num_queries, k),
            "lsh": ann_lsh_topk(sf, num_queries, k),
            "pq": ann_pq_topk(sf, num_queries, k),
            "sq": ann_sq_topk(sf, num_queries, k),
            "nsw": ann_nsw_topk(sf, num_queries, k)}
    rows = []
    denom = max(len(exact), 1)
    for method in sorted(legs):
        hits = len(pairs(legs[method]) & exact)
        rows.append((method, hits, len(exact),
                     float(np.floor(hits * 10_000.0 / denom) / 10_000)))
    return pd.DataFrame(rows, columns=["method", "n_hits", "n_possible",
                                       "recall"])


def dsir_importance(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial mirror of functions.text.dsir_importance: bucket
    histograms accumulated doc-by-doc, log-ratio and per-doc weight
    through the SAME frozen kernels — doubles are bitwise equal (the
    distributed side's count sums are integers)."""
    from ccrawler_ray.functions.text import (DSIR_TARGET_LANG,
                                             _dsir_buckets, _dsir_doc_logw,
                                             _dsir_lambda)
    from ccrawler_ray.functions.text import DSIR_BUCKETS as B

    sf = sf_dir or oracle_sf_dir()
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    dids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    feats = [_dsir_buckets(text.split()) for text in texts]
    cnt_t = np.zeros(B, dtype=np.int64)
    cnt_r = np.zeros(B, dtype=np.int64)
    for lang, b in zip(langs, feats):
        np.add.at(cnt_r, b, 1)
        if lang == DSIR_TARGET_LANG:
            np.add.at(cnt_t, b, 1)
    lam = _dsir_lambda(cnt_t, int(cnt_t.sum()), cnt_r, int(cnt_r.sum()))
    rows = [(int(did), len(b), _dsir_doc_logw(b, lam))
            for did, b in zip(dids, feats)]
    df = pd.DataFrame(rows, columns=["doc_id", "n_feats", "logw"])
    df["keep"] = df["logw"].to_numpy() > 0.0
    return df


def bpe_pair_topk(sf_dir: str | None = None, k: int = 20) -> pd.DataFrame:
    """Serial mirror of functions.text.bpe_pair_topk: per-doc pair
    codes through the SAME frozen kernel, exact integer counts."""
    from ccrawler_ray.functions.text import _char_pairs, _pair_str

    sf = sf_dir or oracle_sf_dir()
    _, texts = _docs(sf)
    codes = [c for text in texts for c in (_char_pairs(text),) if len(c)]
    if not codes:
        return pd.DataFrame({"pair": pd.Series(dtype="object"),
                             "cnt": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64")})
    uk, cnt = np.unique(np.concatenate(codes), return_counts=True)
    top = np.lexsort((uk, -cnt))[:k]
    return pd.DataFrame({"pair": [_pair_str(c) for c in uk[top]],
                         "cnt": cnt[top].astype(np.int64),
                         "rank": np.arange(1, len(top) + 1, dtype=np.int64)})


def bpe_encode_stats(sf_dir: str | None = None,
                     n_merges: int = 30) -> pd.DataFrame:
    """Serial mirror of functions.text.bpe_encode_stats: Counter word
    counts + the SAME frozen merge loop and encode kernel — exact."""
    from collections import Counter

    from ccrawler_ray.functions.text import _bpe_encode_word, _bpe_merge_loop

    sf = sf_dir or oracle_sf_dir()
    ids, texts = _docs(sf)
    counts: Counter = Counter()
    for text in texts:
        counts.update(text.split())
    rows = _bpe_merge_loop(sorted(counts.items()), n_merges)
    rank_of = {(left, right): rank for rank, left, right, _, _ in rows}
    cache: dict = {}
    n_words, n_tokens = [], []
    for text in texts:
        ws = text.split()
        n_words.append(len(ws))
        tot = 0
        for w in ws:
            n = cache.get(w)
            if n is None:
                n = _bpe_encode_word(w, rank_of)
                cache[w] = n
            tot += n
        n_tokens.append(tot)
    return pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64),
                         "n_words": np.asarray(n_words, dtype=np.int64),
                         "n_tokens": np.asarray(n_tokens, dtype=np.int64)})


def bpe_train_merges(sf_dir: str | None = None,
                     n_merges: int = 30) -> pd.DataFrame:
    """Serial mirror of functions.text.bpe_train_merges: Counter word
    frequencies + the SAME frozen merge loop — exact."""
    from collections import Counter

    from ccrawler_ray.functions.text import _bpe_merge_loop

    sf = sf_dir or oracle_sf_dir()
    _, texts = _docs(sf)
    counts: Counter = Counter()
    for text in texts:
        counts.update(text.split())
    words = sorted(counts.items())
    rows = _bpe_merge_loop(words, n_merges)
    return pd.DataFrame(rows, columns=["merge_rank", "left_sym",
                                       "right_sym", "merged",
                                       "pair_count"]).astype(
        {"merge_rank": "int64", "pair_count": "int64"})


def mix_temperature_sample(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial mirror of pipelines.mix.mix_temperature_sample — same
    frozen rate formula (temp_keep_rates, shared by import) and draw
    (spec.hash64_batch), flat numpy instead of the two-pass
    distributed count — exact."""
    from collections import Counter

    from ccrawler_ray.pipelines.mix import (TEMP_ALPHA, TEMP_FRAC,
                                            TEMP_SEED, temp_keep_rates)
    from ccrawler_ray.spec import hash64_batch

    t = pq.read_table(f"{sf_dir or oracle_sf_dir()}/documents.parquet",
                      columns=["doc_id", "source"])
    ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    sources = np.asarray(t.column("source").to_pylist(), dtype=object)
    rates = temp_keep_rates(dict(Counter(sources.tolist())),
                            TEMP_ALPHA, TEMP_FRAC)
    h = hash64_batch([str(i) for i in ids], seed=TEMP_SEED)
    u = (h.astype(np.float64) + 1.0) / 2.0 ** 64
    r = np.array([rates[s] for s in sources], dtype=np.float64)
    keep = u <= r
    return pd.DataFrame({"doc_id": ids[keep], "source": sources[keep]})


def link_components(sf_dir: str | None = None,
                    keep_mod: int = 4) -> pd.DataFrame:
    """Serial mirror of functions.graph.link_components — same frozen
    thinning rule (edge k of node i survives iff
    splitmix64(8i+k) % keep_mod == 0 over the pagerank candidate
    targets), plain-Python union-find, component = min id."""
    ids, _ = _docs(sf_dir or oracle_sf_dir())
    n = len(ids)
    parent = list(range(n))

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != x:
            parent[x], x = r, parent[x]
        return r

    for i in range(1, n):
        for kk in (1, 2, 3):
            if _splitmix64_int(8 * i + kk) % keep_mod == 0:
                t = _splitmix64_int(4 * i + kk) % i
                ri, rt = find(i), find(t)
                if ri != rt:
                    parent[max(ri, rt)] = min(ri, rt)
    comp = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "component": comp,
        "is_rep": comp == np.arange(n, dtype=np.int64)})


def quality_compression(sf_dir: str | None = None,
                        keep_pct: int = 30) -> pd.DataFrame:
    """Serial mirror of functions.text.quality_compression — the same
    zlib level-6 calls and the same IEEE int→double division."""
    import zlib

    ids, texts = _docs(sf_dir or oracle_sf_dir())
    rl, cl = [], []
    for tx in texts:
        b = tx.encode("utf-8")
        rl.append(len(b))
        cl.append(len(zlib.compress(b, 6)))
    rl_a = np.asarray(rl, dtype=np.int64)
    cl_a = np.asarray(cl, dtype=np.int64)
    ratio = np.divide(cl_a, rl_a, out=np.zeros(len(rl_a), np.float64),
                      where=rl_a != 0)
    return pd.DataFrame({
        "doc_id": np.asarray(ids, dtype=np.int64),
        "raw_len": rl_a, "comp_len": cl_a, "ratio": ratio,
        "keep": cl_a * 100 > rl_a * np.int64(keep_pct)})


def embedding_pca(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial mirror of functions.similarity.embedding_pca: the same
    PCA_QSCALE quantization accumulated row-by-row with Python ints
    (genuinely independent of the salted distributed reduce), then
    the SAME frozen pca_finish — bitwise equal iff the distributed
    integer Gram is exact."""
    from ccrawler_ray.functions.similarity import PCA_QSCALE, pca_finish

    _, mat = _embeddings(sf_dir or oracle_sf_dir())
    n, d = mat.shape
    q = np.round(mat * PCA_QSCALE).astype(np.int64)
    svec = [0] * d
    iu = list(zip(*np.triu_indices(d)))
    gram = [0] * len(iu)
    for r in range(n):
        row = [int(v) for v in q[r]]
        for j in range(d):
            svec[j] += row[j]
        for t, (j, k) in enumerate(iu):
            gram[t] += row[j] * row[k]
    return pca_finish(n, svec, gram, d)


def ccnet_buckets(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial mirror of functions.text.ccnet_buckets: dict-trained LM
    counts (independent of the distributed training), the SAME frozen
    _lm_doc_xent kernel, a plain per-lang sort by (qx, doc_id), and
    the 3*rank < n / 3*rank < 2n tercile rule — equivalent by
    construction to the engine's cut-tuple comparison."""
    import pyarrow.parquet as pq_

    from ccrawler_ray.functions.text import (LM_TRAIN_KEEP, LM_TRAIN_MOD,
                                             _REP_C1, _lm_doc_xent)

    sf = sf_dir or oracle_sf_dir()
    t = pq_.read_table(f"{sf}/documents.parquet",
                       columns=["doc_id", "text", "lang"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    uni: dict[int, int] = {}
    bi: dict[int, int] = {}
    mod = 1 << 64
    for did, text in zip(ids, texts):
        if did % LM_TRAIN_MOD >= LM_TRAIN_KEEP:
            continue
        hs = [_whash(w) for w in text.split()]
        for x in hs:
            uni[x] = uni.get(x, 0) + 1
        for a, b in zip(hs, hs[1:]):
            k = (a * _REP_C1 + b) % mod
            bi[k] = bi.get(k, 0) + 1
    uni_k = np.array(sorted(uni), dtype=np.uint64)
    uni_c = np.array([uni[int(k)] for k in uni_k], dtype=np.int64)
    bi_k = np.array(sorted(bi), dtype=np.uint64)
    bi_c = np.array([bi[int(k)] for k in bi_k], dtype=np.int64)
    n_tokens, vocab = int(uni_c.sum()), len(uni_k)
    rows = []
    for did, text, lang in zip(ids, texts, langs):
        h = np.array([_whash(w) for w in text.split()], dtype=np.uint64)
        xe = _lm_doc_xent(h, uni_k, uni_c, bi_k, bi_c, n_tokens, vocab)
        rows.append((did, lang, round(xe * 10_000)))
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "qx"])
    out = []
    for lang, g in df.groupby("lang"):
        g = g.sort_values(["qx", "doc_id"]).reset_index(drop=True)
        n = len(g)
        r = np.arange(n, dtype=np.int64)
        bucket = np.where(3 * r < n, "head",
                          np.where(3 * r < 2 * n, "middle", "tail"))
        out.append(pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "lang": lang,
            "xent": g["qx"].to_numpy() / 10_000.0,
            "bucket": bucket}))
    return (pd.concat(out).sort_values("doc_id").reset_index(drop=True)
            if out else pd.DataFrame(
                columns=["doc_id", "lang", "xent", "bucket"]))


def cluster_kmeans(sf_dir: str | None = None, n_clusters: int = 16,
                   iters: int = 5) -> pd.DataFrame:
    """Serial mirror of functions.similarity.cluster_kmeans — same
    shared quantized-int64 k-means (kmeans_centroids above is already
    bitwise-equal to the engine's), same per-vector micro-unit
    distance quantization BEFORE the int64 sum, same single double
    division — bitwise equal at any partitioning."""
    sf_dir = sf_dir or oracle_sf_dir()
    ids, mat = _embeddings(sf_dir)
    cents = kmeans_centroids(sf_dir, k=n_clusters, iters=iters)
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    dq = np.round(d2[np.arange(len(mat)), a] * 1e6).astype(np.int64)
    cl, inv = np.unique(a, return_inverse=True)
    dsum = np.zeros(len(cl), dtype=np.int64)
    np.add.at(dsum, inv, dq)
    return pd.DataFrame({
        "cluster": cl.astype(np.int64),
        "n_members": np.bincount(inv).astype(np.int64),
        "inertia": dsum.astype(np.float64) / 1e6})


def knn_graph(sf_dir: str | None = None, k: int = 5) -> pd.DataFrame:
    """Serial mirror of functions.similarity.knn_graph: full cosine
    matrix, 4-dp rounding, the same packed (-cos, nbr_id) int64 sort
    key — integer selection, bitwise equal."""
    sf_dir = sf_dir or oracle_sf_dir()
    ids, mat = _embeddings(sf_dir)
    n = len(ids)
    if n == 0:
        return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64"),
                             "nbr_id": pd.Series(dtype="int64"),
                             "cos": pd.Series(dtype="float64")})
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qcos = np.round(m @ m.T * 1e4).astype(np.int64)
    key = (np.int64(10_000) - qcos) * np.int64(2**33) + ids[None, :]
    inf = np.int64(2**62)
    key[ids[:, None] == ids[None, :]] = inf
    rows = []
    order = np.sort(key, axis=1)[:, :k]
    for i in range(n):
        sel = order[i][order[i] < inf]
        for r, kv in enumerate(sel, 1):
            rows.append((int(ids[i]), r, int(kv & np.int64(2**33 - 1)),
                         float(np.int64(10_000) - (kv >> np.int64(33))) / 1e4))
    return pd.DataFrame(rows, columns=["vec_id", "rank", "nbr_id", "cos"])


def source_ngram_overlap(sf_dir: str | None = None, n: int = 8) -> pd.DataFrame:
    """Serial mirror of functions.dedup.source_ngram_overlap: the same
    rolling polynomial hash over the same blake2b word hashes, plain
    per-source Python sets instead of the salted mask shuffle."""
    d = sf_dir or oracle_sf_dir()
    t = pq.read_table(f"{d}/documents.parquet", columns=["text", "source"])
    mod = 1 << 64
    pows = [pow(0x9E3779B97F4A7C15, n - 1 - j, mod) for j in range(n)]
    by_src: dict[str, set] = {}
    for text, src in zip(t.column("text").to_pylist(),
                         t.column("source").to_pylist()):
        hs = [_whash(w) for w in text.split()]
        s = by_src.setdefault(src, set())
        for i in range(len(hs) - n + 1):
            v = 0
            for j in range(n):
                v = (v + hs[i + j] * pows[j]) % mod
            s.add(v)
    srcs = sorted(by_src)
    rows = []
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = by_src[srcs[i]], by_src[srcs[j]]
            inter, union = len(a & b), len(a | b)
            jm = inter * 1_000_000 // union if union else 0
            rows.append((srcs[i], srcs[j], inter, union, jm))
    return pd.DataFrame(rows, columns=["source_a", "source_b", "n_inter",
                                       "n_union", "jaccard_micro"])


def ann_nsw_topk(sf_dir: str | None = None, num_queries: int = 5,
                 k: int = 5, graph_k: int = 5, ef: int = 32) -> pd.DataFrame:
    """Serial mirror of functions.similarity.ann_nsw_topk: the SAME
    walk kernel and adjacency-assembly rule by import, fed the
    serially-built exact kNN graph — bitwise equal iff the distributed
    graph and normalization are exact."""
    from ccrawler_ray.functions.similarity import (adjacency_from_edges,
                                                   nsw_search)

    d = sf_dir or oracle_sf_dir()
    ids, mat = _embeddings(d)
    if len(ids) == 0:
        return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64"),
                             "vec_id": pd.Series(dtype="int64"),
                             "cos": pd.Series(dtype="float64")})
    ids = ids.astype(np.int64)
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    g = knn_graph(d, k=graph_k)
    nbr = adjacency_from_edges(ids, g["vec_id"].to_numpy(),
                               g["nbr_id"].to_numpy())
    qsel = ids < num_queries
    qm = mat[qsel] / np.linalg.norm(mat[qsel], axis=1, keepdims=True)
    return nsw_search(ids[qsel], qm, ids, m, nbr, 0, ef, k)


def spans_integrity_report(sf_dir: str | None = None) -> pd.DataFrame:
    """Serial mirror of functions.spans.spans_integrity_report: plain
    Python loop over the same deterministic interleaved corpus."""
    from ccrawler_ray.sources.corpus import corpus_from_documents

    sf = sf_dir or oracle_sf_dir()
    t = corpus_from_documents(f"{sf}/documents.parquet")
    n_docs = n_spans = off_bad = ref_bad = 0
    trans = [0, 0, 0, 0]
    for spans in t.column("spans").to_pylist():
        if spans:
            n_docs += 1
        prev_off = None
        prev_media = None
        for s in spans:
            n_spans += 1
            is_media = s["kind"] == "media"
            if bool(s["media_ref"]) != is_media:
                ref_bad += 1
            if prev_off is not None and s["offset"] <= prev_off:
                off_bad += 1
            if prev_media is not None:
                trans[prev_media * 2 + is_media] += 1
            prev_off, prev_media = s["offset"], int(is_media)
    return pd.DataFrame([{
        "n_docs": n_docs, "n_spans": n_spans,
        "n_offset_violations": off_bad, "n_ref_violations": ref_bad,
        "tt": trans[0], "tm": trans[1], "mt": trans[2], "mm": trans[3],
    }]).astype("int64")


def ann_hybrid_search(sf_dir: str | None = None,
                      terms: tuple = None, k: int = None,
                      qvec_n: int = None) -> pd.DataFrame:
    """Serial mirror of functions.similarity.ann_hybrid_search —
    identical frozen ops: the shared _bm25_score_cols kernel (exact
    integer inputs → bitwise scores), cos rounded to 4 dp (the
    ann_range_search reproducibility convention), the same fusion
    expression, (hybrid desc, doc_id asc) top-k."""
    from ccrawler_ray.functions.similarity import (
        HYBRID_K, HYBRID_QVEC_N, HYBRID_TERMS)
    from ccrawler_ray.functions.text import _bm25_score_cols

    terms = terms or HYBRID_TERMS
    k = k or HYBRID_K
    qvec_n = qvec_n or HYBRID_QVEC_N
    d = sf_dir or oracle_sf_dir()
    ids, texts = _docs(d)
    m = len(terms)
    tf = np.zeros((len(ids), m), dtype=np.int64)
    dl = np.zeros(len(ids), dtype=np.int64)
    for i, t in enumerate(texts):
        ws = t.split()
        dl[i] = len(ws)
        for j, term in enumerate(terms):
            tf[i, j] = ws.count(term)
    n_docs, total_len = len(ids), int(dl.sum())
    dfreq = (tf > 0).sum(axis=0).astype(np.int64)
    idf = np.log((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
    s = _bm25_score_cols(tf, dl, idf, n_docs, total_len)
    bm = dict(zip((int(i) for i in ids), s))

    vids, mat = _embeddings(d)
    q = mat[vids < qvec_n].mean(axis=0)
    q /= np.linalg.norm(q)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos4 = np.round(mn @ q, 4)

    rows = [(int(v), bm.get(int(v), 0.0), float(c)) for v, c in zip(vids, cos4)
            if int(v) in bm]
    df = pd.DataFrame(rows, columns=["doc_id", "bm25", "cos"])
    b = df["bm25"].to_numpy(dtype=np.float64)
    c = df["cos"].to_numpy(dtype=np.float64)
    df["hybrid"] = 0.5 * (b / (1.0 + b)) + 0.5 * c
    df = df.sort_values(["hybrid", "doc_id"],
                        ascending=[False, True]).head(k).reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df[["doc_id", "bm25", "cos", "hybrid", "rank"]]
