"""Deduplication operators (exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine) — the large-scale training-data dedup
toolkit, Ray-Data-first.

Scale notes (10^8+ docs):
* exact dedup: hash-partition on content hash + per-group first
  (relational.d3_content_dedup) — one shuffle of (hash, id) pairs only;
* MinHash/LSH: signatures per batch (one vectorized perm pass +
  segment-min, per-worker word-hash cache), band hashes vectorized over
  the (n, bands, rows_per_band) reshape, ONE coarse-salted groupby on
  the band key → candidate pairs, then a CO-PARTITIONED signature join
  on doc_id for the estimate/verify — no driver-side materialization of
  any unbounded table, never an O(n²) comparison;
* SimHash: dynamic pigeonhole blocking — max_hamming+1 contiguous bit
  blocks guarantee every pair within the radius shares >= 1 exact block
  (single-probe 4x16-bit only covers radius <= 3; ADVICE r1);
* embedding-cosine: exact all-pairs via distributed block-pair tasks
  over the materialized normalized blocks (driver holds refs only);
  the sub-quadratic scale path is IVF bucketing (functions.similarity);
* exact verify at scale: dedup_lsh_verified joins word-set hashes onto
  the LSH candidate pairs (ngram_jaccard_pairs stays as the small-scale
  all-pairs oracle only).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ccrawler_ray.spec import as_single_array

_MERSENNE = (1 << 61) - 1

# per-worker-process word → hash cache (Zipf vocabulary → high hit
# rate; the pattern measured in stages/analyze.py). Bounded so an
# adversarial vocabulary can't grow a worker heap without limit.
_WORD_HASH_CACHE: dict[str, int] = {}
_WORD_HASH_CACHE_MAX = 4_000_000


def word_hashes(words) -> np.ndarray:
    """uint64 blake2b(8) per word, cached per worker process."""
    cache = _WORD_HASH_CACHE
    if len(cache) > _WORD_HASH_CACHE_MAX:
        cache.clear()
    dig = hashlib.blake2b
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = cache.get(w)
        if h is None:
            h = int.from_bytes(dig(w.encode(), digest_size=8).digest(), "little")
            cache[w] = h
        out[i] = h
    return out


def _word_set_hashes(text: str) -> np.ndarray:
    """Distinct-word shingle hashes (uint64) for one document."""
    return word_hashes(list(set(text.split())))


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minhash values via (a*x + b) mod p — vectorized outer.
    (Scalar reference; the batch path is :func:`_batch_signatures`.)"""
    if len(shingles) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    x = shingles.astype(np.uint64)[None, :]
    vals = (a[:, None] * x + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def _batch_signatures(texts, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n, num_perm) uint64 signature matrix for a batch of texts:
    hash every distinct word once (cached), ONE vectorized perm pass
    over the concatenated hashes, then a segment-min per doc
    (np.minimum.reduceat) — no per-doc Python loop."""
    n = len(texts)
    num_perm = len(a)
    out = np.full((n, num_perm), _MERSENNE, dtype=np.uint64)
    word_sets = [list(set(t.split())) for t in texts]
    lens = np.fromiter((len(w) for w in word_sets), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return out
    h = word_hashes([w for ws in word_sets for w in ws])
    vals = (a[:, None] * h[None, :] + b[:, None]) % np.uint64(_MERSENNE)  # (P, total)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    nz = np.nonzero(lens)[0]
    # consecutive start offsets of non-empty docs delimit exactly each
    # doc's hash segment (empty docs contribute zero-width segments)
    mins = np.minimum.reduceat(vals, offsets[:-1][nz], axis=1)  # (P, n_nonempty)
    out[nz] = mins.T
    return out


def _sig_matrix(col) -> np.ndarray:
    """binary signature column (P uint64s little-endian per row) →
    (n, P) uint64 matrix. Binary (not list) because Acero's hash join
    only carries fixed-width/binary payload columns."""
    arr = as_single_array(col)
    vals = arr.to_pylist()
    if not vals:
        return np.empty((0, 0), dtype=np.uint64)
    p = len(vals[0]) // 8
    return np.frombuffer(b"".join(vals), dtype=np.uint64).reshape(len(vals), p)


def minhash_signatures(sf_dir: str, num_perm: int = 64):
    """doc_id → minhash signature (binary: num_perm uint64s LE)."""
    a, b = _minhash_params(num_perm)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        sigs = _batch_signatures(batch.column("text").to_pylist(), a, b)
        sig_arr = pa.array([sigs[i].tobytes() for i in range(len(sigs))], pa.binary())
        return pa.table({"doc_id": batch.column("doc_id"), "signature": sig_arr})

    # batch_size caps the (num_perm × total_words) perm matrix per task
    return ds.map_batches(f, batch_format="pyarrow", batch_size=512)


def _band_hashes(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) uint64 FNV-1a over each band's signature rows —
    vectorized over the (n, bands, rows_per_band) reshape."""
    n, num_perm = sigs.shape
    r = num_perm // bands
    s = sigs[:, : bands * r].reshape(n, bands, r)
    h = np.full((n, bands), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for j in range(r):
        h = (h ^ s[:, :, j]) * prime
    return h


_NUM_PAIR_BUCKETS = 32
_EMPTY_PAIRS = pd.DataFrame(
    {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
     "pb": pd.Series(dtype="int64")}
)


def _lsh_candidate_pairs(sigs, bands: int):
    """Banded LSH candidate pairs (doc_a < doc_b), deduplicated across
    bands. One coarse-salted groupby (≤ bands×16 groups — Ray pays
    per-GROUP task overhead, so real buckets iterate inside the group
    fn) + one coarse pair-bucket dedup groupby."""

    def to_bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "band": pa.array([], pa.int32()),
                 "band_hash": pa.array([], pa.uint64()), "bh_salt": pa.array([], pa.int32())}
            )
        bh = _band_hashes(_sig_matrix(batch.column("signature")), bands)
        doc = np.repeat(batch.column("doc_id").to_numpy(zero_copy_only=False), bands)
        band = np.tile(np.arange(bands, dtype=np.int32), n)
        flat = bh.ravel()
        return pa.table(
            {"doc_id": pa.array(doc), "band": pa.array(band),
             "band_hash": pa.array(flat, pa.uint64()),
             "bh_salt": pa.array((flat % np.uint64(16)).astype(np.int32))}
        )

    band_rows = sigs.map_batches(to_bands, batch_format="pyarrow")

    def salted_group_pairs(gdf: pd.DataFrame) -> pd.DataFrame:
        """One (band, bh_salt) group: iterate its REAL buckets
        (band_hash values) and emit all within-bucket pairs."""
        out_a: list = []
        out_b: list = []
        for _, df in gdf.groupby("band_hash", sort=False):
            ids = np.sort(df["doc_id"].unique())
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ia].astype(np.int64))
            out_b.append(ids[ib].astype(np.int64))
        if not out_a:
            return _EMPTY_PAIRS
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pd.DataFrame(
            {"doc_a": a, "doc_b": b, "pb": (a * 1_000_003 + b) % _NUM_PAIR_BUCKETS}
        )

    cand = band_rows.groupby(["band", "bh_salt"]).map_groups(
        salted_group_pairs, batch_format="pandas"
    )
    dedup = cand.groupby("pb").map_groups(
        lambda g: g.drop_duplicates(["doc_a", "doc_b"]), batch_format="pandas"
    )
    return dedup.drop_columns(["pb"])


def _join_signatures(pairs, sigs, num_partitions: int = 8):
    """Co-partitioned join of the signature table onto candidate pairs
    (sig_a on doc_a, sig_b on doc_b) — the scale replacement for a
    driver-side signature dict broadcast."""
    sig_a = sigs.map_batches(
        lambda t: t.rename_columns(["doc_a", "sig_a"]), batch_format="pyarrow"
    )
    sig_b = sigs.map_batches(
        lambda t: t.rename_columns(["doc_b", "sig_b"]), batch_format="pyarrow"
    )
    j = pairs.join(sig_a, join_type="inner", num_partitions=num_partitions,
                   on=("doc_a",))
    return j.join(sig_b, join_type="inner", num_partitions=num_partitions,
                  on=("doc_b",))


def dedup_minhash_lsh(sf_dir: str, num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.5):
    """MinHash+LSH near-dup candidate pairs with estimated Jaccard.

    shingle → minhash → band → bucket groupby (the LSH shuffle) →
    pairs within buckets → co-partitioned signature join → vectorized
    estimate. Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b,
    est_jaccard >= threshold, deduplicated across buckets.
    """
    sigs = minhash_signatures(sf_dir, num_perm).materialize()
    pairs = _lsh_candidate_pairs(sigs, bands)
    joined = _join_signatures(pairs, sigs)

    def estimate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                 "est_jaccard": pa.array([], pa.float64())}
            )
        sa = _sig_matrix(batch.column("sig_a"))
        sb = _sig_matrix(batch.column("sig_b"))
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {"doc_a": batch.column("doc_a").filter(pa.array(keep)),
             "doc_b": batch.column("doc_b").filter(pa.array(keep)),
             "est_jaccard": pa.array(np.round(est[keep], 4), pa.float64())}
        )

    return joined.map_batches(estimate, batch_format="pyarrow")


def word_set_table(sf_dir: str):
    """doc_id → sorted distinct-word hash set (list<uint64>) — the
    join side for exact verification on candidate pairs."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        ws = [np.sort(_word_set_hashes(t)) for t in batch.column("text").to_pylist()]
        # binary (uint64s LE): Acero join payload can't be a list column
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "wset": pa.array([w.tobytes() for w in ws], pa.binary())}
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=512)


def dedup_lsh_verified(sf_dir: str, num_perm: int = 64, bands: int = 16,
                       threshold: float = 0.5):
    """EXACT word-set Jaccard computed ONLY on MinHash-LSH candidate
    pairs — the production-scale form of :func:`ngram_jaccard_pairs`:
    word sets are joined onto the candidate pairs co-partitioned on
    doc id (never an all-pairs broadcast). Returns (doc_a, doc_b,
    jaccard) with jaccard floor-scaled to 4 decimals, doc_a < doc_b.
    """
    sigs = minhash_signatures(sf_dir, num_perm).materialize()
    pairs = _lsh_candidate_pairs(sigs, bands)
    wsets = word_set_table(sf_dir).materialize()
    w_a = wsets.map_batches(
        lambda t: t.rename_columns(["doc_a", "ws_a"]), batch_format="pyarrow"
    )
    w_b = wsets.map_batches(
        lambda t: t.rename_columns(["doc_b", "ws_b"]), batch_format="pyarrow"
    )
    j = pairs.join(w_a, join_type="inner", num_partitions=8, on=("doc_a",))
    j = j.join(w_b, join_type="inner", num_partitions=8, on=("doc_b",))

    def verify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        wa = as_single_array(batch.column("ws_a")).to_pylist()
        wb = as_single_array(batch.column("ws_b")).to_pylist()
        jacc = np.empty(n, dtype=np.float64)
        for i in range(n):  # C-speed set intersection per candidate pair
            a = np.frombuffer(wa[i], dtype=np.uint64)
            b = np.frombuffer(wb[i], dtype=np.uint64)
            inter = len(np.intersect1d(a, b, assume_unique=True))
            jacc[i] = inter / (len(a) + len(b) - inter) if len(a) + len(b) else 0.0
        keep = jacc >= threshold
        return pa.table(
            {"doc_a": batch.column("doc_a").filter(pa.array(keep)),
             "doc_b": batch.column("doc_b").filter(pa.array(keep)),
             # floor-scale: matches the DuckDB/serial oracle exactly
             "jaccard": pa.array(np.floor(jacc[keep] * 10000) / 10000, pa.float64())}
        )

    return j.map_batches(verify, batch_format="pyarrow")


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5):
    """EXACT word-set Jaccard pairs >= threshold — the all-pairs
    ground-truth oracle the LSH pipelines approximate. Small-scale
    only by construction (O(n²)); the production path is
    :func:`dedup_lsh_verified`. Broadcasts the distinct-word sets and
    compares each batch against the full table (doc_a < doc_b).
    """
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    all_docs = ds.to_pandas()
    sets = {r.doc_id: frozenset(r.text.split()) for r in all_docs.itertuples()}
    sets_ref = ray.put(sets)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(sets_ref)
        ids_all = np.sort(np.fromiter(sm.keys(), dtype=np.int64))
        out_a, out_b, out_j = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            s = frozenset(text.split())
            for other in ids_all:
                if other <= doc_id:
                    continue
                o = sm[other]
                inter = len(s & o)
                if inter == 0:
                    continue
                j = inter * 1.0 / (len(s) + len(o) - inter)
                if j >= threshold:
                    out_a.append(doc_id)
                    out_b.append(int(other))
                    # floor-scale: matches the DuckDB oracle exactly
                    # (round() differs in half-even vs half-away mode)
                    out_j.append(np.floor(j * 10000) / 10000)
        return pd.DataFrame(
            {"doc_a": np.array(out_a, dtype=np.int64),
             "doc_b": np.array(out_b, dtype=np.int64),
             "jaccard": np.array(out_j, dtype=np.float64)}
        )

    return ds.map_batches(f, batch_format="pandas")


_BIT_WEIGHTS = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def _batch_simhash(texts) -> np.ndarray:
    """uint64 SimHash per text — one pass: concatenated word hashes →
    per-bit counts via segment-sum (np.add.reduceat)."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    word_sets = [list(set(t.split())) for t in texts]
    lens = np.fromiter((len(w) for w in word_sets), dtype=np.int64, count=n)
    if lens.sum() == 0:
        return out
    h = word_hashes([w for ws in word_sets for w in ws])
    bits = ((h[:, None] & _BIT_WEIGHTS[None, :]) != 0).astype(np.int64)  # (total, 64)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    nz = np.nonzero(lens)[0]
    counts = np.add.reduceat(bits, offsets[:-1][nz], axis=0)  # (n_nonempty, 64)
    votes = counts * 2 - lens[nz][:, None]
    out[nz] = ((votes > 0) * _BIT_WEIGHTS[None, :]).sum(axis=1, dtype=np.uint64)
    return out


def simhash_signatures(sf_dir: str):
    """64-bit SimHash per doc over distinct-word hashes."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        sh = _batch_simhash(batch.column("text").to_pylist())
        return pa.table(
            {"doc_id": batch.column("doc_id"), "simhash": pa.array(sh, pa.uint64())}
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=512)


def _hamming_blocks(max_hamming: int) -> list[tuple[int, int]]:
    """max_hamming+1 contiguous bit ranges covering the 64-bit hash —
    pigeonhole: any pair within the radius shares >= 1 exact block."""
    num_blocks = max_hamming + 1
    edges = np.linspace(0, 64, num_blocks + 1).astype(int)
    return list(zip(edges[:-1].tolist(), edges[1:].tolist()))


def dedup_simhash(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs within the given hamming radius.

    Blocking is DERIVED from the radius (max_hamming+1 contiguous
    blocks → guaranteed 100% recall by pigeonhole), then exact hamming
    verify within buckets. Block keys have 64/(max_hamming+1) bits, so
    wide radii coarsen the buckets — the scale-safe operating point is
    max_hamming <= 3 (16-bit blocks); larger radii are supported but
    documented as small-scale (ADVICE r1: the old fixed 4-block scheme
    silently missed pairs with hamming in 4..max)."""
    sigs = simhash_signatures(sf_dir).materialize()
    blocks = _hamming_blocks(max_hamming)
    nblocks = len(blocks)

    def to_blocks(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "blk": pa.array([], pa.int32()),
                 "key": pa.array([], pa.uint64()), "simhash": pa.array([], pa.uint64()),
                 "key_salt": pa.array([], pa.int32())}
            )
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keys = np.empty((nblocks, n), dtype=np.uint64)
        for bi, (lo, hi) in enumerate(blocks):
            keys[bi] = (sh >> np.uint64(lo)) & np.uint64((1 << (hi - lo)) - 1)
        flat = keys.ravel()
        return pa.table(
            {"doc_id": pa.array(np.tile(doc, nblocks)),
             "blk": pa.array(np.repeat(np.arange(nblocks, dtype=np.int32), n)),
             "key": pa.array(flat, pa.uint64()),
             "simhash": pa.array(np.tile(sh, nblocks), pa.uint64()),
             # coarse shuffle key (see _lsh_candidate_pairs)
             "key_salt": pa.array((flat % np.uint64(16)).astype(np.int32))}
        )

    block_rows = sigs.map_batches(to_blocks, batch_format="pyarrow")

    def salted_block_verify(gdf: pd.DataFrame) -> pd.DataFrame:
        out_a: list = []
        out_b: list = []
        out_h: list = []
        for _, df in gdf.groupby("key", sort=False):
            ids = df.drop_duplicates("doc_id").sort_values("doc_id")
            if len(ids) < 2:
                continue
            sh = ids["simhash"].to_numpy().astype(np.uint64)
            di = ids["doc_id"].to_numpy()
            ia, ib = np.triu_indices(len(di), k=1)
            x = sh[ia] ^ sh[ib]
            ham = np.array([bin(int(v)).count("1") for v in x])
            m = ham <= np.int64(max_hamming)
            if m.any():
                out_a.append(di[ia][m].astype(np.int64))
                out_b.append(di[ib][m].astype(np.int64))
                out_h.append(ham[m].astype(np.int64))
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64"),
                                 "pb": pd.Series(dtype="int64")})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pd.DataFrame(
            {"doc_a": a, "doc_b": b, "hamming": np.concatenate(out_h),
             "pb": (a * 1_000_003 + b) % _NUM_PAIR_BUCKETS}
        )

    pairs = block_rows.groupby(["blk", "key_salt"]).map_groups(
        salted_block_verify, batch_format="pandas"
    )
    # cross-block dedup in P coarse pair-buckets (see _lsh_candidate_pairs)
    dedup = pairs.groupby("pb").map_groups(
        lambda g: g.drop_duplicates(["doc_a", "doc_b"]), batch_format="pandas"
    )
    return dedup.drop_columns(["pb"])


def dedup_embedding_cosine(sf_dir: str, threshold: float = 0.9):
    """Embedding near-dup pairs: cosine >= threshold, doc_a < doc_b.

    EXACT all-pairs, distributed: the normalized matrix is materialized
    as Arrow blocks in the object store and one Ray task per block pair
    (i <= j) computes that tile of the cosine matrix — the driver holds
    only block refs, never the vectors (the r1 broadcast-matrix form
    was a driver OOM at scale). O(n²) compute is inherent to the exact
    contract; the sub-quadratic path is IVF/LSH (functions.similarity).
    """
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def normalize(batch: pa.Table) -> pa.Table:
        emb = as_single_array(batch.column("embedding"))
        dim = len(emb[0]) if batch.num_rows else 0
        m = np.asarray(emb.flatten(), dtype=np.float64).reshape(-1, max(dim, 1))
        if batch.num_rows:
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
        return pa.table(
            {"vec_id": batch.column("vec_id"),
             "norm": pa.FixedSizeListArray.from_arrays(
                 pa.array(m.ravel(), pa.float64()), max(dim, 1))}
        )

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nblocks = max(4, int(np.ceil(np.sqrt(2 * ncpu))))
    norm = ds.map_batches(normalize, batch_format="pyarrow") \
             .repartition(nblocks).materialize()
    refs = norm.to_arrow_refs()

    @ray.remote
    def block_pair(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        ids_a = ta.column("vec_id").to_numpy(zero_copy_only=False)
        ids_b = tb.column("vec_id").to_numpy(zero_copy_only=False)
        dim = as_single_array(ta.column("norm")).type.list_size
        ma = np.asarray(as_single_array(ta.column("norm")).flatten()).reshape(-1, dim)
        mb = np.asarray(as_single_array(tb.column("norm")).flatten()).reshape(-1, dim)
        cos = ma @ mb.T
        if same:
            ia, ib = np.triu_indices(len(ids_a), k=1)
            hit = cos[ia, ib] >= threshold
            ia, ib = ia[hit], ib[hit]
        else:
            ia, ib = np.nonzero(cos >= threshold)
        va, vb = ids_a[ia], ids_b[ib]
        lo = np.minimum(va, vb)
        hi = np.maximum(va, vb)
        keep = lo != hi
        return pa.table(
            {"vec_a": pa.array(lo[keep].astype(np.int64)),
             "vec_b": pa.array(hi[keep].astype(np.int64)),
             "cos": pa.array(np.round(cos[ia, ib][keep], 4), pa.float64())}
        )

    out_refs = []
    for i, ra in enumerate(refs):
        for j, rb in enumerate(refs):
            if j < i:
                continue
            out_refs.append(block_pair.remote(ra, rb, i == j))
    return ray.data.from_arrow_refs(out_refs)
