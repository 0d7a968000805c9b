"""Analysis stage: the per-document compute of a production crawl
pipeline (fetch → parse → extract → ANALYZE → store): content hash,
token/quality stats, language ID, MinHash signature, SimHash.

This is the compute-heavy stage the bench exercises; it is exactly the
work a training-data pipeline runs per crawled page. Word hashes are
cached per worker process (Zipf vocabulary → high hit rate), and the
numeric kernels (minhash perms, simhash bit votes) run vectorized over
CHUNKS of documents at once (one perm matrix + segment reductions per
chunk — the `_batch_sig_wset` pattern) instead of per document; chunk
size caps the (num_perm × total_words) matrix at ~100 MB.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ccrawler_ray.functions.dedup import (CHUNK_WORDS as _CHUNK_WORDS,
                                           _minhash_params,
                                           word_hashes as _word_hashes)
from ccrawler_ray.spec import as_single_array

NUM_PERM = 64
_A, _B = _minhash_params(NUM_PERM)
_MERSENNE = np.uint64((1 << 61) - 1)

_BIT_WEIGHTS = (np.uint64(1) << np.arange(64, dtype=np.uint64))


ANALYSIS_COLS = ["n_tokens", "content_hash", "simhash", "minhash_sig", "pred_lang"]

_EN_STOPS = frozenset({"the", "and", "of", "a", "to", "in", "is", "it"})


def _sig_simhash_chunk(flat: np.ndarray, lens: np.ndarray):
    """Vectorized minhash signatures + simhash votes for one chunk of
    docs whose distinct-word hashes are concatenated in ``flat`` with
    per-doc lengths ``lens``. Identical arithmetic to the per-doc
    form: elementwise modular perms + segment minima, per-bit segment
    counts → majority votes."""
    nd = len(lens)
    sigs = np.full((nd, NUM_PERM), _MERSENNE, dtype=np.uint64)
    simhash = np.zeros(nd, dtype=np.uint64)
    if not len(flat):
        return sigs, simhash
    offsets = np.concatenate([[0], np.cumsum(lens)])
    nz = np.nonzero(lens)[0]
    starts = offsets[:-1][nz]
    vals = (_A[:, None] * flat[None, :] + _B[:, None]) % _MERSENNE
    sigs[nz] = np.minimum.reduceat(vals, starts, axis=1).T
    # per-bit counts per doc: 64 segment-sum passes over int8 bit rows
    counts = np.empty((64, len(nz)), dtype=np.int64)
    for b in range(64):
        bit = ((flat >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        counts[b] = np.add.reduceat(bit, starts)
    votes = counts * 2 - lens[nz][None, :]
    sim_nz = ((votes > 0).T * _BIT_WEIGHTS[None, :]).sum(axis=1, dtype=np.uint64)
    simhash[nz] = sim_nz
    return sigs, simhash


def analyze_docs(batch: pa.Table) -> pa.Table:
    """docs_out rows → same rows + appended analysis columns.

    Appending (rather than projecting) lets the engine fuse
    extract→analyze into ONE materialization — per-generation dataset
    executions are the crawl loop's fixed cost."""
    n = batch.num_rows
    if n == 0:
        out = batch
        for name, typ in (
            ("n_tokens", pa.int64()), ("content_hash", pa.uint64()),
            ("simhash", pa.uint64()), ("minhash_sig", pa.list_(pa.uint64())),
            ("pred_lang", pa.string()),
        ):
            out = out.append_column(name, pa.array([], typ))
        return out
    spans = as_single_array(batch.column("spans"))
    flat_spans = spans.flatten()
    kinds = flat_spans.field("kind").to_pylist()
    texts = flat_spans.field("text").to_pylist()
    offsets = spans.offsets.to_numpy(zero_copy_only=False)

    n_tokens = np.zeros(n, dtype=np.int64)
    content_hash = np.zeros(n, dtype=np.uint64)
    word_sets: list[list[str]] = []
    langs: list[str] = []

    # string pass (inherently per-doc): split, hash bytes, stopword set
    for i in range(n):
        words: list[str] = []
        h = hashlib.blake2b(digest_size=8, key=b"content0")
        for j in range(offsets[i], offsets[i + 1]):
            if kinds[j] == "text":
                words.extend(texts[j].split())
                h.update(texts[j].encode())
        n_tokens[i] = len(words)
        content_hash[i] = int.from_bytes(h.digest(), "little")
        ws = set(words)
        word_sets.append(list(ws))
        langs.append("en" if not _EN_STOPS.isdisjoint(ws) else "unk")

    # numeric pass: vectorized per chunk (memory-capped perm matrix)
    lens = np.fromiter((len(w) for w in word_sets), dtype=np.int64, count=n)
    sigs = np.empty((n, NUM_PERM), dtype=np.uint64)
    simhash = np.empty(n, dtype=np.uint64)
    start = 0
    while start < n:
        end = start + 1
        tot = lens[start]
        while end < n and tot + lens[end] <= _CHUNK_WORDS:
            tot += lens[end]
            end += 1
        flat = _word_hashes([w for ws in word_sets[start:end] for w in ws])
        s, sh = _sig_simhash_chunk(flat, lens[start:end])
        sigs[start:end] = s
        simhash[start:end] = sh
        start = end

    out = batch
    out = out.append_column("n_tokens", pa.array(n_tokens))
    out = out.append_column("content_hash", pa.array(content_hash, pa.uint64()))
    out = out.append_column("simhash", pa.array(simhash, pa.uint64()))
    out = out.append_column(
        "minhash_sig",
        pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * NUM_PERM, NUM_PERM,
                               dtype=np.int32)),
            pa.array(sigs.ravel(), pa.uint64()),
        ),
    )
    out = out.append_column("pred_lang", pa.array(langs, pa.string()))
    return out
