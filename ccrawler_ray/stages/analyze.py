"""Analysis stage: the per-document compute of a production crawl
pipeline (fetch → parse → extract → ANALYZE → store): content hash,
token/quality stats, language ID, MinHash signature, SimHash.

This is the compute-heavy stage the bench exercises; it is exactly the
work a training-data pipeline runs per crawled page. Word hashes are
cached per worker process (Zipf vocabulary → high hit rate).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ccrawler_ray.functions.dedup import _minhash_params, word_hashes as _word_hashes
from ccrawler_ray.spec import as_single_array

NUM_PERM = 64
_A, _B = _minhash_params(NUM_PERM)
_MERSENNE = np.uint64((1 << 61) - 1)

_BIT_WEIGHTS = (np.uint64(1) << np.arange(64, dtype=np.uint64))


ANALYSIS_COLS = ["n_tokens", "content_hash", "simhash", "minhash_sig", "pred_lang"]


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
    flat = spans.flatten()
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    offsets = spans.offsets.to_numpy(zero_copy_only=False)

    n_tokens = np.zeros(n, dtype=np.int64)
    content_hash = np.zeros(n, dtype=np.uint64)
    simhash = np.zeros(n, dtype=np.uint64)
    sigs: list[list[int]] = []
    langs: list[str] = []

    en_stops = {"the", "and", "of", "a", "to", "in", "is", "it"}
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
        wh = _word_hashes(ws)
        if len(wh):
            vals = (_A[:, None] * wh[None, :] + _B[:, None]) % _MERSENNE
            sigs.append(vals.min(axis=1).tolist())
            bits = (wh[:, None] & _BIT_WEIGHTS[None, :]) != 0
            votes = bits.sum(axis=0) * 2 - len(wh)
            simhash[i] = np.uint64((_BIT_WEIGHTS[votes > 0]).sum(dtype=np.uint64))
        else:
            sigs.append([int(_MERSENNE)] * NUM_PERM)
        langs.append("en" if len(ws & en_stops) >= 1 else "unk")

    out = batch
    out = out.append_column("n_tokens", pa.array(n_tokens))
    out = out.append_column("content_hash", pa.array(content_hash, pa.uint64()))
    out = out.append_column("simhash", pa.array(simhash, pa.uint64()))
    out = out.append_column("minhash_sig", pa.array(sigs, pa.list_(pa.uint64())))
    out = out.append_column("pred_lang", pa.array(langs, pa.string()))
    return out
