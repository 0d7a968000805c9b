"""Text analysis operators over a documents table: language ID,
quality scoring, token counting, document fingerprinting.

All vectorized inside map_batches (polars / numpy / hashlib-per-row
only where the kernel is inherently per-string and C-speed).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ccrawler_ray.scale import coarse_salt_k

_TOKEN_RE = r"\s+"

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "for", "on"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "du", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "del", "para"},
    "zh": set(),  # CJK: detected by codepoint range, not stopwords
}


def _read_docs(sf_dir: str, cols):
    from ccrawler_ray.scale import read_docs

    return read_docs(sf_dir, cols)


def _col_i64(t: "pa.Table", name: str) -> np.ndarray:
    return t.column(name).to_numpy(zero_copy_only=False).astype(np.int64)



def _pl_text(t: "pa.Table", col: str = "text"):
    """Arrow column -> polars Series WITHOUT a pandas round trip (the
    object-string conversion each way measured as the dominant cost of
    these scans; arrow -> polars is (near) zero-copy)."""
    import polars as pl

    from ccrawler_ray.spec import as_single_array

    return pl.Series(pl.from_arrow(as_single_array(t.column(col))))



def token_count(sf_dir: str):
    """Whitespace-token counts per doc (matches DuckDB
    regexp_split_to_array(text, '\\s+'))."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        # tokens = regex separator count + 1 (polars split(" ") differs
        # from \s+ on multi-space runs)
        seps = _pl_text(t).str.count_matches(_TOKEN_RE).to_numpy()
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array((seps + 1).astype(np.int64))})

    return ds.map_batches(f, batch_format="pyarrow")


_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe(sf_dir: str):
    """BPE-ish sub-word token counts: alpha runs, digit runs, and
    individual punctuation as separate tokens (the pre-tokenization
    split most BPE vocabularies use). SQL-checkable via
    regexp_extract_all."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n = _pl_text(t).str.count_matches(_BPE_RE).to_numpy()
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_bpe_tokens": pa.array(n.astype(np.int64))})

    return ds.map_batches(f, batch_format="pyarrow")


def quality_score(sf_dir: str):
    """Heuristic quality features: token count, mean token length,
    uppercase ratio (all SQL-expressible → oracle-checked). Memoized
    per session — the mix pipelines reuse this narrow per-doc leg."""
    from ccrawler_ray.memo import memo_ds

    return memo_ds(("quality_score", sf_dir),
                   lambda: _quality_score(sf_dir))


def _quality_score(sf_dir: str):
    ds = _read_docs(sf_dir, ["doc_id", "text", "n_chars"])

    def f(t: pa.Table) -> pa.Table:
        s = _pl_text(t)
        n_tok = (s.str.count_matches(_TOKEN_RE) + 1).to_numpy().astype(np.int64)
        n_char = t.column("n_chars").to_numpy(zero_copy_only=False)
        n_upper = s.str.count_matches(r"[A-Z]").to_numpy()
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(n_tok),
                # floor-scaling (not round): DuckDB rounds half-away-from-
                # zero, numpy half-even — floor(x*1e4)/1e4 matches exactly
                "mean_tok_len": pa.array(
                    np.floor(n_char * 10000.0 / n_tok) / 10000),
                "upper_ratio": pa.array(
                    np.floor(n_upper * 10000.0
                             / np.maximum(n_char, 1)) / 10000),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


class LangId:
    """Language-ID heuristic as an actor-pool stage: profiles compiled
    once per actor in __init__ (the stateful-stage pattern)."""

    def __init__(self):
        self.word_re = re.compile(r"[a-zA-Z]+")
        self.profiles = {k: v for k, v in _LANG_PROFILES.items() if v}

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        find = self.word_re.findall
        profiles = self.profiles.items()
        for text in t.column("text").to_pylist():
            # CJK check by codepoint range first
            cjk = sum(1 for ch in text[:200] if "一" <= ch <= "鿿")
            if cjk > 5:
                out.append("zh")
                continue
            words = [w.lower() for w in find(text)]
            ws = set(words)
            best, best_n = "unk", 0
            for lang, stops in profiles:
                n = len(ws & stops)
                if n > best_n:
                    best, best_n = lang, n
            out.append(best)
        return pa.table({"doc_id": t.column("doc_id"),
                         "pred_lang": pa.array(out, pa.string())})

    @staticmethod
    def dataset(sf_dir: str):
        ds = _read_docs(sf_dir, ["doc_id", "text"])
        return ds.map_batches(
            LangId, batch_format="pyarrow", batch_size=256, concurrency=2
        )


def lang_id(sf_dir: str):
    return LangId.dataset(sf_dir)


def doc_fingerprint(sf_dir: str, k: int = 8):
    """Rolling-hash document fingerprint: min blake2b over k-word
    shingles (a winnowing-style fingerprint; deterministic)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        fps = []
        for text in t.column("text").to_pylist():
            words = text.split()
            if len(words) < k:
                shingles = [" ".join(words)]
            else:
                shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
            fp = min(
                int.from_bytes(
                    hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
                )
                for s in shingles
            )
            fps.append(fp)
        return pa.table({"doc_id": t.column("doc_id"),
                         "fingerprint": pa.array(
                             np.array(fps, dtype=np.uint64))})

    return ds.map_batches(f, batch_format="pyarrow")


def tfidf_topk(sf_dir: str, k: int = 3):
    """Top-k most characteristic terms per doc by an integer-exact
    tf-idf score: score = tf * N / df, floor-scaled to 4 decimals
    (LINEAR idf, not log — ln() is not bit-reproducible across
    engines, integer arithmetic is). Ties break on term ascending.

    Scale shape: the map side emits one row per DISTINCT (doc, term)
    with its in-doc count (pd.factorize + lexsort run-length — no
    per-doc Python loop; a doc never spans batches so batch-local rows
    are globally distinct). Document frequency is ONE coarse-salted
    groupby on the term (each term entirely inside one salt group:
    group size == df), which emits scored rows; a second doc-salted
    groupby picks each doc's top k. Nothing unbounded on the driver.
    """
    salt_k = coarse_salt_k()  # pinned on the driver: every row must agree
    from ccrawler_ray.functions.dedup import word_hashes

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata count — no scan

    def tf_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        dids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        words_per_doc = [t.split() for t in texts]
        lens = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64,
                           count=len(texts))
        flat = [w for ws in words_per_doc for w in ws]
        if not flat:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "term": pa.array([], pa.string()),
                 "tf": pa.array([], pa.int64()),
                 "t_salt": pa.array([], pa.int32())})
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
        doc_idx = np.repeat(np.arange(len(texts)), lens)
        order = np.lexsort((codes, doc_idx))
        d, c = doc_idx[order], codes[order]
        first = np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
        starts = np.flatnonzero(first)
        tf = np.diff(np.r_[starts, len(d)])
        terms = uniq[c[starts]]
        salts = (word_hashes(list(terms)) % np.uint64(64)).astype(np.int32)
        return pa.table(
            {"doc_id": pa.array(dids[d[starts]].astype(np.int64)),
             "term": pa.array(terms, pa.string()),
             "tf": pa.array(tf.astype(np.int64)),
             "t_salt": pa.array(salts)})

    def score_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()),
                              ("term", pa.string()),
                              ("sc", pa.int64()),
                              ("d_salt", pa.int32())]).empty_table()
        # rows are distinct (doc, term): per-term group size == dfreq
        terms = t.column("term").to_numpy(zero_copy_only=False)
        _, tinv, tcnt = np.unique(terms, return_inverse=True,
                                  return_counts=True)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sc = (t.column("tf").to_numpy(zero_copy_only=False)
              * np.int64(n_docs) * 10_000 // tcnt[tinv])
        return pa.table(
            {"doc_id": pa.array(ids.astype(np.int64)),
             "term": pa.array(terms),
             "sc": pa.array(sc.astype(np.int64)),
             "d_salt": pa.array((ids % salt_k).astype(np.int32))})

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()),
                              ("term", pa.string()),
                              ("score", pa.float64()),
                              ("rank", pa.int64())]).empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sc = t.column("sc").to_numpy(zero_copy_only=False)
        terms = t.column("term").to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -sc, ids))
        ids, sc, terms = ids[order], sc[order], terms[order]
        starts = np.r_[0, np.flatnonzero(np.diff(ids)) + 1]
        sizes = np.diff(np.r_[starts, len(ids)])
        pos = np.arange(len(ids)) - np.repeat(starts, sizes)
        keep = pos < k
        return pa.table(
            {"doc_id": pa.array(ids[keep].astype(np.int64)),
             "term": pa.array(terms[keep]),
             "score": pa.array(sc[keep] / 10_000.0),
             "rank": pa.array((pos[keep] + 1).astype(np.int64))})

    rows = ds.map_batches(tf_rows, batch_format="pyarrow")
    scored = rows.groupby("t_salt").map_groups(score_rows,
                                               batch_format="pyarrow")
    return scored.groupby("d_salt").map_groups(topk, batch_format="pyarrow")


def char_entropy(sf_dir: str):
    """Per-doc Shannon entropy over codepoints — the cheap
    gibberish/boilerplate signal (natural text ~4-4.5 bits, repeated
    padding much lower). Returns (doc_id, n_cp, n_unique_cp, entropy)
    with entropy floor-scaled to 4 decimals.

    Bit-reproducibility: the per-doc codepoint histogram is built from
    the UTF-32 view (vectorized np.unique, SORTED by codepoint) and the
    -p*log2(p) sum runs in that sorted order — the serial oracle uses
    the identical formula and order, so the doubles are bitwise equal.
    """
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        dids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n_cp = np.empty(len(dids), dtype=np.int64)
        n_uq = np.empty(len(dids), dtype=np.int64)
        ent = np.empty(len(dids), dtype=np.float64)
        for i, text in enumerate(batch.column("text").to_pylist()):
            cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
            n_cp[i] = len(cps)
            if not len(cps):
                n_uq[i] = 0
                ent[i] = 0.0
                continue
            _, counts = np.unique(cps, return_counts=True)
            n_uq[i] = len(counts)
            p = counts / float(len(cps))
            ent[i] = np.floor(-(p * np.log2(p)).sum() * 10_000) / 10_000
        return pa.table({"doc_id": pa.array(dids.astype(np.int64)),
                         "n_cp": pa.array(n_cp), "n_unique_cp": pa.array(n_uq),
                         "entropy": pa.array(ent)})

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BM25 keyword search. Two narrow passes: pass 1 projects the heavy
# text down to an int-only (doc_id, dl, tf_j...) table, materialized
# once (O(n x m) ints, ~100 bytes/doc); corpus stats are a tiny
# per-block partial sum; scoring + per-block top-k stream over the
# projection, so the driver only ever sees num_blocks x k rows.
#
# Bit-reproducibility: scores are float64 but every input (tf, dl,
# df, N, total_len) is an exact integer and the op ORDER is frozen
# (see _bm25_score_cols) — serial_ref.search_bm25 evaluates the same
# expressions in the same order, so the doubles are bitwise equal.
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_score_cols(tf: np.ndarray, dl: np.ndarray, idf: np.ndarray,
                     n_docs: int, total_len: int) -> np.ndarray:
    """FROZEN scoring kernel (shared shape with serial_ref): Lucene-
    style BM25 with accumulation in query-term order."""
    dln = dl.astype(np.float64) * float(n_docs) / float(total_len)
    den_base = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dln)
    s = np.zeros(len(dl), dtype=np.float64)
    for j in range(tf.shape[1]):
        tfj = tf[:, j].astype(np.float64)
        s += idf[j] * (tfj * (_BM25_K1 + 1.0)) / (tfj + den_base)
    return s


def bm25_tf_dl_ds(sf_dir: str, terms: tuple):
    """Materialized (doc_id, dl, tf_0..tf_{m-1}) dataset — the shared
    text leg of ``search_bm25`` and ``similarity.ann_hybrid_search``."""
    m = len(terms)
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def tf_dl(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        dids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        words_per = [t.split() for t in texts]
        dl = np.fromiter((len(w) for w in words_per), dtype=np.int64,
                         count=len(texts))
        tf = np.zeros((len(texts), m), dtype=np.int64)
        if dl.sum():
            flat = np.asarray([w for ws in words_per for w in ws],
                              dtype=object)
            didx = np.repeat(np.arange(len(texts)), dl)
            for j, term in enumerate(terms):
                hit = flat == term
                if hit.any():
                    np.add.at(tf[:, j], didx[hit], 1)
        cols = {"doc_id": pa.array(dids.astype(np.int64)),
                "dl": pa.array(dl)}
        for j in range(m):
            cols[f"tf_{j}"] = pa.array(tf[:, j])
        return pa.table(cols)

    return ds.map_batches(tf_dl, batch_format="pyarrow").materialize()


def bm25_idf_stats(inter, m: int):
    """(n_docs, total_len, idf) from the tf/dl dataset — exact integer
    partials, one tiny driver reduce (shared with the hybrid search)."""

    def stat_partial(batch: pa.Table) -> pa.Table:
        cols = {"n": pa.array([batch.num_rows], pa.int64()),
                "tl": pa.array([int(np.sum(
                    batch.column("dl").to_numpy(zero_copy_only=False)))],
                    pa.int64())}
        for j in range(m):
            tfj = batch.column(f"tf_{j}").to_numpy(zero_copy_only=False)
            cols[f"df_{j}"] = pa.array([int((tfj > 0).sum())], pa.int64())
        return pa.table(cols)

    stats = inter.map_batches(
        stat_partial, batch_format="pyarrow").to_pandas().sum()
    n_docs, total_len = int(stats["n"]), int(stats["tl"])
    dfreq = np.array([stats[f"df_{j}"] for j in range(m)], dtype=np.int64)
    idf = np.log((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
    return n_docs, total_len, idf


def search_bm25(sf_dir: str, terms: tuple = ("join", "vector", "spark", "fast"),
                k: int = 20) -> pd.DataFrame:
    """Global BM25 top-k docs for a fixed query-term set.

    Returns (doc_id, score, rank) for the k best-scoring docs that
    contain at least one query term; ties break on doc_id ascending.
    """
    m = len(terms)
    inter = bm25_tf_dl_ds(sf_dir, terms)
    n_docs, total_len, idf = bm25_idf_stats(inter, m)

    def local_topk(batch: pa.Table) -> pa.Table:
        dids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        dl = batch.column("dl").to_numpy(zero_copy_only=False)
        tf = np.stack([batch.column(f"tf_{j}").to_numpy(zero_copy_only=False)
                       for j in range(m)], axis=1)
        s = _bm25_score_cols(tf, dl, idf, n_docs, total_len)
        keep = s > 0.0
        dids, s = dids[keep], s[keep]
        order = np.lexsort((dids, -s))[:k]
        return pa.table({"doc_id": pa.array(dids[order].astype(np.int64)),
                         "score": pa.array(s[order])})

    cand = inter.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if not len(cand):   # no doc matched any term (tiny corpora):
        cand = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    cand = cand.sort_values(["score", "doc_id"],
                            ascending=[False, True]).head(k)
    cand = cand.reset_index(drop=True)
    cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    return cand


# ---------------------------------------------------------------------------
# Repetition signals — the Gopher-style repetitive-content filter
# (Rae et al. 2021 §A1.1 use duplicate-line and n-gram fractions; this
# corpus has no line structure, so the signals are word-n-gram based).
# All three ratios are integer-over-integer with floor-scaling to 4
# decimals, so the serial mirror is exact.
# ---------------------------------------------------------------------------

_REP_C1 = 0x9E3779B97F4A7C15  # same odd mixing constant as the shinglers
# C^4..C^0 mod 2^64, folded in exact int math (scalar uint64 powers
# would raise numpy overflow warnings; array ops wrap silently)
_REP_POWS = tuple(np.uint64(pow(_REP_C1, p, 1 << 64)) for p in (4, 3, 2, 1))
REP_TOP2_MAX = 0.18   # keep thresholds (Gopher-ish)
REP_DUP5_MAX = 0.30


def _repetition_row(h: np.ndarray):
    """FROZEN per-doc kernel over the word-hash array (shared with
    serial_ref.repetition_stats): returns (n_words, dup_word_frac,
    top_bigram_frac, dup_5gram_frac, keep)."""
    n = len(h)
    if n == 0:
        return 0, 0.0, 0.0, 0.0, True
    nu = len(np.unique(h))
    dupw = float(np.floor((n - nu) * 10_000.0 / n) / 10_000)
    C = np.uint64(_REP_C1)
    if n >= 2:  # uint64 * / + wrap mod 2^64 silently in numpy
        b = h[:-1] * C + h[1:]
        _, c2 = np.unique(b, return_counts=True)
        top2 = float(np.floor(int(c2.max()) * 10_000.0 / (n - 1)) / 10_000)
    else:
        top2 = 0.0
    if n >= 5:
        g = h[: n - 4] * _REP_POWS[0]
        for j, p in enumerate(_REP_POWS[1:] + (np.uint64(1),), start=1):
            g = g + h[j : n - 5 + j + 1] * p
        _, c5 = np.unique(g, return_counts=True)
        dup_slots = int(c5[c5 >= 2].sum())
        dup5 = float(np.floor(dup_slots * 10_000.0 / (n - 4)) / 10_000)
    else:
        dup5 = 0.0
    keep = top2 <= REP_TOP2_MAX and dup5 <= REP_DUP5_MAX
    return n, dupw, top2, dup5, keep


def repetition_stats(sf_dir: str):
    """(doc_id, n_words, dup_word_frac, top_bigram_frac,
    dup_5gram_frac, keep): word-n-gram repetition signals per doc.

    dup_word_frac   = repeated word occurrences / words
    top_bigram_frac = occurrences of the most frequent bigram / bigram
                      slots (n-1)
    dup_5gram_frac  = 5-gram slots whose gram occurs >= 2x / slots (n-4)

    Embarrassingly parallel map — one batch pass, word hashes from the
    per-worker cache, np.unique per doc (C-speed; no cross-doc state).
    """
    from ccrawler_ray.functions.dedup import word_hashes

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        dids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        words_per = [t.split() for t in texts]
        lens = np.fromiter((len(w) for w in words_per), dtype=np.int64,
                           count=len(texts))
        h_all = word_hashes([w for ws in words_per for w in ws])
        offs = np.r_[np.int64(0), np.cumsum(lens)]
        nw = np.empty(len(texts), dtype=np.int64)
        fr = np.empty((len(texts), 3), dtype=np.float64)
        keep = np.empty(len(texts), dtype=bool)
        for i in range(len(texts)):
            nw[i], fr[i, 0], fr[i, 1], fr[i, 2], keep[i] = _repetition_row(
                h_all[offs[i]:offs[i + 1]])
        return pa.table({"doc_id": pa.array(dids.astype(np.int64)),
                         "n_words": pa.array(nw),
                         "dup_word_frac": pa.array(fr[:, 0]),
                         "top_bigram_frac": pa.array(fr[:, 1]),
                         "dup_5gram_frac": pa.array(fr[:, 2]),
                         "keep": pa.array(keep)})

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PMI collocations — word2vec-style phrase mining: pointwise mutual
# information over adjacent bigrams. Unigram totals are a tiny
# vocabulary aggregate broadcast once (at web scale the min_count
# prune bounds both sides — a bigram that appears >= min_count times
# has both words >= min_count, so only the pruned vocab ships);
# bigram counts take ONE salted shuffle; PMI itself is a frozen float
# kernel shared by import with the serial mirror, computed from exact
# integer counts, so the top-k is bitwise reproducible.
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5


def pmi_score(c_xy, c_x, c_y, n) -> np.ndarray:
    """FROZEN PMI kernel (shared engine/mirror): exact int counts in,
    one op-ordered float expression out."""
    return np.log((np.float64(1.0) * np.asarray(c_xy, np.float64)
                   * np.float64(n))
                  / (np.asarray(c_x, np.float64)
                     * np.asarray(c_y, np.float64)))


def pmi_topk(sf_dir: str, k: int = 20, min_count: int = PMI_MIN_COUNT):
    """(w1, w2, c_xy, pmi): top-k adjacent-bigram collocations by PMI
    (ties by (w1, w2) asc) among bigrams with count >= min_count."""
    from ray.data.aggregate import Sum

    from ccrawler_ray.functions.dedup import word_hashes

    salt_k = coarse_salt_k()  # pinned on the driver: every row must agree
    ds = _read_docs(sf_dir, ["text"])

    # pass 1: unigram counts + total tokens (vocabulary-sized rows)
    def uni_partial(t: pa.Table) -> pa.Table:
        words = [w for x in t.column("text").to_pylist()
                 for w in x.split()]
        if not words:
            return pa.schema([("w", pa.string()),
                              ("c", pa.int64())]).empty_table()
        uw, c = np.unique(np.asarray(words, dtype=object),
                          return_counts=True)
        return pa.table({"w": pa.array(uw),
                         "c": pa.array(c.astype(np.int64))})

    uni = (ds.map_batches(uni_partial, batch_format="pyarrow")
           .groupby("w").aggregate(Sum("c", alias_name="c")).to_pandas())
    total = int(uni["c"].sum())
    uni_ref = ray.put(dict(zip(uni["w"], uni["c"].astype(int))))

    # pass 2: bigram counts — one salted shuffle, then local top-k
    def bi_partial(tb: pa.Table) -> pa.Table:
        w1l, w2l = [], []
        for x in tb.column("text").to_pylist():
            toks = x.split()
            w1l.extend(toks[:-1])
            w2l.extend(toks[1:])
        if not w1l:
            return pa.schema([("w1", pa.string()), ("w2", pa.string()),
                              ("c", pa.int64()),
                              ("b_salt", pa.int32())]).empty_table()
        w1a = np.asarray(w1l, dtype=object)
        w2a = np.asarray(w2l, dtype=object)
        u1, c1 = np.unique(w1a, return_inverse=True)
        u2, c2 = np.unique(w2a, return_inverse=True)
        comp = c1.astype(np.int64) * len(u2) + c2
        uc, cnt = np.unique(comp, return_counts=True)
        gw1 = u1[uc // len(u2)]
        gw2 = u2[uc % len(u2)]
        h = (word_hashes(list(gw1)) * np.uint64(0x9E3779B97F4A7C15)
             + word_hashes(list(gw2)))
        return pa.table({
            "w1": pa.array(gw1), "w2": pa.array(gw2),
            "c": pa.array(cnt.astype(np.int64)),
            "b_salt": pa.array((h % np.uint64(salt_k)).astype(np.int32))})

    empty = pd.DataFrame({"w1": pd.Series(dtype="object"),
                          "w2": pd.Series(dtype="object"),
                          "c_xy": pd.Series(dtype="int64"),
                          "pmi": pd.Series(dtype="float64")})

    def per_salt(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["w1", "w2"], as_index=False)["c"].sum()
        g = g[g["c"] >= min_count]
        if not len(g):
            return empty.copy()
        umap = ray.get(uni_ref)
        cx = np.array([umap[w] for w in g["w1"]], dtype=np.int64)
        cy = np.array([umap[w] for w in g["w2"]], dtype=np.int64)
        out = pd.DataFrame({"w1": g["w1"].to_numpy(),
                            "w2": g["w2"].to_numpy(),
                            "c_xy": g["c"].to_numpy().astype(np.int64),
                            "pmi": pmi_score(g["c"].to_numpy(), cx, cy,
                                             total)})
        out = out.sort_values(["pmi", "w1", "w2"],
                              ascending=[False, True, True]).head(k)
        return out.reset_index(drop=True)

    def reduce_all(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty.copy()
        df = df.sort_values(["pmi", "w1", "w2"],
                            ascending=[False, True, True]).head(k)
        return df.reset_index(drop=True)

    from ccrawler_ray.functions.dedup import _stamp_schema

    out = (ds.map_batches(bi_partial, batch_format="pyarrow")
           .groupby("b_salt").map_groups(per_salt, batch_format="pandas")
           .repartition(1)
           .map_batches(reduce_all, batch_format="pandas", batch_size=None))
    return _stamp_schema(out, pa.schema(
        [("w1", pa.string()), ("w2", pa.string()),
         ("c_xy", pa.int64()), ("pmi", pa.float64())]))


# ---------------------------------------------------------------------------
# Phrase search over positional postings — the inverted-index access
# pattern: each batch emits (doc, position) postings ONLY for the
# query terms (the posting-list read; everything else never leaves
# the scan task), one salted per-doc shuffle co-locates a document's
# postings, and the in-group kernel counts exact adjacencies with one
# lexsort — positional-index semantics (ALL occurrences, including
# separator-sharing ones a non-overlapping regex would miss, hence the
# serial differential mirror rather than a regex SQL oracle).
# ---------------------------------------------------------------------------

PHRASE_T1, PHRASE_T2 = "hash", "join"


def search_phrase(sf_dir: str, t1: str = PHRASE_T1, t2: str = PHRASE_T2):
    """(doc_id, n_hits): documents containing the exact token sequence
    ``t1 t2`` (whitespace tokenization), with occurrence counts."""
    assert t1 != t2, "phrase terms must be distinct (adjacency rule)"
    salt_k = coarse_salt_k()  # pinned on the driver: every row must agree
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    post_fields = [("doc_id", pa.int64()), ("pos", pa.int64()),
                   ("is_t1", pa.bool_()), ("d_salt", pa.int32())]

    def postings(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        words_per = [t.split() for t in texts]
        lens = np.fromiter((len(w) for w in words_per), dtype=np.int64,
                           count=len(texts))
        flat = np.asarray([w for ws in words_per for w in ws], dtype=object)
        m1, m2 = flat == t1, flat == t2
        keep = np.nonzero(m1 | m2)[0]
        if not len(keep):
            return pa.schema(post_fields).empty_table()
        doc_idx = np.repeat(np.arange(len(texts)), lens)[keep]
        starts = np.r_[np.int64(0), np.cumsum(lens)][:-1]
        pos = keep - starts[doc_idx]
        dids = batch.column("doc_id").to_numpy(
            zero_copy_only=False)[doc_idx].astype(np.int64)
        return pa.table({"doc_id": pa.array(dids),
                         "pos": pa.array(pos.astype(np.int64)),
                         "is_t1": pa.array(m1[keep]),
                         "d_salt": pa.array((dids % salt_k).astype(np.int32))})

    out_fields = [("doc_id", pa.int64()), ("n_hits", pa.int64())]

    def per_salt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(out_fields).empty_table()
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        m1 = t.column("is_t1").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, did))
        did, pos, m1 = did[order], pos[order], m1[order]
        # only query-term postings are present, so "t2 directly after
        # t1 in the document" == consecutive postings at pos+1
        hit = (did[1:] == did[:-1]) & (pos[1:] - pos[:-1] == 1) \
            & m1[:-1] & ~m1[1:]
        if not hit.any():
            return pa.schema(out_fields).empty_table()
        udoc, inv = np.unique(did[:-1][hit], return_inverse=True)
        n = np.bincount(inv, minlength=len(udoc)).astype(np.int64)
        return pa.table({"doc_id": pa.array(udoc.astype(np.int64)),
                         "n_hits": pa.array(n)})

    from ccrawler_ray.functions.dedup import _stamp_schema

    out = (ds.map_batches(postings, batch_format="pyarrow")
           .groupby("d_salt").map_groups(per_salt, batch_format="pyarrow"))
    # zero-posting corpora yield zero blocks (schema-less) — stamp
    return _stamp_schema(out, pa.schema(out_fields))


# ---------------------------------------------------------------------------
# Tokenizer fertility — chars per (BPE-ish) token per language, the
# standard tokenizer-fit diagnostic for a multilingual corpus. One
# map-side partial per batch, a lang-keyed sum, one IEEE division of
# exact int64 sums — SQL-oracle-checked end to end.
# ---------------------------------------------------------------------------


def fertility_stats(sf_dir: str):
    """(lang, n_docs, sum_chars, sum_bpe_tokens, fertility): per-lang
    totals and chars-per-BPE-token ratio."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["lang", "text", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("lang", pa.string()),
                              ("n_docs", pa.int64()),
                              ("sum_chars", pa.int64()),
                              ("sum_bpe_tokens", pa.int64())]).empty_table()
        toks = _pl_text(t).str.count_matches(_BPE_RE).to_numpy().astype(np.int64)
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        ul, inv = np.unique(lang, return_inverse=True)
        sc = np.zeros(len(ul), dtype=np.int64)
        np.add.at(sc, inv, t.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64))
        st = np.zeros(len(ul), dtype=np.int64)
        np.add.at(st, inv, toks)
        return pa.table({"lang": pa.array(ul),
                         "n_docs": pa.array(np.bincount(inv).astype(np.int64)),
                         "sum_chars": pa.array(sc),
                         "sum_bpe_tokens": pa.array(st)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("lang").aggregate(
               Sum("n_docs", alias_name="n_docs"),
               Sum("sum_chars", alias_name="sum_chars"),
               Sum("sum_bpe_tokens", alias_name="sum_bpe_tokens")))

    def finish(t: pa.Table) -> pa.Table:
        sc = _col_i64(t, "sum_chars")
        st = _col_i64(t, "sum_bpe_tokens")
        fert = np.zeros(t.num_rows, dtype=np.float64)
        nz = st > 0
        fert[nz] = sc[nz].astype(np.float64) / st[nz].astype(np.float64)
        return pa.table({"lang": t.column("lang"),
                         "n_docs": pa.array(_col_i64(t, "n_docs")),
                         "sum_chars": pa.array(sc),
                         "sum_bpe_tokens": pa.array(st),
                         "fertility": pa.array(fert)})

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Zipf fit — corpus-health diagnostic: the log-log OLS slope of the
# word-frequency/rank curve per source (natural text ≈ -1; word-soup
# or boilerplate drifts off). Distributed exact word counts (one
# salted shuffle — same shape as the BPE counts), per-source top-V
# merge in a tiny source-keyed group, and a FROZEN quantized-log
# finish shared by import with the serial mirror. The fit is
# tie-invariant by construction: only the sorted COUNT sequence enters
# it, and the top-V count multiset is unique even when words tie at
# the boundary.
# ---------------------------------------------------------------------------

ZIPF_TOP_V = 128
_ZIPF_LQ = 1_000_000.0  # ln quantization: round(ln(x) * 1e6) as int64


def zipf_finish(counts: np.ndarray) -> tuple[int, float, float]:
    """FROZEN finish (shared engine/mirror): exact integer OLS over
    (round(ln(rank)*1e6), round(ln(count)*1e6)); returns
    (v, slope, intercept) with intercept in ln units."""
    counts = np.sort(np.asarray(counts, dtype=np.int64))[::-1]
    v = int(len(counts))
    if v == 0:
        return 0, 0.0, 0.0
    ly = np.round(np.log(counts.astype(np.float64)) * _ZIPF_LQ).astype(np.int64)
    if v == 1:
        return 1, 0.0, float(np.float64(ly[0]) / np.float64(_ZIPF_LQ))
    lx = np.round(np.log(np.arange(1, v + 1, dtype=np.float64))
                  * _ZIPF_LQ).astype(np.int64)
    sx, sy = int(lx.sum()), int(ly.sum())
    sxy, sxx = int((lx * ly).sum()), int((lx * lx).sum())
    slope = np.float64(v * sxy - sx * sy) / np.float64(v * sxx - sx * sx)
    intercept = ((np.float64(sy) - slope * np.float64(sx))
                 / np.float64(v) / np.float64(_ZIPF_LQ))
    return v, float(slope), float(intercept)


def zipf_fit(sf_dir: str, top_v: int = ZIPF_TOP_V):
    """(source, v, slope, intercept): Zipf log-log OLS over each
    source's top-``top_v`` word frequencies."""
    from ccrawler_ray.functions.dedup import word_hashes

    salt_k = coarse_salt_k()  # pinned on the driver: every row must agree
    ds = _read_docs(sf_dir, ["text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        words_per = [x.split() for x in texts]
        lens = np.fromiter((len(w) for w in words_per), dtype=np.int64,
                           count=len(texts))
        if not lens.sum():
            return pa.schema([("source", pa.string()),
                              ("word", pa.string()),
                              ("cnt", pa.int64()),
                              ("w_salt", pa.int32())]).empty_table()
        src = np.repeat(
            t.column("source").to_numpy(zero_copy_only=False), lens)
        wrd = np.asarray([w for ws in words_per for w in ws],
                         dtype=object)
        us, scode = np.unique(src, return_inverse=True)
        uw, wcode = np.unique(wrd, return_inverse=True)
        comp = scode.astype(np.int64) * len(uw) + wcode
        uc, cnt = np.unique(comp, return_counts=True)
        gw = uw[uc % len(uw)]
        return pa.table({
            "source": pa.array(us[uc // len(uw)]),
            "word": pa.array(gw),
            "cnt": pa.array(cnt.astype(np.int64)),
            "w_salt": pa.array((word_hashes(list(gw))
                                % np.uint64(salt_k)).astype(np.int32))})

    def per_salt(t: pa.Table) -> pa.Table:
        # every (source, word) pair lives in exactly ONE salt group →
        # the in-group sum is its final global count
        src = t.column("source").to_numpy(zero_copy_only=False)
        wrd = t.column("word").to_numpy(zero_copy_only=False)
        us, scode = np.unique(src, return_inverse=True)
        uw, wcode = np.unique(wrd, return_inverse=True)
        comp = scode.astype(np.int64) * len(uw) + wcode
        uc, inv = np.unique(comp, return_inverse=True)
        tot = np.zeros(len(uc), dtype=np.int64)
        np.add.at(tot, inv, t.column("cnt").to_numpy(zero_copy_only=False))
        gsrc = uc // len(uw)
        # per-source top_v by count desc (stable tie order like the
        # pandas head(top_v) after a stable global sort)
        order = np.lexsort((np.arange(len(uc)), -tot))
        gsrc_s, tot_s = gsrc[order], tot[order]
        o2 = np.argsort(gsrc_s, kind="stable")
        gsrc_s, tot_s = gsrc_s[o2], tot_s[o2]
        starts = np.r_[0, np.flatnonzero(np.diff(gsrc_s)) + 1]
        sizes = np.diff(np.r_[starts, len(gsrc_s)])
        pos = np.arange(len(gsrc_s)) - np.repeat(starts, sizes)
        keep = pos < top_v
        return pa.table({"source": pa.array(us[gsrc_s[keep]]),
                         "cnt": pa.array(tot_s[keep])})

    def per_source(t: pa.Table) -> pa.Table:
        cnts = np.sort(t.column("cnt").to_numpy(
            zero_copy_only=False).astype(np.int64))[::-1][:top_v]
        v, slope, intercept = zipf_finish(cnts)
        return pa.table({
            "source": pa.array([t.column("source")[0].as_py()],
                               pa.string()),
            "v": pa.array([v], pa.int64()),
            "slope": pa.array([slope], pa.float64()),
            "intercept": pa.array([intercept], pa.float64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("w_salt").map_groups(per_salt, batch_format="pyarrow")
            .groupby("source").map_groups(per_source, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, §A1.1) — the published
# heuristic document filter. All signals are COUNTS (rust-regex via
# polars in the engine, Python re in the serial mirror — equality
# pinned by tests/test_text_kernels.py on adversarial strings), all
# thresholds integer cross-multiplications, the one ratio column
# floor-scaled — so the row is deterministic and partitioning-free.
# Embarrassingly parallel: one batch pass, no shuffle.
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_WORD_RE = r"\S+"
GOPHER_NONSPACE_RE = r"\S"
GOPHER_ALPHA_WORD_RE = r"\S*[A-Za-z]\S*"
GOPHER_SYM_RE = r"#|\.\.\."
GOPHER_BULLET_RE = r"(?m)^[\-\*•]"
GOPHER_ELLIPSIS_RE = r"(?m)(?:\.\.\.|…)$"
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MWL_LO_Q, GOPHER_MWL_HI_Q = 3 * 10_000, 10 * 10_000


def _gopher_flags(n_words, mwl_q, syms, bullets, ells, n_lines,
                  alpha_words, stop_hits):
    """FROZEN rule set on integer signals (shared engine/mirror):
    every threshold is an exact integer comparison."""
    f_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    f_mwl = (mwl_q >= GOPHER_MWL_LO_Q) & (mwl_q <= GOPHER_MWL_HI_Q)
    f_symbol = syms * 10 < n_words          # symbol/word < 0.1
    f_bullet = bullets * 10 <= n_lines * 9  # <= 90% bullet lines
    f_ellipsis = ells * 10 <= n_lines * 3   # <= 30% ellipsis lines
    f_alpha = alpha_words * 5 >= n_words * 4  # >= 80% alpha words
    f_stop = stop_hits >= 2
    keep = (f_words & f_mwl & f_symbol & f_bullet & f_ellipsis
            & f_alpha & f_stop)
    return (f_words, f_mwl, f_symbol, f_bullet, f_ellipsis, f_alpha,
            f_stop, keep)


def gopher_quality(sf_dir: str):
    """(doc_id, n_words, mean_word_len, stop_hits, f_words, f_mwl,
    f_symbol, f_bullet, f_ellipsis, f_alpha, f_stop, keep): the Gopher
    rule filter, one flag per rule plus the conjunction."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def f(tb: pa.Table) -> pa.Table:
        t = _pl_text(tb)
        n_words = t.str.count_matches(GOPHER_WORD_RE).to_numpy().astype(np.int64)
        n_ns = t.str.count_matches(GOPHER_NONSPACE_RE).to_numpy().astype(np.int64)
        alpha = t.str.count_matches(GOPHER_ALPHA_WORD_RE).to_numpy().astype(np.int64)
        syms = t.str.count_matches(GOPHER_SYM_RE).to_numpy().astype(np.int64)
        bullets = t.str.count_matches(GOPHER_BULLET_RE).to_numpy().astype(np.int64)
        ells = t.str.count_matches(GOPHER_ELLIPSIS_RE).to_numpy().astype(np.int64)
        n_lines = t.str.count_matches(r"\n").to_numpy().astype(np.int64) + 1
        stop_hits = np.zeros(tb.num_rows, dtype=np.int64)
        for w in GOPHER_STOPWORDS:
            stop_hits += t.str.contains(rf"\b{w}\b").to_numpy().astype(np.int64)
        mwl_q = n_ns * 10_000 // np.maximum(n_words, 1)
        flags = _gopher_flags(n_words, mwl_q, syms, bullets, ells,
                              n_lines, alpha, stop_hits)
        out = {"doc_id": tb.column("doc_id").cast(pa.int64()),
               "n_words": pa.array(n_words),
               "mean_word_len": pa.array(mwl_q / 10_000.0),
               "stop_hits": pa.array(stop_hits)}
        for name, v in zip(("f_words", "f_mwl", "f_symbol", "f_bullet",
                            "f_ellipsis", "f_alpha", "f_stop", "keep"),
                           flags):
            out[name] = pa.array(v)
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# M12: PII scrub — the redaction pass every training-data pipeline
# runs before tokenization. Patterns applied in a FIXED order (email →
# phone → ipv4), each counted on the text state it sees, so the
# (clean, n_redactions) pair is deterministic and the DuckDB oracle
# (nested regexp_replace + regexp_extract_all) reproduces it exactly.
# Vectorized via polars (rust-regex) — no per-row Python.
# ---------------------------------------------------------------------------

PII_PATTERNS = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_scrub(sf_dir: str):
    """(doc_id, clean, n_redactions): text with emails, phone numbers
    and IPv4 literals replaced by typed tokens."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def f(tb: pa.Table) -> pa.Table:
        t = _pl_text(tb)
        n = np.zeros(tb.num_rows, dtype=np.int64)
        for _name, pat, token in PII_PATTERNS:
            n += t.str.count_matches(pat).to_numpy().astype(np.int64)
            t = t.str.replace_all(pat, token)
        return pa.table({"doc_id": tb.column("doc_id"),
                         "clean": t.to_arrow().cast(pa.string()),
                         "n_redactions": pa.array(n)})

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Model scoring as an ACTOR POOL — the batched-inference pattern for a
# quality classifier at corpus scale: the model is "loaded" once per
# actor (__init__), scoring is one vectorized pass per batch. The
# model here is a frozen integer-weight linear scorer over exact
# count features, so the logit is int64-exact and the DuckDB oracle
# reproduces it bit-for-bit (a real fasttext/transformer scorer slots
# into the same class with only __init__/__call__ changing).
# ---------------------------------------------------------------------------

MODEL_WEIGHTS = {"w_tokens": 35, "w_chars": -2, "w_upper": -50,
                 "w_digits": -20, "bias": 900}


class QualityModel:
    def __init__(self):
        # stands in for the model load (weights file / checkpoint):
        # runs once per actor, NOT once per batch
        self.w = dict(MODEL_WEIGHTS)

    def __call__(self, tb: pa.Table) -> pa.Table:
        t = _pl_text(tb)
        n_tok = (t.str.count_matches(_TOKEN_RE) + 1).to_numpy().astype(np.int64)
        n_up = t.str.count_matches(r"[A-Z]").to_numpy().astype(np.int64)
        n_dig = t.str.count_matches(r"[0-9]").to_numpy().astype(np.int64)
        n_chars = tb.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        w = self.w
        logit = (w["w_tokens"] * n_tok + w["w_chars"] * n_chars
                 + w["w_upper"] * n_up + w["w_digits"] * n_dig + w["bias"])
        return pa.table({"doc_id": tb.column("doc_id"),
                         "logit": pa.array(logit),
                         "keep": pa.array(logit >= 0)})


def model_score_docs(sf_dir: str):
    """(doc_id, logit, keep): frozen linear quality model scored by an
    actor pool (concurrency=2 — sized up with the cluster). Memoized
    per session — corpus_prep_stats reuses this narrow per-doc leg."""
    from ccrawler_ray.memo import memo_ds

    def build():
        ds = _read_docs(sf_dir, ["doc_id", "text", "n_chars"])
        return ds.map_batches(QualityModel, batch_format="pyarrow",
                              concurrency=2)

    return memo_ds(("model_score_docs", sf_dir), build)


# ---------------------------------------------------------------------------
# Bigram-LM perplexity quality filter (CCNet-style: score every doc by
# how "language-like" it is under an n-gram LM trained on the corpus
# itself, keep the low-perplexity side). Two passes:
#
#   train — the doc_id % LM_TRAIN_MOD < LM_TRAIN_KEEP split streams
#     through one map_batches that emits per-block PARTIAL unigram /
#     bigram counts (np.unique per block — the shuffle moves one row
#     per distinct key per block, never the tokens), then one
#     coarse-salted groupby sums real keys inside <=64 groups. The
#     finished model is vocab-bounded (not corpus-bounded), so
#     collecting it to the driver and ray.put-ing it to the scorers is
#     the broadcast-small-side pattern, not a materialization.
#   score — an actor pool (model deserialized once per actor in
#     __init__) maps every doc to its per-word cross-entropy.
#
# Bit-reproducibility: counts are exact int64; the per-doc float path
# (_lm_doc_xent) is a frozen op order over exact-int inputs, and
# serial_ref.lm_perplexity calls the SAME kernel on serially-trained
# counts — doubles are bitwise equal iff the distributed training
# produced exactly the serial counts, which is the differential.
# ---------------------------------------------------------------------------

LM_TRAIN_MOD = 10
LM_TRAIN_KEEP = 8          # doc_id % 10 < 8 trains the model
LM_XENT_MAX = 4.93         # keep threshold, bits/word (median-ish on
                           # the synthetic corpus so the filter splits)


def _lm_lookup(keys: np.ndarray, cnts: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Exact count lookup: sorted-uint64 searchsorted, 0 for misses."""
    if len(keys) == 0:
        return np.zeros(len(q), dtype=np.int64)
    idx = np.searchsorted(keys, q).clip(max=len(keys) - 1)
    return np.where(keys[idx] == q, cnts[idx], np.int64(0))


def _lm_doc_xent(h: np.ndarray, uni_k, uni_c, bi_k, bi_c,
                 n_tokens: int, vocab: int) -> float:
    """FROZEN per-doc kernel (shared with serial_ref.lm_perplexity):
    average -log2 P(word_i | word_{i-1}) with add-one smoothing, first
    word from the unigram model, floor-scaled to 4 decimals."""
    n = len(h)
    if n == 0:
        return 0.0
    probs = np.empty(n, dtype=np.float64)
    c0 = _lm_lookup(uni_k, uni_c, h[:1])
    probs[0] = (c0[0] + 1.0) / (n_tokens + vocab)
    if n > 1:
        bk = h[:-1] * np.uint64(_REP_C1) + h[1:]
        cb = _lm_lookup(bi_k, bi_c, bk)
        cu = _lm_lookup(uni_k, uni_c, h[:-1])
        probs[1:] = (cb + 1.0) / (cu + np.float64(vocab))
    bits = -np.log2(probs).sum()
    return float(np.floor(bits * 10_000.0 / n) / 10_000)


def _lm_train_counts(ds) -> dict:
    """Distributed LM training: partial counts per block, one salted
    groupby, vocab-bounded result assembled into sorted lookup arrays."""
    from ccrawler_ray.functions.dedup import word_hashes

    def count_rows(batch: pa.Table) -> pa.Table:
        dids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        C = np.uint64(_REP_C1)
        uni_parts, bi_parts = [], []
        for did, text in zip(dids, texts):
            if did % LM_TRAIN_MOD >= LM_TRAIN_KEEP:
                continue
            h = word_hashes(text.split())
            uni_parts.append(h)
            if len(h) > 1:
                bi_parts.append(h[:-1] * C + h[1:])
        kinds, keys, cnts = [], [], []
        for kind, parts in ((0, uni_parts), (1, bi_parts)):
            if not parts:
                continue
            k, c = np.unique(np.concatenate(parts), return_counts=True)
            kinds.append(np.full(len(k), kind, dtype=np.int8))
            keys.append(k)
            cnts.append(c.astype(np.int64))
        if not kinds:
            return pa.table({"kind": pa.array([], pa.int8()),
                             "key": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "salt": pa.array([], pa.int32())})
        kind = np.concatenate(kinds)
        key = np.concatenate(keys)
        cnt = np.concatenate(cnts)
        salt = (key % np.uint64(64)).astype(np.int32)
        return pa.table({"kind": pa.array(kind),
                         "key": pa.array(key.view(np.int64)),
                         "cnt": pa.array(cnt),
                         "salt": pa.array(salt)})

    def sum_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("kind", pa.int8()), ("key", pa.int64()),
                              ("cnt", pa.int64())]).empty_table()
        key = t.column("key").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(key, return_inverse=True)
        tot = np.zeros(len(uk), dtype=np.int64)
        np.add.at(tot, inv, t.column("cnt").to_numpy(zero_copy_only=False))
        return pa.table({
            "kind": pa.array(np.full(len(uk),
                                     t.column("kind")[0].as_py(),
                                     dtype=np.int8)),
            "key": pa.array(uk.astype(np.int64)),
            "cnt": pa.array(tot)})

    parts = ds.map_batches(count_rows, batch_format="pyarrow")
    summed = parts.groupby(["kind", "salt"]).map_groups(
        sum_group, batch_format="pyarrow")
    pdf = summed.to_pandas()   # vocab-bounded, small by assumption
    model = {}
    for kind, name in ((0, "uni"), (1, "bi")):
        sub = pdf[pdf["kind"] == kind]
        k = sub["key"].to_numpy().view(np.uint64)
        order = np.argsort(k, kind="stable")
        model[f"{name}_k"] = np.ascontiguousarray(k[order])
        model[f"{name}_c"] = np.ascontiguousarray(
            sub["cnt"].to_numpy()[order])
    model["n_tokens"] = int(model["uni_c"].sum())
    model["vocab"] = int(len(model["uni_k"]))
    return model


class LMScorer:
    """Actor-pool scorer: the broadcast model is fetched from the
    object store ONCE per actor, not per batch."""

    def __init__(self, model_ref, xent_max: float):
        import ray

        self.m = (ray.get(model_ref)
                  if isinstance(model_ref, ray.ObjectRef) else model_ref)
        self.xent_max = xent_max
        for k in ("uni_k", "uni_c", "bi_k", "bi_c"):   # lookup arrays
            self.m[k] = np.asarray(self.m[k])

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ccrawler_ray.functions.dedup import word_hashes

        m = self.m
        dids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        nw = np.empty(len(texts), dtype=np.int64)
        xe = np.empty(len(texts), dtype=np.float64)
        for i, text in enumerate(texts):
            h = word_hashes(text.split())
            nw[i] = len(h)
            xe[i] = _lm_doc_xent(h, m["uni_k"], m["uni_c"],
                                 m["bi_k"], m["bi_c"],
                                 m["n_tokens"], m["vocab"])
        return pa.table({"doc_id": pa.array(dids.astype(np.int64)),
                         "n_words": pa.array(nw),
                         "xent": pa.array(xe),
                         "keep": pa.array(xe <= self.xent_max)})


def lm_perplexity(sf_dir: str, xent_max: float = LM_XENT_MAX):
    """(doc_id, n_words, xent, keep): bigram-LM cross-entropy per doc
    (bits/word, add-one smoothing), model trained on the
    doc_id % 10 < 8 split of the same corpus; keep = xent <= LM_XENT_MAX."""
    from ccrawler_ray.memo import memo_val

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    # vocab-bounded model: Ray auto-puts large constructor args in the
    # object store once; passing the dict (not an explicit ref) keeps
    # actor restarts self-contained. Trained once per (sf_dir, session)
    # — ccnet_buckets shares the same model.
    model = memo_val(("lm_model", sf_dir), lambda: _lm_train_counts(ds))
    return ds.map_batches(LMScorer,
                          fn_constructor_args=(model, xent_max),
                          batch_format="pyarrow", concurrency=2)


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing: within each language, docs rank by
# LM cross-entropy and split into head / middle / tail terciles (the
# classic CCNet quality tiers). xent is floor-scaled to 4 decimals by
# the frozen kernel, so qx = round(xent * 1e4) is an EXACT int64 key
# and the rank order (qx, doc_id) is integer-exact at any
# partitioning. The tercile cuts are found WITHOUT a global sort:
# a per-(lang, qx>>CCNET_CX_SHIFT) histogram (bounded by the xent
# VALUE RANGE, never the doc count) locates the cut bucket, only that
# bucket's members reach the driver, and one broadcast-cut map pass
# assigns buckets.
# ---------------------------------------------------------------------------

CCNET_CX_SHIFT = 4     # coarse histogram bucket = qx // 16


class _CCNetScorer:
    """LMScorer variant that keeps the lang column and emits the exact
    integer xent key."""

    def __init__(self, model):
        import ray

        self.m = (ray.get(model)
                  if isinstance(model, ray.ObjectRef) else model)
        for k in ("uni_k", "uni_c", "bi_k", "bi_c"):
            self.m[k] = np.asarray(self.m[k])

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ccrawler_ray.functions.dedup import word_hashes

        m = self.m
        dids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        qx = np.empty(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            h = word_hashes(text.split())
            qx[i] = round(_lm_doc_xent(h, m["uni_k"], m["uni_c"],
                                       m["bi_k"], m["bi_c"],
                                       m["n_tokens"], m["vocab"]) * 10_000)
        return pa.table({"doc_id": pa.array(dids.astype(np.int64)),
                         "lang": batch.column("lang"),
                         "qx": pa.array(qx)})


def ccnet_buckets(sf_dir: str):
    """(doc_id, lang, xent, bucket): per-language perplexity terciles —
    bucket = head / middle / tail by rank in (xent, doc_id) order."""
    from ccrawler_ray.memo import memo_val

    train_ds = _read_docs(sf_dir, ["doc_id", "text"])
    model = memo_val(("lm_model", sf_dir),
                     lambda: _lm_train_counts(train_ds))
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    scored = ds.map_batches(_CCNetScorer, fn_constructor_args=(model,),
                            batch_format="pyarrow",
                            concurrency=2).materialize()

    # pass 1: (lang, cx) histogram — map-side combine, tiny reduce
    def hist(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"lang": t.column("lang").to_pylist(),
                           "cx": np.right_shift(
                               t.column("qx").to_numpy(zero_copy_only=False),
                               CCNET_CX_SHIFT)})
        g = df.groupby(["lang", "cx"], as_index=False).size()
        return pa.table({"lang": pa.array(g["lang"]),
                         "cx": pa.array(g["cx"].to_numpy()),
                         "n": pa.array(g["size"].to_numpy().astype(np.int64))})

    hdf = (scored.map_batches(hist, batch_format="pyarrow").to_pandas()
           .groupby(["lang", "cx"], as_index=False)["n"].sum())

    # per lang: locate the histogram buckets containing ranks
    # r1 = ceil(n/3), r2 = ceil(2n/3); (rank < r_i) == (tuple < cut_i)
    need = {}          # lang -> [(target_rank, below_count, cut_cx), ...]
    for lang, g in hdf.groupby("lang"):
        g = g.sort_values("cx")
        n = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        cxs = g["cx"].to_numpy()
        for r in ((n + 2) // 3, (2 * n + 2) // 3):
            if r >= n:
                need.setdefault(lang, []).append((r, 0, None))  # +inf cut
                continue
            b = int(np.searchsorted(cum, r, side="right"))
            below = int(cum[b - 1]) if b else 0
            need.setdefault(lang, []).append((r, below, int(cxs[b])))

    want_cx = {(lang, c) for lang, cuts in need.items()
               for _, _, c in cuts if c is not None}

    by_lang_cx = {}
    for lang, c in want_cx:
        by_lang_cx.setdefault(lang, set()).add(c)

    def cut_members(t: pa.Table) -> pa.Table:
        langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
        qx = t.column("qx").to_numpy(zero_copy_only=False)
        cx = np.right_shift(qx, CCNET_CX_SHIFT)
        keep = np.zeros(len(qx), dtype=bool)
        for lang, cset in by_lang_cx.items():    # few langs, tiny sets
            keep |= (langs == lang) & np.isin(
                cx, np.fromiter(cset, dtype=np.int64))
        return pa.table({"lang": pa.array(langs[keep].tolist()),
                         "doc_id": pa.array(
                             t.column("doc_id").to_numpy(
                                 zero_copy_only=False)[keep]),
                         "qx": pa.array(qx[keep])})

    mem = (scored.map_batches(cut_members, batch_format="pyarrow")
           .to_pandas() if want_cx else pd.DataFrame(
               columns=["lang", "doc_id", "qx"]))

    INF = (np.iinfo(np.int64).max, np.iinfo(np.int64).max)
    cuts = {}          # lang -> (cut1 tuple, cut2 tuple), exclusive
    for lang, items in need.items():
        pair = []
        for r, below, c in items:
            if c is None:
                pair.append(INF)
                continue
            sub = mem[(mem["lang"] == lang)
                      & ((mem["qx"].to_numpy() >> CCNET_CX_SHIFT) == c)]
            sub = sub.sort_values(["qx", "doc_id"]).reset_index(drop=True)
            row = sub.iloc[r - below]
            pair.append((int(row["qx"]), int(row["doc_id"])))
        cuts[lang] = tuple(pair)

    def assign(t: pa.Table) -> pa.Table:
        langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
        qx = t.column("qx").to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        # per-row cut tuples via a tiny lang lookup, then vectorized
        # lexicographic compares
        c1q = np.empty(len(qx), np.int64)
        c1d = np.empty(len(qx), np.int64)
        c2q = np.empty(len(qx), np.int64)
        c2d = np.empty(len(qx), np.int64)
        for lang, (c1, c2) in cuts.items():
            m = langs == lang
            c1q[m], c1d[m] = c1
            c2q[m], c2d[m] = c2
        lt1 = (qx < c1q) | ((qx == c1q) & (did < c1d))
        lt2 = (qx < c2q) | ((qx == c2q) & (did < c2d))
        buckets = np.where(lt1, "head", np.where(lt2, "middle", "tail"))
        return pa.table({"doc_id": pa.array(did),
                         "lang": pa.array(langs.tolist()),
                         "xent": pa.array(qx / 10_000.0),
                         "bucket": pa.array(buckets.tolist())})

    return scored.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Sequence packing (concat-then-chunk, the GPT-pretraining layout):
# within each source, documents concatenate in doc_id order and the
# token stream is cut into fixed-capacity bins; a doc may span bins.
# bin_id/bin_off are pure functions of the per-source EXCLUSIVE token
# prefix sum, so the distributed form is the two-pass prefix pattern
# (per-(source, monotone doc_id bucket) partial sums -> tiny driver
# offset table -> in-bucket cumsum), never a global ordered scan.
# ---------------------------------------------------------------------------

PACK_CAPACITY = 512


def o10_pack_sequences(sf_dir: str, capacity: int = PACK_CAPACITY,
                       n_buckets: int = 256):
    """(doc_id, source, n_tokens, bin_id, bin_off, end_bin): where each
    doc's tokens land when its source's docs are concatenated in doc_id
    order and chunked into ``capacity``-token bins. Token count is the
    whitespace rule shared with token_count (== DuckDB
    len(regexp_split_to_array(text, '\\s+')))."""
    import polars as pl
    import pyarrow.parquet as pq

    # max doc_id from parquet row-group statistics — a driver-side
    # metadata read, not a Dataset execution
    pf = pq.ParquetFile(f"{sf_dir}/documents.parquet")
    ci = pf.schema_arrow.names.index("doc_id")
    max_id = max(pf.metadata.row_group(g).column(ci).statistics.max
                 for g in range(pf.metadata.num_row_groups))
    width = max((int(max_id) + n_buckets) // n_buckets, 1)

    ds = _read_docs(sf_dir, ["doc_id", "text", "source"])

    def tok_rows(t: pa.Table) -> pa.Table:
        seps = _pl_text(t).str.count_matches(_TOKEN_RE).to_numpy()
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(did.astype(np.int64)),
            "source": t.column("source"),
            "n_tokens": pa.array((seps + 1).astype(np.int64)),
            "bkt": pa.array((did // width).astype(np.int32))})

    rows = ds.map_batches(tok_rows, batch_format="pyarrow").materialize()

    # pass 1: per-(source, bucket) token sums — map-side combine, tiny
    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("source", pa.string()),
                              ("bkt", pa.int32()),
                              ("s", pa.int64())]).empty_table()
        src = t.column("source").to_numpy(zero_copy_only=False)
        bkt = t.column("bkt").to_numpy(zero_copy_only=False)
        us, scode = np.unique(src, return_inverse=True)
        ub, bcode = np.unique(bkt, return_inverse=True)
        comp = scode.astype(np.int64) * len(ub) + bcode
        uc, inv = np.unique(comp, return_inverse=True)
        ssum = np.zeros(len(uc), dtype=np.int64)
        np.add.at(ssum, inv,
                  t.column("n_tokens").to_numpy(zero_copy_only=False))
        return pa.table({"source": pa.array(us[uc // len(ub)]),
                         "bkt": pa.array(ub[uc % len(ub)].astype(np.int32)),
                         "s": pa.array(ssum)})

    pdf = (rows.map_batches(partial, batch_format="pyarrow")
           .to_pandas()    # <= sources x n_buckets rows
           .groupby(["source", "bkt"], as_index=False)["s"].sum())
    # exclusive per-source prefix over bucket order -> offset table
    pdf = pdf.sort_values(["source", "bkt"])
    pdf["off"] = pdf.groupby("source")["s"].cumsum() - pdf["s"]
    offsets = {(s, int(b)): int(o) for s, b, o in
               zip(pdf["source"], pdf["bkt"], pdf["off"])}

    cap = np.int64(capacity)

    def pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("source", pa.string()),
                 ("n_tokens", pa.int64()), ("bin_id", pa.int64()),
                 ("bin_off", pa.int64()),
                 ("end_bin", pa.int64())]).empty_table()
        src = t.column("source").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, src))
        src, ids = src[order], ids[order]
        tok = t.column("n_tokens").to_numpy(zero_copy_only=False)[order]
        bkt = int(t.column("bkt")[0].as_py())
        us, scode = np.unique(src, return_inverse=True)
        base = np.array([offsets[(x, bkt)] for x in us],
                        dtype=np.int64)[scode]
        # per-source running sum over the (source, doc_id)-sorted rows
        cumall = np.cumsum(tok)
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        carry = np.repeat(np.r_[0, cumall[starts[1:] - 1]]
                          if len(starts) > 1 else [0],
                          np.diff(np.r_[starts, len(src)]))
        cum = cumall - carry
        pre = base + cum - tok
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)),
            "source": pa.array(src),
            "n_tokens": pa.array(tok.astype(np.int64)),
            "bin_id": pa.array(pre // cap),
            "bin_off": pa.array(pre % cap),
            "end_bin": pa.array((pre + tok - 1) // cap)})

    return rows.groupby("bkt").map_groups(pack, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling"): score every raw
# document by how target-like its hashed n-gram feature distribution
# is — log p_target(doc) - log p_raw(doc) under two bag-of-hashed-
# unigram models with add-one smoothing over a FIXED bucket space.
# The two models train distributed (per-block bucket histograms, one
# bounded salted groupby — the shuffle moves <= DSIR_BUCKETS keys, the
# lm_perplexity pattern); the bucket log-ratio vector broadcasts to an
# actor pool that scores docs per batch. Serial mirror:
# serial_ref.dsir_importance (bitwise — shared frozen kernels below).
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 4096            # hashed-feature space (frozen)
DSIR_TARGET_LANG = "en"        # the target "domain" in this corpus


def _dsir_buckets(words: list) -> np.ndarray:
    """Hashed-unigram feature buckets in token order (frozen: the
    shared blake2b word hash mod the fixed bucket count)."""
    from ccrawler_ray.functions.dedup import word_hashes

    return (word_hashes(words) % np.uint64(DSIR_BUCKETS)).astype(np.int64)


def _dsir_lambda(cnt_t: np.ndarray, n_t: int, cnt_r: np.ndarray,
                 n_r: int) -> np.ndarray:
    """Per-bucket log importance ratio, add-one smoothing. FROZEN
    float op order — shared verbatim with the serial mirror."""
    lt = np.log((cnt_t + 1.0) / np.float64(n_t + DSIR_BUCKETS))
    lr = np.log((cnt_r + 1.0) / np.float64(n_r + DSIR_BUCKETS))
    return lt - lr


def _dsir_doc_logw(buckets: np.ndarray, lam: np.ndarray) -> float:
    """Doc log-weight = sum of its features' log ratios in token
    order (frozen reduction order)."""
    if not len(buckets):
        return 0.0
    return float(np.add.reduce(lam[buckets], dtype=np.float64))


def _dsir_train_counts(ds) -> dict:
    """Distributed bucket-histogram training: per-block partial
    histograms (nonzero rows only), ONE salted groupby whose key space
    is bounded by DSIR_BUCKETS — the fact rows never shuffle."""

    def count_rows(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        texts = batch.column("text").to_pylist()
        tgt, raw = [], []
        for lang, text in zip(langs, texts):
            b = _dsir_buckets(text.split())
            raw.append(b)
            if lang == DSIR_TARGET_LANG:
                tgt.append(b)
        cr = np.bincount(np.concatenate(raw), minlength=DSIR_BUCKETS) \
            if raw else np.zeros(DSIR_BUCKETS, dtype=np.int64)
        ct = np.bincount(np.concatenate(tgt), minlength=DSIR_BUCKETS) \
            if tgt else np.zeros(DSIR_BUCKETS, dtype=np.int64)
        nz = np.flatnonzero(cr | ct)
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "cnt_t": pa.array(ct[nz].astype(np.int64)),
                         "cnt_r": pa.array(cr[nz].astype(np.int64)),
                         "salt": pa.array((nz % 64).astype(np.int32))})

    def sum_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "cnt_t": pa.array([], pa.int64()),
                             "cnt_r": pa.array([], pa.int64())})
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(b, return_inverse=True)
        tt = np.zeros(len(uk), dtype=np.int64)
        rr = np.zeros(len(uk), dtype=np.int64)
        np.add.at(tt, inv, t.column("cnt_t").to_numpy(zero_copy_only=False))
        np.add.at(rr, inv, t.column("cnt_r").to_numpy(zero_copy_only=False))
        return pa.table({"bucket": pa.array(uk), "cnt_t": pa.array(tt),
                         "cnt_r": pa.array(rr)})

    pdf = (ds.map_batches(count_rows, batch_format="pyarrow")
           .groupby("salt").map_groups(sum_group, batch_format="pyarrow")
           .to_pandas())   # <= DSIR_BUCKETS rows by construction
    cnt_t = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    cnt_r = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    if len(pdf):
        cnt_t[pdf["bucket"].to_numpy()] = pdf["cnt_t"].to_numpy()
        cnt_r[pdf["bucket"].to_numpy()] = pdf["cnt_r"].to_numpy()
    return {"cnt_t": cnt_t, "cnt_r": cnt_r,
            "n_t": int(cnt_t.sum()), "n_r": int(cnt_r.sum())}


class DSIRScorer:
    """Actor-pool scorer: the bucket log-ratio vector is built ONCE
    per actor from the broadcast count model."""

    def __init__(self, model):
        import ray

        m = ray.get(model) if isinstance(model, ray.ObjectRef) else model
        self.lam = _dsir_lambda(np.asarray(m["cnt_t"]), m["n_t"],
                                np.asarray(m["cnt_r"]), m["n_r"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        dids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        nf = np.empty(len(texts), dtype=np.int64)
        lw = np.empty(len(texts), dtype=np.float64)
        for i, text in enumerate(texts):
            b = _dsir_buckets(text.split())
            nf[i] = len(b)
            lw[i] = _dsir_doc_logw(b, self.lam)
        return pa.table({"doc_id": pa.array(dids.astype(np.int64)),
                         "n_feats": pa.array(nf),
                         "logw": pa.array(lw),
                         "keep": pa.array(lw > 0.0)})


def dsir_importance(sf_dir: str):
    """(doc_id, n_feats, logw, keep): hashed-unigram DSIR importance
    log-weight of every document against the ``lang == 'en'`` target
    slice; keep = logw > 0 (doc looks more target than raw)."""
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    model = _dsir_train_counts(ds)
    return ds.map_batches(DSIRScorer,
                          fn_constructor_args=(model,),
                          batch_format="pyarrow", concurrency=2)


# ---------------------------------------------------------------------------
# BPE merge-candidate counting — the inner step of byte-pair-encoding
# tokenizer training: global frequencies of adjacent character pairs
# INSIDE whitespace-split words (pre-tokenization boundary), top-k by
# count. The map side is fully vectorized (one utf-32 view per batch,
# pairs via shifted uint64 packing, per-batch np.unique partials); the
# pair keys shuffle once into coarse salt groups; a pair lives in ONE
# group, so each group's local top-k is globally safe and the driver
# sees <= salts x k rows. Serial mirror: serial_ref.bpe_pair_topk
# (exact integer counts — shared frozen pair kernel).
# ---------------------------------------------------------------------------

# frozen pre-tokenization boundary: ASCII whitespace (the str.split
# separators this corpus contains); shared with the serial mirror
_BPE_WS_CODES = np.array([ord(c) for c in " \t\n\r\x0b\x0c"],
                         dtype=np.uint32)


def _char_pairs(text: str) -> np.ndarray:
    """int64 codes (hi<<32 | lo — codepoints < 2^21, no overflow) of
    adjacent character pairs inside words, in text order."""
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    if len(cps) < 2:
        return np.empty(0, dtype=np.int64)
    a, b = cps[:-1], cps[1:]
    keep = ~np.isin(a, _BPE_WS_CODES) & ~np.isin(b, _BPE_WS_CODES)
    return ((a[keep].astype(np.int64) << 32) | b[keep].astype(np.int64))


def _pair_str(code: int) -> str:
    return chr(int(code) >> 32) + chr(int(code) & 0xFFFFFFFF)


def bpe_pair_topk(sf_dir: str, k: int = 20):
    """(pair, cnt, rank): the k most frequent in-word adjacent
    character pairs across the corpus; ties break on the pair string's
    codepoints ascending."""
    ds = _read_docs(sf_dir, ["text"])

    def count_rows(batch: pa.Table) -> pa.Table:
        # "\n" joins the batch into ONE buffer; it is itself a frozen
        # whitespace separator, so cross-document pairs self-exclude
        codes = _char_pairs("\n".join(batch.column("text").to_pylist()))
        uk, c = np.unique(codes, return_counts=True)
        return pa.table({"pair": pa.array(uk),
                         "cnt": pa.array(c.astype(np.int64)),
                         "salt": pa.array((uk % 64).astype(np.int32))})

    def topk_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"pair": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        p = t.column("pair").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(p, return_inverse=True)
        tot = np.zeros(len(uk), dtype=np.int64)
        np.add.at(tot, inv, t.column("cnt").to_numpy(zero_copy_only=False))
        top = np.lexsort((uk, -tot))[:k]   # local top-k is globally safe
        return pa.table({"pair": pa.array(uk[top]), "cnt": pa.array(tot[top])})

    pdf = (ds.map_batches(count_rows, batch_format="pyarrow")
           .groupby("salt").map_groups(topk_group, batch_format="pyarrow")
           .to_pandas())   # <= 64 x k rows
    pair = pdf["pair"].to_numpy()
    cnt = pdf["cnt"].to_numpy()
    top = np.lexsort((pair, -cnt))[:k]
    return pd.DataFrame({"pair": [_pair_str(c) for c in pair[top]],
                         "cnt": cnt[top].astype(np.int64),
                         "rank": np.arange(1, len(top) + 1, dtype=np.int64)})


# ---------------------------------------------------------------------------
# BPE tokenizer TRAINING (Sennrich-style): n merge rounds over the
# word-frequency table. The distributed part is the part that scales
# with the corpus — exact word counting (per-batch np.unique partials,
# one salted groupby bounded by vocabulary size); the merge loop runs
# on the driver over the SMALL (vocab-bounded) frequency table, which
# is how production BPE trainers work — corpus size never enters the
# loop. Deterministic: best pair = max count, tie-break
# lexicographically smallest (left, right); merges apply left-to-right
# non-overlapping. Serial mirror: serial_ref.bpe_train_merges (exact —
# integer counts + the SAME frozen loop below).
# ---------------------------------------------------------------------------


def _bpe_merge_loop(words: list, n_merges: int) -> list:
    """words: (word, count) pairs, caller-sorted (frozen order).
    Returns (merge_rank, left_sym, right_sym, merged, pair_count)
    rows. Pure function shared verbatim with the serial mirror."""
    seqs = [list(w) for w, _ in words]
    cnts = [c for _, c in words]
    rows = []
    for rank in range(1, n_merges + 1):
        pair_counts: dict = {}
        for seq, c in zip(seqs, cnts):
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        (left, right), cnt = min(pair_counts.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
        merged = left + right
        rows.append((rank, left, right, merged, cnt))
        for k, seq in enumerate(seqs):
            if left not in seq:
                continue
            out, i = [], 0
            while i < len(seq):
                if (i < len(seq) - 1 and seq[i] == left
                        and seq[i + 1] == right):
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[k] = out
    return rows


def _word_counts_distributed(ds) -> pd.DataFrame:
    """Exact corpus word counts: per-batch np.unique partials, ONE
    salted groupby whose key space is the vocabulary (the fact rows
    never shuffle); deterministic blake2b word-hash salting."""
    from ccrawler_ray.functions.dedup import word_hashes

    salt_k = coarse_salt_k()  # captured on the driver at build time

    def count_words(batch: pa.Table) -> pa.Table:
        words: list = []
        for text in batch.column("text").to_pylist():
            words.extend(text.split())
        if not words:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "salt": pa.array([], pa.int32())})
        uw, c = np.unique(np.array(words, dtype=object), return_counts=True)
        salt = (word_hashes(list(uw)) % np.uint64(salt_k)).astype(np.int32)
        return pa.table({"word": pa.array(uw, pa.string()),
                         "cnt": pa.array(c.astype(np.int64)),
                         "salt": pa.array(salt)})

    def sum_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        w = np.asarray(t.column("word").to_pylist(), dtype=object)
        uw, inv = np.unique(w, return_inverse=True)
        tot = np.zeros(len(uw), dtype=np.int64)
        np.add.at(tot, inv, t.column("cnt").to_numpy(zero_copy_only=False))
        return pa.table({"word": pa.array(uw, pa.string()),
                         "cnt": pa.array(tot)})

    return (ds.map_batches(count_words, batch_format="pyarrow")
            .groupby("salt").map_groups(sum_group, batch_format="pyarrow")
            .to_pandas())   # vocab-bounded by construction


def _bpe_merges(sf_dir: str, n_merges: int) -> list:
    """Learned merge rows, memoized per (sf_dir, n_merges, session):
    training runs ONCE; bpe_train_merges and bpe_encode_stats share
    it (the merge table is the trained model — tiny, driver-held)."""
    from ccrawler_ray.memo import memo_val

    def build():
        ds = _read_docs(sf_dir, ["text"])
        pdf = _word_counts_distributed(ds)
        words = sorted(zip(pdf["word"].tolist(),
                           pdf["cnt"].astype(int).tolist()))
        return _bpe_merge_loop(words, n_merges)

    return memo_val(("bpe_merges", sf_dir, n_merges), build)


def bpe_train_merges(sf_dir: str, n_merges: int = 30):
    """(merge_rank, left_sym, right_sym, merged, pair_count): the
    first ``n_merges`` BPE merges learned from the corpus's exact
    word-frequency table."""
    rows = _bpe_merges(sf_dir, n_merges)
    return pd.DataFrame(rows, columns=["merge_rank", "left_sym",
                                       "right_sym", "merged",
                                       "pair_count"]).astype(
        {"merge_rank": "int64", "pair_count": "int64"})


def _bpe_encode_word(word: str, rank_of: dict) -> int:
    """Token count after applying the learned merges to one word:
    repeatedly take the LOWEST-rank pair present and merge ALL its
    non-overlapping occurrences left-to-right (the standard BPE
    apply rule). Pure; shared verbatim with the serial mirror."""
    seq = list(word)
    while len(seq) > 1:
        best_rank, best_pair = None, None
        for i in range(len(seq) - 1):
            r = rank_of.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (seq[i], seq[i + 1])
        if best_pair is None:
            break
        left, right = best_pair
        merged = left + right
        out, i = [], 0
        while i < len(seq):
            if (i < len(seq) - 1 and seq[i] == left
                    and seq[i + 1] == right):
                out.append(merged)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return len(seq)


class BPEEncoder:
    """Actor-pool apply stage: the trained merge table arrives ONCE
    per actor via a ``ray.put`` ref (broadcast-small-side), and a
    word→token-count cache makes encoding per UNIQUE word — on a
    Zipfian corpus cache hits dominate, so throughput is bounded by
    the split, not the merge walk."""

    def __init__(self, merges_ref):
        rows = ray.get(merges_ref)
        # merge_rank orders the table already; rank = position
        self.rank_of = {(left, right): rank
                        for rank, left, right, _, _ in rows}
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_words: list = []
        doc_idx: list = []
        for d, text in enumerate(texts):
            ws = text.split()
            doc_words.extend(ws)
            doc_idx.append(len(ws))
        n_words = np.asarray(doc_idx, dtype=np.int64)
        n_tokens = np.zeros(len(texts), dtype=np.int64)
        if doc_words:
            uw, inv = np.unique(np.array(doc_words, dtype=object),
                                return_inverse=True)
            lens = np.empty(len(uw), dtype=np.int64)
            cache, rank_of = self.cache, self.rank_of
            for k, w in enumerate(uw):
                n = cache.get(w)
                if n is None:
                    n = _bpe_encode_word(w, rank_of)
                    cache[w] = n
                lens[k] = n
            per_word = lens[inv]
            rep = np.repeat(np.arange(len(texts), dtype=np.int64), n_words)
            np.add.at(n_tokens, rep, per_word)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words),
            "n_tokens": pa.array(n_tokens)})


def bpe_encode_stats(sf_dir: str, n_merges: int = 30):
    """(doc_id, n_words, n_tokens): the trained BPE tokenizer APPLIED
    corpus-wide — train (distributed exact word counts + frozen merge
    loop, shared with bpe_train_merges via the session memo) then
    encode every doc in an actor pool holding the broadcast merge
    table. n_tokens is exact-integer, so the serial mirror matches
    bitwise."""
    merges_ref = ray.put(_bpe_merges(sf_dir, n_merges))
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(BPEEncoder, batch_format="pyarrow",
                          concurrency=2,
                          fn_constructor_args=(merges_ref,))


# ---------------------------------------------------------------------------
# O11: sliding-window chunking — split every doc's token stream into
# fixed windows with overlap (the retrieval/embedding-pipeline chunker:
# window W, stride S < W, so consecutive chunks share W-S tokens).
# Pure per-record map (streams, never shuffles); chunk geometry is
# integer arithmetic on the whitespace token count, so the DuckDB
# generate_series oracle is exact.
# ---------------------------------------------------------------------------

CHUNK_W = 64
CHUNK_S = 48


def o11_chunk_overlap(sf_dir: str, window: int = CHUNK_W,
                      stride: int = CHUNK_S):
    """(doc_id, chunk_id, start_tok, n_tok): chunk i covers tokens
    [i*stride, i*stride + min(window, n - i*stride)); docs emit
    1 + max(0, ceil((n-window)/stride)) chunks (0-token docs none)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n = (_pl_text(t).str.count_matches(_TOKEN_RE)
             .to_numpy().astype(np.int64) + 1)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n > 0
        ids, n = ids[keep], n[keep]
        k = 1 + np.maximum(0, (n - window + stride - 1) // stride)
        rep = np.repeat(np.arange(len(ids), dtype=np.int64), k)
        # per-doc chunk index: global arange minus each doc's offset
        gidx = np.arange(int(k.sum()), dtype=np.int64)
        off = np.r_[np.int64(0), np.cumsum(k)[:-1]]
        ci = gidx - off[rep]
        start = ci * stride
        n_tok = np.minimum(window, n[rep] - start)
        return pa.table({"doc_id": pa.array(ids[rep]),
                         "chunk_id": pa.array(ci),
                         "start_tok": pa.array(start),
                         "n_tok": pa.array(n_tok)})

    return ds.map_batches(f, batch_format="pyarrow")


def quality_compression(sf_dir: str, keep_pct: int = 30):
    """Gopher/Dolma-style compression-ratio quality signal: zlib
    level-6 deflate length over utf-8 byte length, per doc. Highly
    repetitive docs compress far below the threshold; ``keep`` is the
    EXACT integer comparison comp_len*100 > raw_len*keep_pct (no fp
    boundary). zlib output is deterministic for a fixed level, so the
    serial mirror (serial_ref.quality_compression — same calls, same
    IEEE division) is bitwise equal."""
    from ccrawler_ray.scale import read_docs

    ds = read_docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        import zlib

        texts = t.column("text").to_pylist()
        raws = [tx.encode("utf-8") for tx in texts]
        n = len(raws)
        rl = np.fromiter((len(b) for b in raws), np.int64, count=n)
        cl = np.fromiter((len(zlib.compress(b, 6)) for b in raws),
                         np.int64, count=n)
        ratio = np.divide(cl, rl, out=np.zeros(n, np.float64),
                          where=rl != 0)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "raw_len": pa.array(rl),
            "comp_len": pa.array(cl),
            "ratio": pa.array(ratio, pa.float64()),
            "keep": pa.array(cl * 100 > rl * np.int64(keep_pct))})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=512)


# ---------------------------------------------------------------------------
# Model evaluation: exact ROC-AUC of the frozen quality logit as a
# predictor of lang == 'en' — the classifier-calibration report every
# filtered-corpus pipeline needs before trusting a score threshold.
#
# Exact AUC without a global sort: AUC over ties is
#   Σ_v pos_v·(2·neg_below_v + neg_v) / (2·P·N)
# summed over DISTINCT logit values v ascending. Distributed shape:
# per-batch (logit, label) partial counts → one salted reduce to
# per-distinct-value counts (the shuffle moves one row per distinct
# value per block) → coarse value-bucket negative totals to the driver
# (bounded by the logit VALUE RANGE >> 6, never by doc count — the
# ccnet_buckets/w8 two-pass prefix pattern) → per-bucket groups
# compute their exact contribution with the broadcast bucket prefix
# offsets. The driver sees bucket totals and one final partial sum
# per group; no per-doc row ever reaches it.
# ---------------------------------------------------------------------------


def model_auc_report(sf_dir: str):
    """One row (n_pos, n_neg, auc_num, auc): exact tie-aware ROC-AUC
    of the QualityModel logit for predicting lang == 'en'.
    ``auc_num`` is the integer numerator Σ pos_v·(2·neg_below_v +
    neg_v); ``auc = auc_num / (2.0·n_pos·n_neg)`` — the identical
    IEEE division the oracle performs."""
    from ccrawler_ray.scale import coarse_salt_k

    salt_k = coarse_salt_k()
    ds = _read_docs(sf_dir, ["doc_id", "text", "n_chars", "lang"])
    model = QualityModel()

    def partial(t: pa.Table) -> pa.Table:
        scored = model(t)
        logit = scored.column("logit").to_numpy(zero_copy_only=False)
        pos = (t.column("lang").to_numpy(zero_copy_only=False) == "en")
        key = logit * 2 + pos                      # (logit, label) packed
        uk, cnt = np.unique(key, return_counts=True)
        lv = uk >> 1
        return pa.table({
            "logit": pa.array(lv.astype(np.int64)),
            "pos_v": pa.array(np.where(uk & 1, cnt, 0).astype(np.int64)),
            "neg_v": pa.array(np.where(uk & 1, 0, cnt).astype(np.int64)),
            "v_salt": pa.array(
                (((lv % salt_k) + salt_k) % salt_k).astype(np.int32))})

    def reduce_values(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("logit", pa.int64()),
                              ("pos_v", pa.int64()),
                              ("neg_v", pa.int64()),
                              ("b_salt", pa.int32())]).empty_table()
        uk, inv = np.unique(
            t.column("logit").to_numpy(zero_copy_only=False),
            return_inverse=True)
        pv = np.zeros(len(uk), dtype=np.int64)
        np.add.at(pv, inv, t.column("pos_v").to_numpy(zero_copy_only=False))
        nv = np.zeros(len(uk), dtype=np.int64)
        np.add.at(nv, inv, t.column("neg_v").to_numpy(zero_copy_only=False))
        bucket = uk >> 6
        return pa.table({
            "logit": pa.array(uk.astype(np.int64)),
            "pos_v": pa.array(pv), "neg_v": pa.array(nv),
            "b_salt": pa.array(
                (((bucket % salt_k) + salt_k) % salt_k).astype(np.int32))})

    per_value = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v_salt")
        .map_groups(reduce_values, batch_format="pyarrow")
        .materialize()
    )
    # pass 1: per-bucket negative totals (driver rows bounded by the
    # logit value range >> 6)
    def bucket_tot(t: pa.Table) -> pa.Table:
        b = t.column("logit").to_numpy(zero_copy_only=False) >> 6
        ub, inv = np.unique(b, return_inverse=True)
        nv = np.zeros(len(ub), dtype=np.int64)
        np.add.at(nv, inv, t.column("neg_v").to_numpy(zero_copy_only=False))
        return pa.table({"bucket": pa.array(ub.astype(np.int64)),
                         "neg_v": pa.array(nv)})

    bt = per_value.map_batches(bucket_tot, batch_format="pyarrow").to_pandas()
    bt = bt.groupby("bucket", as_index=False)["neg_v"].sum().sort_values("bucket")
    buckets = bt["bucket"].to_numpy()
    neg_prefix = np.r_[0, np.cumsum(bt["neg_v"].to_numpy())][:-1]
    import ray as _ray
    off_ref = _ray.put((buckets, neg_prefix))

    # pass 2: per-bucket groups — each bucket lands whole in one group,
    # so neg_below inside the bucket is a local prefix over its values
    def per_bucket_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("num2", pa.int64()), ("pos", pa.int64()),
                              ("neg", pa.int64())]).empty_table()
        bks, offs = _ray.get(off_ref)
        order = np.argsort(
            t.column("logit").to_numpy(zero_copy_only=False),
            kind="stable")
        lv = t.column("logit").to_numpy(zero_copy_only=False)[order]
        pos_v = t.column("pos_v").to_numpy(zero_copy_only=False)[order]
        neg_v = t.column("neg_v").to_numpy(zero_copy_only=False)[order]
        b = lv >> 6
        base = offs[np.searchsorted(bks, b)]
        # local negatives below, restarting at each bucket boundary
        cum = np.r_[0, np.cumsum(neg_v)][:-1]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        local0 = np.repeat(cum[starts], np.diff(np.r_[starts, len(b)]))
        neg_below = base + (cum - local0)
        num2 = int((pos_v * (2 * neg_below + neg_v)).sum())
        return pa.table({"num2": pa.array([num2], pa.int64()),
                         "pos": pa.array([int(pos_v.sum())], pa.int64()),
                         "neg": pa.array([int(neg_v.sum())], pa.int64())})

    parts = (
        per_value.groupby("b_salt")
        .map_groups(per_bucket_group, batch_format="pyarrow")
        .to_pandas()
    )
    num2 = int(parts["num2"].sum())
    n_pos = int(parts["pos"].sum())
    n_neg = int(parts["neg"].sum())
    auc = num2 / (2.0 * n_pos * n_neg) if n_pos and n_neg else float("nan")
    return pd.DataFrame({"n_pos": [n_pos], "n_neg": [n_neg],
                         "auc_num": [num2], "auc": [auc]})
