"""Training-data mix pipeline: apply near-dup cluster keep decisions
to the documents table and roll up the kept mix by language and token
-length bucket — the acting + reporting steps a pretraining-data
pipeline runs after dedup (SURVEY.md §2 training-data toolkit).

Scale shape: the keep list is O(docs) so it is NEVER broadcast — kept
ids flow through a narrow (int64-only) hash join against the already-
reduced per-doc stats; text is dropped inside the first map_batches so
no string column crosses the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ccrawler_ray.scale import join_partitions, read_docs
from ray.data.aggregate import Sum

from ccrawler_ray.functions.dedup import dedup_clusters

# token-length bucket edges over whitespace tokens (documents run
# 10..99 tokens in the conformance tables; edges split the mass)
BUCKET_SHORT_LT = 40
BUCKET_MEDIUM_LE = 70


# cache key -> materialized keep-id Dataset. The clustering pass is
# the expensive step; a real pipeline runs it ONCE and feeds the keep
# list to every downstream consumer — dedup_filtered_docs and
# training_mix_stats share it the same way. The cached table is
# doc_id-only (8 B/row), deterministic for a given input, and tiny.
# Keyed by input mtime (stale files recompute) and liveness-checked
# (refs from a previous Ray session recompute instead of erroring).
_KEEP_CACHE: dict[tuple, object] = {}


def _keep_ids(sf_dir: str, threshold: float):
    """doc_id-only Dataset of cluster representatives (keep=true)."""
    import os

    key = (sf_dir, threshold,
           os.path.getmtime(f"{sf_dir}/documents.parquet"))
    cached = _KEEP_CACHE.get(key)
    if cached is not None:
        try:
            cached.count()
            return cached
        except Exception:        # refs from a dead Ray session
            _KEEP_CACHE.clear()
    clusters = dedup_clusters(sf_dir, threshold=threshold)

    def only_kept(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or "keep" not in batch.schema.names:
            # schema-less empty block (tiny-input hash-join partition)
            return pa.schema([("doc_id", pa.int64())]).empty_table()
        kept = batch.filter(batch.column("keep"))
        return kept.select(["doc_id"])

    from ccrawler_ray.functions.dedup import nonempty_blocks

    keep = clusters.map_batches(only_kept, batch_format="pyarrow").materialize()
    # drop schema-less zero-row blocks: they break the downstream
    # Dataset.join on tiny inputs (Arrow-block datasets only)
    keep = nonempty_blocks(keep, pa.schema([("doc_id", pa.int64())])).materialize()
    _KEEP_CACHE.clear()          # hold at most one entry
    _KEEP_CACHE[key] = keep
    return keep


def dedup_filtered_docs(sf_dir: str, threshold: float = 0.8):
    """Documents surviving near-dup clustering (one representative per
    cluster) — the dataset a training run would actually read."""
    keep = _keep_ids(sf_dir, threshold)
    docs = read_docs(sf_dir, ["doc_id", "lang", "n_chars"])
    joined = docs.join(keep, join_type="inner", num_partitions=join_partitions(),
                       on=("doc_id",))
    return joined.select_columns(["doc_id", "lang", "n_chars"])


def training_mix_stats(sf_dir: str, threshold: float = 0.8):
    """Post-dedup corpus mix: docs and whitespace-token totals per
    (lang, token-length bucket). Token counts are computed vectorized
    at the read (text dropped immediately); the keep join moves only
    int64 ids; the final groupby sees <= |langs|x3 keys."""
    docs = read_docs(sf_dir, ["doc_id", "lang", "text"])

    def tokens(t: pa.Table) -> pa.Table:
        from ccrawler_ray.functions.text import _pl_text

        n = (_pl_text(t).str.count_matches(r"\s+") + 1).to_numpy()
        return pa.table(
            {"doc_id": t.column("doc_id"), "lang": t.column("lang"),
             "n_tokens": pa.array(n.astype(np.int64))}
        )

    stats = docs.map_batches(tokens, batch_format="pyarrow")
    kept = stats.join(_keep_ids(sf_dir, threshold), join_type="inner",
                      num_partitions=join_partitions(), on=("doc_id",))

    def bucketize(batch: pa.Table) -> pa.Table:
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        bucket = np.where(
            n < BUCKET_SHORT_LT, "short",
            np.where(n <= BUCKET_MEDIUM_LE, "medium", "long"),
        )
        return pa.table(
            {"lang": batch.column("lang"), "bucket": pa.array(bucket),
             "n_tokens": pa.array(n.astype(np.int64))}
        )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("lang", pa.string()),
                              ("bucket", pa.string()),
                              ("n_docs", pa.int64()),
                              ("total_tokens", pa.int64())]).empty_table()
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        bucket = t.column("bucket").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        ul, lcode = np.unique(lang, return_inverse=True)
        ub, bcode = np.unique(bucket, return_inverse=True)
        comp = lcode.astype(np.int64) * len(ub) + bcode
        uc, inv = np.unique(comp, return_inverse=True)
        tot = np.zeros(len(uc), dtype=np.int64)
        np.add.at(tot, inv, n)
        return pa.table({
            "lang": pa.array(ul[uc // len(ub)]),
            "bucket": pa.array(ub[uc % len(ub)]),
            "n_docs": pa.array(np.bincount(inv).astype(np.int64)),
            "total_tokens": pa.array(tot)})

    partials = kept.map_batches(bucketize, batch_format="pyarrow") \
                   .map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["lang", "bucket"]).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("total_tokens", alias_name="total_tokens"),
    )


# ---------------------------------------------------------------------------
# Weighted source interleave — the "data mixing" step that turns
# per-source corpora into ONE training stream with prescribed sampling
# ratios. Each doc races an exponential clock at its source's rate
# (pri = -ln(u)/w, u seeded-hash-uniform): sorting by pri yields a
# stream whose every prefix holds the sources in proportion to their
# weights — the standard Gumbel/exponential-race construction, fully
# deterministic given the seed.
# ---------------------------------------------------------------------------

MIX_SEED = 713
_MIX_BOUNDS = np.arange(1, 256) / 32.0   # monotone pri buckets (frozen)


def mix_weights(sources) -> np.ndarray:
    """FROZEN per-source sampling weight: 1 + (numeric suffix mod 4) —
    srcN weights cycle 1,2,3,4. Parsed once per DISTINCT source."""
    import re

    codes, uniq = pd.factorize(np.asarray(sources, dtype=object))
    wu = np.array([1.0 + (int(re.sub(r"\D", "", s) or "0") % 4)
                   for s in uniq], dtype=np.float64)
    return wu[codes]


def mix_interleave(sf_dir: str, seed: int = MIX_SEED):
    """(pos, doc_id, source, pri): the full interleaved training order.

    Scale shape: the global position is NOT assigned on the driver —
    docs land in 256 monotone priority buckets (searchsorted over
    frozen bounds), per-bucket counts reduce to 256 ints whose prefix
    sums are the bucket offsets, and each bucket numbers itself with a
    vectorized in-group sort (pos = offset + arange). One narrow
    shuffle of (doc_id, source, pri); nothing O(docs) on the driver.
    """
    from ccrawler_ray.spec import hash64_batch

    ds = read_docs(sf_dir, ["doc_id", "source"])

    def add_pri(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = hash64_batch([str(i) for i in ids], seed=seed)
        u = (h.astype(np.float64) + 1.0) / 2.0 ** 64     # (0, 1]
        src = t.column("source").to_numpy(zero_copy_only=False)
        pri = -np.log(u) / mix_weights(src)
        bucket = np.searchsorted(_MIX_BOUNDS, pri, side="right")
        return pa.table(
            {"doc_id": pa.array(ids.astype(np.int64)),
             "source": t.column("source"), "pri": pa.array(pri),
             "bucket": pa.array(bucket.astype(np.int32))})

    withp = ds.map_batches(add_pri, batch_format="pyarrow").materialize()

    def count_partial(t: pa.Table) -> pa.Table:
        ub, n = np.unique(
            t.column("bucket").to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"bucket": pa.array(ub.astype(np.int64)),
                         "n": pa.array(n.astype(np.int64))})

    counts = withp.map_batches(
        count_partial, batch_format="pyarrow").to_pandas()
    per_bucket = np.zeros(len(_MIX_BOUNDS) + 1, dtype=np.int64)
    np.add.at(per_bucket, counts["bucket"].to_numpy(),
              counts["n"].to_numpy())
    offsets = np.r_[np.int64(0), np.cumsum(per_bucket)[:-1]]  # 2 KB

    def number(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("pos", pa.int64()), ("doc_id", pa.int64()),
                 ("source", pa.string()),
                 ("pri", pa.float64())]).empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        pri = t.column("pri").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, pri))
        base = offsets[int(t.column("bucket")[0].as_py())]
        t = t.take(pa.array(order))
        return pa.table(
            {"pos": pa.array(base + np.arange(1, t.num_rows + 1,
                                              dtype=np.int64)),
             "doc_id": t.column("doc_id"),
             "source": t.column("source"),
             "pri": t.column("pri")})

    return withp.groupby("bucket").map_groups(number, batch_format="pyarrow")


def quality_filtered_docs(sf_dir: str, min_tokens: int = 20,
                          max_upper: float = 0.3, max_dup: float = 0.5):
    """C4-style quality filter chain: keep English docs with enough
    tokens, a sane uppercase ratio, AND a low duplicated-5-gram ratio
    (functions.dedup.dedup_ngram_spans) — the compose-everything
    pre-training filter step (heuristic quality x substring dedup).

    Scale shape: each leg reduces to a narrow (doc_id, leg_bit,
    payload) table inside its own streaming pipeline (text never
    crosses a shuffle); the three legs UNION into ONE execution and
    meet in ONE coarse-salted groupby (bitmask intersection — the
    corpus_prep_stats pattern; each hash join costs ~2 s fixed
    aggregator-pool setup at suite scale). Per-batch sentinel rows
    keep every leg's output blocks typed (Ray map operators drop the
    schema of zero-row blocks). Returns (doc_id, lang, n_tokens,
    dup_ratio); lang is the filter constant "en" by construction."""
    from ccrawler_ray.functions.dedup import dedup_ngram_spans
    from ccrawler_ray.functions.text import quality_score
    from ccrawler_ray.scale import coarse_salt_k, join_partitions

    salt_k = coarse_salt_k()
    ALL_LEGS = 1 + 2 + 4

    def leg_rows(t: pa.Table, bit: int,
                 n_tokens=None, dup_ratio=None) -> pa.Table:
        ids = np.concatenate(
            [t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64),
             [-1]])
        ntk = (np.concatenate([n_tokens.astype(np.int64), [0]])
               if n_tokens is not None else np.zeros(len(ids), np.int64))
        dup = (np.concatenate([dup_ratio.astype(np.float64), [0.0]])
               if dup_ratio is not None else np.zeros(len(ids), np.float64))
        return pa.table({
            "doc_id": pa.array(ids),
            "bit": pa.array(np.full(len(ids), bit, np.int64)),
            "n_tokens": pa.array(ntk),
            "dup_ratio": pa.array(dup),
            "d_salt": pa.array((ids % salt_k).astype(np.int32)),
        })

    def qf(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(pc.greater_equal(t.column("n_tokens"), min_tokens),
                    pc.less_equal(t.column("upper_ratio"), max_upper))
        t = t.filter(m)
        return leg_rows(t, 1, n_tokens=t.column("n_tokens").to_numpy(
            zero_copy_only=False))

    def sf(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.less_equal(t.column("dup_ratio"), max_dup))
        return leg_rows(t, 2, dup_ratio=t.column("dup_ratio").to_numpy(
            zero_copy_only=False))

    def lf(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return leg_rows(t.filter(pc.equal(t.column("lang"), "en")), 4)

    q = quality_score(sf_dir).map_batches(qf, batch_format="pyarrow")
    s = dedup_ngram_spans(sf_dir).map_batches(sf, batch_format="pyarrow")
    docs = read_docs(sf_dir, ["doc_id", "lang"]).map_batches(lf, batch_format="pyarrow")

    def intersect(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        uu, inv = np.unique(ids, return_inverse=True)
        bits = np.zeros(len(uu), dtype=np.int64)
        np.add.at(bits, inv, t.column("bit").to_numpy(zero_copy_only=False))
        ntok = np.zeros(len(uu), dtype=np.int64)
        np.maximum.at(ntok, inv, t.column("n_tokens").to_numpy(
            zero_copy_only=False))
        dup = np.full(len(uu), -np.inf)
        np.fmax.at(dup, inv, t.column("dup_ratio").to_numpy(
            zero_copy_only=False))
        m = (bits == ALL_LEGS) & (uu >= 0)
        return pa.table({
            "doc_id": pa.array(uu[m].astype(np.int64)),
            "n_tokens": pa.array(ntok[m]),
            "dup_ratio": pa.array(dup[m]),
            "lang": pa.array(np.full(int(m.sum()), "en", dtype=object))})

    out = (q.union(s, docs)
           .groupby("d_salt")
           .map_groups(intersect, batch_format="pyarrow"))
    from ccrawler_ray.functions.dedup import _stamp_schema

    return _stamp_schema(out, pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("dup_ratio", pa.float64()), ("lang", pa.string())]))


def corpus_prep_stats(sf_dir: str, min_tokens: int = 20,
                      max_upper: float = 0.3, max_dup: float = 0.5,
                      threshold: float = 0.8, bench_mod: int = 13):
    """The full pre-training corpus-prep composition: a document
    survives iff it passes EVERY leg —
      quality (n_tokens >= min_tokens, upper_ratio <= max_upper),
      substring dedup (dup_ratio <= max_dup),
      the frozen linear quality model (logit >= 0),
      decontamination (not contaminated; eval docs excluded),
      near-dup clustering (cluster representative / keep).
    Returns the surviving mix per language: (lang, n_docs, sum_tokens).

    Scale shape: each leg is its own streaming pipeline reduced to a
    narrow (doc_id, leg_bit) table; the five legs UNION into ONE
    streaming execution (they run concurrently under the executor) and
    meet in ONE coarse-salted groupby — ids whose leg bits sum to
    ALL_LEGS survive — instead of a chain of five hash joins (each
    join spins its own aggregator pool; measured ~2 s fixed cost per
    join at suite scale). Per-batch sentinel rows keep every leg's
    output blocks non-empty (Ray map operators drop the schema of
    zero-row blocks). The only remaining join attaches lang from the
    documents table; the final rollup groups by the tiny lang key.
    The clustering leg reuses the memoized artifact.
    """
    from ccrawler_ray.functions.dedup import (decontaminate_overlap,
                                              dedup_ngram_spans)
    from ccrawler_ray.functions.text import model_score_docs, quality_score

    from ccrawler_ray.scale import coarse_salt_k

    salt_k = coarse_salt_k()
    ALL_LEGS = 1 + 2 + 4 + 8 + 16

    def leg_rows(ids: np.ndarray, bit: int,
                 n_tokens: np.ndarray | None = None) -> pa.Table:
        """(doc_id, bit, n_tokens, d_salt) rows + one doc_id=-1
        sentinel so no output block is ever zero-row/schema-less."""
        ids = np.concatenate([ids.astype(np.int64), [-1]])
        toks = (np.concatenate([n_tokens.astype(np.int64), [0]])
                if n_tokens is not None else np.zeros(len(ids), np.int64))
        return pa.table({
            "doc_id": pa.array(ids),
            "bit": pa.array(np.full(len(ids), bit, np.int64)),
            "n_tokens": pa.array(toks),
            "d_salt": pa.array((ids % salt_k).astype(np.int32)),
        })

    def qf(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(pc.greater_equal(t.column("n_tokens"), min_tokens),
                    pc.less_equal(t.column("upper_ratio"), max_upper))
        t = t.filter(m)
        return leg_rows(t.column("doc_id").to_numpy(zero_copy_only=False), 1,
                        t.column("n_tokens").to_numpy(zero_copy_only=False))

    def sf(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.less_equal(t.column("dup_ratio"), max_dup))
        return leg_rows(t.column("doc_id").to_numpy(zero_copy_only=False), 2)

    def mf(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("keep"))
        return leg_rows(t.column("doc_id").to_numpy(zero_copy_only=False), 4)

    def cf(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.invert(t.column("contaminated")))
        return leg_rows(t.column("doc_id").to_numpy(zero_copy_only=False), 8)

    def kf(t: pa.Table) -> pa.Table:
        return leg_rows(t.column("doc_id").to_numpy(zero_copy_only=False), 16)

    q = quality_score(sf_dir).map_batches(qf, batch_format="pyarrow")
    s = dedup_ngram_spans(sf_dir).map_batches(sf, batch_format="pyarrow")
    m = model_score_docs(sf_dir).map_batches(mf, batch_format="pyarrow")
    c = decontaminate_overlap(sf_dir, bench_mod=bench_mod).map_batches(
        cf, batch_format="pyarrow")
    k = _keep_ids(sf_dir, threshold).map_batches(kf, batch_format="pyarrow")
    docs = read_docs(sf_dir, ["doc_id", "lang"])

    out_schema = pa.schema([("lang", pa.string()), ("n_docs", pa.int64()),
                            ("sum_tokens", pa.int64())])

    def intersect(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        uu, inv = np.unique(ids, return_inverse=True)
        bits = np.zeros(len(uu), dtype=np.int64)
        np.add.at(bits, inv, t.column("bit").to_numpy(zero_copy_only=False))
        ntok = np.zeros(len(uu), dtype=np.int64)
        np.maximum.at(ntok, inv, t.column("n_tokens").to_numpy(
            zero_copy_only=False))
        m = (bits == ALL_LEGS) & (uu >= 0)
        return pa.table({
            "doc_id": pa.array(uu[m].astype(np.int64)),
            "n_tokens": pa.array(ntok[m])})

    kept = (q.union(s, m, c, k)
            .groupby("d_salt")
            .map_groups(intersect, batch_format="pyarrow")
            .materialize())
    # the lang join raises on an empty side — cheap metadata guard on
    # the already-materialized (narrow) intersection
    if kept.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    kept = kept.join(docs, join_type="inner", num_partitions=join_partitions(),
                     on=("doc_id",))

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"lang": t.column("lang").to_pylist(),
                           "n_tokens": t.column("n_tokens").to_numpy(
                               zero_copy_only=False)})
        g = df.groupby("lang", as_index=False).agg(
            n_docs=("n_tokens", "size"), sum_tokens=("n_tokens", "sum"))
        return pa.table({"lang": pa.array(g["lang"], pa.string()),
                         "n_docs": pa.array(g["n_docs"].astype(np.int64)),
                         "sum_tokens": pa.array(
                             g["sum_tokens"].astype(np.int64))})

    return (kept.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("sum_tokens", alias_name="sum_tokens")))


# ---------------------------------------------------------------------------
# Temperature-based source resampling (the mT5/XLM-R mixing rule):
# sample source s with probability proportional to n_s^alpha, so
# alpha < 1 upsamples small sources relative to their share. Two
# passes over the narrow (doc_id, source) projection: exact
# per-source counts (map-side partials, #sources-bounded), then a
# stateless keep/drop with a seeded per-doc uniform draw against the
# broadcast per-source rate — deterministic, partitioning-independent.
# ---------------------------------------------------------------------------

TEMP_SEED = 977
TEMP_ALPHA = 0.7
TEMP_FRAC = 0.5


def temp_keep_rates(counts: dict, alpha: float, frac: float) -> dict:
    """FROZEN per-source keep rate: q_s = n_s^alpha / sum_t n_t^alpha,
    target total T = round(frac * N), rate_s = min(1, q_s * T / n_s).
    Driver-side floats in a frozen order (sources lexicographic);
    shared verbatim with the serial mirror."""
    names = sorted(counts)
    n = np.array([counts[s] for s in names], dtype=np.float64)
    p = n ** alpha
    q = p / p.sum()
    t_total = float(round(frac * n.sum()))
    rate = np.minimum(1.0, q * t_total / n)
    return dict(zip(names, rate))


def mix_temperature_sample(sf_dir: str, alpha: float = TEMP_ALPHA,
                           frac: float = TEMP_FRAC,
                           seed: int = TEMP_SEED):
    """(doc_id, source): the kept docs after temperature resampling —
    u(doc) <= rate(source) with u = (hash64(seed:doc_id)+1)/2^64."""
    from ccrawler_ray.functions.dedup import _stamp_schema
    from ccrawler_ray.spec import hash64_batch

    ds = read_docs(sf_dir, ["doc_id", "source"])

    def cnt_partial(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("source").to_pylist(), dtype=object)
        us, c = np.unique(s, return_counts=True)
        return pa.table({"source": pa.array(us.tolist(), pa.string()),
                         "n": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(cnt_partial, batch_format="pyarrow").to_pandas()
    counts = parts.groupby("source")["n"].sum().to_dict()
    rates_ref = ray.put(temp_keep_rates(counts, alpha, frac))

    def pick(t: pa.Table) -> pa.Table:
        rates = ray.get(rates_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = hash64_batch([str(i) for i in ids], seed=seed)
        u = (h.astype(np.float64) + 1.0) / 2.0 ** 64   # (0, 1]
        src = t.column("source").to_numpy(zero_copy_only=False)
        us, code = np.unique(src, return_inverse=True)
        r = np.array([rates[x] for x in us], dtype=np.float64)[code]
        keep = u <= r
        return pa.table(
            {"doc_id": pa.array(ids[keep].astype(np.int64)),
             "source": pa.array(src[keep])})

    out = ds.map_batches(pick, batch_format="pyarrow")
    return _stamp_schema(out, pa.schema([("doc_id", pa.int64()),
                                         ("source", pa.string())]))


# ---------------------------------------------------------------------------
# Curriculum training order: shortest-first difficulty buckets with a
# seeded shuffle INSIDE each bucket — the "easy→hard, but not
# deterministic-easy" ordering curriculum-learning data loaders use.
# Distributed shape: the memoized quality leg supplies n_tokens, the
# global position comes from the o9-style TWO-PASS bucket-offset
# numbering (pass 1: per-(qbucket, skey-bucket) counts — a
# driver-sized offset table; pass 2: in-group lexsort + base offset).
# No global sort; composite group ids ascend exactly like
# (qbucket, skey), so offsets are rank-exact.
# ---------------------------------------------------------------------------

CURRICULUM_SEED = 77
CURRICULUM_WIDTH = 32      # tokens per difficulty bucket
CURRICULUM_BUCKETS = 8
# 64 salt groups per qbucket (top 6 bits of the 60-bit skey) keeps the
# total map_groups key count at 8*64 = 512 — within the <=~few-hundred
# coarse-group budget (~1.4 ms fixed cost per distinct Ray groupby key).
# Group ids still ascend with (qbucket, skey), so the two-pass offset
# numbering stays rank-exact and pos values are unchanged.
CURRICULUM_SALTS = 64


def mix_curriculum_order(sf_dir: str, seed: int = CURRICULUM_SEED,
                         width: int = CURRICULUM_WIDTH,
                         n_qbuckets: int = CURRICULUM_BUCKETS):
    """(doc_id, n_tokens, qbucket, skey, pos): curriculum order —
    qbucket = min(n_tokens // width, n_qbuckets-1) (short docs first),
    skey = first-15-hex md5('{seed}:{doc_id}') (BIGINT-safe, the o9
    rule), pos = global rank by (qbucket, skey, doc_id)."""
    import hashlib

    from ccrawler_ray.functions.text import quality_score

    qs = quality_score(sf_dir)   # memoized (doc_id, n_tokens, ...) leg

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.fromiter(
            (int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16)
             for i in ids), dtype=np.int64, count=len(ids))
        qb = np.minimum(ntok // np.int64(width), np.int64(n_qbuckets - 1))
        return pa.table({
            "doc_id": pa.array(ids), "n_tokens": pa.array(ntok),
            "qbucket": pa.array(qb), "skey": pa.array(keys),
            "grp": pa.array((qb * np.int64(CURRICULUM_SALTS)
                             + (keys >> np.int64(54))).astype(np.int32))})

    withk = qs.map_batches(keyed, batch_format="pyarrow").materialize()

    def cnt(t: pa.Table) -> pa.Table:
        g = t.column("grp").to_numpy(zero_copy_only=False)
        ug, c = np.unique(g, return_counts=True)
        return pa.table({"grp": pa.array(ug.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    parts = withk.map_batches(cnt, batch_format="pyarrow").to_pandas()
    per_grp = np.zeros(n_qbuckets * CURRICULUM_SALTS, dtype=np.int64)
    np.add.at(per_grp, parts["grp"].to_numpy(), parts["n"].to_numpy())
    offsets = np.r_[np.int64(0), np.cumsum(per_grp)[:-1]]

    def number(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keys = t.column("skey").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        base = offsets[int(t.column("grp")[0].as_py())]
        return pa.table({
            "doc_id": pa.array(ids[order]),
            "n_tokens": pa.array(
                t.column("n_tokens").to_numpy(zero_copy_only=False)[order]),
            "qbucket": pa.array(
                t.column("qbucket").to_numpy(zero_copy_only=False)[order]),
            "skey": pa.array(keys[order]),
            "pos": pa.array(base + np.arange(1, len(ids) + 1,
                                             dtype=np.int64))})

    return withk.groupby("grp").map_groups(number, batch_format="pyarrow")
