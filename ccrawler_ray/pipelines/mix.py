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
        kept = batch.filter(batch.column("keep"))
        return kept.select(["doc_id"])

    keep = clusters.map_batches(only_kept, batch_format="pyarrow").materialize()
    _KEEP_CACHE.clear()          # hold at most one entry
    _KEEP_CACHE[key] = keep
    return keep


def dedup_filtered_docs(sf_dir: str, threshold: float = 0.8):
    """Documents surviving near-dup clustering (one representative per
    cluster) — the dataset a training run would actually read."""
    keep = _keep_ids(sf_dir, threshold)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    joined = docs.join(keep, join_type="inner", num_partitions=8,
                       on=("doc_id",))
    return joined.select_columns(["doc_id", "lang", "n_chars"])


def training_mix_stats(sf_dir: str, threshold: float = 0.8):
    """Post-dedup corpus mix: docs and whitespace-token totals per
    (lang, token-length bucket). Token counts are computed vectorized
    at the read (text dropped immediately); the keep join moves only
    int64 ids; the final groupby sees <= |langs|x3 keys."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def tokens(df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        n = (pl.Series(df["text"]).str.count_matches(r"\s+") + 1).to_numpy()
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "lang": df["lang"],
             "n_tokens": n.astype(np.int64)}
        )

    stats = docs.map_batches(tokens, batch_format="pandas")
    kept = stats.join(_keep_ids(sf_dir, threshold), join_type="inner",
                      num_partitions=8, on=("doc_id",))

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

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "bucket"], as_index=False).agg(
            n_docs=("n_tokens", "size"), total_tokens=("n_tokens", "sum")
        )
        return g.astype({"n_docs": "int64", "total_tokens": "int64"})

    partials = kept.map_batches(bucketize, batch_format="pyarrow") \
                   .map_batches(partial, batch_format="pandas")
    return partials.groupby(["lang", "bucket"]).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("total_tokens", alias_name="total_tokens"),
    )


def quality_filtered_docs(sf_dir: str, min_tokens: int = 20,
                          max_upper: float = 0.3, max_dup: float = 0.5):
    """C4-style quality filter chain: keep English docs with enough
    tokens, a sane uppercase ratio, AND a low duplicated-5-gram ratio
    (functions.dedup.dedup_ngram_spans) — the compose-everything
    pre-training filter step (heuristic quality x substring dedup).

    Scale shape: each leg reduces to a narrow per-doc table inside its
    own streaming pipeline (text never crosses a shuffle); the legs
    meet in int64-keyed hash joins — no broadcast of anything O(docs).
    Returns (doc_id, lang, n_tokens, dup_ratio)."""
    from ccrawler_ray.functions.dedup import dedup_ngram_spans
    from ccrawler_ray.functions.text import quality_score

    def qf(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(pc.greater_equal(t.column("n_tokens"), min_tokens),
                    pc.less_equal(t.column("upper_ratio"), max_upper))
        return t.filter(m).select(["doc_id", "n_tokens"])

    def sf(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(
            pc.less_equal(t.column("dup_ratio"), max_dup)
        ).select(["doc_id", "dup_ratio"])

    def lf(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t.column("lang"), "en"))

    q = quality_score(sf_dir).map_batches(qf, batch_format="pyarrow")
    s = dedup_ngram_spans(sf_dir).map_batches(sf, batch_format="pyarrow")
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(lf, batch_format="pyarrow")
    joined = q.join(s, join_type="inner", num_partitions=8, on=("doc_id",))
    return joined.join(docs, join_type="inner", num_partitions=8,
                       on=("doc_id",))


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
    narrow int64 doc_id(+small) table; legs meet in hash joins (no
    broadcast of any O(docs) side); the final rollup groups by the
    tiny lang key. The clustering leg reuses the memoized artifact.
    """
    from ccrawler_ray.functions.dedup import (decontaminate_overlap,
                                              dedup_ngram_spans)
    from ccrawler_ray.functions.text import model_score_docs, quality_score

    def qf(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(pc.greater_equal(t.column("n_tokens"), min_tokens),
                    pc.less_equal(t.column("upper_ratio"), max_upper))
        return t.filter(m).select(["doc_id", "n_tokens"])

    def sf(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.less_equal(t.column("dup_ratio"), max_dup)
                        ).select(["doc_id"])

    def mf(t: pa.Table) -> pa.Table:
        return t.filter(t.column("keep")).select(["doc_id"])

    def cf(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.invert(t.column("contaminated"))
                        ).select(["doc_id"])

    q = quality_score(sf_dir).map_batches(qf, batch_format="pyarrow")
    s = dedup_ngram_spans(sf_dir).map_batches(sf, batch_format="pyarrow")
    m = model_score_docs(sf_dir).map_batches(mf, batch_format="pyarrow")
    c = decontaminate_overlap(sf_dir, bench_mod=bench_mod).map_batches(
        cf, batch_format="pyarrow")
    k = _keep_ids(sf_dir, threshold)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    kept = q
    for leg in (s, m, c, k):
        kept = kept.join(leg, join_type="inner", num_partitions=8,
                         on=("doc_id",))
    kept = kept.join(docs, join_type="inner", num_partitions=8,
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
