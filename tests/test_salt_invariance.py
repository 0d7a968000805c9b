"""Coarse-salt fan-out invariance (VERDICT r2 #2).

Every salted kernel groups REAL keys inside its salt group, so the
salt modulus k changes only the shuffle fan-out, never the rows.
``coarse_salt_k`` scales k with the cluster (floored at the tuned
single-node constants); this pins the k-independence contract across
k ∈ {4, 16, 256} via the CCRAWLER_SALT_K override — the value is
captured ON THE DRIVER at query-build time (ccrawler_ray/scale.py),
which is what makes an in-session env sweep valid (workers never read
the env var).
"""

import hashlib

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

# one entry per salted kernel family: LSH bands, exact-verify, CC
# clusters, hyperplane LSH, SimHash blocking (text + media), window
# sessionize, high-cardinality groupby, top-k sentinel path, tf-idf
# doc salt, incremental probe, substring spans
QUERIES = [
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "dedup_clusters",
    "dedup_embedding_lsh",
    "dedup_simhash",
    "media_dedup_near",
    "w2_sessionize",
    "q18_big_orders",
    "q10_returned_revenue",
    "tfidf_topk",
    "dedup_incremental",
    "dedup_ngram_spans",
    "q4_order_priority",
    "bpe_train_merges",
    "spans_line_dedup",
    "q11_important_stock",
    "w13_scd2_history",
    "j10_fuzzy_join",
    "g23_market_basket",
    "w14_markov_transitions",
    "model_auc_report",
    "source_ngram_overlap",
]


def _result_hash(res) -> tuple[int, str]:
    import ray.data

    df = res.to_pandas() if isinstance(res, ray.data.Dataset) else (
        res if isinstance(res, pd.DataFrame) else res.to_pandas())
    df = df[sorted(df.columns)].sort_values(
        list(sorted(df.columns))).reset_index(drop=True)
    return len(df), hashlib.blake2b(
        df.to_csv(index=False).encode(), digest_size=8).hexdigest()


@pytest.mark.usefixtures("ray_session")
def test_salt_k_invariance(monkeypatch):
    import __ray_entry__ as E
    from ccrawler_ray.functions import dedup

    qs = E.queries()
    got: dict[str, dict[str, tuple[int, str]]] = {}
    for k in ("4", "16", "256"):
        monkeypatch.setenv("CCRAWLER_SALT_K", k)
        # memoized signature/cluster datasets were built under the
        # previous k — drop them so every k exercises its own shuffle
        dedup.release_memos()
        got[k] = {name: _result_hash(qs[name](SF_DIR)) for name in QUERIES}
    dedup.release_memos()
    base = got["16"]
    for k in ("4", "256"):
        diffs = {n: (got[k][n], base[n])
                 for n in QUERIES if got[k][n] != base[n]}
        assert not diffs, f"salt k={k} changed outputs: {diffs}"


def test_join_partitions_ignore_salt_override(monkeypatch):
    """Regression: the CCRAWLER_SALT_K sweep must steer SALTING only.
    join_partitions once read it through coarse_salt_k(floor=1) — at
    k=256 that forced 64 join aggregator actors per Dataset.join on a
    small session and stalled dedup_clusters (this suite hung)."""
    from ccrawler_ray.scale import coarse_salt_k, join_partitions

    base = join_partitions()
    monkeypatch.setenv("CCRAWLER_SALT_K", "256")
    assert coarse_salt_k() == 256          # the override still salts
    assert join_partitions() == base       # ...but never re-fans joins
    monkeypatch.setenv("CCRAWLER_SALT_K", "4")
    assert coarse_salt_k() == 4
    assert join_partitions() == base
    monkeypatch.setenv("CCRAWLER_JOIN_PARTS", "32")
    assert join_partitions() == 32         # the join knob is its own env
