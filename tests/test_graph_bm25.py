"""Semantic properties of the iterative PageRank and BM25 operators
(engine ≡ serial bit-equality is covered by test_queries_oracle via
the VALUES differential oracles; these pin the specs themselves)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from ccrawler_ray import serial_ref as SR

SF_DIR = "/root/testdata/sf0.001"
U = 10**12


def test_pagerank_spec_properties():
    out = SR.link_pagerank(SF_DIR, iters=10, k_top=500)
    n = pq.ParquetFile(f"{SF_DIR}/documents.parquet").metadata.num_rows
    assert len(out) == n  # k_top >= n returns every node
    total = int(out["rank_u"].sum())
    # mass conserved up to per-node floor losses (3 floors/node/iter)
    assert U - 10 * 3 * n <= total <= U
    # preferential attachment: links point to lower ids, so the mass
    # concentrates there — every top-10 node is an old (low-id) page
    top10 = out.sort_values(["rank_u", "doc_id"],
                            ascending=[False, True]).head(10)
    assert (top10["doc_id"] < n // 4).all()
    # ranks differ (graph is not regular): spread well above uniform
    assert out["rank_u"].max() > 5 * (U // n)


def test_pagerank_iteration_converges():
    def resid(i: int) -> int:
        a = SR.link_pagerank(SF_DIR, iters=i, k_top=500)
        b = SR.link_pagerank(SF_DIR, iters=i + 1, k_top=500)
        return int(np.abs(a.sort_values("doc_id")["rank_u"].to_numpy()
                          - b.sort_values("doc_id")["rank_u"].to_numpy()).max())

    early, late = resid(3), resid(10)
    # geometric contraction (damping 0.85): the residual shrinks and
    # is below 1% of the mass scale by iteration 10
    assert late < early
    assert late < U // 100


def test_bm25_spec_properties():
    terms = ("join", "vector", "spark", "fast")
    out = SR.search_bm25(SF_DIR, terms=terms, k=20)
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    s = out["score"].to_numpy()
    assert (np.diff(s) <= 0).all()  # descending
    assert (s > 0).all()
    # every returned doc really contains a query term
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    texts = dict(zip(t.column("doc_id").to_pylist(),
                     t.column("text").to_pylist()))
    for did in out["doc_id"]:
        assert set(texts[did].split()) & set(terms)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_engine_matches_serial_partitioned():
    """The exact-int design promise: block partitioning cannot change
    the result. Force many small blocks and compare bitwise."""
    import ray.data

    from ccrawler_ray.functions.graph import link_pagerank

    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024  # tiny blocks -> many partials
    try:
        got = link_pagerank(SF_DIR, iters=5, k_top=50)
    finally:
        ctx.target_max_block_size = old
    want = SR.link_pagerank(SF_DIR, iters=5, k_top=50)
    for c in ("doc_id", "rank_u", "rank"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_hits_spec_properties():
    out = SR.link_hits(SF_DIR, iters=10, k_top=500)
    # mass stays bounded and positive after the frozen rescale rule
    assert (out["auth_u"] >= 0).all() and (out["hub_u"] >= 0).all()
    # node 0 has no outlinks -> zero hub mass after the first iteration
    row0 = out[out["doc_id"] == 0]
    if len(row0):
        assert int(row0["hub_u"].iloc[0]) == 0
    # ordering contract: auth_u desc, doc_id asc
    a = out["auth_u"].to_numpy()
    assert (a[:-1] >= a[1:]).all()


@pytest.mark.usefixtures("ray_session")
def test_hits_engine_matches_serial_partitioned():
    import ray.data

    from ccrawler_ray.functions.graph import link_hits

    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024
    try:
        got = link_hits(SF_DIR, iters=5, k_top=50)
    finally:
        ctx.target_max_block_size = old
    want = SR.link_hits(SF_DIR, iters=5, k_top=50)
    for c in ("doc_id", "auth_u", "hub_u", "authority", "hub"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
