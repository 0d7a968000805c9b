"""Sketch-operator accuracy: the mergeable sketches must land within
their theoretical error bounds of the exact answers, and the
distributed result must be bitwise equal to the serial mirror
(order-independent merges)."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.01"


@pytest.mark.usefixtures("ray_session")
def test_hll_within_error_bound_and_serial_equal():
    from ccrawler_ray import serial_ref as SR
    from ccrawler_ray.functions.sketch import HLL_M, g5_hll_distinct

    got = g5_hll_distinct(SF).to_pandas().sort_values("event_type")
    serial = SR.g5_hll_distinct(SF).sort_values("event_type")
    assert got["est_users"].tolist() == serial["est_users"].tolist()

    exact = duckdb.sql(
        "SELECT event_type, count(DISTINCT user_id) AS n FROM "
        f"read_parquet('{SF}/events.parquet') GROUP BY 1 ORDER BY 1"
    ).df()
    rel_err = np.abs(got["est_users"].to_numpy() - exact["n"].to_numpy()) \
        / exact["n"].to_numpy()
    bound = 3 * 1.04 / np.sqrt(HLL_M)          # 3 sigma
    assert (rel_err <= bound).all(), f"HLL error {rel_err} > {bound}"


@pytest.mark.usefixtures("ray_session")
def test_quantile_hist_within_bin_width():
    from ccrawler_ray import serial_ref as SR
    from ccrawler_ray.functions.sketch import QUANT_BINS, g7_quantile_hist

    got = g7_quantile_hist(SF).to_pandas().sort_values("q")
    serial = SR.g7_quantile_hist(SF).sort_values("q")
    assert got["est_value"].tolist() == serial["est_value"].tolist()

    v = duckdb.sql(
        f"SELECT o_totalprice FROM read_parquet('{SF}/orders.parquet')"
    ).df()["o_totalprice"].to_numpy()
    width = (v.max() - v.min()) / QUANT_BINS
    for q, est in zip(got["q"], got["est_value"]):
        exact = np.quantile(v, q)
        assert abs(est - exact) <= 2 * width, (q, est, exact, width)


@pytest.mark.usefixtures("ray_session")
def test_bloom_semi_join_exact_and_selective():
    """The bloom-pushdown result must be EXACT (FPs removed by the
    verify join) and the bloom must actually be selective."""
    import pandas as pd

    from ccrawler_ray.relational import (_BLOOM_BITS, _BLOOM_K,
                                         _bloom_positions,
                                         j7_bloom_semi_join)

    got = j7_bloom_semi_join(SF).to_pandas()
    want = duckdb.sql(
        "SELECT CAST(count(*) AS BIGINT) AS n_items, "
        "CAST(sum(CAST(round((l_extendedprice*(1-l_discount))*1000000) AS BIGINT)) AS BIGINT)/1000000.0 AS revenue "
        f"FROM read_parquet('{SF}/lineitem.parquet') WHERE l_orderkey IN "
        f"(SELECT o_orderkey FROM read_parquet('{SF}/orders.parquet') "
        "WHERE o_totalprice > 450000)"
    ).df()
    assert int(got["n_items"][0]) == int(want["n_items"][0])
    assert abs(float(got["revenue"][0]) - float(want["revenue"][0])) < 1e-9

    # bloom FP rate at this fill must stay near the theoretical rate
    orders = duckdb.sql(
        f"SELECT o_orderkey, o_totalprice FROM read_parquet('{SF}/orders.parquet')"
    ).df()
    keys = orders.loc[orders["o_totalprice"] > 450_000, "o_orderkey"].to_numpy()
    bits = np.zeros(_BLOOM_BITS, dtype=bool)
    bits[_bloom_positions(keys).ravel()] = True
    others = orders.loc[orders["o_totalprice"] <= 450_000, "o_orderkey"].to_numpy()
    pos = _bloom_positions(others)
    fp = np.ones(len(others), dtype=bool)
    for i in range(_BLOOM_K):
        fp &= bits[pos[i]]
    fill = bits.mean()
    theo = fill ** _BLOOM_K
    assert fp.mean() <= max(5 * theo, 0.01), (fp.mean(), theo)


@pytest.mark.usefixtures("ray_session")
def test_o5_exact_quantiles_refinement_path():
    """With cap far below n the histogram-refinement loop must narrow
    the range over multiple passes and still return the EXACT
    ceil(q*n)-th smallest (DuckDB quantile_disc semantics)."""
    import duckdb

    from ccrawler_ray.relational import o5_exact_quantiles

    sf = "/root/testdata/sf0.001"
    got = o5_exact_quantiles(sf, cap=20).sort_values("q").reset_index(drop=True)
    want = duckdb.sql(
        f"SELECT 0.5 AS q, quantile_disc(value, 0.5) AS value "
        f"FROM '{sf}/events.parquet' "
        f"UNION ALL SELECT 0.95, quantile_disc(value, 0.95) "
        f"FROM '{sf}/events.parquet' "
        f"UNION ALL SELECT 0.99, quantile_disc(value, 0.99) "
        f"FROM '{sf}/events.parquet'"
    ).df().sort_values("q").reset_index(drop=True)
    assert (got["value"].to_numpy() == want["value"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_o5_heavy_duplicate_value_never_pulls_unbounded(tmp_path):
    """A value repeated more often than cap collapses the refinement
    range onto itself; the quantile must come back exact with NO
    candidate pull of the duplicate mass."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ccrawler_ray.relational import o5_exact_quantiles

    vals = [7.5] * 5000 + list(np.linspace(100.0, 200.0, 100))
    pq.write_table(pa.table({"value": pa.array(vals, pa.float64())}),
                   tmp_path / "events.parquet")
    out = o5_exact_quantiles(str(tmp_path), quants=(0.5, 0.99), cap=50)
    got = dict(zip(out["q"], out["value"]))
    n = len(vals)
    s = sorted(vals)
    assert got[0.5] == s[int(np.ceil(0.5 * n)) - 1] == 7.5
    assert got[0.99] == s[int(np.ceil(0.99 * n)) - 1]


@pytest.mark.usefixtures("ray_session")
def test_o5_edge_aligned_duplicates_stay_exact(tmp_path):
    """Duplicate mass sitting exactly on a refinement bin edge belongs
    to the bin ABOVE the edge; the half-open range bookkeeping must
    keep ranks exact on both sides of it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ccrawler_ray.relational import o5_exact_quantiles

    # range [0, 1024] with 1024 bins puts edges on integers; pile
    # duplicates exactly on the inner edge 512.0
    vals = [0.0, 1024.0] + list(np.linspace(1.0, 511.0, 200)) + [512.0] * 3000 \
        + list(np.linspace(513.0, 1023.0, 200))
    pq.write_table(pa.table({"value": pa.array(vals, pa.float64())}),
                   tmp_path / "events.parquet")
    n = len(vals)
    s = sorted(vals)
    quants = (0.05, 0.5, 0.97)
    out = o5_exact_quantiles(str(tmp_path), quants=quants, cap=100)
    got = dict(zip(out["q"], out["value"]))
    for q in quants:
        assert got[q] == s[int(np.ceil(q * n)) - 1], q


@pytest.mark.usefixtures("ray_session")
def test_g11_countmin_one_sided_and_partition_independent():
    """CMS estimates never undercount, and elementwise-int merge means
    block partitioning cannot change the bits (engine ≡ serial even
    with tiny blocks)."""
    import collections

    import pyarrow.parquet as pq
    import ray.data

    from ccrawler_ray import serial_ref as SR
    from ccrawler_ray.functions.sketch import g11_countmin_est

    sf = "/root/testdata/sf0.001"
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024
    try:
        got = g11_countmin_est(sf).to_pandas()
    finally:
        ctx.target_max_block_size = old
    want = SR.g11_countmin_est(sf)
    assert (got["term"].to_numpy() == want["term"].to_numpy()).all()
    assert (got["est_n"].to_numpy() == want["est_n"].to_numpy()).all()
    t = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
    exact = collections.Counter(
        w for s in t.column("text").to_pylist() for w in s.split())
    for _, r in got.iterrows():
        assert r["est_n"] >= exact[r["term"]]
