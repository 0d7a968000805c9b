"""Distributed admission at web-scale HOST CARDINALITY (VERDICT r2 #3).

The distributed path must not key a Ray groupby on the raw host —
live-host count is unbounded at web scale and the measured lore says
Ray's groupby collapses at high key cardinality. Both admission
shuffles now fan out over hash(host) % coarse_k groups and rank the
real (host, salt) keys inside the group fn; this pins the result
equality of the distributed path against the driver fast path on a
50 k-host frontier (hot hosts included, so the skew salting and the
coarse grouping compose).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ccrawler_ray.config import CrawlConfig
from ccrawler_ray.spec import FRONTIER_SCHEMA, hash64_batch


def _big_frontier(num_hosts: int, n_rows: int, num_hot: int,
                  hot_rows_each: int, seed: int = 11) -> pa.Table:
    rng = np.random.default_rng(seed)
    host_ids = rng.integers(0, num_hosts, size=n_rows)
    # hot hosts: a handful of ids get a large burst appended
    hot_ids = np.arange(num_hot)
    host_ids = np.concatenate(
        [host_ids, np.repeat(hot_ids, hot_rows_each)])
    n = len(host_ids)
    hosts = np.char.add(
        np.char.add("h", host_ids.astype(str)), ".example")
    canons = np.array(
        [f"http://{h}/p{i}" for i, h in enumerate(hosts)], dtype=object)
    df = pd.DataFrame({
        "url": canons,
        "canon": canons,
        "url_hash": hash64_batch(list(canons)),
        "host": hosts,
        "parent": "",
        "depth": np.zeros(n, dtype=np.int32),
        "priority": rng.random(n),
        "ord_key": [f"{k:06d}.{i:07d}"
                    for i, k in enumerate(rng.integers(0, 10**6, size=n))],
        "generation": np.zeros(n, dtype=np.int32),
        "retries": np.zeros(n, dtype=np.int32),
    })
    return pa.Table.from_pandas(df, preserve_index=False).cast(FRONTIER_SCHEMA)


@pytest.mark.usefixtures("ray_session")
def test_distributed_admission_50k_hosts(tiny_corpus):
    import ray.data

    from ccrawler_ray.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(
        seeds=("http://h0.example/p0",),
        per_host_budget_per_generation=2,
        global_budget_per_generation=40_000,
        hot_host_threshold=200,
        salt_factor=4,
        max_generations=1,
    )
    eng = CrawlEngine(tiny_corpus, cfg)
    try:
        frontier = _big_frontier(num_hosts=50_000, n_rows=60_000,
                                 num_hot=3, hot_rows_each=1_500)
        frontier_ds = ray.data.from_arrow(
            [frontier.slice(o, 8192) for o in range(0, frontier.num_rows, 8192)])

        adm_d, def_d = eng._admit_distributed(frontier_ds, 0)
        adm_s, def_s = eng._admit_driver(frontier, 0)

        got = adm_d.select_columns(["canon", "queue_pos"]).to_pandas()
        want = adm_s.select_columns(["canon", "queue_pos"]).to_pandas()
        assert len(got) == len(want)
        assert (set(zip(got["canon"], got["queue_pos"].astype(int)))
                == set(zip(want["canon"], want["queue_pos"].astype(int))))
        assert (sorted(def_d.select_columns(["canon"]).to_pandas()["canon"])
                == sorted(def_s.select_columns(["canon"]).to_pandas()["canon"]))
    finally:
        eng.shutdown()
