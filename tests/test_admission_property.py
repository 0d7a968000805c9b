"""Property tests for the pure admission math and the canonicalizer
(SURVEY.md §5.4): seeded-random frontiers, admission ≡ a trivially
correct reimplementation; canonicalize idempotence over fuzzed URLs."""

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ccrawler_ray.pipelines.admission import admit_table_driver, canon_path
from ccrawler_ray.spec import (
    FRONTIER_SCHEMA,
    canonicalize,
    canonicalize_batch,
    hash64_batch,
    host_admission_limit,
    robots_allows,
)


def _random_frontier(rng: random.Random, n: int, num_hosts: int) -> pa.Table:
    hosts = [f"h{rng.randrange(num_hosts)}.example" for _ in range(n)]
    canons = [f"http://{h}/p{i}" if rng.random() > 0.1 else f"http://{h}/private/p{i}"
              for i, h in enumerate(hosts)]
    keys = [f"{rng.randrange(10**6):06d}.{i:04d}" for i in range(n)]
    df = pd.DataFrame(
        {
            "url": canons,
            "canon": canons,
            "url_hash": hash64_batch(canons),
            "host": hosts,
            "parent": "",
            "depth": np.array([rng.randrange(5) for _ in range(n)], dtype=np.int32),
            "priority": np.array([rng.random() for _ in range(n)]),
            "ord_key": keys,
            "generation": np.zeros(n, dtype=np.int32),
            "retries": np.zeros(n, dtype=np.int32),
        }
    )
    return pa.Table.from_pandas(df, preserve_index=False).cast(FRONTIER_SCHEMA)


def _naive_admission(table, robots, budget, global_budget):
    """Trivially-correct reimplementation (per-host heaps, no pandas)."""
    rows = table.to_pylist()
    eligible = []
    for r in rows:
        delay, disallow = robots.get(r["host"], (0, ()))
        if disallow and not robots_allows(canon_path(r["canon"]), disallow):
            continue
        eligible.append(r)
    by_host = {}
    for r in eligible:
        by_host.setdefault(r["host"], []).append(r)
    admitted, deferred = [], []
    for host, rs in by_host.items():
        delay = robots.get(host, (0, ()))[0]
        limit = host_admission_limit(budget, delay)
        rs.sort(key=lambda r: (-r["priority"], r["ord_key"]))
        for pos, r in enumerate(rs):
            if pos < limit:
                admitted.append((r["canon"], pos, r["priority"], r["ord_key"]))
            else:
                deferred.append(r["canon"])
    admitted.sort(key=lambda t: (-t[2], t[3]))
    cut = admitted[global_budget:]
    admitted = admitted[:global_budget]
    deferred.extend(c for c, *_ in cut)
    return {(c, p) for c, p, *_ in admitted}, sorted(deferred)


@pytest.mark.parametrize("seed", [1, 2, 3, 7])
def test_admission_matches_naive(seed):
    rng = random.Random(seed)
    table = _random_frontier(rng, n=500, num_hosts=12)
    robots = {f"h{i}.example": (i % 4, ("/private",) if i % 2 else ()) for i in range(12)}
    budget, K = 6, 30
    adm, deferred, _denied = admit_table_driver(table, robots, budget, K)
    got = {(c, int(p)) for c, p in zip(adm["canon"], adm["queue_pos"])}
    want_adm, want_def = _naive_admission(table, robots, budget, K)
    assert got == want_adm
    assert sorted(deferred["canon"]) == want_def


def test_canonicalize_idempotent_fuzz():
    rng = random.Random(99)
    parts = ["http://", "https://", "HTTP://", "ftp://", ""]
    hosts = ["A.Example", "h0.example", "h0.example.", "h0.example:80", "h0.example:8080"]
    paths = ["", "/", "/p1", "/a/../b", "/a/./b/", "/p1/", "/P1"]
    tails = ["", "#f", "?utm_source=1", "?b=2&a=1", "?a=1&utm_x=2#z"]
    urls = [
        rng.choice(parts) + rng.choice(hosts) + rng.choice(paths) + rng.choice(tails)
        for _ in range(2000)
    ]
    for u in urls:
        c = canonicalize(u)
        if c is not None:
            assert canonicalize(c) == c, (u, c)
    assert canonicalize_batch(urls) == [canonicalize(u) for u in urls]


def test_hypothesis_canonicalize_if_available():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=120))
    def prop(s):
        c = canonicalize(s)
        if c is not None:
            assert canonicalize(c) == c

    prop()
