"""Seeded randomized differential sweep: the round-2 window /
compaction / set-op kernels vs DuckDB on adversarial random event
tables — duplicate timestamps, single-event users, heavy key skew,
value ties — none of which the fixed conformance corpus exercises."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

QUERIES = ("w5_lag_lead", "w6_ntile", "w7_rolling_mean",
           "g14_group_median", "d5_latest_per_key", "s2_set_except")


def _random_events(rng: np.random.Generator, n: int, n_users: int,
                   tie_prob: float) -> pa.Table:
    uid = rng.integers(0, n_users, n)
    # skew: fold half the ids onto user 0
    uid[rng.random(n) < 0.3] = 0
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 3 * 86400 * 10**6, n).astype("timedelta64[us]")
    # inject exact-duplicate timestamps inside users (tie-break paths)
    dup = rng.random(n) < tie_prob
    ts[dup] = ts[0]
    val = np.round(rng.random(n) * 100, 2)
    val[rng.random(n) < tie_prob] = 42.0      # value ties for w6/g1
    et = rng.choice(["click", "purchase", "error", "view", "signup"], n)
    return pa.table({"event_id": pa.array(np.arange(n, dtype=np.int64)),
                     "ts": pa.array(ts),
                     "user_id": pa.array(uid.astype(np.int64)),
                     "event_type": pa.array(et.tolist(), pa.string()),
                     "value": pa.array(val),
                     "props": pa.array(['{"k": 1}'] * n, pa.string())})


@pytest.mark.usefixtures("ray_session")
def test_window_kernels_fuzz_vs_duckdb(tmp_path):
    import __ray_entry__ as E
    from tests.test_queries_oracle import _assert_frames_match, _to_pandas

    qs, sqls = E.queries(), E.oracle_sql()
    rng = np.random.default_rng(20260817)
    cases = [(1, 1, 0.0), (7, 3, 0.9), (200, 5, 0.3), (500, 40, 0.1)]
    for ci, (n, n_users, tie_prob) in enumerate(cases):
        d = tmp_path / f"case{ci}"
        d.mkdir()
        pq.write_table(_random_events(rng, n, n_users, tie_prob),
                       d / "events.parquet")
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
        for name in QUERIES:
            got = _to_pandas(qs[name](str(d)))
            want = con.sql(sqls[name]).df()
            _assert_frames_match(got, want, f"case{ci}:{name}")
