"""Driver-conformance: every queries() entry runs at sf0.001 and, when
an oracle_sql() entry exists, matches DuckDB exactly (row count, column
names, sorted values) — mirroring the driver's CORRECTNESS gate."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        df = result.to_pandas()
        if df.shape[1] == 0:
            schema = result.schema()
            if schema is not None:
                df = pd.DataFrame(columns=schema.names)
        return df
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_frames_match(got: pd.DataFrame, want: pd.DataFrame, name: str):
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _norm(got), _norm(want)
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]):
            ok = np.isclose(g[c].to_numpy(), w[c].to_numpy(), rtol=0, atol=1e-9, equal_nan=True)
            assert ok.all(), f"{name}.{c}: {int((~ok).sum())} value mismatches"
        else:
            # NaT == NaT is False in numpy; treat aligned nulls as equal
            same = (g[c].to_numpy() == w[c].to_numpy()) | (
                g[c].isna().to_numpy() & w[c].isna().to_numpy()
            )
            assert same.all(), f"{name}.{c}: {int((~same).sum())} value mismatches"


@pytest.mark.usefixtures("ray_session")
def test_all_queries_run_and_match_oracle(monkeypatch):
    import __ray_entry__ as E

    # serial differential oracles must compute at THIS test's scale
    monkeypatch.setenv("GRAFT_ORACLE_SF_DIR", SF_DIR)
    qs = E.queries()
    sqls = E.oracle_sql()
    unknown = set(sqls) - set(qs)
    assert not unknown, f"oracle_sql names without queries: {unknown}"
    failures = []
    for name, fn in qs.items():
        if name == "crawl_docs_out":
            continue  # covered (more strongly) by the e2e refsim tests
        try:
            got = _to_pandas(fn(SF_DIR))
            assert got is not None and len(got) >= 0
            if name in sqls:
                want = _duck(sqls[name])
                _assert_frames_match(got, want, name)
            else:
                assert len(got.columns) > 0, f"{name}: empty schema"
        except Exception as e:  # noqa: BLE001 - collect all failures
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    import __ray_entry__ as E

    ds = E.entry()
    df = _to_pandas(ds)
    assert len(df) > 0
    assert {"doc_id", "url", "spans", "outlinks", "generation", "ord_key"} <= set(df.columns)
