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
           "g14_group_median", "d5_latest_per_key", "s2_set_except",
           "w8_late_events", "j9_full_outer_join", "w9_percent_rank",
           "w10_funnel")


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
        # small random customer side for the full-outer join (keys
        # overlapping, customer-only, and events-only by construction)
        nc = int(rng.integers(1, 20))
        pq.write_table(
            pa.table({"c_custkey": pa.array(
                rng.permutation(50)[:nc].astype(np.int64)),
                "c_acctbal": pa.array(
                    np.round(rng.random(nc) * 1000, 2))}),
            d / "customer.parquet")
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
        con.sql(
            f"CREATE VIEW customer AS SELECT * FROM '{d}/customer.parquet'")
        for name in QUERIES:
            got = _to_pandas(qs[name](str(d)))
            want = con.sql(sqls[name]).df()
            _assert_frames_match(got, want, f"case{ci}:{name}")


DOC_QUERIES = ("m2_filter_validate", "m9_content_hash",
               "m10_normalize_text", "o7_wordcount_topk", "o8_hash_split",
               "g10_pivot", "token_count", "token_count_bpe",
               "quality_score", "pii_scrub", "model_score_docs",
               "g16_heavy_hitters", "g17_string_agg", "g18_unpivot",
               "media_dedup_exact")


def _random_docs(rng: np.random.Generator, n: int) -> pa.Table:
    vocab = (["Join", "HASH", "row", "batch", "Scan", "vector", "spark",
              "fast", "模型", "数据", "a1", "42", "x-y", "Fast",
              # PII and near-miss tokens for the scrub kernel
              "bob@x.io", "a.b+c@corp.example.com", "555-123-4567",
              "10.0.0.1", "999.999.999.999", "12.34", "a@b", "1-2-3"]
             + [f"w{i}" for i in range(20)])
    texts = []
    for _ in range(n):
        k = int(rng.integers(1, 60))
        texts.append(" ".join(rng.choice(vocab, k)))
    langs = rng.choice(["en", "de", "zh"], n)
    srcs = rng.choice(["s0", "s1", "s2"], n)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs.tolist(), pa.string()),
        "source": pa.array(srcs.tolist(), pa.string()),
        "n_chars": pa.array(np.fromiter((len(t) for t in texts),
                                        dtype=np.int64, count=n))})


@pytest.mark.usefixtures("ray_session")
def test_document_kernels_fuzz_vs_duckdb(tmp_path):
    """Random documents within the corpus contract (non-empty,
    single-space tokens; mixed case / CJK / digits / punctuation,
    heavy term ties for the top-k tie-break)."""
    import __ray_entry__ as E
    from tests.test_queries_oracle import _assert_frames_match, _to_pandas

    qs, sqls = E.queries(), E.oracle_sql()
    rng = np.random.default_rng(42)
    for ci, n in enumerate((1, 37, 300)):
        d = tmp_path / f"docs{ci}"
        d.mkdir()
        pq.write_table(_random_docs(rng, n), d / "documents.parquet")
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
        for name in DOC_QUERIES:
            got = _to_pandas(qs[name](str(d)))
            want = con.sql(sqls[name]).df()
            _assert_frames_match(got, want, f"docs{ci}:{name}")


@pytest.mark.usefixtures("ray_session")
def test_serial_mirror_kernels_fuzz(tmp_path):
    """Random-document differential for the serial-mirrored text/mix
    kernels: engine vs the Ray-free serial_ref recomputation must be
    bitwise equal on corpora the conformance tables never exercise
    (single doc, repeated-phrase docs, unicode, heavy dup sources)."""
    from ccrawler_ray import serial_ref as SR
    from ccrawler_ray.functions.text import repetition_stats
    from ccrawler_ray.pipelines.mix import mix_interleave
    from tests.test_queries_oracle import _assert_frames_match, _to_pandas

    rng = np.random.default_rng(7)
    for ci, n in enumerate((1, 23, 400)):
        d = tmp_path / f"rdocs{ci}"
        d.mkdir()
        t = _random_docs(rng, n)
        # inject pathological repetition into a slice of the docs
        txt = t.column("text").to_pylist()
        for i in range(0, len(txt), 5):
            txt[i] = ("p q r s t " * 4).strip()
        t = t.set_column(1, "text", pa.array(txt, pa.string()))
        pq.write_table(t, d / "documents.parquet")
        got = _to_pandas(repetition_stats(str(d)))
        want = SR.repetition_stats(str(d))
        _assert_frames_match(got, want, f"rdocs{ci}:repetition_stats")
        got = _to_pandas(mix_interleave(str(d)))
        want = SR.mix_interleave(str(d))
        _assert_frames_match(got, want, f"rdocs{ci}:mix_interleave")


@pytest.mark.usefixtures("ray_session")
def test_new_ops_fuzz(tmp_path):
    """Continuation-session operators on adversarial random corpora:
    SQL-oracled ops vs DuckDB, serial-mirrored ops vs serial_ref
    (bitwise). Covers single-doc corpora, repeated phrases, unicode,
    and (for EWMA) duplicate timestamps + single-event users."""
    import __ray_entry__ as E
    from ccrawler_ray import serial_ref as SR
    from ccrawler_ray.functions.dedup import dedup_incremental
    from ccrawler_ray.functions.multimodal import media_dedup_near
    from ccrawler_ray.functions.spans import spans_line_dedup, spans_rollup
    from ccrawler_ray.functions.text import lm_perplexity
    from ccrawler_ray.relational import w11_ewma
    from tests.test_queries_oracle import _assert_frames_match, _to_pandas

    qs, sqls = E.queries(), E.oracle_sql()
    rng = np.random.default_rng(20260818)
    # --- documents side
    for ci, n in enumerate((1, 29, 250)):
        d = tmp_path / f"ndocs{ci}"
        d.mkdir()
        t = _random_docs(rng, n)
        txt = t.column("text").to_pylist()
        for i in range(0, len(txt), 7):   # near-dup runs for the LSH probes
            txt[i] = ("p q r s t " * 4).strip()
        t = t.set_column(1, "text", pa.array(txt, pa.string()))
        pq.write_table(t, d / "documents.parquet")
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
        # SQL-oracled: packing + both IO round trips (unique /tmp key
        # per sf_dir, so tmp cases never collide)
        for name in ("o10_pack_sequences", "io_csv_roundtrip",
                     "io_partitioned_roundtrip", "io_jsonl_roundtrip",
                     "io_ipc_roundtrip"):
            got = _to_pandas(qs[name](str(d)))
            want = con.sql(sqls[name]).df()
            _assert_frames_match(got, want, f"ndocs{ci}:{name}")
        # serial-mirrored (bitwise)
        for name, eng, ref in (
            ("lm_perplexity", lm_perplexity, SR.lm_perplexity),
            ("dedup_incremental", dedup_incremental, SR.dedup_incremental),
            ("media_dedup_near", media_dedup_near, SR.media_dedup_near),
            ("spans_rollup", spans_rollup, SR.spans_rollup),
            ("spans_line_dedup", spans_line_dedup, SR.spans_line_dedup),
        ):
            got = _to_pandas(eng(str(d)))
            want = ref(str(d))
            _assert_frames_match(got, want, f"ndocs{ci}:{name}")
    # --- events side: EWMA over ties/skew/single-event users
    for ci, (n, n_users, tie_prob) in enumerate(
            [(1, 1, 0.0), (11, 3, 0.9), (400, 25, 0.2)]):
        d = tmp_path / f"nev{ci}"
        d.mkdir()
        pq.write_table(_random_events(rng, n, n_users, tie_prob),
                       d / "events.parquet")
        got = _to_pandas(w11_ewma(str(d)))
        want = SR.w11_ewma(str(d))
        _assert_frames_match(got, want, f"nev{ci}:w11_ewma")
