"""Resumable partitioned sink: partition-granular commit, skip-on-
resume, and content equality with a one-shot write."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


def _docs_ds():
    import ray.data

    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"])


@pytest.mark.usefixtures("ray_session")
def test_partitioned_write_resume_skips_committed(tmp_path):
    from ccrawler_ray.sinks.partitioned import (completed_partitions,
                                                read_partitioned,
                                                write_partitioned)

    # one-shot reference write
    ref_dir = tmp_path / "ref"
    s_ref = write_partitioned(_docs_ds(), ref_dir, "doc_id", num_partitions=8)
    assert sorted(s_ref["written"]) == list(range(8))
    ref = read_partitioned(ref_dir).to_pandas().sort_values("doc_id")

    # simulated failure: first run commits only partitions 0..3 (we
    # drop the other commit marks as a dead run would leave them)
    out_dir = tmp_path / "out"
    write_partitioned(_docs_ds(), out_dir, "doc_id", num_partitions=8)
    import shutil

    for p in range(4, 8):
        shutil.rmtree(out_dir / f"part={p}")
    assert sorted(completed_partitions(out_dir)) == [0, 1, 2, 3]
    mtimes_before = {
        p: (out_dir / f"part={p}" / "_PART_MANIFEST.json").stat().st_mtime_ns
        for p in range(4)
    }

    # resume: only the missing partitions are written
    s2 = write_partitioned(_docs_ds(), out_dir, "doc_id", num_partitions=8)
    assert sorted(s2["written"]) == [4, 5, 6, 7]
    assert sorted(s2["skipped"]) == [0, 1, 2, 3]
    for p in range(4):  # committed partitions untouched by the resume
        mt = (out_dir / f"part={p}" / "_PART_MANIFEST.json").stat().st_mtime_ns
        assert mt == mtimes_before[p]

    got = read_partitioned(out_dir).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  ref.reset_index(drop=True))
    # row accounting covers every partition
    assert sum(s2["rows"][str(p)] for p in range(8)) == len(ref)

    # idempotent: a third run writes nothing
    s3 = write_partitioned(_docs_ds(), out_dir, "doc_id", num_partitions=8)
    assert s3["written"] == [] and sorted(s3["skipped"]) == list(range(8))


@pytest.mark.usefixtures("ray_session")
def test_partition_assignment_deterministic():
    from ccrawler_ray.sinks.partitioned import partition_of

    keys = np.arange(1000)
    a = partition_of(keys, 16)
    b = partition_of(keys, 16)
    assert (a == b).all()
    # reasonably balanced: no partition more than 2x the mean
    counts = np.bincount(a, minlength=16)
    assert counts.max() <= 2 * counts.mean()


@pytest.mark.usefixtures("ray_session")
def test_jsonl_roundtrip_full_fidelity(tmp_path):
    """Every row and column survives documents -> JSONL -> documents
    (unicode text included), with the canonical schema restored."""
    import ray.data

    from ccrawler_ray.sources.jsonl import read_docs_jsonl, write_docs_jsonl

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    write_docs_jsonl(docs, str(tmp_path / "jl"))
    back = (read_docs_jsonl(str(tmp_path / "jl")).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    orig = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[orig.columns.tolist()], orig)


@pytest.mark.usefixtures("ray_session")
def test_csv_roundtrip_full_fidelity(tmp_path):
    """Every row and column survives documents -> CSV -> documents,
    including text the CSV format must quote (commas, double quotes,
    embedded newlines, unicode) and empty strings."""
    import pyarrow as pa
    import ray.data

    from ccrawler_ray.sources.csvio import read_docs_csv, write_docs_csv

    nasty = [
        'comma, separated, words',
        'a "quoted" phrase and ""doubled"" quotes',
        'line one\nline two\r\nline three',
        'unicode: naïve café 東京 🚀',
        '',                       # empty text cell must stay "", not null
        '  leading and trailing  ',
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(nasty)), type=pa.int64()),
        "text": pa.array(nasty, type=pa.string()),
        "lang": pa.array(["en"] * len(nasty)),
        "source": pa.array(["synthetic"] * len(nasty)),
        "n_chars": pa.array([len(s) for s in nasty], type=pa.int64()),
    })
    docs = ray.data.from_arrow(tbl)
    write_docs_csv(docs, str(tmp_path / "csv_nasty"))
    back = (read_docs_csv(str(tmp_path / "csv_nasty")).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    orig = tbl.to_pandas()
    pd.testing.assert_frame_equal(back[orig.columns.tolist()], orig)

    # and the real table round-trips too
    real = ray.data.read_parquet(f"{SF}/documents.parquet")
    write_docs_csv(real, str(tmp_path / "csv_real"))
    got = (read_docs_csv(str(tmp_path / "csv_real")).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = real.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
