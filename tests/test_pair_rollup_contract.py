"""Sink-or-rollup result contract for pair-stream queries (VERDICT r4
what's-wrong #2 / next #2): `dedup_minhash_lsh` / `dedup_lsh_verified`
write their pair streams through the partition-committed sink and
return a bounded per-doc rollup — the pair stream never crosses the
driver. The rollup is computed FROM the artifact read-back, so these
checks cover sink + rollup end-to-end."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("doc_id").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", ["dedup_minhash_lsh", "dedup_lsh_verified"])
def test_rollup_matches_serial_mirror(name):
    from ccrawler_ray import serial_ref as SR
    from ccrawler_ray.functions import dedup as D

    eng = _sorted(getattr(D, name)(SF, threshold=0.8).to_pandas())
    ref = _sorted(getattr(SR, f"{name}_rollup")(SF, threshold=0.8))
    pd.testing.assert_frame_equal(eng, ref.astype(eng.dtypes.to_dict()))


@pytest.mark.usefixtures("ray_session")
def test_artifact_committed_and_rerun_skips():
    from ccrawler_ray.functions.dedup import (
        _pairs_artifact_dir,
        dedup_minhash_lsh,
        lsh_pair_stream,
    )
    from ccrawler_ray.sinks.partitioned import (
        completed_partitions,
        write_partitioned,
    )

    first = dedup_minhash_lsh(SF, threshold=0.8).to_pandas()
    out = _pairs_artifact_dir(SF, "lsh_est", (64, 16, 0.8))
    done = completed_partitions(out)
    assert len(done) == 16, "every partition must be committed"
    n_pairs_written = sum(m["rows"] for m in done.values())
    # the artifact holds the PAIR stream (each pair touches 2 docs)
    assert n_pairs_written * 2 == first["n_pairs"].sum()
    # a rerun must skip every committed partition (the resume contract)
    again = write_partitioned(lsh_pair_stream(SF, threshold=0.8), out,
                              key_col="doc_a", num_partitions=16)
    assert again["written"] == []
    assert sorted(again["skipped"]) == sorted(done)
    # and the query itself is idempotent
    second = dedup_minhash_lsh(SF, threshold=0.8).to_pandas()
    pd.testing.assert_frame_equal(
        first.sort_values("doc_id").reset_index(drop=True),
        second.sort_values("doc_id").reset_index(drop=True))
