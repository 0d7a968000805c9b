"""Fetch-path parity (M6/A5/J1): the actor-pool form, the
process-cached function form, and the broadcast semi-join scale path
must produce identical results; bloom cardinality estimate (G5)."""

import numpy as np
import pyarrow as pa
import pytest


def _admitted_batch(corpus, n=50):
    ids = [d for d in corpus.column("doc_id").to_pylist() if "robots" not in d][:n]
    ids += ["http://h0.example/missing1", "http://h1.example/missing2"]  # 404s
    m = len(ids)
    return pa.table(
        {
            "canon": pa.array(ids),
            "host": pa.array([c.split("://")[1].split("/")[0] for c in ids]),
            "queue_pos": pa.array(np.arange(m, dtype=np.int32)),
            "fetch_generation": pa.array(np.full(m, 2, dtype=np.int32)),
            "ord_key": pa.array([f"{i:06d}" for i in range(m)]),
            "depth": pa.array(np.zeros(m, dtype=np.int32)),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_fetch_actor_pool_and_semi_join_agree(tiny_corpus):
    import ray
    import ray.data

    from ccrawler_ray.stages.fetch import FetchActor, fetch_via_semi_join, prepare_fetch_data

    fetch_ref = prepare_fetch_data(tiny_corpus)
    delays = {"h0.example": 1}
    delays_ref = ray.put(delays)
    batch = _admitted_batch(tiny_corpus)

    # 1. direct call (process-cached fn path uses this object)
    direct = FetchActor(fetch_ref, delays_ref)(batch)

    # 2. actor-pool form through map_batches (A5)
    ds = ray.data.from_arrow(batch)
    pooled = ds.map_batches(
        FetchActor,
        batch_format="pyarrow",
        concurrency=2,
        batch_size=16,
        fn_constructor_args=(fetch_ref, delays_ref),
    ).to_pandas().sort_values("ord_key").reset_index(drop=True)

    want = direct.to_pandas().sort_values("ord_key").reset_index(drop=True)
    assert pooled["canon"].tolist() == want["canon"].tolist()
    assert pooled["status"].tolist() == want["status"].tolist()
    assert pooled["fetch_ts_us"].tolist() == want["fetch_ts_us"].tolist()

    # 3. broadcast semi-join scale path: 200s must match exactly
    corpus_ds = ray.data.from_arrow(tiny_corpus)
    adm = batch.append_column("priority", pa.array(np.zeros(batch.num_rows)))
    hits_ds, _ = fetch_via_semi_join(corpus_ds, adm, delays)
    hits = hits_ds.to_pandas().sort_values("ord_key").reset_index(drop=True)
    want200 = want[want["status"] == 200].reset_index(drop=True)
    assert hits["canon"].tolist() == want200["canon"].tolist()
    assert hits["fetch_ts_us"].tolist() == want200["fetch_ts_us"].tolist()
    # span sequences identical
    for a, b in zip(hits["spans"], want200["spans"]):
        assert [tuple(s.values()) for s in a] == [tuple(s.values()) for s in b]
    # 404s are exactly the admitted minus the hits
    assert set(want[want["status"] == 404]["canon"]) == {
        "http://h0.example/missing1", "http://h1.example/missing2"
    }


@pytest.mark.usefixtures("ray_session")
def test_bloom_cardinality_estimate():
    import ray

    from ccrawler_ray.spec import hash64_batch
    from ccrawler_ray.state.seen import SeenPool

    pool = SeenPool(num_shards=4, capacity_per_shard=50_000)
    try:
        n = 20_000
        canons = [f"http://h{i % 97}.example/p{i}" for i in range(n)]
        hashes = hash64_batch(canons)
        sid = hashes % np.uint64(4)
        for s in range(4):
            idx = np.nonzero(sid == s)[0]
            ray.get(pool.shards[s].check_and_add.remote(
                hashes[idx], [canons[i] for i in idx],
                [f"{i:06d}" for i in idx]))
        est = pool.estimated_cardinality()
        assert 0.9 * n < est < 1.1 * n, est
    finally:
        pool.kill()


@pytest.mark.usefixtures("ray_session")
def test_semi_join_no_hit_block(tiny_corpus):
    """A corpus block with ZERO admitted hits must yield a typed empty
    block, not crash (pa.table({}, schema=...) raises on a non-empty
    schema — hit by the 10x rehearsal, where admitted << corpus and
    most streamed blocks have no hits)."""
    import ray.data

    from ccrawler_ray.stages.fetch import fetch_via_semi_join

    batch = _admitted_batch(tiny_corpus, n=3)
    # split corpus so at least the tail blocks carry no admitted docs
    blocks = [tiny_corpus.slice(o, 4) for o in range(0, tiny_corpus.num_rows, 4)]
    ds = ray.data.from_arrow(blocks)
    hits, _ = fetch_via_semi_join(ds, batch, {})
    got = hits.to_pandas()
    assert set(got["canon"]) == {
        c for c in batch.column("canon").to_pylist() if "missing" not in c
    }
