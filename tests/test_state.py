"""Unit tests for the stateful pools: seen shards (A1) and the bloom
filter (FP rate sane, no false negatives), politeness partitions."""

import numpy as np
import pyarrow as pa
import pytest

from ccrawler_ray.spec import hash64_batch


def test_bloom_no_false_negatives_and_fp_rate():
    from ccrawler_ray.state.seen import _Bloom

    rng = np.random.default_rng(42)
    keys = rng.integers(0, 2**63, size=20_000, dtype=np.uint64)
    inserted, probes = keys[:10_000], keys[10_000:]
    b = _Bloom(capacity=10_000)
    b.add(inserted)
    assert b.might_contain(inserted).all(), "bloom false negative"
    fp = b.might_contain(probes).mean()
    assert fp < 0.05, f"bloom FP rate too high: {fp}"


@pytest.mark.usefixtures("ray_session")
def test_seen_pool_first_wins_and_dump_restore():
    import ray

    from ccrawler_ray.state.seen import SeenPool

    pool = SeenPool(num_shards=3, capacity_per_shard=1000)
    try:
        canons = [f"http://h{i}.example/p{i}" for i in range(50)]
        hashes = hash64_batch(canons)
        keys = [f"{i:06d}" for i in range(50)]
        sid = hashes % np.uint64(3)
        # first insert: everything fresh
        for s in range(3):
            idx = np.nonzero(sid == s)[0]
            fresh = ray.get(pool.shards[s].check_and_add.remote(
                hashes[idx], [canons[i] for i in idx], [keys[i] for i in idx]))
            assert fresh.all()
        # second insert with DIFFERENT keys: nothing fresh
        for s in range(3):
            idx = np.nonzero(sid == s)[0]
            fresh = ray.get(pool.shards[s].check_and_add.remote(
                hashes[idx], [canons[i] for i in idx], ["zzz"] * len(idx)))
            assert not fresh.any()
        # re-check with the SAME keys (simulated task retry): idempotent
        idx = np.nonzero(sid == 0)[0]
        fresh = ray.get(pool.shards[0].check_and_add.remote(
            hashes[idx], [canons[i] for i in idx], [keys[i] for i in idx]))
        assert fresh.all()

        dump = pa.concat_tables(pool.dump_tables())
        assert dump.num_rows == 50
        assert pool.total_size() == 50

        # restore into a pool with a DIFFERENT shard count
        pool2 = SeenPool(num_shards=5, capacity_per_shard=1000)
        try:
            pool2.restore_from_table(dump)
            assert pool2.total_size() == 50
            sid5 = hashes % np.uint64(5)
            idx = np.nonzero(sid5 == 2)[0]
            fresh = ray.get(pool2.shards[2].check_and_add.remote(
                hashes[idx], [canons[i] for i in idx], ["new"] * len(idx)))
            assert not fresh.any()
        finally:
            pool2.kill()
    finally:
        pool.kill()


@pytest.mark.usefixtures("ray_session")
def test_politeness_partition_budget_validation():
    import ray

    from ccrawler_ray.state.politeness import PolitenessPool, host_partition

    robots = {"slow.example": (3, ("/private",)), "fast.example": (0, ())}
    robots_ref = ray.put(robots)
    pool = PolitenessPool(2, robots_ref)
    try:
        # budget 4, delay 3 → limit 1; 2 fetches is a violation
        v = pool.record_admission({"slow.example": (2, 5000)}, 0, 4)
        assert v == 1
        v = pool.record_admission({"fast.example": (4, 9000), "slow.example": (1, 1000)}, 1, 4)
        assert v == 0
        dump = pa.concat_tables(pool.dump_tables()).to_pandas().set_index("host")
        assert dump.loc["fast.example", "fetched_total"] == 4
        assert dump.loc["slow.example", "fetched_total"] == 3
        assert dump.loc["slow.example", "last_fetch_ts_us"] == 5000
    finally:
        pool.kill()


def test_politeness_dump_retains_robots_txt_standalone():
    """The domain_state dump must carry the raw robots.txt body, and a
    pool restored ONLY from the dump (no corpus pass, no robots map)
    must re-derive the parsed rules from it."""
    import ray

    from ccrawler_ray.state.politeness import PolitenessPool

    raw = "crawl-delay: 3\ndisallow: /private"
    robots = {"slow.example": (3, ("/private",))}
    pool = PolitenessPool(2, ray.put(robots), ray.put({"slow.example": raw}))
    try:
        pool.record_admission({"slow.example": (1, 1000)}, 0, 4)
        dump = pa.concat_tables(pool.dump_tables())
    finally:
        pool.kill()
    df = dump.to_pandas().set_index("host")
    assert df.loc["slow.example", "robots_txt"] == raw

    pool2 = PolitenessPool(3, None, None)  # different P, NO robots input
    try:
        pool2.restore_from_table(dump)
        # budget 4, delay 3 (re-parsed from the dumped raw text) →
        # limit 1; 2 fetches must register as a violation again
        v = pool2.record_admission({"slow.example": (2, 9000)}, 1, 4)
        assert v == 1
        dump2 = pa.concat_tables(pool2.dump_tables()).to_pandas().set_index("host")
        assert dump2.loc["slow.example", "robots_txt"] == raw
        assert dump2.loc["slow.example", "fetched_total"] == 3
    finally:
        pool2.kill()


def test_cuckoo_membership_fp_rate_and_delete():
    """Cuckoo filter half of the bloom/cuckoo scale path: no false
    negatives, FP rate in the 16-bit-fingerprint ballpark, and —
    unlike the bloom — deletion retracts membership."""
    from ccrawler_ray.state.seen import _Cuckoo

    rng = np.random.default_rng(7)
    present = rng.integers(1, 1 << 63, 20_000, dtype=np.int64).astype(np.uint64)
    absent = rng.integers(1, 1 << 63, 20_000, dtype=np.int64).astype(np.uint64)
    absent = np.setdiff1d(absent, present)
    c = _Cuckoo(capacity=20_000)
    c.add(present)
    assert c.might_contain(present).all(), "false negative"
    fp = c.might_contain(absent).mean()
    # 2 buckets x 4 slots x 2^-16 per probe ~ 1.2e-4; allow slack
    assert fp < 0.01, f"cuckoo FP rate too high: {fp:.4f}"
    assert 0.3 < c.fill_ratio() < 0.95

    # deletion: remove half, they must stop matching (minus FP noise)
    drop = present[:10_000]
    removed = c.remove(drop)
    assert removed.all()
    still = c.might_contain(drop).mean()
    assert still < 0.01, f"deleted keys still present: {still:.4f}"
    # the other half is untouched
    assert c.might_contain(present[10_000:]).all()


def test_seen_shard_cuckoo_mode_equivalent():
    """SeenShard(membership='cuckoo') gives identical first-wins
    answers (the exact dict is authoritative; the filter is the
    approximate probe)."""
    import ray

    from ccrawler_ray.state.seen import SeenShard

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=2, include_dashboard=False,
                 logging_level="ERROR", ignore_reinit_error=True)
    sh = SeenShard.remote(0, capacity=1000, membership="cuckoo")
    h = hash64_batch(["http://a/1", "http://a/2", "http://a/1"])
    fresh = ray.get(sh.check_and_add.remote(
        h, ["http://a/1", "http://a/2", "http://a/1"], ["k1", "k2", "k3"]))
    assert fresh.tolist() == [True, True, False]
    probe = ray.get(sh.might_contain.remote(h))
    assert probe.all()  # no false negatives through the actor surface
