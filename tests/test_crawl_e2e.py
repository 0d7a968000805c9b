"""End-to-end: Ray engine ≡ serial oracle (refsim) — the five oracle
properties of SURVEY.md §5.2 on the tiny and small fixtures."""

import numpy as np
import pytest

from ccrawler_ray.config import CrawlConfig
from ccrawler_ray.pipelines.crawl import CrawlEngine
from tests.refsim import corpus_to_dict, simulate

TINY_CFG = CrawlConfig(
    seeds=("http://h0.example/p0", "http://h1.example/p0"),
    max_generations=8,
    num_seen_shards=3,
    num_politeness_partitions=2,
)
SMALL_CFG = CrawlConfig(
    seeds=("http://h0.example/p0", "http://h1.example/p0", "http://h7.example/p3"),
    max_generations=12,
    num_seen_shards=4,
    num_politeness_partitions=3,
)


def assert_engine_matches_refsim(corpus_table, cfg, **engine_kwargs):
    sim = simulate(corpus_to_dict(corpus_table), cfg)
    eng = CrawlEngine(corpus_table, cfg, **engine_kwargs)
    try:
        res = eng.run()

        # 1. final URL-seen set equality
        eng_seen = dict(
            zip(res.seen.column("canon").to_pylist(), res.seen.column("first_key").to_pylist())
        )
        assert eng_seen == sim.seen

        # 2. crawl-order dump equality (sorted, with status + virtual ts)
        eng_dump = [
            (int(r.generation), r.host, int(r.queue_pos), r.ord_key, r.canon, int(r.status))
            for r in res.crawl_order.itertuples()
        ]
        assert eng_dump == sim.crawl_order

        # 3. span-sequence equality per fetched doc
        docs = res.docs_out.to_pandas()
        assert len(docs) == len(sim.docs_out)
        for row in docs.itertuples():
            want_spans, want_links, want_gen, want_key = sim.docs_out[row.doc_id]
            got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row.spans]
            want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in want_spans]
            assert got == want, row.doc_id
            assert tuple(row.outlinks) == want_links
            assert row.generation == want_gen and row.ord_key == want_key

        # 4. politeness: no (generation, host) exceeds its limit
        from ccrawler_ray.spec import host_admission_limit
        from tests.refsim import load_robots

        robots = load_robots(corpus_to_dict(corpus_table))
        per = res.crawl_order.groupby(["generation", "host"]).size()
        for (g, host), n in per.items():
            delay = robots.get(host, (0, ()))[0]
            assert n <= host_admission_limit(cfg.per_host_budget_per_generation, delay)

        # domain_state: totals match the dump
        dom = res.domain_state.to_pandas().set_index("host")
        dump_hosts = res.crawl_order.groupby("host").agg(
            n=("canon", "size"), ts=("fetch_ts_us", "max")
        )
        for host, r in dump_hosts.iterrows():
            assert dom.loc[host, "fetched_total"] == r["n"]
            assert dom.loc[host, "last_fetch_ts_us"] == r["ts"]

        assert res.generations_run == sim.generations_run
        return res, sim
    finally:
        eng.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_tiny_driver_path(tiny_corpus):
    assert_engine_matches_refsim(tiny_corpus, TINY_CFG)


@pytest.mark.usefixtures("ray_session")
def test_tiny_distributed_path(tiny_corpus):
    # driver_threshold=0 forces the distributed groupby(host,salt) path
    assert_engine_matches_refsim(tiny_corpus, TINY_CFG, driver_threshold=0)


@pytest.mark.usefixtures("ray_session")
def test_small_driver_path(small_corpus):
    assert_engine_matches_refsim(small_corpus, SMALL_CFG)


@pytest.mark.usefixtures("ray_session")
def test_tiny_actor_mode(tiny_corpus):
    import dataclasses

    cfg = dataclasses.replace(TINY_CFG, admission_mode="actor")
    assert_engine_matches_refsim(tiny_corpus, cfg)


@pytest.mark.usefixtures("ray_session")
def test_small_actor_mode(small_corpus):
    import dataclasses

    cfg = dataclasses.replace(SMALL_CFG, admission_mode="actor")
    assert_engine_matches_refsim(small_corpus, cfg)


@pytest.mark.usefixtures("ray_session")
def test_tiny_semi_join_fetch(tiny_corpus):
    # forced streaming semi-join fetch (the 100 TB path: the corpus
    # never passes through the driver) must equal the oracle exactly
    import dataclasses

    cfg = dataclasses.replace(TINY_CFG, fetch_mode="semi_join")
    assert_engine_matches_refsim(tiny_corpus, cfg)


@pytest.mark.usefixtures("ray_session")
def test_small_actor_mode_semi_join_fetch(small_corpus):
    import dataclasses

    cfg = dataclasses.replace(
        SMALL_CFG, admission_mode="actor", fetch_mode="semi_join"
    )
    assert_engine_matches_refsim(small_corpus, cfg)


@pytest.mark.usefixtures("ray_session")
def test_small_distributed_path_salted(small_corpus):
    # hot_host_threshold=2 forces salting on nearly every host; the
    # salted admission must equal the unsalted oracle exactly.
    # (6 generations: the distributed path has fixed per-generation
    # Dataset-op overhead; correctness is fully exercised by gen 6)
    import dataclasses

    cfg = dataclasses.replace(
        SMALL_CFG, hot_host_threshold=2, salt_factor=4, max_generations=6
    )
    assert_engine_matches_refsim(small_corpus, cfg, driver_threshold=0)
