"""Mid-scale engine ≡ refsim equality: 100 Zipf hosts / 20k pages,
actor-resident frontier, budgets and crawl-delays binding — the
closest in-suite approximation of the bench regime."""

import pytest

from ccrawler_ray.config import CrawlConfig
from tests.test_crawl_e2e import assert_engine_matches_refsim


@pytest.fixture(scope="module")
def mid_corpus():
    from tests.gen_corpus import generate_corpus

    return generate_corpus(num_hosts=100, total_pages=20_000,
                           link_prob=0.5, links_per_embed=2)


@pytest.mark.usefixtures("ray_session")
def test_midscale_actor_mode(mid_corpus):
    import dataclasses

    cfg = CrawlConfig(
        seeds=tuple(f"http://h{i}.example/p0" for i in range(10)),
        max_depth=12,
        per_host_budget_per_generation=50,
        global_budget_per_generation=2_000,
        max_generations=6,
        num_seen_shards=4,
        num_politeness_partitions=3,
        admission_mode="actor",
    )
    res, sim = assert_engine_matches_refsim(mid_corpus, cfg)
    # the run must be non-trivial: thousands of fetches, budgets binding
    assert len(sim.crawl_order) > 3_000
    assert any(k[1] == "admission" and k[2] == "deferred" and v > 0
               for k, v in sim.metrics.items())
