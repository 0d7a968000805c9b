"""Golden regression pinning (SURVEY.md §5.4): the tiny fixture's
crawl-order dump and seen-set hash are committed constants. Any change
to the frozen spec (canonicalizer, priority, extraction, admission,
ord keys) shows up here first — on the serial oracle, no Ray needed."""

import hashlib

from ccrawler_ray.config import CrawlConfig
from tests.gen_corpus import generate_corpus
from tests.refsim import corpus_to_dict, simulate

CFG = CrawlConfig(
    seeds=("http://h0.example/p0", "http://h1.example/p0"),
    max_generations=8,
)

# regenerate with: python -m tests.test_golden
GOLDEN_SEEN_COUNT = 35
GOLDEN_FETCHES = 28
GOLDEN_ORDER_SHA = "5f6d608cf4ec864b36f800815b00405bbdfb8cccb2714e8600b1f24f0918db6c"
GOLDEN_SEEN_SHA = "8cad101f37a67adde1bb3e48a70efa6b072f3e8977945d9b952bc8f963d973c6"


def _hashes():
    res = simulate(corpus_to_dict(generate_corpus(5, 50)), CFG)
    order_blob = "\n".join(
        f"{g}|{h}|{q}|{k}|{c}|{s}" for g, h, q, k, c, s in res.crawl_order
    ).encode()
    seen_blob = "\n".join(
        f"{c}|{k}" for c, k in sorted(res.seen.items())
    ).encode()
    return (
        len(res.seen),
        len(res.crawl_order),
        hashlib.sha256(order_blob).hexdigest(),
        hashlib.sha256(seen_blob).hexdigest(),
    )


def test_golden_crawl_order_and_seen_set():
    n_seen, n_fetch, order_sha, seen_sha = _hashes()
    assert n_seen == GOLDEN_SEEN_COUNT
    assert n_fetch == GOLDEN_FETCHES
    assert order_sha == GOLDEN_ORDER_SHA, "crawl-order spec drifted"
    assert seen_sha == GOLDEN_SEEN_SHA, "seen-set spec drifted"


if __name__ == "__main__":
    n_seen, n_fetch, order_sha, seen_sha = _hashes()
    print(f"GOLDEN_SEEN_COUNT = {n_seen}")
    print(f"GOLDEN_FETCHES = {n_fetch}")
    print(f'GOLDEN_ORDER_SHA = "{order_sha}"')
    print(f'GOLDEN_SEEN_SHA = "{seen_sha}"')
