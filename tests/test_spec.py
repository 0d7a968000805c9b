"""Unit tests for the frozen spec (SURVEY.md §5.4: M1 table-driven
canonicalizer cases, M5 scorer, hashing, extraction, robots)."""

import numpy as np
import pytest

from ccrawler_ray import spec


CANON_CASES = [
    # (input, expected)
    ("http://h0.example/p1", "http://h0.example/p1"),
    ("HTTP://H0.Example/p1", "http://h0.example/p1"),
    ("http://h0.example/p1#frag", "http://h0.example/p1"),
    ("http://h0.example/p1/", "http://h0.example/p1"),
    ("http://h0.example:80/p1", "http://h0.example/p1"),
    ("https://h0.example:443/p1", "https://h0.example/p1"),
    ("https://h0.example:8443/p1", "https://h0.example:8443/p1"),
    ("http://h0.example", "http://h0.example/"),
    ("http://h0.example/", "http://h0.example/"),
    ("http://h0.example/a/../b", "http://h0.example/b"),
    ("http://h0.example/a/./b", "http://h0.example/a/b"),
    ("http://h0.example/p?utm_source=x", "http://h0.example/p"),
    ("http://h0.example/p?b=2&a=1", "http://h0.example/p?a=1&b=2"),
    ("http://h0.example/p?b=2&utm_c=z&a=1", "http://h0.example/p?a=1&b=2"),
    ("http://h0.example./p", "http://h0.example/p"),
    ("  http://h0.example/p  ", "http://h0.example/p"),
    ("ftp://h0.example/p", None),
    ("mailto:x@y.z", None),
    ("not a url", None),
    ("", None),
    ("http://" + "x" * 3000 + ".example/", None),
    # malformed port must reject, not raise (ADVICE r1, spec.py port fix)
    ("http://h0.example:abc/x", None),
    ("http://h0.example:99999999999999999999/x", None),  # port out of range
    # IPv6 hosts re-bracket so the canonical form re-parses (ADVICE r1)
    ("http://[::1]/x", "http://[::1]/x"),
    ("http://[2001:DB8::1]:8080/a/../b", "http://[2001:db8::1]:8080/b"),
    ("http://[::1]:80/x", "http://[::1]/x"),
]


@pytest.mark.parametrize("url,expected", CANON_CASES)
def test_canonicalize_cases(url, expected):
    assert spec.canonicalize(url) == expected


def test_canonicalize_idempotent():
    for url, expected in CANON_CASES:
        c = spec.canonicalize(url)
        if c is not None:
            assert spec.canonicalize(c) == c


def test_canonicalize_batch_matches_scalar():
    urls = [u for u, _ in CANON_CASES]
    assert spec.canonicalize_batch(urls) == [spec.canonicalize(u) for u in urls]


def test_hash64_batch_matches_scalar():
    vals = ["a", "b", "http://h0.example/p1", ""]
    batch = spec.hash64_batch(vals)
    for i, v in enumerate(vals):
        assert batch[i] == spec.hash64(v)
    assert batch.dtype == np.uint64


def test_is_crawlable():
    assert spec.is_crawlable("http://h.example/p")
    assert not spec.is_crawlable(None)
    assert not spec.is_crawlable("http://h.example/img.jpg")
    assert not spec.is_crawlable("http://h.example/robots.txt")
    assert not spec.is_crawlable("http://h.example/style.CSS")


def test_url_host():
    assert spec.url_host("http://h.example/p") == "h.example"
    assert spec.url_host("http://h.example:8080/p") == "h.example"
    assert spec.url_host("http://h.example/") == "h.example"
    assert spec.url_host("http://[::1]/p") == "[::1]"
    assert spec.url_host("http://[2001:db8::1]:8080/p") == "[2001:db8::1]"


def test_fast_path_agrees_with_scalar_on_length_boundary():
    # boundary-length URLs: batch (fast) path and scalar path must agree
    base = "http://h0.example/"
    for pad in (spec.MAX_URL_LEN - len(base), spec.MAX_URL_LEN - len(base) + 1):
        u = base + "a" * pad
        assert spec.canonicalize_batch([u]) == [spec.canonicalize(u)]
    long_u = base + "a" * spec.MAX_URL_LEN
    assert not spec.is_fast_canonical(long_u)
    assert spec.canonicalize(long_u) is None


def test_priority_monotone_in_depth():
    p0 = spec.priority_score(0, "h.example", False)
    p1 = spec.priority_score(1, "h.example", False)
    assert p0 > p1
    assert spec.priority_score(0, "h.example", True) > p0


def test_ord_keys_sort_by_lineage():
    s0, s1 = spec.seed_ord_key(0), spec.seed_ord_key(1)
    c0 = spec.child_ord_key(s0, 0)
    c5 = spec.child_ord_key(s0, 5)
    assert s0 < c0 < c5 < s1


def test_extract_outlinks():
    kinds = ["text", "media", "text"]
    texts = ["see href:http://a.example/x now", "", "no links here"]
    refs = ["", "http://b.example/i.jpg", ""]
    assert spec.extract_outlinks_from_spans(kinds, texts, refs) == [
        "http://a.example/x",
        "http://b.example/i.jpg",
    ]


def test_validate_spans():
    assert spec.validate_spans(["text", "media"], [0, 5])
    assert not spec.validate_spans(["text", "text"], [5, 5])
    assert not spec.validate_spans(["weird"], [0])


def test_parse_robots():
    d, dis = spec.parse_robots("crawl-delay: 3\ndisallow: /private")
    assert d == 3 and dis == ("/private",)
    assert spec.robots_allows("/public/x", dis)
    assert not spec.robots_allows("/private/x", dis)


def test_host_admission_limit():
    assert spec.host_admission_limit(4, 0) == 4
    assert spec.host_admission_limit(4, 1) == 2
    assert spec.host_admission_limit(4, 3) == 1
    assert spec.host_admission_limit(4, 100) == 1


def test_content_hash_order_sensitive():
    a = spec.span_content_hash(["text", "media"], ["x", ""], ["", "r"])
    b = spec.span_content_hash(["media", "text"], ["", "x"], ["r", ""])
    assert a != b


def test_transient_fail_mask_matches_scalar_spec():
    """The vectorized engine mask must agree with the frozen scalar
    spec for rates whose rate*1e6 is NOT exactly representable
    (regression: int truncation forked engine vs spec on boundary
    draws)."""
    import numpy as np

    from ccrawler_ray.spec import fetch_fails_transiently
    from ccrawler_ray.stages.fetch import _transient_fail_mask

    rate = 0.1  # 0.1 * 1e6 == 100000.00000000001
    canons = [f"http://h{i}.example/p{i%97}" for i in range(50_000)]
    retries = np.zeros(len(canons), dtype=np.int32)
    mask = _transient_fail_mask(canons, retries, rate)
    scalar = np.array([fetch_fails_transiently(c, 0, rate) for c in canons])
    assert (mask == scalar).all()
