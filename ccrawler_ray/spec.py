"""Frozen engine spec: pure functions + Arrow schemas.

Everything here is deterministic, Ray-free, and shared verbatim by the
engine (Ray Data pipelines) and the serial oracle ``tests/refsim.py`` —
the spec cannot fork between the two (SURVEY.md §5.2).

Reference provenance: the reference mount is empty (SURVEY.md §0.1);
the semantics below implement the components named by BASELINE.json
(URL dedup cache, crawl-priority scorer, domain politeness scheduler,
fetch→parse→extract over interleaved text+media spans) with rules
frozen in FIXTURES.md. Reference locus to fill when the mount is
populated: URL-normalize util (M1), URL filter util (M2), priority
scorer (M5), extract handler (M8), robots handling (A3).
"""

from __future__ import annotations

import functools
import hashlib
import re
from urllib.parse import urlsplit, urlunsplit

import numpy as np
import pyarrow as pa

# --------------------------------------------------------------------------
# Arrow schemas (SURVEY.md §1.2)
# --------------------------------------------------------------------------

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),       # "text" | "media"
        ("text", pa.string()),       # non-empty iff kind == "text"
        ("media_ref", pa.string()),  # non-empty iff kind == "media"
        ("offset", pa.int32()),      # strictly increasing within a row
    ]
)

# input corpus table — fixed by BASELINE.json:input_hint
DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),        # as discovered (pre-canonical)
        ("canon", pa.string()),      # canonical form (M1)
        ("url_hash", pa.uint64()),   # hash64(canon) — seen-shard / dedup key
        ("host", pa.string()),       # politeness key
        ("parent", pa.string()),     # canon URL of discovering page ("" for seeds)
        ("depth", pa.int32()),
        ("priority", pa.float64()),
        ("ord_key", pa.string()),    # deterministic discovery-order key (total order)
        ("generation", pa.int32()),  # generation the URL entered the frontier
        ("retries", pa.int32()),
    ]
)

SEEN_SCHEMA = pa.schema(
    [
        ("url_hash", pa.uint64()),
        ("canon", pa.string()),
        ("shard", pa.uint16()),
        ("first_key", pa.string()),  # ord_key of first discovery
    ]
)

FETCHED_SCHEMA = pa.schema(
    [
        ("canon", pa.string()),
        ("host", pa.string()),
        ("status", pa.int32()),      # 200 | 404 | 599 (transient, retryable)
        ("spans", pa.list_(SPAN_STRUCT)),
        ("generation", pa.int32()),
        ("queue_pos", pa.int32()),
        ("ord_key", pa.string()),
        ("depth", pa.int32()),
        ("fetch_ts_us", pa.int64()),  # virtual clock (deterministic)
        ("retries", pa.int32()),      # attempt number of THIS fetch
    ]
)

STATUS_TRANSIENT = 599


def fetch_fails_transiently(canon: str, retries: int, failure_rate: float) -> bool:
    """Deterministic transient-failure injection for the simulated
    fetch: fails iff hash64(canon#retries) falls below the rate — so a
    retry (retries+1) redraws, and a given attempt is reproducible."""
    if failure_rate <= 0.0:
        return False
    return (hash64(f"{canon}#{retries}", seed=1299) % 1_000_000) < failure_rate * 1_000_000

DOCS_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("url", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("outlinks", pa.list_(pa.string())),
        ("generation", pa.int32()),
        ("ord_key", pa.string()),
    ]
)

DOMAIN_STATE_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("robots_txt", pa.string()),
        ("crawl_delay", pa.int32()),          # virtual units
        ("last_fetch_ts_us", pa.int64()),
        ("heartbeat_generation", pa.int32()),
        ("fetched_total", pa.int64()),
    ]
)

METRICS_SCHEMA = pa.schema(
    [
        ("generation", pa.int32()),
        ("partition", pa.int32()),
        ("stage", pa.string()),
        ("counter", pa.string()),
        ("value", pa.int64()),
    ]
)

# --------------------------------------------------------------------------
# Hashing — deterministic across processes and sessions
# --------------------------------------------------------------------------

HASH_SEED = 42


def as_single_array(col) -> pa.Array:
    """Table column (ChunkedArray or Array) → one contiguous Array."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # older pyarrow returns ChunkedArray
            col = col.chunk(0) if col.num_chunks else pa.array([], type=col.type)
    return col


def hash64(value: str, seed: int = HASH_SEED) -> int:
    """Stable 64-bit hash of a string (blake2b-derived, seeded).

    Scalar reference implementation; the vectorized batch path is
    :func:`hash64_batch`. Both must agree exactly (tested).
    """
    h = hashlib.blake2b(value.encode("utf-8"), digest_size=8, key=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def hash64_batch(values, seed: int = HASH_SEED) -> np.ndarray:
    """Vectorized-ish stable hash of a sequence of strings → uint64 array.

    blake2b per element (C-speed per call); cached scalar fn keeps
    repeated URLs (common in link graphs) cheap.
    """
    key = seed.to_bytes(8, "little")
    dig = hashlib.blake2b
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(dig(v.encode("utf-8"), digest_size=8, key=key).digest(), "little")
    return out


@functools.lru_cache(maxsize=262_144)
def host_prior(host: str) -> float:
    """Deterministic per-host prior in [0, 1) used by the priority scorer."""
    return (hash64(host, seed=7) % 10_000) / 10_000.0


# --------------------------------------------------------------------------
# M1: URL canonicalizer — THE ordering-critical function; spec frozen here
# --------------------------------------------------------------------------

MAX_URL_LEN = 2048

# query params dropped during canonicalization (tracking params)
_TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "ref_src")

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# fast path: already-canonical URLs need no per-URL python work.
# The host may not end in '.'; '/.'-containing and '/'-terminated URLs
# are sent to the slow path (over-exclusion is safe; the slow path is
# the authority).
FAST_CANONICAL_RE = re.compile(
    r"^http://[a-z0-9](?:[a-z0-9.\-]*[a-z0-9])?/[a-zA-Z0-9/_.\-]*$"
)


def is_fast_canonical(url: str) -> bool:
    # MAX_URL_LEN guard must match the scalar slow path: without it a
    # regex-canonical but over-long URL would pass through the batch
    # path while canonicalize() returns None — a spec fork (ADVICE r1).
    return (
        len(url) <= MAX_URL_LEN
        and FAST_CANONICAL_RE.match(url) is not None
        and "/." not in url
        and not url.endswith("/")
    )


def _drop_param(param: str) -> bool:
    name = param.split("=", 1)[0]
    return name.startswith("utm_") or name in _TRACKING_PARAMS


def _resolve_dots(path: str) -> str:
    """Resolve '.' and '..' segments (RFC 3986 §5.2.4)."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    resolved = "/".join(out)
    if not resolved.startswith("/"):
        resolved = "/" + resolved
    return resolved


@functools.lru_cache(maxsize=262_144)
def canonicalize(url: str) -> str | None:
    """Canonicalize a URL. Returns None for unusable URLs.

    Frozen rules (SURVEY.md M1):
      - strip surrounding whitespace; reject > MAX_URL_LEN chars
      - scheme must be http/https (lowercased); reject others
      - host lowercased; strip trailing dot; strip default port
      - drop fragment
      - resolve '.' / '..' path segments; empty path → '/'
      - drop tracking query params (utm_*, fbclid, gclid, msclkid,
        ref_src); sort surviving params by name; drop empty query
      - strip ONE trailing slash on non-root paths
    """
    url = url.strip()
    if not url or len(url) > MAX_URL_LEN:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    try:
        host = parts.hostname
        port = parts.port  # raises ValueError on a malformed port
    except ValueError:
        return None
    if not host:
        return None
    host = host.lower().rstrip(".")
    if ":" in host:
        # urlsplit strips IPv6 brackets; re-bracket so the canonical
        # form re-parses (idempotency) and url_host() stays correct
        host = f"[{host}]"
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS[scheme]:
        netloc = f"{host}:{port}"
    path = _resolve_dots(parts.path or "/")
    if path != "/" and path.endswith("/"):
        path = path[:-1]
    query = ""
    if parts.query:
        kept = sorted(p for p in parts.query.split("&") if p and not _drop_param(p))
        query = "&".join(kept)
    return urlunsplit((scheme, netloc, path, query, ""))


def canonicalize_batch(urls) -> list[str | None]:
    """Batch canonicalizer: vectorized fast-path detection + cached scalar
    slow path. The fast path (regex-canonical URLs, the overwhelming
    majority in a well-formed corpus) is returned as-is.
    """
    fast = is_fast_canonical
    canon = canonicalize
    return [u if fast(u) else canon(u) for u in urls]


# --------------------------------------------------------------------------
# M2: URL validator / crawlability filter
# --------------------------------------------------------------------------

# suffixes that are assets, never crawled as pages
UNCRAWLABLE_SUFFIXES = (
    ".css", ".js", ".jpg", ".jpeg", ".png", ".gif", ".ico", ".svg", ".webp",
    ".mp3", ".mp4", ".avi", ".mov", ".wav", ".pdf", ".zip", ".gz", ".tar",
    ".exe", ".dmg", ".woff", ".woff2", ".ttf",
)


def is_crawlable(canon: str | None) -> bool:
    """M2: keep only canonical http(s) page URLs (drop assets & robots)."""
    if canon is None:
        return False
    path = canon.split("://", 1)[1]
    slash = path.find("/")
    path = path[slash:] if slash >= 0 else "/"
    low = path.lower()
    if low.endswith(UNCRAWLABLE_SUFFIXES):
        return False
    if low == "/robots.txt":
        return False
    return True


def url_host(canon: str) -> str:
    """M3: canonical URL → host (politeness key). Canon has lowercase host."""
    rest = canon.split("://", 1)[1]
    slash = rest.find("/")
    netloc = rest[:slash] if slash >= 0 else rest
    if netloc.startswith("["):  # bracketed IPv6 literal, maybe :port
        return netloc[: netloc.index("]") + 1]
    return netloc.rsplit(":", 1)[0] if ":" in netloc else netloc


# --------------------------------------------------------------------------
# M5: crawl-priority scorer (reconstructed formula, frozen as engine spec)
# --------------------------------------------------------------------------

W_DEPTH = 1.0
W_HOST = 0.1
W_SEED = 10.0


def priority_score(depth: int, host: str, is_seed: bool) -> float:
    """priority = W_DEPTH/(1+depth) + W_HOST·host_prior(host) + W_SEED·is_seed."""
    return W_DEPTH / (1.0 + depth) + W_HOST * host_prior(host) + (W_SEED if is_seed else 0.0)


# --------------------------------------------------------------------------
# Discovery-order keys (SURVEY.md §3.4) — deterministic total order
# --------------------------------------------------------------------------


def seed_ord_key(seed_index: int) -> str:
    return f"{seed_index:06d}"


def child_ord_key(parent_key: str, link_index: int) -> str:
    """Child's discovery key: parent key + zero-padded link index.

    Lexicographic order over ord_key == (parent discovery order,
    link position) — independent of task scheduling.
    """
    return f"{parent_key}.{link_index:04d}"


# --------------------------------------------------------------------------
# M8: extractor — outlink discovery from interleaved spans
# --------------------------------------------------------------------------

# frozen extraction rule (FIXTURES.md §1): whitespace-delimited tokens
# starting with 'href:' inside text spans are outlinks.
HREF_RE = re.compile(r"href:(\S+)")


def extract_outlinks_from_spans(kinds, texts, media_refs) -> list[str]:
    """Ordered outlinks of one document given its parallel span arrays.

    Text spans contribute href: tokens (in order); media spans
    contribute their media_ref (asset link, M2 filters these later).
    Order = span order then within-span token order.
    """
    links: list[str] = []
    for kind, text, ref in zip(kinds, texts, media_refs):
        if kind == "text":
            if "href:" in text:
                links.extend(HREF_RE.findall(text))
        elif kind == "media":
            if ref:
                links.append(ref)
    return links


def validate_spans(kinds, offsets) -> bool:
    """M7: parse/validate — non-null kinds, strictly increasing offsets."""
    prev = -1
    for kind, off in zip(kinds, offsets):
        if kind not in ("text", "media"):
            return False
        if off <= prev:
            return False
        prev = off
    return True


# --------------------------------------------------------------------------
# A2/A3: robots + politeness (virtual-clock deterministic)
# --------------------------------------------------------------------------

_CRAWL_DELAY_RE = re.compile(r"crawl-delay:\s*(\d+)", re.I)
_DISALLOW_RE = re.compile(r"disallow:\s*(\S+)", re.I)


def parse_robots(text: str) -> tuple[int, tuple[str, ...]]:
    """robots.txt body → (crawl_delay, disallow path prefixes)."""
    delay = 0
    m = _CRAWL_DELAY_RE.search(text)
    if m:
        delay = int(m.group(1))
    disallow = tuple(_DISALLOW_RE.findall(text))
    return delay, disallow


def robots_allows(path: str, disallow: tuple[str, ...]) -> bool:
    return not any(path.startswith(d) for d in disallow)


def host_admission_limit(per_host_budget: int, crawl_delay: int) -> int:
    """Max fetches for a host in one generation window.

    The generation window is per_host_budget virtual time units wide; a
    crawl-delay of d stretches each fetch to (1+d) units:
    limit = max(1, budget // (1 + delay)).
    """
    return max(1, per_host_budget // (1 + crawl_delay))


def fetch_virtual_ts_us(generation: int, crawl_delay: int, queue_pos: int) -> int:
    """Deterministic virtual-clock timestamp of an admitted fetch."""
    return generation * 1_000_000 + queue_pos * (1 + crawl_delay) * 1_000


# --------------------------------------------------------------------------
# M9: content hash (content-level dedup key)
# --------------------------------------------------------------------------


def span_content_hash(kinds, texts, media_refs) -> int:
    """Stable content hash of a span sequence (order-sensitive)."""
    h = hashlib.blake2b(digest_size=8, key=b"content0")
    for kind, text, ref in zip(kinds, texts, media_refs):
        h.update(kind.encode())
        h.update(b"\x00")
        h.update((text or "").encode())
        h.update(b"\x00")
        h.update((ref or "").encode())
        h.update(b"\x01")
    return int.from_bytes(h.digest(), "little")
