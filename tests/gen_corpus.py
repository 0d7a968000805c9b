"""Deterministic interleaved-docs corpus generator (FIXTURES.md §1).

A pseudo-web graph over hosts ``h{i}.example`` with Zipf page-count
skew, pages of interleaved text/media spans, ~20% of text spans
embedding ``href:<url>`` outlink tokens, per-host robots.txt docs.
One ``random.Random(seed)`` stream; generation order fixed by
(host index, page index) → byte-reproducible output.

Usable as a library (tests) and a script (bench fixture writer).
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from ccrawler_ray.spec import DOCS_SCHEMA

WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo"
).split()


def _zipf_counts(num_hosts: int, total_pages: int, rng: random.Random, a: float = 1.2):
    weights = np.array([1.0 / (i + 1) ** a for i in range(num_hosts)])
    weights /= weights.sum()
    counts = np.maximum(1, np.round(weights * total_pages).astype(int))
    return counts.tolist()


def generate_corpus(
    num_hosts: int,
    total_pages: int,
    seed: int = 42,
    link_prob: float = 0.35,
    links_per_embed: int = 1,
    words_lo: int = 4,
    words_hi: int = 12,
    _sink=None,
    _flush_rows: int = 200_000,
) -> pa.Table | None:
    """Generate the docs corpus table (doc_id, spans) per FIXTURES.md §1.

    The bench fixture uses heavier pages (words_lo/hi larger, more
    links) — real web pages are 10–100 KB; the default sizes are for
    fast unit fixtures.

    ``_sink``: optional callback receiving table chunks (memory-bounded
    streaming for the 30x+ fixtures — the RNG stream and row ORDER are
    identical to the in-memory path; only batching changes). When set,
    returns None."""
    rng = random.Random(seed)
    counts = _zipf_counts(num_hosts, total_pages, rng)
    # page universe first so links can point at real pages
    pages = [
        (f"http://h{i}.example/p{j}" if rng.random() > 0.10 else f"http://h{i}.example/private/p{j}")
        for i in range(num_hosts)
        for j in range(counts[i])
    ]
    page_set_by_host: list[list[str]] = []
    k = 0
    for i in range(num_hosts):
        page_set_by_host.append(pages[k : k + counts[i]])
        k += counts[i]

    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []

    def alias(url: str) -> str:
        """Non-canonical alias of a URL (exercises the canonicalizer)."""
        r = rng.random()
        if r < 0.25:
            scheme, rest = url.split("://", 1)
            host, path = rest.split("/", 1)
            return f"{scheme}://{host.upper()}/{path}"
        if r < 0.5:
            return url + "#frag"
        if r < 0.75:
            return url + "/"
        return url + "?utm_source=x"

    for i in range(num_hosts):
        # robots doc, one per host
        d = rng.randint(0, 3)
        doc_ids.append(f"http://h{i}.example/robots.txt")
        spans_col.append(
            [{"kind": "text", "text": f"crawl-delay: {d}\ndisallow: /private", "media_ref": "", "offset": 0}]
        )
        own = page_set_by_host[i]
        for j, page in enumerate(own):
            n_spans = rng.randint(3, 12)
            spans: list[dict] = []
            off = 0
            for _ in range(n_spans):
                if rng.random() < 0.75:
                    words = [rng.choice(WORDS) for _ in range(rng.randint(words_lo, words_hi))]
                    if rng.random() < link_prob:
                        for _k in range(links_per_embed):
                            # embed an outlink token
                            r = rng.random()
                            if r < 0.30:
                                tgt_host = rng.randrange(num_hosts)  # cross-host
                                tgt = rng.choice(page_set_by_host[tgt_host])
                            elif r < 0.35:
                                tgt = f"http://h{rng.randrange(num_hosts)}.example/missing{rng.randrange(10**6)}"  # dangling
                            else:
                                tgt = rng.choice(own)
                            if rng.random() < 0.5:
                                tgt = alias(tgt)
                            pos = rng.randrange(len(words) + 1)
                            words.insert(pos, f"href:{tgt}")
                    text = " ".join(words)
                    spans.append({"kind": "text", "text": text, "media_ref": "", "offset": off})
                    off += len(text) + 1
                else:
                    ref = f"http://h{rng.randrange(num_hosts)}.example/img{rng.randrange(10**4)}.jpg"
                    spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": off})
                    off += 64
            doc_ids.append(page)
            spans_col.append(spans)
        if _sink is not None and len(doc_ids) >= _flush_rows:
            _sink(pa.Table.from_pydict(
                {"doc_id": doc_ids, "spans": spans_col}, schema=DOCS_SCHEMA))
            doc_ids.clear()
            spans_col.clear()

    if _sink is not None:
        if doc_ids:
            _sink(pa.Table.from_pydict(
                {"doc_id": doc_ids, "spans": spans_col}, schema=DOCS_SCHEMA))
        return None
    return pa.Table.from_pydict({"doc_id": doc_ids, "spans": spans_col}, schema=DOCS_SCHEMA)


SIZES = {
    "tiny": dict(num_hosts=5, total_pages=50),
    "small": dict(num_hosts=50, total_pages=2_000),
    # bench: realistic page weight (~900 words/page) + dense linking
    "bench": dict(num_hosts=500, total_pages=200_000, link_prob=0.6,
                  links_per_embed=2, words_lo=60, words_hi=180),
    # 10x scale rehearsal (VERDICT r3 #5): same shape, 10x the pages
    "bench10x": dict(num_hosts=5_000, total_pages=2_000_000, link_prob=0.6,
                     links_per_embed=2, words_lo=60, words_hi=180),
    # 30x RAM-edge rehearsal (VERDICT r4 next #3)
    "bench30x": dict(num_hosts=15_000, total_pages=6_000_000, link_prob=0.6,
                     links_per_embed=2, words_lo=60, words_hi=180),
}


def write_corpus(name: str, out_path: str, seed: int = 42) -> str:
    import pyarrow.parquet as pq

    # bounded row groups: a multi-GB nested (list<struct>) column in one
    # row group exceeds Arrow's 2GB chunk limit and becomes UNREADABLE
    # ("Nested data conversions not implemented for chunked array
    # outputs") — hit by the 2M-page bench10x corpus, round 4
    kw = SIZES[name]
    if kw["total_pages"] > 2_500_000:
        # streamed write: the in-memory path would hold every python
        # span dict at once (tens of GB at 6M pages). Same RNG stream,
        # same row order — only the batching differs.
        writer: list[pq.ParquetWriter | None] = [None]

        def sink(chunk: pa.Table) -> None:
            if writer[0] is None:
                writer[0] = pq.ParquetWriter(out_path, chunk.schema)
            writer[0].write_table(chunk, row_group_size=50_000)

        generate_corpus(seed=seed, _sink=sink, **kw)
        if writer[0] is not None:
            writer[0].close()
        return out_path
    table = generate_corpus(seed=seed, **kw)
    pq.write_table(table, out_path, row_group_size=50_000)
    return out_path


if __name__ == "__main__":
    import sys

    name = sys.argv[1] if len(sys.argv) > 1 else "small"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/corpus_{name}.parquet"
    print(write_corpus(name, out))
