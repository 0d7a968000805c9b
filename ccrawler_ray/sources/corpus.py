"""Corpus sources (S1/S2): interleaved-docs readers and adapters.

``corpus_from_documents`` deterministically lifts the conformance
``documents`` parquet (doc_id:int64, text) into the engine's
interleaved span corpus (DOCS_SCHEMA) with a synthetic link graph, so
the flagship ``entry()`` pipeline can run the real crawl engine over
driver-provided testdata.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ccrawler_ray.spec import DOCS_SCHEMA

NUM_HOSTS = 23


def _url(doc_id: int) -> str:
    return f"http://h{doc_id % NUM_HOSTS}.example/p{doc_id}"


def corpus_from_documents(documents_path: str, links_per_doc: int = 3) -> pa.Table:
    """documents.parquet → interleaved corpus table (deterministic).

    Per doc: text split into ~3 sentence spans, one media span, and
    ``links_per_doc`` href tokens pointing at (doc_id*7 + 13*k) % N —
    a deterministic expander graph so a seeded crawl fans out.
    Per-host robots docs are appended (crawl-delay from host index).
    """
    t = pq.read_table(documents_path, columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    texts = t.column("text").to_pylist()
    n = len(ids)
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    for host in range(NUM_HOSTS):
        doc_ids.append(f"http://h{host}.example/robots.txt")
        spans_col.append(
            [{"kind": "text", "text": f"crawl-delay: {host % 3}\ndisallow: /private",
              "media_ref": "", "offset": 0}]
        )
    for i in range(n):
        did = int(ids[i])
        words = texts[i].split()
        third = max(1, len(words) // 3)
        chunks = [" ".join(words[j : j + third]) for j in range(0, len(words), third)]
        spans: list[dict] = []
        off = 0
        for ci, chunk in enumerate(chunks[:3]):
            if ci == 1:
                for k in range(links_per_doc):
                    tgt = (did * 7 + 13 * (k + 1)) % n
                    chunk += f" href:{_url(int(ids[tgt]))}"
            spans.append({"kind": "text", "text": chunk, "media_ref": "", "offset": off})
            off += len(chunk) + 1
        spans.append(
            {"kind": "media", "text": "",
             "media_ref": f"http://h{did % NUM_HOSTS}.example/img{did}.jpg", "offset": off}
        )
        doc_ids.append(_url(did))
        spans_col.append(spans)
    return pa.Table.from_pydict({"doc_id": doc_ids, "spans": spans_col}, schema=DOCS_SCHEMA)


def default_seeds(num: int = 4) -> tuple[str, ...]:
    return tuple(_url(i) for i in range(num))
