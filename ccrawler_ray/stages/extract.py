"""Extract stage (M7 parse/validate + M8 span/outlink extraction).

Input: fetched rows (FETCHED_SCHEMA). Output: docs_out rows
(DOCS_OUT_SCHEMA) — span sequences are IDENTITY-PRESERVED (the
BASELINE.json per-row invariant: equality on (kind, text, media_ref,
order)), outlinks derived per the frozen rule (spec.HREF_RE over text
spans + media_ref of media spans, in span order).

Vectorization: spans are processed FLATTENED (one pass over the list
column's values array, never a per-row rebuild); href tokens are
extracted with polars ``str.extract_all`` over the flattened text
values (Rust regex, no Python loop); per-doc outlink lists are rebuilt
from the list offsets with numpy. A pure-Python fallback mirrors
``spec.extract_outlinks_from_spans`` exactly (equality is unit-tested).

The children explode (M4 depth increment + ord_key assignment) is a
separate tiny stage over docs_out (:func:`explode_children`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ccrawler_ray.spec import DOCS_OUT_SCHEMA, as_single_array

try:
    import polars as pl

    _HAVE_POLARS = True
except ImportError:  # pragma: no cover
    _HAVE_POLARS = False


def _links_per_span(kinds: pa.Array, texts: pa.Array, refs: pa.Array) -> list[list[str]]:
    """Ordered outlinks contributed by each (flattened) span."""
    n = len(kinds)
    if _HAVE_POLARS and n:
        k = pl.Series("k", kinds, dtype=pl.Utf8)
        t = pl.Series("t", texts, dtype=pl.Utf8)
        r = pl.Series("r", refs, dtype=pl.Utf8)
        df = pl.DataFrame([k, t, r]).with_columns(
            hrefs=pl.when(pl.col("k") == "text")
            .then(pl.col("t").str.extract_all(r"href:\S+").list.eval(pl.element().str.slice(5)))
            .when((pl.col("k") == "media") & (pl.col("r") != ""))
            .then(pl.concat_list(pl.col("r")))
            .otherwise(pl.lit([], dtype=pl.List(pl.Utf8)))
        )
        return df.get_column("hrefs").to_list()
    # fallback: spec-identical python path
    from ccrawler_ray.spec import HREF_RE

    out = []
    for kind, text, ref in zip(kinds.to_pylist(), texts.to_pylist(), refs.to_pylist()):
        if kind == "text" and "href:" in text:
            out.append(HREF_RE.findall(text))
        elif kind == "media" and ref:
            out.append([ref])
        else:
            out.append([])
    return out


def extract_docs(batch: pa.Table) -> pa.Table:
    """FETCHED rows → DOCS_OUT rows (200s only; 404s produce nothing)."""
    batch = batch.filter(pc.equal(batch.column("status"), 200))
    if batch.num_rows == 0:
        return pa.table(
            {name: [] for name in DOCS_OUT_SCHEMA.names}, schema=DOCS_OUT_SCHEMA
        )
    spans = as_single_array(batch.column("spans"))
    flat = spans.flatten()  # struct array of all spans, row order preserved
    kinds = flat.field("kind")
    texts = flat.field("text")
    refs = flat.field("media_ref")
    per_span = _links_per_span(kinds, texts, refs)

    # regroup span-level link lists into per-doc ordered lists via offsets
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    outlinks: list[list[str]] = []
    for i in range(batch.num_rows):
        row_links: list[str] = []
        for j in range(offsets[i], offsets[i + 1]):
            if per_span[j]:
                row_links.extend(per_span[j])
        outlinks.append(row_links)

    return pa.Table.from_arrays(
        [
            batch.column("canon"),
            batch.column("canon"),
            batch.column("spans"),
            pa.array(outlinks, type=pa.list_(pa.string())),
            batch.column("generation"),
            batch.column("ord_key"),
        ],
        schema=DOCS_OUT_SCHEMA,
    )


# audit columns preserved by the fused (single-execution) crawl chain
# ("canon" duplicates doc_id so the dump projection needs no rename;
# depth/retries let the transient-retry requeue read the same blocks)
AUDIT_COLS = ["canon", "status", "host", "queue_pos", "fetch_ts_us",
              "depth", "retries"]
DOCS_AUDIT_COLS = [*DOCS_OUT_SCHEMA.names, *AUDIT_COLS]


def extract_docs_audit(batch: pa.Table) -> pa.Table:
    """FETCHED rows → DOCS_OUT columns + the crawl-order audit columns,
    for ALL rows (non-200 rows keep empty spans/outlinks). Lets the
    actor-mode engine fuse fetch→extract→analyze→offer into ONE
    Dataset execution and still derive the dump and docs_out by cheap
    projections of the same materialized blocks."""
    ok = extract_docs(batch)
    ok_mask = pc.equal(batch.column("status"), 200)
    rest = batch.filter(pc.invert(ok_mask))
    audit_ok = batch.filter(ok_mask)
    out = ok
    for c in AUDIT_COLS:
        out = out.append_column(c, audit_ok.column(c))
    if rest.num_rows:
        empty_links = pa.array([[]] * rest.num_rows, type=pa.list_(pa.string()))
        rest_tbl = pa.table(
            {
                "doc_id": rest.column("canon"),
                "url": rest.column("canon"),
                "spans": rest.column("spans"),
                "outlinks": empty_links,
                "generation": rest.column("generation"),
                "ord_key": rest.column("ord_key"),
                **{c: rest.column(c) for c in AUDIT_COLS},
            }
        )
        out = pa.concat_tables([out, rest_tbl], promote_options="default")
    return out.select(DOCS_AUDIT_COLS)


def explode_children(batch: pa.Table) -> pa.Table:
    """docs_out rows → raw child candidates (CANDIDATE_SCHEMA).

    link_index is the position in the doc's full outlink list (BEFORE
    validation — frozen in refsim); ord_key = parent_key.link_index.
    """
    links = as_single_array(batch.column("outlinks"))
    flat = links.flatten()
    if len(flat) == 0:
        return pa.table(
            {"url": pa.array([], pa.string()), "parent": pa.array([], pa.string()),
             "depth": pa.array([], pa.int32()), "ord_key": pa.array([], pa.string()),
             "is_seed": pa.array([], pa.bool_())}
        )
    parent_idx = pc.list_parent_indices(links).to_numpy(zero_copy_only=False)
    offsets = links.offsets.to_numpy(zero_copy_only=False)
    link_index = np.arange(len(flat), dtype=np.int64) - offsets[parent_idx]
    pkeys = batch.column("ord_key").to_pylist()
    child_keys = [f"{pkeys[p]}.{li:04d}" for p, li in zip(parent_idx.tolist(), link_index.tolist())]
    # child depth == number of '.' separators in its ord_key (every
    # discovery hop appends exactly one segment; seeds have none)
    depths = pa.array([k.count(".") for k in child_keys], type=pa.int32())
    parents = pc.take(batch.column("doc_id"), pa.array(parent_idx))
    return pa.table(
        {
            "url": flat,
            "parent": parents,
            "depth": depths,
            "ord_key": pa.array(child_keys, type=pa.string()),
            "is_seed": pa.array(np.zeros(len(flat), dtype=bool)),
        }
    )
