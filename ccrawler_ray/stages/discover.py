"""Discovery stage: raw candidate URLs → canonical frontier rows.

Fuses M1 (canonicalize) + M2 (validate/filter) + M3 (host) + M4 (depth
gate) + M5 (priority) into ONE ``map_batches`` pass (one batch scan,
no intermediate materialization). Stateless — a plain function, so Ray
runs it as elastic tasks.

Input batch columns:  url, parent, depth, ord_key, is_seed
Output batch columns: FRONTIER_SCHEMA (generation/retries filled by
caller-supplied constants).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ccrawler_ray.spec import (
    FRONTIER_SCHEMA,
    canonicalize_batch,
    hash64_batch,
    host_prior,
    is_crawlable,
    url_host,
    W_DEPTH,
    W_HOST,
    W_SEED,
)

CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("parent", pa.string()),
        ("depth", pa.int32()),
        ("ord_key", pa.string()),
        ("is_seed", pa.bool_()),
    ]
)


def make_discover_fn(max_depth: int, generation: int):
    def discover(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        canons = canonicalize_batch(urls)
        depths = batch.column("depth").to_numpy(zero_copy_only=False)
        keep_idx: list[int] = []
        kept_canon: list[str] = []
        kept_host: list[str] = []
        for i, c in enumerate(canons):
            if depths[i] <= max_depth and is_crawlable(c):
                keep_idx.append(i)
                kept_canon.append(c)
                kept_host.append(url_host(c))
        sub = batch.take(pa.array(keep_idx, type=pa.int64()))
        n = len(keep_idx)
        kdepth = sub.column("depth").to_numpy(zero_copy_only=False).astype(np.float64)
        is_seed = sub.column("is_seed").to_numpy(zero_copy_only=False)
        priors = np.fromiter((host_prior(h) for h in kept_host), dtype=np.float64, count=n)
        priority = W_DEPTH / (1.0 + kdepth) + W_HOST * priors + W_SEED * is_seed
        return pa.Table.from_arrays(
            [
                sub.column("url"),
                pa.array(kept_canon, type=pa.string()),
                pa.array(hash64_batch(kept_canon), type=pa.uint64()),
                pa.array(kept_host, type=pa.string()),
                sub.column("parent"),
                sub.column("depth"),
                pa.array(priority, type=pa.float64()),
                sub.column("ord_key"),
                pa.array(np.full(n, generation, dtype=np.int32)),
                pa.array(np.zeros(n, dtype=np.int32)),
            ],
            schema=FRONTIER_SCHEMA,
        )

    return discover
