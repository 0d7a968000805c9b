"""10x scale rehearsal runner (VERDICT r3 #5): time the most expensive
bench keys at /tmp/ccrawler_sf1 (10x sf0.1, tools/gen_scale.py) and
report per-key seconds.  Usage:

    python tools/run_scale10.py [sf_dir] [ncpu]

Prints one JSON line {key: sec}.  Run once with sf_dir=/root/testdata/sf0.1
and once with /tmp/ccrawler_sf1 in fresh processes; the ratio per key is
the observed 10x scaling factor (target: near-linear, <= ~12x).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

KEYS = [
    # cheapest-ish first so memo families pay their build early
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_index_roundtrip",
    "media_dedup_near",
    "dsir_importance",
    "training_mix_stats",
    "lm_perplexity",
    "link_triangles",
    "link_hits",
    "ann_nsw_topk",
    "j4_multi_join",
    "q7_volume_shipping",
    "q10_returned_revenue",
    "q12_late_priority",
    "q3_shipping_priority",
    "io_partitioned_roundtrip",
    "spans_line_dedup",
    "o9_seeded_shuffle",
    "dedup_containment_stats",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ccrawler_sf1"
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as E

    qs = E.queries()
    out = {}
    for name in KEYS:
        t0 = time.perf_counter()
        r = qs[name](sf_dir)
        if hasattr(r, "to_pandas"):
            r = r.to_pandas()
        n = len(r)
        out[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {out[name]}s ({n} rows)", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "num_cpus": ncpu, "keys": out}))
    ray.shutdown()


if __name__ == "__main__":
    main()
