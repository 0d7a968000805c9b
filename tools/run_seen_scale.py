"""10x bloom/cuckoo seen-membership evidence run (VERDICT r4 next #1).

Runs the 10x semi-join crawl (bench10x corpus BY PATH, 2M pages /
5000 hosts) once per seen-membership mode and compares the
filter-authoritative runs against the exact run:

* bloom  — fetched set must be ⊆ the exact run's (an FP can only DROP
  a genuinely-new URL), misses reported against the measured stratum
  FP rate and the design bound;
* cuckoo — fetched set expected EQUAL (16-bit fingerprints + exact
  overflow; a miss needs a fingerprint collision in the probed
  buckets — report any observed);
* per-shard filter memory vs the 15 GB / 64-shard design math
  (SURVEY.md §4.1: 10^10 URLs x 12 bits ≈ 15 GB total).

Usage:  python tools/run_seen_scale.py [mode ...] [--ncpu N] [--gens G]
        (default: exact bloom cuckoo, ncpu=32, gens=10; each mode runs
        in THIS process sequentially — use a fresh process per
        invocation for clean timing)

Prints one JSON line per mode plus a final summary line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CORPUS10X = Path("/tmp/ccrawler_ray_bench/corpus_bench10x_v1.parquet")


def ensure_corpus() -> str:
    if not CORPUS10X.exists():
        import os

        from tests.gen_corpus import write_corpus

        CORPUS10X.parent.mkdir(parents=True, exist_ok=True)
        tmp = str(CORPUS10X) + ".tmp"
        write_corpus("bench10x", tmp)
        os.replace(tmp, CORPUS10X)
    return str(CORPUS10X)


def run_mode(corpus_path: str, membership: str, ncpu: int, gens: int) -> dict:
    import ray

    from ccrawler_ray.config import CrawlConfig
    from ccrawler_ray.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(
        seeds=tuple(f"http://h{i}.example/p0" for i in range(5000)),
        max_depth=50,
        per_host_budget_per_generation=10_000,
        global_budget_per_generation=1_000_000,
        max_generations=gens,
        batch_size=4096,
        analyze=True,
        admission_mode="actor",
        seen_membership=membership,
    ).scaled_for(ncpu)
    eng = CrawlEngine(corpus_path, cfg)   # BY PATH -> semi_join mode
    eng.warmup()
    t0 = time.perf_counter()
    res = eng.run()
    sec = time.perf_counter() - t0
    stats = ray.get([s.stats.remote() for s in eng.seen_pool.shards])
    est_card = eng.seen_pool.estimated_cardinality()
    fetched = res.crawl_order[["canon", "ord_key"]].copy()
    eng.shutdown()
    probes = sum(s["audit_probes"] for s in stats)
    fps = sum(s["audit_fps"] for s in stats)
    out = {
        "mode": membership,
        "crawl_sec": round(sec, 1),
        "fetched": len(fetched),
        "generations": res.generations_run,
        "urls_per_sec": round(len(fetched) / sec, 1),
        "seen_exact_rows": int(res.seen.num_rows),
        "seen_estimated": round(est_card),
        "filter_mem_bytes_per_shard": [s["filter_mem_bytes"] for s in stats],
        "filter_fill": [round(s["bloom_fill"], 4) for s in stats],
        "audit_probes": probes,
        "audit_fps": fps,
        "audit_fp_rate": round(fps / probes, 8) if probes else None,
    }
    return out, fetched


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    modes = args or ["exact", "bloom", "cuckoo"]
    ncpu = 32
    gens = 10
    for a in sys.argv[1:]:
        if a.startswith("--ncpu"):
            ncpu = int(a.split("=")[1])
        elif a.startswith("--gens"):
            gens = int(a.split("=")[1])

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    corpus_path = ensure_corpus()
    results = {}
    fetched_sets = {}
    for m in modes:
        out, fetched = run_mode(corpus_path, m, ncpu, gens)
        results[m] = out
        fetched_sets[m] = set(map(tuple, fetched.itertuples(index=False)))
        print(json.dumps(out), flush=True)

    summary = {"ncpu": ncpu, "gens": gens}
    if "exact" in fetched_sets:
        ex = fetched_sets["exact"]
        for m in ("bloom", "cuckoo"):
            if m in fetched_sets:
                s = fetched_sets[m]
                summary[f"{m}_subset_of_exact"] = s <= ex
                summary[f"{m}_missing_vs_exact"] = len(ex - s)
                summary[f"{m}_extra_vs_exact"] = len(s - ex)
    print(json.dumps({"summary": summary, **{k: {kk: vv for kk, vv in v.items()
          if kk != "filter_mem_bytes_per_shard"} for k, v in results.items()}}),
          flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
