#!/usr/bin/env python
"""Benchmark: headline crawl pipeline + query suite.

Plain run: ONE JSON line
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N, ...}

--scaling: runs the headline crawl twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the SAME cached input, reports both
throughputs + scaling efficiency (the N vs 4N-node criterion of
BASELINE.json, evidenced at two parallelism levels in this
single-node sandbox).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BENCH_CORPUS = Path("/tmp/ccrawler_ray_bench/corpus_bench_v2.parquet")


def ensure_bench_corpus() -> str:
    if not BENCH_CORPUS.exists():
        BENCH_CORPUS.parent.mkdir(parents=True, exist_ok=True)
        from tests.gen_corpus import write_corpus

        tmp = str(BENCH_CORPUS) + ".tmp"
        write_corpus("bench", tmp)
        os.replace(tmp, BENCH_CORPUS)
    return str(BENCH_CORPUS)


def run_crawl_bench(ncpu: int) -> dict:
    import pyarrow.parquet as pq

    from ccrawler_ray.config import CrawlConfig
    from ccrawler_ray.pipelines.crawl import CrawlEngine

    corpus_path = ensure_bench_corpus()
    corpus = pq.read_table(corpus_path)  # warm page cache, untimed
    cfg = CrawlConfig(
        seeds=tuple(f"http://h{i}.example/p0" for i in range(500)),
        max_depth=50,
        per_host_budget_per_generation=10_000,
        global_budget_per_generation=100_000,
        max_generations=10,
        batch_size=4096,
        analyze=True,
        admission_mode="actor",
    ).scaled_for(ncpu)
    eng = CrawlEngine(corpus, cfg)
    t0 = time.perf_counter()
    res = eng.run()
    crawl_sec = time.perf_counter() - t0
    urls_fetched = len(res.crawl_order)
    urls_seen = res.seen.num_rows
    eng.shutdown()
    return {
        "crawl_sec": round(crawl_sec, 3),
        "urls_fetched": urls_fetched,
        "urls_seen": urls_seen,
        "generations": res.generations_run,
        "urls_per_sec": round((urls_fetched + urls_seen) / crawl_sec, 1),
        "phase_sec": {k: round(v, 2) for k, v in eng._phase_sec.items()},
    }


QUERY_SUITE = [
    "q1_pricing_summary",
    "j4_multi_join",
    "g3_metrics_rollup",
    "o1_global_sort",
    "token_count",
    "dedup_minhash_lsh",
    "ann_topk_cosine",
]


def run_query_bench(sf_dir: str) -> dict:
    import __ray_entry__ as E

    qs = E.queries()
    out = {}
    for name in QUERY_SUITE:
        t0 = time.perf_counter()
        r = qs[name](sf_dir)
        # consume to completion
        if hasattr(r, "to_pandas"):
            r = r.to_pandas()
        _ = len(r)
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    crawl_only = os.environ.get("BENCH_CRAWL_ONLY") == "1"

    import ray

    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    crawl = run_crawl_bench(ncpu)
    queries = {} if crawl_only else run_query_bench(sf_dir)
    queries["crawl"] = crawl["crawl_sec"]
    value = crawl["crawl_sec"] + sum(v for k, v in queries.items() if k != "crawl")
    print(
        json.dumps(
            {
                "metric": "headline crawl (fetch+dedup+analyze, bench corpus) + query suite",
                "value": round(value, 3),
                "unit": "sec",
                "queries": queries,
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                "num_cpus": ncpu,
                **crawl,
            }
        )
    )
    ray.shutdown()


def scaling() -> None:
    ensure_bench_corpus()
    results = {}
    for ncpu in (8, 32):
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_CRAWL_ONLY="1"
        )
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py")], env=env,
            capture_output=True, text=True, check=True,
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    thr8 = results[8]["urls_per_sec"]
    thr32 = results[32]["urls_per_sec"]
    eff = (thr32 / thr8) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "sustained URLs fetched+deduped/sec, scaling 8→32 cpus",
                "unit": "urls/sec",
                "throughput_8": thr8,
                "throughput_32": thr32,
                "sec_8": results[8]["crawl_sec"],
                "sec_32": results[32]["crawl_sec"],
                "scaling_efficiency": round(eff, 3),
                "pass": eff >= 0.8,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
