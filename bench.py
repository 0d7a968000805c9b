#!/usr/bin/env python
"""Benchmark: headline crawl pipeline + query suite.

Plain run: ONE JSON line
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N, ...}

--scaling: runs the headline crawl in FRESH processes at N and 4N CPUs
(default 2 vs 8; override BENCH_SCALE_LO/HI) on the SAME cached input,
best-of-BENCH_SCALE_REPS per level, and reports both throughputs +
scaling efficiency for the saturated and discovery-stepped regimes
(the N vs 4N-node criterion of BASELINE.json, evidenced at two
parallelism levels in this single-node sandbox).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32), BENCH_MODE (stepped|saturation),
     BENCH_SCALE_LO/HI (default 2/8), BENCH_SCALE_REPS (default 2).
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

BENCH_CORPUS = Path("/tmp/ccrawler_ray_bench/corpus_bench_v3.parquet")


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
    eng.warmup()
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


def run_saturation_bench(ncpu: int) -> dict:
    """Saturated-throughput regime: every corpus page seeded at once —
    one giant fetch→extract→analyze→dedup batch (a full-corpus
    re-crawl). This is the steady-state regime the 'sustained URLs/sec'
    metric describes; the stepped crawl above measures the
    discovery-limited regime."""
    import pyarrow.parquet as pq

    from ccrawler_ray.config import CrawlConfig
    from ccrawler_ray.pipelines.crawl import CrawlEngine

    corpus_path = ensure_bench_corpus()
    corpus = pq.read_table(corpus_path)
    doc_ids = [d for d in corpus.column("doc_id").to_pylist()
               if not d.endswith("/robots.txt")]
    cfg = CrawlConfig(
        seeds=tuple(doc_ids),
        max_depth=50,
        per_host_budget_per_generation=1_000_000_000,
        global_budget_per_generation=1_000_000_000,
        max_generations=2,
        batch_size=4096,
        analyze=True,
        admission_mode="actor",
    ).scaled_for(ncpu)
    eng = CrawlEngine(corpus, cfg)
    eng.warmup()
    t0 = time.perf_counter()
    res = eng.run()
    sec = time.perf_counter() - t0
    urls = len(res.crawl_order)
    seen = res.seen.num_rows
    eng.shutdown()
    return {
        "saturation_sec": round(sec, 3),
        "urls_fetched": urls,
        "urls_seen": seen,
        "urls_per_sec": round((urls + seen) / sec, 1),
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
    # round-2 additions (suite is a superset of r1's — compare the
    # shared per-query keys across rounds, not the total)
    "dedup_clusters",
    "training_mix_stats",
    "g5_hll_distinct",
    "j6_range_join",
    "dedup_ngram_spans",
    "tfidf_topk",
    "o7_wordcount_topk",
    "search_bm25",
    "link_pagerank",
    # round-2 late additions
    "ann_ivf_pq",
    "w8_late_events",
    "g15_corr",
    "pii_scrub",
    "link_triangles",
    "repetition_stats",
    "mix_interleave",
    "mix_temperature_sample",
    "g16_heavy_hitters",
    "ann_filtered_topk",
    "media_dedup_exact",
    "q18_big_orders",
    "g18_unpivot",
    "io_jsonl_roundtrip",
    "io_csv_roundtrip",
    "lm_perplexity",
    "dedup_incremental",
    "media_dedup_near",
    "o10_pack_sequences",
    "w11_ewma",
    "spans_rollup",
    "io_partitioned_roundtrip",
    "q5_local_supplier_volume",
    "q10_returned_revenue",
    "q4_order_priority",
    "q14_promo_revenue",
    "o9_seeded_shuffle",
    "o11_chunk_overlap",
    # round-3 additions
    "dsir_importance",
    "bpe_train_merges",
    "bpe_encode_stats",
    "bpe_pair_topk",
    "g19_grouping_sets",
    "w2_sessionize",
    "s2_set_except",
    # round-3 session-3 additions (TPC-H breadth)
    "q7_volume_shipping",
    "q8_market_share",
    "q12_late_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q19_discounted_revenue",
    "q22_sales_opportunity",
    "dedup_index_roundtrip",
    "ann_index_roundtrip",
    # round-3 session-4 additions
    "io_ipc_roundtrip",
    "ann_range_search",
    "spans_line_dedup",
    "q11_important_stock",
    "link_hits",
    "embedding_pca",
    "ccnet_buckets",
    # round-3 session-6 additions
    "o12_skyline",
    "w13_scd2_history",
    "j10_fuzzy_join",
    # round-3 session-7 additions
    "g22_mad",
    "g23_market_basket",
    "w14_markov_transitions",
    "model_auc_report",
    "source_ngram_overlap",
    "io_orc_roundtrip",
    "ann_nsw_topk",
    "spans_integrity_report",
    # round-4 additions
    "mix_curriculum_order",
    "io_pushdown_scan",
    "ann_hybrid_search",
    "dedup_containment_stats",
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

    mode = os.environ.get("BENCH_MODE", "stepped")
    if mode == "saturation":
        sat = run_saturation_bench(ncpu)
        print(
            json.dumps(
                {
                    "metric": "saturated crawl throughput (full-corpus re-crawl)",
                    "value": sat["saturation_sec"],
                    "unit": "sec",
                    "queries": {"saturation_crawl": sat["saturation_sec"]},
                    "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                    "num_cpus": ncpu,
                    **sat,
                }
            )
        )
        ray.shutdown()
        return
    crawl = run_crawl_bench(ncpu)
    if not crawl_only:
        # drop the crawl's per-worker broadcast caches so the query
        # phase isn't slowed by corpus-sized idle worker heaps
        from ccrawler_ray.pipelines.crawl import release_worker_caches

        release_worker_caches()
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


SCALE_LO = int(os.environ.get("BENCH_SCALE_LO", "2"))
SCALE_HI = int(os.environ.get("BENCH_SCALE_HI", "8"))


def _run_level(ncpu: int, mode: str) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_CRAWL_ONLY="1",
               BENCH_MODE=mode)
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")], env=env,
        capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def scaling() -> None:
    """The N vs 4N criterion (BASELINE.json), evidenced at two
    parallelism levels (default N=2 vs 4N=8 CPUs; override with
    BENCH_SCALE_LO/HI) on the SAME cached input. Headline regime is
    the saturated crawl (steady-state throughput — what 'sustained
    URLs/sec' measures); the discovery-stepped regime is reported
    alongside."""
    ensure_bench_corpus()
    factor = SCALE_HI / SCALE_LO
    out: dict = {"metric": "sustained URLs fetched+deduped/sec, "
                           f"scaling {SCALE_LO}→{SCALE_HI} cpus (N vs 4N)",
                 "unit": "urls/sec"}
    reps = int(os.environ.get("BENCH_SCALE_REPS", "2"))
    for mode in ("saturation", "stepped"):
        # best-of-N per level: the first run per machine state pays
        # page-cache/plasma warm-up; best-of suppresses that noise
        lo = max((_run_level(SCALE_LO, mode) for _ in range(reps)),
                 key=lambda r: r["urls_per_sec"])
        hi = max((_run_level(SCALE_HI, mode) for _ in range(reps)),
                 key=lambda r: r["urls_per_sec"])
        eff = (hi["urls_per_sec"] / lo["urls_per_sec"]) / factor
        key = "saturated" if mode == "saturation" else "stepped"
        out[key] = {
            f"throughput_{SCALE_LO}": lo["urls_per_sec"],
            f"throughput_{SCALE_HI}": hi["urls_per_sec"],
            f"sec_{SCALE_LO}": lo.get("saturation_sec", lo.get("crawl_sec")),
            f"sec_{SCALE_HI}": hi.get("saturation_sec", hi.get("crawl_sec")),
            "scaling_efficiency": round(eff, 3),
        }
    out["scaling_efficiency"] = out["saturated"]["scaling_efficiency"]
    out["pass"] = out["scaling_efficiency"] >= 0.8
    print(json.dumps(out))
    try:
        (REPO / "BENCH").mkdir(exist_ok=True)
        (REPO / "BENCH" / "scaling_last.json").write_text(json.dumps(out, indent=1))
    except OSError:
        pass


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
