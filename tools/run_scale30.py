"""30x RAM-edge crawl rehearsal (VERDICT r4 next #3).

Runs the semi-join crawl over the bench30x corpus (6M pages / 15000
hosts, ~9.5 GB parquet — 3x the 10x fixture) at num_cpus=32 with
checkpoints, then interrupts at the halfway generation and resumes in
a FRESH engine, asserting crawl-order hash equality with the
uninterrupted run. A sampler thread tracks peak total RSS across all
processes (driver + raylet + workers) via /proc.

Usage:  python tools/run_scale30.py [--gens G] [--ncpu N] [--skip-resume]
Prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CORPUS30X = Path("/tmp/ccrawler_ray_bench/corpus_bench30x_v1.parquet")


def ensure_corpus() -> str:
    if not CORPUS30X.exists():
        from tests.gen_corpus import write_corpus

        CORPUS30X.parent.mkdir(parents=True, exist_ok=True)
        tmp = str(CORPUS30X) + ".tmp"
        write_corpus("bench30x", tmp)
        os.replace(tmp, CORPUS30X)
    return str(CORPUS30X)


class RssSampler:
    """Peak system memory use (MemTotal - MemAvailable) sampled from
    /proc/meminfo. Summing per-process RSS would count the plasma
    object store's shared mappings once PER WORKER (measured 318 GB
    "used" on a 125 GB machine); machine-level accounting is the
    number that decides whether the job fits a node."""

    def __init__(self, interval: float = 1.0):
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, args=(interval,),
                                   daemon=True)

    def _total_rss(self) -> int:
        vals = {}
        with open("/proc/meminfo") as f:
            for line in f:
                k, v = line.split(":", 1)
                vals[k] = int(v.split()[0]) * 1024
                if len(vals) > 4:
                    break
        return vals["MemTotal"] - vals["MemAvailable"]

    def _run(self, interval: float) -> None:
        while not self._stop.is_set():
            self.peak = max(self.peak, self._total_rss())
            self._stop.wait(interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join(timeout=5)


def order_hash(dump) -> str:
    rows = dump.sort_values(["canon", "ord_key"])[["canon", "ord_key"]]
    h = hashlib.blake2b(digest_size=16)
    for c in rows["canon"]:
        h.update(c.encode())
    for k in rows["ord_key"]:
        h.update(k.encode())
    return h.hexdigest()


def make_cfg(gens: int, ncpu: int, membership: str = "exact"):
    from ccrawler_ray.config import CrawlConfig

    return CrawlConfig(
        seeds=tuple(f"http://h{i}.example/p0" for i in range(15_000)),
        max_depth=50,
        per_host_budget_per_generation=10_000,
        global_budget_per_generation=3_000_000,
        max_generations=gens,
        batch_size=4096,
        analyze=True,
        admission_mode="actor",
        seen_membership=membership,
    ).scaled_for(ncpu)


def run_crawl(corpus_path: str, gens: int, ncpu: int, ckpt: str | None,
              resume: bool = False, membership: str = "exact"):
    import ray

    from ccrawler_ray.pipelines.crawl import CrawlEngine

    eng = CrawlEngine(corpus_path, make_cfg(gens, ncpu, membership),
                      ckpt_dir=ckpt)
    if resume:
        assert eng.resume(), "no checkpoint found to resume from"
    eng.warmup()
    t0 = time.perf_counter()
    res = eng.run()
    sec = time.perf_counter() - t0
    out = {
        "sec": round(sec, 1),
        "fetched": len(res.crawl_order),
        "seen": int(res.seen.num_rows),
        "generations": res.generations_run,
        "hash": order_hash(res.crawl_order),
        "phase_sec": {k: round(v, 2) for k, v in eng._phase_sec.items()},
    }
    if membership != "exact":
        stats = ray.get([sh.stats.remote()
                         for sh in eng.seen_pool.shards])
        out["audit_probes"] = sum(x["audit_probes"] for x in stats)
        out["audit_fps"] = sum(x["audit_fps"] for x in stats)
        out["filter_mem_bytes"] = sum(x["filter_mem_bytes"] for x in stats)
    eng.shutdown()
    from ccrawler_ray.pipelines.crawl import release_worker_caches

    release_worker_caches()
    return out


class DiskSampler:
    """Peak disk-in-use on / (object-spill high-water shows here)."""

    def __init__(self, interval: float = 1.0):
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, args=(interval,),
                                   daemon=True)

    def _used(self) -> int:
        st = os.statvfs("/")
        return (st.f_blocks - st.f_bavail) * st.f_frsize

    def _run(self, interval: float) -> None:
        while not self._stop.is_set():
            self.peak = max(self.peak, self._used())
            self._stop.wait(interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join(timeout=5)


def leg_main() -> None:
    """One crawl leg in THIS process (fresh Ray session — spill files
    are reclaimed at session teardown, so legs never stack)."""
    gens = int(sys.argv[2])
    ncpu = int(sys.argv[3])
    ckpt = sys.argv[4]
    resume = sys.argv[5] == "resume"
    membership = sys.argv[6] if len(sys.argv) > 6 else "exact"

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    corpus_path = ensure_corpus()
    with RssSampler() as rss, DiskSampler() as disk:
        out = run_crawl(corpus_path, gens, ncpu, ckpt, resume=resume,
                        membership=membership)
    out["peak_mem_gb"] = round(rss.peak / 2**30, 2)
    out["peak_disk_gb"] = round(disk.peak / 2**30, 2)
    print("LEG:" + json.dumps(out))
    ray.shutdown()


def _run_leg(gens: int, ncpu: int, ckpt: str, resume: bool = False,
             membership: str = "exact") -> dict:
    import subprocess

    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--leg", str(gens),
         str(ncpu), ckpt, "resume" if resume else "fresh", membership],
        capture_output=True, text=True)
    for line in p.stdout.splitlines():
        if line.startswith("LEG:"):
            return json.loads(line[4:])
    raise RuntimeError(
        f"leg failed rc={p.returncode}:\n{p.stderr[-2000:]}")


def main() -> None:
    gens = 10
    ncpu = 32
    membership = "exact"
    skip_resume = "--skip-resume" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--gens="):
            gens = int(a.split("=")[1])
        elif a.startswith("--ncpu="):
            ncpu = int(a.split("=")[1])
        elif a.startswith("--membership="):
            membership = a.split("=")[1]

    corpus_path = ensure_corpus()
    result = {"corpus_bytes": os.path.getsize(corpus_path), "ncpu": ncpu,
              "gens": gens}

    ck_full = "/tmp/ck30x_full"
    shutil.rmtree(ck_full, ignore_errors=True)
    full = _run_leg(gens, ncpu, ck_full, membership=membership)
    result["full"] = full
    result["urls_per_sec"] = round(
        (full["fetched"] + full["seen"]) / full["sec"], 1)
    print(json.dumps({"progress": "full done", **result}), file=sys.stderr,
          flush=True)

    if not skip_resume:
        ck = "/tmp/ck30x_resume"
        shutil.rmtree(ck, ignore_errors=True)
        half = _run_leg(gens // 2, ncpu, ck)
        resumed = _run_leg(gens, ncpu, ck, resume=True)
        result["half"] = {k: half[k] for k in ("sec", "fetched",
                                               "generations",
                                               "peak_mem_gb",
                                               "peak_disk_gb")}
        result["resumed"] = resumed
        result["resume_hash_equal"] = resumed["hash"] == full["hash"]
        result["resume_counts_equal"] = (
            resumed["fetched"] == full["fetched"]
            and resumed["seen"] == full["seen"])
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        leg_main()
    else:
        main()
