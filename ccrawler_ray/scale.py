"""Cluster-scaled shuffle fan-out knobs.

The engine's wide operators salt high-cardinality keys into a SMALL
number of coarse groups (``hash(key) % k``) and iterate the real keys
inside the group fn — Ray's ``groupby().map_groups`` materializes one
whole group per task, and measured lore (BENCH/BASELINE.md) shows the
groupby collapsing when the group count is large. A FIXED ``k`` caps
per-task memory at ~total/k, which is fine on one node but becomes a
straggler/OOM hazard on a cluster whose aggregate parallelism exceeds
it. ``coarse_salt_k`` scales ``k`` with the cluster's CPU count
(floored at the single-node constants the suite was tuned on, capped
to stay in the groupby-safe regime) so the same code holds per-task
group bytes bounded at 4× the nodes.

Group membership is the ONLY thing k changes: every salted kernel
groups real keys inside the salt group, so outputs are identical for
any k ≥ 1 (pinned by tests/test_salt_invariance.py across
k ∈ {4, 16, 256} via the CCRAWLER_SALT_K override).
"""

from __future__ import annotations

import os

import ray
import ray.data

CAP = 4096  # stays well inside the measured groupby-safe group count

_PROBE: int | None = None  # memoized cluster fan-out (fixed-size cluster)


def coarse_salt_k(floor: int = 64, per_cpu: int = 2) -> int:
    """Coarse-salt group count: next power of two ≥ per_cpu × cluster
    CPUs, floored at ``floor`` (today's tuned single-node constant) and
    capped at ``CAP``. ``CCRAWLER_SALT_K`` overrides (tests). Cheap
    enough for per-batch calls: the cluster probe is memoized
    per-process; only the env override is re-read."""
    env = os.environ.get("CCRAWLER_SALT_K")
    if env:
        return max(1, int(env))
    return max(floor, min(_cluster_pow2(per_cpu), CAP))


def _cluster_pow2(per_cpu: int) -> int:
    """Memoized next power of two ≥ per_cpu × cluster CPUs — the raw
    cluster probe, NOT subject to the CCRAWLER_SALT_K override."""
    global _PROBE
    if _PROBE is None:
        cpus = 0
        try:
            if ray.is_initialized():
                cpus = int(ray.cluster_resources().get("CPU", 0))
        except Exception:  # resource probe must never break a query
            cpus = 0
        k = 1
        while k < max(2 * cpus, 1):
            k <<= 1
        _PROBE = k
    # _PROBE is sized at per_cpu=2; rescale by shifting
    return max(1, _PROBE >> (1 if per_cpu == 1 else 0))


def join_partitions(floor: int = 8, cap: int = 256) -> int:
    """Hash-join partition count for ``Dataset.join``: next power of
    two ≥ cluster CPUs / 4, floored at the tuned single-node default
    and capped. Join aggregator actors are NOT free — measured on the
    32-CPU sandbox (sf0.1, best-of-2): q7 4.8→12.6 s, q5 5.2→14.4 s,
    q12 4.3→8.6 s going 8→32 partitions — so the rule stays at the
    floor for any single node and only widens on clusters whose
    aggregate CPU count actually exceeds 4×floor×... (256 CPUs → 64
    partitions). ``CCRAWLER_JOIN_PARTS`` overrides (tests / A-B).
    Join OUTPUT is partition-count independent — a pure parallelism
    knob. Deliberately reads the RAW cluster probe, not
    ``coarse_salt_k``: the CCRAWLER_SALT_K test override must sweep
    salting only — at k=256 on a small session it would force 64 join
    aggregator actors and stall every ``Dataset.join`` (found by the
    salt-invariance suite hanging in dedup_clusters)."""
    env = os.environ.get("CCRAWLER_JOIN_PARTS")
    if env:
        return max(1, int(env))
    # cluster probe: pow2 ≥ 2×CPU, shifted down to ≥ CPU/4
    k = max(1, _cluster_pow2(1) >> 2)
    return max(floor, min(k, cap))


_BLOCK_BYTES_MAX = 64 << 20  # on-disk bytes per block ceiling


def sized_read(path: str, columns=None, rows_per_block: int = 4096):
    """``read_parquet`` with a block count derived from the file's row
    count (parquet metadata — no data pass) instead of Ray's default
    CPU-based split. The default split shatters a small table into
    ~2×CPU tiny blocks, and every downstream shuffle/aggregate pays a
    measured ~10–30 ms fixed cost PER BLOCK — on the suite's fixtures
    that overhead dwarfs the data (5 legs × 64 blocks → 9.6 s of pure
    per-block cost for a 2500-row union+groupby; 8 blocks → 0.8 s).

    Two scale guards keep the override honest on big inputs: the block
    count is capped at 4× cluster CPUs ONLY while each block stays
    under ``_BLOCK_BYTES_MAX`` on disk (a bytes floor lifts the cap so
    a 100 TB table never collapses into 4×CPU giant blocks), and tiny
    ``rows_per_block`` callers (text-heavy kernels wanting map
    parallelism) still get it because map task count == block count."""
    import pyarrow.parquet as _pq

    meta = _pq.ParquetFile(path).metadata
    rows = meta.num_rows
    total_bytes = sum(meta.row_group(i).total_byte_size
                      for i in range(meta.num_row_groups))
    cpus = 0
    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    cap = max(4 * max(cpus, 8), 32)
    blocks = max(1, min(-(-rows // max(rows_per_block, 1)), cap),
                 -(-total_bytes // _BLOCK_BYTES_MAX))
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=blocks)


def read_docs(sf_dir: str, columns=None, rows_per_block: int = 128):
    """documents.parquet read sized for text kernels: ~128 docs/block
    keeps heavy per-doc kernels (minhash, shingles) parallel while
    narrow leg outputs stay at a shuffle-friendly block count."""
    return sized_read(f"{sf_dir}/documents.parquet", columns=columns,
                      rows_per_block=rows_per_block)


def read_embeddings(sf_dir: str, columns=None, rows_per_block: int = 512):
    """embeddings.parquet read sized for vector kernels (matmul-heavy
    batches want more rows per task than text does)."""
    return sized_read(f"{sf_dir}/embeddings.parquet", columns=columns,
                      rows_per_block=rows_per_block)


def prune_scratch(max_age_s: int = 6 * 3600) -> None:
    """Best-effort removal of stale pid-scoped /tmp scratch dirs
    (`ccrawler_ray_<kind>_<key>` from roundtrip queries and pair-
    stream artifacts). Without this every process leaks its dirs —
    hundreds of dirs / GBs measured after a day of sessions. The
    shared content-keyed memo families (`ccrawler_ray_bench`,
    `ccrawler_ray_corpus`) have no second underscore-separated part
    and are never matched. mtime-gated, so live sessions (which
    touch their dirs on every build) are never pruned."""
    import shutil
    import tempfile
    import time
    from pathlib import Path

    cutoff = time.time() - max_age_s
    try:
        for d in Path(tempfile.gettempdir()).glob("ccrawler_ray_*_*"):
            try:
                if d.is_dir() and d.stat().st_mtime < cutoff:
                    shutil.rmtree(d, ignore_errors=True)
            except OSError:
                continue
    except OSError:
        pass
