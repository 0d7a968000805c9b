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
    global _PROBE
    if _PROBE is None:
        cpus = 0
        try:
            if ray.is_initialized():
                cpus = int(ray.cluster_resources().get("CPU", 0))
        except Exception:  # resource probe must never break a query
            cpus = 0
        target = max(per_cpu * cpus, 1)
        k = 1
        while k < target:
            k <<= 1
        _PROBE = k
    return max(floor, min(_PROBE, CAP))


def sized_read(path: str, columns=None, rows_per_block: int = 4096):
    """``read_parquet`` with a block count derived from the file's row
    count (parquet metadata — no data pass) instead of Ray's default
    CPU-based split. The default split shatters a small table into
    ~2×CPU tiny blocks, and every downstream shuffle/aggregate pays a
    measured ~10–30 ms fixed cost PER BLOCK — on the suite's fixtures
    that overhead dwarfs the data. Maps are unaffected: ``map_batches``
    bundles blocks up to ``batch_size`` anyway, so task parallelism for
    CPU-heavy kernels comes from rows, not block count. At cluster
    scale the cap keeps ≥4 blocks per CPU available for big tables."""
    import pyarrow.parquet as _pq

    rows = _pq.ParquetFile(path).metadata.num_rows
    cpus = 0
    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    cap = max(4 * max(cpus, 8), 32)
    blocks = max(1, min(-(-rows // max(rows_per_block, 1)), cap))
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=blocks)
