"""Session-scoped memo for expensive shared artifacts.

The driver surface calls many `queries()` entries in one Ray session
and several of them share a costly sub-pipeline (minhash signatures,
cluster keep lists, per-doc quality/score legs, ANN quantizer
trainings). Each such artifact is computed ONCE per (key, session) and
reused — the memo holds materialized Datasets (object-store refs, no
worker-heap state) or small driver-side values (centroid matrices,
codebooks).

Scale note: every memoized Dataset is a NARROW per-doc reduction
(int64 ids + a few numeric/string columns; text never rides along) —
at 100 TB these are the keep-list-sized tables a production pipeline
would persist between stages anyway. Entries are invalidated when the
Ray job id changes (object refs die with their session);
:func:`release` frees the object store between jobs sharing a session
(bench.py calls it).
"""

from __future__ import annotations

import ray

DS_MEMO: dict = {}
_MEMO_JOB: list = [None]  # Ray job id the memo belongs to


def guard() -> None:
    """Invalidate the memo when the Ray session changed."""
    try:
        jid = ray.get_runtime_context().get_job_id()
    except Exception:  # pragma: no cover - uninitialized ray
        jid = None
    if jid != _MEMO_JOB[0]:
        DS_MEMO.clear()
        _MEMO_JOB[0] = jid


def memo_ds(key: tuple, builder):
    """Materialized-Dataset memo: build once per (key, Ray session)."""
    guard()
    ds = DS_MEMO.get(key)
    if ds is None:
        ds = builder().materialize()
        DS_MEMO[key] = ds
    return ds


def memo_val(key: tuple, builder):
    """Driver-side-value memo (numpy centroids/codebooks — anything
    cheap to hold on the driver but expensive to recompute)."""
    guard()
    if key not in DS_MEMO:
        DS_MEMO[key] = builder()
    return DS_MEMO[key]


def release() -> None:
    """Drop every memoized artifact (frees object-store refs)."""
    DS_MEMO.clear()
