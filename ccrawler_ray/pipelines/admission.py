"""Admission (politeness) math — pure, deterministic, shared by the
driver fast path and the distributed groupby(host) path (G1/G2 +
salting, SURVEY.md §4.3).

Semantics (frozen; mirrored by tests/refsim.py):
  * robots-disallowed rows drop permanently;
  * per host: eligible rows sorted by (-priority, ord_key);
    queue_pos = rank; admitted iff queue_pos < host_admission_limit;
  * global cap: top global_budget admitted rows by (-priority, ord_key)
    stay; the cut rows are deferred.

Salting exactness: with per-salt-group provisional top-limit as the
stage-2 candidate set, both the admitted set and every admitted row's
queue_pos equal the unsalted computation (proof sketch: any row with
global per-host rank < limit has ALL rows above it in its host's
candidate set, and any row with global rank ≥ limit keeps ≥ limit
candidates above it — so rank and cut agree).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ccrawler_ray.spec import host_admission_limit, robots_allows

# per-worker-process broadcast cache (ray.put ref -> value)
_BCAST_CACHE: dict = {}


def get_broadcast(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    val = _BCAST_CACHE.get(key)
    if val is None:
        import ray

        val = ray.get(ref)
        _BCAST_CACHE[key] = val
    return val


def canon_path(canon: str) -> str:
    rest = canon.split("://", 1)[1]
    i = rest.find("/")
    return rest[i:] if i >= 0 else "/"


def robots_salt_batch(batch: pa.Table, robots: dict, hot_hosts: frozenset,
                      salt_factor: int, per_host_budget: int,
                      coarse_k: int = 64) -> pa.Table:
    """Drop robots-disallowed rows; append salt + limit columns, plus
    the two COARSE shuffle keys (VERDICT r2 #3 — live-host count is
    web-scale-unbounded, so neither admission groupby may key on the
    raw host):

      * ``adm_g1`` = hash64(host) mixed with the hot-host salt, mod
        coarse_k — stage-1 shuffle key; a hot host's salt slices still
        spread over tasks, every other (host, salt) key stays whole;
      * ``adm_g2`` = hash64(host) mod coarse_k — stage-2 shuffle key;
        co-locates each host's stage-1 survivors.

    ``coarse_k`` must be the SAME driver-pinned value for every batch
    of a generation (rows of one key must agree on their group).
    """
    from ccrawler_ray.spec import hash64_batch

    hosts = batch.column("host").to_pylist()
    canons = batch.column("canon").to_pylist()
    hashes = batch.column("url_hash").to_numpy(zero_copy_only=False)
    keep: list[int] = []
    limits: list[int] = []
    salts: list[int] = []
    kept_hosts: list[str] = []
    get = robots.get
    for i, (h, c) in enumerate(zip(hosts, canons)):
        delay, disallow = get(h, (0, ()))
        if disallow and not robots_allows(canon_path(c), disallow):
            continue
        keep.append(i)
        limits.append(host_admission_limit(per_host_budget, delay))
        salts.append(int(hashes[i]) % salt_factor if h in hot_hosts else 0)
        kept_hosts.append(h)
    sub = batch.take(pa.array(keep, type=pa.int64()))
    salts_arr = np.array(salts, dtype=np.int64)
    # hash only the distinct hosts of the batch (hot link graphs repeat)
    uniq, inv = np.unique(np.array(kept_hosts, dtype=object), return_inverse=True)
    hh = hash64_batch(list(uniq))[inv] if len(uniq) else np.empty(0, np.uint64)
    mixed = hh ^ (salts_arr.astype(np.uint64) *
                  np.uint64(0x9E3779B97F4A7C15))
    sub = sub.append_column("limit", pa.array(np.array(limits, dtype=np.int32)))
    sub = sub.append_column("salt", pa.array(salts_arr.astype(np.int32)))
    sub = sub.append_column(
        "adm_g1", pa.array((mixed % np.uint64(coarse_k)).astype(np.int32)))
    sub = sub.append_column(
        "adm_g2", pa.array((hh % np.uint64(coarse_k)).astype(np.int32)))
    return sub


def rank_group(df: pd.DataFrame) -> pd.DataFrame:
    """Stage 1 (within host,salt): provisional rank by (-priority, ord_key)."""
    df = df.sort_values(["priority", "ord_key"], ascending=[False, True])
    df = df.assign(salted_rank=np.arange(len(df), dtype=np.int32))
    return df


def _cumcount(codes: np.ndarray) -> np.ndarray:
    """Vectorized per-key running count over rows IN ORDER (the
    pandas groupby(...).cumcount() contract)."""
    perm = np.argsort(codes, kind="stable")
    sc = codes[perm]
    starts = np.r_[0, np.flatnonzero(np.diff(sc)) + 1]
    sizes = np.diff(np.r_[starts, len(sc)])
    within = np.arange(len(sc), dtype=np.int64) - np.repeat(starts, sizes)
    out = np.empty(len(codes), dtype=np.int64)
    out[perm] = within
    return out


def rank_groups_coarse(t: pa.Table) -> pa.Table:
    """Stage 1 over ONE coarse group holding many real (host, salt)
    keys: identical ranks to per-key :func:`rank_group` (stable sort +
    per-key cumcount), but the shuffle fans out over ≤ coarse_k groups
    instead of the unbounded live-host count."""
    pri = t.column("priority").to_numpy(zero_copy_only=False)
    ok = t.column("ord_key").to_numpy(zero_copy_only=False)
    order = np.lexsort((ok, -pri))     # (-priority, ord_key) ascending
    t = t.take(pa.array(order))
    host = t.column("host").to_numpy(zero_copy_only=False)
    salt = t.column("salt").to_numpy(zero_copy_only=False)
    _, hcode = np.unique(host, return_inverse=True)
    key = hcode.astype(np.int64) * (int(salt.max()) + 1 if len(salt) else 1)         + salt.astype(np.int64)
    return t.append_column(
        "salted_rank", pa.array(_cumcount(key).astype(np.int32)))


def exact_admit_group(df: pd.DataFrame) -> pd.DataFrame:
    """Stage 2 (within host, stage-1 survivors): exact queue_pos + admit."""
    df = df.sort_values(["priority", "ord_key"], ascending=[False, True])
    df = df.assign(queue_pos=np.arange(len(df), dtype=np.int32))
    df = df.assign(admit=df["queue_pos"].to_numpy() < df["limit"].to_numpy())
    return df


def exact_admit_groups_coarse(t: pa.Table) -> pa.Table:
    """Stage 2 over ONE coarse group holding many real hosts — same
    queue_pos/admit as per-host :func:`exact_admit_group`."""
    pri = t.column("priority").to_numpy(zero_copy_only=False)
    ok = t.column("ord_key").to_numpy(zero_copy_only=False)
    order = np.lexsort((ok, -pri))
    t = t.take(pa.array(order))
    host = t.column("host").to_numpy(zero_copy_only=False)
    _, hcode = np.unique(host, return_inverse=True)
    qp = _cumcount(hcode.astype(np.int64)).astype(np.int32)
    t = t.append_column("queue_pos", pa.array(qp))
    return t.append_column(
        "admit", pa.array(
            qp < t.column("limit").to_numpy(zero_copy_only=False)))


def admit_table_driver(table: pa.Table, robots: dict, per_host_budget: int,
                       global_budget: int) -> tuple[pd.DataFrame, pd.DataFrame, int]:
    """Driver fast path over one in-memory frontier table.

    Returns (admitted_df with queue_pos, deferred_df, robots_denied).
    Identical result to the distributed path (tested equal).
    """
    df = table.to_pandas()
    n0 = len(df)
    # robots filter + limit
    keep = np.ones(n0, dtype=bool)
    limits = np.empty(n0, dtype=np.int32)
    get = robots.get
    hosts = df["host"].to_numpy()
    canons = df["canon"].to_numpy()
    for i in range(n0):
        delay, disallow = get(hosts[i], (0, ()))
        if disallow and not robots_allows(canon_path(canons[i]), disallow):
            keep[i] = False
        limits[i] = host_admission_limit(per_host_budget, delay)
    denied = int(n0 - keep.sum())
    df = df.loc[keep].assign(limit=limits[keep])
    # per-host rank
    df = df.sort_values(["priority", "ord_key"], ascending=[False, True])
    df = df.assign(queue_pos=df.groupby("host").cumcount().astype(np.int32))
    admit = df["queue_pos"].to_numpy() < df["limit"].to_numpy()
    admitted = df.loc[admit]
    deferred = df.loc[~admit]
    # global cap — admitted is already (-priority, ord_key)-sorted
    if len(admitted) > global_budget:
        cut = admitted.iloc[global_budget:]
        admitted = admitted.iloc[:global_budget]
        deferred = pd.concat([deferred, cut])
    return admitted, deferred, denied
