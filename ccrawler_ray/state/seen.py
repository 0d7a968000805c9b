"""A1 — URL-seen membership: a sharded filter held in a Ray actor pool.

BASELINE.json: "URL-seen membership is a sharded bloom/cuckoo filter
held in an actor pool keyed by canonicalized-URL hash". Reference locus
(mount empty, SURVEY.md §0.1): the URL dedup cache.

Design
------
``SeenShard`` actors, shard = ``url_hash % num_shards`` (uniform by
construction of the hash). Each shard holds:

* an **exact dict** ``url_hash -> (canon, first ord_key)`` — the
  authoritative membership at sandbox scale, also what the checkpoint
  dumps;
* a **bloom filter** (numpy bitset, k hash probes derived from the
  64-bit key) sized for the configured capacity — the scale path: at
  10^10 URLs the exact dict is replaced by the bloom (≈12 bits/URL at
  1% FP ≈ 15 GB across 64 shards, SURVEY.md §4.1) with the exact dict
  retained only per-shard-sampled for FP auditing.

``check_and_add`` is atomic per shard (actor = single-threaded), so
first-wins semantics need no locking; within a generation the caller
has already deduplicated candidates (D1), so no same-key race exists
across concurrent batches.

Routing is key-affine: callers partition each batch by
``url_hash % num_shards`` and issue one ``check_and_add`` per touched
shard (NOT an anonymous map_batches pool).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ccrawler_ray.spec import SEEN_SCHEMA

BLOOM_BITS_PER_KEY = 12
BLOOM_PROBES = 7

# Approximate-authority mode (exact=False): the exact dict is kept only
# for a 1-in-AUDIT_STRIDE hash-sampled stratum, used to MEASURE the
# realized false-positive rate (filter says seen, stratum dict says
# new) instead of trusting the design math.
AUDIT_STRIDE = 64


class _Bloom:
    """Minimal blocked bloom over uint64 keys; vectorized probes."""

    def __init__(self, capacity: int):
        nbits = max(1024, int(capacity * BLOOM_BITS_PER_KEY))
        self.nbits = np.uint64(nbits)
        self.bits = np.zeros((nbits + 63) // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        # double hashing: h1 + i*h2 (Kirsch–Mitzenmacher), all vectorized
        h1 = keys
        h2 = (keys >> np.uint64(33)) | np.uint64(1)
        i = np.arange(BLOOM_PROBES, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % self.nbits  # (k, n)

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys)
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).ravel(),
                         np.uint64(1) << (pos.ravel() & np.uint64(63)))

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        word = self.bits[pos >> np.uint64(6)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits.view(np.uint8)).mean())


CUCKOO_BUCKET = 4          # slots per bucket (standard 4-way)
CUCKOO_MAX_KICKS = 500     # bounded eviction chain before overflow


class _Cuckoo:
    """Cuckoo filter over uint64 keys — the other half of the
    "bloom/cuckoo" scale path: ~16 bits/URL at <1% FP like the bloom,
    but SUPPORTS DELETION (a crawl that re-queues or expires URLs can
    retract membership; a bloom cannot). 4-slot buckets, 16-bit
    fingerprints, partial-key eviction with a bounded kick chain and a
    deterministic per-shard RNG; keys that exhaust the chain land in
    an exact overflow set (never a false negative)."""

    def __init__(self, capacity: int, seed: int = 0):
        nb = 1
        while nb * CUCKOO_BUCKET < capacity * 1.1:
            nb <<= 1
        self.nbuckets = nb
        self.mask = np.uint64(nb - 1)
        self.slots = np.zeros((nb, CUCKOO_BUCKET), dtype=np.uint16)
        self.overflow: set[int] = set()
        self._rng = np.random.default_rng(0xC0C0 + seed)
        self.n_items = 0

    @staticmethod
    def _fp(key: np.uint64) -> np.uint16:
        f = np.uint16((int(key) >> 48) & 0xFFFF)
        return f if f else np.uint16(1)

    def _i2(self, i1: int, fp: np.uint16) -> int:
        return int((np.uint64(i1)
                    ^ (np.uint64(fp) * np.uint64(0x5BD1E995))) & self.mask)

    def add(self, keys: np.ndarray) -> None:
        for k in keys.tolist():
            key = np.uint64(k)
            fp = self._fp(key)
            i1 = int(key & self.mask)
            i2 = self._i2(i1, fp)
            placed = False
            for b in (i1, i2):
                row = self.slots[b]
                empty = np.nonzero(row == 0)[0]
                if len(empty):
                    row[empty[0]] = fp
                    placed = True
                    break
            if not placed:
                b, cur = (i1 if self._rng.integers(2) else i2), fp
                for _ in range(CUCKOO_MAX_KICKS):
                    s = int(self._rng.integers(CUCKOO_BUCKET))
                    cur, self.slots[b, s] = self.slots[b, s], cur
                    b = self._i2(b, cur)
                    row = self.slots[b]
                    empty = np.nonzero(row == 0)[0]
                    if len(empty):
                        row[empty[0]] = cur
                        placed = True
                        break
                if not placed:
                    # evicted fingerprint has no home: keep it exactly
                    self.overflow.add(int(cur))
            self.n_items += 1

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        out = np.empty(len(keys), dtype=bool)
        for i, k in enumerate(keys.tolist()):
            key = np.uint64(k)
            fp = self._fp(key)
            i1 = int(key & self.mask)
            i2 = self._i2(i1, fp)
            out[i] = (bool((self.slots[i1] == fp).any())
                      or bool((self.slots[i2] == fp).any())
                      or int(fp) in self.overflow)
        return out

    def remove(self, keys: np.ndarray) -> np.ndarray:
        """Delete one fingerprint copy per key; returns found mask —
        the operation a bloom cannot offer."""
        out = np.zeros(len(keys), dtype=bool)
        for i, k in enumerate(keys.tolist()):
            key = np.uint64(k)
            fp = self._fp(key)
            i1 = int(key & self.mask)
            i2 = self._i2(i1, fp)
            for b in (i1, i2):
                hit = np.nonzero(self.slots[b] == fp)[0]
                if len(hit):
                    self.slots[b, hit[0]] = 0
                    out[i] = True
                    break
            else:
                if int(fp) in self.overflow:
                    self.overflow.discard(int(fp))
                    out[i] = True
            if out[i]:
                self.n_items -= 1
        return out

    def fill_ratio(self) -> float:
        return float((self.slots != 0).mean())


@ray.remote(num_cpus=0.05)
class SeenShard:
    """One shard of the URL-seen pool. max_restarts=0: state is restored
    from checkpoint dumps, not by Ray restart (SURVEY.md §4.5)."""

    def __init__(self, shard_id: int, capacity: int = 1_000_000,
                 exact: bool = True, membership: str = "bloom"):
        self.shard_id = shard_id
        # exact=True (default): the dict is AUTHORITATIVE membership and
        #   the filter rides alongside (G5 cardinality, scale probes).
        # exact=False: the FILTER is authoritative — the 10^10-URL mode
        #   (no per-URL python dict entry; ~12-16 bits/URL). The dict
        #   keeps only the 1/AUDIT_STRIDE hash stratum for FP auditing.
        #   Semantics vs exact mode: a filter false positive drops a
        #   genuinely-new URL (fetched set ⊆ exact run, never a dup
        #   fetch); the exact-mode task-retry re-check (same canon,
        #   same ord_key ⇒ fresh again) is unnecessary here because
        #   offers collapse in resolve()'s min-key D1 before the probe.
        self.exact = exact
        self.table: dict[int, tuple[str, str]] = {}
        # "bloom" (default) or "cuckoo" — functionally equivalent probe
        # (approximate, no false negatives); cuckoo adds deletion
        self.bloom = (_Cuckoo(capacity, seed=shard_id)
                      if membership == "cuckoo" else _Bloom(capacity))
        self._pending: list[pa.Table] = []
        self.audit_probes = 0   # stratum candidates probed (approx mode)
        self.audit_fps = 0      # filter said seen, stratum dict said new

    def _approx_filter(self, url_hashes: np.ndarray, canons: list[str],
                       ord_keys: list[str]) -> np.ndarray:
        """Filter-authoritative first-wins: fresh = not in filter, with
        in-call duplicates collapsed to their first occurrence. Updates
        the filter and the sampled audit stratum."""
        contained = self.bloom.might_contain(url_hashes)
        first = np.zeros(len(url_hashes), dtype=bool)
        first[np.unique(url_hashes, return_index=True)[1]] = True
        fresh = ~contained & first
        # FP audit on the hash-sampled stratum (exact ground truth kept
        # only there): filter-positive but stratum-dict-absent = FP
        stratum = (url_hashes % np.uint64(AUDIT_STRIDE)) == 0
        for i in np.nonzero(stratum & first)[0]:
            h = int(url_hashes[i])
            self.audit_probes += 1
            if contained[i] and h not in self.table:
                self.audit_fps += 1
            if h not in self.table:
                self.table[h] = (canons[i], ord_keys[i])
        if fresh.any():
            self.bloom.add(url_hashes[fresh])
        return fresh

    def check_and_add(self, url_hashes: np.ndarray, canons: list[str],
                      ord_keys: list[str]) -> np.ndarray:
        """First-wins membership: returns bool mask of FRESH rows and
        registers them. Bloom is maintained alongside the exact dict;
        with exact=False the filter alone decides (scale mode)."""
        if not self.exact:
            return self._approx_filter(url_hashes, canons, ord_keys)
        fresh = np.zeros(len(canons), dtype=bool)
        table = self.table
        for i, (h, c, k) in enumerate(zip(url_hashes.tolist(), canons, ord_keys)):
            cur = table.get(h)
            if cur is None:
                table[h] = (c, k)
                fresh[i] = True
            elif cur[1] == k:
                # idempotent re-check (Ray task retry): same row, same answer
                fresh[i] = True
        if fresh.any():
            self.bloom.add(url_hashes[fresh])
        return fresh

    def might_contain(self, url_hashes: np.ndarray) -> np.ndarray:
        """Bloom-only probe (scale path; may false-positive, never
        false-negative)."""
        return self.bloom.might_contain(url_hashes)

    # -- two-phase candidate intake (actor-frontier mode) -------------
    # offer() accumulates candidate rows during a generation (from any
    # number of concurrent map tasks, any arrival order); resolve() at
    # the generation barrier picks min-ord_key per canon (D1), drops
    # already-seen, registers the rest, and returns the fresh rows —
    # deterministic regardless of offer order, idempotent under task
    # retry (duplicate offers collapse in the min-key resolution).

    def offer(self, table: pa.Table) -> int:
        self._pending.append(table)
        return table.num_rows

    def resolve(self) -> pa.Table:
        pending: list[pa.Table] = self._pending
        self._pending = []
        if not pending:
            return None  # caller treats as empty
        import pandas as pd  # noqa: PLC0415
        import pyarrow.compute as pc  # noqa: PLC0415

        cand = pa.concat_tables(pending).combine_chunks()
        # D1 first-wins: sort by ord_key, keep first occurrence per
        # canon. Arrow-native except the single-column duplicated()
        # (no full-table pandas round-trip).
        order = pc.sort_indices(cand.column("ord_key"))
        cand = cand.take(order)
        first = ~pd.Series(cand.column("canon").to_pandas()).duplicated().to_numpy()
        cand = cand.filter(pa.array(first))
        table = self.table
        hashes = cand.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        if not self.exact:
            # scale mode: the filter alone decides (offers already
            # collapsed to min-ord_key per canon above, so the exact
            # path's retry re-check is unnecessary here)
            fresh_mask = self._approx_filter(
                hashes, cand.column("canon").to_pylist(),
                cand.column("ord_key").to_pylist())
            return cand.filter(pa.array(fresh_mask))
        # vectorized membership against the existing key set; the
        # (rare) already-seen rows get the exact idempotent re-check
        if table:
            existing = np.fromiter(table.keys(), dtype=np.uint64, count=len(table))
            seen_mask = np.isin(hashes, existing)
        else:
            seen_mask = np.zeros(len(hashes), dtype=bool)
        fresh_mask = ~seen_mask
        if seen_mask.any():
            keys = cand.column("ord_key").to_pylist()
            for i in np.nonzero(seen_mask)[0]:
                cur = table.get(int(hashes[i]))
                if cur is not None and cur[1] == keys[i]:
                    fresh_mask[i] = True  # task-retry idempotency
        new_idx = np.nonzero(fresh_mask & ~seen_mask)[0]
        if len(new_idx):
            sub = cand.take(pa.array(new_idx))
            table.update(
                zip(
                    sub.column("url_hash").to_numpy(zero_copy_only=False)
                    .astype(np.uint64).tolist(),
                    zip(sub.column("canon").to_pylist(),
                        sub.column("ord_key").to_pylist()),
                )
            )
        fresh = cand.filter(pa.array(fresh_mask))
        if fresh.num_rows:
            self.bloom.add(
                fresh.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
            )
        return fresh

    def resolve_and_route(self, politeness_parts: list,
                          num_partitions: int) -> tuple[int, int]:
        """resolve() + push fresh rows DIRECTLY to their owning
        politeness partition actors (shard→partition, no driver hop).
        Returns (offered_rows, fresh_rows) for this shard — offered is
        the generation's validated-candidate count (the metric the
        fused offer stage no longer tallies driver-side)."""
        from ccrawler_ray.state.politeness import host_partition

        offered = sum(t.num_rows for t in self._pending)
        fresh = self.resolve()
        if fresh is None or fresh.num_rows == 0:
            return offered, 0
        cache = getattr(self, "_hp_cache", None)
        if cache is None:
            cache = self._hp_cache = {}
        hosts = fresh.column("host").to_pylist()
        pids = np.empty(len(hosts), dtype=np.int64)
        for i, h in enumerate(hosts):
            p = cache.get(h)
            if p is None:
                p = host_partition(h, num_partitions)
                cache[h] = p
            pids[i] = p
        refs = [
            politeness_parts[int(p)].offer_frontier.remote(
                fresh.take(pa.array(np.nonzero(pids == p)[0]))
            )
            for p in np.unique(pids)
        ]
        ray.get(refs)
        return offered, fresh.num_rows

    def dump(self) -> pa.Table:
        """Checkpoint dump of the exact membership (SEEN_SCHEMA)."""
        hashes = np.fromiter(self.table.keys(), dtype=np.uint64, count=len(self.table))
        canons, keys = [], []
        for c, k in self.table.values():
            canons.append(c)
            keys.append(k)
        return pa.Table.from_arrays(
            [
                pa.array(hashes, type=pa.uint64()),
                pa.array(canons, type=pa.string()),
                pa.array(np.full(len(canons), self.shard_id, dtype=np.uint16)),
                pa.array(keys, type=pa.string()),
            ],
            schema=SEEN_SCHEMA,
        )

    def restore(self, table: pa.Table) -> int:
        """Rehydrate from a checkpoint dump. In approx mode only the
        audit stratum goes back into the dict; full membership is
        rehydrated via :meth:`restore_filter`."""
        hashes = table.column("url_hash").to_numpy(zero_copy_only=False)
        canons = table.column("canon").to_pylist()
        keys = table.column("first_key").to_pylist()
        for h, c, k in zip(hashes.tolist(), canons, keys):
            if self.exact or h % AUDIT_STRIDE == 0:
                self.table[h] = (c, k)
        if self.exact and len(hashes):
            self.bloom.add(hashes.astype(np.uint64))
        return len(self.table)

    def dump_filter(self) -> bytes:
        """Snapshot the approximate filter state (checkpointing in
        filter-authoritative mode — the dict dump covers only the audit
        stratum there). Not re-routable across a shard-count change:
        the caller must restore onto the SAME num_shards."""
        import pickle

        b = self.bloom
        if isinstance(b, _Cuckoo):
            payload = ("cuckoo", b.nbuckets, b.slots.tobytes(),
                       sorted(b.overflow), b.n_items,
                       self.audit_probes, self.audit_fps)
        else:
            payload = ("bloom", int(b.nbits), b.bits.tobytes(),
                       self.audit_probes, self.audit_fps)
        return pickle.dumps(payload)

    def restore_filter(self, blob: bytes) -> None:
        import pickle

        p = pickle.loads(blob)
        b = self.bloom
        if p[0] == "cuckoo":
            assert isinstance(b, _Cuckoo) and b.nbuckets == p[1], \
                "cuckoo filter snapshot shape mismatch"
            b.slots = np.frombuffer(p[2], dtype=np.uint16).reshape(
                b.nbuckets, CUCKOO_BUCKET).copy()
            b.overflow = set(p[3])
            b.n_items = p[4]
            self.audit_probes, self.audit_fps = p[5], p[6]
        else:
            assert isinstance(b, _Bloom) and int(b.nbits) == p[1], \
                "bloom filter snapshot shape mismatch"
            b.bits = np.frombuffer(p[2], dtype=np.uint64).copy()
            self.audit_probes, self.audit_fps = p[3], p[4]

    def stats(self) -> dict:
        b = self.bloom
        if isinstance(b, _Cuckoo):
            mem = int(b.slots.nbytes) + 8 * len(b.overflow)
            bits = int(b.nbuckets * CUCKOO_BUCKET * 16)
        else:
            mem = int(b.bits.nbytes)
            bits = int(b.nbits)
        return {
            "shard": self.shard_id,
            "kind": "cuckoo" if isinstance(b, _Cuckoo) else "bloom",
            "size": len(self.table),
            "n_items": int(getattr(b, "n_items", -1)),
            "bloom_fill": b.fill_ratio(),
            "bloom_bits": bits,
            "filter_mem_bytes": mem,
            "audit_probes": self.audit_probes,
            "audit_fps": self.audit_fps,
        }


class SeenPool:
    """Driver-side handle over the shard actors (key-affine routing)."""

    def __init__(self, num_shards: int, capacity_per_shard: int = 1_000_000,
                 membership: str = "exact"):
        """membership: "exact" (dict authoritative, bloom alongside) |
        "bloom" | "cuckoo" (filter authoritative — the 10^10 mode; the
        dict keeps only the 1/AUDIT_STRIDE FP-audit stratum)."""
        if membership not in ("exact", "bloom", "cuckoo"):
            raise ValueError(f"unknown seen membership mode {membership!r}")
        self.num_shards = num_shards
        self.membership = membership
        exact = membership == "exact"
        kind = "bloom" if exact else membership
        self.shards = [
            SeenShard.remote(i, capacity_per_shard, exact=exact,
                             membership=kind)
            for i in range(num_shards)
        ]

    def dump_tables(self) -> list[pa.Table]:
        return ray.get([s.dump.remote() for s in self.shards])

    def dump_filters(self) -> list[bytes]:
        """Filter snapshots (approx-mode checkpointing)."""
        return ray.get([s.dump_filter.remote() for s in self.shards])

    def restore_filters(self, blobs: list[bytes]) -> None:
        if len(blobs) != self.num_shards:
            raise ValueError(
                f"filter snapshots are shard-affine: got {len(blobs)} "
                f"blobs for {self.num_shards} shards")
        ray.get([
            s.restore_filter.remote(b)
            for s, b in zip(self.shards, blobs)
        ])

    def restore_from_table(self, table: pa.Table) -> None:
        """Rehydrate by re-routing rows on url_hash % num_shards — robust
        to a different shard count than the dumping run's."""
        hashes = table.column("url_hash").to_numpy(zero_copy_only=False)
        sid = hashes % np.uint64(self.num_shards)
        refs = []
        for s in range(self.num_shards):
            idx = np.nonzero(sid == s)[0]
            if len(idx):
                refs.append(self.shards[s].restore.remote(table.take(pa.array(idx))))
        ray.get(refs)

    def total_size(self) -> int:
        return sum(s["size"] for s in ray.get([sh.stats.remote() for sh in self.shards]))

    def estimated_cardinality(self) -> float:
        """G5: bloom fill-rate → cardinality estimate, merged across
        shards (n ≈ -(m/k)·ln(1 - fill) per shard; exact dicts are
        dropped at 10^10 scale, this estimate remains)."""
        import math

        stats = ray.get([sh.stats.remote() for sh in self.shards])
        est = 0.0
        for s in stats:
            if s.get("kind") == "cuckoo":
                # cuckoo counts items exactly as it inserts
                est += max(0, s["n_items"])
                continue
            fill = min(s["bloom_fill"], 0.999999)
            m = s["bloom_bits"]
            est += -(m / BLOOM_PROBES) * math.log(1.0 - fill)
        return est

    def kill(self) -> None:
        for s in self.shards:
            ray.kill(s)
