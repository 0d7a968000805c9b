"""The generation-loop crawl engine (SURVEY.md §3.3) — Ray-Data-native.

Per generation g:
  1. admission      groupby(host[,salt]) rank/limit + robots + global cap
  2. fetch          map_batches corpus resolve (zero-copy Arrow)
  3. extract        map_batches span/outlink extraction (docs_out)
  4. discover       map_batches canonicalize/validate/score children
  5. dedup D1       groupby(url_hash) first-wins by ord_key
  6. seen A1        shard-routed check_and_add against the actor pool
  7. frontier_{g+1} = deferred ∪ fresh; checkpoint; loop.

THREE admission modes share the same frozen pure math
(``pipelines.admission``), all pinned to the serial oracle:

* ``driver``      — pandas fast path for frontiers below
  ``driver_threshold`` rows (distributed shuffles cost more than they
  parallelize at that size — same cutoff idea as a broadcast join
  threshold);
* ``distributed`` — groupby(host, salt) shuffle ranking with explicit
  hot-host salting (§4.3): the "per-host priority queue materialized
  via groupby→aggregate→sort shuffles" design named in BASELINE.json;
* ``actor``       — the frontier LIVES sharded in the politeness
  partition actors (per-host queues, host→partition affinity);
  admission ranks in parallel per partition, candidates dedup/register
  via two-phase offer/resolve in the seen shards, and fresh rows route
  shard→partition without touching the driver. Per-generation cost is
  O(admitted)+O(fresh), never O(frontier) — the 10^10-frontier path.

State: SeenPool shard actors (A1), PolitenessPool partition actors
(A2/A3, plus the actor-mode queues), and the driver's generation
counter — everything else is recomputable dataflow, checkpointed every
generation (SURVEY.md §4.5).
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ccrawler_ray import storage
from ccrawler_ray.config import CrawlConfig
from ccrawler_ray.pipelines.admission import (
    admit_table_driver,
    exact_admit_groups_coarse,
    get_broadcast,
    rank_groups_coarse,
    robots_salt_batch,
)
from ccrawler_ray.spec import (
    FRONTIER_SCHEMA,
    METRICS_SCHEMA,
    seed_ord_key,
)
from ccrawler_ray.stages.discover import CANDIDATE_SCHEMA, make_discover_fn
from ccrawler_ray.stages.extract import explode_children, extract_docs
from ccrawler_ray.stages.fetch import FetchActor
from ccrawler_ray.state.politeness import PolitenessPool, load_robots_ds
from ccrawler_ray.state.seen import SeenPool

FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA]

DUMP_COLS = ["generation", "host", "queue_pos", "ord_key", "canon", "status", "fetch_ts_us"]


@ray.remote(num_cpus=0.25)
def _project_dump(*blocks) -> pd.DataFrame | None:
    """Narrow dump projection of a handful of materialized blocks,
    worker-side — one task round trip per ~4 blocks replaces the
    per-generation ``select_columns().to_pandas()`` Dataset execution
    (executor startup was pure stepped-regime fixed cost; one task per
    BLOCK cost ~24 ms/call in scheduling latency once the fused stage
    went per-block, round 4)."""
    parts = [b.select(DUMP_COLS).to_pandas() for b in blocks if b.num_rows]
    if not parts:
        return None
    return pd.concat(parts, ignore_index=True)


def _launch_dump(fused, blocks_per_task: int = 4) -> list:
    """Fire the dump-projection tasks without blocking (the driver
    overlaps them with the shard resolve RPCs)."""
    refs = [r for b in fused.iter_internal_ref_bundles()
            for r in b.block_refs]
    return [_project_dump.remote(*refs[o: o + blocks_per_task])
            for o in range(0, len(refs), blocks_per_task)]


def _collect_dump(task_refs: list) -> pd.DataFrame:
    parts = [p for p in ray.get(task_refs) if p is not None]
    if not parts:
        return pd.DataFrame(columns=DUMP_COLS)
    return pd.concat(parts, ignore_index=True)

# per-worker-process fetch index cache (see stages/fetch.py docstring:
# immutable broadcast state — cached once per reused worker process,
# equivalent to an actor pool without per-generation pool churn)
_FETCH_CACHE: dict = {}


def _fetch_fn_factory(corpus_ref, delays_ref, failure_rate: float = 0.0):
    if corpus_ref is None:
        return None  # semi-join fetch path; no broadcast index exists

    def fetch_batch(batch: pa.Table) -> pa.Table:
        key = corpus_ref.hex()
        actor = _FETCH_CACHE.get(key)
        if actor is None:
            # cap at 2 live indices: stale indices from prior engines
            # bloat reused worker heaps (big idle heaps measurably
            # slow later allocator-heavy pipelines, 2.7x on the LSH
            # kernels — see release_worker_caches), but TWO slots keep
            # a pair of interleaved engines from evicting each other
            # per batch
            if len(_FETCH_CACHE) >= 2:
                _FETCH_CACHE.clear()
            actor = FetchActor(corpus_ref, delays_ref, failure_rate)
            _FETCH_CACHE[key] = actor
        return actor(batch)

    return fetch_batch


def release_worker_caches(num_tasks: int = 256) -> None:
    """Drop the per-worker broadcast caches (fetch index, admission
    broadcasts) across the session's reused Ray Data worker processes.

    The caches are the right call WHILE a crawl runs (corpus index
    deserialized once per worker, not once per batch), but a finished
    crawl leaves ~corpus-sized idle heaps in every worker, which slows
    subsequent unrelated pipelines (measured 2.7x on the LSH dedup
    kernels). Call between jobs in a shared session — bench.py does
    after its crawl phase. A scatter map over many tiny blocks reaches
    (with high probability) every worker; gc returns the pages."""
    import gc

    from ccrawler_ray.pipelines import admission as _adm

    def clear(batch: pa.Table) -> pa.Table:
        _FETCH_CACHE.clear()
        _adm._BCAST_CACHE.clear()
        gc.collect()
        return batch

    ray.data.range(num_tasks * 4, override_num_blocks=num_tasks) \
        .map_batches(clear, batch_size=1, batch_format="pyarrow") \
        .materialize()


def _add_uh_salt(batch: pa.Table) -> pa.Table:
    """Coarse D1 shuffle key: url_hash % 256 — Ray map_groups pays
    per-GROUP task overhead, so one group per distinct URL collapses at
    high cardinality (~1.4 ms per distinct key, measured). Real keys dedup inside
    each coarse group."""
    h = batch.column("url_hash").to_numpy(zero_copy_only=False)
    return batch.append_column(
        "uh_salt", pa.array((h % np.uint64(256)).astype(np.int32))
    )


def _dedup_salted_group(t: pa.Table) -> pa.Table:
    """D1 within one coarse salt group: first-wins by min ord_key per
    canon (canon ↔ url_hash 1:1 up to the astronomically-unlikely
    64-bit collision, which keying on canon guards)."""
    ok = t.column("ord_key").to_numpy(zero_copy_only=False)
    t = t.take(pa.array(np.argsort(ok, kind="stable")))
    canon = t.column("canon").to_numpy(zero_copy_only=False)
    first = np.sort(np.unique(canon, return_index=True)[1])
    return t.take(pa.array(first)).drop_columns(["uh_salt"])


def _hot_hosts(frontier_ds, threshold: int, salt_k: int) -> list[str]:
    """Hosts with more than ``threshold`` frontier rows, computed as
    per-batch partial counts + ONE salted (host-hash % k) sum with the
    threshold applied inside the group fn — the driver only ever sees
    the hot hosts themselves (a tiny set by definition), never a row
    per live host. Each batch appends a sentinel row ("" , 0) so empty
    filter results keep a typed schema through the shuffle."""
    from ccrawler_ray.spec import hash64_batch

    def partial(batch: pa.Table) -> pa.Table:
        hosts = np.asarray(batch.column("host").to_pylist(), dtype=object)
        uniq, cnt = np.unique(hosts, return_counts=True)
        hh = (hash64_batch(list(uniq)) % np.uint64(salt_k)
              if len(uniq) else np.empty(0, np.uint64))
        return pa.table({
            "host": pa.array(list(uniq) + [""], pa.string()),
            "c": pa.array(np.r_[cnt, [0]].astype(np.int64)),
            "hh_salt": pa.array(np.r_[hh, [0]].astype(np.int32))})

    def reduce_hot(t: pa.Table) -> pa.Table:
        hosts = np.asarray(t.column("host").to_pylist(), dtype=object)
        uniq, inv = np.unique(hosts, return_inverse=True)
        tot = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tot, inv, t.column("c").to_numpy(zero_copy_only=False))
        m = (tot > threshold) & (uniq != "")
        return pa.table({"host": pa.array(list(uniq[m]), pa.string())})

    hot = (frontier_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("hh_salt").map_groups(reduce_hot,
                                          batch_format="pyarrow")
           ).to_pandas()
    # all-groups-empty result loses its schema (tiny-input lore):
    # no "host" column just means no hot hosts
    return hot["host"].tolist() if "host" in hot.columns else []


def make_seen_filter(shards):
    """A1 routing: partition each batch by url_hash % S, one
    check_and_add RPC per touched shard (key-affine, atomic per shard)."""
    num_shards = len(shards)

    def seen_filter(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        h = batch.column("url_hash").to_numpy(zero_copy_only=False)
        canons = batch.column("canon").to_pylist()
        keys = batch.column("ord_key").to_pylist()
        sid = (h % num_shards).astype(np.int64)
        mask = np.zeros(n, dtype=bool)
        futs, idxs = [], []
        for s in np.unique(sid):
            idx = np.nonzero(sid == s)[0]
            futs.append(
                shards[int(s)].check_and_add.remote(
                    h[idx], [canons[i] for i in idx], [keys[i] for i in idx]
                )
            )
            idxs.append(idx)
        for idx, fresh in zip(idxs, ray.get(futs)):
            mask[idx] = fresh
        return batch.filter(pa.array(mask))

    return seen_filter


@dataclasses.dataclass
class CrawlResult:
    docs_out: "ray.data.Dataset"
    crawl_order: pd.DataFrame          # sorted dump (bounded: audit log)
    seen: pa.Table
    domain_state: pa.Table
    metrics: pa.Table
    generations_run: int


class CrawlEngine:
    def __init__(
        self,
        corpus,                     # path to parquet (file or dir) | pa.Table
        cfg: CrawlConfig,
        ckpt_dir: str | None = None,
        driver_threshold: int = 100_000,
        extra_stages: list | None = None,
        audit_in_memory_max_rows: int = 2_000_000,
    ):
        self.cfg = cfg
        self.ckpt_dir = ckpt_dir
        self.driver_threshold = driver_threshold
        self.extra_stages = extra_stages or []  # §2.10 Stage protocol
        self.audit_in_memory_max_rows = audit_in_memory_max_rows

        # ---- corpus-size seam (SURVEY §4.2): above the broadcast
        # threshold the corpus NEVER passes through the driver — it is
        # streamed and probed by the admitted set (fetch_via_semi_join)
        self.fetch_mode = cfg.fetch_mode
        if isinstance(corpus, (str, Path)):
            cpath = Path(corpus)
            nbytes = (
                sum(f.stat().st_size for f in cpath.rglob("*.parquet"))
                if cpath.is_dir() else cpath.stat().st_size
            )
            if self.fetch_mode == "auto":
                self.fetch_mode = (
                    "semi_join" if nbytes > cfg.broadcast_corpus_max_bytes
                    else "broadcast"
                )
            if self.fetch_mode == "broadcast":
                corpus = pq.read_table(cpath)
            else:
                corpus = None
                # materialize: decode the (nested list<struct>) parquet
                # ONCE into object-store blocks, probed every
                # generation. Measured at 30x: re-decoding per
                # generation instead is 18x slower (2539 vs 137 s) and
                # does NOT reduce the ~200 GB spill high-water (that is
                # the per-generation streamed blocks, reclaimed at
                # session end). cfg.corpus_materialize_max_bytes keeps
                # the seam tunable for spill-disk-scarce deployments.
                self.corpus_ds = ray.data.read_parquet(str(cpath))
                if nbytes <= cfg.corpus_materialize_max_bytes:
                    self.corpus_ds = self.corpus_ds.materialize()
        elif self.fetch_mode == "auto":
            self.fetch_mode = "broadcast"  # in-memory table is small by definition
        self.corpus_table = corpus
        if corpus is not None:
            self.corpus_ds = ray.data.from_arrow(corpus)
        if self.fetch_mode == "broadcast":
            # broadcast once: lookup-ready arrays, zero-copy shared
            from ccrawler_ray.stages.fetch import prepare_fetch_data

            self.corpus_ref = prepare_fetch_data(corpus)
        else:
            self.corpus_ref = None
        robots, robots_texts = load_robots_ds(self.corpus_ds, with_text=True)
        self.robots = robots
        self.robots_ref = ray.put(robots)
        self.delays = {h: v[0] for h, v in robots.items()}
        self.delays_ref = ray.put(self.delays)
        self.seen_pool = SeenPool(
            cfg.num_seen_shards,
            capacity_per_shard=cfg.seen_capacity_per_shard,
            membership=cfg.seen_membership,
        )
        self.politeness = PolitenessPool(
            cfg.num_politeness_partitions, self.robots_ref, ray.put(robots_texts)
        )
        self._metrics: list[tuple] = []
        self._docs_out: list = []      # materialized per-gen docs_out Datasets
        self._dumps: list[pd.DataFrame] = []
        self._dump_rows = 0
        self._dump_spilled = False     # audit log spilled to checkpoints
        self._start_gen = 0
        self._frontier = None          # materialized Dataset (dataset modes)
        self._seeded = False           # actor mode: seeds/restore done
        self._phase_sec: dict = {}     # per-phase wall time (profiling)
        self._phase_hist: list = []    # (phase, sec) per generation, in order
        self._hp_cache: dict = {}      # host -> partition id cache

    # ------------------------------------------------------------------
    def _count(self, gen: int, stage: str, counter: str, value: int) -> None:
        self._metrics.append((gen, -1, stage, counter, int(value)))

    def _count_p(self, gen: int, partition: int, stage: str, counter: str,
                 value: int) -> None:
        """Per-partition metrics row (SURVEY §4.4 lineage) — emitted by
        the actor paths where a real partition/shard id exists."""
        self._metrics.append((gen, int(partition), stage, counter, int(value)))

    def _append_dump(self, dump: pd.DataFrame) -> None:
        """Audit-log admission: the in-memory crawl-order copy is
        BOUNDED — past audit_in_memory_max_rows (and with checkpoints
        on, which already persist crawl_order.parquet per generation)
        the in-memory copy is dropped and _result re-reads the
        checkpointed files instead. Driver RSS stays flat on long
        crawls (VERDICT r1 §wrong-6)."""
        self._dump_rows += len(dump)
        if (not self._dump_spilled and self.ckpt_dir is not None
                and self._dump_rows > self.audit_in_memory_max_rows):
            self._dumps = []
            self._dump_spilled = True
        if not self._dump_spilled:
            self._dumps.append(dump)

    # ------------------------------------------------------------------
    # fetch dispatch (broadcast | semi_join) + transient-retry requeue
    # ------------------------------------------------------------------

    @staticmethod
    def _collect_adm_table(adm_ds, gen: int) -> pa.Table:
        """Admitted rows (bounded by the global budget) as one table
        with the fetch_generation column."""
        tables = [t for t in ray.get(adm_ds.to_arrow_refs()) if t.num_rows]
        tbl = (pa.concat_tables(tables, promote_options="default")
               if tables else None)
        if tbl is None:
            return None
        return tbl.append_column(
            "fetch_generation", pa.array(np.full(tbl.num_rows, gen, dtype=np.int32))
        )

    def _run_fetch(self, adm_ds, gen: int, fetch_fn):
        """One generation's fetch, via the configured path."""
        cfg = self.cfg
        if self.fetch_mode == "broadcast":
            def add_gen(batch: pa.Table, _g=gen) -> pa.Table:
                return batch.append_column(
                    "fetch_generation",
                    pa.array(np.full(batch.num_rows, _g, dtype=np.int32)),
                )

            return adm_ds.map_batches(add_gen, batch_format="pyarrow").map_batches(
                fetch_fn, batch_format="pyarrow", batch_size=cfg.batch_size,
            ).materialize()
        # semi-join scale path: stream the corpus, probe the admitted set
        from ccrawler_ray.stages.fetch import fetch_via_semi_join, semi_join_misses

        adm_tbl = self._collect_adm_table(adm_ds, gen)
        hits_ds, _ = fetch_via_semi_join(
            self.corpus_ds, adm_tbl, self.delays, cfg.fetch_failure_rate
        )
        hits = hits_ds.materialize()
        hit_canons: set = set()
        for b in hits.iter_batches(batch_format="pyarrow", batch_size=8192):
            hit_canons.update(b.column("canon").to_pylist())
        misses = semi_join_misses(adm_tbl, hit_canons, self.delays)
        if misses.num_rows:
            return hits.union(ray.data.from_arrow(misses)).materialize()
        return hits

    def _requeue_transients(self, fetched, gen: int):
        """Transient (599) fetches: rebuild frontier rows with
        retries+1 and requeue (up to max_fetch_retries). Returns a
        FRONTIER_SCHEMA table (possibly empty).

        Note: a retry delays the page's outlink discovery, so other
        paths may first-discover its children with different ord_keys/
        depths than a failure-free run — the final REACHABLE SET is
        unchanged whenever the depth gate doesn't bind (tested), but
        per-URL lineage may differ. That is inherent retry semantics,
        not an engine artifact."""
        import pyarrow.compute as pc

        from ccrawler_ray.spec import STATUS_TRANSIENT, hash64_batch, priority_score

        failed_tbls = [
            t.filter(pc.equal(t.column("status"), STATUS_TRANSIENT))
            for t in ray.get(fetched.to_arrow_refs())
            if t.num_rows
        ]
        failed_tbls = [t for t in failed_tbls if t.num_rows]
        if not failed_tbls:
            return FRONTIER_SCHEMA.empty_table()
        f = pa.concat_tables(failed_tbls, promote_options="default")
        self._count(gen, "fetch", "status_599", f.num_rows)
        retries = f.column("retries").to_numpy(zero_copy_only=False).astype(np.int32) + 1
        keep = retries <= self.cfg.max_fetch_retries
        dropped = int((~keep).sum())
        if dropped:
            self._count(gen, "fetch", "retry_dropped", dropped)
        f = f.filter(pa.array(keep))
        if f.num_rows == 0:
            return FRONTIER_SCHEMA.empty_table()
        self._count(gen, "fetch", "retry_requeued", f.num_rows)
        canons = f.column("canon").to_pylist()
        hosts = f.column("host").to_pylist()
        depths = f.column("depth").to_numpy(zero_copy_only=False)
        keys = f.column("ord_key").to_pylist()
        prio = np.array([
            priority_score(int(d), h, "." not in k)  # seeds: single-segment key
            for d, h, k in zip(depths, hosts, keys)
        ])
        return pa.table(
            {
                "url": f.column("canon"),
                "canon": f.column("canon"),
                "url_hash": pa.array(hash64_batch(canons), pa.uint64()),
                "host": f.column("host"),
                "parent": pa.array([""] * f.num_rows, pa.string()),
                "depth": f.column("depth"),
                "priority": pa.array(prio, pa.float64()),
                "ord_key": f.column("ord_key"),
                "generation": pa.array(np.full(f.num_rows, gen + 1, dtype=np.int32)),
                "retries": pa.array(retries[keep], pa.int32()),
            },
            schema=FRONTIER_SCHEMA,
        )

    def _discover(self, candidates_ds, generation: int, n_hint: int):
        """Steps 4–6: canonicalize/validate → D1 dedup → seen filter.
        Returns a materialized frontier-schema Dataset of fresh rows."""
        cfg = self.cfg
        discovered = candidates_ds.map_batches(
            make_discover_fn(cfg.max_depth, generation), batch_format="pyarrow",
            batch_size=cfg.batch_size,
        ).materialize()
        n_disc = discovered.count()
        if n_disc == 0:
            return discovered
        deduped = (
            discovered.map_batches(_add_uh_salt, batch_format="pyarrow")
            .groupby("uh_salt")
            .map_groups(_dedup_salted_group, batch_format="pyarrow")
        )
        fresh = deduped.map_batches(
            make_seen_filter(self.seen_pool.shards), batch_format="pyarrow",
            batch_size=cfg.batch_size,
        ).materialize()
        self._count(generation, "discover", "validated", n_disc)
        self._count(generation, "discover", "fresh", fresh.count())
        return fresh

    def _seed_frontier(self):
        cfg = self.cfg
        seeds = pa.table(
            {
                "url": pa.array(list(cfg.seeds), pa.string()),
                "parent": pa.array([""] * len(cfg.seeds), pa.string()),
                "depth": pa.array(np.zeros(len(cfg.seeds), dtype=np.int32)),
                "ord_key": pa.array([seed_ord_key(i) for i in range(len(cfg.seeds))]),
                "is_seed": pa.array(np.ones(len(cfg.seeds), dtype=bool)),
            },
            schema=CANDIDATE_SCHEMA,
        )
        return self._discover(ray.data.from_arrow(seeds), 0, len(cfg.seeds))

    # ------------------------------------------------------------------
    def _admit_driver(self, frontier_table: pa.Table, gen: int):
        adm, deferred, denied = admit_table_driver(
            frontier_table, self.robots,
            self.cfg.per_host_budget_per_generation,
            self.cfg.global_budget_per_generation,
        )
        self._count(gen, "politeness", "robots_denied", denied)
        adm_ds = None
        if len(adm):
            # split into ~batch_size chunks: map parallelism == block
            # count, so a single from_arrow block would serialize the
            # fetch/extract stages into one task
            tbl = pa.Table.from_pandas(adm, preserve_index=False)
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            chunk = max(256, min(self.cfg.batch_size, -(-tbl.num_rows // (4 * ncpu))))
            parts = [tbl.slice(o, chunk) for o in range(0, tbl.num_rows, chunk)]
            adm_ds = ray.data.from_arrow(parts)
        def_tbl = pa.Table.from_pandas(
            deferred[FRONTIER_COLS], preserve_index=False
        ).cast(FRONTIER_SCHEMA)
        return adm_ds, ray.data.from_arrow(def_tbl)

    def _admit_distributed(self, frontier_ds, gen: int):
        cfg = self.cfg
        robots_ref = self.robots_ref
        # coarse shuffle fan-out: live-host cardinality is unbounded at
        # web scale and Ray's groupby collapses at high key counts —
        # both admission shuffles key on hash(host) % k (driver-pinned)
        # and rank the REAL (host, salt) keys inside the group fn
        from ccrawler_ray.scale import coarse_salt_k

        adm_k = coarse_salt_k()
        # hot-host detection: per-batch partial host counts → salted
        # sum → threshold filter IN the group fn, so the shuffle moves
        # (host, count) partials (distinct hosts per block, not rows)
        # and only the hot tail — not one row per live host — reaches
        # the driver. A raw groupby("host").count().to_pandas() here
        # was the last admission step keyed on unbounded cardinality.
        hot = frozenset(_hot_hosts(
            frontier_ds, cfg.hot_host_threshold, adm_k))
        if hot:
            self._count(gen, "admission", "salted_hosts", len(hot))

        def salt_fn(batch: pa.Table) -> pa.Table:
            robots = get_broadcast(robots_ref)
            return robots_salt_batch(
                batch, robots, hot, cfg.salt_factor,
                cfg.per_host_budget_per_generation, coarse_k=adm_k
            )

        salted = frontier_ds.map_batches(
            salt_fn, batch_format="pyarrow", batch_size=cfg.batch_size
        )
        ranked = salted.groupby("adm_g1").map_groups(
            rank_groups_coarse, batch_format="pyarrow"
        ).materialize()

        def cand_mask(batch: pa.Table) -> pa.Table:
            m = np.asarray(batch.column("salted_rank")) < np.asarray(batch.column("limit"))
            return batch.filter(pa.array(m))

        def defer1_mask(batch: pa.Table) -> pa.Table:
            m = np.asarray(batch.column("salted_rank")) >= np.asarray(batch.column("limit"))
            return batch.filter(pa.array(m)).select(FRONTIER_COLS)

        cand = ranked.map_batches(cand_mask, batch_format="pyarrow")
        defer1 = ranked.map_batches(defer1_mask, batch_format="pyarrow")
        final = cand.groupby("adm_g2").map_groups(
            exact_admit_groups_coarse, batch_format="pyarrow"
        ).materialize()

        def admit_mask(batch: pa.Table) -> pa.Table:
            return batch.filter(batch.column("admit"))

        def defer2_mask(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.invert(batch.column("admit"))).select(FRONTIER_COLS)

        admitted = final.map_batches(admit_mask, batch_format="pyarrow").materialize()
        defer2 = final.map_batches(defer2_mask, batch_format="pyarrow")
        n_adm = admitted.count()
        K = cfg.global_budget_per_generation
        defer3 = None
        if n_adm > K:
            # global cap: find the K-th (priority, ord_key) threshold by
            # streaming the sorted-limited prefix (never take_all)
            lim = admitted.sort(["priority", "ord_key"], descending=[True, False]).limit(K)
            last = None
            for b in lim.iter_batches(batch_format="pyarrow", batch_size=8192):
                if b.num_rows:
                    last = (b.column("priority")[-1].as_py(), b.column("ord_key")[-1].as_py())
            thr_p, thr_k = last

            def cap_keep(batch: pa.Table) -> pa.Table:
                p = np.asarray(batch.column("priority"))
                k = np.array(batch.column("ord_key").to_pylist())
                m = (p > thr_p) | ((p == thr_p) & (k <= thr_k))
                return batch.filter(pa.array(m))

            def cap_cut(batch: pa.Table) -> pa.Table:
                p = np.asarray(batch.column("priority"))
                k = np.array(batch.column("ord_key").to_pylist())
                m = (p > thr_p) | ((p == thr_p) & (k <= thr_k))
                return batch.filter(pa.array(~m)).select(FRONTIER_COLS)

            defer3 = admitted.map_batches(cap_cut, batch_format="pyarrow")
            admitted = admitted.map_batches(cap_keep, batch_format="pyarrow").materialize()
        deferred = defer1.union(defer2) if defer3 is None else defer1.union(defer2, defer3)
        return admitted, deferred.materialize()

    # ------------------------------------------------------------------
    @staticmethod
    def _to_table(ds) -> pa.Table:
        # empty blocks can carry empty schemas — skip them
        tables = [
            t.select(FRONTIER_COLS).cast(FRONTIER_SCHEMA)
            for t in ray.get(ds.to_arrow_refs())
            if t.num_rows
        ]
        return pa.concat_tables(tables) if tables else FRONTIER_SCHEMA.empty_table()

    def run(self) -> CrawlResult:
        if self.cfg.admission_mode == "actor":
            return self._run_actor_mode()
        cfg = self.cfg
        if self._frontier is None:
            self._frontier = self._seed_frontier()
        frontier = self._frontier
        fetch_fn = _fetch_fn_factory(self.corpus_ref, self.delays_ref,
                                     cfg.fetch_failure_rate)
        gens_run = self._start_gen
        for g in range(self._start_gen, cfg.max_generations):
            n_frontier = frontier.count()
            if n_frontier == 0:
                break
            gens_run = g + 1
            self._count(g, "frontier", "size", n_frontier)

            # ---- 1. admission
            if n_frontier <= self.driver_threshold:
                adm_ds, deferred = self._admit_driver(self._to_table(frontier), g)
            else:
                adm_ds, deferred = self._admit_distributed(frontier, g)
                if adm_ds is not None and adm_ds.count() == 0:
                    adm_ds = None
            if adm_ds is None:
                # everything left was robots-denied and dropped
                frontier = deferred
                if frontier.count() == 0:
                    break
                continue

            # ---- 2. fetch (broadcast or streaming semi-join path)
            fetched = self._run_fetch(adm_ds, g, fetch_fn)

            # crawl-order dump (bounded by global budget per generation)
            dump = fetched.select_columns(DUMP_COLS).to_pandas()
            self._append_dump(dump)  # sorted once in _result
            n200 = int((dump["status"] == 200).sum())
            self._count(g, "fetch", "status_200", n200)
            self._count(g, "fetch", "status_404", int((dump["status"] == 404).sum()))
            self._count(g, "admission", "admitted", len(dump))

            # ---- politeness bookkeeping (A2 actors own domain_state)
            hs = dump.groupby("host").agg(
                n=("canon", "size"), ts=("fetch_ts_us", "max")
            )
            violations = self.politeness.record_admission(
                {h: (int(r["n"]), int(r["ts"])) for h, r in hs.iterrows()},
                g, cfg.per_host_budget_per_generation,
            )
            if violations:
                raise RuntimeError(f"politeness violation in generation {g}")

            # ---- 3. extract (+ fused analysis): ONE materialization —
            # per-generation dataset executions are the loop's fixed
            # cost, so stages chain lazily
            docs_pipe = fetched.map_batches(
                extract_docs, batch_format="pyarrow", batch_size=cfg.batch_size
            )
            if cfg.analyze:
                from ccrawler_ray.stages.analyze import analyze_docs

                docs_pipe = docs_pipe.map_batches(
                    analyze_docs, batch_format="pyarrow", batch_size=cfg.batch_size
                )
            core = docs_pipe.materialize()
            # user stages transform the docs_out OUTPUT only — never
            # discovery/frontier (the Stage contract, identical to
            # actor mode; a filtering stage must not change the crawl)
            if self.extra_stages:
                from ccrawler_ray.pipelines.stage import apply_stages

                docs_out = apply_stages(core, self.extra_stages)
            else:
                docs_out = core
            self._docs_out.append(docs_out)

            # ---- 4–6. children → discover → dedup → seen
            children = core.map_batches(
                explode_children, batch_format="pyarrow", batch_size=cfg.batch_size
            )
            fresh = self._discover(children, g + 1, n200)

            # ---- 7. next frontier (deferred ∪ fresh ∪ transient retries)
            parts = [deferred]
            if fresh.count() > 0:
                parts.append(fresh)
            if cfg.fetch_failure_rate > 0.0:
                requeue = self._requeue_transients(fetched, g)
                if requeue.num_rows:
                    parts.append(ray.data.from_arrow(requeue))
            frontier = (parts[0].union(*parts[1:]) if len(parts) > 1
                        else parts[0]).materialize()
            self._count(g, "frontier", "deferred_plus_fresh", frontier.count())
            if self.ckpt_dir is not None:
                self._checkpoint(g, frontier, docs_out, dump)
        self._frontier = frontier
        return self._result(gens_run)

    # ------------------------------------------------------------------
    # actor-frontier mode (admission_mode="actor"): the frontier lives
    # sharded in the politeness partition actors; candidates dedup/
    # register in the seen shards via offer/resolve. Per-generation
    # driver cost is O(admitted)+O(fresh) — never O(frontier).
    # ------------------------------------------------------------------

    def _host_partitions(self, hosts: list[str]) -> np.ndarray:
        from ccrawler_ray.state.politeness import host_partition

        cache = self._hp_cache
        P = self.cfg.num_politeness_partitions
        out = np.empty(len(hosts), dtype=np.int64)
        for i, h in enumerate(hosts):
            p = cache.get(h)
            if p is None:
                p = host_partition(h, P)
                cache[h] = p
            out[i] = p
        return out

    def _route_requeue(self, requeue: pa.Table) -> None:
        """Transient-retry rows back into their partition queues."""
        pids = self._host_partitions(requeue.column("host").to_pylist())
        refs = [
            self.politeness.parts[int(p)].requeue.remote(
                requeue.take(pa.array(np.nonzero(pids == p)[0]))
            )
            for p in np.unique(pids)
        ]
        ray.get(refs)

    def _route_fresh_to_queues(self, fresh_tables: list) -> int:
        n = 0
        offers = []
        for t in fresh_tables:
            if t is None or t.num_rows == 0:
                continue
            n += t.num_rows
            parts = self._host_partitions(t.column("host").to_pylist())
            for p in np.unique(parts):
                idx = np.nonzero(parts == p)[0]
                offers.append(
                    self.politeness.parts[int(p)].offer_frontier.remote(
                        t.take(pa.array(idx))
                    )
                )
        if offers:
            ray.get(offers)
        return n

    def _offer_candidates(self, candidates_ds, generation: int) -> int:
        """discover → offer to seen shards, fused in one execution."""
        cfg = self.cfg
        shards = self.seen_pool.shards
        num_shards = len(shards)

        def offer_fn(batch: pa.Table) -> pa.Table:
            if batch.num_rows:
                h = batch.column("url_hash").to_numpy(zero_copy_only=False)
                sid = (h % num_shards).astype(np.int64)
                refs = [
                    shards[int(s)].offer.remote(batch.take(pa.array(np.nonzero(sid == s)[0])))
                    for s in np.unique(sid)
                ]
                ray.get(refs)
            return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

        counts = (
            candidates_ds.map_batches(
                make_discover_fn(cfg.max_depth, generation),
                batch_format="pyarrow", batch_size=cfg.batch_size,
            )
            .map_batches(offer_fn, batch_format="pyarrow", batch_size=cfg.batch_size)
            .sum("n")
        )
        n_disc = int(counts or 0)
        # "validated" metric now recorded at resolve time (shards
        # return offered counts) — avoids double counting
        return n_disc

    def _make_offer_stage(self, generation: int):
        """Fused discover/offer side-effect stage: explode the 200
        rows' children, canonicalize/validate, offer to the seen
        shards (key-affine) — and pass the batch through unchanged."""
        shards = self.seen_pool.shards
        num_shards = len(shards)
        discover_fn = make_discover_fn(self.cfg.max_depth, generation)

        def offer_stage(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc  # noqa: PLC0415

            ok = batch.filter(pc.equal(batch.column("status"), 200))
            if ok.num_rows:
                cand = discover_fn(explode_children(ok))
                if cand.num_rows:
                    h = cand.column("url_hash").to_numpy(zero_copy_only=False)
                    sid = (h % num_shards).astype(np.int64)
                    refs = [
                        shards[int(s)].offer.remote(
                            cand.take(pa.array(np.nonzero(sid == s)[0]))
                        )
                        for s in np.unique(sid)
                    ]
                    ray.get(refs)
            return batch

        return offer_stage

    def _launch_resolve(self) -> list:
        """Fire the shard resolve+route RPCs without blocking — the
        driver overlaps its dump post-processing with the shard work
        and collects at ``_collect_resolve`` (the offers this resolves
        completed inside the already-materialized fused execution)."""
        return [
            s.resolve_and_route.remote(
                self.politeness.parts, self.cfg.num_politeness_partitions
            )
            for s in self.seen_pool.shards
        ]

    def _resolve_fresh(self, generation: int) -> int:
        # shards resolve AND route to partition queues directly —
        # fresh rows never pass through the driver
        return self._collect_resolve(self._launch_resolve(), generation)

    def _collect_resolve(self, refs: list, generation: int) -> int:
        per_shard = ray.get(refs)
        for si, (_, n) in enumerate(per_shard):
            if n:
                self._count_p(generation, si, "discover", "fresh", n)
        offered = sum(o for o, _ in per_shard)
        self._count(generation, "discover", "validated", offered)
        n_fresh = sum(n for _, n in per_shard)
        self._count(generation, "discover", "fresh", n_fresh)
        return n_fresh

    def _run_actor_mode(self) -> CrawlResult:
        cfg = self.cfg
        parts = self.politeness.parts
        fetch_fn = _fetch_fn_factory(self.corpus_ref, self.delays_ref,
                                     cfg.fetch_failure_rate)
        if not self._seeded:
            seeds = pa.table(
                {
                    "url": pa.array(list(cfg.seeds), pa.string()),
                    "parent": pa.array([""] * len(cfg.seeds), pa.string()),
                    "depth": pa.array(np.zeros(len(cfg.seeds), dtype=np.int32)),
                    "ord_key": pa.array([seed_ord_key(i) for i in range(len(cfg.seeds))]),
                    "is_seed": pa.array(np.ones(len(cfg.seeds), dtype=bool)),
                },
                schema=CANDIDATE_SCHEMA,
            )
            if seeds.num_rows:
                # chunked: block count == map parallelism
                ncpu0 = int(ray.cluster_resources().get("CPU", 8))
                sc = max(256, -(-seeds.num_rows // min(64, 2 * ncpu0)))
                seeds_ds = ray.data.from_arrow(
                    [seeds.slice(o, sc) for o in range(0, seeds.num_rows, sc)]
                )
                self._offer_candidates(seeds_ds, 0)
                self._resolve_fresh(0)
            self._seeded = True

        import time as _time

        def _tick(phase: str, t0: float, _g: list = [0]) -> float:
            t1 = _time.perf_counter()
            self._phase_sec[phase] = self._phase_sec.get(phase, 0.0) + (t1 - t0)
            self._phase_hist.append((phase, round(t1 - t0, 4)))
            return t1

        gens_run = self._start_gen
        K = cfg.global_budget_per_generation
        for g in range(self._start_gen, cfg.max_generations):
            t0 = _time.perf_counter()
            qsize = sum(ray.get([p.queue_size.remote() for p in parts]))
            t0 = _tick("adm_qsize", t0)
            if qsize == 0:
                break
            gens_run = g + 1
            self._count(g, "frontier", "size", qsize)

            # ---- 1. admission: parallel per-partition ranking.
            # Admitted rows come back as object REFS in ~2-blocks-per-
            # CPU chunks; the driver builds the fetch Dataset via
            # from_arrow_refs without touching the bytes.
            # ~2 blocks per CPU, but never more than 64 blocks — tiny
            # tasks cost more in dispatch than they gain in overlap
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            nblocks = min(64, 2 * ncpu)
            chunk = max(256, min(cfg.batch_size, -(-qsize // nblocks)))
            results = ray.get([
                p.admit_generation.remote(
                    g, cfg.per_host_budget_per_generation, K, chunk
                )
                for p in parts
            ])
            t0 = _tick("adm_rpc", t0)
            denied = sum(d for _, _, d, _ in results)
            if denied:
                self._count(g, "politeness", "robots_denied", denied)
            for pi, (_, _n_p, d_p, _) in enumerate(results):
                if d_p:
                    # real partition ids in the metrics lineage (§4.4)
                    self._count_p(g, pi, "politeness", "robots_denied", d_p)
            n_adm = sum(n for _, n, _, _ in results)
            if n_adm == 0:
                continue
            all_refs = [r for refs, _, _, _ in results if refs for r in refs]
            all_mds = [m for _, _, _, mds in results if mds for m in mds]
            if n_adm > K:
                # global cap binds: pull once, trim, requeue the cut
                tbl = pa.concat_tables(ray.get(all_refs), promote_options="default")
                adm = tbl.to_pandas()
                adm = adm.sort_values(["priority", "ord_key"], ascending=[False, True])
                cut = adm.iloc[K:]
                adm = adm.iloc[:K]
                cut_tbl = pa.Table.from_pandas(
                    cut[FRONTIER_COLS], preserve_index=False
                ).cast(FRONTIER_SCHEMA)
                cparts = self._host_partitions(cut["host"].tolist())
                reqs = [
                    parts[int(p)].requeue.remote(cut_tbl.take(pa.array(np.nonzero(cparts == p)[0])))
                    for p in np.unique(cparts)
                ]
                ray.get(reqs)
                tbl = pa.Table.from_pandas(adm, preserve_index=False)
                from ccrawler_ray.rayext import block_metadata

                slices = [tbl.slice(o, chunk)
                          for o in range(0, tbl.num_rows, chunk)]
                all_refs = [ray.put(s) for s in slices]
                all_mds = [block_metadata(s) for s in slices]
                # per-partition admitted = POST-cap counts (partition
                # rows must sum to the aggregate even when K binds)
                aparts = self._host_partitions(adm["host"].tolist())
                for pi, n_p in enumerate(np.bincount(aparts, minlength=len(parts))):
                    self._count_p(g, pi, "admission", "admitted", int(n_p))
            else:
                for pi, (_, n_p, _, _) in enumerate(results):
                    self._count_p(g, pi, "admission", "admitted", n_p)
            from ccrawler_ray.rayext import from_arrow_refs_with_md

            adm_ds = from_arrow_refs_with_md(all_refs, all_mds)

            t0 = _tick("admission", t0)

            # ---- 2–6 FUSED: fetch → extract(+audit cols) → analyze →
            # extra stages → discover/offer side-effect as ONE Dataset
            # execution per generation (r1 ran 3 executions + the same
            # 2 actor barriers — that fixed cost dominated the stepped
            # scaling regime, BENCH/scaling_last.json). dump and
            # docs_out become cheap projections of the SAME blocks.
            from ccrawler_ray.stages.extract import AUDIT_COLS, extract_docs_audit

            if self.fetch_mode == "broadcast":
                def add_gen(batch: pa.Table, _g=g) -> pa.Table:
                    return batch.append_column(
                        "fetch_generation",
                        pa.array(np.full(batch.num_rows, _g, dtype=np.int32)),
                    )

                # batch_size=None → one task per admission block: the
                # admission layer already sizes blocks at ~2/CPU, and
                # letting map_batches re-bundle to cfg.batch_size
                # coalesced 16 balanced blocks into 8 skewed tasks
                # (269 ms..1.47 s wall — the stepped-regime scaling
                # loss measured in ds.stats(), round 4)
                pipe = adm_ds.map_batches(add_gen, batch_format="pyarrow").map_batches(
                    fetch_fn, batch_format="pyarrow", batch_size=None
                )
            else:
                # semi-join needs a driver-side miss step; fusion
                # starts at extract for that path
                pipe = self._run_fetch(adm_ds, g, fetch_fn)
            pipe = pipe.map_batches(
                extract_docs_audit, batch_format="pyarrow", batch_size=None
            )
            if cfg.analyze:
                from ccrawler_ray.stages.analyze import analyze_docs

                pipe = pipe.map_batches(
                    analyze_docs, batch_format="pyarrow", batch_size=None
                )
            pipe = pipe.map_batches(
                self._make_offer_stage(g + 1), batch_format="pyarrow",
                batch_size=None,
            )
            fused = pipe.materialize()
            if os.environ.get("CCRAWLER_PROFILE"):  # pragma: no cover
                self._last_fused = fused  # for ds.stats() inspection
            t0 = _tick("fetch_extract_offer", t0)

            # shards resolve fresh offers and route to partition queues
            # WHILE the driver post-processes the dump below — the
            # offers completed inside the materialized execution, and
            # the collection barrier before checkpoint/next-admission
            # keeps queue state exact
            dump_refs = _launch_dump(fused)
            resolve_refs = self._launch_resolve()
            dump = _collect_dump(dump_refs)
            self._append_dump(dump)  # sorted once in _result
            n200 = int((dump["status"] == 200).sum())
            self._count(g, "fetch", "status_200", n200)
            self._count(g, "fetch", "status_404", int((dump["status"] == 404).sum()))
            self._count(g, "admission", "admitted", len(dump))
            if cfg.fetch_failure_rate > 0.0:
                requeue = self._requeue_transients(fused, g)
                if requeue.num_rows:
                    self._route_requeue(requeue)
            hs = dump.groupby("host").agg(n=("canon", "size"), ts=("fetch_ts_us", "max"))
            rec_refs = self.politeness.record_admission_async(
                {h: (int(r["n"]), int(r["ts"])) for h, r in hs.iterrows()},
                g, cfg.per_host_budget_per_generation,
            )

            def to_docs_out(batch: pa.Table, _audit=tuple(AUDIT_COLS)) -> pa.Table:
                import pyarrow.compute as pc  # noqa: PLC0415

                return batch.filter(
                    pc.equal(batch.column("status"), 200)
                ).drop_columns(list(_audit))

            docs_out = fused.map_batches(to_docs_out, batch_format="pyarrow")
            if self.extra_stages:
                # user stages compose into the docs_out PROJECTION (the
                # documented Stage contract, same as dataset mode) —
                # never upstream of the dump/politeness/requeue path,
                # where a filtering stage would corrupt accounting
                from ccrawler_ray.pipelines.stage import apply_stages

                docs_out = apply_stages(docs_out, self.extra_stages)
            self._docs_out.append(docs_out)
            t0 = _tick("dump", t0)

            violations = sum(ray.get(rec_refs)) if rec_refs else 0
            if violations:
                raise RuntimeError(f"politeness violation in generation {g}")
            self._collect_resolve(resolve_refs, g + 1)
            t0 = _tick("resolve_route", t0)

            if self.ckpt_dir is not None:
                self._checkpoint_actor(g, docs_out, dump)
                t0 = _tick("checkpoint", t0)
        return self._result(gens_run)

    def _checkpoint_actor(self, g: int, docs_out, dump: pd.DataFrame) -> None:
        root = Path(self.ckpt_dir)
        gen_dir = root / f"gen={g}"
        storage.clear_generation(root, g)
        qtables = ray.get([p.dump_queue.remote() for p in self.politeness.parts])
        nrows = 0
        for i, t in enumerate(qtables):
            if t is not None and t.num_rows:
                storage.write_table(
                    t.select(FRONTIER_COLS).cast(FRONTIER_SCHEMA),
                    gen_dir / "frontier" / f"part={i}.parquet",
                )
                nrows += t.num_rows
        docs_out.write_parquet(str(gen_dir / "docs_out"))
        for i, t in enumerate(self.seen_pool.dump_tables()):
            storage.write_table(t, gen_dir / "seen" / f"shard={i}.parquet")
        if self.cfg.seen_membership != "exact":
            # approx mode: the dict dump above holds only the audit
            # stratum; full membership is the filter snapshot (shard-
            # affine — resume asserts the same shard count)
            for i, blob in enumerate(self.seen_pool.dump_filters()):
                storage.write_bytes(
                    blob, gen_dir / "seen_filter" / f"shard={i}.bin")
        for i, t in enumerate(self.politeness.dump_tables()):
            storage.write_table(t, gen_dir / "domain_state" / f"part={i}.parquet")
        storage.write_table(
            pa.Table.from_pandas(dump, preserve_index=False), gen_dir / "crawl_order.parquet"
        )
        storage.write_table(self._metrics_table(), gen_dir / "metrics.parquet")
        storage.write_manifest(
            gen_dir,
            {
                "generation": g,
                "schema_version": 1,
                "admission_mode": "actor",
                "num_seen_shards": self.cfg.num_seen_shards,
                "num_politeness_partitions": self.cfg.num_politeness_partitions,
                "frontier_files": storage.dataset_files(gen_dir / "frontier"),
                "docs_out_files": storage.dataset_files(gen_dir / "docs_out"),
                "lineage": {"frontier_rows": nrows, "fetched_rows": len(dump)},
            },
        )
        # release the generation's plasma blocks: docs_out is durable
        # parquet now, so hold it LAZILY from the checkpoint files.
        # Keeping every generation's materialized docs_out alive for
        # the whole crawl spilled >54 GB of object store at the 30x
        # rehearsal (ENOSPC mid-resume); the files survive checkpoint
        # GC (gc_checkpoints keeps OUTPUT dirs for all generations).
        files = storage.dataset_files(gen_dir / "docs_out")
        if self._docs_out and files:
            self._docs_out[-1] = ray.data.read_parquet(files)

    # ------------------------------------------------------------------
    def _metrics_table(self) -> pa.Table:
        cols = list(zip(*self._metrics)) if self._metrics else [[], [], [], [], []]
        return pa.table(
            {
                "generation": pa.array(list(cols[0]), pa.int32()),
                "partition": pa.array(list(cols[1]), pa.int32()),
                "stage": pa.array(list(cols[2]), pa.string()),
                "counter": pa.array(list(cols[3]), pa.string()),
                "value": pa.array(list(cols[4]), pa.int64()),
            },
            schema=METRICS_SCHEMA,
        )

    def _result(self, generations_run: int) -> CrawlResult:
        docs = self._docs_out[0] if self._docs_out else None
        for d in self._docs_out[1:]:
            docs = docs.union(d)
        if docs is None:
            docs = ray.data.from_items([])
        dumps = self._dumps
        if self._dump_spilled:
            # audit log spilled: re-read the per-generation checkpoint
            # files (final materialization happens only here, at the
            # caller's explicit request for the full audit DataFrame)
            root = Path(self.ckpt_dir)
            dumps = [
                storage.read_table(p).to_pandas()
                for p in sorted(
                    root.glob("gen=*/crawl_order.parquet"),
                    key=lambda p: int(p.parent.name.split("=")[1]),
                )
            ]
        dump = (
            pd.concat(dumps).sort_values(["generation", "host", "queue_pos", "ord_key"])
            if dumps
            else pd.DataFrame(columns=DUMP_COLS)
        )
        seen = pa.concat_tables(self.seen_pool.dump_tables())
        domain = pa.concat_tables(self.politeness.dump_tables())
        return CrawlResult(
            docs_out=docs,
            crawl_order=dump.reset_index(drop=True),
            seen=seen,
            domain_state=domain,
            metrics=self._metrics_table(),
            generations_run=generations_run,
        )

    # ------------------------------------------------------------------
    def _checkpoint(self, g: int, frontier, docs_out, dump: pd.DataFrame) -> None:
        root = Path(self.ckpt_dir)
        gen_dir = root / f"gen={g}"
        storage.clear_generation(root, g)
        frontier.write_parquet(str(gen_dir / "frontier"))
        docs_out.write_parquet(str(gen_dir / "docs_out"))
        for i, t in enumerate(self.seen_pool.dump_tables()):
            storage.write_table(t, gen_dir / "seen" / f"shard={i}.parquet")
        if self.cfg.seen_membership != "exact":
            # approx mode: the dict dump above holds only the audit
            # stratum; full membership is the filter snapshot (shard-
            # affine — resume asserts the same shard count)
            for i, blob in enumerate(self.seen_pool.dump_filters()):
                storage.write_bytes(
                    blob, gen_dir / "seen_filter" / f"shard={i}.bin")
        for i, t in enumerate(self.politeness.dump_tables()):
            storage.write_table(t, gen_dir / "domain_state" / f"part={i}.parquet")
        storage.write_table(
            pa.Table.from_pandas(dump, preserve_index=False), gen_dir / "crawl_order.parquet"
        )
        storage.write_table(self._metrics_table(), gen_dir / "metrics.parquet")
        storage.write_manifest(
            gen_dir,
            {
                "generation": g,
                "schema_version": 1,
                "num_seen_shards": self.cfg.num_seen_shards,
                "num_politeness_partitions": self.cfg.num_politeness_partitions,
                "frontier_files": storage.dataset_files(gen_dir / "frontier"),
                "docs_out_files": storage.dataset_files(gen_dir / "docs_out"),
                "lineage": {
                    "frontier_rows": frontier.count(),
                    "fetched_rows": len(dump),
                },
            },
        )
        # release the generation's plasma blocks: docs_out is durable
        # parquet now, so hold it LAZILY from the checkpoint files.
        # Keeping every generation's materialized docs_out alive for
        # the whole crawl spilled >54 GB of object store at the 30x
        # rehearsal (ENOSPC mid-resume); the files survive checkpoint
        # GC (gc_checkpoints keeps OUTPUT dirs for all generations).
        files = storage.dataset_files(gen_dir / "docs_out")
        if self._docs_out and files:
            self._docs_out[-1] = ray.data.read_parquet(files)

    def resume(self) -> bool:
        """Rehydrate engine state from the latest valid checkpoint.
        Returns True if a checkpoint was found."""
        assert self.ckpt_dir is not None
        last = storage.latest_valid_generation(self.ckpt_dir)
        if last is None:
            return False
        root = Path(self.ckpt_dir)
        gen_dir = root / f"gen={last}"
        man = storage.read_manifest(gen_dir)
        assert man is not None and man["generation"] == last
        frontier_files = storage.dataset_files(gen_dir / "frontier")
        if self.cfg.admission_mode == "actor":
            # route the checkpointed frontier back into the partition
            # actors (robust to a different partition count)
            if frontier_files:
                tbl = pa.concat_tables(
                    [storage.read_table(f).select(FRONTIER_COLS).cast(FRONTIER_SCHEMA)
                     for f in frontier_files]
                )
                self._route_fresh_to_queues([tbl])
            self._seeded = True
        elif frontier_files:
            # select FRONTIER_COLS: read_parquet may add hive-partition
            # columns inferred from the gen=N/ path
            self._frontier = ray.data.read_parquet(frontier_files).map_batches(
                lambda t: t.select(FRONTIER_COLS).cast(FRONTIER_SCHEMA),
                batch_format="pyarrow",
            ).materialize()
        else:
            self._frontier = ray.data.from_arrow(FRONTIER_SCHEMA.empty_table())
        seen_tables = [storage.read_table(p) for p in (gen_dir / "seen").glob("*.parquet")]
        if seen_tables:
            self.seen_pool.restore_from_table(pa.concat_tables(seen_tables))
        filt_dir = gen_dir / "seen_filter"
        if self.cfg.seen_membership != "exact" and filt_dir.is_dir():
            # filter snapshots are shard-affine (not re-routable like
            # the dict dump): the checkpoint's shard count must match
            assert man.get("num_seen_shards") == self.cfg.num_seen_shards, (
                "approx seen-membership resume requires the same "
                "num_seen_shards as the checkpointing run")
            blobs = [
                storage.read_bytes(filt_dir / f"shard={i}.bin")
                for i in range(self.cfg.num_seen_shards)
            ]
            self.seen_pool.restore_filters(blobs)
        dom_tables = [storage.read_table(p) for p in (gen_dir / "domain_state").glob("*.parquet")]
        if dom_tables:
            self.politeness.restore_from_table(pa.concat_tables(dom_tables))
        # prior generations' outputs
        self._docs_out = []
        self._dumps = []
        for gg in range(last + 1):
            gd = root / f"gen={gg}"
            files = storage.dataset_files(gd / "docs_out")
            if files:
                # lazy: materializing every prior generation's docs_out
                # into the object store is what tipped the 30x resume
                # over the spill-disk edge
                self._docs_out.append(ray.data.read_parquet(files))
            co = gd / "crawl_order.parquet"
            if co.exists():
                self._append_dump(storage.read_table(co).to_pandas())
        mt = storage.read_table(gen_dir / "metrics.parquet").to_pandas()
        self._metrics = [tuple(r) for r in mt.itertuples(index=False)]
        self._start_gen = last + 1
        return True

    def warmup(self) -> None:
        """Pre-import heavy modules in the worker pool so first-batch
        latency doesn't pollute throughput timing (a steady-state
        cluster has warm workers)."""

        @ray.remote(num_cpus=1)
        def _warm() -> int:
            import ccrawler_ray.stages.analyze  # noqa: F401, PLC0415
            import ccrawler_ray.stages.extract  # noqa: F401, PLC0415

            return 0

        n = int(ray.cluster_resources().get("CPU", 8))
        ray.get([_warm.remote() for _ in range(n)])

    def shutdown(self) -> None:
        self.seen_pool.kill()
        self.politeness.kill()
