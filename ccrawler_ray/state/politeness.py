"""A2/A3 — domain politeness: robots + crawl-delay state per partition.

BASELINE.json: "robots.txt + crawl-delay budgets enforced per-partition
by stateful fetch actors". Reference locus (mount empty, SURVEY.md
§0.1): the domain politeness / heartbeat scheduler.

Design
------
* Hosts are partitioned by ``hash64(host) % P`` with host→partition
  affinity: one partition actor OWNS a host's budget and virtual clock.
* The robots corpus (host → crawl_delay, disallow) is built by ONE
  vectorized pass over the corpus' robots.txt rows (``load_robots_ds``)
  and broadcast via ``ray.put``; each partition actor keeps only its
  own hosts' entries (at 10^10 scale the full map never lives in one
  process).
* Admission *math* (rank, limit, robots filter) is pure and runs
  inside the groupby(host) shuffle (deterministic, SURVEY.md §4.3);
  the partition actors are the system of record: they re-validate the
  per-host admitted counts against the budget, advance the per-host
  virtual clock, and count fetches — and their dump IS the
  ``domain_state`` checkpoint table.
* Heartbeats (A4): the reference's worker heartbeats are subsumed by
  Ray's task retry + lineage; we record a per-generation heartbeat
  (``heartbeat_generation``) per partition instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ccrawler_ray.spec import (
    DOMAIN_STATE_SCHEMA,
    hash64,
    host_admission_limit,
    parse_robots,
    url_host,
)


def load_robots_ds(corpus_ds, with_text: bool = False):
    """host -> (crawl_delay, disallow) from robots.txt docs, via one
    vectorized filter pass over the corpus Dataset (columns pruned).
    With ``with_text`` also returns host -> raw robots.txt body (the
    domain_state checkpoint column)."""
    robots: dict[str, tuple[int, tuple[str, ...]]] = {}
    texts: dict[str, str] = {}

    def pick_robots(batch: pa.Table) -> pa.Table:
        mask = pc.ends_with(batch.column("doc_id"), "/robots.txt")
        return batch.filter(mask)

    sub = corpus_ds.map_batches(pick_robots, batch_format="pyarrow")
    for batch in sub.iter_batches(batch_format="pyarrow"):
        for doc_id, spans in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("spans").to_pylist()):
            text = "\n".join(s["text"] for s in spans if s["kind"] == "text")
            host = url_host(doc_id)
            robots[host] = parse_robots(text)
            texts[host] = text
    if with_text:
        return robots, texts
    return robots


def host_partition(host: str, num_partitions: int) -> int:
    return hash64(host, seed=13) % num_partitions


@ray.remote(num_cpus=0.05)
class PolitenessPartition:
    """Owns politeness state for hosts with hash64(host,13)%P == part_id."""

    def __init__(self, part_id: int, num_partitions: int, robots_ref,
                 robots_texts_ref=None):
        # Ray auto-resolves a top-level ObjectRef argument to its value
        self.part_id = part_id
        if isinstance(robots_ref, ray.ObjectRef):
            robots_ref = ray.get(robots_ref)
        if isinstance(robots_texts_ref, ray.ObjectRef):
            robots_texts_ref = ray.get(robots_texts_ref)
        full = robots_ref if robots_ref is not None else {}
        self.robots = {
            h: v for h, v in full.items()
            if host_partition(h, num_partitions) == part_id
        }
        texts = robots_texts_ref if robots_texts_ref is not None else {}
        # raw robots.txt retained per owned host: the domain_state dump
        # is self-contained (standalone restore needs no corpus pass)
        self.robots_txt = {
            h: t for h, t in texts.items()
            if host_partition(h, num_partitions) == part_id
        }
        # host -> [crawl_delay, last_fetch_ts_us, fetched_total]
        self.state: dict[str, list] = {}
        self.heartbeat_generation = -1
        # actor-frontier mode: this partition OWNS the frontier rows of
        # its hosts across generations (chunks of FRONTIER_SCHEMA rows)
        self._queue: list[pa.Table] = []

    # -- actor-resident frontier (admission_mode="actor") -------------

    def offer_frontier(self, table: pa.Table) -> int:
        self._queue.append(table)
        return table.num_rows

    def queue_size(self) -> int:
        return sum(t.num_rows for t in self._queue)

    def admit_generation(self, generation: int, per_host_budget: int,
                         global_budget: int, chunk_rows: int = 0) -> tuple:
        """Rank this partition's per-host queues and admit (the same
        frozen pure math as the driver/distributed paths —
        admission runs in PARALLEL across partitions). Deferred rows
        stay in the queue.

        Returns (admitted table | list of object refs, n_admitted,
        robots_denied, block_metadata): with chunk_rows > 0 the
        admitted rows are ray.put as ~chunk_rows-row blocks and only
        REFS return to the driver, plus the per-block metadata the
        driver needs to build the fetch Dataset WITHOUT the per-block
        metadata tasks ray.data.from_arrow_refs would launch
        (rayext.from_arrow_refs_with_md)."""
        from ccrawler_ray.pipelines.admission import admit_table_driver
        from ccrawler_ray.rayext import block_metadata

        if not self._queue:
            return None, 0, 0, None
        table = pa.concat_tables(self._queue, promote_options="default")
        self._queue = []
        adm, deferred, denied = admit_table_driver(
            table, self.robots, per_host_budget, global_budget
        )
        if len(deferred):
            self._queue.append(
                pa.Table.from_pandas(
                    deferred[[f.name for f in table.schema]], preserve_index=False
                ).cast(table.schema)
            )
        self.heartbeat_generation = generation
        if not len(adm):
            return None, 0, denied, None
        tbl = pa.Table.from_pandas(adm, preserve_index=False)
        if chunk_rows > 0:
            slices = [tbl.slice(o, chunk_rows)
                      for o in range(0, tbl.num_rows, chunk_rows)]
            refs = [ray.put(s) for s in slices]
            mds = [block_metadata(s) for s in slices]
            return refs, tbl.num_rows, denied, mds
        return tbl, tbl.num_rows, denied, None

    def requeue(self, table: pa.Table) -> int:
        """Rows cut by the driver's global cap come back to the queue."""
        self._queue.append(table)
        return table.num_rows

    def dump_queue(self) -> pa.Table | None:
        if not self._queue:
            return None
        return pa.concat_tables(self._queue, promote_options="default")

    def record_admission(self, hosts: list[str], counts: list[int],
                         last_ts: list[int], generation: int,
                         per_host_budget: int) -> int:
        """Validate + record one generation's admitted fetches for this
        partition's hosts. Returns number of budget violations (must be
        0 — the pure admission math already enforced the limit)."""
        violations = 0
        for host, n, ts in zip(hosts, counts, last_ts):
            delay = self.robots.get(host, (0, ()))[0]
            if n > host_admission_limit(per_host_budget, delay):
                violations += 1
            st = self.state.setdefault(host, [delay, 0, 0])
            st[1] = max(st[1], int(ts))
            st[2] += int(n)
        self.heartbeat_generation = generation
        return violations

    def dump(self) -> pa.Table:
        hosts = list(self.state.keys())
        delays, last, total = [], [], []
        for h in hosts:
            d, ts, n = self.state[h]
            delays.append(d)
            last.append(ts)
            total.append(n)
        robots_txt = [self.robots_txt.get(h, "") for h in hosts]
        return pa.Table.from_arrays(
            [
                pa.array(hosts, type=pa.string()),
                pa.array(robots_txt, type=pa.string()),
                pa.array(np.array(delays, dtype=np.int32)),
                pa.array(np.array(last, dtype=np.int64)),
                pa.array(np.full(len(hosts), self.heartbeat_generation, dtype=np.int32)),
                pa.array(np.array(total, dtype=np.int64)),
            ],
            schema=DOMAIN_STATE_SCHEMA,
        )

    def restore(self, table: pa.Table) -> int:
        for h, txt, d, ts, hb, n in zip(
            table.column("host").to_pylist(),
            table.column("robots_txt").to_pylist(),
            table.column("crawl_delay").to_pylist(),
            table.column("last_fetch_ts_us").to_pylist(),
            table.column("heartbeat_generation").to_pylist(),
            table.column("fetched_total").to_pylist(),
        ):
            self.state[h] = [d, ts, n]
            if txt:
                self.robots_txt[h] = txt
                self.robots.setdefault(h, parse_robots(txt))
            self.heartbeat_generation = max(self.heartbeat_generation, hb)
        return len(self.state)


class PolitenessPool:
    def __init__(self, num_partitions: int, robots_ref, robots_texts_ref=None):
        self.num_partitions = num_partitions
        self.parts = [
            PolitenessPartition.remote(i, num_partitions, robots_ref,
                                       robots_texts_ref)
            for i in range(num_partitions)
        ]

    def record_admission(self, host_stats: dict, generation: int,
                         per_host_budget: int) -> int:
        """host_stats: host -> (count, last_ts). Routed by host affinity."""
        refs = self.record_admission_async(host_stats, generation,
                                           per_host_budget)
        return sum(ray.get(refs)) if refs else 0

    def record_admission_async(self, host_stats: dict, generation: int,
                               per_host_budget: int) -> list:
        """Fire-and-collect-later variant: returns the violation-count
        refs so the caller can overlap the RPC round with other driver
        work (the stepped crawl loop collects them alongside the shard
        resolve barrier)."""
        per_part: dict[int, tuple[list, list, list]] = {}
        for host, (n, ts) in host_stats.items():
            p = host_partition(host, self.num_partitions)
            hs, cs, tss = per_part.setdefault(p, ([], [], []))
            hs.append(host)
            cs.append(n)
            tss.append(ts)
        return [
            self.parts[p].record_admission.remote(hs, cs, tss, generation, per_host_budget)
            for p, (hs, cs, tss) in per_part.items()
        ]

    def dump_tables(self) -> list[pa.Table]:
        return ray.get([p.dump.remote() for p in self.parts])

    def restore_from_table(self, table: pa.Table) -> None:
        """Rehydrate by re-routing hosts on their partition affinity."""
        hosts = table.column("host").to_pylist()
        per_part: dict[int, list[int]] = {}
        for i, h in enumerate(hosts):
            per_part.setdefault(host_partition(h, self.num_partitions), []).append(i)
        refs = [
            self.parts[p].restore.remote(table.take(pa.array(idx)))
            for p, idx in per_part.items()
        ]
        ray.get(refs)

    def kill(self) -> None:
        for p in self.parts:
            ray.kill(p)
