"""Crawl configuration (S6).

A plain dataclass loaded driver-side and captured by closure / actor
init (it is tiny — broadcast by value). Reference locus: settings /
config module of the reference (mount empty, SURVEY.md §0.1).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path


@dataclasses.dataclass(frozen=True)
class CrawlConfig:
    seeds: tuple[str, ...]
    max_depth: int = 6
    per_host_budget_per_generation: int = 4
    global_budget_per_generation: int = 256
    max_generations: int = 12
    seed: int = 42
    # physical knobs (scale with cluster size; defaults fit the sandbox)
    num_seen_shards: int = 8
    # URL-seen membership authority:
    #  "exact"  — per-shard dict (authoritative at sandbox scale; the
    #             bloom rides alongside for G5 cardinality)
    #  "bloom"  — bloom filter authoritative (~12 bits/URL): the 10^10
    #             path; a false positive drops a genuinely-new URL
    #             (fetched ⊆ exact run), never fetches a dup
    #  "cuckoo" — cuckoo filter authoritative (16-bit fingerprints +
    #             exact overflow, supports delete)
    seen_membership: str = "exact"
    seen_capacity_per_shard: int = 1_000_000
    num_politeness_partitions: int = 4
    fetch_concurrency: int = 4
    batch_size: int = 8192
    # skew handling: hosts with more candidates than this per generation
    # get salted into `salt_factor` parallel shuffle groups (SURVEY.md §4.3)
    hot_host_threshold: int = 10_000
    salt_factor: int = 8
    # run the per-doc analysis stage (content hash, minhash, simhash,
    # lang-id, token stats) on fetched docs — the production pipeline
    analyze: bool = False
    # fetch path:
    #  "broadcast" — corpus lookup arrays ray.put once, FetchActor
    #                take-by-key per batch (fast while the corpus fits
    #                the object store / driver prepares it once)
    #  "semi_join" — stream the corpus, broadcast the (budget-bounded)
    #                admitted set, probe inside map_batches — the
    #                100 TB path (the corpus NEVER passes the driver)
    #  "auto"      — semi_join when a path-backed corpus exceeds
    #                broadcast_corpus_max_bytes, else broadcast
    fetch_mode: str = "auto"
    broadcast_corpus_max_bytes: int = 256 << 20
    # semi-join mode: materialize the corpus into object-store blocks
    # below this size (parquet bytes); above it, stream from source
    # every generation. MEASURED at the 30x rehearsal (9.5 GB nested
    # parquet, 10 generations): materialize = 137 s full crawl,
    # re-decode-per-generation = 2539 s (the list<struct> spans decode
    # dominates), while the spill high-water was ~200 GB EITHER way
    # (it is the per-generation streamed blocks, reclaimed at session
    # end, not the pinned corpus). Default keeps materialize for any
    # single-node-sized corpus; lower it only when local spill disk is
    # scarcer than generation latency.
    corpus_materialize_max_bytes: int = 64 << 30
    # deterministic transient-failure injection for the simulated fetch
    # (spec.fetch_fails_transiently); failed rows requeue with
    # retries+1 up to max_fetch_retries, then drop (counted)
    fetch_failure_rate: float = 0.0
    max_fetch_retries: int = 3
    # admission path:
    #  "driver"      — pandas fast path for frontiers below the engine's
    #                  driver_threshold (small-data fast path)
    #  "distributed" — groupby(host,salt) shuffle ranking (the [B]
    #                  "per-host priority queue via groupby" design)
    #  "actor"       — frontier LIVES sharded in the politeness
    #                  partition actors; admission ranks in parallel
    #                  per partition; per-generation cost is
    #                  O(candidates), not O(frontier) — the 10^10 path
    admission_mode: str = "driver"

    @staticmethod
    def from_file(path: str | Path) -> "CrawlConfig":
        """Load config from JSON or simple YAML (both supported)."""
        text = Path(path).read_text()
        if str(path).endswith(".json"):
            data = json.loads(text)
        else:
            import yaml

            data = yaml.safe_load(text)
        known = {f.name for f in dataclasses.fields(CrawlConfig)}
        data = {k: v for k, v in data.items() if k in known}
        if "seeds" in data:
            data["seeds"] = tuple(data["seeds"])
        return CrawlConfig(**data)

    def scaled_for(self, num_cpus: int) -> "CrawlConfig":
        """Scale actor-pool sizes with available CPUs (SURVEY.md §4.6).

        Capped at 8 shards/partitions for single-node runs: beyond
        that, per-generation RPC fan-out latency outweighs the extra
        admission/resolve parallelism at sandbox data sizes. On a real
        multi-node cluster raise the caps with node count (each node
        hosts its own shard/partition slice)."""
        return dataclasses.replace(
            self,
            num_seen_shards=min(8, max(2, num_cpus // 2)),
            num_politeness_partitions=min(8, max(2, num_cpus // 2)),
            fetch_concurrency=max(2, num_cpus // 4),
        )
