"""refsim — serial single-threaded crawl oracle (SURVEY.md §5.2).

Implements EXACTLY the generation-loop semantics of SURVEY.md §3.3/§3.4
in plain Python dicts/lists, importing every per-row rule (canonicalize,
priority, extraction, robots, virtual clock, ord keys) from
``ccrawler_ray.spec`` so the spec cannot fork between oracle and engine.

The engine (``ccrawler_ray.pipelines.crawl``) must match this oracle on:
  1. final URL-seen set (exact)
  2. crawl-order dump sorted by (generation, host, queue_pos, ord_key)
  3. per-row span-sequence equality (kind, text, media_ref, order)
  4. per-host politeness budget in every generation
  5. resume run ≡ uninterrupted run

Frozen loop semantics (generation g):
  a. admission: per host, eligible = robots-allowed frontier rows sorted
     by (-priority, ord_key); admitted = eligible[:host_limit] with
     queue_pos = rank; robots-disallowed rows drop permanently;
     then a global cap: top global_budget rows by (-priority, ord_key)
     stay admitted, the cut rows return to the frontier (deferred).
  b. fetch: corpus lookup by canon; hit → status 200 + spans, miss →
     404; fetch_ts from the virtual clock.
  c. extract: outlinks enumerated over the full extracted link list
     (link_index BEFORE validation), then canonicalize → crawlable
     filter → depth+1 ≤ max_depth → priority → ord_key.
  d. dedup: within-generation first-wins by min ord_key per canon, then
     seen-set first-wins across generations (register on discovery).
  e. frontier_{g+1} = deferred ∪ fresh children.
Seeds run through c/d at init (discovery generation 0).
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict

from ccrawler_ray.spec import (
    canonicalize,
    child_ord_key,
    extract_outlinks_from_spans,
    fetch_virtual_ts_us,
    hash64,
    host_admission_limit,
    is_crawlable,
    parse_robots,
    priority_score,
    robots_allows,
    seed_ord_key,
    url_host,
)


@dataclasses.dataclass
class Rec:
    url: str
    canon: str
    host: str
    parent: str
    depth: int
    priority: float
    ord_key: str
    generation: int


@dataclasses.dataclass
class SimResult:
    seen: dict  # canon -> first ord_key
    crawl_order: list  # (generation, host, queue_pos, ord_key, canon, status)
    docs_out: dict  # canon -> (spans tuple, outlinks tuple, generation, ord_key)
    domain_state: dict  # host -> dict(crawl_delay, last_fetch_ts_us, fetched_total)
    metrics: dict  # (generation, stage, counter) -> value
    generations_run: int


def load_robots(corpus: dict) -> dict:
    """host -> (crawl_delay, disallow prefixes) from robots.txt corpus docs."""
    robots = {}
    for doc_id, spans in corpus.items():
        if doc_id.endswith("/robots.txt"):
            text = "\n".join(s["text"] for s in spans if s["kind"] == "text")
            robots[url_host(doc_id)] = parse_robots(text)
    return robots


def corpus_to_dict(table) -> dict:
    """pyarrow docs table -> {doc_id: [span dicts]}."""
    return dict(zip(table.column("doc_id").to_pylist(), table.column("spans").to_pylist()))


def simulate(corpus: dict, cfg) -> SimResult:
    robots = load_robots(corpus)
    seen: dict[str, str] = {}
    metrics: dict = defaultdict(int)
    domain_state: dict = {}
    crawl_order: list = []
    docs_out: dict = {}

    def discover(raw_candidates, generation):
        """Steps c/d over (url, parent_canon, depth, ord_key) tuples."""
        by_canon: dict[str, Rec] = {}
        for url, parent, depth, okey, is_seed in raw_candidates:
            canon = canonicalize(url)
            if not is_crawlable(canon):
                metrics[(generation, "validate", "dropped_invalid")] += 1
                continue
            if depth > cfg.max_depth:
                metrics[(generation, "validate", "dropped_depth")] += 1
                continue
            host = url_host(canon)
            rec = Rec(url, canon, host, parent, depth,
                      priority_score(depth, host, is_seed), okey, generation)
            cur = by_canon.get(canon)
            if cur is None or okey < cur.ord_key:
                if cur is not None:
                    metrics[(generation, "dedup", "dropped_dup_in_gen")] += 1
                by_canon[canon] = rec
            else:
                metrics[(generation, "dedup", "dropped_dup_in_gen")] += 1
        fresh = []
        for canon, rec in by_canon.items():
            if canon in seen:
                metrics[(generation, "seen", "dropped_seen")] += 1
            else:
                seen[canon] = rec.ord_key
                fresh.append(rec)
        return fresh

    # ---- seed injection (discovery generation 0)
    frontier = discover(
        [(u, "", 0, seed_ord_key(i), True) for i, u in enumerate(cfg.seeds)], 0
    )

    gens_run = 0
    for g in range(cfg.max_generations):
        if not frontier:
            break
        gens_run = g + 1
        # ---- a. admission
        by_host: dict[str, list[Rec]] = defaultdict(list)
        deferred: list[Rec] = []
        for rec in frontier:
            delay, disallow = robots.get(rec.host, (0, ()))
            path = rec.canon.split("://", 1)[1]
            path = path[path.find("/"):] if "/" in path else "/"
            if not robots_allows(path, disallow):
                metrics[(g, "politeness", "robots_denied")] += 1
                continue
            by_host[rec.host].append(rec)
        admitted: list[tuple[Rec, int]] = []  # (rec, queue_pos)
        for host, recs in by_host.items():
            delay, _ = robots.get(host, (0, ()))
            recs.sort(key=lambda r: (-r.priority, r.ord_key))
            limit = host_admission_limit(cfg.per_host_budget_per_generation, delay)
            for pos, rec in enumerate(recs):
                if pos < limit:
                    admitted.append((rec, pos))
                else:
                    deferred.append(rec)
        # global cap
        admitted.sort(key=lambda rp: (-rp[0].priority, rp[0].ord_key))
        cut = admitted[cfg.global_budget_per_generation:]
        admitted = admitted[: cfg.global_budget_per_generation]
        deferred.extend(rec for rec, _ in cut)
        metrics[(g, "admission", "admitted")] += len(admitted)
        metrics[(g, "admission", "deferred")] += len(deferred)

        # ---- b. fetch + c. extract
        children_raw = []
        for rec, pos in admitted:
            delay, _ = robots.get(rec.host, (0, ()))
            ts = fetch_virtual_ts_us(g, delay, pos)
            st = domain_state.setdefault(
                rec.host, {"crawl_delay": delay, "last_fetch_ts_us": 0, "fetched_total": 0}
            )
            st["last_fetch_ts_us"] = max(st["last_fetch_ts_us"], ts)
            st["fetched_total"] += 1
            spans = corpus.get(rec.canon)
            if spans is None:
                crawl_order.append((g, rec.host, pos, rec.ord_key, rec.canon, 404))
                metrics[(g, "fetch", "status_404")] += 1
                continue
            crawl_order.append((g, rec.host, pos, rec.ord_key, rec.canon, 200))
            metrics[(g, "fetch", "status_200")] += 1
            kinds = [s["kind"] for s in spans]
            texts = [s["text"] for s in spans]
            refs = [s["media_ref"] for s in spans]
            outlinks = extract_outlinks_from_spans(kinds, texts, refs)
            docs_out[rec.canon] = (spans, tuple(outlinks), g, rec.ord_key)
            for li, link in enumerate(outlinks):
                children_raw.append(
                    (link, rec.canon, rec.depth + 1, child_ord_key(rec.ord_key, li), False)
                )

        # ---- d/e. next frontier
        fresh = discover(children_raw, g + 1)
        frontier = deferred + fresh

    return SimResult(
        seen=dict(seen),
        crawl_order=sorted(crawl_order),
        docs_out=docs_out,
        domain_state=domain_state,
        metrics=dict(metrics),
        generations_run=gens_run,
    )
