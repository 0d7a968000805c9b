"""Round-2 engine features: transient-fetch retries (M6 failure path),
bounded audit log (crawl-order spill), per-partition metrics lineage."""

import dataclasses

import pandas as pd
import pytest

from ccrawler_ray.config import CrawlConfig
from ccrawler_ray.pipelines.crawl import CrawlEngine

# max_depth high enough that the depth gate never binds: transient
# retries delay discovery, which can change a page's FIRST-discovery
# path (and so its depth) — with a binding depth gate the reachable
# set legitimately differs from a failure-free run.
CFG = CrawlConfig(
    seeds=("http://h0.example/p0", "http://h1.example/p0", "http://h7.example/p3"),
    max_depth=64,
    max_generations=48,
    per_host_budget_per_generation=4,
    global_budget_per_generation=64,
    num_seen_shards=4,
    num_politeness_partitions=2,
)


def _run(corpus, cfg, **kw):
    eng = CrawlEngine(corpus, cfg, **kw)
    try:
        return eng.run()
    finally:
        eng.shutdown()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mode", ["driver", "actor"])
def test_transient_retries_converge_to_failure_free_seen_set(tiny_corpus, mode):
    """With deterministic transient failures + requeue, the crawl must
    eventually reach the same URL set as a failure-free run, every
    failed fetch must later succeed (within the retry cap), and the
    retry metrics must balance."""
    base = dataclasses.replace(CFG, admission_mode=mode)
    clean = _run(tiny_corpus, base)
    flaky_cfg = dataclasses.replace(
        base, fetch_failure_rate=0.25, max_fetch_retries=6
    )
    flaky = _run(tiny_corpus, flaky_cfg)

    # both runs must exhaust their frontier within the generation cap
    # (otherwise the comparison would race the cutoff, not semantics)
    assert clean.generations_run < CFG.max_generations
    assert flaky.generations_run < CFG.max_generations
    clean_seen = set(clean.seen.column("canon").to_pylist())
    flaky_seen = set(flaky.seen.column("canon").to_pylist())
    assert flaky_seen == clean_seen

    dump = flaky.crawl_order
    failed = dump[dump["status"] == 599]
    assert len(failed) > 0, "failure injection produced no 599s"
    ok = set(dump[dump["status"] == 200]["canon"])
    not404 = set(dump[dump["status"] != 404]["canon"])
    m = flaky.metrics.to_pandas()

    def total(counter):
        return int(m.loc[m["counter"] == counter, "value"].sum())

    assert total("status_599") == len(failed)
    assert total("retry_requeued") + total("retry_dropped") == len(failed)
    # every transiently-failed URL that wasn't dropped eventually succeeded
    dropped = total("retry_dropped")
    unresolved = {c for c in set(failed["canon"]) & not404 if c not in ok}
    assert len(unresolved) <= dropped
    # clean-run fetch outcomes are a subset relation: every 200 of the
    # clean run is eventually a 200 of the flaky run
    clean_ok = set(clean.crawl_order[clean.crawl_order["status"] == 200]["canon"])
    assert clean_ok <= ok


@pytest.mark.usefixtures("ray_session")
def test_audit_log_spill_equals_in_memory(tiny_corpus, tmp_path):
    """Forcing the crawl-order audit log to spill to checkpoints must
    not change the final crawl_order DataFrame."""
    cfg = dataclasses.replace(CFG, max_generations=6)
    in_mem = _run(tiny_corpus, cfg)
    spilled = _run(
        tiny_corpus, cfg,
        ckpt_dir=str(tmp_path / "ck_spill"),
        audit_in_memory_max_rows=5,   # force spill on the first generation
    )
    a = in_mem.crawl_order.reset_index(drop=True)
    b = spilled.crawl_order.reset_index(drop=True)
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_actor_mode_metrics_have_real_partition_ids(tiny_corpus):
    cfg = dataclasses.replace(CFG, admission_mode="actor", max_generations=6)
    res = _run(tiny_corpus, cfg)
    m = res.metrics.to_pandas()
    adm_p = m[(m["stage"] == "admission") & (m["partition"] >= 0)]
    fresh_p = m[(m["stage"] == "discover") & (m["partition"] >= 0)
                & (m["counter"] == "fresh")]
    assert len(adm_p) > 0 and len(fresh_p) > 0
    # per-partition admission totals must equal the aggregate rows
    for g, grp in adm_p.groupby("generation"):
        agg = m[(m["stage"] == "admission") & (m["partition"] == -1)
                & (m["generation"] == g) & (m["counter"] == "admitted")]
        if len(agg):
            assert grp["value"].sum() == int(agg["value"].iloc[0])


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mode", ["actor", "dataset"])
def test_stage_filters_only_docs_out(tiny_corpus, mode):
    """A row-filtering user stage composes into the docs_out
    projection ONLY, in EVERY admission mode: crawl_order, seen set,
    and politeness accounting must equal the no-stage run (regression:
    actor-mode fusion ran stages upstream of the dump/requeue path;
    dataset mode derived discovery from the staged stream)."""
    from ccrawler_ray.config import CrawlConfig
    from ccrawler_ray.pipelines.crawl import CrawlEngine
    from ccrawler_ray.pipelines.stage import Stage

    def drop_most(batch):
        import numpy as np
        import pyarrow as pa

        g = batch.column("generation").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(g % 2 == 0))

    cfg = CrawlConfig(seeds=("http://h0.example/p0", "http://h1.example/p0"),
                      max_generations=4, admission_mode=mode)
    base_eng = CrawlEngine(tiny_corpus, cfg)
    base = base_eng.run()
    base_eng.shutdown()

    staged_eng = CrawlEngine(
        tiny_corpus, cfg,
        extra_stages=[Stage("drop_odd_gen", drop_most, "batch_map")],
    )
    staged = staged_eng.run()
    staged_eng.shutdown()

    # the crawl itself is unchanged...
    pd.testing.assert_frame_equal(
        base.crawl_order.reset_index(drop=True),
        staged.crawl_order.reset_index(drop=True),
    )
    assert base.seen.num_rows == staged.seen.num_rows
    # ...and only docs_out reflects the stage's filter
    bdf = base.docs_out.to_pandas()
    sdf = staged.docs_out.to_pandas()
    assert len(sdf) < len(bdf)
    assert (sdf["generation"] % 2 == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_actor_mode_partition_metrics_sum_under_global_cap(tiny_corpus):
    """When the global budget binds, per-partition admitted counts must
    be POST-cap so partition rows sum to the aggregate (regression:
    pre-cap counts were recorded)."""
    from ccrawler_ray.config import CrawlConfig
    from ccrawler_ray.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(seeds=("http://h0.example/p0", "http://h1.example/p0",
                             "http://h2.example/p0", "http://h3.example/p0"),
                      max_generations=4, admission_mode="actor",
                      global_budget_per_generation=3)
    eng = CrawlEngine(tiny_corpus, cfg)
    res = eng.run()
    eng.shutdown()
    m = res.metrics.to_pandas() if hasattr(res.metrics, "to_pandas") else res.metrics
    adm = m[(m["stage"] == "admission") & (m["counter"] == "admitted")]
    agg = adm[adm["partition"] == -1].set_index("generation")["value"]
    per = adm[adm["partition"] >= 0].groupby("generation")["value"].sum()
    for g, v in agg.items():
        assert per.get(g, 0) == v, (g, per.get(g, 0), v)
    # global cap respected every generation
    assert (agg <= 3).all()


@pytest.mark.usefixtures("ray_session")
def test_analyze_vectorized_equals_per_doc_reference(tiny_corpus):
    """The chunk-vectorized analyze kernel must be bitwise equal to
    the straightforward per-document computation for every column."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from ccrawler_ray.functions.dedup import word_hashes
    from ccrawler_ray.stages.analyze import (_A, _B, _BIT_WEIGHTS, _MERSENNE,
                                             NUM_PERM, analyze_docs)
    from ccrawler_ray.spec import as_single_array

    # docs-shaped batch straight from the corpus spans
    batch = tiny_corpus.select(["doc_id", "spans"])
    got = analyze_docs(batch)

    spans = as_single_array(batch.column("spans"))
    flat = spans.flatten()
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    offs = spans.offsets.to_numpy(zero_copy_only=False)
    for i in range(batch.num_rows):
        words: list = []
        h = hashlib.blake2b(digest_size=8, key=b"content0")
        for j in range(offs[i], offs[i + 1]):
            if kinds[j] == "text":
                words.extend(texts[j].split())
                h.update(texts[j].encode())
        assert got.column("n_tokens")[i].as_py() == len(words)
        assert got.column("content_hash")[i].as_py() == int.from_bytes(
            h.digest(), "little")
        ws = set(words)
        wh = word_hashes(ws)
        if len(wh):
            vals = (_A[:, None] * wh[None, :] + _B[:, None]) % _MERSENNE
            ref_sig = vals.min(axis=1).tolist()
            bits = (wh[:, None] & _BIT_WEIGHTS[None, :]) != 0
            votes = bits.sum(axis=0) * 2 - len(wh)
            ref_sim = int((_BIT_WEIGHTS[votes > 0]).sum(dtype=np.uint64))
        else:
            ref_sig = [int(_MERSENNE)] * NUM_PERM
            ref_sim = 0
        assert got.column("minhash_sig")[i].as_py() == ref_sig, i
        assert got.column("simhash")[i].as_py() == ref_sim, i
