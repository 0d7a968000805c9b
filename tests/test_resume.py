"""Checkpoint/resume (SURVEY.md §4.5): kill after gen k, resume in a
fresh engine, final state must be identical to the uninterrupted run —
the 'resume exactly' criterion of BASELINE.json."""

import dataclasses

import pytest

from ccrawler_ray.config import CrawlConfig
from ccrawler_ray.pipelines.crawl import CrawlEngine

CFG = CrawlConfig(
    seeds=("http://h0.example/p0", "http://h1.example/p0", "http://h7.example/p3"),
    max_generations=6,
    num_seen_shards=3,
    num_politeness_partitions=2,
)

ORDER_COLS = ["generation", "host", "queue_pos", "ord_key", "canon", "status", "fetch_ts_us"]


@pytest.mark.usefixtures("ray_session")
def test_kill_and_resume_equals_uninterrupted(small_corpus, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    # run 1: "killed" after generation 3 (checkpoints written per gen)
    eng1 = CrawlEngine(small_corpus, dataclasses.replace(CFG, max_generations=3), ckpt_dir=ckpt)
    eng1.run()
    eng1.shutdown()

    # run 2: fresh engine, resume, continue to completion
    eng2 = CrawlEngine(small_corpus, CFG, ckpt_dir=ckpt)
    assert eng2.resume()
    assert eng2._start_gen == 3
    r2 = eng2.run()
    eng2.shutdown()

    # reference: uninterrupted run
    eng3 = CrawlEngine(small_corpus, CFG)
    r3 = eng3.run()
    eng3.shutdown()

    assert sorted(r2.seen.column("canon").to_pylist()) == sorted(
        r3.seen.column("canon").to_pylist()
    )
    assert (
        r2.crawl_order[ORDER_COLS].values.tolist()
        == r3.crawl_order[ORDER_COLS].values.tolist()
    )
    assert r2.generations_run == r3.generations_run
    # docs_out parity (content equality via sorted doc ids + ord keys)
    d2 = r2.docs_out.to_pandas().sort_values("doc_id")
    d3 = r3.docs_out.to_pandas().sort_values("doc_id")
    assert d2["doc_id"].tolist() == d3["doc_id"].tolist()
    assert d2["ord_key"].tolist() == d3["ord_key"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_kill_and_resume_actor_mode(small_corpus, tmp_path):
    """Same §4.5 criterion with the actor-resident frontier: queues are
    dumped per partition and re-routed on restore (including across a
    DIFFERENT partition count)."""
    ckpt = str(tmp_path / "ck_actor")
    cfg_a = dataclasses.replace(CFG, admission_mode="actor")
    eng1 = CrawlEngine(
        small_corpus, dataclasses.replace(cfg_a, max_generations=3), ckpt_dir=ckpt
    )
    eng1.run()
    eng1.shutdown()

    # resume with MORE partitions/shards than the dumping run used
    cfg_b = dataclasses.replace(
        cfg_a, num_seen_shards=5, num_politeness_partitions=4
    )
    eng2 = CrawlEngine(small_corpus, cfg_b, ckpt_dir=ckpt)
    assert eng2.resume()
    assert eng2._start_gen == 3
    r2 = eng2.run()
    eng2.shutdown()

    eng3 = CrawlEngine(small_corpus, cfg_a)
    r3 = eng3.run()
    eng3.shutdown()

    assert sorted(r2.seen.column("canon").to_pylist()) == sorted(
        r3.seen.column("canon").to_pylist()
    )
    assert (
        r2.crawl_order[ORDER_COLS].values.tolist()
        == r3.crawl_order[ORDER_COLS].values.tolist()
    )


@pytest.mark.usefixtures("ray_session")
def test_resume_without_checkpoint_returns_false(small_corpus, tmp_path):
    eng = CrawlEngine(small_corpus, CFG, ckpt_dir=str(tmp_path / "nope"))
    try:
        assert not eng.resume()
    finally:
        eng.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_gc_keeps_outputs_and_resume(small_corpus, tmp_path):
    """GC drops old state dumps but keeps outputs; resume from the
    retained newest generation still equals the uninterrupted run."""
    from ccrawler_ray import storage

    ckpt = tmp_path / "ck_gc"
    eng1 = CrawlEngine(small_corpus, dataclasses.replace(CFG, max_generations=3),
                       ckpt_dir=str(ckpt))
    eng1.run()
    eng1.shutdown()
    touched = storage.gc_checkpoints(ckpt, keep_last=1)
    assert touched == [0, 1]
    # outputs retained for GC'd generations
    assert storage.dataset_files(ckpt / "gen=0" / "docs_out")
    assert not (ckpt / "gen=0" / "frontier").exists()
    assert storage.latest_valid_generation(ckpt) == 2

    eng2 = CrawlEngine(small_corpus, CFG, ckpt_dir=str(ckpt))
    assert eng2.resume()
    assert eng2._start_gen == 3
    r2 = eng2.run()
    eng2.shutdown()
    eng3 = CrawlEngine(small_corpus, CFG)
    r3 = eng3.run()
    eng3.shutdown()
    assert sorted(r2.seen.column("canon").to_pylist()) == sorted(
        r3.seen.column("canon").to_pylist()
    )
    assert (
        r2.crawl_order[ORDER_COLS].values.tolist()
        == r3.crawl_order[ORDER_COLS].values.tolist()
    )


@pytest.mark.usefixtures("ray_session")
def test_partial_generation_dir_is_ignored(small_corpus, tmp_path):
    """A gen dir without MANIFEST.json (crash mid-write) must be skipped."""
    ckpt = tmp_path / "ckpt"
    eng1 = CrawlEngine(small_corpus, dataclasses.replace(CFG, max_generations=2), ckpt_dir=str(ckpt))
    eng1.run()
    eng1.shutdown()
    # simulate a crash during gen=5's write: partial dir, no manifest
    (ckpt / "gen=5" / "frontier").mkdir(parents=True)
    eng2 = CrawlEngine(small_corpus, CFG, ckpt_dir=str(ckpt))
    try:
        assert eng2.resume()
        assert eng2._start_gen == 2  # resumed from gen=1, not the partial gen=5
    finally:
        eng2.shutdown()
