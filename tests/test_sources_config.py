"""S1 seed readers, S6 config loader, §2.10 Stage protocol."""

import json

import pyarrow as pa
import pytest

from ccrawler_ray.config import CrawlConfig
from ccrawler_ray.sources.seeds import read_seed_file


def test_config_from_yaml_file():
    cfg = CrawlConfig.from_file("fixtures/config_small.yaml")
    assert cfg.seeds == (
        "http://h0.example/p0", "http://h1.example/p0", "http://h7.example/p3"
    )
    assert cfg.max_depth == 6
    assert cfg.per_host_budget_per_generation == 4
    assert cfg.max_generations == 12


def test_config_from_json_file(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"seeds": ["http://a.example/"], "max_depth": 3}))
    cfg = CrawlConfig.from_file(p)
    assert cfg.seeds == ("http://a.example/",)
    assert cfg.max_depth == 3


def test_config_scaled_for():
    cfg = CrawlConfig(seeds=()).scaled_for(32)
    # pools scale with CPUs but cap at 8 on a single node (RPC fan-out
    # dominates past that at sandbox sizes — see scaled_for docstring)
    assert cfg.num_seen_shards == 8
    assert cfg.num_politeness_partitions == 8
    assert CrawlConfig(seeds=()).scaled_for(8).num_seen_shards == 4
    cfg2 = CrawlConfig(seeds=()).scaled_for(2)
    assert cfg2.num_seen_shards == 2


def test_read_seed_file_text(tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text("# comment\nhttp://a.example/p1\n\nhttp://b.example/p2\n")
    assert read_seed_file(p) == ("http://a.example/p1", "http://b.example/p2")


def test_read_seed_file_jsonl(tmp_path):
    p = tmp_path / "seeds.jsonl"
    p.write_text('{"url": "http://a.example/p1"}\n{"url": "http://b.example/p2"}\n')
    assert read_seed_file(p) == ("http://a.example/p1", "http://b.example/p2")


def test_read_seed_file_json_array(tmp_path):
    p = tmp_path / "seeds.json"
    p.write_text('["http://a.example/p1", "http://b.example/p2"]')
    assert read_seed_file(p) == ("http://a.example/p1", "http://b.example/p2")


@pytest.mark.usefixtures("ray_session")
def test_extra_stage_applies_to_docs_out(tiny_corpus):
    """§2.10: a custom batch_map Stage composes into the docs path."""
    from ccrawler_ray.pipelines.crawl import CrawlEngine
    from ccrawler_ray.pipelines.stage import Stage

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n_spans", pa.array([len(s) for s in batch.column("spans").to_pylist()],
                                pa.int64())
        )

    cfg = CrawlConfig(
        seeds=("http://h0.example/p0",), max_generations=2,
        num_seen_shards=2, num_politeness_partitions=2,
    )
    eng = CrawlEngine(tiny_corpus, cfg, extra_stages=[Stage("tag", tag)])
    try:
        res = eng.run()
        df = res.docs_out.to_pandas()
        assert "n_spans" in df.columns
        assert (df["n_spans"] == df["spans"].map(len)).all()
    finally:
        eng.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_corpus_lift_distributed_equals_serial():
    """The distributed corpus builder (read_parquet → map_batches lift
    → union robots) must produce row-for-row the SAME table as the
    serial reference `corpus_from_documents` (shared kernel), and the
    memoized parquet artifact must hold the same content."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ccrawler_ray.sources.corpus import (
        corpus_dataset, corpus_from_documents, corpus_parquet)

    path = "/root/testdata/sf0.001/documents.parquet"
    serial = corpus_from_documents(path)
    dist = pa.concat_tables(
        ray.get(corpus_dataset(path).to_arrow_refs())).combine_chunks()
    assert dist.cast(serial.schema).to_pylist() == serial.to_pylist()
    art = pq.read_table(corpus_parquet("/root/testdata/sf0.001"))
    assert art.num_rows == serial.num_rows
    assert (art.cast(serial.schema).sort_by("doc_id").to_pylist()
            == serial.sort_by("doc_id").to_pylist())


def test_corpus_lift_rejects_noncontiguous(tmp_path):
    """The by-value link-target rule requires doc_id == 0..n-1; a
    gapped id space must fail LOUDLY, not silently mis-link."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from ccrawler_ray.sources.corpus import corpus_from_documents

    t = pa.table({"doc_id": pa.array([0, 1, 5], pa.int64()),
                  "text": pa.array(["a b c", "d e f", "g h i"])})
    p = tmp_path / "documents.parquet"
    pq.write_table(t, p)
    with _pytest.raises(ValueError, match="contiguous"):
        corpus_from_documents(str(p))


def test_corpus_parquet_recovers_from_stale_partial(ray_session, tmp_path):
    """A crashed build can leave a non-empty artifact dir WITHOUT its
    completion marker; the next corpus_parquet call must sweep it and
    rebuild instead of wedging on ENOTEMPTY forever (ADVICE r4)."""
    import shutil
    from pathlib import Path

    import pyarrow.parquet as pq

    from ccrawler_ray.sources import corpus as C

    src = tmp_path / "documents.parquet"
    shutil.copy("/root/testdata/sf0.001/documents.parquet", src)

    out1 = Path(C.corpus_parquet(str(tmp_path)))
    assert (out1 / ".done").exists()
    n1 = sum(pq.read_metadata(f).num_rows for f in out1.glob("*.parquet"))

    # simulate the crash: completion marker gone, dir non-empty + stale
    (out1 / ".done").unlink()
    (out1 / "junk.bin").write_bytes(b"partial")

    out2 = Path(C.corpus_parquet(str(tmp_path)))
    assert out2 == out1
    assert (out2 / ".done").exists()
    assert not (out2 / "junk.bin").exists(), "stale dir must be swept"
    n2 = sum(pq.read_metadata(f).num_rows for f in out2.glob("*.parquet"))
    assert n2 == n1

    # and a third call is a pure memo hit
    assert Path(C.corpus_parquet(str(tmp_path))) == out1


def test_corpus_lift_rejects_duplicate_ids(ray_session, tmp_path):
    """min/max alone cannot catch duplicate doc_ids ([0,2,2] passes);
    the column-scan fallback must assert uniqueness (ADVICE r4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from ccrawler_ray.sources.corpus import corpus_from_documents

    t = pa.table({"doc_id": pa.array([0, 2, 2], pa.int64()),
                  "text": pa.array(["a b c", "d e f", "g h i"])})
    p = tmp_path / "documents.parquet"
    # stats disabled so the metadata path falls back to the scan
    pq.write_table(t, p, write_statistics=False)
    with _pytest.raises(ValueError, match="UNIQUE|contiguous"):
        corpus_from_documents(str(p))
