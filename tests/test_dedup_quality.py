"""Quality properties of the approximate dedup/similarity operators:
LSH recall is MEASURED against the exact baselines, not assumed."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_recall_vs_exact_jaccard():
    from ccrawler_ray.functions.dedup import lsh_pair_stream, ngram_jaccard_pairs

    exact = ngram_jaccard_pairs(SF, threshold=0.85).to_pandas()
    approx = lsh_pair_stream(SF, threshold=0.8).to_pandas()
    exact_pairs = set(zip(exact["doc_a"], exact["doc_b"]))
    approx_pairs = set(zip(approx["doc_a"], approx["doc_b"]))
    assert exact_pairs, "fixture should contain high-jaccard pairs"
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # 16 bands x 4 rows: P(collide | j=0.85) = 1-(1-0.85^4)^16 ~ 0.9998;
    # estimator noise at the 0.8 cut loses a few -> demand >= 0.9
    assert recall >= 0.9, f"LSH recall too low: {recall:.3f}"


@pytest.mark.usefixtures("ray_session")
def test_lsh_verified_subset_of_exact_with_recall():
    """dedup_lsh_verified = EXACT jaccard on LSH candidates: every
    emitted pair must appear in the all-pairs exact output with the
    SAME jaccard value (precision 1.0), and recall must be high."""
    from ccrawler_ray.functions.dedup import lsh_verified_pair_stream, ngram_jaccard_pairs

    exact = ngram_jaccard_pairs(SF, threshold=0.8).to_pandas()
    ver = lsh_verified_pair_stream(SF, threshold=0.8).to_pandas()
    epairs = {(int(r.doc_a), int(r.doc_b)): r.jaccard for r in exact.itertuples()}
    assert len(ver)
    for r in ver.itertuples():
        key = (int(r.doc_a), int(r.doc_b))
        assert key in epairs
        assert abs(epairs[key] - r.jaccard) < 1e-12
    recall = len(ver) / len(epairs)
    assert recall >= 0.9, f"verified-candidate recall too low: {recall:.3f}"


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("radius", [3, 6])
def test_simhash_pairs_exactly_match_brute_force(radius):
    """Radius-derived blocking (max_hamming+1 blocks) guarantees FULL
    recall by pigeonhole; verify is exact hamming — so the operator's
    output must EQUAL the brute-force pair set (ADVICE r1: the old
    fixed 4-block scheme silently missed hamming 4..max pairs)."""
    from ccrawler_ray.functions.dedup import dedup_simhash, simhash_signatures

    pairs = dedup_simhash(SF, max_hamming=radius).to_pandas()
    assert (pairs["hamming"] <= radius).all()
    sigs = simhash_signatures(SF).to_pandas().sort_values("doc_id")
    ids = sigs["doc_id"].to_numpy()
    sh = sigs["simhash"].to_numpy().astype(np.uint64)
    ia, ib = np.triu_indices(len(ids), k=1)
    x = sh[ia] ^ sh[ib]
    ham = np.array([bin(int(v)).count("1") for v in x])
    brute = {
        (int(ids[i]), int(ids[j]), int(h))
        for i, j, h in zip(ia[ham <= radius], ib[ham <= radius], ham[ham <= radius])
    }
    got = {(int(r.doc_a), int(r.doc_b), int(r.hamming)) for r in pairs.itertuples()}
    assert got == brute


@pytest.mark.usefixtures("ray_session")
def test_ann_ivf_recall_vs_brute_force():
    from ccrawler_ray.functions.similarity import ann_ivf_topk, ann_topk_cosine

    exact = ann_topk_cosine(SF, num_queries=5, k=5).to_pandas()
    approx = ann_ivf_topk(SF, num_queries=5, k=5).to_pandas()
    et = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    at = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    recall = len(et & at) / len(et)
    # 4-of-16 probed clusters must recover most true neighbors
    assert recall >= 0.6, f"IVF recall too low: {recall:.3f}"


@pytest.mark.usefixtures("ray_session")
def test_media_pipeline_frames():
    from ccrawler_ray.functions.multimodal import media_pipeline

    frames = media_pipeline(SF).to_pandas()
    assert len(frames) > 500  # explodes to multiple frames per doc
    assert (frames["offset_bytes"] == frames["frame"] * 64).all()
    assert frames.groupby("doc_id")["frame"].apply(
        lambda s: (sorted(s) == list(range(len(s))))
    ).all()


@pytest.mark.usefixtures("ray_session")
def test_ann_lsh_recall_vs_brute_force():
    from ccrawler_ray.functions.similarity import ann_lsh_topk, ann_topk_cosine

    exact = ann_topk_cosine(SF, num_queries=5, k=5).to_pandas()
    approx = ann_lsh_topk(SF, num_queries=5, k=5).to_pandas()
    exact_top = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    approx_top = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    recall = len(exact_top & approx_top) / len(exact_top)
    # random-hyperplane LSH on near-orthogonal random vectors is a weak
    # filter; it must still recover a nontrivial fraction of true top-k
    assert recall >= 0.2, f"ANN LSH recall too low: {recall:.3f}"
    # and every reported neighbor's cosine must be exact (verified
    # against the brute-force score for overlapping pairs)
    merged = approx.merge(exact, on=["query_id", "vec_id"], suffixes=("_a", "_e"))
    if len(merged):
        assert np.allclose(merged["cos_a"], merged["cos_e"], atol=1e-4)


@pytest.mark.usefixtures("ray_session")
def test_embedding_lsh_dedup_recall_and_precision():
    """dedup_embedding_lsh must be a SUBSET of the exact all-pairs
    result (perfect precision — every emitted pair is verified) with
    recall >= 0.8 at the default plane/table economics."""
    from ccrawler_ray.functions.dedup import (dedup_embedding_cosine,
                                              dedup_embedding_lsh)

    exact = dedup_embedding_cosine(SF, threshold=0.4).to_pandas()
    approx = dedup_embedding_lsh(SF, threshold=0.4).to_pandas()
    e = {(r.vec_a, r.vec_b) for r in exact.itertuples()}
    a = {(r.vec_a, r.vec_b) for r in approx.itertuples()}
    assert a <= e, f"false positives: {sorted(a - e)[:5]}"
    assert len(approx) == len(a), "pair emitted more than once"
    recall = len(a & e) / max(len(e), 1)
    assert recall >= 0.8, f"embedding LSH recall too low: {recall:.3f}"


@pytest.mark.usefixtures("ray_session")
def test_dedup_clusters_propagation_path_equals_union_find():
    """The distributed min-label-propagation CC (the >threshold scale
    path) must produce the identical clustering as the single-task
    union-find fast path."""
    from ccrawler_ray.functions.dedup import dedup_clusters

    fast = dedup_clusters(SF, threshold=0.8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    dist = dedup_clusters(SF, threshold=0.8, cc_driver_threshold=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert fast["doc_id"].tolist() == dist["doc_id"].tolist()
    assert fast["cluster_rep"].tolist() == dist["cluster_rep"].tolist()
    assert fast["keep"].tolist() == dist["keep"].tolist()
    # sanity: representatives are cluster minima and keep marks them
    assert (fast.loc[fast["keep"], "doc_id"]
            == fast.loc[fast["keep"], "cluster_rep"]).all()


@pytest.mark.usefixtures("ray_session")
def test_empty_docs_never_near_dup(tmp_path):
    """Docs with empty/whitespace-only text have empty word sets —
    exact Jaccard is 0 (union 0), so neither the verified-pair kernel
    nor clustering may pair them (regression: the identical-key fast
    path scored empty wsets 1.0)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ccrawler_ray.functions.dedup import dedup_clusters, lsh_verified_pair_stream

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["", "   ", "alpha beta gamma", "alpha beta gamma"]),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["t"] * 4),
        "n_chars": pa.array([0, 3, 16, 16], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    pairs = lsh_verified_pair_stream(str(tmp_path), threshold=0.5).to_pandas()
    assert not ((pairs["doc_a"] == 0) & (pairs["doc_b"] == 1)).any()
    assert ((pairs["doc_a"] == 2) & (pairs["doc_b"] == 3)).any()
    clusters = dedup_clusters(str(tmp_path), threshold=0.5).to_pandas() \
        .set_index("doc_id")
    assert clusters.loc[0, "cluster_rep"] == 0 and clusters.loc[1, "cluster_rep"] == 1
    assert clusters.loc[3, "cluster_rep"] == 2


def test_ngram_spans_cross_doc_semantics(tmp_path):
    """dedup_ngram_spans counts exactly the windows whose 5-gram also
    occurs in another doc: a shared verbatim passage marks its windows
    duplicated in BOTH docs, unique text scores 0, and within-doc-only
    repetition does not count as duplicated."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ccrawler_ray.functions.dedup import dedup_ngram_spans

    passage = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    uniq = " ".join(f"u{i}" for i in range(10))
    selfrep = " ".join(["r0 r1 r2 r3 r4"] * 3)  # 15 tokens, all self-repeats
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([f"{passage} extra0 extra1",
                          f"lead0 lead1 {passage}",
                          uniq, selfrep, "short text"]),
        "lang": pa.array(["en"] * 5),
        "source": pa.array(["t"] * 5),
        "n_chars": pa.array([0] * 5, pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (dedup_ngram_spans(str(tmp_path), n=5, min_docs=2)
           .to_pandas().set_index("doc_id"))
    # the 10-token passage has 6 5-gram windows, shared by docs 0 and 1
    assert out.loc[0, "dup_windows"] == 6 and out.loc[1, "dup_windows"] == 6
    assert out.loc[0, "n_windows"] == 8 and out.loc[1, "n_windows"] == 8
    assert out.loc[0, "dup_ratio"] == 0.75
    assert out.loc[2, "dup_windows"] == 0 and out.loc[2, "n_windows"] == 6
    # within-doc repeats are NOT cross-doc duplication
    assert out.loc[3, "dup_windows"] == 0 and out.loc[3, "n_windows"] == 11
    # docs with < n tokens emit no row
    assert 4 not in out.index


def test_ngram_spans_all_short_docs_batch(tmp_path):
    """A batch whose docs together have >= n tokens but where NO single
    doc reaches n tokens must yield an empty result, not an IndexError
    (every window crosses a doc boundary)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ccrawler_ray.functions.dedup import dedup_ngram_spans

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b c d", "e f g", "h i j k"]),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["t"] * 3),
        "n_chars": pa.array([7, 5, 7], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = dedup_ngram_spans(str(tmp_path), n=5, min_docs=2).to_pandas()
    assert len(out) == 0


def test_decontaminate_overlap_semantics(tmp_path):
    """decontaminate_overlap counts DISTINCT training-doc 5-grams that
    also occur in the eval split (doc_id % bench_mod == 0): a verbatim
    copy of an eval passage is contaminated, unique text scores 0, and
    eval docs themselves emit no row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ccrawler_ray.functions.dedup import decontaminate_overlap

    passage = "the quick brown fox jumps over the lazy dog tonight"  # 10 tok
    uniq = " ".join(f"u{i}" for i in range(10))
    t = pa.table({
        # doc 0 is the eval doc (0 % 5 == 0); 1 copies its passage
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([passage, f"lead0 lead1 {passage}", uniq, "short"]),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["t"] * 4),
        "n_chars": pa.array([0] * 4, pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (decontaminate_overlap(str(tmp_path), n=5, min_overlap=2,
                                 bench_mod=5)
           .to_pandas().set_index("doc_id"))
    assert 0 not in out.index  # eval rows excluded from the output
    # the 10-token shared passage contributes its 6 distinct 5-grams
    assert out.loc[1, "n_overlap"] == 6 and bool(out.loc[1, "contaminated"])
    assert out.loc[2, "n_overlap"] == 0 and not bool(out.loc[2, "contaminated"])
    # sub-n-token docs have zero windows and are clean
    assert out.loc[3, "n_windows"] == 0 and out.loc[3, "n_overlap"] == 0


@pytest.mark.usefixtures("ray_session")
def test_ann_pq_bitwise_vs_serial_and_recall():
    """PQ/ADC engine output is bitwise-equal to the serial mirror
    (quantized-int64 codebook training is order-independent), and the
    8x16-code compressed search still recovers a usable fraction of
    the exact cosine top-k."""
    import pandas as pd

    from ccrawler_ray import serial_ref as SR
    from ccrawler_ray.functions.similarity import ann_pq_topk, ann_topk_cosine

    eng = (ann_pq_topk(SF, num_queries=5, k=5).to_pandas()
           .sort_values(["query_id", "rank"]).reset_index(drop=True))
    ser = (SR.ann_pq_topk(SF, num_queries=5, k=5)
           .sort_values(["query_id", "rank"]).reset_index(drop=True))
    cols = ["query_id", "vec_id", "adist", "rank"]
    pd.testing.assert_frame_equal(eng[cols], ser[cols])

    exact = ann_topk_cosine(SF, num_queries=5, k=5).to_pandas()
    et = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    at = {(r.query_id, r.vec_id) for r in eng.itertuples()}
    assert len(et & at) / len(et) >= 0.2, "PQ recall collapsed"


@pytest.mark.usefixtures("ray_session")
def test_ann_ivf_pq_bitwise_vs_serial_and_recall():
    """IVF-PQ (coarse quantizer + residual PQ + n_probe inverted
    lists) is bitwise-equal to the serial mirror and keeps usable
    recall vs the exact cosine top-k."""
    import pandas as pd

    from ccrawler_ray import serial_ref as SR
    from ccrawler_ray.functions.similarity import ann_ivf_pq, ann_topk_cosine

    eng = (ann_ivf_pq(SF, num_queries=5, k=5).to_pandas()
           .sort_values(["query_id", "rank"]).reset_index(drop=True))
    ser = (SR.ann_ivf_pq(SF, num_queries=5, k=5)
           .sort_values(["query_id", "rank"]).reset_index(drop=True))
    cols = ["query_id", "vec_id", "adist", "rank"]
    pd.testing.assert_frame_equal(eng[cols], ser[cols])

    exact = ann_topk_cosine(SF, num_queries=5, k=5).to_pandas()
    et = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    at = {(r.query_id, r.vec_id) for r in eng.itertuples()}
    assert len(et & at) / len(et) >= 0.2, "IVF-PQ recall collapsed"


@pytest.mark.usefixtures("ray_session")
def test_dedup_semantic_bitwise_and_sound():
    """SemDeDup-style semantic dedup: bitwise vs the serial mirror,
    and every DROPPED vector really has an exact-cosine near-dup
    among the KEPT set (soundness of the greedy leader rule within
    clusters)."""
    import pandas as pd

    from ccrawler_ray import serial_ref as SR
    from ccrawler_ray.functions.dedup import dedup_semantic

    eng = (dedup_semantic(SF, threshold=0.4).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    ser = SR.dedup_semantic(SF, threshold=0.4).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        eng[["vec_id", "cluster", "keep", "max_cos"]], ser)
    dropped = eng[~eng["keep"]]
    assert len(dropped) > 0  # threshold chosen to actually drop some
    # every dropped vector's recorded max_cos must clear the threshold
    assert (dropped["max_cos"] >= 0.4 - 1e-4).all()
    # first vector of every cluster is kept with the -1 sentinel
    firsts = eng.groupby("cluster").first()
    assert firsts["keep"].all() and (firsts["max_cos"] == -1.0).all()


@pytest.mark.usefixtures("ray_session")
def test_dedup_incremental_engine_eq_serial_and_semantics():
    """Distributed incremental dedup == serial all-pairs mirror, and
    the output honors its contract: only new docs, dup_of is a base
    doc, dup_of matches the serial minimum."""
    import pandas as pd

    from ccrawler_ray import serial_ref as SR
    from ccrawler_ray.functions.dedup import dedup_incremental

    got = (dedup_incremental(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = SR.dedup_incremental(SF).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got), "fixture corpus should contain incremental dups"
    assert (got["doc_id"] % 5 == 0).all()          # only NEW docs
    assert (got["dup_of"] % 5 != 0).all()          # dup_of in the BASE
    assert got["doc_id"].is_unique                 # exactly-once
    assert ((got["est_jaccard"] >= 0.8) & (got["est_jaccard"] <= 1.0)).all()


@pytest.mark.usefixtures("ray_session")
def test_media_dedup_near_engine_eq_serial_bruteforce():
    """Byte-shingle SimHash blocking finds EXACTLY the brute-force
    hamming<=3 pair set (pigeonhole recall), bitwise serial mirror."""
    import pandas as pd

    from ccrawler_ray import serial_ref as SR
    from ccrawler_ray.functions.multimodal import media_dedup_near

    got = (media_dedup_near(SF).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    want = (SR.media_dedup_near(SF)
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert len(got), "fixture corpus should contain near-dup payloads"
    assert (got["doc_a"] < got["doc_b"]).all()
    assert (got["hamming"] <= 3).all()


def test_byte_shingle_simhash_edge_payloads():
    """Frozen kernel edges: empty payload -> 0; short payloads hash as
    one zero-padded shingle; identical payloads -> identical hashes."""
    from ccrawler_ray.functions.multimodal import _byte_shingle_simhash

    h = _byte_shingle_simhash([b"", b"abc", b"abc", b"abcdefgh" * 4])
    assert h[0] == 0
    assert h[1] == h[2] != 0
    # short payload: single shingle -> simhash == splitmix64(padded LE)
    from ccrawler_ray.serial_ref import _splitmix64_int
    assert h[1] == _splitmix64_int(int.from_bytes(b"abc", "little"))


@pytest.mark.usefixtures("ray_session")
def test_embedding_pca_bitwise_and_partition_independent():
    """The exact-integer Gram promise: block partitioning cannot
    change the spectrum bits (Python-int salted reduce; shared frozen
    pca_finish)."""
    import ray.data

    from ccrawler_ray import serial_ref as SR
    from ccrawler_ray.functions.similarity import embedding_pca

    want = SR.embedding_pca(SF)
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024
    try:
        got = embedding_pca(SF)
    finally:
        ctx.target_max_block_size = old
    for c in ("component", "eigenvalue", "explained_var", "cum_var"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # spectrum sanity: eigenvalues descending, cum_var ends at ~1
    ev = got["eigenvalue"].to_numpy()
    assert (ev[:-1] >= ev[1:]).all()
    assert abs(got["cum_var"].iloc[-1] - 1.0) < 1e-6
