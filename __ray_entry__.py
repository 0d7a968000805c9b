"""Driver contract for the graft builder (Ray Data target).

``entry()``   — flagship crawl over an interleaved corpus deterministically
                lifted from /root/testdata/sf0.001/documents.parquet.
``queries()`` — one callable per implemented operator (SURVEY.md §2 +
                the training-data toolkit), each over ``sf_dir``.
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
                (same column names; ratios floor-scaled, float aggregates
                rounded identically on both sides).

Ray is initialised by the driver before this module is imported — no
ray.init()/ray.shutdown() here or in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: real crawl engine over testdata-derived interleaved
    corpus (4 generations), returning the docs_out Dataset."""
    from ccrawler_ray.config import CrawlConfig
    from ccrawler_ray.pipelines.crawl import CrawlEngine
    from ccrawler_ray.sources.corpus import corpus_parquet, default_seeds

    # the interleaved corpus is built DISTRIBUTED once per sf_dir and
    # handed to the engine BY PATH — its broadcast/semi-join size seam
    # decides how the bytes move (never a driver-side per-row lift).
    corpus = corpus_parquet(SF0001)
    cfg = CrawlConfig(
        seeds=default_seeds(4),
        max_generations=4,
        per_host_budget_per_generation=8,
        global_budget_per_generation=200,
        num_seen_shards=4,
        num_politeness_partitions=2,
    )
    eng = CrawlEngine(corpus, cfg)
    try:
        res = eng.run()
        return res.docs_out
    finally:
        eng.shutdown()


def _crawl_docs_out(sf_dir: str):
    """Crawl pipeline as a query: docs_out audit columns (no spans)."""
    from ccrawler_ray.config import CrawlConfig
    from ccrawler_ray.pipelines.crawl import CrawlEngine
    from ccrawler_ray.sources.corpus import corpus_parquet, default_seeds

    corpus = corpus_parquet(sf_dir)  # distributed lift, engine takes a path
    cfg = CrawlConfig(
        seeds=default_seeds(4),
        max_generations=4,
        per_host_budget_per_generation=8,
        global_budget_per_generation=200,
        num_seen_shards=4,
        num_politeness_partitions=2,
    )
    eng = CrawlEngine(corpus, cfg)
    try:
        res = eng.run()
        return res.crawl_order[["generation", "host", "queue_pos", "ord_key", "canon", "status"]]
    finally:
        eng.shutdown()


# Cheapest-first execution order (measured per-query seconds at
# sf0.01 / 32 CPUs, 2026-08-18): the driver's CORRECTNESS budget walks
# queries() in dict order, so cheap entries run first and a budget cut
# truncates the fewest checks (VERDICT r2 #1). Times include the
# session-memo warm-up effects of this order (the first entry of each
# memo family pays its build). Names absent from the list (future
# additions before the next re-measure) sort last, alphabetically.
_QUERY_ORDER = (
    "dedup_ngram_spans", "decontaminate_overlap", "m10_normalize_text",
    "m9_content_hash", "scalar_string_ops", "o3_sample_hash",
    "o8_hash_split", "o9_seeded_shuffle", "o11_chunk_overlap",
    "io_pushdown_scan", "mix_curriculum_order",
    "explode_embeddings",
    "spans_rollup", "spans_integrity_report", "spans_line_dedup",
    "spans_pack_multimodal", "o3_sample",
    "d1_exact_dedup", "doc_fingerprint", "char_entropy", "token_count_bpe",
    "o2_global_topk", "d3_content_dedup", "g14_group_median",
    "g17_string_agg", "quality_score", "quality_compression",
    "media_byte_stats",
    "g5_hll_distinct", "g11_countmin_est", "o4_stratified_sample",
    "repetition_stats", "gopher_quality", "o6_weighted_sample", "search_bm25",
    "j2_anti_join", "pii_scrub", "media_dedup_exact", "o1_global_sort",
    "g18_unpivot", "o7_wordcount_topk", "g4_distinct_counts",
    "q6_forecast_revenue", "q14_promo_revenue", "q19_discounted_revenue",
    "q17_small_qty_revenue", "q15_top_supplier", "q11_important_stock",
    "g8_grouped_quantiles",
    "g1_rank_topk_per_key",
    "w2_sessionize", "g16_heavy_hitters", "w9_percent_rank", "w6_ntile",
    "w7_rolling_mean", "w5_lag_lead", "ann_topk_cosine", "ann_range_search",
    "ann_ivf_topk",
    "w1_running_sum", "w11_ewma", "g10_pivot", "ann_lsh_topk",
    "j3_semi_join", "token_count", "g13_user_value_drift", "j6_range_join",
    "quality_filtered_docs", "s2_set_except", "ngram_jaccard_pairs",
    "j1_broadcast_join", "o5_exact_quantiles", "w3_tumbling_window",
    "d5_latest_per_key", "w4_sliding_window", "g3_metrics_rollup",
    "s1_set_intersect", "q13_customer_distribution", "q22_sales_opportunity",
    "q20_excess_suppliers", "q21_waiting_supplier",
    "q2_min_cost_supplier", "q16_part_supplier_counts",
    "mix_interleave", "mix_temperature_sample",
    "w10_funnel", "g15_corr", "g20_regression", "w12_retention_cohorts",
    "w13_scd2_history", "w14_markov_transitions", "o12_skyline",
    "j10_fuzzy_join", "g22_mad", "g23_market_basket", "model_auc_report",
    "io_orc_roundtrip", "source_ngram_overlap", "ann_nsw_topk",
    "zipf_fit", "source_sketch_sim", "fertility_stats",
    "g21_zscore_outliers", "search_phrase", "pmi_topk",
    "g19_grouping_sets", "bpe_pair_topk", "bpe_train_merges",
    "bpe_encode_stats", "dsir_importance",
    "ann_hybrid_search",
    "j5_asof_join", "tfidf_topk", "link_pagerank", "link_hits",
    "link_components",
    "q1_pricing_summary",
    "dedup_semantic", "j7_bloom_semi_join", "media_pipeline",
    "j9_full_outer_join", "w8_late_events", "m11_json_extract",
    "ann_pq_topk", "ann_sq_topk", "model_score_docs", "io_jsonl_roundtrip",
    "g7_quantile_hist", "ann_ivf_pq", "ann_index_roundtrip",
    "ann_filtered_topk",
    "q3_shipping_priority", "dedup_embedding_cosine", "decode_media_meta",
    "o10_pack_sequences", "dedup_embedding_lsh", "media_dedup_near",
    "dedup_simhash", "lang_id", "m2_filter_validate", "io_csv_roundtrip",
    "io_ipc_roundtrip",
    "dedup_filtered_docs", "link_triangles", "lm_perplexity",
    "ccnet_buckets",
    "dedup_minhash_lsh", "j4_multi_join", "j8_salted_skew_join",
    "g9_rollup", "dedup_incremental", "dedup_lsh_verified",
    "training_mix_stats", "ann_recall_report", "q4_order_priority",
    "q12_late_priority", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "q18_big_orders",
    "g12_embedding_centroids", "embedding_pca", "cluster_kmeans",
    "knn_graph", "dedup_containment_stats",
    "q10_returned_revenue", "q5_local_supplier_volume",
    "io_partitioned_roundtrip", "dedup_index_roundtrip",
    "dedup_clusters", "corpus_prep_stats",
    "crawl_docs_out",
)


def _rotation_offset(n: int) -> int:
    """Driver CORRECTNESS budget rotation (VERDICT r3 #4): the driver
    checks only the FIRST 50 ``queries()`` entries, so rotate which
    50-entry window of the cost order leads — every entry gets a driver
    row every ~n/50 rounds.  Window index = (round + 1) % n_windows,
    where round comes from the COMMITTED ``ROUND`` marker file (bumped
    once per round) so the ordering is reproducible from repo contents
    alone — not from untracked artifacts.  Rounds 1–3 all ran window 0,
    round 4 led with window 1 (fully disjoint from r03's coverage),
    round 5 window 2, …"""
    from pathlib import Path

    marker = Path(__file__).resolve().parent / "ROUND"
    try:
        rnd = int(marker.read_text().strip())
    except (OSError, ValueError):
        rnd = 1
    n_windows = max(1, -(-n // 50))
    return ((rnd + 1) % n_windows) * 50


def _cost_ordered(d: dict) -> dict:
    rank = {n: i for i, n in enumerate(_QUERY_ORDER)}
    names = sorted(d, key=lambda n: (rank.get(n, len(rank)), n))
    off = _rotation_offset(len(names))
    return {k: d[k] for k in names[off:] + names[:off]}


def queries() -> dict[str, Callable[[str], Any]]:
    from ccrawler_ray import relational as R
    from ccrawler_ray.functions import dedup as D
    from ccrawler_ray.functions import graph as G
    from ccrawler_ray.functions import multimodal as M
    from ccrawler_ray.functions import similarity as S
    from ccrawler_ray.functions import spans as SP
    from ccrawler_ray.functions import sketch as SK
    from ccrawler_ray.functions import text as T
    from ccrawler_ray.pipelines import mix as MIX
    from ccrawler_ray.sinks import partitioned as PS
    from ccrawler_ray.sources import csvio as CSV
    from ccrawler_ray.sources import ipcio as IPC
    from ccrawler_ray.sources import jsonl as JL
    from ccrawler_ray.sources import orcio as ORC

    return _cost_ordered({
        # --- per-record maps / filters / scalar fns (M-rows)
        "m2_filter_validate": R.m2_filter_validate,
        "m9_content_hash": R.m9_content_hash,
        "m10_normalize_text": R.m10_normalize_text,
        "m11_json_extract": R.m11_json_extract,
        "scalar_string_ops": R.scalar_string_ops,
        # --- set ops (S-rows)
        "s1_set_intersect": R.s1_set_intersect,
        "s2_set_except": R.s2_set_except,
        # --- dedup (D-rows)
        "d1_exact_dedup": R.d1_exact_dedup,
        "d3_content_dedup": R.d3_content_dedup,
        # --- aggregations (G-rows)
        "g1_rank_topk_per_key": R.g1_rank_topk_per_key,
        "g3_metrics_rollup": R.g3_metrics_rollup,
        "g4_distinct_counts": R.g4_distinct_counts,
        "g5_hll_distinct": SK.g5_hll_distinct,
        "g7_quantile_hist": SK.g7_quantile_hist,
        "g8_grouped_quantiles": SK.g8_grouped_quantiles,
        "g11_countmin_est": SK.g11_countmin_est,
        "g16_heavy_hitters": SK.g16_heavy_hitters,
        "g17_string_agg": R.g17_string_agg,
        "g18_unpivot": R.g18_unpivot,
        "g12_embedding_centroids": R.g12_embedding_centroids,
        "g13_user_value_drift": R.g13_user_value_drift,
        "g9_rollup": R.g9_rollup,
        "g19_grouping_sets": R.g19_grouping_sets,
        "dsir_importance": T.dsir_importance,
        "bpe_pair_topk": T.bpe_pair_topk,
        "bpe_train_merges": T.bpe_train_merges,
        "bpe_encode_stats": T.bpe_encode_stats,
        # --- joins (J-rows)
        "j1_broadcast_join": R.j1_broadcast_join,
        "j2_anti_join": R.j2_anti_join,
        "j3_semi_join": R.j3_semi_join,
        "j4_multi_join": R.j4_multi_join,
        "j5_asof_join": R.j5_asof_join,
        "j6_range_join": R.j6_range_join,
        "j7_bloom_semi_join": R.j7_bloom_semi_join,
        "j8_salted_skew_join": R.j8_salted_skew_join,
        "w1_running_sum": R.w1_running_sum,
        "w2_sessionize": R.w2_sessionize,
        "w3_tumbling_window": R.w3_tumbling_window,
        "w4_sliding_window": R.w4_sliding_window,
        "w5_lag_lead": R.w5_lag_lead,
        "w6_ntile": R.w6_ntile,
        "w7_rolling_mean": R.w7_rolling_mean,
        "w8_late_events": R.w8_late_events,
        "w9_percent_rank": R.w9_percent_rank,
        "w10_funnel": R.w10_funnel,
        "w11_ewma": R.w11_ewma,
        "w12_retention_cohorts": R.w12_retention_cohorts,
        "w13_scd2_history": R.w13_scd2_history,
        "o12_skyline": R.o12_skyline,
        "j10_fuzzy_join": R.j10_fuzzy_join,
        "g22_mad": R.g22_mad,
        "g23_market_basket": R.g23_market_basket,
        "w14_markov_transitions": R.w14_markov_transitions,
        "model_auc_report": T.model_auc_report,
        "source_ngram_overlap": D.source_ngram_overlap,
        "io_orc_roundtrip": ORC.io_orc_roundtrip,
        "g15_corr": R.g15_corr,
        "g20_regression": R.g20_regression,
        "j9_full_outer_join": R.j9_full_outer_join,
        "g14_group_median": R.g14_group_median,
        "d5_latest_per_key": R.d5_latest_per_key,
        "g10_pivot": R.g10_pivot,
        "o7_wordcount_topk": R.o7_wordcount_topk,
        "q3_shipping_priority": R.q3_shipping_priority,
        "q2_min_cost_supplier": R.q2_min_cost_supplier,
        "q4_order_priority": R.q4_order_priority,
        "q9_product_profit": R.q9_product_profit,
        "q16_part_supplier_counts": R.q16_part_supplier_counts,
        "q5_local_supplier_volume": R.q5_local_supplier_volume,
        "q10_returned_revenue": R.q10_returned_revenue,
        "q7_volume_shipping": R.q7_volume_shipping,
        "q8_market_share": R.q8_market_share,
        "q12_late_priority": R.q12_late_priority,
        "q13_customer_distribution": R.q13_customer_distribution,
        "q14_promo_revenue": R.q14_promo_revenue,
        "q15_top_supplier": R.q15_top_supplier,
        "q11_important_stock": R.q11_important_stock,
        "q17_small_qty_revenue": R.q17_small_qty_revenue,
        "q19_discounted_revenue": R.q19_discounted_revenue,
        "q20_excess_suppliers": R.q20_excess_suppliers,
        "q21_waiting_supplier": R.q21_waiting_supplier,
        "q22_sales_opportunity": R.q22_sales_opportunity,
        # --- sorts / top-k (O-rows)
        "o1_global_sort": R.o1_global_sort,
        "o2_global_topk": R.o2_global_topk,
        "o3_sample": R.o3_sample,
        "o3_sample_hash": R.o3_sample_hash,
        "o5_exact_quantiles": R.o5_exact_quantiles,
        "o6_weighted_sample": R.o6_weighted_sample,
        "o4_stratified_sample": R.o4_stratified_sample,
        "o8_hash_split": R.o8_hash_split,
        "o9_seeded_shuffle": R.o9_seeded_shuffle,
        "io_pushdown_scan": R.io_pushdown_scan,
        "o11_chunk_overlap": T.o11_chunk_overlap,
        "o10_pack_sequences": T.o10_pack_sequences,
        # --- wide aggregate
        "q1_pricing_summary": R.q1_pricing_summary,
        "q6_forecast_revenue": R.q6_forecast_revenue,
        "q18_big_orders": R.q18_big_orders,
        # --- list explode (span analogue)
        "explode_embeddings": R.explode_embeddings,
        # --- text analysis toolkit
        "token_count": T.token_count,
        "token_count_bpe": T.token_count_bpe,
        "quality_score": T.quality_score,
        "quality_compression": T.quality_compression,
        "tfidf_topk": T.tfidf_topk,
        "char_entropy": T.char_entropy,
        "repetition_stats": T.repetition_stats,
        "gopher_quality": T.gopher_quality,
        "zipf_fit": T.zipf_fit,
        "fertility_stats": T.fertility_stats,
        "search_phrase": T.search_phrase,
        "pmi_topk": T.pmi_topk,
        "g21_zscore_outliers": R.g21_zscore_outliers,
        "source_sketch_sim": D.source_sketch_sim,
        "pii_scrub": T.pii_scrub,
        "model_score_docs": T.model_score_docs,
        "lm_perplexity": T.lm_perplexity,
        "ccnet_buckets": T.ccnet_buckets,
        "search_bm25": T.search_bm25,
        # --- iterative graph analytics
        "link_pagerank": G.link_pagerank,
        "link_hits": G.link_hits,
        "link_triangles": G.link_triangles,
        "link_components": G.link_components,
        "lang_id": T.lang_id,
        "doc_fingerprint": T.doc_fingerprint,
        # --- dedup toolkit
        "ngram_jaccard_pairs": lambda sf: D.ngram_jaccard_pairs(sf, threshold=0.8),
        "dedup_minhash_lsh": lambda sf: D.dedup_minhash_lsh(sf, threshold=0.8),
        "dedup_lsh_verified": lambda sf: D.dedup_lsh_verified(sf, threshold=0.8),
        "dedup_incremental": D.dedup_incremental,
        "dedup_index_roundtrip": D.dedup_index_roundtrip,
        # surfaced as the bounded per-doc rollup: the raw pair stream
        # is quadratic-ish on the small-vocab corpus (87k pairs at 500
        # docs) — too big for a VALUES oracle and not the actionable
        # artifact anyway
        "dedup_containment_stats":
            lambda sf: D.dedup_containment_stats(sf, threshold=0.8),
        "dedup_clusters": lambda sf: D.dedup_clusters(sf, threshold=0.8),
        "dedup_filtered_docs": lambda sf: MIX.dedup_filtered_docs(sf, threshold=0.8),
        "training_mix_stats": lambda sf: MIX.training_mix_stats(sf, threshold=0.8),
        "corpus_prep_stats": MIX.corpus_prep_stats,
        "mix_interleave": MIX.mix_interleave,
        "mix_temperature_sample": MIX.mix_temperature_sample,
        "mix_curriculum_order": MIX.mix_curriculum_order,
        "quality_filtered_docs": MIX.quality_filtered_docs,
        # max_hamming=3: the scale-safe blocking point (16-bit keys);
        # radius-derived blocking guarantees full recall (ADVICE r1)
        "dedup_simhash": lambda sf: D.dedup_simhash(sf, max_hamming=3),
        "dedup_ngram_spans": lambda sf: D.dedup_ngram_spans(sf, n=5, min_docs=2),
        # bench_mod=13: smallest eval set whose near-dup twin in the
        # training split actually trips the contaminated flag at sf0.01
        "decontaminate_overlap": lambda sf: D.decontaminate_overlap(
            sf, n=5, min_overlap=2, bench_mod=13),
        "dedup_embedding_cosine": lambda sf: D.dedup_embedding_cosine(sf, threshold=0.4),
        "dedup_semantic": lambda sf: D.dedup_semantic(sf, threshold=0.4),
        "dedup_embedding_lsh": lambda sf: D.dedup_embedding_lsh(sf, threshold=0.4),
        # --- similarity search
        "embedding_pca": S.embedding_pca,
        "cluster_kmeans": S.cluster_kmeans,
        "knn_graph": S.knn_graph,
        "ann_nsw_topk": S.ann_nsw_topk,
        "ann_hybrid_search": S.ann_hybrid_search,
        "ann_topk_cosine": lambda sf: S.ann_topk_cosine(sf, num_queries=5, k=5),
        "ann_range_search": lambda sf: S.ann_range_search(
            sf, num_queries=8, threshold=0.25),
        "ann_filtered_topk": lambda sf: S.ann_filtered_topk(sf, num_queries=5, k=5),
        "ann_lsh_topk": lambda sf: S.ann_lsh_topk(sf, num_queries=5, k=5),
        "ann_ivf_topk": lambda sf: S.ann_ivf_topk(sf, num_queries=5, k=5),
        "ann_pq_topk": lambda sf: S.ann_pq_topk(sf, num_queries=5, k=5),
        "ann_sq_topk": lambda sf: S.ann_sq_topk(sf, num_queries=5, k=5),
        "ann_ivf_pq": lambda sf: S.ann_ivf_pq(sf, num_queries=5, k=5),
        "ann_index_roundtrip": lambda sf: S.ann_index_roundtrip(
            sf, num_queries=5, k=5),
        "ann_recall_report": S.ann_recall_report,
        # --- multimodal plumbing
        "decode_media_meta": M.decode_media_meta,
        "media_dedup_exact": M.media_dedup_exact,
        "io_jsonl_roundtrip": JL.io_jsonl_roundtrip,
        "io_csv_roundtrip": CSV.io_csv_roundtrip,
        "io_ipc_roundtrip": IPC.io_ipc_roundtrip,
        "io_partitioned_roundtrip": PS.io_partitioned_roundtrip,
        "media_pipeline": M.media_pipeline,
        "media_byte_stats": M.media_byte_stats,
        "media_dedup_near": M.media_dedup_near,
        "spans_rollup": SP.spans_rollup,
        "spans_integrity_report": SP.spans_integrity_report,
        "spans_line_dedup": SP.spans_line_dedup,
        "spans_pack_multimodal": SP.spans_pack_multimodal,
        # --- the crawl itself
        "crawl_docs_out": _crawl_docs_out,
    })


def _USUM(expr: str) -> str:
    """Exact float sum via int64 micro-units — matches the engine's
    per-element quantization, immune to summation-order fp noise."""
    return f"CAST(sum(CAST(round(({expr})*1000000) AS BIGINT)) AS BIGINT)/1000000.0"


_LANG_ID_SQL = """
WITH w AS (
  SELECT doc_id,
    list_distinct(list_transform(regexp_extract_all(text, '[a-zA-Z]+'),
                                 x -> lower(x))) AS ws,
    len(regexp_extract_all(substr(text, 1, 200), '[一-鿿]')) AS cjk
  FROM documents
), c AS (
  SELECT doc_id, cjk,
    len(list_intersect(ws, ['the','and','of','a','to','in','is','it','for','on'])) AS n_en,
    len(list_intersect(ws, ['der','die','das','und','ist','ein','zu','den','von','mit'])) AS n_de,
    len(list_intersect(ws, ['le','la','les','et','est','un','une','de','du','pour'])) AS n_fr,
    len(list_intersect(ws, ['el','la','los','y','es','un','una','de','del','para'])) AS n_es
  FROM w
)
SELECT doc_id, CASE
  WHEN cjk > 5 THEN 'zh'
  WHEN greatest(n_en, n_de, n_fr, n_es) = 0 THEN 'unk'
  WHEN n_en = greatest(n_en, n_de, n_fr, n_es) THEN 'en'
  WHEN n_de = greatest(n_en, n_de, n_fr, n_es) THEN 'de'
  WHEN n_fr = greatest(n_en, n_de, n_fr, n_es) THEN 'fr'
  ELSE 'es' END AS pred_lang
FROM c
"""

_MEDIA_PIPELINE_SQL = """
SELECT doc_id, CAST(f AS BIGINT) AS frame, CAST(f * 64 AS BIGINT) AS offset_bytes
FROM (SELECT doc_id, greatest(1, octet_length(encode(text)) // 64) AS nf
      FROM documents) d,
     UNNEST(generate_series(0, CAST(nf - 1 AS BIGINT))) AS u(f)
"""


def _keep_values_sql(clusters) -> str:
    """Kept doc_ids (cluster representatives) from the serial CC
    oracle result, rendered as a VALUES relation k(doc_id)."""
    ids = ", ".join(
        f"({int(i)})" for i in clusters.loc[clusters["keep"], "doc_id"]
    )
    return f"SELECT * FROM (VALUES {ids}) AS k(doc_id)"


def _serial_oracles() -> dict[str, str]:
    """Differential oracles for the non-SQL-expressible queries:
    serial Ray-free recomputation (ccrawler_ray.serial_ref) rendered
    as self-contained VALUES SQL — same rows/schema/hash machinery as
    the relational oracles."""
    from ccrawler_ray import serial_ref as SR

    V = SR.values_sql
    # the serial CC pass is the most expensive oracle build — run it
    # ONCE and share across the three entries that need it
    clusters = SR.dedup_clusters(threshold=0.8)
    spans = SR.dedup_ngram_spans(n=5, min_docs=2)
    pair_d = {"doc_a": "BIGINT", "doc_b": "BIGINT"}
    ann_t = {"query_id": "BIGINT", "vec_id": "BIGINT", "cos": "DOUBLE",
             "rank": "BIGINT"}
    return {
        "doc_fingerprint": V(SR.doc_fingerprint(),
                             {"doc_id": "BIGINT", "fingerprint": "UBIGINT"}),
        "char_entropy": V(SR.char_entropy(),
                          {"doc_id": "BIGINT", "n_cp": "BIGINT",
                           "n_unique_cp": "BIGINT", "entropy": "DOUBLE"}),
        "w11_ewma": V(SR.w11_ewma(),
                      {"event_id": "BIGINT", "user_id": "BIGINT",
                       "value": "DOUBLE", "ewma": "DOUBLE"}),
        "lm_perplexity": V(SR.lm_perplexity(),
                           {"doc_id": "BIGINT", "n_words": "BIGINT",
                            "xent": "DOUBLE", "keep": "BOOLEAN"}),
        "repetition_stats": V(SR.repetition_stats(),
                              {"doc_id": "BIGINT", "n_words": "BIGINT",
                               "dup_word_frac": "DOUBLE",
                               "top_bigram_frac": "DOUBLE",
                               "dup_5gram_frac": "DOUBLE",
                               "keep": "BOOLEAN"}),
        "search_phrase": V(SR.search_phrase(),
                           {"doc_id": "BIGINT", "n_hits": "BIGINT"}),
        "pmi_topk": V(SR.pmi_topk(),
                      {"w1": "VARCHAR", "w2": "VARCHAR",
                       "c_xy": "BIGINT", "pmi": "DOUBLE"}),
        "fertility_stats": (
            # same BPE-ish pre-tokenization rule as token_count_bpe;
            # fertility = one IEEE division of the exact BIGINT sums
            "WITH s AS (SELECT lang, count(*) AS n_docs, "
            # CAST the HUGEINT sums back to BIGINT: duckdb's
            # SUM(BIGINT) is HUGEINT, which pandas renders float64 —
            # the engine emits int64
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(sum(CAST(len(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)) AS BIGINT) "
            "AS sum_bpe_tokens FROM documents GROUP BY 1) "
            "SELECT lang, n_docs, sum_chars, sum_bpe_tokens, "
            "CASE WHEN sum_bpe_tokens > 0 THEN "
            "CAST(sum_chars AS DOUBLE)/CAST(sum_bpe_tokens AS DOUBLE) "
            "ELSE 0.0 END AS fertility FROM s"
        ),
        "zipf_fit": V(SR.zipf_fit(),
                      {"source": "VARCHAR", "v": "BIGINT",
                       "slope": "DOUBLE", "intercept": "DOUBLE"}),
        "source_sketch_sim": V(SR.source_sketch_sim(),
                               {"source_a": "VARCHAR",
                                "source_b": "VARCHAR",
                                "sig_matches": "BIGINT",
                                "est_jaccard": "DOUBLE"}),
        "source_ngram_overlap": V(SR.source_ngram_overlap(),
                                  {"source_a": "VARCHAR",
                                   "source_b": "VARCHAR",
                                   "n_inter": "BIGINT",
                                   "n_union": "BIGINT",
                                   "jaccard_micro": "BIGINT"}),
        "gopher_quality": V(SR.gopher_quality(),
                            {"doc_id": "BIGINT", "n_words": "BIGINT",
                             "mean_word_len": "DOUBLE",
                             "stop_hits": "BIGINT", "f_words": "BOOLEAN",
                             "f_mwl": "BOOLEAN", "f_symbol": "BOOLEAN",
                             "f_bullet": "BOOLEAN",
                             "f_ellipsis": "BOOLEAN",
                             "f_alpha": "BOOLEAN", "f_stop": "BOOLEAN",
                             "keep": "BOOLEAN"}),
        "dedup_simhash": V(SR.dedup_simhash(max_hamming=3),
                           {**pair_d, "hamming": "BIGINT"}),
        "media_dedup_near": V(SR.media_dedup_near(max_hamming=3),
                              {**pair_d, "hamming": "BIGINT"}),
        "spans_pack_multimodal": V(SR.spans_pack_multimodal(),
                                   {"doc_id": "VARCHAR",
                                    "n_tokens": "BIGINT",
                                    "n_media": "BIGINT",
                                    "bin_id": "BIGINT",
                                    "bin_off": "BIGINT",
                                    "end_bin": "BIGINT"}),
        "spans_rollup": V(SR.spans_rollup(),
                          {"kind": "VARCHAR", "n_spans": "BIGINT",
                           "n_docs": "BIGINT", "sum_text_len": "BIGINT",
                           "n_media_refs": "BIGINT"}),
        "spans_integrity_report": V(
            SR.spans_integrity_report(),
            {"n_docs": "BIGINT", "n_spans": "BIGINT",
             "n_offset_violations": "BIGINT", "n_ref_violations": "BIGINT",
             "tt": "BIGINT", "tm": "BIGINT", "mt": "BIGINT",
             "mm": "BIGINT"}),
        "spans_line_dedup": V(SR.spans_line_dedup(),
                              {"doc_id": "VARCHAR", "n_spans": "BIGINT",
                               "n_kept": "BIGINT", "n_dropped": "BIGINT"}),
        "search_bm25": V(SR.search_bm25(),
                         {"doc_id": "BIGINT", "score": "DOUBLE",
                          "rank": "BIGINT"}),
        "ann_hybrid_search": V(SR.ann_hybrid_search(),
                               {"doc_id": "BIGINT", "bm25": "DOUBLE",
                                "cos": "DOUBLE", "hybrid": "DOUBLE",
                                "rank": "BIGINT"}),
        "link_pagerank": V(SR.link_pagerank(),
                           {"doc_id": "BIGINT", "rank_u": "BIGINT",
                            "rank": "DOUBLE"}),
        "link_hits": V(SR.link_hits(),
                       {"doc_id": "BIGINT", "auth_u": "BIGINT",
                        "hub_u": "BIGINT", "authority": "DOUBLE",
                        "hub": "DOUBLE"}),
        "embedding_pca": V(SR.embedding_pca(),
                           {"component": "BIGINT", "eigenvalue": "DOUBLE",
                            "explained_var": "DOUBLE",
                            "cum_var": "DOUBLE"}),
        "cluster_kmeans": V(SR.cluster_kmeans(),
                            {"cluster": "BIGINT", "n_members": "BIGINT",
                             "inertia": "DOUBLE"}),
        "knn_graph": V(SR.knn_graph(),
                       {"vec_id": "BIGINT", "rank": "BIGINT",
                        "nbr_id": "BIGINT", "cos": "DOUBLE"}),
        "ccnet_buckets": V(SR.ccnet_buckets(),
                           {"doc_id": "BIGINT", "lang": "VARCHAR",
                            "xent": "DOUBLE", "bucket": "VARCHAR"}),
        "link_triangles": V(SR.link_triangles(),
                            {"doc_id": "BIGINT", "n_tri": "BIGINT"}),
        "link_components": V(SR.link_components(),
                             {"doc_id": "BIGINT", "component": "BIGINT",
                              "is_rep": "BOOLEAN"}),
        "quality_compression": V(SR.quality_compression(),
                                 {"doc_id": "BIGINT", "raw_len": "BIGINT",
                                  "comp_len": "BIGINT", "ratio": "DOUBLE",
                                  "keep": "BOOLEAN"}),
        "mix_temperature_sample": V(SR.mix_temperature_sample(),
                                    {"doc_id": "BIGINT",
                                     "source": "VARCHAR"}),
        "mix_interleave": V(SR.mix_interleave(),
                            {"pos": "BIGINT", "doc_id": "BIGINT",
                             "source": "VARCHAR", "pri": "DOUBLE"}),
        "corpus_prep_stats": V(SR.corpus_prep_stats(),
                               {"lang": "VARCHAR", "n_docs": "BIGINT",
                                "sum_tokens": "BIGINT"}),
        "dedup_semantic": V(SR.dedup_semantic(threshold=0.4),
                            {"vec_id": "BIGINT", "cluster": "BIGINT",
                             "keep": "BOOLEAN", "max_cos": "DOUBLE"}),
        "dedup_minhash_lsh": V(SR.dedup_minhash_lsh_rollup(threshold=0.8),
                               {"doc_id": "BIGINT", "n_pairs": "BIGINT",
                                "max_est_jaccard": "DOUBLE"}),
        "dedup_incremental": V(SR.dedup_incremental(),
                               {"doc_id": "BIGINT", "dup_of": "BIGINT",
                                "est_jaccard": "DOUBLE"}),
        # the persisted-index probe is answer-identical to the
        # in-session incremental probe (shared kernel) — same mirror
        "dedup_index_roundtrip": V(SR.dedup_incremental(),
                                   {"doc_id": "BIGINT",
                                    "dup_of": "BIGINT",
                                    "est_jaccard": "DOUBLE"}),
        "dedup_lsh_verified": V(SR.dedup_lsh_verified_rollup(threshold=0.8),
                                {"doc_id": "BIGINT", "n_pairs": "BIGINT",
                                 "max_jaccard": "DOUBLE"}),
        "dsir_importance": V(SR.dsir_importance(),
                             {"doc_id": "BIGINT", "n_feats": "BIGINT",
                              "logw": "DOUBLE", "keep": "BOOLEAN"}),
        "bpe_pair_topk": V(SR.bpe_pair_topk(k=20),
                           {"pair": "VARCHAR", "cnt": "BIGINT",
                            "rank": "BIGINT"}),
        "bpe_encode_stats": V(SR.bpe_encode_stats(n_merges=30),
                              {"doc_id": "BIGINT", "n_words": "BIGINT",
                               "n_tokens": "BIGINT"}),
        "bpe_train_merges": V(SR.bpe_train_merges(n_merges=30),
                              {"merge_rank": "BIGINT",
                               "left_sym": "VARCHAR",
                               "right_sym": "VARCHAR",
                               "merged": "VARCHAR",
                               "pair_count": "BIGINT"}),
        "dedup_containment_stats": V(
            SR.dedup_containment_stats(threshold=0.8),
            {"doc_id": "BIGINT", "n_pairs": "BIGINT",
             "max_containment": "DOUBLE"}),
        "dedup_clusters": V(clusters,
                            {"doc_id": "BIGINT", "cluster_rep": "BIGINT",
                             "keep": "BOOLEAN"}),
        "dedup_ngram_spans": V(spans,
                               {"doc_id": "BIGINT", "n_windows": "BIGINT",
                                "dup_windows": "BIGINT",
                                "dup_ratio": "DOUBLE"}),
        # quality filter chain: serial ngram-span ratios embedded as a
        # VALUES relation, quality/lang legs in plain SQL (hybrid)
        "quality_filtered_docs": (
            "WITH s AS ("
            + V(spans[["doc_id", "dup_ratio"]],
                {"doc_id": "BIGINT", "dup_ratio": "DOUBLE"})
            + ") SELECT d.doc_id, d.lang, "
            r"CAST(len(regexp_split_to_array(d.text,'\s+')) AS BIGINT) "
            "AS n_tokens, s.dup_ratio "
            "FROM documents d JOIN s ON d.doc_id = s.doc_id "
            "WHERE d.lang='en' "
            r"AND len(regexp_split_to_array(d.text,'\s+')) >= 20 "
            "AND floor(len(regexp_extract_all(d.text,'[A-Z]'))*10000.0/"
            "greatest(d.n_chars,1))/10000 <= 0.3 "
            "AND s.dup_ratio <= 0.5"
        ),
        "decontaminate_overlap": V(SR.decontaminate_overlap(
                                       n=5, min_overlap=2, bench_mod=13),
                                   {"doc_id": "BIGINT", "n_windows": "BIGINT",
                                    "n_overlap": "BIGINT",
                                    "contaminated": "BOOLEAN"}),
        "o3_sample_hash": V(SR.o3_sample_hash(),
                            {"doc_id": "BIGINT", "lang": "VARCHAR"}),
        "o4_stratified_sample": V(SR.o4_stratified_sample(),
                                  {"doc_id": "BIGINT", "lang": "VARCHAR"}),
        "o6_weighted_sample": V(SR.o6_weighted_sample(),
                                {"doc_id": "BIGINT", "lang": "VARCHAR",
                                 "n_chars": "BIGINT"}),
        "g5_hll_distinct": V(SR.g5_hll_distinct(),
                             {"event_type": "VARCHAR", "est_users": "BIGINT"}),
        "g7_quantile_hist": V(SR.g7_quantile_hist(),
                              {"q": "DOUBLE", "est_value": "DOUBLE"}),
        "g8_grouped_quantiles": V(SR.g8_grouped_quantiles(),
                                  {"event_type": "VARCHAR", "q": "DOUBLE",
                                   "est_value": "DOUBLE"}),
        "g11_countmin_est": V(SR.g11_countmin_est(),
                              {"term": "VARCHAR", "est_n": "BIGINT"}),
        # mix pipeline: keep list from the serial CC oracle, the rest
        # pure SQL over documents (hybrid differential oracle)
        "dedup_filtered_docs": (
            "SELECT d.doc_id, d.lang, d.n_chars FROM documents d "
            f"JOIN ({_keep_values_sql(clusters)}) k ON d.doc_id = k.doc_id"
        ),
        "training_mix_stats": (
            "WITH t AS (SELECT d.doc_id, d.lang, "
            r"len(regexp_split_to_array(d.text,'\s+')) AS n_tokens "
            f"FROM documents d JOIN ({_keep_values_sql(clusters)}) k "
            "ON d.doc_id = k.doc_id) "
            "SELECT lang, CASE WHEN n_tokens < 40 THEN 'short' "
            "WHEN n_tokens <= 70 THEN 'medium' ELSE 'long' END AS bucket, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_tokens) AS BIGINT) AS total_tokens "
            "FROM t GROUP BY lang, bucket"
        ),
        "dedup_embedding_lsh": V(SR.dedup_embedding_lsh(threshold=0.4),
                                 {"vec_a": "BIGINT", "vec_b": "BIGINT",
                                  "cos": "DOUBLE"}),
        "ann_lsh_topk": V(SR.ann_lsh_topk(num_queries=5, k=5), ann_t),
        "ann_ivf_topk": V(SR.ann_ivf_topk(num_queries=5, k=5), ann_t),
        "ann_nsw_topk": V(SR.ann_nsw_topk(num_queries=5, k=5),
                          {"query_id": "BIGINT", "rank": "BIGINT",
                           "vec_id": "BIGINT", "cos": "DOUBLE"}),
        "ann_pq_topk": V(SR.ann_pq_topk(num_queries=5, k=5),
                         {"query_id": "BIGINT", "vec_id": "BIGINT",
                          "adist": "DOUBLE", "rank": "BIGINT"}),
        "ann_sq_topk": V(SR.ann_sq_topk(num_queries=5, k=5),
                         {"query_id": "BIGINT", "vec_id": "BIGINT",
                          "qdot": "BIGINT", "rank": "BIGINT"}),
        "ann_recall_report": V(SR.ann_recall_report(),
                               {"method": "VARCHAR", "n_hits": "BIGINT",
                                "n_possible": "BIGINT",
                                "recall": "DOUBLE"}),
        "ann_ivf_pq": V(SR.ann_ivf_pq(num_queries=5, k=5),
                        {"query_id": "BIGINT", "vec_id": "BIGINT",
                         "adist": "DOUBLE", "rank": "BIGINT"}),
        # the persisted-index probe shares _ivfpq_search with
        # ann_ivf_pq — answer-identical, same bitwise mirror
        "ann_index_roundtrip": V(SR.ann_ivf_pq(num_queries=5, k=5),
                                 {"query_id": "BIGINT",
                                  "vec_id": "BIGINT",
                                  "adist": "DOUBLE", "rank": "BIGINT"}),
        "decode_media_meta": V(
            SR.decode_media_meta(),
            {"doc_id": "BIGINT", "media_type": "VARCHAR", "n_bytes": "BIGINT",
             "width": "BIGINT", "height": "BIGINT", "decoder": "VARCHAR"},
        ),
        "crawl_docs_out": V(
            SR.crawl_docs_out(),
            {"generation": "INTEGER", "host": "VARCHAR", "queue_pos": "INTEGER",
             "ord_key": "VARCHAR", "canon": "VARCHAR", "status": "INTEGER"},
        ),
    }


def _pii_scrub_sql() -> str:
    """Nested regexp_replace in the SAME fixed pattern order as the
    engine (patterns imported from the one frozen tuple), each count
    taken on the text state that pattern sees."""
    from ccrawler_ray.functions.text import PII_PATTERNS

    s, counts = "text", []
    for i, (_name, pat, token) in enumerate(PII_PATTERNS):
        counts.append(f"len(regexp_extract_all({s}, '{pat}')) AS n{i}")
        s = f"regexp_replace({s}, '{pat}', '{token}', 'g')"
    return (
        f"SELECT doc_id, {s} AS clean, "
        f"CAST({' + '.join(f'n{i}' for i in range(len(counts)))} AS BIGINT) "
        "AS n_redactions FROM (SELECT doc_id, text, "
        + ", ".join(counts) + " FROM documents)"
    )


def oracle_sql() -> dict[str, str]:
    from ccrawler_ray.functions.sketch import HH_K as SK_HH_K

    jacc = (
        "len(list_intersect(a.ws,b.ws))*1.0/"
        "(len(a.ws)+len(b.ws)-len(list_intersect(a.ws,b.ws)))"
    )
    return {
        "m2_filter_validate": (
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE lang='en' AND n_chars>=100 AND n_chars<400"
        ),
        "m9_content_hash": "SELECT doc_id, md5(text) AS content_md5 FROM documents",
        "m10_normalize_text": (
            "SELECT doc_id, "
            "trim(regexp_replace(lower(nfc_normalize(text)), "
            r"'[ \t\n\f\r]+', ' ', 'g')) AS norm_text, "
            "CAST(len(trim(regexp_replace(lower(nfc_normalize(text)), "
            r"'[ \t\n\f\r]+', ' ', 'g'))) AS BIGINT) AS n_chars_norm "
            "FROM documents"
        ),
        "scalar_string_ops": (
            "SELECT doc_id, upper(lang) AS lang_u, substr(text,1,10) AS prefix10, "
            "source || ':' || lang AS src_tag FROM documents"
        ),
        "d1_exact_dedup": (
            "SELECT lang, source, min(doc_id) AS first_doc FROM documents "
            "GROUP BY lang, source"
        ),
        "s1_set_intersect": (
            "SELECT DISTINCT user_id FROM events WHERE event_type='click' "
            "INTERSECT "
            "SELECT DISTINCT user_id FROM events WHERE event_type='purchase'"
        ),
        "s2_set_except": (
            "SELECT DISTINCT user_id, date_trunc('day', ts) AS day "
            "FROM events WHERE event_type='click' "
            "EXCEPT "
            "SELECT DISTINCT user_id, date_trunc('day', ts) "
            "FROM events WHERE event_type='error'"
        ),
        "d3_content_dedup": (
            "SELECT md5(text) AS content_md5, min(doc_id) AS first_doc "
            "FROM documents GROUP BY md5(text)"
        ),
        "g1_rank_topk_per_key": (
            "SELECT user_id, event_id, value, rn FROM ("
            "SELECT user_id, event_id, value, row_number() OVER ("
            "PARTITION BY user_id ORDER BY value DESC, event_id) AS rn "
            "FROM events) WHERE rn <= 3"
        ),
        "g3_metrics_rollup": (
            "SELECT event_type, date_trunc('day', ts) AS day, "
            "CAST(count(*) AS BIGINT) AS n, CAST(sum(CAST(round((value)*1000000) AS BIGINT)) AS BIGINT)/1000000.0 AS sum_value "
            "FROM events GROUP BY event_type, date_trunc('day', ts)"
        ),
        "g4_distinct_counts": (
            "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY event_type"
        ),
        "g9_rollup": (
            "SELECT COALESCE(l_returnflag,'ALL') AS l_returnflag, "
            "COALESCE(l_linestatus,'ALL') AS l_linestatus, "
            "CAST(count(*) AS BIGINT) AS n, "
            f"{_USUM('l_extendedprice')} AS revenue "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        "g19_grouping_sets": (
            "SELECT COALESCE(source,'ALL') AS source, "
            "COALESCE(lang,'ALL') AS lang, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents "
            "GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())"
        ),
        "j1_broadcast_join": (
            "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders, "
            f"{_USUM('o_totalprice')} AS revenue "
            "FROM orders JOIN customer ON o_custkey=c_custkey GROUP BY c_mktsegment"
        ),
        "j2_anti_join": (
            "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS "
            "(SELECT 1 FROM orders WHERE o_custkey=c_custkey "
            "AND o_totalprice > 400000)"
        ),
        "j3_semi_join": (
            "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n, "
            f"{_USUM('o_totalprice')} AS revenue FROM orders "
            "WHERE o_custkey IN (SELECT c_custkey FROM customer "
            "WHERE c_mktsegment='BUILDING') GROUP BY o_orderstatus"
        ),
        "j4_multi_join": (
            "SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders, "
            f"{_USUM('o_totalprice')} AS revenue "
            "FROM orders JOIN customer ON o_custkey=c_custkey "
            "JOIN nation ON c_nationkey=n_nationkey GROUP BY n_name"
        ),
        "j5_asof_join": (
            "SELECT p.event_id, p.user_id, p.ts, "
            "c.event_id AS click_id, c.ts AS click_ts "
            "FROM (SELECT * FROM events WHERE event_type='purchase') p "
            "ASOF JOIN (SELECT * FROM events WHERE event_type='click') c "
            "ON p.user_id = c.user_id AND p.ts >= c.ts"
        ),
        "j7_bloom_semi_join": (
            "SELECT CAST(count(*) AS BIGINT) AS n_items, "
            f"{_USUM('l_extendedprice*(1-l_discount)')} AS revenue "
            "FROM lineitem WHERE l_orderkey IN "
            "(SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)"
        ),
        "j8_salted_skew_join": (
            "WITH d AS (SELECT event_type, "
            "CAST(sum(CAST(round(value*1000000) AS BIGINT)) // count(*) "
            "AS BIGINT) AS type_avg_u FROM events GROUP BY 1) "
            "SELECT e.event_id, e.event_type, d.type_avg_u "
            "FROM events e JOIN d ON e.event_type = d.event_type"
        ),
        "j6_range_join": (
            "SELECT e.event_id, e.user_id, "
            "CAST(count(c.event_id) AS BIGINT) AS n_clicks "
            "FROM events e LEFT JOIN events c ON c.user_id=e.user_id "
            "AND c.event_type='click' "
            "AND c.ts > e.ts - INTERVAL 172800 SECOND AND c.ts <= e.ts "
            "WHERE e.event_type='error' GROUP BY e.event_id, e.user_id"
        ),
        "w1_running_sum": (
            "SELECT event_id, user_id, "
            "CAST(sum(CAST(round(value*1000000) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT)/1000000.0 AS running_value "
            "FROM events"
        ),
        "w2_sessionize": (
            "WITH x AS (SELECT event_id, user_id, ts, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w > INTERVAL 43200 SECOND THEN 1 ELSE 0 END "
            "AS is_new FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT event_id, user_id, CAST(sum(is_new) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_no FROM x"
        ),
        "w3_tumbling_window": (
            "SELECT date_trunc('hour', ts) AS w_start, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
            f"{_USUM('value')} AS sum_value FROM events GROUP BY 1"
        ),
        "w4_sliding_window": (
            # each event lands in the 4 hop-aligned (900 s) windows of
            # length 3600 s that contain it
            "SELECT make_timestamp("
            "(CAST(floor(epoch(ts)/900) AS BIGINT) - g.i)*900000000) "
            "AS w_start, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
            f"{_USUM('value')} AS sum_value "
            "FROM events CROSS JOIN "
            "(SELECT unnest(generate_series(0, 3)) AS i) g GROUP BY 1"
        ),
        "w5_lag_lead": (
            "SELECT event_id, user_id, "
            "CAST(COALESCE(epoch_us(ts) - epoch_us(lag(ts) OVER w), -1) "
            "AS BIGINT) AS gap_us, "
            "COALESCE(lead(value) OVER w, -1.0) AS next_value "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        "w6_ntile": (
            "SELECT event_id, user_id, CAST(ntile(4) OVER ("
            "PARTITION BY user_id ORDER BY value DESC, event_id) "
            "AS BIGINT) AS tile FROM events"
        ),
        "pii_scrub": _pii_scrub_sql(),
        "model_score_docs": (
            # same frozen integer weights as text.MODEL_WEIGHTS
            "SELECT doc_id, CAST(logit AS BIGINT) AS logit, "
            "logit >= 0 AS keep FROM (SELECT doc_id, "
            r"35*(len(regexp_extract_all(text,'\s+'))+1) - 2*n_chars "
            "- 50*len(regexp_extract_all(text,'[A-Z]')) "
            "- 20*len(regexp_extract_all(text,'[0-9]')) + 900 AS logit "
            "FROM documents)"
        ),
        "q6_forecast_revenue": (
            "SELECT "
            f"{_USUM('l_extendedprice*l_discount')} AS revenue, "
            "CAST(count(*) AS BIGINT) AS n_items FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1995-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-01-01' "
            "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
        ),
        "q14_promo_revenue": (
            "WITH l AS (SELECT CAST(round(l_extendedprice*(1-l_discount)"
            "*1000000) AS BIGINT) AS rev_u, p_type "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE l_shipdate >= TIMESTAMP '1996-03-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01'), "
            "s AS (SELECT CAST(coalesce(sum(CASE WHEN p_type = 'PROMO' "
            "THEN rev_u ELSE 0 END), 0) AS BIGINT) AS pu, "
            "CAST(coalesce(sum(rev_u), 0) AS BIGINT) AS tu FROM l) "
            "SELECT pu/1000000.0 AS promo_revenue, "
            "tu/1000000.0 AS total_revenue, "
            "CASE WHEN tu = 0 THEN 0.0 ELSE 100.0 * pu / tu END "
            "AS promo_pct FROM s"
        ),
        "q4_order_priority": (
            "WITH o AS (SELECT o_orderkey, o_orderdate, o_orderpriority "
            "FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01'), "
            "m AS (SELECT l_orderkey, max(l_shipdate) AS max_ship "
            "FROM lineitem GROUP BY 1) "
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM o JOIN m ON o_orderkey = l_orderkey "
            "WHERE max_ship > o_orderdate + INTERVAL 30 DAY "
            "GROUP BY o_orderpriority"
        ),
        "q7_volume_shipping": (
            "WITH sn AS (SELECT s_suppkey, n_name AS supp_nation "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
            "WHERE n_name IN ('NATION_5','NATION_12')), "
            "cn AS (SELECT c_custkey, n_name AS cust_nation "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "WHERE n_name IN ('NATION_5','NATION_12')) "
            "SELECT supp_nation, cust_nation, "
            "CAST(year(l_shipdate) AS BIGINT) AS l_year, "
            f"{_USUM('l_extendedprice*(1-l_discount)')} AS revenue "
            "FROM lineitem JOIN sn ON l_suppkey = s_suppkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN cn ON o_custkey = c_custkey "
            "WHERE l_shipdate >= TIMESTAMP '1995-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND supp_nation <> cust_nation "
            "GROUP BY 1, 2, 3"
        ),
        "q8_market_share": (
            "WITH rn AS (SELECT n_nationkey FROM nation "
            "WHERE n_regionkey = (SELECT r_regionkey FROM region "
            "WHERE r_name = 'ASIA')), "
            "o AS (SELECT o_orderkey, "
            "CAST(year(o_orderdate) AS BIGINT) AS o_year FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_nationkey IN (SELECT n_nationkey FROM rn) "
            "AND o_orderdate >= TIMESTAMP '1995-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01'), "
            "l AS (SELECT l_orderkey, "
            "CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT) "
            "AS rev_u, n_name AS supp_nation FROM lineitem "
            "JOIN part ON l_partkey = p_partkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE p_type = 'ECONOMY') "
            "SELECT o_year, "
            "CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev_u "
            "ELSE 0 END) AS BIGINT)*1.0 / CAST(sum(rev_u) AS BIGINT) "
            "AS mkt_share "
            "FROM l JOIN o ON l.l_orderkey = o.o_orderkey GROUP BY o_year"
        ),
        # adapted Q11: argmax nation (most suppliers, ties to smallest
        # key), 1.5x-mean HAVING as an exact integer cross-multiply —
        # DuckDB's HUGEINT sums make u*2*np > tot*3 exact, mirroring
        # the engine's Python-int threshold
        "q11_important_stock": (
            "WITH tn AS (SELECT s_nationkey AS nk FROM supplier "
            "GROUP BY s_nationkey ORDER BY count(*) DESC, s_nationkey LIMIT 1), "
            "s AS (SELECT s_suppkey FROM supplier, tn WHERE s_nationkey = tn.nk), "
            "v AS (SELECT l_partkey, "
            "sum(CAST(round((l_extendedprice*(1-l_discount))*1000000) AS BIGINT)) AS u "
            "FROM lineitem JOIN s ON l_suppkey = s.s_suppkey GROUP BY l_partkey) "
            "SELECT l_partkey, CAST(u AS BIGINT)/1000000.0 AS value "
            "FROM v, (SELECT sum(u) AS tot, count(*) AS np FROM v) t "
            "WHERE u * 2 * t.np > tot * 3"
        ),
        "q15_top_supplier": (
            "WITH r AS (SELECT l_suppkey, "
            "sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) "
            "AS BIGINT)) AS ru FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) "
            "SELECT s_suppkey, s_name, "
            "CAST(ru AS BIGINT)/1000000.0 AS total_revenue "
            "FROM supplier JOIN r ON s_suppkey = l_suppkey "
            "WHERE ru = (SELECT max(ru) FROM r)"
        ),
        "q12_late_priority": (
            "SELECT l_linestatus, "
            "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
            "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND l_shipdate > o_orderdate + INTERVAL 60 DAY "
            "GROUP BY l_linestatus"
        ),
        "q13_customer_distribution": (
            "WITH pc AS (SELECT c_custkey, count(o_orderkey) AS c_count "
            "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            "GROUP BY c_custkey) "
            "SELECT CAST(c_count AS BIGINT) AS c_count, "
            "CAST(count(*) AS BIGINT) AS custdist FROM pc GROUP BY 1"
        ),
        "q17_small_qty_revenue": (
            # the engine's qty < 0.2*avg(qty) test is the exact int64
            # cross-multiplication — same integer SQL here, no fp
            # boundary flips
            "WITH f AS (SELECT p_partkey FROM part "
            "WHERE p_brand = 'Brand#23' AND p_size <= 10), "
            "a AS (SELECT l_partkey, "
            "sum(CAST(round(l_quantity*100) AS BIGINT)) AS sq, "
            "CAST(count(*) AS BIGINT) AS cnt "
            "FROM lineitem JOIN f ON l_partkey = p_partkey GROUP BY 1) "
            "SELECT CAST(coalesce(sum(CAST(round(l_extendedprice*1000000) "
            "AS BIGINT)), 0) AS BIGINT)/1000000.0/7.0 AS avg_yearly "
            "FROM lineitem JOIN a USING (l_partkey) "
            "WHERE CAST(round(l_quantity*100) AS BIGINT)*5*cnt < sq"
        ),
        "q19_discounted_revenue": (
            "SELECT CAST(coalesce(sum(CAST(round(l_extendedprice"
            "*(1-l_discount)*1000000) AS BIGINT)), 0) AS BIGINT)"
            "/1000000.0 AS revenue "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 "
            "AND l_quantity BETWEEN 1 AND 11) "
            "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 "
            "AND l_quantity BETWEEN 10 AND 20) "
            "OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 "
            "AND l_quantity BETWEEN 20 AND 30)"
        ),
        "q2_min_cost_supplier": (
            # exact argmin: acctbal as int64 cents, suppkey tie-break
            "WITH f AS (SELECT p_partkey, p_brand FROM part "
            "WHERE p_type = 'STANDARD' AND p_size <= 5), "
            "pairs AS (SELECT DISTINCT l_partkey, l_suppkey "
            "FROM lineitem JOIN f ON l_partkey = p_partkey), "
            "s AS (SELECT pairs.l_partkey, pairs.l_suppkey, s_acctbal, "
            "s_name, n_name FROM pairs "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE n_regionkey = (SELECT r_regionkey FROM region "
            "WHERE r_name = 'EUROPE')) "
            "SELECT l_partkey AS p_partkey, p_brand, "
            "l_suppkey AS s_suppkey, s_name, s_acctbal, n_name "
            "FROM s JOIN f ON l_partkey = p_partkey "
            "QUALIFY row_number() OVER (PARTITION BY l_partkey "
            "ORDER BY CAST(round(s_acctbal*100) AS BIGINT), l_suppkey) = 1"
        ),
        "q9_product_profit": (
            # amount expression textually mirrors the engine's numpy
            # op order — identical IEEE doubles before quantization
            "WITH l AS (SELECT o_orderkey, "
            "CAST(year(o_orderdate) AS BIGINT) AS o_year, n_name, "
            "CAST(round((l_extendedprice*(1-l_discount) "
            "- p_retailprice*0.1*l_quantity)*1000000) AS BIGINT) AS amt_u "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN part ON l_partkey = p_partkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey) "
            "SELECT n_name, o_year, "
            "CAST(sum(amt_u) AS BIGINT)/1000000.0 AS profit "
            "FROM l GROUP BY 1, 2"
        ),
        "q16_part_supplier_counts": (
            "SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size, "
            "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM part JOIN lineitem ON p_partkey = l_partkey "
            "WHERE p_brand <> 'Brand#1' "
            "AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29) "
            "GROUP BY 1, 2, 3"
        ),
        "q20_excess_suppliers": (
            "WITH f AS (SELECT p_partkey FROM part "
            "WHERE p_brand = 'Brand#12'), "
            "ps AS (SELECT l_partkey, l_suppkey, "
            "sum(CAST(round(l_quantity*100) AS BIGINT)) AS q "
            "FROM lineitem JOIN f ON l_partkey = p_partkey "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' GROUP BY 1, 2), "
            "p AS (SELECT l_partkey, sum(q) AS tq FROM ps GROUP BY 1) "
            "SELECT DISTINCT s_suppkey, s_name "
            "FROM ps JOIN p USING (l_partkey) "
            "JOIN supplier ON l_suppkey = s_suppkey WHERE ps.q * 2 > tq"
        ),
        "q21_waiting_supplier": (
            "WITH ps AS (SELECT l_orderkey, l_suppkey, "
            "max(l_shipdate) AS ms FROM lineitem GROUP BY 1, 2), "
            "j AS (SELECT ps.*, o_orderdate FROM ps "
            "JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_orderstatus = 'F'), "
            "f AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp, "
            "sum(CASE WHEN ms > o_orderdate + INTERVAL 30 DAY "
            "THEN 1 ELSE 0 END) AS n_late, "
            "max(CASE WHEN ms > o_orderdate + INTERVAL 30 DAY "
            "THEN l_suppkey END) AS late_supp FROM j GROUP BY 1) "
            "SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait "
            "FROM f JOIN supplier ON late_supp = s_suppkey "
            "WHERE n_supp >= 2 AND n_late = 1 GROUP BY 1, 2 "
            "ORDER BY numwait DESC, s_suppkey LIMIT 20"
        ),
        "q22_sales_opportunity": (
            # richer-than-positive-average test in exact int64 cents:
            # cents*cnt > sum_cents (matches the engine bit-for-bit)
            "WITH c AS (SELECT c_custkey, "
            "CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "CAST(round(c_acctbal*100) AS BIGINT) AS cents "
            "FROM customer WHERE c_nationkey IN (7,13,17,19,23)), "
            "t AS (SELECT CAST(coalesce(sum(CASE WHEN cents > 0 "
            "THEN cents ELSE 0 END), 0) AS BIGINT) AS sq, "
            "CAST(sum(CASE WHEN cents > 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS cn FROM c) "
            "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust, "
            "CAST(sum(cents) AS BIGINT)/100.0 AS totacctbal "
            "FROM c, t WHERE cents*cn > sq AND NOT EXISTS "
            "(SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            "AND o_orderdate >= TIMESTAMP '2000-06-01') "
            "GROUP BY c_nationkey"
        ),
        "g15_corr": (
            # exact HUGEINT moment sums, then the same IEEE double
            # ops as the engine's finalize — bitwise-stable corr
            "WITH s AS (SELECT l_returnflag, "
            "CAST(count(*) AS HUGEINT) AS n, "
            "sum(CAST(CAST(round(l_quantity*100) AS BIGINT) AS HUGEINT)) "
            "AS sx, "
            "sum(CAST(CAST(round(l_extendedprice*100) AS BIGINT) "
            "AS HUGEINT)) AS sy, "
            "sum(CAST(CAST(round(l_quantity*100) AS BIGINT)"
            "*CAST(round(l_extendedprice*100) AS BIGINT) AS HUGEINT)) "
            "AS sxy, "
            "sum(CAST(CAST(round(l_quantity*100) AS BIGINT)"
            "*CAST(round(l_quantity*100) AS BIGINT) AS HUGEINT)) AS sxx, "
            "sum(CAST(CAST(round(l_extendedprice*100) AS BIGINT)"
            "*CAST(round(l_extendedprice*100) AS BIGINT) AS HUGEINT)) "
            "AS syy FROM lineitem GROUP BY 1) "
            "SELECT l_returnflag, CAST(n AS BIGINT) AS n, "
            "CAST(n*sxy - sx*sy AS DOUBLE) / "
            "(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * "
            "sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr_qty_price "
            "FROM s"
        ),
        "g20_regression": (
            # same exact HUGEINT moments as g15_corr; the finish
            # repeats the engine's IEEE-double op order verbatim
            "WITH s AS (SELECT l_returnflag, "
            "CAST(count(*) AS HUGEINT) AS n, "
            "sum(CAST(CAST(round(l_quantity*100) AS BIGINT) AS HUGEINT)) "
            "AS sx, "
            "sum(CAST(CAST(round(l_extendedprice*100) AS BIGINT) "
            "AS HUGEINT)) AS sy, "
            "sum(CAST(CAST(round(l_quantity*100) AS BIGINT)"
            "*CAST(round(l_extendedprice*100) AS BIGINT) AS HUGEINT)) "
            "AS sxy, "
            "sum(CAST(CAST(round(l_quantity*100) AS BIGINT)"
            "*CAST(round(l_quantity*100) AS BIGINT) AS HUGEINT)) AS sxx, "
            "sum(CAST(CAST(round(l_extendedprice*100) AS BIGINT)"
            "*CAST(round(l_extendedprice*100) AS BIGINT) AS HUGEINT)) "
            "AS syy FROM lineitem GROUP BY 1), "
            "t AS (SELECT l_returnflag, n, sx, sy, "
            "n*sxy - sx*sy AS sxy_n, n*sxx - sx*sx AS sxx_n, "
            "n*syy - sy*sy AS syy_n FROM s) "
            "SELECT l_returnflag, CAST(n AS BIGINT) AS n, "
            "CAST(sxy_n AS DOUBLE)/CAST(sxx_n AS DOUBLE) AS slope, "
            "(CAST(sy AS DOUBLE) - "
            "CAST(sxy_n AS DOUBLE)/CAST(sxx_n AS DOUBLE)"
            "*CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 100.0 "
            "AS intercept, "
            "CAST(sxy_n AS DOUBLE)*CAST(sxy_n AS DOUBLE) / "
            "(CAST(sxx_n AS DOUBLE)*CAST(syy_n AS DOUBLE)) AS r2 "
            "FROM t"
        ),
        "g21_zscore_outliers": (
            # exact HUGEINT moments; z repeats the engine's single
            # IEEE division (the n's cancel — no float mean/std)
            "WITH s AS (SELECT event_type, "
            "CAST(count(*) AS HUGEINT) AS n, "
            "sum(CAST(CAST(round(value*1000000) AS BIGINT) AS HUGEINT)) "
            "AS s, "
            "sum(CAST(CAST(round(value*1000000) AS BIGINT)"
            "*CAST(round(value*1000000) AS BIGINT) AS HUGEINT)) AS s2 "
            "FROM events GROUP BY 1), "
            "t AS (SELECT event_type, n, s, n*s2 - s*s AS var_num "
            "FROM s) "
            "SELECT event_id, e.event_type, value, z FROM ("
            "SELECT e.event_id, e.event_type, e.value, "
            "CAST(t.n*CAST(round(e.value*1000000) AS BIGINT) - t.s "
            "AS DOUBLE)/sqrt(CAST(t.var_num AS DOUBLE)) AS z "
            "FROM events e JOIN t ON e.event_type = t.event_type "
            "WHERE t.var_num > 0) e WHERE abs(z) > 2.5"
        ),
        "w13_scd2_history": (
            # gaps-and-islands: runs of consecutive equal event_type
            # per user in (ts, event_id) order
            "WITH x AS (SELECT user_id, event_type, ts, event_id, "
            "CASE WHEN lag(event_type) OVER w IS NULL "
            "OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END "
            "AS is_new FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "y AS (SELECT *, CAST(sum(is_new) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_no FROM x), "
            "r AS (SELECT user_id, run_no, min(event_type) AS event_type, "
            "min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_rows "
            "FROM y GROUP BY user_id, run_no) "
            "SELECT user_id, run_no, event_type, valid_from, "
            "COALESCE(lead(valid_from) OVER ("
            "PARTITION BY user_id ORDER BY run_no), "
            "TIMESTAMP '9999-12-31 00:00:00') AS valid_to, n_rows FROM r"
        ),
        "o12_skyline": (
            "SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) "
            "AS p_size FROM part x WHERE NOT EXISTS ("
            "SELECT 1 FROM part d "
            "WHERE d.p_retailprice <= x.p_retailprice "
            "AND d.p_size >= x.p_size "
            "AND (d.p_retailprice < x.p_retailprice "
            "OR d.p_size > x.p_size))"
        ),
        "j10_fuzzy_join": (
            "SELECT a.c_custkey AS c1, b.c_custkey AS c2 "
            "FROM customer a JOIN customer b "
            "ON a.c_custkey < b.c_custkey "
            "WHERE levenshtein(a.c_name, b.c_name) = 1"
        ),
        "w12_retention_cohorts": (
            # integer weeks via BIGINT floor division — no float
            # epoch() (a double quotient could flip floor() at exact
            # week boundaries)
            "WITH a AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 604800000000 AS w FROM events), "
            "f AS (SELECT user_id, min(w) AS w0 FROM a GROUP BY 1) "
            "SELECT f.w0 AS cohort_week, a.w - f.w0 AS week_offset, "
            "count(*) AS n_users "
            "FROM a JOIN f USING (user_id) GROUP BY 1, 2"
        ),
        "w10_funnel": (
            "WITH x AS (SELECT event_id, user_id, ts, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w > INTERVAL 43200 SECOND THEN 1 ELSE 0 "
            "END AS is_new FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT *, CAST(sum(is_new) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_no "
            "FROM x), "
            "c AS (SELECT *, max(CASE WHEN event_type='click' THEN 1 "
            "ELSE 0 END) OVER (PARTITION BY user_id, session_no "
            "ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
            "AS click_before FROM s) "
            "SELECT user_id, session_no, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "bool_or(event_type='purchase' "
            "AND COALESCE(click_before, 0) = 1) AS converted "
            "FROM c GROUP BY user_id, session_no"
        ),
        "w9_percent_rank": (
            "SELECT event_id, user_id, "
            "percent_rank() OVER w AS pct_rank, "
            "cume_dist() OVER w AS cume FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY value DESC)"
        ),
        "w8_late_events": (
            # watermark = running max event-time over PRIOR arrivals
            # (arrival order = event_id) minus 3600 s lateness
            "WITH y AS (SELECT event_id, epoch_us(ts) AS t, "
            "max(epoch_us(ts)) OVER (ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm "
            "FROM events) "
            "SELECT event_id, CAST(CASE WHEN wm IS NOT NULL "
            "AND t < wm - 3600000000 THEN 1 ELSE 0 END AS BIGINT) AS late, "
            "CAST(CASE WHEN wm IS NULL THEN 0 "
            "ELSE greatest(0, wm - 3600000000 - t) END AS BIGINT) "
            "AS lateness_us FROM y"
        ),
        "j9_full_outer_join": (
            "WITH a AS (SELECT user_id AS key, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            f"{_USUM('value')} AS sum_value "
            "FROM events WHERE user_id % 3 != 0 GROUP BY 1), "
            "c AS (SELECT c_custkey, c_acctbal FROM customer "
            "WHERE c_custkey < 10) "
            "SELECT COALESCE(a.key, c.c_custkey) AS key, "
            "COALESCE(a.n_events, 0) AS n_events, "
            "COALESCE(a.sum_value, 0.0) AS sum_value, "
            "COALESCE(c.c_acctbal, -1.0) AS c_acctbal, "
            "CASE WHEN a.key IS NULL THEN 'customer' "
            "WHEN c.c_custkey IS NULL THEN 'events' ELSE 'both' END AS side "
            "FROM a FULL OUTER JOIN c ON a.key = c.c_custkey"
        ),
        "w7_rolling_mean": (
            # micro-unit windowed int sum, then the same two double
            # divisions as the engine (su/1e6 then /n)
            "SELECT event_id, user_id, "
            "(CAST(sum(CAST(round(value*1000000) AS BIGINT)) OVER w "
            "AS BIGINT)/1000000.0) / count(*) OVER w AS rolling_mean "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS 4 PRECEDING)"
        ),
        "g14_group_median": (
            "SELECT event_type, quantile_disc(value, 0.5) AS median_value "
            "FROM events GROUP BY event_type"
        ),
        "d5_latest_per_key": (
            "SELECT user_id, event_type, event_id, ts, value FROM ("
            "SELECT *, row_number() OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn = 1"
        ),
        "g10_pivot": (
            "SELECT source, "
            "CAST(sum(CASE WHEN lang='de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de, "
            "CAST(sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en, "
            "CAST(sum(CASE WHEN lang='es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es, "
            "CAST(sum(CASE WHEN lang='fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr, "
            "CAST(sum(CASE WHEN lang='zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh, "
            "CAST(sum(CASE WHEN lang NOT IN ('de','en','es','fr','zh') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_other, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY source"
        ),
        "o7_wordcount_topk": (
            # term <> '' drops the empty token regexp_split emits for
            # leading/trailing whitespace (python split() never does)
            r"WITH tok AS (SELECT unnest(regexp_split_to_array(text, '\s+')) "
            "AS term FROM documents WHERE trim(text) <> ''), "
            "g AS (SELECT term, CAST(count(*) AS BIGINT) AS n "
            "FROM tok WHERE term <> '' GROUP BY term) "
            "SELECT term, n FROM g ORDER BY n DESC, term LIMIT 20"
        ),
        "q18_big_orders": (
            "WITH s AS (SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) "
            "AS sum_qty FROM lineitem GROUP BY 1 "
            "HAVING sum(l_quantity) > 250) "
            "SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, s.sum_qty "
            "FROM s JOIN orders o ON o.o_orderkey = s.l_orderkey "
            "ORDER BY s.sum_qty DESC, o.o_orderkey LIMIT 20"
        ),
        "g18_unpivot": (
            "WITH langs(lang) AS (VALUES ('de'),('en'),('es'),('fr'),"
            "('zh'),('other')), "
            "src AS (SELECT DISTINCT source FROM documents), "
            "cnt AS (SELECT source, CASE WHEN lang IN "
            "('de','en','es','fr','zh') THEN lang ELSE 'other' END AS lang, "
            "CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1, 2) "
            "SELECT s.source, l.lang, "
            "CAST(COALESCE(c.n, 0) AS BIGINT) AS n_docs "
            "FROM src s CROSS JOIN langs l "
            "LEFT JOIN cnt c ON c.source = s.source AND c.lang = l.lang"
        ),
        "g17_string_agg": (
            "WITH r AS (SELECT lang, doc_id, row_number() OVER ("
            "PARTITION BY lang ORDER BY doc_id) AS rn FROM documents), "
            "t AS (SELECT lang, string_agg(CAST(doc_id AS VARCHAR), ',' "
            "ORDER BY doc_id) AS top_ids FROM r WHERE rn <= 5 GROUP BY lang), "
            "c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY lang) "
            "SELECT c.lang, c.n_docs, t.top_ids FROM c JOIN t USING(lang)"
        ),
        "g16_heavy_hitters": (
            # exact heavy hitters: integer-compare threshold, same
            # token semantics as o7 (empty-token guard)
            r"WITH tok AS (SELECT unnest(regexp_split_to_array(text, '\s+')) "
            "AS term FROM documents WHERE trim(text) <> ''), "
            "g AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt "
            "FROM tok WHERE term <> '' GROUP BY term), "
            "tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok "
            "WHERE term <> '') "
            f"SELECT term, cnt FROM g, tot WHERE cnt * {SK_HH_K} > n"
        ),
        "q3_shipping_priority": (
            "SELECT l_orderkey, "
            f"{_USUM('l_extendedprice*(1-l_discount)')} AS revenue, "
            "any_value(o_orderdate) AS o_orderdate "
            "FROM lineitem JOIN orders ON l_orderkey=o_orderkey "
            "JOIN customer ON o_custkey=c_custkey "
            "WHERE c_mktsegment='BUILDING' "
            "GROUP BY l_orderkey "
            "ORDER BY revenue DESC, l_orderkey LIMIT 10"
        ),
        "o1_global_sort": (
            "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem "
            "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100"
        ),
        "o5_exact_quantiles": (
            "SELECT 0.5 AS q, quantile_disc(value, 0.5) AS value FROM events "
            "UNION ALL SELECT 0.95, quantile_disc(value, 0.95) FROM events "
            "UNION ALL SELECT 0.99, quantile_disc(value, 0.99) FROM events"
        ),
        "o2_global_topk": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "m11_json_extract": (
            "SELECT event_id, coalesce(CAST(json_extract_string(props, "
            "'$.k') AS BIGINT), -1) AS k FROM events"
        ),
        "o8_hash_split": (
            "WITH b AS (SELECT doc_id, CAST(CAST(('0x' || "
            "substr(md5(text),1,8)) AS UBIGINT) % 100 AS BIGINT) AS bucket "
            "FROM documents) "
            "SELECT doc_id, bucket, CASE WHEN bucket < 90 THEN 'train' "
            "WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split FROM b"
        ),
        "o11_chunk_overlap": (
            r"WITH t AS (SELECT doc_id, CAST(len(regexp_extract_all("
            r"text, '\s+')) + 1 AS BIGINT) AS n FROM documents), "
            "c AS (SELECT doc_id, n, unnest(generate_series(0, "
            "greatest(0, (n - 64 + 47) // 48))) AS i FROM t WHERE n > 0) "
            "SELECT doc_id, i AS chunk_id, i*48 AS start_tok, "
            "least(64, n - i*48) AS n_tok FROM c"
        ),
        "o9_seeded_shuffle": (
            "WITH k AS (SELECT doc_id, CAST(CAST(('0x' || "
            "substr(md5('42:' || CAST(doc_id AS VARCHAR)),1,15)) "
            "AS UBIGINT) AS BIGINT) AS skey FROM documents), "
            "r AS (SELECT doc_id, skey, row_number() OVER "
            "(ORDER BY skey, doc_id) AS pos FROM k) "
            "SELECT doc_id, skey, pos, (pos - 1) % 8 AS shard FROM r"
        ),
        "mix_curriculum_order": (
            # curriculum order: shortest-first token buckets, the o9
            # seeded-shuffle key INSIDE a bucket, global rank
            r"WITH t AS (SELECT doc_id, "
            r"CAST(len(regexp_split_to_array(text,'\s+')) AS BIGINT) "
            "AS n_tokens FROM documents), "
            "k AS (SELECT doc_id, n_tokens, "
            "least(n_tokens // 32, 7) AS qbucket, "
            "CAST(CAST(('0x' || "
            "substr(md5('77:' || CAST(doc_id AS VARCHAR)),1,15)) "
            "AS UBIGINT) AS BIGINT) AS skey FROM t) "
            "SELECT doc_id, n_tokens, qbucket, skey, row_number() OVER "
            "(ORDER BY qbucket, skey, doc_id) AS pos FROM k"
        ),
        "io_pushdown_scan": (
            "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
            "sum(CAST(round(l_quantity*1000000) AS BIGINT))/1000000.0 "
            "AS sum_qty FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-06-01' "
            "AND l_shipdate < TIMESTAMP '1996-07-01'"
        ),
        "o10_pack_sequences": (
            # concat-then-chunk packing: per-source exclusive token
            # prefix in doc_id order -> fixed 512-token bins
            r"WITH t AS (SELECT doc_id, source, "
            r"CAST(len(regexp_split_to_array(text,'\s+')) AS BIGINT) "
            "AS n_tokens FROM documents), "
            "p AS (SELECT doc_id, source, n_tokens, "
            "sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "- n_tokens AS pre FROM t) "
            "SELECT doc_id, source, n_tokens, "
            "CAST(pre // 512 AS BIGINT) AS bin_id, "
            "CAST(pre % 512 AS BIGINT) AS bin_off, "
            "CAST((pre + n_tokens - 1) // 512 AS BIGINT) AS end_bin "
            "FROM p"
        ),
        "q10_returned_revenue": (
            "SELECT c_custkey, c_name, n_name, "
            f"{_USUM('l_extendedprice*(1-l_discount)')} AS revenue "
            "FROM customer, orders, lineitem, nation "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1996-04-01' "
            "AND l_returnflag = 'R' AND c_nationkey = n_nationkey "
            "GROUP BY c_custkey, c_name, n_name "
            "ORDER BY revenue DESC, c_custkey LIMIT 20"
        ),
        "q5_local_supplier_volume": (
            "SELECT n_name, "
            f"{_USUM('l_extendedprice*(1-l_discount)')} AS revenue "
            "FROM customer, orders, lineitem, supplier, nation, region "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
            "AND r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY n_name"
        ),
        "q1_pricing_summary": (
            f"SELECT l_returnflag, l_linestatus, {_USUM('l_quantity')} AS sum_qty, "
            f"{_USUM('l_extendedprice')} AS sum_base_price, "
            f"{_USUM('l_extendedprice*(1-l_discount)')} AS sum_revenue, "
            "CAST(count(*) AS BIGINT) AS count_order "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "g13_user_value_drift": (
            # integer moment sums; the n*Sxy - Sx*Sy combine exceeds
            # int64, so it runs in HUGEINT here / python ints engine-side
            "WITH m AS (SELECT min(CAST(epoch_us(ts) // 1000000 AS BIGINT)) "
            "AS t0 FROM events), "
            "b AS (SELECT user_id, "
            "CAST(epoch_us(ts) // 1000000 AS BIGINT) - m.t0 AS x, "
            "CAST(round(value*1000000) AS BIGINT) AS y FROM events, m), "
            "s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy, "
            "CAST(sum(x*y) AS HUGEINT) AS sxy, "
            "CAST(sum(x*x) AS HUGEINT) AS sxx FROM b GROUP BY user_id) "
            "SELECT user_id, n, CASE WHEN n*sxx - sx*sx = 0 THEN 0.0 "
            "ELSE CAST(n*sxy - sx*sy AS DOUBLE) / "
            "CAST(n*sxx - sx*sx AS DOUBLE) END AS slope FROM s"
        ),
        "g12_embedding_centroids": (
            "WITH e AS (SELECT vec_id, gs.i - 1 AS dim, "
            "CAST(round(CAST(embedding[gs.i] AS DOUBLE)*1000000) AS BIGINT) "
            "AS v_u FROM embeddings, "
            "(SELECT unnest(generate_series(1,64)) AS i) gs), "
            "j AS (SELECT d.lang, e.dim, e.v_u FROM e "
            "JOIN documents d ON e.vec_id = d.doc_id) "
            "SELECT lang, CAST(dim AS BIGINT) AS dim, "
            "CAST(sum(v_u) AS DOUBLE)/count(*) AS mean_val "
            "FROM j GROUP BY lang, dim"
        ),
        "explode_embeddings": (
            "SELECT vec_id, gs.i - 1 AS dim, "
            "round(CAST(embedding[gs.i] AS DOUBLE),5) AS val "
            "FROM embeddings, (SELECT unnest(generate_series(1,64)) AS i) gs "
            "WHERE vec_id < 10"
        ),
        "token_count": (
            r"SELECT doc_id, CAST(len(regexp_split_to_array(text,'\s+')) AS BIGINT)"
            " AS n_tokens FROM documents"
        ),
        "tfidf_topk": (
            # linear idf (tf*N/df, floor-scaled): integer-exact in both
            # engines; ln() would not be bit-reproducible
            r"WITH tok AS (SELECT doc_id, "
            r"unnest(regexp_split_to_array(text, '\s+')) AS term "
            "FROM documents WHERE trim(text) <> ''), "
            "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
            "FROM tok GROUP BY 1, 2), "
            "df AS (SELECT term, CAST(count(*) AS BIGINT) AS df "
            "FROM tf GROUP BY 1), "
            "nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents), "
            "s AS (SELECT tf.doc_id, tf.term, (tf.tf*nd.nd*10000)//df.df "
            "AS sc FROM tf JOIN df ON tf.term = df.term CROSS JOIN nd) "
            "SELECT doc_id, term, sc/10000.0 AS score, rank FROM ("
            "SELECT doc_id, term, sc, CAST(row_number() OVER ("
            "PARTITION BY doc_id ORDER BY sc DESC, term) AS BIGINT) AS rank "
            "FROM s) WHERE rank <= 3"
        ),
        "token_count_bpe": (
            r"SELECT doc_id, CAST(len(regexp_extract_all(text,"
            r"'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens "
            "FROM documents"
        ),
        "quality_score": (
            r"SELECT doc_id, CAST(len(regexp_split_to_array(text,'\s+')) AS BIGINT) AS n_tokens, "
            r"floor(n_chars*10000.0/len(regexp_split_to_array(text,'\s+')))/10000 AS mean_tok_len, "
            r"floor(len(regexp_extract_all(text,'[A-Z]'))*10000.0/greatest(n_chars,1))/10000 AS upper_ratio "
            "FROM documents"
        ),
        "ngram_jaccard_pairs": (
            r"WITH w AS (SELECT doc_id, list_distinct(regexp_split_to_array(text,'\s+')) AS ws "
            "FROM documents) "
            f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, floor(({jacc})*10000)/10000 AS jaccard "
            f"FROM w a, w b WHERE a.doc_id < b.doc_id AND {jacc} >= 0.8"
        ),
        # ::DOUBLE[] casts: DuckDB computes float-list cosine in float32;
        # the engine uses float64 numpy — cast so both are double
        "dedup_embedding_cosine": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "round(list_cosine_similarity(a.embedding::DOUBLE[],b.embedding::DOUBLE[]),4) AS cos "
            "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id "
            "AND list_cosine_similarity(a.embedding::DOUBLE[],b.embedding::DOUBLE[]) >= 0.4"
        ),
        "ann_topk_cosine": (
            "WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings "
            "WHERE vec_id < 5), "
            "s AS (SELECT q.qid AS query_id, e.vec_id, "
            "list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS c "
            "FROM q, embeddings e WHERE e.vec_id != q.qid), "
            "r AS (SELECT query_id, vec_id, c, row_number() OVER ("
            "PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank FROM s) "
            "SELECT query_id, vec_id, round(c,4) AS cos, CAST(rank AS BIGINT) AS rank "
            "FROM r WHERE rank <= 5"
        ),
        # range filter on the ROUNDED cosine (both sides) so the kept
        # set cannot flip on a last-ulp kernel difference at the radius
        "ann_range_search": (
            "WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings "
            "WHERE vec_id < 8), "
            "s AS (SELECT q.qid AS query_id, e.vec_id, "
            "round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]),4) AS c "
            "FROM q, embeddings e WHERE e.vec_id != q.qid) "
            "SELECT query_id, vec_id, c AS cos FROM s WHERE c >= 0.25"
        ),
        "ann_filtered_topk": (
            "WITH q AS (SELECT vec_id AS qid, label AS ql, "
            "embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 5), "
            "s AS (SELECT q.qid AS query_id, e.vec_id, "
            "list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS c "
            "FROM q, embeddings e "
            "WHERE e.vec_id != q.qid AND e.label = q.ql), "
            "r AS (SELECT query_id, vec_id, c, row_number() OVER ("
            "PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank FROM s) "
            "SELECT query_id, vec_id, round(c,4) AS cos, CAST(rank AS BIGINT) AS rank "
            "FROM r WHERE rank <= 5"
        ),
        "io_jsonl_roundtrip": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY lang"
        ),
        "io_partitioned_roundtrip": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(min(doc_id) AS BIGINT) AS min_doc, "
            "CAST(max(doc_id) AS BIGINT) AS max_doc "
            "FROM documents GROUP BY lang"
        ),
        "io_csv_roundtrip": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(min(doc_id) AS BIGINT) AS min_doc, "
            "CAST(max(doc_id) AS BIGINT) AS max_doc "
            "FROM documents GROUP BY source"
        ),
        # IPC preserves Arrow types exactly, so the oracle is the same
        # rollup the parquet source would produce — any drift in the
        # shard write/read path shows up as a value mismatch here
        "io_ipc_roundtrip": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(min(doc_id) AS BIGINT) AS min_doc, "
            "CAST(max(doc_id) AS BIGINT) AS max_doc "
            "FROM documents GROUP BY lang"
        ),
        "io_orc_roundtrip": (
            "SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(max(doc_id) AS BIGINT) AS max_doc "
            "FROM documents GROUP BY lang, source"
        ),
        "g22_mad": (
            # quantile_disc on BOTH passes — the engine's histogram
            # refinement implements exactly these discrete selections
            "SELECT (SELECT quantile_disc(value, 0.5) FROM events) "
            "AS median, (SELECT quantile_disc(abs(value - "
            "(SELECT quantile_disc(value, 0.5) FROM events)), 0.5) "
            "FROM events) AS mad"
        ),
        "g23_market_basket": (
            "WITH b AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem) "
            "SELECT a.l_partkey AS p1, c.l_partkey AS p2, "
            "CAST(count(*) AS BIGINT) AS pair_orders "
            "FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey "
            "AND a.l_partkey < c.l_partkey "
            "GROUP BY 1, 2 HAVING count(*) >= 2"
        ),
        "w14_markov_transitions": (
            "WITH x AS (SELECT event_type AS from_type, "
            "lead(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS to_type FROM events), "
            "c AS (SELECT from_type, to_type, "
            "CAST(count(*) AS BIGINT) AS n FROM x "
            "WHERE to_type IS NOT NULL GROUP BY 1, 2), "
            "t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot "
            "FROM c GROUP BY 1) "
            "SELECT c.from_type, c.to_type, c.n, "
            "CAST((c.n * 1000000) // t.tot AS BIGINT) AS p_micro "
            "FROM c JOIN t USING (from_type)"
        ),
        "model_auc_report": (
            # exact tie-aware AUC of the frozen quality logit
            # (MODEL_WEIGHTS) for predicting lang = 'en'
            "WITH s AS (SELECT "
            r"35*(len(regexp_extract_all(text,'\s+'))+1) - 2*n_chars "
            "- 50*len(regexp_extract_all(text,'[A-Z]')) "
            "- 20*len(regexp_extract_all(text,'[0-9]')) + 900 AS score, "
            "(lang = 'en') AS label FROM documents), "
            "d AS (SELECT score, CAST(sum(CASE WHEN label THEN 1 "
            "ELSE 0 END) AS BIGINT) AS pos_v, "
            "CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) "
            "AS neg_v FROM s GROUP BY score), "
            "o AS (SELECT *, CAST(coalesce(sum(neg_v) OVER ("
            "ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS BIGINT) AS neg_below FROM d) "
            "SELECT CAST(sum(pos_v) AS BIGINT) AS n_pos, "
            "CAST(sum(neg_v) AS BIGINT) AS n_neg, "
            "CAST(sum(pos_v*(2*neg_below+neg_v)) AS BIGINT) AS auc_num, "
            "CAST(sum(pos_v*(2*neg_below+neg_v)) AS DOUBLE) "
            "/ (2.0 * sum(pos_v) * sum(neg_v)) AS auc FROM o"
        ),
        "media_dedup_exact": (
            # payload == encode(text) by construction (synth_media), so
            # md5(text) over UTF-8 is the payload digest
            "SELECT CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END "
            "AS media_type, md5(text) AS payload_md5, "
            "CAST(min(doc_id) AS BIGINT) AS keep_doc_id, "
            "CAST(count(*) AS BIGINT) AS n_copies "
            "FROM documents GROUP BY 1, 2"
        ),
        "media_byte_stats": (
            "SELECT CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes "
            "FROM documents GROUP BY 1"
        ),
        # heuristic text analysis + frame explode: directly SQL-expressible
        "lang_id": _LANG_ID_SQL,
        "media_pipeline": _MEDIA_PIPELINE_SQL,
        # sketches / ANN / crawl: serial differential oracles (VALUES)
        **_serial_oracles(),
        # o3_sample stays rows-only: DuckDB's sampler draws a
        # different random stream by construction.
    }
