"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``   — flagship pipeline on sf0.001 (smoke check).
- ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2); each takes ``sf_dir`` and returns a Dataset.
- ``oracle_sql()`` — equivalent DuckDB SQL per query (run at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_001 = "/root/testdata/sf0.001"
SF_01 = "/root/testdata/sf0.01"


def entry() -> Any:
    """Flagship: synthetic CC-style pages (from sf0.001 documents) →
    extract kernel → extracted-text table."""
    from crawl4ai_custom_ray.pipelines.flagship import flagship_extract

    return flagship_extract(
        SF_001, columns=["text", "raw_markdown", "n_tables", "success"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from crawl4ai_custom_ray import queries as q

    return {
        "extract_text": q.q_extract_text,
        "warc_extract": q.q_warc_extract,
        "extract_links": q.q_extract_links,
        "link_stats": q.q_link_stats,
        "host_graph": q.q_host_graph,
        "degree_hist": q.q_degree_hist,
        "url_depth_hist": q.q_url_depth_hist,
        "trap_detect": q.q_trap_detect,
        "dangling_links": q.q_dangling_links,
        "pagerank": q.q_pagerank,
        "host_rank": q.q_host_rank,
        "host_rank_weighted": q.q_host_rank_weighted,
        "host_hits": q.q_host_hits,
        "host_distance": q.q_host_distance,
        "anchor_stats": q.q_anchor_stats,
        "page_metadata": q.q_page_metadata,
        "link_head_preview": q.q_link_head_preview,
        "page_tables": q.q_page_tables,
        "regex_emails": q.q_regex_emails,
        "fetch_pages": q.q_fetch_pages,
        "frontier_bfs": q.q_frontier_bfs,
        "top_k_per_host": q.q_top_k_per_host,
        "robots_filter": q.q_robots_filter,
        "ua_assign": q.q_ua_assign,
        "cert_audit": q.q_cert_audit,
        # training-data ops
        "dedup_exact": q.q_dedup_exact,
        "dedup_summary": q.q_dedup_summary,
        "jaccard_pairs": q.q_jaccard_pairs,
        "dedup_minhash": q.q_dedup_minhash,
        "minhash_calibration": q.q_minhash_calibration,
        "dedup_simhash": q.q_dedup_simhash,
        "dedup_cluster": q.q_dedup_cluster,
        "dedup_keep_best": q.q_dedup_keep_best,
        "line_dedup": q.q_line_dedup,
        "boilerplate_strip": q.q_boilerplate_strip,
        "dedup_substring": q.q_dedup_substring,
        "dedup_incremental": q.q_dedup_incremental,
        "latest_capture": q.q_latest_capture,
        "recrawl_schedule": q.q_recrawl_schedule,
        "token_count": q.q_token_count,
        "vocab_topk": q.q_vocab_topk,
        "vocab_growth": q.q_vocab_growth,
        "build_postings": q.q_build_postings,
        "term_search": q.q_term_search,
        "bm25_search": q.q_bm25_search,
        "tfidf_topk": q.q_tfidf_topk,
        "lm_score": q.q_lm_score,
        "ccnet_buckets": q.q_ccnet_buckets,
        "pack_sequences": q.q_pack_sequences,
        "quality_score": q.q_quality_score,
        "text_entropy": q.q_text_entropy,
        "lang_id": q.q_lang_id,
        "lang_confusion": q.q_lang_confusion,
        "fingerprint": q.q_fingerprint,
        "knn_topk": q.q_knn_topk,
        "dedup_embedding": q.q_dedup_embedding,
        "knn_ivf": q.q_knn_ivf,
        "knn_lsh": q.q_knn_lsh,
        "knn_rrf": q.q_knn_rrf,
        "quantize_embeddings": q.q_quantize_embeddings,
        "media_features": q.q_media_features,
        "frame_sample": q.q_frame_sample,
        "pdf_extract": q.q_pdf_extract,
        "events_window": q.q_events_window,
        "events_hopping": q.q_events_hopping,
        "rate_anomaly": q.q_rate_anomaly,
        "props_stats": q.q_props_stats,
        "group_clip": q.q_group_clip,
        "cohort_retention": q.q_cohort_retention,
        "suffstats": q.q_suffstats,
        "corpus_report": q.q_corpus_report,
        "kl_divergence": q.q_kl_divergence,
        "sessionize": q.q_sessionize,
        "session_stats": q.q_session_stats,
        "funnel": q.q_funnel,
        "event_transitions": q.q_event_transitions,
        "asof_join": q.q_asof_join,
        "range_join": q.q_range_join,
        "rolling_window": q.q_rolling_window,
        "host_triangles": q.q_host_triangles,
        "chunk_fixed": q.q_chunk_fixed,
        # mergeable sketches
        "hll_distinct": q.q_hll_distinct,
        "hll_by_type": q.q_hll_by_type,
        "kmv_distinct": q.q_kmv_distinct,
        "cms_counts": q.q_cms_counts,
        # windowed top-k + exact prefix-filtered similarity join
        "window_topk": q.q_window_topk,
        "jaccard_prefix": q.q_jaccard_prefix,
        "semantic_dedup": q.q_semantic_dedup,
        "kmeans_assign": q.q_kmeans_assign,
        "kmeans_medoids": q.q_kmeans_medoids,
        # curation ops (PII / decontamination / repetition gate)
        "pii_scrub": q.q_pii_scrub,
        "decontaminate": q.q_decontaminate,
        "gopher_quality": q.q_gopher_quality,
        "gopher_filters": q.q_gopher_filters,
        "split_assign": q.q_split_assign,
        "weighted_sample": q.q_weighted_sample,
        "ccnet_normalize": q.q_ccnet_normalize,
        "dedup_normalized": q.q_dedup_normalized,
        "sample_per_group": q.q_sample_per_group,
        "mixture_sample": q.q_mixture_sample,
        "length_quantiles": q.q_length_quantiles,
        "dsir_select": q.q_dsir_select,
        "domain_filter": q.q_domain_filter,
        "pmi_pairs": q.q_pmi_pairs,
        "curate_pipeline": q.q_curate_pipeline,
        "novelty_score": q.q_novelty_score,
        "rank_blend": q.q_rank_blend,
        # structured extraction
        "structured_extract": q.q_structured_extract,
        "semantic_cluster": q.q_semantic_cluster,
        # seeding + adaptive
        "seed_urls": q.q_seed_urls,
        "sitemap_coverage": q.q_sitemap_coverage,
        "seed_cc": q.q_seed_cc,
        "seed_robots": q.q_seed_robots,
        "crawl_delay_budget": q.q_crawl_delay_budget,
        "adaptive_crawl": q.q_adaptive_crawl,
        "adaptive_crawl_embedding": q.q_adaptive_crawl_embedding,
    }


def oracle_sql() -> dict[str, str]:
    from crawl4ai_custom_ray.oracles import oracle_sql_for

    return oracle_sql_for(SF_01)
