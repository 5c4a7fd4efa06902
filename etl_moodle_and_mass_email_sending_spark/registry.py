"""Central query registry: every implemented operator's (Spark query,
DuckDB oracle SQL) pair, consumed by ``__spark_entry__.py`` and by
``tests/test_oracle_parity.py`` (a local mirror of the driver's t2 gate).

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names match the oracle SQL's aliases exactly (driver hashes sort
columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _QUERIES:
        raise KeyError(f"duplicate query name {name!r}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


# The external correctness gate certifies exactly the first 50 registry
# entries in iteration order. ROUND-6 ROTATION (VERDICT r5 items 1-4):
# the window is 48 of the 66 round-5 additions that have never had an
# external green row — including every query whose IMPLEMENTATION changed
# this round (rel_k_anonymity one-pass rewrite, dedup_soft_weights /
# dedup_cluster_profile on the staged cluster frame, sim_centroid_drift
# narrow-plan rewrite, rel_abc_analysis two-pass prefix sum) — plus the
# two r4-certified queries REWRITTEN this round to the scale-safe
# two-pass form (rel_session_concurrency, rel_zorder_layout; holding
# rewritten code in-window re-certifies the new code externally, the
# ref_send_counter precedent). The remaining 18 round-5 additions are the
# round-7 queue (marked below). All demoted entries REMAIN registered and
# locally gated: tests/test_oracle_parity.py checks every oracle-gated
# entry regardless of order, and tests/driver_sim.py sweeps all of them
# in the exact external harness. Round-6 ADDITIONS start life in the tail
# (standing policy: promote only after a driver-sim green, rotate into
# the window in round 7).
_DEMOTED = [
    # --- certified green in CORRECTNESS_r05 (the round-5 window) ---------
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sim_topk_bruteforce",
    "sim_ann_lsh_topk",
    "sim_ivf_topk",
    "sim_embedding_near_dup",
    "text_fingerprint",
    "rel_asof_join",
    "text_unigram_logprob",
    "dedup_components",
    "llm_corpus_pipeline",
    "dedup_jaccard_lsh_verified",
    "text_gopher_rules",
    "text_dsir_weights",
    "sim_semantic_dedup",
    "sim_hard_negatives",
    "text_cdc_chunks",
    "ref_roster_normalize",
    "ref_roster_segments",
    "ref_pick_email",
    "ref_mail_variant_old",
    "ref_mail_variant_moodle",
    "ref_mail_variant_fallback",
    "ref_template_render",
    "ref_password_patterns",
    "ref_preview_limit",
    "ref_send_counter",
    "ref_header_promotion",
    "ref_duplicate_usernames",
    "rel_q1_pricing_summary",
    "rel_supplier_part_volume",
    "rel_running_total",
    "rel_distinct_parts",
    "rel_setops",
    "rel_rollup",
    "rel_q6_forecast_revenue",
    "rel_q4_order_priority",
    "rel_q10_returned_items",
    "rel_q14_promo_share",
    "rel_cms_heavy_hitters",
    "rel_bloom_prejoin",
    "rel_q19_disjunctive",
    "rel_q15_top_supplier",
    "rel_q8_market_share",
    "rel_q17_small_quantity",
    "rel_q22_dormant_customers",
    "stream_sliding_counts",
    "stream_outer_join",
    # --- certified green in CORRECTNESS_r04 ------------------------------
    "sim_kmeans_refine",
    "mm_sample_frames",
    "text_sequence_pack",
    "text_top_terms",
    "text_source_mixture",
    "text_bm25_topk",
    "dedup_keep_best",
    "dedup_containment",
    "text_bigram_logprob",
    "text_stratified_sample",
    "sim_sq_topk",
    "mm_audio_energy",
    "mm_phash_dedup",
    "text_boilerplate_ngrams",
    "rel_asof_forward",
    "rel_asof_tolerance",
    "graph_pagerank",
    "text_tfidf_keywords",
    "mm_scene_changes",
    "dedup_fuzzy_match",
    "mm_silence_runs",
    "rel_latest_per_key",
    "rel_pivot_events",
    "rel_cube_documents",
    "rel_q18_big_spenders",
    "rel_rolling_window",
    "rel_kmv_distinct",
    "rel_q13_custdist",
    "rel_q7_nation_volume",
    "rel_funnel_stages",
    "rel_retention",
    "rel_scd2_history",
    "rel_value_deciles",
    "rel_value_outliers",
    "rel_event_pmi",
    "rel_incremental_agg",
    "rel_snapshot_diff",
    "rel_winsorize",
    "rel_skew_salted_join",
    "rel_event_transitions",
    "rel_trend_slope",
    "rel_chi_square",
    "stream_windowed_counts",
    "stream_sessionize",
    "stream_interval_join",
    "stream_dedup",
    "stream_enrich",
    "stream_trending",
    # --- certified green in r02 AND r03 ----------------------------------
    "text_token_stats",
    "text_lang_id",
    "text_quality_score",
    "mm_decode_media",
    "mm_extract_features",
    "mm_resize_images",
    "rel_skew_salted_agg",
    "rel_range_join",
    "rel_time_rollup",
    "text_chunking",
    "text_pii_scrub",
    "text_decontaminate",
    "text_train_val_split",
    "text_repetition",
    "rel_q3_shipping_priority",
    "rel_q5_region_revenue",
    "rel_top_orders_per_customer",
    "rel_events_hourly",
    "rel_events_json",
    "rel_semi_anti",
    "rel_scalar_subquery",
    "rel_percentiles",
    "rel_data_quality",
    "rel_sessionize",
    # --- ROUND-7 QUEUE: the 18 round-5 additions not yet externally
    # certified (driver-sim green; rotate into the round-7 window) --------
    "rel_gap_detection",
    "graph_assortativity",
    "rel_order_reconciliation",
    "sim_ivf_list_balance",
    "rel_arrival_disorder",
    "text_heaps_law",
    "graph_clustering_coeff",
    "rel_dow_hour_profile",
    "text_burstiness",
    "rel_revenue_gini",
    "text_js_divergence",
    "dedup_threshold_sweep",
    "mm_phash_hamming_hist",
    "rel_market_basket",
    "mm_audio_fp_dedup",
    "rel_new_vs_returning",
    "rel_ship_lag_by_nation",
    "text_oov_rate",
    # --- round-6 additions: start life in the tail (standing policy —
    # promote into the certification window in round 7) -------------------
    "text_lexical_diversity",
    "text_tokenizer_fertility",
    "text_line_dedup",
    "text_ppl_buckets",
    "sim_cluster_purity",
    "rel_correlation_matrix",
    "graph_two_hop",
    "mm_video_frame_dedup",
    "sim_norm_outliers",
    "rel_duplicate_orders",
]


def _ordered(d: dict) -> dict:
    head = {k: v for k, v in d.items() if k not in _DEMOTED}
    tail = {k: d[k] for k in _DEMOTED if k in d}
    return {**head, **tail}


def queries() -> dict[str, QueryFn]:
    _load_all()
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)


_loaded = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    from . import queries as _q  # noqa: F401  (side-effect registration)

    _loaded = True
