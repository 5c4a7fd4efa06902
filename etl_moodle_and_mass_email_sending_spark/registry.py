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
# entries in iteration order. ROUND-5 ROTATION (exactly what VERDICT r4
# item 1 prescribes): the window is the 24 entries that have NEVER had an
# external green row — the six documented deferrals plus all 18 round-4
# additions — plus 26 rotations of already-certified entries. After this
# round every pre-round-5 query has an external certification on record.
# The 26 rotations are: all 12 ref_* SURVEY-parity queries (including
# ref_send_counter, whose implementation was REWRITTEN to the two-pass
# range-partition stamp in round 4 after its r2/r3 certification — the
# ADVICE r4 note; holding it in-window re-certifies the new code
# externally) and 14 high-traffic LLM-data/relational entries last
# certified in r2/r3, among them the two text queries whose round-4
# timings regressed (text_fingerprint, text_unigram_logprob).
# All demoted entries REMAIN registered and locally gated:
# tests/test_oracle_parity.py checks every oracle-gated entry regardless
# of order, and tests/driver_sim.py (no names) sweeps all of them in the
# exact external harness. Round-5 ADDITIONS start life in the tail
# (standing policy: promote only after a driver-sim green, rotate into
# the window in round 6).
_DEMOTED = [
    # --- certified green in CORRECTNESS_r04 (the round-4 window) ---------
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
    "rel_session_concurrency",
    "rel_value_deciles",
    "rel_value_outliers",
    "rel_event_pmi",
    "rel_incremental_agg",
    "rel_snapshot_diff",
    "rel_winsorize",
    "rel_skew_salted_join",
    "rel_zorder_layout",
    "rel_event_transitions",
    "rel_trend_slope",
    "rel_chi_square",
    "stream_windowed_counts",
    "stream_sessionize",
    "stream_interval_join",
    "stream_dedup",
    "stream_enrich",
    "stream_trending",
    # --- certified green in r02 AND r03, not picked as a round-5 rotation
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
    # --- round-5 additions: start life in the tail (standing policy —
    # promote into the certification window in round 6) ------------------
    "text_substring_dedup",
    "text_quality_classifier",
    "rel_q2_min_price_supplier",
    "rel_q9_product_profit",
    "rel_q11_important_stock",
    "rel_q16_supplier_count",
    "rel_q20_excess_shippers",
    "rel_q21_sole_blame",
    "graph_triangles",
    "text_token_entropy",
    "text_bpe_merges",
    "sim_pq_topk",
    "rel_q12_late_priority",
    "sim_mrl_topk",
    "sim_knn_graph",
    "graph_kcore",
    "rel_grouping_sets",
    "rel_kmv_setops",
    "text_weighted_sample",
    "mm_clip_align",
    "dedup_soft_weights",
    "graph_bfs_depth",
    "stream_upsert_latest",
    "rel_hll_distinct",
    "sim_ivfpq_topk",
    "text_ngram_novelty",
    "sim_ann_recall",
    "graph_label_prop",
    "dedup_minhash_calibration",
    "stream_near_dup_filter",
    "rel_benford_check",
    "sim_ann_multiprobe_topk",
    "graph_modularity",
    "stream_hll_distinct",
    "rel_quantile_sketch",
    "stream_cms_counts",
    "rel_k_anonymity",
    "rel_psi_drift",
    "stream_quantile_sketch",
    "sim_ivf_nprobe_sweep",
    "graph_degree_profile",
    "text_zipf_fit",
    "stream_bloom_membership",
    "text_langid_confusion",
    "rel_time_weighted_avg",
    "rel_gap_detection",
    "graph_assortativity",
    "dedup_cluster_profile",
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
    "sim_centroid_drift",
    "rel_abc_analysis",
    "rel_market_basket",
    "mm_audio_fp_dedup",
    "rel_new_vs_returning",
    "rel_ship_lag_by_nation",
    "text_oov_rate",
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
