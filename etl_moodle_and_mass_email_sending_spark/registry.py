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
# entries in iteration order. ROUND-7 ROTATION (VERDICT r6 items 1-2):
# the window is now an EXPLICIT 50-name list —
#   (a) the 28 never-externally-certified queries: the 18-query round-5
#       queue plus the 10 round-6 additions (closing the certification
#       ledger: after this round every registered query has an external
#       green row);
#   (b) the 10 queries whose IMPLEMENTATION changed this round and so
#       need their new code re-certified (standing policy): the IVF/PQ
#       family whose corpus-side argmax windows became struct-max
#       aggregates (sim_ivf_topk, sim_ivf_nprobe_sweep, sim_ann_recall,
#       sim_kmeans_refine, sim_semantic_dedup, sim_pq_topk,
#       sim_ivfpq_topk), rel_k_anonymity (empty-input parity filter),
#       and text_source_mixture / text_stratified_sample (the
#       _docs_src de-shadowing changed their helper bindings);
#   (c) 12 refresh slots re-certifying the OLDEST external greens
#       (round 2/3) so no certification goes stale indefinitely.
# rel_market_basket (broadcast-side fix), sim_cluster_purity and
# graph_two_hop (rewritten this round) are already inside (a).
# Everything else stays registered and locally gated every round by
# tests/test_oracle_parity.py and the tests/driver_sim.py sweep; new
# round-7 additions start life in the tail (standing policy: promote
# only after a driver-sim green, rotate into the window next round).
_WINDOW = [
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
    "sim_ivf_topk",
    "sim_ivf_nprobe_sweep",
    "sim_ann_recall",
    "sim_kmeans_refine",
    "sim_semantic_dedup",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "rel_k_anonymity",
    "text_source_mixture",
    "text_stratified_sample",
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
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _WINDOW if k in d}
    tail = {k: v for k, v in d.items() if k not in set(_WINDOW)}
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
