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
# entries in iteration order. ROUND-9 ROTATION (VERDICT r8 item 1):
#   (a) the 10 round-8 tail additions — never externally certified,
#       all independently driver-sim green during the round-8 judging
#       (standing promotion policy).  Two of them also changed THIS
#       round, so the window certifies the new code:
#       text_contamination_pairs (pre-join corpus distinct removed —
#       raw gram stream now joins the broadcast evidence first, then
#       countDistinct; VERDICT r8 #1) and dedup_source_shift
#       (left-join + coalesce so fully-collapsed sources appear with
#       keep_rate 0; ADVICE r8 #4);
#   (b) the complete 27-name round-4 cohort — the stalest external
#       certifications in the ledger (rel_incremental_agg /
#       rel_kmv_distinct / rel_latest_per_key first, per the round-8
#       plan);
#   (c) 13 refresh slots for the oldest round-5 certifications
#       (alphabetical head of the 48-name r5 cohort; the rest rotate
#       in round 10).
# After CORRECTNESS_r09 goes green, no registered query's last
# external green is older than round 5.
# ROUND-8 ROTATION (kept for the ledger; superseded above):
#   (a) the 16 round-7 tail additions — never externally certified,
#       all independently driver-sim green in the round-7 judging
#       (standing promotion policy); four of them (rel_mad_outliers,
#       graph_jaccard_neighbors, rel_ab_conversion_lift,
#       mm_payload_byte_stats) were ALSO rewritten this round
#       (histogram median / degree-cap fix / try_divide /
#       variable-length payloads), so the window certifies the new
#       code;
#   (b) 3 queries whose IMPLEMENTATION changed this round and need
#       their new code re-certified (standing policy): sim_pq_topk /
#       sim_ivfpq_topk (session-staged codebooks + encodings),
#       graph_two_hop (mid-vertex-only degree cap + capped oracle);
#   (c) 12 refresh slots for the queries whose last external green is
#       round 3 — the stalest certifications in the ledger;
#   (d) 16 refresh slots for the oldest round-4 certifications
#       (alphabetical head of the 45-name r4 cohort; three slots went
#       to this round's rewrites of text_sequence_pack /
#       text_top_terms / text_zipf_fit — the latter two are themselves
#       r4-stale, so their certification doubles as the refresh; the
#       remaining r4 names rotate in round 9, rel_incremental_agg /
#       rel_kmv_distinct / rel_latest_per_key first).
# Everything else stays registered and locally gated every round by
# tests/test_oracle_parity.py and the tests/driver_sim.py sweep; new
# round-8 additions start life in the tail (standing policy: promote
# only after a driver-sim green, rotate into the window next round).
_WINDOW = [
    # (a) round-8 tail additions (incl. this round's rewrites of
    # text_contamination_pairs and dedup_source_shift)
    "text_contamination_direction",
    "dedup_cluster_quota",
    "sim_source_outliers",
    "sim_kcenter_sample",
    "dedup_cross_source_matrix",
    "text_pack_efficiency",
    "dedup_source_shift",
    "stream_decontaminate",
    "text_contamination_pairs",
    "src_jsonl_documents",
    # (b) the full round-4 cohort — stalest certifications
    "rel_incremental_agg",
    "rel_kmv_distinct",
    "rel_latest_per_key",
    "rel_pivot_events",
    "rel_q13_custdist",
    "rel_q18_big_spenders",
    "rel_q7_nation_volume",
    "rel_retention",
    "rel_rolling_window",
    "rel_scd2_history",
    "rel_skew_salted_join",
    "rel_snapshot_diff",
    "rel_trend_slope",
    "rel_value_deciles",
    "rel_value_outliers",
    "rel_winsorize",
    "sim_sq_topk",
    "stream_dedup",
    "stream_enrich",
    "stream_interval_join",
    "stream_sessionize",
    "stream_trending",
    "stream_windowed_counts",
    "text_bigram_logprob",
    "text_bm25_topk",
    "text_boilerplate_ngrams",
    "text_tfidf_keywords",
    # (c) round-5 refreshes (alphabetical head of the r5 cohort)
    "dedup_components",
    "dedup_exact",
    "dedup_jaccard_lsh_verified",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "llm_corpus_pipeline",
    "ref_duplicate_usernames",
    "ref_header_promotion",
    "ref_mail_variant_fallback",
    "ref_mail_variant_moodle",
    "ref_mail_variant_old",
    "ref_password_patterns",
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
