"""[EXT] M7 — LLM-data-pipeline query registrations: dedup (exact,
MinHash-LSH, SimHash, n-gram Jaccard), similarity search (brute-force and
LSH-bucketed ANN), text analysis, and multimodal decode."""

from __future__ import annotations

from ..operators import dedup, multimodal, similarity, text_analysis
from ..registry import register

_CORPUS_SQL = dedup.sql_dup_corpus()

register(
    "dedup_exact",
    lambda spark, sf_dir: dedup.exact_dedup_groups(dedup.dup_corpus(spark, sf_dir)),
    f"""
    SELECT md5(text) AS digest, min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM ({_CORPUS_SQL}) GROUP BY md5(text)
    """,
)

register(
    "dedup_minhash_lsh",
    lambda spark, sf_dir: dedup.minhash_lsh_pairs(dedup.dup_corpus(spark, sf_dir)),
    dedup.sql_minhash_lsh_pairs(_CORPUS_SQL),
)

register(
    "dedup_ngram_jaccard",
    lambda spark, sf_dir: dedup.ngram_jaccard_pairs(dedup.dup_corpus(spark, sf_dir)),
    dedup.sql_ngram_jaccard_pairs(_CORPUS_SQL),
)

register(
    "dedup_simhash",
    lambda spark, sf_dir: dedup.simhash_pairs(dedup.dup_corpus(spark, sf_dir)),
    dedup.sql_simhash_pairs(_CORPUS_SQL),
)

register(
    "sim_topk_bruteforce",
    similarity.topk_bruteforce,
    similarity.sql_topk_bruteforce(),
)

register(
    "sim_ann_lsh_topk",
    similarity.ann_lsh_topk,
    similarity.sql_ann_lsh_topk(),
)

register(
    "sim_ivf_topk",
    similarity.ivf_topk,
    similarity.sql_ivf_topk(),
)

register(
    "sim_embedding_near_dup",
    similarity.embedding_near_dup_pairs,
    similarity.sql_embedding_near_dup_pairs(),
)

_DOCS_SQL = "SELECT doc_id, text, lang FROM documents"


def _docs(spark, sf_dir):
    from ..catalog import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")


register(
    "text_token_stats",
    lambda spark, sf_dir: text_analysis.token_stats(_docs(spark, sf_dir)),
    text_analysis.sql_token_stats(_DOCS_SQL),
)

register(
    "text_lang_id",
    lambda spark, sf_dir: text_analysis.lang_id(_docs(spark, sf_dir)),
    text_analysis.sql_lang_id(_DOCS_SQL),
)

register(
    "text_quality_score",
    lambda spark, sf_dir: text_analysis.quality_score(_docs(spark, sf_dir)),
    text_analysis.sql_quality_score(_DOCS_SQL),
)

register(
    "text_fingerprint",
    lambda spark, sf_dir: text_analysis.fingerprints(_docs(spark, sf_dir)),
    text_analysis.sql_fingerprints(_DOCS_SQL),
)

register(
    "mm_decode_media",
    lambda spark, sf_dir: multimodal.decode_media(
        multimodal.media_table(spark, sf_dir), engine="fake"
    ),
    multimodal.sql_decode_media(),
)

register(
    "mm_extract_features",
    lambda spark, sf_dir: multimodal.extract_features(
        multimodal.media_table(spark, sf_dir), engine="fake"
    ),
    multimodal.sql_extract_features(),
)

register(
    "mm_resize_images",
    lambda spark, sf_dir: multimodal.resize_images(
        multimodal.media_table(spark, sf_dir), engine="fake"
    ),
    multimodal.sql_resize_images(),
)

register(
    "mm_sample_frames",
    lambda spark, sf_dir: multimodal.sample_frames(
        multimodal.media_table(spark, sf_dir), every_n=2, engine="fake"
    ),
    multimodal.sql_sample_frames(every_n=2),
)


# --------------------------------------------------------------------------
# rel_skew_salted_agg — skew-safe two-stage aggregation over the (heavily
# skewed) event_type key. The oracle is a plain GROUP BY: salting is a
# physical rewrite, not a semantic one.
# --------------------------------------------------------------------------


def _skew_salted(spark, sf_dir):
    from ..catalog import load_table
    from ..operators.skew import salted_agg_sum_count
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg_sum_count(
        ev,
        key="event_type",
        value=F.coalesce(F.col("value"), F.lit(0.0)).cast(
            "decimal(18,2)"
        ),
        salt_source="event_id",
    )
    return out.select(
        "event_type",
        F.col("sum_value").cast("double").alias("sum_value"),
        "n_rows",
    )


register(
    "rel_skew_salted_agg",
    _skew_salted,
    """
    SELECT event_type,
           CAST(sum(CAST(coalesce(value, 0) AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_value,
           count(*) AS n_rows
    FROM events GROUP BY event_type
    """,
)


# --------------------------------------------------------------------------
# rel_asof_join — for each click event, the user's most recent purchase at
# or before it. Oracle = DuckDB's native ASOF LEFT JOIN; the Spark side is
# the union+last-value composition (operators/asof.py).
# --------------------------------------------------------------------------


def _asof(spark, sf_dir):
    from pyspark.sql import functions as F

    from ..catalog import load_table
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")  # unique per (key, ts) for determinism
        .agg(F.max(F.col("value").cast("decimal(18,2)")).alias("pvalue"))
    )
    out = asof_join(clicks, purchases, key="user_id")
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("ts_asof").alias("purchase_ts"),
        F.col("pvalue_asof").cast("double").alias("purchase_value"),
    )


register(
    "rel_asof_join",
    _asof,
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, max(CAST(value AS DECIMAL(18,2))) AS pvalue
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id, c.ts AS click_ts,
           p.ts AS purchase_ts,
           CAST(p.pvalue AS DOUBLE) AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
