"""[EXT] Online benchmark decontamination — the streaming twin of
operators/text_analysis.py::decontaminate: documents arrive as a
stream, the held-out benchmark's distinct n-gram set is a STATIC frame
(an eval suite is megabytes at any corpus scale), and every incoming
training document is stamped with its hit count and a drop flag.

Architecture: ``foreachBatch`` — each micro-batch runs the exact batch
pipeline (gram fan-out → broadcast join against the static bench set →
per-doc hit count → left join back so CLEAN docs emit too) and appends
its verdicts. Documents arrive whole (a doc never spans batches), so
per-doc results are complete within the batch that carried the doc and
the emission is independent of how the replay batches — which is what
makes the exact batch oracle in queries/streaming_q.py hold.

100 TB shape: the bench set broadcasts into every batch join (no
shuffle of stream data for the join); the per-doc count partial-
aggregates within the batch; state is ZERO (stateless filter — the
bench set is config, not stream state), so there is no store to
compact and no watermark to reason about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text_analysis import (
    _SPARK_TOKS,
    DECON_NGRAM,
    gram_stream,
)


def start_decontaminate_stream(
    docs_stream: DataFrame,
    bench_grams: DataFrame,
    out_path: str,
    checkpoint_path: str,
    n: int = DECON_NGRAM,
):
    """Start the stream: docs_stream(doc_id, text) → parquet rows
    (doc_id, n_hit_ngrams, n_grams, contaminated) per training doc.
    ``bench_grams`` is a static (gram) frame."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        grams = gram_stream(batch_df, n)
        hits = (
            grams.join(F.broadcast(bench_grams), "gram")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_hit_ngrams"))
        )
        # n_grams from the SAME canonical tokenization the gram fan-out
        # uses (a divergent re-tokenization here would break the exact
        # oracle); short docs clamp to 0
        docs = batch_df.select(
            "doc_id",
            F.greatest(
                F.size(F.expr(_SPARK_TOKS)) - (n - 1), F.lit(0)
            )
            .cast("bigint")
            .alias("n_grams"),
        )
        out = docs.join(hits, "doc_id", "left").select(
            "doc_id",
            F.coalesce(F.col("n_hit_ngrams"), F.lit(0))
            .cast("bigint")
            .alias("n_hit_ngrams"),
            "n_grams",
            (F.coalesce(F.col("n_hit_ngrams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
        # Idempotent sink (ADVICE r8): plain append is at-least-once — a
        # batch retried after a partial write would duplicate verdict
        # rows even though the checkpoint marks the batch done. Writing
        # each batch into its own batch_id=<id> partition and replacing
        # ONLY that partition (dynamic partitionOverwriteMode) makes a
        # replayed batch overwrite its own previous partial output, so
        # the sink holds exactly-once row counts vs the batch oracle.
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
