"""[EXT] Streaming incremental crawl dedup — the online twin of
operators/dedup.py::incremental_dedup: new-crawl documents arrive as a
stream and every micro-batch is scored against the STATIC frozen
snapshot's MinHash signature index ("index once, score every crawl").
A doc is admitted iff no frozen near-duplicate reaches the threshold.

Architecture: ``foreachBatch`` — each batch runs the exact batch
scorer (sign → band → (band, key) equi-join against the frozen index →
per-doc verdict rollup) and writes its verdicts into its own
``batch_id`` partition with dynamic partition overwrite, so a batch
retry after a partial write replaces its own output (exactly-once row
counts; the round-9 idempotent-sink pattern from decon_stream.py).
Docs arrive whole and the verdict depends only on (doc, frozen index),
so emission is independent of how the replay batches — which is what
lets the exact batch oracle in queries/streaming_q.py hold.

100 TB shape: the frozen index is a distributed (doc_id, sig) table —
the per-batch join co-partitions on (band, key); state is ZERO (the
index is config, not stream state — a crawl-ingest pipeline rebuilds
it per snapshot, not per batch), so there is no store to compact and
no watermark to reason about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup


def start_crawl_dedup_stream(
    docs_stream: DataFrame,
    frozen_sigs: DataFrame,
    out_path: str,
    checkpoint_path: str,
    threshold: float = dedup.NEAR_THRESHOLD,
):
    """Start the stream: docs_stream(doc_id, text) → parquet verdicts
    (doc_id, n_frozen_matches, match_id, match_est, admitted) per
    incoming doc. ``frozen_sigs`` is the static (doc_id, sig) index."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        verdicts = dedup.incremental_dedup(
            frozen_sigs, batch_df, threshold=threshold
        )
        (
            verdicts.withColumn("batch_id", F.lit(batch_id))
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
