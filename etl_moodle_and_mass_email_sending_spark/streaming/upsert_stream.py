"""Streaming upsert: drain a stream into a latest-wins parquet snapshot
via ``foreachBatch`` — the standard Structured-Streaming-to-lakehouse
MERGE pattern (each micro-batch is a bounded DataFrame, so the batch
sink's merge logic applies unchanged; exactly-once comes from the
checkpoint's batch-id tracking plus the sink swap being idempotent for
a replayed batch: re-merging the same rows is a no-op).

The per-batch reduction (latest row per key WITHIN the batch, by event
time) runs before the merge so the snapshot write is one row per key
regardless of how many updates a key received in the batch — state
stays in the snapshot, not in the stream (no watermark needed; this is
the stateless-stream + stateful-sink decomposition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sinks.upsert import merge_upsert


def start_upsert_stream(
    events: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    ts_col: str = "ts",
):
    """Maintain a latest-event-per-user snapshot from the event stream.
    Returns the StreamingQuery (caller awaits termination)."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        w = Window.partitionBy(key).orderBy(
            F.col(ts_col).desc(), F.col("event_id").desc()
        )
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        merge_upsert(
            batch.sparkSession, snapshot_dir, latest, key=key,
        )

    return (
        events.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
