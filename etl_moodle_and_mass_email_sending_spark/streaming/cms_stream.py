"""Streaming count-min sketch: each micro-batch's counter table
SUM-merges into a parquet-backed store through ``foreachBatch`` — the
additive sibling of the HLL stream's max-merge (CMS counters are plain
sums, so batch boundaries and merge order cannot change the final
table, and the streamed sketch is bit-identical to the batch sketch
over the same data).

State is ≤ CMS_ROWS × CMS_WIDTH (1024) integer cells FOREVER,
regardless of key cardinality or stream duration — the streaming
frequency-tracking state-size argument. NOTE the honest limitation
this module keeps: a pure CMS answers point queries for keys you ask
about; it cannot enumerate heavy hitters without a candidate set
(production pairs it with a heap of candidates). The registered query
probes a fixed key spine.

Same rename-swap crash discipline as hll_stream/merge_upsert; a crash
between renames only re-merges the last batch, and the checkpoint's
batch tracking prevents double-merging in normal operation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import cms_counters


def _has_parquet(d: str) -> bool:
    return os.path.isdir(d) and any(
        f.endswith(".parquet") for _, _, fs in os.walk(d) for f in fs
    )


def start_cms_stream(
    events: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
):
    """Maintain the CMS counter table from the event stream. Returns
    the StreamingQuery; afterwards read ``<store>/counters`` and call
    ``cms_probe``."""
    ctr_dir = os.path.join(store_dir, "counters")
    old = ctr_dir.rstrip("/") + ".old"

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        spark = batch.sparkSession
        if not os.path.isdir(ctr_dir) and _has_parquet(old):
            os.rename(old, ctr_dir)
        ctrs = cms_counters(batch, key_col)
        if _has_parquet(ctr_dir):
            merged = (
                spark.read.parquet(ctr_dir)
                .unionByName(ctrs)
                .groupBy("r", "bucket")
                .agg(F.sum("_cnt").alias("_cnt"))
            )
        else:
            merged = ctrs
        staging = ctr_dir.rstrip("/") + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.isdir(ctr_dir):
            if os.path.isdir(old):
                import shutil

                shutil.rmtree(old)
            os.rename(ctr_dir, old)
        os.rename(staging, ctr_dir)

    return (
        events.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
