"""Merge-upsert sink: latest-wins MERGE of an updates batch into a
parquet snapshot directory, by full rewrite.

[EXT] the pattern behind Delta/Iceberg MERGE INTO, expressed on plain
parquet: read the current snapshot, anti-join it against the update
keys (rows NOT being replaced), union the updates, and write a NEW
snapshot directory, then swap it in.

Durability, stated honestly: plain directories cannot give an atomic
commit — the swap is rename(old-out) → rename(new-in), and a crash
between the two renames leaves the data intact in ``<dir>.old`` (the
next call recovers it automatically). A table format replaces this
window with an atomic manifest commit; that's the upgrade path, not
extra code here.

Scale notes: the anti-join shuffles on the merge key, the unavoidable
cost of key-level reconciliation without file-level pruning; a real
deployment partitions the snapshot (``partition_by``) so only
partitions containing update keys rewrite.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.util import scratch_dir


def _has_parquet(d: str) -> bool:
    return os.path.isdir(d) and any(
        f.endswith(".parquet") for _, _, fs in os.walk(d) for f in fs
    )


def merge_upsert(
    spark: SparkSession,
    snapshot_dir: str,
    updates: DataFrame,
    key: str,
    partition_by: list[str] | None = None,
    version_col: str | None = None,
) -> str:
    """Merge ``updates`` (latest wins on ``key``) into the parquet
    snapshot at ``snapshot_dir``; returns the snapshot path. Creates the
    snapshot if absent.

    If ``version_col`` is given, duplicate keys WITHIN the updates batch
    keep the highest version (CDC batches routinely carry several
    changes per key); without it, duplicate update keys raise — silently
    writing both would break the one-row-per-key contract.
    """
    old = snapshot_dir.rstrip("/") + ".old"
    # crash recovery: a previous call that died mid-swap left the data
    # in .old and no live snapshot — restore it before merging
    if not os.path.isdir(snapshot_dir) and _has_parquet(old):
        os.rename(old, snapshot_dir)
    elif os.path.isdir(old):
        shutil.rmtree(old)  # stale leftover from a completed swap

    if version_col is not None:
        w = Window.partitionBy(key).orderBy(F.col(version_col).desc())
        updates = (
            updates.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        dup = (
            updates.groupBy(key)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "updates batch has duplicate keys; pass version_col to "
                "resolve latest-wins inside the batch"
            )

    staging = scratch_dir("upsert_")
    try:
        out = os.path.join(staging, "snapshot")
        if _has_parquet(snapshot_dir):
            current = spark.read.parquet(snapshot_dir)
            kept = current.join(
                updates.select(key).distinct(), on=key, how="left_anti"
            )
            merged = kept.unionByName(updates)
        else:
            merged = updates
        writer = merged.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        # swap: old snapshot aside, new one in, then drop the old
        if os.path.isdir(snapshot_dir):
            os.rename(snapshot_dir, old)
        shutil.move(out, snapshot_dir)
        if os.path.isdir(old):
            shutil.rmtree(old)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return snapshot_dir
