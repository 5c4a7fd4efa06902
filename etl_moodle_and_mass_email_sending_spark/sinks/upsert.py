"""Merge-upsert sink: latest-wins MERGE of an updates batch into a
parquet snapshot directory, by full rewrite.

[EXT] the pattern behind Delta/Iceberg MERGE INTO, expressed on plain
parquet: read the current snapshot, anti-join it against the update
keys (rows NOT being replaced), union the updates, and write a NEW
snapshot directory — then atomically repoint (here: directory swap;
a table format would commit a new manifest instead).

Scale notes: the anti-join shuffles on the merge key, which is the
unavoidable cost of key-level reconciliation without a table format's
file-level pruning; a real deployment partitions the snapshot so only
partitions containing update keys rewrite (merge_upsert takes the same
`partition_by` the partitioned sink uses). The swap-then-delete keeps
readers of the OLD path consistent during the rewrite (no in-place
mutation of files a concurrent scan may hold open).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def merge_upsert(
    spark: SparkSession,
    snapshot_dir: str,
    updates: DataFrame,
    key: str,
    partition_by: list[str] | None = None,
) -> str:
    """Merge ``updates`` (latest wins on ``key``) into the parquet
    snapshot at ``snapshot_dir``; returns the snapshot path. Creates the
    snapshot if absent."""
    staging = tempfile.mkdtemp(prefix="upsert_")
    out = os.path.join(staging, "snapshot")
    if os.path.isdir(snapshot_dir) and any(
        f.endswith(".parquet")
        for _, _, fs in os.walk(snapshot_dir)
        for f in fs
    ):
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
    # swap: move the new snapshot in, drop the old one afterwards
    old = snapshot_dir.rstrip("/") + ".old"
    if os.path.isdir(snapshot_dir):
        os.rename(snapshot_dir, old)
    shutil.move(out, snapshot_dir)
    if os.path.isdir(old):
        shutil.rmtree(old)
    return snapshot_dir
