"""Partitioned parquet sink with small-files control.

At 100 TB the dominant sink failure mode is the small-files problem: a
`partitionBy` write fans each task out across every partition value it
holds, producing tasks × partitions tiny files that throttle the next
job's scan (file-open overhead, footer reads, scheduler pressure).

Fix encoded here: repartition ON the partition columns first, so each
partition value lands in a bounded number of tasks (``files_per_partition``
controls the fan-out via a deterministic salt — the per-key file count,
NOT the global shuffle width; AQE further coalesces tiny shuffle outputs).
Target ~100 MB–1 GB per file at production scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    files_per_partition: int = 1,
) -> None:
    """Write parquet partitioned by ``partition_by`` with at most
    ``files_per_partition`` data files per partition directory."""
    if files_per_partition == 1:
        shaped = df.repartition(*[F.col(c) for c in partition_by])
    else:
        # Salt from every NON-partition column: salting from a column that
        # is (or determines) a partition column collapses to one salt value
        # per partition and silently kills the fan-out.
        salt_src = [c for c in df.columns if c not in partition_by]
        if not salt_src:
            salt_src = list(df.columns)
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in salt_src]),
            F.lit(files_per_partition),
        )
        shaped = df.repartition(
            *[F.col(c) for c in partition_by], salt.alias("_salt")
        )
    (
        shaped.write.mode("overwrite")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def read_partition_pruned(spark, path: str, **eq_filters: object):
    """Read the partitioned table with equality filters on partition
    columns — expressed declaratively so Catalyst turns them into
    `PartitionFilters` (directory-level pruning: the non-matching
    partition directories are never opened, zero I/O on them)."""
    df = spark.read.parquet(path)
    for col, val in eq_filters.items():
        df = df.filter(df[col] == val)
    return df
