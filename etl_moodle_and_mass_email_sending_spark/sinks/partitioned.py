"""[EXT] Hive-style partitioned parquet layout — the table layout that
makes partition PRUNING possible: a query filtering on the partition
column never opens the other partitions' files (the scan's
`PartitionFilters` handle it before any I/O), which at 100 TB is the
difference between scanning one day and scanning a year.

The write side is the standard `partitionBy` directory layout
(`lang=en/part-*.parquet`, …); `repartition` on the partition columns
first so each partition directory is written by the tasks owning that
key — without it every task writes a file into every partition
directory (the small-files explosion: tasks × partitions files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a Hive-partitioned parquet table at ``path``."""
    df.repartition(*partition_cols).write.partitionBy(
        *partition_cols
    ).mode(mode).parquet(path)


def read_partition_pruned(
    spark: SparkSession, path: str, **eq_filters: object
) -> DataFrame:
    """Read the partitioned table with equality filters on partition
    columns — expressed declaratively so Catalyst turns them into
    `PartitionFilters` (directory-level pruning, zero I/O on the rest)."""
    df = spark.read.parquet(path)
    for col, val in eq_filters.items():
        df = df.filter(df[col] == val)
    return df
