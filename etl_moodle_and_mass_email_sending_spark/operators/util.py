"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Round-robin repartition to cluster parallelism before a heavy
    per-row expression stage.

    Higher-order-function lambdas (transform/filter/aggregate) run OUTSIDE
    whole-stage codegen — interpreted, per element — so for
    shingle/minhash/gram/chunk fan-outs the per-row CPU dwarfs the scan.
    The testbed's single-file parquet scans give 1-3 input partitions,
    pinning that work to 1-3 of 32 cores; on a real cluster the scan is
    already thousands of splits and this exchange is a cheap rebalance of
    raw rows. Measured at sf0.1: minhash_lsh_pairs 1.38→0.92 s,
    chunk_documents 1.07→0.41 s, decontaminate gram stage 5.7→0.36 s.

    Use ONLY before genuinely heavy per-row stages: for cheap codegen'd
    expressions the exchange costs more than it buys. (The old example
    here — fingerprints — stopped being cheap when the rolling hash
    added a second interpreted md5 pass; round 5 re-measured it at
    0.73 s → 0.20 s WITH the spread and switched it over.)
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
