"""Testbed table catalog: parquet tables under a scale-factor directory.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) in parquet, which Spark rejects by
        # default (PARQUET_TYPE_ILLEGAL).  Set the legacy conf HERE — not only
        # in session.py — so load_table works in ANY SparkSession (the driver
        # builds its own vanilla session).  Runtime-settable; verified to take
        # effect before the read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) in parquet; with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as bigint nanos.
        # Integer division truncates ns→µs.  NOTE: testbed timestamps are NOT
        # micro-aligned, so any oracle SQL that outputs a raw ts must wrap it
        # in CAST(ts AS TIMESTAMP) so DuckDB truncates to µs identically.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            # an event log rewritten by another engine (e.g. DuckDB COPY)
            # lands as µs TIMESTAMP_NTZ; normalize to the session-zone
            # TIMESTAMP every downstream operator expects
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(
    spark: SparkSession, sf_dir: str, *names: str
) -> None:
    """Register the catalog tables as temp views so ad-hoc
    ``spark.sql(...)`` works against the same normalized frames every
    operator consumes (events keeps the ns→µs read-path treatment —
    a raw ``spark.read.parquet`` view would diverge on ts). Views are
    lazy: registering all ten costs only the parquet footer reads."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
