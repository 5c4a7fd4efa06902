"""Bucketed-table sink — the shuffle-elimination tool for repeated
co-located joins (build brief: "bucketing for co-located joins").

A join between two tables bucketed (and sorted) by the join key into the
same bucket count compiles to a SortMergeJoin with NO Exchange on either
side: the shuffle was paid once at write time and amortizes over every
subsequent join/aggregation on that key. This is the canonical way to kill
the orders⨝lineitem shuffle at 100 TB (SCALE.md rel_q3 note).

Spark's bucketing rides the session catalog (``saveAsTable``) — plain
``.parquet(path)`` writes can't carry bucket metadata. Bucket count is a
capacity knob: target ~100-200 MB per bucket file at production scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed parquet table bucketed by ``key``.
    ``sort=True`` additionally sorts within buckets so joins skip the sort
    phase of SortMergeJoin."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        buckets, key
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def joins_without_exchange(
    spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str
) -> bool:
    """True iff joining the two bucketed tables plans with zero SHUFFLE
    exchanges — the verification hook for bucket co-location. The merge
    hint pins SortMergeJoin (on dim-sized test data the planner would
    otherwise pick broadcast and skip bucketed scans entirely; at fact ⨝
    fact scale SMJ is what it picks anyway)."""
    l = spark.table(left_table)
    r = spark.table(right_table)
    joined = l.hint("merge").join(r, l[key_l] == r[key_r])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
