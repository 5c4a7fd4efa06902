"""Registered streaming queries (M6) + the batch sessionization twin.

The two ``stream_*`` entries replay the events parquet through a real
Structured Streaming plan (availableNow) and return the memory-sink table
— genuinely non-SQL-expressible incremental execution, so they register
WITHOUT an oracle (the driver's weaker rows-only check; SURVEY.md §5.2).
``rel_sessionize`` is the batch twin of the stateful session operator —
gaps-and-islands over window functions — with an exact DuckDB oracle, so
the session *semantics* still hash-gate.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..streaming import windows as sw

GAP_SECONDS = 1800


def rel_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap-based sessions (30 min), batch form: a break flag via
    lag(), a running sum to number islands, then one aggregation. Two
    window passes + one groupBy, all on the same user_id partitioning —
    a single shuffle at scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", F.coalesce("value", F.lit(0.0)).alias("value")
    )
    byu = Window.partitionBy("user_id").orderBy("ts")
    marked = ev.withColumn(
        "brk",
        F.when(
            F.lag("ts").over(byu).isNull()
            | (
                F.col("ts").cast("double")
                - F.lag("ts").over(byu).cast("double")
                > GAP_SECONDS
            ),
            1,
        ).otherwise(0),
    )
    grp = marked.withColumn(
        "g", F.sum("brk").over(byu.rowsBetween(Window.unboundedPreceding, 0))
    )
    return grp.groupBy("user_id", "g").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    ).drop("g")


REL_SESSIONIZE_SQL = """
WITH base AS (
  -- ns→µs truncation BEFORE the window math, matching the engine's
  -- `ts DIV 1000` read path (testbed timestamps are not micro-aligned)
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, coalesce(value, 0) AS value
  FROM events
), marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), grp AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS g
  FROM marked
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM grp GROUP BY user_id, g
"""


def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window rollup executed as a real stream."""
    ev = sw.stream_events(spark, sf_dir)
    agg = sw.windowed_event_counts(ev, "1 hour", "2 hours")
    name = f"swc_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix="ck_swc_")
    return sw.run_to_memory_sink(agg, name, ck)


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful sessionization (applyInPandasWithState) as a real stream."""
    ev = sw.stream_events(spark, sf_dir)
    sess = sw.sessionize(ev, gap_seconds=GAP_SECONDS)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix="ck_sess_")
    return sw.run_to_memory_sink(sess, name, ck)


register("rel_sessionize", rel_sessionize, REL_SESSIONIZE_SQL)
register("stream_windowed_counts", stream_windowed_counts, None)
register("stream_sessionize", stream_sessionize, None)


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join executed as a real stream
    (batch twin with exact oracle: rel_range_join)."""
    from ..streaming import joins

    ev = sw.stream_events(spark, sf_dir)
    joined = joins.clicks_errors_interval_join(ev)
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix="ck_ssj_")
    return sw.run_to_memory_sink(joined, name, ck)


register("stream_interval_join", stream_interval_join, None)
