"""Stream-stream interval join — watermarked join of two live streams.

[EXT] completes the Structured Streaming surface (send stream: M6;
windowed agg + sessionization: windows.py): correlate two UNBOUNDED
inputs — each click with the same user's errors within the following
5 minutes — where neither side can be staged as a static table.

State design (what makes this safe on an unbounded stream): both sides
are watermarked and the join condition bounds the event-time distance, so
Spark can evict buffered rows once the other side's watermark passes
``ts + interval`` — state is O(rate × interval), not O(stream length).
An unbounded-condition stream-stream join would grow state forever and is
the #1 streaming-join production mistake; the time-bound predicate here is
load-bearing, not decoration.

The batch twin of this exact semantics is ``rel_range_join`` (oracle-
gated); the streaming form is verified in tests as emitted ⊆ batch-result
with near-total coverage (late-beyond-watermark rows legitimately drop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INTERVAL_S = 300


def clicks_errors_interval_join(
    events: DataFrame,
    interval_seconds: int = INTERVAL_S,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """(click_id, user_id, click_ts, error_id, error_ts): each click
    paired with the same user's errors in [click_ts, click_ts+interval]."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark_delay)
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", watermark_delay)
    )
    return clicks.join(
        errors,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") >= F.col("click_ts"))
        & (
            F.col("error_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {interval_seconds} SECOND")
        ),
    ).select(
        "click_id",
        F.col("c_user").alias("user_id"),
        "click_ts",
        "error_id",
        "error_ts",
    )
