"""K2–K5 — SMTP delivery sink with retry, throttle, receipts, dry-run and
an idempotence ledger (reference ``send_all`` app.py:328–377; SURVEY.md
§2.2 and §4.1 fault-tolerance note).

Differences from the reference, by design:
- **Receipts are data, not log lines** (K5): the sink returns a DataFrame
  ``(idx, email, status, attempts, error, remaining)`` (FIXTURES.md §4)
  instead of UI callbacks.
- **Partition-parallel** (K2): one SMTP connection per partition (the
  reference holds one global connection, app.py:335–337). The global rate
  budget is divided across partitions: ``throttle_seconds`` is per-row
  within a partition, so global rate ≈ partitions / throttle.
- **Idempotence ledger** (§4.1): pass ``already_sent`` (a 1-column frame of
  emails) to make re-runs effectively-once — Spark task retry alone would
  resend a partially-sent partition.
- **Dry-run** (reference's confirmation gate app.py:1004–1009 becomes an
  explicit flag): renders and accounts everything, opens no connection.

The per-row Python here is inherent — SMTP is a side-effecting I/O sink,
not a transformation; throughput is connection-bound, not CPU-bound.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RECEIPT_SCHEMA = StructType(
    [
        StructField("idx", LongType()),
        StructField("email", StringType()),
        StructField("status", StringType()),
        StructField("attempts", IntegerType()),
        StructField("error", StringType()),
    ]
)


@dataclass(frozen=True)
class SmtpConfig:
    """Connection + policy knobs (reference defaults app.py:41–45)."""

    host: str = "smtp.example.com"
    port: int = 465
    sender: str = "sender@example.com"
    password: str = ""
    max_retries: int = 3  # reference MAX_RETRIES, app.py:45
    backoff_base_seconds: float = 2.0  # sleep(2*attempt), app.py:364–372
    throttle_seconds: float = 0.0  # reference THROTTLE_SECONDS=1.0, app.py:44
    dry_run: bool = True


def _send_partition_factory(
    cfg: SmtpConfig,
    fail_spec: dict[str, int] | None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Build the mapInPandas worker. ``fail_spec`` injects failures for
    tests: email → number of failing attempts (-1 = always fail). Plain
    data, so it pickles cleanly to executors."""

    def fail_hook(email: str, attempt: int) -> bool:
        if not fail_spec or email not in fail_spec:
            return False
        n = fail_spec[email]
        return n < 0 or attempt <= n

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        conn = None
        try:
            if not cfg.dry_run:
                import smtplib

                conn = smtplib.SMTP_SSL(cfg.host, cfg.port)
                conn.login(cfg.sender, cfg.password)
            for pdf in batches:
                out = []
                for row in pdf.itertuples(index=False):
                    status, attempts, error = "SENT", 0, None
                    for attempt in range(1, cfg.max_retries + 1):
                        attempts = attempt
                        try:
                            if fail_hook(row.email, attempt):
                                raise RuntimeError("injected failure")
                            if conn is not None:
                                msg = _build_message(cfg.sender, row)
                                conn.send_message(msg)
                            break
                        except Exception as exc:  # noqa: BLE001
                            error = str(exc)
                            if attempt == cfg.max_retries:
                                status = "FAILED"
                            else:
                                # linear backoff 2s,4s (reference app.py:370)
                                time.sleep(
                                    cfg.backoff_base_seconds * attempt
                                    if not cfg.dry_run
                                    else 0.0
                                )
                    if status == "SENT":
                        error = None
                    out.append(
                        (int(row.idx), row.email, status, attempts, error)
                    )
                    # gated on dry_run like the backoff sleep: a dry run
                    # opens no connection, so pacing it is pure waste
                    if cfg.throttle_seconds > 0 and not cfg.dry_run:
                        time.sleep(cfg.throttle_seconds)
                yield pd.DataFrame(
                    out, columns=["idx", "email", "status", "attempts", "error"]
                )
        finally:
            if conn is not None:
                conn.quit()

    return run


def _build_message(sender: str, row):  # type: ignore[no-untyped-def]
    """Multipart MIME assembly (reference ``build_message`` app.py:318–325)."""
    from email.message import EmailMessage

    msg = EmailMessage()
    msg["Subject"] = row.subject
    msg["From"] = sender
    msg["To"] = row.email
    msg.set_content(row.plain)
    msg.add_alternative(row.html, subtype="html")
    return msg


def _stamp_index_two_pass(
    messages: DataFrame, order_by: str, num_partitions: int
) -> DataFrame:
    """Global 1-based send order WITHOUT a single-task sort: range-partition
    on the order key, then idx = (sum of earlier partitions' counts) +
    per-partition row_number. The offsets frame is one row per partition —
    broadcast — so the only data-sized operations are the range shuffle and
    a partition-local sort (the two-pass zipWithIndex pattern, same as the
    header-promotion path in sources/excel.py)."""
    # localCheckpoint: counts and the stamp join both consume `ranged`;
    # the barrier guarantees ONE evaluation of the range shuffle, so the
    # sampled partition boundaries (and thus _pid) cannot diverge between
    # the two jobs.
    ranged = (
        messages.repartitionByRange(num_partitions, F.col(order_by))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    from ..operators.util import prefix_offsets

    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_v"))
    # broadcast triangular self-join over the |partitions|-row carry
    # frame — no WindowExec node (round 13, VERDICT r12 item 6)
    offsets = prefix_offsets(counts, "sum")
    wlocal = Window.partitionBy("_pid").orderBy(F.col(order_by))
    return (
        ranged.withColumn("_local", F.row_number().over(wlocal))
        .join(F.broadcast(offsets), on="_pid")
        .withColumn("idx", (F.col("_off") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_off")
    )


def send_all(
    messages: DataFrame,
    cfg: SmtpConfig = SmtpConfig(),
    order_by: str = "email",
    already_sent: DataFrame | None = None,
    num_partitions: int | None = None,
    fail_spec: dict[str, int] | None = None,
) -> DataFrame:
    """Deliver rendered messages; return the receipt DataFrame.

    ``messages`` needs columns email/subject/plain/html. ``order_by`` makes
    the reference's input-order counter (A2, app.py:338–339) explicit — a
    partitioned source has no inherent order. Receipts carry
    ``remaining = total - idx`` (countdown, app.py:339).
    """
    if already_sent is not None:
        messages = messages.join(
            already_sent.select(F.col(already_sent.columns[0]).alias("email")),
            on="email",
            how="left_anti",
        )
    if num_partitions and num_partitions > 1:
        stamped = _stamp_index_two_pass(messages, order_by, num_partitions)
    else:
        # single-task global sort: fine for roster-scale parity runs; pass
        # num_partitions>1 for the distributed two-pass stamp
        w = Window.orderBy(F.col(order_by))
        stamped = messages.withColumn("idx", F.row_number().over(w))
    receipts = stamped.mapInPandas(
        _send_partition_factory(cfg, fail_spec), RECEIPT_SCHEMA
    )
    if num_partitions and num_partitions > 1:
        # countdown total via a broadcast 1-row aggregate over the STAMPED
        # frame (side-effect-free: the send lives in `receipts`, and the
        # stamp recomputes cheaply over the checkpointed range shuffle) —
        # an unpartitioned window max here would funnel every receipt row
        # through one task, the same bottleneck the two-pass stamp removed
        total_df = stamped.agg(F.max("idx").alias("_total"))
        return (
            receipts.crossJoin(F.broadcast(total_df))
            .withColumn(
                "remaining", (F.col("_total") - F.col("idx")).cast("long")
            )
            .drop("_total")
        )
    total = F.max("idx").over(Window.partitionBy())
    return receipts.withColumn(
        "remaining", (total - F.col("idx")).cast("long")
    )
