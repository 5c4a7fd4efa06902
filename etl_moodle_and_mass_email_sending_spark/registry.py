"""Central query registry: every implemented operator's (Spark query,
DuckDB oracle SQL) pair, consumed by ``__spark_entry__.py`` and by
``tests/test_oracle_parity.py`` (a local mirror of the driver's t2 gate).

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names match the oracle SQL's aliases exactly (driver hashes sort
columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _QUERIES:
        raise KeyError(f"duplicate query name {name!r}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_loaded = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    from . import queries as _q  # noqa: F401  (side-effect registration)

    _loaded = True
