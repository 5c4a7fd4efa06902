"""Portable deterministic hashing — identical results in Spark and DuckDB.

Spark's ``hash()``/``xxhash64()`` and DuckDB's ``hash()`` use different
algorithms, so cross-engine-checkable sketches (MinHash, SimHash, document
fingerprints) are built on md5, which both engines implement identically:

    hash32(s)        = int(md5(s)[0:8], 16)          ∈ [0, 2^32)
    hash32(s, seed)  = int(md5(seed || '§' || s)[0:8], 16)

Fits comfortably in a signed 64-bit integer on both sides, so no
signedness traps. md5 is ~2× slower than xxhash but still JVM-side and
codegen'd; at 100 TB the scan dominates, not the hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEED_SEP = "§"  # separator unlikely to appear in tokens


def hash32(col: Column, seed: int | None = None) -> Column:
    """Deterministic 32-bit hash (as bigint) of a string column."""
    s = col.cast("string")
    if seed is not None:
        s = F.concat(F.lit(f"{seed}{SEED_SEP}"), s)
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def sql_hash32(expr: str, seed: int | None = None) -> str:
    """DuckDB twin of :func:`hash32`."""
    s = f"CAST({expr} AS VARCHAR)"
    if seed is not None:
        s = f"('{seed}{SEED_SEP}' || {s})"
    return f"CAST('0x' || substr(md5({s}), 1, 8) AS BIGINT)"


def hash32_expr_lambda(seed: int) -> str:
    """Spark SQL-expression fragment for use inside higher-order lambdas
    (``transform(arr, t -> ...)``), parameterized over variable ``t``."""
    return (
        f"cast(conv(substring(md5(concat('{seed}{SEED_SEP}', t)), 1, 8), 16, 10) "
        "as bigint)"
    )


def sql_hash32_lambda(seed: int, var: str = "t") -> str:
    """DuckDB lambda-body twin of :func:`hash32_expr_lambda`."""
    return f"CAST('0x' || substr(md5('{seed}{SEED_SEP}' || {var}), 1, 8) AS BIGINT)"
