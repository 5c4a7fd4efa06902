"""Data-quality validation — declarative rule → violation counts in ONE
scan.

[EXT] ingest-gate operator (what dbt tests / Deequ constraints do): each
rule is a boolean Column that must hold per row; the report counts
violations per rule. All rules evaluate in a single aggregation pass —
``sum(CASE WHEN NOT rule THEN 1 END)`` per rule, then an unpivot — so
adding rules never adds scans (at 100 TB the scan IS the cost; N rules ×
1 scan, not N scans).

Null semantics: a NULL rule result counts as a violation (unknown is not
a pass) — hence ``NOT coalesce(rule, false)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, n_violations, n_rows) per rule, computed in one pass."""
    aggs = [
        F.sum(
            F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)
        ).alias(name)
        for name, cond in rules.items()
    ] + [F.count("*").alias("_n")]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', `{n}`" for n in rules)
    return wide.select(
        F.expr(f"stack({len(rules)}, {stack}) as (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    ).select(
        "rule",
        F.col("n_violations").cast("bigint").alias("n_violations"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


def sql_validate(table_sql: str, rules: dict[str, str]) -> str:
    """DuckDB twin: same single-pass aggregate, unpivoted via UNION ALL
    over the one aggregated row (still one scan of the base table)."""
    aggs = ", ".join(
        f"sum(CASE WHEN NOT coalesce({cond}, false) THEN 1 ELSE 0 END) AS \"{name}\""
        for name, cond in rules.items()
    )
    arms = " UNION ALL ".join(
        f"SELECT '{name}' AS rule, CAST(\"{name}\" AS BIGINT) AS n_violations, "
        f"CAST(_n AS BIGINT) AS n_rows FROM wide"
        for name in rules
    )
    return f"""
    WITH wide AS (SELECT {aggs}, count(*) AS _n FROM ({table_sql}))
    {arms}
    """
