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


# --------------------------------------------------------------------------
# Benford first-digit audit — the classic anomaly screen for amount
# columns (naturally-arising multiplicative quantities follow
# P(d) = log10(1 + 1/d); fabricated or truncated data usually doesn't).
# One scan + one 9-group rollup; the digit spine left-join keeps all
# nine rows even when a digit never occurs. First significant digit is
# taken from the STRING form (first [1-9] of the decimal rendering) —
# floor(log10(x)) arithmetic can disagree across engines on exact
# powers of ten, the string route cannot.
# --------------------------------------------------------------------------

import math


def benford_check(df, value_col: str):
    """(digit, n_obs, obs_freq, exp_freq, chi2_term): observed vs
    Benford-expected first-significant-digit distribution of a positive
    amount column, with per-digit chi-square contributions."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    digit = F.regexp_extract(
        F.col(value_col).cast("string"), "[1-9]", 0
    ).cast("int")
    obs = (
        df.filter(F.col(value_col) > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
    )
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    exp_freq = F.expr(
        "CASE digit "
        + " ".join(
            f"WHEN {d} THEN CAST({math.log10(1 + 1 / d)!r} AS DOUBLE)"
            for d in range(1, 10)
        )
        + " END"
    )
    total = df.filter(F.col(value_col) > 0).agg(
        F.count("*").alias("_total")
    )
    return (
        spine.join(obs, on="digit", how="left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
            F.round(
                F.coalesce("n_obs", F.lit(0)) / F.col("_total"), 6
            ).alias("obs_freq"),
            F.round(exp_freq, 6).alias("exp_freq"),
            F.round(
                F.pow(
                    F.coalesce("n_obs", F.lit(0))
                    - exp_freq * F.col("_total"),
                    2,
                )
                / (exp_freq * F.col("_total")),
                6,
            ).alias("chi2_term"),
        )
    )


def sql_benford_check(table_sql: str, value_col: str) -> str:
    exp_case = (
        "CASE digit "
        + " ".join(
            f"WHEN {d} THEN CAST({math.log10(1 + 1 / d)!r} AS DOUBLE)"
            for d in range(1, 10)
        )
        + " END"
    )
    return f"""
    WITH src AS (
      SELECT * FROM ({table_sql}) WHERE {value_col} > 0
    ),
    obs AS (
      SELECT CAST(regexp_extract(CAST({value_col} AS VARCHAR), '[1-9]')
                  AS INTEGER) AS digit,
             count(*) AS n_obs
      FROM src GROUP BY 1
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(1, 9)) AS INTEGER) AS digit
    ),
    total AS (SELECT count(*) AS _total FROM src)
    SELECT s.digit,
           CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs,
           round(CAST(coalesce(o.n_obs, 0) AS DOUBLE) / t._total, 6)
             AS obs_freq,
           round({exp_case.replace('digit', 's.digit')}, 6) AS exp_freq,
           round(pow(coalesce(o.n_obs, 0)
                     - ({exp_case.replace('digit', 's.digit')}) * t._total, 2)
                 / (({exp_case.replace('digit', 's.digit')}) * t._total), 6)
             AS chi2_term
    FROM spine s LEFT JOIN obs o USING (digit) CROSS JOIN total t
    """
