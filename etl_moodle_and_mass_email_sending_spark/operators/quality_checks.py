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


# --------------------------------------------------------------------------
# k-anonymity audit — the privacy counterpart to the Benford screen:
# group rows by their quasi-identifier tuple and report, for each k
# threshold, how many equivalence classes (and member rows) fall below
# it — the re-identification exposure a release of this table carries
# (Sweeney 2002). One groupBy on the QI tuple, then ONE conditional-
# aggregation pass producing a literal column pair per threshold — the
# equivalence-class frame is scanned once, never replicated |K| times
# (VERDICT r5 item 6 replaced the old spine-crossJoin form). The
# per-threshold rows are unpivoted from that single 1-row aggregate
# with a |K|-element stack() — constant-size, no data motion.
# --------------------------------------------------------------------------

K_ANON_THRESHOLDS = (2, 5, 10)


def k_anonymity(df, qi_cols: list[str]):
    """(k, n_classes_below, n_rows_exposed, min_class_size): per
    threshold, equivalence classes smaller than k and the rows in
    them."""
    from pyspark.sql import functions as F

    classes = df.groupBy(*qi_cols).agg(F.count("*").alias("_sz"))
    aggs = [F.min("_sz").alias("_min_sz")]
    for k in K_ANON_THRESHOLDS:
        aggs.append(
            F.coalesce(F.sum(F.when(F.col("_sz") < k, 1)), F.lit(0))
            .cast("bigint")
            .alias(f"_nc_{k}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("_sz") < k, F.col("_sz"))), F.lit(0)
            )
            .cast("bigint")
            .alias(f"_nr_{k}")
        )
    wide = classes.agg(*aggs)  # one row, 2|K|+1 cells
    stack = ", ".join(
        f"{k}, _nc_{k}, _nr_{k}" for k in K_ANON_THRESHOLDS
    )
    return wide.selectExpr(
        f"stack({len(K_ANON_THRESHOLDS)}, {stack}) "
        "AS (k, n_classes_below, n_rows_exposed)",
        "_min_sz AS min_class_size",
    ).select(
        F.col("k").cast("int").alias("k"),
        "n_classes_below",
        "n_rows_exposed",
        "min_class_size",
    ).filter(
        # empty-input parity with the oracle (whose spine CROSS JOIN
        # classes yields 0 rows when the table is empty): the grand
        # aggregate's all-NULL min marks "no equivalence classes at
        # all" — drop those rows instead of emitting |K| zero rows
        F.col("min_class_size").isNotNull()
    )


def sql_k_anonymity(table_sql: str, qi_cols: list[str]) -> str:
    qi = ", ".join(qi_cols)
    ks = ", ".join(str(k) for k in K_ANON_THRESHOLDS)
    return f"""
    WITH classes AS (
      SELECT {qi}, count(*) AS sz FROM ({table_sql}) GROUP BY {qi}
    ),
    spine AS (SELECT CAST(unnest([{ks}]) AS INTEGER) AS k)
    SELECT k,
           CAST(coalesce(sum(CASE WHEN sz < k THEN 1 END), 0) AS BIGINT)
             AS n_classes_below,
           CAST(coalesce(sum(CASE WHEN sz < k THEN sz END), 0) AS BIGINT)
             AS n_rows_exposed,
           min(sz) AS min_class_size
    FROM spine CROSS JOIN classes
    GROUP BY k
    """


# --------------------------------------------------------------------------
# PSI drift check — population stability index between two cohorts of
# the same column (the standard model/data drift monitor): 10
# equal-width bins over the global [min, max], per-bin shares p (cohort
# A) and q (cohort B), psi_term = (p − q)·ln(p/q) with the
# conventional 1e-4 floor for empty bins. Σ psi_term < 0.1 is the
# usual "no drift" reading. One scan for the global extremes
# (broadcast back), one binned rollup per cohort. ln is IEEE-stable
# across both engines (the certified unigram-LM operators already
# hash-gate on it).
# --------------------------------------------------------------------------

PSI_BINS = 10
PSI_FLOOR = 1e-4


def psi_drift(df, value_col: str, cohort_col):
    """(bin, n_a, n_b, p_a, p_b, psi_term): drift of ``value_col``
    between cohort 0 and cohort 1 (``cohort_col`` expression in
    {0,1})."""
    from pyspark.sql import functions as F

    src = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("_v"), cohort_col.alias("_c")
    )
    ext = src.agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi")
    )
    binned = src.crossJoin(F.broadcast(ext)).select(
        "_c",
        F.least(
            F.lit(PSI_BINS - 1),
            F.floor(
                (F.col("_v") - F.col("_lo"))
                / ((F.col("_hi") - F.col("_lo")) / F.lit(PSI_BINS))
            ),
        )
        .cast("int")
        .alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.coalesce(F.sum(F.when(F.col("_c") == 0, 1)), F.lit(0))
        .cast("bigint")
        .alias("n_a"),
        F.coalesce(F.sum(F.when(F.col("_c") == 1, 1)), F.lit(0))
        .cast("bigint")
        .alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").alias("_ta"), F.sum("n_b").alias("_tb")
    )
    p = F.greatest(F.col("n_a") / F.col("_ta"), F.lit(PSI_FLOOR))
    q = F.greatest(F.col("n_b") / F.col("_tb"), F.lit(PSI_FLOOR))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bin", "n_a", "n_b",
            F.round(F.col("n_a") / F.col("_ta"), 6).alias("p_a"),
            F.round(F.col("n_b") / F.col("_tb"), 6).alias("p_b"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
    )


def sql_psi_drift(
    table_sql: str, value_col: str, cohort_sql: str
) -> str:
    return f"""
    WITH src AS (
      SELECT {value_col} AS v, {cohort_sql} AS c FROM ({table_sql})
      WHERE {value_col} IS NOT NULL
    ),
    ext AS (SELECT min(v) AS lo, max(v) AS hi FROM src),
    binned AS (
      SELECT c,
             CAST(least({PSI_BINS - 1},
                  floor((v - lo) / ((hi - lo) / {PSI_BINS})))
                  AS INTEGER) AS bin
      FROM src CROSS JOIN ext
    ),
    counts AS (
      SELECT bin,
             CAST(coalesce(sum(CASE WHEN c = 0 THEN 1 END), 0) AS BIGINT)
               AS n_a,
             CAST(coalesce(sum(CASE WHEN c = 1 THEN 1 END), 0) AS BIGINT)
               AS n_b
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM counts)
    SELECT bin, n_a, n_b,
           round(CAST(n_a AS DOUBLE) / ta, 6) AS p_a,
           round(CAST(n_b AS DOUBLE) / tb, 6) AS p_b,
           round((greatest(CAST(n_a AS DOUBLE) / ta, {PSI_FLOOR!r})
                  - greatest(CAST(n_b AS DOUBLE) / tb, {PSI_FLOOR!r}))
                 * ln(greatest(CAST(n_a AS DOUBLE) / ta, {PSI_FLOOR!r})
                      / greatest(CAST(n_b AS DOUBLE) / tb, {PSI_FLOOR!r})),
                 6) AS psi_term
    FROM counts CROSS JOIN tot
    """
