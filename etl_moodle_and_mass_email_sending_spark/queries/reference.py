"""[REF] queries — reference-parity operators (SURVEY.md §2) exercised over
the testbed tables so the DuckDB oracle can check them row-for-row."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import text
from ..plans import moodle
from ..registry import register

# --------------------------------------------------------------------------
# ref_roster_normalize — flagship: full Pipeline-A derivation (F-str1..11,
# P3/P5/P6) over synthesized participants. Reference app.py:225–274.
# --------------------------------------------------------------------------

register(
    "ref_roster_normalize",
    lambda spark, sf_dir: moodle.roster_from_customer(spark, sf_dir),
    moodle.roster_sql(),
)

# --------------------------------------------------------------------------
# ref_roster_segments — roster + group-by: distinct usernames per market
# segment (A1 counts over the derived frame).
# --------------------------------------------------------------------------


def _roster_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    roster = moodle.roster_from_customer(spark, sf_dir).select(
        "c_custkey", "username"
    )
    return (
        roster.join(customer, "c_custkey")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.countDistinct("username").cast("bigint").alias("n_usernames"),
        )
    )


register(
    "ref_roster_segments",
    _roster_segments,
    f"""
    WITH roster AS ({moodle.roster_sql()})
    SELECT c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(DISTINCT username) AS BIGINT) AS n_usernames
    FROM roster JOIN customer USING (c_custkey)
    GROUP BY c_mktsegment
    """,
)

# --------------------------------------------------------------------------
# ref_pick_email — F-str4 email token selection over adversarial synthetic
# cells (multi-token, no-@ fallback). Reference app.py:190–198.
# --------------------------------------------------------------------------


def _pick_email(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    local = F.lower(F.regexp_replace(F.col("c_name"), "#", ""))
    raw = (
        F.when(F.col("c_custkey") % 4 == 0,
               F.concat(F.lit("sin-arroba "), local))
        .when(F.col("c_custkey") % 4 == 1,
              F.concat(F.lit("a: "), local, F.lit("@x.cl;"), local, F.lit("@y.cl")))
        .when(F.col("c_custkey") % 4 == 2,
              F.concat(local, F.lit("@z.cl\nsegunda linea")))
        .otherwise(F.concat(F.lit("  "), local, F.lit("@w.cl  ")))
    )
    return customer.select(
        F.col("c_custkey"),
        raw.alias("raw_email"),
        text.pick_email(raw).alias("picked"),
    )


_PICK_RAW_SQL = """
    CASE
      WHEN c_custkey % 4 = 0 THEN 'sin-arroba ' || lower(replace(c_name, '#', ''))
      WHEN c_custkey % 4 = 1 THEN 'a: ' || lower(replace(c_name, '#', '')) || '@x.cl;' || lower(replace(c_name, '#', '')) || '@y.cl'
      WHEN c_custkey % 4 = 2 THEN lower(replace(c_name, '#', '')) || '@z.cl' || chr(10) || 'segunda linea'
      ELSE '  ' || lower(replace(c_name, '#', '')) || '@w.cl  '
    END
"""

register(
    "ref_pick_email",
    _pick_email,
    f"""
    WITH t AS (SELECT c_custkey, {_PICK_RAW_SQL} AS raw_email FROM customer)
    SELECT c_custkey, raw_email, {text.sql_pick_email('raw_email')} AS picked
    FROM t
    """,
)
