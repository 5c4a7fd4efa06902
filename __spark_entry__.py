"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship Pipeline-A roster normalization
(SURVEY.md §7 M1) at sf0.001. ``queries()`` / ``oracle_sql()`` re-export the
engine's central registry (one entry per implemented operator from
SURVEY.md §2, each with a DuckDB oracle built from the same constants as
the Spark expressions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_moodle_and_mass_email_sending_spark import registry
from etl_moodle_and_mass_email_sending_spark.plans import moodle

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return moodle.roster_from_customer(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
