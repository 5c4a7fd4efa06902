"""S1 Excel scan + P1 positional header promotion (reference app.py:234–238).

The reference's Excel sheets carry 3 junk rows, the real header at row
index 3, and data from row 4 — positional row addressing is part of the
data model (SURVEY.md §1.1).

Spark mapping: ``monotonically_increasing_id`` is NOT ordinally safe across
partitions, so header promotion uses ``rdd.zipWithIndex`` (stable read
order within a file scan) — acceptable because header promotion is a
per-file boundary operation on small roster files, never a 100 TB path.
Excel itself needs a third-party wheel (com.crealytics / openpyxl), which
this container doesn't ship — the Excel entry point degrades gracefully and
the same promotion logic is exercised through headerless CSV in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .readers import check_exists, read_csv_headerless


def promote_header(
    df: DataFrame, header_row: int = 3, data_start: int = 4
) -> DataFrame:
    """Row ``header_row`` becomes the column names; rows < ``data_start``
    are dropped (reference app.py:236–238).

    Duplicate/blank header cells are disambiguated as ``col``, ``col_2``…
    (pandas would error; we pick the lenient path and document it).
    """
    spark = df.sparkSession
    indexed = df.rdd.zipWithIndex()
    header_vals = (
        indexed.filter(lambda t: t[1] == header_row).map(lambda t: t[0]).first()
    )
    names: list[str] = []
    seen: dict[str, int] = {}
    for i, v in enumerate(header_vals):
        name = str(v) if v is not None and str(v).strip() else f"_c{i}"
        n = seen.get(name, 0) + 1
        seen[name] = n
        names.append(name if n == 1 else f"{name}_{n}")
    data = indexed.filter(lambda t: t[1] >= data_start).map(lambda t: t[0])
    return spark.createDataFrame(data, schema=df.schema).toDF(*names)


def read_participants_csv(
    spark: SparkSession, path: str, header_row: int = 3, data_start: int = 4
) -> DataFrame:
    """Header-displaced participants sheet exported as CSV → promoted frame."""
    return promote_header(
        read_csv_headerless(spark, path), header_row, data_start
    )


def read_participants_excel(
    spark: SparkSession, path: str, header_row: int = 3, data_start: int = 4
) -> DataFrame:
    """S1: Excel participants sheet (sheet 0) → promoted frame.

    Uses a driver-side pandas read (Arrow-accelerated createDataFrame) when
    an Excel engine is importable; raises a clear error otherwise.
    """
    check_exists(path)
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=0, header=None, dtype=str)
    except ImportError as exc:  # openpyxl/xlrd missing
        raise NotImplementedError(
            "no Excel engine available in this environment; export the sheet "
            "to CSV and use read_participants_csv"
        ) from exc
    df = spark.createDataFrame(pdf.where(pdf.notna(), None))
    return promote_header(df, header_row, data_start)


RENAME_MAP = {
    # Messy source headers → canonical names (reference app.py:240–245;
    # note the trailing space in "Nombres " is in the real data).
    "Rut (con punto y con guión)": "rut",
    "Nombres ": "nombres",
    "Apellidos": "apellidos",
    "Correo electrónico": "email",
}


def rename_participant_columns(df: DataFrame) -> DataFrame:
    """P2 column rename with the reference's exact header map."""
    present = {k: v for k, v in RENAME_MAP.items() if k in df.columns}
    return df.withColumnsRenamed(present)
