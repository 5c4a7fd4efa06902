"""[EXT] CSV document-drop ingestion — the other wire format corpus
drops actually arrive in (exports, spreadsheet-born datasets, TSV
dumps). Twin of sources/jsonl.py with the CSV-specific hazards made
explicit:

- **Explicit schema, never inference** (same contract as JSONL: an
  inferred schema is a full extra pass at corpus scale).
- **PERMISSIVE + corrupt-record quarantine**: a row whose typed column
  fails to parse lands with the raw line in ``_corrupt_record`` and is
  rolled up under ``__corrupt__`` by the same health report.
- **multiLine is a scale hazard, and it is deliberate here**: document
  text embeds newlines, so the reader MUST run multiLine=true — which
  makes each CSV file a whole-file parse barrier (NOT block-splittable,
  unlike JSONL). The 100 TB guidance in the module is: re-chunk CSV
  drops into many small files upstream, or convert to JSONL; this
  reader exists because drops arrive as CSV whether we like it or not.
- RFC4180-style quoting pinned on BOTH writer and reader
  (quote='"', escape='"') so embedded quotes/newlines round-trip.
- **Column pruning prunes corruption detection too** (the dark corner
  this module pins in tests/test_sources.py): Spark's CSV reader only
  parses the columns the query references, so a type failure in an
  unreferenced column NEVER fires ``_corrupt_record`` — a rollup that
  selects only (source, _corrupt_record) silently passes rows whose
  doc_id is garbage. The health report therefore references a typed
  numeric column (n_chars) so the parse actually exercises it; an
  ingest gate wanting full-row validation must reference every column
  (or disable spark.sql.csv.parser.columnPruning.enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .jsonl import CORRUPT_SOURCE_LABEL

DOCUMENTS_CSV_SCHEMA = (
    "doc_id long, text string, lang string, source string, "
    "n_chars long, _corrupt_record string"
)

__all__ = [
    "DOCUMENTS_CSV_SCHEMA",
    "CORRUPT_SOURCE_LABEL",
    "read_documents_csv",
    "csv_health",
]


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a documents CSV drop with the explicit contract schema;
    rows with unparseable typed columns survive quarantined in
    ``_corrupt_record``."""
    return (
        spark.read.schema(DOCUMENTS_CSV_SCHEMA)
        .option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def csv_health(docs: DataFrame) -> DataFrame:
    """(source, n_docs, chars_total): per-source row counts and n_chars
    totals, corrupt rows under ``__corrupt__`` with a NULL total.
    Referencing n_chars is load-bearing — see the column-pruning note
    in the module docstring."""
    lab = (
        F.when(
            F.col("_corrupt_record").isNotNull(),
            F.lit(CORRUPT_SOURCE_LABEL),
        )
        .otherwise(F.col("source"))
        .alias("source")
    )
    nc = F.when(
        F.col("_corrupt_record").isNull(), F.col("n_chars")
    ).alias("_nc")
    return (
        docs.select(lab, nc)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("_nc").cast("bigint").alias("chars_total"),
        )
    )
