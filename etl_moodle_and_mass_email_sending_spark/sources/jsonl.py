"""[EXT] JSONL document ingestion — the wire format LLM corpora
actually arrive in (one JSON object per line: Common Crawl derivatives,
dataset dumps, inference logs).

Design for 100 TB:
- **Explicit schema, never inference**: ``spark.read.json`` without a
  schema runs a full extra pass over the data to infer one; at corpus
  scale that doubles the ingest cost. The schema is part of the ingest
  contract here.
- **PERMISSIVE + corrupt-record quarantine**: one malformed line in a
  multi-terabyte drop must not fail the job (FAILFAST) or silently
  vanish (DROPMALFORMED). Bad lines land in ``_corrupt_record`` with
  every typed column NULL, and ``jsonl_health`` rolls the damage up per
  source so the ingest gate can decide.
- JSONL is newline-splittable, so the scan parallelizes per block like
  CSV — no whole-file decode barrier (the reason .json.gz drops should
  be re-chunked before ingest; a gzip member is NOT splittable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_JSONL_SCHEMA = (
    "doc_id long, text string, lang string, source string, "
    "n_chars long, _corrupt_record string"
)

CORRUPT_SOURCE_LABEL = "__corrupt__"


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a documents JSONL drop with the explicit contract schema;
    malformed lines survive as rows whose ``_corrupt_record`` carries
    the raw line and whose typed columns are NULL."""
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def jsonl_health(docs: DataFrame) -> DataFrame:
    """(source, n_docs): per-source row counts with corrupt lines
    reported under the ``__corrupt__`` label — the ingest-gate rollup.
    A parsed row always has a NULL ``_corrupt_record``; a quarantined
    line has NULL typed columns, so the label expression is total."""
    return (
        docs.select(
            F.when(
                F.col("_corrupt_record").isNotNull(),
                F.lit(CORRUPT_SOURCE_LABEL),
            )
            .otherwise(F.col("source"))
            .alias("source")
        )
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
