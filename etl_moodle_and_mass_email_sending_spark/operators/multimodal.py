"""[EXT] Multimodal columns (SURVEY.md §7 M7): image/audio/video as opaque
``binary`` payload columns with typed metadata, processed by Arrow-batched
``mapInPandas`` workers.

The container ships no image/audio codecs, so the DECODE step is stubbed
(per the build contract): ``decode_media(..., engine="real")`` raises
``NotImplementedError`` where Pillow/librosa would plug in, and
``engine="fake"`` derives deterministic pseudo-metadata from the payload
bytes. Everything around the stub — the binary column, the schema, the
partitioning, the mapInPandas batch shape — is real and oracle-checked
(the fake decode is reproducible in SQL from the same bytes).

Scale design: payloads stay opaque binary end-to-end (no driver collect,
no base64 inflation); decode workers are Arrow-batched so at 100 TB the
Python boundary streams column batches, not rows. Feature extraction
emits fixed-width numeric columns → downstream joins/aggs are columnar.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_table

MEDIA_TYPES = ("image", "audio", "video")
PAYLOAD_REPEAT = 8  # 8 × 16 md5 bytes = 128-byte payload


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table from documents: deterministic binary
    payload (repeated md5 of the text) + declared metadata columns."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.unhex(F.repeat(F.md5("text"), PAYLOAD_REPEAT)).alias("payload"),
        F.struct(
            F.col("n_chars").cast("int").alias("declared_size"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


SQL_MEDIA_TABLE = f"""
    SELECT doc_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
           repeat(md5(text), {PAYLOAD_REPEAT}) AS payload_hex
    FROM documents
"""

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload_len", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def _decode_batches(engine: str):
    """mapInPandas worker factory. 'fake' derives metadata from payload
    bytes; 'real' marks where an actual codec would decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                b = bytes(row.payload)
                if engine == "real":
                    raise NotImplementedError(
                        "no media codecs in this environment; plug "
                        "Pillow/librosa/pyav here and keep the same schema"
                    )
                # deterministic pseudo-decode: little-endian uint16/uint32
                # from the payload head (reproducible in the SQL oracle)
                w = b[0] | (b[1] << 8)
                h = b[2] | (b[3] << 8)
                dur = b[4] | (b[5] << 8)
                frames = b[6] | (b[7] << 8)
                out.append(
                    (
                        int(row.doc_id),
                        row.media_type,
                        len(b),
                        w if row.media_type == "image" else None,
                        h if row.media_type == "image" else None,
                        dur if row.media_type in ("audio", "video") else None,
                        frames if row.media_type == "video" else None,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA])

    return run


def decode_media(media: DataFrame, engine: str = "fake") -> DataFrame:
    """Arrow-batched decode of the payload column → typed metadata."""
    return media.mapInPandas(_decode_batches(engine), DECODED_SCHEMA)


def _le16(hexcol: str, byte_off: int) -> str:
    """DuckDB: little-endian uint16 read from a hex string at byte_off."""
    hi = f"substr({hexcol}, {byte_off * 2 + 3}, 2)"
    lo = f"substr({hexcol}, {byte_off * 2 + 1}, 2)"
    return f"CAST(CAST('0x' || {hi} || {lo} AS INTEGER) AS INTEGER)"


def sql_decode_media() -> str:
    """Oracle twin of fake-decode over the same synthesized payload."""
    w, h, dur, fr = (_le16("payload_hex", o) for o in (0, 2, 4, 6))
    return f"""
    SELECT doc_id, media_type,
           CAST(length(payload_hex) / 2 AS INTEGER) AS payload_len,
           CASE WHEN media_type = 'image' THEN {w} END AS width,
           CASE WHEN media_type = 'image' THEN {h} END AS height,
           CASE WHEN media_type IN ('audio', 'video') THEN {dur} END AS duration_ms,
           CASE WHEN media_type = 'video' THEN {fr} END AS n_frames
    FROM ({SQL_MEDIA_TABLE})
    """
