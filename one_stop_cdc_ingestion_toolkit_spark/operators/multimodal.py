"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container has no image/audio codecs, so the decode step is STUBBED
(``decode_image`` raises ``NotImplementedError``; ``fake_decode`` is the
deterministic test double). What IS real and tested end-to-end:

- the schema convention (``payload binary`` + ``media_type`` + metadata),
- the Arrow batch path: ``mapInPandas`` over binary columns, preserving
  partitioning, with a bounded batch size so a 100 TB blob scan never
  materializes more than one Arrow batch per task at a time,
- deterministic metadata extraction (byte length + md5 digest), which is
  oracle-checkable against DuckDB.

At scale, blobs should live in parquet with a small row-group size (or as
object-store pointers); the operators below only touch bytes inside the
executor-local Arrow batch — no driver collect, no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.catalog import tables
from one_stop_cdc_ingestion_toolkit_spark.operators import register

#: Arrow batch bound for blob processing (rows per batch handed to pandas).
BLOB_BATCH_ROWS = 256


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires an image codec library (not in this
    container). Plug in PIL/torchvision here when available."""
    raise NotImplementedError(
        "image decode requires an image codec library (e.g. PIL); "
        "use fake_decode for deterministic tests"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for decode: derives fake width/height/frames
    from the digest so tests exercise the full plumbing without codecs."""
    digest = hashlib.md5(payload).hexdigest()
    return {
        "width": int(digest[:4], 16) % 1920 + 1,
        "height": int(digest[4:8], 16) % 1080 + 1,
        "n_frames": int(digest[8:12], 16) % 240 + 1,
    }


def extract_blob_metadata(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """(id, byte_len, digest, width, height, n_frames) via mapInPandas.

    One pass over executor-local Arrow batches; output is narrow metadata,
    so the wide binary column is dropped before any shuffle.
    """
    out_schema = (
        f"{id_col} long, byte_len long, digest string, "
        "width int, height int, n_frames int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            meta = [fake_decode(b) for b in payloads]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "byte_len": [len(b) for b in payloads],
                    "digest": [hashlib.md5(b).hexdigest() for b in payloads],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "n_frames": [m["n_frames"] for m in meta],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def frame_sample(df: DataFrame, id_col: str, payload_col: str, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: explode one row per sampled frame index.

    The actual frame grab is behind the stubbed decoder; the Spark-side
    shape (explode → one row per frame, partitioning preserved) is real.
    """
    meta = extract_blob_metadata(df, id_col, payload_col)
    return meta.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


@register(
    "b52_blob_metadata",
    """SELECT doc_id, octet_length(encode(text)) AS byte_len, md5(text) AS digest
       FROM documents ORDER BY doc_id""",
)
def b52_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary plumbing proof over the documents fixture: treat utf-8 text
    bytes as an opaque payload, extract metadata via the Arrow batch path."""
    d = tables(spark, sf_dir)["documents"]
    blobs = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    meta = extract_blob_metadata(blobs, "doc_id", "payload")
    return meta.select("doc_id", "byte_len", "digest").orderBy("doc_id")
