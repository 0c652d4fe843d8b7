"""Driver-contract queries for the multimodal column pattern."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_payload, decode_media, sample_frames
from ..session import ensure_utc
from ..sources import load_table
from .registry import register


@register(
    "multimodal_metadata",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha_hex,
       'text/plain' AS format
FROM documents
""",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct extraction — plans over metadata
    without ever shipping payload bytes past the projection."""
    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs)
    return media.select(
        "doc_id",
        F.col("media_meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("media_meta.sha256").alias("sha_hex"),
        F.col("media_meta.format").alias("format"),
    )


@register(
    "multimodal_decode_stub",
    oracle="""
WITH h AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         ('0x' || substr(md5(text), 1, 8))::BIGINT AS hv
  FROM documents
)
SELECT doc_id, n_bytes, 'text/plain' AS format,
       CAST(128 + hv % 512 AS INTEGER) AS width,
       CAST(128 + (hv // 512) % 512 AS INTEGER) AS height,
       CAST(1 + hv % 16 AS INTEGER) AS n_frames
FROM h
""",
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing with the deterministic fake codec —
    the Arrow batch path a real PIL/pyav decode would ride."""
    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(attach_payload(docs), fake_decode=True)


@register(
    "multimodal_frame_sample",
    oracle="""
WITH h AS (
  SELECT doc_id, ('0x' || substr(md5(text), 1, 8))::BIGINT AS hv
  FROM documents
), decoded AS (
  SELECT doc_id, CAST(1 + hv % 16 AS INTEGER) AS n_frames FROM h
)
SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, 4)) AS INTEGER) AS frame_idx
FROM decoded
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-Nth frame sampling over decoded stream metadata."""
    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media(attach_payload(docs), fake_decode=True)
    return sample_frames(decoded, every_n=4).select(
        "doc_id", "n_frames", F.col("frame_idx").cast("int").alias("frame_idx")
    )
