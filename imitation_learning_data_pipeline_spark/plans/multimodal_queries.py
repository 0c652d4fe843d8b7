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


# --- perceptual-hash near-dup dedup (image dedup for multimodal corpora) -----

_PH_BANDS = 4  # 4 × 16-bit bands: Hamming ≤ 3 ⇒ ≥1 band identical


def phash_pairs(
    hashes: DataFrame, max_hamming: int = 3, bucket_cap: int = 1000
) -> DataFrame:
    """Near-duplicate pairs over (doc_id, phash BIGINT) →
    (doc_a, doc_b, hamming).

    Same machinery as the SimHash text path: band the 64-bit hash into
    4 × 16-bit values (pigeonhole: Hamming ≤ 3 over 4 bands leaves at
    least one band bit-identical, so candidate generation has NO false
    negatives at the default radius), bucket-join candidates in ONE
    shuffle (`_bucket_pairs`, bucket-capped), verify with
    ``bit_count(a XOR b)``. At 100 TB only (doc_id, 8-byte hash) rows
    move — image bytes never leave their scan."""
    from .dedup import _bucket_pairs

    bands = hashes.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("phash", 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for b in range(_PH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    cand = _bucket_pairs(bands, ["band", "val"], bucket_cap)
    ha = hashes.select(F.col("doc_id").alias("doc_a"), F.col("phash").alias("__ha"))
    hb = hashes.select(F.col("doc_id").alias("doc_b"), F.col("phash").alias("__hb"))
    hamming = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


@register("multimodal_phash_pairs")  # rows-only: the hash is a Python codec seam
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs over a planted media corpus: every
    ``doc_id % 10 == 0`` payload reappears verbatim at +1000000 (exact
    re-upload → Hamming 0) and every ``% 10 == 5`` payload with two
    bytes edited at +2000000 (slight recompress stand-in → small
    Hamming). Rows-only by nature — the hash itself is the Python
    codec seam (mapInPandas), not SQL; the locality/pigeonhole
    semantics are pytest-locked (TestPerceptualHash)."""
    from ..operators.multimodal import perceptual_hash

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    edited = docs.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 3),
            F.lit("zq"),
            F.expr("substring(text, 6)"),
        ).alias("text"),
    )
    corpus = docs.unionByName(exact).unionByName(edited)
    hashes = perceptual_hash(attach_payload(corpus), fake_decode=True)
    return phash_pairs(hashes).orderBy("doc_a", "doc_b")
