"""Multimodal column handling: opaque binary payloads + typed metadata.

The pattern (SURVEY §1.1 "video streams" row): media lives as a binary
column (or a URI to one) plus a metadata struct; the engine plans over
metadata and only touches bytes inside Arrow-batched Python when a decode
is genuinely required. Reference analogue: MP4s referenced by URI and
probed via ffprobe subprocess (validate_one.py:18-46) — never decoded in
the dataflow.

Decode/resize/frame-sample are implemented as `mapInPandas` operators
with real schemas/batching; the actual codec call is stubbed
(`NotImplementedError`) because image/audio libraries are not available
in this container — `fake_decode=True` substitutes a deterministic
md5-derived header parse so the plumbing is testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int, n_frames int"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Text → (payload binary, metadata struct): the ingestion shape every
    real modality uses (image bytes, audio bytes, ...)."""
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
            F.lit("text/plain").alias("format"),
        ).alias("media_meta"),
    )


def _fake_header(payload: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo-decode: derive dimensions from the content
    hash — stands in for a codec header parse, reproducible everywhere."""
    h = int(hashlib.md5(payload).hexdigest()[:8], 16)
    width = 128 + h % 512
    height = 128 + (h // 512) % 512
    n_frames = 1 + h % 16
    return width, height, n_frames


def decode_media(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """Arrow-batched decode operator over (doc_id, payload) rows.

    `mapInPandas`: each task receives pandas batches, emits the decoded
    metadata frame — the shape a real image/audio decode (PIL/librosa/
    pyav) plugs into. Partitioning, schema, and batch flow are real; only
    the codec call is stubbed in this container.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real media decode requires PIL/pyav/librosa on executors; "
                    "run with fake_decode=True for the deterministic stub"
                )
            dims = [_fake_header(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "format": "text/plain",
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, DECODED_SCHEMA)


def sample_frames(decoded: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling plan over decoded metadata: one output row per kept
    frame index — pure explode arithmetic, no bytes touched."""
    return decoded.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
    )
