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


AUDIO_SCHEMA = "doc_id long, window_idx int, n_samples int, rms double, zcr double"


def extract_audio_features(
    media: DataFrame,
    window: int = 256,
    fake_decode: bool = False,
) -> DataFrame:
    """Windowed audio features (RMS energy, zero-crossing rate) over a
    PCM waveform — the audio-modality analogue of decode_media.

    The DSP itself is REAL (vectorized numpy over sample windows — the
    shape librosa-style feature extraction plugs into); only the
    container decode (mp3/flac → PCM) is stubbed: ``fake_decode=True``
    interprets the payload bytes directly as centered int8 PCM, which is
    deterministic everywhere and exercises identical batching/windowing.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real audio decode requires soundfile/librosa on executors; "
                    "run with fake_decode=True for the raw-PCM interpretation"
                )
            out: dict[str, list] = {
                "doc_id": [], "window_idx": [], "n_samples": [], "rms": [], "zcr": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                pcm = np.frombuffer(bytes(payload), dtype=np.int8).astype(np.float64)
                pcm -= pcm.mean() if len(pcm) else 0.0
                for w_idx in range(0, max(len(pcm) + window - 1, 1) // window):
                    seg = pcm[w_idx * window : (w_idx + 1) * window]
                    if not len(seg):
                        continue
                    rms = float(np.sqrt(np.mean(seg**2)))
                    zcr = (
                        float(np.mean(np.abs(np.diff(np.signbit(seg)))))
                        if len(seg) > 1
                        else 0.0
                    )
                    out["doc_id"].append(doc_id)
                    out["window_idx"].append(w_idx)
                    out["n_samples"].append(len(seg))
                    out["rms"].append(round(rms, 4))
                    out["zcr"].append(round(zcr, 4))
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(run, AUDIO_SCHEMA)


def plan_resize(
    decoded: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Resize planning over decoded metadata: aspect-preserving scale +
    letterbox padding per image, computed as pure column arithmetic — the
    engine schedules resizes from metadata; only the pixel resample (the
    stubbed codec step) would touch bytes."""
    scale = F.least(
        F.lit(float(target_w)) / F.col("width"),
        F.lit(float(target_h)) / F.col("height"),
    )
    out_w = F.floor(F.col("width") * scale).cast("int")
    out_h = F.floor(F.col("height") * scale).cast("int")
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.round(scale, 6).alias("scale"),
        out_w.alias("out_w"),
        out_h.alias("out_h"),
        ((F.lit(target_w) - out_w) / 2).cast("int").alias("pad_x"),
        ((F.lit(target_h) - out_h) / 2).cast("int").alias("pad_y"),
    )


PHASH_SCHEMA = "doc_id long, phash long"


def _fake_ahash(payload: bytes) -> int:
    """Locality-preserving stand-in for decode→grayscale→8×8→aHash:
    sample the byte stream at 64 evenly spaced centers with a ±2
    smoothing window, threshold by the mean, pack 64 bits.

    The property the real aHash has and this preserves: SMALL payload
    edits flip FEW bits (only the pixels whose windows cover the edited
    offsets change), identical payloads hash identically. Appends/
    re-encodes shift every sample center — larger Hamming distance —
    exactly like a real recompression shifts pHash moderately.
    """
    n = len(payload)
    if n == 0:
        return 0
    pixels = []
    for i in range(64):
        center = (i * n) // 64
        lo, hi = max(0, center - 2), min(n, center + 3)
        window = payload[lo:hi]
        pixels.append(sum(window) / len(window))
    mean = sum(pixels) / 64.0
    h = 0
    for i, p in enumerate(pixels):
        if p > mean:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def _real_ahash(payload: bytes) -> int:
    """The REAL aHash: PIL decode → grayscale → 8×8 box-resize → mean
    threshold → 64 packed bits. Executor-side only (inside the Arrow
    UDF); import-gated — :func:`perceptual_hash` raises a descriptive
    NotImplementedError where PIL is absent, and the skipif test
    (tests/test_multimodal_real.py) drives this arm wherever PIL
    exists, mirroring the real-ffprobe pattern."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L").resize((8, 8))
    px = list(img.getdata())
    mean = sum(px) / 64.0
    h = 0
    for i, p in enumerate(px):
        if p > mean:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def perceptual_hash(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """Arrow-batched perceptual hash over (doc_id, payload) rows →
    (doc_id, phash BIGINT). The real arm (:func:`_real_ahash`) is PIL's
    decode → grayscale → 8×8 average-hash, import-gated on executors;
    ``fake_decode=True`` substitutes :func:`_fake_ahash`, which keeps
    the locality property the downstream banded dedup relies on, so the
    whole pipeline — batching, schema, banding, Hamming verify — runs
    and is tested end to end even without PIL."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hasher = _fake_ahash
        if not fake_decode:
            try:
                import PIL  # noqa: F401

                hasher = _real_ahash
            except ImportError:
                raise NotImplementedError(
                    "real perceptual hashing requires PIL on executors "
                    "(pip install pillow); run with fake_decode=True for "
                    "the deterministic stub"
                ) from None
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [hasher(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, PHASH_SCHEMA)
