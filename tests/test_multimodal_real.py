"""Real-PIL perceptual-hash arm (r10 verdict item 6 — the ffprobe
pattern's twin): wherever pillow is installed these run against the
REAL decode → grayscale → 8×8 aHash; in this sandbox they skip loudly,
and the deterministic fake arm stays covered by TestPerceptualHash in
test_round10c_ops.py."""

from __future__ import annotations

import pytest

try:
    import PIL  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _png(pixels, size=(32, 32)) -> bytes:
    """Encode a small grayscale image; `pixels` is a fn(x, y) -> 0..255."""
    import io

    from PIL import Image

    img = Image.new("L", size)
    img.putdata([pixels(x, y) for y in range(size[1]) for x in range(size[0])])
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.skipif(
    not HAVE_PIL,
    reason="pillow not installed — the real-decode aHash arm runs in "
    "deployments with PIL on executors (the codec seam is documented in "
    "operators/multimodal.py; the deterministic fake arm is tested here)",
)
class TestRealPerceptualHash:
    def test_hamming_locality(self, spark):
        """An image and its slightly-edited copy must land within a few
        bits of each other; a structurally different image must land
        far away — the locality property the banded dedup needs."""
        from imitation_learning_data_pipeline_spark.operators.multimodal import (
            perceptual_hash,
        )

        base = _png(lambda x, y: (x * 8) % 256)  # horizontal gradient
        # small edit: one brightened 4x4 corner patch
        edited = _png(
            lambda x, y: min(255, (x * 8) % 256 + (40 if x < 4 and y < 4 else 0))
        )
        different = _png(lambda x, y: (y * 97 + x * 31) % 256)  # noise-ish
        media = spark.createDataFrame(
            [(1, bytearray(base)), (2, bytearray(edited)), (3, bytearray(different))],
            "doc_id long, payload binary",
        )
        got = {r.doc_id: r.phash for r in perceptual_hash(media).collect()}

        def ham(a, b):
            return bin((a & (2**64 - 1)) ^ (b & (2**64 - 1))).count("1")

        assert ham(got[1], got[2]) <= 8
        assert ham(got[1], got[3]) > ham(got[1], got[2])

    def test_identical_payloads_identical_hashes(self, spark):
        from imitation_learning_data_pipeline_spark.operators.multimodal import (
            perceptual_hash,
        )

        base = _png(lambda x, y: (x + y) % 256)
        media = spark.createDataFrame(
            [(1, bytearray(base)), (2, bytearray(base))],
            "doc_id long, payload binary",
        )
        got = {r.doc_id: r.phash for r in perceptual_hash(media).collect()}
        assert got[1] == got[2]


class TestRealArmGate:
    def test_missing_pil_raises_descriptively(self, spark):
        if HAVE_PIL:
            pytest.skip("pillow installed; the NotImplementedError arm is moot")
        from pyspark.errors.exceptions.captured import PythonException

        from imitation_learning_data_pipeline_spark.operators.multimodal import (
            perceptual_hash,
        )

        media = spark.createDataFrame(
            [(1, bytearray(b"xx"))], "doc_id long, payload binary"
        )
        with pytest.raises((NotImplementedError, PythonException)) as exc:
            perceptual_hash(media, fake_decode=False).collect()
        assert "PIL" in str(exc.value) or "pillow" in str(exc.value)
