"""Broadcastable Bloom filter over 64-bit hashes (numpy bit array).

Why this exists: decontamination (plans/dedup.py::decontam_overlap)
broadcasts the probe set's distinct shingles and map-side-joins the
corpus against them. That is the right plan while the probe set is a
benchmark suite (thousands of documents) — but a *blocklist*-scale probe
(every public benchmark + contaminated URL corpus, ~10^8 shingles) is
tens of GB as a broadcast hash relation (strings + JVM object overhead)
and stops fitting. Its Bloom filter at ~10 bits/element is ~125 MB —
comfortably broadcastable — admits NO false negatives, and a tunable
false-positive rate. So the 100 TB plan becomes:

    corpus shingles → xxhash64 → map-side Bloom membership (Arrow-batch,
    numpy-vectorized) → surviving candidates ONLY enter the exact
    verification join → exactness restored.

The candidate stream is |true hits| + fpp·|corpus shingles|; at
fpp=0.01 the verification join processes ~1% of the corpus instead of
all of it, and that join no longer needs the probe side broadcast.

Design notes:
- Membership keys are Spark ``xxhash64`` values (signed int64); numpy
  reinterprets them as uint64. The k probe positions derive from the
  single 64-bit hash via Kirsch–Mitzenmacher double hashing
  g_i = h1 + i·h2 (h1 = low 32 bits, h2 = high 32 bits | 1), the same
  two-hash family the minhash signatures use — one hash computation,
  k derived probes, no measurable fpp penalty (Kirsch & Mitzenmacher,
  ESA'06).
- The bit array is a numpy uint8 buffer: picklable, so it rides the
  ordinary Spark broadcast path to Python workers without serialization
  surprises, and membership tests vectorize ((bits[idx >> 3] >> (idx & 7)) & 1).
"""

from __future__ import annotations

import math

import numpy as np

_LN2 = math.log(2.0)


def _as_u64(hashes) -> np.ndarray:
    """Signed Spark int64 hashes → uint64 view (bit-preserving)."""
    a = np.asarray(hashes, dtype=np.int64)
    return a.view(np.uint64)


class Bloom64:
    """Bloom filter keyed by 64-bit hashes.

    Parameters are explicit (``m_bits``, ``k``) so tests can force
    pathological false-positive rates; :meth:`build` sizes them from
    (n, fpp) with the standard optima m = −n·ln p/ln²2, k = (m/n)·ln 2.
    """

    __slots__ = ("bits", "m_bits", "k")

    def __init__(self, m_bits: int, k: int):
        if m_bits < 8:
            m_bits = 8
        self.m_bits = int(m_bits)
        self.k = max(1, int(k))
        self.bits = np.zeros((self.m_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def build(cls, hashes, fpp: float = 0.01) -> "Bloom64":
        n = max(1, len(hashes))
        m = int(math.ceil(-n * math.log(fpp) / (_LN2 * _LN2)))
        k = max(1, round((m / n) * _LN2))
        b = cls(m, k)
        b.add_many(hashes)
        return b

    def _positions(self, hs: np.ndarray, i: int) -> np.ndarray:
        h1 = hs & np.uint64(0xFFFFFFFF)
        h2 = (hs >> np.uint64(32)) | np.uint64(1)
        return (h1 + np.uint64(i) * h2) % np.uint64(self.m_bits)

    def add_many(self, hashes) -> None:
        hs = _as_u64(hashes)
        for i in range(self.k):
            idx = self._positions(hs, i)
            np.bitwise_or.at(
                self.bits, (idx >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)),
            )

    def contains_many(self, hashes) -> np.ndarray:
        """Vectorized membership: boolean ndarray, True = maybe present
        (false positives possible), False = DEFINITELY absent."""
        hs = _as_u64(hashes)
        out = np.ones(len(hs), dtype=bool)
        for i in range(self.k):
            idx = self._positions(hs, i)
            byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
            out &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 != 0
        return out

    def nbytes(self) -> int:
        return int(self.bits.nbytes)

    # --- serialization (persisted probe stores, plans/dedup.py) ----------

    def to_bytes(self) -> bytes:
        """8-byte header (m_bits, k as two uint32) + raw bit array —
        version-free because the header fully determines the layout."""
        import struct

        return struct.pack("<II", self.m_bits, self.k) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "Bloom64":
        import struct

        m_bits, k = struct.unpack("<II", raw[:8])
        b = cls(m_bits, k)
        arr = np.frombuffer(raw[8:], dtype=np.uint8)
        if arr.nbytes != b.bits.nbytes:
            raise ValueError(
                f"Bloom64.from_bytes: {arr.nbytes} payload bytes for "
                f"m_bits={m_bits} (want {b.bits.nbytes})"
            )
        b.bits = arr.copy()
        return b
