"""Deterministic hashing / split-assignment expressions.

Reference analogue: utils.py:10-36 (seeded BLAKE2b stable hash, explicitly
not Python ``hash()``) and materialize_refactored.py:16-26 (hash → unit
interval → train/val/test). We use MD5 instead of BLAKE2b because both
Spark (`F.md5`) and every oracle engine compute the identical digest
JVM-side — same stability guarantee, zero UDFs, whole-stage codegen.
The reference's bit-exact BLAKE2b behaviour is available through
``blake2b_unit_interval_udf`` for parity experiments (documented
divergence, SURVEY §7.5 item 2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_32 = float(2**32)


def md5_hex(col: Column | str, seed: str = "") -> Column:
    """Stable hex digest of a column (optionally seeded by prefixing)."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    if seed:
        s = F.concat(F.lit(seed), F.lit("|"), s)
    return F.md5(s)


def md5_unit_interval(col: Column | str, seed: str = "") -> Column:
    """Map a key to a stable u ∈ [0, 1) via the top 32 bits of md5.

    Reference: utils.py:38-40 (h / (2^64 − 1)); 32 bits keep the conv()
    result comfortably inside a long while giving ~2.3e-10 resolution.
    """
    return F.conv(F.substring(md5_hex(col, seed), 1, 8), 16, 10).cast("double") / F.lit(
        TWO_32
    )


def split_assign(
    col: Column | str,
    train: float = 0.8,
    val: float = 0.1,
    test: float = 0.1,
    seed: str = "42",
) -> Column:
    """Deterministic per-key train/val/test assignment.

    Reference: materialize_refactored.py:16-26 — NOT ``df.randomSplit``
    (not per-key stable); each key's split is a pure function of
    (key, seed), so re-running materialize on grown data never moves an
    episode between splits.
    """
    if abs(train + val + test - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    u = md5_unit_interval(col, seed)
    return (
        F.when(u < train, "train").when(u < train + val, "val").otherwise("test")
    )


def cents(amount: Column | str) -> Column:
    """Exact integer cents from a double money column.

    Used anywhere a money value feeds a hash/fingerprint: double→string
    rendering differs between engines, long→string doesn't.
    """
    c = F.col(amount) if isinstance(amount, str) else amount
    return F.round(c * 100).cast("long")


def blake2b_unit_interval_udf():
    """Row-level BLAKE2b parity UDF — bit-exact with the reference's
    ``hash_to_unit_interval(stable_hash_int(ep_idx, seed))``
    (utils.py:10-40 + materialize_refactored.py:16-26). Slow path — only
    for bit-exact split replication; default everywhere is md5.

    Exact reference recipe, reproduced:
    - key   = (seed & 2^64−1).to_bytes(8, 'little')       (utils.py:32)
    - input = json.dumps(obj, separators=(',',':'), sort_keys=True)
      for ints/floats/bools/None; plain utf-8 for strings  (utils.py:10-19)
    - u     = int.from_bytes(digest8, 'big') / (2^64 − 1)  (utils.py:38-40)
    """
    import hashlib
    import json

    from pyspark.sql import types as T

    @F.udf(T.DoubleType())
    def _b2(key, seed: int) -> float:
        if isinstance(key, str):
            payload = key.encode("utf-8")
        else:
            payload = json.dumps(
                key, separators=(",", ":"), sort_keys=True
            ).encode("utf-8")
        seed_key = (int(seed) & ((1 << 64) - 1)).to_bytes(8, "little")
        h = hashlib.blake2b(payload, digest_size=8, key=seed_key).digest()
        return int.from_bytes(h, "big") / float(2**64 - 1)

    return _b2
