"""TFRecord shard export: the TensorFlow-native training sink.

Alongside the parquet shard export (plans/sampling.py::export_shards)
and the WebDataset tar sink (pipeline/webdataset.py), this writes the
third standard training-loader format: TFRecord files of
``tf.train.Example`` protos. Both the container format and the proto
encoding are implemented here in pure Python from the PUBLIC specs —
no tensorflow/protobuf dependency:

- TFRecord framing (tensorflow/core/lib/io/record_writer.h): each
  record is ``uint64le length | uint32le masked_crc32c(length) |
  data | uint32le masked_crc32c(data)`` where
  ``mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8 (mod 2^32)``
  and the checksum is CRC32-C (Castagnoli, reflected poly 0x82f63b78).
- ``Example`` / ``Features`` / ``Feature`` / ``BytesList`` /
  ``Int64List`` / ``FloatList`` wire encoding per
  tensorflow/core/example/feature.proto (proto3: int64/float lists are
  PACKED). Map entries are emitted in sorted-key order so the encoding
  is deterministic — protobuf maps carry no order, so any reader
  parses this identically, and byte-stable re-exports stay byte-stable.

Sharding reuses the repo's deterministic permutation recipe (shard =
⌊u₁·n⌋ over a seeded md5, in-shard order by a second seeded hash):
same input + seeds → byte-identical shards. Scale shape: ONE hash
shuffle + in-shard sort, then each task streams its shard to a
``.tmp`` file and os.replace()s it — rows never touch the driver.
Executors write to a locally-mounted path (same deployment note as the
WebDataset sink).
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_unit_interval
from ..plans.sampling import _N_SHARDS, _ORDER_SEED, _SHARD_SEED


def _sweep_stale_tmp(out_dir: str, tmp_marker: str) -> int:
    """Remove ``shard-*<tmp_marker>*`` leftovers before an export
    (ADVICE r12): attempt-unique tmp names fixed the
    concurrent-interleave bug, but a killed task attempt leaves its
    ``.tmp.<attempt>`` file behind forever (the old fixed name was
    self-truncating on retry). Export start is the one safe sweep
    point — a concurrent export into the same dir was never supported
    (both would os.replace the same finals). Shared by the TFRecord
    and WebDataset sinks; returns the number of files removed."""
    removed = 0
    for name in os.listdir(out_dir):
        if name.startswith("shard-") and tmp_marker in name:
            try:
                os.remove(os.path.join(out_dir, name))
                removed += 1
            except FileNotFoundError:
                pass
    return removed

# --- CRC32-C (Castagnoli), table-driven, reflected poly 0x82f63b78 ----------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    """Pure-Python CRC32-C. Check vector: crc32c(b'123456789') ==
    0xE3069283 (pytest-pinned)."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- minimal proto3 wire encoding for tf.train.Example ----------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_free_varint(n: int) -> bytes:
    """int64 varint: negatives encode as their 64-bit two's complement
    (proto3 int64 semantics — ten bytes for negatives)."""
    return _varint(n & 0xFFFFFFFFFFFFFFFF)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _encode_feature(value) -> bytes:
    """One tf.train.Feature from a python value: bytes/str →
    bytes_list (field 1), int → int64_list (field 3, packed), float →
    float_list (field 2, packed float32). Lists of those encode as
    multi-element lists; a mixed or empty-typed list is an error."""
    if isinstance(value, (bytes, bytearray, str)):
        value = [value]
    elif isinstance(value, bool):
        raise TypeError("tfrecord: bool features are ambiguous; cast to int")
    elif isinstance(value, (int, float)):
        value = [value]
    if not isinstance(value, (list, tuple)) or len(value) == 0:
        raise TypeError(f"tfrecord: unsupported feature value {value!r}")
    first = value[0]
    if isinstance(first, (bytes, bytearray, str)):
        items = b"".join(
            _ld(1, v.encode("utf-8") if isinstance(v, str) else bytes(v))
            for v in value
        )
        return _ld(1, items)  # Feature.bytes_list
    if isinstance(first, bool):
        raise TypeError("tfrecord: bool features are ambiguous; cast to int")
    if isinstance(first, int):
        packed = b"".join(_zigzag_free_varint(int(v)) for v in value)
        return _ld(3, _ld(1, packed))  # Feature.int64_list, packed
    if isinstance(first, float):
        packed = b"".join(struct.pack("<f", float(v)) for v in value)
        return _ld(2, _ld(1, packed))  # Feature.float_list, packed
    raise TypeError(f"tfrecord: unsupported feature element {first!r}")


def encode_example(features: dict) -> bytes:
    """tf.train.Example bytes for {name: value} — sorted-key map order
    for determinism. None values are skipped (absent feature)."""
    entries = b""
    for name in sorted(features):
        v = features[name]
        if v is None:
            continue
        entry = _ld(1, name.encode("utf-8")) + _ld(2, _encode_feature(v))
        entries += _ld(1, entry)  # Features.feature map entry
    return _ld(1, entries)  # Example.features


def write_record(fh, data: bytes) -> int:
    """One TFRecord frame; returns bytes written."""
    header = struct.pack("<Q", len(data))
    fh.write(header)
    fh.write(struct.pack("<I", _masked_crc(header)))
    fh.write(data)
    fh.write(struct.pack("<I", _masked_crc(data)))
    return len(header) + 4 + len(data) + 4


def read_records(path: str):
    """Iterate raw record payloads from a TFRecord file, VERIFYING both
    CRCs (raises ValueError on corruption) — the test-side reader."""
    with open(path, "rb") as fh:
        while True:
            header = fh.read(8)
            if not header:
                return
            if len(header) != 8:
                raise ValueError("tfrecord: truncated length header")
            crc = fh.read(4)
            if len(crc) != 4:
                raise ValueError("tfrecord: truncated length crc")
            (expect,) = struct.unpack("<I", crc)
            if _masked_crc(header) != expect:
                raise ValueError("tfrecord: length crc mismatch")
            (n,) = struct.unpack("<Q", header)
            data = fh.read(n)
            if len(data) != n:
                raise ValueError("tfrecord: truncated record")
            crc = fh.read(4)
            if len(crc) != 4:
                raise ValueError("tfrecord: truncated data crc")
            (expect,) = struct.unpack("<I", crc)
            if _masked_crc(data) != expect:
                raise ValueError("tfrecord: data crc mismatch")
            yield data


def decode_example(data: bytes) -> dict:
    """Decode the Example subset encode_example produces (test-side
    round-trip verifier; not a general protobuf parser)."""

    def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
        shift, out = 0, 0
        while True:
            b = buf[i]
            out |= (b & 0x7F) << shift
            i += 1
            if not b & 0x80:
                return out, i
            shift += 7

    def _fields(buf: bytes):
        i = 0
        while i < len(buf):
            tag, i = _read_varint(buf, i)
            field, wt = tag >> 3, tag & 7
            if wt != 2:
                raise ValueError(f"unexpected wire type {wt}")
            n, i = _read_varint(buf, i)
            yield field, buf[i : i + n]
            i += n

    out: dict = {}
    for f, features_buf in _fields(data):
        assert f == 1
        for f2, entry in _fields(features_buf):
            assert f2 == 1
            name, feature = None, None
            for f3, payload in _fields(entry):
                if f3 == 1:
                    name = payload.decode("utf-8")
                else:
                    feature = payload
            for kind, lst in _fields(feature):
                vals = []
                if kind == 1:  # bytes_list
                    for f4, b in _fields(lst):
                        vals.append(b)
                elif kind == 3:  # int64_list packed
                    for _f4, packed in _fields(lst):
                        i = 0
                        while i < len(packed):
                            v, i = _read_varint(packed, i)
                            if v >= 1 << 63:
                                v -= 1 << 64
                            vals.append(v)
                elif kind == 2:  # float_list packed
                    for _f4, packed in _fields(lst):
                        vals = [
                            struct.unpack("<f", packed[j : j + 4])[0]
                            for j in range(0, len(packed), 4)
                        ]
                out[name] = vals
    return out


def export_tfrecord(
    df: DataFrame,
    path: str,
    n_shards: int = _N_SHARDS,
    id_col: str = "doc_id",
    feature_cols: list[str] | None = None,
    shard_seed: str = _SHARD_SEED,
    order_seed: str = _ORDER_SEED,
) -> list[dict]:
    """Write ``df`` as ``shard-%05d.tfrecord`` files of tf.train.Example
    records under ``path``: one Example per row, one feature per column
    (string→bytes_list, int→int64_list, float→float_list, arrays of
    those likewise). Deterministic shard membership and in-shard order
    (the export_shards recipe); returns the per-shard report
    [{"shard", "n_records", "bytes"}]."""
    feature_cols = list(feature_cols or [c for c in df.columns if c != id_col])
    cols = [id_col] + [c for c in feature_cols if c != id_col]
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"export_tfrecord: missing columns {missing}")
    os.makedirs(path, exist_ok=True)
    _sweep_stale_tmp(path, ".tfrecord.tmp.")

    u1 = md5_unit_interval(id_col, seed=shard_seed)
    u2 = md5_unit_interval(id_col, seed=order_seed)
    prepped = (
        df.select(*cols)
        .withColumn("__shard", F.floor(u1 * n_shards).cast("long"))
        .withColumn("__u2", u2)
        .repartition(n_shards, F.col("__shard"))
        .sortWithinPartitions("__shard", "__u2", id_col)
        .drop("__u2")
    )
    out_dir, fcols, icol = path, cols, id_col

    def _write(rows):
        # Attempt-unique tmp suffix (ADVICE r11): a speculative or
        # retried attempt of the same shard's task otherwise writes the
        # SAME .tmp concurrently and interleaves bytes into one file
        # before os.replace. Each attempt writes its own tmp; whichever
        # attempt's os.replace lands last wins whole-file — both wrote
        # identical content (deterministic membership + order), so
        # either outcome is the correct shard.
        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
        cur, fh, tmp, n, nbytes = None, None, None, 0, 0

        def _close():
            nonlocal fh, tmp, n, nbytes
            if fh is None:
                return None
            fh.close()
            final = tmp[: tmp.index(".tfrecord.tmp")] + ".tfrecord"
            os.replace(tmp, final)
            rep = {"shard": int(cur), "n_records": n, "bytes": nbytes}
            fh, tmp, n, nbytes = None, None, 0, 0
            return rep

        for row in rows:
            shard = row["__shard"]
            if shard is None:
                # a NULL id hashes to a NULL shard, which would also
                # collide with the cur=None first-iteration sentinel —
                # fail loudly instead of AttributeError'ing in the task
                raise ValueError(
                    f"export_tfrecord: NULL {icol!r} — ids must be non-null"
                )
            if shard != cur:
                done = _close()
                if done:
                    yield done
                cur = shard
                tmp = os.path.join(
                    out_dir, f"shard-{shard:05d}.tfrecord.tmp.{attempt}"
                )
                fh = open(tmp, "wb")
            feats = {c: row[c] for c in fcols}
            nbytes += write_record(fh, encode_example(feats))
            n += 1
        done = _close()
        if done:
            yield done

    report = prepped.rdd.mapPartitions(_write).collect()
    return sorted(report, key=lambda r: r["shard"])
