"""WebDataset tar-shard export: the training-loader-native sink.

LLM/multimodal training loaders (the WebDataset convention used by
open-CLIP/LAION-scale pipelines; public format spec at
github.com/webdataset/webdataset) consume `.tar` shards whose members
are `{key}.{ext}` files grouped by key, read sequentially. This module
exports any (doc_id, text[, binary, metadata...]) frame to that layout
with the SAME deterministic permutation recipe as the parquet shard
export (`plans/sampling.py::export_shards` — shard = ⌊u₁·n⌋, in-shard
order by a second seeded hash): re-exports after an upstream fix are
byte-identical, and the tar metadata is normalized (mtime 0, uid/gid 0)
so "byte-identical" includes the container bytes, not just the members.

Scale shape: ONE hash shuffle on the shard key + an in-shard sort —
the export_shards plan — then each task streams its (already sorted,
shard-contiguous) rows into tar files via Python's stdlib `tarfile`.
Rows never pass through the driver; the returned report is one row per
shard. Executors write to a locally-mounted path (local FS / NFS /
fuse mounts); object-store targets should export to local scratch and
upload, or use the parquet shard export which writes through Hadoop.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_unit_interval
from ..plans.sampling import _N_SHARDS, _ORDER_SEED, _SHARD_SEED
from .tfrecord import _sweep_stale_tmp


def export_webdataset(
    df: DataFrame,
    path: str,
    n_shards: int = _N_SHARDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    meta_cols: list[str] | None = None,
    binary_col: str | None = None,
    shard_seed: str = _SHARD_SEED,
    order_seed: str = _ORDER_SEED,
) -> list[dict]:
    """Write ``df`` as WebDataset shards ``shard-%06d.tar`` under
    ``path``. Per sample: ``{key}.txt`` (text_col), optionally
    ``{key}.bin`` (binary_col) and ``{key}.json`` (meta_cols). Keys are
    zero-padded ``id_col`` values, member order is the deterministic
    shard_rank order. Returns the per-shard report
    [{"shard": N, "n_samples": int, "bytes": int}, ...] (n_shards rows,
    driver-bounded)."""
    meta_cols = list(meta_cols or [])
    cols = [id_col, text_col] + meta_cols + ([binary_col] if binary_col else [])
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"export_webdataset: missing columns {missing}")
    os.makedirs(path, exist_ok=True)
    _sweep_stale_tmp(path, ".tar.tmp.")

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

    out_dir, tcol, icol, bcol, mcols = path, text_col, id_col, binary_col, meta_cols

    def _tarinfo(name: str, size: int) -> tarfile.TarInfo:
        ti = tarfile.TarInfo(name=name)
        ti.size = size
        ti.mtime = 0  # normalized: byte-stable re-exports
        ti.uid = ti.gid = 0
        ti.uname = ti.gname = ""
        return ti

    def _write(rows):
        # Attempt-unique tmp suffix (ADVICE r11, fixed alongside the
        # TFRecord sink): a speculative/retried attempt of the same
        # task otherwise interleaves bytes into one shared .tmp before
        # os.replace. Attempts write identical content (deterministic
        # membership + order), so whichever rename lands last wins a
        # whole, correct shard.
        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
        cur_shard, tf, tmp, n = None, None, None, 0

        def _close():
            nonlocal tf, tmp, n
            if tf is None:
                return
            tf.close()
            final = tmp[: tmp.index(".tar.tmp")] + ".tar"
            os.replace(tmp, final)  # atomic: no torn shard visible
            yield_row = {
                "shard": int(cur_shard),
                "n_samples": n,
                "bytes": os.path.getsize(final),
            }
            tf, tmp, n = None, None, 0
            return yield_row

        for row in rows:
            shard = row["__shard"]
            if shard is None:
                raise ValueError(
                    f"export_webdataset: NULL {icol!r} — ids must be non-null"
                )
            if shard != cur_shard:
                done = _close()
                if done:
                    yield done
                cur_shard = shard
                tmp = os.path.join(
                    out_dir, f"shard-{shard:06d}.tar.tmp.{attempt}"
                )
                tf = tarfile.open(tmp, "w")
            key = f"{row[icol]:012d}" if isinstance(
                row[icol], int
            ) else str(row[icol])
            text = (row[tcol] or "").encode("utf-8")
            tf.addfile(_tarinfo(f"{key}.txt", len(text)), io.BytesIO(text))
            if mcols:
                meta = json.dumps(
                    {c: row[c] for c in mcols}, sort_keys=True, default=str
                ).encode("utf-8")
                tf.addfile(_tarinfo(f"{key}.json", len(meta)), io.BytesIO(meta))
            if bcol:
                blob = bytes(row[bcol] or b"")
                tf.addfile(_tarinfo(f"{key}.bin", len(blob)), io.BytesIO(blob))
            n += 1
        done = _close()
        if done:
            yield done

    report = prepped.rdd.mapPartitions(_write).collect()
    return sorted(report, key=lambda r: r["shard"])
